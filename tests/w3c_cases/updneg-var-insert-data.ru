PREFIX ex: <http://ex.org/>
INSERT DATA { ?x ex:p "v" }
