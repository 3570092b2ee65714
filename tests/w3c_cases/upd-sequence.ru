PREFIX ex: <http://ex.org/>
INSERT DATA { ex:eve ex:name "Eve" } ;
DELETE WHERE { ex:alice ?p ?o }
