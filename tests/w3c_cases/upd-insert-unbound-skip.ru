PREFIX ex: <http://ex.org/>
INSERT { ?s ex:flag ?f } WHERE { ?s ex:name ?n OPTIONAL { ?s ex:fullName ?f } }
