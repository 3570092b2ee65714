PREFIX ex: <http://ex.org/>
DELETE { ?s ex:fullName ?f } WHERE { ?s ex:name ?n OPTIONAL { ?s ex:fullName ?f } }
