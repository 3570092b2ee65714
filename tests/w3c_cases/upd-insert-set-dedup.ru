PREFIX ex: <http://ex.org/>
INSERT { ?s ex:tag ex:seen . ex:alice ex:tag ex:seen } WHERE { ?s ex:name ?n }
