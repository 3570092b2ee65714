PREFIX ex: <http://ex.org/>
INSERT { ?n ex:isNameOf ?s } WHERE { ?s ex:name ?n }
