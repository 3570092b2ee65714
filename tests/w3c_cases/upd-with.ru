PREFIX ex: <http://ex.org/>
WITH <urn:g:one>
DELETE { ?s ex:name ?n }
INSERT { ?s ex:nick ?n }
WHERE { ?s ex:name ?n }
