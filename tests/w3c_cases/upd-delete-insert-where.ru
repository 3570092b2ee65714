PREFIX ex: <http://ex.org/>
DELETE { ?p ex:fullName ?n }
INSERT { ?p ex:displayName ?n }
WHERE { ?p ex:fullName ?n }
