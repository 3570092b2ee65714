PREFIX ex: <http://ex.org/>
DELETE { ?s ex:name ?n }
USING NAMED <urn:g:one>
WHERE { GRAPH ?g { ?s ex:name ?n } }
