PREFIX ex: <http://ex.org/>
DELETE { ex:bob ex:name "Bob" }
USING <urn:g:one>
WHERE { ?s ex:name "Carol" }
