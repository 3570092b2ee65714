PREFIX ex: <http://ex.org/>
INSERT { ?s ex:card _:c }
WHERE { ?s ex:name "Bob" }
