PREFIX ex: <http://ex.org/>
DELETE DATA { ex:bob ex:name "Bob" }
