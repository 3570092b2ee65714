PREFIX ex: <http://ex.org/>
INSERT DATA { ex:eve ex:name "Eve" }
