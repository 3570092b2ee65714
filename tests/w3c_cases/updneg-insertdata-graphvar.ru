PREFIX ex: <http://ex.org/>
INSERT DATA { GRAPH ?g { ex:a ex:p ex:b } }
