PREFIX ex: <http://ex.org/>
DELETE DATA { ex:a ex:p ?v }
