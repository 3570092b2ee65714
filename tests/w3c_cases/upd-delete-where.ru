PREFIX ex: <http://ex.org/>
DELETE WHERE { ex:alice ?p ?o }
