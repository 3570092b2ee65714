PREFIX ex: <http://ex.org/>
DELETE { _:b ?p ?o } WHERE { ?s ?p ?o }
