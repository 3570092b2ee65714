PREFIX ex: <http://ex.org/>
INSERT { GRAPH ?g { ?s ex:seen "y" } } WHERE { GRAPH ?g { ?s ex:name ?n } }
