PREFIX : <urn:x-cases/>
INSERT { ?s :q ?o } USING NAMED :g WHERE { GRAPH ?gv { ?s :p ?o } }
