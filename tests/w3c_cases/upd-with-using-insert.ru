PREFIX : <urn:x-cases/>
WITH :g INSERT { ?s :q ?o } USING :h WHERE { ?s :p ?o }
