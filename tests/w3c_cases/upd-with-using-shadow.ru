PREFIX : <urn:x-cases/>
WITH :g DELETE { ?s :p ?o } USING :h WHERE { ?s :p ?o }
