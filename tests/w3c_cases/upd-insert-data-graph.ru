PREFIX ex: <http://ex.org/>
INSERT DATA { GRAPH <urn:g:three> { ex:frank ex:name "Frank" } }
