CLEAR GRAPH <urn:g:one>
