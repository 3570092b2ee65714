PREFIX : <urn:x-cases/>
DELETE { GRAPH :g1 { :b :p ?y } } WHERE { GRAPH ?g { :b :p+ ?y } }
