PREFIX : <urn:x-cases/>
INSERT { ?x :reach ?y } WHERE { ?x :p+ ?y . FILTER(?x = :a) }
