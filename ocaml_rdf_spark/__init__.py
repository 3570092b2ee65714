"""ocaml_rdf_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
reference ``flh/ocaml-rdf`` (RDF term/triple data model, Turtle/N-Triples/
JSON-LD/RDFa/microdata extraction, SPARQL-style query algebra), re-expressed
Spark-first per SURVEY.md.

Reference parity map (reference was EMPTY on disk at survey+build time —
citations are to the public ocaml-rdf layout, ``file :: function``, see
SURVEY.md §0):

- term/triple model  (rdf_term.ml :: term, triple)  -> ocaml_rdf_spark.types
- graph API          (rdf_graph.ml)                 -> ocaml_rdf_spark.graph
- Turtle reader      (rdf_ttl.ml + lexer/parser)    -> sources/turtle.py
- N-Triples reader   (rdf_ttl.ml, NT subset)        -> sources/ntriples.py
- RDF/XML reader     (rdf_xml.ml)                   -> sources/rdfxml.py
- serializers        (rdf_ttl.ml :: to_string)      -> serializers.py
- SPARQL algebra     (rdf_sparql_algebra.ml)        -> algebra.py
- SPARQL builtins    (rdf_sparql_eval.ml, rdf_dt.ml)-> functions/builtins.py
- datasets           (rdf_ds.ml)                    -> the `graph` column
"""

__version__ = "0.1.0"
