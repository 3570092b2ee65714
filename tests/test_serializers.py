"""Round-trip tests: graph → N-Triples → parse → same graph (the
reference's own round-trip suite shape, SURVEY §5 item 2 / BASELINE.json:6)."""

import pytest

from ocaml_rdf_spark.graph import Graph
from ocaml_rdf_spark.serializers import to_dot, to_ntriples, to_turtle
from ocaml_rdf_spark.sources.ntriples import parse_ntriples
from ocaml_rdf_spark.sources.turtle import parse_turtle
from ocaml_rdf_spark.types import XSD_INTEGER, BNode, Iri, Literal, triple_row

EX = "http://ex.org/"

TRIPLES = [
    (Iri(EX + "a"), Iri(EX + "p"), Iri(EX + "b")),
    (Iri(EX + "a"), Iri(EX + "q"), Literal('tricky "quote"\nline\t\\end')),
    (Iri(EX + "a"), Iri(EX + "r"), Literal("héllo", lang="fr")),
    (Iri(EX + "a"), Iri(EX + "n"), Literal("42", dtype=XSD_INTEGER)),
    (BNode("x1"), Iri(EX + "p"), BNode("x2")),
]


@pytest.fixture(scope="module")
def g(spark):
    return Graph.from_triples(spark, TRIPLES, name="urn:ser")


def test_nt_roundtrip(g):
    doc = "\n".join(r["line"] for r in to_ntriples(g.df).collect())
    reparsed = set(parse_ntriples(doc))
    want = {(s, p, o if not isinstance(o, Literal) or o.dtype else Literal(o.lexical, o.lang, None)) for s, p, o in TRIPLES}
    # normalize: parser returns plain literals without xsd:string tag
    norm = {
        (s, p, Literal(o.lexical, o.lang, None if o.dtype in (None, "http://www.w3.org/2001/XMLSchema#string") else o.dtype) if isinstance(o, Literal) else o)
        for s, p, o in reparsed
    }
    want_norm = {
        (s, p, Literal(o.lexical, o.lang, o.dtype) if isinstance(o, Literal) else o)
        for s, p, o in want
    }
    assert norm == want_norm


def test_turtle_roundtrip_with_prefixes(g):
    ttl = to_turtle(g.df, {"ex": EX})
    assert "@prefix ex:" in ttl and "ex:a" in ttl
    reparsed = list(parse_turtle(ttl))
    assert len(reparsed) == len(TRIPLES)
    lex = {o.lexical for _, _, o in reparsed if isinstance(o, Literal)}
    assert 'tricky "quote"\nline\t\\end' in lex


def test_rdf_type_abbreviated_as_a(spark):
    g2 = Graph.from_triples(
        spark,
        [(Iri(EX + "s"), Iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"), Iri(EX + "T"))],
    )
    ttl = to_turtle(g2.df, {"ex": EX})
    assert " a ex:T" in ttl


def test_dot_export(g):
    dot = to_dot(g.df)
    assert dot.startswith("digraph") and "->" in dot
