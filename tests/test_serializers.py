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


def test_jsonld_writer_roundtrip(spark):
    """to_jsonld -> sources/jsonld extractor reproduces the exact triple
    set (IRI/typed/lang/plain objects; bnode subject and object)."""
    import json

    from ocaml_rdf_spark.serializers import to_jsonld
    from ocaml_rdf_spark.sources.jsonld import extract_jsonld
    from ocaml_rdf_spark.types import BNode, Iri, Literal

    rows = [
        (0, "http://ex.org/a", "http://ex.org/p", 0, "http://ex.org/b", None, None, "g"),
        (0, "http://ex.org/a", "http://ex.org/q", 2, "plain \"quoted\"", None, None, "g"),
        (0, "http://ex.org/a", "http://ex.org/q", 2, "hallo", None, "de", "g"),
        (0, "http://ex.org/a", "http://ex.org/n", 2, "42", "http://www.w3.org/2001/XMLSchema#integer", None, "g"),
        (0, "http://ex.org/a", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", 0, "http://ex.org/T", None, None, "g"),
        (1, "bn1", "http://ex.org/p", 1, "bn2", None, None, "g"),
    ]
    df = spark.createDataFrame(
        rows,
        "s_kind int, s_lex string, pred string, o_kind int, o_lex string,"
        " o_dtype string, o_lang string, graph string",
    )
    doc = to_jsonld(df)
    json.loads(doc)  # well-formed JSON
    got = extract_jsonld(doc, base=None)

    def term_key(t):
        if isinstance(t, Iri):
            return ("iri", t.value)
        if isinstance(t, BNode):
            return ("bn", t.label)  # labels round-trip via _: ids
        return ("lit", t.lexical, t.dtype, t.lang)

    got_set = {(term_key(s), p.value, term_key(o)) for s, p, o in got}
    assert (("iri", "http://ex.org/a"), "http://ex.org/p", ("iri", "http://ex.org/b")) in got_set
    assert (("iri", "http://ex.org/a"), "http://ex.org/q", ("lit", 'plain "quoted"', None, None)) in got_set or \
           (("iri", "http://ex.org/a"), "http://ex.org/q", ("lit", 'plain "quoted"', "http://www.w3.org/2001/XMLSchema#string", None)) in got_set
    assert any(k == ("lit", "hallo", None, "de") for (_s, _p, k) in got_set)
    assert any(k == ("lit", "42", "http://www.w3.org/2001/XMLSchema#integer", None) for (_s, _p, k) in got_set)
    assert any(p == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type" for (_s, p, _o) in got_set)
    # the bnode-to-bnode edge survives with SOME labels
    bn_edges = [(s, o) for (s, p, o) in got_set if s[0] == "bn" and o[0] == "bn"]
    assert len(bn_edges) == 1
    assert len(got_set) == len(rows)


def test_write_sorted_ntriples_global_order(spark, tmp_path):
    import glob
    import os

    from ocaml_rdf_spark.serializers import write_sorted_ntriples

    triples = [
        (Iri(EX + f"s{i:04d}"), Iri(EX + "p"), Literal(str(i * 7 % 1000)))
        for i in range(500)
    ]
    g2 = Graph.from_triples(spark, triples, name="urn:sorted")
    out = str(tmp_path / "nt_sorted")
    write_sorted_ntriples(g2.df, out, shards=4)

    parts = sorted(glob.glob(os.path.join(out, "part-*")))
    assert len(parts) >= 2  # actually sharded, not a single file
    all_lines, prev_last = [], None
    for p in parts:
        with open(p, encoding="utf-8") as fh:
            lines = fh.read().splitlines()
        assert lines == sorted(lines)  # shard-internal order
        if lines and prev_last is not None:
            assert prev_last <= lines[0]  # cross-shard boundaries ordered
        if lines:
            prev_last = lines[-1]
        all_lines.extend(lines)
    # concatenation in shard order IS the global sort, content exact
    assert all_lines == sorted(all_lines)
    expected = sorted(r["line"] for r in to_ntriples(g2.df).collect())
    assert all_lines == expected
