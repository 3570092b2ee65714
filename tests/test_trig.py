"""TriG reader/writer: quads round-trip through the dataset syntax
(engine addition beyond the Turtle-only reference — SURVEY §2.2)."""

from __future__ import annotations

import pytest

from ocaml_rdf_spark.sources.trig import TriGParser, parse_trig
from ocaml_rdf_spark.types import BNode, Iri, Literal


def test_trig_blocks_and_default():
    doc = """
    @prefix ex: <http://e/> .
    ex:x ex:p "d" .
    GRAPH ex:g1 { ex:a ex:p "v1" ; a ex:T . }
    ex:g2 { ex:c ex:p "v2" }
    { ex:d ex:p "d2" . }
    """
    qs = parse_trig(doc)
    graphs = {str(g.value) if isinstance(g, Iri) else g for *_, g in qs if g is not None}
    assert graphs == {"http://e/g1", "http://e/g2"}
    default = [(s, p, o) for s, p, o, g in qs if g is None]
    assert len(default) == 2
    g1 = [(s, p, o) for s, p, o, g in qs if isinstance(g, Iri) and g.value == "http://e/g1"]
    assert len(g1) == 2


def test_trig_bnode_graph_label_and_collections():
    qs = parse_trig("@prefix ex: <http://e/> . _:gl { ex:e ex:p (1 2) . }")
    assert all(isinstance(g, BNode) and g.label == "gl" for *_, g in qs)
    assert len(qs) == 5  # 2 first + 2 rest + the property triple


def test_trig_sparql_directives_and_case():
    qs = parse_trig('PREFIX ex: <http://e/>\ngraph ex:g { ex:a ex:p true }')
    assert qs == [
        (Iri("http://e/a"), Iri("http://e/p"),
         Literal("true", dtype="http://www.w3.org/2001/XMLSchema#boolean"), Iri("http://e/g"))
    ]


def test_trig_negative_unterminated():
    from ocaml_rdf_spark.sources.turtle import TurtleSyntaxError

    with pytest.raises(TurtleSyntaxError):
        parse_trig("@prefix ex: <http://e/> . GRAPH ex:g { ex:a ex:p 1 ")


def test_trig_roundtrip_via_store(spark):
    from ocaml_rdf_spark.serializers import to_trig
    from ocaml_rdf_spark.types import TRIPLES_SCHEMA, triple_row

    doc = """
    @prefix ex: <http://e/> .
    ex:x ex:p "d" .
    GRAPH ex:g1 { ex:a ex:p "v1"@en . ex:a ex:n 42 . }
    """
    rows = []
    for s, p, o, g in parse_trig(doc):
        gname = g.value if isinstance(g, Iri) else ("_:" + g.label if g is not None else None)
        from ocaml_rdf_spark.types import DEFAULT_GRAPH

        rows.append(triple_row(s, p, o, graph=gname or DEFAULT_GRAPH))
    df = spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)
    text = to_trig(df)
    qs2 = parse_trig(text)
    # round-trip: same quad multiset (graph None ≡ default sentinel)
    def norm(qs):
        out = set()
        for s, p, o, g in qs:
            gk = g.value if isinstance(g, Iri) else (g.label if g is not None else None)
            out.add((s, p, o, gk))
        return out

    orig = norm(parse_trig(doc))
    got = norm(qs2)
    assert got == orig


def test_trig_in_extraction_stage():
    """<script type="application/trig"> blocks flow through extract_page;
    named graphs land in the graph column, default-graph quads use the url."""
    from ocaml_rdf_spark.extract import extract_page

    html = (
        '<html><body><script type="application/trig">'
        "@prefix ex: <http://e/> .\n"
        'ex:x ex:p "d" .\n'
        'GRAPH ex:g1 { ex:a ex:p "v1" . }\n'
        "</script></body></html>"
    ).encode()
    rows, errors = extract_page("https://h/p", html)
    assert not errors
    trig_rows = [r for r in rows if r[9] == "trig"]
    graphs = {r[7] for r in trig_rows}
    assert graphs == {"https://h/p", "http://e/g1"}
    assert len(trig_rows) == 2
