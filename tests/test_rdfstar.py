"""RDF-star / SPARQL-star (v1: single-level quoted triples — the
annotation/provenance use case; beyond the reference, which predates
RDF-star). Covers: the QuotedTriple term + lex encoding, Turtle-star and
N-Triples-star parsing (incl. annotation syntax), NT-star serialization
round-trip, SPARQL-star quoted patterns / annotation patterns / builtins
(TRIPLE, isTRIPLE, SUBJECT, PREDICATE, OBJECT), and UPDATE-star."""

from __future__ import annotations

import pytest

from ocaml_rdf_spark.algebra import Ctx, flatten
from ocaml_rdf_spark.sources.ntriples import NTSyntaxError, parse_ntriples
from ocaml_rdf_spark.sources.turtle import TurtleParser, TurtleSyntaxError
from ocaml_rdf_spark.sparql import execute, execute_update
from ocaml_rdf_spark.types import (
    TRIPLES_SCHEMA, Iri, Literal, QuotedTriple, qt_decode, triple_row,
)

EX = "http://ex.org/"
XD = "http://www.w3.org/2001/XMLSchema#decimal"
PFX = f"PREFIX ex: <{EX}>\n"


# --- term model -------------------------------------------------------------


def test_encode_decode_roundtrip():
    for qt in [
        QuotedTriple(Iri(EX + "a"), Iri(EX + "p"), Literal("hi")),
        QuotedTriple(Iri(EX + "a"), Iri(EX + "p"), Literal("x", lang="en")),
        QuotedTriple(Iri(EX + "a"), Iri(EX + "p"), Literal("1", dtype=XD)),
        QuotedTriple(Iri(EX + "a"), Iri(EX + "p"), Iri(EX + "b")),
    ]:
        assert qt_decode(qt.encode()) == qt


def test_nested_and_invalid_rejected():
    inner = QuotedTriple(Iri(EX + "a"), Iri(EX + "p"), Iri(EX + "b"))
    with pytest.raises(ValueError):
        QuotedTriple(inner, Iri(EX + "p"), Iri(EX + "b"))
    with pytest.raises(ValueError):
        QuotedTriple(Iri(EX + "a"), Iri(EX + "p"), Literal("bad\x1fsep"))
    with pytest.raises(ValueError):
        QuotedTriple(Literal("lit"), Iri(EX + "p"), Iri(EX + "b"))


# --- data syntax ------------------------------------------------------------


def test_turtle_star_quoted_subject_and_object():
    doc = f"""@prefix ex: <{EX}> .
<< ex:a ex:says "hi" >> ex:certainty "0.9"^^<{XD}> .
ex:doc ex:claims << ex:b a ex:Liar >> .
"""
    got = TurtleParser(doc).parse()
    qt1 = QuotedTriple(Iri(EX + "a"), Iri(EX + "says"), Literal("hi"))
    qt2 = QuotedTriple(Iri(EX + "b"), Iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"), Iri(EX + "Liar"))
    assert (qt1, Iri(EX + "certainty"), Literal("0.9", dtype=XD)) in got
    assert (Iri(EX + "doc"), Iri(EX + "claims"), qt2) in got


def test_turtle_star_annotation_syntax():
    doc = f"""@prefix ex: <{EX}> .
ex:a ex:says "hi" {{| ex:certainty "0.9"^^<{XD}> ; ex:source ex:doc |}} , "yo" .
"""
    got = TurtleParser(doc).parse()
    qt = QuotedTriple(Iri(EX + "a"), Iri(EX + "says"), Literal("hi"))
    assert (Iri(EX + "a"), Iri(EX + "says"), Literal("hi")) in got       # asserted
    assert (qt, Iri(EX + "certainty"), Literal("0.9", dtype=XD)) in got  # annotated
    assert (qt, Iri(EX + "source"), Iri(EX + "doc")) in got
    assert (Iri(EX + "a"), Iri(EX + "says"), Literal("yo")) in got       # list continues
    assert len(got) == 4


def test_turtle_star_nested_rejected():
    with pytest.raises(TurtleSyntaxError):
        TurtleParser(f"<< << <{EX}a> <{EX}p> <{EX}b> >> <{EX}p> <{EX}c> >> <{EX}q> <{EX}d> .").parse()


def test_ntriples_star_parse_and_roundtrip(spark):
    line = f'<< <{EX}a> <{EX}says> "hi" >> <{EX}certainty> "0.9"^^<{XD}> .'
    (t,) = list(parse_ntriples(line))
    qt = QuotedTriple(Iri(EX + "a"), Iri(EX + "says"), Literal("hi"))
    assert t == (qt, Iri(EX + "certainty"), Literal("0.9", dtype=XD))
    # write back through the Column-side NT serializer and reparse
    from ocaml_rdf_spark.serializers import to_ntriples

    df = spark.createDataFrame([triple_row(*t, graph="urn:g:d")], schema=TRIPLES_SCHEMA)
    (out_line,) = [r["line"] for r in to_ntriples(df).collect()]
    assert list(parse_ntriples(out_line)) == [t]


def test_ntriples_star_nested_rejected():
    with pytest.raises(NTSyntaxError):
        list(parse_ntriples(f"<< << <{EX}a> <{EX}p> <{EX}b> >> <{EX}p> <{EX}c> >> <{EX}q> <{EX}d> ."))


# --- SPARQL-star ------------------------------------------------------------


@pytest.fixture(scope="module")
def star_ctx(spark):
    rows = [
        triple_row(QuotedTriple(Iri(EX + "a"), Iri(EX + "says"), Literal("hi")),
                   Iri(EX + "certainty"), Literal("0.9", dtype=XD), graph="urn:g:d"),
        triple_row(QuotedTriple(Iri(EX + "b"), Iri(EX + "says"), Literal("yo")),
                   Iri(EX + "certainty"), Literal("0.4", dtype=XD), graph="urn:g:d"),
        triple_row(Iri(EX + "a"), Iri(EX + "says"), Literal("hi"), graph="urn:g:d"),
        triple_row(Iri(EX + "doc"), Iri(EX + "claims"),
                   QuotedTriple(Iri(EX + "b"), Iri(EX + "says"), Literal("yo")), graph="urn:g:d"),
    ]
    return Ctx(spark.createDataFrame(rows, schema=TRIPLES_SCHEMA))


def rows(df, *cols):
    out = flatten(df)
    if cols:
        out = out.select(*cols)
    return sorted(tuple(r) for r in out.collect())


def test_quoted_pattern_with_vars(star_ctx):
    df = execute(
        PFX + "SELECT ?who ?what ?c WHERE { << ?who ex:says ?what >> ex:certainty ?c }",
        star_ctx,
    )
    assert rows(df, "who", "what", "c") == [
        (EX + "a", "hi", "0.9"), (EX + "b", "yo", "0.4"),
    ]


def test_quoted_pattern_ground(star_ctx):
    df = execute(PFX + 'SELECT ?c WHERE { << ex:a ex:says "hi" >> ex:certainty ?c }', star_ctx)
    assert rows(df) == [("0.9",)]


def test_quoted_pattern_in_object_position(star_ctx):
    df = execute(PFX + "SELECT ?who WHERE { ex:doc ex:claims << ?who ex:says ?w >> }", star_ctx)
    assert rows(df) == [(EX + "b",)]


def test_annotation_pattern_requires_asserted(star_ctx):
    # only ex:a's statement is both asserted AND annotated
    df = execute(PFX + "SELECT ?s ?c WHERE { ?s ex:says ?w {| ex:certainty ?c |} }", star_ctx)
    assert rows(df, "s", "c") == [(EX + "a", "0.9")]


def test_star_builtins(star_ctx):
    df = execute(
        PFX
        + """SELECT ?s ?p ?o WHERE {
             ?t ex:certainty ?c . FILTER(isTRIPLE(?t) && ?c > 0.5)
             BIND(SUBJECT(?t) AS ?s) BIND(PREDICATE(?t) AS ?p) BIND(OBJECT(?t) AS ?o)
           }""",
        star_ctx,
    )
    assert rows(df, "s", "p", "o") == [(EX + "a", EX + "says", "hi")]


def test_triple_constructor_joins_back(star_ctx):
    # TRIPLE() builds a term equal to the stored quoted term
    df = execute(
        PFX
        + """SELECT ?c WHERE {
             ?x ex:says ?w . ?t ex:certainty ?c .
             FILTER(sameTerm(TRIPLE(?x, ex:says, ?w), ?t))
           }""",
        star_ctx,
    )
    assert rows(df) == [("0.9",)]


def test_subject_of_non_triple_is_error(star_ctx):
    df = execute(
        PFX + "SELECT ?s WHERE { ex:a ex:says ?w BIND(SUBJECT(?w) AS ?s) }", star_ctx
    )
    assert rows(df) == [(None,)]


def test_update_star(spark):
    base = spark.createDataFrame(
        [triple_row(Iri(EX + "a"), Iri(EX + "says"), Literal("hi"), graph="urn:x-ords:default")],
        schema=TRIPLES_SCHEMA,
    )
    out = execute_update(
        PFX + "INSERT { << ?s ex:says ?w >> ex:assertedBy ex:bot } WHERE { ?s ex:says ?w }",
        base,
    )
    got = {(r["s_kind"], r["pred"]) for r in out.collect()}
    assert (3, EX + "assertedBy") in got
    # and the quoted subject round-trips through a SPARQL-star probe
    df = execute(
        PFX + "SELECT ?who WHERE { << ?who ex:says ?w >> ex:assertedBy ex:bot }", Ctx(out)
    )
    assert rows(df) == [(EX + "a",)]


def test_insert_data_star_ground(spark):
    base = spark.createDataFrame(
        [triple_row(Iri(EX + "x"), Iri(EX + "p"), Literal("v"), graph="urn:x-ords:default")],
        schema=TRIPLES_SCHEMA,
    )
    out = execute_update(
        PFX + 'INSERT DATA { << ex:a ex:says "hi" >> ex:certainty "0.9" }', base
    )
    assert out.filter(out.s_kind == 3).count() == 1
    with pytest.raises(SyntaxError):
        execute_update(PFX + "INSERT DATA { << ?v ex:says \"hi\" >> ex:p ex:o }", base)


# --- results formats --------------------------------------------------------


def test_results_formats_with_triple_terms(star_ctx):
    import json

    from ocaml_rdf_spark.results import (
        parse_sparql_tsv, to_sparql_csv, to_sparql_json, to_sparql_tsv, to_sparql_xml,
    )

    df = execute(
        PFX + "SELECT ?t ?c WHERE { ?t ex:certainty ?c FILTER(?c > 0.5) }", star_ctx
    )
    j = json.loads(to_sparql_json(df))
    (b,) = j["results"]["bindings"]
    assert b["t"]["type"] == "triple"
    assert b["t"]["value"]["subject"] == {"type": "uri", "value": EX + "a"}
    assert b["t"]["value"]["object"] == {"type": "literal", "value": "hi"}
    x = to_sparql_xml(df)
    assert "<triple><subject><uri>" in x and "</object></triple>" in x
    tsv = to_sparql_tsv(df)
    assert f'<< <{EX}a> <{EX}says> "hi" >>' in tsv
    # TSV round-trip restores the encoded quoted term
    _vars, rows_ = parse_sparql_tsv(tsv)
    qt = QuotedTriple(Iri(EX + "a"), Iri(EX + "says"), Literal("hi"))
    assert rows_[0]["t"] == (3, qt.encode(), None, None)
    csv = to_sparql_csv(df)
    assert "<< <" in csv


def test_trig_star_inherits_quoting():
    from ocaml_rdf_spark.sources.trig import TriGParser

    doc = f"""@prefix ex: <{EX}> .
<urn:g:one> {{ << ex:a ex:says "hi" >> ex:certainty "0.9"^^<{XD}> . }}
ex:doc ex:claims << ex:b ex:says "yo" >> .
"""
    quads = TriGParser(doc).parse_quads()
    qt = QuotedTriple(Iri(EX + "a"), Iri(EX + "says"), Literal("hi"))
    assert (qt, Iri(EX + "certainty"), Literal("0.9", dtype=XD), Iri("urn:g:one")) in quads
    qt2 = QuotedTriple(Iri(EX + "b"), Iri(EX + "says"), Literal("yo"))
    assert (Iri(EX + "doc"), Iri(EX + "claims"), qt2, None) in quads


def test_quoted_term_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    lex = st.text(
        alphabet=st.characters(blacklist_characters="\x1e\x1f", blacklist_categories=("Cs",)),
        max_size=30,
    )
    name = st.text(alphabet="abcdefghij", min_size=1, max_size=8)

    terms = st.one_of(
        name.map(lambda x: Iri(EX + x)),
        name.map(lambda x: __import__("ocaml_rdf_spark.types", fromlist=["BNode"]).BNode(x)),
        st.tuples(lex, st.one_of(st.none(), st.just("en"), st.just("de-DE"))).map(
            lambda t: Literal(t[0], lang=t[1])
        ),
        st.tuples(lex, name).map(lambda t: Literal(t[0], dtype=EX + t[1])),
    )

    @settings(max_examples=200, deadline=None)
    @given(s=st.one_of(name.map(lambda x: Iri(EX + x))), p=name.map(lambda x: Iri(EX + x)), o=terms)
    def check(s, p, o):
        qt = QuotedTriple(s, p, o)
        assert qt_decode(qt.encode()) == qt
        # NT-star text round-trips through the N-Triples parser when the
        # lexical is NT-escapable (parse the full statement line)
        line = f"{qt.nt()} <{EX}p> <{EX}o> ."
        (t,) = list(parse_ntriples(line))
        assert t[0] == qt

    check()


def test_results_json_roundtrip_triple_term(star_ctx):
    from ocaml_rdf_spark.results import parse_sparql_json, to_sparql_json

    df = execute(PFX + "SELECT ?t WHERE { ?t ex:certainty ?c FILTER(?c > 0.5) }", star_ctx)
    _vars, rows_ = parse_sparql_json(to_sparql_json(df))
    qt = QuotedTriple(Iri(EX + "a"), Iri(EX + "says"), Literal("hi"))
    assert rows_[0]["t"] == (3, qt.encode(), None, None)


def test_paths_inside_service(spark):
    # property-path fixpoints evaluate against the SERVICE's own dataset
    from ocaml_rdf_spark.types import TRIPLES_SCHEMA, triple_row

    chain = [
        triple_row(Iri(EX + f"n{i}"), Iri(EX + "next"), Iri(EX + f"n{i+1}"), graph="urn:g:svc")
        for i in range(4)
    ]
    svc = spark.createDataFrame(chain, schema=TRIPLES_SCHEMA)
    local = spark.createDataFrame(
        [triple_row(Iri(EX + "n0"), Iri(EX + "name"), Literal("start"), graph="urn:g:l")],
        schema=TRIPLES_SCHEMA,
    )
    ctx = Ctx(local, services={"urn:svc:graph": svc})
    df = execute(
        PFX
        + """SELECT ?far WHERE { ?s ex:name "start"
             SERVICE <urn:svc:graph> { ?s ex:next+ ?far } }""",
        ctx,
    )
    assert rows(df) == [(EX + f"n{i}",) for i in range(1, 5)]


def test_quoted_triple_in_values(star_ctx):
    df = execute(
        PFX
        + """SELECT ?c WHERE {
             VALUES ?t { << ex:a ex:says "hi" >> }
             ?t ex:certainty ?c }""",
        star_ctx,
    )
    assert rows(df) == [("0.9",)]
    with pytest.raises(SyntaxError):
        execute(PFX + "SELECT * WHERE { VALUES ?t { << ?v ex:p ex:o >> } }", star_ctx)
