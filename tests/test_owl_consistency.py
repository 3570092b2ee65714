"""owl_consistency (operators/owlrl.py): hand-built semantics tables for
each OWL 2 RL false-conclusion rule, symmetric axiom declarations, and
the literal-object guards."""

from __future__ import annotations

from ocaml_rdf_spark.operators.owlrl import (
    ASYMMETRIC,
    DISJOINT_WITH,
    IRREFLEXIVE,
    PROP_DISJOINT_WITH,
    owl_consistency,
)
from ocaml_rdf_spark.types import RDF_TYPE, TRIPLES_SCHEMA, Iri, Literal, triple_row


def _store(spark, rows):
    return spark.createDataFrame(
        [
            triple_row(
                Iri(s), Iri(p), Literal(o[4:]) if o.startswith("lit:") else Iri(o),
                graph="urn:g:t",
            )
            for s, p, o in rows
        ],
        schema=TRIPLES_SCHEMA,
    )


def _viol(spark, rows):
    return {
        (r["rule"], r["node"], r["detail_a"], r["detail_b"])
        for r in owl_consistency(_store(spark, rows)).collect()
    }


def test_cax_dw_one_row_per_unordered_pair(spark):
    rows = [
        ("urn:A", DISJOINT_WITH, "urn:B"),
        ("urn:x", RDF_TYPE, "urn:A"),
        ("urn:x", RDF_TYPE, "urn:B"),
        ("urn:y", RDF_TYPE, "urn:A"),  # only one class -> no clash
    ]
    assert _viol(spark, rows) == {("cax-dw", "urn:x", "urn:A", "urn:B")}


def test_cax_dw_symmetric_declaration(spark):
    # declared B disjointWith A — same clash must be found, same row shape
    rows = [
        ("urn:B", DISJOINT_WITH, "urn:A"),
        ("urn:x", RDF_TYPE, "urn:A"),
        ("urn:x", RDF_TYPE, "urn:B"),
    ]
    assert _viol(spark, rows) == {("cax-dw", "urn:x", "urn:A", "urn:B")}


def test_prp_irp_self_loop_only(spark):
    rows = [
        ("urn:p", RDF_TYPE, IRREFLEXIVE),
        ("urn:x", "urn:p", "urn:x"),
        ("urn:x", "urn:p", "urn:y"),   # not a self loop
        ("urn:z", "urn:q", "urn:z"),   # undeclared property
    ]
    assert _viol(spark, rows) == {("prp-irp", "urn:x", "urn:p", "urn:x")}


def test_prp_asyp_pair_once(spark):
    rows = [
        ("urn:p", RDF_TYPE, ASYMMETRIC),
        ("urn:a", "urn:p", "urn:b"),
        ("urn:b", "urn:p", "urn:a"),
        ("urn:a", "urn:p", "urn:c"),   # no reciprocal
    ]
    assert _viol(spark, rows) == {("prp-asyp", "urn:a", "urn:p", "urn:b")}


def test_prp_pdw_and_literal_objects_do_not_crash(spark):
    rows = [
        ("urn:p", PROP_DISJOINT_WITH, "urn:q"),
        ("urn:x", "urn:p", "urn:o"),
        ("urn:x", "urn:q", "urn:o"),
        ("urn:x", "urn:p", "lit:same"),
        ("urn:x", "urn:q", "lit:same"),  # literal objects also clash (same lex)
    ]
    got = _viol(spark, rows)
    assert ("prp-pdw", "urn:x", "urn:p urn:q", "urn:o") in got
    assert ("prp-pdw", "urn:x", "urn:p urn:q", "same") in got


def _viol_terms(spark, rows):
    """rows = (s_term, p_iri_str, o_term) with real Term objects."""
    df = spark.createDataFrame(
        [triple_row(s, Iri(p), o, graph="urn:g:t") for s, p, o in rows],
        schema=TRIPLES_SCHEMA,
    )
    return {
        (r["rule"], r["node"], r["detail_a"], r["detail_b"])
        for r in owl_consistency(df).collect()
    }


def test_prp_pdw_literal_vs_iri_same_lex_no_clash(spark):
    # ADVICE r4 (medium): x p "urn:n:5" vs x q <urn:n:5> — the lexical
    # forms collide but the TERMS differ (literal vs IRI); no violation.
    rows = [
        (Iri("urn:p"), PROP_DISJOINT_WITH, Iri("urn:q")),
        (Iri("urn:x"), "urn:p", Literal("urn:n:5")),
        (Iri("urn:x"), "urn:q", Iri("urn:n:5")),
    ]
    assert _viol_terms(spark, rows) == set()


def test_prp_pdw_literals_differing_only_in_dtype_or_lang_no_clash(spark):
    xsd_int = "http://www.w3.org/2001/XMLSchema#integer"
    rows = [
        (Iri("urn:p"), PROP_DISJOINT_WITH, Iri("urn:q")),
        (Iri("urn:x"), "urn:p", Literal("5", dtype=xsd_int)),
        (Iri("urn:x"), "urn:q", Literal("5")),           # xsd:string vs xsd:integer
        (Iri("urn:y"), "urn:p", Literal("a", lang="en")),
        (Iri("urn:y"), "urn:q", Literal("a", lang="de")),  # lang differs
        (Iri("urn:z"), "urn:p", Literal("b", lang="en")),
        (Iri("urn:z"), "urn:q", Literal("b", lang="en")),  # identical -> clash
    ]
    assert _viol_terms(spark, rows) == {
        ("prp-pdw", "urn:z", "urn:p urn:q", "b"),
    }


def test_prp_asyp_literal_object_matching_subject_lex_no_clash(spark):
    # y p x where x's "reciprocal" object is a LITERAL with x's lexical
    # form — not the IRI x, so no asymmetry violation.
    rows = [
        (Iri("urn:p"), RDF_TYPE, Iri(ASYMMETRIC)),
        (Iri("urn:a"), "urn:p", Iri("urn:b")),
        (Iri("urn:b"), "urn:p", Literal("urn:a")),
    ]
    assert _viol_terms(spark, rows) == set()


def test_clean_store_empty_report(spark):
    rows = [
        ("urn:p", RDF_TYPE, ASYMMETRIC),
        ("urn:A", DISJOINT_WITH, "urn:B"),
        ("urn:a", "urn:p", "urn:b"),
        ("urn:a", RDF_TYPE, "urn:A"),
    ]
    assert _viol(spark, rows) == set()
