"""Unit tests for SHACL-lite validation (operators/shacl.py) — each
constraint family in isolation plus the conforming case."""

from __future__ import annotations

from ocaml_rdf_spark.operators.shacl import SHAPES_SCHEMA, validate
from ocaml_rdf_spark.types import RDF_TYPE, TRIPLES_SCHEMA, BNode, Iri, Literal, triple_row

EX = "http://ex.org/"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def _store(spark, triples):
    rows = [triple_row(s, Iri(p), o, graph="urn:g:d") for s, p, o in triples]
    return spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)


def _shapes(spark, rows):
    return spark.createDataFrame(rows, schema=SHAPES_SCHEMA)


def _viol(df):
    return sorted((r["focus"], r["shape_id"], r["constraint"]) for r in df.collect())


def test_conforming_graph_empty_report(spark):
    store = _store(spark, [
        (Iri(EX + "a"), RDF_TYPE, Iri(EX + "T")),
        (Iri(EX + "a"), EX + "age", Literal("30", dtype=XSD_INT)),
    ])
    shapes = _shapes(spark, [("s", EX + "T", EX + "age", 1, 1, XSD_INT, None, "Literal")])
    assert validate(store, shapes).count() == 0


def test_min_and_max_count(spark):
    store = _store(spark, [
        (Iri(EX + "none"), RDF_TYPE, Iri(EX + "T")),
        (Iri(EX + "two"), RDF_TYPE, Iri(EX + "T")),
        (Iri(EX + "two"), EX + "p", Literal("1")),
        (Iri(EX + "two"), EX + "p", Literal("2")),
    ])
    shapes = _shapes(spark, [("s", EX + "T", EX + "p", 1, 1, None, None, None)])
    assert _viol(validate(store, shapes)) == [
        (EX + "none", "s", "minCount"), (EX + "two", "s", "maxCount"),
    ]


def test_datatype_and_nodekind(spark):
    store = _store(spark, [
        (Iri(EX + "x"), RDF_TYPE, Iri(EX + "T")),
        (Iri(EX + "x"), EX + "p", Literal("notint")),
        (Iri(EX + "x"), EX + "q", Iri(EX + "y")),
    ])
    shapes = _shapes(spark, [
        ("dt", EX + "T", EX + "p", None, None, XSD_INT, None, None),
        ("nk", EX + "T", EX + "q", None, None, None, None, "Literal"),
    ])
    assert _viol(validate(store, shapes)) == [
        (EX + "x", "dt", "datatype"), (EX + "x", "nk", "nodeKind"),
    ]


def test_class_constraint_and_bnode_kind(spark):
    b = BNode("b1")
    store = _store(spark, [
        (Iri(EX + "x"), RDF_TYPE, Iri(EX + "T")),
        (Iri(EX + "x"), EX + "p", Iri(EX + "good")),
        (Iri(EX + "good"), RDF_TYPE, Iri(EX + "C")),
        (Iri(EX + "x"), EX + "p", Iri(EX + "bad")),
        (Iri(EX + "x"), EX + "q", b),
    ])
    shapes = _shapes(spark, [
        ("cl", EX + "T", EX + "p", None, None, None, EX + "C", None),
        ("bk", EX + "T", EX + "q", None, None, None, None, "BlankNode"),
    ])
    assert _viol(validate(store, shapes)) == [(EX + "x", "cl", "class")]
