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


def test_validate_sparql_violations_and_value_detail(spark):
    from ocaml_rdf_spark.operators.shacl import validate_sparql

    quads = spark.createDataFrame(
        [
            (0, "urn:a", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", 0, "urn:c:T", None, None, "g"),
            (0, "urn:a", "urn:p:n", 2, "-5", "http://www.w3.org/2001/XMLSchema#integer", None, "g"),
            (0, "urn:b", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", 0, "urn:c:T", None, None, "g"),
            (0, "urn:b", "urn:p:n", 2, "7", "http://www.w3.org/2001/XMLSchema#integer", None, "g"),
        ],
        "s_kind int, s_lex string, pred string, o_kind int, o_lex string, o_dtype string, o_lang string, graph string",
    )
    out = validate_sparql(
        quads,
        [(
            "s:n-nonneg",
            "n must be non-negative",
            "PREFIX p: <urn:p:> PREFIX c: <urn:c:> "
            "SELECT ?this ?value WHERE { ?this a c:T ; p:n ?value . FILTER(?value < 0) }",
        )],
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["focus"] == "urn:a" and r["shape_id"] == "s:n-nonneg"
    assert r["constraint"] == "sparql" and r["detail"].endswith(": -5")


def test_validate_sparql_requires_this(spark):
    from ocaml_rdf_spark.operators.shacl import validate_sparql

    quads = spark.createDataFrame(
        [(0, "urn:a", "urn:p:n", 2, "1", None, None, "g")],
        "s_kind int, s_lex string, pred string, o_kind int, o_lex string, o_dtype string, o_lang string, graph string",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="must project"):
        validate_sparql(quads, [("s:x", "m", "SELECT ?s WHERE { ?s ?p ?o }")]).collect()


def test_validate_sparql_conforming_graph_is_empty(spark):
    from ocaml_rdf_spark.operators.shacl import validate_sparql

    quads = spark.createDataFrame(
        [
            (0, "urn:a", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", 0, "urn:c:T", None, None, "g"),
            (0, "urn:a", "urn:p:n", 2, "3", "http://www.w3.org/2001/XMLSchema#integer", None, "g"),
        ],
        "s_kind int, s_lex string, pred string, o_kind int, o_lex string, o_dtype string, o_lang string, graph string",
    )
    out = validate_sparql(
        quads,
        [(
            "s:n-nonneg", "n must be non-negative",
            "PREFIX p: <urn:p:> PREFIX c: <urn:c:> "
            "SELECT ?this WHERE { ?this a c:T ; p:n ?v . FILTER(?v < 0) }",
        )],
    )
    assert out.count() == 0


def test_closed_shape(spark):
    from pyspark.sql import functions as F

    from ocaml_rdf_spark.operators.shacl import SHAPES_SCHEMA, validate_closed

    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    quads = spark.createDataFrame(
        [
            (0, "urn:a", RDF_TYPE, 0, "urn:C", None),
            (0, "urn:a", "urn:p:ok", 2, "x", None),
            (0, "urn:a", "urn:p:extra", 2, "y", None),   # violates
            (0, "urn:a", "urn:p:extra", 2, "z", None),   # same pred: ONE distinct row
            (0, "urn:b", RDF_TYPE, 0, "urn:C", None),
            (0, "urn:b", "urn:p:ok", 2, "w", None),      # conforms
            (0, "urn:c", "urn:p:extra", 2, "v", None),   # untargeted: ignored
        ],
        "s_kind tinyint, s_lex string, pred string, o_kind tinyint, o_lex string, o_dtype string",
    )
    shapes = spark.createDataFrame(
        [("s", "urn:C", "urn:p:ok", None, None, None, None, None)], schema=SHAPES_SCHEMA
    )
    got = [(r.focus, r.shape_id, r.constraint, r.detail)
           for r in validate_closed(quads, shapes).collect()]
    assert got == [("urn:a", "s", "closed", "unexpected urn:p:extra")]
    # sh:ignoredProperties: allow the extra pred explicitly
    got2 = validate_closed(quads, shapes, ignored=(RDF_TYPE, "urn:p:extra")).collect()
    assert got2 == []
