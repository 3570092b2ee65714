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


# --- property-pair constraints (SHACL §4.4, validate_pairs) ---------------

PAIR_COLS = "s_kind tinyint, s_lex string, pred string, o_kind tinyint, o_lex string, o_dtype string"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
XSD_STR = "http://www.w3.org/2001/XMLSchema#string"


def _pair_report(spark, rows, shapes_rows):
    from ocaml_rdf_spark.operators.shacl import PAIR_SHAPES_SCHEMA, validate_pairs
    from ocaml_rdf_spark.types import RDF_TYPE

    typed = [(0, s, RDF_TYPE, 0, "urn:c:T", None) for s in {r[1] for r in rows}]
    df = spark.createDataFrame(rows + typed, PAIR_COLS)
    shapes = spark.createDataFrame(shapes_rows, PAIR_SHAPES_SCHEMA)
    return {(r.focus, r.constraint, r.detail) for r in validate_pairs(df, shapes).collect()}


def test_pair_equals_and_disjoint(spark):
    rows = [
        (0, "urn:f:1", "urn:p:a", 2, "x", XSD_STR),
        (0, "urn:f:1", "urn:p:b", 2, "x", XSD_STR),          # equal sets: conforms
        (0, "urn:f:2", "urn:p:a", 2, "x", XSD_STR),
        (0, "urn:f:2", "urn:p:b", 2, "y", XSD_STR),          # both directions violate
        (0, "urn:f:3", "urn:p:c", 2, "z", XSD_STR),
        (0, "urn:f:3", "urn:p:d", 2, "z", XSD_STR),          # disjoint violated
        (0, "urn:f:4", "urn:p:c", 2, "z", XSD_STR),
        (0, "urn:f:4", "urn:p:d", 2, "w", XSD_STR),          # disjoint conforms
    ]
    got = _pair_report(spark, rows, [
        ("pe", "urn:c:T", "urn:p:a", "urn:p:b", "equals"),
        ("pd", "urn:c:T", "urn:p:c", "urn:p:d", "disjoint"),
    ])
    assert ("urn:f:2", "equals", "value x missing from urn:p:b") in got
    assert ("urn:f:2", "equals", "value y missing from urn:p:a") in got
    assert not any(f == "urn:f:1" for (f, _c, _d) in got)
    assert ("urn:f:3", "disjoint", "shared value z") in got
    assert not any(f == "urn:f:4" for (f, _c, _d) in got)


def test_pair_less_than_numeric_vs_lexical(spark):
    rows = [
        # numeric: 9 < 10 holds numerically, fails lexically — numeric wins
        (0, "urn:f:n", "urn:p:lo", 2, "9", XSD_INT),
        (0, "urn:f:n", "urn:p:hi", 2, "10", XSD_INT),
        # violation: 7 !< 7 for lessThan, but OK for lessThanOrEquals
        (0, "urn:f:e", "urn:p:lo", 2, "7", XSD_INT),
        (0, "urn:f:e", "urn:p:hi", 2, "7", XSD_INT),
        # strings compare lexically
        (0, "urn:f:s", "urn:p:lo", 2, "b", XSD_STR),
        (0, "urn:f:s", "urn:p:hi", 2, "a", XSD_STR),
    ]
    lt = _pair_report(spark, rows, [("plt", "urn:c:T", "urn:p:lo", "urn:p:hi", "lessThan")])
    assert ("urn:f:e", "lessThan", "value 7 !< 7") in lt
    assert ("urn:f:s", "lessThan", "value b !< a") in lt
    assert not any(f == "urn:f:n" for (f, _c, _d) in lt)
    le = _pair_report(spark, rows, [("ple", "urn:c:T", "urn:p:lo", "urn:p:hi", "lessThanOrEquals")])
    assert not any(f == "urn:f:e" for (f, _c, _d) in le)
    assert ("urn:f:s", "lessThanOrEquals", "value b !< a") in le
