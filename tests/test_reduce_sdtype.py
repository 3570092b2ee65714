"""Transitive reduction (paths.transitive_reduction) and SDType-style
type inference (stats.sdtype_infer)."""

from pyspark.sql import functions as F

from ocaml_rdf_spark.operators.paths import transitive_reduction
from ocaml_rdf_spark.operators.stats import sdtype_infer

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_transitive_reduction_removes_all_shortcuts(spark):
    # chain a->b->c->d plus every implied shortcut
    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "d"),
         ("a", "c"), ("a", "d"), ("b", "d")],
    )
    out = {(r["src"], r["dst"]) for r in transitive_reduction(e).collect()}
    assert out == {("a", "b"), ("b", "c"), ("c", "d")}


def test_transitive_reduction_keeps_minimal_dag(spark):
    # diamond: a->b, a->c, b->d, c->d — nothing redundant
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")])
    out = {(r["src"], r["dst"]) for r in transitive_reduction(e).collect()}
    assert out == {("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")}
    # adding the a->d shortcut makes exactly it disappear
    e2 = _edges(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d")])
    out2 = {(r["src"], r["dst"]) for r in transitive_reduction(e2).collect()}
    assert out2 == out


def _quads(spark, rows):
    df = spark.createDataFrame(rows, "s_lex string, pred string, o_lex string")
    return df.select(
        F.lit(0).cast("tinyint").alias("s_kind"), "s_lex", "pred",
        F.lit(0).cast("tinyint").alias("o_kind"), "o_lex",
    )


def test_sdtype_infers_from_predicate_profile(spark):
    rows = [
        # typed people: carry 'knows' and 'name'
        ("p1", RDF_TYPE, "Person"), ("p1", "urn:p:knows", "p2"), ("p1", "urn:p:name", "x"),
        ("p2", RDF_TYPE, "Person"), ("p2", "urn:p:knows", "p1"), ("p2", "urn:p:name", "y"),
        # typed org: carries 'name' only
        ("o1", RDF_TYPE, "Org"), ("o1", "urn:p:name", "acme"),
        # untyped: has knows+name → Person (knows is the discriminator)
        ("u1", "urn:p:knows", "p1"), ("u1", "urn:p:name", "z"),
        # untyped with only 'name': ties Person(2) vs ... Person still wins 2:1
        ("u2", "urn:p:name", "w"),
    ]
    out = {r["s_lex"]: r for r in sdtype_infer(_quads(spark, rows)).collect()}
    assert out["u1"]["type_guess"] == "Person"
    # u1 evidence: knows(2 typed) + name(3 typed) = 5; score Person = 2+2
    assert out["u1"]["score"] == 4 and out["u1"]["evidence"] == 5
    assert out["u1"]["conf_ppm"] == 800000
    assert out["u2"]["type_guess"] == "Person"  # 2 Person vs 1 Org on 'name'
    assert "p1" not in out  # typed subjects are never re-predicted


def test_sdtype_no_shared_predicates_no_guess(spark):
    rows = [
        ("t1", RDF_TYPE, "T"), ("t1", "urn:p:a", "x"),
        ("u1", "urn:p:zzz", "y"),  # predicate never seen on typed data
    ]
    assert sdtype_infer(_quads(spark, rows)).count() == 0
