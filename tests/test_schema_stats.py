"""Characteristic sets + schema/linkset induction (operators/stats.py).

Catalog statistics for the extracted KG: characteristic sets follow
Neumann & Moerkotte (ICDE 2011); schema_summary induces the
(subject class, object class) linksets per predicate from the store's
own rdf:type triples (VoID void:Linkset)."""

from pyspark.sql import functions as F

from ocaml_rdf_spark.operators.stats import characteristic_sets, schema_summary
from ocaml_rdf_spark.types import RDF_TYPE


def _quads(spark, rows):
    """rows: (s_lex, pred, o_kind, o_lex)."""
    df = spark.createDataFrame(rows, "s_lex string, pred string, o_kind int, o_lex string")
    return df.select(
        F.lit(0).cast("tinyint").alias("s_kind"),
        "s_lex",
        "pred",
        F.col("o_kind").cast("tinyint"),
        "o_lex",
        F.lit(None).cast("string").alias("o_dtype"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit("urn:g:t").alias("graph"),
    )


def test_characteristic_sets_groups_by_predicate_set(spark):
    q = _quads(
        spark,
        [
            ("e1", "urn:p:a", 2, "x"),
            ("e1", "urn:p:b", 2, "y"),
            ("e2", "urn:p:b", 2, "y"),  # same set as e3 (order differs)
            ("e2", "urn:p:a", 2, "z"),
            ("e2", "urn:p:a", 2, "w"),  # repeated pred: same SET, extra triple
            ("e3", "urn:p:a", 2, "x"),
            ("e3", "urn:p:b", 2, "x"),
            ("e4", "urn:p:c", 2, "x"),
        ],
    )
    out = {r["cset"]: r for r in characteristic_sets(q).collect()}
    assert set(out) == {"urn:p:a urn:p:b", "urn:p:c"}
    ab = out["urn:p:a urn:p:b"]
    assert ab["n_subjects"] == 3 and ab["n_triples"] == 7 and ab["n_preds"] == 2
    c = out["urn:p:c"]
    assert c["n_subjects"] == 1 and c["n_triples"] == 1 and c["n_preds"] == 1


def test_schema_summary_linksets_and_untyped(spark):
    q = _quads(
        spark,
        [
            ("e1", RDF_TYPE, 0, "urn:c:Person"),
            ("e2", RDF_TYPE, 0, "urn:c:Org"),
            ("e1", "urn:p:worksFor", 0, "e2"),
            ("e3", "urn:p:worksFor", 0, "e2"),  # untyped subject
            ("e1", "urn:p:knows", 0, "e9"),  # untyped object
            ("e1", "urn:p:name", 2, "Ada"),  # literal object: excluded
        ],
    )
    out = {(r["pred"], r["s_class"], r["o_class"]): r for r in schema_summary(q).collect()}
    assert out[("urn:p:worksFor", "urn:c:Person", "urn:c:Org")]["n_triples"] == 1
    assert out[("urn:p:worksFor", "(untyped)", "urn:c:Org")]["n_subjects"] == 1
    assert out[("urn:p:knows", "urn:c:Person", "(untyped)")]["n_objects"] == 1
    assert not any(p == "urn:p:name" for (p, _s, _o) in out)


def test_schema_summary_multityped_entity_fans_out(spark):
    q = _quads(
        spark,
        [
            ("e1", RDF_TYPE, 0, "urn:c:Person"),
            ("e1", RDF_TYPE, 0, "urn:c:Author"),
            ("e2", RDF_TYPE, 0, "urn:c:Book"),
            ("e1", "urn:p:wrote", 0, "e2"),
        ],
    )
    out = {(r["pred"], r["s_class"], r["o_class"]) for r in schema_summary(q).collect()}
    assert out == {
        ("urn:p:wrote", "urn:c:Person", "urn:c:Book"),
        ("urn:p:wrote", "urn:c:Author", "urn:c:Book"),
    }
