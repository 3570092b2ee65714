"""Property tables (operators/proptables.py): pivot semantics, class
guard, NULL for absent predicates, min() determinism, plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocaml_rdf_spark.operators.proptables import subject_table
from ocaml_rdf_spark.types import RDF_TYPE


def _quads(spark, rows):
    return spark.createDataFrame(
        rows,
        "s_kind int, s_lex string, pred string, o_kind int, o_lex string, "
        "o_dtype string, o_lang string, graph string",
    )


def _store(spark):
    def t(s, p, o, ok=2):
        return (0, s, p, ok, o, None, None, "urn:g")

    return _quads(
        spark,
        [
            t("urn:a", RDF_TYPE, "urn:c:Doc", ok=0),
            t("urn:a", "urn:p:title", "Alpha"),
            t("urn:a", "urn:p:year", "2001"),
            t("urn:b", RDF_TYPE, "urn:c:Doc", ok=0),
            t("urn:b", "urn:p:title", "Beta"),
            # urn:b has no year -> NULL column
            t("urn:x", "urn:p:title", "NotADoc"),  # class guard excludes
        ],
    )


def test_pivot_and_class_guard(spark):
    pt = subject_table(_store(spark), {"title": "urn:p:title", "year": "urn:p:year"}, cls="urn:c:Doc")
    rows = {r["s"]: (r["title"], r["year"]) for r in pt.collect()}
    assert rows == {"urn:a": ("Alpha", "2001"), "urn:b": ("Beta", None)}


def test_no_class_guard_includes_all_subjects(spark):
    pt = subject_table(_store(spark), {"title": "urn:p:title"})
    assert {r["s"] for r in pt.collect()} == {"urn:a", "urn:b", "urn:x"}


def test_multi_value_takes_lexicographic_min(spark):
    q = _quads(
        spark,
        [
            (0, "urn:a", "urn:p:tag", 2, "zzz", None, None, "urn:g"),
            (0, "urn:a", "urn:p:tag", 2, "aaa", None, None, "urn:g"),
        ],
    )
    (row,) = subject_table(q, {"tag": "urn:p:tag"}).collect()
    assert row["tag"] == "aaa"


def test_single_scan_single_shuffle_plan(spark):
    """The star pivot must compile to ONE Exchange (the subject groupBy) —
    no join cascade — when no class guard is used."""
    pt = subject_table(_store(spark), {"title": "urn:p:title", "year": "urn:p:year"})
    plan = pt._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
    assert "Join" not in plan
