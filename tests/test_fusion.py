"""Knowledge fusion / truth discovery (operators/fusion.py).

Semantics under test (Knowledge-Vault-style source voting; the conflict-
resolution stage the reference's set-semantics add_triple leaves to the
pipeline — SURVEY §2.1):

- winner per (subject, functional pred) = highest weighted vote mass,
  ties broken deterministically (o_kind, then lexicals);
- duplicate assertions by ONE source count once (set semantics);
- source_accuracy = fraction of a source's claims matching consensus;
- truth_discovery round 2 re-votes with integer accuracy weights and
  flips keys the uniform round only tie-broke lexicographically.
"""

import pytest
from pyspark.sql import functions as F

from ocaml_rdf_spark.operators.fusion import (
    fuse_functional,
    source_accuracy,
    truth_discovery,
)

PRED = "urn:p:city"


def _claims(spark, rows):
    """rows: (subj, obj, graph) — IRI claims over PRED."""
    df = spark.createDataFrame(rows, "s_lex string, o_lex string, graph string")
    n = F.lit(None).cast("string")
    return df.select(
        F.lit(0).cast("tinyint").alias("s_kind"),
        "s_lex",
        F.lit(PRED).alias("pred"),
        F.lit(0).cast("tinyint").alias("o_kind"),
        "o_lex",
        n.alias("o_dtype"),
        n.alias("o_lang"),
        "graph",
    )


def test_majority_wins_and_confidence(spark):
    q = _claims(
        spark,
        [
            ("e1", "paris", "A"),
            ("e1", "paris", "B"),
            ("e1", "london", "C"),
        ],
    )
    row = fuse_functional(q).collect()[0]
    assert row["o_lex"] == "paris"
    assert row["votes"] == 2 and row["total_votes"] == 3
    assert row["n_values"] == 2 and row["n_sources"] == 2
    assert row["confidence"] == pytest.approx(2 / 3)


def test_duplicate_assertions_by_one_source_count_once(spark):
    q = _claims(
        spark,
        [
            ("e1", "paris", "A"),
            ("e1", "paris", "A"),  # same source repeats itself
            ("e1", "london", "B"),
            ("e1", "london", "C"),
        ],
    )
    row = fuse_functional(q).collect()[0]
    assert row["o_lex"] == "london"  # 2 sources beat 1 source repeating


def test_tie_breaks_lexicographically(spark):
    q = _claims(spark, [("e1", "zurich", "A"), ("e1", "ankara", "B")])
    row = fuse_functional(q).collect()[0]
    assert row["o_lex"] == "ankara" and row["confidence"] == pytest.approx(0.5)


def test_weighted_vote_overrides_majority(spark):
    q = _claims(
        spark,
        [("e1", "paris", "A"), ("e1", "london", "B"), ("e1", "london", "C")],
    )
    wts = spark.createDataFrame([("A", 5)], "graph string, weight long")
    row = fuse_functional(q, weights=wts, default_weight=1).collect()[0]
    assert row["o_lex"] == "paris" and row["votes"] == 5 and row["total_votes"] == 7


def test_source_accuracy(spark):
    q = _claims(
        spark,
        [
            ("e1", "paris", "A"),
            ("e1", "paris", "B"),
            ("e1", "london", "C"),
            ("e2", "rome", "A"),
            ("e2", "rome", "C"),
        ],
    )
    winners = fuse_functional(q)
    acc = {r["graph"]: r for r in source_accuracy(q, winners).collect()}
    assert acc["A"]["n_claims"] == 2 and acc["A"]["n_correct"] == 2
    assert acc["A"]["accuracy"] == pytest.approx(1.0)
    assert acc["B"]["accuracy"] == pytest.approx(1.0)  # 1/1
    assert acc["C"]["n_claims"] == 2 and acc["C"]["n_correct"] == 1
    assert acc["C"]["accuracy"] == pytest.approx(0.5)


def test_truth_discovery_flips_uniform_tie(spark):
    # e1: A says x, B says z — uniform round tie-breaks to 'x' (lex min).
    # A is perfect elsewhere (e2, e3 corroborated); B is wrong elsewhere.
    # Round 2: weight(A)=1000 > weight(B), so e1 stays A's value even if
    # it were lexicographically larger — use y vs a to prove the flip.
    q = _claims(
        spark,
        [
            ("e1", "y", "A"),
            ("e1", "a", "B"),
            ("e2", "rome", "A"),
            ("e2", "rome", "C"),
            ("e3", "oslo", "A"),
            ("e3", "oslo", "C"),
            ("e2", "cairo", "B"),
        ],
    )
    uniform = {r["s_lex"]: r["o_lex"] for r in fuse_functional(q).collect()}
    assert uniform["e1"] == "a"  # pure lexicographic tie-break
    final = {r["s_lex"]: r["o_lex"] for r in truth_discovery(q, iters=2).collect()}
    assert final["e1"] == "y"  # A's track record outvotes B
    assert final["e2"] == "rome" and final["e3"] == "oslo"


def test_disagreeing_dtype_lang_are_distinct_values(spark):
    base = _claims(spark, [("e1", "42", "A"), ("e1", "42", "B")])
    typed = base.withColumn(
        "o_dtype",
        F.when(F.col("graph") == "A", F.lit("urn:t:int")).otherwise(F.lit("urn:t:str")),
    )
    out = fuse_functional(typed).collect()
    assert len(out) == 1 and out[0]["n_values"] == 2  # same lex, two values
