"""k-anonymity / l-diversity audit invariants (operators/privacy.py).

Hand-computed fixture: 3 QI classes with sizes 3 / 2 / 1 and sensitive
diversities 3 / 1 / 1 — so k=2 flags exactly the singleton class and
l=2 flags the two low-diversity classes.
"""

from pyspark.sql import Row

from ocaml_rdf_spark.operators.privacy import k_anonymity_report, suppression_plan

ROWS = [
    Row(id=1, zip="94x", age="3x", diag="a"),
    Row(id=2, zip="94x", age="3x", diag="b"),
    Row(id=3, zip="94x", age="3x", diag="c"),
    Row(id=4, zip="94x", age="4x", diag="a"),
    Row(id=5, zip="94x", age="4x", diag="a"),
    Row(id=6, zip="10x", age="3x", diag="b"),
]


def test_k_anonymity_report(spark):
    df = spark.createDataFrame(ROWS)
    rep = {
        (r["zip"], r["age"]): r
        for r in k_anonymity_report(
            df, ["zip", "age"], k=2, sensitive_col="diag", l=2
        ).collect()
    }
    assert len(rep) == 3
    assert (rep[("94x", "3x")]["n"], rep[("94x", "3x")]["k_ok"]) == (3, 1)
    assert (rep[("94x", "4x")]["n"], rep[("94x", "4x")]["k_ok"]) == (2, 1)
    assert (rep[("10x", "3x")]["n"], rep[("10x", "3x")]["k_ok"]) == (1, 0)
    # l-diversity: class (94x,4x) has a single sensitive value despite k_ok
    assert rep[("94x", "3x")]["l_ok"] == 1
    assert rep[("94x", "4x")]["l_ok"] == 0
    assert rep[("10x", "3x")]["l_ok"] == 0


def test_k_anonymity_no_sensitive_col(spark):
    df = spark.createDataFrame(ROWS)
    out = k_anonymity_report(df, ["zip"], k=4)
    assert set(out.columns) == {"zip", "n", "k_ok"}
    got = {(r["zip"]): (r["n"], r["k_ok"]) for r in out.collect()}
    assert got == {"94x": (5, 1), "10x": (1, 0)}


def test_suppression_plan(spark):
    df = spark.createDataFrame(ROWS)
    out = suppression_plan(df, ["zip", "age"], "id", k=2).collect()
    # only the singleton class (10x,3x) — row id=6 — must be suppressed
    assert [(r["id"], r["n"]) for r in out] == [(6, 1)]
    # k=3 additionally takes the size-2 class
    ids = sorted(r["id"] for r in suppression_plan(df, ["zip", "age"], "id", k=3).collect())
    assert ids == [4, 5, 6]
