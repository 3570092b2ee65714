"""Batch-17 operators: Hampel MAD outlier screen (exact lower-median
arithmetic) and Benford first-digit audit (TVD statistic), each vs a
pure-Python mirror with the same pinned integer floors."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocaml_rdf_spark.operators.stats import BENFORD_PPM


def _mad_run(spark, rows, k_mad=3):
    from ocaml_rdf_spark.operators.stats import mad_outliers

    df = spark.createDataFrame(rows, "g string, val long")
    out = mad_outliers(df, "g", "val", k_mad=k_mad)
    return {(r["g"], r["val"], r["med"], r["mad"]) for r in out.collect()}


def test_mad_hand_case_odd_group(spark):
    # vals 1..7 plus outlier 100: med of [1..7,100] (n=8, lower) = 4,
    # adevs [3,2,1,0,1,2,3,96] → MAD (lower of n=8) = 2 → flag |x−4|>6
    rows = [("a", v) for v in [1, 2, 3, 4, 5, 6, 7, 100]]
    assert _mad_run(spark, rows) == {("a", 100, 4, 2)}


def test_mad_zero_mad_flags_any_deviation(spark):
    rows = [("a", 5)] * 6 + [("a", 7)]
    assert _mad_run(spark, rows) == {("a", 7, 5, 0)}


def test_mad_threshold_is_strict(spark):
    # med=3, MAD=1 → k=3 bound is |x−3|>3: x=6 NOT flagged, x=7 flagged
    # sorted [1..7] n=7 → med=4; adevs [3,2,1,0,1,2,3] sorted
    # [0,1,1,2,2,3,3] → MAD=2 → flag |x−4|>6: none (strict >)
    rows = [("a", v) for v in [1, 2, 3, 4, 5, 6, 7]]
    assert _mad_run(spark, rows) == set()


def test_mad_groups_are_independent(spark):
    rows = [("a", v) for v in [10, 10, 10, 50]] + [("b", v) for v in [50, 50, 50, 10]]
    out = _mad_run(spark, rows)
    assert out == {("a", 50, 10, 0), ("b", 10, 50, 0)}


def _benford_mirror(vals, min_n=1):
    digits = [next(int(c) for c in str(abs(v)) if c in "123456789")
              for v in vals if any(c in "123456789" for c in str(abs(v)))]
    n = len(digits)
    if n < min_n:
        return None
    per = {d: digits.count(d) for d in set(digits)}
    tv = sum(abs(1_000_000 * o // n - BENFORD_PPM[d - 1]) for d, o in per.items())
    tv += sum(BENFORD_PPM) - sum(BENFORD_PPM[d - 1] for d in per)
    share1 = 1_000_000 * per.get(1, 0) // n if 1 in per else 0
    top = max(per.items(), key=lambda kv: (kv[1], -kv[0]))[0]
    return (n, tv // 2, share1, top)


def _benford_run(spark, groups, min_n=1):
    from ocaml_rdf_spark.operators.stats import benford_audit

    rows = [(g, v) for g, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, "g string, val long")
    return {
        r["grp"]: (r["n"], r["tvd_ppm"], r["share1_ppm"], r["top_digit"])
        for r in benford_audit(df, "g", "val", min_n=min_n).collect()
    }


def test_benford_single_digit_group_vs_mirror(spark):
    vals = [500 + i % 7 for i in range(100)]  # always first digit 5
    out = _benford_run(spark, {"t": vals})
    assert out["t"] == _benford_mirror(vals)
    n, tvd, share1, top = out["t"]
    assert top == 5 and share1 == 0 and tvd > 900_000


def test_benford_conforming_group_scores_low(spark):
    # counts proportional to Benford shares (n=1000)
    vals = []
    for d in range(1, 10):
        vals += [d * 100] * round(1000 * BENFORD_PPM[d - 1] / 1_000_000)
    out = _benford_run(spark, {"ok": vals})
    assert out["ok"] == _benford_mirror(vals)
    assert out["ok"][1] < 5_000  # tvd_ppm ≈ rounding only


def test_benford_zero_and_negative_handling(spark):
    vals = [0, 0, -300, -41, 52, 0]
    out = _benford_run(spark, {"g": vals})
    # zeros excluded → n=3, digits {3,4,5}
    assert out["g"] == _benford_mirror(vals)
    assert out["g"][0] == 3


def test_benford_min_n_drops_small_groups(spark):
    out = _benford_run(spark, {"small": [123] * 5, "big": [123] * 60}, min_n=50)
    assert "small" not in out and out["big"][0] == 60
