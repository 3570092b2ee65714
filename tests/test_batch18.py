"""Batch-18 operators: mergeable partition statistics (merge == direct
scan, any merge tree) and exact two-segment changepoint detection
(vs a brute-force Python mirror with the same pinned integer floors)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _cp_mirror(series, scale=100):
    """{g: [(t, x) ...]} → {g: (n, split_t, pre, post, score)} with the
    operator's exact flooring and smallest-s tie-break."""
    out = {}
    for g, pts in series.items():
        pts = sorted(pts)
        n = len(pts)
        if n < 2:
            continue
        tot = sum(x for _, x in pts)
        best = None
        a = 0
        for s in range(1, n):
            a += pts[s - 1][1]
            b = tot - a
            score = scale * a * a // s + scale * b * b // (n - s)
            key = (score, -s)
            if best is None or key > best[0]:
                best = (key, (n, pts[s - 1][0], scale * a // s,
                              scale * b // (n - s), score))
        out[g] = best[1]
    return out


def _cp_run(spark, series, scale=100):
    from ocaml_rdf_spark.operators.temporal import changepoint

    rows = [(g, t, x) for g, pts in series.items() for t, x in pts]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    return {
        r["grp"]: (r["n"], r["split_t"], r["pre_mean_xs"], r["post_mean_xs"], r["score"])
        for r in changepoint(df, "g", "t", "x", scale=scale).collect()
    }


def test_cp_recovers_clean_step(spark):
    series = {"a": [(t, 10 if t < 6 else 90) for t in range(12)]}
    out = _cp_run(spark, series)
    assert out["a"][1] == 5  # last t of the left segment
    assert out["a"][2] == 1000 and out["a"][3] == 9000
    assert out == _cp_mirror(series)


def test_cp_constant_series_ties_to_smallest_split(spark):
    series = {"c": [(t, 7) for t in range(6)]}
    out = _cp_run(spark, series)
    assert out["c"][1] == 0  # all splits tie; s=1 wins → split_t = first t
    assert out == _cp_mirror(series)


def test_cp_singleton_group_emits_nothing(spark):
    assert _cp_run(spark, {"s": [(1, 5)]}) == {}


def test_cp_random_vs_mirror(spark):
    rng = random.Random(1818)
    series = {
        f"g{i}": [(t, rng.randrange(0, 200)) for t in range(rng.randint(2, 25))]
        for i in range(8)
    }
    assert _cp_run(spark, series) == _cp_mirror(series)


def test_stats_merge_equals_direct_and_any_merge_tree(spark):
    from ocaml_rdf_spark.operators.sketches import merge_stats, partition_stats

    rng = random.Random(8181)
    rows = [(rng.randrange(16), rng.randrange(1000)) for _ in range(5000)]
    df = spark.createDataFrame(rows, "part long, val long")

    def merged(part_expr):
        d = df.withColumn("part", part_expr)
        sc, rg = partition_stats(d, "part", "val")
        r = merge_stats(sc, rg).collect()[0]
        return (r["n"], r["vsum"], r["vmin"], r["vmax"], r["nb"], r["s_sum"], r["est"])

    by16 = merged(F.col("part"))
    by4 = merged(F.col("part") % 4)     # coarser partitioning
    single = merged(F.lit(0))           # one "file" == direct scan
    assert by16 == by4 == single
    # scalar sanity vs direct computation
    n, vsum, vmin, vmax = (
        len(rows), sum(v for _, v in rows),
        min(v for _, v in rows), max(v for _, v in rows),
    )
    assert single[:4] == (n, vsum, vmin, vmax)
    # estimate is within HLL error of the true distinct count
    true_d = len({v for _, v in rows})
    assert abs(single[6] - true_d) < 0.35 * true_d
