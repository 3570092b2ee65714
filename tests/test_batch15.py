"""Batch-15 operators: sample-and-verify φ-heavy hitters and
ε-differentially-private group counts (discrete Laplace via inverse-CDF
lookup). DP noise is checked against an exact hashlib Python mirror and
against the distribution's theoretical moments on a seeded group fleet.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F


def _hh(spark, items, **kw):
    from ocaml_rdf_spark.operators.sketches import phi_heavy_hitters

    rows = [(it, f"{i}:{it}") for i, it in enumerate(items)]
    df = spark.createDataFrame(rows, "item string, occ string")
    return {r["item"]: (r["n"], r["share_ppm"]) for r in
            phi_heavy_hitters(df, "item", "occ", **kw).collect()}


def test_hh_exact_when_unsampled(spark):
    # mod=1 → every occurrence sampled → candidate stage is exhaustive,
    # result is EXACTLY {item: count > N/k}
    items = ["a"] * 50 + ["b"] * 30 + ["c"] * 15 + ["d"] * 5
    out = _hh(spark, items, k=5, sample_mod=1)
    # N=100, threshold > 20
    assert out == {"a": (50, 500_000), "b": (30, 300_000)}


def test_hh_sampled_is_subset_with_exact_counts(spark):
    items = ["x"] * 400 + ["y"] * 300 + [f"r{i}" for i in range(300)]
    exact = {"x": (400, 400_000), "y": (300, 300_000)}
    out = _hh(spark, items, k=5, sample_mod=4)
    # N=1000, threshold > 200: the sampled pass may only LOSE candidates,
    # never fabricate counts — and at these margins it loses none
    assert set(out) <= set(exact) and all(out[k] == exact[k] for k in out)
    assert "x" in out and "y" in out


def test_hh_tie_at_threshold_excluded(spark):
    # count == N/k is NOT a heavy hitter (strict >)
    items = ["a"] * 25 + ["b"] * 75  # N=100, k=4 → threshold > 25
    out = _hh(spark, items, k=4, sample_mod=1)
    assert "a" not in out and out["b"] == (75, 750_000)


def _dp_mirror(counts, epsilon_ppm, publish_min, seed="dp1"):
    from ocaml_rdf_spark.operators.privacy import _DP_U, _dlap_thresholds

    thresholds = _dlap_thresholds(epsilon_ppm)
    out = {}
    for grp, n in counts.items():
        h = hashlib.md5(f"{seed}:{grp}".encode()).hexdigest()
        u = int(h[:8], 16) % _DP_U
        noise = next(j for upper, j in thresholds if u < upper)
        if n + noise >= publish_min:
            out[grp] = n + noise
    return out


def _dp_run(spark, counts, **kw):
    from ocaml_rdf_spark.operators.privacy import dp_group_counts

    rows = [(g, i) for g, n in counts.items() for i in range(n)]
    df = spark.createDataFrame(rows, "grp string, i long")
    return {r["grp"]: r["noisy_n"] for r in dp_group_counts(df, "grp", **kw).collect()}


def test_dp_matches_python_mirror_and_is_deterministic(spark):
    counts = {f"g{i}": 20 + i for i in range(40)}
    out1 = _dp_run(spark, counts, epsilon_ppm=500_000, publish_min=5)
    out2 = _dp_run(spark, counts, epsilon_ppm=500_000, publish_min=5)
    assert out1 == out2 == _dp_mirror(counts, 500_000, 5)


def test_dp_seed_rotation_redraws(spark):
    counts = {f"g{i}": 100 for i in range(60)}
    a = _dp_run(spark, counts, epsilon_ppm=500_000, publish_min=0, seed="dp1")
    b = _dp_run(spark, counts, epsilon_ppm=500_000, publish_min=0, seed="dp2")
    assert a != b and a == _dp_mirror(counts, 500_000, 0, "dp1")


def test_dp_suppression_threshold(spark):
    counts = {"tiny": 2, "big": 500}
    out = _dp_run(spark, counts, epsilon_ppm=1_000_000, publish_min=10)
    assert "tiny" not in out and abs(out["big"] - 500) <= 39


def test_dp_noise_moments_match_theory():
    # distribution check on the hash-uniform itself: over 20k seeds the
    # empirical mean ≈ 0 and variance ≈ 2p/(1−p)² of the (untruncated)
    # discrete Laplace — truncation at ±39 is negligible for ε = 1
    eps_ppm = 1_000_000
    mirror = _dp_mirror({f"s{i}": 0 for i in range(20_000)}, eps_ppm, -10**9)
    noises = list(mirror.values())
    p = math.exp(-1.0)
    var_theory = 2 * p / (1 - p) ** 2
    mean = sum(noises) / len(noises)
    var = sum(x * x for x in noises) / len(noises) - mean * mean
    assert abs(mean) < 0.05
    assert abs(var - var_theory) / var_theory < 0.05
    assert all(-39 <= x <= 39 for x in noises)


def test_dp_epsilon_scales_noise():
    big = _dp_mirror({f"s{i}": 0 for i in range(5_000)}, 100_000, -10**9)
    small = _dp_mirror({f"s{i}": 0 for i in range(5_000)}, 2_000_000, -10**9)
    spread = lambda d: sum(abs(v) for v in d.values()) / len(d)  # noqa: E731
    assert spread(big) > 4 * spread(small)
