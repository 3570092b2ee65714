"""Batch-27: max-min fair water-filling allocation vs an exact Python
mirror, including the budget-rich, rationed, and sub-minimum regimes."""

from __future__ import annotations

import random


def _fq_mirror(demands, budget):
    items = sorted(demands.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(items)
    best = (0, 0, 0)  # k, p, d
    p = 0
    for k, (_h, d) in enumerate(items, 1):
        p += d
        if p + (n - k) * d <= budget:
            best = (k, p, d)
    k, p, d = best
    if k < n:
        theta = (budget - p) // (n - k)
        slack = (budget - p) % (n - k)
    else:
        theta, slack = None, 0
    out = {}
    for h, dem in demands.items():
        alloc = dem if theta is None else min(dem, theta)
        out[h] = (dem, alloc, theta, slack)
    return out


def _fq_run(spark, demands, budget):
    from ocaml_rdf_spark.operators.urls import fair_quota

    df = spark.createDataFrame(list(demands.items()), "host string, demand long")
    return {
        r["host"]: (r["demand"], r["alloc"], r["theta"], r["slack"])
        for r in fair_quota(df, budget=budget).collect()
    }


def test_quota_budget_rich_everyone_served(spark):
    demands = {"a": 5, "b": 10, "c": 3}
    out = _fq_run(spark, demands, 100)
    assert out == _fq_mirror(demands, 100)
    assert all(v[1] == v[0] and v[2] is None for v in out.values())


def test_quota_rationed_mixed_regime(spark):
    # B=10 over demands 2,3,9,9: segment k*=1 (only "a" under the line:
    # P_1 + 3·d_1 = 8 ≤ 10 but P_2 + 2·d_2 = 11 > 10), θ = (10−2) div 3
    # = 2, slack 2 → allocations 2,2,2,2, Σ = 8 ≤ 10
    demands = {"a": 2, "b": 3, "c": 9, "d": 9}
    out = _fq_run(spark, demands, 10)
    assert out == _fq_mirror(demands, 10)
    assert out["a"] == (2, 2, 2, 2) and out["c"] == (9, 2, 2, 2)
    assert sum(v[1] for v in out.values()) == 8


def test_quota_below_smallest_demand(spark):
    demands = {"a": 50, "b": 60, "c": 70}
    out = _fq_run(spark, demands, 10)
    assert out == _fq_mirror(demands, 10)
    # k* = 0 → θ = 10 div 3 = 3, slack 1, everyone gets 3
    assert all(v[1] == 3 and v[2] == 3 and v[3] == 1 for v in out.values())
    assert sum(v[1] for v in out.values()) + 1 == 10


def test_quota_exact_boundary_all_served(spark):
    demands = {"a": 4, "b": 6}
    out = _fq_run(spark, demands, 10)
    assert out == _fq_mirror(demands, 10)
    assert all(v[2] is None for v in out.values())


def test_quota_random_vs_mirror_and_feasibility(spark):
    rng = random.Random(2727)
    for _ in range(4):
        demands = {f"h{i}": rng.randrange(1, 40) for i in range(rng.randint(2, 25))}
        budget = rng.randrange(1, sum(demands.values()) + 20)
        out = _fq_run(spark, demands, budget)
        assert out == _fq_mirror(demands, budget)
        total = sum(v[1] for v in out.values())
        assert total <= max(budget, sum(demands.values()))
        if any(v[2] is not None for v in out.values()):
            assert total <= budget  # rationed regime never overspends
