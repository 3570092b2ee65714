"""Differential fuzz for the round-5 additions: topo_levels vs a Python
max-relaxation mirror on random DAGs (plus cycle-refusal on arbitrary
digraphs), densest_peel vs a Python synchronous-peel mirror, and
ewma_anomaly vs a Python weight-table mirror on random series. All three
operators are integer-exact by design, so every comparison is equality,
not tolerance."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

edge = st.tuples(st.integers(0, 6), st.integers(0, 6))
edges_st = st.lists(edge, min_size=1, max_size=14, unique=True)

_SETTINGS = dict(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _edf(spark, pairs):
    return spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in pairs], "src string, dst string"
    )


def _py_topo(pairs):
    """Longest-path levels by max-relaxation to fixpoint (the operator's
    exact contract, including the all-nodes-start-at-0 seed)."""
    e = {(a, b) for a, b in pairs if a != b}
    nodes = {x for p in e for x in p}
    lvl = {n: 0 for n in nodes}
    for _ in range(len(nodes) + 1):
        changed = False
        for a, b in e:
            if lvl[a] + 1 > lvl[b]:
                lvl[b] = lvl[a] + 1
                changed = True
        if not changed:
            return lvl
    return None  # still improving after |V| rounds -> cyclic


def _py_densest(pairs, rounds):
    """Synchronous peel with the integer cross-multiply threshold."""
    e = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    out = {}
    for i in range(rounds):
        if not e:
            break
        deg: dict = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        nv, s2e = len(deg), sum(deg.values())
        weak = {n for n, d in deg.items() if d * nv * 100 <= 200 * s2e}
        for n in weak:
            out[n] = i
        e = {(a, b) for a, b in e if a not in weak and b not in weak}
    for n in {x for p in e for x in p}:
        out[n] = rounds if rounds is not None else None
    return out


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(pairs=edges_st)
def test_topo_levels_fuzz_dag(spark, pairs):
    from ocaml_rdf_spark.operators.cc import topo_levels

    # orient every edge small->large: guaranteed acyclic, arbitrary shape
    dag = [(min(a, b), max(a, b)) for a, b in pairs if a != b]
    if not dag:
        return
    want = _py_topo(dag)
    got = {r["node"]: r["level"] for r in topo_levels(_edf(spark, dag), max_rounds=16).collect()}
    assert got == {f"n{n}": l for n, l in want.items()}


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(pairs=edges_st)
def test_topo_levels_fuzz_cycle_refusal(spark, pairs):
    from ocaml_rdf_spark.operators.cc import CycleDetected, topo_levels

    # arbitrary digraph: operator must EITHER converge to the Python
    # fixpoint OR raise CycleDetected exactly when the mirror diverges
    es = [(a, b) for a, b in pairs if a != b]
    if not es:
        return
    want = _py_topo(es)
    try:
        got = {r["node"]: r["level"] for r in topo_levels(_edf(spark, es), max_rounds=10).collect()}
    except CycleDetected:
        assert want is None
        return
    assert want is not None and got == {f"n{n}": l for n, l in want.items()}


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(pairs=edges_st, rounds=st.integers(1, 6))
def test_densest_peel_fuzz(spark, pairs, rounds):
    from ocaml_rdf_spark.operators.cc import densest_peel

    und = [(a, b) for a, b in pairs if a != b]
    if not und:
        return
    want = _py_densest(und, rounds)
    got = {
        r["node"]: r["peel_round"]
        for r in densest_peel(_edf(spark, und), rounds=rounds).collect()
    }
    assert got == {f"n{n}": pr for n, pr in want.items()}


series_st = st.lists(st.integers(0, 1000), min_size=1, max_size=20)


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(xs=series_st, thr=st.integers(1_000, 500_000))
def test_ewma_anomaly_fuzz(spark, xs, thr):
    from ocaml_rdf_spark.operators.temporal import ewma_anomaly

    df = spark.createDataFrame(
        [("h", t + 1, x) for t, x in enumerate(xs)], "g string, t long, x long"
    )
    out = {r["t"]: r for r in ewma_anomaly(df, "g", "t", "x", threshold_milli=thr).collect()}
    W, num, den = 12, 1, 5
    w = {lag: num * (den - num) ** (lag - 1) * den ** (W - lag) for lag in range(1, W + 1)}
    for t in range(1, len(xs) + 1):
        n = d = 0
        for lag in range(1, W + 1):
            if t - lag >= 1:
                n += w[lag] * xs[t - lag - 1]
                d += w[lag]
        if d == 0:
            assert out[t]["pred_milli"] is None and out[t]["anomaly"] is False
        else:
            assert out[t]["pred_milli"] == 1000 * n // d, f"t={t}"
            assert out[t]["anomaly"] == (abs(xs[t - 1] * d - n) * 1000 > thr * d), f"t={t}"


wedge = st.tuples(st.integers(0, 5), st.integers(0, 5), st.integers(1, 9))
wedges_st = st.lists(wedge, min_size=1, max_size=12)


def _py_wpr(triples, iters, damping=85, scale=1_000_000):
    """Weighted PageRank mirror with the operator's exact integer
    divisions (multi-edges pre-summed)."""
    w: dict = {}
    for a, b, wt in triples:
        w[(a, b)] = w.get((a, b), 0) + wt
    nodes = {x for (a, b) in w for x in (a, b)}
    strength: dict = {}
    for (a, _b), wt in w.items():
        strength[a] = strength.get(a, 0) + wt
    base = scale * (100 - damping) // 100
    pr = {n: scale for n in nodes}
    for _ in range(iters):
        acc = {n: 0 for n in nodes}
        for (a, b), wt in w.items():
            acc[b] += pr[a] * wt // strength[a]
        pr = {n: base + damping * acc[n] // 100 for n in nodes}
    return pr


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(triples=wedges_st, iters=st.integers(1, 3))
def test_pagerank_weighted_fuzz(spark, triples, iters):
    from ocaml_rdf_spark.operators.cc import pagerank

    es = [(f"n{a}", f"n{b}", wt) for a, b, wt in triples if a != b]
    if not es:
        return
    df = spark.createDataFrame(es, "src string, dst string, w long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=iters, weight_col="w").collect()}
    want = _py_wpr([(a, b, wt) for a, b, wt in triples if a != b], iters)
    assert got == {f"n{n}": v for n, v in want.items()}
