"""Parallel-pivot correlation clustering (operators/cc.py::pivot_clusters)
— differential vs a pure-Python mirror of the same deterministic
ParallelPivot rounds, plus the ER chain-breaking property that motivates
it over connected components."""

import hashlib
import random
from collections import defaultdict

from ocaml_rdf_spark.operators.cc import pivot_clusters


def _rank(seed, v):
    return hashlib.md5(f"{seed}:{v}".encode()).hexdigest()


def mirror(edges, seed="pivot", rounds=6):
    adj, nodes = defaultdict(set), set()
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
            nodes |= {a, b}
    active, out = set(nodes), {}
    for _ in range(rounds):
        if not active:
            break
        piv = {v for v in active
               if all(_rank(seed, v) < _rank(seed, u) for u in adj[v] & active)}
        new = {p: p for p in piv}
        for u in active - piv:
            cands = [p for p in adj[u] & active if p in piv]
            if cands:
                new[u] = min(cands, key=lambda p: _rank(seed, p))
        out.update(new)
        active -= set(new)
    for u in active:
        out[u] = u
    return out


def spark_result(spark, edges, rounds=6):
    df = spark.createDataFrame(edges, "a string, b string")
    return {r.node: r.cluster for r in pivot_clusters(df, rounds=rounds).collect()}


def test_differential_random_graphs(spark):
    rng = random.Random(42)
    for n, m in ((12, 18), (30, 45), (60, 50)):
        nodes = [f"n{i}" for i in range(n)]
        edges = list({(rng.choice(nodes), rng.choice(nodes)) for _ in range(m)})
        got = spark_result(spark, edges)
        want = mirror(edges)
        assert got == want, (n, m)


def test_chain_does_not_snowball(spark):
    # 40-node pairwise-match chain: CC would produce ONE mega-entity;
    # pivot clustering cuts it into pivot-adjacent pieces of size <= 3
    # (a pivot plus at most its two chain neighbors)
    edges = [(f"c{i}", f"c{i+1}") for i in range(39)]
    got = spark_result(spark, edges)
    sizes = defaultdict(int)
    for _v, c in got.items():
        sizes[c] += 1
    assert len(got) == 40
    assert max(sizes.values()) <= 3
    assert len(sizes) >= 40 // 3
    # every member is the pivot itself or adjacent to its pivot
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    for v, c in got.items():
        assert v == c or c in adj[v]


def test_deterministic_across_runs(spark):
    edges = [("x1", "x2"), ("x2", "x3"), ("x1", "x3"), ("x4", "x5")]
    a = spark_result(spark, edges)
    b = spark_result(spark, edges)
    assert a == b == mirror(edges)
