"""Borůvka minimum spanning forest vs an exact Python Kruskal mirror
(same (w, a, b) edge total order, same lightest-parallel-edge collapse)
on hand graphs and seeded random graphs — connected, disconnected,
parallel-edge, tied-weight, and chain-diameter shapes."""

from __future__ import annotations

import random


def _kruskal(edges):
    best = {}
    for a, b, w in edges:
        if a == b:
            continue
        key = (min(a, b), max(a, b))
        if key not in best or w < best[key]:
            best[key] = w
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for (a, b), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


def _spark_msf(spark, edges, **kw):
    from ocaml_rdf_spark.operators.cc import boruvka_msf

    df = spark.createDataFrame(edges, "a long, b long, w long")
    return {(r["a"], r["b"], r["w"]) for r in boruvka_msf(df, **kw).collect()}


def test_msf_hand_triangle_plus_tail(spark):
    edges = [(1, 2, 5), (2, 3, 4), (1, 3, 3), (3, 4, 9)]
    # cycle 1-2-3: drop the heaviest (1,2,5)
    assert _spark_msf(spark, edges) == {(2, 3, 4), (1, 3, 3), (3, 4, 9)}


def test_msf_parallel_edges_and_self_loops(spark):
    edges = [(1, 2, 9), (2, 1, 4), (1, 1, 1), (2, 3, 7), (3, 2, 7)]
    assert _spark_msf(spark, edges) == {(1, 2, 4), (2, 3, 7)}


def test_msf_tied_weights_resolve_by_edge_id(spark):
    # triangle with all weights equal: key order (w,a,b) keeps
    # (1,2) and (1,3), drops (2,3)
    edges = [(1, 2, 5), (1, 3, 5), (2, 3, 5)]
    out = _spark_msf(spark, edges)
    assert out == {(1, 2, 5), (1, 3, 5)} == _kruskal(edges)


def test_msf_disconnected_forest(spark):
    edges = [(1, 2, 1), (3, 4, 2), (4, 5, 3), (3, 5, 9)]
    out = _spark_msf(spark, edges)
    assert out == {(1, 2, 1), (3, 4, 2), (4, 5, 3)} == _kruskal(edges)


def test_msf_long_chain_diameter(spark):
    # 40-node chain + heavy chords: O(log V) rounds must still finish
    edges = [(i, i + 1, 100 + i) for i in range(40)]
    edges += [(i, i + 7, 10_000 + i) for i in range(0, 33, 3)]
    assert _spark_msf(spark, edges) == _kruskal(edges)


def test_msf_random_vs_kruskal(spark):
    rng = random.Random(1616)
    for trial in range(4):
        n = rng.randint(8, 40)
        m = rng.randint(n // 2, 3 * n)
        edges = [
            (rng.randrange(n), rng.randrange(n), rng.randrange(1, 50))
            for _ in range(m)
        ]
        assert _spark_msf(spark, edges) == _kruskal(edges), (trial, edges)


def test_single_linkage_equals_thresholded_components(spark):
    # the defining property, on random graphs: cutting the MSF at tau
    # gives exactly the components of the tau-thresholded graph
    from ocaml_rdf_spark.operators.cc import boruvka_msf, connected_components
    from pyspark.sql import functions as F

    rng = random.Random(2718)
    for _ in range(2):
        n = rng.randint(10, 30)
        edges = [
            (rng.randrange(n), rng.randrange(n), rng.randrange(1, 100))
            for _ in range(rng.randint(n, 3 * n))
        ]
        tau = rng.randrange(20, 80)
        df = spark.createDataFrame(edges, "a long, b long, w long")
        cut = boruvka_msf(df).filter(F.col("w") < tau)

        def comps(edf):
            cc = connected_components(
                edf.select(F.col("a").cast("string").alias("src"),
                           F.col("b").cast("string").alias("dst"))
            ).collect()
            lab = {r["node"]: r["component"] for r in cc}
            groups = {}
            for node in {str(a) for a, b, w in edges} | {str(b) for a, b, w in edges}:
                groups.setdefault(lab.get(node, node), set()).add(node)
            return {frozenset(g) for g in groups.values()}

        direct = comps(df.filter(F.col("w") < tau).filter(F.col("a") != F.col("b")))
        via_msf = comps(cut)
        assert direct == via_msf
