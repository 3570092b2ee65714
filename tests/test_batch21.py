"""Batch-21 graph-release privacy: H1/H2 structural signatures and the
greedy k-degree anonymization quote, vs exact Python mirrors."""

from __future__ import annotations

import random


def _sig_mirror(edges, max_sig_degs=64):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    deg = {v: len(us) for v, us in adj.items()}
    out = {}
    for v in adj:
        s1 = str(deg[v])
        out[(1, s1)] = out.get((1, s1), 0) + 1
        nd = sorted(deg[u] for u in adj[v])[:max_sig_degs]
        s2 = f"{deg[v]}|{','.join(map(str, nd))}"
        out[(2, s2)] = out.get((2, s2), 0) + 1
    return out


def _sig_run(spark, edges, **kw):
    from ocaml_rdf_spark.operators.privacy import graph_anonymity

    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        (r["level"], r["sig"]): r["n"] for r in graph_anonymity(df, **kw).collect()
    }


def test_anonymity_star_vs_path(spark):
    # star: center uniquely identifiable at H1 already; leaves are a
    # class of 4. Path of 3: middle unique at H1.
    edges = [("c", f"l{i}") for i in range(4)] + [("x", "y"), ("y", "z")]
    out = _sig_run(spark, edges)
    assert out == _sig_mirror(edges)
    assert out[(1, "4")] == 1          # the star center
    assert out[(1, "1")] == 6          # 4 leaves + path ends
    assert out[(2, "2|1,1")] == 1      # path middle unique at H2


def test_anonymity_h2_splits_h1_classes(spark):
    # two deg-2 nodes with different neighbor profiles: same H1 class,
    # different H2 classes
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f")]
    out = _sig_run(spark, edges)
    assert out == _sig_mirror(edges)
    h1_deg2 = out[(1, "2")]
    h2_deg2 = {k: v for k, v in out.items() if k[0] == 2 and k[1].startswith("2|")}
    assert h1_deg2 == 4 and len(h2_deg2) >= 2


def test_anonymity_truncation_merges_classes(spark):
    # cap 2: a deg-3 node's signature keeps only 2 neighbor degrees
    edges = [("h", f"n{i}") for i in range(3)] + [("n0", "n1")]
    full = _sig_run(spark, edges)
    capped = _sig_run(spark, edges, max_sig_degs=2)
    assert capped == _sig_mirror(edges, max_sig_degs=2)
    assert sum(v for (l, s), v in capped.items() if l == 2) == sum(
        v for (l, s), v in full.items() if l == 2
    )


def _kdeg_mirror(edges, k):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    seq = sorted(deg.values(), reverse=True)
    n = len(seq)
    n_groups = max(1, n // k)
    cost = 0
    groups = [[] for _ in range(n_groups)]
    for i, d in enumerate(seq):
        groups[min(i // k, n_groups - 1)].append(d)
    for g in groups:
        cost += sum(max(g) - d for d in g)
    return (k, n, n_groups, cost)


def _kdeg_run(spark, edges, k):
    from ocaml_rdf_spark.operators.privacy import kdeg_cost

    df = spark.createDataFrame(edges, "src string, dst string")
    r = kdeg_cost(df, k=k).collect()[0]
    return (r["k"], r["n_nodes"], r["n_groups"], r["added_degree_total"])


def test_kdeg_uniform_degrees_cost_zero(spark):
    edges = [("a", "b"), ("c", "d"), ("e", "f")]
    assert _kdeg_run(spark, edges, 3) == _kdeg_mirror(edges, 3) == (3, 6, 2, 0)


def test_kdeg_remainder_absorbed_into_last_group(spark):
    # 5 nodes, k=2 → 2 groups (last absorbs 3)
    edges = [("c", f"l{i}") for i in range(4)]
    out = _kdeg_run(spark, edges, 2)
    assert out == _kdeg_mirror(edges, 2)
    assert out[2] == 2


def test_kdeg_random_vs_mirror(spark):
    rng = random.Random(2121)
    for _ in range(3):
        n = rng.randint(5, 25)
        edges = [
            (str(rng.randrange(n)), str(rng.randrange(n)))
            for _ in range(rng.randint(n, 3 * n))
        ]
        k = rng.randint(2, 6)
        assert _kdeg_run(spark, edges, k) == _kdeg_mirror(edges, k)
