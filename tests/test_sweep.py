"""ACL sweep cut vs a brute-force Python mirror (same pinned integer
floors, same score/deg order, same handshake cut arithmetic)."""

from __future__ import annotations

import random


def _mirror(edges, scores, k_max=20, scale=1_000_000):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    m2 = 2 * len(und)
    order = sorted(
        (n for n in scores if n in deg),
        key=lambda n: (-(scores[n] * scale // deg[n]), n),
    )[:k_max]
    rank = {n: i + 1 for i, n in enumerate(order)}
    rows, vol, win = {}, 0, 0
    within_at = {}
    for a, b in und:
        if a in rank and b in rank:
            k = max(rank[a], rank[b])
            within_at[k] = within_at.get(k, 0) + 1
    for k, n in enumerate(order, 1):
        vol += deg[n]
        win += within_at.get(k, 0)
        cut = vol - 2 * win
        den = min(vol, m2 - vol)
        cond = 1_000_000 * cut // den if den > 0 else None
        rows[k] = (n, deg[n], vol, cut, cond)
    best = min(
        rows, key=lambda k: (rows[k][4] if rows[k][4] is not None else 2_000_000, k),
        default=None,
    )
    return {k: (*v, 1 if k == best else 0) for k, v in rows.items()}


def _run(spark, edges, scores, **kw):
    from ocaml_rdf_spark.operators.cc import sweep_cut

    edf = spark.createDataFrame(edges, "src string, dst string")
    sdf = spark.createDataFrame(list(scores.items()), "node string, score long")
    out = sweep_cut(edf, sdf, **kw).collect()
    return {
        r["k"]: (r["node"], r["deg"], r["vol"], r["cut"], r["cond_ppm"], r["is_best"])
        for r in out
    }


def test_sweep_barbell_finds_the_triangle(spark):
    edges = [("1", "2"), ("2", "3"), ("1", "3"),
             ("4", "5"), ("5", "6"), ("4", "6"), ("3", "4")]
    scores = {"1": 100, "2": 90, "3": 80, "4": 10, "5": 5, "6": 5}
    out = _run(spark, edges, scores)
    assert out == _mirror(edges, scores)
    # best prefix is the seed triangle {1,2,3}: cut=1, vol=7 → 142857
    k_best = next(k for k, v in out.items() if v[5] == 1)
    assert k_best == 3 and out[3][4] == 142_857


def test_sweep_k_max_truncates_order(spark):
    edges = [(str(i), str(i + 1)) for i in range(8)]
    scores = {str(i): 100 - i for i in range(9)}
    out = _run(spark, edges, scores, k_max=4)
    assert set(out) == {1, 2, 3, 4}
    assert out == _mirror(edges, scores, k_max=4)


def test_sweep_full_graph_prefix_has_null_conductance(spark):
    edges = [("a", "b"), ("b", "c")]
    scores = {"a": 3, "b": 2, "c": 1}
    out = _run(spark, edges, scores)
    assert out[3][4] is None  # den = 0 at the full graph
    assert out == _mirror(edges, scores)


def test_sweep_random_vs_mirror(spark):
    rng = random.Random(1919)
    for _ in range(3):
        n = rng.randint(6, 18)
        edges = [
            (str(rng.randrange(n)), str(rng.randrange(n)))
            for _ in range(rng.randint(n, 3 * n))
        ]
        scores = {str(i): rng.randrange(0, 50) for i in range(n)}
        assert _run(spark, edges, scores, k_max=8) == _mirror(edges, scores, k_max=8)
