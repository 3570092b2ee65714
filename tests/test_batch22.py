"""Batch-22: rich-club coefficient curve and precision-recall threshold
curve, each vs exact Python mirrors."""

from __future__ import annotations

import random


def _rc_mirror(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out = {}
    for k in sorted(set(deg.values())):
        nodes = [v for v, d in deg.items() if d > k]
        n_k = len(nodes)
        if n_k < 2:
            continue
        sel = set(nodes)
        e_k = sum(1 for a, b in und if a in sel and b in sel)
        out[k] = (n_k, e_k, 1_000_000 * 2 * e_k // (n_k * (n_k - 1)))
    return out


def _rc_run(spark, edges):
    from ocaml_rdf_spark.operators.cc import rich_club

    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["k"]: (r["n_k"], r["e_k"], r["phi_ppm"]) for r in rich_club(df).collect()}


def test_rich_club_triangle_with_pendant(spark):
    edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
    out = _rc_run(spark, edges)
    # only k=1 qualifies (deg>2 leaves a single node): the deg>1 core is
    # the triangle, fully connected → phi = 1.0
    assert out == _rc_mirror(edges) == {1: (3, 3, 1_000_000)}


def test_rich_club_random_vs_mirror(spark):
    rng = random.Random(2222)
    for _ in range(3):
        n = rng.randint(6, 20)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(n, 4 * n))
        ]
        assert _rc_run(spark, edges) == _rc_mirror(edges)


def _pr_mirror(pairs):
    thrs = sorted({s for s, _ in pairs}, reverse=True)
    p_total = sum(t for _, t in pairs)
    out = {}
    best = None
    for thr in thrs:
        tp = sum(t for s, t in pairs if s >= thr)
        fp = sum(1 - t for s, t in pairs if s >= thr)
        fn = p_total - tp
        prec = 1_000_000 * tp // (tp + fp)
        rec = 1_000_000 * tp // (tp + fn) if tp + fn > 0 else 0
        f1 = 2 * prec * rec // (prec + rec) if prec + rec > 0 else 0
        out[thr] = [tp, fp, fn, prec, rec, f1, 0]
        if best is None or (f1, thr) > best[:2]:
            best = (f1, thr)
    out[best[1]][6] = 1
    return {k: tuple(v) for k, v in out.items()}


def _pr_run(spark, pairs):
    from ocaml_rdf_spark.operators.stats import pr_curve

    df = spark.createDataFrame(pairs, "score long, is_true int")
    return {
        r["thr"]: (r["tp"], r["fp"], r["fn"], r["prec_ppm"], r["rec_ppm"],
                   r["f1_ppm"], r["is_best"])
        for r in pr_curve(df).collect()
    }


def test_pr_curve_hand_case(spark):
    pairs = [(10, 1), (8, 0), (8, 1), (5, 0)]
    out = _pr_run(spark, pairs)
    assert out == _pr_mirror(pairs)
    assert out[10] == (1, 0, 1, 1_000_000, 500_000, 666_666, 0)
    assert out[8][:3] == (2, 1, 0) and out[8][6] == 1  # max F1 at thr=8
    assert out[5] == (2, 2, 0, 500_000, 1_000_000, 666_666, 0)


def test_pr_curve_all_true_and_all_false(spark):
    out = _pr_run(spark, [(3, 1), (1, 1)])
    assert out[1] == (2, 0, 0, 1_000_000, 1_000_000, 1_000_000, 1)
    out2 = _pr_run(spark, [(3, 0), (1, 0)])
    assert all(v[3] == 0 and v[5] == 0 for v in out2.values())
    assert sum(v[6] for v in out2.values()) == 1  # ties → highest thr flagged
    assert out2[3][6] == 1


def test_pr_curve_random_vs_mirror(spark):
    rng = random.Random(2223)
    for _ in range(3):
        pairs = [
            (rng.randrange(0, 30), rng.randrange(2))
            for _ in range(rng.randint(5, 60))
        ]
        assert _pr_run(spark, pairs) == _pr_mirror(pairs)
