"""Batch-20 file-layout analytics: zone-map pruning boundaries and
interval overlap depth (join-free sort-position counting vs a brute
O(F²) Python mirror)."""

from __future__ import annotations

import random


def _zm(spark, files, lo, hi):
    from ocaml_rdf_spark.operators.sketches import zonemap_prune

    df = spark.createDataFrame(
        files, "layout string, part long, n long, vmin long, vmax long"
    )
    return {
        r["layout"]: (r["n_files"], r["files_scanned"], r["rows_total"],
                      r["rows_scanned"], r["skip_ppm"])
        for r in zonemap_prune(df, lo, hi).collect()
    }


def test_zonemap_boundary_inclusive(spark):
    files = [
        ("l", 0, 10, 0, 99),      # vmax == lo → touches, scanned
        ("l", 1, 10, 100, 199),   # inside
        ("l", 2, 10, 200, 300),   # vmin == hi → touches, scanned
        ("l", 3, 10, 301, 400),   # beyond → skipped
        ("l", 4, 10, 0, 98),      # below → skipped
    ]
    out = _zm(spark, files, 99, 200)
    assert out["l"] == (5, 3, 50, 30, 400_000)


def _od(spark, files):
    from ocaml_rdf_spark.operators.sketches import overlap_depth

    df = spark.createDataFrame(
        files, "layout string, part long, n long, vmin long, vmax long"
    )
    return {
        r["layout"]: (r["n_files"], r["avg_overlap_x100"], r["max_overlap"])
        for r in overlap_depth(df).collect()
    }


def _od_mirror(files):
    out = {}
    layouts = {f[0] for f in files}
    for lay in layouts:
        fs = [f for f in files if f[0] == lay]
        ovs = [
            sum(1 for g in fs if g[3] <= f[4] and g[4] >= f[3]) - 1 for f in fs
        ]
        out[lay] = (len(fs), 100 * sum(ovs) // len(ovs), max(ovs))
    return out


def test_overlap_disjoint_touching_nested(spark):
    files = [
        ("a", 0, 1, 0, 9), ("a", 1, 1, 20, 29),          # disjoint
        ("b", 0, 1, 0, 10), ("b", 1, 1, 10, 20),         # touching endpoints overlap
        ("c", 0, 1, 0, 100), ("c", 1, 1, 10, 20), ("c", 2, 1, 30, 40),  # nested
    ]
    out = _od(spark, files)
    assert out == _od_mirror(files)
    assert out["a"] == (2, 0, 0)
    assert out["b"] == (2, 100, 1)
    assert out["c"] == (3, 133, 2)


def test_overlap_random_vs_mirror(spark):
    rng = random.Random(2020)
    files = []
    for lay in ("x", "y"):
        for p in range(rng.randint(5, 25)):
            a = rng.randrange(0, 200)
            files.append((lay, p, 1, a, a + rng.randrange(0, 60)))
    assert _od(spark, files) == _od_mirror(files)


def test_overlap_duplicate_zones(spark):
    # identical zones all overlap each other
    files = [("d", p, 1, 50, 60) for p in range(4)]
    out = _od(spark, files)
    assert out == _od_mirror(files) == {"d": (4, 300, 3)}
