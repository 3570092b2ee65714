"""Batch-23: Gini concentration (exact sorted-cumulative identity) and
the Poisson bootstrap (hash-deterministic Poisson(1) weights), each vs
exact Python mirrors."""

from __future__ import annotations

import hashlib
import random
import statistics


def _gini_mirror(groups):
    out = {}
    for g, vals in groups.items():
        xs = sorted(vals)
        n, s = len(xs), sum(xs)
        ws = sum((i + 1) * x for i, x in enumerate(xs))
        out[g] = (n, s,
                  (1_000_000 * (2 * ws - (n + 1) * s)) // (n * s) if s > 0 else None)
    return out


def _gini_run(spark, groups):
    from ocaml_rdf_spark.operators.stats import gini_ppm

    rows = [(g, v) for g, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, "g string, v long")
    return {r["g"]: (r["n"], r["s"], r["gini_ppm"]) for r in gini_ppm(df, "g", "v").collect()}


def test_gini_hand_cases(spark):
    groups = {
        "even": [5, 5, 5, 5],        # perfectly even → 0
        "onehot": [0, 0, 0, 10],     # → 750000
        "zero": [0, 0],              # S=0 → NULL
    }
    out = _gini_run(spark, groups)
    assert out == _gini_mirror(groups)
    assert out["even"][2] == 0
    assert out["onehot"][2] == 750_000
    assert out["zero"][2] is None


def test_gini_random_vs_mirror_and_tie_invariance(spark):
    rng = random.Random(2323)
    groups = {
        f"g{i}": [rng.randrange(0, 100) for _ in range(rng.randint(2, 40))]
        for i in range(6)
    }
    groups["ties"] = [7, 7, 7, 0, 7]  # heavy ties — rank permutation must not matter
    assert _gini_run(spark, groups) == _gini_mirror(groups)


def _boot_mirror(rows, replicates=8, seed="boot1"):
    from ocaml_rdf_spark.operators.stats import _poisson1_thresholds

    th = _poisson1_thresholds()
    out = {}
    for b in range(replicates):
        sw = swx = 0
        for i, v in rows:
            h = hashlib.md5(f"{seed}:{b}:{i}".encode()).hexdigest()
            u = int(h[:8], 16) % (1 << 30)
            w = next(k for upper, k in th if u < upper)
            sw += w
            swx += w * v
        out[b] = (sw, 1_000_000 * swx // sw if sw > 0 else None)
    return out


def _boot_run(spark, rows, replicates=8):
    from ocaml_rdf_spark.operators.stats import poisson_bootstrap

    df = spark.createDataFrame(rows, "i long, v long")
    return {
        r["b"]: (r["n_eff"], r["mean_ppm"])
        for r in poisson_bootstrap(df, "i", "v", replicates=replicates).collect()
    }


def test_bootstrap_matches_hashlib_mirror_and_is_deterministic(spark):
    rows = [(i, 100 + (i * 13) % 50) for i in range(60)]
    out1 = _boot_run(spark, rows)
    out2 = _boot_run(spark, rows)
    assert out1 == out2 == _boot_mirror(rows)


def test_bootstrap_weights_have_poisson1_mass(spark):
    # n_eff averages ≈ n across replicates (Poisson(1) mean 1), and the
    # replicate means hug the true mean at ~sigma/sqrt(n)
    rows = [(i, 1000 + (i * 37) % 200) for i in range(500)]
    out = _boot_run(spark, rows, replicates=32)
    n_effs = [v[0] for v in out.values()]
    assert abs(statistics.mean(n_effs) - 500) < 25
    true_mean = statistics.mean(v for _, v in rows)
    means = [v[1] / 1_000_000 for v in out.values()]
    assert abs(statistics.mean(means) - true_mean) < 10
    assert 0 < statistics.pstdev(means) < 15


def test_bootstrap_empty_resample_guard():
    # threshold table is a proper CDF ending at 2^30
    from ocaml_rdf_spark.operators.stats import _poisson1_thresholds

    th = _poisson1_thresholds()
    assert th[-1][0] == 1 << 30
    assert all(a[0] < b[0] for a, b in zip(th, th[1:]))
