"""Batch-26: exact-quantile winsorization and categorical TVD drift,
vs Python mirrors with the same pinned ceil-rank / floor arithmetic."""

from __future__ import annotations

import random


def _win_mirror(groups, lo_ppm, hi_ppm):
    out = {}
    for g, rows in groups.items():
        xs = sorted((v, i) for i, v in rows)
        n = len(xs)
        qr = lambda q: max(1, (q * n + 999_999) // 1_000_000)  # noqa: E731
        vlo = xs[qr(lo_ppm) - 1][0]
        vhi = xs[qr(hi_ppm) - 1][0]
        for i, v in rows:
            if v < vlo or v > vhi:
                out[(g, i)] = (v, vlo, vhi, min(max(v, vlo), vhi))
    return out


def _win_run(spark, groups, lo_ppm, hi_ppm):
    from ocaml_rdf_spark.operators.stats import winsorize

    rows = [(g, i, v) for g, rs in groups.items() for i, v in rs]
    df = spark.createDataFrame(rows, "g string, id long, v long")
    out = winsorize(df, "g", "id", "v", lo_ppm=lo_ppm, hi_ppm=hi_ppm)
    return {
        (r["g"], r["id"]): (r["v"], r["vlo"], r["vhi"], r["v_capped"])
        for r in out.collect()
    }


def test_winsorize_hand_case(spark):
    # 10 values 1..10, [25%,75%]: ranks ceil(2.5)=3, ceil(7.5)=8 → bounds
    # [3, 8]; values 1,2 cap up, 9,10 cap down
    groups = {"a": [(i, i) for i in range(1, 11)]}
    out = _win_run(spark, groups, 250_000, 750_000)
    assert out == _win_mirror(groups, 250_000, 750_000)
    assert out[("a", 1)] == (1, 3, 8, 3) and out[("a", 10)] == (10, 3, 8, 8)
    assert ("a", 3) not in out and ("a", 8) not in out


def test_winsorize_degenerate_tails_cap_nothing(spark):
    # 1%/99% on a 10-row group: ranks 1 and 10 ARE the extremes
    groups = {"a": [(i, i * 7) for i in range(10)]}
    assert _win_run(spark, groups, 10_000, 990_000) == {}


def test_winsorize_random_vs_mirror(spark):
    rng = random.Random(2626)
    groups = {
        f"g{i}": [(j, rng.randrange(-500, 500)) for j in range(rng.randint(3, 40))]
        for i in range(6)
    }
    assert _win_run(spark, groups, 200_000, 800_000) == _win_mirror(
        groups, 200_000, 800_000
    )


def _cat_mirror(a, b):
    cats = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    devs = {}
    for c in cats:
        pa = 1_000_000 * a.count(c) // na if na else 0
        pb = 1_000_000 * b.count(c) // nb if nb else 0
        devs[c] = abs(pa - pb)
    top = min(devs, key=lambda c: (-devs[c], c))
    return (na, nb, len(cats), sum(devs.values()) // 2, top, devs[top])


def _cat_run(spark, a, b):
    from ocaml_rdf_spark.operators.stats import cat_drift

    da = spark.createDataFrame([(x,) for x in a], "c string")
    db = spark.createDataFrame([(x,) for x in b], "c string")
    r = cat_drift(da, db, "c").collect()[0]
    return (r["n_a"], r["n_b"], r["n_cats"], r["tvd_ppm"], r["top_mover"], r["top_dev_ppm"])


def test_cat_identical_mix_zero(spark):
    a = ["en"] * 3 + ["de"] * 2
    out = _cat_run(spark, a, list(a))
    assert out == _cat_mirror(a, list(a))
    assert out[3] == 0


def test_cat_one_sided_category_counts_full_share(spark):
    out = _cat_run(spark, ["en", "en"], ["fr", "fr"])
    assert out == _cat_mirror(["en", "en"], ["fr", "fr"])
    assert out[3] == 1_000_000  # disjoint supports → TVD 1


def test_cat_tie_breaks_to_smallest_category(spark):
    # en and fr deviate equally → top_mover = "en"
    out = _cat_run(spark, ["en", "de"], ["fr", "de"])
    assert out == _cat_mirror(["en", "de"], ["fr", "de"])
    assert out[4] == "en"


def test_cat_random_vs_mirror(spark):
    rng = random.Random(2627)
    for _ in range(3):
        a = [rng.choice("abcde") for _ in range(rng.randint(3, 50))]
        b = [rng.choice("cdefg") for _ in range(rng.randint(3, 50))]
        assert _cat_run(spark, a, b) == _cat_mirror(a, b)
