"""Batch-14 operators: Krippendorff's alpha (inter-annotator reliability
with missing ratings) and prefix-blocked Levenshtein ER verification.

Alpha is checked against an exact-rational Python mirror (fractions) that
reproduces the operator's pinned per-unit integer flooring, on both a
hand-built case and seeded random labelings with missing data.
"""

from __future__ import annotations

import random
from fractions import Fraction

from pyspark.sql import functions as F


def _alpha_mirror(ratings):
    """(item, rater, label) triples → dict matching krippendorff_alpha's
    one-row output, with the SAME pinned arithmetic (per-unit 10^6-scaled
    floor, then the final floor div)."""
    per = {}
    for item, rater, label in ratings:
        key = (item, rater)
        per[key] = min(per.get(key, label), label)
    units = {}
    for (item, _r), label in per.items():
        units.setdefault(item, []).append(label)
    units = {u: ls for u, ls in units.items() if len(ls) >= 2}
    n = sum(len(ls) for ls in units.values())
    do_scaled = 0
    cat = {}
    for ls in units.values():
        n_u = len(ls)
        s_u = sum(ls.count(c) ** 2 for c in set(ls))
        do_scaled += (1_000_000 * (n_u * n_u - s_u)) // (n_u - 1)
        for c in ls:
            cat[c] = cat.get(c, 0) + 1
    de_num = n * n - sum(v * v for v in cat.values())
    alpha = (
        1_000_000 - ((n - 1) * do_scaled) // de_num if de_num > 0 else None
    )
    return {
        "n_units": len(units), "n_ratings": n,
        "do_scaled": do_scaled, "de_num": de_num, "alpha_ppm": alpha,
    }


def _run_alpha(spark, ratings):
    from ocaml_rdf_spark.operators.stats import krippendorff_alpha

    df = spark.createDataFrame(ratings, "item long, rater string, label string")
    return krippendorff_alpha(df).collect()[0].asDict()


def test_alpha_perfect_agreement(spark):
    ratings = [(i, r, "X" if i % 2 else "Y") for i in range(10) for r in ("a", "b", "c")]
    out = _run_alpha(spark, ratings)
    assert out["alpha_ppm"] == 1_000_000
    assert out == _alpha_mirror(ratings)


def test_alpha_single_category_undefined(spark):
    ratings = [(i, r, "X") for i in range(5) for r in ("a", "b")]
    out = _run_alpha(spark, ratings)
    assert out["de_num"] == 0 and out["alpha_ppm"] is None


def test_alpha_unpaired_units_drop_and_dup_ratings_collapse(spark):
    ratings = [
        (1, "a", "X"), (1, "b", "X"),
        (2, "a", "Y"),              # only one rating — excluded
        (3, "a", "X"), (3, "b", "Y"), (3, "b", "X"),  # dup (3,b) → MIN "X"
    ]
    out = _run_alpha(spark, ratings)
    assert out["n_units"] == 2 and out["n_ratings"] == 4
    assert out == _alpha_mirror(ratings)


def test_alpha_exact_rational_when_floors_are_exact(spark):
    # 2 raters, 4 units, disagree on 2 of 4: D_o = 2·(4−2)/1 = 4 scaled
    # exactly; the mirror's flooring introduces no error here, so compare
    # against the true rational alpha too.
    ratings = [
        (1, "a", "X"), (1, "b", "X"),
        (2, "a", "Y"), (2, "b", "Y"),
        (3, "a", "X"), (3, "b", "Y"),
        (4, "a", "Y"), (4, "b", "X"),
    ]
    out = _run_alpha(spark, ratings)
    n, cat = 8, {"X": 4, "Y": 4}
    d_o = Fraction(sum(1_000_000 * (4 - s) for s in (4, 4, 2, 2)), 1_000_000)
    de = Fraction(n * n - sum(v * v for v in cat.values()), n - 1)
    true_alpha = 1 - Fraction(d_o, de)
    assert out["alpha_ppm"] == int(1_000_000 * true_alpha)
    assert out == _alpha_mirror(ratings)


def test_alpha_random_vs_mirror(spark):
    rng = random.Random(1404)
    for _ in range(4):
        ratings = []
        for item in range(rng.randint(3, 12)):
            for rater in "abcd":
                if rng.random() < 0.75:
                    ratings.append((item, rater, rng.choice("XYZ")))
        if not ratings:
            continue
        assert _run_alpha(spark, ratings) == _alpha_mirror(ratings)


def _run_edit(spark, left, right, **kw):
    from ocaml_rdf_spark.operators.linking import blocked_edit_join

    ldf = spark.createDataFrame(left, "id long, name string")
    rdf = spark.createDataFrame(right, "rid long, rname string")
    return {
        (r["id"], r["rid"]): (r["lev"], r["sim_ppm"])
        for r in blocked_edit_join(ldf, rdf, **kw).collect()
    }


def test_edit_exact_and_near_matches(spark):
    out = _run_edit(
        spark,
        [(1, "golden lace"), (2, "crimson sand")],
        [(10, "golden lace"), (11, "golden lacy"), (12, "goldfish pond")],
        min_sim_ppm=800_000,
    )
    assert out[(1, 10)] == (0, 1_000_000)
    # one substitution over 11 chars → floor(1e6·10/11) = 909090
    assert out[(1, 11)] == (1, 909_090)
    # same 'gold' block but 8 edits over 13 chars → sim 384615 < 0.8: dropped
    assert (1, 12) not in out and (2, 10) not in out


def test_edit_block_prefix_controls_candidates(spark):
    # same string, different first-4 prefix → never a candidate
    out = _run_edit(spark, [(1, "abcd rest")], [(9, "abce rest")], min_sim_ppm=0)
    assert out == {}


def test_edit_mega_block_cap_drops_degenerate_block(spark):
    left = [(i, f"spam {i}") for i in range(3)]
    right = [(10 + i, f"spam {i}") for i in range(3)]
    # 3×3 = 9 pairs > cap 8 → whole block dropped, set semantics
    assert _run_edit(spark, left, right, max_block_pairs=8) == {}
    # raise the cap → identical names match
    out = _run_edit(spark, left, right, max_block_pairs=9)
    assert all(out[(i, 10 + i)] == (0, 1_000_000) for i in range(3))


def test_edit_empty_strings_match_trivially(spark):
    out = _run_edit(spark, [(1, "")], [(2, "")], min_sim_ppm=0)
    assert out[(1, 2)] == (0, 1_000_000)
