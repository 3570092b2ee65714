"""Batch-24: exact Mann-Whitney ROC-AUC and two-sample KS drift, each
vs exact Python mirrors (same pinned integer floors)."""

from __future__ import annotations

import random


def _auc_mirror(pairs):
    pos = sorted(s for s, t in pairs if t)
    neg = sorted(s for s, t in pairs if not t)
    if not pos or not neg:
        return (len(pos), len(neg), None)
    num = 0
    for p in pos:
        for n in neg:
            num += 2 if p > n else (1 if p == n else 0)
    # num = 2·(wins + ties/2); auc = num / (2·P·N)
    return (len(pos), len(neg), 1_000_000 * num // (2 * len(pos) * len(neg)))


def _auc_run(spark, pairs):
    from ocaml_rdf_spark.operators.stats import auc_exact

    df = spark.createDataFrame(pairs, "score long, is_true int")
    r = auc_exact(df).collect()[0]
    return (r["n_pos"], r["n_neg"], r["auc_ppm"])


def test_auc_perfect_and_inverted_and_ties(spark):
    assert _auc_run(spark, [(10, 1), (9, 1), (2, 0), (1, 0)]) == (2, 2, 1_000_000)
    assert _auc_run(spark, [(1, 1), (2, 1), (9, 0), (10, 0)]) == (2, 2, 0)
    # all tied → AUC = 1/2 exactly
    assert _auc_run(spark, [(5, 1), (5, 1), (5, 0), (5, 0)]) == (2, 2, 500_000)


def test_auc_single_class_null(spark):
    assert _auc_run(spark, [(3, 1), (4, 1)]) == (2, 0, None)


def test_auc_random_vs_quadratic_mirror(spark):
    rng = random.Random(2424)
    for _ in range(4):
        pairs = [(rng.randrange(0, 20), rng.randrange(2))
                 for _ in range(rng.randint(4, 50))]
        assert _auc_run(spark, pairs) == _auc_mirror(pairs)


def _ks_mirror(a, b):
    vals = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    best = None
    for v in vals:
        fa = sum(1 for x in a if x <= v)
        fb = sum(1 for x in b if x <= v)
        d = abs(1_000_000 * fa // na - 1_000_000 * fb // nb)
        key = (d, -v)
        if best is None or key > best[0]:
            best = (key, (na, nb, d, v))
    return best[1]


def _ks_run(spark, a, b):
    from ocaml_rdf_spark.operators.stats import ks_drift

    da = spark.createDataFrame([(x,) for x in a], "v long")
    db = spark.createDataFrame([(x,) for x in b], "v long")
    r = ks_drift(da, db, "v").collect()[0]
    return (r["n_a"], r["n_b"], r["d_ppm"], r["at_value"])


def test_ks_identical_distributions_zero(spark):
    a = [1, 2, 3, 4, 5]
    out = _ks_run(spark, a, list(a))
    assert out[2] == 0 and out == _ks_mirror(a, list(a))


def test_ks_disjoint_distributions_full(spark):
    out = _ks_run(spark, [1, 2, 3], [10, 11, 12])
    assert out == (3, 3, 1_000_000, 3) == _ks_mirror([1, 2, 3], [10, 11, 12])


def test_ks_shift_detected_at_boundary(spark):
    a = list(range(10))
    b = [x + 5 for x in a]
    out = _ks_run(spark, a, b)
    assert out == _ks_mirror(a, b)
    assert out[2] == 500_000  # half the mass separated by the shift


def test_ks_random_vs_mirror(spark):
    rng = random.Random(2425)
    for _ in range(3):
        a = [rng.randrange(0, 40) for _ in range(rng.randint(3, 50))]
        b = [rng.randrange(0, 40) for _ in range(rng.randint(3, 50))]
        assert _ks_run(spark, a, b) == _ks_mirror(a, b)


def test_ks_empty_side_both_null(spark):
    """Empty-side contract (ADVICE r4): d_ppm AND at_value are NULL when
    a side has no rows — max_by's value tiebreak must not leak the
    minimum value into at_value."""
    out = _ks_run(spark, [1, 2, 3], [])
    assert out == (3, 0, None, None)
    out = _ks_run(spark, [], [7, 8])
    assert out == (0, 2, None, None)
