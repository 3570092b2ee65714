"""Unit tests for the round-5 additions: topological levels (Kahn
layering under max-relaxation), greedy densest-subgraph peeling
(Charikar/Bahmani), and the integer-exact EWMA control chart."""

import pytest

from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame([(str(a), str(b)) for a, b in pairs], "src string, dst string")


# ---------------------------------------------------------------- topo_levels


def test_topo_levels_diamond(spark):
    from ocaml_rdf_spark.operators.cc import topo_levels

    # diamond + tail: 1→2, 1→3, 2→4, 3→4, 4→5; plus isolated pair 8→9
    e = _edges(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (8, 9)])
    got = {r["node"]: r["level"] for r in topo_levels(e).collect()}
    assert got == {"1": 0, "2": 1, "3": 1, "4": 2, "5": 3, "8": 0, "9": 1}


def test_topo_levels_longest_path_not_shortest(spark):
    from ocaml_rdf_spark.operators.cc import topo_levels

    # 1→4 direct AND 1→2→3→4: level(4) must be the LONGEST path (3)
    e = _edges(spark, [(1, 4), (1, 2), (2, 3), (3, 4)])
    got = {r["node"]: r["level"] for r in topo_levels(e).collect()}
    assert got["4"] == 3
    # every edge respects level(u) < level(v)
    for a, b in [(1, 4), (1, 2), (2, 3), (3, 4)]:
        assert got[str(a)] < got[str(b)]


def test_topo_levels_cycle_raises(spark):
    from ocaml_rdf_spark.operators.cc import CycleDetected, topo_levels

    e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    with pytest.raises(CycleDetected):
        topo_levels(e, max_rounds=8)


def test_topo_levels_depth_over_budget_raises(spark):
    from ocaml_rdf_spark.operators.cc import CycleDetected, topo_levels

    chain = [(i, i + 1) for i in range(1, 12)]  # depth 11
    with pytest.raises(CycleDetected):
        topo_levels(_edges(spark, chain), max_rounds=5)
    # and a budget >= depth succeeds
    got = {r["node"]: r["level"] for r in topo_levels(_edges(spark, chain), max_rounds=12).collect()}
    assert got["12"] == 11


# --------------------------------------------------------------- densest_peel


def _clique(lo, n):
    ids = list(range(lo, lo + n))
    return [(a, b) for a in ids for b in ids if a < b]


def test_densest_peel_labels_everyone(spark):
    from ocaml_rdf_spark.operators.cc import densest_peel

    # sparse chain + planted 6-clique
    pairs = [(i, i + 1) for i in range(1, 30)] + _clique(100, 6)
    lab = densest_peel(_edges(spark, pairs)).collect()
    nodes = {r["node"] for r in lab}
    assert len(lab) == len(nodes) == 36  # every node exactly once
    assert all(r["peel_round"] >= 0 for r in lab)


def test_densest_peel_clique_outlives_chain(spark):
    from ocaml_rdf_spark.operators.cc import densest_peel

    pairs = [(i, i + 1) for i in range(1, 40)] + _clique(100, 8)
    got = {r["node"]: r["peel_round"] for r in densest_peel(_edges(spark, pairs)).collect()}
    clique_min = min(got[str(k)] for k in range(100, 108))
    chain_max = max(got[str(k)] for k in range(1, 41))
    # the dense core is peeled strictly later than all of the sparse chain
    assert clique_min > chain_max


def test_densest_peel_density_guarantee(spark):
    from ocaml_rdf_spark.operators.cc import densest_peel

    # optimum is the 8-clique: density 28/8 = 3.5; the 4-approx bound
    # guarantees a suffix with density >= 3.5/4
    pairs = [(i, i + 1) for i in range(1, 40)] + _clique(100, 8)
    e = [(str(a), str(b)) for a, b in pairs]
    got = {r["node"]: r["peel_round"] for r in densest_peel(_edges(spark, pairs)).collect()}
    best = 0.0
    for r in sorted(set(got.values())):
        keep = {n for n, pr in got.items() if pr >= r}
        ne = sum(1 for a, b in e if a in keep and b in keep)
        if keep:
            best = max(best, ne / len(keep))
    assert best >= 3.5 / 4


def test_densest_peel_fixed_rounds_prefix(spark):
    from ocaml_rdf_spark.operators.cc import densest_peel

    pairs = [(i, i + 1) for i in range(1, 30)] + _clique(100, 6)
    full = {r["node"]: r["peel_round"] for r in densest_peel(_edges(spark, pairs)).collect()}
    fixed = {r["node"]: r["peel_round"] for r in densest_peel(_edges(spark, pairs), rounds=2).collect()}
    # rounds 0 and 1 agree with the fixpoint run; later nodes sit at the cap
    for n, pr in full.items():
        assert fixed[n] == (pr if pr < 2 else 2)


# --------------------------------------------------------------- ewma_anomaly


def _series(spark, rows):
    return spark.createDataFrame(rows, "g string, t long, x long")


def test_ewma_flags_planted_spike(spark):
    from ocaml_rdf_spark.operators.temporal import ewma_anomaly

    rows = [("h", t, 100 + (900 if t == 20 else 0)) for t in range(1, 31)]
    out = ewma_anomaly(_series(spark, rows), "g", "t", "x", threshold_milli=300_000).collect()
    flagged = {r["t"] for r in out if r["anomaly"]}
    # threshold above the max recovery residual (~alpha*spike = 180): only
    # the spike row itself deviates by more than 300 from its prediction
    assert flagged == {20}


def test_ewma_rearms_after_spike(spark):
    from ocaml_rdf_spark.operators.temporal import ewma_anomaly

    # two spikes far apart: both flagged, recovery rows are not
    rows = [("h", t, 100 + (500 if t in (10, 25) else 0)) for t in range(1, 31)]
    out = ewma_anomaly(_series(spark, rows), "g", "t", "x", threshold_milli=300_000).collect()
    flagged = {r["t"] for r in out if r["anomaly"]}
    assert flagged == {10, 25}


def test_ewma_no_history_row(spark):
    from ocaml_rdf_spark.operators.temporal import ewma_anomaly

    rows = [("h", 1, 999), ("h", 2, 100)]
    out = {r["t"]: r for r in ewma_anomaly(_series(spark, rows), "g", "t", "x").collect()}
    assert out[1]["pred_milli"] is None and out[1]["anomaly"] is False
    # row 2 predicts exactly the single lag-1 observation
    assert out[2]["pred_milli"] == 999_000


def test_ewma_prediction_matches_python_mirror(spark):
    from ocaml_rdf_spark.operators.temporal import ewma_anomaly

    xs = [100, 120, 90, 200, 110, 105, 300, 100, 100, 100, 250, 95, 100, 180, 100]
    rows = [("h", t + 1, x) for t, x in enumerate(xs)]
    out = {r["t"]: r["pred_milli"] for r in ewma_anomaly(_series(spark, rows), "g", "t", "x").collect()}
    W, num, den = 12, 1, 5
    weights = {lag: num * (den - num) ** (lag - 1) * den ** (W - lag) for lag in range(1, W + 1)}
    for t in range(2, len(xs) + 1):
        n = d = 0
        for lag in range(1, W + 1):
            j = t - lag
            if j >= 1:
                n += weights[lag] * xs[j - 1]
                d += weights[lag]
        assert out[t] == 1000 * n // d, f"t={t}"


def test_ewma_two_series_independent(spark):
    from ocaml_rdf_spark.operators.temporal import ewma_anomaly

    rows = [("a", t, 100) for t in range(1, 15)] + [("b", t, 100 + (800 if t == 7 else 0)) for t in range(1, 15)]
    out = ewma_anomaly(_series(spark, rows), "g", "t", "x", threshold_milli=300_000).collect()
    flagged = {(r["g"], r["t"]) for r in out if r["anomaly"]}
    assert flagged == {("b", 7)}


# ------------------------------------------------------------ textrank


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_textrank_hub_word_wins(spark):
    from ocaml_rdf_spark.operators.textops import textrank_keywords

    # 'spark' co-occurs with every other content word; it must rank 1
    docs = _docs_df(spark, ["spark engine spark shuffle spark catalyst plans"])
    out = textrank_keywords(docs, k=3).collect()
    assert out[0]["tok"] == "spark" and out[0]["rnk"] == 1
    assert len(out) == 3


def test_textrank_short_words_dropped_but_positions_kept(spark):
    from ocaml_rdf_spark.operators.textops import textrank_keywords

    # 'of'/'xx'/'yy'/'zz' are < 4 chars: not nodes, but they HOLD
    # positions — alpha..beta stay 2 apart (edge), while omega sits 4
    # past beta (no edge): isolated, it keeps the (1-d)-only score
    docs = _docs_df(spark, ["alpha of beta xx yy zz omega"])
    out = {r["tok"]: r for r in textrank_keywords(docs, k=3).collect()}
    assert set(out) == {"alpha", "beta", "omega"}
    assert out["alpha"]["score"] == out["beta"]["score"] > out["omega"]["score"]


def test_textrank_per_doc_isolation(spark):
    from ocaml_rdf_spark.operators.textops import textrank_keywords

    # same vocabulary in two docs: scores computed per doc, no bleed
    docs = _docs_df(spark, ["link farm link", "link solo"])
    out = [(r["doc_id"], r["tok"], r["rnk"]) for r in textrank_keywords(docs, k=2).collect()]
    d1 = [t for d, t, _ in out if d == 1]
    d2 = [t for d, t, _ in out if d == 2]
    assert set(d1) == {"link", "farm"} and set(d2) == {"link", "solo"}


# ----------------------------------------------------- weighted pagerank


def test_pagerank_weighted_splits_by_weight(spark):
    from ocaml_rdf_spark.operators.cc import pagerank

    e = spark.createDataFrame(
        [("a", "b", 9), ("a", "c", 1)], "src string, dst string, w long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(e, iters=1, weight_col="w").collect()}
    base = 150_000
    assert got["b"] == base + 85 * (1_000_000 * 9 // 10) // 100
    assert got["c"] == base + 85 * (1_000_000 * 1 // 10) // 100
    assert got["a"] == base  # no in-edges: teleport mass only


def test_pagerank_weighted_multi_edge_sums(spark):
    from ocaml_rdf_spark.operators.cc import pagerank

    # two parallel a->b edges of weight 2 behave as one of weight 4
    e1 = spark.createDataFrame(
        [("a", "b", 2), ("a", "b", 2), ("a", "c", 4)], "src string, dst string, w long"
    )
    e2 = spark.createDataFrame(
        [("a", "b", 4), ("a", "c", 4)], "src string, dst string, w long"
    )
    g1 = {r["node"]: r["rank"] for r in pagerank(e1, iters=2, weight_col="w").collect()}
    g2 = {r["node"]: r["rank"] for r in pagerank(e2, iters=2, weight_col="w").collect()}
    assert g1 == g2


def test_pagerank_unit_weights_match_unweighted(spark):
    from ocaml_rdf_spark.operators.cc import pagerank

    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    e = spark.createDataFrame([(s, d, 1) for s, d in pairs], "src string, dst string, w long")
    eu = spark.createDataFrame(pairs, "src string, dst string")
    gw = {r["node"]: r["rank"] for r in pagerank(e, iters=3, weight_col="w").collect()}
    gu = {r["node"]: r["rank"] for r in pagerank(eu, iters=3).collect()}
    assert gw == gu


# ----------------------------------------------------------- mann-kendall


def test_mann_kendall_signs_and_extremes(spark):
    from ocaml_rdf_spark.operators.temporal import mann_kendall

    rows = (
        [("up", t, 10 * t) for t in range(1, 11)]
        + [("down", t, -3 * t) for t in range(1, 11)]
        + [("flat", t, 7) for t in range(1, 11)]
    )
    df = spark.createDataFrame(rows, "g string, t long, x long")
    out = {r["g"]: r for r in mann_kendall(df, "g", "t", "x").collect()}
    assert out["up"]["s_stat"] == 45 and out["up"]["tau_ppm"] == 1_000_000
    assert out["down"]["s_stat"] == -45 and out["down"]["tau_ppm"] == -1_000_000
    assert out["flat"]["s_stat"] == 0 and out["flat"]["tau_ppm"] == 0
    assert all(out[g]["n"] == 10 for g in out)


def test_mann_kendall_matches_python_mirror(spark):
    from ocaml_rdf_spark.operators.temporal import mann_kendall

    xs = [5, 9, 2, 2, 7, 1, 8, 8, 3, 10, 4, 6]
    df = spark.createDataFrame([("h", t + 1, x) for t, x in enumerate(xs)], "g string, t long, x long")
    out = mann_kendall(df, "g", "t", "x").collect()[0]
    s = sum((xs[j] > xs[i]) - (xs[j] < xs[i]) for i in range(len(xs)) for j in range(i + 1, len(xs)))
    np = len(xs) * (len(xs) - 1) // 2
    want_tau = -((1_000_000 * -s) // np) if s < 0 else (1_000_000 * s) // np
    assert out["s_stat"] == s and out["n"] == len(xs) and out["tau_ppm"] == want_tau


def test_kendall_tau_perfect_and_inverse(spark):
    from ocaml_rdf_spark.operators.temporal import kendall_tau

    rows = (
        [("agree", t, t, 10 * t) for t in range(1, 9)]
        + [("invert", t, t, -t) for t in range(1, 9)]
        + [("tiesy", t, t, 5) for t in range(1, 9)]
    )
    df = spark.createDataFrame(rows, "g string, t long, x long, y long")
    out = {r["g"]: r for r in kendall_tau(df, "g", "t", "x", "y").collect()}
    assert out["agree"]["tau_ppm"] == 1_000_000
    assert out["invert"]["tau_ppm"] == -1_000_000
    assert out["tiesy"]["tau_ppm"] == 0  # all y ties: numerator 0, pairs kept


# ------------------------------------------------------------ feature hash


def test_feature_hash_counts_and_stability(spark):
    import hashlib

    from ocaml_rdf_spark.operators.textops import feature_hash

    docs = _docs_df(spark, ["alpha beta alpha", "beta GAMMA, beta!"])
    out = {(r["doc_id"], r["bucket"]): r["cnt"] for r in feature_hash(docs, buckets=64).collect()}

    def b(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 64

    assert out[(1, b("alpha"))] == 2 and out[(1, b("beta"))] == 1
    assert out[(2, b("beta"))] == 2 and out[(2, b("gamma"))] == 1
    # index stability: a new shard never shifts existing buckets
    more = _docs_df(spark, ["alpha delta"])
    out2 = {(r["doc_id"], r["bucket"]): r["cnt"] for r in feature_hash(more, buckets=64).collect()}
    assert out2[(1, b("alpha"))] == 1


# ------------------------------------------------------------- ols trend


def test_ols_trend_exact_line(spark):
    from ocaml_rdf_spark.operators.temporal import ols_trend

    # exact line x = 7t + 20: slope 7000 milli, intercept 20000, r2 1e6
    rows = [("h", t, 7 * t + 20) for t in range(1, 13)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    out = ols_trend(df, "g", "t", "x").collect()[0]
    assert out["slope_milli"] == 7000
    assert out["intercept_milli"] == 20000
    assert out["r2_ppm"] == 1_000_000


def test_ols_trend_constant_x_r2_null(spark):
    from ocaml_rdf_spark.operators.temporal import ols_trend

    rows = [("h", t, 5) for t in range(1, 9)]
    out = ols_trend(spark.createDataFrame(rows, "g string, t long, x long"), "g", "t", "x").collect()[0]
    assert out["slope_milli"] == 0 and out["intercept_milli"] == 5000
    assert out["r2_ppm"] is None


def test_ols_trend_matches_python_mirror(spark):
    from ocaml_rdf_spark.operators.temporal import ols_trend

    xs = [3, 9, 4, 12, 8, 15, 11, 20, 14, 22]
    rows = [("h", t + 1, x) for t, x in enumerate(xs)]
    out = ols_trend(spark.createDataFrame(rows, "g string, t long, x long"), "g", "t", "x").collect()[0]
    n = len(xs)
    st = sum(range(1, n + 1)); sx = sum(xs)
    stt = sum(t * t for t in range(1, n + 1)); sxx = sum(x * x for x in xs)
    stx = sum((i + 1) * x for i, x in enumerate(xs))
    num = n * stx - st * sx; den_t = n * stt - st * st; den_x = n * sxx - sx * sx

    def sdiv(a, b):
        return -((-a) // b) if a < 0 else a // b

    slope = sdiv(1000 * num, den_t)
    assert out["slope_milli"] == slope
    assert out["intercept_milli"] == sdiv(1000 * sx - slope * st, n)
    assert out["r2_ppm"] == sdiv(sdiv(1_000_000 * num, den_t) * num, den_x)


# ----------------------------------------------------------- fleiss kappa


def test_fleiss_kappa_perfect_and_random(spark):
    from ocaml_rdf_spark.operators.stats import fleiss_kappa

    # perfect agreement: every item's 3 raters pick the same category
    rows = [(i, i % 2) for i in range(1, 9) for _ in range(3)]
    df = spark.createDataFrame(rows, "item long, cat long")
    out = fleiss_kappa(df).collect()[0]
    assert out["kappa_ppm"] == 1_000_000 and out["n_raters"] == 3

    # all raters one category on every item: Pe = 1 -> undefined
    uni = spark.createDataFrame([(i, 0) for i in range(1, 5) for _ in range(3)], "item long, cat long")
    assert fleiss_kappa(uni).collect()[0]["kappa_ppm"] is None


def test_fleiss_kappa_matches_python_mirror(spark):
    from ocaml_rdf_spark.operators.stats import fleiss_kappa

    import itertools
    cats = [0, 1, 2, 0, 1]
    rows = []
    for i in range(1, 13):
        for r in range(4):
            rows.append((i, cats[(i * (r + 1)) % 5]))
    df = spark.createDataFrame(rows, "item long, cat long")
    out = fleiss_kappa(df).collect()[0]
    N, n = 12, 4
    from collections import Counter
    po_n = 0
    cj = Counter()
    for i in range(1, 13):
        c = Counter(cats[(i * (r + 1)) % 5] for r in range(4))
        po_n += sum(v * (v - 1) for v in c.values())
        cj.update(c)
    pe_n = sum(v * v for v in cj.values())
    po_d, pe_d = N * n * (n - 1), (N * n) ** 2
    num = po_n * pe_d - pe_n * po_d
    den = po_d * (pe_d - pe_n)
    want = -((-(1_000_000 * num)) // den) if num < 0 else (1_000_000 * num) // den
    assert out["kappa_ppm"] == want


def test_fleiss_kappa_unbalanced_raises(spark):
    from ocaml_rdf_spark.operators.stats import fleiss_kappa

    df = spark.createDataFrame([(1, 0), (1, 1), (2, 0)], "item long, cat long")
    import pytest as _pt
    with _pt.raises(ValueError):
        fleiss_kappa(df)
