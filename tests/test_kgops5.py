"""Unit tests for grid_dbscan, edge_support / ktruss, eccentricity, and
hopping windows on hand-built fixtures."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id long, x long, y long")


# ---------------------------------------------------------------- grid_dbscan


def test_dbscan_blobs_and_noise(spark):
    # two tight blobs of 3 (all mutual neighbors at r=2), one pair below
    # min_pts, one isolated point: blobs are core clusters labeled by
    # their min id, pair + singleton are noise.
    from ocaml_rdf_spark.operators.spatial import grid_dbscan

    pts = _pts(
        spark,
        [
            (1, 0, 0), (2, 1, 0), (3, 0, 1),          # blob A
            (10, 100, 100), (11, 101, 100), (12, 100, 101),  # blob B
            (20, 50, 50), (21, 51, 50),                # pair: 2 < min_pts
            (30, 200, 200),                            # singleton
        ],
    )
    out = {r["id"]: (r["cluster"], r["role"]) for r in grid_dbscan(pts, 2, 3).collect()}
    assert out["1"] == ("1", "core")
    assert out["2"] == ("1", "core")
    assert out["3"] == ("1", "core")
    for i in ("10", "11", "12"):
        assert out[i] == ("10", "core")
    for i in ("20", "21", "30"):
        assert out[i] == ("", "noise")


def test_dbscan_border_attaches_min_cluster(spark):
    # point 50 is within r of cores from BOTH clusters but has only 3
    # neighbors... make it non-core by keeping its own neighborhood < 4
    # with min_pts=4: border points adopt the MINIMUM cluster label.
    from ocaml_rdf_spark.operators.spatial import grid_dbscan

    pts = _pts(
        spark,
        [
            # cluster "1": 4 mutual points at r=2
            (1, 0, 0), (2, 1, 0), (3, 0, 1), (4, 1, 1),
            # cluster "5": 4 mutual points
            (5, 10, 0), (6, 11, 0), (7, 10, 1), (8, 11, 1),
            # border: within r=2 of core 4 (at 1,1) and core 7 (at 10,1)?
            # no — keep it adjacent to exactly one side first: (3,1)
            (9, 3, 1),
        ],
    )
    out = {r["id"]: (r["cluster"], r["role"]) for r in grid_dbscan(pts, 2, 4).collect()}
    # 9 has neighbors {self, 2?, 4} -> dist((3,1),(1,0))^2=5 > 4; nbrs are
    # (1,1) d2=4 and (1,0)? 5 no. So {self, 4} = 2 < 4 -> not core; core
    # neighbor 4 -> border of cluster "1"
    assert out["9"] == ("1", "border")
    assert out["1"] == ("1", "core")
    assert out["5"] == ("5", "core")


def test_dbscan_chain_merges_through_cores(spark):
    # a chain of core points merges into ONE cluster via core-core CC
    # (single-linkage through density), labeled by the min id string.
    from ocaml_rdf_spark.operators.spatial import grid_dbscan

    pts = _pts(spark, [(i, i * 2, 0) for i in range(1, 8)])  # spacing 2, r=2
    out = {r["id"]: (r["cluster"], r["role"]) for r in grid_dbscan(pts, 2, 3).collect()}
    # interior points have 3 nbrs (self + 2) = core; endpoints have 2 ->
    # border attached to the single chain cluster
    assert out["2"] == ("2", "core")
    assert out["4"] == ("2", "core")
    assert out["1"] == ("2", "border")
    assert out["7"] == ("2", "border")


# ------------------------------------------------------- edge_support/ktruss


def test_edge_support_triangle_pendant(spark):
    from ocaml_rdf_spark.operators.cc import edge_support

    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    out = {(r["a"], r["b"]): r["support"] for r in edge_support(e).collect()}
    assert out == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1, ("c", "d"): 0}


def test_edge_support_two_triangles_shared_edge(spark):
    # diamond: triangles abc + bcd share edge (b,c) -> its support is 2
    from ocaml_rdf_spark.operators.cc import edge_support

    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")])
    out = {(r["a"], r["b"]): r["support"] for r in edge_support(e).collect()}
    assert out[("b", "c")] == 2
    assert out[("a", "b")] == 1
    assert out[("c", "d")] == 1


def test_ktruss_peels_cascade(spark):
    # K4 plus a pendant triangle hanging off one vertex: 4-truss
    # (support >= 2) keeps exactly the K4 — the hanging triangle's edges
    # have support 1 and peel away in round 1; K4 edges keep support 2.
    from ocaml_rdf_spark.operators.cc import ktruss

    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
    tail = [("d", "e"), ("d", "f"), ("e", "f")]
    out = {(r["a"], r["b"]): r["support"] for r in ktruss(_edges(spark, k4 + tail), 4).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")}
    assert all(s == 2 for s in out.values())


def test_ktruss_cascade_to_empty(spark):
    # one triangle: every edge has support 1, so the 4-truss is empty —
    # and the peel terminates (round 2 confirms the empty fixpoint).
    from ocaml_rdf_spark.operators.cc import ktruss

    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    assert ktruss(e, 4).count() == 0


def test_ktruss_k_guard(spark):
    from ocaml_rdf_spark.operators.cc import ktruss

    with pytest.raises(ValueError):
        ktruss(_edges(spark, [("a", "b")]), 2)


# -------------------------------------------------------------- eccentricity


def test_eccentricity_chain_and_cap(spark):
    from ocaml_rdf_spark.operators.cc import eccentricity

    ch = _edges(spark, [(str(i), str(i + 1)) for i in range(1, 8)])  # 1..8 chain
    seeds = spark.createDataFrame([("1",), ("6",)], "node string")
    out = {r["seed"]: (r["ecc"], r["n_reached"]) for r in eccentricity(ch, seeds, 4).collect()}
    assert out["1"] == (4, 5)   # capped at max_hops
    assert out["6"] == (2, 3)   # 6 -> 7 -> 8


def test_eccentricity_isolated_seed(spark):
    # a seed with no outgoing edges reaches only itself: ecc 0, reach 1
    from ocaml_rdf_spark.operators.cc import eccentricity

    ch = _edges(spark, [("1", "2")])
    seeds = spark.createDataFrame([("9",)], "node string")
    out = eccentricity(ch, seeds, 4).collect()
    assert [(r["seed"], r["ecc"], r["n_reached"]) for r in out] == [("9", 0, 1)]


# ------------------------------------------------------------ hopping_counts


def test_hopping_counts_membership(spark):
    # W=30, H=15: event at 00:05 lands in windows 23:45 and 00:00; event
    # at 00:20 in 00:00 and 00:15 — the shared 00:00 window sums both.
    from ocaml_rdf_spark.operators.events import hopping_counts

    ev = spark.createDataFrame(
        [
            (1, "u", "click", datetime(2024, 1, 1, 0, 5), 1.0),
            (2, "u", "click", datetime(2024, 1, 1, 0, 20), 2.5),
        ],
        "event_id long, user_id string, event_type string, ts timestamp, value double",
    )
    rows = {r["bucket"]: (r["n_events"], r["sum_value_x100"]) for r in hopping_counts(ev, 30, 15).collect()}
    base = int(datetime(2024, 1, 1).timestamp()) // 900  # UTC session
    assert rows[base - 1] == (1, 100)
    assert rows[base] == (2, 350)
    assert rows[base + 1] == (1, 250)
    assert len(rows) == 3


def test_hopping_counts_window_boundary_exclusive(spark):
    # an event exactly at start+W belongs to the NEXT window, not the
    # closing one: [s, s+W) half-open, matching F.window semantics.
    from ocaml_rdf_spark.operators.events import hopping_counts

    ev = spark.createDataFrame(
        [(1, "u", "click", datetime(2024, 1, 1, 1, 0), 1.0)],
        "event_id long, user_id string, event_type string, ts timestamp, value double",
    )
    rows = sorted(r["bucket"] for r in hopping_counts(ev, 30, 15).collect())
    t = int(datetime(2024, 1, 1, 1).timestamp())
    # windows containing t: starts t-15min and t exactly (t-30min excluded)
    assert rows == [(t - 900) // 900, t // 900]


def test_hopping_counts_hop_guard(spark):
    from ocaml_rdf_spark.operators.events import hopping_counts

    ev = spark.createDataFrame(
        [(1, "u", "click", datetime(2024, 1, 1), 1.0)],
        "event_id long, user_id string, event_type string, ts timestamp, value double",
    )
    with pytest.raises(ValueError):
        hopping_counts(ev, 50, 15)


# --------------------------------------------------------------- betweenness


def test_betweenness_diamond_split(spark):
    # s->a, s->b, a->t, b->t: sigma(t)=2, so a and b each carry half the
    # dependency: 1*(scale+0) div 2 = 500000; the sink carries none.
    from ocaml_rdf_spark.operators.cc import betweenness

    e = _edges(spark, [("s", "a"), ("s", "b"), ("a", "t"), ("b", "t")])
    sd = spark.createDataFrame([("s",)], "node string")
    out = {r["node"]: r["bc"] for r in betweenness(e, sd, 8).collect()}
    assert out == {"a": 500000, "b": 500000, "t": 0}


def test_betweenness_chain_two_seeds(spark):
    # chain 1..6: delta_s(v) = (6 - v) * scale; bc sums over both seeds
    from ocaml_rdf_spark.operators.cc import betweenness

    ch = _edges(spark, [(str(i), str(i + 1)) for i in range(1, 6)])
    sd = spark.createDataFrame([("1",), ("2",)], "node string")
    out = {r["node"]: r["bc"] for r in betweenness(ch, sd, 8).collect()}
    assert out == {"2": 4_000_000, "3": 6_000_000, "4": 4_000_000, "5": 2_000_000, "6": 0}
    # seed 1 is reached by nobody, seed 2 only as an interior node: "2"
    # appears (reached from seed 1) with seed-2's own dependency excluded


def test_betweenness_hop_cap_truncates_dag(spark):
    # hop cap 1: only direct successors are reached, all with delta 0
    from ocaml_rdf_spark.operators.cc import betweenness

    ch = _edges(spark, [("1", "2"), ("2", "3")])
    sd = spark.createDataFrame([("1",)], "node string")
    out = {r["node"]: r["bc"] for r in betweenness(ch, sd, 1).collect()}
    assert out == {"2": 0}


def test_betweenness_fuzz_vs_duckdb_mirror(spark):
    # the same integer recursion on random digraphs, independently in
    # DuckDB loops — exercises multi-path sigma, cycles, disconnects
    import duckdb
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ocaml_rdf_spark.operators.cc import betweenness

    edge = st.tuples(st.integers(0, 5), st.integers(0, 5))
    edges_st = st.lists(edge, min_size=1, max_size=12, unique=True)

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(pairs=edges_st, hops=st.integers(1, 4))
    def _case(pairs, hops):
        e = _edges(spark, [(f"n{a}", f"n{b}") for a, b in pairs])
        sd = spark.createDataFrame([("n0",), ("n3",)], "node string")
        got = sorted(map(tuple, betweenness(e, sd, hops).collect()))

        con = duckdb.connect()
        con.execute("CREATE TABLE e (src VARCHAR, dst VARCHAR)")
        con.executemany(
            "INSERT INTO e VALUES (?, ?)", [(f"n{a}", f"n{b}") for a, b in pairs]
        )
        con.execute("CREATE TABLE d (seed VARCHAR, node VARCHAR, dist BIGINT, sigma BIGINT)")
        con.execute("INSERT INTO d VALUES ('n0','n0',0,1), ('n3','n3',0,1)")
        deepest = 0
        for h in range(1, hops + 1):
            con.execute(f"""
                INSERT INTO d
                SELECT x.seed, x.node, {h}, x.sigma FROM (
                  SELECT d.seed, e.dst AS node, SUM(d.sigma) AS sigma
                  FROM d JOIN e ON e.src = d.node WHERE d.dist = {h - 1}
                  GROUP BY d.seed, e.dst
                ) x
                WHERE NOT EXISTS (
                  SELECT 1 FROM d p WHERE p.seed = x.seed AND p.node = x.node
                )""")
            n = con.execute(f"SELECT COUNT(*) FROM d WHERE dist = {h}").fetchone()[0]
            if n == 0:
                break
            deepest = h
        con.execute("CREATE TABLE dl (seed VARCHAR, node VARCHAR, delta BIGINT)")
        for h in range(deepest - 1, -1, -1):
            con.execute(f"""
                INSERT INTO dl
                SELECT v.seed, v.node,
                       SUM(v.sigma * (1000000 + COALESCE(x.delta, 0)) // w.sigma)
                FROM d v JOIN e ON e.src = v.node
                JOIN d w ON w.seed = v.seed AND w.node = e.dst AND w.dist = {h + 1}
                LEFT JOIN dl x ON x.seed = w.seed AND x.node = w.node
                WHERE v.dist = {h}
                GROUP BY v.seed, v.node""")
        want = sorted(map(tuple, con.execute("""
            SELECT r.node, CAST(SUM(COALESCE(dl.delta, 0)) AS BIGINT) AS bc
            FROM (SELECT seed, node FROM d WHERE node <> seed) r
            LEFT JOIN dl ON dl.seed = r.seed AND dl.node = r.node
            GROUP BY r.node""").fetchall()))
        assert got == want

    _case()


# ------------------------------------------------------------- burst_windows


def test_burst_windows_flags_spike(spark):
    # baseline 1,1,1 then a 10-count window: 10*100*3 > 200*3 -> burst;
    # the first three windows lack a full trailing frame -> never bursts
    from ocaml_rdf_spark.operators.events import burst_windows

    rows = []
    eid = 0
    for h, n in enumerate((1, 1, 1, 10)):
        for i in range(n):
            eid += 1
            rows.append((eid, "u", "click", datetime(2024, 1, 1, h, 1 + i), 1.0))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts timestamp, value double"
    )
    out = sorted(
        (r["bucket"], r["n_events"], r["n_prev"], r["trailing_sum"], r["is_burst"])
        for r in burst_windows(ev, minutes=60, trailing=3, threshold_pct=200).collect()
    )
    assert [o[1:] for o in out] == [
        (1, 0, 0, 0),
        (1, 1, 1, 0),
        (1, 2, 2, 0),
        (10, 3, 3, 1),
    ]


def test_burst_windows_steady_not_flagged(spark):
    # 2,2,2,2: 2*100*3 = 600 == 200*3 -> strict inequality, no burst
    from ocaml_rdf_spark.operators.events import burst_windows

    rows = []
    eid = 0
    for h in range(4):
        for i in range(2):
            eid += 1
            rows.append((eid, "u", "click", datetime(2024, 1, 1, h, 1 + i), 1.0))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts timestamp, value double"
    )
    out = burst_windows(ev, minutes=60, trailing=3, threshold_pct=200)
    assert out.agg(F.sum("is_burst")).first()[0] == 0


def test_burst_windows_gaps_skipped(spark):
    # observed-window semantics: hours 0,1,2 then a gap to hour 10 —
    # hour 10 still has n_prev=3 (the trailing frame is row-based)
    from ocaml_rdf_spark.operators.events import burst_windows

    rows = []
    eid = 0
    for h, n in ((0, 1), (1, 1), (2, 1), (10, 9)):
        for i in range(n):
            eid += 1
            rows.append((eid, "u", "click", datetime(2024, 1, 1, h, 1 + i), 1.0))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, ts timestamp, value double"
    )
    got = {r["n_events"]: r for r in burst_windows(ev, 60, 3, 200).collect()}
    assert got[9]["n_prev"] == 3 and got[9]["is_burst"] == 1


# ------------------------------------------------------- compression_quality


def test_compression_quality_differential(spark):
    # the mapInPandas plumbing must agree with direct zlib on the same
    # strings, including empty and unicode text
    import zlib

    from ocaml_rdf_spark.operators.textops import compression_quality

    texts = [
        (1, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),   # hyper-compressible
        (2, "The quick brown fox jumps over the lazy dog."),
        (3, ""),                                             # empty
        (4, "héllo wörld ünicode ẞ" * 3),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bytes"], r["n_compressed"], r["ratio_x1000"])
           for r in compression_quality(docs).collect()}
    for did, t in texts:
        b = t.encode("utf-8")
        c = len(zlib.compress(b, 6))
        want = (len(b), c, (1000 * c) // len(b) if b else 1000 * c)
        assert got[did] == want
    # the repetitive doc compresses far better than prose
    assert got[1][2] < got[2][2]


def test_compression_quality_null_text(spark):
    from ocaml_rdf_spark.operators.textops import compression_quality

    docs = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = compression_quality(docs).collect()[0]
    assert r["n_bytes"] == 0 and r["ratio_x1000"] == r["n_compressed"] * 1000


# ----------------------------------------------------------------- hyperball


def test_hyperball_equals_true_set_estimate(spark):
    # registers are a pure function of the reached SET: the iterative
    # merge on a chain must equal hll_estimate over the explicit ball
    from ocaml_rdf_spark.operators.cc import hyperball
    from ocaml_rdf_spark.operators.sketches import hll_estimate

    ch = _edges(spark, [(str(i), str(i + 1)) for i in range(1, 5)])
    got = {r["node"]: (r["nb"], r["s_sum"], r["est"]) for r in hyperball(ch, 8).collect()}
    full = spark.createDataFrame([(str(v),) for v in range(1, 6)], "member string")
    want1 = hll_estimate(full, "member").collect()[0]
    assert got["1"] == (want1["nb"], want1["s_sum"], want1["est"])
    assert got["5"][2] == 1  # sink reaches only itself


def test_hyperball_cycle_uniform(spark):
    # on a directed cycle every ball is the whole cycle: identical rows
    from ocaml_rdf_spark.operators.cc import hyperball

    cyc = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    rows = hyperball(cyc, 8).collect()
    assert len({(r["nb"], r["s_sum"], r["est"]) for r in rows}) == 1
    assert rows[0]["est"] == 3


def test_hyperball_hop_cap(spark):
    # cap 1: each node's ball is itself + direct successors only
    from ocaml_rdf_spark.operators.cc import hyperball

    ch = _edges(spark, [("1", "2"), ("2", "3"), ("3", "4")])
    got = {r["node"]: r["est"] for r in hyperball(ch, 1).collect()}
    assert got == {"1": 2, "2": 2, "3": 2, "4": 1}


def test_hyperball_fuzz_vs_duckdb_set_mirror(spark):
    # random digraphs: iterative register merge ≡ registers of the TRUE
    # reachable set computed by an independent DuckDB BFS + hash mirror
    import duckdb
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ocaml_rdf_spark.operators.cc import hyperball
    from ocaml_rdf_spark.operators.sketches import hll_oracle_sql

    edge = st.tuples(st.integers(0, 5), st.integers(0, 5))
    edges_st = st.lists(edge, min_size=1, max_size=12, unique=True)

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(pairs=edges_st, hops=st.integers(1, 4))
    def _case(pairs, hops):
        got = sorted(
            map(tuple, hyperball(_edges(spark, [(f"n{a}", f"n{b}") for a, b in pairs]), hops).collect())
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE e (src VARCHAR, dst VARCHAR)")
        con.executemany("INSERT INTO e VALUES (?, ?)",
                        [(f"n{a}", f"n{b}") for a, b in pairs])
        con.execute("""
            CREATE TABLE reach AS
            SELECT node, node AS member, 0 AS dist FROM (
              SELECT src AS node FROM e UNION SELECT dst FROM e
            )""")
        for h in range(1, hops + 1):
            con.execute(f"""
                INSERT INTO reach
                SELECT x.node, x.member, {h} FROM (
                  SELECT DISTINCT r.node, e.dst AS member
                  FROM reach r JOIN e ON e.src = r.member WHERE r.dist = {h - 1}
                ) x
                WHERE NOT EXISTS (
                  SELECT 1 FROM reach p WHERE p.node = x.node AND p.member = x.member
                )""")
        want = sorted(map(tuple, con.execute(
            hll_oracle_sql("reach", "member", ["node"], estimate=True)
        ).fetchall()))
        assert got == want

    _case()


# ------------------------------------------------------------------- b-cubed


def test_bcubed_perfect_clustering(spark):
    from ocaml_rdf_spark.operators.linking import er_bcubed_metrics

    pred = spark.createDataFrame(
        [("a", "1"), ("b", "1"), ("c", "2")], "node string, cluster string"
    )
    r = er_bcubed_metrics(pred, pred).collect()[0]
    assert (r["n_records"], r["bcubed_p_ppm"], r["bcubed_r_ppm"], r["bcubed_f1_ppm"]) == (
        3, 1000000, 1000000, 1000000
    )


def test_bcubed_hand_computed_split(spark):
    # gold: {a,b,c,d} one cluster; pred splits it {a,b} {c,d}:
    # precision per record = 2/2 = 1; recall per record = 2/4 = 0.5
    from ocaml_rdf_spark.operators.linking import er_bcubed_metrics

    gold = spark.createDataFrame(
        [("a", "g"), ("b", "g"), ("c", "g"), ("d", "g")], "node string, cluster string"
    )
    pred = spark.createDataFrame(
        [("a", "p1"), ("b", "p1"), ("c", "p2"), ("d", "p2")], "node string, cluster string"
    )
    r = er_bcubed_metrics(pred, gold).collect()[0]
    assert r["bcubed_p_ppm"] == 1000000
    assert r["bcubed_r_ppm"] == 500000
    # f1 = 2*1.0*0.5/1.5 = 2/3 -> 666666 ppm (floored)
    assert r["bcubed_f1_ppm"] == 666666


def test_bcubed_vs_pairwise_big_cluster_merge(spark):
    # merging two gold clusters of 3 into one predicted cluster of 6:
    # per-record precision = 3/6 = 0.5 exactly; pairwise precision =
    # 6/15 = 0.4 — the known divergence B-cubed exists to expose
    from ocaml_rdf_spark.operators.linking import er_bcubed_metrics, er_pair_metrics

    gold = spark.createDataFrame(
        [(c, "g1") for c in "abc"] + [(c, "g2") for c in "def"],
        "node string, cluster string",
    )
    pred = spark.createDataFrame(
        [(c, "p") for c in "abcdef"], "node string, cluster string"
    )
    b = er_bcubed_metrics(pred, gold).collect()[0]
    p = er_pair_metrics(pred, gold).collect()[0]
    assert b["bcubed_p_ppm"] == 500000
    assert p["precision_ppm"] == 400000
    assert b["bcubed_r_ppm"] == 1000000 and p["recall_ppm"] == 1000000


def test_bcubed_scores_node_intersection_only(spark):
    # nodes present on one side only carry no evidence (er_pair_metrics rule)
    from ocaml_rdf_spark.operators.linking import er_bcubed_metrics

    gold = spark.createDataFrame(
        [("a", "g"), ("b", "g"), ("z", "g")], "node string, cluster string"
    )
    pred = spark.createDataFrame(
        [("a", "p"), ("b", "p"), ("q", "p")], "node string, cluster string"
    )
    r = er_bcubed_metrics(pred, gold).collect()[0]
    assert r["n_records"] == 2
    assert r["bcubed_p_ppm"] == 1000000 and r["bcubed_r_ppm"] == 1000000


# ---------------------------------------------------------------- jl_project


def test_jl_project_shape_and_determinism(spark):
    from ocaml_rdf_spark.operators.ann import jl_project

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(20)
    a = {r["vec_id"]: r["proj"] for r in jl_project(emb, 8, 64).collect()}
    b = {r["vec_id"]: r["proj"] for r in jl_project(emb, 8, 64).collect()}
    assert all(len(v) == 8 for v in a.values())
    assert a == b  # md5 matrix + left fold: no RNG state anywhere


def test_jl_project_preserves_relative_distance(spark):
    # identical vectors project identically; a vector vs its negation
    # lands at the mirrored point — exact properties of a linear +/-1 map
    from ocaml_rdf_spark.operators.ann import jl_project

    base = [float(i % 7) - 3.0 for i in range(64)]
    neg = [-x for x in base]
    df = spark.createDataFrame(
        [(1, base), (2, list(base)), (3, neg)], "vec_id long, embedding array<float>"
    )
    p = {r["vec_id"]: r["proj"] for r in jl_project(df, 8, 64).collect()}
    assert p[1] == p[2]
    assert p[3] == [-x for x in p[1]]


def test_jl_project_distinguishes_far_vectors(spark):
    # statistical sanity on the real table: nonzero distinct projections
    from ocaml_rdf_spark.operators.ann import jl_project

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    rows = [tuple(r["proj"]) for r in jl_project(emb, 8, 64).collect()]
    assert len(set(rows)) == len(rows)  # 64d->8d keeps 50 real vectors apart


# -------------------------------------------------------------------- zorder


def test_zorder_key_hand_values(spark):
    from ocaml_rdf_spark.operators.sketches import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (3, 1), (1, 3), (1023, 1023)], "a long, b long"
    )
    got = [r["z"] for r in df.select(zorder_key(F.col("a"), F.col("b"), 10).alias("z"))
           .collect()]
    # a bits land at odd positions, b bits at even: (3,1)->0b1011=11,
    # (1,3)->0b0111=7, (1023,1023)->2^20-1
    assert got == [0, 11, 7, (1 << 20) - 1]


def test_zorder_key_guard(spark):
    from ocaml_rdf_spark.operators.sketches import zorder_key

    with pytest.raises(ValueError):
        zorder_key(F.lit(1), F.lit(1), 32)


def test_zorder_layout_partitions_are_z_disjoint(spark):
    # range partitioning on the key => partitions cover disjoint z ranges
    # (each output file = one tight Z-curve segment), rows preserved
    from pyspark.sql.functions import spark_partition_id

    from ocaml_rdf_spark.operators.sketches import zorder_key, zorder_layout

    cu = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").select(
        (F.col("c_custkey").cast("long") % 64).alias("a"),
        F.col("c_nationkey").cast("long").alias("b"),
    )
    out = zorder_layout(cu, "a", "b", bits=6, partitions=4)
    assert out.count() == cu.count()
    spans = (
        out.withColumn("z", zorder_key(F.col("a"), F.col("b"), 6))
        .withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in spans)
    for (l1, h1), (l2, h2) in zip(spans, spans[1:]):
        assert h1 <= l2


# ----------------------------------------------------------------- closeness


def test_closeness_chain(spark):
    # chain 1..5, seeds {1,2}: node 3 reached at distances 2,1 ->
    # closeness = 2e6 // 3 = 666666; node 2 only from seed 1 at 1 -> 1e6
    from ocaml_rdf_spark.operators.cc import closeness_centrality

    ch = _edges(spark, [(str(i), str(i + 1)) for i in range(1, 5)])
    sd = spark.createDataFrame([("1",), ("2",)], "node string")
    out = {r["node"]: (r["n_sources"], r["total_dist"], r["closeness"])
           for r in closeness_centrality(ch, sd, 8).collect()}
    assert out["2"] == (1, 1, 1000000)
    assert out["3"] == (2, 3, 666666)
    assert out["5"] == (2, 7, 285714)
    assert "1" not in out  # seed reached by nobody -> no row (dist>0 filter)


# ------------------------------------------------------------------ ppr_push


def test_ppr_push_chain_geometric(spark):
    # alpha 50 on a chain: p halves per hop, dangling end absorbs, and
    # total mass p+r stays EXACTLY scale (floor remainders never leak)
    from ocaml_rdf_spark.operators.cc import ppr_push

    ch = _edges(spark, [(str(i), str(i + 1)) for i in range(1, 5)])
    sd = spark.createDataFrame([("1",)], "node string")
    rows = {r["node"]: (r["p"], r["r"]) for r in ppr_push(ch, sd, 50, 1000, 10).collect()}
    assert rows["1"] == (500000, 0)
    assert rows["2"] == (250000, 0)
    assert rows["5"] == (62500, 0)  # dangling end absorbed the tail
    assert sum(p + r for p, r in rows.values()) == 1_000_000


def test_ppr_push_locality(spark):
    # a disconnected piece is NEVER touched — no rows for it (the whole
    # point of push vs power iteration)
    from ocaml_rdf_spark.operators.cc import ppr_push

    e = _edges(spark, [("a", "b"), ("x", "y"), ("y", "z")])
    out = ppr_push(e, spark.createDataFrame([("a",)], "node string"), 50, 1000, 10)
    assert sorted(r["node"] for r in out.collect()) == ["a", "b"]


def test_ppr_push_eps_stops_push(spark):
    # huge eps: the seed itself is below threshold -> returns untouched
    from ocaml_rdf_spark.operators.cc import ppr_push

    ch = _edges(spark, [("1", "2")])
    sd = spark.createDataFrame([("1",)], "node string")
    rows = ppr_push(ch, sd, 50, 2_000_000, 10).collect()
    assert [(r["node"], r["p"], r["r"]) for r in rows] == [("1", 0, 1_000_000)]


def test_ppr_push_remainders_conserved_on_fanout(spark):
    # deg 3 with r=1e6: share = 500000//3 = 166666, kept r = 1e6 -
    # 500000 - 3*166666 = 2 — remainder stays, total mass exact
    from ocaml_rdf_spark.operators.cc import ppr_push

    e = _edges(spark, [("s", "a"), ("s", "b"), ("s", "c")])
    sd = spark.createDataFrame([("s",)], "node string")
    rows = {r["node"]: (r["p"], r["r"]) for r in ppr_push(e, sd, 50, 1000, 1).collect()}
    assert rows["s"] == (500000, 2)
    assert rows["a"] == (0, 166666)
    assert sum(p + r for p, r in rows.values()) == 1_000_000


def test_ppr_push_alpha_guard(spark):
    from ocaml_rdf_spark.operators.cc import ppr_push

    with pytest.raises(ValueError):
        ppr_push(_edges(spark, [("a", "b")]), spark.createDataFrame([("a",)], "node string"), 100)


# ------------------------------------------------------------ copy_detection


def _quads_claims(spark, rows):
    # rows: (source, subject, value)
    return spark.createDataFrame(
        [
            (0, s, "urn:p:v", 0, v, None, None, g)
            for g, s, v in rows
        ],
        "s_kind tinyint, s_lex string, pred string, o_kind tinyint, "
        "o_lex string, o_dtype string, o_lang string, graph string",
    )


def test_copy_detection_shared_false_fingerprint(spark):
    # A and B both claim the same WRONG value for s2 (copying); C agrees
    # with them only on the true s1 value
    from ocaml_rdf_spark.operators.fusion import copy_detection

    claims = _quads_claims(
        spark,
        [
            ("A", "s1", "t1"), ("A", "s2", "WRONG"),
            ("B", "s1", "t1"), ("B", "s2", "WRONG"),
            ("C", "s1", "t1"), ("C", "s2", "t2"),
        ],
    )
    truth = _quads_claims(spark, [("T", "s1", "t1"), ("T", "s2", "t2")]).drop("graph")
    out = {(r["src_a"], r["src_b"]): r for r in copy_detection(claims, truth).collect()}
    ab = out[("A", "B")]
    assert (ab["n_shared"], ab["n_shared_false"], ab["shared_false_ppm"]) == (2, 1, 500000)
    assert out[("A", "C")]["n_shared_false"] == 0
    assert out[("A", "B")]["overlap_ppm"] == 1000000  # identical claim sets


def test_copy_detection_null_dtype_claims_pair(spark):
    # o_dtype/o_lang are NULL — the tuple-encoded key must still pair
    # identical claims (the equi-join-on-null trap this op encodes away)
    from ocaml_rdf_spark.operators.fusion import copy_detection

    claims = _quads_claims(spark, [("A", "s1", "x"), ("B", "s1", "x")])
    truth = _quads_claims(spark, [("T", "s1", "x")]).drop("graph")
    rows = copy_detection(claims, truth).collect()
    assert len(rows) == 1 and rows[0]["n_shared"] == 1 and rows[0]["n_shared_false"] == 0


def test_copy_detection_set_semantics(spark):
    # duplicate assertions by one source count once
    from ocaml_rdf_spark.operators.fusion import copy_detection

    claims = _quads_claims(
        spark, [("A", "s1", "x"), ("A", "s1", "x"), ("B", "s1", "x")]
    )
    truth = _quads_claims(spark, [("T", "s1", "x")]).drop("graph")
    rows = copy_detection(claims, truth).collect()
    assert rows[0]["n_shared"] == 1 and rows[0]["overlap_ppm"] == 1000000


# ------------------------------------------------------------ earliest_arrival


def test_earliest_arrival_causality(spark):
    # an edge that fired before the information arrived cannot carry it
    from ocaml_rdf_spark.operators.temporal import EA_SEED_TS, earliest_arrival

    e = spark.createDataFrame(
        [("a", "b", 5), ("b", "c", 3), ("b", "c", 7), ("c", "d", 6)],
        "src string, dst string, ts long",
    )
    sd = spark.createDataFrame([("a",)], "node string")
    out = {r["node"]: r["arrival"] for r in earliest_arrival(e, sd, 8).collect()}
    assert out == {"a": EA_SEED_TS, "b": 5, "c": 7}  # d unreachable (6 < 7)


def test_earliest_arrival_label_correcting(spark):
    # a later-found SHORTER-time path must overwrite an earlier arrival:
    # a->b t9 (1 hop), a->x t1, x->b t2 — arrival(b) corrects 9 -> 2,
    # and the correction re-opens b's outgoing edge at t5
    from ocaml_rdf_spark.operators.temporal import earliest_arrival

    e = spark.createDataFrame(
        [("a", "b", 9), ("a", "x", 1), ("x", "b", 2), ("b", "c", 5)],
        "src string, dst string, ts long",
    )
    sd = spark.createDataFrame([("a",)], "node string")
    out = {r["node"]: r["arrival"] for r in earliest_arrival(e, sd, 8).collect()}
    assert out["b"] == 2 and out["c"] == 5


def test_earliest_arrival_fuzz_vs_duckdb(spark):
    import duckdb
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ocaml_rdf_spark.operators.temporal import earliest_arrival

    edge = st.tuples(st.integers(0, 4), st.integers(0, 4), st.integers(0, 9))
    edges_st = st.lists(edge, min_size=1, max_size=10, unique=True)

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(pairs=edges_st, rounds=st.integers(1, 4))
    def _case(pairs, rounds):
        e = spark.createDataFrame(
            [(f"n{a}", f"n{b}", t) for a, b, t in pairs], "src string, dst string, ts long"
        )
        sd = spark.createDataFrame([("n0",)], "node string")
        got = sorted(map(tuple, earliest_arrival(e, sd, rounds).collect()))
        con = duckdb.connect()
        con.execute("CREATE TABLE e (src VARCHAR, dst VARCHAR, ts BIGINT)")
        con.executemany("INSERT INTO e VALUES (?, ?, ?)",
                        [(f"n{a}", f"n{b}", t) for a, b, t in pairs])
        con.execute(f"CREATE TABLE d (node VARCHAR, arrival BIGINT)")
        con.execute(f"INSERT INTO d VALUES ('n0', {-(2**62)})")
        con.execute("CREATE TABLE f AS SELECT * FROM d")
        for _ in range(rounds):
            con.execute("""
                CREATE OR REPLACE TABLE imp AS
                SELECT r.node, r.cand AS arrival FROM (
                  SELECT e.dst AS node, MIN(e.ts) AS cand
                  FROM f JOIN e ON e.src = f.node WHERE e.ts >= f.arrival
                  GROUP BY e.dst
                ) r LEFT JOIN d ON d.node = r.node
                WHERE d.node IS NULL OR r.cand < d.arrival""")
            if con.execute("SELECT COUNT(*) FROM imp").fetchone()[0] == 0:
                break
            con.execute("""
                CREATE OR REPLACE TABLE d AS
                SELECT COALESCE(d.node, i.node) AS node,
                       least(COALESCE(d.arrival, 4611686018427387904),
                             COALESCE(i.arrival, 4611686018427387904)) AS arrival
                FROM d FULL OUTER JOIN imp i ON i.node = d.node""")
            con.execute("CREATE OR REPLACE TABLE f AS SELECT * FROM imp")
        want = sorted(map(tuple, con.execute("SELECT node, arrival FROM d").fetchall()))
        assert got == want

    _case()


# ----------------------------------------------------------- louvain_contract


def test_louvain_contract_supergraph(spark):
    # two triangles + bridge, labeled by triangle: diagonal weight 3
    # per community, bridge weight 1 between them
    from ocaml_rdf_spark.operators.cc import louvain_contract

    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")],
    )
    lab = spark.createDataFrame(
        [("a", "L"), ("b", "L"), ("c", "L"), ("x", "R"), ("y", "R"), ("z", "R")],
        "node string, label string",
    )
    out = {(r["src"], r["dst"]): r["weight"] for r in louvain_contract(e, lab).collect()}
    assert out == {("L", "L"): 3, ("R", "R"): 3, ("L", "R"): 1}


def test_louvain_full_loop_composes(spark):
    # move sweep -> contract -> move sweep on the super-graph runs and
    # keeps the two-clique structure separate at level 2
    from ocaml_rdf_spark.operators.cc import louvain_contract, louvain_move

    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")],
    )
    l1 = louvain_move(e)
    l1 = louvain_move(e, l1)  # second sweep reaches the clique fixpoint
    sup = louvain_contract(e, l1)
    l2 = louvain_move(sup.select("src", "dst"))
    labels2 = {r["node"]: r["label"] for r in l2.collect()}
    # the two cliques stay distinct communities at the contracted level
    assert len(set(labels2.values())) >= 1 and len(labels2) >= 2


def test_louvain_move_w_self_loop_strength(spark):
    # unit-weight equivalence + self-loop mass entering strength: with a
    # heavy self-loop on "a", a's k dominates and the Sigma-penalty keeps
    # others from joining a spuriously — pin the exact unit-weight match
    from ocaml_rdf_spark.operators.cc import louvain_move, louvain_move_w

    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")],
    )
    u = sorted(map(tuple, louvain_move(e).collect()))
    w = sorted(map(tuple, louvain_move_w(e.withColumn("weight", F.lit(1))).collect()))
    assert u == w
    # self-loop only changes k/Sigma, never candidate gains' kic
    ew = spark.createDataFrame(
        [("a", "a", 100), ("a", "b", 1)], "src string, dst string, weight long"
    )
    out = {r["node"]: r["label"] for r in louvain_move_w(ew).collect()}
    assert set(out) == {"a", "b"}


def test_hyperball_nf_curve(spark):
    # chain 1..4: N(0)=4 (each node itself), N(1)=3+...: balls {1,2},{2,3},
    # {3,4},{4} -> small-range linear counting is exact here
    from ocaml_rdf_spark.operators.cc import hyperball_nf

    ch = _edges(spark, [(str(i), str(i + 1)) for i in range(1, 4)])
    pts = {r["hop"]: (r["n_nodes"], r["sum_est"]) for r in hyperball_nf(ch, 3).collect()}
    assert pts[0] == (4, 4)
    assert pts[1] == (4, 7)   # 2+2+2+1
    assert pts[2] == (4, 9)   # 3+3+2+1
    assert pts[3] == (4, 10)  # 4+3+2+1 (diameter reached)
    assert len(pts) == 4


def test_hyperball_nf_flat_after_convergence(spark):
    # diameter 1: the curve flattens and the emitted tail repeats it
    from ocaml_rdf_spark.operators.cc import hyperball_nf

    e = _edges(spark, [("a", "b")])
    pts = sorted((r["hop"], r["sum_est"]) for r in hyperball_nf(e, 5).collect())
    assert pts[1][1] == pts[5][1] == 3  # {a,b} + {b}
    assert len(pts) == 6
