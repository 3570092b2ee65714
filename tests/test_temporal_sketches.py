"""Edge-case tests for the temporal joins (asof/range) and deterministic
sketches (KMV, hash_split) — operators/temporal.py, operators/sketches.py.
The suite oracles cover bulk parity; these pin the corner semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ocaml_rdf_spark.operators.sketches import hash_split, kmv_distinct
from ocaml_rdf_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, tag string")


def test_asof_strict_inequality(spark):
    # a right row at EXACTLY the left ts must not match (strict <)
    left = _events(spark, [(1, _ts("2024-01-01T10:00:00"), "L")])
    right = _events(
        spark,
        [(1, _ts("2024-01-01T10:00:00"), "same"), (1, _ts("2024-01-01T09:59:00"), "prior")],
    )
    out = asof_join(left, right, on=["user_id"], payload=["tag"]).collect()
    assert len(out) == 1 and out[0]["tag_asof"] == "prior"


def test_asof_picks_greatest_prior(spark):
    left = _events(spark, [(1, _ts("2024-01-01T12:00:00"), "L")])
    right = _events(
        spark,
        [
            (1, _ts("2024-01-01T08:00:00"), "old"),
            (1, _ts("2024-01-01T11:59:59"), "newest-prior"),
            (1, _ts("2024-01-01T13:00:00"), "future"),
        ],
    )
    out = asof_join(left, right, on=["user_id"], payload=["tag"]).collect()
    assert out[0]["tag_asof"] == "newest-prior"


def test_asof_inner_vs_left(spark):
    left = _events(spark, [(1, _ts("2024-01-01T10:00:00"), "has"), (2, _ts("2024-01-01T10:00:00"), "none")])
    right = _events(spark, [(1, _ts("2024-01-01T09:00:00"), "r")])
    inner = asof_join(left, right, on=["user_id"], payload=["tag"]).collect()
    assert [r["user_id"] for r in inner] == [1]
    outer = asof_join(left, right, on=["user_id"], payload=["tag"], how="left")
    rows = {r["user_id"]: r["tag_asof"] for r in outer.collect()}
    assert rows == {1: "r", 2: None}


def test_asof_keys_do_not_cross(spark):
    left = _events(spark, [(1, _ts("2024-01-01T10:00:00"), "L")])
    right = _events(spark, [(2, _ts("2024-01-01T09:00:00"), "other-user")])
    assert asof_join(left, right, on=["user_id"], payload=["tag"]).count() == 0


def test_range_join_half_open_bounds(spark):
    # window [ts-60s, ts): left edge IN, right edge OUT
    left = _events(spark, [(1, _ts("2024-01-01T10:01:00"), "L")])
    right = _events(
        spark,
        [
            (1, _ts("2024-01-01T10:00:00"), "at-lower"),      # == ts-60 → in
            (1, _ts("2024-01-01T10:00:30"), "inside"),
            (1, _ts("2024-01-01T10:01:00"), "at-upper"),      # == ts → out
            (1, _ts("2024-01-01T09:59:59"), "below"),
        ],
    )
    out = range_join(left, right, on=["user_id"], lower_s=-60, upper_s=0, payload=["tag"])
    assert sorted(r["tag_r"] for r in out.collect()) == ["at-lower", "inside"]


def test_range_join_crosses_bin_boundary(spark):
    # right rows in different width-sized bins than the left row must
    # still match (the 2-bin probe): window spans a bin edge
    left = _events(spark, [(1, _ts("2024-01-01T00:00:30"), "L")])
    right = _events(spark, [(1, _ts("2024-01-01T00:00:00"), "r0"), (1, _ts("2023-12-31T23:59:45"), "r1")])
    out = range_join(left, right, on=["user_id"], lower_s=-60, upper_s=0, payload=["tag"])
    assert sorted(r["tag_r"] for r in out.collect()) == ["r0", "r1"]


def test_kmv_exact_below_k(spark):
    # fewer distinct values than k → the sketch is exact
    df = spark.range(0, 500).select((F.col("id") % 37).alias("v"))
    row = kmv_distinct(df, "v", k=128).collect()[0]
    assert row["k_used"] == 37 and row["est"] == 37


def test_kmv_estimate_reasonable(spark):
    n = 20_000
    df = spark.range(0, n).select(F.col("id").alias("v"))
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert row["k_used"] == 256
    # KMV standard error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(row["est"] - n) / n < 0.25


def test_hash_split_covers_everything(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    out = hash_split(df, "doc_id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 1000
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # deterministic: same assignment on recompute
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id").collect()}
    assert a == b


# --- HyperLogLog ------------------------------------------------------------


def _hll_vals(spark, vals, group="g"):
    return spark.createDataFrame([(group, v) for v in vals], "g string, v string")


def test_hll_sketch_is_set_function(spark):
    # duplicates never change the register state (pure function of the SET)
    from ocaml_rdf_spark.operators.sketches import hll_sketch

    once = _hll_vals(spark, [f"u{i}" for i in range(50)])
    thrice = once.unionByName(once).unionByName(once)
    a = sorted(map(tuple, hll_sketch(once, "v", ["g"]).collect()))
    b = sorted(map(tuple, hll_sketch(thrice, "v", ["g"]).collect()))
    assert a == b and len(a) > 0


def test_hll_merge_is_cellwise_max(spark):
    # sketch(A ∪ B) == per-bucket max of sketch(A), sketch(B) — the
    # mergeable-summary contract that makes per-key rollups one agg
    from ocaml_rdf_spark.operators.sketches import hll_sketch

    a = _hll_vals(spark, [f"a{i}" for i in range(200)])
    b = _hll_vals(spark, [f"b{i}" for i in range(200)])
    whole = {r["r_bucket"]: r["reg"] for r in hll_sketch(a.unionByName(b), "v", ["g"]).collect()}
    pa = {r["r_bucket"]: r["reg"] for r in hll_sketch(a, "v", ["g"]).collect()}
    pb = {r["r_bucket"]: r["reg"] for r in hll_sketch(b, "v", ["g"]).collect()}
    merged = {k: max(pa.get(k, 0), pb.get(k, 0)) for k in set(pa) | set(pb)}
    assert whole == merged


def test_hll_estimate_accuracy_tiers(spark):
    # small range: linear counting keeps tiny sets near-exact;
    # large range: raw estimator within the ~13% rse tier (3 sigma)
    from ocaml_rdf_spark.operators.sketches import hll_estimate

    small = _hll_vals(spark, [f"s{i}" for i in range(20)])
    est = hll_estimate(small, "v", ["g"]).collect()[0]["est"]
    assert abs(est - 20) <= 6

    big = _hll_vals(spark, [f"x{i}" for i in range(20000)])
    est = hll_estimate(big, "v", ["g"]).collect()[0]["est"]
    assert abs(est - 20000) <= 20000 * 0.40


def test_hll_groups_are_independent(spark):
    from ocaml_rdf_spark.operators.sketches import hll_estimate

    df = _hll_vals(spark, [f"u{i}" for i in range(300)], group="g1").unionByName(
        _hll_vals(spark, ["only"], group="g2")
    )
    rows = {r["g"]: r["est"] for r in hll_estimate(df, "v", ["g"]).collect()}
    assert rows["g2"] == 1 and rows["g1"] > 100


# --- SCD2 snapshot intervals --------------------------------------------------


def test_scd2_interval_chain(spark):
    from ocaml_rdf_spark.operators.temporal import snapshot_intervals

    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100, "a"),
            (1, _ts("2024-01-01T12:00:00"), 101, "b"),
            (2, _ts("2024-01-01T11:00:00"), 200, "z"),
        ],
        "user_id long, ts timestamp, event_id long, tag string",
    )
    iv = snapshot_intervals(df, keys=["user_id"], order_cols=["event_id"], payload=["tag"])
    rows = sorted(iv.collect(), key=lambda r: (r["user_id"], r["valid_from_us"]))
    # per-key chain: each valid_to equals the next valid_from; last is open
    assert rows[0]["valid_to_us"] == rows[1]["valid_from_us"]
    assert rows[1]["valid_to_us"] is None
    assert rows[2]["valid_to_us"] is None  # single-row key stays open
    assert [r["tag"] for r in rows] == ["a", "b", "z"]


def test_scd2_probe_boundaries(spark):
    from ocaml_rdf_spark.operators.temporal import as_of_snapshot, snapshot_intervals

    df = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 1, "old"), (1, _ts("2024-01-01T12:00:00"), 2, "new")],
        "user_id long, ts timestamp, event_id long, tag string",
    )
    iv = snapshot_intervals(df, keys=["user_id"], order_cols=["event_id"], payload=["tag"])
    t10 = 1704103200000000  # 2024-01-01T10:00:00Z exactly
    t12 = 1704110400000000  # 2024-01-01T12:00:00Z exactly
    # inclusive at valid_from, exclusive at valid_to (half-open)
    assert [r["tag"] for r in as_of_snapshot(iv, t10).collect()] == ["old"]
    assert [r["tag"] for r in as_of_snapshot(iv, t12 - 1).collect()] == ["old"]
    assert [r["tag"] for r in as_of_snapshot(iv, t12).collect()] == ["new"]
    # before history: nothing was believed yet
    assert as_of_snapshot(iv, t10 - 1).count() == 0


def test_scd2_tie_gets_zero_length_interval(spark):
    from ocaml_rdf_spark.operators.temporal import as_of_snapshot, snapshot_intervals

    ts = _ts("2024-01-01T10:00:00")
    df = spark.createDataFrame(
        [(1, ts, 1, "first"), (1, ts, 2, "second")],
        "user_id long, ts timestamp, event_id long, tag string",
    )
    iv = snapshot_intervals(df, keys=["user_id"], order_cols=["event_id"], payload=["tag"])
    # the tie loser's interval is [t, t) — unmatchable by any half-open probe
    out = as_of_snapshot(iv, 1704103200000000).collect()
    assert [r["tag"] for r in out] == ["second"]


# --- score_resample -----------------------------------------------------------


def test_score_resample_extremes_and_determinism(spark):
    from ocaml_rdf_spark.operators.sketches import score_resample

    df = spark.createDataFrame(
        [(i, s) for i, s in [(1, 0), (2, 1000), (3, 999999), (4, 500), (5, -3)]],
        "doc_id long, score long",
    )
    out = {r["doc_id"]: r["kept"] for r in score_resample(df, "doc_id", "score", 1000).collect()}
    assert out[1] is False        # score 0 never kept
    assert out[2] is True         # score == max_score always kept
    assert out[3] is True         # clamped above max_score → always kept
    assert out[5] is False        # negative scores never kept
    # pure function of the id: same answer at any partitioning
    out2 = {
        r["doc_id"]: r["kept"]
        for r in score_resample(df.repartition(7), "doc_id", "score", 1000).collect()
    }
    assert out == out2


def test_score_resample_rate_tracks_score(spark):
    from ocaml_rdf_spark.operators.sketches import score_resample

    n = 4000
    df = spark.createDataFrame([(i, 250) for i in range(n)], "doc_id long, score long")
    kept = score_resample(df, "doc_id", "score", 1000).filter("kept").count()
    assert abs(kept / n - 0.25) < 0.05  # ~score/max_score survival


def test_score_resample_rejects_bad_max(spark):
    from ocaml_rdf_spark.operators.sketches import score_resample
    import pytest as _pt

    df = spark.createDataFrame([(1, 1)], "doc_id long, score long")
    with _pt.raises(ValueError):
        score_resample(df, "doc_id", "score", 0)


# --- funnel -------------------------------------------------------------------


def _fev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_funnel_depths_and_anchor(spark):
    from ocaml_rdf_spark.operators.events import funnel

    T = _ts
    ev = _fev(spark, [
        # u1 completes in order
        (1, T("2024-01-01T10:00:00"), 1, "view"),
        (2, T("2024-01-01T10:05:00"), 1, "click"),
        (3, T("2024-01-01T10:10:00"), 1, "purchase"),
        # u2: purchase BEFORE click — order matters, depth 2
        (4, T("2024-01-01T10:00:00"), 2, "view"),
        (5, T("2024-01-01T10:01:00"), 2, "purchase"),
        (6, T("2024-01-01T10:02:00"), 2, "click"),
        # u3: never starts
        (7, T("2024-01-01T10:00:00"), 3, "click"),
    ])
    out = {r["user_id"]: (r["depth"], r["completed"]) for r in
           funnel(ev, ["view", "click", "purchase"], within_s=3600).collect()}
    assert out[1] == (3, True)
    assert out[2] == (2, False)
    assert out[3] == (0, False)


def test_funnel_window_and_strictness(spark):
    from ocaml_rdf_spark.operators.events import funnel

    T = _ts
    ev = _fev(spark, [
        # click outside the window from the FIRST view → depth 1
        (1, T("2024-01-01T10:00:00"), 1, "view"),
        (2, T("2024-01-01T12:00:01"), 1, "click"),
        # same-instant events can't satisfy consecutive steps (strict >)
        (3, T("2024-01-01T10:00:00"), 2, "view"),
        (4, T("2024-01-01T10:00:00"), 2, "click"),
    ])
    out = {r["user_id"]: r["depth"] for r in
           funnel(ev, ["view", "click"], within_s=7200).collect()}
    assert out[1] == 1 and out[2] == 1


def test_funnel_anchors_at_earliest_first_step(spark):
    from ocaml_rdf_spark.operators.events import funnel

    T = _ts
    # a LATER view would fit the window, but the funnel anchors at the
    # earliest view — the click at +3h misses the 1h window from 10:00
    ev = _fev(spark, [
        (1, T("2024-01-01T10:00:00"), 1, "view"),
        (2, T("2024-01-01T12:30:00"), 1, "view"),
        (3, T("2024-01-01T13:00:00"), 1, "click"),
    ])
    out = funnel(ev, ["view", "click"], within_s=3600).collect()[0]
    assert out["depth"] == 1 and out["t1_us"] == 1704103200000000


def test_exact_quantiles_small(spark):
    from ocaml_rdf_spark.operators.sketches import exact_quantiles

    df = spark.createDataFrame([(v,) for v in [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]], "v long")
    out = {r["q_pct"]: (r["rank"], r["value"]) for r in
           exact_quantiles(df, "v", [0.1, 0.5, 1.0]).collect()}
    assert out[10] == (1, 10)     # ceil(0.1*10)=1 -> smallest
    assert out[50] == (5, 50)     # 5th smallest
    assert out[100] == (10, 100)  # max


def test_exact_quantiles_ties_and_skew(spark):
    from ocaml_rdf_spark.operators.sketches import exact_quantiles

    # 999 copies of 7 and one 9: p50 lands inside the tie run
    rows = [(7,)] * 999 + [(9,)]
    df = spark.createDataFrame(rows, "v long").repartition(8)
    out = {r["q_pct"]: r["value"] for r in exact_quantiles(df, "v", [0.5, 1.0], buckets=4).collect()}
    assert out[50] == 7 and out[100] == 9


def test_exact_quantiles_partitioning_invariant(spark):
    from ocaml_rdf_spark.operators.sketches import exact_quantiles

    rows = [((i * 37) % 1000,) for i in range(500)]
    df = spark.createDataFrame(rows, "v long")
    a = sorted(map(tuple, exact_quantiles(df.repartition(2), "v", [0.25, 0.75]).collect()))
    b = sorted(map(tuple, exact_quantiles(df.repartition(16), "v", [0.25, 0.75]).collect()))
    assert a == b
