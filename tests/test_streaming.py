"""Structured Streaming adapter tests: incremental extraction with
exactly-once checkpointing (streaming.py)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from ocaml_rdf_spark.datagen import gen_pages_df
from ocaml_rdf_spark.extract import ERROR_PRED, extract_triples
from ocaml_rdf_spark.streaming import stream_extract


def _write_pages(spark, lo, hi, path):
    # generate [0, hi) then filter — page_record(i) is pure in i, so slices
    # are stable across calls
    df = gen_pages_df(spark, hi, parts=2).withColumn(
        "i", F.regexp_extract("url", r"/page/(\d+)$", 1).cast("long")
    )
    df.filter((F.col("i") >= lo) & (F.col("i") < hi)).drop("i").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_incremental_extract_exactly_once(spark, tmp_path):
    inp = str(tmp_path / "pages")
    out = str(tmp_path / "triples")
    ckpt = str(tmp_path / "ckpt")

    _write_pages(spark, 0, 40, inp)
    q = stream_extract(spark, inp, out, ckpt, available_now=True)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    # batch reference for the same 40 pages
    ref1 = extract_triples(gen_pages_df(spark, 40, parts=2)).count()
    assert n1 == ref1

    # drop 40 more pages; only the delta is processed (checkpoint resume)
    _write_pages(spark, 40, 80, inp)
    q2 = stream_extract(spark, inp, out, ckpt, available_now=True)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    ref2 = extract_triples(gen_pages_df(spark, 80, parts=2)).count()
    assert n2 == ref2  # no duplicates, no gaps — exactly-once append

    # re-running with nothing new is a no-op
    q3 = stream_extract(spark, inp, out, ckpt, available_now=True)
    q3.awaitTermination(120)
    assert spark.read.parquet(out).count() == n2


def test_stream_windowed_counts_matches_batch(spark, tmp_path):
    """The watermarked streaming window plan, drained with availableNow
    over a static events directory, must equal the batch operator
    (stream/batch parity — same logical aggregation)."""
    import shutil

    from ocaml_rdf_spark.operators.events import tumbling_counts
    from ocaml_rdf_spark.streaming import stream_windowed_counts

    inp = str(tmp_path / "events")
    out = str(tmp_path / "win")
    ckpt = str(tmp_path / "ckpt_win")
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src.coalesce(1).write.parquet(inp)

    sdf = stream_windowed_counts(spark, inp, minutes=60, watermark="0 seconds")
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["bucket"], r["event_type"]): (r["n_events"], r["sum_value_x100"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["bucket"], r["event_type"]): (r["n_events"], r["sum_value_x100"])
        for r in tumbling_counts(src, 60).collect()
    }
    # append mode emits a window only once the watermark (max event time
    # here) passes its END — the final in-progress window is correctly
    # withheld until later data arrives. So: emitted ≡ batch result for
    # every closed window; withheld ≡ only still-open windows.
    max_ts = src.agg(F.max(F.col("ts").cast("timestamp_ltz").cast("long"))).collect()[0][0]
    closed = {k: v for k, v in want.items() if (k[0] + 1) * 3600 <= max_ts}
    assert got == closed or got == want  # ⊇ closed if Spark finalizes all on drain
    assert all(got[k] == want[k] for k in got)


def test_stream_sessionize_matches_batch_closed_sessions(spark, tmp_path):
    """applyInPandasWithState sessionization parity: draining a static
    events directory emits exactly the CLOSED sessions (a later event
    proved the gap passed); each user's final session stays in state
    awaiting the timeout. Batch reference: operators.events.sessionize's
    per-session aggregate minus each user's last session."""
    from ocaml_rdf_spark.operators.events import sessionize
    from ocaml_rdf_spark.streaming import stream_sessionize

    inp = str(tmp_path / "events_s")
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt_sess")
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src.coalesce(1).write.parquet(inp)

    sdf = stream_sessionize(spark, inp, gap_minutes=30, flush_timeout=False)
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["session_idx"]): (r["start_us"], r["end_us"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    }

    s = sessionize(src, 30).withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    )
    agg = s.groupBy("user_id", "session_idx").agg(
        F.min("us").alias("start_us"), F.max("us").alias("end_us"), F.count(F.lit(1)).alias("n")
    )
    last = agg.groupBy("user_id").agg(F.max("session_idx").alias("last_idx"))
    closed = agg.join(last, "user_id").filter(F.col("session_idx") != F.col("last_idx"))
    want = {
        (r["user_id"], r["session_idx"]): (r["start_us"], r["end_us"], r["n"])
        for r in closed.collect()
    }
    assert got == want
    assert len(got) > 0


def test_stream_dedup_exact_matches_batch(spark, tmp_path):
    """Streaming exact dedup (availableNow drain) keeps exactly one row
    per distinct text — same key set as the batch dedup."""
    import pandas as pd

    from ocaml_rdf_spark.streaming import stream_dedup_exact

    inp = str(tmp_path / "docs")
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(8)),
            "text": ["aa", "bb", "aa", "cc", "bb", "aa", "dd", "cc"],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(inp)

    out = str(tmp_path / "deduped")
    q = (
        stream_dedup_exact(spark, inp)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    texts = sorted(r["text"] for r in got.collect())
    assert texts == ["aa", "bb", "cc", "dd"]


def test_stream_dedup_within_watermark_bounded_state(spark, tmp_path):
    """Watermarked variant: dropDuplicatesWithinWatermark suppresses
    duplicates inside the lateness bound with watermark-deep state."""
    import datetime as dt

    import pandas as pd

    from ocaml_rdf_spark.streaming import stream_dedup_exact

    inp = str(tmp_path / "docs")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(6)),
            "ts": [t0 + dt.timedelta(minutes=m) for m in (0, 1, 2, 3, 4, 5)],
            "text": ["aa", "aa", "bb", "bb", "aa", "cc"],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(inp)

    out = str(tmp_path / "deduped")
    q = (
        stream_dedup_exact(spark, inp, event_time_col="ts", watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    texts = sorted(r["text"] for r in spark.read.parquet(out).collect())
    assert texts == ["aa", "bb", "cc"]


def test_stream_dedup_minhash_matches_batch(spark, tmp_path):
    """Streaming near-dup: signature-equal docs (same word set — word
    order / extra whitespace don't matter) collapse to one survivor;
    the surviving signature set equals the batch signature dedup."""
    import pandas as pd

    from ocaml_rdf_spark.operators.textops import minhash_signature_col
    from ocaml_rdf_spark.streaming import stream_dedup_minhash

    inp = str(tmp_path / "docs")
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(6)),
            "text": [
                "the quick brown fox",
                "fox  brown the quick",   # same word set -> near-dup
                "a completely different document",
                "the quick brown fox",    # exact dup
                "different a completely document",  # near-dup of #2
                "unique text here",
            ],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(inp)

    out = str(tmp_path / "nd")
    q = (
        stream_dedup_minhash(spark, inp)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_nd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 3  # one per word-set class

    import pyspark.sql.functions as F

    batch_sigs = sorted(
        r[0]
        for r in spark.read.parquet(inp)
        .select(minhash_signature_col(F.col("text")))
        .distinct()
        .collect()
    )
    stream_sigs = sorted(
        r[0] for r in got.select(minhash_signature_col(F.col("text"))).collect()
    )
    assert stream_sigs == batch_sigs


def test_stream_url_dedup_canonical_suppression(spark, tmp_path):
    """Streaming url dedup (availableNow drain) keeps one row per
    CANONICAL url — re-fetches under tracking params/fragments/case are
    suppressed, matching the batch url_dedup key set."""
    import pandas as pd

    from ocaml_rdf_spark.streaming import stream_url_dedup

    inp = str(tmp_path / "pages")
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "url": [
                "https://ex.com/p",
                "HTTPS://EX.COM/p#frag",          # same canonical as 0
                "https://ex.com/p?utm_source=x",  # same canonical as 0
                "https://ex.com/q?b=2&a=1",
                "https://ex.com/q?a=1&b=2",       # same canonical as 3
            ],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(inp)

    out = str(tmp_path / "deduped")
    q = (
        stream_url_dedup(spark, inp)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    canon = sorted(r["canon_url"] for r in got.collect())
    assert canon == ["https://ex.com/p", "https://ex.com/q?a=1&b=2"]


def test_stream_extract_with_delta_commits(spark, tmp_path):
    """End-to-end incremental KG: micro-batched extraction feeds
    commit_delta per batch — the store converges to the batch-mode
    triple set, and the patch chain records one version per micro-batch
    with time travel back to the first commit."""
    from ocaml_rdf_spark.datagen import gen_pages_df
    from ocaml_rdf_spark.extract import dedup_triples, extract_triples, split_errors
    from ocaml_rdf_spark.pipeline import Pipeline, commit_delta, store_at_version
    from ocaml_rdf_spark.streaming import stream_extract_foreach_batch
    from ocaml_rdf_spark.types import TRIPLE_KEY

    pages_dir = str(tmp_path / "pages")
    # two files -> with maxFilesPerTrigger=1 the drain yields 2 micro-batches
    gen_pages_df(spark, 40, parts=1).write.parquet(pages_dir + "/p1")
    gen_pages_df(spark, 80, parts=1).filter("url LIKE '%4%'").write.parquet(
        pages_dir + "/p2"
    )

    root = str(tmp_path / "pipe")
    state = {"versions": []}

    def apply_batch(triples, batch_id):
        batch = dedup_triples(split_errors(triples)[0]).select(*TRIPLE_KEY)
        marker = Pipeline(spark, root, "seed").io.is_committed("store")
        if marker is None:
            Pipeline(spark, root, f"b{batch_id}").stage(
                "store", lambda sp, p: batch
            ).run()
        else:
            prev = Pipeline(spark, root, "x").io.read(spark, "store")
            merged = prev.unionByName(batch).dropDuplicates(TRIPLE_KEY)
            m = commit_delta(spark, root, "store", merged, f"b{batch_id}")
            state["versions"].append((m["n_added"], m["n_removed"]))

    q = stream_extract_foreach_batch(
        spark, pages_dir + "/p*", str(tmp_path / "ckpt"), apply_batch,
        available_now=True, max_files_per_batch=1,
    )
    q.awaitTermination(180)

    got = spark.read.parquet(root + "/store/data").select(*TRIPLE_KEY)
    # batch-mode reference over the SAME page files
    all_pages = spark.read.parquet(pages_dir + "/p1", pages_dir + "/p2")
    want = dedup_triples(split_errors(extract_triples(all_pages))[0]).select(*TRIPLE_KEY)
    assert got.subtract(want).count() == 0 and want.subtract(got).count() == 0
    # incremental commits only ADD (monotone union), and v0 time-travels
    # back to the first micro-batch's store
    assert state["versions"] and all(rm == 0 for _a, rm in state["versions"])
    v0 = store_at_version(spark, root, "store", 0)
    assert 0 < v0.count() < got.count()


def test_stream_hll_matches_batch_bitwise(spark, tmp_path):
    """Streaming HLL fold (per-micro-batch register merge via cell-wise
    MAX) drained with availableNow equals the batch hll_sketch /
    hll_estimate over the same files bit-for-bit — the mergeable-summary
    contract driven through the streaming surface."""
    import pandas as pd

    from ocaml_rdf_spark.operators.sketches import hll_estimate, hll_sketch
    from ocaml_rdf_spark.streaming import stream_hll_estimate

    inp = str(tmp_path / "ev")
    # multiple files → multiple micro-batches under maxFilesPerTrigger
    for i in range(3):
        pdf = pd.DataFrame(
            {
                "g": ["a"] * 40 + ["b"] * 10,
                "v": [f"u{i}_{j}" for j in range(40)] + [f"shared{j}" for j in range(10)],
            }
        )
        spark.createDataFrame(pdf).repartition(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(inp)

    h = stream_hll_estimate(spark, inp, "v", ["g"])
    h.query.awaitTermination(120)

    batch = spark.read.parquet(inp)
    want_regs = sorted(map(tuple, hll_sketch(batch, "v", ["g"]).collect()))
    got_regs = sorted(map(tuple, h.registers().collect()))
    assert got_regs == want_regs

    want_est = sorted(map(tuple, hll_estimate(batch, "v", ["g"]).collect()))
    got_est = sorted(map(tuple, h.estimates().collect()))
    assert got_est == want_est
    # 'shared' values repeat across files: the fold must not double-count
    ests = {r["g"]: r["est"] for r in h.estimates().collect()}
    assert ests["b"] <= 14  # ~10 distinct, small-range linear counting


def test_stream_cms_matches_batch_bitwise(spark, tmp_path):
    """Streaming CMS fold (cell-wise ADD per micro-batch) equals the
    batch sketch bit-for-bit, and the driver-side point read reproduces
    the JVM hash derivation exactly (estimates >= true counts, equal
    for unaliased tokens)."""
    import pandas as pd

    from ocaml_rdf_spark.operators.textops import cms_sketch
    from ocaml_rdf_spark.streaming import stream_cms_sketch

    inp = str(tmp_path / "docs")
    for i in range(3):
        pdf = pd.DataFrame(
            {
                "doc_id": range(i * 10, i * 10 + 10),
                "text": [f"alpha beta w{i}_{j} alpha" for j in range(10)],
            }
        )
        spark.createDataFrame(pdf).repartition(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(inp)

    h = stream_cms_sketch(spark, inp, width=512)
    h.query.awaitTermination(120)

    batch = spark.read.parquet(inp)
    want = sorted(map(tuple, cms_sketch(batch, width=512).collect()))
    got = sorted(map(tuple, h.cells().collect()))
    assert got == want

    # NB the tokenizer normalizes '_' to space, so "w0_0" splits into
    # "w0" + "0" — probe the normalized forms
    est = h.estimate(["alpha", "beta", "w0", "neverseen"])
    assert est["alpha"] >= 60 and est["beta"] >= 30  # CMS over-estimates only
    # wide grid, tiny vocab: the probes are collision-free here, so exact
    assert est["alpha"] == 60 and est["beta"] == 30
    assert est["w0"] == 10 and est["neverseen"] == 0


def test_stream_canonicalize_matches_batch_and_resumes(spark, tmp_path):
    """Micro-batched sameAs edges folded through incremental_components
    equal the one-shot batch CC at every step, and a SECOND stream run
    over the same checkpoint processes ONLY newly arrived files."""
    from ocaml_rdf_spark.operators.cc import connected_components
    from ocaml_rdf_spark.streaming import latest_mapping, stream_canonicalize

    edges_dir = str(tmp_path / "edges")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def edges(rows):
        return spark.createDataFrame(rows, "src string, dst string")

    f1 = [("a", "b"), ("c", "d")]
    f2 = [("b", "c"), ("x", "y")]
    edges(f1).coalesce(1).write.mode("append").parquet(edges_dir)
    edges(f2).coalesce(1).write.mode("append").parquet(edges_dir)

    q = stream_canonicalize(
        spark, edges_dir, state, ckpt, available_now=True, max_files_per_batch=1
    )
    q.awaitTermination(180)
    got = sorted(map(tuple, latest_mapping(spark, state).select("node", "component").collect()))
    want = sorted(map(tuple, connected_components(edges(f1 + f2)).collect()))
    assert got == want
    versions_after_first = sorted(os.listdir(state))
    assert len(versions_after_first) >= 2  # one mapping version per micro-batch

    # late batch merges two standing components; resume from the SAME
    # checkpoint must fold only the new file
    f3 = [("d", "x"), ("p", "q")]
    edges(f3).coalesce(1).write.mode("append").parquet(edges_dir)
    q2 = stream_canonicalize(
        spark, edges_dir, state, ckpt, available_now=True, max_files_per_batch=1
    )
    q2.awaitTermination(180)
    got2 = sorted(map(tuple, latest_mapping(spark, state).select("node", "component").collect()))
    want2 = sorted(map(tuple, connected_components(edges(f1 + f2 + f3)).collect()))
    assert got2 == want2
    assert len(sorted(os.listdir(state))) == len(versions_after_first) + 1


def test_stream_link_entities_matches_batch(spark, tmp_path):
    """Stream-static entity linking: per-micro-batch link_exact over the
    broadcast alias dictionary equals the batch run over the same pages."""
    from ocaml_rdf_spark.extract import extract_text_df
    from ocaml_rdf_spark.operators.linking import detect_mentions, link_exact
    from ocaml_rdf_spark.streaming import stream_link_entities

    pages_dir = str(tmp_path / "pages")
    # DISJOINT url sets: ranking is mention-local, but a url recrawled in a
    # later micro-batch would link twice (dedup is the batch compaction's
    # job, per the module docstring)
    _write_pages(spark, 0, 30, pages_dir + "/p1")
    all60 = gen_pages_df(spark, 60, parts=1).withColumn(
        "i", F.regexp_extract("url", r"/page/(\d+)$", 1).cast("long")
    )
    all60.filter("i >= 30").drop("i").coalesce(1).write.parquet(pages_dir + "/p2")
    aliases = spark.createDataFrame(
        [("data", "urn:e:data", 0.9), ("page", "urn:e:page", 0.8)],
        "alias string, uri string, prior double",
    )
    got_batches = []

    def collect_batch(links, batch_id):
        got_batches.append(links.toPandas())

    q = stream_link_entities(
        spark, pages_dir + "/p*", aliases, str(tmp_path / "ckpt"),
        collect_batch, available_now=True, max_files_per_batch=1,
    )
    q.awaitTermination(180)
    assert len(got_batches) == 2

    all_pages = spark.read.parquet(pages_dir + "/p1", pages_dir + "/p2")
    docs = extract_text_df(all_pages).select(
        F.xxhash64("url").alias("doc_id"), F.col("text")
    )
    want = link_exact(detect_mentions(docs), aliases).toPandas()
    import pandas as pd

    got = pd.concat(got_batches, ignore_index=True) if got_batches else want.iloc[:0]
    key = sorted(want.columns)
    a = sorted(map(tuple, got[key].astype(str).values.tolist()))
    b = sorted(map(tuple, want[key].astype(str).values.tolist()))
    assert a == b and len(b) > 0


def test_stream_attribute_clicks_matches_batch(spark, tmp_path):
    """The watermarked stream-stream attribution join, drained with
    availableNow, must equal the same time-bounded join run in batch —
    inner-join matches emit as they arrive, so nothing is withheld."""
    from ocaml_rdf_spark.streaming import stream_attribute_clicks

    inp = str(tmp_path / "events")
    out = str(tmp_path / "attr")
    ckpt = str(tmp_path / "ckpt_attr")
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src.coalesce(1).write.parquet(inp)

    sdf = stream_attribute_clicks(spark, inp, horizon_minutes=30, watermark="0 seconds")
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(
        (r["user_id"], r["imp_id"], r["click_id"], r["gap_us"])
        for r in spark.read.parquet(out).collect()
    )

    us = lambda c: F.unix_micros(F.col(c).cast("timestamp_ltz"))  # noqa: E731
    imp = src.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("imp_id"), F.col("ts").alias("imp_ts")
    )
    clk = src.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    want = sorted(
        (r["user_id"], r["imp_id"], r["click_id"], r["gap_us"])
        for r in imp.join(
            clk,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("click_ts") >= F.col("imp_ts"))
            & (F.col("click_ts") < F.col("imp_ts") + F.expr("interval 30 minutes")),
        )
        .select(
            "user_id", "imp_id", "click_id",
            (us("click_ts") - us("imp_ts")).alias("gap_us"),
        )
        .collect()
    )
    assert len(want) > 0  # the fixture must actually exercise the join
    assert got == want


def test_stream_hopping_counts_matches_batch(spark, tmp_path):
    """Hopping-window streaming plan drained with availableNow equals the
    batch operator for every window the watermark closed."""
    from ocaml_rdf_spark.operators.events import hopping_counts
    from ocaml_rdf_spark.streaming import stream_hopping_counts

    inp = str(tmp_path / "events")
    out = str(tmp_path / "hop")
    ckpt = str(tmp_path / "ckpt_hop")
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src.coalesce(1).write.parquet(inp)

    sdf = stream_hopping_counts(spark, inp, window_minutes=60, hop_minutes=15,
                                watermark="0 seconds")
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["bucket"], r["event_type"]): (r["n_events"], r["sum_value_x100"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["bucket"], r["event_type"]): (r["n_events"], r["sum_value_x100"])
        for r in hopping_counts(src, 60, 15).collect()
    }
    max_ts = src.agg(F.max(F.col("ts").cast("timestamp_ltz").cast("long"))).collect()[0][0]
    # a window [bucket*900, bucket*900 + 3600) is closed once max event
    # time passes its end
    closed = {k: v for k, v in want.items() if k[0] * 900 + 3600 <= max_ts}
    assert all(got[k] == want[k] for k in got)
    assert set(closed) <= set(got)
