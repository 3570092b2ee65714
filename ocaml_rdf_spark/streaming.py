"""Structured Streaming adapter for incremental KG construction.

The reference is strictly batch (SURVEY §2.9 — no streaming concepts in
ocaml-rdf), and the north rule's resumability is stage-checkpoint based
(pipeline.py). This module is the documented seam on top: a continuously
arriving pages table (file source here; Kafka/Iceberg-CDC in production)
is extracted incrementally with exactly-once progress tracked by the
Structured Streaming checkpoint — new page files become new triple
parquet files without re-parsing history.

Scale notes: the stream stage is map-only (same vectorized extractor),
so micro-batch size controls latency/throughput; global set-dedup is NOT
done in-stream (that would need unbounded state) — the periodic batch
`dedup_triples` + canonicalization stages of pipeline.py own it, exactly
like a lambda-architecture compaction.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from .extract import extract_triples
from .types import PAGES_SCHEMA


def read_pages_stream(spark: SparkSession, input_dir: str, max_files_per_batch: int = 16) -> DataFrame:
    """File-source stream over a pages parquet directory (new files =
    new micro-batches)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_batch)
        .parquet(input_dir)
    )


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_batch: int = 16,
):
    """pages stream → TRIPLES parquet, exactly-once via checkpoint.

    `available_now=True` drains everything currently available and stops
    (incremental batch — the recommended production trigger for periodic
    runs); False runs continuously until `.stop()`.
    Returns the StreamingQuery.
    """
    pages = read_pages_stream(spark, input_dir, max_files_per_batch)
    triples = extract_triples(pages)
    writer = (
        triples.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_extract_foreach_batch(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    batch_fn,
    available_now: bool = True,
    max_files_per_batch: int = 16,
):
    """foreachBatch variant: `batch_fn(triples_df, batch_id)` receives each
    micro-batch's extracted triples — the hook where production code does
    Iceberg MERGE (set-semantics upsert) instead of blind append."""
    pages = read_pages_stream(spark, input_dir, max_files_per_batch)

    def run(batch_df: DataFrame, batch_id: int) -> None:
        batch_fn(extract_triples(batch_df), batch_id)

    writer = (
        pages.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    gap_minutes: int = 30,
    max_files_per_batch: Optional[int] = None,
    flush_timeout: bool = True,
) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization via
    `applyInPandasWithState` (the Arrow-batched stateful escape hatch the
    engine reserves for semantics window functions can't express
    incrementally — SURVEY §2.10).

    Per-user state = the OPEN session (idx, start_us, last_us, n_events).
    Each micro-batch extends or closes sessions: a closed session (a later
    event arrived past the gap) is emitted immediately; the open session
    stays in state and is emitted when the processing-time timeout (= gap)
    fires with no new events. Batch parity: the emitted closed sessions
    equal operators.events.sessionize's sessions minus each user's last
    (still-open) one — tested in tests/test_streaming.py.

    Scale notes: state is one tiny tuple per active user (bounded by the
    timeout, not by history); the only shuffle is the groupBy(user_id)
    exchange; all per-event work is vectorized pandas (diff/cumsum/groupby
    — no per-row Python loop).
    """
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = "user_id long, session_idx long, start_us long, end_us long, n_events long"
    state_schema = "session_idx long, start_us long, last_us long, n_events long"

    def fn(key, pdf_iter, state):
        (user_id,) = key
        if state.hasTimedOut:
            si, st, la, n = state.get
            state.remove()
            yield pd.DataFrame(
                [[user_id, si, st, la, n]],
                columns=["user_id", "session_idx", "start_us", "end_us", "n_events"],
            )
            return
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        us = (pdf["ts"].astype("int64") // 1000).to_numpy()
        if state.exists:
            si0, st0, la0, n0 = state.get
        else:
            si0, st0, la0, n0 = 0, None, None, 0
        # vectorized session assignment: a new session starts where the
        # inter-event gap exceeds the threshold (carry-in gap uses the
        # stored last_us of the open session)
        prev = pd.Series(us).shift(1)
        if la0 is not None:
            prev.iloc[0] = la0
        new_flag = prev.isna() | ((us - prev) > gap_us)
        sid = si0 + new_flag.cumsum().astype("int64")
        if la0 is not None and not new_flag.iloc[0]:
            sid = sid  # first batch events continue session si0 (cumsum adds 0)
        g = pd.DataFrame({"sid": sid.to_numpy(), "us": us}).groupby("sid")["us"].agg(
            ["min", "max", "count"]
        )
        # merge the open-session carry-in into its continuation group
        if la0 is not None and not new_flag.iloc[0]:
            g.loc[si0, "min"] = min(g.loc[si0, "min"], st0)
            g.loc[si0, "count"] = g.loc[si0, "count"] + n0
        elif la0 is not None:
            # gap already exceeded at batch start: the stored session closed
            yield pd.DataFrame(
                [[user_id, si0, st0, la0, n0]],
                columns=["user_id", "session_idx", "start_us", "end_us", "n_events"],
            )
        last_sid = int(g.index.max())
        closed = g.loc[g.index != last_sid].reset_index()
        if len(closed):
            yield pd.DataFrame(
                {
                    "user_id": user_id,
                    "session_idx": closed["sid"],
                    "start_us": closed["min"],
                    "end_us": closed["max"],
                    "n_events": closed["count"],
                }
            )
        row = g.loc[last_sid]
        state.update((last_sid, int(row["min"]), int(row["max"]), int(row["count"])))
        if flush_timeout:
            state.setTimeoutDuration(gap_us // 1000)

    reader = spark.readStream.schema(_EVENTS_SCHEMA())
    if max_files_per_batch is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_batch)
    ev = reader.parquet(input_dir)
    from pyspark.sql.streaming.state import GroupStateTimeout

    # append output mode: every emitted row is a FINALIZED session (closed
    # by a later event or by timeout), so file sinks compose directly.
    # flush_timeout=False drops the processing-time timer: open sessions
    # then stay in state forever instead of flushing after the gap —
    # REQUIRED for bounded drains (trigger availableNow keeps scheduling
    # empty micro-batches until every registered timer has fired, so a
    # 30-minute gap pins the drain for 30 minutes; a drain only observes
    # closed sessions either way).
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout if flush_timeout else GroupStateTimeout.NoTimeout
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout_conf
    )


def _EVENTS_SCHEMA():
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def stream_windowed_counts(
    spark: SparkSession,
    input_dir: str,
    minutes: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming tumbling-window aggregation over an events stream
    (event_id, ts, user_id, event_type, value) with late-data handling:
    `withWatermark` bounds state (windows older than the watermark are
    finalized and dropped from the state store), then the same
    window/groupBy plan as the batch operators.events.tumbling_counts.

    Returns the unstarted streaming DataFrame — callers attach a sink
    (`writeStream.outputMode("append")` emits each window once, on
    watermark passage). Batch/stream parity is tested by running this
    plan with availableNow over a static directory and comparing to the
    batch operator.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    ev = spark.readStream.schema(schema).parquet(input_dir)
    w = F.window(F.col("ts"), f"{minutes} minutes")
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_x100"),
        )
        .select(
            # floor, not a truncating cast — keeps pre-1970 buckets aligned
            # with the batch operator (operators/events.py)
            F.floor(F.col("w.start").cast("timestamp_ltz").cast("long") / (minutes * 60)).cast("long").alias("bucket"),
            "event_type",
            "n_events",
            "sum_value_x100",
        )
    )


def stream_dedup_exact(
    spark: SparkSession,
    input_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    event_time_col: Optional[str] = None,
    watermark: str = "1 hour",
    max_files_per_batch: Optional[int] = None,
) -> DataFrame:
    """Streaming exact dedup over an arriving documents table — the
    in-stream half of the training-data dedup family (textops.py owns the
    batch forms).

    State discipline (the 100 TB concern): with an event-time column,
    `dropDuplicatesWithinWatermark` on the content hash keeps ONLY
    watermark-deep state — duplicates arriving within the lateness bound
    are suppressed, and the state store evicts hashes older than the
    watermark (bounded state, runs forever). Without an event-time
    column it falls back to `dropDuplicates` (exact global set, state
    grows with distinct keys — correct, but only for bounded streams;
    the periodic batch `dedup_exact` compaction owns the global
    guarantee, lambda-style, exactly like triple dedup).
    """
    from pyspark.sql import functions as F

    # file-source streams need an explicit schema; take it from the files
    # already present (production: the Iceberg table schema)
    schema = spark.read.parquet(input_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_batch is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_batch)
    docs = reader.parquet(input_dir)
    hashed = docs.withColumn("__h", F.md5(F.col(text_col).cast("binary")))
    if event_time_col is not None:
        return (
            hashed.withWatermark(event_time_col, watermark)
            .dropDuplicatesWithinWatermark(["__h"])
            .drop("__h")
        )
    return hashed.dropDuplicates(["__h"]).drop("__h")


def stream_dedup_minhash(
    spark: SparkSession,
    input_dir: str,
    text_col: str = "text",
    bands: int = 8,
    event_time_col: Optional[str] = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming NEAR-duplicate suppression: drop documents whose full
    MinHash signature (textops.minhash_signature_col — a per-row column
    expression, no pre-state aggregation) matches an earlier document.

    Tier honesty: full-signature equality is the strictest LSH tier — it
    catches near-identical documents (boilerplate re-crawls, trivial
    whitespace/markup edits that leave the word set ~unchanged) but not
    moderate-overlap near-dups, which need band-bucketed candidate
    generation + Jaccard verify; that cross-document join is the batch
    pipeline's job (textops.near_dup_clusters — the lambda-architecture
    split used by stream_dedup_exact, same rationale).

    State: with an event-time column, `dropDuplicatesWithinWatermark` on
    the signature keeps watermark-deep state only (bounded, runs
    forever); without one it is a global signature set (bounded streams
    only).
    """
    from pyspark.sql import functions as F

    from .operators.textops import minhash_signature_col

    schema = spark.read.parquet(input_dir).schema
    docs = spark.readStream.schema(schema).parquet(input_dir)
    sig = docs.withColumn("__sig", minhash_signature_col(F.col(text_col), bands))
    if event_time_col is not None:
        return (
            sig.withWatermark(event_time_col, watermark)
            .dropDuplicatesWithinWatermark(["__sig"])
            .drop("__sig")
        )
    return sig.dropDuplicates(["__sig"]).drop("__sig")


def stream_url_dedup(
    spark: SparkSession,
    input_dir: str,
    url_col: str = "url",
    event_time_col: Optional[str] = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming crawl dedup by CANONICAL url — the in-stream half of
    `operators/urls.url_dedup` (which owns the batch/global form): a
    re-fetch of the same page under a different spelling (tracking
    params, fragment, case, default port) is suppressed as it arrives.

    canonical_url is pure scan-local Column algebra, so it is legal in a
    streaming stage; the state discipline is stream_dedup_exact's —
    `dropDuplicatesWithinWatermark` keeps watermark-deep state when an
    event-time column exists, else an exact global set for bounded
    streams (the periodic batch url_dedup compaction owns the global
    guarantee, lambda-style)."""
    from pyspark.sql import functions as F

    from .operators.urls import canonical_url

    schema = spark.read.parquet(input_dir).schema
    docs = spark.readStream.schema(schema).parquet(input_dir)
    keyed = docs.withColumn("canon_url", canonical_url(F.col(url_col)))
    if event_time_col is not None:
        return (
            keyed.withWatermark(event_time_col, watermark)
            .dropDuplicatesWithinWatermark(["canon_url"])
        )
    return keyed.dropDuplicates(["canon_url"])


def stream_hll_estimate(
    spark: SparkSession,
    input_dir: str,
    col: str,
    group_cols: Sequence[str] = (),
    max_files_per_batch: Optional[int] = None,
) -> "StreamingHllHandle":
    """Streaming distinct-count estimation per key: maintain the
    per-group HyperLogLog registers (operators/sketches.hll_sketch)
    across micro-batches and read estimates after each batch.

    This is WHY the sketch merges by cell-wise MAX: each micro-batch
    contributes a partial sketch, and `foreachBatch` folds it into the
    running register table with one groupBy(…, r_bucket).max — state is
    ≤ 64 rows per group FOREVER, regardless of stream length (compare
    dropDuplicates-based distinct counting, whose state grows with the
    key universe). The post-merge estimate is read with the same
    integer-exact read path as the batch operator, so `estimates()`
    after an availableNow drain equals the batch `hll_estimate` over
    the same files bit-for-bit (pytest-pinned parity).

    Production shape: the register table lives in the warehouse
    (Iceberg MERGE on (group, r_bucket) with GREATEST(reg)); here it
    folds in memory per the sandbox's TableIO seam."""
    from pyspark.sql import functions as F

    from .operators.sketches import hll_estimate_from_sketch, hll_sketch

    schema = spark.read.parquet(input_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_batch is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_batch)
    src = reader.parquet(input_dir)
    gl = list(group_cols)
    state: dict = {"regs": None}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        part = hll_sketch(batch_df, col, gl)
        cur = state["regs"]
        merged = part if cur is None else (
            cur.unionByName(part)
            .groupBy(*gl, "r_bucket")
            .agg(F.max("reg").alias("reg"))
        )
        # materialize: the fold must not re-read past micro-batch inputs
        state["regs"] = spark.createDataFrame(merged.collect(), merged.schema)

    q = src.writeStream.foreachBatch(fold).trigger(availableNow=True).start()

    class StreamingHllHandle:
        def __init__(self, query):
            self.query = query

        def registers(self) -> DataFrame:
            return state["regs"]

        def estimates(self) -> DataFrame:
            return hll_estimate_from_sketch(state["regs"], gl)

    return StreamingHllHandle(q)


def stream_cms_sketch(
    spark: SparkSession,
    input_dir: str,
    text_col: str = "text",
    depth: int = 4,
    width: int = 64,
    max_files_per_batch: Optional[int] = None,
) -> "StreamingCmsHandle":
    """Streaming token-frequency sketching: fold each micro-batch's
    count-min cells into a running grid by CELL-WISE ADDITION — the
    sum-merge counterpart of stream_hll_estimate's max-merge, together
    covering both mergeable-summary algebras. State is ≤ depth·width
    counters forever; after an availableNow drain the folded grid is
    bit-identical to the batch cms_sketch over the same files
    (integer sums are associative, so batch/stream/shard orderings all
    agree — pytest-pinned).

    `estimate(tokens)` is the driver-side point-read: min over rows of
    the token's cells, computed with the same md5 derivation the JVM
    side uses (hashlib reproduces it bit-for-bit)."""
    from pyspark.sql import functions as F

    from .operators.textops import cms_sketch

    schema = spark.read.parquet(input_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_batch is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_batch)
    src = reader.parquet(input_dir)
    state: dict = {"cells": None}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        part = cms_sketch(batch_df, depth=depth, width=width, text_col=text_col)
        cur = state["cells"]
        merged = part if cur is None else (
            cur.unionByName(part).groupBy("r", "c").agg(F.sum("cnt").alias("cnt"))
        )
        state["cells"] = spark.createDataFrame(merged.collect(), merged.schema)

    q = src.writeStream.foreachBatch(fold).trigger(availableNow=True).start()

    class StreamingCmsHandle:
        def __init__(self, query):
            self.query = query

        def cells(self) -> DataFrame:
            return state["cells"]

        def estimate(self, tokens) -> dict:
            import hashlib

            grid = {(r["r"], r["c"]): r["cnt"] for r in state["cells"].collect()}
            out = {}
            for tok in tokens:
                vals = []
                for r in range(depth):
                    h = hashlib.md5(f"{r}\x1f{tok}".encode("utf-8")).hexdigest()
                    c = int(h[:15], 16) % width
                    vals.append(grid.get((r, c), 0))
                out[tok] = min(vals)
            return out

    return StreamingCmsHandle(q)


#: sameAs / equivalence edge batch schema (node keys as strings)
EDGES_SCHEMA = "src string, dst string"


def stream_canonicalize(
    spark: SparkSession,
    edges_dir: str,
    state_root: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_batch: int = 16,
    driver_threshold: int = 2_000_000,
):
    """Streaming incremental canonicalization: micro-batches of sameAs /
    bnode-equivalence edges fold into a persistent (node, component)
    mapping with `incremental_components` (operators/cc.py) — the
    north-rule canonicalization stage as a continuously-maintained
    table instead of a nightly rebuild.

    Per micro-batch: read the latest committed mapping version, quotient
    the batch through it (CC runs on the BATCH-sized quotient graph, the
    historical edge set never re-enters), and write the new mapping to
    `state_root/v{batch_id}` — versioned like pipeline.py stages, so any
    earlier component table stays time-travelable. Exactly-once without
    a transactional sink: the fold is IDEMPOTENT (re-merging an already
    applied edge batch is a union-find no-op) and the version write is
    mode=overwrite, so a batch replayed after a crash between state
    write and checkpoint commit converges to the same state. Returns
    the started query; read the result with `latest_mapping`."""
    from .operators.cc import connected_components, incremental_components

    edges = (
        spark.readStream.schema(EDGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_batch)
        .parquet(edges_dir)
    )

    def run(batch_df: DataFrame, batch_id: int) -> None:
        prev = latest_mapping(spark, state_root)
        if prev is None:
            new = connected_components(batch_df, driver_threshold=driver_threshold)
        else:
            new = incremental_components(
                prev, batch_df, driver_threshold=driver_threshold
            )
        new.write.mode("overwrite").parquet(f"{state_root}/v{batch_id}")

    writer = edges.writeStream.foreachBatch(run).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def latest_mapping(spark: SparkSession, state_root: str) -> Optional[DataFrame]:
    """Highest committed `v{n}` mapping under `state_root`, or None."""
    import os
    import re

    if not os.path.isdir(state_root):
        return None
    vs = sorted(
        int(m.group(1))
        for d in os.listdir(state_root)
        if (m := re.fullmatch(r"v(\d+)", d))
    )
    return spark.read.parquet(f"{state_root}/v{vs[-1]}") if vs else None


def stream_link_entities(
    spark: SparkSession,
    input_dir: str,
    aliases: DataFrame,
    checkpoint_dir: str,
    batch_fn,
    available_now: bool = True,
    max_files_per_batch: int = 16,
):
    """Streaming entity linking: pages stream → per-batch mention
    detection + broadcast alias join + top-1 (operators/linking.py),
    `batch_fn(links_df, batch_id)` receives each micro-batch's links.

    The top-1 window is legal here because it partitions by mention id
    — a mention lives entirely inside the page row that produced it, so
    micro-batch-local ranking equals global ranking (no cross-batch
    state, unlike dedup). The alias dictionary is the stream-static
    broadcast side, same argument as linking.link_exact."""
    from .operators.linking import detect_mentions, link_exact

    pages = read_pages_stream(spark, input_dir, max_files_per_batch)

    def run(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from .extract import extract_text_df

        docs = extract_text_df(batch_df).select(
            F.xxhash64("url").alias("doc_id"), F.col("text")
        )
        batch_fn(link_exact(detect_mentions(docs), aliases), batch_id)

    writer = pages.writeStream.foreachBatch(run).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_attribute_clicks(
    spark: SparkSession,
    input_dir: str,
    horizon_minutes: int = 30,
    watermark: str = "2 hours",
    max_files_per_batch: Optional[int] = None,
) -> DataFrame:
    """Watermarked STREAM-STREAM self-join — the attribution shape: every
    (view impression, click) pair for the same user with the click inside
    [view_ts, view_ts + horizon) → (user_id, imp_id, click_id, gap_us).
    The batch twin is the `asof_attribution`/`range_prior_activity`
    family; this is the online form Structured Streaming runs with both
    sides unbounded.

    State-boundedness is the whole design: the equality key (user_id)
    routes both sides to the same state-store partition, the range
    condition plus BOTH watermarks lets Spark evict impression state once
    event-time passes imp_ts + horizon + watermark and click state at the
    watermark — without the time bound the join state grows forever and a
    100 TB/day stream OOMs its state store. Inner-join matches emit as
    they arrive (no end-of-window withholding), so an availableNow drain
    equals the batch join exactly — the parity test's contract.

    gap_us is an exact integer (unix_micros difference), the engine-
    portable exactness rule."""
    from pyspark.sql import functions as F

    reader = spark.readStream.schema(_EVENTS_SCHEMA())
    if max_files_per_batch is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_batch)
    ev = reader.parquet(input_dir)
    imp = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("event_id").alias("imp_id"),
            F.col("ts").alias("imp_ts"),
        )
        .withWatermark("imp_ts", watermark)
    )
    clk = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    joined = imp.join(
        clk,
        F.expr(
            f"""
            user_id = c_user_id AND
            click_ts >= imp_ts AND
            click_ts < imp_ts + interval {int(horizon_minutes)} minutes
            """
        ),
        "inner",
    )
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp_ltz"))  # noqa: E731
    return joined.select(
        "user_id",
        "imp_id",
        "click_id",
        (us("click_ts") - us("imp_ts")).alias("gap_us"),
    )


def stream_hopping_counts(
    spark: SparkSession,
    input_dir: str,
    window_minutes: int = 60,
    hop_minutes: int = 15,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming hopping-window aggregation — `stream_windowed_counts`
    with a slide: F.window(ts, W, H) expands each event to its W/H
    containing windows map-side, the watermark finalizes and EVICTS a
    window's state once event time passes its end (W/H live windows per
    type at any moment, the bounded-state contract). Batch twin:
    operators/events.hopping_counts — the parity test's oracle."""
    from pyspark.sql import functions as F

    if window_minutes % hop_minutes != 0:
        raise ValueError("window_minutes must be a multiple of hop_minutes")
    ev = spark.readStream.schema(_EVENTS_SCHEMA()).parquet(input_dir)
    w = F.window(F.col("ts"), f"{window_minutes} minutes", f"{hop_minutes} minutes")
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_x100"),
        )
        .select(
            F.floor(
                F.col("w.start").cast("timestamp_ltz").cast("long") / (hop_minutes * 60)
            )
            .cast("long")
            .alias("bucket"),
            "event_type",
            "n_events",
            "sum_value_x100",
        )
    )
