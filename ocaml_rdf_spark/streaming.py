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

from typing import Optional

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
):
    """foreachBatch variant: `batch_fn(triples_df, batch_id)` receives each
    micro-batch's extracted triples — the hook where production code does
    Iceberg MERGE (set-semantics upsert) instead of blind append."""
    pages = read_pages_stream(spark, input_dir)

    def run(batch_df: DataFrame, batch_id: int) -> None:
        batch_fn(extract_triples(batch_df), batch_id)

    writer = (
        pages.writeStream.foreachBatch(run)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
