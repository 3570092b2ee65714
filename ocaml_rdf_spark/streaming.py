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
