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
