"""Unit tests for the per-host corpus profiling operator (operators/urls.py).
Bulk parity is the `host_profile` suite oracle; these pin determinism and
the dominant-language tie-break."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocaml_rdf_spark.operators.urls import host_profile, url_host


def test_url_host_extraction(spark):
    df = spark.createDataFrame(
        [("https://a.example/x/y",), ("http://b.example",), ("not a url",)], "url string"
    )
    got = [r[0] for r in df.select(url_host(F.col("url"))).collect()]
    assert got == ["a.example", "b.example", ""]


def test_host_profile_stats_and_tiebreak(spark):
    rows = [
        ("https://h1.example/1", "en", 10),
        ("https://h1.example/2", "en", 20),
        ("https://h1.example/3", "de", 5),
        # h2: en and de tie at 1 doc each → lang asc picks "de"
        ("https://h2.example/1", "en", 7),
        ("https://h2.example/2", "de", 7),
    ]
    docs = spark.createDataFrame(rows, "url string, lang string, n_chars long")
    out = {r["host"]: r for r in host_profile(docs).collect()}
    h1, h2 = out["h1.example"], out["h2.example"]
    assert (h1["n_docs"], h1["total_chars"], h1["n_langs"], h1["top_lang"]) == (3, 35, 2, "en")
    assert (h2["n_docs"], h2["total_chars"], h2["n_langs"], h2["top_lang"]) == (2, 14, 2, "de")
