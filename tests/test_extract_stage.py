"""End-to-end extraction-stage tests: generator → mapInPandas → TRIPLES,
P/R vs golden (north rule ≥0.95), byte-identical text, determinism across
partitionings, skew salting."""

import pytest
from pyspark.sql import functions as F

from ocaml_rdf_spark.datagen import gen_golden_df, gen_pages_df, page_record
from ocaml_rdf_spark.extract import extract_page, extract_text_df, extract_triples, salted_repartition, split_errors
from ocaml_rdf_spark.types import TRIPLE_KEY, triple_row

N = 300


def test_driver_side_pr_100_pages():
    tp = fp = fn = 0
    for i in range(100):
        r = page_record(i)
        rows, errors = extract_page(r["url"], r["html"])
        assert not errors
        got = {row[:8] for row in rows}
        want = {triple_row(s, p, o, graph=r["url"])[:8] for (s, p, o, _) in r["_triples"]}
        tp += len(got & want)
        fp += len(got - want)
        fn += len(want - got)
    assert tp / (tp + fp) >= 0.95, f"precision {tp/(tp+fp)}"
    assert tp / (tp + fn) >= 0.95, f"recall {tp/(tp+fn)}"


@pytest.fixture(scope="module")
def pages(spark):
    return gen_pages_df(spark, N, parts=8).cache()


def test_spark_extraction_pr(spark, pages):
    triples, errors = split_errors(extract_triples(pages))
    golden = gen_golden_df(spark, N, parts=8)
    assert errors.count() == 0
    got = triples.select(*TRIPLE_KEY)
    want = golden.select(*TRIPLE_KEY)
    n_got = got.count()
    n_want = want.count()
    n_both = got.intersect(want).count()  # both sides are sets per page
    assert n_both / n_got >= 0.95
    assert n_both / n_want >= 0.95


def test_text_byte_identity(spark, pages):
    """The per-row invariant (BASELINE.json:16): recomputed text == golden."""
    recomputed = extract_text_df(pages).withColumnRenamed("text", "text2")
    joined = pages.select("url", "text").join(recomputed, "url")
    bad = joined.filter(F.col("text") != F.col("text2")).count()
    assert bad == 0


def test_extraction_partitioning_invariance(spark):
    """Same corpus at different parallelism ⇒ identical triple set (the
    determinism property behind the two-cluster-size scaling claim)."""
    a = extract_triples(gen_pages_df(spark, 100, parts=2)).select(*TRIPLE_KEY)
    b = extract_triples(salted_repartition(gen_pages_df(spark, 100, parts=7), 16)).select(*TRIPLE_KEY)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_salted_repartition_spreads_skew(spark, pages):
    """Top (mega) host must land on >1 partition after salting."""
    df = salted_repartition(pages, 16, salt_buckets=8)
    host = F.regexp_extract("url", r"://([^/]+)/", 1)
    pid = F.spark_partition_id()
    top_host = (
        pages.groupBy(host.alias("h")).count().orderBy(F.desc("count")).first()["h"]
    )
    nparts = (
        df.withColumn("h", host)
        .withColumn("pid", pid)
        .filter(F.col("h") == top_host)
        .select("pid")
        .distinct()
        .count()
    )
    assert nparts > 1


def test_error_rows_for_bad_turtle(spark):
    import pandas as pd

    from ocaml_rdf_spark.types import PAGES_SCHEMA
    import datetime as dt

    bad_html = b'<html><body><script type="text/turtle">@prefix broken</script></body></html>'
    pdf = pd.DataFrame(
        {
            "url": ["https://bad.org/x"],
            "warc_ts": [dt.datetime(2024, 1, 1)],
            "html": [bad_html],
            "text": [""],
            "lang": ["en"],
        }
    )
    pages = spark.createDataFrame(pdf, schema=PAGES_SCHEMA)
    triples, errors = split_errors(extract_triples(pages))
    assert triples.filter(F.col("extractor") == "turtle").count() == 0
    errs = errors.collect()
    assert len(errs) == 1 and errs[0]["extractor"] == "turtle"


def test_marker_prescreen_is_conservative():
    # a page with no structured-data marker emits nothing (fast path);
    # each extractor's trigger contains a marker so nothing real is skipped
    from ocaml_rdf_spark.extract import _MARKERS, extract_page

    plain = b"<html><head><title>x</title></head><body><p>just text</p></body></html>"
    assert extract_page("http://h/p", plain) == ([], [])
    triggers = [
        '<script type="application/ld+json">{}</script>',
        '<script type="text/turtle"></script>',
        '<script type="application/trig"></script>',
        '<script type="application/rdf+xml"></script>',
        '<pre class="ntriples"></pre>',
        "<div itemscope></div>",
        '<span property="p">v</span>',
        '<div typeof="T"></div>',
        '<body vocab="http://v/"></body>',
        '<html prefix="a: http://a/"></html>',
    ]
    for t in triggers:
        assert any(m in t.lower() for m in _MARKERS), t
