"""WARC 1.0 container (sources/warc.py): record format round-trips,
gzip-member segment layout, tolerant parse, and the Spark plumbing
(pages ↔ segments, composition with the extraction stage)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocaml_rdf_spark.sources.warc import (
    format_warc_record,
    gzip_member,
    pages_to_warc,
    parse_warc,
    warc_to_pages,
)

REC = dict(
    url="https://a.example/x?q=1",
    date="2026-05-11T12:34:55Z",
    payload="<html><p>café</p></html>".encode(),
)


def test_roundtrip_plain():
    raw = format_warc_record(REC["url"], REC["date"], REC["payload"], status=404)
    (r,) = parse_warc(raw)
    assert r["url"] == REC["url"]
    assert r["warc_date"] == REC["date"]
    assert r["http_status"] == 404
    assert r["payload"] == REC["payload"]
    assert r["content_type"] == "text/html; charset=utf-8"
    assert r["warc_type"] == "response"


def test_gzip_members_concatenate_and_are_deterministic():
    a = format_warc_record("https://a.example/1", REC["date"], b"one")
    b = format_warc_record("https://a.example/2", REC["date"], b"two", status=301)
    seg = gzip_member(a) + gzip_member(b)
    assert gzip_member(a) == gzip_member(a)  # mtime=0 → byte-stable
    recs = parse_warc(seg)
    assert [r["payload"] for r in recs] == [b"one", b"two"]
    assert [r["http_status"] for r in recs] == [200, 301]
    # plain concatenation parses identically
    assert [r["payload"] for r in parse_warc(a + b)] == [b"one", b"two"]


def test_record_id_is_stable_uuid5_shape():
    a = format_warc_record(REC["url"], REC["date"], b"x")
    b = format_warc_record(REC["url"], REC["date"], b"y")
    ida = parse_warc(a)[0]["record_id"]
    idb = parse_warc(b)[0]["record_id"]
    assert ida == idb  # id = f(url, date), not payload
    assert ida.startswith("urn:uuid:")
    uid = ida.removeprefix("urn:uuid:")
    assert [len(p) for p in uid.split("-")] == [8, 4, 4, 4, 12]
    assert uid.split("-")[2][0] == "5"  # name-based version nibble


def test_truncated_tail_drops_not_raises():
    a = format_warc_record("https://a.example/1", REC["date"], b"one")
    b = format_warc_record("https://a.example/2", REC["date"], b"twotwotwo")
    assert [r["payload"] for r in parse_warc(a + b[: len(b) - 6])] == [b"one"]
    assert parse_warc(b"garbage not a warc") == []


def test_spark_roundtrip_and_non_response_skipped(spark):
    pages = spark.createDataFrame(
        [
            ("https://h1.example/a", "2026-05-11T00:00:01Z", b"<html>A</html>", 200, "text/html"),
            ("https://h2.example/b", "2026-05-12T00:00:02Z", b"<html>B</html>", 404, "text/html"),
        ],
        "url string, warc_date string, html binary, http_status int, content_type string",
    )
    back = warc_to_pages(pages_to_warc(pages)).orderBy("url").collect()
    assert [r["url"] for r in back] == ["https://h1.example/a", "https://h2.example/b"]
    assert [bytes(r["html"]) for r in back] == [b"<html>A</html>", b"<html>B</html>"]
    assert [r["http_status"] for r in back] == [200, 404]

    # a metadata record in the same segment is archive plumbing, not a page
    meta = format_warc_record(
        "https://h3.example/c", "2026-05-13T00:00:03Z", b"ignored", warc_type="metadata"
    )
    seg = spark.createDataFrame([(gzip_member(meta),)], "warc binary")
    assert warc_to_pages(seg).count() == 0


def test_warc_feeds_extraction_stage(spark):
    from ocaml_rdf_spark.extract import extract_triples, split_errors

    html = (
        b'<html><script type="application/ld+json">'
        b'{"@id": "https://e.example/ent", "http://schema.org/name": "Ada"}'
        b"</script></html>"
    )
    pages = spark.createDataFrame(
        [("https://h1.example/a", "2026-05-11T00:00:01Z", html)],
        "url string, warc_date string, html binary",
    )
    decoded = warc_to_pages(pages_to_warc(pages))
    triples, errs = split_errors(extract_triples(decoded))
    rows = triples.collect()
    assert errs.count() == 0
    assert any(
        r["s_lex"] == "https://e.example/ent"
        and r["pred"] == "http://schema.org/name"
        and r["o_lex"] == "Ada"
        for r in rows
    )
    assert all(r["src_url"] == "https://h1.example/a" for r in rows)
