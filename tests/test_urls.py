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


def _canon(spark, urls):
    from ocaml_rdf_spark.operators.urls import canonical_url

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(canonical_url(F.col("url"))).collect()]


def test_canonical_url_rules(spark):
    got = _canon(
        spark,
        [
            "HTTP://WWW.Example.COM:80/Path?b=2&a=1#frag",  # case+port+sort+frag
            "https://ex.com:443",                 # default port + empty path
            "https://ex.com:8443/x",              # non-default port kept
            "http://ex.com:443/x",                # 443 is NOT http's default
            "https://ex.com/x?utm_source=a&UTM_Medium=b&fbclid=1",  # all tracking
            "https://ex.com/x?flag&b=2",          # valueless param kept, sorted
            "ftp://Mixed.Case/Z",                 # non-http passthrough
            "  https://ex.com/x  ",               # trimmed
        ],
    )
    assert got == [
        "http://www.example.com/Path?a=1&b=2",
        "https://ex.com/",
        "https://ex.com:8443/x",
        "http://ex.com:443/x",
        "https://ex.com/x",
        "https://ex.com/x?b=2&flag",
        "ftp://Mixed.Case/Z",
        "https://ex.com/x",
    ]


def test_url_dedup_keeps_first(spark):
    from ocaml_rdf_spark.operators.urls import url_dedup

    rows = [
        (3, "https://ex.com/p?utm_source=x"),
        (1, "HTTPS://EX.COM/p#top"),       # same canonical, smaller id wins
        (2, "https://ex.com/q"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    kept = {r["doc_id"]: r["canon_url"] for r in url_dedup(docs).collect()}
    assert kept == {1: "https://ex.com/p", 2: "https://ex.com/q"}


def test_ip_host_filter_classes(spark):
    from ocaml_rdf_spark.operators.urls import ip_host_filter

    rows = [
        (1, "10.0.0.1"),        # private
        (2, "172.20.1.1"),      # private (172.16/12)
        (3, "172.32.1.1"),      # PUBLIC (past the /12)
        (4, "192.168.5.5"),     # private
        (5, "169.254.0.9"),     # link-local
        (6, "127.0.0.1"),       # loopback
        (7, "93.184.216.34"),   # public
        (8, "256.1.2.3"),       # invalid octet -> hostname
        (9, "1.2.3.4.5"),       # five labels -> hostname
        (10, "example.com"),    # hostname
        (11, ""),               # empty
    ]
    docs = spark.createDataFrame(rows, "doc_id long, host string")
    out = {r["doc_id"]: r for r in ip_host_filter(docs).collect()}
    assert [out[i]["is_ip"] for i in range(1, 12)] == [1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0]
    assert [out[i]["is_private"] for i in range(1, 8)] == [1, 1, 0, 1, 1, 1, 0]
    assert [out[i]["keep"] for i in (7, 8, 10)] == [0, 1, 1]


def test_pld_rule_shapes(spark):
    from ocaml_rdf_spark.operators.urls import pld
    from pyspark.sql import functions as F

    hosts = [
        ("news.bbc.co.uk", "bbc.co.uk"),     # longest suffix wins over a hypothetical 'uk'
        ("bbc.co.uk", "bbc.co.uk"),          # already registrable
        ("deep.a.b.example", "b.example"),   # 1-level rule, deep subdomain
        ("foo.com", "foo.com"),
        ("x.y.unlisted.zz", "unlisted.zz"),  # no rule -> prevailing-* fallback (last 2)
        ("localhost", "localhost"),          # single label passes through
        ("co.uk", "co.uk"),                  # the suffix itself: no label before -> fallback
    ]
    df = spark.createDataFrame([(h,) for h, _ in hosts], "host string")
    out = dict(df.select("host", pld(F.col("host")).alias("p")).collect())
    for h, want in hosts:
        assert out[h] == want, (h, out[h], want)


def test_url_path_templates_generalization(spark):
    """Digit runs -> {n}, long hex ids -> {x}, empty path -> '/', query
    strings never enter the template."""
    from ocaml_rdf_spark.operators.urls import url_path_templates

    urls = spark.createDataFrame(
        [
            ("https://a.example/p/123",),
            ("https://a.example/p/99?q=1",),
            ("https://a.example/s/deadbeefdead",),
            ("https://a.example",),
        ],
        "url string",
    )
    out = {r["template"]: r["n_urls"] for r in url_path_templates(urls, k=10).collect()}
    assert out == {"/p/{n}": 2, "/s/{x}": 1, "/": 1}
