"""Unit tests for the round-3 batch-3 pipeline operators: PII scrubbing,
corpus-level line dedup (textops), integer-exact Lloyd k-means, and
SemDeDup keep/drop (ann). The suite oracles cover the cross-engine value
contract; these tests pin the SEMANTICS on hand-built inputs."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------------------
# pii_scrub
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_pii_scrub_counts_and_redaction(spark):
    from ocaml_rdf_spark.operators.textops import pii_scrub

    d = _docs(
        spark,
        [
            (0, "mail a.b+c@x-mail.org and d@e.io today"),
            (1, "hosts 10.0.0.1 and 192.168.255.3"),
            (2, "call +1-555-0100 or +49-301-2345"),
            (3, "nothing sensitive here"),
            (4, "mixed a@b.co at 8.8.8.8 dial +4-123-4567"),
        ],
    )
    out = {r["doc_id"]: r for r in pii_scrub(d).collect()}
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (2, 0, 0)
    assert out[0]["clean_md5"] == _md5("mail <EMAIL> and <EMAIL> today")
    assert (out[1]["n_email"], out[1]["n_ipv4"]) == (0, 2)
    assert out[1]["clean_md5"] == _md5("hosts <IP> and <IP>")
    assert out[2]["n_phone"] == 2
    assert out[2]["clean_md5"] == _md5("call <PHONE> or <PHONE>")
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (0, 0, 0)
    assert out[3]["chars_removed"] == 0
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (1, 1, 1)
    assert out[4]["clean_md5"] == _md5("mixed <EMAIL> at <IP> dial <PHONE>")


def test_pii_scrub_order_email_before_ip(spark):
    """The email pattern consumes dotted hosts BEFORE the IP pass, so an
    address at a numeric-looking domain is one <EMAIL>, not email+IP."""
    from ocaml_rdf_spark.operators.textops import pii_scrub

    d = _docs(spark, [(0, "x u@mail.example.com y")])
    r = pii_scrub(d).collect()[0]
    assert (r["n_email"], r["n_ipv4"]) == (1, 0)
    assert r["clean_md5"] == _md5("x <EMAIL> y")


# ---------------------------------------------------------------------------
# line_dedup_corpus
# ---------------------------------------------------------------------------


def test_line_dedup_drops_boilerplate(spark):
    from ocaml_rdf_spark.operators.textops import line_dedup_corpus

    boiler = "all rights reserved"
    rows = [(i, f"unique body {i}\n{boiler}") for i in range(5)]
    rows.append((5, boiler))  # doc that is ONLY boilerplate
    out = {
        r["doc_id"]: r
        for r in line_dedup_corpus(_docs(spark, rows), min_docs=5).collect()
    }
    for i in range(5):
        assert (out[i]["n_lines_in"], out[i]["n_lines_kept"]) == (2, 1)
        assert out[i]["kept_md5"] == _md5(f"unique body {i}")
    # fully-boilerplate doc survives as a row with md5('')
    assert (out[5]["n_lines_in"], out[5]["n_lines_kept"]) == (1, 0)
    assert out[5]["kept_md5"] == _md5("")


def test_line_dedup_threshold_counts_distinct_docs(spark):
    """A line repeated many times WITHIN one doc doesn't count toward the
    cross-doc threshold (countDistinct doc_id)."""
    from ocaml_rdf_spark.operators.textops import line_dedup_corpus

    spam = "repeat me"
    d = _docs(spark, [(0, "\n".join([spam] * 10)), (1, f"other\n{spam}")])
    out = {r["doc_id"]: r for r in line_dedup_corpus(d, min_docs=3).collect()}
    assert out[0]["n_lines_kept"] == 10  # only 2 distinct docs carry it
    assert out[1]["n_lines_kept"] == 2


def test_line_dedup_preserves_order(spark):
    from ocaml_rdf_spark.operators.textops import line_dedup_corpus

    d = _docs(spark, [(0, "z line\na line\nm line")])
    r = line_dedup_corpus(d, min_docs=2).collect()[0]
    assert r["kept_md5"] == _md5("z line\na line\nm line")  # original, not sorted


# ---------------------------------------------------------------------------
# kmeans_int / semdedup_keep
# ---------------------------------------------------------------------------


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        schema="vec_id long, embedding array<float>",
    )


def test_kmeans_recovers_separated_clusters(spark):
    from ocaml_rdf_spark.operators.ann import kmeans_int

    # two tight blobs on opposite corners; seeds 0 and 1 land one per blob
    blob_a = [(0, [1.0, 1.0, 0.9, 1.1]), (2, [1.1, 0.9, 1.0, 1.0]), (4, [0.9, 1.0, 1.1, 0.9])]
    blob_b = [(1, [-1.0, -1.0, -0.9, -1.1]), (3, [-1.1, -0.9, -1.0, -1.0]), (5, [-0.9, -1.0, -1.1, -0.9])]
    out = {r["vec_id"]: r["cluster"] for r in kmeans_int(_vecs(spark, blob_a + blob_b), k=2, iters=2).collect()}
    assert out[0] == out[2] == out[4]
    assert out[1] == out[3] == out[5]
    assert out[0] != out[1]


def test_kmeans_deterministic_across_partitioning(spark):
    """Integer arithmetic ⇒ the assignment is identical however the input
    is partitioned (the reason this isn't avg-of-double Lloyd)."""
    from ocaml_rdf_spark.operators.ann import kmeans_int

    rows = [(i, [((i * 37 + j * 11) % 19) / 7.0 - 1.2 for j in range(8)]) for i in range(40)]
    base = _vecs(spark, rows)
    r1 = sorted((r["vec_id"], r["cluster"]) for r in kmeans_int(base, k=4, iters=2).collect())
    r8 = sorted(
        (r["vec_id"], r["cluster"])
        for r in kmeans_int(base.repartition(8), k=4, iters=2).collect()
    )
    assert r1 == r8


def test_semdedup_keeps_min_id_of_duplicate_group(spark):
    from ocaml_rdf_spark.operators.ann import semdedup_keep

    dup = [1.0, 0.5, -0.25, 0.8]
    rows = [(0, dup), (1, [-1.0, 0.9, 0.3, -0.7]), (2, [x * 2 for x in dup]), (3, dup)]
    out = {r["vec_id"]: r["keep"] for r in semdedup_keep(_vecs(spark, rows), k=2, iters=1, threshold_x1e4=9999).collect()}
    # 0, 2, 3 are colinear (cosine 1.0) and cluster with seed 0: min id 0
    # kept, rest dropped; 1 seeds its own cluster, no high-sim mate.
    assert out[0] == 1 and out[1] == 1
    assert out[2] == 0 and out[3] == 0


def test_semdedup_respects_cluster_boundary(spark):
    """Pairs are only compared within a k-means cluster — two identical
    vectors seeded into different clusters both survive (the recall/cost
    trade the SemDeDup paper makes explicit)."""
    from ocaml_rdf_spark.operators.ann import semdedup_keep

    # seeds 0 and 1 are opposite corners; 2 == seed 0's vector, 3 == seed 1's
    rows = [
        (0, [1.0, 1.0, 1.0, 1.0]),
        (1, [-1.0, -1.0, -1.0, -1.0]),
        (2, [1.0, 1.0, 1.0, 1.0]),
        (3, [-1.0, -1.0, -1.0, -1.0]),
    ]
    out = {r["vec_id"]: (r["cluster"], r["keep"]) for r in semdedup_keep(_vecs(spark, rows), k=2, iters=1, threshold_x1e4=9999).collect()}
    assert out[2] == (out[0][0], 0)  # same cluster as 0 -> dropped
    assert out[3] == (out[1][0], 0)
    assert out[0][1] == 1 and out[1][1] == 1


# ---------------------------------------------------------------------------
# domain_filter
# ---------------------------------------------------------------------------


def _urls(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, url string")


def _bl(spark, domains):
    return spark.createDataFrame([(d,) for d in domains], schema="domain string")


def test_domain_filter_parent_domain_blocks_subdomain(spark):
    from ocaml_rdf_spark.operators.urls import domain_filter

    d = _urls(
        spark,
        [
            (0, "https://ads.tracker.bad.com/x"),
            (1, "https://bad.com/y"),
            (2, "https://notbad.com/z"),       # suffix of the NAME, not a parent domain
            (3, "HTTP://GOOD.ORG:80/a"),       # case + port normalization
        ],
    )
    out = {r["doc_id"]: (r["keep"], r["blocked_by"]) for r in domain_filter(d, _bl(spark, ["bad.com"])).collect()}
    assert out[0] == (0, "bad.com")
    assert out[1] == (0, "bad.com")
    assert out[2] == (1, "")  # label-boundary match, not substring
    assert out[3] == (1, "")


def test_domain_filter_most_specific_entry_wins(spark):
    from ocaml_rdf_spark.operators.urls import domain_filter

    d = _urls(spark, [(0, "https://a.sub.ex.com/")])
    r = domain_filter(d, _bl(spark, ["ex.com", "sub.ex.com"])).collect()[0]
    assert (r["keep"], r["blocked_by"]) == (0, "sub.ex.com")


def test_domain_filter_non_http_kept_with_empty_host(spark):
    from ocaml_rdf_spark.operators.urls import domain_filter

    d = _urls(spark, [(0, "ftp://bad.com/z"), (1, "mailto:x@bad.com")])
    out = {r["doc_id"]: (r["keep"], r["host"]) for r in domain_filter(d, _bl(spark, ["bad.com"])).collect()}
    assert out[0] == (1, "")  # only web URLs are in scope for host filtering
    assert out[1] == (1, "")


def test_void_stats_small(spark):
    from ocaml_rdf_spark.operators.stats import void_stats

    quads = spark.createDataFrame(
        [
            ("urn:a", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", 0, "urn:c:T", None, "g"),
            ("urn:b", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", 0, "urn:c:T", None, "g"),
            ("urn:a", "http://ex.org/v#name", 2, "x", "http://www.w3.org/2001/XMLSchema#string", "g"),
            # same lexical as an IRI object: must count as a SECOND distinct object
            ("urn:b", "http://ex.org/v#name", 0, "x", None, "g"),
        ],
        "s_lex string, pred string, o_kind int, o_lex string, o_dtype string, graph string",
    )
    rows = {(r["part"], r["key"]): r for r in void_stats(quads).collect()}
    d = rows[("dataset", "")]
    assert d["triples"] == 4 and d["distinct_s"] == 2 and d["distinct_o"] == 3
    p = rows[("property", "http://ex.org/v#name")]
    assert p["triples"] == 2 and p["distinct_s"] == 2 and p["distinct_o"] == 2
    c = rows[("class", "urn:c:T")]
    assert c["triples"] == 2 and c["distinct_s"] == 2
    v = rows[("vocabulary", "http://ex.org/v#")]
    assert v["triples"] == 2 and v["distinct_s"] == 1


def test_incremental_dedup_rules(spark):
    from ocaml_rdf_spark.operators.textops import incremental_dedup

    idx = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "totally different words here now")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),   # dup of indexed 1
            (11, "unique fresh content nothing like"),  # clean
            (12, "unique fresh content nothing like"),  # batch dup of 11
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in incremental_dedup(idx, new, band_min=4).collect()}
    assert out[10]["keep"] == 0 and out[10]["reason"] == "index" and out[10]["dup_of"] == "1"
    assert out[11]["keep"] == 1 and out[11]["reason"] == ""
    assert out[12]["keep"] == 0 and out[12]["reason"] == "batch" and out[12]["dup_of"] == "11"


def test_incremental_dedup_index_never_reported(spark):
    from ocaml_rdf_spark.operators.textops import incremental_dedup

    # index-side near-dups of EACH OTHER produce no rows: only new docs report
    idx = spark.createDataFrame(
        [(1, "same text twice over here"), (2, "same text twice over here")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame([(10, "brand new material")], "doc_id long, text string")
    rows = incremental_dedup(idx, new).collect()
    assert [r["doc_id"] for r in rows] == [10] and rows[0]["keep"] == 1


def test_freq_spectrum_good_turing(spark):
    from ocaml_rdf_spark.operators.textops import freq_spectrum

    docs = spark.createDataFrame(
        # a a a b b c d e -> r=1: 3 types (c,d,e); r=2: 1 (b); r=3: 1 (a)
        [(1, "a a a b b c"), (2, "d e")],
        "doc_id long, text string",
    )
    rows = {r["r"]: r for r in freq_spectrum(docs).collect()}
    assert rows[1]["n_r"] == 3 and rows[1]["gt_num"] == 2 * 1   # (1+1)*n_2
    assert rows[2]["n_r"] == 1 and rows[2]["gt_num"] == 3 * 1   # (2+1)*n_3
    assert rows[3]["n_r"] == 1 and rows[3]["gt_num"] == 0       # no n_4


def test_encoding_quality_counts(spark):
    from ocaml_rdf_spark.operators.textops import encoding_quality

    docs = spark.createDataFrame(
        [
            (1, "clean ascii text"),
            (2, "lost � here"),
            (3, "ctrl\x01\x9f"),
            (4, "cafÃ© again"),  # 'café' double-encoded
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in encoding_quality(docs).collect()}
    assert out[1]["penalty"] == 0
    assert out[2]["n_repl"] == 1 and out[2]["penalty"] == 1_000_000 * 5 // 11
    assert out[3]["n_ctrl"] == 2 and out[3]["n_repl"] == 0
    assert out[4]["n_double"] == 1
    assert out[5]["n_chars"] == 0 and out[5]["penalty"] == 0


def test_encoding_quality_tabs_newlines_are_clean(spark):
    from ocaml_rdf_spark.operators.textops import encoding_quality

    docs = spark.createDataFrame(
        [(1, "line one\nline two\ttabbed\r\n")], "doc_id long, text string"
    )
    r = encoding_quality(docs).collect()[0]
    assert r["n_ctrl"] == 0 and r["penalty"] == 0


def test_merge_into_upsert(spark):
    from ocaml_rdf_spark.operators.delta import merge_into

    target = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    src = spark.createDataFrame([(2, "B"), (4, "D")], "k long, v string")
    out = {r["k"]: r["v"] for r in merge_into(target, src, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_merge_into_delete(spark):
    from ocaml_rdf_spark.operators.delta import merge_into

    target = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    src = spark.createDataFrame([(2, "x")], "k long, v string")
    out = merge_into(target, src, ["k"], when_matched="delete").collect()
    assert [(r["k"], r["v"]) for r in out] == [(1, "a")]


def test_merge_into_rejects_duplicate_source_keys(spark):
    from ocaml_rdf_spark.operators.delta import merge_into

    target = spark.createDataFrame([(1, "a")], "k long, v string")
    src = spark.createDataFrame([(1, "x"), (1, "y")], "k long, v string")
    import pytest as _pytest

    with _pytest.raises(Exception, match="not unique"):
        merge_into(target, src, ["k"]).collect()


def test_kn_counts_francisco(spark):
    from ocaml_rdf_spark.operators.textops import kn_counts

    # 'francisco' appears 3x but ONLY after 'san'; 'day' appears 2x after
    # 2 distinct contexts -> KN's continuation count ranks day > francisco
    docs = spark.createDataFrame(
        [
            (1, "san francisco san francisco san francisco"),
            (2, "good day nice day"),
        ],
        "doc_id long, text string",
    )
    out = {r["w"]: r for r in kn_counts(docs).collect()}
    assert out["francisco"]["c_w"] == 3 and out["francisco"]["n1plus_left"] == 1
    assert out["day"]["c_w"] == 2 and out["day"]["n1plus_left"] == 2
    # 'san' continues into {francisco, san}? no: pairs are (san,francisco)x3,
    # (francisco,san)x2 -> right(san)=1, left(san)=1
    assert out["san"]["n1plus_right"] == 1 and out["san"]["n1plus_left"] == 1


def test_mixture_plan_rates_and_starvation(spark):
    from ocaml_rdf_spark.operators.textops import mixture_plan

    groups = spark.createDataFrame(
        [("en", 1_000_000), ("de", 50_000), ("code", 500_000)], "grp string, n_tokens long"
    )
    targets = spark.createDataFrame(
        [("en", 500_000), ("de", 300_000), ("fr", 200_000)], "grp string, share_ppm long"
    )
    out = {r["grp"]: r for r in mixture_plan(groups, targets, budget_tokens=200_000).collect()}
    # en: want 100k of 1M avail -> rate 10%, planned 100k, not starved
    assert out["en"]["want_tokens"] == 100_000 and out["en"]["rate_ppm"] == 100_000
    assert out["en"]["planned_tokens"] == 100_000 and out["en"]["starved"] == 0
    # de: want 60k of 50k avail -> rate capped at 100%, starved
    assert out["de"]["rate_ppm"] == 1_000_000 and out["de"]["planned_tokens"] == 50_000
    assert out["de"]["starved"] == 1
    # fr has a target but no tokens; code has tokens but no target: both absent
    assert "fr" not in out and "code" not in out
