"""Path-profile catalog statistics (stats.path_profile) and politeness
crawl-frontier scheduling (urls.crawl_schedule)."""

from pyspark.sql import functions as F

from ocaml_rdf_spark.operators.stats import path_profile
from ocaml_rdf_spark.operators.urls import crawl_schedule


def _iri_quads(spark, rows):
    df = spark.createDataFrame(rows, "s_lex string, pred string, o_lex string")
    return df.select(
        F.lit(0).cast("tinyint").alias("s_kind"),
        "s_lex",
        "pred",
        F.lit(0).cast("tinyint").alias("o_kind"),
        "o_lex",
    )


def test_path_profile_counts_chains_through_hubs(spark):
    # a,b --p--> m ; m --q--> x,y  → 4 chains (2 in × 2 out) through 1 mid
    # plus a disjoint p→r chain ending nowhere
    q = _iri_quads(
        spark,
        [
            ("a", "urn:p:p", "m"),
            ("b", "urn:p:p", "m"),
            ("m", "urn:p:q", "x"),
            ("m", "urn:p:q", "y"),
            ("c", "urn:p:p", "r"),
            ("m", "urn:p:p", "s"),  # p can also chain after p: a→m→s, b→m→s
        ],
    )
    out = {(r["p1"], r["p2"]): r for r in path_profile(q).collect()}
    pq = out[("urn:p:p", "urn:p:q")]
    assert pq["n_chains"] == 4 and pq["n_mid"] == 1
    pp = out[("urn:p:p", "urn:p:p")]
    assert pp["n_chains"] == 2 and pp["n_mid"] == 1
    assert ("urn:p:q", "urn:p:p") not in out  # no chain in that order


def test_crawl_schedule_slots_and_stagger(spark):
    f = spark.createDataFrame(
        [
            ("https://a/1", "a", 10),
            ("https://a/2", "a", 30),
            ("https://a/3", "a", 30),  # tie with /2 → url order breaks it
            ("https://b/1", "b", 5),
        ],
        "url string, host string, prio long",
    )
    out = {r["url"]: r for r in
           crawl_schedule(f, priority_col="prio", delay_ms=1000).collect()}
    assert out["https://a/2"]["slot"] == 0  # highest prio, url tiebreak
    assert out["https://a/3"]["slot"] == 1
    assert out["https://a/1"]["slot"] == 2
    assert out["https://b/1"]["slot"] == 0
    for r in out.values():
        assert r["fetch_at_ms"] == r["slot"] * 1000 + (r["fetch_at_ms"] % 1000)
        assert 0 <= r["fetch_at_ms"] % 1000 < 1000
    # same-host rows share the stagger; fetch times never collide in-host
    a_times = sorted(r["fetch_at_ms"] for r in out.values() if r["host"] == "a")
    assert a_times[1] - a_times[0] == 1000 and a_times[2] - a_times[1] == 1000
    # deterministic across partitionings
    again = {r["url"]: r["fetch_at_ms"] for r in
             crawl_schedule(f.repartition(3), priority_col="prio").collect()}
    assert again == {u: r["fetch_at_ms"] for u, r in out.items()}
