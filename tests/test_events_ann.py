"""Unit tests for the event-stream operators (operators/events.py) and
the embedding near-dup tier (operators/ann.py :: near_dup_pairs*)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest


def _events(spark, rows):
    # rows: (event_id, iso_ts, user_id, event_type, value)
    data = [
        (i, dt.datetime.fromisoformat(ts), u, et, v)
        for i, ts, u, et, v in rows
    ]
    return spark.createDataFrame(
        data, schema="event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )


def test_sessionize_gap_splits(spark):
    from ocaml_rdf_spark.operators.events import session_stats, sessionize

    ev = _events(
        spark,
        [
            (0, "2024-01-01T00:00:00", 1, "click", 1.0),
            (1, "2024-01-01T00:10:00", 1, "click", 1.0),  # same session (10m gap)
            (2, "2024-01-01T01:00:00", 1, "click", 1.0),  # 50m gap -> new session
            (3, "2024-01-01T00:00:00", 2, "view", 1.0),   # other user: own session
        ],
    )
    s = {r["event_id"]: r["session_idx"] for r in sessionize(ev, gap_minutes=30).collect()}
    assert s == {0: 1, 1: 1, 2: 2, 3: 1}
    stats = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in session_stats(ev, 30).collect()}
    assert stats == {1: (2, 3), 2: (1, 1)}


def test_sessionize_boundary_is_exclusive(spark):
    """A gap of exactly `gap_minutes` does NOT start a new session (> not >=)."""
    from ocaml_rdf_spark.operators.events import sessionize

    ev = _events(
        spark,
        [
            (0, "2024-01-01T00:00:00", 1, "click", 1.0),
            (1, "2024-01-01T00:30:00", 1, "click", 1.0),
        ],
    )
    s = {r["event_id"]: r["session_idx"] for r in sessionize(ev, gap_minutes=30).collect()}
    assert s == {0: 1, 1: 1}


def test_tumbling_counts_buckets(spark):
    from ocaml_rdf_spark.operators.events import tumbling_counts

    ev = _events(
        spark,
        [
            (0, "2024-01-01T00:05:00", 1, "click", 1.50),
            (1, "2024-01-01T00:55:00", 2, "click", 2.25),
            (2, "2024-01-01T01:05:00", 1, "click", 4.00),
            (3, "2024-01-01T00:20:00", 1, "error", 1.00),
        ],
    )
    out = {(r["bucket"], r["event_type"]): (r["n_events"], r["sum_value_x100"]) for r in tumbling_counts(ev, 60).collect()}
    h0 = dt.datetime(2024, 1, 1).replace(tzinfo=dt.timezone.utc).timestamp() / 3600
    assert out == {
        (int(h0), "click"): (2, 375),
        (int(h0), "error"): (1, 100),
        (int(h0) + 1, "click"): (1, 400),
    }


def _vecs(spark, vs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vs)],
        schema="vec_id long, embedding array<float>",
    )


def test_near_dup_pairs_exact(spark):
    from ocaml_rdf_spark.operators.ann import near_dup_pairs

    vecs = _vecs(
        spark,
        [
            [1.0, 0.0, 0.0, 0.0],
            [0.999, 0.01, 0.0, 0.0],   # near-dup of 0
            [0.0, 1.0, 0.0, 0.0],      # orthogonal
            [-1.0, 0.0, 0.0, 0.0],     # opposite
        ],
    )
    pairs = {(r["id_a"], r["id_b"]) for r in near_dup_pairs(vecs, threshold_x1e4=9900).collect()}
    assert pairs == {(0, 1)}


def test_near_dup_lsh_is_subset_of_brute(spark):
    """LSH candidates must be a subset of the brute-force pairs (same
    threshold) — buckets can only lose pairs, never invent them."""
    from ocaml_rdf_spark.operators.ann import near_dup_pairs, near_dup_pairs_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(F.col("vec_id") < 80)
    brute = {(r["id_a"], r["id_b"]) for r in near_dup_pairs(emb, threshold_x1e4=2500).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in near_dup_pairs_lsh(emb, threshold_x1e4=2500, bits=2, dim=64).collect()}
    assert lsh <= brute
    assert len(brute) > 0


def test_sha_builtins(spark):
    """SHA1/384/512 (no DuckDB counterpart — unit-tested against hashlib)."""
    import hashlib

    from ocaml_rdf_spark.functions.builtins import L, SHA1, SHA384, SHA512

    df = spark.range(1)
    out = df.select(
        SHA1(L("abc"))({})["lex"].alias("s1"),
        SHA384(L("abc"))({})["lex"].alias("s384"),
        SHA512(L("abc"))({})["lex"].alias("s512"),
    ).collect()[0]
    assert out["s1"] == hashlib.sha1(b"abc").hexdigest()
    assert out["s384"] == hashlib.sha384(b"abc").hexdigest()
    assert out["s512"] == hashlib.sha512(b"abc").hexdigest()


def test_extension_function_registry(spark):
    """SPARQL extension functions by IRI (rdf_sparql_eval.ml :: iri_funs):
    register a Column-expression builder under an IRI, call it through the
    registry inside an algebra Extend."""
    from ocaml_rdf_spark.algebra import BGP, Ctx, Project, TriplePattern as T_, Var, flatten, select
    from ocaml_rdf_spark.functions.builtins import E, IRI_FUNS, call_iri_fun, register_fun, t_string
    from ocaml_rdf_spark.relational import P_NAME, triples_view
    from ocaml_rdf_spark.types import Iri

    fn_iri = "https://example.org/fn/shout"

    def shout(x):
        return E(lambda vm: t_string(F.concat(F.upper(x(vm)["lex"]), F.lit("!"))))

    register_fun(fn_iri, shout)
    try:
        ctx = Ctx(triples_view(spark, "/root/testdata/sf0.001"))
        from ocaml_rdf_spark.functions.builtins import V

        node = BGP([T_(Var("r"), Iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"), Iri("urn:c:Region")),
                    T_(Var("r"), Iri(P_NAME), Var("rname"))]).extend(
            "loud", call_iri_fun(fn_iri, V("rname"))
        )
        out = flatten(select(Project(node, ["rname", "loud"]), ctx))
        got = {r["rname"]: r["loud"] for r in out.collect()}
        assert got["ASIA"] == "ASIA!"
        assert len(got) == 5
    finally:
        IRI_FUNS.pop(fn_iri, None)


def test_extension_function_unregistered_raises():
    from ocaml_rdf_spark.functions.builtins import call_iri_fun

    import pytest as _pytest

    with _pytest.raises(KeyError):
        call_iri_fun("https://example.org/fn/nope")


def test_timezone_builtin(spark):
    """TIMEZONE (§17.4.5.7): offset → xsd:dayTimeDuration; absent → error."""
    from ocaml_rdf_spark.functions.builtins import L, TIMEZONE, TZ
    from ocaml_rdf_spark.types import Literal, XSD_DATETIME

    def run(lex):
        e = TIMEZONE(L(Literal(lex, dtype=XSD_DATETIME)))({})
        row = spark.range(1).select(e.alias("t")).collect()[0]["t"]
        return None if row is None or row["kind"] is None else (row["lex"], row["dtype"])

    assert run("2024-01-01T00:00:00Z") == ("PT0S", "http://www.w3.org/2001/XMLSchema#dayTimeDuration")
    assert run("2024-01-01T00:00:00+05:30")[0] == "PT5H30M"
    assert run("2024-01-01T00:00:00-08:00")[0] == "-PT8H"
    assert run("2024-01-01T00:00:00+00:00")[0] == "PT0S"
    assert run("2024-01-01T00:00:00") is None  # no designator -> error


def test_parse_sparql_xml_roundtrip(spark):
    from ocaml_rdf_spark.algebra import BGP, Ctx, Project, TriplePattern as T_, Var, select
    from ocaml_rdf_spark.relational import P_NAME, triples_view
    from ocaml_rdf_spark.results import parse_sparql_xml, to_ask_xml, to_sparql_xml
    from ocaml_rdf_spark.types import Iri

    ctx = Ctx(triples_view(spark, "/root/testdata/sf0.001"))
    node = Project(
        BGP([T_(Var("r"), Iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"), Iri("urn:c:Region")),
             T_(Var("r"), Iri(P_NAME), Var("rname"))]),
        ["r", "rname"],
    )
    df = select(node, ctx)
    cols, rows = parse_sparql_xml(to_sparql_xml(df))
    assert sorted(cols) == ["r", "rname"]
    assert len(rows) == 5 and all(r["r"][0] == 0 for r in rows)
    assert {"ASIA", "EUROPE"} <= {r["rname"][1] for r in rows}
    assert parse_sparql_xml(to_ask_xml(True)) == ([], [{"__ask": True}])


def test_paragraph_dedup_semantics(spark):
    """C4-style paragraph dedup: first occurrence wins (doc order, then
    position), all-duplicate docs drop out, survivors keep order."""
    import pandas as pd

    from ocaml_rdf_spark.operators.textops import paragraph_dedup

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "alpha\n\nbeta\n\ngamma",
                    "beta\n\ndelta",      # beta already seen → only delta kept
                    "alpha\n\nbeta",      # all seen → doc drops out
                ],
            }
        )
    )
    out = {r["doc_id"]: (r["text"], r["n_paras"]) for r in paragraph_dedup(docs).collect()}
    assert out == {
        1: ("alpha\n\nbeta\n\ngamma", 3),
        2: ("delta", 1),
    }


def test_rollup_cascade_tiers_consistent(spark):
    # coarser tiers must be exact re-aggregations of finer tiers
    import datetime as dt

    from ocaml_rdf_spark.operators.events import rollup_cascade

    rows = [
        (i, dt.datetime(2024, 1, 1 + (i % 3), i % 24, (i * 7) % 60), i % 4, "t" + str(i % 2), float(i))
        for i in range(200)
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string, value double")
    out = rollup_cascade(ev, (1, 60, 1440)).collect()
    per_tier = {}
    for r in out:
        t = per_tier.setdefault(r["tier_minutes"], [0, 0])
        t[0] += r["n_events"]
        t[1] += r["sum_value_x100"]
    # every tier preserves grand totals
    assert per_tier[1] == per_tier[60] == per_tier[1440] == [200, sum(i * 100 for i in range(200))]
    # day tier has at most 3 buckets per type
    assert len([r for r in out if r["tier_minutes"] == 1440]) <= 6
    with pytest.raises(ValueError):
        rollup_cascade(ev, (1, 90, 100))


def test_cohort_retention_triangle(spark):
    from ocaml_rdf_spark.operators.events import cohort_retention

    rows = [
        (1, "2024-01-01 10:00:00", 100, "view"),   # cohort week of Jan 1 (Mon)
        (2, "2024-01-10 10:00:00", 100, "view"),   # +1 week
        (3, "2024-01-02 10:00:00", 200, "view"),   # same cohort
        (4, "2024-01-25 10:00:00", 200, "view"),   # +3 weeks
    ]
    events = spark.createDataFrame(rows, "event_id long, ts string, user_id long, event_type string") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in cohort_retention(events).collect()}
    assert out[("2024-01-01", 0)] == 2
    assert out[("2024-01-01", 1)] == 1
    assert out[("2024-01-01", 3)] == 1


def test_event_transitions_tiebreak(spark):
    from ocaml_rdf_spark.operators.events import event_transitions

    # equal timestamps: event_id order decides -> view->search->buy exactly
    rows = [
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-01 10:00:00", 1, "search"),
        (3, "2024-01-01 10:00:00", 1, "buy"),
        (4, "2024-01-01 09:00:00", 2, "view"),  # other user: no cross-user pair
    ]
    events = spark.createDataFrame(rows, "event_id long, ts string, user_id long, event_type string") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = {(r["from_type"], r["to_type"]): r["n"] for r in event_transitions(events).collect()}
    assert out == {("view", "search"): 1, ("search", "buy"): 1}


def test_kmv_set_ops_exact_below_k(spark):
    from ocaml_rdf_spark.operators.sketches import kmv_set_ops

    a = spark.createDataFrame([(i,) for i in range(40)], "v long")
    b = spark.createDataFrame([(i,) for i in range(30, 60)], "v long")
    r = kmv_set_ops(a, "v", b, "v", k=128).collect()[0]
    # below k the union sketch is the union itself: everything exact
    assert r["k_used"] == 60 and r["est_union"] == 60
    assert r["n_inter"] == 10 and r["est_intersect"] == 10


def test_kmv_set_ops_disjoint(spark):
    from ocaml_rdf_spark.operators.sketches import kmv_set_ops

    a = spark.createDataFrame([(f"a{i}",) for i in range(500)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(500)], "v string")
    r = kmv_set_ops(a, "v", b, "v", k=64).collect()[0]
    assert r["n_inter"] == 0 and r["est_intersect"] == 0
    assert 700 <= r["est_union"] <= 1400  # ~1000 within KMV error at k=64


def test_bitext_margin_kills_hub_vectors(spark):
    """A hub vector close to everything must lose to a mutually-exclusive
    pair under the ratio margin, and top-1 is per source."""
    from ocaml_rdf_spark.operators.ann import bitext_margin

    def v(*xs):
        return list(map(float, xs))

    # src 0 <-> dst 1 and src 4 <-> dst 3 are aligned pairs; src 2 is a
    # hub equally close to both dst vectors, and both dst neighborhoods
    # are strong (each has a near-identical source) -> hub margin < 1.05
    src = spark.createDataFrame(
        [(0, v(1, 0, 0, 0)), (4, v(0, 1, 0, 0)), (2, v(0.7, 0.7, 0, 0))],
        "vec_id long, embedding array<float>",
    )
    dst = spark.createDataFrame(
        [(1, v(0.99, 0.05, 0, 0)), (3, v(0.05, 0.99, 0, 0))], "vec_id long, embedding array<float>"
    )
    out = {r["src_id"]: r for r in bitext_margin(src, dst, k=2, margin_ppm_threshold=1050000).collect()}
    assert out[0]["dst_id"] == 1 and out[4]["dst_id"] == 3
    assert 2 not in out  # hub: stands out from neither neighborhood
