"""Micro tests: instance-based class alignment (fusion.class_alignment),
crawl change-rate estimation (urls.change_rate), host authority profile
(weblinks.host_authority)."""

from __future__ import annotations

from ocaml_rdf_spark.operators.fusion import class_alignment
from ocaml_rdf_spark.operators.urls import change_rate
from ocaml_rdf_spark.operators.weblinks import host_authority


def test_class_alignment_elects_extensional_match(spark):
    # A1 = {1,2,3}, A2 = {4,5}; B-side: Bgood ⊇ A1 plus one extra,
    # Bnoise = everything
    ta = spark.createDataFrame(
        [("i1", "A1"), ("i2", "A1"), ("i3", "A1"), ("i4", "A2"), ("i5", "A2"),
         ("i1", "A1")],  # duplicate assertion → set semantics
        "inst string, cls_a string",
    )
    tb = spark.createDataFrame(
        [("i1", "Bgood"), ("i2", "Bgood"), ("i3", "Bgood"), ("i4", "Bgood"),
         ("i1", "Bnoise"), ("i2", "Bnoise"), ("i3", "Bnoise"),
         ("i4", "Bnoise"), ("i5", "Bnoise")],
        "inst string, cls_b string",
    )
    out = {(r.cls_a, r.rank): (r.cls_b, r.n_a, r.n_b, r.n_both, r.jac_ppm)
           for r in class_alignment(ta, tb, k=1).collect()}
    # jac(A1, Bgood) = 3/4 = 750000 ppm beats jac(A1, Bnoise) = 3/5
    assert out[("A1", 1)] == ("Bgood", 3, 4, 3, 750000)
    # jac(A2, Bnoise) = 2/5 = 400000 beats jac(A2, Bgood) = 1/6
    assert out[("A2", 1)] == ("Bnoise", 2, 5, 2, 400000)


def test_class_alignment_min_overlap_prunes(spark):
    ta = spark.createDataFrame([("i1", "A")], "inst string, cls_a string")
    tb = spark.createDataFrame([("i1", "B")], "inst string, cls_b string")
    assert class_alignment(ta, tb, min_overlap=2).count() == 0


def test_change_rate_counts_and_tiers(spark):
    snaps = spark.createDataFrame(
        [  # hot: changes every fetch (2/2)
            ("h", 1, 1, "a"), ("h", 2, 2, "b"), ("h", 3, 3, "c"),
            # cold: never changes (0/2)
            ("c", 1, 4, "x"), ("c", 2, 5, "x"), ("c", 3, 6, "x"),
            # warm: 1 change in 4 intervals = 250000 ppm
            ("w", 1, 7, "p"), ("w", 2, 8, "p"), ("w", 3, 9, "q"),
            ("w", 4, 10, "q"), ("w", 5, 11, "q"),
            # single observation → 0, cold
            ("s", 1, 12, "z"),
        ],
        "url string, ts long, event_id long, content_hash string",
    )
    out = {r.url: (r.n_obs, r.n_changes, r.change_ppm, r.priority)
           for r in change_rate(snaps, order_cols=("event_id",)).collect()}
    assert out["h"] == (3, 2, 1000000, "hot")
    assert out["c"] == (3, 0, 0, "cold")
    assert out["w"] == (5, 1, 250000, "warm")
    assert out["s"] == (1, 0, 0, "cold")


def test_change_rate_tie_break_is_deterministic(spark):
    # identical ts: event_id orders the fetches → exactly one change
    snaps = spark.createDataFrame(
        [("u", 1, 2, "b"), ("u", 1, 1, "a"), ("u", 1, 3, "b")],
        "url string, ts long, event_id long, content_hash string",
    )
    row = change_rate(snaps, order_cols=("event_id",)).collect()[0]
    assert (row.n_obs, row.n_changes) == (3, 1)


def test_host_authority_degrees(spark):
    hg = spark.createDataFrame(
        [("a", "b", 10, 2), ("a", "c", 5, 1), ("b", "a", 1, 1)],
        "src_host string, dst_host string, n_links long, n_src_pages long",
    )
    out = {r.host: (r.out_degree, r.out_links, r.in_degree, r.in_links, r.authority_ppm)
           for r in host_authority(hg).collect()}
    assert out["a"] == (2, 15, 1, 1, 62500)       # 1e6 // 16
    assert out["b"] == (1, 1, 1, 10, 909090)      # 10e6 // 11
    assert out["c"] == (0, 0, 1, 5, 1000000)      # pure sink


def test_cidr_join_longest_prefix(spark):
    from ocaml_rdf_spark.operators.urls import cidr_join

    ips = spark.createDataFrame(
        [("10.0.0.1",), ("10.0.5.9",), ("10.9.0.1",), ("11.0.0.1",),
         ("10.0.0.1",)],  # duplicate → one output row
        ["ip"],
    )
    blocks = spark.createDataFrame(
        [("10.0.0.0/13", "A"), ("10.0.0.0/16", "B"), ("10.8.0.0/14", "C")],
        ["cidr", "owner"],
    )
    out = {r.ip: (r.cidr, r.prefix_len, r.owner)
           for r in cidr_join(ips, blocks).collect()}
    assert len(out) == 4
    # /16 beats the enclosing /13
    assert out["10.0.0.1"] == ("10.0.0.0/16", 16, "B")
    assert out["10.0.5.9"] == ("10.0.0.0/16", 16, "B")
    # coarse /14 block found through bucket expansion
    assert out["10.9.0.1"] == ("10.8.0.0/14", 14, "C")
    assert out["11.0.0.1"] == (None, None, None)


def test_cidr_join_host_route(spark):
    from ocaml_rdf_spark.operators.urls import cidr_join

    # /32 host route wins over everything; /8 covers the rest of 10/8
    ips = spark.createDataFrame([("10.1.2.3",), ("10.1.2.4",)], ["ip"])
    blocks = spark.createDataFrame(
        [("10.0.0.0/8", "net"), ("10.1.2.3/32", "host")], ["cidr", "owner"]
    )
    out = {r.ip: (r.prefix_len, r.owner) for r in cidr_join(ips, blocks).collect()}
    assert out["10.1.2.3"] == (32, "host")
    assert out["10.1.2.4"] == (8, "net")


def _quads(spark, rows):
    return spark.createDataFrame(
        rows,
        "s_kind tinyint, s_lex string, pred string, o_kind tinyint, "
        "o_lex string, o_dtype string, o_lang string, graph string",
    )


def test_reify_roundtrip_and_determinism(spark):
    from ocaml_rdf_spark.operators.canon import reify, unreify

    XS = "http://www.w3.org/2001/XMLSchema#string"
    quads = _quads(spark, [
        (0, "urn:a", "urn:p", 0, "urn:b", None, None, "g1"),
        (0, "urn:a", "urn:q", 2, "hi", XS, None, "g1"),
        (1, "bn1", "urn:p", 2, "bonjour", "langstring", "fr", "g2"),
    ])
    r = reify(quads)
    assert r.count() == 12  # 4 arcs per quad
    # deterministic statement ids: re-reifying yields the identical set
    assert sorted(map(tuple, r.collect())) == sorted(map(tuple, reify(quads).collect()))
    rt = unreify(r)
    assert sorted(map(tuple, rt.collect())) == sorted(map(tuple, quads.collect()))


def test_unreify_drops_incomplete_statements(spark):
    from ocaml_rdf_spark.operators.canon import unreify

    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    partial = _quads(spark, [
        (0, "urn:stmt1", RDF + "subject", 0, "urn:a", None, None, "g"),
        (0, "urn:stmt1", RDF + "predicate", 0, "urn:p", None, None, "g"),
        # no rdf:object arc → dropped
        (0, "urn:x", "urn:unrelated", 2, "keepout", None, None, "g"),
    ])
    assert unreify(partial).count() == 0
