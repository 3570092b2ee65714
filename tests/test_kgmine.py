"""Unit tests for the KG mining & repair family (operators/kgmine.py,
fusion.fuse_numeric, weblinks.spam_mass) on hand-built toy graphs where
every expected number is derivable by inspection."""

from __future__ import annotations

from pyspark.sql import functions as F


def _triples(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def test_same_pair_rules_confidence(spark):
    # p ⊂ q on 2 of 4 pairs → p⇒q conf 500000 ... wait: p has 2 pairs,
    # both also q → p⇒q = 1e6; q has 4 pairs, 2 also p → q⇒p = 500000.
    rows = [
        ("a", "q", "1"), ("b", "q", "2"), ("c", "q", "3"), ("d", "q", "4"),
        ("a", "p", "1"), ("b", "p", "2"),
    ]
    from ocaml_rdf_spark.operators.kgmine import mine_same_pair_rules

    out = {
        (r["body_p"], r["head_p"]): (r["body_n"], r["support"], r["conf_ppm"])
        for r in mine_same_pair_rules(_triples(spark, rows), min_body=2).collect()
    }
    assert out[("p", "q")] == (2, 2, 1_000_000)
    assert out[("q", "p")] == (4, 2, 500_000)


def test_same_pair_rules_set_semantics(spark):
    # duplicate assertions count once (pair table is distinct)
    rows = [("a", "p", "1"), ("a", "p", "1"), ("a", "q", "1"), ("b", "p", "2")]
    from ocaml_rdf_spark.operators.kgmine import mine_same_pair_rules

    out = {
        (r["body_p"], r["head_p"]): r["conf_ppm"]
        for r in mine_same_pair_rules(_triples(spark, rows), min_body=2).collect()
    }
    assert out == {("p", "q"): 500_000}  # q below min_body as body


def test_path_rules_witness_dedup_and_confidence(spark):
    # x→z1→y and x→z2→y: TWO witnesses, ONE body pair. head holds → conf 1e6.
    rows = [
        ("x", "p", "z1"), ("x", "p", "z2"),
        ("z1", "q", "y"), ("z2", "q", "y"),
        ("x", "r", "y"),
        # second body pair without head support → conf drops to 500000
        ("u", "p", "z3"), ("z3", "q", "v"),
    ]
    from ocaml_rdf_spark.operators.kgmine import mine_path_rules

    out = mine_path_rules(_triples(spark, rows), min_body=2, min_support=1).collect()
    got = {(r["body_p"], r["body_q"], r["head_p"]): (r["body_n"], r["support"], r["conf_ppm"]) for r in out}
    assert got[("p", "q", "r")] == (2, 1, 500_000)


def test_path_rules_max_fanout_drops_hub(spark):
    # hub z with fanout 3×3; cap at 8 removes every pair through it
    rows = [(f"x{i}", "p", "hub") for i in range(3)] + [
        ("hub", "q", f"y{j}") for j in range(3)
    ] + [("a", "p", "w"), ("w", "q", "b"), ("x0", "r", "y0"), ("a", "r", "b")]
    from ocaml_rdf_spark.operators.kgmine import mine_path_rules

    def rule(df):
        return {(r["body_p"], r["body_q"], r["head_p"]): (r["body_n"], r["support"]) for r in df.collect()}

    full = rule(mine_path_rules(_triples(spark, rows), min_body=2, min_support=1))
    capped = rule(mine_path_rules(_triples(spark, rows), min_body=2, min_support=1, max_fanout=8))
    assert full[("p", "q", "r")] == (10, 2)  # 3×3 through the hub + a→w→b
    assert capped[("p", "q", "r")] == (1, 1)  # hub (fanout 9 > 8) dropped


def test_constrained_components_cuts_and_null_merges(spark):
    # chain a-b-c-d-e; sid: a=1, b=NULL, c=1, d=2, e=NULL
    # cut only c-d (1≠2, both non-null); NULLs merge freely
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], "src string, dst string"
    )
    ids = spark.createDataFrame(
        [("a", "1"), ("b", None), ("c", "1"), ("d", "2"), ("e", None)],
        "node string, sid string",
    )
    from ocaml_rdf_spark.operators.kgmine import constrained_components

    m = {r["node"]: r["component"] for r in constrained_components(edges, ids).collect()}
    assert m["a"] == m["b"] == m["c"]
    assert m["d"] == m["e"]
    assert m["a"] != m["d"]


def test_constrained_components_distributed_matches(spark):
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(20)], "src string, dst string"
    )
    ids = spark.createDataFrame(
        [(f"n{i}", str(i // 7)) for i in range(21)], "node string, sid string"
    )
    from ocaml_rdf_spark.operators.kgmine import constrained_components

    fast = constrained_components(edges, ids).collect()
    dist = constrained_components(edges, ids, driver_threshold=0).collect()
    assert sorted(map(tuple, fast)) == sorted(map(tuple, dist))
    assert len({r["component"] for r in fast}) == 3


def test_disambiguate_prior_times_dot_and_tiebreak(spark):
    mens = spark.createDataFrame(
        [(1, "e", [1.0, 0.0]), (2, "e", [0.0, 1.0])],
        "mention_id long, alias string, context array<float>",
    )
    cands = spark.createDataFrame(
        [
            ("e", "urn:b", 1000, [1.0, 0.0]),   # dot=1 with m1
            ("e", "urn:a", 1000, [1.0, 0.0]),   # identical score → tie, urn:a wins
            ("e", "urn:c", 2000, [0.0, 1.0]),   # wins m2 on prior×dot
        ],
        "alias string, uri string, prior_ppm long, emb array<float>",
    )
    from ocaml_rdf_spark.operators.kgmine import disambiguate_mentions

    got = {r["mention_id"]: r["uri"] for r in disambiguate_mentions(mens, cands).collect()}
    assert got == {1: "urn:a", 2: "urn:c"}


def test_fuse_numeric_rejects_outlier(spark):
    # claims 10,10,11,12,1000 → median 11, MAD small → 1000 rejected
    claims = spark.createDataFrame(
        [("s1", "p", f"src{i}", v) for i, v in enumerate([10, 10, 11, 12, 1000])],
        "s string, p string, src string, val long",
    )
    from ocaml_rdf_spark.operators.fusion import fuse_numeric

    row = fuse_numeric(claims, k_num=3).first()
    assert (row["n_claims"], row["n_kept"]) == (5, 4)
    assert row["fused_x100"] == (10 + 10 + 11 + 12) * 100 // 4


def test_fuse_numeric_all_equal_keeps_all(spark):
    claims = spark.createDataFrame(
        [("s1", "p", f"src{i}", 7) for i in range(4)],
        "s string, p string, src string, val long",
    )
    from ocaml_rdf_spark.operators.fusion import fuse_numeric

    row = fuse_numeric(claims).first()
    assert (row["n_claims"], row["n_kept"], row["fused_x100"]) == (4, 4, 700)


def test_spam_mass_all_trusted_is_zero(spark):
    edges = spark.createDataFrame(
        [("a.x", "b.x", 1), ("b.x", "c.x", 1), ("c.x", "a.x", 1)],
        "src_host string, dst_host string, n_links long",
    )
    trusted = spark.createDataFrame([("a.x",), ("b.x",), ("c.x",)], "host string")
    from ocaml_rdf_spark.operators.weblinks import spam_mass

    rows = spam_mass(edges, trusted).collect()
    assert rows and all(r["spam_ppm"] == 0 for r in rows)
    assert all(r["rank"] == r["trust"] for r in rows)


def test_spam_mass_untrusted_tail_scores_high(spark):
    # star: trusted hub h links to t1..t3; spam s links only to itself-ish tail
    edges = spark.createDataFrame(
        [("h.x", "t1.x", 1), ("h.x", "t2.x", 1), ("s.x", "t3.x", 1)],
        "src_host string, dst_host string, n_links long",
    )
    trusted = spark.createDataFrame([("h.x",)], "host string")
    from ocaml_rdf_spark.operators.weblinks import spam_mass

    got = {r["host"]: r["spam_ppm"] for r in spam_mass(edges, trusted).collect()}
    # hub-fed targets carry trust mass; the spam-fed target carries none
    assert got["t3.x"] > got["t1.x"]
    assert got["t3.x"] > 900_000
