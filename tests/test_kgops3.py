"""Unit tests for louvain_move, property_alignment, metablocking_wep on
hand-built fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def test_louvain_move_two_cliques(spark):
    # two triangles joined by one bridge: from singletons, one synchronous
    # sweep moves every node to a label INSIDE its own triangle — the
    # bridge never wins (kic=1 both ways but the cross-gain loses to the
    # in-clique gain), so the clique label sets stay disjoint. (Labels
    # oscillate pairwise within a clique on sweep 1 — the documented
    # synchronous behavior; convergence comes from iterating sweeps.)
    tri1 = [("a", "b"), ("b", "c"), ("a", "c")]
    tri2 = [("x", "y"), ("y", "z"), ("x", "z")]
    bridge = [("c", "x")]
    from ocaml_rdf_spark.operators.cc import louvain_move

    out = {r["node"]: r["label"] for r in louvain_move(_edges(spark, tri1 + tri2 + bridge)).collect()}
    left = {out[n] for n in "abc"}
    right = {out[n] for n in "xyz"}
    assert left <= set("abc") and right <= set("xyz")
    assert left.isdisjoint(right)


def test_louvain_move_deterministic_tiebreak(spark):
    # path a-b-c from singletons: b has equal gain toward a and c → min label a
    from ocaml_rdf_spark.operators.cc import louvain_move

    out = {r["node"]: r["label"] for r in louvain_move(_edges(spark, [("a", "b"), ("b", "c")])).collect()}
    assert out["b"] == "a"


def test_louvain_move_respects_initial_labels(spark):
    # square a-b-c-d-a with labels {a,b}→L and {c,d}→R stays put: each
    # node has 1 neighbor in its own community and 1 in the other, but
    # own community's sigma excludes self — gains tie, own label is
    # reachable, min tiebreak decides; just assert output is a valid
    # relabeling over the same nodes with integer gains computed
    from ocaml_rdf_spark.operators.cc import louvain_move

    labels = spark.createDataFrame(
        [("a", "L"), ("b", "L"), ("c", "R"), ("d", "R")], "node string, label string"
    )
    out = louvain_move(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]), labels
    )
    got = {r["node"]: r["label"] for r in out.collect()}
    assert set(got) == {"a", "b", "c", "d"}
    assert set(got.values()) <= {"L", "R"}


def test_property_alignment_overlap_and_stopvalues(spark):
    a = spark.createDataFrame(
        [("p1", "u"), ("p1", "v"), ("p1", "w"), ("p2", "q")]
        + [("p2", f"hot{i}") for i in range(3)],
        "pred string, value string",
    )
    b = spark.createDataFrame(
        [("r1", "u"), ("r1", "v"), ("r1", "zz"), ("r2", "q"), ("r2", "q2")],
        "pred string, value string",
    )
    from ocaml_rdf_spark.operators.fusion import property_alignment

    out = {
        (r["pa"], r["pb"]): (r["overlap"], r["jaccard_ppm"])
        for r in property_alignment(a, b, min_overlap=2, max_value_df=10, k=2).collect()
    }
    # p1 ∩ r1 = {u, v} → 2/(3+3-2) = 500000; all other pairs below min_overlap
    assert out == {("p1", "r1"): (2, 500_000)}


def test_property_alignment_hot_value_dropped(spark):
    # 'x' appears under every predicate on both sides; with max_value_df=2
    # it is dropped and no alignment survives min_overlap
    a = spark.createDataFrame(
        [("p1", "x"), ("p2", "x"), ("p1", "y")], "pred string, value string"
    )
    b = spark.createDataFrame(
        [("r1", "x"), ("r2", "x"), ("r1", "y")], "pred string, value string"
    )
    from ocaml_rdf_spark.operators.fusion import property_alignment

    assert property_alignment(a, b, min_overlap=2, max_value_df=2, k=3).count() == 0


def test_metablocking_wep_mean_cut_and_purge(spark):
    # records 1,2 share 3 blocks (w=3); 1-3 and 2-3 share 1 (w=1);
    # mean = 5/3 → only (1,2) survives. block 'huge' (65 recs) is purged
    rows = (
        [("b1", 1), ("b1", 2), ("b2", 1), ("b2", 2), ("b3", 1), ("b3", 2), ("b3", 3)]
        + [("huge", i) for i in range(100, 165)]
    )
    blocks = spark.createDataFrame(rows, "block_id string, rec_id long")
    from ocaml_rdf_spark.operators.linking import metablocking_wep

    got = [(r["rec_a"], r["rec_b"], r["weight"]) for r in metablocking_wep(blocks, max_block_size=64).collect()]
    assert got == [(1, 2, 3)]


def test_metablocking_wep_strict_cut_drops_uniform(spark):
    # all pairs weight 1 → mean 1, strict > drops everything
    blocks = spark.createDataFrame(
        [("b1", 1), ("b1", 2), ("b2", 3), ("b2", 4)], "block_id string, rec_id long"
    )
    from ocaml_rdf_spark.operators.linking import metablocking_wep

    assert metablocking_wep(blocks).count() == 0
