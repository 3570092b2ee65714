"""Sorted-neighborhood blocking (linking.snm_pairs/snm_positions),
skew pre-flight report (stats.skew_report), and rdf:first/rest list
flattening (canon.rdf_lists)."""

from pyspark.sql import functions as F

from ocaml_rdf_spark.operators.canon import rdf_lists
from ocaml_rdf_spark.operators.linking import snm_pairs, snm_positions
from ocaml_rdf_spark.operators.stats import skew_report

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def test_snm_positions_match_total_order(spark):
    df = spark.createDataFrame(
        [("b", 2), ("a", 1), ("c", 3), ("a", 0)], "k string, id long"
    )
    pos = {(r["k"], r["id"]): r["pos"] for r in
           snm_positions(df, ["k", "id"], buckets=3).collect()}
    assert pos == {("a", 0): 0, ("a", 1): 1, ("b", 2): 2, ("c", 3): 3}
    # invariant under input partitioning
    again = {(r["k"], r["id"]): r["pos"] for r in
             snm_positions(df.repartition(5), ["k", "id"], buckets=2).collect()}
    assert again == pos


def test_snm_pairs_window_semantics(spark):
    df = spark.createDataFrame(
        [("smith", 1), ("smyth", 2), ("smith", 3), ("zzz", 9)], "key string, id long"
    )
    # sort order: (smith,1) (smith,3) (smyth,2) (zzz,9)
    out = {(r["id_a"], r["id_b"]): r["dist"] for r in
           snm_pairs(df, "key", "id", window=2, buckets=2).collect()}
    assert out == {(1, 3): 1, (3, 2): 1, (2, 9): 1}
    # window=3 adds the distance-2 pairs
    out3 = {(r["id_a"], r["id_b"]) for r in
            snm_pairs(df, "key", "id", window=3, buckets=2).collect()}
    assert out3 == {(1, 3), (3, 2), (2, 9), (1, 2), (3, 9)}


def test_skew_report_ranks_and_share(spark):
    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("cold",)] * 1
    df = spark.createDataFrame(rows, "k string")
    out = {r["rank"]: r for r in skew_report(df, "k", k=2).collect()}
    assert len(out) == 2
    assert out[1]["key"] == "hot" and out[1]["n"] == 6
    assert out[1]["total_rows"] == 10 and out[1]["n_keys"] == 3
    assert out[1]["share_ppm"] == 600000
    assert out[2]["key"] == "warm" and out[2]["share_ppm"] == 300000


def _list_quads(spark, chains):
    """chains: list of (head_prefix, [items])."""
    rows = []
    for head, items in chains:
        for i, item in enumerate(items):
            node = f"{head}:{i}"
            rows.append((node, RDF_NS + "first", 0, item, None))
            nxt = f"{head}:{i + 1}" if i + 1 < len(items) else RDF_NS + "nil"
            rows.append((node, RDF_NS + "rest", 0, nxt, None))
    df = spark.createDataFrame(
        rows, "s_lex string, pred string, o_kind int, o_lex string, o_dtype string"
    )
    return df.withColumn("o_kind", F.col("o_kind").cast("tinyint"))


def test_rdf_lists_flattens_multiple_spines(spark):
    q = _list_quads(spark, [("urn:l:a", ["x", "y", "z"]), ("urn:l:b", ["q"])])
    out = {(r["head"], r["idx"]): r["item"] for r in rdf_lists(q).collect()}
    assert out == {
        ("urn:l:a:0", 0): "x",
        ("urn:l:a:0", 1): "y",
        ("urn:l:a:0", 2): "z",
        ("urn:l:b:0", 0): "q",
    }


def test_rdf_lists_shared_tail_flattens_per_entry_point(spark):
    # two heads converge on a shared tail node t
    rows = [
        ("h1", RDF_NS + "first", 0, "a", None),
        ("h1", RDF_NS + "rest", 0, "t", None),
        ("h2", RDF_NS + "first", 0, "b", None),
        ("h2", RDF_NS + "rest", 0, "t", None),
        ("t", RDF_NS + "first", 0, "z", None),
        ("t", RDF_NS + "rest", 0, RDF_NS + "nil", None),
    ]
    df = spark.createDataFrame(
        rows, "s_lex string, pred string, o_kind int, o_lex string, o_dtype string"
    ).withColumn("o_kind", F.col("o_kind").cast("tinyint"))
    out = {(r["head"], r["idx"], r["item"]) for r in rdf_lists(df).collect()}
    assert out == {("h1", 0, "a"), ("h1", 1, "z"), ("h2", 0, "b"), ("h2", 1, "z")}


def test_rdf_lists_empty_store(spark):
    q = _list_quads(spark, []).limit(0)
    assert rdf_lists(q).count() == 0


def test_bisim_summary_distinguishes_at_depth_two(spark):
    """Two 'a'-class nodes point via :p at 'b'-class nodes; only one of
    those b-nodes has an outgoing :q edge — at k=1 the a-nodes already
    split because their targets' round-0 colors agree but round-1
    colors differ... at k=2 the split is guaranteed. Checks the quotient
    collapses regular structure and separates irregular structure."""
    from ocaml_rdf_spark.operators.stats import bisim_summary

    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rows = [
        ("a1", RDF_TYPE, 0, "A"), ("a2", RDF_TYPE, 0, "A"),
        ("b1", RDF_TYPE, 0, "B"), ("b2", RDF_TYPE, 0, "B"),
        ("a1", "urn:p:p", 0, "b1"), ("a2", "urn:p:p", 0, "b2"),
        ("b1", "urn:p:q", 0, "c1"),  # only b1 continues
    ]
    df = spark.createDataFrame(
        rows, "s_lex string, pred string, o_kind int, o_lex string"
    ).withColumn("o_kind", F.col("o_kind").cast("tinyint"))
    out = bisim_summary(df, k=2).collect()
    # b1 and b2 must have different colors (q-edge visible at k>=1), so
    # the two p-edges land in two separate summary rows
    p_rows = [r for r in out if r["pred"] == "urn:p:p"]
    assert len(p_rows) == 2 and all(r["n_edges"] == 1 for r in p_rows)
    # and at k=0 the p-edges collapse into ONE row (b1,b2 same type color)
    out0 = bisim_summary(df, k=0).collect()
    p0 = [r for r in out0 if r["pred"] == "urn:p:p"]
    assert len(p0) == 1 and p0[0]["n_edges"] == 2 and p0[0]["n_src"] == 2
