"""Unit tests for incremental CC, pairwise ER metrics, shape induction,
and the temporal interval operators — toy fixtures with by-inspection
expectations."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_incremental_equals_full_recompute(spark):
    from ocaml_rdf_spark.operators.cc import connected_components, incremental_components

    old = spark.createDataFrame(
        [("a", "b"), ("c", "d"), ("e", "f"), ("g", "h")], "src string, dst string"
    )
    new = spark.createDataFrame(
        [("b", "c"), ("x", "y"), ("f", "x")], "src string, dst string"
    )
    mapping = connected_components(old)
    inc = sorted(map(tuple, incremental_components(mapping, new).collect()))
    full = sorted(map(tuple, connected_components(old.unionByName(new)).collect()))
    assert inc == full
    # untouched component g-h kept its row; merged a-b-c-d relabeled to min
    d = dict(inc)
    assert d["h"] == "g" and d["d"] == "a" and d["y"] == "e"


def test_incremental_new_nodes_only_batch(spark):
    from ocaml_rdf_spark.operators.cc import connected_components, incremental_components

    old = spark.createDataFrame([("a", "b")], "src string, dst string")
    new = spark.createDataFrame([("p", "q")], "src string, dst string")
    mapping = connected_components(old)
    inc = dict(
        (r["node"], r["component"])
        for r in incremental_components(mapping, new).collect()
    )
    assert inc == {"a": "a", "b": "a", "p": "p", "q": "p"}


def test_er_metrics_exact_counts(spark):
    from ocaml_rdf_spark.operators.linking import er_pair_metrics

    # gold: {1,2,3},{4,5}; pred: {1,2},{3,4,5}
    gold = spark.createDataFrame(
        [("1", "g1"), ("2", "g1"), ("3", "g1"), ("4", "g2"), ("5", "g2")],
        "node string, cluster string",
    )
    pred = spark.createDataFrame(
        [("1", "p1"), ("2", "p1"), ("3", "p2"), ("4", "p2"), ("5", "p2")],
        "node string, cluster string",
    )
    r = er_pair_metrics(pred, gold).first()
    # tp: C(2,2 in p1×g1)=1 + cell(p2,g1)=1 node→0 + cell(p2,g2)=2 nodes→1 = 2
    # pred pairs: C(2,2)+C(3,2)=1+3=4; gold pairs: C(3,2)+C(2,2)=3+1=4
    assert (r["tp_pairs"], r["pred_pairs"], r["gold_pairs"]) == (2, 4, 4)
    assert r["precision_ppm"] == r["recall_ppm"] == 500_000
    assert r["f1_ppm"] == 500_000


def test_er_metrics_perfect_and_node_intersection(spark):
    from ocaml_rdf_spark.operators.linking import er_pair_metrics

    gold = spark.createDataFrame(
        [("1", "g"), ("2", "g"), ("9", "z")], "node string, cluster string"
    )
    pred = spark.createDataFrame(
        [("1", "p"), ("2", "p"), ("8", "w")], "node string, cluster string"
    )  # 9/8 outside the intersection
    r = er_pair_metrics(pred, gold).first()
    assert (r["tp_pairs"], r["precision_ppm"], r["recall_ppm"], r["f1_ppm"]) == (
        1, 1_000_000, 1_000_000, 1_000_000,
    )


def _quads(spark, rows):
    return spark.createDataFrame(
        rows, "s_kind int, s_lex string, pred string, o_kind int, o_lex string, "
        "o_dtype string, o_lang string, graph string"
    )


def test_infer_shapes_envelope_and_roundtrip(spark):
    from ocaml_rdf_spark.operators.shacl import infer_shapes, validate
    from ocaml_rdf_spark.types import RDF_TYPE

    X = "http://www.w3.org/2001/XMLSchema#"
    rows = [
        (0, "e1", RDF_TYPE, 0, "C", None, None, "g"),
        (0, "e2", RDF_TYPE, 0, "C", None, None, "g"),
        (0, "e1", "name", 2, "a", X + "string", None, "g"),
        (0, "e1", "name", 2, "b", X + "string", None, "g"),  # multi-valued
        (0, "e2", "name", 2, "c", X + "string", None, "g"),
        (0, "e1", "knows", 0, "e2", None, None, "g"),        # optional (e2 lacks)
        (0, "e2", "tag", 2, "1", X + "integer", None, "g"),
        (0, "e2", "tag", 0, "iri", None, None, "g"),          # mixed kind
    ]
    shapes = {
        (r["target_class"], r["path"]): r for r in infer_shapes(_quads(spark, rows)).collect()
    }
    name = shapes[("C", "name")]
    assert (name["n_instances"], name["n_with"], name["min_count"], name["max_count"]) == (2, 2, 1, 2)
    assert (name["node_kind"], name["datatype"], name["opt"]) == ("Literal", X + "string", 0)
    knows = shapes[("C", "knows")]
    assert (knows["node_kind"], knows["opt"], knows["min_count"]) == ("IRI", 1, 1)
    assert shapes[("C", "tag")]["node_kind"] == "(mixed)"
    # induction/validation round-trip: mined non-optional envelopes must
    # validate cleanly on the mining corpus
    mined = spark.createDataFrame(
        [
            ("s1", "C", "name", 1, 2, X + "string", None, "Literal"),
            ("s2", "C", "knows", None, 1, None, None, "IRI"),
        ],
        "shape_id string, target_class string, path string, min_count int, "
        "max_count int, datatype string, cls string, node_kind string",
    )
    assert validate(_quads(spark, rows), mined).count() == 0


def test_interval_coalesce_merges_and_counts(spark):
    from ocaml_rdf_spark.operators.temporal import interval_coalesce

    iv = spark.createDataFrame(
        [
            ("u", 0, 10), ("u", 5, 20), ("u", 20, 30),   # overlap + touch → one range
            ("u", 40, 50),                                  # gap → second range
            ("v", 0, 100), ("v", 10, 20),                  # contained
        ],
        "user string, from_us long, to_us long",
    )
    got = sorted(
        map(tuple, interval_coalesce(iv, ["user"]).collect())
    )
    assert got == [("u", 0, 30, 3), ("u", 40, 50, 1), ("v", 0, 100, 2)]


def test_interval_allen_all_relations(spark):
    from ocaml_rdf_spark.operators.temporal import interval_allen

    left = spark.createDataFrame(
        [
            ("k", "eq", 10, 20), ("k", "me", 0, 10), ("k", "mb", 20, 30),
            ("k", "st", 10, 15), ("k", "sb", 10, 25), ("k", "fi", 15, 20),
            ("k", "fb", 5, 20), ("k", "du", 12, 18), ("k", "co", 5, 25),
            ("k", "ov", 5, 15), ("k", "ob", 15, 25),
            ("k", "disjoint", 100, 110),  # must NOT pair
        ],
        "key string, id string, from_us long, to_us long",
    )
    right = spark.createDataFrame(
        [("k", "R", 10, 20)], "key string, id string, from_us long, to_us long"
    )
    got = {
        r["l_id"]: r["relation"]
        for r in interval_allen(left, right, ["key"], bin_us=7).collect()
    }
    assert got == {
        "eq": "equals", "me": "meets", "mb": "met_by", "st": "starts",
        "sb": "started_by", "fi": "finishes", "fb": "finished_by",
        "du": "during", "co": "contains", "ov": "overlaps", "ob": "overlapped_by",
    }


def test_interval_allen_key_scoping(spark):
    from ocaml_rdf_spark.operators.temporal import interval_allen

    left = spark.createDataFrame(
        [("a", "l", 0, 10)], "key string, id string, from_us long, to_us long"
    )
    right = spark.createDataFrame(
        [("b", "r", 0, 10)], "key string, id string, from_us long, to_us long"
    )
    assert interval_allen(left, right, ["key"]).count() == 0
