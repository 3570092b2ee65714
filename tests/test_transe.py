"""TransE energy scoring (walks.transe_scores)."""

from pyspark.sql import functions as F

from ocaml_rdf_spark.operators.walks import transe_scores


def _emb(spark, rows):
    return spark.createDataFrame(rows, "ent string, embedding array<float>")


def test_transe_zero_relation_is_negative_l1(spark):
    ents = _emb(spark, [("a", [1.0, 2.0]), ("b", [1.0, 2.0]), ("c", [4.0, 6.0])])
    t = spark.createDataFrame(
        [("a", "p", "b"), ("a", "p", "c")], "s_lex string, pred string, o_lex string"
    )
    out = {(r["s_lex"], r["o_lex"]): r["score_x1e4"] for r in transe_scores(t, ents).collect()}
    assert out[("a", "b")] == 0  # identical vectors: perfect score
    assert out[("a", "c")] == -70000  # |1-4| + |2-6| = 7


def test_transe_relation_translates(spark):
    ents = _emb(spark, [("a", [0.0, 0.0]), ("b", [3.0, -1.0])])
    rel = _emb(spark, [("p", [3.0, -1.0])]).withColumnRenamed("ent", "pred")
    t = spark.createDataFrame([("a", "p", "b")], "s_lex string, pred string, o_lex string")
    row = transe_scores(t, ents, rel_emb=rel).collect()[0]
    assert row["score_x1e4"] == 0  # e_a + r_p lands exactly on e_b
    # and without the relation the same fact scores -40000
    bare = transe_scores(t, ents).collect()[0]
    assert bare["score_x1e4"] == -40000


def test_transe_missing_embedding_drops_fact(spark):
    ents = _emb(spark, [("a", [0.0])])
    t = spark.createDataFrame(
        [("a", "p", "ghost")], "s_lex string, pred string, o_lex string"
    )
    assert transe_scores(t, ents).count() == 0  # inner joins: unscorable facts drop


def test_rank_eval_metrics_and_pessimistic_ties(spark):
    from ocaml_rdf_spark.operators.walks import rank_eval

    rows = [
        # q1: positive ranks 1st
        ("q1", "a", 90, 1), ("q1", "b", 50, 0), ("q1", "c", 10, 0),
        # q2: positive ranks 2nd
        ("q2", "a", 90, 0), ("q2", "b", 50, 1), ("q2", "c", 10, 0),
        # q3: positive TIES the best score -> pessimistic rank 2
        ("q3", "a", 70, 0), ("q3", "b", 70, 1), ("q3", "c", 10, 0),
    ]
    df = spark.createDataFrame(rows, "query string, candidate string, score long, is_true int")
    r = rank_eval(df, k_list=(1, 3)).collect()[0]
    assert r["n_queries"] == 3
    # ranks: 1, 2, 2 -> MRR = (1e6 + 5e5 + 5e5) div 3
    assert r["mrr_x1e6"] == (1000000 + 500000 + 500000) // 3
    assert r["hits1_ppm"] == 1000000 // 3
    assert r["hits3_ppm"] == 1000000
