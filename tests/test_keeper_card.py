"""Quality-aware dedup keeper (textops.keeper_by_quality) and entity-card
fact summarization (stats.entity_facts_topk)."""

from pyspark.sql import functions as F

from ocaml_rdf_spark.operators.stats import entity_facts_topk
from ocaml_rdf_spark.operators.textops import keeper_by_quality

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def test_keeper_by_quality_elects_best_not_min_id(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)], "doc_id long, cluster_id long"
    )
    quality = spark.createDataFrame(
        [(1, 50), (2, 100), (3, 100), (9, 0)], "doc_id long, quality long"
    )
    out = {r["doc_id"]: r for r in keeper_by_quality(clusters, quality).collect()}
    assert out[2]["is_keeper"] == 1  # quality tie 2 vs 3 → min id wins
    assert out[1]["is_keeper"] == 0 and out[3]["is_keeper"] == 0
    assert out[9]["is_keeper"] == 1  # singleton keeps itself
    assert sum(r["is_keeper"] for r in out.values()) == 2


def _quads(spark, rows):
    df = spark.createDataFrame(rows, "s_lex string, pred string, o_lex string")
    return df.select(
        F.lit(0).cast("tinyint").alias("s_kind"), "s_lex", "pred",
        F.lit(0).cast("tinyint").alias("o_kind"), "o_lex",
    )


def test_entity_facts_topk_ranks_rare_predicates_first(spark):
    rows = [
        ("e1", RDF_TYPE, "T"),  # excluded from the card
        ("e1", "urn:p:common", "x1"),
        ("e2", "urn:p:common", "x2"),
        ("e3", "urn:p:common", "x3"),
        ("e1", "urn:p:rare", "y1"),  # pf=1 → most informative
        ("e1", "urn:p:mid", "z1"),
        ("e2", "urn:p:mid", "z2"),
    ]
    out = {(r["s_lex"], r["fact_rank"]): r["pred"]
           for r in entity_facts_topk(_quads(spark, rows), k=2).collect()}
    assert out[("e1", 1)] == "urn:p:rare"
    assert out[("e1", 2)] == "urn:p:mid"
    assert ("e1", 3) not in out  # k=2 cap; 'common' fell off the card
    assert out[("e2", 1)] == "urn:p:mid"
    assert not any(p == RDF_TYPE for p in out.values())
