"""K-hop neighborhood extraction (cc.khop_subgraph) and PROV-O lineage
emission (pipeline.lineage_to_prov)."""

from pyspark.sql import functions as F

from ocaml_rdf_spark.operators.cc import khop_subgraph
from ocaml_rdf_spark.pipeline import lineage_to_prov

PROV = "http://www.w3.org/ns/prov#"


def _quads(spark, rows):
    """rows: (s_lex, pred, o_kind, o_lex)."""
    df = spark.createDataFrame(rows, "s_lex string, pred string, o_kind int, o_lex string")
    return df.select(
        F.lit(0).cast("tinyint").alias("s_kind"),
        "s_lex",
        "pred",
        F.col("o_kind").cast("tinyint"),
        "o_lex",
        F.lit(None).cast("string").alias("o_dtype"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit("urn:g:t").alias("graph"),
    )


CHAIN = [
    ("a", "urn:p:e", 0, "b"),
    ("b", "urn:p:e", 0, "c"),
    ("c", "urn:p:e", 0, "d"),
    ("d", "urn:p:e", 0, "e"),
    ("b", "urn:p:name", 2, "B!"),  # literal leaf on a hop-1 node
    ("z", "urn:p:e", 0, "a"),  # inbound edge: undirected expansion grabs it
]


def test_khop_respects_radius_and_direction(spark):
    q = _quads(spark, CHAIN)
    seeds = spark.createDataFrame([("a",)], "ent string")
    got1 = {(r["s_lex"], r["pred"], r["o_lex"]) for r in khop_subgraph(q, seeds, 1).collect()}
    # hop 1: triples touching 'a' only
    assert got1 == {("a", "urn:p:e", "b"), ("z", "urn:p:e", "a")}
    got2 = {(r["s_lex"], r["o_lex"]) for r in khop_subgraph(q, seeds, 2).collect()}
    assert ("b", "c") in got2 and ("b", "B!") in got2  # literal leaf rides along
    assert ("c", "d") not in got2  # 3 hops away
    # full closure at hops=5
    assert khop_subgraph(q, seeds, 5).count() == len(CHAIN)


def test_khop_empty_at_zero_hops_and_unknown_seed(spark):
    q = _quads(spark, CHAIN)
    seeds = spark.createDataFrame([("a",)], "ent string")
    assert khop_subgraph(q, seeds, 0).count() == 0
    ghost = spark.createDataFrame([("nope",)], "ent string")
    assert khop_subgraph(q, ghost, 3).count() == 0


def test_lineage_to_prov_counts_and_chain(spark):
    lineage = spark.createDataFrame(
        [("extract", 0, 100), ("extract", 1, 50), ("dedup", 0, 120)],
        "stage string, part_id int, row_count long",
    )
    out = lineage_to_prov(lineage, "run9", stage_order=["extract", "dedup"])
    rows = {(r["s_lex"], r["pred"]): r for r in out.collect()}
    ent = "urn:x-ords:run:run9:data:extract"
    assert rows[(ent, "urn:x-ords:rowCount")]["o_lex"] == "150"
    assert rows[(ent, "urn:x-ords:partCount")]["o_lex"] == "2"
    assert rows[(ent, PROV + "wasGeneratedBy")]["o_lex"] == "urn:x-ords:run:run9:act:extract"
    ded = "urn:x-ords:run:run9:data:dedup"
    assert rows[(ded, PROV + "wasDerivedFrom")]["o_lex"] == ent
    assert rows[("urn:x-ords:run:run9:act:dedup", PROV + "used")]["o_lex"] == ent
    # typing present, graph tagged per run
    assert all(r["graph"] == "urn:x-ords:run:run9:prov" for r in rows.values())
    # 2 stages × 5 melt rows + 2 chain edges
    assert len(rows) == 12


def test_lineage_to_prov_no_chain_without_order(spark):
    lineage = spark.createDataFrame(
        [("only", 0, 7)], "stage string, part_id int, row_count long"
    )
    out = lineage_to_prov(lineage, "r", stage_order=None)
    preds = {r["pred"] for r in out.collect()}
    assert PROV + "wasDerivedFrom" not in preds and len(preds) == 4
