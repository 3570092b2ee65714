"""RDFS entailment materialization — the schema-inference stage of a KG
construction pipeline (beyond the reference, which stores but does not
infer; KG pipelines routinely materialize the RDFS closure before
serving). Implements the instance-relevant RDFS rule set:

  rdfs5   subPropertyOf transitivity           (schema)
  rdfs7   x p y, p subPropertyOf q     ⇒ x q y (instance)
  rdfs2   p domain C, x p y            ⇒ x type C
  rdfs3   p range  C, x p y (y ∉ lit)  ⇒ y type C
  rdfs9   x type C, C subClassOf D     ⇒ x type D
  rdfs11  subClassOf transitivity              (schema)

Stratified evaluation reaches the fixpoint of these rules in ONE pass
over the instance data: (1) close the schema hierarchies (tiny —
transitive_closure over subClassOf/subPropertyOf edges), (2) expand
predicates through the closed subproperty relation (rdfs7), (3) apply
domain/range to the EXPANDED statements (so `p ⊑ q, q domain C` fires),
(4) inherit types through the closed subclass relation over base ∪
rule-2/3 types. The ordering is complete because domain/range/subClassOf
consequences are always rdf:type triples, which no other rule consumes
except rdfs9 — applied last over the closed hierarchy.

Scale: schema triples are a vanishing fraction of a 100 TB store — the
closed hierarchies broadcast, so every instance-side rule is ONE
broadcast hash join over a pred- or type-bound scan (pushed filters);
the only shuffle is the final set-semantics dedup. No fixpoint ever
iterates over instance data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..types import RDF_TYPE, TRIPLE_KEY

RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
SUBCLASS = RDFS_NS + "subClassOf"
SUBPROP = RDFS_NS + "subPropertyOf"
DOMAIN = RDFS_NS + "domain"
RANGE = RDFS_NS + "range"


def _schema_edges(triples: DataFrame, pred: str) -> DataFrame:
    return (
        triples.filter((F.col("pred") == pred) & (F.col("s_kind") == 0) & (F.col("o_kind") == 0))
        .select(F.col("s_lex").alias("src"), F.col("o_lex").alias("dst"))
        .distinct()
    )


#: schema hierarchies at or below this edge count close on the driver
#: (one collect + BFS) instead of the distributed fixpoint — the cc.py
#: adaptive-union-find precedent: real ontologies are kilobytes, and the
#: fixpoint's per-round jobs cost seconds of pure scheduling on a 6-edge
#: hierarchy. Above the threshold (or with threshold 0, as the forced
#: test path does) the distributed transitive_closure runs unchanged.
SCHEMA_DRIVER_EDGE_LIMIT = 100_000


def _close_hierarchy(edges: DataFrame, driver_limit: int = SCHEMA_DRIVER_EDGE_LIMIT) -> DataFrame:
    """Transitive closure of a (src, dst) schema edge set, adaptive."""
    from .paths import transitive_closure

    rows = edges.limit(driver_limit + 1).collect() if driver_limit else None
    if rows is None or len(rows) > driver_limit:
        return transitive_closure(edges)
    adj: dict = {}
    for r in rows:
        adj.setdefault(r["src"], set()).add(r["dst"])
    closed = []
    for start in adj:
        seen, frontier = set(), list(adj[start])
        while frontier:
            n = frontier.pop()
            if n not in seen:
                seen.add(n)
                frontier.extend(adj.get(n, ()))
        closed.extend((start, d) for d in seen)
    spark = edges.sparkSession
    return spark.createDataFrame(closed or [], "src string, dst string")


def rdfs_closure(
    triples: DataFrame,
    graph: str = "urn:g:rdfs",
    schema_driver_limit: int = SCHEMA_DRIVER_EDGE_LIMIT,
) -> DataFrame:
    """→ the ENTAILED triples (IRI-only positions, set semantics, graph =
    `graph`, extractor = 'rdfs'), excluding triples already asserted.
    Union with the input for the materialized closure."""
    cls = _close_hierarchy(_schema_edges(triples, SUBCLASS), schema_driver_limit)  # rdfs11
    prp = _close_hierarchy(_schema_edges(triples, SUBPROP), schema_driver_limit)   # rdfs5
    dom = _schema_edges(triples, DOMAIN)
    rng = _schema_edges(triples, RANGE)

    inst = triples.select("s_kind", "s_lex", "pred", "o_kind", "o_lex")

    # rdfs7: predicate expansion through the closed subproperty relation
    expanded = inst.join(
        F.broadcast(prp.withColumnRenamed("src", "pred")), "pred", "inner"
    ).select("s_kind", "s_lex", F.col("dst").alias("pred"), "o_kind", "o_lex")
    # three consumers read stmts (dom/rng/base_types); checkpoint so the
    # scan+broadcast-join subtree runs once, not once per consumer — the
    # recompute showed up as ~500 tiny map tasks in the final dedup stage
    stmts = inst.unionByName(expanded).localCheckpoint(eager=False)

    # rdfs2 / rdfs3: domain and range over the expanded statements
    dom_types = stmts.join(
        F.broadcast(dom.withColumnRenamed("src", "pred")), "pred", "inner"
    ).select("s_kind", "s_lex", F.col("dst").alias("cls"))
    rng_types = (
        stmts.filter(F.col("o_kind").isin(0, 1))
        .join(F.broadcast(rng.withColumnRenamed("src", "pred")), "pred", "inner")
        .select(F.col("o_kind").alias("s_kind"), F.col("o_lex").alias("s_lex"), F.col("dst").alias("cls"))
    )
    base_types = stmts.filter(F.col("pred") == RDF_TYPE).select(
        "s_kind", "s_lex", F.col("o_lex").alias("cls")
    )
    all_types = base_types.unionByName(dom_types).unionByName(rng_types).localCheckpoint(eager=False)

    # rdfs9: inherit through the closed subclass relation
    inherited = all_types.join(
        F.broadcast(cls.withColumnRenamed("src", "cls")), "cls", "inner"
    ).select("s_kind", "s_lex", F.col("dst").alias("cls"))

    type_triples = all_types.unionByName(inherited).select(
        F.col("s_kind").cast("tinyint").alias("s_kind"),
        F.col("s_lex"),
        F.lit(RDF_TYPE).alias("pred"),
        F.lit(0).cast("tinyint").alias("o_kind"),
        F.col("cls").alias("o_lex"),
        F.lit(None).cast("string").alias("o_dtype"),
        F.lit(None).cast("string").alias("o_lang"),
    )
    prop_triples = expanded.select(
        "s_kind", "s_lex", "pred", "o_kind", "o_lex",
        F.lit(None).cast("string").alias("o_dtype"),
        F.lit(None).cast("string").alias("o_lang"),
    )
    schema_triples = (
        cls.select(F.col("src").alias("s_lex"), F.lit(SUBCLASS).alias("pred"), F.col("dst").alias("o_lex"))
        .unionByName(
            prp.select(F.col("src").alias("s_lex"), F.lit(SUBPROP).alias("pred"), F.col("dst").alias("o_lex"))
        )
        .select(
            F.lit(0).cast("tinyint").alias("s_kind"), "s_lex", "pred",
            F.lit(0).cast("tinyint").alias("o_kind"), "o_lex",
            F.lit(None).cast("string").alias("o_dtype"),
            F.lit(None).cast("string").alias("o_lang"),
        )
    )

    # NB: the union's map side stacks every branch's partitions (~15× the
    # store's) into the dedup stage — many tiny tasks. A coalesce() here
    # was tried and REGRESSED (6.7s → 10.1s at sf0.1): merged tasks
    # compute branches serially and straggle; the wide-but-tiny map side
    # schedules better
    out = (
        type_triples.unionByName(prop_triples).unionByName(schema_triples)
        .withColumn("graph", F.lit(graph))
        .withColumn("src_url", F.lit(None).cast("string"))
        .withColumn("extractor", F.lit("rdfs"))
        .withColumn("part_id", F.lit(None).cast("int"))
        .dropDuplicates(TRIPLE_KEY)
    )
    # entailed only: subtract already-asserted statements (graph-agnostic)
    asserted = triples.select("s_kind", "s_lex", "pred", "o_kind", "o_lex", "o_dtype", "o_lang").distinct()
    return out.join(
        asserted,
        ["s_kind", "s_lex", "pred", "o_kind", "o_lex"],
        "left_anti",
    )
