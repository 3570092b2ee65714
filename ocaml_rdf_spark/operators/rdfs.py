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


def _ckpt(df: DataFrame) -> DataFrame:
    """Multi-consumer materialization point. ORDS_RDFS_CKPT picks the
    strategy — 'lazy' (default: localCheckpoint(eager=False), lineage cut
    + single computation of a frame read by several consumers), 'eager',
    or 'none' (recompute per consumer) — the knob behind the r5 bench
    experiment on rdfs_delta's barrier cost (BENCH/R5_NOTES.md)."""
    import os

    mode = os.environ.get("ORDS_RDFS_CKPT", "lazy")
    if mode == "none":
        return df
    return df.localCheckpoint(eager=(mode == "eager"))


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


def _infer_stmts(inst: DataFrame, cls: DataFrame, prp: DataFrame,
                 dom: DataFrame, rng: DataFrame) -> DataFrame:
    """ONE pass of the instance rules (rdfs7, rdfs2/3, rdfs9) over a
    5-col statement frame against the CLOSED broadcast schema → 7-col
    entailed statements. This per-statement linearity — no rule joins
    two instance statements — is what makes the closure a single pass
    AND makes incremental maintenance (rdfs_closure_delta) delta-sized:
    infer(A ∪ B) = infer(A) ∪ infer(B)."""
    # rdfs7: predicate expansion through the closed subproperty relation
    expanded = inst.join(
        F.broadcast(prp.withColumnRenamed("src", "pred")), "pred", "inner"
    ).select("s_kind", "s_lex", F.col("dst").alias("pred"), "o_kind", "o_lex")
    # three consumers read stmts (dom/rng/base_types); checkpoint so the
    # scan+broadcast-join subtree runs once, not once per consumer — the
    # recompute showed up as ~500 tiny map tasks in the final dedup stage
    stmts = inst.unionByName(expanded).transform(_ckpt)

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
    all_types = base_types.unionByName(dom_types).unionByName(rng_types).transform(_ckpt)

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
    return type_triples.unionByName(prop_triples)


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
    entailed = _infer_stmts(inst, cls, prp, dom, rng)
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
        entailed.unionByName(schema_triples)
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


def rdfs_closure_delta(
    base: DataFrame,
    old_inferred: DataFrame,
    add: DataFrame,
    delete: DataFrame,
    graph: str = "urn:g:rdfs",
    schema_driver_limit: int = SCHEMA_DRIVER_EDGE_LIMIT,
) -> DataFrame:
    """Incremental maintenance of the materialized RDFS closure under a
    batch of additions AND deletions — DRed (delete and rederive, Gupta,
    Mumick & Subrahmanian, SIGMOD'93), specialized to this rule set.

    Returns the inferred set of `(base ∖ delete) ∪ add` — set-equal to
    `rdfs_closure(updated_base)` (pytest-pinned and driver-oracled
    against a full recompute) — WITHOUT re-running the rules over the
    whole store:

    - **Additions** are delta-sized outright: the instance rules are
      per-statement (no instance-instance joins), so
      infer(base ∪ add) = infer(base) ∪ infer(add).
    - **Deletions** use over-delete + rederive: candidates C =
      delete ∪ infer(delete) (everything the deleted statements asserted
      or derived); each candidate survives iff it is re-derivable from
      the REMAINING statements. Because every derivation of a statement
      about x consumes exactly one statement whose subject or object is
      x, rederivation only needs `remaining` restricted to the
      candidates' subject/object keys — a key-restricted semi-join, NOT
      a full re-closure. At 100 TB: delta-sized frames broadcast; the
      two semi-joins against the pred/key-sorted store prune to the
      touched keys' row groups.

    **Schema-change fallback (documented, checked):** if add/delete
    touches subClassOf/subPropertyOf/domain/range, the closed
    hierarchies themselves change and every instance derivation is
    suspect — the honest move is a full recompute (schema edits are
    rare and schema-sized; DRed's win is the instance-delta case).

    `old_inferred` is the previously materialized ENTAILED set (what
    rdfs_closure returned for `base`). Output carries the same
    graph/extractor metadata and the entailed-only guarantee (anti-join
    against the UPDATED asserted set)."""
    key5 = ["s_kind", "s_lex", "pred", "o_kind", "o_lex"]
    schema_preds = (SUBCLASS, SUBPROP, DOMAIN, RANGE)

    delta = add.select(*key5).unionByName(delete.select(*key5))
    if not delta.filter(F.col("pred").isin(*schema_preds)).isEmpty():
        remaining = base.join(delete.select(*key5).distinct(), key5, "left_anti")
        return rdfs_closure(remaining.unionByName(add.select(base.columns)),
                            graph=graph, schema_driver_limit=schema_driver_limit)

    cls = _close_hierarchy(_schema_edges(base, SUBCLASS), schema_driver_limit)
    prp = _close_hierarchy(_schema_edges(base, SUBPROP), schema_driver_limit)
    dom = _schema_edges(base, DOMAIN)
    rng = _schema_edges(base, RANGE)

    del5 = delete.select(*key5).distinct().transform(_ckpt)
    add5 = add.select(*key5).distinct().transform(_ckpt)
    remaining = base.select(*key5).distinct().join(del5, key5, "left_anti").transform(_ckpt)

    # over-delete candidates: the deleted statements themselves (they may
    # be re-derivable, and were suppressed from old_inferred as asserted)
    # plus everything they derived
    cand = (
        del5.select(
            F.col("s_kind").cast("tinyint").alias("s_kind"), "s_lex", "pred",
            F.col("o_kind").cast("tinyint").alias("o_kind"), "o_lex",
            F.lit(None).cast("string").alias("o_dtype"),
            F.lit(None).cast("string").alias("o_lang"),
        )
        .unionByName(_infer_stmts(del5, cls, prp, dom, rng))
        .dropDuplicates(key5)
        .transform(_ckpt)
    )

    # rederive: every derivation of a candidate consumes one remaining
    # statement whose subject or object is the candidate's subject key —
    # restrict remaining to those keys and run the one-pass rules
    keys = cand.select(F.col("s_lex").alias("k")).unionByName(
        cand.select(F.col("o_lex").alias("k"))
    ).distinct()
    rem_touch = (
        remaining.join(keys.withColumnRenamed("k", "s_lex"), "s_lex", "left_semi")
        .unionByName(
            remaining.join(keys.withColumnRenamed("k", "o_lex"), "o_lex", "left_semi")
            .select(*remaining.columns)
        )
        .dropDuplicates(key5)
    )
    rederivable = (
        _infer_stmts(rem_touch, cls, prp, dom, rng)
        .select(*key5)
        .dropDuplicates(key5)
    )
    survivors = cand.join(rederivable, key5, "left_semi")

    new_from_add = _infer_stmts(add5, cls, prp, dom, rng)

    kept_old = old_inferred.select(
        "s_kind", "s_lex", "pred", "o_kind", "o_lex", "o_dtype", "o_lang"
    ).join(cand.select(*key5), key5, "left_anti")

    out = (
        kept_old.unionByName(survivors.select(kept_old.columns))
        .unionByName(new_from_add)
        .withColumn("graph", F.lit(graph))
        .withColumn("src_url", F.lit(None).cast("string"))
        .withColumn("extractor", F.lit("rdfs"))
        .withColumn("part_id", F.lit(None).cast("int"))
        .dropDuplicates(TRIPLE_KEY)
    )
    updated_asserted = remaining.unionByName(add5).distinct()
    return out.join(updated_asserted, key5, "left_anti")
