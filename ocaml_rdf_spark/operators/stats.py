"""Dataset-description statistics over the quad store (W3C VoID,
https://www.w3.org/TR/void/ — the vocabulary the RDF ecosystem around the
reference uses to publish dataset summaries; SURVEY §2.1 graph-API
`size`/`predicates`/`subjects` generalized to the full partition report).

A VoID report is what a KG pipeline publishes after each snapshot build:
dataset totals (void:triples, void:distinctSubjects, void:distinctObjects,
void:properties, void:classes), one row per property partition
(void:propertyPartition — triples + distinct subjects/objects under that
predicate), one row per class partition (void:classPartition —
void:entities), and one row per vocabulary namespace (void:vocabulary).

Everything is count/count-distinct algebra over the quad frame: map-side
partial aggregation everywhere, no joins, no windows — at 10^12 triples
the property partition is one pred-keyed shuffle whose reduce side is
|distinct predicates| rows (KGs have 10²-10⁴ predicates, so the reduce
side is metadata-sized; per-pred distinct counts partial-aggregate as
(pred, s_lex) cells before collapsing, never funneling a mega-predicate
through one reducer in a single pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _ns(pred_col: F.Column) -> F.Column:
    """Vocabulary namespace of a predicate IRI: everything up to and
    including the last '#', '/' or ':' (the VoID convention, extended to
    cover urn:-scheme predicates)."""
    return F.regexp_extract(pred_col, r"^(.*[#/:])", 1)


def void_stats(quads: DataFrame) -> DataFrame:
    """VoID dataset description → (part, key, triples, distinct_s,
    distinct_o) with part ∈ {dataset, property, class, vocabulary}.

    - part='dataset', key='': void:triples / distinctSubjects /
      distinctObjects (distinct_o counts distinct (o_kind, o_lex, o_dtype)
      terms — a literal and an IRI with equal lexicals stay distinct).
    - part='property', key=<pred>: triples + distinct subjects/objects in
      that property partition.
    - part='class', key=<class IRI>: void:entities (distinct typed
      subjects) as both triples and distinct_s; distinct_o = 0.
    - part='vocabulary', key=<namespace>: triple count per predicate
      namespace; distinct_s = distinct predicates in it; distinct_o = 0.
    """
    q = quads.select(
        "s_lex",
        "pred",
        # one string per object term: kind-tagged so IRI vs literal vs
        # lang/dtype twins count apart (cheap surrogate for a struct
        # distinct, and mirrors verbatim in SQL)
        F.concat_ws(
            "",
            F.col("o_kind").cast("string"),
            F.col("o_lex"),
            F.coalesce(F.col("o_dtype"), F.lit("")),
        ).alias("o_term"),
    )
    dataset = q.agg(
        F.count(F.lit(1)).alias("triples"),
        F.countDistinct("s_lex").alias("distinct_s"),
        F.countDistinct("o_term").alias("distinct_o"),
    ).select(
        F.lit("dataset").alias("part"),
        F.lit("").alias("key"),
        "triples",
        "distinct_s",
        "distinct_o",
    )
    props = q.groupBy(F.col("pred").alias("key")).agg(
        F.count(F.lit(1)).alias("triples"),
        F.countDistinct("s_lex").alias("distinct_s"),
        F.countDistinct("o_term").alias("distinct_o"),
    ).select(F.lit("property").alias("part"), "key", "triples", "distinct_s", "distinct_o")
    classes = (
        quads.filter(F.col("pred") == RDF_TYPE)
        .groupBy(F.col("o_lex").alias("key"))
        .agg(F.countDistinct("s_lex").alias("n"))
        .select(
            F.lit("class").alias("part"),
            "key",
            F.col("n").alias("triples"),
            F.col("n").alias("distinct_s"),
            F.lit(0).cast("long").alias("distinct_o"),
        )
    )
    vocab = q.groupBy(_ns(F.col("pred")).alias("key")).agg(
        F.count(F.lit(1)).alias("triples"),
        F.countDistinct("pred").alias("distinct_s"),
    ).select(
        F.lit("vocabulary").alias("part"),
        "key",
        "triples",
        "distinct_s",
        F.lit(0).cast("long").alias("distinct_o"),
    )
    return dataset.unionByName(props).unionByName(classes).unionByName(vocab)


def characteristic_sets(quads: DataFrame) -> DataFrame:
    """Characteristic sets (Neumann & Moerkotte, "Characteristic Sets:
    Accurate Cardinality Estimation for RDF Queries with Multiple Joins",
    ICDE 2011 — the standard RDF-store catalog statistic): group subjects
    by the SET of predicates they carry; the distribution of these sets
    is what a cost-based BGP planner uses to estimate star-join
    cardinalities (algebra.py's stats-planned BGP ordering consumes
    per-predicate counts today; characteristic sets are the multi-
    predicate refinement).

    Output: (cset: string — the sorted distinct predicates joined by a
    space, n_preds, n_subjects, n_triples), one row per distinct set.

    Scale shape: two shuffles, both map-side combinable — subject-keyed
    (collect_set of predicates is bounded by the vocabulary: KGs carry
    10²-10⁴ predicates, and one SUBJECT touches far fewer) then
    cset-keyed (reduce side = |distinct characteristic sets|, which is
    catalog-sized: thousands, not billions — the paper's core
    observation). No joins, no windows, no Python.
    """
    per_subject = quads.groupBy("s_kind", "s_lex").agg(
        F.concat_ws(" ", F.sort_array(F.collect_set("pred"))).alias("cset"),
        F.count(F.lit(1)).alias("nt"),
    )
    return per_subject.groupBy("cset").agg(
        F.count(F.lit(1)).alias("n_subjects"),
        F.sum("nt").alias("n_triples"),
    ).select(
        "cset",
        (F.size(F.split(F.col("cset"), " "))).cast("long").alias("n_preds"),
        "n_subjects",
        "n_triples",
    )


def schema_summary(quads: DataFrame) -> DataFrame:
    """Schema/linkset induction (the VoID void:Linkset idea plus what the
    literature calls a quotient or summary graph): for every predicate
    whose objects are IRIs, count the (subject class, object class)
    pairs it connects, using the store's own rdf:type triples. The
    result is the *induced ontology* of an extracted KG — which classes
    each predicate actually links — the artifact a KG-construction
    pipeline publishes for schema validation and drift alerts.

    Output: (pred, s_class, o_class, n_triples, n_subjects, n_objects).
    Untyped endpoints are reported under class '(untyped)' rather than
    dropped — missing rdf:type is itself a data-quality signal.

    Scale shape: the type side is one row per typed entity (≈ entity
    count), so this is two entity-keyed shuffle joins (s_lex then o_lex)
    + one catalog-keyed aggregation whose reduce side is
    |preds| × |class pairs| — metadata-sized. A multi-typed entity
    contributes one row per type (standard linkset semantics).
    """
    types = quads.filter(F.col("pred") == RDF_TYPE).select(
        F.col("s_lex").alias("ent"), F.col("o_lex").alias("cls")
    ).dropDuplicates()
    inst = quads.filter((F.col("pred") != RDF_TYPE) & (F.col("o_kind") == 0)).select(
        "s_lex", "pred", "o_lex"
    )
    j = (
        inst.join(types.withColumnRenamed("ent", "s_lex"), "s_lex", "left")
        .withColumnRenamed("cls", "s_class")
        .join(
            types.withColumnRenamed("ent", "o_lex").withColumnRenamed("cls", "o_class"),
            "o_lex",
            "left",
        )
        .fillna("(untyped)", subset=["s_class", "o_class"])
    )
    return j.groupBy("pred", "s_class", "o_class").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("s_lex").alias("n_subjects"),
        F.countDistinct("o_lex").alias("n_objects"),
    )


def key_discovery(quads: DataFrame, min_support: int = 2) -> DataFrame:
    """Candidate-key profiling — discover which predicates BEHAVE as
    functional / inverse-functional keys in the instance data (the
    empirical input to owlrl.functional_same_as when no ontology declares
    prp-fp/prp-ifp axioms; key discovery over RDF is the SAKey/ROCKER
    line of work, here as the exact one-pass profile a pipeline can
    threshold).

    Per predicate:
      n_triples, n_subjects, n_values              — exact counts
      max_vals_per_subject                          — 1 ⟹ functional in
        this snapshot (every subject has a single value)
      max_subjects_per_value                        — 1 ⟹ inverse-
        functional (a value identifies its subject; the ER-key signal)
      fp_ok / ifp_ok                                — the two flags above
        as 0/1, gated on n_subjects ≥ min_support so a predicate seen
        once can't claim keyhood

    Scale shape: two map-side-combined aggregations per orientation
    ((pred, subject) then pred; (pred, value) then pred) — reduce side is
    |predicates| rows, metadata-sized; no joins except the final
    |preds|-row merge of the two profiles (broadcastable by definition).
    A mega-predicate (rdf:type at 10^12 rows) partial-aggregates before
    the shuffle, so no single reducer sees its raw rows.
    """
    val = F.concat_ws(
        "\x1f",
        F.col("o_kind").cast("string"),
        F.col("o_lex"),
        F.coalesce(F.col("o_dtype"), F.lit("")),
        F.coalesce(F.col("o_lang"), F.lit("")),
    )
    base = quads.select("pred", F.col("s_lex").alias("s"), val.alias("v"))
    per_subj = base.groupBy("pred", "s").agg(
        F.countDistinct("v").alias("nv"), F.count(F.lit(1)).alias("nt")
    )
    fp = per_subj.groupBy("pred").agg(
        F.sum("nt").alias("n_triples"),
        F.count(F.lit(1)).alias("n_subjects"),
        F.max("nv").alias("max_vals_per_subject"),
    )
    per_val = base.groupBy("pred", "v").agg(F.countDistinct("s").alias("ns"))
    ifp = per_val.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_values"),
        F.max("ns").alias("max_subjects_per_value"),
    )
    prof = fp.join(ifp, "pred")
    sup = F.col("n_subjects") >= min_support
    return prof.select(
        "pred",
        "n_triples",
        "n_subjects",
        "n_values",
        "max_vals_per_subject",
        "max_subjects_per_value",
        F.when(sup & (F.col("max_vals_per_subject") == 1), F.lit(1))
        .otherwise(F.lit(0)).alias("fp_ok"),
        F.when(sup & (F.col("max_subjects_per_value") == 1), F.lit(1))
        .otherwise(F.lit(0)).alias("ifp_ok"),
    )


def path_profile(quads: DataFrame) -> DataFrame:
    """Chain-join cardinality statistics — the PATH companion to
    characteristic_sets (Neumann & Moerkotte's path statistics): for
    every predicate pair (p1, p2), how many 2-hop chains
    x —p1→ m —p2→ z the instance data contains, and through how many
    distinct mid nodes. This is what a BGP planner consults to order a
    chain join (`?x p1 ?m . ?m p2 ?z`), the way characteristic sets
    order star joins.

    Scale shape — the naive edge⋈edge join explodes on hub entities;
    instead both sides pre-aggregate to (pred, mid) COUNTS first, so the
    join is over the (pred × entity) count table and every hub
    contributes one row per predicate, not one row per edge:
      chains(p1,p2) = Σ_m in(p1,m) · out(p2,m)
    Two map-side-combined aggs + one mid-keyed equi-join + one
    catalog-keyed sum; exact BIGINTs.
    """
    inst = quads.filter(F.col("o_kind") == 0).select("s_lex", "pred", "o_lex")
    into = inst.groupBy(F.col("pred").alias("p1"), F.col("o_lex").alias("mid")).agg(
        F.count(F.lit(1)).alias("n_in")
    )
    outof = inst.groupBy(F.col("pred").alias("p2"), F.col("s_lex").alias("mid")).agg(
        F.count(F.lit(1)).alias("n_out")
    )
    return (
        into.join(outof, "mid")
        .groupBy("p1", "p2")
        .agg(
            F.sum(F.col("n_in") * F.col("n_out")).alias("n_chains"),
            F.countDistinct("mid").alias("n_mid"),
        )
    )


def skew_report(df: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """Pre-flight skew diagnosis for a planned join/agg key — the report
    an operator consults before shuffling 100 TB on `key_col`: top-k
    hottest keys with exact counts and integer ppm share of all rows,
    plus the global totals on every row for context.

    Output: (rank, key, n, total_rows, n_keys, share_ppm), rank 1-based
    by (count DESC, key ASC) — deterministic under ties.

    Scale shape: one map-side-combined count + TakeOrdered(k) (never a
    full sort) + a 1-row totals agg cross-joined onto k rows. If
    share_ppm of rank 1 approaches the per-task memory budget, that is
    the cue for salting / AQE skew hints on the real job."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("total_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    top = counts.orderBy(F.desc("n"), F.asc("key")).limit(int(k))
    ranked = top.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("key")))
    )
    return ranked.crossJoin(F.broadcast(totals)).select(
        "rank",
        "key",
        "n",
        "total_rows",
        "n_keys",
        F.expr("n * 1000000 div total_rows").alias("share_ppm"),
    )


def bisim_summary(quads: DataFrame, k: int = 2) -> DataFrame:
    """K-bisimulation quotient/summary graph (the SchemEX / structural-
    index line of work — Kaushik et al. A(k)-index, Schätzle et al. RDF
    bisimulation on MapReduce): nodes colored by k rounds of forward
    color refinement (color' = md5(color ∥ sorted set of
    (pred ∥ target color)); round 0 = the node's sorted rdf:type set),
    then the instance graph collapses to one row per
    (source color, predicate, target color):

      (s_color, pred, o_color, n_edges, n_src)

    The summary is what query planners and schema-drift monitors consult
    instead of the 10^12-edge instance graph: two nodes share a color
    iff they are indistinguishable by any outgoing path of length ≤ k.

    Scale shape per round: one edge⋈color join (target side) + one
    map-side-combined sorted-set aggregation per node — the same plan as
    canon.canonical_bnode_labels, generalized from bnodes to the whole
    node set with a FIXED k (structural indexes use k=1..3; colors
    stabilize long before the graph diameter). Exact, deterministic:
    every color is an md5 of canonical strings, so the same summary
    materializes from any partitioning or engine."""
    edges = quads.filter(
        (F.col("pred") != RDF_TYPE) & (F.col("o_kind") == 0)
    ).select("s_lex", "pred", F.col("o_lex").alias("t"))
    nodes = (
        quads.select(F.col("s_lex").alias("n"))
        .unionByName(quads.filter(F.col("o_kind") == 0).select(F.col("o_lex").alias("n")))
        .distinct()
    )
    types = quads.filter(F.col("pred") == RDF_TYPE).select(
        F.col("s_lex").alias("n"), F.col("o_lex").alias("ty")
    )
    colors = (
        nodes.join(types, "n", "left")
        .groupBy("n")
        .agg(F.sort_array(F.collect_set("ty")).alias("tys"))
        .select("n", F.md5(F.concat_ws("\x1f", F.col("tys"))).alias("color"))
    )
    for _ in range(max(0, int(k))):
        tgt = colors.select(F.col("n").alias("t"), F.col("color").alias("t_color"))
        desc = edges.join(tgt, "t", "inner").select(
            F.col("s_lex").alias("n"),
            F.concat_ws("\x1e", F.col("pred"), F.col("t_color")).alias("d"),
        )
        descs = desc.groupBy("n").agg(F.sort_array(F.collect_set("d")).alias("ds"))
        colors = (
            colors.join(descs, "n", "left")
            .select(
                "n",
                F.md5(
                    F.concat_ws(
                        "\x1d",
                        F.col("color"),
                        F.concat_ws("\x1f", F.coalesce(F.col("ds"), F.array())),
                    )
                ).alias("color"),
            )
            .localCheckpoint(eager=False)
        )
    sc = colors.select(F.col("n").alias("s_lex"), F.col("color").alias("s_color"))
    oc = colors.select(F.col("n").alias("t"), F.col("color").alias("o_color"))
    return (
        edges.join(sc, "s_lex").join(oc, "t")
        .groupBy("s_color", "pred", "o_color")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.countDistinct("s_lex").alias("n_src"),
        )
    )


def sdtype_infer(quads: DataFrame) -> DataFrame:
    """Type inference for untyped entities from their predicate profile
    (the SDType idea, Paulheim & Bizer ISWC 2013, as an exact integer
    vote): every TYPED subject contributes weight 1 to (pred, type) for
    each predicate it carries; an untyped subject's score for a type is
    the sum over its own predicates — argmax wins, with the evidence
    mass and an integer ppm confidence reported so a pipeline can
    threshold. KG-completion's 'fill the missing rdf:type' pass.

    Output: (s_lex, type_guess, score, evidence, conf_ppm), one row per
    untyped subject that shares at least one predicate with typed data.

    Scale shape: the (pred, type) weight table is catalog-sized
    (|preds| × |classes|) → broadcast into the untyped side's
    subject-pred pairs; one (subject, type)-keyed map-side-combined sum
    + one subject-keyed argmax window whose per-key group is |classes|.
    No instance-scale self-joins."""
    types = quads.filter(F.col("pred") == RDF_TYPE).select(
        F.col("s_lex").alias("s"), F.col("o_lex").alias("ty")
    ).dropDuplicates()
    sp = quads.filter(F.col("pred") != RDF_TYPE).select(
        F.col("s_lex").alias("s"), "pred"
    ).dropDuplicates()
    weights = (
        sp.join(types, "s", "inner")
        .groupBy("pred", "ty")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    pred_tot = weights.groupBy("pred").agg(F.sum("w").alias("n"))
    untyped = sp.join(types.select("s").distinct(), "s", "left_anti")
    scored = (
        untyped.join(F.broadcast(weights), "pred")
        .groupBy("s", "ty")
        .agg(F.sum("w").alias("score"))
    )
    evid = (
        untyped.join(F.broadcast(pred_tot), "pred")
        .groupBy("s")
        .agg(F.sum("n").alias("evidence"))
    )
    from pyspark.sql import Window

    win = Window.partitionBy("s").orderBy(F.desc("score"), F.asc("ty"))
    best = scored.withColumn("_rn", F.row_number().over(win)).filter(F.col("_rn") == 1)
    return best.join(evid, "s").select(
        F.col("s").alias("s_lex"),
        F.col("ty").alias("type_guess"),
        "score",
        "evidence",
        F.expr("score * 1000000 div evidence").alias("conf_ppm"),
    )


def entity_facts_topk(quads: DataFrame, k: int = 5) -> DataFrame:
    """Entity summarization (the RELIN/FACES line of work, reduced to
    its exact-integer core): rank each subject's facts by predicate
    informativeness — rarer predicates say more about an entity than
    ubiquitous ones — and keep the top-k per subject. This is what an
    entity card / search snippet shows at 10^12 triples without reading
    the full record.

    Output: (s_lex, pred, o_kind, o_lex, fact_rank), fact_rank 1..k by
    (predicate frequency ASC, pred ASC, o_lex ASC) — fully
    deterministic. rdf:type rows are excluded (types head the card
    separately; they would otherwise crowd out informative facts).

    Scale: predicate frequencies are catalog-sized → broadcast; one
    subject-keyed top-k window whose per-key group is the subject's
    degree."""
    from pyspark.sql import Window

    facts = quads.filter(F.col("pred") != RDF_TYPE).select(
        "s_lex", "pred", "o_kind", "o_lex"
    )
    pf = facts.groupBy("pred").agg(F.count(F.lit(1)).alias("__pf"))
    win = Window.partitionBy("s_lex").orderBy(
        F.asc("__pf"), F.asc("pred"), F.asc("o_lex")
    )
    return (
        facts.join(F.broadcast(pf), "pred")
        .withColumn("fact_rank", F.row_number().over(win))
        .filter(F.col("fact_rank") <= int(k))
        .select("s_lex", "pred", "o_kind", "o_lex", "fact_rank")
    )


def dangling_report(quads: DataFrame) -> DataFrame:
    """Referential-integrity audit: per predicate, how many of its
    IRI/bnode object terms are DANGLING — used as an object but never
    described (no triple has them as subject) → (pred, n_refs,
    n_dangling, dangling_ppm), n_refs counting distinct (pred, object
    term) pairs so a hot object skews no predicate's ratio.

    The KG-repair staple behind 'fix your red links': extraction emits
    schema:author → <person-uri> long before the person page is crawled,
    and the per-predicate dangling ratio is the signal that routes
    frontier scheduling (crawl what's referenced) and shape repair
    (predicates whose range is essentially never materialized). Literals
    are excluded — a literal object is terminal by design.

    Scale: distinct described-subject set is one map-side-combined
    distinct; the object side is one distinct on (pred, o_kind, o_lex);
    the never-described probe is a hash LeftAnti on the term key (both
    sides shuffle-partitioned on it, no broadcast assumption — the
    subject set is corpus-sized); final agg is pred-keyed,
    |predicates|-row output. dangling_ppm = n_dangling·10⁶ div n_refs,
    exact BIGINT (the ppm rule)."""
    from ..types import KIND_LITERAL

    refs = (
        quads.filter(F.col("o_kind") != KIND_LITERAL)
        .select("pred", F.col("o_kind").alias("k"), F.col("o_lex").alias("lex"))
        .dropDuplicates()
    )
    described = quads.select(
        F.col("s_kind").alias("k"), F.col("s_lex").alias("lex")
    ).dropDuplicates()
    dangling = refs.join(described, ["k", "lex"], "left_anti")
    n_refs = refs.groupBy("pred").agg(F.count(F.lit(1)).alias("n_refs"))
    n_dang = dangling.groupBy("pred").agg(F.count(F.lit(1)).alias("n_dangling"))
    return (
        n_refs.join(n_dang, "pred", "left")
        .select(
            "pred",
            F.col("n_refs").cast("long").alias("n_refs"),
            F.coalesce("n_dangling", F.lit(0)).cast("long").alias("n_dangling"),
        )
        .withColumn(
            "dangling_ppm", F.expr("n_dangling * 1000000L div n_refs")
        )
    )


def cohen_kappa(
    labels: DataFrame, rater_a: str, rater_b: str
) -> DataFrame:
    """Cohen's kappa inter-annotator agreement (Cohen 1960 — THE QA
    statistic for labeled training data: raw percent agreement flatters
    skewed label sets, kappa subtracts the agreement two raters would
    reach by chance from their marginal label rates): over the items
    BOTH raters labeled,

        po = agree / n,   pe = Σ_label cntA(l)·cntB(l) / n²,
        kappa = (po − pe) / (1 − pe)

    all in exact integer ppm: po_ppm = 10⁶·agree div n,
    pe_ppm = 10⁶·Σ div n², kappa_ppm = 10⁶·(po_ppm − pe_ppm) div
    (10⁶ − pe_ppm) (NULL when pe = 1 — the degenerate one-label world
    where kappa is undefined). Input (item, rater, label); multiple
    labels by one rater for one item collapse to the MIN label (pinned
    — a dup-labeled item must not count twice). Returns ONE row
    (n_items, n_agree, po_ppm, pe_ppm, kappa_ppm).

    Scale shape: two rater slices hash-join on item (each map-side
    min-agged first), then two label-marginal aggs whose reduce side is
    |label vocabulary| rows and one 1-row fold — label sets are
    schema-sized, so nothing grows with the corpus except the item
    join."""
    a = (
        labels.filter(F.col("rater") == rater_a)
        .groupBy("item").agg(F.min("label").alias("la"))
    )
    b = (
        labels.filter(F.col("rater") == rater_b)
        .groupBy("item").agg(F.min("label").alias("lb"))
    )
    j = a.join(b, "item")
    tot = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("la") == F.col("lb"), 1).otherwise(0)).alias("agree"),
    )
    ca = j.groupBy(F.col("la").alias("l")).agg(F.count(F.lit(1)).alias("na"))
    cb = j.groupBy(F.col("lb").alias("l")).agg(F.count(F.lit(1)).alias("nb"))
    pe_num = (
        ca.join(cb, "l")
        .agg(F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0)).alias("s"))
    )
    return (
        tot.crossJoin(F.broadcast(pe_num))
        .select(
            F.col("n").cast("long").alias("n_items"),
            F.col("agree").cast("long").alias("n_agree"),
            F.expr("1000000 * agree div n").alias("po_ppm"),
            F.expr("1000000 * s div (n * n)").alias("pe_ppm"),
        )
        .select(
            "n_items", "n_agree", "po_ppm", "pe_ppm",
            F.when(
                F.col("pe_ppm") < 1_000_000,
                F.expr("1000000 * (po_ppm - pe_ppm) div (1000000 - pe_ppm)"),
            ).alias("kappa_ppm"),
        )
    )


def krippendorff_alpha(labels: DataFrame) -> DataFrame:
    """Krippendorff's alpha for nominal labels (Krippendorff 2004 — the
    inter-annotator reliability statistic that, unlike Cohen's kappa,
    handles ANY number of raters and missing ratings, which is the normal
    shape of crowd-labeled training data): over units (items) with
    n_u ≥ 2 ratings,

        D_o = Σ_u P_u/(n_u−1)   with P_u = n_u² − Σ_c o_uc²
              (pairable disagreements inside unit u),
        D_e = (n² − Σ_c n_c²)/(n−1)   over the pooled category totals,
        alpha = 1 − D_o/D_e.

    Arithmetic is pinned engine-portable: the only non-integer step is
    the per-unit 1/(n_u−1) weight, computed as
    do_scaled = Σ_u (10⁶·P_u div (n_u−1)) — integer floor per unit,
    identical in Spark and DuckDB — and
    alpha_ppm = 10⁶ − (n−1)·do_scaled div de_num (NULL when de_num = 0:
    a one-category world has no expected disagreement and alpha is
    undefined). Duplicate (item, rater) ratings collapse to MIN label
    (same pin as cohen_kappa). Returns ONE row
    (n_units, n_ratings, do_scaled, de_num, alpha_ppm).

    Scale shape: one (item, label) count agg → one per-item agg (both
    map-side combined, keyed on the item — no joins), one |vocabulary|-
    sized label-total agg over the same per-(item,label) counts, and a
    1-row fold. Nothing shuffles more than once on the corpus key."""
    per_cat = (
        labels.groupBy("item", "rater").agg(F.min("label").alias("label"))
        .groupBy("item", "label").agg(F.count(F.lit(1)).alias("o"))
    )
    per_unit = (
        per_cat.groupBy("item")
        .agg(F.sum("o").alias("n_u"), F.sum(F.col("o") * F.col("o")).alias("s_u"))
        .filter(F.col("n_u") >= 2)
    )
    unit_stats = per_unit.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("n_u").cast("long").alias("n"),
        F.sum(F.expr("1000000 * (n_u * n_u - s_u) div (n_u - 1)")).alias("do_scaled"),
    )
    cat_tot = (
        per_cat.join(per_unit.select("item"), "item", "left_semi")
        .groupBy("label").agg(F.sum("o").alias("n_c"))
        .agg(F.coalesce(F.sum(F.col("n_c") * F.col("n_c")), F.lit(0)).alias("s_c"))
    )
    return (
        unit_stats.crossJoin(F.broadcast(cat_tot))
        .select(
            F.col("n_units").cast("long").alias("n_units"),
            F.col("n").alias("n_ratings"),
            F.col("do_scaled").cast("long").alias("do_scaled"),
            (F.col("n") * F.col("n") - F.col("s_c")).cast("long").alias("de_num"),
        )
        .select(
            "n_units", "n_ratings", "do_scaled", "de_num",
            F.when(
                F.col("de_num") > 0,
                F.lit(1_000_000) - F.expr("(n_ratings - 1) * do_scaled div de_num"),
            ).cast("long").alias("alpha_ppm"),
        )
    )


def calibration_report(
    scored: DataFrame,
    score_col: str = "score_ppm",
    label_col: str = "label",
    bins: int = 10,
) -> DataFrame:
    """Reliability table for a probabilistic quality/relevance scorer
    (Naeini et al. AAAI 2015's binned formulation — the audit that a
    model-based quality filter's scores MEAN what they say: a 0.9 bucket
    should be ~90% positive, else thresholding at 0.9 keeps the wrong
    docs): `score_col` is an integer ppm confidence in [0, 10⁶],
    `label_col` ∈ {0,1} the outcome.

    Equal-width binning pinned in integers: bin = least(score·B div 10⁶,
    B−1) (a perfect 10⁶ joins the top bin). Per bin → one row
    (bin, n, conf_ppm, acc_ppm, gap_ppm): mean confidence (floor div),
    empirical positive rate, |conf − acc|. `expected_calibration_error`
    folds this to the headline scalar.

    Scale shape: ONE map-side-combined groupBy on the bin key — B
    partial rows per task regardless of corpus size; no joins, no
    window, no Python.

    No counterpart in the reference (no ML layer; /root/reference empty
    per SURVEY §0); normative source is the public ECE literature."""
    if bins < 1:
        raise ValueError("calibration_report: bins must be >= 1")
    s = F.col(score_col).cast("long")
    bin_ = F.least(F.expr(f"{score_col} * {int(bins)} div 1000000"), F.lit(int(bins) - 1))
    return (
        scored.groupBy(bin_.cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(s).alias("__ss"),
            F.sum(F.col(label_col).cast("long")).alias("__sl"),
        )
        .select(
            "bin",
            "n",
            F.expr("__ss div n").alias("conf_ppm"),
            F.expr("__sl * 1000000 div n").alias("acc_ppm"),
            F.abs(F.expr("__ss div n") - F.expr("__sl * 1000000 div n")).alias("gap_ppm"),
        )
    )


def expected_calibration_error(
    scored: DataFrame,
    score_col: str = "score_ppm",
    label_col: str = "label",
    bins: int = 10,
) -> DataFrame:
    """→ ONE row (n, ece_ppm, mce_ppm): ECE = Σ_b n_b·gap_b div N (the
    bin-weighted mean calibration gap), MCE = max_b gap_b. Exact
    integers over `calibration_report`'s table — the report's B rows
    fold driver-free into the scalar."""
    rep = calibration_report(scored, score_col, label_col, bins)
    return rep.agg(
        F.sum("n").alias("n"),
        F.expr("sum(n * gap_ppm) div sum(n)").alias("ece_ppm"),
        F.max("gap_ppm").alias("mce_ppm"),
    )


def dawid_skene(
    labels: DataFrame,
    iters: int = 2,
    scale: int = 1_000_000,
    pseudo_ppm: int = 50_000,
) -> DataFrame:
    """Dawid-Skene label aggregation (Dawid & Skene 1979 — THE
    crowd-label quality model, and the standard upgrade from majority
    vote: raters have per-class confusion rates, so a consistent
    minority rater can outvote a sloppy majority): EM over item class
    posteriors and per-rater confusion matrices.

    Input (item, rater, label) — `cohen_kappa`'s table; duplicate
    labels by one rater for one item collapse to the MIN label (same
    pinned rule). Output: (item, cls, post_ppm), the class posterior per
    item in exact scaled integers; `ds_hard_labels` folds to the argmax
    decision.

    Integer-exact EM (the truth_discovery/simrank precedent — floats
    never cross an engine boundary):
      init    post⁰(i,c) = scale·cnt(i,c) div n_i          [vote shares]
      M-step  prior(c)   = scale·Σᵢ post(i,c) div Σᵢ,ᶜ post
              conf(r,c,l)= scale·(num + σ) div (den + K·σ)
                           [σ = pseudo_ppm, default 0.05 pseudo-counts
                            of Laplace smoothing — a never-seen
                            (class, label) cell must not zero out a
                            whole posterior product, but a FULL
                            pseudo-count swamps the reliability signal
                            on protocol-sized rater pools and EM then
                            never overturns a wrong majority (measured:
                            σ = scale never converges on the mirror
                            fixture; σ = scale/20 recovers every
                            contested item by round 6)]
      E-step  post'(i,c) ∝ fold over i's labels sorted by rater:
                           acc ← acc·conf(r,c,l) div scale, acc₀ = prior(c)
              (per-step floor rescale keeps every acc a BIGINT; the
               left-to-right fold is mirrored by DuckDB list_reduce)
              normalized to ppm; an all-zero row (posterior underflow)
              falls back to the prior (pinned).

    Scale shape: K (label vocabulary) is schema-sized, so the confusion
    table is |raters|·K² rows and the posterior frame |items|·K; per EM
    round: one item-keyed join + two map-side-combined aggs for the
    M-step, one (rater,label)-keyed hash join + one item-keyed
    collect_list agg (group size = raters per item, bounded by the
    labeling protocol) for the E-step. The only BNLJ is the 1-row
    prior-total broadcast (the dsir precedent). K and the EM round
    count are driver constants; nothing grows with corpus size except
    the item-keyed frames themselves.

    No counterpart in the reference (no labeling layer; /root/reference
    empty per SURVEY §0) — public literature only."""
    if iters < 1:
        raise ValueError("dawid_skene: iters must be >= 1")
    lab = labels.groupBy("item", "rater").agg(F.min("label").alias("label"))
    # reused every round on both sides of the EM — pin it once
    lab = lab.localCheckpoint(eager=False)
    classes = lab.select(F.col("label").alias("cls")).distinct()
    k = classes.count()  # driver scalar: label vocabulary size (schema-sized)
    items = lab.select("item").distinct()
    n_i = lab.groupBy("item").agg(F.count(F.lit(1)).alias("__n"))
    cnt = lab.groupBy("item", F.col("label").alias("cls")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    post = (
        items.join(F.broadcast(classes))
        .join(cnt, ["item", "cls"], "left")
        .join(n_i, "item")
        .select(
            "item",
            "cls",
            F.expr(f"coalesce(__c, 0) * CAST({scale} AS BIGINT) div __n")
            .alias("post_ppm"),
        )
    )
    for _ in range(int(iters)):
        tot = post.agg(F.sum("post_ppm").alias("__t"))
        prior = (
            post.groupBy("cls")
            .agg(F.sum("post_ppm").alias("__sp"))
            .crossJoin(F.broadcast(tot))
            .select(
                "cls",
                F.expr(f"CAST({scale} AS BIGINT) * __sp div greatest(__t, 1)")
                .alias("prior_ppm"),
            )
        )
        num = (
            lab.join(post, "item")
            .groupBy("rater", "cls", "label")
            .agg(F.sum("post_ppm").alias("__nx"))
        )
        den = num.groupBy("rater", "cls").agg(F.sum("__nx").alias("__dx"))
        conf = num.join(den, ["rater", "cls"]).select(
            "rater",
            "cls",
            "label",
            F.expr(
                f"CAST({scale} AS BIGINT) * (__nx + {int(pseudo_ppm)})"
                f" div (__dx + {k} * {int(pseudo_ppm)})"
            ).alias("conf_ppm"),
        )
        contrib = lab.join(conf, ["rater", "label"])
        folded = (
            contrib.groupBy("item", "cls")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("rater", "conf_ppm"))
                ).alias("__cs")
            )
            .join(F.broadcast(prior), "cls")
            .select(
                "item",
                "cls",
                F.expr(
                    "aggregate(transform(__cs, x -> x.conf_ppm), prior_ppm,"
                    f" (a, x) -> a * x div {scale})"
                ).alias("__acc"),
            )
        )
        tot_i = folded.groupBy("item").agg(F.sum("__acc").alias("__ti"))
        post = (
            folded.join(tot_i, "item")
            .join(F.broadcast(prior), "cls")
            .select(
                "item",
                "cls",
                F.when(
                    F.col("__ti") > 0,
                    F.expr(f"CAST({scale} AS BIGINT) * __acc div __ti"),
                )
                .otherwise(F.col("prior_ppm"))
                .cast("long")
                .alias("post_ppm"),
            )
        )
        # each round reads `post` on three paths (prior, num, normalize) —
        # without a checkpoint the plan doubles per EM round
        post = post.localCheckpoint(eager=False)
    return post


def ds_hard_labels(posteriors: DataFrame) -> DataFrame:
    """Argmax decision over `dawid_skene` posteriors → (item, label_hat,
    post_ppm); ties break on the smaller class (pinned). One
    map-side-combined item agg."""
    return posteriors.groupBy("item").agg(
        F.expr("min_by(cls, struct(-post_ppm, cls))").alias("label_hat"),
        F.max("post_ppm").alias("post_ppm"),
    )

def mad_outliers(
    df: DataFrame, group_col: str, val_col: str, k_mad: int = 3
) -> DataFrame:
    """Robust per-group outlier flags via median / median-absolute-
    deviation (the Hampel rule — the crawl-health screen that, unlike
    mean/stddev z-scores, one mega-outlier cannot poison: a host whose
    fetch sizes are normally ~40 KB keeps its median even when one
    response is 4 GB): a row is an outlier iff |x − med| > k·MAD.

    Exactness pinned engine-portable: med and MAD are the LOWER discrete
    median (the element at sorted position (n+1) div 2 — quantile_disc
    semantics, no interpolation, no floats), so integer in = integer
    out. The normal-consistency constant (1.4826) is deliberately NOT
    applied — the threshold is in raw MAD units, which is how Hampel
    filters are configured in practice. Degenerate guard: MAD = 0
    (≥ half the group identical) flags every x ≠ med — documented
    Hampel behavior on near-constant groups.

    Output: input rows + (med, mad), OUTLIER ROWS ONLY.

    Scale shape: two window row_number/count passes (each one shuffle on
    the group key) + two group-keyed hash joins stamping med/MAD back;
    no collects, no UDFs, reduce state is one row per group. The group
    key is the shuffle key — compose with skew_report first at 10^12
    rows."""
    def _lower_median(src: DataFrame, col: str, out: str) -> DataFrame:
        w = Window.partitionBy(group_col).orderBy(
            F.col(col).asc(), F.col(val_col).asc()
        )
        return (
            src.withColumn("__rn", F.row_number().over(w))
            .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(group_col)))
            .filter(F.col("__rn") == F.expr("(__n + 1) div 2"))
            .select(F.col(group_col), F.col(col).alias(out))
        )

    med = _lower_median(df, val_col, "med")
    dev = df.join(med, group_col).withColumn(
        "__adev", F.abs(F.col(val_col) - F.col("med"))
    )
    mad = _lower_median(dev, "__adev", "mad")
    return (
        dev.join(mad, group_col)
        .filter(F.col("__adev") > F.lit(k_mad) * F.col("mad"))
        .drop("__adev")
    )


#: Benford first-digit expected shares, ppm: floor(10^6 · log10(1 + 1/d)),
#: d = 1..9. Python-side constants, baked identically into Column exprs
#: and oracle SQL.
BENFORD_PPM = [301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757]


def benford_audit(
    df: DataFrame, group_col: str, val_col: str, min_n: int = 50
) -> DataFrame:
    """First-significant-digit Benford audit per group (Newcomb 1881 /
    Benford 1938; Nigrini's fraud-audit staple — organically generated
    magnitudes follow log-uniform leading digits, while fabricated,
    template, or default-filled values do not; in a KG-fusion pipeline
    this flags numeric predicates whose source made the numbers up).

    Statistic: total-variation distance from the Benford distribution,
    tvd_ppm = (Σ_d |10⁶·o_d div n − e_d|) div 2 over digits 1..9 with
    the baked e_d table — a bounded [0, 10⁶] distribution distance in
    pinned integer floors that CANNOT overflow at any group size below
    9·10¹² rows (a 10⁶-scaled chi-square, the classical choice, squares
    itself out of 64 bits by ~10⁵-row groups; TVD is the scale-safe
    statistic, and Nigrini's own MAD-of-digit-shares screen is the same
    family). Also reports share1_ppm (the headline Benford digit-1
    share, expected ≈ 301030) and the modal digit. Values without a
    nonzero digit (0, NULL) are excluded; groups with n < `min_n` drop
    (digit tests are meaningless on tiny n).

    Input contract (pinned by a cast, not just stated): `val_col` is
    INTEGER-valued — it is cast to long before the string conversion,
    because a float's decimal form can go scientific (1e10) and the
    regexp would silently pick the mantissa digit. Fractional values
    truncate toward zero under the cast (|v| < 1 → 0 → excluded);
    callers with float magnitudes should pre-scale to integers
    themselves so the truncation is a deliberate choice.

    Output (grp, n, tvd_ppm, share1_ppm, top_digit).

    Scale shape: first digit = scan-local regexp on the decimal form;
    ONE (group, digit) map-side-combined count collapsing to ≤ 9 rows
    per group, then a 9-row fold per group. Nothing else shuffles."""
    first = F.regexp_extract(
        F.abs(F.col(val_col).cast("long")).cast("string"), "[1-9]", 0
    )
    per = (
        df.select(F.col(group_col).alias("grp"), first.alias("d"))
        .filter(F.col("d") != "")
        .groupBy("grp", F.col("d").cast("int").alias("d"))
        .agg(F.count(F.lit(1)).alias("o"))
    )
    e_ppm = F.element_at(F.array(*[F.lit(v) for v in BENFORD_PPM]), F.col("d"))
    scored = (
        per.withColumn("__n", F.sum("o").over(Window.partitionBy("grp")))
        .withColumn("__e", e_ppm)
        .withColumn("__dev", F.abs(F.expr("1000000 * o div __n") - F.col("__e")))
    )
    folded = scored.groupBy("grp").agg(
        F.max("__n").cast("long").alias("n"),
        # present digits contribute |share−e|; absent digits contribute
        # their full e_d = table total − Σ present e_d
        (F.sum("__dev") + F.lit(sum(BENFORD_PPM)) - F.sum("__e")).alias("__tv"),
        F.coalesce(
            F.max(F.when(F.col("d") == 1, F.expr("1000000 * o div __n"))),
            F.lit(0),
        ).cast("long").alias("share1_ppm"),
        # modal digit, ties to the SMALLEST digit (pinned)
        F.max_by("d", F.struct(F.col("o").alias("o"), (-F.col("d")).alias("nd"))).cast("long").alias("top_digit"),
    )
    return (
        folded.filter(F.col("n") >= min_n)
        .select("grp", "n", F.expr("__tv div 2").cast("long").alias("tvd_ppm"),
                "share1_ppm", "top_digit")
    )


def pr_curve(scored: DataFrame) -> DataFrame:
    """Precision-recall threshold curve for a scored binary decision
    (the ER/linker/filter tuning artifact: at which score cut does the
    verifier keep enough true matches at acceptable precision): input
    (score BIGINT, is_true 0/1); for every DISTINCT score t, predict
    positive iff score ≥ t and report exact counts and pinned-integer
    rates —

        prec_ppm = 10⁶·tp div (tp+fp),  rec_ppm = 10⁶·tp div P,
        f1_ppm   = 2·prec·rec div (prec+rec)   (0 when degenerate)

    plus is_best on the max-F1 row (ties → HIGHEST threshold: the
    conservative cut). Output (thr, tp, fp, fn, prec_ppm, rec_ppm,
    f1_ppm, is_best).

    Scale shape: ONE (score)-keyed count agg (map-side combined), then
    cumulative windows over |distinct scores| rows — the curve is
    score-resolution-sized, not data-sized. No joins."""
    per = scored.groupBy(F.col("score").alias("thr")).agg(
        F.sum(F.col("is_true").cast("long")).alias("t"),
        F.sum(F.lit(1) - F.col("is_true").cast("long")).alias("f"),
    )
    w = Window.orderBy(F.col("thr").desc()).rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy(F.lit(1))
    curve = per.select(
        "thr",
        F.sum("t").over(w).cast("long").alias("tp"),
        F.sum("f").over(w).cast("long").alias("fp"),
        (F.sum("t").over(tot) - F.sum("t").over(w)).cast("long").alias("fn"),
    ).withColumn(
        "prec_ppm", F.expr("1000000 * tp div (tp + fp)").cast("long")
    ).withColumn(
        "rec_ppm",
        F.when(F.col("tp") + F.col("fn") > 0, F.expr("1000000 * tp div (tp + fn)"))
        .otherwise(0).cast("long"),
    ).withColumn(
        "f1_ppm",
        F.when(
            F.col("prec_ppm") + F.col("rec_ppm") > 0,
            F.expr("2 * prec_ppm * rec_ppm div (prec_ppm + rec_ppm)"),
        ).otherwise(0).cast("long"),
    )
    wb = Window.orderBy(F.col("f1_ppm").desc(), F.col("thr").desc())
    return (
        curve.withColumn("__rb", F.row_number().over(wb))
        .withColumn("is_best", (F.col("__rb") == 1).cast("int"))
        .drop("__rb")
    )


def gini_ppm(df: DataFrame, group_col: str, val_col: str) -> DataFrame:
    """Gini concentration coefficient per group, exact integer ppm (the
    corpus-mix diversity number on a dataset card: how concentrated are
    tokens/documents across hosts or sources — 0 = perfectly even,
    →10⁶ = one source dominates; the scalar companion to skew_report's
    top-k table): over a group's non-negative values x_1 ≤ … ≤ x_n,

        gini_ppm = 10⁶·(2·Σ i·x_i − (n+1)·S) div (n·S)   (S = Σx)

    — the classic sorted-cumulative identity, every step a pinned
    integer (ties in x ordered by value only: i·x_i sums are invariant
    under tie permutation, so the rank tie-break cannot change the
    result). Groups with S = 0 report NULL (undefined share split).

    Magnitude: Σ i·x_i ≤ n·S must fit 64 bits — n·S < 9·10¹⁸ covers
    e.g. 10⁹ rows of values up to 10⁹·…; beyond that pre-aggregate
    values per entity first (the normal shape: entity totals, not raw
    events). Scale: ONE rank window + one fold per group."""
    w = Window.partitionBy(group_col).orderBy(F.col(val_col).asc())
    ranked = df.select(group_col, val_col).withColumn(
        "__i", F.row_number().over(w)
    )
    return (
        ranked.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(val_col).cast("long").alias("s"),
            F.sum(F.col("__i") * F.col(val_col)).cast("long").alias("ws"),
        )
        .select(
            F.col(group_col),
            "n", "s",
            F.when(
                F.col("s") > 0,
                F.expr("1000000 * (2 * ws - (n + 1) * s) div (n * s)"),
            ).cast("long").alias("gini_ppm"),
        )
    )


#: Poisson(1) inverse-CDF thresholds on a 2^30 uniform: cumulative
#: e^{-1}/k! for k = 0..8 (tail mass beyond 8 is ~1e-9, folded into 8).
#: Python-side constants, baked identically into Column exprs and SQL.
def _poisson1_thresholds() -> list:
    import math

    acc, out = 0.0, []
    for k in range(9):
        acc += math.exp(-1.0) / math.factorial(k)
        out.append((min(1 << 30, round((1 << 30) * acc)), k))
    out[-1] = (1 << 30, 8)
    return out


def poisson_bootstrap(
    df: DataFrame,
    id_col: str,
    val_col: str,
    replicates: int = 64,
    seed: str = "boot1",
) -> DataFrame:
    """Poisson bootstrap for a corpus mean — THE distributed bootstrap
    (Chamandy et al., Google 2012 "Estimating uncertainty for massive
    data streams"; Kleiner's BLB is its blocked cousin): classical
    resampling needs n draws over n rows per replicate (a shuffle per
    replicate); the Poisson trick gives each row an independent
    Poisson(1) weight per replicate, so ALL B replicates ride ONE scan
    — Binomial(n, 1/n) → Poisson(1) as n grows.

    Weights are deterministic: uniform = md5(seed:replicate:id) folded
    to 2^30, fed through the baked Poisson(1) inverse-CDF table (k ≤ 8,
    tail mass ~1e-9 folded — stated). Per replicate b: mean_b_ppm =
    10⁶·Σ w·x div Σ w (NULL-guarded empty resample). Output one row per
    replicate (b, n_eff, mean_ppm) — callers take quantiles of the B
    means for the CI (exact_quantiles composes; the suite oracle
    checks the whole replicate table, which subsumes any CI readout).

    Scale: the explode is B rows per input row BUT carries only (b,
    w·x, w) into a map-side-combined agg — shuffle volume is B
    partial-sum rows per task, not B×n."""
    thresholds = _poisson1_thresholds()
    b = F.explode(F.sequence(F.lit(0), F.lit(replicates - 1))).alias("b")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(seed), F.col("b"), F.col(id_col))), 1, 8
            ),
            16, 10,
        ).cast("long")
        % (1 << 30)
    )
    wexpr = None
    for upper, k in thresholds:
        cond = F.col("__u") < upper
        wexpr = F.when(cond, k) if wexpr is None else wexpr.when(cond, k)
    return (
        df.select(F.col(id_col), F.col(val_col), b)
        .withColumn("__u", u)
        .withColumn("__w", wexpr)
        .groupBy("b")
        .agg(
            F.sum("__w").cast("long").alias("n_eff"),
            F.sum(F.col("__w") * F.col(val_col)).cast("long").alias("__wx"),
        )
        .select(
            "b", "n_eff",
            F.when(F.col("n_eff") > 0, F.expr("1000000 * __wx div n_eff"))
            .cast("long").alias("mean_ppm"),
        )
    )


def auc_exact(scored: DataFrame) -> DataFrame:
    """Exact ROC-AUC via the Mann-Whitney U rank identity (the
    threshold-free companion to pr_curve: AUC = P(score⁺ > score⁻) +
    ½P(score⁺ = score⁻), which is the probability a random true pair
    outranks a random false pair — the ranking quality number for a
    linker/filter/scorer): with average ranks for ties kept integral by
    DOUBLING (a tie block spanning ranks [f, l] gives every member
    2·rank = f + l),

        auc_ppm = 10⁶·(Σ 2r⁺ − P(P+1)) div (2·P·N)

    — every step a pinned 64-bit integer (Σ2r ≤ 2n², n < 2·10⁹ rows
    before overflow). Output ONE row (n_pos, n_neg, auc_ppm); NULL when
    either class is empty.

    Scale shape: ONE score-keyed count agg, cumulative windows over the
    distinct-score curve, a 1-row fold — no joins, the same shape as
    pr_curve."""
    per = scored.groupBy(F.col("score").alias("s")).agg(
        F.sum(F.col("is_true").cast("long")).alias("p"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    w = Window.orderBy(F.col("s").asc()).rowsBetween(Window.unboundedPreceding, -1)
    # tie block at score s spans ranks [before+1, before+c] → 2·avgrank
    # = 2·before + c + 1 for every member
    cur = per.withColumn("before", F.coalesce(F.sum("c").over(w), F.lit(0)))
    fold = cur.agg(
        F.sum("p").cast("long").alias("n_pos"),
        (F.sum("c") - F.sum("p")).cast("long").alias("n_neg"),
        F.sum(F.col("p") * (2 * F.col("before") + F.col("c") + 1)).cast("long").alias("r2"),
    )
    return fold.select(
        "n_pos", "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.expr("1000000 * (r2 - n_pos * (n_pos + 1)) div (2 * n_pos * n_neg)"),
        ).cast("long").alias("auc_ppm"),
    )


def ks_drift(a: DataFrame, b: DataFrame, val_col: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D statistic, exact integer ppm (the
    distribution-drift alarm between corpus snapshots/sources — has the
    length/quality/score distribution MOVED, without binning choices):

        d_ppm = max over values v of |10⁶·F_a(v) − 10⁶·F_b(v)|

    with F the empirical CDF at v (≤ v), both scaled by pinned integer
    floors. Output ONE row (n_a, n_b, d_ppm, at_value) — at_value is
    the SMALLEST value attaining the max (pinned). The classical
    critical value c(α)·√((n_a+n_b)/(n_a·n_b)) is the caller's cut;
    this reports the statistic.

    Empty-side contract (pinned, not an accident of NULL propagation):
    KS needs two non-empty samples — if either side has no rows,
    d_ppm and at_value are NULL by explicit guard (cat_drift's na/nb
    guard, krippendorff's de_num rule) while n_a/n_b still report, so
    the caller can tell "no drift" from "nothing to compare".

    Scale shape: one tagged union scan → ONE value-keyed count agg →
    cumulative windows over the distinct-value table → a 1-row argmax
    fold. No joins, no sorts beyond the value-resolution curve."""
    tagged = a.select(F.col(val_col).alias("v"), F.lit(1).alias("sa")).unionByName(
        b.select(F.col(val_col).alias("v"), F.lit(0).alias("sa"))
    )
    per = tagged.groupBy("v").agg(
        F.sum("sa").cast("long").alias("ca"),
        F.sum(F.lit(1) - F.col("sa")).cast("long").alias("cb"),
    )
    w = Window.orderBy(F.col("v").asc()).rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy(F.lit(1))
    cur = (
        per.withColumn("fa", F.sum("ca").over(w))
        .withColumn("fb", F.sum("cb").over(w))
        .withColumn("na", F.sum("ca").over(tot))
        .withColumn("nb", F.sum("cb").over(tot))
        .withColumn(
            "d",
            F.when(
                (F.col("na") > 0) & (F.col("nb") > 0),
                F.abs(F.expr("1000000 * fa div na") - F.expr("1000000 * fb div nb")),
            ),
        )
    )
    pick = F.max_by(
        F.struct(F.col("d").alias("d"), F.col("v").alias("v")),
        F.struct(F.col("d").alias("d"), (-F.col("v")).alias("nv")),
    )
    return cur.agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        pick.alias("__p"),
    ).select(
        "n_a", "n_b",
        F.col("__p.d").cast("long").alias("d_ppm"),
        # empty-side guard: max_by's tiebreak still picks a row when every
        # d is NULL, so gate at_value on d_ppm being defined (the
        # docstring's "both NULL" contract — ADVICE r4)
        F.when(F.col("__p.d").isNotNull(), F.col("__p.v")).cast("long").alias("at_value"),
    )


def lag_corr(
    df: DataFrame, group_col: str, t_col: str, val_col: str, lag: int
) -> DataFrame:
    """Lag-k autocorrelation sufficient statistics per series, exact
    integers (crawl/traffic seasonality: a weekly cycle shows as high
    lag-7 correlation of daily volumes): pairs (x_t, x_{t+k}) via ONE
    self-join on the shifted time key, then

        ncov = n·Σxy − Σx·Σy,   vx = n·Σx² − (Σx)²,  vy likewise,
        r2_ppm = 10⁶·ncov² div (vx·vy)   (sign(ncov) reported — r² alone
                                          hides direction)

    all pinned 64-bit integers. Magnitude bound (stated, the changepoint
    rule): ncov² must fit 64 bits — |x| ≤ ~10³ over ≤ ~10³ steps at
    lag ≪ n; rescale inputs beyond that rather than silently widening.
    Degenerate guard: vx·vy = 0 (a constant side) → r2_ppm NULL.

    Output per group: (group, lag, n, ncov, r2_ppm, sign).

    Scale shape: one equi self-join on (group, t+k) — hash, the shifted
    key is computed scan-side — and one map-side-combined fold."""
    a = df.select(
        F.col(group_col).alias("g"), F.col(t_col).alias("t"), F.col(val_col).alias("x")
    )
    b = df.select(
        F.col(group_col).alias("g"),
        (F.col(t_col) - lag).alias("t"),
        F.col(val_col).alias("y"),
    )
    j = a.join(b, ["g", "t"])
    fold = j.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    return fold.select(
        F.col("g"), F.lit(lag).cast("int").alias("lag"), "n",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("ncov"),
        F.when(
            (F.expr("n * sxx - sx * sx") > 0) & (F.expr("n * syy - sy * sy") > 0),
            F.expr(
                "1000000 * (n * sxy - sx * sy) * (n * sxy - sx * sy)"
                " div ((n * sxx - sx * sx) * (n * syy - sy * sy))"
            ),
        ).cast("long").alias("r2_ppm"),
        F.signum(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("int").alias("sign"),
    )


def winsorize(
    df: DataFrame,
    group_col: str,
    id_col: str,
    val_col: str,
    lo_ppm: int = 10_000,
    hi_ppm: int = 990_000,
) -> DataFrame:
    """Per-group winsorization at exact discrete quantiles (the score-
    clipping step before averaging quality signals or fusing numeric
    claims — one absurd value must not drag a host's mean; the
    REPAIRING counterpart to mad_outliers' flags): cap values outside
    [Q(lo), Q(hi)] where Q(q) is the value at sorted rank
    max(1, ceil(q·n)) — the pinned discrete quantile, no interpolation,
    integer in = integer out (the mad_outliers/exact_quantiles family
    rule).

    Output: the CAPPED rows only — (group, id, v, vlo, vhi, v_capped);
    untouched rows don't travel (the caller patches by id, the
    suppression_plan convention).

    Scale shape: one rank window on the group key (exchange reused by
    the quantile pick), one bounds join back (hash, group-keyed), one
    filter. No collects, no UDFs."""
    w = Window.partitionBy(group_col).orderBy(F.col(val_col).asc(), F.col(id_col).asc())
    ranked = df.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(group_col))
    )
    def _qrank(q_ppm: int):
        # ceil(q·n/10⁶) as (q·n + 10⁶−1) div 10⁶. Spark `div` and DuckDB
        # `//` BOTH truncate toward zero on integers (verified: −7 div 2
        # = −3 on both engines), and the formula is additionally
        # floor-safe because the operands are non-negative — so this
        # add-then-divide ceil is portable either way, while a
        # negation-based ceil trick would depend on the rounding mode
        return F.greatest(F.lit(1), F.expr(f"({q_ppm} * __n + 999999) div 1000000"))

    bounds = (
        ranked.filter(
            (F.col("__rn") == _qrank(lo_ppm)) | (F.col("__rn") == _qrank(hi_ppm))
        )
        .groupBy(group_col)
        .agg(
            F.min(F.when(F.col("__rn") == _qrank(lo_ppm), F.col(val_col))).alias("vlo"),
            F.max(F.when(F.col("__rn") == _qrank(hi_ppm), F.col(val_col))).alias("vhi"),
        )
    )
    out = df.join(bounds, group_col)
    capped = F.least(F.greatest(F.col(val_col), F.col("vlo")), F.col("vhi"))
    return (
        out.filter((F.col(val_col) < F.col("vlo")) | (F.col(val_col) > F.col("vhi")))
        .select(
            F.col(group_col), F.col(id_col), F.col(val_col),
            F.col("vlo").cast("long").alias("vlo"),
            F.col("vhi").cast("long").alias("vhi"),
            capped.cast("long").alias("v_capped"),
        )
    )


def cat_drift(a: DataFrame, b: DataFrame, cat_col: str) -> DataFrame:
    """Categorical distribution drift between two snapshots/sources (the
    ks_drift companion for discrete columns — has the language/source/
    license MIX moved): total-variation distance in pinned integer ppm,

        tvd_ppm = (Σ_c |10⁶·c_a(c) div n_a − 10⁶·c_b(c) div n_b|) div 2

    over the union of categories (one-sided categories contribute their
    full share — the benford_audit absent-mass rule). Output ONE row
    (n_a, n_b, n_cats, tvd_ppm, top_mover, top_dev_ppm) with top_mover
    the largest-deviation category (ties → lexicographically smallest,
    pinned).

    Scale shape: tagged union scan → ONE category-keyed count agg →
    a |categories|-row fold. No joins."""
    tagged = a.select(F.col(cat_col).alias("c"), F.lit(1).alias("sa")).unionByName(
        b.select(F.col(cat_col).alias("c"), F.lit(0).alias("sa"))
    )
    per = tagged.groupBy("c").agg(
        F.sum("sa").cast("long").alias("ca"),
        F.sum(F.lit(1) - F.col("sa")).cast("long").alias("cb"),
    )
    tot = Window.partitionBy(F.lit(1))
    dev = per.withColumn("na", F.sum("ca").over(tot)).withColumn(
        "nb", F.sum("cb").over(tot)
    ).withColumn(
        "d",
        F.abs(
            F.when(F.col("na") > 0, F.expr("1000000 * ca div na")).otherwise(0)
            - F.when(F.col("nb") > 0, F.expr("1000000 * cb div nb")).otherwise(0)
        ),
    )
    pick = F.min_by("c", F.struct((-F.col("d")).alias("nd"), F.col("c").alias("c")))
    return dev.agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        F.count(F.lit(1)).cast("long").alias("n_cats"),
        F.expr("sum(d) div 2").cast("long").alias("tvd_ppm"),
        pick.alias("top_mover"),
        F.max(F.struct(F.col("d").alias("d"), F.col("c"))).getField("d").cast("long").alias("top_dev_ppm"),
    )


def fleiss_kappa(ratings: DataFrame, item_col: str = "item", cat_col: str = "cat") -> DataFrame:
    """Fleiss' kappa for N items each rated by the SAME number n of
    raters into categories (Fleiss 1971) — the multi-rater completion of
    this module's agreement family (cohen_kappa: 2 raters;
    krippendorff_alpha: missing-data general case; dawid_skene:
    per-rater reliability). Input: one row per rating (item, cat).

        P̄_o = Σ_i Σ_j n_ij(n_ij−1) / (N·n·(n−1))
        P̄_e = Σ_j C_j²            / (N·n)²
        κ   = (P̄_o − P̄_e) / (1 − P̄_e)

    Everything is a ratio of BIGINT sums, so κ is the exact rational
    (Po_n·Pe_d − Pe_n·Po_d) / (Po_d·(Pe_d − Pe_n)) reported as the
    sign-split integer kappa_ppm (both division dialects agree) — no
    floats, value-oracled cross-engine. Output: ONE row
    (n_items, n_raters, kappa_ppm); kappa_ppm NULL when P̄_e = 1 (all
    raters always in one category — κ undefined).

    Raises ValueError if items have unequal rating counts (Fleiss
    requires a balanced design; use krippendorff_alpha for missing
    data). Magnitude bound (stated): 10⁶·Po_n·Pe_d must fit 64 bits —
    fine through N·n ~ 10⁶ ratings; beyond that rescale to per-shard
    kappas.

    Scale shape: one (item, cat) map-side-combined count, one slim
    category rollup, 1-row broadcast totals — no joins over the raw
    ratings."""
    cell = ratings.groupBy(
        F.col(item_col).alias("__i"), F.col(cat_col).alias("__c")
    ).agg(F.count(F.lit(1)).alias("nij"))
    per_item = cell.groupBy("__i").agg(
        F.sum("nij").alias("ni"), F.sum(F.col("nij") * (F.col("nij") - 1)).alias("po_i")
    )
    distinct_n = per_item.select("ni").distinct().limit(2).collect()
    if len(distinct_n) != 1:
        raise ValueError("fleiss_kappa: items have unequal rating counts")
    n_raters = distinct_n[0]["ni"]
    cat_tot = cell.groupBy("__c").agg(F.sum("nij").alias("cj"))
    tot = per_item.agg(
        F.count(F.lit(1)).alias("n_items"), F.sum("po_i").alias("po_n")
    ).crossJoin(F.broadcast(cat_tot.agg(F.sum(F.col("cj") * F.col("cj")).alias("pe_n"))))
    n = int(n_raters)
    sdiv = (
        "CASE WHEN ({a}) < 0 THEN -((-({a})) div ({b})) ELSE ({a}) div ({b}) END"
    )
    num = f"(po_n * pe_d - pe_n * po_d)"
    den = f"(po_d * (pe_d - pe_n))"
    dec = "DECIMAL(38,0)"
    return (
        tot.withColumn("po_d", (F.col("n_items") * n * (n - 1)).cast("long"))
        .withColumn("pe_d", (F.col("n_items") * n * F.col("n_items") * n).cast("long"))
        .withColumn("__num", F.expr(f"CAST(po_n AS {dec}) * pe_d - CAST(pe_n AS {dec}) * po_d"))
        .withColumn("__den", F.expr(f"CAST(po_d AS {dec}) * (pe_d - pe_n)"))
        .select(
            F.col("n_items").cast("long").alias("n_items"),
            F.lit(n).cast("long").alias("n_raters"),
            F.expr(
                "CASE WHEN pe_d = pe_n THEN NULL ELSE "
                + sdiv.format(a=f"CAST(1000000 AS {dec}) * __num", b="__den")
                + " END"
            ).cast("long").alias("kappa_ppm"),
        )
    )
