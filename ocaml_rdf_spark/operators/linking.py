"""Entity linking: mention detection → candidate URIs → top-1 selection.

North rule (BASELINE.json:14): "Entity linking scores candidate URIs via
an alias dictionary broadcast join plus MinHash-LSH blocking". Not in the
reference (ocaml-rdf stores triples; it does not mint them from text) —
this stage produces the (mention → KB IRI) links that become
`urn:p:mentions` triples.

Scale design:
- mention detection is pure built-ins: explode word n-grams (n ≤ 3) of
  capitalized token runs — no Python in the hot path;
- the alias dictionary (≤ a few GB) is a **broadcast join**: no shuffle
  of the 100 TB mention side;
- fuzzy matching blocks candidates with **MinHash-LSH over character
  3-grams** (pyspark.ml, seeded) so near-miss spellings meet their alias
  without an O(M×A) distance join;
- top-1 per mention via a window over (score, uri) — deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def detect_mentions(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_n: int = 3) -> DataFrame:
    """Candidate mentions: runs of Capitalized tokens, emitted as 1..max_n
    word n-grams → (id, mention, norm). Vectorized: split/explode only."""
    # materialized word array: the gram lambda below would otherwise
    # re-split the text once per token (O(len²) — the tfidf_pairs lesson)
    docs = docs.withColumn("__toks", F.split(F.trim(F.col(text_col)), r"\s+"))
    toks = F.col("__toks")
    out = None
    for n in range(1, max_n + 1):
        idx = F.when(F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))).otherwise(
            F.array().cast("array<int>")
        )
        grams = docs.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.filter(
                    F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
                    # every word of the gram starts with an uppercase letter
                    lambda g: g.rlike(r"^([A-Z][A-Za-z0-9&._-]*)( [A-Z][A-Za-z0-9&._-]*)*$"),
                )
            ).alias("mention"),
        )
        out = grams if out is None else out.unionByName(grams)
    return out.withColumn("norm", F.lower(F.regexp_replace("mention", r"[^A-Za-z0-9 ]", ""))).distinct()


def link_exact(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """Exact alias match: broadcast join on the normalized surface form,
    then keep the best-prior URI per (id, mention). aliases(alias, uri,
    prior) → (id, mention, uri, score_x1e6)."""
    adf = aliases.select(
        F.lower(F.regexp_replace("alias", r"[^A-Za-z0-9 ]", "")).alias("norm"),
        "uri",
        F.round(F.col("prior") * 1e6).cast("long").alias("score_x1e6"),
    )
    cand = mentions.join(F.broadcast(adf), "norm")
    w = Window.partitionBy("id", "mention").orderBy(F.desc("score_x1e6"), F.asc("uri"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", "mention", "uri", "score_x1e6")
    )


def link_fuzzy(
    mentions: DataFrame,
    aliases: DataFrame,
    threshold: float = 0.5,
    num_hash_tables: int = 5,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH blocking over character 3-grams: approxSimilarityJoin
    (mentions × aliases) under Jaccard distance < threshold, scored by
    prior × (1 - distance), top-1 per mention.

    → (id, mention, uri, score_x1e6). Seeded; requires pyspark.ml (no
    external deps). The LSH index side (aliases) is small; the mention
    side streams through the hash without a full shuffle of text."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH, NGram, RegexTokenizer

    def featurize(df: DataFrame, col: str, cv_model=None):
        tok = RegexTokenizer(inputCol=col, outputCol="__ch", pattern=".", gaps=False)
        ng = NGram(n=3, inputCol="__ch", outputCol="__ng")
        out = ng.transform(tok.transform(df)).filter(F.size("__ng") > 0)
        if cv_model is None:
            cv = CountVectorizer(inputCol="__ng", outputCol="features", binary=True)
            cv_model = cv.fit(out)
        else:
            # MinHashLSH rejects all-zero vectors: keep only rows sharing
            # ≥1 char-3-gram with the alias vocabulary (probe side only).
            vocab = list(cv_model.vocabulary)
            out = out.filter(F.arrays_overlap(F.col("__ng"), F.lit(vocab)))
        return cv_model.transform(out).drop("__ch", "__ng"), cv_model

    adf = aliases.select(
        F.lower(F.regexp_replace("alias", r"[^A-Za-z0-9 ]", "")).alias("key"),
        "uri",
        F.round(F.col("prior") * 1e6).cast("long").alias("prior_x1e6"),
    ).dropDuplicates(["key", "uri"])
    mdf = mentions.select("id", "mention", F.col("norm").alias("key")).dropDuplicates()

    a_feat, cv_model = featurize(adf, "key")
    m_feat, _ = featurize(mdf, "key", cv_model)

    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed)
    model = lsh.fit(a_feat)
    joined = model.approxSimilarityJoin(m_feat, a_feat, threshold, distCol="jdist")
    scored = joined.select(
        F.col("datasetA.id").alias("id"),
        F.col("datasetA.mention").alias("mention"),
        F.col("datasetB.uri").alias("uri"),
        F.round(F.col("datasetB.prior_x1e6") * (1.0 - F.col("jdist"))).cast("long").alias("score_x1e6"),
    )
    w = Window.partitionBy("id", "mention").orderBy(F.desc("score_x1e6"), F.asc("uri"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")


def link_edit(mentions: DataFrame, aliases: DataFrame, max_dist: int = 2) -> DataFrame:
    """Edit-distance verify tier (between `link_exact` and `link_fuzzy` in
    the cascade): candidates blocked by shared first character + length
    band |len(m) − len(a)| ≤ max_dist, verified with exact Levenshtein ≤
    max_dist, scored prior − dist·0.1 (integer ×1e6), top-1 per mention.

    Scale: the alias dictionary is a **broadcast** (like link_exact), so
    blocking predicates prune inside the broadcast hash join — the 100 TB
    mention side never shuffles, and Levenshtein runs JVM-side
    (`F.levenshtein`, codegen) only on band-blocked pairs. Integer-exact
    score ⇒ exact cross-engine oracle (DuckDB `levenshtein`).

    → (id, mention, uri, dist, score_x1e6)."""
    adf = aliases.select(
        F.lower(F.regexp_replace("alias", r"[^A-Za-z0-9 ]", "")).alias("a_norm"),
        "uri",
        F.round(F.col("prior") * 1e6).cast("long").alias("prior_x1e6"),
    ).dropDuplicates(["a_norm", "uri"])
    cand = (
        mentions.join(
            F.broadcast(adf),
            (F.substring("norm", 1, 1) == F.substring("a_norm", 1, 1))
            & (F.abs(F.length("norm") - F.length("a_norm")) <= max_dist),
        )
        .withColumn("dist", F.levenshtein("norm", "a_norm"))
        .filter(F.col("dist") <= max_dist)
    )
    w = Window.partitionBy("id", "mention").orderBy(F.desc("score_x1e6"), F.asc("uri"))
    return (
        cand.select(
            "id",
            "mention",
            "uri",
            "dist",
            (F.col("prior_x1e6") - F.col("dist").cast("long") * 100000).alias("score_x1e6"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def links_to_triples(links: DataFrame, graph: str = "urn:g:links") -> DataFrame:
    """(id, mention, uri, …) → TRIPLES rows `<doc id> urn:p:mentions <uri>`
    with the surface form as a reified label triple."""
    from ..types import XSD_STRING

    doc_iri = F.concat(F.lit("urn:doc:"), F.col("id"))
    a = links.select(
        F.lit(0).cast("tinyint").alias("s_kind"),
        doc_iri.alias("s_lex"),
        F.lit("urn:p:mentions").alias("pred"),
        F.lit(0).cast("tinyint").alias("o_kind"),
        F.col("uri").alias("o_lex"),
        F.lit(None).cast("string").alias("o_dtype"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit(graph).alias("graph"),
        F.lit(None).cast("string").alias("src_url"),
        F.lit("linker").alias("extractor"),
        F.lit(None).cast("int").alias("part_id"),
    )
    b = links.select(
        F.lit(0).cast("tinyint").alias("s_kind"),
        F.col("uri").alias("s_lex"),
        F.lit("urn:p:surfaceForm").alias("pred"),
        F.lit(2).cast("tinyint").alias("o_kind"),
        F.col("mention").alias("o_lex"),
        F.lit(XSD_STRING).cast("string").alias("o_dtype"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit(graph).alias("graph"),
        F.lit(None).cast("string").alias("src_url"),
        F.lit("linker").alias("extractor"),
        F.lit(None).cast("int").alias("part_id"),
    )
    return a.unionByName(b).dropDuplicates(["s_kind", "s_lex", "pred", "o_kind", "o_lex", "o_dtype", "o_lang", "graph"])


def linkpred_scores(
    edges: DataFrame, max_degree: int = 1000, scale: int = 1_000_000
) -> DataFrame:
    """Link-prediction candidate scoring over an undirected (src, dst)
    graph: for every unordered non-adjacent pair (a < b) sharing at
    least one neighbor, emit (a, b, cn, ra) where cn = the common-
    neighbor count and ra = the resource-allocation index Σ_z ⌊scale /
    deg(z)⌋ over common neighbors z (Zhou, Lü & Zhang 2009) — RA is the
    integer-exact stand-in for Adamic-Adar (whose 1/log deg weights are
    fp and can't value-hash cross-engine). In the KG this scores missing
    sameAs/relatedTo candidates between entities that share context.

    Scale: pairs are generated AT the shared neighbor (wedge join — two
    hash equi-joins on the center), never by an all-pairs product.
    Degrees are one map-side-combined agg. Centers with deg >
    `max_degree` are dropped BEFORE the wedge join: a mega-hub center
    generates deg² wedge rows while contributing ≤ scale/max_degree ≈ 0
    per pair, so the cap removes the quadratic term and an O(1/deg)
    signal tail together — the standard guard (same shape as the LSH
    mega-bucket cap in textops). Direct edges are removed with ONE hash
    anti join at the end."""
    e = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    # full-graph degrees (the RA weight uses the TRUE degree, capped or not)
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    adj = e.select(F.col("a").alias("z"), F.col("b").alias("x")).unionByName(
        e.select(F.col("b").alias("z"), F.col("a").alias("x"))
    )
    centers = deg.filter(F.col("deg") <= max_degree).select(
        F.col("node").alias("z"), F.expr(f"CAST({scale} AS BIGINT) div deg").alias("w")
    )
    cadj = adj.join(centers, "z")
    wedges = (
        cadj.select("z", "w", F.col("x").alias("a"))
        .join(cadj.select("z", F.col("x").alias("b")), "z")
        .filter(F.col("a") < F.col("b"))
    )
    scored = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("cn"), F.sum("w").alias("ra")
    )
    return scored.join(e, ["a", "b"], "left_anti")


def mine_aliases(
    quads: DataFrame,
    label_preds: list | None = None,
    scale: int = 1_000_000,
) -> DataFrame:
    """Alias-dictionary CONSTRUCTION — the upstream producer of the
    (alias, uri, prior) table `link_exact` broadcasts. A web-scale KG
    mines surface forms from the graph's own label assertions
    (rdfs:label / skos:altLabel / name predicates): every label literal
    becomes an alias of its subject, normalized the same way
    `detect_mentions` normalizes mentions, with an INTEGER prior
    `n * scale div total` (exact, engine-portable — no float division).

    Output: (alias, uri, n_assertions, n_entities, prior_ppm) — one row
    per (alias, entity); `n_entities` > 1 flags ambiguous aliases
    ('UNITED' → UNITED STATES + UNITED KINGDOM) whose prior splits by
    assertion mass.

    Scale shape: one filter + two shuffles — a map-side-combined
    groupBy on (alias, uri), then an alias-keyed window whose per-key
    group is the ambiguity fan-out (single digits for real label data;
    a spam alias asserted for millions of entities is exactly what the
    n_entities column exists to catch and cap upstream).
    """
    preds = label_preds or ["urn:p:name"]
    labels = quads.filter(
        F.col("pred").isin(list(preds)) & (F.col("o_kind") == 2)
    ).select(
        F.lower(F.regexp_replace("o_lex", r"[^A-Za-z0-9 ]", "")).alias("alias"),
        F.col("s_lex").alias("uri"),
    )
    counts = labels.groupBy("alias", "uri").agg(F.count(F.lit(1)).alias("n_assertions"))
    w = Window.partitionBy("alias")
    return (
        counts.withColumn("__tot", F.sum("n_assertions").over(w))
        .withColumn("n_entities", F.count(F.lit(1)).over(w))
        .select(
            "alias",
            "uri",
            "n_assertions",
            "n_entities",
            F.expr(f"n_assertions * {int(scale)} div __tot").alias("prior_ppm"),
        )
    )


def blocking_metrics(
    cand: DataFrame,
    truth: DataFrame,
    n_items: int,
    a: str = "doc_a",
    b: str = "doc_b",
) -> DataFrame:
    """Blocking-quality report for an ER/dedup blocker (the two standard
    record-linkage metrics, Christen 2012): pairs completeness (recall —
    what fraction of TRUE matching pairs the blocker's candidate set
    retains) and reduction ratio (what fraction of the O(N²) comparison
    space it prunes). One row:

      n_cand, n_truth, n_matched,
      recall_ppm    = n_matched · 10⁶ div n_truth   (NULL if no truth)
      n_possible    = n_items·(n_items−1)/2
      reduction_ppm = 10⁶ − n_cand · 10⁶ div n_possible

    Pairs are canonicalized unordered (least, greatest), so either input
    may arrive in any orientation. Integer ppm — exact cross-engine.
    Scale: one pair-keyed semi-join + three metadata-sized counts; the
    1-row × 1-row cross joins are intentional (ann_cosine's pattern)."""
    c = cand.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b")).distinct()
    t = truth.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b")).distinct()
    nm = t.join(c, ["a", "b"], "left_semi").agg(F.count(F.lit(1)).alias("n_matched"))
    nc = c.agg(F.count(F.lit(1)).alias("n_cand"))
    nt = t.agg(F.count(F.lit(1)).alias("n_truth"))
    n_poss = int(n_items) * (int(n_items) - 1) // 2
    return (
        nc.crossJoin(nt)
        .crossJoin(nm)
        .select(
            "n_cand",
            "n_truth",
            "n_matched",
            F.expr(
                "CASE WHEN n_truth = 0 THEN NULL"
                " ELSE n_matched * 1000000 div n_truth END"
            ).alias("recall_ppm"),
            F.lit(n_poss).cast("long").alias("n_possible"),
            (F.lit(1000000) - F.expr(f"n_cand * 1000000 div {n_poss}"))
            .cast("long")
            .alias("reduction_ppm"),
        )
    )


def snm_positions(df: DataFrame, order_cols: list, buckets: int = 32) -> DataFrame:
    """Global 0-based position of every row under the total order
    `order_cols` — the distributed sort-rank SNM needs. Two-stage:
    range-repartition on the order columns (order-ALIGNED buckets),
    per-bucket counts get a driver-small cumulative scan broadcast back,
    position = bucket offset + intra-bucket rank. The VALUE depends only
    on the total order, not on where the sampled range bounds land, so
    results are deterministic at any parallelism. Ties broken by the
    full order_cols list — pass a unique trailing column."""
    from pyspark.sql import Window

    part = df.repartitionByRange(buckets, *[F.col(c) for c in order_cols]).withColumn(
        "__pid", F.spark_partition_id()
    )
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__c"))
    boff = counts.select(
        "__pid",
        F.coalesce(
            F.sum("__c").over(
                Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long").alias("__boff"),
    )
    rank = F.row_number().over(
        Window.partitionBy("__pid").orderBy(*[F.col(c).asc() for c in order_cols])
    ) - 1
    return part.join(F.broadcast(boff), "__pid").withColumn(
        "pos", (F.col("__boff") + rank).cast("long")
    ).drop("__pid", "__boff")


def snm_pairs(
    records: DataFrame,
    key_col: str,
    id_col: str,
    window: int = 3,
    buckets: int = 32,
) -> DataFrame:
    """Sorted-Neighborhood blocking (Hernández & Stolfo 1995 — the
    classic ER blocker next to LSH): sort by a fuzzy key, emit every
    pair within `window` positions. Complements minhash_candidates
    (blocking_metrics compares them): SNM catches prefix-typo neighbors
    LSH's set semantics can miss, at a guaranteed
    |records|·(window−1) candidate bound.

    Output: (id_a, id_b, dist) with id_a's position < id_b's.

    Scale shape: global positions via `snm_positions` (no single-reducer
    window), then the band trick — self-join on block = pos div window
    restricted to same + adjacent blocks, filtered to distance <
    window. Both sides are (id, pos) projections; the join key is an
    integer block id, uniform by construction."""
    pos = snm_positions(
        records.select(F.col(key_col).alias("__k"), F.col(id_col).alias("id")),
        ["__k", "id"],
        buckets=buckets,
    ).select("id", "pos", (F.col("pos") / window).cast("long").alias("blk"))
    a = pos.select(F.col("id").alias("id_a"), F.col("pos").alias("pa"), F.col("blk").alias("ba"))
    b = pos.select(F.col("id").alias("id_b"), F.col("pos").alias("pb"), F.col("blk").alias("bb"))
    cand = a.join(b, (F.col("bb") == F.col("ba")) | (F.col("bb") == F.col("ba") + 1))
    return (
        cand.filter(
            (F.col("pb") > F.col("pa")) & (F.col("pb") - F.col("pa") < window)
        )
        .select("id_a", "id_b", (F.col("pb") - F.col("pa")).alias("dist"))
    )


def er_pair_metrics(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Pairwise entity-resolution metrics: `pred(node, cluster)` the
    pipeline's clustering (e.g. constrained/plain CC output), `gold
    (node, cluster)` the truth — one row out: (tp_pairs, pred_pairs,
    gold_pairs, precision_ppm, recall_ppm, f1_ppm), the standard
    pairwise P/R/F1 (Menestrina et al., "Evaluating Entity Resolution
    Results", VLDB 2010). Evaluated over the node intersection (an
    inner join on node — nodes scored by only one side carry no pair
    evidence).

    The pair counts NEVER materialize pairs: tp = Σ C(n_ij, 2) over the
    (pred, gold) contingency cells, pred/gold pairs likewise over the
    marginals — three count aggregations over |nodes| rows, each with
    map-side combine, so the metric costs the same at 10^12 nodes as
    the clustering itself cost. f1_ppm uses 2tp/(pred+gold) (identity
    of 2PR/(P+R)) to stay in exact integer ppm."""
    j = pred.select("node", F.col("cluster").alias("pc")).join(
        gold.select("node", F.col("cluster").alias("gc")), "node"
    )
    cells = j.groupBy("pc", "gc").agg(F.count(F.lit(1)).alias("n"))
    tp = cells.agg(F.sum(F.expr("n * (n - 1) div 2")).alias("tp_pairs"))
    pp = (
        j.groupBy("pc").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.expr("n * (n - 1) div 2")).alias("pred_pairs"))
    )
    gp = (
        j.groupBy("gc").agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.expr("n * (n - 1) div 2")).alias("gold_pairs"))
    )
    return (
        tp.crossJoin(pp)
        .crossJoin(gp)
        .select(
            F.coalesce("tp_pairs", F.lit(0)).alias("tp_pairs"),
            F.coalesce("pred_pairs", F.lit(0)).alias("pred_pairs"),
            F.coalesce("gold_pairs", F.lit(0)).alias("gold_pairs"),
        )
        .select(
            "tp_pairs",
            "pred_pairs",
            "gold_pairs",
            F.expr(
                "CASE WHEN pred_pairs = 0 THEN 0 ELSE tp_pairs * 1000000 div pred_pairs END"
            ).alias("precision_ppm"),
            F.expr(
                "CASE WHEN gold_pairs = 0 THEN 0 ELSE tp_pairs * 1000000 div gold_pairs END"
            ).alias("recall_ppm"),
            F.expr(
                "CASE WHEN pred_pairs + gold_pairs = 0 THEN 0 "
                "ELSE 2 * tp_pairs * 1000000 div (pred_pairs + gold_pairs) END"
            ).alias("f1_ppm"),
        )
    )


def metablocking_wep(
    blocks: DataFrame,
    max_block_size: int = 64,
) -> DataFrame:
    """Meta-blocking with Weighted Edge Pruning (Papadakis et al., TKDE
    2014): `blocks(block_id, rec_id)` from any blocking scheme (token /
    q-gram / LSH band) → the pruned comparison graph
    (rec_a, rec_b, weight), keeping pairs whose common-block count (CBS
    weight) is STRICTLY above the global mean weight.

    Dirty-ER blocking emits heavy-tailed comparison graphs: most
    candidate pairs share exactly one block and are noise; pairs
    sharing many blocks are near-certain matches. WEP drops the noise
    tier without per-pair similarity computation — the standard
    pre-verify cut that turns O(Σ|b|²) comparisons into the confident
    subset.

    Exactness: the mean cut `w > Σw/|edges|` is evaluated as
    `w · n_edges > Σw` — cross-multiplied integers, no division, no
    float, bit-identical across engines. Block purging first (drop
    blocks over `max_block_size` — the oversized-block guard every
    meta-blocking paper applies) bounds pair generation by
    |blocks|·max_block_size²."""
    bl = blocks.select("block_id", "rec_id").dropDuplicates()
    sizes = bl.groupBy("block_id").agg(F.count(F.lit(1)).alias("n"))
    kept = bl.join(
        F.broadcast(sizes.filter(F.col("n") <= int(max_block_size)).select("block_id")),
        "block_id",
        "left_semi",
    )
    a = kept.select("block_id", F.col("rec_id").alias("rec_a"))
    b = kept.select("block_id", F.col("rec_id").alias("rec_b"))
    edges = (
        a.join(b, "block_id")
        .filter(F.col("rec_a") < F.col("rec_b"))
        .groupBy("rec_a", "rec_b")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )
    totals = edges.agg(
        F.count(F.lit(1)).alias("n_edges"), F.sum("weight").alias("sum_w")
    )
    return (
        edges.crossJoin(F.broadcast(totals))
        .filter(F.col("weight") * F.col("n_edges") > F.col("sum_w"))
        .select("rec_a", "rec_b", "weight")
    )


def fs_weights(comparisons: DataFrame, gold: DataFrame) -> DataFrame:
    """Fellegi–Sunter field-weight estimation (Fellegi & Sunter 1969,
    the probabilistic record-linkage model behind every serious ER
    engine): `comparisons(rec_a, rec_b, field, agree)` — one row per
    candidate pair per comparison field, agree ∈ {0,1} — and
    `gold(rec_a, rec_b)` the labeled true matches → per field
    (field, n_match, n_nonmatch, m_ppm, u_ppm, dominance_ppm) where
        m = P(agree | match),   u = P(agree | non-match)
    in exact ppm, and dominance_ppm = m_ppm·10⁶ div max(u_ppm, 1) — the
    integer agreement-odds surrogate for the classic log₂(m/u) score
    (monotone in it, so thresholding on it induces the same ordering;
    the float log stays client-side).

    Use: run once over a labeled sample, broadcast the resulting
    |fields|-row weight table back over the 100 TB candidate stream, and
    score pairs by summing per-field dominance — the supervised upgrade
    of `verify_candidates`' single-similarity cut.

    Scale: gold is a labeled sample (≤ millions) — broadcast hash join
    onto the comparison stream, never a shuffle of it; then ONE
    field-keyed map-side-combined agg; output is |fields| rows. Pair
    labeling is left (absent-from-gold = non-match), per the model."""
    g = gold.select("rec_a", "rec_b").dropDuplicates().withColumn("is_m", F.lit(1))
    lab = comparisons.select("rec_a", "rec_b", "field", "agree").join(
        F.broadcast(g), ["rec_a", "rec_b"], "left"
    )
    out = (
        lab.groupBy("field")
        .agg(
            F.sum(F.coalesce("is_m", F.lit(0))).cast("long").alias("n_match"),
            F.sum(F.when(F.col("is_m").isNull(), 1).otherwise(0)).cast("long").alias("n_nonmatch"),
            F.sum(F.when(F.col("is_m").isNotNull(), F.col("agree")).otherwise(0)).cast("long").alias("agree_m"),
            F.sum(F.when(F.col("is_m").isNull(), F.col("agree")).otherwise(0)).cast("long").alias("agree_u"),
        )
        .withColumn(
            "m_ppm",
            F.expr("CASE WHEN n_match = 0 THEN CAST(NULL AS BIGINT) ELSE agree_m * 1000000L div n_match END"),
        )
        .withColumn(
            "u_ppm",
            F.expr("CASE WHEN n_nonmatch = 0 THEN CAST(NULL AS BIGINT) ELSE agree_u * 1000000L div n_nonmatch END"),
        )
        .withColumn(
            "dominance_ppm",
            F.expr(
                "CASE WHEN m_ppm IS NULL OR u_ppm IS NULL THEN CAST(NULL AS BIGINT) "
                "ELSE m_ppm * 1000000L div greatest(u_ppm, 1L) END"
            ),
        )
    )
    return out.select("field", "n_match", "n_nonmatch", "m_ppm", "u_ppm", "dominance_ppm")


def er_bcubed_metrics(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """B-cubed ER metrics (Bagga & Baldwin '98; Amigó '09 showed it's the
    clustering metric satisfying all four formal constraints — pairwise
    F1 notoriously over-rewards merging big clusters): `pred(node,
    cluster)` vs `gold(node, cluster)` → one row (n_records,
    bcubed_p_ppm, bcubed_r_ppm, bcubed_f1_ppm). Per-record precision =
    |C(r)∩G(r)| / |C(r)| averaged over records; recall swaps in |G(r)|.
    The per-record pair to `er_pair_metrics`' per-pair view — report
    both, they disagree exactly when the clustering errs on big
    clusters.

    Never materializes per-record sets: every record in contingency cell
    (pc, gc) has the SAME |C∩G| = n_cell, so the mean folds to
    Σ_cells n_cell·(n_cell·10⁶ div size_pc) div N — a cell-keyed agg
    joined to the two marginal size tables, all map-side-combined counts
    (the er_pair_metrics cost argument: the metric costs what the
    clustering cost). Integer contract: the per-record ratio is floored
    to ppm BEFORE the mean (documented surrogate, bit-identical across
    engines; error < 1 ppm per term). Scored over the node intersection,
    like er_pair_metrics."""
    j = pred.select("node", F.col("cluster").alias("pc")).join(
        gold.select("node", F.col("cluster").alias("gc")), "node"
    )
    cells = j.groupBy("pc", "gc").agg(F.count(F.lit(1)).alias("n"))
    psz = j.groupBy("pc").agg(F.count(F.lit(1)).alias("size_pc"))
    gsz = j.groupBy("gc").agg(F.count(F.lit(1)).alias("size_gc"))
    folded = (
        cells.join(psz, "pc")
        .join(gsz, "gc")
        .select(
            F.expr("n * (n * 1000000 div size_pc)").alias("p_term"),
            F.expr("n * (n * 1000000 div size_gc)").alias("r_term"),
            F.col("n").alias("n"),
        )
        .agg(
            F.sum("n").cast("long").alias("n_records"),
            F.sum("p_term").alias("ps"),
            F.sum("r_term").alias("rs"),
        )
    )
    return folded.select(
        "n_records",
        F.expr("CASE WHEN n_records = 0 THEN 0 ELSE ps div n_records END")
        .cast("long")
        .alias("bcubed_p_ppm"),
        F.expr("CASE WHEN n_records = 0 THEN 0 ELSE rs div n_records END")
        .cast("long")
        .alias("bcubed_r_ppm"),
    ).select(
        "n_records",
        "bcubed_p_ppm",
        "bcubed_r_ppm",
        F.expr(
            "CASE WHEN bcubed_p_ppm + bcubed_r_ppm = 0 THEN 0 "
            "ELSE 2 * bcubed_p_ppm * bcubed_r_ppm div (bcubed_p_ppm + bcubed_r_ppm) END"
        )
        .cast("long")
        .alias("bcubed_f1_ppm"),
    )


def phonetic_key(col: Column) -> Column:
    """Soundex-style phonetic blocking key (Russell/Odell 1918; the
    classic ER blocker for person/org names beside SNM and LSH — names
    that SOUND alike block together: 'Robert'/'Rupert' → R163):
    first letter + three digits from the standard consonant code map,
    adjacent equal codes collapsed, vowels dropped, zero-padded.

    PINNED VARIANT (documented deviation): classic American Soundex
    treats H/W as 'transparent' (same-code consonants separated by H/W
    still collapse); that rule needs pattern backreferences, which RE2
    (DuckDB) lacks — here H/W code to 0 like vowels, i.e. they SEPARATE
    consonant runs. Every other rule is classic, and the whole key is
    regex/translate algebra that parses identically in Java regex and
    RE2 (the pii_scrub portability rule). Non-letter chars are stripped
    first; an empty result yields NULL (no key, no block).

    Blocking keys are scan-local (zero shuffles to derive); the
    candidate join they feed is the standard equi self-join bounded by
    block sizes — compose with `blocking_metrics` to audit recall."""
    s = F.regexp_replace(F.upper(col), "[^A-Z]", "")
    d = F.translate(s, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202")
    for digit in "123456":
        d = F.regexp_replace(d, digit + "{2,}", digit)
    tail = F.regexp_replace(F.substring(d, 2, 1_000_000), "0", "")
    key = F.concat(F.substring(s, 1, 1), F.rpad(F.substring(tail, 1, 3), 3, "0"))
    return F.when(s != "", key).otherwise(F.lit(None).cast("string"))


def phonetic_key_sql(expr: str) -> str:
    """DuckDB mirror of phonetic_key — same translate map and collapse
    regexes, adjacent so they evolve together."""
    s = f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
    d = f"translate({s}, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '01230120022455012623010202')"
    for digit in "123456":
        d = f"regexp_replace({d}, '{digit}{{2,}}', '{digit}', 'g')"
    tail = f"regexp_replace(substr({d}, 2), '0', '', 'g')"
    return (
        f"(CASE WHEN {s} <> '' THEN substr({s}, 1, 1) || rpad(substr({tail}, 1, 3), 3, '0') "
        f"ELSE NULL END)"
    )


def dominant_matching(pairs: DataFrame, max_rounds: int = 10) -> DataFrame:
    """One-to-one match selection over scored candidate pairs — the
    assignment step after pair scoring that `link_exact`'s per-mention
    top-1 cannot provide (two mentions may claim the same entity; ER
    merge needs each record matched AT MOST once). Distributed greedy
    via LOCALLY DOMINANT edges (Preis STACS'99 / Manne-Bisseling's
    parallel greedy matching, ~½-approximation of max-weight): per
    round, a pair is matched iff it is the best-scored pair at BOTH
    endpoints (total order pinned: score desc, then (a, b) asc — no
    RNG, no scan-order dependence); matched endpoints leave, repeat.

    Input (a, b, score BIGINT); self-pairs dropped, the unordered pair
    (least, greatest) collapses duplicates to MAX score (pinned).
    Returns (a, b, score, match_round). Pairs still live after
    `max_rounds` are left unmatched (the luby_mis contract; the loop
    early-outs when the pair set drains, and the oracle unrolls the
    same rounds either way, so the bound is a completeness knob, never
    a correctness one).

    Scale shape: per round ONE endpoint-keyed min agg over 2|P| rows
    (map-side combined), two equi joins back to the pair set, two hash
    anti joins to evict matched endpoints; the pair set shrinks
    geometrically; eager per-round checkpoint (state reused 4×)."""
    from pyspark.sql import functions as F

    p = (
        pairs.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"),
            F.greatest("a", "b").alias("b"),
            F.col("score").cast("long").alias("score"),
        )
        .groupBy("a", "b")
        .agg(F.max("score").alias("score"))
    )
    spark = pairs.sparkSession
    out = spark.createDataFrame([], "a string, b string, score long, match_round int")
    key = F.struct((-F.col("score")).alias("ns"), F.col("a").alias("ka"), F.col("b").alias("kb"))
    for rnd in range(1, max_rounds + 1):
        p = p.localCheckpoint()  # eager: reused by probe + 2 joins + evict
        if p.isEmpty():
            break
        ends = p.select(F.col("a").alias("node"), key.alias("k")).unionByName(
            p.select(F.col("b").alias("node"), key.alias("k"))
        )
        best = ends.groupBy("node").agg(F.min("k").alias("m"))
        sel = (
            p.join(best.withColumnRenamed("node", "a"), "a")
            .filter(key == F.col("m"))
            .drop("m")
            .join(best.withColumnRenamed("node", "b"), "b")
            .filter(key == F.col("m"))
            .select("a", "b", "score")
        )
        sel = sel.localCheckpoint()
        out = out.unionByName(
            sel.select("a", "b", "score", F.lit(rnd).cast("int").alias("match_round"))
        )
        matched = sel.select(F.col("a").alias("node")).unionByName(
            sel.select(F.col("b").alias("node"))
        ).distinct()
        p = (
            p.join(matched.withColumnRenamed("node", "a"), "a", "left_anti")
            .join(matched.withColumnRenamed("node", "b"), "b", "left_anti")
            .select("a", "b", "score")
        )
    return out


def blocked_edit_join(
    left: DataFrame,
    right: DataFrame,
    block_len: int = 4,
    min_sim_ppm: int = 800_000,
    max_block_pairs: int = 1_000_000,
) -> DataFrame:
    """Prefix-blocked edit-distance record matching — the classic
    dirty-string ER verify pass (Gravano et al. VLDB'01 shape: cheap
    blocking join, exact Levenshtein verification on the candidates
    only, never all-pairs). Complements the set-based verifiers
    (n-gram Jaccard, MinHash) for SHORT strings — names, titles —
    where token sets are too small to discriminate and character-level
    edits are the right distance.

    Input: left (id, name), right (rid, rname). Block key = first
    `block_len` chars of lower(trim(name)); a NULL/short key still
    blocks on what is there. Candidates = equi-join on the key;
    verified matches keep lev = levenshtein(name, rname) and
    sim_ppm = 10⁶·(maxlen − lev) div maxlen ≥ `min_sim_ppm`
    (integer-exact; both engines ship the same classic DP levenshtein).

    Scale shape: block keys are scan-local; the candidate join is ONE
    hash equi-join on the key. Degenerate blocks (boilerplate prefixes
    — the mega-bucket problem) are dropped with set semantics BEFORE
    the join when |L_b|·|R_b| > `max_block_pairs`, the same guard as
    the LSH mega-bucket cap in textops: a block that big means the
    prefix carries no signal, and recall for its members belongs to a
    longer key or an LSH blocker, not to a quadratic join. Verification
    is a JVM-codegen levenshtein filter — no UDFs. At 10¹²-doc scale
    the blocked join shuffles candidates once on the block key; skewed
    keys are exactly the capped ones."""
    bk = lambda c: F.substring(F.lower(F.trim(c)), 1, block_len)  # noqa: E731
    lb = left.select(F.col("id"), F.col("name"), bk(F.col("name")).alias("bk"))
    rb = right.select(F.col("rid"), F.col("rname"), bk(F.col("rname")).alias("bk"))
    ln = lb.groupBy("bk").agg(F.count(F.lit(1)).alias("nl"))
    rn = rb.groupBy("bk").agg(F.count(F.lit(1)).alias("nr"))
    ok = (
        ln.join(rn, "bk")
        .filter(F.col("nl") * F.col("nr") <= F.lit(max_block_pairs))
        .select("bk")
    )
    cand = lb.join(ok, "bk", "left_semi").join(rb.join(ok, "bk", "left_semi"), "bk")
    lev = F.levenshtein(F.col("name"), F.col("rname"))
    maxlen = F.greatest(F.length("name"), F.length("rname"))
    return (
        cand.select(
            "id", "rid", "name", "rname",
            lev.cast("long").alias("lev"),
            F.when(maxlen > 0, F.expr(
                "1000000 * (greatest(length(name), length(rname)) - levenshtein(name, rname))"
                " div greatest(length(name), length(rname))"
            )).otherwise(F.lit(1_000_000)).cast("long").alias("sim_ppm"),
        )
        .filter(F.col("sim_ppm") >= F.lit(min_sim_ppm))
    )
