"""Deterministic random walks — DeepWalk/node2vec corpus generation
(Perozzi et al. KDD'14) with this repo's engine-portable determinism
twist: the "random" neighbor at each step is the argmin of
md5(cur ␟ neighbor ␟ walk ␟ step) over the current node's out-neighbors.
That makes every walk a pure function of (graph, walk id) — the same
sequences on any partitioning, cluster size, or engine, so the walk
corpus carries an exact cross-engine value oracle (true RNG walks can
only be distribution-tested) and regenerating embeddings training data
is reproducible by construction.

Scale design: one hash join per step against the adjacency (frontier ⋈
edges on cur), then a map-side-combined min aggregation per (node,
walk, step) — the frontier never exceeds nodes × walks_per_node rows,
and walk_len bounds the rounds. Dead ends terminate the walk (shorter
sequence, standard DeepWalk). Mega-hubs cost |degree| candidate rows
per visiting walk for one aggregation — the same bound as one
large-star CC round, and AQE skew-split applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"


def random_walks(
    edges: DataFrame, walks_per_node: int = 1, walk_len: int = 4
) -> DataFrame:
    """edges(src, dst) directed → (start, walk, seq) where seq is the
    ␟-free comma-joined node sequence (start included; length ≤
    walk_len+1, shorter at dead ends). Deterministic — see module doc."""
    starts = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .crossJoin(
            edges.sparkSession.range(walks_per_node).select(
                F.col("id").cast("int").alias("walk")
            )
        )
    )
    cur = starts.select(
        F.col("node").alias("start"), "walk", F.col("node").alias("cur"),
        F.col("node").alias("seq"),
    )
    adj = edges.select(F.col("src").alias("cur"), F.col("dst"))
    for step in range(walk_len):
        # argmin via the min-string trick (md5 is fixed-width hex, so the
        # lexicographic min of "hash␟dst" is the hash argmin and carries
        # its dst) — min_by/arg_min null semantics differ across engines,
        # min(CASE ...) does not
        key = F.when(
            F.col("dst").isNotNull(),
            F.concat(
                F.md5(
                    F.concat_ws(
                        SEP, F.col("cur"), F.col("dst"), F.col("walk"), F.lit(step)
                    )
                ),
                F.lit(SEP),
                F.col("dst"),
            ),
        )
        nxt = (
            cur.join(adj, "cur", "left")
            .groupBy("start", "walk", "seq")
            .agg(F.min(key).alias("k"))
        )
        chosen = F.split_part(F.col("k"), F.lit(SEP), F.lit(2))
        cur = nxt.select(
            "start",
            "walk",
            F.when(F.col("k").isNotNull(), chosen).alias("cur"),
            F.when(
                F.col("k").isNotNull(), F.concat(F.col("seq"), F.lit(","), chosen)
            ).otherwise(F.col("seq")).alias("seq"),
        ).localCheckpoint(eager=False)
    return cur.select("start", "walk", "seq")


def skipgram_pairs(
    walks: DataFrame, window: int = 2, seq_col: str = "seq"
) -> DataFrame:
    """Skip-gram training pairs from walk sequences (word2vec over the
    graph, the DeepWalk §4.2 step): every (center, context) pair within
    ±`window` positions, counted corpus-wide → (center, context, n).

    Scan-local pair generation (array transform over the split sequence,
    flatten, explode) + ONE map-side-combined count — the hub-pair skew
    story is bpe_pair_counts'. Window clipping at sequence edges; the
    center itself is excluded."""
    # bind the split sequence to a column first: element_at(toks, …)
    # inside the nested lambdas would re-split the CSV per (i, j) pair
    # otherwise (cf. tfidf_pairs)
    toks = F.col("__toks")
    n = F.size(toks)
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.filter(
                F.transform(
                    F.sequence(i - window, i + window),
                    lambda j: F.when(
                        (j >= 1) & (j <= n) & (j != i),
                        F.concat(
                            F.element_at(toks, i), F.lit("\x1f"), F.element_at(toks, j)
                        ),
                    ),
                ),
                lambda p: p.isNotNull(),
            ),
        )
    )
    return (
        walks.withColumn("__toks", F.split(F.col(seq_col), ","))
        .select(F.explode(pairs).alias("p"))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.split_part(F.col("p"), F.lit("\x1f"), F.lit(1)).alias("center"),
            F.split_part(F.col("p"), F.lit("\x1f"), F.lit(2)).alias("context"),
            "n",
        )
    )


def negative_samples(
    pairs: DataFrame, k: int = 2, table_size: int = 1024
) -> DataFrame:
    """k deterministic negatives per (center, context) pair → (center,
    context, j, neg). word2vec draws negatives from a FIXED-SIZE unigram
    table, which is what keeps this scale-sound: the table here is the
    `table_size` most frequent centers (freq desc, node asc), so the
    rank window and both sampling joins are parameter-bounded BROADCASTs
    no matter the graph. Negative j = table[md5(center ␟ context ␟ j)
    mod m]; a draw that hits the true context bumps one slot (word2vec's
    resample, made deterministic — pure function of the pair, so the
    sample set is engine/partitioning-exact)."""
    tbl = (
        pairs.groupBy("center")
        .agg(F.sum("n").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("center").asc())
        .limit(table_size)
    )
    from pyspark.sql.window import Window as W

    ranked = tbl.withColumn(
        "rank", F.row_number().over(W.orderBy(F.col("freq").desc(), F.col("center").asc()))
    ).select(F.col("center").alias("node"), "rank")
    m = ranked.agg(F.count(F.lit(1)).alias("m"))
    drawn = (
        pairs.select("center", "context")
        .crossJoin(F.broadcast(m))
        .select(
            "center", "context", "m",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("j"),
        )
        .withColumn(
            "idx",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("\x1f", F.col("center"), F.col("context"), F.col("j"))),
                        1, 15,
                    ),
                    16, 10,
                ).cast("long")
                % F.col("m")
            ) + 1,
        )
        .withColumn("bump", (F.col("idx") % F.col("m")) + 1)
    )
    r1 = ranked.select(F.col("rank").alias("idx"), F.col("node").alias("n1"))
    r2 = ranked.select(F.col("rank").alias("bump"), F.col("node").alias("n2"))
    return (
        drawn.join(F.broadcast(r1), "idx")
        .join(F.broadcast(r2), "bump")
        .select(
            "center", "context", "j",
            F.when(F.col("n1") != F.col("context"), F.col("n1"))
            .otherwise(F.col("n2")).alias("neg"),
        )
    )


def pair_lift(pairs: DataFrame, scale: int = 1_000_000) -> DataFrame:
    """Association (lift) scores for a (center, context, n) pair table →
    (center, context, n, lift_x1M) where lift = P(c,ctx)/(P(c)P(ctx)) =
    n * N / (n_c * n_ctx), floor-scaled ×`scale`. log(lift) is PMI; the
    log is omitted for the same reason as bm25_rank's idf — it is the
    only non-correctly-rounded op, and lift is monotone in PMI, so
    ranking/thresholding behavior is identical while every value stays
    an exact cross-engine integer (inputs < 2^53 ⇒ IEEE division is
    exact-then-floored identically everywhere).

    Shape: two marginal aggregations (center, context) + one 1-row grand
    total — all broadcast back; the pair table is touched once."""
    nc = pairs.groupBy("center").agg(F.sum("n").alias("n_c"))
    nx = pairs.groupBy("context").agg(F.sum("n").alias("n_x"))
    tot = pairs.agg(F.sum("n").alias("nn"))
    return (
        pairs.join(F.broadcast(nc), "center")
        .join(F.broadcast(nx), "context")
        .crossJoin(F.broadcast(tot))
        .select(
            "center", "context", "n",
            F.floor(
                (F.lit(scale) * F.col("n") * F.col("nn")).cast("double")
                / (F.col("n_c") * F.col("n_x"))
            ).cast("long").alias("lift_x1m"),
        )
    )


def entity_dense_ids(quads: DataFrame, buckets: int = 64) -> DataFrame:
    """Dense 0..N-1 entity ids over the store's IRI vocabulary (subjects
    plus IRI objects) — the entity dictionary every KG-embedding trainer
    needs. Distributed two-stage rank (the pack_offsets prefix-sum
    shape): entities hash into `buckets` md5 buckets; per-bucket counts
    get a driver-small cumulative scan broadcast back; the global id is
    bucket offset + intra-bucket rank under the total order
    (bucket, ent). No global single-reducer window, exact and
    deterministic at any parallelism."""
    from pyspark.sql import Window

    ents = (
        quads.filter(F.col("s_kind") == 0).select(F.col("s_lex").alias("ent"))
        .unionByName(quads.filter(F.col("o_kind") == 0).select(F.col("o_lex").alias("ent")))
        .distinct()
        .withColumn(
            "__b",
            F.conv(F.substring(F.md5(F.col("ent")), 1, 15), 16, 10)
            .cast("long") % buckets,
        )
    )
    btot = ents.groupBy("__b").agg(F.count(F.lit(1)).alias("bt"))
    boff = btot.select(
        "__b",
        F.coalesce(
            F.sum("bt").over(
                Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long").alias("boff"),
    )
    rank = F.row_number().over(Window.partitionBy("__b").orderBy("ent")) - 1
    return (
        ents.join(F.broadcast(boff), "__b")
        .select("ent", (F.col("boff") + rank).cast("long").alias("ent_id"))
    )


def kg_negative_samples(quads: DataFrame, k: int = 2, buckets: int = 64) -> DataFrame:
    """Corrupt-object negative triples for KG-embedding training (the
    TransE/DistMult recipe, Bordes et al. NeurIPS 2013): for every
    positive (s, p, o) with an IRI object, emit up to `k` negatives
    (s, p, o') where o' is a hash-picked entity, under the FILTERED
    protocol — candidates that happen to be true triples (or equal the
    positive object) are dropped, so no negative is a false negative.

    Deterministic: candidate i for a triple is the entity whose dense id
    is md5(s ∥ p ∥ o ∥ i) mod N — reruns and reshuffles emit identical
    samples, and the same arithmetic re-derives them in any engine.

    Output: (s_lex, pred, o_lex, neg_ix, neg_o).

    Scale shape: dense ids via `entity_dense_ids` (two bounded
    shuffles); candidate pick is one int-keyed equi-join against the
    entity dictionary (broadcastable while the vocabulary fits, shuffle
    hash join beyond); the filtered-protocol check is one hash anti
    join on (s, p, o') against the positive set. Everything whole-stage
    codegen; no Python."""
    ents = entity_dense_ids(quads, buckets=buckets)
    n = ents.count()  # driver scalar: vocabulary size (metadata-sized)
    pos = (
        quads.filter((F.col("s_kind") == 0) & (F.col("o_kind") == 0))
        .select("s_lex", "pred", "o_lex")
        .distinct()
    )
    sep = "\x1f"
    cand = pos.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(int(k) - 1))).alias("neg_ix")
    ).withColumn(
        "__nid",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(sep, F.col("s_lex"), F.col("pred"), F.col("o_lex"),
                                F.col("neg_ix").cast("string"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % n,
    )
    picked = cand.join(
        ents.select(F.col("ent_id").alias("__nid"), F.col("ent").alias("neg_o")), "__nid"
    ).filter(F.col("neg_o") != F.col("o_lex"))
    truth = pos.select(
        F.col("s_lex").alias("s_lex"), F.col("pred").alias("pred"), F.col("o_lex").alias("neg_o")
    )
    return picked.join(truth, ["s_lex", "pred", "neg_o"], "left_anti").select(
        "s_lex", "pred", "o_lex", "neg_ix", "neg_o"
    )


def transe_scores(
    triples: DataFrame,
    ent_emb: DataFrame,
    rel_emb: DataFrame | None = None,
    scale: int = 10_000,
) -> DataFrame:
    """TransE plausibility scoring (Bordes et al. 2013): score(s,p,o) =
    −‖e_s + r_p − e_o‖₁, the translation-model energy used to rank
    candidate facts (fusion tie-breaking, link-prediction reranking) and
    to monitor embedding-training batches built from kg_negative_samples.

    triples: (s_lex, pred, o_lex); ent_emb: (ent, embedding);
    rel_emb: (pred, embedding) or None for the zero relation (score
    degenerates to −L1(e_s, e_o) — pure embedding proximity).

    All math in double after exact float widening, summed left-to-right
    by F.aggregate (the ann.py discipline — bit-identical to DuckDB's
    list fold), exposed as integer ×scale. Output: (s_lex, pred, o_lex,
    score_x1e4).

    Scale shape: two entity-keyed hash joins against the embedding
    dictionary (broadcast when it fits, shuffle beyond) + one
    |predicates|-row broadcast; scoring itself is codegen'd array
    algebra — no Python, no shuffle beyond the joins."""
    se = ent_emb.select(F.col("ent").alias("s_lex"), F.col("embedding").alias("__se"))
    oe = ent_emb.select(F.col("ent").alias("o_lex"), F.col("embedding").alias("__oe"))
    j = triples.join(se, "s_lex").join(oe, "o_lex")
    if rel_emb is not None:
        re_ = rel_emb.select("pred", F.col("embedding").alias("__re"))
        j = j.join(F.broadcast(re_), "pred")
        moved = F.zip_with(
            F.col("__se"), F.col("__re"), lambda x, y: x.cast("double") + y.cast("double")
        )
    else:
        moved = F.transform(F.col("__se"), lambda x: x.cast("double"))
    l1 = F.aggregate(
        F.zip_with(moved, F.col("__oe"), lambda x, y: F.abs(x - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return j.select(
        "s_lex",
        "pred",
        "o_lex",
        F.round(-l1 * int(scale)).cast("long").alias("score_x1e4"),
    )


def distmult_scores(
    triples: DataFrame,
    ent_emb: DataFrame,
    rel_emb: DataFrame | None = None,
    scale: int = 10_000,
) -> DataFrame:
    """DistMult plausibility scoring (Yang et al., ICLR 2015): score(s,p,o)
    = Σᵢ e_s[i]·r_p[i]·e_o[i] — the multiplicative (bilinear-diagonal)
    counterpart of `transe_scores`' additive energy. The two models rank
    DIFFERENT relation families well (TransE favors translational 1-to-1
    relations, DistMult favors symmetric similarity-like relations), so
    fusion reranking runs both and feeds `rrf_fuse`; sharing the join
    shape here makes that a column swap, not a new pipeline.

    triples: (s_lex, pred, o_lex); ent_emb: (ent, embedding);
    rel_emb: (pred, embedding) or None for the all-ones relation (score
    degenerates to the raw inner product ⟨e_s, e_o⟩ — embedding
    similarity, DistMult's symmetric core).

    All math in double after exact float widening, summed left-to-right
    by F.aggregate (the ann.py discipline — bit-identical to DuckDB's
    list fold), exposed as integer ×scale. Output: (s_lex, pred, o_lex,
    score_x1e4).

    Scale shape: identical to transe_scores — two entity-keyed hash
    joins against the embedding dictionary (broadcast when it fits) +
    one |predicates|-row broadcast; scoring is codegen'd array algebra,
    no Python, no shuffle beyond the joins."""
    se = ent_emb.select(F.col("ent").alias("s_lex"), F.col("embedding").alias("__se"))
    oe = ent_emb.select(F.col("ent").alias("o_lex"), F.col("embedding").alias("__oe"))
    j = triples.join(se, "s_lex").join(oe, "o_lex")
    if rel_emb is not None:
        re_ = rel_emb.select("pred", F.col("embedding").alias("__re"))
        j = j.join(F.broadcast(re_), "pred")
        gated = F.zip_with(
            F.col("__se"), F.col("__re"), lambda x, y: x.cast("double") * y.cast("double")
        )
    else:
        gated = F.transform(F.col("__se"), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(gated, F.col("__oe"), lambda x, y: x * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return j.select(
        "s_lex",
        "pred",
        "o_lex",
        F.round(dot * int(scale)).cast("long").alias("score_x1e4"),
    )


def rank_eval(scored: DataFrame, k_list: tuple = (1, 3, 10)) -> DataFrame:
    """Link-prediction ranking metrics (the standard KG-embedding eval:
    MRR + Hits@k under the filtered protocol): `scored` holds one row
    per (query, candidate) with an integer `score` and `is_true` ∈
    {0,1} marking the held-out positive. Rank = 1 + number of
    candidates strictly better than the positive, ties broken AGAINST
    the positive (pessimistic — the honest convention; optimistic tie
    handling inflates MRR on constant scorers).

    Output: one row (n_queries, mrr_x1e6, hits1_ppm, hits3_ppm,
    hits10_ppm) — every metric an exact integer (per-query reciprocal
    rank is 10⁶ div rank, summed then divided by n).

    Scale shape: one query-keyed window to rank (per-key group =
    candidate count, bounded by the sampler's k), one filter to the
    positives, one global 1-row aggregation."""
    from pyspark.sql import Window

    # pessimistic: order equal scores with is_true LAST
    pess = Window.partitionBy("query").orderBy(
        F.desc("score"), F.asc("is_true"), F.asc("candidate")
    )
    ranked = scored.withColumn("_rk", F.row_number().over(pess)).filter(
        F.col("is_true") == 1
    )
    aggs = [
        F.count(F.lit(1)).alias("n_queries"),
        F.expr("sum(1000000 div _rk) * 1 div count(1)").alias("mrr_x1e6"),
    ]
    for k in k_list:
        aggs.append(
            F.expr(
                f"sum(CASE WHEN _rk <= {int(k)} THEN 1 ELSE 0 END) * 1000000 div count(1)"
            ).alias(f"hits{int(k)}_ppm")
        )
    return ranked.agg(*aggs)


def node2vec_walks(
    edges: DataFrame,
    walks_per_node: int = 1,
    walk_len: int = 3,
    ret_w: int = 4,
    mid_w: int = 2,
    far_w: int = 1,
) -> DataFrame:
    """Second-order node2vec-biased walks (Grover & Leskovec, KDD 2016)
    with INTEGER bias weights standing in for the paper's 1/p, 1, 1/q:
    from state (prev, cur), a candidate next node weighs `ret_w` when it
    IS prev (return), `mid_w` when prev→next is an edge (BFS-ish stay
    near), `far_w` otherwise (DFS-ish move away); the first step (no
    prev) is uniform. Defaults (4,2,1) ≡ p=1/2, q=2.

    Deterministic weighted choice without RNG: every candidate gets
    `weight` md5 draws — array_min(transform(sequence(1, w), c →
    md5(cur␟dst␟walk␟step␟c))) — and the walker takes the
    lexicographic-min draw (the min-string trick of `random_walks`). By
    symmetry of iid hashes each candidate wins with probability
    weight/Σweights, the walk is reproducible on any engine/partitioning,
    and the DuckDB mirror unrolls the identical expression.

    → (start, walk, seq); seq comma-joined, dead ends stop early.

    Scale shape: per step TWO hash joins (cur→neighbors, prev→dst
    adjacency probe) + ONE map-side-combined min per walker — walker
    count × mean degree rows in flight, lineage flattened per step; at
    100× walkers shard by (start, walk) with no cross-walker state."""
    starts = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .crossJoin(
            edges.sparkSession.range(walks_per_node).select(
                F.col("id").cast("int").alias("walk")
            )
        )
    )
    state = starts.select(
        F.col("node").alias("start"), "walk",
        F.lit(None).cast("string").alias("prev"),
        F.col("node").alias("cur"), F.col("node").alias("seq"),
    )
    adj = edges.select(F.col("src").alias("cur"), F.col("dst")).distinct()
    back = edges.select(
        F.col("src").alias("prev"), F.col("dst"), F.lit(1).alias("near")
    ).distinct()
    for step in range(walk_len):
        cand = (
            state.join(adj, "cur", "left")
            .join(back, ["prev", "dst"], "left")
        )
        wgt = (
            F.when(F.col("prev").isNull(), F.lit(1))
            .when(F.col("dst") == F.col("prev"), F.lit(ret_w))
            .when(F.col("near").isNotNull(), F.lit(mid_w))
            .otherwise(F.lit(far_w))
        )
        draw = F.expr(
            f"array_min(transform(sequence(1, __wgt), c -> "
            f"md5(concat_ws('{SEP}', cur, dst, walk, '{step}', c))))"
        )
        key = F.when(F.col("dst").isNotNull(), F.concat(draw, F.lit(SEP), F.col("dst")))
        nxt = (
            cand.withColumn("__wgt", wgt)
            .groupBy("start", "walk", "prev", "cur", "seq")
            .agg(F.min(key).alias("k"))
        )
        chosen = F.split_part(F.col("k"), F.lit(SEP), F.lit(2))
        state = nxt.select(
            "start", "walk",
            F.when(F.col("k").isNotNull(), F.col("cur")).otherwise(F.col("prev")).alias("prev"),
            F.when(F.col("k").isNotNull(), chosen).alias("cur"),
            F.when(
                F.col("k").isNotNull(), F.concat(F.col("seq"), F.lit(","), chosen)
            ).otherwise(F.col("seq")).alias("seq"),
        ).localCheckpoint(eager=False)
    return state.select("start", "walk", "seq")
