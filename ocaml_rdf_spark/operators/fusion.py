"""Knowledge fusion / truth discovery over multi-source quad stores.

A web-scale KG-construction pipeline extracts the *same* fact key
(subject, functional predicate) from many pages, and the sources
disagree: stale pages, scraper noise, spam hosts. The reference's
graph model keeps every assertion (rdf_graph.ml :: add_triple is set
semantics over (s,p,o) — SURVEY §2.1), so conflict *resolution* is a
pipeline stage layered on top, exactly where canonicalization sits in
the north rule. The public algorithm family is source-vote truth
discovery (Dong et al., "Knowledge Vault" / "Knowledge-Based Trust",
VLDB 2014-15; Yin et al., "TruthFinder", KDD 2007): each source graph
casts a weighted vote for the value it asserts, the winner per fact
key is the highest-vote value, and (iteratively) source weights are
re-estimated from how often each source agrees with the consensus.

Spark shape (designed for 10^12 triples):

- `fuse_functional` is two shuffles, both on fact-key-derived keys:
  one map-side-combined groupBy on the full (s, p, value) tuple to
  collapse duplicate assertions into votes, then one window over
  (s, p) to rank values. The per-key group is bounded by the number
  of *distinct asserted values*, which is bounded by the number of
  sources — single-digit rows per key, so no skew regardless of how
  popular an entity is.
- source weights arrive as a tiny (graph, weight) DataFrame —
  broadcast; at web scale "graph" is the source host, and a host
  table is millions of rows, still broadcastable at default 10 MB-1 GB
  thresholds.
- `truth_discovery` iterates vote → source-accuracy → re-vote a fixed
  number of rounds (2-3 suffice in the literature); each round is the
  same two-shuffle shape plus one graph-keyed aggregation whose reduce
  side is |sources| rows (metadata-sized). Lineage is cut per round
  with localCheckpoint, same discipline as the CC/path fixpoints
  (operators/cc.py).

No Python in the loop: everything is built-in pyspark.sql.functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: columns identifying one asserted VALUE of a fact key
_VALUE_COLS = ["o_kind", "o_lex", "o_dtype", "o_lang"]
#: columns identifying one fact KEY (subject × functional predicate)
_KEY_COLS = ["s_kind", "s_lex", "pred"]


def _votes(quads: DataFrame, weights: DataFrame | None, default_weight: int) -> DataFrame:
    """Collapse assertions to one row per (fact key, value) with integer
    vote mass and distinct-source count. Duplicate assertions by the
    same source count ONCE (set semantics, mirroring add_triple)."""
    per_source = quads.select(*_KEY_COLS, *_VALUE_COLS, "graph").dropDuplicates(
        _KEY_COLS + _VALUE_COLS + ["graph"]
    )
    if weights is not None:
        per_source = per_source.join(F.broadcast(weights), "graph", "left").withColumn(
            "wt", F.coalesce(F.col("weight"), F.lit(default_weight)).cast("long")
        )
    else:
        per_source = per_source.withColumn("wt", F.lit(default_weight).cast("long"))
    return per_source.groupBy(*_KEY_COLS, *_VALUE_COLS).agg(
        F.sum("wt").alias("votes"),
        F.countDistinct("graph").alias("n_sources"),
    )


def fuse_functional(
    quads: DataFrame,
    weights: DataFrame | None = None,
    default_weight: int = 1,
) -> DataFrame:
    """One-shot weighted source voting for functional predicates.

    Input: quads (TRIPLES schema or any superset of s/pred/o/graph
    columns) where `pred` SHOULD be single-valued per subject but
    multiple source graphs may disagree. Optional `weights`:
    (graph: string, weight: long) — unlisted graphs get
    `default_weight`.

    Output, one row per fact key:
      s_kind, s_lex, pred, o_kind, o_lex, o_dtype, o_lang  (the winner)
      votes        — winner's vote mass
      total_votes  — all vote mass on the key
      n_values     — distinct values asserted
      n_sources    — distinct sources backing the winner
      confidence   — votes / total_votes (double)

    Ties break deterministically: higher votes, then lower o_kind,
    then lexicographically smaller (o_lex, o_dtype, o_lang) — so
    re-running the job on reshuffled input emits identical winners.
    """
    votes = _votes(quads, weights, default_weight)
    key_win = Window.partitionBy(*_KEY_COLS)
    rank_win = key_win.orderBy(
        F.desc("votes"),
        F.asc("o_kind"),
        F.asc("o_lex"),
        F.asc_nulls_first("o_dtype"),
        F.asc_nulls_first("o_lang"),
    )
    ranked = (
        votes.withColumn("total_votes", F.sum("votes").over(key_win))
        .withColumn("n_values", F.count(F.lit(1)).over(key_win))
        .withColumn("_rn", F.row_number().over(rank_win))
    )
    return ranked.filter(F.col("_rn") == 1).select(
        *_KEY_COLS,
        *_VALUE_COLS,
        "votes",
        "total_votes",
        "n_values",
        "n_sources",
        (F.col("votes").cast("double") / F.col("total_votes")).alias("confidence"),
    )


def source_accuracy(quads: DataFrame, winners: DataFrame) -> DataFrame:
    """Per-source accuracy against a consensus: the fraction of the
    source's (key, value) claims that match the winning value.
    Output: (graph, n_claims, n_correct, accuracy: double). One
    claims-keyed join + one graph-keyed agg (reduce side = |sources|)."""
    claims = quads.select(*_KEY_COLS, *_VALUE_COLS, "graph").dropDuplicates(
        _KEY_COLS + _VALUE_COLS + ["graph"]
    )
    w = winners.select(*_KEY_COLS, *[F.col(c).alias(f"w_{c}") for c in _VALUE_COLS])
    joined = claims.join(w, _KEY_COLS, "inner").withColumn(
        "ok",
        F.when(
            (F.col("o_kind") == F.col("w_o_kind"))
            & (F.col("o_lex") == F.col("w_o_lex"))
            & F.col("o_dtype").eqNullSafe(F.col("w_o_dtype"))
            & F.col("o_lang").eqNullSafe(F.col("w_o_lang")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return joined.groupBy("graph").agg(
        F.count(F.lit(1)).alias("n_claims"),
        F.sum("ok").alias("n_correct"),
        (F.sum("ok").cast("double") / F.count(F.lit(1))).alias("accuracy"),
    )


def truth_discovery(quads: DataFrame, iters: int = 2, scale: int = 1000) -> DataFrame:
    """Iterative truth discovery (TruthFinder-style, fixed-point cut at
    `iters` rounds): start from uniform source weights, vote, score each
    source by agreement with the consensus, re-vote with INTEGER weights
    `n_correct * scale div n_claims` — pure integer arithmetic, so vote
    mass is exact, order-independent, and engine-portable (no float-sum
    or rounding-mode drift between engines).

    Returns the final `fuse_functional` output. `iters=2` reproduces
    the literature's observation that one re-weighting round captures
    most of the lift; each extra round costs the same two shuffles.
    """
    winners = fuse_functional(quads)
    for _ in range(max(0, iters - 1)):
        acc = source_accuracy(quads, winners)
        wts = acc.select(
            "graph",
            F.expr(f"n_correct * {int(scale)} div n_claims").alias("weight"),
        )
        # tiny (|sources| rows) — materialize driver-side-free via checkpoint
        wts = wts.localCheckpoint(eager=True)
        winners = fuse_functional(quads, weights=wts, default_weight=0)
    return winners


def fuse_numeric(claims: DataFrame, k_num: int = 3) -> DataFrame:
    """Robust NUMERIC fusion per fact key: `claims(s, p, src, val)` with
    integer `val` → (s, p, n_claims, n_kept, fused_x100).

    Numeric facts (population, price, lat/long grids) can't be voted on
    like categorical values — near-agreeing sources assert slightly
    different numbers, and a single stale/spam outlier wrecks a mean.
    The standard robust recipe is median/MAD rejection (Hampel filter):
    keep claims within `k_num`×MAD of the median, report the mean of
    the survivors. All arithmetic stays exact-integer by carrying
    DOUBLED quantities (a median of integers is integral or x.5, so
    2×median is integral): M2 = 2·median(val), d = |2·val − M2|,
    D2 = 2·median(d); the keep rule |val−med| ≤ k·MAD is exactly
    `2·d ≤ k·D2` (MAD = D2/4, |val−med| = d/2). Survivor mean is
    reported ×100 via integer div — bit-identical across engines and
    partitionings.

    Shape: two key-partitioned aggregations (median, then MAD) + one
    hash join back on the fact key + one final map-side-combined
    aggregate. Per-key groups are |sources|-bounded (single digits),
    so the exact percentile is cheap and unskewed at any corpus size;
    duplicate (src, val) assertions count once (set semantics)."""
    c = claims.select("s", "p", "src", F.col("val").cast("long").alias("val")).dropDuplicates(
        ["s", "p", "src", "val"]
    )
    med = c.groupBy("s", "p").agg(
        (F.expr("percentile(val, 0.5)") * 2).cast("long").alias("m2")
    )
    d = c.join(med, ["s", "p"]).withColumn("d", F.abs(F.col("val") * 2 - F.col("m2")))
    mad = d.groupBy("s", "p").agg(
        (F.expr("percentile(d, 0.5)") * 2).cast("long").alias("d2")
    )
    kept = d.join(mad, ["s", "p"]).withColumn(
        "keep", (F.col("d") * 2 <= F.lit(int(k_num)) * F.col("d2")).cast("int")
    )
    return kept.groupBy("s", "p").agg(
        F.count(F.lit(1)).cast("long").alias("n_claims"),
        F.sum("keep").cast("long").alias("n_kept"),
        F.expr("sum(CASE WHEN keep = 1 THEN val * 100 ELSE 0 END) div sum(keep)").alias(
            "fused_x100"
        ),
    )


def class_alignment(
    types_a: DataFrame,
    types_b: DataFrame,
    k: int = 1,
    min_overlap: int = 1,
) -> DataFrame:
    """Instance-based ontology alignment: match classes across two type
    systems by shared-instance Jaccard (the PARIS/extensional-overlap
    family — align `a:`-vocabulary classes to `b:`-vocabulary classes
    by who their members are, no lexical signal needed).

    Inputs: (inst, cls_a) and (inst, cls_b) type-assertion frames
    (duplicates tolerated — set semantics applied). Output: per
    surviving (cls_a, cls_b) pair the exact member counts, the Jaccard
    as an integer ppm (`n_both * 1e6 div (n_a + n_b - n_both)` — the
    engine-portable exactness rule), and the per-cls_a rank; rows with
    `n_both < min_overlap` never reach the rank stage.

    Scale: the only large join is the instance equi-join, bounded by
    type-assertion volume (each instance contributes |classes_a(i)| ×
    |classes_b(i)| pairs — small constants in real ontologies); class
    sizes are |classes|-row aggregates joined back BROADCAST, and the
    top-k window runs over the already-grouped (cls_a, cls_b) cells."""
    ta = types_a.select("inst", "cls_a").dropDuplicates()
    tb = types_b.select("inst", "cls_b").dropDuplicates()
    na = ta.groupBy("cls_a").agg(F.count(F.lit(1)).alias("n_a"))
    nb = tb.groupBy("cls_b").agg(F.count(F.lit(1)).alias("n_b"))
    inter = (
        ta.join(tb, "inst")
        .groupBy("cls_a", "cls_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_overlap)
    )
    j = (
        inter.join(F.broadcast(na), "cls_a")
        .join(F.broadcast(nb), "cls_b")
        .withColumn(
            "jac_ppm",
            F.expr("CAST(n_both * 1000000 AS BIGINT) div (n_a + n_b - n_both)"),
        )
    )
    w = Window.partitionBy("cls_a").orderBy(
        F.col("jac_ppm").desc(), F.col("n_both").desc(), F.col("cls_b").asc()
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "cls_a", "cls_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_both").cast("long").alias("n_both"),
            "jac_ppm",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def property_alignment(
    pairs_a: DataFrame,
    pairs_b: DataFrame,
    min_overlap: int = 2,
    max_value_df: int = 1000,
    k: int = 3,
) -> DataFrame:
    """Instance-based PROPERTY alignment (the predicate-level sibling of
    `class_alignment`; PARIS / instance-matching family): two vocabularies'
    (pred, value) assertion sets → per left predicate the top-k right
    predicates by shared-value Jaccard in exact ppm —
    (pred_a, pred_b, n_a, n_b, overlap, jaccard_ppm, rank).

    Web-extraction use: schema.org's `author`, microdata's `creator`,
    and a site template's `byline` predicate all carry the same value
    set; aligning them is how per-site predicates collapse onto the
    target ontology.

    Skew guard (the instance-matching stop-value rule): values asserted
    under more than `max_value_df` (pred, side) combinations — "1",
    "true", empty-ish strings — are dropped BEFORE the value join, both
    sides symmetrically; without it one hot literal cross-products the
    predicate space. Shape: two distinct-pair aggs, one df-capped value
    equi-join, one (pa, pb) count, broadcast size tables, min_by top-k."""
    a = pairs_a.select(F.col("pred").alias("pa"), F.col("value").alias("v")).dropDuplicates()
    b = pairs_b.select(F.col("pred").alias("pb"), F.col("value").alias("v")).dropDuplicates()
    vdf = (
        a.select("v").unionByName(b.select("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_value_df)
        .select("v")
    )
    a = a.join(vdf, "v", "left_semi")
    b = b.join(vdf, "v", "left_semi")
    na = a.groupBy("pa").agg(F.count(F.lit(1)).alias("n_a"))
    nb = b.groupBy("pb").agg(F.count(F.lit(1)).alias("n_b"))
    inter = a.join(b, "v").groupBy("pa", "pb").agg(F.count(F.lit(1)).alias("overlap"))
    scored = (
        inter.filter(F.col("overlap") >= int(min_overlap))
        .join(F.broadcast(na), "pa")
        .join(F.broadcast(nb), "pb")
        .withColumn(
            "jaccard_ppm",
            F.expr("overlap * 1000000 div (n_a + n_b - overlap)"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("pa").orderBy(
        F.col("jaccard_ppm").desc(), F.col("overlap").desc(), F.col("pb").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select("pa", "pb", "n_a", "n_b", "overlap", "jaccard_ppm", "rank")
    )


def copy_detection(quads: DataFrame, truth: DataFrame) -> DataFrame:
    """Source copy detection via shared-FALSE evidence (Dong-Berti-Équille-
    Srivastava VLDB'09's core insight, depth-1 form: agreeing on the
    TRUTH is expected from independent good sources, agreeing on the same
    ERROR is the fingerprint of copying): per unordered source pair →
    (src_a, src_b, n_shared, n_shared_false, shared_false_ppm,
    overlap_ppm). `quads` carries per-source claims in the fusion schema
    (graph = source); `truth` is the fused table (`fuse_functional`'s
    winners or an external gold) keyed like the claims. Feed high
    shared_false_ppm pairs back into `truth_discovery` as discounted
    duplicates instead of independent votes.

    Scale: claims self-join on the FULL (key, value) tuple — co-claims
    only, never source×source×facts; per-source claim sets are deduped
    first (set semantics, the `_votes` rule); the pair agg output is
    ≤ |sources|² rows, and sources are catalog-sized. A hot fact shared
    by S sources fans out S·(S−1)/2 pairs — bounded by the source count,
    not the corpus. All ratios exact ppm."""
    # o_dtype/o_lang are NULL for plain terms and part of the claim
    # identity — fold the full claim tuple into ONE non-null key column
    # up front (the rem_triple eqNullSafe lesson, but hash-join-friendly:
    # a single concat key keeps every join a plain equi-join on a
    # non-null string instead of eight null-safe conditions)
    # unit-separator join + null sentinel: unambiguous tuple encoding
    # (bare concat would collide ("ab","c") with ("a","bc"))
    ckey = F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("\x1e")) for c in (_KEY_COLS + _VALUE_COLS)],
    )
    claims = (
        quads.select(ckey.alias("ck"), "graph").dropDuplicates(["ck", "graph"])
    )
    t = truth.select(ckey.alias("ck")).dropDuplicates().withColumn("is_true", F.lit(1))
    lab = claims.join(t, "ck", "left").select(
        "ck", "graph", F.coalesce("is_true", F.lit(0)).alias("is_true")
    )
    a = lab.select("ck", F.col("graph").alias("src_a"), "is_true")
    b = lab.select("ck", F.col("graph").alias("src_b"))
    pairs = a.join(b, "ck").filter(F.col("src_a") < F.col("src_b"))
    shared = pairs.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared"),
        F.sum(F.lit(1) - F.col("is_true")).cast("long").alias("n_shared_false"),
    )
    sizes = claims.groupBy("graph").agg(F.count(F.lit(1)).alias("n"))  # noqa: E501 — deduped claim-set sizes
    return (
        shared.join(sizes.select(F.col("graph").alias("src_a"), F.col("n").alias("na")), "src_a")
        .join(sizes.select(F.col("graph").alias("src_b"), F.col("n").alias("nb")), "src_b")
        .select(
            "src_a", "src_b", "n_shared", "n_shared_false",
            F.expr("CASE WHEN n_shared = 0 THEN 0 ELSE n_shared_false * 1000000 div n_shared END")
            .cast("long").alias("shared_false_ppm"),
            F.expr("n_shared * 1000000 div (na + nb - n_shared)")
            .cast("long").alias("overlap_ppm"),
        )
    )
