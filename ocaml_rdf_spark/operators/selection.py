"""Data selection for LLM training corpora: DSIR importance weights.

Training-data-ops addition (the reference has none — SURVEY §2.9): the
hashed-n-gram importance-resampling estimator of Xie et al., "Data
Selection for Language Models via Importance Resampling" (DSIR,
NeurIPS 2023). Given a small TARGET corpus (the distribution you want —
curated wiki/books, a high-quality language slice) and the RAW crawl,
DSIR fits two bag-of-hashed-unigram models and weighs every raw document
by how much more likely its tokens are under the target model than under
the raw model; resampling by that weight shifts the corpus toward the
target distribution without training a classifier.

Integer-exact surrogate (the integer-PageRank/BM25/lm_score precedent):
the paper sums per-token LOG probability ratios; logs are
double-rounding territory (never bit-identical across engines), so this
implementation sums per-token QUANTIZED probability ratios instead —
    p_t(b) = (scale · (t_cnt(b) + 1)) div (t_tot + B)      [add-1 smoothing]
    p_r(b) = (scale · (r_cnt(b) + 1)) div (r_tot + B)
    ratio(b) = (scale · p_t(b)) div max(p_r(b), 1)
    w_sum(doc) = Σ_tokens ratio(bucket(token)),  w_avg = w_sum div n_tokens
which preserves the DSIR ordering signal (monotone in each token's
target-vs-raw likelihood ratio) while staying pure BIGINT — every value
carries an exact cross-engine DuckDB oracle. `selected` marks docs whose
average token is more target-like than raw-like (w_avg ≥ scale), the
deterministic analogue of keeping importance weight ≥ 1; real pipelines
resample ∝ weight, which is a sampler choice downstream of these
per-document weights.

Scale shape (100 TB story): tokenization + bucketing is scan-local
(map-only); the two models are map-side-combined aggregations whose
output is B rows FOREVER (B = `buckets`, default 256 — the paper uses
10⁴; both are broadcast-sized), so model fitting costs one pass with a
B-row reduce regardless of corpus size; scoring is a broadcast hash join
of the B-row ratio table onto the token stream plus one doc-keyed
partial+final agg — exactly one shuffle carrying (doc_id, partial sums).
Nothing is ever all-pairs and no side grows with the corpus except the
doc-keyed output itself. Overflow headroom: every intermediate is ≤
scale² = 10¹² per token and ≤ n_tokens·10¹² per doc — a 10⁸-token
document stays < 2⁶³.

Reference parity note: cites are SURVEY.md §2.9 (training-data ops);
/root/reference is empty (SURVEY §0) — DSIR is public literature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textops import _norm_tokens


def _bucket(col: Column, buckets: int) -> Column:
    """Uniform md5 bucket of a token (60-bit positive hash, mod B)."""
    return (F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % buckets).alias("b")


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    buckets: int = 256,
    scale: int = 1_000_000,
    text_col: str = "text",
) -> DataFrame:
    """Per-document DSIR importance weights of `docs` toward `target`.

    Returns (doc_id, n_tokens, w_sum, w_avg, selected) for every raw doc
    with ≥ 1 normalized token (empty docs emit no rows — same rule as the
    other token-stream operators). `target` needs (doc_id, text) and is
    typically corpus-sized-small (a curated slice); it MAY overlap docs.
    """
    tb = (
        docs.select("doc_id", F.explode(_norm_tokens(text_col)).alias("tok"))
        .where(F.length("tok") > 0)
        .select("doc_id", _bucket(F.col("tok"), buckets))
    )
    tgt = (
        target.select(F.explode(_norm_tokens(text_col)).alias("tok"))
        .where(F.length("tok") > 0)
        .select(_bucket(F.col("tok"), buckets))
    )
    raw_cnt = tb.groupBy("b").agg(F.count(F.lit(1)).alias("r_cnt"))
    tgt_cnt = tgt.groupBy("b").agg(F.count(F.lit(1)).alias("t_cnt"))
    raw_tot = tb.agg(F.count(F.lit(1)).alias("r_tot"))
    tgt_tot = tgt.agg(F.count(F.lit(1)).alias("t_tot"))
    # buckets come from the raw side (every scored token exists in raw);
    # target-absent buckets smooth to t_cnt = 0. The ratio table is ≤ B
    # rows — broadcast by construction.
    ratio = (
        raw_cnt.join(tgt_cnt, "b", "left")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "b",
            F.expr(
                f"({scale} * CAST({scale} * (coalesce(t_cnt, 0) + 1) div (t_tot + {buckets}) AS BIGINT))"
                f" div greatest(CAST({scale} * (r_cnt + 1) div (r_tot + {buckets}) AS BIGINT), 1)"
            ).alias("ratio"),
        )
    )
    return (
        tb.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("ratio").alias("w_sum"))
        .select(
            "doc_id",
            "n_tokens",
            "w_sum",
            F.expr("w_sum div n_tokens").alias("w_avg"),
            F.expr(f"w_sum div n_tokens >= {scale}").alias("selected"),
        )
    )


def coverage_select(
    docs: DataFrame,
    k: int = 3,
    w: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy maximum-coverage document selection (the classic (1−1/e)
    greedy for monotone submodular maximization — Nemhauser/Wolsey/
    Fisher 1978; the facility-location/coverage objective is the
    textbook instance, and coverage-driven subset selection is the
    standard deduplicating-diversifying pick for demonstration or
    fine-tuning subsets): choose `k` documents one at a time, each round
    taking the document covering the most w-token shingles NOT yet
    covered by earlier picks. Near-duplicates of an already-picked doc
    have near-zero marginal gain, so the selection is diverse by
    construction — the submodular counterpart of dedup-then-sample.

    Deterministic: argmax ties break on the smaller doc_id (pinned);
    shingles are the corpus-normalized `_norm_tokens` w-grams, so the
    objective is invariant to case/punctuation noise.

    Output: (round, doc_id, gain) — the pick order with marginal gains
    (the standard stopping diagnostic: truncate where gain collapses).
    Fewer than k rows come back when coverage SATURATES (every shingle
    already covered): a zero-gain pick is arbitrary, so none is made
    (pinned — the luby_mis undecided-rows precedent).

    Scale shape: the shingle table is built ONCE (map-side explode +
    one distinct); each of the k rounds is one map-side-combined doc
    count + a 1-row deterministic argmax (min_by over
    struct(-gain, doc_id)) + one semi join materializing the pick's
    shingles + one hash anti join dropping them corpus-wide — per-round
    cost is O(|remaining shingle rows|), never all-pairs, and k is a
    user-bounded constant (selection budgets are human-sized).
    `localCheckpoint` per round caps lineage exactly as the CC/pivot
    fixpoint family does. For corpus-scale budgets (k in the millions)
    the literature swaps in stochastic/distributed greedy (GreeDi,
    Mirzasoleiman et al.) — this operator is the exact small-k tier and
    the verification oracle for any such approximation.

    No counterpart in the reference (no ML/data-selection layer;
    /root/reference empty per SURVEY §0) — public literature only."""
    if k < 1:
        raise ValueError("coverage_select: k must be >= 1")
    if w < 1:
        raise ValueError("coverage_select: w must be >= 1")
    toks = docs.select(
        F.col(id_col).alias("doc_id"), _norm_tokens(text_col).alias("__t")
    ).filter(F.size("__t") >= w)
    grams = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(__t) - {int(w) - 1}),"
                    f" i -> concat_ws(' ', slice(__t, i, {int(w)})))"
                )
            ).alias("g"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    remaining = grams
    picks = None
    for rnd in range(1, int(k) + 1):
        gains = remaining.groupBy("doc_id").agg(F.count(F.lit(1)).alias("gain"))
        pick = gains.agg(
            F.expr("min_by(doc_id, struct(-gain, doc_id))").alias("doc_id"),
            F.max(F.expr("struct(gain, doc_id)")).alias("__mx"),
        ).select(
            F.lit(rnd).cast("long").alias("round"),
            "doc_id",
            F.col("__mx.gain").cast("long").alias("gain"),
        )
        # NOTE __mx.gain pairs with max doc at equal gain, but gain is equal
        # by definition of the tie — the reported gain matches the picked doc.
        picks = pick if picks is None else picks.unionByName(pick)
        # the pick COVERS its shingles for every document: drop those
        # grams corpus-wide (not just the picked doc's rows) — that drop
        # is what makes the next round's counts MARGINAL gains. The
        # covered set is one document's shingles (no broadcast hint —
        # a mega-doc must be allowed to hash-join; the describe() rule).
        cov = remaining.join(
            F.broadcast(pick.select("doc_id")), "doc_id", "left_semi"
        ).select("g")
        remaining = remaining.join(cov, "g", "left_anti").localCheckpoint(eager=False)
    # saturated rounds aggregate an empty frame into a NULL pick — drop them
    return picks.filter(F.col("doc_id").isNotNull())
