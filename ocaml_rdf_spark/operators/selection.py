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
