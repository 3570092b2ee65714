"""Deterministic sketches + hash-based dataset splitting.

Training-data-ops additions (the reference has none — SURVEY §2.9).
Everything here is DETERMINISTIC by construction (md5, no RNG), so each
op carries an exact cross-engine DuckDB oracle — unlike HLL-style
sketches whose estimates are implementation-defined, a KMV sketch's
state (the k minimum hash values) is a pure function of the input set.

- `kmv_distinct`: K-Minimum-Values distinct-count estimator
  (Bar-Yossef et al. 2002, "Counting distinct elements in a data
  stream"). Hash each value to a uniform 60-bit integer (15 hex chars
  of md5), keep the k smallest distinct hashes; with U = 2^60, the
  estimator is (k-1) * U / kth_min. Spark plan: one scan + distinct +
  TakeOrderedAndProject(k) — the top-k runs per-partition then merges
  k rows per partition on one reducer, so a 100 TB scan ships only
  k * n_partitions longs to the final step. The same sketch states
  merge by union+re-top-k, so partial sketches from separate table
  scans compose (the property HLL is usually chosen for).

- `hash_split`: deterministic train/val/test assignment by md5 bucket
  (the standard leak-proof split for training corpora: membership is a
  pure function of the id, stable across runs, machines, and engines —
  never `rand()`, which resamples per run and leaks across epochs).
  Map-only; no shuffle at all until the caller aggregates.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: hash domain: 15 hex chars = 60 bits, fits a BIGINT exactly in both
#: Spark (conv) and DuckDB ('0x…'::BIGINT)
_U = 1 << 60


def _h60(col: Column) -> Column:
    """Uniform 60-bit integer hash of a column's string form."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def kmv_distinct(df: DataFrame, col: str, k: int = 128) -> DataFrame:
    """KMV distinct-count sketch → one row (k_used, kth_min, est).

    `est` is computed in ROUND-TRIPPABLE double math — (k-1)*2^60 is
    exactly representable, one IEEE division, one round — so the oracle
    reproduces it bit-for-bit. If the input has fewer than k distinct
    values the sketch is exact: est = k_used."""
    mins = df.select(_h60(F.col(col)).alias("hv")).distinct().orderBy("hv").limit(k)
    return mins.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("hv").alias("kth_min"),
    ).select(
        "k_used",
        "kth_min",
        F.when(
            F.col("k_used") < k, F.col("k_used").cast("long")
        ).otherwise(
            F.round((F.lit(float(k - 1)) * F.lit(float(_U))) / F.col("kth_min").cast("double")).cast("long")
        ).alias("est"),
    )


def kmv_oracle_sql(table: str, col: str, k: int = 128) -> str:
    """The exact DuckDB mirror of kmv_distinct (same hash, same math)."""
    return f"""
WITH h AS (
  SELECT DISTINCT ('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM {table}
),
mins AS (SELECT hv FROM h ORDER BY hv LIMIT {k})
SELECT COUNT(*) AS k_used, MAX(hv) AS kth_min,
       CASE WHEN COUNT(*) < {k} THEN COUNT(*)
            ELSE CAST(round({float(k - 1)} * {float(_U)} / MAX(hv)) AS BIGINT) END AS est
FROM mins
"""


def hash_sample_quantiles(
    df: DataFrame, val_col: str, id_col: str, k: int = 256,
    qs: Sequence[float] = (0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Deterministic quantile sketch: exact quantiles of a k-row
    hash-minimum sample (the KMV idea applied to quantiles — t-digest/KLL
    give tighter bounds but are merge-order-dependent; this sample is a
    pure function of the ids, so the estimate carries an exact
    cross-engine oracle). Quantile rule: sorted sample value at index
    floor(q * (n-1)) (lower interpolation), returned as (q, value).

    Plan: TakeOrderedAndProject(k) on the hash (per-partition top-k +
    merge), then an O(k) single-partition window — bounded by k, never
    by data volume."""
    s = df.select(_h60(F.col(id_col)).alias("hv"), F.col(val_col).alias("v")).orderBy(
        "hv", "v"
    ).limit(k)
    w = Window.orderBy(F.col("v").asc(), F.col("hv").asc())
    ranked = s.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy(F.lit(1)))
    )
    spark = df.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    return (
        ranked.join(F.broadcast(qdf))
        .filter(F.col("rn") == F.floor(F.col("q") * (F.col("n") - 1)) + 1)
        .select("q", F.col("v").alias("value"))
    )


def quantile_oracle_sql(table: str, val_col: str, id_col: str, k: int = 256,
                        qs: Sequence[float] = (0.25, 0.5, 0.75, 0.9)) -> str:
    """Exact DuckDB mirror of hash_sample_quantiles."""
    qvals = ", ".join(f"({float(q)})" for q in qs)
    return f"""
WITH s AS (
  SELECT ('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT AS hv,
         {val_col} AS v
  FROM {table} ORDER BY hv, v LIMIT {k}
),
r AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v, hv) AS rn, COUNT(*) OVER () AS n FROM s
)
SELECT q.q, r.v AS value
FROM r, (VALUES {qvals}) AS q(q)
WHERE r.rn = CAST(floor(q.q * (r.n - 1)) AS BIGINT) + 1
"""


def stratified_sample(df: DataFrame, group_col: str, id_col: str, n_per_group: int) -> DataFrame:
    """Deterministic stratified sample: the n rows per group whose md5
    hash is smallest (a hash-ordered reservoir — same sample every run,
    every engine, any partitioning; never `rand()`).

    One shuffle (the group window). For a mega-group at 100 TB the
    refinement is a per-partition pre-top-k (`rank <= n` within each map
    partition) before the global window — Catalyst already plans
    row_number's sort as partial sorts, and the filter keeps at most
    n * n_partitions rows per group entering the shuffle when composed
    with `mapInPandas`-free repartition; at this tier the plain window
    is the right default."""
    w = Window.partitionBy(group_col).orderBy(_h60(F.col(id_col)).asc(), F.col(id_col).asc())
    return df.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") <= n_per_group).drop("__rk")


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: Sequence[tuple] = (("train", 90), ("val", 5), ("test", 5)),
) -> DataFrame:
    """Assign each row a deterministic split label by md5 bucket.

    `splits` is (label, weight) with integer weights; buckets 0..Σw-1
    are carved in order (train=[0,90), val=[90,95), test=[95,100) by
    default). Adds a `split` column; map-only."""
    total = sum(w for _, w in splits)
    bucket = _h60(F.col(id_col)) % total
    expr = None
    acc = 0
    for label, w in splits:
        cond = (bucket >= acc) & (bucket < acc + w)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
        acc += w
    return df.withColumn("split", expr)
