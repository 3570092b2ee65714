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

- `hll_sketch` / `hll_estimate`: per-GROUP HyperLogLog (Flajolet et al.
  2007) built from scratch so the caveat above doesn't apply: the
  register state (max leading-zero rank per bucket, md5-derived) is a
  pure function of the input SET, and the estimator is re-specified in
  integer arithmetic (scaled alpha, power-of-two sums, integral
  division, a 64-entry linear-counting lookup embedded as literals) —
  so unlike library HLLs (`approx_count_distinct`), every output value
  carries an exact cross-engine oracle. What HLL adds over KMV: the
  state is a FIXED 64-register vector per group that merges by
  cell-wise MAX, so distinct-counts-per-key (distinct users per
  event_type, distinct URLs per host at 10^12 docs) cost ONE
  map-side-combined aggregation — KMV's per-group top-k needs a window
  sort per group. Accuracy is the standard ~1.04/√64 ≈ 13% rse tier
  (m=64 keeps the unrolled oracle tractable; production would raise p).
"""

from __future__ import annotations

import math
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


# --- HyperLogLog (deterministic, integer-exact read path) -------------------

#: m = 2^6 = 64 registers; the remaining 54 hash bits feed the rank, so
#: register values live in [1, 55] (55 = "the 54-bit window was all zeros")
_HLL_M = 64
_HLL_RMAX = 55
#: alpha_64 = 0.7213 / (1 + 1.079/64), pinned in parts-per-million so both
#: engines multiply by the same integer
_HLL_ALPHA_PPM = 709340
#: linear-counting estimates m*ln(m/V) for V = 1..64 empty registers,
#: precomputed once here and embedded as LITERALS in both the Spark
#: expression and the SQL mirror — identical by construction, no runtime ln
_HLL_LC = [round(_HLL_M * math.log(_HLL_M / v)) for v in range(1, _HLL_M + 1)]


def hll_sketch(df: DataFrame, col: str, group_cols: Sequence[str] = ()) -> DataFrame:
    """HLL register state per group: (…group_cols, r_bucket int, reg int),
    only non-empty buckets (absent bucket = register 0). reg is the max
    over the bucket's values of (leading zeros of the 54-bit hash window
    + 1) — a pure function of the value set, mergeable by MAX.

    Plan: map-only hash/bucket/rank, then ONE map-side-combined
    groupBy(group, bucket) max — per-group state is ≤ 64 rows regardless
    of input size, the mergeable-summary contract (cf. cms_sketch)."""
    g = [F.col(c) for c in group_cols]
    b = df.select(*g, _h60(F.col(col)).alias("__h")).select(
        *g,
        (F.col("__h") % _HLL_M).cast("int").alias("r_bucket"),
        F.expr(f"__h div {_HLL_M}").alias("__w"),
    )
    # bit_length via base-2 conv: exact integer path (log2 would be fp)
    rho = (
        F.when(F.col("__w") == 0, F.lit(_HLL_RMAX))
        .otherwise(F.lit(_HLL_RMAX) - F.length(F.conv(F.col("__w").cast("string"), 10, 2)))
        .cast("int")
    )
    return (
        b.select(*g, "r_bucket", rho.alias("__rho"))
        .groupBy(*group_cols, "r_bucket")
        .agg(F.max("__rho").alias("reg"))
    )


def hll_estimate(df: DataFrame, col: str, group_cols: Sequence[str] = ()) -> DataFrame:
    """HLL read path per group: (…group_cols, nb, s_sum, est).

    nb = non-empty registers; s_sum = Σ 2^(55-reg) over non-empty
    registers (the harmonic-mean denominator scaled by 2^55 — empty
    registers contribute 2^55 each, added from (64-nb)); est = the raw
    HLL estimator floor(alpha_ppm·m²·2^55 / S / 10^6) computed in
    decimal(38,0)/HUGEINT integral division, switched to the
    linear-counting table when registers are empty and the raw estimate
    is under 2.5m (the standard small-range rule, made exact by the
    64-entry literal lookup)."""
    return hll_estimate_from_sketch(hll_sketch(df, col, group_cols), group_cols)


def hll_estimate_from_sketch(sk: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """The same read path over an EXISTING register table — hll_sketch
    output, or a register fold maintained across streaming micro-batches
    (streaming.stream_hll_estimate): the sketch/read split is what makes
    the summary mergeable."""
    per = sk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("nb"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RMAX} - reg)")).alias("s_sum"),
    )
    num = _HLL_ALPHA_PPM * _HLL_M * _HLL_M
    s_total = f"(s_sum + (64 - nb) * CAST({1 << _HLL_RMAX} AS BIGINT))"
    raw = f"((CAST({num} AS DECIMAL(38,0)) * CAST({1 << _HLL_RMAX} AS DECIMAL(38,0))) div {s_total}) div 1000000"
    lc = "ARRAY(" + ", ".join(f"CAST({v} AS BIGINT)" for v in _HLL_LC) + ")[64 - nb - 1]"
    est = (
        f"CASE WHEN nb < 64 AND ({raw}) <= {5 * _HLL_M // 2} THEN {lc} ELSE {raw} END"
    )
    return per.select(*group_cols, "nb", "s_sum", F.expr(est).cast("long").alias("est"))


def hll_oracle_sql(table: str, col: str, group_cols: Sequence[str] = (),
                   estimate: bool = False) -> str:
    """Exact DuckDB mirror of hll_sketch / hll_estimate (same hash, same
    integer arithmetic; HUGEINT stands in for decimal(38,0))."""
    g = ", ".join(group_cols)
    gp = (g + ", ") if g else ""
    base = f"""
WITH h AS (
  SELECT {gp}('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM {table}
),
b AS (
  SELECT {gp}CAST(hv % {_HLL_M} AS INT) AS r_bucket, hv // {_HLL_M} AS w FROM h
),
sk AS (
  SELECT {gp}r_bucket,
         CAST(MAX(CASE WHEN w = 0 THEN {_HLL_RMAX}
                       ELSE {_HLL_RMAX} - length(bin(w)) END) AS INT) AS reg
  FROM b GROUP BY {gp}r_bucket
)"""
    if not estimate:
        return base + f"\nSELECT {gp}r_bucket, reg FROM sk"
    num = _HLL_ALPHA_PPM * _HLL_M * _HLL_M
    lc_vals = ", ".join(str(v) for v in _HLL_LC)
    return base + f""",
per AS (
  SELECT {gp}CAST(COUNT(*) AS BIGINT) AS nb,
         CAST(SUM(1::BIGINT << ({_HLL_RMAX} - reg)) AS BIGINT) AS s_sum
  FROM sk GROUP BY {g if g else "ALL"}
),
est AS (
  SELECT {gp}nb, s_sum,
         (({num}::HUGEINT * ({1 << _HLL_RMAX}::HUGEINT))
          // (s_sum + (64 - nb) * {1 << _HLL_RMAX}::HUGEINT)) // 1000000 AS raw
  FROM per
)
SELECT {gp}nb, s_sum,
       CAST(CASE WHEN nb < 64 AND raw <= {5 * _HLL_M // 2}
                 THEN ([{lc_vals}])[64 - nb]
                 ELSE raw END AS BIGINT) AS est
FROM est"""


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


def score_resample(
    df: DataFrame, id_col: str, score_col: str, max_score: int
) -> DataFrame:
    """Deterministic quality-weighted resampling: keep each row with
    probability min(score, max_score)/max_score, decided by the row's
    OWN hash — keep iff h60(id) % max_score < score. The corpus-curation
    step after quality scoring (CCNet-style buckets): high-quality docs
    survive, low-quality docs thin out proportionally, and (unlike
    `rand()`-based sampling) membership is a pure function of the id —
    stable across runs/engines/partitionings, so downstream dedup and
    splits never see a different corpus. Adds a `kept` flag rather than
    filtering, so the caller can audit the drop rate per stratum.

    Map-only; no shuffle; exact cross-engine (integer hash mod)."""
    if max_score <= 0:
        raise ValueError("score_resample: max_score must be positive")
    keep = (_h60(F.col(id_col)) % max_score) < F.least(
        F.col(score_col).cast("long"), F.lit(int(max_score))
    )
    return df.withColumn("kept", keep.cast("boolean"))


def kmv_set_ops(a: DataFrame, col_a: str, b: DataFrame, col_b: str, k: int = 128) -> DataFrame:
    """KMV sketch SET OPERATIONS (Beyer et al. 2007): estimate |A∪B| and
    |A∩B| from the two k-min-value sketches ALONE → one row
    (k_used, est_union, n_inter, est_intersect).

    Union sketch = the k smallest of sketchA ∪ sketchB (KMV's defining
    mergeability — this is how per-partition / per-day sketches combine
    without touching raw data). Intersection: ρ = |{h ∈ union-sketch :
    h ∈ A-sketch ∧ h ∈ B-sketch}| / k_used, est = round(ρ · est_union)
    — the classic audience-overlap estimator. Everything derives from
    the same deterministic 60-bit md5 hash as `kmv_distinct`, so the
    whole row is value-exact cross-engine (impossible for HLL's
    register interactions).

    Scale: each side is scan + distinct + TakeOrdered(k); the set algebra
    after that touches ≤ 2k rows of sketch state — merging n per-shard
    sketches is O(n·k), never a second pass over data."""
    ha = a.select(_h60(F.col(col_a)).alias("hv")).distinct().orderBy("hv").limit(k)
    hb = b.select(_h60(F.col(col_b)).alias("hv")).distinct().orderBy("hv").limit(k)
    union_k = ha.unionByName(hb).distinct().orderBy("hv").limit(k)
    both = ha.join(hb, "hv")  # sketch-sized hash join (≤ k rows each side)
    marked = union_k.join(both.select("hv", F.lit(1).alias("in_both")), "hv", "left")
    return marked.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("hv").alias("kth_min"),
        F.sum(F.coalesce("in_both", F.lit(0))).alias("n_inter"),
    ).select(
        "k_used",
        F.when(F.col("k_used") < k, F.col("k_used").cast("long"))
        .otherwise(
            F.round(
                (F.lit(float(k - 1)) * F.lit(float(_U))) / F.col("kth_min").cast("double")
            ).cast("long")
        )
        .alias("est_union"),
        F.col("n_inter").cast("long").alias("n_inter"),
    ).select(
        "k_used",
        "est_union",
        "n_inter",
        F.round(
            F.col("n_inter").cast("double") / F.col("k_used").cast("double")
            * F.col("est_union").cast("double")
        )
        .cast("long")
        .alias("est_intersect"),
    )


def kmv_set_ops_oracle_sql(table_a: str, col_a: str, table_b: str, col_b: str, k: int = 128) -> str:
    """Exact DuckDB mirror of kmv_set_ops (same hash, same math)."""
    return f"""
WITH ha AS (
  SELECT hv FROM (SELECT DISTINCT ('0x' || substr(md5(CAST({col_a} AS VARCHAR)), 1, 15))::BIGINT AS hv FROM {table_a}) ORDER BY hv LIMIT {k}
),
hb AS (
  SELECT hv FROM (SELECT DISTINCT ('0x' || substr(md5(CAST({col_b} AS VARCHAR)), 1, 15))::BIGINT AS hv FROM {table_b}) ORDER BY hv LIMIT {k}
),
u AS (SELECT hv FROM (SELECT hv FROM ha UNION SELECT hv FROM hb) ORDER BY hv LIMIT {k}),
m AS (
  SELECT u.hv, CASE WHEN ha.hv IS NOT NULL AND hb.hv IS NOT NULL THEN 1 ELSE 0 END AS in_both
  FROM u LEFT JOIN ha ON ha.hv = u.hv LEFT JOIN hb ON hb.hv = u.hv
),
s AS (SELECT COUNT(*) AS k_used, MAX(hv) AS kth_min, SUM(in_both) AS n_inter FROM m)
SELECT k_used,
       CASE WHEN k_used < {k} THEN k_used
            ELSE CAST(round({float(k - 1)} * {float(_U)} / kth_min) AS BIGINT) END AS est_union,
       CAST(n_inter AS BIGINT) AS n_inter,
       CAST(round(CAST(n_inter AS DOUBLE) / CAST(k_used AS DOUBLE) *
            (CASE WHEN k_used < {k} THEN k_used
                  ELSE CAST(round({float(k - 1)} * {float(_U)} / kth_min) AS BIGINT) END)) AS BIGINT) AS est_intersect
FROM s
"""


def exact_quantiles(df: DataFrame, col: str, qs: Sequence[float], buckets: int = 65536) -> DataFrame:
    """EXACT order statistics of a BIGINT column WITHOUT a global sort —
    the 2-pass histogram-refine selection (the distributed classic): →
    (q_pct, rank, value) with rank = max(1, ceil(q·n)) (1-indexed lower
    quantile: value = the rank-th smallest, ties included naturally).

    Pass 1: min/max + fixed-width bucket counts — ONE map-side-combined
    aggregation; the ≤`buckets` count rows collect to the driver
    (metadata-sized by construction). Pass 2: for each requested rank,
    the bucket holding it is known from the cumulative counts, so a
    filter prunes the scan to that bucket's rows and a
    TakeOrderedAndProject(local_rank) selects within it — top-k, never
    a full sort. Cost = 2 data passes TOTAL for ANY number of
    quantiles; a 100 TB global sort for one median is the anti-pattern
    this replaces (quantile_sketch is the 1-pass approximate tier; this
    is the exact tier when the answer must be reproducible). Degenerate
    skew (one value dominating a bucket) bounds pass 2's k by that
    bucket's count — callers widen `buckets` if a bucket exceeds
    executor memory."""
    import math

    stats = df.agg(
        F.min(col).alias("lo"), F.max(col).alias("hi"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    lo, hi, n = stats["lo"], stats["hi"], stats["n"]
    spark = df.sparkSession
    if n == 0:
        return spark.createDataFrame([], "q_pct long, rank long, value long")
    width = max(1, (int(hi) - int(lo)) // buckets + 1)
    bcounts = (
        df.select(((F.col(col) - F.lit(int(lo))) / F.lit(width)).cast("long").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    cum, acc = {}, 0
    for r in sorted(bcounts, key=lambda r: r["b"]):
        cum[r["b"]] = (acc, r["c"])  # rows before this bucket, rows in it
        acc += r["c"]
    parts = []
    for q in qs:
        rank = max(1, math.ceil(q * n))
        b = next(bb for bb, (before, c) in cum.items() if before < rank <= before + c)
        before, _c = cum[b]
        blo, bhi = int(lo) + b * width, int(lo) + (b + 1) * width
        # pass 2 stays LAZY: each quantile is a bucket-pruned
        # TakeOrderedAndProject branch; the union executes as one job
        parts.append(
            df.filter((F.col(col) >= blo) & (F.col(col) < bhi))
            .orderBy(col)
            .limit(rank - before)
            .agg(F.max(col).alias("value"))
            .select(
                F.lit(int(q * 100)).cast("long").alias("q_pct"),
                F.lit(rank).cast("long").alias("rank"),
                F.col("value").cast("long").alias("value"),
            )
        )
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out


def bloom_build(df: DataFrame, col: str, m_bits: int = 1 << 20, k: int = 4) -> DataFrame:
    """Build a Bloom filter over a column as a DataFrame of 32-bit blocks
    (blk: long, bits: long) — the crawl-history membership sketch (has
    this URL ever been fetched?) that admits a new frontier without
    joining it against the full multi-trillion-row history. Bit
    positions are md5(v ∥ ':' ∥ i) mod m for i < k — deterministic, so
    the SAME filter materializes from any partitioning and any engine;
    32-bit blocks keep every mask positive in a signed 64-bit lane (no
    sign-bit edge cases across engines).

    Scale: one distinct + one explode(k) + one map-side-combined bit_or
    per block; the filter is m/32 rows ≤ a few million for billions of
    members — broadcastable at probe time. Sizing is the standard
    m ≈ −n·ln(p)/ln(2)², k ≈ (m/n)·ln(2)."""
    vals = df.select(F.col(col).cast("string").alias("__v")).distinct()
    pos_exprs = [
        _h60(F.concat(F.col("__v"), F.lit(f":{i}"))) % int(m_bits) for i in range(int(k))
    ]
    pos = vals.select(F.explode(F.array(*pos_exprs)).alias("__p"))
    return (
        pos.select(
            (F.col("__p") / 32).cast("long").alias("blk"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 32 AS INT))").alias("__m"),
        )
        .groupBy("blk")
        .agg(F.bit_or("__m").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    id_col: str,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Probe a `bloom_build` filter: (id, maybe_seen) — maybe_seen = 1
    iff ALL k bit positions are set (Bloom's no-false-negative side
    holds by construction; false positives at the designed rate).

    Scale: candidate positions explode k-wide, the filter side is
    m/32 rows → broadcast hash join, then one id-keyed count —
    the probe never shuffles the corpus on anything but its own id."""
    pos_exprs = [
        _h60(F.concat(F.col(col).cast("string"), F.lit(f":{i}"))) % int(m_bits)
        for i in range(int(k))
    ]
    probes = df.select(
        F.col(id_col).alias("id"), F.explode(F.array(*pos_exprs)).alias("__p")
    ).select(
        "id",
        (F.col("__p") / 32).cast("long").alias("blk"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 32 AS INT))").alias("__m"),
    )
    joined = probes.join(F.broadcast(bloom), "blk", "left").withColumn(
        "__hit",
        F.when(
            F.col("bits").isNotNull() & ((F.col("bits").bitwiseAND(F.col("__m"))) != 0),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return joined.groupBy("id").agg(
        F.when(F.sum("__hit") == int(k), F.lit(1)).otherwise(F.lit(0)).alias("maybe_seen")
    )


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Z-order (Morton) interleave of two non-negative integer columns'
    low `bits` bits → BIGINT sort key — the multi-dimensional layout key
    (Iceberg/Delta `ZORDER BY`): range-partition + sort the table by
    this key and BOTH columns' min/max file statistics stay tight, so a
    predicate on EITHER dimension prunes files (a plain (host, ts) sort
    prunes only its leading column — the classic wide-table scan trap at
    100 TB). Callers bucket/offset real values into the bit budget first
    (2·bits ≤ 62 guard enforced).

    Exactness: pure bit algebra, unrolled shift/mask terms — identical
    BIGINT on every engine; value-oracled, no float anywhere."""
    if bits < 1 or 2 * bits > 62:
        raise ValueError("zorder_key: need 1 <= bits and 2*bits <= 62")
    aa = a.cast("long")
    bb = b.cast("long")
    key = F.lit(0).cast("long")
    for i in range(int(bits)):
        abit = F.shiftright(aa, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(bb, i).bitwiseAND(F.lit(1))
        key = key + F.shiftleft(abit, 2 * i + 1) + F.shiftleft(bbit, 2 * i)
    return key


def zorder_layout(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16, partitions: int = 0
) -> DataFrame:
    """Apply the Z-order layout: range-repartition on the interleaved key
    (one shuffle; range bounds from Spark's sampling) then sort each
    output file by it — every written file covers a tight Z-curve
    segment, i.e. a small rectangle in (a, b) space, which is exactly
    what per-file min/max pruning needs. `partitions=0` keeps the
    session's shuffle parallelism (AQE may coalesce)."""
    keyed = df.withColumn("__z", zorder_key(F.col(col_a), F.col(col_b), bits))
    parted = (
        keyed.repartitionByRange(int(partitions), "__z")
        if partitions
        else keyed.repartitionByRange("__z")
    )
    return parted.sortWithinPartitions("__z").drop("__z")


def weighted_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight: Column,
    k: int = 5,
) -> DataFrame:
    """Deterministic weighted k-sample WITHOUT replacement per group —
    the quality-weighted analogue of `stratified_sample` (sample better
    docs more often, but never more than once): rank every row by the
    priority key r = h div max(w, 1) with h the row's deterministic
    60-bit md5 hash, keep the k SMALLEST r per group
    (Duffield-Lund-Thorup priority sampling's w/u key, with the uniform
    in the NUMERATOR's place taken by the integer hash). Higher weight
    ⇒ stochastically smaller r ⇒ more likely sampled; weight w versus
    w' = 2w halves the expected key exactly.

    Honest statistics note: exact Efraimidis-Spirakis probabilities
    (P(i first) = w_i/Σw) need the exponential key −ln(u)/w; a libm log
    is deterministic per build but NOT bit-pinned across engines, so
    this operator uses the linear surrogate h/w — weight-monotone,
    scale-free (doubling all weights changes nothing), and bit-exact
    in DuckDB — and documents that pairwise inclusion odds are
    first-order (not exactly) proportional to weight. Pipelines needing
    exact E-S keep the same plan and swap the key expression.

    Returns (group, id, w, r, rank) for the kept rows, rank 1..k by
    (r, id). Scale shape: the hash/priority is scan-local; the ONLY
    shuffle is the group-keyed top-k window whose per-group state is k
    rows; ties are impossible in practice (md5 collisions) and pinned
    by the (r, id) order anyway — the result is a pure function of the
    data under any partitioning."""
    w_col = F.greatest(weight.cast("long"), F.lit(1))
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast("long")
    from pyspark.sql.window import Window

    # bind h/w as columns first, then derive r (single-eval discipline)
    scored = df.select(
        F.col(group_col).alias("grp"), F.col(id_col).alias("id"), w_col.alias("w"), h.alias("h")
    ).select("grp", "id", "w", F.expr("h div w").alias("r"))
    win = Window.partitionBy("grp").orderBy(F.asc("r"), F.asc("id"))
    return (
        scored.select("grp", "id", "w", "r", F.row_number().over(win).alias("rank"))
        .filter(F.col("rank") <= k)
    )


def hilbert_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Hilbert-curve index of two non-negative integer columns' low
    `bits` bits → BIGINT sort key. Same job as `zorder_key` (layout for
    multi-dimensional file pruning) with strictly better locality: the
    Hilbert curve never jumps across the grid the way the Z-curve's
    seam crossings do, so consecutive key ranges map to tighter (x, y)
    rectangles and per-file min/max stats prune harder on BOTH columns
    (the reason Delta's liquid clustering moved from Z-order to
    Hilbert). Classic bitwise xy→d walk (Wikipedia/Hacker's Delight
    form), high bit to low with quadrant rotation.

    Exactness: pure bit/CASE algebra, identical BIGINT on every engine —
    value-oracled, no float anywhere. The quadrant rotation makes a
    naively UNROLLED expression tree O(4^bits) (each level re-references
    the previous level's x and y several times — plan-time OOM by ~8
    bits), so the walk is expressed as ONE constant-size
    `aggregate(sequence(...))` fold over a struct(hx, hy, hd)
    accumulator: Catalyst evaluates the lambda iteratively per row
    inside codegen, plan size is O(1), and `bits` ≤ 16 is a value-range
    guard (2·16 bits of key), not a plan-size guard."""
    if bits < 1 or bits > 16:
        raise ValueError("hilbert_key: need 1 <= bits <= 16")
    def _sr(c, i):
        # shiftright with a COLUMN bit count (the python wrapper only
        # takes ints) — call the SQL builtin directly
        return F.call_function("shiftright", c, i.cast("int"))

    def _sl1(i):
        return F.call_function("shiftleft", F.lit(1).cast("long"), i.cast("int"))

    mask = (1 << bits) - 1
    hx = x.cast("long").bitwiseAND(F.lit(mask))
    hy = y.cast("long").bitwiseAND(F.lit(mask))
    return F.aggregate(
        F.sequence(F.lit(bits - 1).cast("long"), F.lit(0).cast("long"), F.lit(-1).cast("long")),
        F.struct(hx.alias("hx"), hy.alias("hy"), F.lit(0).cast("long").alias("hd")),
        lambda acc, i: F.struct(
            F.when(
                _sr(acc["hy"], i).bitwiseAND(F.lit(1)) == 0,
                F.when(
                    (_sr(acc["hy"], i).bitwiseAND(F.lit(1)) == 0)
                    & (_sr(acc["hx"], i).bitwiseAND(F.lit(1)) == 1),
                    _sl1(i) - 1 - acc["hy"],
                ).otherwise(acc["hy"]),
            )
            .otherwise(
                F.when(
                    (_sr(acc["hy"], i).bitwiseAND(F.lit(1)) == 0)
                    & (_sr(acc["hx"], i).bitwiseAND(F.lit(1)) == 1),
                    _sl1(i) - 1 - acc["hx"],
                ).otherwise(acc["hx"])
            )
            .alias("hx"),
            F.when(
                _sr(acc["hy"], i).bitwiseAND(F.lit(1)) == 0,
                F.when(
                    (_sr(acc["hy"], i).bitwiseAND(F.lit(1)) == 0)
                    & (_sr(acc["hx"], i).bitwiseAND(F.lit(1)) == 1),
                    _sl1(i) - 1 - acc["hx"],
                ).otherwise(acc["hx"]),
            )
            .otherwise(
                F.when(
                    (_sr(acc["hy"], i).bitwiseAND(F.lit(1)) == 0)
                    & (_sr(acc["hx"], i).bitwiseAND(F.lit(1)) == 1),
                    _sl1(i) - 1 - acc["hy"],
                ).otherwise(acc["hy"])
            )
            .alias("hy"),
            (
                acc["hd"]
                + _sl1(i + i)
                * (
                    (_sr(acc["hx"], i).bitwiseAND(F.lit(1)) * 3)
                    .bitwiseXOR(_sr(acc["hy"], i).bitwiseAND(F.lit(1)))
                ).cast("long")
            ).alias("hd"),
        ),
        lambda acc: acc["hd"],
    )


def hilbert_sql(a_expr: str, b_expr: str, bits: int = 8) -> str:
    """DuckDB mirror of `hilbert_key` (kept adjacent, the enc_sql
    precedent): returns a chain of CTE steps named h0..h{bits} that
    thread (hx, hy, hd) through the same high-to-low quadrant walk.
    Caller embeds: `WITH base AS (...), {hilbert_sql('xcol','ycol')}
    SELECT ..., hd FROM h{bits}`."""
    mask = (1 << bits) - 1
    steps = [
        f"h0 AS MATERIALIZED (SELECT *, CAST({a_expr} AS BIGINT) & {mask} AS hx, "
        f"CAST({b_expr} AS BIGINT) & {mask} AS hy, CAST(0 AS BIGINT) AS hd FROM base)"
    ]
    for n, i in enumerate(range(bits - 1, -1, -1)):
        s = 1 << i
        rx = f"((hx >> {i}) & 1)"
        ry = f"((hy >> {i}) & 1)"
        flip = f"({ry} = 0 AND {rx} = 1)"
        fx = f"(CASE WHEN {flip} THEN {s - 1} - hx ELSE hx END)"
        fy = f"(CASE WHEN {flip} THEN {s - 1} - hy ELSE hy END)"
        steps.append(
            f"h{n + 1} AS MATERIALIZED (SELECT * REPLACE ("
            f"CASE WHEN {ry} = 0 THEN {fy} ELSE {fx} END AS hx, "
            f"CASE WHEN {ry} = 0 THEN {fx} ELSE {fy} END AS hy, "
            f"hd + {s * s} * xor({rx} * 3, {ry}) AS hd) FROM h{n})"
        )
    return ",\n".join(steps)


def phi_heavy_hitters(
    occurrences: DataFrame,
    item_col: str,
    occ_id_col: str,
    k: int = 50,
    sample_mod: int = 32,
    slack: int = 2,
) -> DataFrame:
    """φ-heavy hitters, sample-and-verify (the two-pass exact form of
    Misra-Gries/SpaceSaving used when a shuffle of ALL item counts is
    the bottleneck — Manku-Motwani VLDB'02 sticky-sampling shape):
    report every item whose EXACT count exceeds N/k over an occurrence
    stream.

    Pass 1 hashes each OCCURRENCE (not item type — `occ_id_col` must be
    a per-occurrence-unique string) into a deterministic 1/`sample_mod`
    sample and keeps items whose sampled count ≥ N/(k·sample_mod·slack)
    as candidates; pass 2 counts candidates exactly (semi-join) and
    filters count > N/k. Output (item, n, share_ppm), exact values.

    Recall caveat (stated, not hidden): a true heavy hitter is missed
    only if its 1/mod occurrence sample undershoots 1/(mod·slack) of
    its ≥ N/k count — Chernoff-small (≤ exp(−N/(8k·mod)) at slack 2,
    e.g. < 10⁻⁵ for a threshold count of 1000 at mod 32) and
    deterministic given the hash (the DuckDB oracle mirrors the same
    sample, so parity is exact regardless).

    Scale shape: the full-volume shuffle carries 1/mod of occurrences;
    the exact pass shuffles only candidate-item occurrences (heavy ones
    by construction — map-side combine collapses them); N and the
    candidate set ride 1-row/tiny broadcasts."""
    occ = occurrences.select(
        F.col(item_col).alias("item"), F.col(occ_id_col).alias("occ"),
    )
    n_tot = occ.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    sampled = (
        occ.filter(_h60(F.col("occ")) % sample_mod == 0)
        .groupBy("item").agg(F.count(F.lit(1)).alias("sn"))
        .crossJoin(F.broadcast(n_tot))
        .filter(F.col("sn") * (k * sample_mod * slack) >= F.col("n_total"))
        .select("item")
    )
    return (
        occ.join(F.broadcast(sampled), "item", "left_semi")
        .groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(F.broadcast(n_tot))
        .filter(F.col("n") * k > F.col("n_total"))
        .select(
            "item", "n",
            F.expr("1000000 * n div n_total").cast("long").alias("share_ppm"),
        )
    )


def phi_heavy_hitters_sql(
    occ_cte: str, k: int = 50, sample_mod: int = 32, slack: int = 2
) -> str:
    """DuckDB mirror of phi_heavy_hitters. `occ_cte` must select
    (item, occ); adjacent so the two evolve together."""
    return f"""
WITH occ AS ({occ_cte}),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM occ),
cand AS (
  SELECT item FROM occ CROSS JOIN tot
  WHERE ('0x' || substr(md5(occ), 1, 15))::BIGINT % {sample_mod} = 0
  GROUP BY item, n_total
  HAVING COUNT(*) * {k * sample_mod * slack} >= n_total
)
SELECT item, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(1000000 * COUNT(*) // MAX(n_total) AS BIGINT) AS share_ppm
FROM occ CROSS JOIN tot
WHERE item IN (SELECT item FROM cand)
GROUP BY item, n_total
HAVING COUNT(*) * {k} > n_total
"""


def partition_stats(df: DataFrame, part_col: str, val_col: str):
    """Per-partition mergeable summaries — the statistics-maintenance
    contract for a 100 TB table: each file/partition publishes a tiny
    summary once at write time, and table-level stats are maintained by
    MERGING summaries (on ingest, compaction, or snapshot expiry),
    never by rescanning data. Returns TWO frames:

      scalars:  (part, n, vsum, vmin, vmax)      — merge by Σ/Σ/min/max
      registers:(part, r_bucket, reg)            — HLL state, merge by MAX

    Every field is mergeable-by-construction (commutative, associative,
    idempotent for min/max/reg), so any merge tree — pairwise, by
    ingest batch, hierarchical across snapshots — yields bit-identical
    table stats (merge_stats proves it against a direct full scan).

    Scale shape: ONE map-side-combined groupBy per frame; the register
    frame is ≤ 64 rows per partition regardless of partition size."""
    scalars = df.groupBy(F.col(part_col).alias("part")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(val_col).cast("long").alias("vsum"),
        F.min(val_col).cast("long").alias("vmin"),
        F.max(val_col).cast("long").alias("vmax"),
    )
    registers = hll_sketch(
        df.select(F.col(part_col).alias("part"), F.col(val_col).alias("v")),
        "v", ["part"],
    )
    return scalars, registers


def merge_stats(scalars: DataFrame, registers: DataFrame) -> DataFrame:
    """Fold partition summaries to table-level stats WITHOUT touching the
    data: (n_parts, n, vsum, vmin, vmax, nb, s_sum, est). Register
    merge = per-bucket MAX — exactly the register state a direct global
    sketch would hold, so `est` equals the direct estimate exactly (the
    merge loses nothing; that equality is the suite oracle)."""
    sc = scalars.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("n").cast("long").alias("n"),
        F.sum("vsum").cast("long").alias("vsum"),
        F.min("vmin").cast("long").alias("vmin"),
        F.max("vmax").cast("long").alias("vmax"),
    )
    merged = registers.groupBy("r_bucket").agg(F.max("reg").alias("reg"))
    est = hll_estimate_from_sketch(merged, ())
    return sc.crossJoin(F.broadcast(est))


def zonemap_prune(stats: DataFrame, lo: int, hi: int) -> DataFrame:
    """Zone-map (min/max) file-skipping simulator — the reader-side
    payoff of partition_stats and the statistic that justifies zorder/
    hilbert/compaction work: for a range predicate val ∈ [lo, hi], a
    file is SKIPPED iff its zone [vmin, vmax] misses the range entirely
    (vmax < lo or vmin > hi) — exactly the parquet row-group /
    Iceberg manifest pruning rule.

    Input: per-file stats (layout, part, n, vmin, vmax) — multiple
    layouts compare side by side, which is the point: the same rows
    clustered by the predicate column prune almost everything, scattered
    layouts prune nothing. Output per layout: (layout, n_files,
    files_scanned, rows_total, rows_scanned, skip_ppm) with skip_ppm =
    10⁶·(rows_total − rows_scanned) div rows_total.

    Scale shape: stats are metadata (one row per file — 10⁵ rows for a
    10-PB table), so this is ONE tiny agg; the simulated scan it prices
    would be the 100 TB one."""
    hit = ~((F.col("vmax") < lo) | (F.col("vmin") > hi))
    return (
        stats.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(hit.cast("int")).cast("long").alias("files_scanned"),
            F.sum("n").cast("long").alias("rows_total"),
            F.sum(F.when(hit, F.col("n")).otherwise(0)).cast("long").alias("rows_scanned"),
        )
        .withColumn(
            "skip_ppm",
            F.expr("1000000 * (rows_total - rows_scanned) div rows_total").cast("long"),
        )
    )


def overlap_depth(stats: DataFrame) -> DataFrame:
    """Zone-overlap clustering quality — the metric behind OPTIMIZE
    decisions (Delta/Iceberg call it clustering depth): how many OTHER
    files' [vmin, vmax] zones overlap each file's zone. avg ≈ 0 means
    the layout is range-clustered and zone maps will prune; avg ≈
    n_files means zones all overlap and min/max stats are useless —
    re-cluster (zorder_layout / compaction_plan) before relying on
    skipping.

    overlaps(f) = |{g : g.vmin ≤ f.vmax ∧ g.vmax ≥ f.vmin}| − 1,
    computed WITHOUT an interval self-join (even metadata deserves hash
    shapes): sort-position counting —
    starts_le(f.vmax) − ends_lt(f.vmin) − 1 via two event/probe window
    passes per layout over the unioned endpoint stream. Exact integers.

    Output per layout: (layout, n_files, avg_overlap_x100, max_overlap).
    """
    def _count_passes(probe_col: str, event_col: str, strict: bool, out: str) -> DataFrame:
        # events: each file's event_col value; probes: each file's
        # probe_col value. Result per file: # events ≤ probe (or < probe
        # when strict) within the layout.
        ev = stats.select("layout", F.col(event_col).alias("v")).withColumn(
            "__is_probe", F.lit(0)
        ).withColumn("part", F.lit(None).cast(stats.schema["part"].dataType))
        pr = stats.select("layout", "part", F.col(probe_col).alias("v")).withColumn(
            "__is_probe", F.lit(1)
        )
        # order: value asc; at equal value, events BEFORE probes when
        # counting ≤ (inclusive: is_probe 0 first → asc), probes BEFORE
        # events when counting < (strict: is_probe 1 first → desc)
        tie = F.col("__is_probe").desc() if strict else F.col("__is_probe").asc()
        w = (
            Window.partitionBy("layout")
            .orderBy(F.col("v").asc(), tie)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cnt = F.sum(F.lit(1) - F.col("__is_probe")).over(w)
        return (
            ev.unionByName(pr)
            .withColumn("__c", cnt)
            .filter(F.col("__is_probe") == 1)
            .select("layout", "part", F.col("__c").alias(out))
        )

    starts = _count_passes("vmax", "vmin", strict=False, out="starts_le")
    ends = _count_passes("vmin", "vmax", strict=True, out="ends_lt")
    per_file = stats.select("layout", "part").join(starts, ["layout", "part"]).join(
        ends, ["layout", "part"]
    ).withColumn("ov", F.col("starts_le") - F.col("ends_lt") - 1)
    return per_file.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.expr("100 * sum(ov) div count(1)").cast("long").alias("avg_overlap_x100"),
        F.max("ov").cast("long").alias("max_overlap"),
    )
