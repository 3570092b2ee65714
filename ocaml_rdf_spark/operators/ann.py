"""Similarity search over an embedding column (`array<float>`).

Two tiers, per the driver's training-data mandate:
- `cosine_topk`: brute-force exact cosine top-k — the baseline/oracle
  path. Pure `F.aggregate`/`F.zip_with` (JVM, codegen; no Python).
- `lsh_topk`: sign-random-hyperplane LSH bucketing — the 100 TB path.
  Hyperplanes are derived deterministically from md5 (no RNG state to
  ship), candidates come only from the probe's bucket (+ optional
  multi-probe neighbors), so the join is bucket-local instead of a full
  cross join. At 10^12 vectors brute force is O(N) per query; LSH probes
  O(N / 2^bits) per query and the bucket table can be an Iceberg table
  partitioned by bucket id.

All cosine math is done in double after an exact float→double widening;
scores exposed as integers ×10^4 (engine-portable, no double formatting).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

import hashlib


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(vectors: DataFrame, query_id: int, k: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors of `query_id` over
    vectors(vec_id, embedding) → (vec_id, sim_x1e4) ordered by similarity.

    The 1-row query side is crossJoin-broadcast (Catalyst turns a 1-row
    cross join into BroadcastNestedLoopJoin); ranking is sort+limit →
    TakeOrderedAndProject, no full sort.
    """
    q = vectors.filter(F.col("vec_id") == query_id).select(F.col("embedding").alias("q_emb"))
    scored = (
        vectors.filter(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("q_emb")) * 10000).cast("long").alias("sim_x1e4"),
        )
    )
    return scored.orderBy(F.desc("sim_x1e4"), F.asc("vec_id")).limit(k)


def hyperplane_sign(emb: Column, plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane: component d of plane p is
    ±1 from one md5 hex digit of 'p:d'. sign = (emb · plane) >= 0."""
    comps = F.array(
        [
            F.when(F.lit(int(hashlib.md5(f"{plane}:{d}".encode()).hexdigest()[0], 16) % 2) == 1, F.lit(1.0)).otherwise(F.lit(-1.0))
            for d in range(dim)
        ]
    )
    return (_dot(emb, comps) >= 0).cast("int")


def lsh_bucket(emb: Column, bits: int, dim: int) -> Column:
    """Bucket id from `bits` hyperplane signs (0 .. 2^bits-1)."""
    b = F.lit(0)
    for p in range(bits):
        b = b * 2 + hyperplane_sign(emb, p, dim)
    return b


def lsh_topk(vectors: DataFrame, query_id: int, k: int = 10, bits: int = 4, dim: int = 64) -> DataFrame:
    """Approximate top-k: restrict the exact scorer to the query's LSH
    bucket. Recall < 1 by construction; the scale path trades it for a
    2^bits candidate reduction. → (vec_id, sim_x1e4)."""
    with_b = vectors.withColumn("bucket", lsh_bucket(F.col("embedding"), bits, dim))
    qrow = with_b.filter(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("q_emb"), F.col("bucket").alias("q_bucket")
    )
    cand = (
        with_b.filter(F.col("vec_id") != query_id)
        .join(F.broadcast(qrow), F.col("bucket") == F.col("q_bucket"))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("q_emb")) * 10000).cast("long").alias("sim_x1e4"),
        )
    )
    return cand.orderBy(F.desc("sim_x1e4"), F.asc("vec_id")).limit(k)


def knn_join_centroids(vectors: DataFrame, n_clusters: int = 16) -> DataFrame:
    """IVF-style coarse assignment without ML deps: centroid c of cluster i
    is the mean embedding of vec_id % n_clusters == i (deterministic
    partition → stable 'centroids'), then every vector is assigned to its
    nearest centroid. Returns (vec_id, cluster). This is the index-build
    stage of an IVF ANN index; probe-time search scans only the closest
    cluster(s)."""
    seeded = vectors.withColumn("seed_cluster", (F.col("vec_id") % n_clusters).cast("int"))
    cents = (
        seeded.select("seed_cluster", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("seed_cluster", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
        .groupBy("seed_cluster")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("seed_cluster", F.transform("pc", lambda s: s["c"]).alias("centroid"))
    )
    assigned = (
        vectors.crossJoin(F.broadcast(cents))
        .select("vec_id", "seed_cluster", cosine(F.col("embedding"), F.col("centroid")).alias("sim"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("seed_cluster"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("seed_cluster").alias("cluster"))
    )
    return assigned


def near_dup_pairs(vectors: DataFrame, threshold_x1e4: int = 8000, max_id: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) with
    cosine ≥ threshold — the exact/oracle tier of embedding dedup
    (complements the text-side MinHash/SimHash in textops.py).

    This brute form is O(N²) and only for bounded candidate sets
    (`max_id` caps it); at 10^12 vectors use `near_dup_pairs_lsh`, which
    restricts the self-join to LSH buckets, turning the cross join into a
    bucket-local equi-join (shuffle on bucket id, each bucket small).
    → (id_a, id_b, sim_x1e4).
    """
    v = vectors if max_id is None else vectors.filter(F.col("vec_id") < max_id)
    a = v.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"))
    b = v.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")) * 10000).cast("long").alias("sim_x1e4"),
        )
        .filter(F.col("sim_x1e4") >= threshold_x1e4)
    )


def near_dup_pairs_lsh(
    vectors: DataFrame, threshold_x1e4: int = 8000, bits: int = 4, dim: int = 64
) -> DataFrame:
    """Scale path for embedding near-dup: same-bucket candidate pairs only.
    The self-join key is the LSH bucket (equi-join, AQE-skew-safe), so cost
    is Σ bucket² instead of N²; recall misses pairs split across buckets
    (multi-probe or more tables recover them). → (id_a, id_b, sim_x1e4)."""
    wb = vectors.select("vec_id", "embedding", lsh_bucket(F.col("embedding"), bits, dim).alias("bucket"))
    a = wb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"), "bucket")
    b = wb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")) * 10000).cast("long").alias("sim_x1e4"),
        )
        .filter(F.col("sim_x1e4") >= threshold_x1e4)
    )


# ---------------------------------------------------------------------------
# integer-exact Lloyd k-means + SemDeDup
# ---------------------------------------------------------------------------


def _quantize(emb: Column, scale: int) -> Column:
    """Exact float→int component quantization (round(x·scale) as BIGINT).
    All distance/centroid math downstream is integer (or floor-of-exact),
    so Spark and the SQL oracle agree bit-for-bit — unlike avg-of-double
    centroid updates, whose result depends on aggregation order."""
    return F.transform(emb, lambda x: F.round(x.cast("double") * scale).cast("long"))


def _sqdist(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans_int(
    vectors: DataFrame, k: int = 8, iters: int = 2, scale: int = 1000
) -> DataFrame:
    """Lloyd k-means over the embedding column in exact integer arithmetic
    (components quantized ×`scale`): deterministic init (centroid i := the
    vector with vec_id == i), argmin of integer squared-L2 with min-cluster
    tiebreak, centroid update = elementwise floor(mean) (sums ≪ 2^53, so
    the floor is exact in both engines). `iters` is a static unroll — each
    round is one broadcast join + one centroid aggregation, which is the
    shape Lloyd has at 10^12 rows too (k·dim is tiny; the data never
    re-partitions).

    → (vec_id, cluster int). Fully SQL-expressible, so the oracle replays
    the identical iterations in DuckDB CTEs."""
    q = vectors.select("vec_id", _quantize(F.col("embedding"), scale).alias("qe"))
    cents = q.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cl"), F.col("qe").alias("ce")
    )
    for _ in range(iters):
        assigned = (
            q.crossJoin(F.broadcast(cents))
            .groupBy("vec_id")
            .agg(F.min(F.struct(_sqdist(F.col("qe"), F.col("ce")).alias("d"), F.col("cl"))).alias("m"))
            .select("vec_id", F.col("m.cl").alias("cl"))
        )
        cents = (
            q.join(assigned, "vec_id")
            .select("cl", F.posexplode("qe").alias("pos", "v"))
            .groupBy("cl", "pos")
            .agg(F.floor(F.avg(F.col("v").cast("double"))).alias("c"))
            .groupBy("cl")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
            .select("cl", F.transform("pc", lambda s: s["c"]).alias("ce"))
        )
    final = (
        q.crossJoin(F.broadcast(cents))
        .groupBy("vec_id")
        .agg(F.min(F.struct(_sqdist(F.col("qe"), F.col("ce")).alias("d"), F.col("cl"))).alias("m"))
        .select("vec_id", F.col("m.cl").alias("cluster"))
    )
    return final


def semdedup_keep(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    scale: int = 1000,
    threshold_x1e4: int = 9000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings with k-means, then
    within each cluster drop every vector that has a LOWER-id cluster-mate
    with cosine ≥ threshold (the kept one is the min id of each semantic
    duplicate group reachable by such an edge chain's first hop — the
    paper's 'keep one per ε-ball', made deterministic by id order).

    → (vec_id, cluster, keep ∈ {0,1}). The pairwise stage is
    cluster-local: Σ cluster² ≪ N², same bound as the LSH bucket join —
    the k-means index IS what makes semantic dedup feasible at 10^12
    vectors; a global pair join would be O(N²).

    100 TB: cluster sizes are balanced by Lloyd itself (mega-clusters →
    raise k or sub-cluster recursively); the pair join is an equi-join on
    cluster so AQE skew-split applies."""
    assigned = kmeans_int(vectors, k=k, iters=iters, scale=scale).join(vectors, "vec_id")
    a = assigned.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"), "cluster"
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"), "cluster"
    )
    dup_edges = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(cosine(F.col("emb_a"), F.col("emb_b")) * 10000).cast("long")
            >= threshold_x1e4
        )
        .select(F.col("id_b").alias("vec_id"))
        .dropDuplicates()
        .withColumn("dropped", F.lit(1))
    )
    return (
        assigned.join(dup_edges, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.when(F.col("dropped").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("keep"),
        )
    )


def bitext_margin(
    src: DataFrame,
    dst: DataFrame,
    k: int = 4,
    margin_ppm_threshold: int = 1000000,
) -> DataFrame:
    """Margin-scored cross-set alignment (Artetxe & Schwenk, ACL 2019 —
    the bitext-mining criterion behind CCMatrix/LASER parallel-corpus
    construction): a source doc aligns to a target doc when their cosine
    similarity stands out RELATIVE to each side's neighborhood,

        margin(x, y) = 2·cos(x, y) / (avg_k(x→dst) + avg_k(y→src)),

    which kills hub vectors that are merely close to everything.

    Integer-exact cross-engine recipe: each cosine rounds to ×1e8 BEFORE
    any summation (double sums are order-sensitive; integer sums are
    not), avg_k stays as the integer SUM over exactly k neighbors
    (row_number window, sim DESC / id ASC tiebreak), and

        margin_ppm = (2k · sim_x1e8 · 1e6) div (sumk(x) + sumk(y)).

    Output: top-1 target per source with margin_ppm ≥ threshold →
    (src_id, dst_id, sim_x1e8, margin_ppm).

    Scale: the suite runs the exact tier (bounded all-pairs — the same
    documented bound as near_dup_pairs); production swaps candidate
    generation to the sign-LSH bucket join (`lsh_bucket`) and computes
    margins only over candidates, which is exactly how the published
    pipelines run it at corpus scale."""
    from pyspark.sql.window import Window

    a = src.select(F.col("vec_id").alias("src_id"), F.col("embedding").alias("src_emb"))
    b = dst.select(F.col("vec_id").alias("dst_id"), F.col("embedding").alias("dst_emb"))
    pairs = a.crossJoin(b).select(
        "src_id",
        "dst_id",
        F.round(cosine(F.col("src_emb"), F.col("dst_emb")) * 1e8).cast("long").alias("sim_x1e8"),
    )
    pairs = pairs.localCheckpoint(eager=False)  # 3 consumers below

    wsrc = Window.partitionBy("src_id").orderBy(F.desc("sim_x1e8"), F.asc("dst_id"))
    wdst = Window.partitionBy("dst_id").orderBy(F.desc("sim_x1e8"), F.asc("src_id"))
    sumk_src = (
        pairs.withColumn("rn", F.row_number().over(wsrc))
        .filter(F.col("rn") <= k)
        .groupBy("src_id")
        .agg(F.sum("sim_x1e8").alias("sumk_src"))
    )
    sumk_dst = (
        pairs.withColumn("rn", F.row_number().over(wdst))
        .filter(F.col("rn") <= k)
        .groupBy("dst_id")
        .agg(F.sum("sim_x1e8").alias("sumk_dst"))
    )
    scored = (
        pairs.join(sumk_src, "src_id")
        .join(sumk_dst, "dst_id")
        .withColumn(
            "margin_ppm",
            F.expr(
                f"CASE WHEN sumk_src + sumk_dst = 0 THEN NULL "
                f"ELSE CAST(2 * {k} * sim_x1e8 * 1000000 AS BIGINT) div (sumk_src + sumk_dst) END"
            ),
        )
    )
    wtop = Window.partitionBy("src_id").orderBy(
        F.desc("margin_ppm"), F.desc("sim_x1e8"), F.asc("dst_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(wtop))
        .filter((F.col("rn") == 1) & (F.col("margin_ppm") >= margin_ppm_threshold))
        .select("src_id", "dst_id", "sim_x1e8", "margin_ppm")
    )


def _jl_signs(j: int, dim: int) -> list:
    """Deterministic ±1 row j of the projection matrix — one md5 hex
    digit per (j, d), the hyperplane_sign convention."""
    return [
        1.0 if int(hashlib.md5(f"jl:{j}:{d}".encode()).hexdigest()[0], 16) % 2 == 1 else -1.0
        for d in range(dim)
    ]


def jl_project(vectors: DataFrame, out_dim: int = 8, dim: int = 64) -> DataFrame:
    """Johnson-Lindenstrauss random projection with a deterministic ±1
    (Achlioptas 2003) matrix → (vec_id, proj array<double>): the
    embedding-compression step before storing/joining 100 TB of vectors —
    pairwise distances survive within (1±ε) at out_dim = O(log n / ε²),
    and every downstream ANN/near-dup operator here runs unchanged on
    the projected column at dim/out_dim of the IO.

    Determinism contract: matrix entries are md5-derived (the
    hyperplane_sign convention — no RNG state, reproducible across
    sessions/engines); each output component is the package's standard
    left-fold dot product, bit-identical to DuckDB's list_dot_product,
    so the projection is value-oracle-able cross-engine with zero
    tolerance. (Scaling by 1/√out_dim is deliberately NOT applied —
    a constant factor is irrelevant to cosine/top-k and would cost
    exactness; documented.)

    Scale: map-only (zero shuffles) — out_dim fused dot products per
    row inside one projection, whole-stage codegen'd."""
    comps = [
        F.array([F.lit(v) for v in _jl_signs(j, dim)]) for j in range(int(out_dim))
    ]
    return vectors.select(
        "vec_id",
        F.array([_dot(F.col("embedding"), c) for c in comps]).alias("proj"),
    )


def pq_encode(
    vectors: DataFrame,
    dim: int = 64,
    m: int = 2,
    k: int = 4,
    iters: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """Product-quantization codes (Jégou et al. TPAMI'11 — THE vector
    compression behind billion-scale ANN indexes: split each embedding
    into `m` sub-blocks, k-means each block independently, store one
    byte-ish code per block; 64 floats → m codes, and asymmetric
    distance at query time reads a k×m lookup table instead of the
    vector): per block b, `kmeans_int` (already integer-exact and
    oracle-replayable) runs on the block SLICE with its deterministic
    vec_id<k init, and the block's cluster id becomes code_b. Returns
    (vec_id, code_0, …, code_{m-1}).

    Compression story at 100 TB: with m=8, k=256, a 64-dim float vector
    (256 B) becomes 8 bytes — the difference between an embedding table
    that fits executor memory and one that doesn't; JL (`jl_project`)
    shrinks dimensionality, PQ shrinks BYTES PER DIM; IVF (`ann_ivf`)
    prunes candidates — the three compose into the standard IVF-PQ
    stack. Scale shape: m independent audited k-means plans (k·block
    tiny → broadcast assignment joins), one m-way vec_id hash join to
    zip codes; the suite uses m=2, k=4 so the oracle stays a readable
    2-block CTE replay.

    `dim` must equal the embedding length and divide by `m` (checked;
    silent ragged blocks would desync the oracle)."""
    if dim % m != 0:
        raise ValueError("pq_encode: dim must be divisible by m")
    bd = dim // m
    out = None
    for b in range(m):
        sub = vectors.select(
            "vec_id", F.slice(F.col("embedding"), b * bd + 1, bd).alias("embedding")
        )
        codes = kmeans_int(sub, k=k, iters=iters, scale=scale).select(
            "vec_id", F.col("cluster").alias(f"code_{b}")
        )
        out = codes if out is None else out.join(codes, "vec_id")
    return out
