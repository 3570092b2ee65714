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
