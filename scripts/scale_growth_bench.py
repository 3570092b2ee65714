"""10x scale-growth datapoint for the iterative families (r3 VERDICT
task 7): measure pagerank / kcore / ppr_push / dbscan at sf0.1 AND at a
synthesized 10x ("sf1") input, and report per-query scaling exponents
alpha = log(t_10x / t_1x) / log(10)  (alpha = 1 -> linear, < 1 ->
sublinear fixed-round behavior, > 1 -> super-linear, needs an
explanation or a fix).

The 10x input is synthesized deterministically from sf0.1 (no external
data): customer/supplier replicated 10x with non-overlapping shifted
keys (replica i adds i * 10_000_000 -- chains stay intact within each
replica, no cross-replica edges), nation/region copied. This is the
honest 10x for the graph queries: edges scale 10x, structure preserved.

DBSCAN is special-cased: q_dbscan_venues derives coordinates mod a FIXED
100k x 100k area, so 10x points = 10x density = ~100x neighbor pairs --
a quadratic blowup inherent to fixed-area densification, not a plan
defect (the pair count IS the algorithm's output lower bound). The
scale-study therefore runs grid_dbscan at CONSTANT density (area scaled
10x with the points, radius unchanged) -- what a 10x crawl of new
geography actually looks like -- and records the fixed-area variant's
quadratic shape as a documented property.

r5 extension (VERDICT r4 task 6): the dedup/ER family gets the same
measured 10x point — dedup_minhash / dedup_clusters / span_dedup /
semdedup / incr_dedup over synthesized 10x documents/embeddings. The
synthesis rule matters: replicating text VERBATIM would make every doc a
10-way cross-replica near-dup (pair output ~45x, an output-bound
quadratic like fixed-area DBSCAN, not a plan property). A real 10x crawl
is mostly NEW content at the same dup-rate, so replica i applies a
deterministic letter-rotation (translate over 'etaoinshrdlu') — within-
replica dup structure identical, cross-replica Jaccard collapses — and
embeddings rotate their dimensions per replica (norms and within-replica
geometry preserved, cross-replica cosine decorrelated).

Usage: python scripts/scale_growth_bench.py  (writes JSON to stdout;
wall-clock ~10-20 min at local[32]). ORDS_SCALE_SET=graph|dedup|all
picks the query families (default all).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = "/root/testdata/sf0.1"
FACTOR = 10
ROUNDS = int(os.environ.get("ORDS_SCALE_ROUNDS", "3"))


def build_scaled(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    cu = spark.read.parquet(f"{SF1}/customer.parquet")
    su = spark.read.parquet(f"{SF1}/supplier.parquet")
    reps = spark.range(FACTOR).select((F.col("id") * 10_000_000).alias("off"))
    (
        cu.crossJoin(reps)
        .withColumn("c_custkey", F.col("c_custkey") + F.col("off"))
        .drop("off")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/customer.parquet")
    )
    (
        su.crossJoin(reps)
        .withColumn("s_suppkey", F.col("s_suppkey") + F.col("off"))
        .drop("off")
        .repartition(8)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/supplier.parquet")
    )
    for t in ("nation", "region"):
        spark.read.parquet(f"{SF1}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )

    # documents: per-replica letter-rotation keeps within-replica dup
    # structure byte-exact while cross-replica shingles diverge
    alpha = "etaoinshrdlu"
    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    parts = []
    for i in range(FACTOR):
        rot = alpha[i:] + alpha[:i]
        parts.append(
            docs.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                F.translate(F.col("text"), alpha, rot).alias("text"),
                "lang", "source", "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    # embeddings: rotate dimensions per replica (within-replica geometry
    # preserved, cross-replica cosine decorrelated)
    emb = spark.read.parquet(f"{SF1}/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    eparts = []
    for i in range(FACTOR):
        rot_expr = (
            "embedding" if i == 0
            else f"concat(slice(embedding, {i + 1}, {dim - i}), slice(embedding, 1, {i}))"
        )
        eparts.append(
            emb.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                F.expr(rot_expr).alias("embedding"),
                "label",
            )
        )
    eout = eparts[0]
    for p in eparts[1:]:
        eout = eout.unionByName(p)
    eout.repartition(16).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def dbscan_const_density(spark, n_reps: int):
    """grid_dbscan over constant-density points: each replica occupies its
    own 100k-wide band (area scales with points, radius fixed)."""
    from pyspark.sql import functions as F

    from ocaml_rdf_spark.operators.spatial import grid_dbscan

    cu = spark.read.parquet(f"{SF1}/customer.parquet")
    k = F.col("c_custkey").cast("long")
    reps = spark.range(n_reps).select(F.col("id").alias("band"))
    pts = (
        cu.crossJoin(reps)
        .select(
            (k + F.col("band") * 10_000_000).alias("id"),
            ((k * 48271) % 100000 - 50000 + F.col("band") * 100000).alias("x"),
            ((k * 69621) % 100000 - 50000).alias("y"),
        )
    )
    return grid_dbscan(pts, radius=8000, min_pts=3)


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from ocaml_rdf_spark.session import get_spark
    from ocaml_rdf_spark.suite import QUERIES

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="ords-scale-growth", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    sfx_dir = tempfile.mkdtemp(prefix="ords_sf1_")
    try:
        build_scaled(spark, sfx_dir)

        def timed(fn, *args):
            ts = []
            for _ in range(ROUNDS):
                t0 = time.time()
                fn(*args).count()
                ts.append(time.time() - t0)
            return round(statistics.median(ts), 3)

        out = {"factor": FACTOR, "cpus": cpus, "rounds": ROUNDS, "queries": {}}
        import math

        qset = os.environ.get("ORDS_SCALE_SET", "all")
        names = []
        if qset in ("graph", "all"):
            names += ["pagerank", "kcore", "ppr_push"]
        if qset in ("dedup", "all"):
            names += ["dedup_minhash", "dedup_clusters", "span_dedup",
                      "semdedup", "incr_dedup"]
        if qset in ("new", "all"):
            # r5 additions. topo_order's multiply-DAG depth on the 10x
            # replicated keys stays <= 14 (every edge doubles the composite
            # key value and must land inside a band), under the 16-round
            # budget; densest_core runs its fixed 20 peel rounds over 10x
            # edges (clique plant is replica-0-only by the key cap).
            # textrank reads documents: the letter-rotation 10x corpus,
            # token-linear work -> alpha ~ 1 expected
            names += ["topo_order", "densest_core", "textrank"]
        for name in names:
            q = QUERIES[name][0]
            t1 = timed(q, spark, SF1)
            t10 = timed(q, spark, sfx_dir)
            out["queries"][name] = {
                "t_sf01": t1,
                "t_sf1": t10,
                "alpha": round(math.log(t10 / t1) / math.log(FACTOR), 3),
            }
        if qset in ("graph", "all"):
            t1 = timed(dbscan_const_density, spark, 1)
            t10 = timed(dbscan_const_density, spark, FACTOR)
            out["queries"]["dbscan_const_density"] = {
                "t_sf01": t1,
                "t_sf1": t10,
                "alpha": round(math.log(t10 / t1) / math.log(FACTOR), 3),
            }
        print(json.dumps(out))
    finally:
        shutil.rmtree(sfx_dir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
