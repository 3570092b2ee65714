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

Usage: python scripts/scale_growth_bench.py  (writes JSON to stdout;
wall-clock ~10-20 min at local[32]).
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

        for name in ("pagerank", "kcore", "ppr_push"):
            q = QUERIES[name][0]
            t1 = timed(q, spark, SF1)
            t10 = timed(q, spark, sfx_dir)
            out["queries"][name] = {
                "t_sf01": t1,
                "t_sf1": t10,
                "alpha": round(math.log(t10 / t1) / math.log(FACTOR), 3),
            }
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
