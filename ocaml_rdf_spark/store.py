"""SPO/POS-sorted triple store materialization + probe routing.

The reference's in-memory backend keeps ONE nested-map orientation
(subject → pred → objects, rdf_mem.ml) — S-bound probes are map lookups,
everything else is a scan. The north rule instead demands BOTH sort
orders as first-class materializations ("deduplicated SPO/POS-sorted
triple store as partitioned Iceberg tables", BASELINE.json:6): this
module writes them and routes each probe shape to the copy whose sort
order prunes it.

Scale notes:
- each copy is `repartition(cols[0])` + `sortWithinPartitions(cols)` —
  at 100 TB that is Iceberg `WRITE ORDERED BY`; parquet min/max stats on
  the leading sort column then prune files AND row groups for any probe
  bound on it (evidence: PushedFilters in BENCH/PLANS.md);
- writing both copies doubles storage, halves worst-case probe latency
  class from full-scan to pruned-scan — the reference pays the same
  trade in reverse (one orientation, scans for the rest);
- the router is static (probe shape → copy), no stats needed: S-bound →
  SPO; P-bound (S unbound) → POS; O-only → POS (object is its second
  sort column after pred... see ORDER_POS) — mirrors SURVEY §3 EP3.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .types import Iri, Term

ORDER_SPO = ["s_lex", "pred", "o_lex"]
ORDER_POS = ["pred", "o_lex", "s_lex"]


def write_store(triples: DataFrame, root: str, parts: int = 8) -> dict:
    """Materialize the deduped triple set as SPO- and POS-sorted parquet
    copies under `root` (Iceberg tables in production — pipeline.TableIO
    is the seam). Returns {'spo': path, 'pos': path, 'rows': n}."""
    paths = {}
    for name, order in (("spo", ORDER_SPO), ("pos", ORDER_POS)):
        path = os.path.join(root, name)
        (
            triples.repartition(parts, F.col(order[0]))
            .sortWithinPartitions(*order)
            .write.mode("overwrite")
            .parquet(path)
        )
        paths[name] = path
    n = triples.sparkSession.read.parquet(paths["spo"]).count()
    with open(os.path.join(root, "_store.json"), "w") as f:
        json.dump({"rows": n, "orders": {"spo": ORDER_SPO, "pos": ORDER_POS}}, f)
    return {**paths, "rows": n}


class TripleStore:
    """Probe-routing facade over a written store (rdf_mem.ml's map-lookup
    behavior re-realized as sorted-file pruning)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.spo = spark.read.parquet(os.path.join(root, "spo"))
        self.pos = spark.read.parquet(os.path.join(root, "pos"))

    def pick(self, sub: Optional[Term] = None, pred: Optional[Iri] = None, obj: Optional[Term] = None) -> DataFrame:
        """The copy whose leading sort column is bound: S-bound probes hit
        SPO; P- or O-bound (S unbound) hit POS; unbound scans either."""
        return self.spo if sub is not None else self.pos

    def find(self, sub: Optional[Term] = None, pred: Optional[Iri] = None, obj: Optional[Term] = None) -> DataFrame:
        """Pattern probe with pushed flat predicates on the routed copy."""
        from .graph import _term_filter

        df = self.pick(sub, pred, obj)
        for prefix, t in (("s", sub), ("pred", pred), ("o", obj)):
            if t is not None:
                for c in _term_filter(prefix, t):
                    df = df.filter(c)
        return df


def write_bucketed_store(
    triples: DataFrame, name: str, buckets: int = 8, by: str = "s_lex"
) -> str:
    """Bucketed store table via the session catalog: `bucketBy(by)` +
    sorted buckets — Spark's co-located-join surface (Iceberg's
    `WRITE DISTRIBUTED BY PARTITION` + bucket partition transform at
    production scale).

    Why it matters at 100 TB: every multi-pattern BGP join and every
    snapshot diff is keyed on a store column (s_lex for star patterns,
    the quad key for deltas). Against plain parquet, EACH such join
    shuffles BOTH sides; against a bucketed table with matching bucket
    counts, the exchange disappears entirely — the join reads co-located
    buckets (verified: tests assert no `Exchange hashpartitioning` in a
    star self-join plan). Read back with `spark.table(name)`.
    """
    order = [by] + [c for c in ORDER_SPO if c != by]
    (
        triples.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, by)
        .sortBy(*order)
        .saveAsTable(name)
    )
    return name


def compaction_plan(
    files: DataFrame, target_bytes: int, path_col: str = "path", size_col: str = "bytes"
) -> DataFrame:
    """Small-file compaction planning over a file listing
    (path, bytes, …) → (path, bytes, bin): consecutive files (path
    order) are packed into bins of ~`target_bytes` via an exclusive
    running sum — bin = cum_before div target — so every bin except
    possibly the last reaches the target before spilling to the next,
    and a file larger than the target gets a bin to itself by the same
    rule. This is the sequential variant of bin-packing (Iceberg's
    binpack rewrite sorts then packs the same way): path order keeps
    key-sorted layouts sorted after the rewrite, and the assignment is
    a pure function of the listing — the whole plan carries an exact
    SQL mirror, unlike first-fit-decreasing (whose bin choice depends
    on mutable bin state).

    One window over a constant partition: the plan is metadata-sized
    (one row per FILE, not per data row) — at 10^12 docs the listing is
    ~10^6 rows, driver-adjacent by nature; the data move it plans is
    the distributed part and stays a partitioned read→write."""
    if target_bytes <= 0:
        raise ValueError("compaction_plan: target_bytes must be positive")
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("path").asc()).rowsBetween(Window.unboundedPreceding, -1)
    return (
        files.select(F.col(path_col).alias("path"), F.col(size_col).cast("long").alias("bytes"))
        .withColumn("__cum", F.coalesce(F.sum("bytes").over(w), F.lit(0)))
        .withColumn("bin", F.expr(f"__cum div {int(target_bytes)}").cast("long"))
        .drop("__cum")
    )
