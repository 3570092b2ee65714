"""URL/host corpus profiling — the north rule's skew axis made first-class.

A Common-Crawl-style corpus is dominated by mega-hosts (the reference
pipeline salts url-host repartitioning for exactly this reason —
extract.py does the same on the write path). This module is the READ
side: per-host corpus statistics computed with the two-stage shapes that
survive a mega-host at 100 TB.

Scale design:
- `url_host` is a scan-local regexp — no shuffle.
- `host_profile` computes per-host doc counts, total chars, exact
  distinct-language counts, and the dominant language via the two-stage
  (host, lang) → host aggregation: the first groupBy spreads a
  mega-host's rows across (host, lang) cells WITH map-side combine, so
  no reducer ever sees more than one row per (host, lang) — a direct
  `countDistinct(lang)` per host would instead funnel every row of a
  mega-host through one reducer. The dominant language falls out of a
  row_number over the same cells (count desc, lang asc — fully
  deterministic), and the final per-host aggregate reuses the window's
  host partitioning (no extra shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: host part of an http(s) URL; mirrored verbatim by the DuckDB oracle
_HOST_RE = "https?://([^/]+)"


def url_host(col: Column) -> Column:
    return F.regexp_extract(col, _HOST_RE, 1)


def host_profile(
    docs: DataFrame, url_col: str = "url", lang_col: str = "lang", chars_col: str = "n_chars"
) -> DataFrame:
    """Per-host corpus profile: (host, n_docs, total_chars, n_langs,
    top_lang). Two-stage aggregation — see module docstring."""
    cells = (
        docs.select(
            url_host(F.col(url_col)).alias("host"),
            F.col(lang_col).alias("lang"),
            F.col(chars_col).alias("chars"),
        )
        .groupBy("host", "lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("chars").alias("chars"))
    )
    w = Window.partitionBy("host").orderBy(F.col("n").desc(), F.col("lang").asc())
    return (
        cells.withColumn("rk", F.row_number().over(w))
        .groupBy("host")
        .agg(
            F.sum("n").alias("n_docs"),
            F.sum("chars").alias("total_chars"),
            F.count(F.lit(1)).alias("n_langs"),
            F.max_by("lang", -F.col("rk")).alias("top_lang"),
        )
    )
