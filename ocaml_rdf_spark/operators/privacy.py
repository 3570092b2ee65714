"""Privacy / release-governance audits for tabular training metadata.

Companion to the text-side `pii_scrub` (textops.py): before a derived
table (user features, crawl metadata joined to account data, …) ships
with a corpus, the release pipeline checks the re-identification
surface of its quasi-identifier columns. The reference has no
relational layer (SURVEY §2.1; /root/reference empty per §0) — the
normative sources are Sweeney's k-anonymity (2002) and Machanavajjhala
et al.'s l-diversity (2007), both public.

- `k_anonymity_report`: per quasi-identifier equivalence class, the
  class size and (optionally) the count of distinct sensitive values —
  flagging classes below `k` (re-identifiable) and below `l`
  (attribute-disclosable even when k holds).
- `suppression_plan`: the rows that would have to be suppressed (or
  generalized) to reach k — the actionable output.

Scale shape: ONE map-side-combined groupBy on the QI columns for the
report; the plan join is a hash semi-join of rows against the
undersized classes (class list ≪ data). No windows, no Python.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    qi_cols: Sequence[str],
    k: int = 5,
    sensitive_col: Optional[str] = None,
    l: int = 2,
) -> DataFrame:
    """→ one row per QI equivalence class: (*qi_cols, n, k_ok[, n_sensitive,
    l_ok]). A release is k-anonymous iff every class has k_ok = 1, and
    l-diverse iff every class additionally has l_ok = 1."""
    qi = list(qi_cols)
    if not qi:
        raise ValueError("k_anonymity_report: need >= 1 quasi-identifier column")
    aggs = [F.count(F.lit(1)).alias("n")]
    if sensitive_col is not None:
        aggs.append(F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"))
    out = df.groupBy(*qi).agg(*aggs)
    out = out.withColumn("k_ok", (F.col("n") >= k).cast("int"))
    if sensitive_col is not None:
        out = out.withColumn("l_ok", (F.col("n_sensitive") >= l).cast("int"))
    return out


def suppression_plan(
    df: DataFrame, qi_cols: Sequence[str], id_col: str, k: int = 5
) -> DataFrame:
    """→ (id, *qi_cols, n): the rows whose QI class is smaller than `k`
    — the minimal suppression set under pure suppression (generalizing
    instead is a policy choice upstream of this operator)."""
    qi = list(qi_cols)
    small = (
        df.groupBy(*qi)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") < k)
    )
    return df.select(F.col(id_col), *qi).join(small, qi, "inner").select(
        F.col(id_col), *qi, "n"
    )
