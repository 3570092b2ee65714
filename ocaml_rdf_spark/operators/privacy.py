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

from pyspark.sql import DataFrame, Window
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


# --- differentially private release counts ---------------------------------

#: noise-uniform domain: 30 bits (fits comfortably in both engines'
#: integer CASE arithmetic; 2^-30 granularity ≪ any practical ε tail)
_DP_U = 1 << 30
#: truncation half-width of the discrete-Laplace support
_DP_K = 39


def _dlap_thresholds(epsilon_ppm: int) -> list:
    """Inverse-CDF table for the TRUNCATED discrete Laplace (two-sided
    geometric) with P(X=j) ∝ exp(−ε|j|), support [−K, K], tails folded
    into ±K. Returns [(upper_u30, noise_j)] with upper bounds strictly
    increasing and the last = 2^30 — a pure lookup both engines evaluate
    with INTEGER comparisons only (the floats below are Python-side
    constants, identical in the Column expr and the SQL string)."""
    import math

    eps = epsilon_ppm / 1_000_000.0
    p = math.exp(-eps)
    weights = [p ** abs(j) for j in range(-_DP_K, _DP_K + 1)]
    total = sum(weights)
    table, acc = [], 0.0
    for j, w in zip(range(-_DP_K, _DP_K + 1), weights):
        acc += w
        table.append((min(_DP_U, round(_DP_U * acc / total)), j))
    table[-1] = (_DP_U, _DP_K)
    # dedupe zero-probability rungs (identical cumulative bound)
    out, prev = [], -1
    for u, j in table:
        if u > prev:
            out.append((u, j))
            prev = u
    return out


def dp_group_counts(
    df: DataFrame,
    group_col: str,
    epsilon_ppm: int = 1_000_000,
    publish_min: int = 10,
    seed: str = "dp1",
) -> DataFrame:
    """ε-differentially-private group counts for release alongside a
    corpus (Dwork et al. 2006; the discrete/geometric mechanism of
    Ghosh-Roughgarden-Sundararajan STOC'09 — integer noise, no floats
    at query time): count per group + discrete-Laplace noise at scale
    1/ε, then suppress noisy counts < `publish_min` (release hygiene:
    tiny noisy groups are mostly noise AND a membership surface).

    Noise is ONE deterministic draw per (seed, group) — the md5-derived
    uniform feeds a precomputed inverse-CDF lookup (truncated at ±39,
    tails folded — beyond any plausible ε tail mass). Determinism is
    the sandbox stand-in for an RNG: a release pipeline draws once per
    published statistic, and re-running the job must not re-randomize
    the release (that would spend extra privacy budget); rotating
    `seed` IS the budget spend. ε accounting is per release: publishing
    this table costs ε·(max rows a subject contributes to one group)
    — compose with a contribution cap upstream.

    **SECURITY CONTRACT — the seed is the privacy key.** The noise is
    md5(seed:group), which anyone holding the seed can recompute and
    subtract; the release is ε-DP ONLY IF the seed is (a) secret from
    every recipient of the published table and (b) never reused across
    releases (reuse = publishing correlated noise = budget re-spend).
    The default seed exists for tests and oracles; a production release
    MUST pass a caller-generated secret seed and store it with the same
    care as the raw data. Publishing with a known/default seed gives
    ZERO privacy while the column name still says "noisy".

    Output (group, noisy_n) — noisy values only, exact counts never
    leave the plan. Scale: ONE map-side-combined groupBy; the noise is
    scan-local integer CASE algebra on the group key."""
    thresholds = _dlap_thresholds(epsilon_ppm)
    u = _dp_u30(F.concat(F.lit(seed + ":"), F.col("grp").cast("string")))
    noise = None
    for upper, j in thresholds:
        cond = u < upper
        noise = F.when(cond, j) if noise is None else noise.when(cond, j)
    return (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("grp", (F.col("n") + noise).cast("long").alias("noisy_n"))
        .filter(F.col("noisy_n") >= publish_min)
    )


def _dp_u30(col: F.Column) -> F.Column:
    """Uniform 30-bit integer from the md5 of a string column (the
    sketches._h60 idiom: 8 hex chars = 32 uniform bits, folded mod 2^30 —
    a 7-char window would cover only 2^28 of the domain and skew the
    noise negative)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % _DP_U


def dp_group_counts_sql(
    table_expr: str,
    group_expr: str,
    epsilon_ppm: int = 1_000_000,
    publish_min: int = 10,
    seed: str = "dp1",
) -> str:
    """DuckDB mirror of dp_group_counts (same threshold table, same md5
    uniform); adjacent so the two evolve together."""
    thresholds = _dlap_thresholds(epsilon_ppm)
    u = (
        f"('0x' || substr(md5('{seed}:' || CAST(grp AS VARCHAR)), 1, 8))::BIGINT"
        f" % {_DP_U}"
    )
    case = "CASE " + " ".join(
        f"WHEN u < {upper} THEN {j}" for upper, j in thresholds
    ) + " END"
    return f"""
WITH g AS (
  SELECT {group_expr} AS grp, COUNT(*) AS n FROM {table_expr} GROUP BY 1
),
w AS (SELECT grp, n, {u} AS u FROM g)
SELECT grp, CAST(n + {case} AS BIGINT) AS noisy_n
FROM w
WHERE n + {case} >= {publish_min}
"""


# --- graph-release privacy -------------------------------------------------


def graph_anonymity(edges: DataFrame, max_sig_degs: int = 64) -> DataFrame:
    """Structural re-identifiability audit for a graph release (Hay et
    al. VLDB'08 — before the link graph ships next to a corpus, count
    how many nodes an adversary who knows a target's DEGREE (H1) or its
    NEIGHBORS' DEGREES (H2) can pin down; the graph analogue of
    k_anonymity_report, and k-degree anonymity's measurement side):

      level 1 signature: deg(v)
      level 2 signature: deg(v) | sorted neighbor-degree list

    Output one row per (level, sig) equivalence class: (level, sig, n,
    k_ok = n ≥ k? — here the raw class size; callers threshold). A
    class of size 1 is a uniquely re-identifiable node.

    Pinned: neighbor-degree lists sort ascending, serialize
    comma-joined; lists longer than `max_sig_degs` keep the FIRST
    `max_sig_degs` sorted entries (a mega-hub's full list is both a
    shuffle hazard and already unique — the truncation only ever MERGES
    classes, so reported uniqueness is a lower bound, stated not
    hidden).

    Scale shape: degrees are one map-side agg; H2 is one hash join
    (edge endpoint → degree) + one subject-keyed sorted-list agg
    (bounded by the truncation cap) + one signature-keyed count."""
    sym = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    adj = sym.select(F.col("a").alias("v"), F.col("b").alias("u")).unionByName(
        sym.select(F.col("b").alias("v"), F.col("a").alias("u"))
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    h1 = (
        deg.groupBy(F.col("deg").cast("string").alias("sig"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit(1).alias("level"), "sig", "n")
    )
    nbr = adj.join(deg.select(F.col("v").alias("u"), F.col("deg").alias("udeg")), "u")
    h2sig = (
        nbr.groupBy("v")
        .agg(
            F.concat_ws(
                ",",
                F.slice(
                    F.expr("transform(sort_array(collect_list(udeg)), x -> cast(x as string))"),
                    1, max_sig_degs,
                ),
            ).alias("nsig")
        )
        .join(deg, "v")
        .select(F.concat_ws("|", F.col("deg").cast("string"), F.col("nsig")).alias("sig"))
    )
    h2 = (
        h2sig.groupBy("sig").agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit(2).alias("level"), "sig", "n")
    )
    return h1.unionByName(h2)


def kdeg_cost(edges: DataFrame, k: int = 5) -> DataFrame:
    """Greedy k-degree-anonymization cost (the grouping baseline of
    Liu & Terzi SIGMOD'08: sort degrees descending, cut into runs of k
    — the last run absorbs the remainder — and raise every degree to
    its run's maximum; the Σ raised degrees is the edge-addition budget
    a release would need so every degree occurs ≥ k times). This is the
    PRICE QUOTE companion to graph_anonymity: the greedy grouping is a
    documented upper bound on the DP optimum (the DP recurrence is
    inherently sequential; the greedy quote is windowable and the bound
    direction is stated).

    Output ONE row: (k, n_nodes, n_groups, added_degree_total).

    Scale shape: one degree agg + one global sort rank (row_number over
    the degree order — the sequence is |V|-sized, one shuffle) + one
    run-keyed max/sum agg."""
    sym = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        sym.select(F.col("a").alias("v")).unionByName(sym.select(F.col("b").alias("v")))
        .groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    )
    w = Window.orderBy(F.col("deg").desc(), F.col("v").asc())
    ranked = (
        deg.withColumn("rn", F.row_number().over(w))
        .withColumn("tot", F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))))
        # runs of k; the LAST full group absorbs the remainder (no
        # driver-side count — the total rides the same global window)
        .withColumn(
            "grp",
            F.least(
                F.expr(f"(rn - 1) div {k}"),
                F.greatest(F.expr(f"tot div {k}") - 1, F.lit(0)),
            ),
        )
    )
    per_grp = ranked.groupBy("grp").agg(
        F.max("deg").alias("gmax"), F.sum("deg").alias("gsum"),
        F.count(F.lit(1)).alias("gn"),
    )
    return per_grp.agg(
        F.lit(k).alias("k"),
        F.sum("gn").cast("long").alias("n_nodes"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.col("gmax") * F.col("gn") - F.col("gsum")).cast("long").alias("added_degree_total"),
    )
