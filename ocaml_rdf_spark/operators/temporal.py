"""Temporal join operators: as-of join and bounded range join.

The reference is a batch RDF library with no temporal operators
(SURVEY §2.9); these are engine-side additions in the training-data-ops
family — the two joins every event/feature pipeline needs and vanilla
Spark lacks as primitives (Spark can only express them as inequality
joins, which plan as nested-loop/cartesian shapes).

Scale design — both operators are ONE hash shuffle, never a BNLJ:

- `asof_join`: the classic union+sort formulation. Tag both inputs,
  union them, and carry the latest right-side payload forward with a
  single `last(ignorenulls)` window over (keys) ordered by (ts, side).
  One shuffle on the keys; per-key state is a sort, exactly what a
  1000-executor run wants (the MergeJoin-free equivalent of pandas
  `merge_asof` / DuckDB ASOF JOIN). Strict inequality (right.ts <
  left.ts) falls out of the tie-break ordering: left rows sort BEFORE
  right rows at equal ts, so an equal-ts right row is never visible.

- `range_join`: right rows with ts in [left.ts+lower, left.ts+upper)
  per key. Implemented by BINNING: both sides bucket ts into
  width = (upper-lower) bins; each left row probes its (at most two)
  overlapping bins via a tiny `sequence`+`explode`, then an EQUI-join
  on (keys, bin) + an exact range filter. The inequality never reaches
  the join condition, so Catalyst plans a hash join; bin width tied to
  the window span bounds the fan-out at 2x regardless of data volume.

Both require the right side to be unique per (keys, ts) when payload
determinism matters — pre-aggregate ties (e.g. max event_id per
(user, ts)) before calling, as the suite queries do.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _epoch(col):
    # parquet naive timestamps arrive as TIMESTAMP_NTZ; LTZ-cast under the
    # UTC session tz (session.py) makes epoch math exact and portable
    return F.unix_micros(col.cast("timestamp_ltz"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: Optional[Sequence[str]] = None,
    how: str = "inner",
) -> DataFrame:
    """Backward as-of join: each left row picks the right row with the
    greatest right_ts strictly below its left_ts (per key). Right payload
    columns come back `<name>_asof`; `how="left"` keeps unmatched left
    rows with NULL payload, `"inner"` drops them (DuckDB ASOF JOIN
    default, which the oracle mirrors)."""
    on = list(on)
    pay = [c for c in (payload or right.columns) if c not in on and c != right_ts]
    pstruct = F.struct(
        F.col(right_ts).alias(f"{right_ts}_asof"), *[F.col(c).alias(f"{c}_asof") for c in pay]
    )
    r = right.select(*on, F.col(right_ts).alias("__ats"), F.lit(1).alias("__side"), pstruct.alias("__p"))
    l = (
        left.withColumn("__ats", F.col(left_ts))
        .withColumn("__side", F.lit(0))
        .withColumn("__p", F.lit(None).cast(r.schema["__p"].dataType))
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # left __side=0 sorts before right __side=1 at equal ts → strict <
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ats").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 0)
    if how == "inner":
        out = out.filter(F.col("__m").isNotNull())
    return out.select(*left.columns, F.col("__m.*"))


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: int = -3600,
    upper_s: int = 0,
    payload: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Bounded range join: pairs (l, r) sharing `on` keys with
    r.right_ts in [l.left_ts + lower_s, l.left_ts + upper_s) seconds
    (half-open; lower_s/upper_s may be negative = look-back). Binned
    equi-join — see module docstring. Right payload columns come back
    `<name>_r`."""
    if upper_s <= lower_s:
        raise ValueError("range_join: require upper_s > lower_s")
    on = list(on)
    width_us = (upper_s - lower_s) * 1_000_000
    pay = [c for c in (payload or right.columns) if c not in on]
    r = right.select(
        *on,
        F.floor(_epoch(F.col(right_ts)) / width_us).alias("__bin"),
        _epoch(F.col(right_ts)).alias("__rus"),
        *[F.col(c).alias(f"{c}_r") for c in pay],
    )
    lo = _epoch(F.col(left_ts)) + F.lit(lower_s * 1_000_000)
    hi = _epoch(F.col(left_ts)) + F.lit(upper_s * 1_000_000)
    l = (
        left.withColumn("__lo", lo)
        .withColumn("__hi", hi)
        .withColumn(
            "__bin",
            F.explode(F.sequence(F.floor(F.col("__lo") / width_us), F.floor((F.col("__hi") - 1) / width_us))),
        )
    )
    out = l.join(r, on=[*on, "__bin"], how="inner").filter(
        (F.col("__rus") >= F.col("__lo")) & (F.col("__rus") < F.col("__hi"))
    )
    return out.drop("__bin", "__lo", "__hi", "__rus")


def snapshot_intervals(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
    payload: Optional[Sequence[str]] = None,
) -> DataFrame:
    """SCD2 interval reconstruction: turn a per-key history of observed
    states (e.g. re-crawled page snapshots keyed by url) into half-open
    validity intervals → (keys…, valid_from_us, valid_to_us, payload…),
    `valid_to_us` NULL for the currently-valid row. A later probe
    `valid_from <= T < valid_to` answers "what did we believe at time T"
    — the point-in-time join every re-crawl corpus needs (and the batch
    shape of pipeline.py's time travel, per-row instead of per-commit).

    Ties on ts are ordered by `order_cols` (pass a unique id for
    determinism); the earlier row of a tie gets a zero-length interval,
    which no half-open probe can match — exactly the "overwritten within
    one batch" semantics. Timestamps come back as epoch MICROSECONDS
    (integers travel exactly across engines; the raw ts stays available
    via valid_from_us for reconstruction).

    Scale: ONE shuffle on the keys (the lead window); the probe is a
    map-only filter afterward, and at warehouse scale valid_from is the
    partition column so a point-in-time read prunes to one partition
    per key range."""
    keys = list(keys)
    if payload is None:
        # default: every non-key, non-ts, non-tiebreak column
        pay = [c for c in df.columns if c not in keys and c != ts_col and c not in order_cols]
    else:
        pay = [c for c in payload if c not in keys and c != ts_col]
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in order_cols]
    )
    out = df.withColumn("valid_from_us", _epoch(F.col(ts_col))).withColumn(
        "valid_to_us", F.lead("valid_from_us").over(w)
    )
    return out.select(*keys, "valid_from_us", "valid_to_us", *pay)


def as_of_snapshot(intervals: DataFrame, ts_us: int) -> DataFrame:
    """Point-in-time read over snapshot_intervals output: the rows valid
    at epoch-micros `ts_us` (valid_from <= T < valid_to, open current
    rows included). Map-only filter — no shuffle, no join."""
    t = F.lit(int(ts_us)).cast("long")
    return intervals.filter(
        (F.col("valid_from_us") <= t)
        & (F.col("valid_to_us").isNull() | (F.col("valid_to_us") > t))
    )


def interval_coalesce(
    intervals: DataFrame,
    keys: Sequence[str],
    from_col: str = "from_us",
    to_col: str = "to_us",
) -> DataFrame:
    """Coalesce overlapping-or-adjacent half-open validity intervals per
    key → (keys…, from_us, to_us, n_merged). The temporal-DB PACK
    operator (Date/Darwen/Lorentzos), and the KG-construction use case
    is observation collapsing: every crawl that re-confirms a triple
    emits another [seen_at, seen_at+ttl) sliver, and the published KG
    wants the maximal validity ranges instead of millions of slivers
    per stable fact.

    Gaps-and-islands, ONE key-partitioned window shuffle: running
    maximum of `to` over preceding rows (ordered by from, to) marks a
    new island exactly when `from` exceeds every earlier `to`
    (strictly — touching intervals merge under half-open semantics),
    then one groupBy collapses each island. Per-key group size =
    observations per fact — crawl-frequency-bounded, no skew."""
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(from_col).asc(), F.col(to_col).asc())
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    flagged = intervals.withColumn(
        "__new",
        # first row per key: the prev-max is NULL, the comparison is NULL,
        # otherwise() applies → island counter starts at 0
        F.when(F.col(from_col) > F.max(to_col).over(wprev), 1).otherwise(0),
    ).withColumn("__island", F.sum("__new").over(w))
    return (
        flagged.groupBy(*keys, "__island")
        .agg(
            F.min(from_col).alias("from_us"),
            F.max(to_col).alias("to_us"),
            F.count(F.lit(1)).cast("long").alias("n_merged"),
        )
        .drop("__island")
    )


#: Allen relation names, LEFT interval relative to RIGHT; disjoint pairs
#: (before / after) are NOT emitted — see interval_allen
_ALLEN = """CASE
  WHEN l_from = r_from AND l_to = r_to THEN 'equals'
  WHEN l_to = r_from THEN 'meets'
  WHEN r_to = l_from THEN 'met_by'
  WHEN l_from = r_from AND l_to < r_to THEN 'starts'
  WHEN l_from = r_from AND l_to > r_to THEN 'started_by'
  WHEN l_to = r_to AND l_from > r_from THEN 'finishes'
  WHEN l_to = r_to AND l_from < r_from THEN 'finished_by'
  WHEN l_from > r_from AND l_to < r_to THEN 'during'
  WHEN l_from < r_from AND l_to > r_to THEN 'contains'
  WHEN l_from < r_from THEN 'overlaps'
  ELSE 'overlapped_by' END"""


def interval_allen(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    bin_us: int = 3_600_000_000,
) -> DataFrame:
    """Allen's interval algebra join: pairs of key-sharing intervals
    that touch or intersect, labeled with the Allen relation of LEFT
    relative to RIGHT → (on…, l_id, r_id, l_from, l_to, r_from, r_to,
    relation). Expects `(…on, id, from_us, to_us)` on both sides with
    from_us < to_us. The two DISJOINT relations (before/after) are
    deliberately not emitted: at corpus scale almost every pair is
    disjoint, and emitting them is the all-pairs blowup every other
    operator here avoids; callers needing them have the complement by
    construction.

    Scale shape: each interval explodes to its covering `bin_us` grid
    cells (span/bin_us + 1 rows — crawl-validity spans are
    minutes-to-days, so single digits), the join is a hash equi-join on
    (keys, bin), duplicate hits from multi-bin overlaps collapse with
    one dropDuplicates on the pair id, and the touch filter + CASE
    classification are scan-local. Same binned-equi-join discipline as
    range_join above."""
    on = list(on)

    def _binned(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            *on,
            F.col("id").alias(f"{side}_id"),
            F.col("from_us").alias(f"{side}_from"),
            F.col("to_us").alias(f"{side}_to"),
            F.explode(
                F.sequence(
                    F.floor(F.col("from_us") / bin_us),
                    F.floor(F.col("to_us") / bin_us),
                )
            ).alias("__bin"),
        )

    pairs = (
        _binned(left, "l")
        .join(_binned(right, "r"), [*on, "__bin"])
        .dropDuplicates([*on, "l_id", "r_id"])
        .filter((F.col("l_from") <= F.col("r_to")) & (F.col("r_from") <= F.col("l_to")))
    )
    return pairs.select(
        *on, "l_id", "r_id", "l_from", "l_to", "r_from", "r_to",
        F.expr(_ALLEN).alias("relation"),
    )


def earliest_arrival(
    edges: DataFrame, seeds: DataFrame, max_rounds: int = 8
) -> DataFrame:
    """Time-respecting reachability (Holme-Saramäki temporal paths):
    over edges (src, dst, ts) with BIGINT timestamps, a walk may only
    traverse edges whose timestamp is ≥ the arrival time at their
    source — the citation/crawl/retweet causality rule (static
    reachability overstates influence: an edge that fired BEFORE the
    information arrived cannot carry it). → (node, arrival): the
    EARLIEST arrival time per reachable node, seeds at arrival
    −2^62 (their information existed before every edge; exposed as
    the module constant EA_SEED_TS so callers can filter seeds out).

    Shape: label-correcting frontier iteration — each round relaxes
    edges from nodes whose arrival improved (frontier equi-join +
    (node)-keyed min-agg + improvement anti-probe, checkpointed, the
    SSSP discipline); rounds bounded by the longest time-respecting
    path's hop count, each round one |frontier ⋈ edges| shuffle. Exact
    integer timestamps, so cross-engine value-oracle-able."""
    e = edges.select(
        "src", "dst", F.col("ts").cast("long").alias("ts")
    ).dropDuplicates()
    dist = (
        seeds.select("node").dropDuplicates()
        .select("node", F.lit(EA_SEED_TS).cast("long").alias("arrival"))
    )
    frontier = dist
    for _ in range(max_rounds):
        dist = dist.localCheckpoint(eager=False)
        relaxed = (
            frontier.join(e, frontier["node"] == e["src"])
            .filter(F.col("ts") >= F.col("arrival"))
            .select(F.col("dst").alias("node"), F.col("ts").alias("cand"))
            .groupBy("node")
            .agg(F.min("cand").alias("cand"))
        )
        improved = (
            relaxed.join(dist, "node", "left")
            .filter(F.col("arrival").isNull() | (F.col("cand") < F.col("arrival")))
            .select("node", F.col("cand").alias("arrival"))
        ).localCheckpoint(eager=False)
        if improved.isEmpty():
            break
        dist = (
            dist.join(improved.select(F.col("node").alias("n2"), F.col("arrival").alias("a2")),
                      dist["node"] == F.col("n2"), "full_outer")
            .select(
                F.coalesce("node", "n2").alias("node"),
                F.least(
                    F.coalesce("arrival", F.lit(2**62)),
                    F.coalesce("a2", F.lit(2**62)),
                ).alias("arrival"),
            )
        )
        frontier = improved
    return dist


#: seed arrival sentinel: earlier than any real epoch
EA_SEED_TS = -(2**62)


def log_replay_asof(
    log: DataFrame,
    ts_us: int,
    keys: Sequence[str] = ("s_lex", "pred", "o_kind", "o_lex", "o_dtype"),
) -> DataFrame:
    """Reconstruct a triple store AS OF a timestamp from an append-only
    assert/retract fact log (the RDF-Patch / LDES / Delta-log shape —
    the versioning model where individual (s,p,o) FACTS toggle on and
    off, vs `snapshot_intervals`' SCD2 model where a key's VALUE is
    superseded; a multi-valued predicate needs this one): for every
    distinct fact, take the latest log entry at or before `ts_us`; the
    fact exists iff that entry is an assert.

    Tie pinned: at equal ts the retract wins (delete-over-insert — the
    copy-on-write MERGE rule, and the conservative reading for
    provenance). Input (keys…, op ∈ {'assert','retract'}, ts_us);
    returns the keys of live facts.

    Scale shape: ONE fact-keyed max_by aggregate (map-side combined —
    a fact's log history collapses per task before the shuffle), then a
    map filter; no joins, no windows. At warehouse scale this is the
    read path of an Iceberg MERGE-log compaction: replaying N days of
    patches costs one aggregation over the patch volume, never a
    day-by-day loop."""
    keys = list(keys)
    t = F.lit(int(ts_us)).cast("long")
    last = (
        log.filter(F.col("ts_us") <= t)
        .groupBy(*keys)
        .agg(
            F.max(
                F.struct(
                    F.col("ts_us").alias("t"),
                    (F.col("op") == "retract").cast("int").alias("r"),
                )
            ).alias("m")
        )
    )
    return last.filter(F.col("m.r") == 0).select(*keys)


def changepoint(
    df,
    group_col: str,
    t_col: str,
    val_col: str,
    scale: int = 100,
):
    """Exact single-changepoint detection per series (the two-segment
    least-squares split — CUSUM/binary-segmentation's inner step, run
    here to one level exactly): over each group's series ordered by
    `t_col`, pick the split s (1 ≤ s < n) minimizing the two-segment
    SSE, equivalently MAXIMIZING

        score(s) = scale·A_s² div s  +  scale·B_s² div (n−s)

    (A/B = prefix/suffix sums; the div floors are the pinned engine-
    portable stand-in for the rational objective — both engines floor
    identically, and ties break to the SMALLEST s). The use: detecting
    when a host's crawl volume / content regime shifted, per host, in
    one pass.

    Magnitude bound (stated): A² · scale must fit 64 bits — |Σ values|
    up to ~3·10⁸ at scale=100. Rescale inputs (or lower `scale`) above
    that; the operator does not silently widen to decimal because the
    floor semantics would change.

    Output per group: (group, n, split_t — the LAST t of the left
    segment, pre_mean_xs, post_mean_xs — segment means in scale units,
    score). Groups with n < 2 emit nothing.

    Scale shape: ONE window pass (cumulative sum + row_number + count
    over the group key — one shuffle, exchange reused) and ONE
    map-side-combined max_by per group. Nothing else."""
    w = Window.partitionBy(group_col).orderBy(F.col(t_col).asc())
    wg = Window.partitionBy(group_col)
    cum = (
        df.withColumn("__a", F.sum(val_col).over(w))
        .withColumn("__s", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wg))
        .withColumn("__tot", F.sum(val_col).over(wg))
        .filter(F.col("__s") < F.col("__n"))
    )
    score = F.expr(
        f"{scale} * __a * __a div __s + {scale} * (__tot - __a) * (__tot - __a) div (__n - __s)"
    )
    cand = cum.select(
        F.col(group_col).alias("grp"),
        F.col("__n").alias("n"),
        F.col(t_col).alias("split_t"),
        F.col("__s").alias("s"),
        score.alias("score"),
        F.expr(f"{scale} * __a div __s").alias("pre_mean_xs"),
        F.expr(f"{scale} * (__tot - __a) div (__n - __s)").alias("post_mean_xs"),
    )
    pick = F.struct(F.col("score").alias("sc"), (-F.col("s")).alias("ns"))
    best = F.max_by(F.struct("split_t", "pre_mean_xs", "post_mean_xs", "score"), pick)
    return (
        cand.groupBy("grp")
        .agg(F.max("n").cast("long").alias("n"), best.alias("b"))
        .select(
            "grp", "n",
            F.col("b.split_t").cast("long").alias("split_t"),
            F.col("b.pre_mean_xs").cast("long").alias("pre_mean_xs"),
            F.col("b.post_mean_xs").cast("long").alias("post_mean_xs"),
            F.col("b.score").cast("long").alias("score"),
        )
    )


def cusum_alarm(
    df,
    group_col: str,
    t_col: str,
    val_col: str,
    mu: int,
    slack: int,
    threshold: int,
):
    """One-sided CUSUM drift alarm per series (Page 1954 — the ONLINE
    companion to `changepoint`: that one finds where a finished series
    split, this one tells you, at each step, whether the process has
    drifted up; the crawl-ops alarm for 'this host's volume/latency has
    shifted'): S_t = max(0, S_{t−1} + x_t − μ − k), alarm when S_t > h.

    The recurrence looks inherently sequential, but it has the classic
    closed form S_t = P_t − min_{j ≤ t} P_j over the prefix sums P of
    (x − μ − k) — ONE cumulative-sum window plus ONE running-min window
    (same partitioning, exchange reused), exact integers throughout.

    Output: every row with (group, t, s) where the alarm is ON
    (s > threshold), plus first_alarm = 1 on each group's earliest
    firing row. Empty when nothing drifts. μ/k/h are integer
    parameters in value units (calibrate k ≈ half the shift you want
    to catch, h ≈ 4-5σ, per the standard CUSUM design rules).

    Scale shape: two windows over the group key, zero joins."""
    w = Window.partitionBy(group_col).orderBy(F.col(t_col).asc())
    dev = df.withColumn("__p", F.sum(F.col(val_col) - mu - slack).over(w))
    s = (
        dev.withColumn("__minp", F.min(F.least(F.col("__p"), F.lit(0))).over(w))
        .withColumn("s", (F.col("__p") - F.col("__minp")).cast("long"))
    )
    alarms = s.filter(F.col("s") > threshold).select(
        F.col(group_col), F.col(t_col), F.col("s")
    )
    wf = Window.partitionBy(group_col).orderBy(F.col(t_col).asc())
    return alarms.withColumn(
        "first_alarm", (F.row_number().over(wf) == 1).cast("int")
    )


def ewma_anomaly(
    df,
    group_col: str,
    t_col: str,
    val_col: str,
    window: int = 12,
    alpha_num: int = 1,
    alpha_den: int = 5,
    threshold_milli: int = 40_000,
):
    """Truncated-window EWMA point-anomaly flags per series (the
    Roberts 1959 EWMA control chart, made engine-portable): for each row
    t, predict the value from the previous `window` observations with
    exponential weights α(1−α)^(lag−1), α = alpha_num/alpha_den, and
    flag the row when |x_t − prediction| exceeds threshold_milli/1000
    value units. The crawl-ops use: per-host volume/latency spike
    detection where CUSUM's persistent-drift alarm is the wrong shape —
    EWMA fires on the single bad day and re-arms.

    Exactness contract: the weights are the INTEGER sequence
    w(lag) = alpha_num·(alpha_den−alpha_num)^(lag−1)·alpha_den^(window−lag)
    (the rational weights scaled by alpha_den^window), the prediction is
    the integer-div rational N/D with N = Σ w(lag)·x_{t−lag} and
    D = Σ w(lag) over the lags that exist, and the anomaly test is the
    cross-multiply |x_t·D − N|·1000 > threshold_milli·D — no floats
    anywhere, so the flags and pred_milli = 1000·N div D are
    bit-identical across engines and the suite value-oracles them
    against a DuckDB mirror with the same window self-join. Magnitude
    bound (stated): x_max·D·1000 must fit 64 bits — with the default
    α=1/5, W=12 (D < 2.5·10⁸) that is x_max ≤ 3·10⁷; rescale inputs
    above that. Values must be NON-NEGATIVE (integer div truncation vs
    floor would diverge between engines on negatives). Rows with no
    history (t earliest in its series) get pred_milli NULL, anomaly
    false.

    `t_col` must be a DENSE integer index per series (1,2,3,…): lag =
    t_a − t_b indexes the weight table directly.

    Scale shape: ONE equi-join on the series key with the lag range as
    a residual filter (each probe row matches ≤ `window` build rows),
    one map-side-combined agg — no windows over collected arrays, no
    Python. Partitioning by series key rides a single shuffle."""
    beta = alpha_den - alpha_num
    weights = [
        alpha_num * beta ** (lag - 1) * alpha_den ** (window - lag)
        for lag in range(1, window + 1)
    ]
    # get() (not the [] subscript) so the NULL lag of history-less rows
    # stays NULL instead of tripping codegen's eager index check
    w_expr = "get(array({}), int(__lag) - 1)".format(
        ", ".join(f"{w}L" for w in weights)
    )
    a = df.select(
        F.col(group_col).alias("__g"),
        F.col(t_col).cast("long").alias("__t"),
        F.col(val_col).cast("long").alias("__x"),
    )
    b = df.select(
        F.col(group_col).alias("__g"),
        F.col(t_col).cast("long").alias("__bt"),
        F.col(val_col).cast("long").alias("__bx"),
    )
    j = a.join(
        b,
        (a["__g"] == b["__g"])
        & (F.col("__bt") >= F.col("__t") - window)
        & (F.col("__bt") <= F.col("__t") - 1),
        "left",
    ).drop(b["__g"])
    lagged = j.withColumn("__lag", F.col("__t") - F.col("__bt"))
    agg = lagged.groupBy("__g", "__t", "__x").agg(
        F.sum(F.expr(f"__bx * ({w_expr})")).alias("__n"),
        F.sum(F.expr(w_expr)).alias("__d"),
    )
    return agg.select(
        F.col("__g").alias(group_col),
        F.col("__t").alias(t_col),
        F.col("__x").alias(val_col),
        F.expr("1000 * __n div __d").cast("long").alias("pred_milli"),
        F.coalesce(
            F.expr(f"abs(__x * __d - __n) * 1000 > {threshold_milli}L * __d"),
            F.lit(False),
        ).alias("anomaly"),
    )


def mann_kendall(
    df,
    group_col: str,
    t_col: str,
    val_col: str,
):
    """Mann-Kendall trend statistic per series (Mann 1945 / Kendall's S;
    the standard nonparametric "is this series monotonically trending"
    test — crawl-ops asks it of per-host volume, latency, and quality
    series where a mean shift test like CUSUM misreads gradual drift):

        S = Σ_{i<j} sign(x_j − x_i),   over pairs ordered by t

    with tau = S / (n(n−1)/2) reported as the pinned integer floor
    tau_ppm = sign(S)·(10⁶·|S| div pairs) — magnitude-truncated, which
    both integer-division dialects agree on (Spark div truncates toward
    zero, DuckDB // floors; they differ on negatives, so the sign is
    split out). S and the pair count are integers; no variance/normal
    approximation is taken, so there is no float anywhere. S > 0 rising,
    < 0 falling, |tau| near 1 strictly monotone.

    Output per group: (group, n, s_stat, tau_ppm); groups with n < 2
    emit nothing.

    Scale shape: ONE equi-self-join on the series key (t_j > t_i as a
    residual filter — each series contributes its own n² pairs, never a
    cross-series product) + one map-side-combined agg. The quadratic
    pair count is the STATISTIC's size, not a plan defect; bound the
    series length upstream (windowed series at web scale are
    fixed-length per host)."""
    a = df.select(
        F.col(group_col).alias("__g"),
        F.col(t_col).cast("long").alias("__ti"),
        F.col(val_col).cast("long").alias("__xi"),
    )
    b = df.select(
        F.col(group_col).alias("__g"),
        F.col(t_col).cast("long").alias("__tj"),
        F.col(val_col).cast("long").alias("__xj"),
    )
    pairs = a.join(b, "__g").filter(F.col("__tj") > F.col("__ti"))
    agg = pairs.groupBy("__g").agg(
        F.sum(F.signum(F.col("__xj") - F.col("__xi")).cast("long")).alias("s_stat"),
        F.count(F.lit(1)).alias("__np"),
    )
    n = a.groupBy("__g").agg(F.count(F.lit(1)).alias("n"))
    return agg.join(n, "__g").select(
        F.col("__g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.col("s_stat").cast("long").alias("s_stat"),
        F.expr(
            "CASE WHEN s_stat < 0 THEN -((1000000 * -s_stat) div __np)"
            " ELSE (1000000 * s_stat) div __np END"
        ).cast("long").alias("tau_ppm"),
    )


def kendall_tau(
    df,
    group_col: str,
    order_col: str,
    x_col: str,
    y_col: str,
):
    """Kendall tau-a rank correlation between two metrics per group
    (Kendall 1938): over pairs ordered by `order_col`,

        S = Σ_{i<j} sign(x_j − x_i)·sign(y_j − y_i)

    tau_ppm = sign(S)·(10⁶·|S| div pairs) — concordant minus discordant
    over all pairs (tau-a: ties count 0 in the numerator and stay in the
    denominator; no √ tie-corrections, so everything is integer-exact,
    same dialect-safe sign-split as mann_kendall). The curation use:
    does quality metric A actually order documents like metric B, per
    source — rank agreement without assuming linearity.

    Output per group: (group, n, s_stat, tau_ppm); groups with n < 2
    emit nothing. Scale shape: identical to mann_kendall — one
    series-key equi self-join with the order inequality residual, one
    map-side-combined agg; the quadratic pair count is the statistic's
    definition, bound series length upstream."""
    a = df.select(
        F.col(group_col).alias("__g"),
        F.col(order_col).cast("long").alias("__ti"),
        F.col(x_col).cast("long").alias("__xi"),
        F.col(y_col).cast("long").alias("__yi"),
    )
    b = df.select(
        F.col(group_col).alias("__g"),
        F.col(order_col).cast("long").alias("__tj"),
        F.col(x_col).cast("long").alias("__xj"),
        F.col(y_col).cast("long").alias("__yj"),
    )
    pairs = a.join(b, "__g").filter(F.col("__tj") > F.col("__ti"))
    sgn = F.signum(F.col("__xj") - F.col("__xi")) * F.signum(F.col("__yj") - F.col("__yi"))
    agg = pairs.groupBy("__g").agg(
        F.sum(sgn.cast("long")).alias("s_stat"),
        F.count(F.lit(1)).alias("__np"),
    )
    n = a.groupBy("__g").agg(F.count(F.lit(1)).alias("n"))
    return agg.join(n, "__g").select(
        F.col("__g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        F.col("s_stat").cast("long").alias("s_stat"),
        F.expr(
            "CASE WHEN s_stat < 0 THEN -((1000000 * -s_stat) div __np)"
            " ELSE (1000000 * s_stat) div __np END"
        ).cast("long").alias("tau_ppm"),
    )


def ols_trend(
    df,
    group_col: str,
    t_col: str,
    val_col: str,
):
    """Per-series ordinary-least-squares trend line, integer-exact: with
    n, Σt, Σx, Σt², Σx², Σtx as BIGINT sums,

        slope     = (n·Σtx − Σt·Σx) / (n·Σt² − (Σt)²)
        intercept = (Σx − slope·Σt) / n
        R²        = (n·Σtx − Σt·Σx)² / ((n·Σt² − (Σt)²)(n·Σx² − (Σx)²))

    reported as slope_milli / intercept_milli / r2_ppm with a PINNED
    integer evaluation order (sign-split magnitude division at each
    step, so Spark's truncating div and DuckDB's flooring // agree):

        slope_milli = sdiv(1000·num, den_t)
        intercept_milli = sdiv(1000·Σx − slope_milli·Σt, n)
        r2_ppm = sdiv(sdiv(1_000_000·num, den_t)·num, den_x)

    where sdiv(a,b) = sign(a)·(|a| div b). The compounded floors are the
    price of exactness — both engines compute bit-identical answers, so
    the suite value-oracles the trend table. Mann-Kendall (same module)
    answers "is there a trend"; this answers "how steep".

    Magnitude bound (stated): 10⁶·num must fit 64 bits — num ≤ n²·t̄·x̄,
    so with n ≤ 10⁴ points per series keep values below ~10⁵, or rescale.
    Degenerate series (constant t: den_t = 0) emit NULL slope/intercept/
    r2; constant x (den_x = 0) emits r2 NULL. Groups with n < 2 emit
    nothing.

    Scale shape: ONE map-side-combined aggregation over the series key —
    six sums, no joins, no windows."""
    d = df.select(
        F.col(group_col).alias("__g"),
        F.col(t_col).cast("long").alias("__t"),
        F.col(val_col).cast("long").alias("__x"),
    )
    agg = d.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__t").alias("st"),
        F.sum("__x").alias("sx"),
        F.sum(F.col("__t") * F.col("__t")).alias("stt"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__t") * F.col("__x")).alias("stx"),
    ).filter(F.col("n") >= 2)

    def sdiv(a: str, b: str) -> str:
        return f"CASE WHEN ({a}) < 0 THEN -((-({a})) div ({b})) ELSE ({a}) div ({b}) END"

    num = "(n * stx - st * sx)"
    den_t = "(n * stt - st * st)"
    den_x = "(n * sxx - sx * sx)"
    slope = sdiv(f"1000 * {num}", den_t)
    res = (
        agg.withColumn(
            "slope_milli",
            F.expr(f"CASE WHEN {den_t} = 0 THEN NULL ELSE {slope} END").cast("long"),
        )
        .withColumn(
            "intercept_milli",
            F.expr(
                "CASE WHEN slope_milli IS NULL THEN NULL ELSE "
                + sdiv("1000 * sx - slope_milli * st", "n")
                + " END"
            ).cast("long"),
        )
        .withColumn(
            "r2_ppm",
            F.expr(
                f"CASE WHEN {den_t} = 0 OR {den_x} = 0 THEN NULL ELSE "
                + sdiv(sdiv(f"1000000 * {num}", den_t) + f" * {num}", den_x)
                + " END"
            ).cast("long"),
        )
    )
    return res.select(
        F.col("__g").alias(group_col),
        F.col("n").cast("long").alias("n"),
        "slope_milli", "intercept_milli", "r2_ppm",
    )
