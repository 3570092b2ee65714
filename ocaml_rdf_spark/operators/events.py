"""Event-stream operators over the events table (event_id, ts, user_id,
event_type, value, props).

The reference has no streaming/temporal operators (SURVEY §2.9 — batch
library), so these are engine-side additions in the training-data-ops
family: the batch forms of the two canonical Structured-Streaming
aggregations. `tumbling_counts` is exactly the plan a
`readStream.groupBy(window(...))` produces per micro-batch;
`sessionize` is the batch equivalent of `applyInPandasWithState`
session tracking, expressed with built-in window functions so it stays
JVM-side (no Python state function needed for the batch path).

Scale notes:
- `tumbling_counts` is one hash aggregation: partial map-side combine,
  one shuffle on (bucket, event_type); bucket count is bounded by the
  time range so the result is tiny regardless of input size.
- `sessionize` shuffles once on user_id (the window partition key); skewed
  power-users are bounded by per-user event counts, and at 100 TB the same
  plan runs with `spark.sql.shuffle.partitions` sized to the user-id
  cardinality. The two stacked window functions (lag, running sum) share
  one partitioning — Catalyst plans a single Window exchange.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def tumbling_counts(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling-window counts + value sums per (window, event_type).

    Uses F.window (epoch-aligned, the Structured Streaming operator); the
    window start is exposed as epoch-hours so the result is engine- and
    timezone-portable (session tz is UTC — session.py).
    """
    w = F.window(F.col("ts"), f"{minutes} minutes")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_x100"),
        )
        .select(
            # parquet naive timestamps read as TIMESTAMP_NTZ; LTZ-cast under
            # the UTC session tz makes epoch math exact and engine-portable
            # floor, not a truncating cast: pre-1970 epochs are negative and
            # cast-toward-zero would assign them to the wrong bucket
            F.floor(F.col("w.start").cast("timestamp_ltz").cast("long") / (minutes * 60)).cast("long").alias("bucket"),
            "event_type",
            "n_events",
            "sum_value_x100",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based session assignment: a new session starts when a user's
    inter-event gap exceeds `gap_minutes`. Returns the events with a
    per-user `session_idx` (1-based) — lag + running-sum over one
    user-partitioned sort, fully JVM-side.
    """
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    prev = F.lag(us).over(order)
    new_sess = (prev.isNull() | ((us - prev) > gap_minutes * 60 * 1_000_000)).cast("long")
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_idx", F.sum(new_sess).over(running))


def rollup_cascade(events: DataFrame, tiers_minutes: tuple = (1, 60, 1440)) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade: per-event_type
    counts/sums at multiple time granularities, where each COARSER tier is
    derived from the previous tier's partial aggregates — the raw table is
    scanned exactly once no matter how many tiers are requested (the
    TimescaleDB continuous-aggregate / OLAP rollup pattern).

    Output: (tier_minutes, bucket, event_type, n_events, sum_value_x100)
    with bucket = epoch-start / (tier * 60). Counts and x100-integer sums
    re-aggregate losslessly, which is WHY the cascade is exact — avg/
    percentiles would need their decomposable forms (sum+count, sketches).

    Scale: tier 1 is one map-side-combined shuffle over the raw events;
    every further tier aggregates the PREVIOUS tier's (already tiny,
    bucket-bounded) output — at 100 TB the hour tier reads minute rows,
    not events."""
    t0 = tiers_minutes[0]
    us = F.col("ts").cast("timestamp_ltz").cast("long")
    tier = (
        events.groupBy(
            F.floor(us / (t0 * 60)).cast("long").alias("bucket"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_x100"),
        )
        .withColumn("tier_minutes", F.lit(t0).cast("int"))
    )
    out = tier
    prev, prev_m = tier, t0
    for m in tiers_minutes[1:]:
        if m % prev_m != 0:
            raise ValueError(f"tier {m} not a multiple of previous tier {prev_m}")
        nxt = (
            prev.groupBy(
                F.floor(F.col("bucket") / (m // prev_m)).cast("long").alias("bucket"),
                "event_type",
            )
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value_x100").alias("sum_value_x100"),
            )
            .withColumn("tier_minutes", F.lit(m).cast("int"))
        )
        out = out.unionByName(nxt)
        prev, prev_m = nxt, m
    return out.select("tier_minutes", "bucket", "event_type", "n_events", "sum_value_x100")


def session_stats(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user session summary: number of sessions and events."""
    s = sessionize(events, gap_minutes)
    return s.groupBy("user_id").agg(
        F.max("session_idx").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    within_s: int = 3600,
) -> DataFrame:
    """Ordered-funnel analysis: per user, how far through the `steps`
    event-type sequence they progressed → (user_id, depth, t1_us,
    completed). Semantics pinned exactly (so the result value-oracles):
    the funnel anchors at the user's EARLIEST step-1 event (t1); step
    k+1 matches the earliest event of its type STRICTLY after the step-k
    match and no later than t1 + within_s; `depth` counts matched steps,
    `completed` = all steps matched. Epoch-microsecond integers
    throughout — no fp, bit-identical cross-engine.

    Scale: ONE shuffle (groupBy user_id with map-side combine into a
    sorted (ts, event_id, type) array), then a scan-local F.aggregate
    fold — no per-step join cascade (k steps would otherwise cost k
    shuffles), no Python, whole-stage codegen. Power-user arrays are
    bounded by per-user event counts, the same budget sessionize
    already carries; ties at equal ts break by event_id via the array
    sort, and the strict `>` means same-instant events can't satisfy
    consecutive steps (matching the SQL mirror's MIN/> formulation)."""
    steps = list(steps)
    if not steps:
        raise ValueError("funnel: steps must be non-empty")
    ev = events.select(
        "user_id",
        F.struct(
            F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("t"),
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("typ"),
        ).alias("e"),
    )
    seq = ev.groupBy("user_id").agg(F.array_sort(F.collect_list("e")).alias("es"))
    steps_arr = F.array(*[F.lit(s) for s in steps])
    zero = F.struct(
        F.lit(0).cast("int").alias("depth"),
        F.lit(None).cast("long").alias("t1"),
        F.lit(None).cast("long").alias("last"),
    )
    fold = F.aggregate(
        F.col("es"),
        zero,
        lambda acc, e: F.when(
            (acc["depth"] < len(steps))
            & (e["typ"] == F.element_at(steps_arr, acc["depth"] + 1))
            & (
                (acc["depth"] == 0)
                | ((e["t"] > acc["last"]) & (e["t"] <= acc["t1"] + within_s * 1_000_000))
            ),
            F.struct(
                (acc["depth"] + 1).alias("depth"),
                F.coalesce(acc["t1"], e["t"]).alias("t1"),
                e["t"].alias("last"),
            ),
        ).otherwise(acc),
    )
    return seq.select(
        "user_id",
        fold.alias("__f"),
    ).select(
        "user_id",
        F.col("__f.depth").cast("long").alias("depth"),
        F.col("__f.t1").alias("t1_us"),
        (F.col("__f.depth") == len(steps)).alias("completed"),
    )


def cohort_retention(events: DataFrame, weeks: int = 8) -> DataFrame:
    """Cohort retention triangle (the product-analytics staple): cohort =
    each user's first-event date truncated to week; → (cohort_week,
    week_offset, n_users) where n_users = DISTINCT users of that cohort
    active week_offset weeks after their cohort week (offset 0 row =
    cohort size), offsets beyond `weeks` dropped.

    Scale: one user-keyed min-agg for the cohort assignment (map-side
    combined), one hash join back onto events (user spine is |users|,
    broadcast-or-shuffle by stats), one distinct-count per
    (cohort_week, offset) cell — the output is a triangle of ≤ weeks²/2
    metadata-sized cells regardless of event volume."""
    first = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    joined = events.join(first, "user_id").select(
        "user_id",
        "cohort_week",
        F.floor(
            F.datediff(F.to_date(F.col("ts")), F.to_date(F.col("cohort_week"))) / 7
        ).cast("long").alias("week_offset"),
    )
    return (
        joined.filter(F.col("week_offset") <= weeks)
        .groupBy(F.to_date("cohort_week").cast("string").alias("cohort_week"), "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order Markov transition counts over per-user event streams:
    → (from_type, to_type, n) where consecutive = next event of the SAME
    user in (ts, event_id) order (event_id breaks timestamp ties, so the
    count table is deterministic and cross-engine exact). The row set is
    |event types|² at most — the navigation-pattern summary behind
    'users who view then search then buy' analyses, and the transition
    matrix a Markov session model trains on.

    Scale: ONE user_id-keyed window (the same exchange sessionization
    uses) + one map-side-combined count; no self-joins."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        nxt.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def hopping_counts(
    events: DataFrame, window_minutes: int = 60, hop_minutes: int = 15
) -> DataFrame:
    """Hopping (sliding) window counts + value sums per (window start,
    event_type) → (bucket, event_type, n_events, sum_value_x100) where
    `bucket` = window-start epoch in hop units — `tumbling_counts`'
    overlapping sibling (window W, slide H, W a multiple of H), i.e. the
    moving-average shape Structured Streaming's F.window(ts, W, H)
    computes; an event lands in exactly W/H windows.

    Exactness: the epoch-floor bucket rule from `tumbling_counts`
    (timestamp_ltz cast under the UTC session, floor not truncate — sub-
    epoch events bucket correctly), value sums in integer cents.

    Scale: F.window with a slide is a deterministic W/H-way row expansion
    THEN one partial+final hash agg — the expansion happens map-side
    inside the project, so the shuffle carries (n_buckets × types) partial
    rows, not W/H × |events|."""
    if window_minutes % hop_minutes != 0:
        raise ValueError("window_minutes must be a multiple of hop_minutes")
    w = F.window(F.col("ts"), f"{window_minutes} minutes", f"{hop_minutes} minutes")
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_x100"),
        )
        .select(
            F.floor(
                F.col("w.start").cast("timestamp_ltz").cast("long") / (hop_minutes * 60)
            )
            .cast("long")
            .alias("bucket"),
            "event_type",
            "n_events",
            "sum_value_x100",
        )
    )


def burst_windows(
    events: DataFrame,
    minutes: int = 60,
    trailing: int = 3,
    threshold_pct: int = 200,
) -> DataFrame:
    """Burst detection over tumbling windows: per (event_type, bucket),
    flag windows whose count exceeds `threshold_pct`% of the trailing
    mean over the previous `trailing` OBSERVED windows (gaps are skipped,
    not zero-filled — documented; recrawl-scheduler semantics where a
    quiet host simply has no row) → (bucket, event_type, n_events,
    n_prev, trailing_sum, is_burst). The crawl-ops alarm: a host or
    event type suddenly producing windows far above its own recent
    baseline (Kleinberg's burst model reduced to its integer one-level
    form).

    Exactness: the mean comparison is cleared of division —
    n·100·n_prev > pct·trailing_sum — all BIGINT, bit-identical across
    engines; windows with fewer than `trailing` predecessors are never
    bursts (cold start is not an anomaly).

    Scale: one tumbling agg (partial+final), then ONE window function
    partitioned by event_type ordered by bucket — per-type state is the
    row stream, the frame is `trailing`-bounded; at 100 TB the partition
    key generalizes to (host, type) so no single reducer sees more than
    one type's buckets."""
    base = tumbling_counts(events, minutes=minutes).select(
        "bucket", "event_type", "n_events"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-int(trailing), -1)
    )
    out = base.withColumn(
        "n_prev", F.count(F.lit(1)).over(w).cast("long")
    ).withColumn("trailing_sum", F.coalesce(F.sum("n_events").over(w), F.lit(0)).cast("long"))
    return out.withColumn(
        "is_burst",
        (
            (F.col("n_prev") == int(trailing))
            & (
                F.col("n_events") * F.lit(100) * F.col("n_prev")
                > F.lit(int(threshold_pct)) * F.col("trailing_sum")
            )
        ).cast("int"),
    ).select("bucket", "event_type", "n_events", "n_prev", "trailing_sum", "is_burst")
