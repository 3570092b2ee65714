"""Spatial joins for geotagged entities, grid-bucketed — the missing
join type when extracted KG entities carry coordinates (schema:geo on
LocalBusiness/Place pages is among the most common structured-data
payloads on the open web) and the pipeline must link "same place, two
sites" candidates or attach entities to regions.

A naive radius join is the cross product the rest of this package
refuses to ship. The standard fix (also how GeoSpark/Apache Sedona's
distance join plans): overlay a uniform grid with cell size = radius,
key each build-side point by its cell, explode each probe-side point to
its 3×3 cell neighborhood, equi-join on cell id, then apply the exact
distance predicate. Every qualifying pair meets in EXACTLY one cell (the
build point's home cell), so no post-join dedup is needed, and the
shuffle is |points|·9 rows keyed by cell — skew equals physical point
density, which real-world data bounds far below the hot-key cliff
(and a metro-area hotspot is still a bounded cell population, not a
cross product).

Exactness: coordinates are INTEGER units (micro-degrees or millimetres —
caller's choice); the predicate is dx² + dy² ≤ r² in BIGINT, so the join
is value-oracle-able cross-engine with zero float tolerance. Planar
distance, documented: at city scale the projection error is the data's
own GPS noise; callers needing great-circle correctness pre-project.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_radius_join(left: DataFrame, right: DataFrame, radius: int) -> DataFrame:
    """All (left, right) point pairs within `radius` (inclusive,
    Euclidean, integer units): inputs are (id, x, y) with BIGINT-safe
    integer coordinates → (id_a, id_b, dist2) where dist2 = dx²+dy².

    Shape: build side keyed by home cell (one map-only project), probe
    side exploded to 9 neighbor cells (map-only ×9), ONE cell-keyed
    equi hash join, exact integer filter — no cross product, no
    nested-loop join, no dedup (pairs meet once, in the build point's
    home cell). r² ≤ 2^62 guard is the caller's unit choice."""
    r = int(radius)
    if r <= 0:
        raise ValueError("radius must be a positive integer")
    # floor-division grid: Spark/DuckDB `div` truncates toward zero, so
    # plain (x div r) mis-cells negative coordinates. Portable exact
    # floor: subtract the canonical non-negative residue first —
    #   cell(x) = (x - (((x % r) + r) % r)) div r
    # the numerator is exactly divisible by r, so truncation == floor,
    # all in BIGINT (no float division anywhere).
    def _grid(df, ident, xa, ya):
        return df.select(
            F.col("id").alias(ident),
            F.col("x").cast("long").alias(xa),
            F.col("y").cast("long").alias(ya),
        ).selectExpr(
            ident,
            xa,
            ya,
            f"({xa} - ((({xa} % {r}) + {r}) % {r})) div {r} AS cx",
            f"({ya} - ((({ya} % {r}) + {r}) % {r})) div {r} AS cy",
        )

    b = _grid(right, "id_b", "xb", "yb")
    a = (
        _grid(left, "id_a", "xa", "ya")
        .withColumn("dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .withColumn("dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .select(
            "id_a",
            "xa",
            "ya",
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    joined = a.join(b, ["cx", "cy"])
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        joined.withColumn("dist2", d2.cast("long"))
        .filter(F.col("dist2") <= F.lit(r * r))
        .select("id_a", "id_b", "dist2")
    )


def grid_nn_join(left: DataFrame, right: DataFrame, radius: int) -> DataFrame:
    """Nearest neighbor within `radius` per left point: `grid_radius_join`
    then an exact integer argmin — (id_a, id_b, dist2) with ties broken
    by minimum id_b, one row per matched left point. The place-linking
    primitive: each extracted venue snaps to its closest gazetteer entry
    or to nothing.

    Shape: the bounded radius join plus ONE map-side-combined min_by agg
    keyed by id_a — no window, no second shuffle beyond the agg."""
    pairs = grid_radius_join(left, right, radius)
    return (
        pairs.groupBy("id_a")
        .agg(
            F.min(F.struct(F.col("dist2"), F.col("id_b"))).alias("best")
        )
        .select(
            "id_a",
            F.col("best.id_b").alias("id_b"),
            F.col("best.dist2").alias("dist2"),
        )
    )


def grid_dbscan(points: DataFrame, radius: int, min_pts: int = 3) -> DataFrame:
    """Deterministic DBSCAN (Ester et al. KDD'96) over integer-coordinate
    points (id, x, y) → (id, cluster, role) with role ∈ core|border|noise
    and cluster = the lexicographic-minimum core id of the density
    component ('' for noise) — the venue-conflation step after
    `grid_nn_join`: many extracted listings of one physical place collapse
    to a density cluster, not to whichever single gazetteer row happened
    to be nearest.

    Semantics: a point is CORE iff ≥ `min_pts` points (itself included,
    the standard convention) lie within `radius`; clusters are the
    connected components of the core-core proximity graph; a non-core
    point within `radius` of ≥1 core is a BORDER point assigned to the
    MINIMUM cluster label among its core neighbors — classic DBSCAN
    leaves border assignment scan-order-dependent, this engine refuses
    order-dependent results (the determinism rule every oracle relies
    on), so the tie-break is part of the contract.

    Scale: neighbor pairs come from `grid_radius_join` (cell-bucketed,
    never quadratic); the degree count is one map-side-combined agg; the
    component step is the package CC kernel (large/small-star, O(log n)
    rounds); border attachment is one hash join + min agg. Dense blobs
    cost what their true pair count costs — the DBSCAN lower bound."""
    # pairs feeds THREE consumers (degree count, core-core edges, border
    # attach) — checkpoint the shared node or the grid join re-executes
    # per consumer (the textops gram-table discipline; measured 3x cost
    # at sf0.1 without it). Ids go to string ONCE here: joining a long id
    # against the string cluster labels later would coerce both sides
    # (lossy for 2^53+ ids at corpus scale).
    pairs = (
        grid_radius_join(points, points, radius)
        .select(
            F.col("id_a").cast("string").alias("id_a"),
            F.col("id_b").cast("string").alias("id_b"),
        )
        .localCheckpoint(eager=False)
    )
    deg = pairs.groupBy("id_a").agg(F.count(F.lit(1)).alias("n_nbrs"))
    core_s = deg.filter(F.col("n_nbrs") >= int(min_pts)).select(
        F.col("id_a").alias("id")
    )
    # one canonical direction only — the CC kernel symmetrizes internally
    # (_large_star/_sym), so feeding both (a,b) and (b,a) just doubles the
    # first round's dedup volume
    cc_edges = (
        pairs.filter(F.col("id_a") < F.col("id_b"))
        .join(core_s.select(F.col("id").alias("id_a")), "id_a")
        .join(core_s.select(F.col("id").alias("id_b")), "id_b")
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    from .cc import connected_components

    comp = connected_components(cc_edges)  # (node, component) — strings
    # isolated cores (no other core in range) are their own cluster;
    # two consumers (its own rows + the border attach): same discipline
    core_lab = (
        core_s.join(comp, core_s["id"] == comp["node"], "left")
        .select("id", F.coalesce("component", "id").alias("cluster"))
    ).localCheckpoint(eager=False)
    border = (
        pairs.filter(F.col("id_a") != F.col("id_b"))
        .select(F.col("id_a").alias("id"), F.col("id_b").alias("nbr"))
        .join(core_lab.select(F.col("id").alias("id")).withColumn("is_core", F.lit(1)), "id", "left")
        .filter(F.col("is_core").isNull())  # non-core probe points
        .join(core_lab.select(F.col("id").alias("nbr"), "cluster"), "nbr")
        .groupBy("id")
        .agg(F.min("cluster").alias("cluster"))
    )
    allp = points.select(F.col("id").cast("string").alias("id"))
    labeled = core_lab.withColumn("role", F.lit("core")).unionByName(
        border.withColumn("role", F.lit("border"))
    )
    return allp.join(labeled, "id", "left").select(
        "id",
        F.coalesce("cluster", F.lit("")).alias("cluster"),
        F.coalesce("role", F.lit("noise")).alias("role"),
    )
