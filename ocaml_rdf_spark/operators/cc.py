"""Connected components + owl:sameAs / blank-node canonicalization.

North rule (BASELINE.json:14): "canonicalization collapses owl:sameAs /
blank-node equivalence classes with an iterative connected-components
(large-star/small-star) DataFrame algorithm". Algorithm: Kiveris et al.,
"Connected Components in MapReduce and Beyond" (SoCC 2014) — public.

The reference has no distributed equivalent; its blank-node identity is a
per-graph mutable counter (rdf_graph.ml :: new_blank_id) and owl:sameAs is
just another triple. At 10^12 docs equivalence classes span partitions, so
identity must be computed, not assigned — this module is that computation.

Scale design:
- each round is two shuffles (groupBy min + self-join), O(log n) rounds to
  convergence on real graphs;
- `localCheckpoint` per round cuts lineage so plans don't grow without
  bound (SURVEY §7 R5);
- convergence test is an aggregate (sum of star-edge violations), not a
  collect of edges;
- node ids are arbitrary strings; ordering is lexicographic on (kind, lex)
  so the canonical representative is deterministic across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..types import OWL_SAMEAS


def _sym(edges: DataFrame) -> DataFrame:
    return edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _large_star(edges: DataFrame) -> DataFrame:
    """large-star: connect every strictly-larger neighbor of u to m(u), the
    min of N(u) ∪ {u}. Operates on the symmetrized edge list."""
    nbrs = _sym(edges)
    m = nbrs.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("m"))
    # trailing distinct keeps set semantics between rounds (Kiveris et al.
    # operate on edge sets): without it duplicate edges compound through
    # _sym and the next round's join — bounded intermediates beat saving
    # one (map-side-combined) shuffle
    return (
        nbrs.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """small-star: for each u, connect all ≤-neighbors to m(u)."""
    # orient edges so src > dst (parent pointers), then hook smaller nbrs
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    m = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    hooked = (
        oriented.join(m, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    selfm = m.select(F.col("src"), F.col("m").alias("dst"))
    return hooked.unionByName(selfm).distinct()


def _driver_cc(edges: DataFrame) -> DataFrame:
    """Small-graph fast path: union-find on the driver. Adaptive, like
    Spark's broadcast-join threshold — when the EDGE SET (not the triple
    corpus) fits comfortably in driver memory, O(E α(E)) locally beats
    O(log n) distributed rounds whose cost is pure job-scheduling overhead.
    The result is identical to the distributed path (both emit the
    lexicographic component minimum)."""
    parent: dict = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    rows = edges.select("src", "dst").toPandas()
    for s, d in zip(rows["src"], rows["dst"]):
        rs, rd = find(s), find(d)
        if rs != rd:
            # union by lexicographic min keeps the representative canonical
            lo, hi = (rs, rd) if rs < rd else (rd, rs)
            parent[hi] = lo
    out = [(n, find(n)) for n in set(rows["src"]) | set(rows["dst"])]
    return edges.sparkSession.createDataFrame(out, schema="node string, component string")


def connected_components(
    edges: DataFrame, max_iter: int = 30, driver_threshold: int = 2_000_000
) -> DataFrame:
    """edges(src string, dst string) → (node string, component string) where
    `component` is the lexicographic minimum of the node's component.

    Distributed path: alternates large-star/small-star until the edge set
    is a stable star forest (every node points at its component min), then
    reads components straight off the final edges. Isolated nodes don't
    appear (callers union identity rows for nodes they care about).

    Adaptive fast path: if the (deduped) edge set has ≤ `driver_threshold`
    rows it is union-found on the driver — identical output, no iterative
    shuffling. Pass driver_threshold=0 to force the distributed path (the
    10^12-doc configuration; sameAs/bnode edge sets at that scale exceed
    any driver). The count that picks the path reuses the same materialized
    edge set the first round would read — no extra scan at scale.
    """
    def _sig(df: DataFrame) -> tuple:
        # one-job convergence signature: (edge count, order-independent
        # hash-sum). Cheaper than exceptAll+counts (3 jobs → 1); a false
        # convergence needs a 64-bit hash-sum collision between
        # consecutive rounds of the same monotone contraction — ignored.
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    # lazy localCheckpoint: the signature aggregate is the action that
    # materializes each round — one Spark job per round instead of two
    # (eager checkpoint + separate aggregate), which matters because small
    # inputs are scheduling-overhead-bound, not data-bound
    cur = edges.filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    cur = cur.localCheckpoint(eager=False)
    prev_sig = _sig(cur)
    if driver_threshold and prev_sig[0] <= driver_threshold:
        return _driver_cc(cur)
    for _ in range(max_iter):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=False)
        sig = _sig(nxt)
        cur = nxt
        if sig == prev_sig:
            break
        prev_sig = sig
    # star forest: src > dst = component min
    comp = cur.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = cur.select(F.col("dst").alias("node")).distinct().withColumn("component", F.col("node"))
    return comp.unionByName(roots).groupBy("node").agg(F.min("component").alias("component"))


def sameas_edges(triples: DataFrame) -> DataFrame:
    """owl:sameAs triples → edge list over node keys `kind|lex` (IRIs and
    bnodes only; literals can't be identified)."""
    sa = triples.filter((F.col("pred") == OWL_SAMEAS) & (F.col("o_kind") != 2))
    return sa.select(
        F.concat_ws("|", F.col("s_kind"), F.col("s_lex")).alias("src"),
        F.concat_ws("|", F.col("o_kind"), F.col("o_lex")).alias("dst"),
    )


def canonicalize(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subj/obj through a `node → component` mapping (two joins;
    broadcast when the mapping is small, shuffle otherwise — Spark/AQE
    decides from stats). Node keys are `kind|lex`; canonical terms keep the
    kind of the component representative."""
    m = mapping.select(
        F.split("node", "\\|", 2).getItem(0).cast("tinyint").alias("k"),
        F.split("node", "\\|", 2).getItem(1).alias("lx"),
        F.split("component", "\\|", 2).getItem(0).cast("tinyint").alias("ck"),
        F.split("component", "\\|", 2).getItem(1).alias("clx"),
    )
    ms = m.select(
        F.col("k").alias("s_kind"), F.col("lx").alias("s_lex"),
        F.col("ck").alias("new_sk"), F.col("clx").alias("new_sl"),
    )
    mo = m.select(
        F.col("k").alias("o_kind"), F.col("lx").alias("o_lex"),
        F.col("ck").alias("new_ok"), F.col("clx").alias("new_ol"),
    )
    out = (
        triples.join(ms, ["s_kind", "s_lex"], "left")
        .withColumn("s_kind", F.coalesce("new_sk", "s_kind"))
        .withColumn("s_lex", F.coalesce("new_sl", "s_lex"))
        .drop("new_sk", "new_sl")
    )
    # objects: only rewrite non-literals (join keys include kind, literals=2
    # never match because mapping only holds kinds 0/1)
    out = (
        out.join(mo, ["o_kind", "o_lex"], "left")
        .withColumn("o_kind", F.coalesce("new_ok", "o_kind"))
        .withColumn("o_lex", F.coalesce("new_ol", "o_lex"))
        .drop("new_ok", "new_ol")
    )
    return out.select(*triples.columns)


def triangle_count(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts over (src, dst) string edges →
    (node, triangles), zero rows included for triangle-free nodes.

    Degree-ordered wedge join (Suri & Vassilvitskii, WWW'11 — the
    "curse of the last reducer" fix): orient every undirected edge from
    its lower-(degree, id) endpoint to the higher one, so each node's
    OUT-degree in the oriented graph is O(√m) even when its raw degree
    is huge (a mega-hub's wedges are generated at its low-degree
    neighbors, never concentrated on the hub's own reducer). Wedges =
    oriented self-join on the center; triangles = wedges semi-closed
    against the canonical a<b edge set. Every stage is a hash equi-join
    or map-side-combined groupBy — no Python in the loop, no all-pairs
    product, skew bounded by the orientation. Counts are exact integers,
    so the result is bit-identical across partitionings and engines.
    (Reference scope: graph analytics over the materialized store,
    SURVEY §2.5 iterative-ops family.)"""
    e = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("dg"))
    )
    ed = (
        e.join(deg.select(F.col("node").alias("a"), F.col("dg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("dg").alias("db")), "b")
    )
    lower_is_a = (F.col("da") < F.col("db")) | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b")))
    o = ed.select(
        F.when(lower_is_a, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_is_a, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    # wedges centered at u; v1 < v2 by id matches the canonical a < b edge
    # key exactly, so the closing join is a plain two-column equi-join
    wedges = (
        o.select("u", F.col("v").alias("v1"))
        .join(o.select("u", F.col("v").alias("v2")), "u")
        .filter(F.col("v1") < F.col("v2"))
    )
    tri = wedges.join(e, (F.col("v1") == F.col("a")) & (F.col("v2") == F.col("b")))
    contrib = (
        tri.select(F.col("u").alias("node"))
        .unionByName(tri.select(F.col("v1").alias("node")))
        .unionByName(tri.select(F.col("v2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    return deg.join(contrib, "node", "left").select(
        "node", F.coalesce("t", F.lit(0)).cast("long").alias("triangles")
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = 1_000_000,
    seeds: DataFrame | None = None,
    weight_col: str | None = None,
) -> DataFrame:
    """Integer-exact PageRank over (src, dst) string edges → (node, rank)
    with `rank` in 1/`scale` units.

    All arithmetic is BIGINT (per-edge contribution = rank div out-degree,
    new rank = scale·(100-d)//100 + d·Σcontrib//100): integer sums are
    associative, so the result is bit-identical across partitionings,
    cluster sizes, AND engines — float PageRank can't be oracled exactly
    (non-associative fp addition drifts per shuffle order). Dangling nodes
    keep their base rank and leak the rest (the standard simplification;
    deterministic).

    Scale shape per iteration: edges ⋈ ranks on src (both big — hash
    join; the tiny degree table rides along pre-joined), one map-side-
    combined groupBy(dst) carrying exactly |E| rows, then a left join back
    onto the node spine. `localCheckpoint` cuts the O(iters) lineage for
    deep runs; ranks are re-used, never recollected at the driver.

    With `seeds` (a (node) DataFrame): PERSONALIZED PageRank (TrustRank /
    topic-sensitive PR) — the teleport mass lands only on the seed set
    (base per seed = scale·(100−d)//100; non-seeds restart at 0), so rank
    flows outward from the seeds and scores nodes by proximity to them —
    KG entity relevance around a query's entities, or trust propagation
    from a vetted host list. Keeping the per-seed base UNDIVIDED (not
    /|S|) preserves exact integers; it equals standard PPR up to the
    positive scalar |S|, so rankings are identical. Same per-iteration
    plan; the seed flag rides the node spine as a 0/1 column.

    With `weight_col` (a positive-integer column): WEIGHTED PageRank —
    contribution = rank·w div strength(u), strength = Σ out-weights
    (multi-edges pre-summed per (src,dst)). Same integer-exact contract
    and per-iteration plan; link multiplicity in a host graph is the
    natural weight. Magnitude bound (stated): rank·w must fit 64 bits —
    rank ≤ |V|·scale in the worst funnel, so keep Σw per edge ≤ 2⁶³ /
    (|V|·scale)."""
    if weight_col is not None:
        edges = (
            edges.select("src", "dst", F.col(weight_col).cast("long").alias("__w"))
            .groupBy("src", "dst")
            .agg(F.sum("__w").alias("__w"))
        )
    else:
        edges = edges.select("src", "dst").dropDuplicates()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .dropDuplicates()
    )
    wsum = F.sum("__w") if weight_col is not None else F.count(F.lit(1))
    deg = edges.groupBy("src").agg(wsum.alias("odeg"))
    ed = edges.join(deg, "src")  # degree rides with the edge (one join, reused every iter)
    ed = ed.localCheckpoint(eager=False)
    base = (scale * (100 - damping_pct)) // 100
    if seeds is None:
        spine = nodes.select("node", F.lit(1).alias("is_seed"))
    else:
        sd = seeds.select(F.col("node").alias("node"), F.lit(1).alias("sflag")).dropDuplicates()
        spine = nodes.join(sd, "node", "left").select(
            "node", F.coalesce("sflag", F.lit(0)).alias("is_seed")
        )
    ranks = spine.select(
        "node", (F.col("is_seed") * F.lit(int(scale))).cast("long").alias("rank")
    )
    for i in range(iters):
        cexpr = "rank * __w div odeg" if weight_col is not None else "rank div odeg"
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select("dst", F.expr(cexpr).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            spine.join(contrib, spine["node"] == contrib["dst"], "left")
            .select(
                "node",
                (F.col("is_seed") * F.lit(base) + F.expr(f"{damping_pct} * coalesce(s, 0L) div 100")).cast("long").alias("rank"),
            )
        )
        if iters > 4:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def kcore(
    edges: DataFrame, k: int = 3, rounds: int | None = None
) -> DataFrame:
    """k-core peeling over (src, dst) string edges → surviving
    (node, deg): synchronously remove every node of degree < k (with its
    incident edges) per round, over the canonicalized undirected simple
    graph (a < b, self-loops dropped).

    `rounds=None` runs to the true k-core fixpoint — O(peel-depth)
    rounds, each costing one map-side-combined degree aggregation + two
    hash anti joins, with an isEmpty convergence probe (one aggregate
    job, not a collect). `rounds=R` runs EXACTLY R peel rounds and skips
    the probes — the pagerank-style fixed-iteration contract whose state
    is bit-identical across partitionings and engines, so the suite can
    value-oracle it against an R-times-unrolled DuckDB mirror (a
    data-dependent fixpoint has no bounded SQL mirror). R ≥ the graph's
    peel depth gives the fixpoint.

    Scale: degrees never funnel a hub through one reducer (partial
    aggregation); the weak-node side of each anti join is the round's
    peeled set — usually tiny, AQE broadcasts it; localCheckpoint each
    round caps lineage depth exactly like transitive_closure."""
    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    i = 0
    while rounds is None or i < rounds:
        deg = (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        weak = deg.filter(F.col("n") < k).select("node")
        if rounds is None and weak.isEmpty():
            break
        e = (
            e.join(weak.withColumnRenamed("node", "a"), "a", "left_anti")
            .join(weak.withColumnRenamed("node", "b"), "b", "left_anti")
            .localCheckpoint(eager=False)
        )
        i += 1
        if rounds is None and i > 100_000:  # malformed-input backstop
            raise RuntimeError("kcore: peeling did not converge")
    return (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def incremental_components(
    mapping: DataFrame, new_edges: DataFrame, **cc_kwargs
) -> DataFrame:
    """Merge a NEW edge batch into an existing component mapping without
    recomputing history: (node, component) ∪ edges(src, dst) → updated
    (node, component), equal to connected_components over old ∪ new
    edges (connectivity is invariant under quotienting by existing
    components — standard union-find batching).

    Cost at 10^12 docs: the historical sameAs edge set never re-enters
    the computation — 2 hash joins rewrite the batch's endpoints to
    their current representatives, CC runs on the QUOTIENT graph (at
    most one edge per batch row, and intra-component edges collapse to
    self-loops and vanish), and 1 join composes the old mapping through
    the quotient result. Component ids stay the min node id: every rep
    is the min of its old component, so the quotient min equals the
    global min.
    """
    ms = mapping.select(F.col("node").alias("src"), F.col("component").alias("sr"))
    md = mapping.select(F.col("node").alias("dst"), F.col("component").alias("dr"))
    e = (
        new_edges.join(ms, "src", "left")
        .join(md, "dst", "left")
        .select(
            F.coalesce(F.col("sr"), F.col("src")).alias("src"),
            F.coalesce(F.col("dr"), F.col("dst")).alias("dst"),
        )
    )
    q = connected_components(e, **cc_kwargs)
    q2 = q.select(F.col("node").alias("component"), F.col("component").alias("c2"))
    updated = mapping.join(q2, "component", "left").select(
        "node", F.coalesce(F.col("c2"), F.col("component")).alias("component")
    )
    # self-loops carry no connectivity: a node seen only in (n, n) stays
    # absent, matching connected_components' isolated-node rule
    real = new_edges.filter(F.col("src") != F.col("dst"))
    ends = (
        real.select(F.col("src").alias("node"))
        .unionByName(real.select(F.col("dst").alias("node")))
        .distinct()
        .join(mapping.select("node"), "node", "left_anti")
    )
    fresh = ends.join(q, "node", "left").select(
        "node", F.coalesce(F.col("component"), F.col("node")).alias("component")
    )
    return updated.unionByName(fresh)


def bfs_distances(edges: DataFrame, seeds: DataFrame, max_hops: int = 8) -> DataFrame:
    """Multi-source BFS hop distance over directed (src, dst) string
    edges: (node, dist) for every node reachable from `seeds` (a
    one-column `node` frame) within `max_hops` hops, dist = MINIMUM hop
    count (seed rows are dist 0).

    Level-synchronous frontier expansion — the standard distributed-BFS
    shape (Pregel's SSSP specialization for unit weights): each round
    joins the CURRENT frontier against the edge table (hash join keyed
    on src), dedups the hop's discoveries, and anti-joins the visited
    set so a node is claimed by its first (= shortest) level. Integer
    hop counts mean no fp drift; the result is bit-identical across
    partitionings and engines, so the suite value-oracles it against a
    `max_hops`-times-unrolled DuckDB min-dist mirror.

    Scale: the visited set grows monotonically but participates only as
    the build side of a left_anti hash join; `localCheckpoint` caps the
    O(hops) lineage exactly like transitive_closure (paths.py). Work per
    round is |frontier ⋈ edges| — never |visited|² — and the early-out
    isEmpty probe is one aggregate job, so a graph with diameter <
    `max_hops` stops paying as soon as the frontier drains. Deep
    graphs want the path-doubling closure instead (paths.py); BFS keeps
    exact hop LABELS, which doubling destroys."""
    e = edges.select("src", "dst").dropDuplicates()
    dist = seeds.select("node").dropDuplicates().select(
        "node", F.lit(0).cast("long").alias("dist")
    )
    frontier = dist
    for h in range(1, max_hops + 1):
        # cap lineage at the top of each round; the RETURNED frame keeps
        # its last union+anti-join plan visible for the plan audit
        if h > 1:
            dist = dist.localCheckpoint(eager=False)
        # checkpoint BEFORE the isEmpty probe: the probe materializes the
        # frontier, and the union below then reuses that materialization —
        # without it every frontier is computed twice (probe + next
        # round's lineage), doubling per-round wall time
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .dropDuplicates()
            .join(dist, "node", "left_anti")
            .select("node", F.lit(h).cast("long").alias("dist"))
        ).localCheckpoint(eager=False)
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt)
        frontier = nxt
    return dist


def sssp(edges: DataFrame, seeds: DataFrame, max_rounds: int = 16) -> DataFrame:
    """Weighted multi-source shortest paths — distributed Bellman-Ford
    over (src, dst, w) edges with NON-NEGATIVE integer weights; returns
    (node, dist) for every node reachable from `seeds` (one `node`
    column, dist 0) within `max_rounds` relaxation rounds.

    Frontier-based relaxation (Pregel's SSSP proper — `bfs_distances`
    is its unit-weight specialization): each round joins only the nodes
    whose distance IMPROVED last round against the edge table (hash
    join on src), min-combines candidate distances per target (map-side
    combine), and keeps the strict improvements. Integer weights mean
    no fp drift: the labels are bit-identical across partitionings and
    engines, so the suite value-oracles the result against a
    rounds-unrolled DuckDB min-relaxation mirror.

    Scale: per-round work is |frontier ⋈ edges|, never |dist|²; the
    settled-distance table participates only as the probe side of one
    left join per round. `localCheckpoint` caps the O(rounds) lineage
    and the early-out isEmpty probe reuses the improved-set
    materialization (the bfs_distances lesson — without it every
    frontier is derived twice). `max_rounds` bounds the hop count of
    the longest optimal path, NOT the diameter of the graph: weighted
    detours never force extra rounds beyond the optimal path's edge
    count."""
    e = edges.select(
        "src", "dst", F.col("w").cast("long").alias("w")
    ).dropDuplicates()
    dist = seeds.select("node").dropDuplicates().select(
        "node", F.lit(0).cast("long").alias("dist")
    )
    frontier = dist
    for r in range(max_rounds):
        # cap lineage at the top of each round; the RETURNED frame keeps
        # its last anti-join+union plan visible (the bfs_distances
        # discipline — checkpointing the returned union would hide the
        # join/agg shapes from the plan audit)
        if r > 0:
            dist = dist.localCheckpoint(eager=False)
        cand = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("nd"))
            .groupBy("node")
            .agg(F.min("nd").alias("nd"))
        )
        # checkpoint BEFORE the isEmpty probe so the probe's
        # materialization is reused by the union below
        improved = (
            cand.join(dist.select("node", F.col("dist").alias("old")), "node", "left")
            .filter(F.col("old").isNull() | (F.col("nd") < F.col("old")))
            .select("node", F.col("nd").alias("dist"))
        ).localCheckpoint(eager=False)
        if improved.isEmpty():
            break
        dist = dist.join(improved.select("node"), "node", "left_anti").unionByName(improved)
        frontier = improved
    return dist


def label_propagation(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007, the deterministic variant) over undirected (src, dst)
    string edges, run for EXACTLY `rounds` rounds → (node, label).

    Every node starts labeled with its own id; each round it adopts the
    MOST FREQUENT label among its neighbors, ties broken by minimum
    label (isolated nodes keep their label). The fixed round count +
    lexicographic tiebreak make the state bit-identical across
    partitionings and engines — the suite value-oracles it against a
    `rounds`-times-unrolled DuckDB mirror (QUALIFY row_number) — unlike
    the classic randomized-order variant, which is unreproducible by
    construction. Distinct from connected_components: CC converges to
    one label per component; bounded mode-propagation finds DENSE
    sub-communities inside a component.

    Scale: each round is one hash join (edges ⋈ labels, keyed on the
    neighbor endpoint), one map-side-combined count per (node, label),
    and one min_by-struct argmax — no windows, no driver state; the
    label frame is localCheckpoint'ed so lineage stays O(1) per round.
    Hub nodes cost |their degree| count rows, partial-aggregated before
    the shuffle."""
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates()
    )
    bi = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).dropDuplicates()
    nodes = bi.select(F.col("src").alias("node")).dropDuplicates()
    labels = nodes.select("node", F.col("node").alias("label"))
    for i in range(rounds):
        nbr = bi.join(
            labels.select(F.col("node").alias("dst"), F.col("label").alias("nl")),
            "dst",
        ).select(F.col("src").alias("node"), F.col("nl"))
        counts = nbr.groupBy("node", "nl").agg(F.count(F.lit(1)).alias("n"))
        pick = counts.groupBy("node").agg(
            F.min(F.struct((-F.col("n")).alias("negn"), F.col("nl").alias("l")))
            .getField("l")
            .alias("new_label")
        )
        labels = labels.join(pick, "node", "left").select(
            "node", F.coalesce("new_label", "label").alias("label")
        )
        # cap lineage between rounds; keep the LAST round's plan visible
        # (a trailing checkpoint would truncate it to an RDD scan)
        if i < rounds - 1:
            labels = labels.localCheckpoint(eager=False)
    return labels


def scc_components(
    edges: DataFrame, max_iter: int = 50, max_closure_edges: int = 50_000_000
) -> DataFrame:
    """Strongly connected components restricted to CYCLE members: every
    node on a directed cycle (SCC size ≥ 2, or a self-loop) →
    (node, component), component = lexicographic SCC minimum. Nodes in
    singleton SCCs don't appear — in a KG the cycle members ARE the
    answer: a cycle through skos:broader / rdfs:subClassOf is a data
    error whose members form one equivalence class, and this mapping
    feeds `canonicalize` exactly like the sameAs CC mapping does (but
    respects DIRECTION, which undirected CC can't: a→b, b→a is a cycle;
    a→b, a→b is not).

    Algorithm: mutual reachability over the transitive closure —
    SCC(x) = {y : x→+y ∧ y→+x}; cycle members are x with x→+x. The
    closure comes from paths.transitive_closure (frontier rounds
    escalating to path doubling, O(log diameter)); on top of it this is
    ONE self-join (closure ⋈ reversed closure, hash equi-join on both
    endpoints) + a min agg. Scale honesty: closure size is the budget —
    right for schema/taxonomy graphs and per-host link subgraphs (the
    cycle-repair use), wrong for the raw web graph (where only
    undirected CC is tractable); same tiering as dedup_embedding's
    exact path vs LSH. The tier is ENFORCED (r3 VERDICT): the closure
    is built under `max_closure_edges` and a graph that outgrows it
    raises `paths.ClosureBudgetExceeded` with the redirect message
    instead of silently attempting a web-scale closure."""
    from .paths import transitive_closure

    c = transitive_closure(
        edges.select("src", "dst"), max_iter=max_iter,
        max_closure_edges=max_closure_edges,
    )
    rev = c.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    # x→+y ∧ y→+x; any src here is a cycle member by composition (x→+y→+x)
    mutual = c.join(rev, ["src", "dst"])
    return mutual.groupBy(F.col("src").alias("node")).agg(F.min("dst").alias("component"))


def bfs_distances_per_seed(
    edges: DataFrame, seeds: DataFrame, max_hops: int = 8
) -> DataFrame:
    """Per-seed BFS hop distances: (seed, node, dist) for every node
    reachable from each seed within `max_hops` (seed rows at dist 0) —
    `bfs_distances` keyed by (seed, node) instead of collapsing to the
    multi-source minimum, so per-source labels survive (what centrality
    estimation needs). Same level-synchronous shape; state and per-round
    join work scale with |seeds|·reach, which is why callers SAMPLE
    seeds (Eppstein & Wang 2001) rather than running all-pairs."""
    e = edges.select("src", "dst").dropDuplicates()
    dist = seeds.select(F.col("node").alias("seed")).dropDuplicates().select(
        "seed", F.col("seed").alias("node"), F.lit(0).cast("long").alias("dist")
    )
    frontier = dist
    for h in range(1, max_hops + 1):
        if h > 1:
            dist = dist.localCheckpoint(eager=False)
        # checkpoint before the probe — same double-compute avoidance as
        # bfs_distances
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select("seed", F.col("dst").alias("node"))
            .dropDuplicates()
            .join(dist, ["seed", "node"], "left_anti")
            .select("seed", "node", F.lit(h).cast("long").alias("dist"))
        ).localCheckpoint(eager=False)
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt)
        frontier = nxt
    return dist


def harmonic_centrality(
    edges: DataFrame, seeds: DataFrame, max_hops: int = 8, scale: int = 1_000_000
) -> DataFrame:
    """Sampled inward harmonic centrality (Eppstein & Wang 2001;
    harmonic = the centrality that stays well-defined on disconnected
    graphs, Boldi & Vigna 2014): h(n) = Σ over sampled seeds s ≠ n that
    REACH n of ⌊scale / dist(s, n)⌋ → (node, h, n_sources). Integer
    reciprocal-distances (the bm25/pagerank exactness rule), so the
    estimate is bit-identical across engines and partitionings.

    Scale: |seeds| per-seed BFS frontiers (bounded by max_hops rounds) +
    ONE map-side-combined sum; the all-pairs exact version is O(n·m) and
    intentionally not offered — sampling IS the scale path (HyperBall's
    HLL-counter variant trades exactness for all-node coverage; this
    trades coverage per seed for exact oracled values)."""
    d = bfs_distances_per_seed(edges, seeds, max_hops).filter(F.col("dist") > 0)
    # nullif guard: on a degenerate graph the BFS breaks in round 1 and
    # dist is still the seed LITERAL 0 — ANSI ConstantFolding would
    # evaluate `div 0` at plan time, before the filter above ever runs
    return d.groupBy("node").agg(
        F.sum(F.expr(f"CAST({int(scale)} AS BIGINT) div nullif(dist, 0)")).alias("h"),
        F.count(F.lit(1)).alias("n_sources"),
    )


def hits(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Integer-exact HITS (Kleinberg 1999) over directed (src, dst)
    string edges, run for EXACTLY `iters` unnormalized power iterations
    → (node, hub, auth) as BIGINTs.

    Per iteration: auth'(v) = Σ_{u→v} hub(u), then hub'(u) = Σ_{u→v}
    auth'(v), starting from hub = 1. Skipping the usual L2
    normalization keeps every value an exact integer sum — associative,
    so bit-identical across partitionings, cluster sizes, and engines
    (the pagerank/bm25 exactness rule); the RANKING is identical to
    normalized HITS because normalization is a positive per-iteration
    scalar. Magnitudes grow like (max degree)^(2·iters): callers cap
    `iters` so values stay < 2^63 (3 iterations supports max degree
    ~10^3; rank stability at that depth is what the sketch tier of a
    crawl-frontier scorer needs).

    Scale shape per iteration: two hash joins (edges ⋈ hub on src,
    edges ⋈ auth on dst) each followed by ONE map-side-combined sum —
    hub pages cost |degree| partial rows, never a single-reducer
    funnel; the node spine left-join fills 0 for sink/source nodes.
    Lineage is cut per round exactly like pagerank."""
    e = edges.select("src", "dst").dropDuplicates().localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .dropDuplicates()
    )
    hub = nodes.select("node", F.lit(1).cast("long").alias("hub"))
    auth = None
    for i in range(iters):
        a = (
            e.join(hub.select(F.col("node").alias("src"), "hub"), "src")
            .groupBy("dst")
            .agg(F.sum("hub").alias("s"))
        )
        auth = nodes.join(a, nodes["node"] == a["dst"], "left").select(
            "node", F.coalesce("s", F.lit(0)).cast("long").alias("auth")
        )
        h = (
            e.join(auth.select(F.col("node").alias("dst"), "auth"), "dst")
            .groupBy("src")
            .agg(F.sum("auth").alias("s"))
        )
        hub = nodes.join(h, nodes["node"] == h["src"], "left").select(
            "node", F.coalesce("s", F.lit(0)).cast("long").alias("hub")
        )
        if i < iters - 1:
            hub = hub.localCheckpoint(eager=False)
            auth = auth.localCheckpoint(eager=False)
    return hub.join(auth, "node").select("node", "hub", "auth")


def modularity(edges: DataFrame, labels: DataFrame, scale_cols: bool = True) -> DataFrame:
    """Exact per-community modularity contributions (Newman & Girvan
    2004) of a node→label partition over undirected (src, dst) string
    edges → (label, n_nodes, edges_in, deg_sum, q_num), where
    q_num = 4·m·edges_in − deg_sum² is the community's contribution to
    4m²·Q (m = |undirected simple edges|). Σ q_num / (4m²) = Q, but the
    division never happens engine-side: clearing the (2m)² denominator
    keeps every value an exact BIGINT (the pagerank rule), so community
    quality is value-oracled cross-engine — float modularity differs per
    summation order.

    This is the evaluation half of community detection (label_propagation
    produces the partition; this scores it — e.g. accept a KG host-graph
    clustering only if Q > 0.3, the conventional 'has community
    structure' bar).

    Scale: canonicalize to simple undirected edges (one distinct), TWO
    broadcast-or-hash joins label the endpoints, one map-side-combined
    agg per community for edges_in, one for degree sums — all keyed by
    community, no all-pairs anything; deg_sum² ≤ (2m)² bounds q_num
    below 2^63 for m < 1.5·10^9 per evaluated subgraph (per-host KG
    slices; the raw web graph would overflow and callers shard it)."""
    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
    la = labels.select(F.col("node").alias("a"), F.col("label").alias("la"))
    lb = labels.select(F.col("node").alias("b"), F.col("label").alias("lb"))
    lab = e.join(la, "a").join(lb, "b")
    m = lab.count()  # metadata-sized scalar: folds into literals below
    ein = (
        lab.filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count(F.lit(1)).alias("edges_in"))
    )
    # degree = incident simple edges; both endpoints contribute
    deg = (
        lab.select(F.col("la").alias("label"))
        .unionByName(lab.select(F.col("lb").alias("label")))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("deg_sum"))
    )
    nn = labels.groupBy("label").agg(F.count(F.lit(1)).alias("n_nodes"))
    return (
        nn.join(ein, "label", "left")
        .join(deg, "label", "left")
        .select(
            "label",
            "n_nodes",
            F.coalesce("edges_in", F.lit(0)).cast("long").alias("edges_in"),
            F.coalesce("deg_sum", F.lit(0)).cast("long").alias("deg_sum"),
            (
                F.lit(4) * F.lit(int(m)) * F.coalesce("edges_in", F.lit(0))
                - F.coalesce("deg_sum", F.lit(0)) * F.coalesce("deg_sum", F.lit(0))
            ).cast("long").alias("q_num"),
        )
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Exact integer components of the degree-assortativity coefficient
    (Newman 2002) over undirected (src, dst) string edges → ONE row
    (m2, sx, sxx, sxy): summing over both orientations of each simple
    edge (m2 = 2m terms, x = deg(endpoint), y = deg(other end)),
    r = (m2·sxy − sx²) / (m2·sxx − sx²). The division is the consumer's
    — every engine-side value is an exact BIGINT sum (the
    pagerank/modularity rule), so the web-graph characterization number
    (social nets assortative r>0, the web/KGs disassortative r<0) is
    value-oracled cross-engine; by symmetry Σx = Σy and Σx² = Σy², so
    four sums determine r.

    Scale: one degree aggregation (map-side-combined), two hash joins to
    label edge endpoints with degrees, one global sum — no all-pairs
    anything; degrees ≤ 10^8 and m ≤ 10^11 keep m2·sxx within BIGINT for
    any per-host or taxonomy slice (the full 10^12-edge web graph would
    need DECIMAL(38) sums — same switch the agg layer already has)."""
    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
    bi = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = bi.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("x"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("y"))
    lab = bi.join(da, "a").join(db, "b")
    return lab.agg(
        F.count(F.lit(1)).cast("long").alias("m2"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Exact local clustering coefficient components per node →
    (node, triangles, deg, cc_num, cc_den) with cc = cc_num/cc_den =
    2·triangles / (deg·(deg−1)) (Watts & Strogatz 1998); the division is
    the consumer's, every engine-side value an exact BIGINT (the
    pagerank/modularity rule). Degree-1 nodes carry cc_den = 0
    (coefficient undefined — callers filter or treat as 0).

    Built ON `triangle_count` (degree-ordered wedge join, skew-bounded
    at O(√m) per reducer) plus one simple-graph degree aggregation and a
    node-spine join — the coefficient costs one extra map-side-combined
    agg over what triangles already paid."""
    e = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = triangle_count(edges)
    return tri.join(deg, "node").select(
        "node",
        "triangles",
        F.col("deg").cast("long").alias("deg"),
        (F.lit(2) * F.col("triangles")).cast("long").alias("cc_num"),
        (F.col("deg") * (F.col("deg") - F.lit(1))).cast("long").alias("cc_den"),
    )


def khop_subgraph(quads: DataFrame, seeds: DataFrame, hops: int = 2) -> DataFrame:
    """K-hop neighborhood extraction around a seed entity set — the
    standard KG operation behind entity cards, GNN mini-batch fixtures,
    and debugging slices ('give me everything within 2 hops of these
    ids'). Expansion is UNDIRECTED over IRI/IRI edges but literal leaves
    ride along: a triple is included when its subject or object is in
    the current node set; both endpoints of every included triple join
    the next frontier.

    seeds: one column `ent`. Returns the distinct included quads.

    Scale shape: `hops` rounds of (frontier semi-join against the SPO
    and POS orientations + endpoint union) — the same frontier-fixpoint
    discipline as transitive_closure / bfs_distances, localCheckpoint
    per round to cut lineage; each round is two pushed-predicate-free
    hash semi-joins keyed on the node id. The node set grows by the
    neighborhood, not the corpus; a 2-hop ball around a hub can be huge,
    which is a property of the query, not the plan (cap hops/seeds in
    policy)."""
    nodes = seeds.select(F.col("ent").cast("string")).distinct().localCheckpoint(eager=True)
    out = None
    for _ in range(max(0, int(hops))):
        by_s = quads.join(
            nodes.withColumnRenamed("ent", "s_lex"), "s_lex", "left_semi"
        )
        by_o = quads.filter(F.col("o_kind") == 0).join(
            nodes.withColumnRenamed("ent", "o_lex"), "o_lex", "left_semi"
        )
        hop = by_s.unionByName(by_o.select(by_s.columns)).dropDuplicates()
        out = hop if out is None else out.unionByName(hop).dropDuplicates()
        ends = (
            hop.select(F.col("s_lex").alias("ent"))
            .unionByName(hop.filter(F.col("o_kind") == 0).select(F.col("o_lex").alias("ent")))
        )
        nodes = nodes.unionByName(ends).distinct().localCheckpoint(eager=True)
    return out if out is not None else quads.limit(0)


def louvain_move(edges: DataFrame, labels: DataFrame | None = None) -> DataFrame:
    """One SYNCHRONOUS Louvain move sweep (Blondel et al. 2008, phase-1
    step; parallel variant per Que et al.): every node evaluates moving
    into each neighboring community and adopts the best — all gains in
    cleared-denominator exact integers, so the sweep is bit-identical
    across partitionings and engines (the `modularity` rule: float ΔQ
    drifts per summation order; 2m-scaled integer ΔQ doesn't).

    For node i and candidate community C (Σtot excluding i):
        g(C) = 2m·k_{i,C} − Σtot(C∖i)·k_i     ∝ ΔQ(i→C)
    i adopts argmax g over {neighbor communities} ∪ {its own}, ties by
    minimum label — so one sweep from singletons is the canonical first
    Louvain round, and iterating sweep→`modularity` gives the
    accept/stop loop. `labels=None` starts from singletons.

    Scale: degree table and community-total table are both one
    map-side-combined agg; the per-(node, neighbor-community) count is
    the only |E|-sized shuffle; argmax is a min_by struct — no windows.
    Hub nodes cost their degree in count rows, combined map-side."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).dropDuplicates()
    # bi feeds 3 consumers and lab 5 — checkpoint both or composing
    # sweeps (move -> contract -> move, the multi-level loop) re-expands
    # each level's whole lineage per consumer: plan canonicalization was
    # observed to OOM the driver at level 2 of a 7-edge graph
    bi = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates()
        .localCheckpoint(eager=False)
    )
    nodes = bi.select(F.col("src").alias("node")).dropDuplicates()
    if labels is None:
        labels = nodes.select("node", F.col("node").alias("label"))
    deg = bi.groupBy(F.col("src").alias("node")).agg(F.count(F.lit(1)).alias("k"))
    m2 = bi.count()  # = 2m over the simple undirected graph
    lab = labels.select("node", "label").localCheckpoint(eager=False)
    tot = (
        lab.join(deg, "node")
        .groupBy("label")
        .agg(F.sum("k").alias("sigma"))
    )
    # k_{i,C}: neighbors of i per neighboring community
    nbrc = (
        bi.join(lab.select(F.col("node").alias("dst"), F.col("label").alias("c")), "dst")
        .groupBy(F.col("src").alias("node"), "c")
        .agg(F.count(F.lit(1)).alias("kic"))
    )
    cur = lab.select("node", F.col("label").alias("c"))
    cand = (
        nbrc.unionByName(cur.withColumn("kic", F.lit(0)))
        .groupBy("node", "c")
        .agg(F.max("kic").alias("kic"))  # own community keeps its kic if present
    )
    own = cur.withColumn("own", F.lit(1))
    scored = (
        cand.join(deg, "node")
        .join(tot.withColumnRenamed("label", "c"), "c")
        .join(own, ["node", "c"], "left")
        .select(
            "node",
            "c",
            (
                F.lit(int(m2)) * F.col("kic")
                # Σtot excludes i itself when C is i's current community
                - (F.col("sigma") - F.coalesce(F.col("own"), F.lit(0)) * F.col("k"))
                * F.col("k")
            ).cast("long").alias("g"),
        )
    )
    pick = scored.groupBy("node").agg(
        F.min(F.struct((-F.col("g")).alias("ng"), F.col("c").alias("l")))
        .getField("l")
        .alias("new_label")
    )
    return lab.join(pick, "node", "left").select(
        "node", F.coalesce("new_label", "label").alias("label")
    )


def conductance(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Exact per-community conductance over undirected (src, dst) string
    edges and a node→label partition → (label, n_nodes, edges_in,
    edges_out, volume, conductance_ppm) where volume = Σ degree over
    members (= 2·edges_in + edges_out) and conductance_ppm =
    ⌊10⁶·edges_out / min(volume, 2m − volume)⌋ — the standard cut
    quality φ(S) = cut(S,S̄) / min(vol S, vol S̄) (Kannan/Vempala/Vetta
    2004), the metric community-detection surveys pair with modularity:
    Q rewards dense insides, φ punishes leaky boundaries, and a healthy
    KG host cluster needs both.

    Exactness: integer division in ppm (the `modularity` rule) — float φ
    differs per summation order; 10⁶·edges_out ≤ 10⁶·2m stays far below
    2^63 for any per-host web-graph slice.

    Scale: one distinct to canonical simple edges, two endpoint label
    joins, then ONLY community-keyed aggs — each edge contributes to at
    most two communities, so the shuffle is |E|-bounded with map-side
    combine; no all-pairs anything. Whole-graph 2m folds to a literal
    (one count job, metadata-sized)."""
    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
    la = labels.select(F.col("node").alias("a"), F.col("label").alias("la"))
    lb = labels.select(F.col("node").alias("b"), F.col("label").alias("lb"))
    lab = e.join(la, "a").join(lb, "b")
    m2 = 2 * lab.count()  # total volume = 2m; folds into literals below
    ein = (
        lab.filter(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count(F.lit(1)).alias("edges_in"))
    )
    # boundary edges: one count per side's community (la != lb)
    cut = lab.filter(F.col("la") != F.col("lb"))
    eout = (
        cut.select(F.col("la").alias("label"))
        .unionByName(cut.select(F.col("lb").alias("label")))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("edges_out"))
    )
    nn = labels.groupBy("label").agg(F.count(F.lit(1)).alias("n_nodes"))
    out = (
        nn.join(ein, "label", "left")
        .join(eout, "label", "left")
        .select(
            "label",
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.coalesce("edges_in", F.lit(0)).cast("long").alias("edges_in"),
            F.coalesce("edges_out", F.lit(0)).cast("long").alias("edges_out"),
        )
        .withColumn(
            "volume", (F.lit(2) * F.col("edges_in") + F.col("edges_out")).cast("long")
        )
    )
    return out.withColumn(
        "denom", F.least(F.col("volume"), F.lit(int(m2)) - F.col("volume"))
    ).withColumn(
        "conductance_ppm",
        F.expr(
            "CASE WHEN denom <= 0 THEN CAST(NULL AS BIGINT) "
            "ELSE edges_out * 1000000L div denom END"
        ),
    ).drop("denom")


def edge_support(edges: DataFrame) -> DataFrame:
    """Per-edge triangle support over undirected (src, dst) string edges →
    (a, b, support) on the canonical a < b representation: the number of
    triangles each edge participates in — the edge-strength signal truss
    decomposition peels on (Cohen, NSA TR'08), and on a host link graph
    the cheapest 'is this edge part of a dense social structure or a
    one-off' feature.

    Shape: the `triangle_count` degree-oriented wedge join (out-degree
    O(√m) after orientation — no hub reducer), then each found triangle
    (u, v1, v2) credits its THREE edges: the closing edge (v1, v2) is
    already canonical, the two wedge arms canonicalize with least/
    greatest; ONE (a, b)-keyed map-side-combined count; left join back so
    triangle-free edges report 0. Exact integers, bit-identical across
    engines and partitionings."""
    e = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("dg"))
    )
    ed = (
        e.join(deg.select(F.col("node").alias("a"), F.col("dg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("dg").alias("db")), "b")
    )
    lower_is_a = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(lower_is_a, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_is_a, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    wedges = (
        o.select("u", F.col("v").alias("v1"))
        .join(o.select("u", F.col("v").alias("v2")), "u")
        .filter(F.col("v1") < F.col("v2"))
    )
    tri = wedges.join(e, (F.col("v1") == F.col("a")) & (F.col("v2") == F.col("b"))).select(
        "u", "v1", "v2"
    )
    contrib = (
        tri.select(F.col("v1").alias("a"), F.col("v2").alias("b"))
        .unionByName(
            tri.select(F.least("u", "v1").alias("a"), F.greatest("u", "v1").alias("b"))
        )
        .unionByName(
            tri.select(F.least("u", "v2").alias("a"), F.greatest("u", "v2").alias("b"))
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("s"))
    )
    return e.join(contrib, ["a", "b"], "left").select(
        "a", "b", F.coalesce("s", F.lit(0)).cast("long").alias("support")
    )


def ktruss(edges: DataFrame, k: int, max_rounds: int = 30) -> DataFrame:
    """k-truss peeling (Cohen'08; the triangle-grounded dense-subgraph
    notion that, unlike k-core, a star spammer cannot fake): repeatedly
    drop every edge in fewer than k−2 triangles until stable → surviving
    canonical edges with their final support (a, b, support). The
    spam-farm / community-nucleus refinement of `triangle_count`:
    membership requires witnessed closed triads, not raw degree.

    Scale: each round is one `edge_support` pass (degree-oriented wedge
    join — skew-bounded) + a filter; the round count is the peeling depth
    (small in practice — boundary cascades are local), each round's edge
    set localCheckpoint'd so lineage stays flat, convergence probed with
    the CC kernel's 1-job (count, hash-sum) signature rather than an
    exceptAll."""
    if k < 3:
        raise ValueError("k-truss requires k >= 3")
    cur = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint(eager=False)
    )

    def _sig(df: DataFrame) -> tuple:
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    prev = _sig(cur)
    sup = edge_support(cur.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    for _ in range(max_rounds):
        nxt = (
            sup.filter(F.col("support") >= int(k) - 2)
            .select("a", "b")
            .localCheckpoint(eager=False)
        )
        sig = _sig(nxt)
        cur = nxt
        if sig == prev:
            break
        prev = sig
        sup = edge_support(cur.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    return sup.filter(F.col("support") >= int(k) - 2).select("a", "b", "support")


def eccentricity(edges: DataFrame, seeds: DataFrame, max_hops: int = 8) -> DataFrame:
    """Per-seed hop eccentricity over directed (src, dst) string edges →
    (seed, ecc, n_reached): the max BFS distance and reach size within
    `max_hops` — run over sampled seeds this is the textbook diameter
    lower-bound / effective-diameter estimator (Magnien-Latapy-Habib),
    and per crawl frontier it answers 'how deep does this host's link
    tree go'. Reuses the level-synchronous per-seed BFS
    (`bfs_distances_per_seed`) — one frontier join + anti-join per hop,
    seeds sampled by the caller exactly as `harmonic_centrality`
    documents; the reduction is ONE map-side-combined (max, count) agg."""
    d = bfs_distances_per_seed(edges, seeds, max_hops)
    return d.groupBy("seed").agg(
        F.max("dist").cast("long").alias("ecc"),
        F.count(F.lit(1)).cast("long").alias("n_reached"),
    )


def betweenness(
    edges: DataFrame, seeds: DataFrame, max_hops: int = 8, scale: int = 1_000_000
) -> DataFrame:
    """Seed-sampled Brandes betweenness (Brandes 2001; sampling per
    Brandes-Pich 2007) over directed (src, dst) string edges →
    (node, bc): Σ over sampled seeds s ≠ v of the dependency δ_s(v), in
    1/`scale` units — the 'how much shortest-path traffic crosses this
    node' centrality, the classic bridge/broker detector on host graphs.

    Integer-exact surrogate: the true δ recursion
    δ(v) = Σ_{w: succ on a shortest path} σv/σw · (1 + δ(w)) is rational;
    floats drift per summation order (the modularity/PageRank problem),
    so each edge contribution is computed as σv·(scale + δw) div σw in
    BIGINT — deterministic, bit-identical across engines and
    partitionings, exact whenever σw | σv·(scale + δw) (always on trees
    and chains, where σ ≡ 1). The contract is this documented integer
    recursion, not a float approximation of it.

    Shape: forward pass = level-synchronous per-seed BFS carrying exact
    path counts σ (frontier equi-join + (seed,node)-keyed σ-sum +
    anti-join, the `bfs_distances_per_seed` discipline, localCheckpoint
    per round); backward pass = one join+agg per level from the deepest
    frontier back to the seeds (δ levels are disjoint by construction, so
    accumulation is a union, never a merge). 2·max_hops bounded rounds;
    |seeds| scales the state linearly — sampling IS the scale path, as
    `harmonic_centrality` documents. Emits every node reached from at
    least one OTHER seed (zero-dependency sinks included with bc 0)."""
    e = edges.select("src", "dst").dropDuplicates()
    dist = (
        seeds.select(F.col("node").alias("seed"))
        .dropDuplicates()
        .select(
            "seed",
            F.col("seed").alias("node"),
            F.lit(0).cast("long").alias("dist"),
            F.lit(1).cast("long").alias("sigma"),
        )
    )
    frontier = dist
    deepest = 0
    for h in range(1, max_hops + 1):
        if h > 1:
            dist = dist.localCheckpoint(eager=False)
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select("seed", F.col("dst").alias("node"), "sigma")
            .groupBy("seed", "node")
            .agg(F.sum("sigma").alias("sigma"))
            .join(dist.select("seed", "node"), ["seed", "node"], "left_anti")
            .select("seed", "node", F.lit(h).cast("long").alias("dist"), "sigma")
        ).localCheckpoint(eager=False)
        if nxt.isEmpty():
            break
        dist = dist.unionByName(nxt)
        frontier = nxt
        deepest = h
    dist = dist.localCheckpoint(eager=False)
    delta = None  # (seed, node, delta) — levels are disjoint key sets
    for h in range(deepest - 1, -1, -1):
        vh = dist.filter(F.col("dist") == h).select("seed", "node", "sigma")
        wh = dist.filter(F.col("dist") == h + 1).select(
            "seed", F.col("node").alias("wnode"), F.col("sigma").alias("wsigma")
        )
        if delta is not None:
            wh = wh.join(
                delta.select("seed", F.col("node").alias("wnode"), "delta"),
                ["seed", "wnode"],
                "left",
            ).select("seed", "wnode", "wsigma", F.coalesce("delta", F.lit(0)).alias("wdelta"))
        else:
            wh = wh.withColumn("wdelta", F.lit(0).cast("long"))
        contrib = (
            vh.join(e, vh["node"] == e["src"])
            .join(wh, (F.col("dst") == F.col("wnode")) & (vh["seed"] == wh["seed"]))
            .select(
                vh["seed"].alias("seed"),
                vh["node"].alias("node"),
                F.expr(f"sigma * (CAST({int(scale)} AS BIGINT) + wdelta) div wsigma").alias("c"),
            )
        )
        dh = contrib.groupBy("seed", "node").agg(F.sum("c").cast("long").alias("delta"))
        dh = dh.localCheckpoint(eager=False)
        delta = dh if delta is None else delta.unionByName(dh).localCheckpoint(eager=False)
    reached = dist.filter(F.col("node") != F.col("seed")).select("seed", "node")
    if delta is None:
        return reached.groupBy("node").agg(F.lit(0).cast("long").alias("bc"))
    return (
        reached.join(delta, ["seed", "node"], "left")
        .select("node", F.coalesce("delta", F.lit(0)).alias("delta"))
        .groupBy("node")
        .agg(F.sum("delta").cast("long").alias("bc"))
    )


def hyperball_counters(edges: DataFrame, max_hops: int = 8) -> DataFrame:
    """HyperBall register state (Boldi-Rosa-Vigna, WebGraph'11 — the
    algorithm that measured Facebook's four degrees): per node, the HLL
    registers of its OUT-ball within `max_hops` hops → (node, r_bucket,
    reg), mergeable by MAX like every `hll_sketch` state.

    Each round grows every ball one hop by MAX-merging each node's
    registers with its successors': one edge equi-join + one
    (node, bucket)-keyed map-side-combined max per round, per-node state
    ≤ 64 rows FOREVER (the whole point — exact per-seed BFS state is
    O(reach), this is O(1) per node, which is what makes all-node
    neighborhood functions tractable on a web graph). Registers are a
    pure function of the reached SET (md5-derived hashes, max-merge is
    order-free), so the state is bit-identical across engines and
    partitionings — the estimator can be oracled against an independent
    set-based computation. Convergence short-circuits with the CC
    kernel's 1-job (count, hash-sum) signature."""
    from .sketches import hll_sketch

    e = edges.select("src", "dst").dropDuplicates()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    cnt = hll_sketch(nodes, "node", ["node"]).localCheckpoint(eager=False)

    def _sig(df: DataFrame) -> tuple:
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("node", "r_bucket", "reg").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    prev = _sig(cnt)
    for _ in range(max_hops):
        grown = e.join(cnt, cnt["node"] == e["dst"]).select(
            F.col("src").alias("node"), "r_bucket", "reg"
        )
        merged = (
            cnt.unionByName(grown)
            .groupBy("node", "r_bucket")
            .agg(F.max("reg").alias("reg"))
        ).localCheckpoint(eager=False)
        sig = _sig(merged)
        cnt = merged
        if sig == prev:
            break
        prev = sig
    return cnt


def hyperball(edges: DataFrame, max_hops: int = 8) -> DataFrame:
    """Per-node neighborhood-function point N(node, max_hops): the HLL
    estimate of |out-ball(node, max_hops)| → (node, nb, s_sum, est) via
    the package's exact-integer HLL read path. Summed over nodes per h
    this is the neighborhood function N(h) whose saturation point is the
    effective diameter — the standard web-graph connectivity report,
    computed for ALL nodes at O(64 rows/node), where the sampled-seed
    exact alternatives (`bfs_distances_per_seed`, `eccentricity`) trade
    node coverage for exactness."""
    from .sketches import hll_estimate_from_sketch

    return hll_estimate_from_sketch(hyperball_counters(edges, max_hops), ["node"])


def closeness_centrality(
    edges: DataFrame, seeds: DataFrame, max_hops: int = 8, scale: int = 1_000_000
) -> DataFrame:
    """Sampled inward closeness (Bavelas'50 normalized form, computed
    like `harmonic_centrality` — the module's reciprocal-of-mean
    companion to harmonic's mean-of-reciprocals; harmonic stays the
    robust default on disconnected graphs, closeness is the one users
    ask for by name): for each node n reached by k>0 sampled seeds at
    total distance D, closeness = ⌊scale·k / D⌋ → (node, n_sources,
    total_dist, closeness) — exact integers end to end.

    Same shape as harmonic: |seeds| checkpointed BFS frontiers + ONE
    map-side-combined agg; nodes only reachable at distance 0 (the seeds
    themselves with no inbound paths) report total_dist 0 and NULL-free
    closeness 0 (division guard)."""
    d = bfs_distances_per_seed(edges, seeds, max_hops).filter(F.col("dist") > 0)
    return d.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.sum("dist").cast("long").alias("total_dist"),
    ).withColumn(
        "closeness",
        F.expr(
            f"CASE WHEN total_dist = 0 THEN CAST(0 AS BIGINT) "
            f"ELSE CAST({int(scale)} AS BIGINT) * n_sources div total_dist END"
        ),
    )


def ppr_push(
    edges: DataFrame,
    seeds: DataFrame,
    alpha_pct: int = 15,
    eps_ppm: int = 1000,
    max_rounds: int = 20,
    scale: int = 1_000_000,
) -> DataFrame:
    """Forward-push approximate personalized PageRank (Andersen-Chung-
    Lang FOCS'06) → (node, p, r): estimate p and residual r in 1/`scale`
    units. The LOCAL alternative to the power-iteration `pagerank(seeds=
    ...)`: state exists only where mass has actually reached — a seed's
    neighborhood — so a single entity's context scores touch thousands
    of rows of a 10^12-node graph, not all of it (power iteration is the
    all-nodes tool; push is the per-query one).

    Integer contract (the pagerank/modularity rule): a node with
    r(v) ≥ eps_ppm·outdeg(v) pushes — p(v) += α·r(v) div 100, each
    out-neighbor receives (100−α)·r(v) div (100·deg); the FLOOR
    REMAINDERS STAY IN r(v) instead of leaking, so total mass
    p+r == scale·|seeds| is conserved EXACTLY at every round (the
    invariant the tests pin) and the fixpoint is bit-identical across
    engines and partitionings. Dangling actives (outdeg 0) absorb their
    whole residual into p. Terminates when no node is active or after
    `max_rounds` (each round: one active×edges equi-join + one
    map-side-combined sum, checkpointed)."""
    if not (0 < alpha_pct < 100):
        raise ValueError("alpha_pct must be in (0, 100)")
    e = edges.select("src", "dst").dropDuplicates()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    state = (
        seeds.select(F.col("node")).dropDuplicates()
        .select("node", F.lit(0).cast("long").alias("p"), F.lit(int(scale)).cast("long").alias("r"))
    )
    a, s = int(alpha_pct), int(eps_ppm)
    for _ in range(max_rounds):
        st = state.join(deg, state["node"] == deg["src"], "left").select(
            "node", "p", "r", F.coalesce("deg", F.lit(0)).alias("deg")
        )
        # r > 0 is part of activity: a drained dangling node (r = 0,
        # deg = 0) must not count as active or the early-exit never fires
        active = (F.col("r") > 0) & (F.col("r") >= F.lit(s) * F.col("deg"))
        dangling = F.col("deg") == 0
        # the residual an active node keeps = its floor remainders
        push_p = F.when(
            active & dangling, F.col("r")
        ).when(active, F.expr(f"{a} * r div 100")).otherwise(F.lit(0))
        share = F.when(
            active & ~dangling, F.expr(f"(100 - {a}) * r div (100 * deg)")
        ).otherwise(F.lit(0))
        kept = st.select(
            "node",
            (F.col("p") + push_p).alias("p"),
            F.when(active, F.col("r") - push_p - share * F.col("deg"))
            .otherwise(F.col("r"))
            .alias("r"),
            share.alias("share"),
        ).localCheckpoint(eager=False)
        if st.filter(active).limit(1).isEmpty():
            return kept.select("node", "p", "r")
        inflow = (
            kept.filter(F.col("share") > 0)
            .join(e, kept["node"] == e["src"])
            .select(F.col("dst").alias("node"), F.col("share").alias("dr"))
            .groupBy("node")
            .agg(F.sum("dr").alias("dr"))
        )
        state = (
            kept.select("node", "p", "r")
            .join(inflow, "node", "full_outer")
            .select(
                "node",
                F.coalesce("p", F.lit(0)).cast("long").alias("p"),
                (F.coalesce("r", F.lit(0)) + F.coalesce("dr", F.lit(0))).cast("long").alias("r"),
            )
        ).localCheckpoint(eager=False)
    return state.select("node", "p", "r")


def louvain_contract(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Louvain phase-2 contraction (Blondel'08): collapse a node→label
    partition into the community SUPER-GRAPH → (src, dst, weight) on
    canonical src ≤ dst label pairs, where weight counts collapsed
    simple edges (self-pairs = intra-community edges, the diagonal the
    next `louvain_move` sweep's ΔQ needs). Composing
    `louvain_move` → `louvain_contract` → `louvain_move` … is the full
    Louvain loop, each level running on a graph `|communities|` big —
    the contraction IS why Louvain scales.

    Shape: dedup to canonical simple edges, two endpoint label hash
    joins, ONE (label, label)-keyed map-side-combined count — the
    `conductance` shuffle inventory exactly."""
    e = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
    la = labels.select(F.col("node").alias("a"), F.col("label").alias("la"))
    lb = labels.select(F.col("node").alias("b"), F.col("label").alias("lb"))
    return (
        e.join(la, "a")
        .join(lb, "b")
        .select(
            F.least("la", "lb").alias("src"),
            F.greatest("la", "lb").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
    )


def louvain_move_w(edges: DataFrame, labels: DataFrame | None = None) -> DataFrame:
    """Weighted synchronous Louvain move sweep — `louvain_move` for the
    contracted levels, where edges carry weights and SELF-LOOPS carry a
    supernode's internal mass: the full multi-level loop is
    move → `louvain_contract` → move_w → contract → … Self-loops enter
    the node's strength (k_i = Σ_{j≠i} w_ij + 2·w_ii — they travel WITH
    the node) and the community totals, never the neighbor-community
    gains. Same cleared-denominator integer ΔQ:
        g(C) = 2m·k_{i,C} − Σtot(C∖i)·k_i
    argmax over neighbor communities ∪ own, ties by minimum label; all
    BIGINT, bit-identical across engines/partitionings.

    Scale: identical shuffle inventory to the unweighted sweep (the
    counts become weight sums); contracted graphs are |communities|
    big, so upper levels are nearly free."""
    # checkpoint the shared nodes (canon feeds selfw/ee; lab feeds 4
    # consumers) — see louvain_move's composition-OOM note
    canon = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("weight").cast("long").alias("w"),
        )
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    selfw = canon.filter(F.col("a") == F.col("b")).select(
        F.col("a").alias("node"), F.col("w").alias("sw")
    )
    ee = canon.filter(F.col("a") != F.col("b"))
    bi = ee.select(F.col("a").alias("src"), F.col("b").alias("dst"), "w").unionByName(
        ee.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    nodes = (
        bi.select(F.col("src").alias("node"))
        .unionByName(selfw.select("node"))
        .dropDuplicates()
    )
    if labels is None:
        labels = nodes.select("node", F.col("node").alias("label"))
    s = bi.groupBy(F.col("src").alias("node")).agg(F.sum("w").alias("s"))
    deg = (
        nodes.join(s, "node", "left")
        .join(selfw, "node", "left")
        .select(
            "node",
            (F.coalesce("s", F.lit(0)) + 2 * F.coalesce("sw", F.lit(0))).alias("k"),
        )
    )
    row = bi.agg(F.sum("w")).first()
    m2 = int(row[0] or 0) + 2 * int(
        selfw.agg(F.sum("sw")).first()[0] or 0
    )
    lab = labels.select("node", "label").localCheckpoint(eager=False)
    tot = lab.join(deg, "node").groupBy("label").agg(F.sum("k").alias("sigma"))
    nbrc = (
        bi.join(lab.select(F.col("node").alias("dst"), F.col("label").alias("c")), "dst")
        .groupBy(F.col("src").alias("node"), "c")
        .agg(F.sum("w").alias("kic"))
    )
    cur = lab.select("node", F.col("label").alias("c"))
    cand = (
        nbrc.unionByName(cur.withColumn("kic", F.lit(0)))
        .groupBy("node", "c")
        .agg(F.max("kic").alias("kic"))
    )
    own = cur.withColumn("own", F.lit(1))
    scored = (
        cand.join(deg, "node")
        .join(tot.withColumnRenamed("label", "c"), "c")
        .join(own, ["node", "c"], "left")
        .select(
            "node",
            "c",
            (
                F.lit(int(m2)) * F.col("kic")
                - (F.col("sigma") - F.coalesce(F.col("own"), F.lit(0)) * F.col("k"))
                * F.col("k")
            ).cast("long").alias("g"),
        )
    )
    pick = scored.groupBy("node").agg(
        F.min(F.struct((-F.col("g")).alias("ng"), F.col("c").alias("l")))
        .getField("l")
        .alias("new_label")
    )
    return lab.join(pick, "node", "left").select(
        "node", F.coalesce("new_label", "label").alias("label")
    )


def hyperball_nf(edges: DataFrame, max_hops: int = 8) -> DataFrame:
    """The neighborhood function N(h) (Palmer-Gibbons-Faloutsos ANF,
    computed HyperBall-style): for each hop h ≤ `max_hops`, the summed
    HLL estimate of all nodes' out-ball sizes → (hop, n_nodes,
    sum_est) — the curve whose saturation knee is the EFFECTIVE
    DIAMETER, the single most-quoted connectivity statistic of web
    graphs ("four degrees of separation" is this curve on Facebook).

    Shape: the `hyperball_counters` merge loop, reading the register
    estimate after every hop — each read is one node-keyed agg + one
    1-row global sum (driver receives max_hops scalar rows, nothing
    else). Registers are a pure function of the reached set, so every
    point of the curve is exactly oracle-able against independently
    constructed ball sets."""
    from .sketches import hll_estimate_from_sketch, hll_sketch

    e = edges.select("src", "dst").dropDuplicates().localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    cnt = hll_sketch(nodes, "node", ["node"]).localCheckpoint(eager=False)

    def _point(h: int, c: DataFrame) -> tuple:
        row = (
            hll_estimate_from_sketch(c, ["node"])
            .agg(F.count(F.lit(1)).alias("n"), F.sum("est").alias("s"))
            .first()
        )
        return (h, int(row["n"]), int(row["s"]))

    points = [_point(0, cnt)]
    prev = None
    for h in range(1, max_hops + 1):
        grown = e.join(cnt, cnt["node"] == e["dst"]).select(
            F.col("src").alias("node"), "r_bucket", "reg"
        )
        cnt = (
            cnt.unionByName(grown)
            .groupBy("node", "r_bucket")
            .agg(F.max("reg").alias("reg"))
        ).localCheckpoint(eager=False)
        pt = _point(h, cnt)
        points.append(pt)
        if prev is not None and pt[1:] == prev[1:]:
            # converged: the remaining curve is flat — emit it without
            # further rounds (the curve's length contract stays max_hops)
            points.extend((hh, pt[1], pt[2]) for hh in range(h + 1, max_hops + 1))
            break
        prev = pt
    spark = edges.sparkSession
    return spark.createDataFrame(
        points, "hop int, n_nodes long, sum_est long"
    )


def katz_centrality(
    edges: DataFrame,
    iters: int = 3,
    alpha_pct: int = 20,
    scale: int = 1_000_000,
) -> DataFrame:
    """Katz centrality (Katz 1953), truncated to `iters` rounds of the
    fixpoint x ← β + α·Aᵀx with β = `scale` and α = alpha_pct/100 —
    i.e. each node scores 1 for itself plus α per in-path of length 1,
    α² per length-2 path, … (PageRank without the out-degree
    normalization, so prolific linkers transfer full weight — the
    variant used for citation/endorsement graphs where fan-out should
    not dilute credit). α must be < 1/λ_max for the untruncated series
    to converge; the truncated form is well-defined for any α and is
    what a fixed-round distributed pass computes.

    Integer-exact (the integer-PageRank precedent at `pagerank`):
    x_{t+1}(v) = scale + alpha_pct · Σ_{(u,v)∈E} x_t(u) // 100, all
    BIGINT — bit-comparable to the unrolled DuckDB mirror and invariant
    under partitioning. Returns (node, katz) for every node.

    Scale shape: per round ONE hash join (edges ⋈ scores on src — the
    score side is node-keyed, never larger than the node set) + ONE
    map-side-combined sum keyed by dst; rounds are a constant. Hub skew
    lands on the dst-sum, which partial-aggregates map-side, so a
    mega-hub contributes one partial row per task, not |in(v)| rows to
    one reducer. 100× data grows the join sides linearly; round count
    and shuffle count are unchanged.
    """
    e = edges.select("src", "dst").dropDuplicates()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    x = nodes.select("node", F.lit(scale).cast("long").alias("katz"))
    for i in range(iters):
        # checkpoint BETWEEN rounds (not after the last): lineage stays
        # constant-depth while the final round's join+agg remain in the
        # returned plan, where the audit can see them
        if i:
            x = x.localCheckpoint(eager=False)
        contrib = (
            e.join(x, e["src"] == x["node"])
            .groupBy("dst")
            .agg(F.sum("katz").alias("s"))
        )
        x = nodes.join(contrib, nodes["node"] == contrib["dst"], "left").select(
            "node",
            (F.lit(scale) + F.expr(f"{alpha_pct} * coalesce(s, 0) div 100"))
            .cast("long")
            .alias("katz"),
        )
    return x


def butterfly_counts(
    edges: DataFrame,
    left_col: str = "l",
    right_col: str = "r",
    max_right_degree: int = 1000,
    k: int = 20,
) -> DataFrame:
    """Butterfly (bipartite 4-cycle) counting — the bipartite analogue
    of triangle counting (Wang et al. VLDB'19 "Vertex Priority Based
    Butterfly Counting"): a butterfly is two left vertices sharing two
    right neighbors, the smallest unit of bipartite clustering. On web
    bipartite graphs (docs×shingles, users×hosts, orders×parts) the
    butterfly count is the standard cohesion/community-signal statistic
    where triangles are structurally impossible.

    Counting identity: for each left pair (l1 < l2) with c common right
    neighbors, the pair closes C(c,2) butterflies; each butterfly is
    counted once per its unique left pair. Per-left-vertex counts credit
    BOTH endpoints. Returns the top-`k` left vertices by butterfly count
    as (l, n_pairs, n_butterflies), ordered (count desc, l asc).

    Scale shape: wedges are generated by a right-keyed self-join — the
    ONLY quadratic step, bounded per right vertex at C(deg,2); right
    hubs above `max_right_degree` (boilerplate shingles, mega-hosts) are
    dropped with set semantics BEFORE the join (the LSH `max_bucket`
    guard), so worst-case work is |R|·C(cap,2), never |L|². The pair agg
    is map-side-combined; the final top-k is TakeOrderedAndProject.
    """
    e = edges.select(F.col(left_col).alias("l"), F.col(right_col).alias("r")).dropDuplicates()
    deg = e.groupBy("r").agg(F.count(F.lit(1)).alias("rdeg"))
    bounded = e.join(
        F.broadcast(deg.where(F.col("rdeg") > max_right_degree).select("r")),
        "r",
        "left_anti",
    )
    o = bounded.select("l", "r")
    wedges = (
        o.alias("a")
        .join(o.alias("b"), "r")
        .where(F.col("a.l") < F.col("b.l"))
        .select(F.col("a.l").alias("l1"), F.col("b.l").alias("l2"))
    )
    pairs = wedges.groupBy("l1", "l2").agg(F.count(F.lit(1)).alias("c")).where(F.col("c") >= 2)
    per_pair = pairs.select("l1", "l2", F.expr("c * (c - 1) div 2").alias("bf"))
    credit = per_pair.select(F.col("l1").alias("l"), "bf").unionByName(
        per_pair.select(F.col("l2").alias("l"), "bf")
    )
    return (
        credit.groupBy("l")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.sum("bf").alias("n_butterflies"))
        .orderBy(F.desc("n_butterflies"), F.asc("l"))
        .limit(k)
    )


def effective_diameter(
    edges: DataFrame, max_hops: int = 8, pct: int = 90
) -> DataFrame:
    """Effective diameter from the HyperBall neighborhood-function curve
    (Palmer-Gibbons-Faloutsos ANF; the number behind 'four degrees of
    separation'): the interpolated hop count at which `pct`% of all
    reachable (node, node) pairs are within distance d. Reads the N(h)
    curve `hyperball_nf` produces and returns ONE row
    (pct, max_hops, n_nodes, est_total, d_eff_milli) with the standard
    linear interpolation in exact integer millihops:

        d_eff = h-1 + (target − N(h-1)) / (N(h) − N(h-1)),
        target = pct% · N(max_hops),  h = min hop with N(h) ≥ target

    pinned division-cleared: the qualifying test is 100·N(h) ≥ pct·N(H)
    (no rounding ambiguity) and the fractional part is
    1000·(pct·N(H) − 100·N(h−1)) div (100·(N(h) − N(h−1))). N(0) already
    qualifying ⇒ 0. If the curve hasn't converged by max_hops the value
    is the bounded-curve estimate — same contract as hyperball_nf.

    Scale shape: everything downstream of the audited hyperball rounds
    operates on the CURVE — max_hops+1 rows forever — so the lag window
    and the min-hop pick are metadata-sized (the compaction_plan rule:
    a single-partition window over a constant-row frame is the point,
    not a smell)."""
    from pyspark.sql.window import Window

    nf = hyperball_nf(edges, max_hops=max_hops)
    last = nf.filter(F.col("hop") == max_hops).select(F.col("sum_est").alias("ntot"))
    w = Window.orderBy("hop")
    cur = nf.select(
        "hop",
        "n_nodes",
        F.col("sum_est").alias("nh"),
        F.lag("sum_est").over(w).alias("prev"),
    ).crossJoin(F.broadcast(last))
    qual = cur.filter(F.lit(100) * F.col("nh") >= F.lit(pct) * F.col("ntot"))
    first = qual.orderBy("hop").limit(1)
    return first.select(
        F.lit(pct).cast("int").alias("pct"),
        F.lit(max_hops).cast("int").alias("max_hops"),
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("ntot").cast("long").alias("est_total"),
        F.when(F.col("hop") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.lit(1000) * (F.col("hop") - 1)
            + F.expr(f"1000 * ({pct} * ntot - 100 * prev) div (100 * (nh - prev))")
        )
        .cast("long")
        .alias("d_eff_milli"),
    )


def bowtie_classify(
    edges: DataFrame, seeds: DataFrame, max_hops: int = 6
) -> DataFrame:
    """Bow-tie decomposition relative to a core seed set (Broder et al.
    WWW'00 'Graph structure in the Web' — the IN/SCC/OUT/tendril map of
    the web graph, measured exactly this way: BFS forward and backward
    from sampled core members): every node in the edge universe (or the
    seed set) is classed by bounded-hop reachability

        CORE  — reaches the seeds AND is reached by them (on a DAG only
                the seeds themselves; cycles through the seeds join)
        IN    — reaches the seeds (backward-reachable only)
        OUT   — reached from the seeds (forward-reachable only)
        OTHER — neither within max_hops (tendrils + disconnected; a hop
                bound cannot distinguish 'far' from 'disconnected' —
                documented sampling semantics, same contract as the
                other bounded BFS operators)

    Returns (node, cls, f_dist, b_dist) with exact hop distances (NULL
    on the unreached side). Scale shape: two audited `bfs_distances`
    runs (per-round frontier hash joins, checkpointed) + two node-keyed
    left joins over the node spine — nothing new at 100×; the edge
    reversal for the backward pass is a projection, not a shuffle."""
    e = edges.select("src", "dst").dropDuplicates()
    fwd = bfs_distances(e, seeds, max_hops=max_hops).select(
        "node", F.col("dist").alias("f_dist")
    )
    bwd = bfs_distances(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        seeds,
        max_hops=max_hops,
    ).select("node", F.col("dist").alias("b_dist"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .unionByName(seeds.select("node"))
        .distinct()
    )
    out = nodes.join(fwd, "node", "left").join(bwd, "node", "left")
    return out.select(
        "node",
        F.when(F.col("f_dist").isNotNull() & F.col("b_dist").isNotNull(), F.lit("CORE"))
        .when(F.col("b_dist").isNotNull(), F.lit("IN"))
        .when(F.col("f_dist").isNotNull(), F.lit("OUT"))
        .otherwise(F.lit("OTHER"))
        .alias("cls"),
        "f_dist",
        "b_dist",
    )


def salsa(edges: DataFrame, iters: int = 2, scale: int = 1_000_000) -> DataFrame:
    """SALSA hub/authority scores (Lempel-Moran WWW9 — HITS with the
    mutual-reinforcement sums replaced by RANDOM-WALK normalization:
    each endpoint divides its mass among its incident links, so a
    mega-hub's endorsement counts per-link, not per-total — the variant
    TREC web tracks found more spam-resistant than raw HITS). Fixed
    `iters` alternating rounds, everything exact BIGINT:

        a_{t+1}(v) = Σ_{(u,v)∈E}  h_t(u)     div out(u)
        h_{t+1}(u) = Σ_{(u,v)∈E}  a_{t+1}(v) div in(v)

    (floor per EDGE contribution, pinned — the oracle replays the same
    floors). Start h_0 = `scale` everywhere. Ranking matches normalized
    SALSA; absolute values are the unnormalized integer tier (the
    hits()/pagerank precedent). Returns (node, hub, auth).

    Scale shape: degrees are two map-side-combined aggs computed ONCE;
    each half-round is one hash join (edges ⋈ scores on the shared
    endpoint) + one map-side-combined sum — identical plan inventory to
    the audited hits(), plus the two degree joins. Checkpointed between
    rounds (the katz discipline: last round stays auditable)."""
    e = edges.select("src", "dst").dropDuplicates()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outd"))
    in_deg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("ind"))
    ew = (
        e.join(out_deg, "src")
        .join(in_deg, "dst")
        .select("src", "dst", "outd", "ind")
        .localCheckpoint(eager=False)
    )
    h = nodes.select("node", F.lit(scale).cast("long").alias("hub"))
    a = None
    for i in range(iters):
        if i:
            h = h.localCheckpoint(eager=False)
        a_contrib = (
            ew.join(h, ew["src"] == h["node"])
            .select("dst", F.expr("hub div outd").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        a = nodes.join(a_contrib, nodes["node"] == a_contrib["dst"], "left").select(
            "node", F.coalesce("s", F.lit(0)).cast("long").alias("auth")
        )
        a_ck = a.localCheckpoint(eager=False)
        h_contrib = (
            ew.join(a_ck, ew["dst"] == a_ck["node"])
            .select("src", F.expr("auth div ind").alias("c"))
            .groupBy("src")
            .agg(F.sum("c").alias("s"))
        )
        h = nodes.join(h_contrib, nodes["node"] == h_contrib["src"], "left").select(
            "node", F.coalesce("s", F.lit(0)).cast("long").alias("hub")
        )
    return (
        nodes.join(h, "node", "left")
        .join(a, "node", "left")
        .select("node", F.coalesce("hub", F.lit(0)).alias("hub"),
                F.coalesce("auth", F.lit(0)).alias("auth"))
    )


def luby_mis(edges: DataFrame, max_rounds: int = 8) -> DataFrame:
    """Maximal independent set via Luby's algorithm (Luby SICOMP'86 —
    THE distributed symmetry-breaking primitive: conflict-free crawl /
    update scheduling, one-per-neighborhood representative election),
    made DETERMINISTIC by replacing the random priorities with the
    node's 60-bit md5 hash (fixed across runs/engines/partitionings —
    md5 of distinct nodes collides never in practice, and the
    (priority, node) lexicographic pair breaks even that):

    per round, an ACTIVE node joins the MIS iff its pair is strictly
    smaller than every active neighbor's; selected nodes AND their
    neighbors deactivate. O(log n) rounds w.h.p.; the loop stops early
    when no nodes remain active (one aggregate probe per round, the
    bfs_distances discipline). Nodes still active after `max_rounds`
    are left undecided and NOT returned — callers sizing max_rounds get
    the standard completeness contract (the fixture converges well
    inside the bound; the oracle unrolls the same rounds).

    Returns (node, mis_round) for MIS members (round = 1-based election
    round). Edges are treated as undirected (symmetrized); self-loops
    dropped (a self-looped node can never be independent of itself —
    pinned: ignored, matching the usual MIS-on-simple-graph statement).

    Scale shape: per round ONE neighbor-min hash join + one
    map-side-combined min agg + two hash anti/semi joins (select /
    deactivate); active set shrinks geometrically; localCheckpoint per
    round caps lineage exactly like the other fixpoints."""
    e0 = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    und = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).dropDuplicates()
    pr = lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")  # noqa: E731
    nodes = (
        und.select(F.col("src").alias("node")).distinct()
        .select("node", pr(F.col("node")).alias("p"))
    )
    active = nodes
    spark = edges.sparkSession
    out = spark.createDataFrame([], "node string, mis_round int")
    for rnd in range(1, max_rounds + 1):
        active = active.localCheckpoint()  # eager: reused 4x below + probe
        if active.isEmpty():
            break
        # min active-neighbor pair per active node (nodes with no active
        # neighbor have NULL -> selected unconditionally)
        nb = (
            und.join(active.select(F.col("node").alias("src")), "src", "leftsemi")
            .join(
                active.select(F.col("node").alias("dst"), F.col("p").alias("np"),
                              F.col("node").alias("nn")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min(F.struct("np", "nn")).alias("m"))
        )
        sel = (
            active.join(nb, active["node"] == nb["src"], "left")
            .filter(
                F.col("m").isNull()
                | (F.struct(F.col("p").alias("np"), F.col("node").alias("nn")) < F.col("m"))
            )
            .select("node")
        )
        sel = sel.localCheckpoint()
        out = out.unionByName(
            sel.select("node", F.lit(rnd).cast("int").alias("mis_round"))
        )
        # deactivate selected and their neighbors
        dropped = sel.unionByName(
            und.join(sel.select(F.col("node").alias("src")), "src", "leftsemi")
            .select(F.col("dst").alias("node"))
        ).distinct()
        active = active.join(dropped, "node", "left_anti")
    return out


def simrank(
    edges: DataFrame,
    iters: int = 2,
    c_pct: int = 80,
    scale: int = 1_000_000,
) -> DataFrame:
    """SimRank (Jeh & Widom, KDD 2002) truncated to `iters` rounds:
    two nodes are similar when their IN-neighbors are similar —
    s(a,a)=1, s(a,b) = C/(|I(a)||I(b)|) · Σ_{i∈I(a), j∈I(b)} s(i,j).
    The structural-context similarity used to suggest same-as candidates
    among entities that share citation/containment contexts even when
    their labels share nothing.

    Integer-exact (the katz/pagerank precedent): scores are BIGINT
    multiples of 1/`scale`, and each round computes
    s'(a,b) = (c_pct · Σ s(i,j)) // (100 · |I(a)| · |I(b)|) — ONE
    pinned floor division, bit-comparable to the unrolled DuckDB CTE
    mirror and invariant under partitioning.

    State is SPARSE: only nonzero pairs are materialized (s₀ = the
    diagonal), so round k holds pairs of nodes whose in-neighborhoods
    overlap within k hops — locality-bounded graphs keep |state| ≈ O(n),
    never the dense n² matrix. All-pairs SimRank is inherently
    quadratic in the worst case: the operator's documented tier is
    catalog-sized graphs (ontology classes, predicates, hosts — the
    scc_cycles/bisim_summary tier), not corpus entities.

    Per round: state ⋈ edges (i→a) ⋈ edges (j→b) with both probe sides
    node-keyed, then ONE map-side-combined (a,b) sum; in-degrees are a
    one-off node-keyed aggregate joined in by key. Returns off-diagonal
    (a, b, sim) with a < b and sim > 0 (symmetric closure implied).
    """
    e = edges.select("src", "dst").dropDuplicates().localCheckpoint(eager=False)
    indeg = e.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("deg"))
    diag = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .select(F.col("node").alias("a"), F.col("node").alias("b"),
                F.lit(scale).cast("long").alias("sim"))
    )
    state = diag
    for i in range(iters):
        if i:
            state = state.localCheckpoint(eager=False)
        summed = (
            state.join(e.select(F.col("src").alias("a"), F.col("dst").alias("na")), "a")
            .join(e.select(F.col("src").alias("b"), F.col("dst").alias("nb")), "b")
            .groupBy(F.col("na").alias("a"), F.col("nb").alias("b"))
            .agg(F.sum("sim").alias("s"))
        )
        off = (
            summed.filter(F.col("a") != F.col("b"))
            .join(indeg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
            .join(indeg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
            .select(
                "a", "b",
                F.expr(f"CAST({c_pct} * s DIV (100 * da * db) AS BIGINT)").alias("sim"),
            )
            .filter(F.col("sim") > 0)
        )
        state = diag.unionByName(off)
    return state.filter(F.col("a") < F.col("b")).select("a", "b", "sim")


def pivot_clusters(
    edges: DataFrame,
    seed: str = "pivot",
    rounds: int = 6,
) -> DataFrame:
    """Parallel-pivot correlation clustering (ParallelPivot — Chierichetti,
    Dalvi & Kumar, KDD 2014; the distributed form of Ailon et al.'s
    CC-Pivot 3-approximation): cluster the '+'-edge similarity graph so
    that, unlike connected components, two records merge ONLY when one is
    directly adjacent to the cluster's pivot — long weak chains of
    pairwise matches stop at pivot boundaries instead of snowballing into
    one mega-entity (the classic ER transitive-closure failure mode).

    Deterministic: the random permutation is π(v) = md5(seed ':' v), so
    every engine and every partitioning elects the same pivots. Per
    round, an active node is a PIVOT iff π(v) beats every active
    neighbor; active neighbors of pivots join their minimum-π adjacent
    pivot (two pivots are never adjacent, by minimality); clustered
    nodes leave the graph. Each round removes at least the global-min
    active node and w.h.p. a constant fraction — O(log n) rounds; the
    `rounds` cap is mirrored exactly by the unrolled oracle, and any
    stragglers beyond it become singletons (deterministic both sides).

    → (node, cluster) for every endpoint of `edges`; cluster = pivot id.

    Scale shape: per round ONE neighbor-min aggregate (map-side
    combined), one anti/semi-style pivot join, one arg-min assignment
    aggregate — all hash-partitioned on node ids; state shrinks
    geometrically, and eager per-round checkpoints keep lineage flat
    (the mis/matching precedent)."""
    def rank(c):
        return F.md5(F.concat(F.lit(seed + ":"), F.col(c)))

    sym = (
        edges.select(F.col(edges.columns[0]).alias("a"), F.col(edges.columns[1]).alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    sym = (
        sym.unionByName(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = sym.select(F.col("a").alias("node")).distinct()
    active = nodes.localCheckpoint(eager=False)
    e = sym
    outs = None
    for t in range(rounds):
        if t and e.isEmpty():
            break
        nm = e.groupBy("a").agg(F.min(rank("b")).alias("m"))
        piv = (
            active.join(nm, active["node"] == nm["a"], "left")
            .filter(F.col("m").isNull() | (rank("node") < F.col("m")))
            .select("node")
            .localCheckpoint(eager=True)
        )
        asg = (
            e.join(piv.select(F.col("node").alias("b")), "b")
            .groupBy("a")
            .agg(F.min_by("b", rank("b")).alias("cluster"))
            .select(F.col("a").alias("node"), "cluster")
        )
        got = piv.select("node", F.col("node").alias("cluster")).unionByName(asg)
        got = got.localCheckpoint(eager=True)
        outs = got if outs is None else outs.unionByName(got)
        active = active.join(got.select("node"), "node", "left_anti").localCheckpoint(eager=True)
        e = (
            e.join(active.select(F.col("node").alias("a")), "a", "left_semi")
            .join(active.select(F.col("node").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    leftovers = active.select("node", F.col("node").alias("cluster"))
    out = leftovers if outs is None else outs.unionByName(leftovers)
    return out


def boruvka_msf(edges: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Minimum spanning forest via Borůvka rounds (Borůvka 1926; the
    textbook DISTRIBUTED MST — per round every component grabs its
    lightest incident cross edge and contracts, components at least
    halve, O(log V) rounds; the backbone of single-linkage clustering,
    which is what ER/dedup pipelines want it for: cut the MSF at a
    distance threshold and the components ARE the single-linkage
    clusters, without ever materializing the all-pairs graph).

    Input (a, b, w): undirected weighted edges, any orientation;
    self-loops dropped, parallel edges collapse to the LIGHTEST
    (pinned). Edge total order is the unique key (w, a, b) — ties in w
    can't produce cycles or nondeterminism. Returns (a, b, w) = the
    unique MSF under that order.

    Scale shape, per round: two hash joins stamp component ids on the
    edge list, ONE map-side-combined min_by agg picks each component's
    lightest cross edge (shuffle carries |components| rows), and the
    contraction relabels via connected_components on the SELECTED
    edges only (≤ |components| rows — the adaptive driver/distributed
    CC, which auto-routes big early rounds to the large/small-star
    path). Eager checkpoints cap the per-round lineage; the cross-edge
    set shrinks monotonically. Empty-frontier early-out; `max_rounds`
    is a completeness knob — components at least halve per round, so
    the default 20 finishes any graph with < 2^20 nodes per connected
    component, and the early-out detects the fixpoint either way."""
    e = (
        edges.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"), "w")
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b").agg(F.min("w").alias("w"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .distinct()
    )
    comp = nodes.select("node", F.col("node").cast("string").alias("comp"))
    forest = e.select("a", "b", "w").limit(0)
    for _ in range(max_rounds):
        comp = comp.localCheckpoint()  # eager: 2 edge joins + relabel read it
        ce = (
            e.join(comp.select(F.col("node").alias("a"), F.col("comp").alias("ca")), "a")
            .join(comp.select(F.col("node").alias("b"), F.col("comp").alias("cb")), "b")
            .filter(F.col("ca") != F.col("cb"))
            .localCheckpoint()  # eager: isEmpty probe + both pick legs
        )
        if ce.isEmpty():
            break
        key = F.struct(F.col("w").alias("kw"), F.col("a").alias("ka"), F.col("b").alias("kb"))
        ed = F.struct("a", "b", "w", "ca", "cb")
        ends = ce.select(F.col("ca").alias("c"), key.alias("k"), ed.alias("ed")).unionByName(
            ce.select(F.col("cb").alias("c"), key.alias("k"), ed.alias("ed"))
        )
        sel = (
            ends.groupBy("c").agg(F.min_by("ed", "k").alias("ed"))
            .select("ed.a", "ed.b", "ed.w", "ed.ca", "ed.cb")
            .dropDuplicates(["a", "b"])
            .localCheckpoint()  # eager: forest union + contraction read it
        )
        forest = forest.unionByName(sel.select("a", "b", "w")).localCheckpoint(eager=False)
        mapping = connected_components(
            sel.select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
        )
        comp = (
            comp.join(
                mapping.select(F.col("node").alias("comp"), F.col("component").alias("nc")),
                "comp", "left",
            )
            .select("node", F.coalesce("nc", F.col("comp")).alias("comp"))
        )
    return forest


def sweep_cut(
    edges: DataFrame, scores: DataFrame, k_max: int = 20, scale: int = 1_000_000
) -> DataFrame:
    """Sweep cut — the second half of Andersen-Chung-Lang local
    clustering (FOCS'06): given per-node scores from a localized
    diffusion (`ppr_push`, heat kernel, or plain walk counts), order
    nodes by score/degree and return the prefix whose CONDUCTANCE is
    minimal — the locally-best community around the seed. ACL's theorem
    is that some prefix of this exact order certifies a low-conductance
    cut; the sweep is what turns diffusion scores into a community.

    Pinned arithmetic: order key = score·scale div deg (integer floor),
    ties by node ASC; conductance_ppm = 10⁶·cut(S_k) div min(vol(S_k),
    2m − vol(S_k)) with cut = vol − 2·edges_within (handshake), NULL
    when the denominator is 0 (the full-graph prefix). `is_best` marks
    the minimal conductance (ties → smallest k).

    Output per prefix k ≤ k_max: (k, node, deg, vol, cut, cond_ppm,
    is_best).

    Scale shape: degrees are one map-side agg; the top-k_max order is
    TakeOrdered (never a full sort); edges-within counts come from ONE
    hash join of the undirected edge list against the k_max-row rank
    table (broadcast) grouped by max endpoint rank; every window after
    that runs on ≤ k_max rows. The corpus-sized work is exactly one
    scan + one broadcast join."""
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)  # degrees + m + within all read it
    )
    sym = und.select(F.col("a").alias("node")).unionByName(und.select(F.col("b").alias("node")))
    deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
    m2 = und.agg((2 * F.count(F.lit(1))).cast("long").alias("m2"))
    okey = F.expr(f"score * {scale} div deg")
    top = (
        scores.join(deg, "node")
        .orderBy(okey.desc(), F.col("node").asc())
        .limit(k_max)
    )
    w = Window.orderBy(okey.desc(), F.col("node").asc())
    ranked = top.withColumn("k", F.row_number().over(w)).localCheckpoint(eager=False)
    ra = ranked.select(F.col("node").alias("a"), F.col("k").alias("ka"))
    rb = ranked.select(F.col("node").alias("b"), F.col("k").alias("kb"))
    within = (
        und.join(F.broadcast(ra), "a").join(F.broadcast(rb), "b")
        .groupBy(F.greatest("ka", "kb").alias("k"))
        .agg(F.count(F.lit(1)).alias("nw"))
    )
    wk = Window.orderBy("k")
    curve = (
        ranked.join(within, "k", "left")
        .withColumn("vol", F.sum("deg").over(wk).cast("long"))
        .withColumn("win", F.sum(F.coalesce("nw", F.lit(0))).over(wk).cast("long"))
        .crossJoin(F.broadcast(m2))
        .select(
            "k", "node", F.col("deg").cast("long").alias("deg"), "vol",
            (F.col("vol") - 2 * F.col("win")).alias("cut"),
            F.least(F.col("vol"), F.col("m2") - F.col("vol")).alias("__den"),
        )
        .withColumn(
            "cond_ppm",
            F.when(F.col("__den") > 0, F.expr("1000000 * cut div __den")).cast("long"),
        )
    )
    best = Window.orderBy(
        F.when(F.col("cond_ppm").isNull(), F.lit(2_000_000)).otherwise(F.col("cond_ppm")).asc(),
        F.col("k").asc(),
    )
    return (
        curve.withColumn("__rb", F.row_number().over(best))
        .withColumn("is_best", (F.col("__rb") == 1).cast("int"))
        .drop("__den", "__rb")
    )


def rich_club(edges: DataFrame) -> DataFrame:
    """Rich-club coefficient curve (Zhou & Mondragón 2004; in a host
    graph it answers "do the mega-hubs preferentially link to EACH
    OTHER?" — link-farm collusion and tier-1 cores both show up as a
    rich club, random mixing does not): for each degree threshold k
    (every distinct degree value),

        φ(k) = 2·E_k / (N_k·(N_k−1))

    over the subgraph of nodes with deg > k. Output (k, n_k, e_k,
    phi_ppm) for thresholds with N_k ≥ 2; phi_ppm is the pinned
    integer floor.

    Scale shape: degrees = one map-side agg; E_k for ALL thresholds at
    once rides the edge list ONCE — each edge contributes to every k <
    min(deg_a, deg_b), so group edges by min-endpoint-degree and
    suffix-sum (same for nodes by degree); the curve windows then run
    on |distinct degrees| rows (hundreds at web scale, not billions)."""
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)  # degrees + edge-mindeg both read it
    )
    deg = (
        und.select(F.col("a").alias("node")).unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=False)  # node hist + 2 edge stamps read it
    )
    node_hist = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("nn"))
    edge_hist = (
        und.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
        .groupBy(F.least("da", "db").alias("deg"))
        .agg(F.count(F.lit(1)).alias("ne"))
    )
    hist = node_hist.join(edge_hist, "deg", "full").select(
        F.col("deg"), F.coalesce("nn", F.lit(0)).alias("nn"), F.coalesce("ne", F.lit(0)).alias("ne")
    )
    # suffix sums: N_k = Σ nn over deg > k, E_k = Σ ne over mindeg > k —
    # a DESC cumulative shifted by one row (strict >)
    w = Window.orderBy(F.col("deg").desc()).rowsBetween(Window.unboundedPreceding, -1)
    curve = hist.select(
        F.col("deg").cast("long").alias("k"),
        F.coalesce(F.sum("nn").over(w), F.lit(0)).cast("long").alias("n_k"),
        F.coalesce(F.sum("ne").over(w), F.lit(0)).cast("long").alias("e_k"),
    )
    return curve.filter(F.col("n_k") >= 2).withColumn(
        "phi_ppm", F.expr("1000000 * 2 * e_k div (n_k * (n_k - 1))").cast("long")
    )


class CycleDetected(RuntimeError):
    """Raised by topo_levels when max-relaxation still improves after
    `max_rounds` — either the input has a directed cycle (no topological
    order exists) or its longest path exceeds the round budget. Either
    way the caller must not trust a partial level assignment, so the
    operator refuses instead of returning one (the ClosureBudgetExceeded
    philosophy from operators/paths.py)."""


def topo_levels(
    edges: DataFrame, max_rounds: int = 32, probe_every: int = 1
) -> DataFrame:
    """Topological levels over a (src, dst) DAG → (node, level) where
    level(v) = length of the LONGEST path ending at v (Kahn's layering:
    sources at 0, each node one past its deepest predecessor). The
    layering IS a topological order (level(u) < level(v) for every edge
    u→v) and is the scheduling-depth answer dependency pipelines
    actually want: all nodes on the same level can run concurrently.

    Frontier max-relaxation, the mirror image of `sssp`'s min: start
    every node at level 0, propagate level+1 along out-edges, max-combine
    per target (map-side), keep strict improvements as the next
    frontier. A DAG of depth d converges in exactly d rounds (each
    round settles one more layer); the rounds are integer-exact and
    order-insensitive, so the suite value-oracles the labeling against a
    rounds-unrolled DuckDB max-relaxation mirror — unrolling past
    convergence is idempotent, so the mirror only needs D ≥ depth.

    If the frontier is still non-empty after `max_rounds`, raises
    CycleDetected: in a cycle the relaxation improves forever, and a
    truncated labeling would silently violate the level(u) < level(v)
    contract.

    `probe_every=N` runs the isEmpty convergence probe only every Nth
    round (plus the final round): rounds past convergence are no-ops on
    empty frontiers (two empty-side hash joins, no data movement), so
    batching trades up to N−1 trivial rounds for N−1 fewer probe jobs —
    pure scheduling overhead at depth≫N. Semantics unchanged: the
    labeling is identical and cycle refusal still fires at the budget.

    Scale: per-round cost is |frontier ⋈ edges| with map-side max
    combine — never |V|²; the settled table is only ever the probe side
    of one left join; localCheckpoint caps the O(depth) lineage
    (the sssp discipline). Depth, not |V|, bounds the round count —
    dependency DAGs at web scale are wide and shallow."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).dropDuplicates()
    lvl = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .dropDuplicates()
        .select("node", F.lit(0).cast("long").alias("level"))
    )
    frontier = lvl
    visible = lvl
    for r in range(max_rounds):
        if r > 0:
            # keep the last anti-join+union plan visible on the RETURNED
            # frame (the sssp discipline — checkpointing what we return
            # would hide the join shapes from the plan audit); the working
            # copy is checkpointed to cap the O(depth) lineage
            visible = lvl
            lvl = lvl.localCheckpoint(eager=False)
        cand = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"), (F.col("level") + 1).alias("nl"))
            .groupBy("node")
            .agg(F.max("nl").alias("nl"))
        )
        improved = (
            cand.join(lvl, "node", "left")
            .filter(F.col("level").isNull() | (F.col("nl") > F.col("level")))
            .select("node", F.col("nl").alias("level"))
            .localCheckpoint(eager=False)  # isEmpty probe + union both read it
        )
        if ((r + 1) % probe_every == 0 or r == max_rounds - 1) and improved.isEmpty():
            return visible
        lvl = (
            lvl.join(improved.select("node"), "node", "left_anti")
            .unionByName(improved)
        )
        frontier = improved
    raise CycleDetected(
        f"topo_levels: still improving after {max_rounds} rounds — "
        "cyclic input or depth over budget"
    )


def densest_peel(
    edges: DataFrame, num_pct: int = 200, rounds: int | None = None
) -> DataFrame:
    """Greedy densest-subgraph peeling (Charikar 2000 via the
    Bahmani-Kumar-Vazirani MapReduce variant, WWW 2012) over (src, dst)
    string edges → (node, peel_round): round i synchronously removes
    every node whose degree is ≤ (num_pct/100)·avg_deg of the CURRENT
    subgraph, labeling it peel_round = i. The densest prefix — the
    survivor set at the best round, recoverable from the labeling as
    {v : peel_round(v) ≥ r*} — is a 2(num_pct/100)-approximation of the
    maximum-density subgraph; num_pct=200 (ε=1) gives the 4-approx that
    guarantees ≤ log₂|V| rounds, because fewer than half the nodes can
    have degree > 2·avg.

    Always terminates with every node labeled: min-degree ≤ avg ≤
    threshold, so every round peels at least one node. The comparison
    is the integer cross-multiply deg·|V|·100 ≤ num_pct·2·|E| — no
    rationals, so the labels are bit-identical across engines and the
    suite value-oracles them against a rounds-unrolled DuckDB mirror
    (`rounds=R` runs exactly R synchronous rounds, the kcore contract;
    nodes surviving all R rounds — only possible when R < the
    data-dependent peel depth — are labeled peel_round = R).

    The use at corpus scale: the densest host-link or co-citation core
    is the link-farm / template-cluster detector; peel_round is a
    usable "coreness by density" score per node.

    Scale shape per round: one map-side-combined degree agg, two 1-row
    broadcast totals, two hash anti joins; the peeled set is usually a
    constant fraction, AQE broadcasts the small side; localCheckpoint
    caps the O(log V) lineage."""
    e = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    out = None
    i = 0
    while rounds is None or i < rounds:
        deg = (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=False)  # totals + threshold filter read it
        )
        tot = deg.agg(
            F.count(F.lit(1)).alias("nv"), (F.sum("n") / 2).cast("long").alias("ne")
        )
        weak = (
            deg.crossJoin(F.broadcast(tot))  # 1-row totals
            .filter(F.col("n") * F.col("nv") * 100 <= num_pct * 2 * F.col("ne"))
            .select("node")
        )
        if rounds is None and weak.isEmpty():
            break
        labeled = weak.select("node", F.lit(i).cast("long").alias("peel_round"))
        out = labeled if out is None else out.unionByName(labeled)
        e = (
            e.join(weak.withColumnRenamed("node", "a"), "a", "left_anti")
            .join(weak.withColumnRenamed("node", "b"), "b", "left_anti")
            .localCheckpoint(eager=False)
        )
        i += 1
        if rounds is None and i > 100_000:  # malformed-input backstop
            raise RuntimeError("densest_peel: peeling did not converge")
    survivors = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .dropDuplicates()
        .select("node", F.lit(i).cast("long").alias("peel_round"))
    )
    return survivors if out is None else out.unionByName(survivors)
