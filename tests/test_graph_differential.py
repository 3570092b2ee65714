"""Differential fuzz: the iterative graph operators (BFS distances,
label propagation, k-core, PageRank, link prediction) vs independent
DuckDB mirrors on random small digraphs. The suite oracles pin each
operator on ONE structured graph (chain-with-chords); these drive the
same DataFrame code over hypothesis-generated topologies — cycles,
self-loops, multi-edges, disconnected pieces — where hand-reasoning
misses corners. All five operators are integer-exact by design, so the
comparison is equality, not tolerance."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

edge = st.tuples(st.integers(0, 5), st.integers(0, 5))
edges_st = st.lists(edge, min_size=1, max_size=12, unique=True)

_SETTINGS = dict(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _edf(spark, pairs):
    return spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in pairs], "src string, dst string"
    )


def _duck(pairs):
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO e VALUES (?, ?)", [(f"n{a}", f"n{b}") for a, b in pairs])
    return con


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(pairs=edges_st, hops=st.integers(1, 4))
def test_bfs_distances_fuzz(spark, pairs, hops):
    from ocaml_rdf_spark.operators.cc import bfs_distances

    seeds = spark.createDataFrame([("n0",), ("n3",)], "node string")
    got = sorted(map(tuple, bfs_distances(_edf(spark, pairs), seeds, max_hops=hops).collect()))
    con = _duck(pairs)
    con.execute("CREATE TABLE d (node VARCHAR, dist BIGINT)")
    con.execute("INSERT INTO d VALUES ('n0', 0), ('n3', 0)")
    for h in range(1, hops + 1):
        con.execute(f"""
            CREATE OR REPLACE TABLE d AS
            SELECT node, MIN(dist) AS dist FROM (
              SELECT node, dist FROM d
              UNION ALL
              SELECT e.dst, d.dist + 1 FROM d JOIN e ON e.src = d.node WHERE d.dist = {h - 1}
            ) GROUP BY node
        """)
    want = sorted(map(tuple, con.execute("SELECT node, dist FROM d").fetchall()))
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(pairs=edges_st, rounds=st.integers(0, 3))
def test_label_propagation_fuzz(spark, pairs, rounds):
    from ocaml_rdf_spark.operators.cc import label_propagation

    got = sorted(map(tuple, label_propagation(_edf(spark, pairs), rounds=rounds).collect()))
    con = _duck(pairs)
    con.execute("""
        CREATE TABLE bi AS
        SELECT src, dst FROM e WHERE src <> dst
        UNION SELECT dst, src FROM e WHERE src <> dst
    """)
    con.execute("CREATE TABLE l AS SELECT DISTINCT src AS node, src AS label FROM bi")
    for _ in range(rounds):
        con.execute("""
            CREATE OR REPLACE TABLE l AS
            WITH c AS (
              SELECT b.src AS node, l.label AS nl, COUNT(*) AS n
              FROM bi b JOIN l ON l.node = b.dst GROUP BY b.src, l.label
            )
            SELECT node, nl AS label FROM c
            QUALIFY ROW_NUMBER() OVER (PARTITION BY node ORDER BY n DESC, nl ASC) = 1
        """)
    want = sorted(map(tuple, con.execute("SELECT node, label FROM l").fetchall()))
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(pairs=edges_st, k=st.integers(2, 3))
def test_kcore_fixpoint_fuzz(spark, pairs, k):
    # fixpoint (rounds=None) vs an iterated-to-stability DuckDB peel
    from ocaml_rdf_spark.operators.cc import kcore

    got = sorted(map(tuple, kcore(_edf(spark, pairs), k=k).collect()))
    con = _duck(pairs)
    con.execute("""
        CREATE TABLE g AS
        SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM e WHERE src <> dst GROUP BY 1, 2
    """)
    while True:
        n_before = con.execute("SELECT COUNT(*) FROM g").fetchone()[0]
        con.execute(f"""
            CREATE OR REPLACE TABLE g AS
            WITH deg AS (
              SELECT node, COUNT(*) AS n FROM (
                SELECT a AS node FROM g UNION ALL SELECT b FROM g
              ) GROUP BY node
            ),
            weak AS (SELECT node FROM deg WHERE n < {k})
            SELECT a, b FROM g
            WHERE a NOT IN (SELECT node FROM weak)
              AND b NOT IN (SELECT node FROM weak)
        """)
        if con.execute("SELECT COUNT(*) FROM g").fetchone()[0] == n_before:
            break
    want = sorted(map(tuple, con.execute("""
        SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
          SELECT a AS node FROM g UNION ALL SELECT b FROM g
        ) GROUP BY node
    """).fetchall()))
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(pairs=edges_st, iters=st.integers(1, 3))
def test_pagerank_fuzz(spark, pairs, iters):
    from ocaml_rdf_spark.operators.cc import pagerank

    got = sorted(map(tuple, pagerank(_edf(spark, pairs), iters=iters).collect()))
    con = _duck(pairs)
    con.execute("CREATE TABLE g AS SELECT DISTINCT src, dst FROM e")
    con.execute("""
        CREATE TABLE nodes AS
        SELECT DISTINCT node FROM (SELECT src AS node FROM g UNION ALL SELECT dst FROM g)
    """)
    con.execute("CREATE TABLE deg AS SELECT src, COUNT(*) AS odeg FROM g GROUP BY src")
    con.execute("CREATE TABLE r AS SELECT node, 1000000::BIGINT AS rank FROM nodes")
    for _ in range(iters):
        con.execute("""
            CREATE OR REPLACE TABLE r AS
            WITH contrib AS (
              SELECT g.dst, SUM(r.rank // d.odeg) AS s
              FROM g JOIN r ON g.src = r.node JOIN deg d ON g.src = d.src
              GROUP BY g.dst
            )
            SELECT n.node,
                   CAST(150000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank
            FROM nodes n LEFT JOIN contrib c ON n.node = c.dst
        """)
    want = sorted(map(tuple, con.execute("SELECT node, rank FROM r").fetchall()))
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(pairs=edges_st)
def test_linkpred_fuzz(spark, pairs):
    from ocaml_rdf_spark.operators.linking import linkpred_scores

    got = sorted(map(tuple, linkpred_scores(_edf(spark, pairs), max_degree=3).collect()))
    con = _duck(pairs)
    want = sorted(map(tuple, con.execute("""
        WITH g AS (
          SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM e WHERE src <> dst GROUP BY 1, 2
        ),
        deg AS (
          SELECT node, COUNT(*) AS deg FROM (
            SELECT a AS node FROM g UNION ALL SELECT b FROM g
          ) GROUP BY node
        ),
        adj AS (SELECT a AS z, b AS x FROM g UNION ALL SELECT b, a FROM g),
        centers AS (SELECT node AS z, 1000000 // deg AS w FROM deg WHERE deg <= 3),
        cadj AS (SELECT adj.z, x, w FROM adj JOIN centers USING (z)),
        wedges AS (
          SELECT c1.x AS a, c2.x AS b, c1.w
          FROM cadj c1 JOIN cadj c2 ON c1.z = c2.z AND c1.x < c2.x
        ),
        scored AS (
          SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cn, CAST(SUM(w) AS BIGINT) AS ra
          FROM wedges GROUP BY a, b
        )
        SELECT s.a, s.b, s.cn, s.ra
        FROM scored s LEFT JOIN g ON s.a = g.a AND s.b = g.b
        WHERE g.a IS NULL
    """).fetchall()))
    assert got == want


# HLL rides along here: same differential shape (random inputs, DuckDB
# mirror), different domain — the register state and integer estimator
# must agree cell-for-cell on arbitrary grouped multisets.
@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(
    data=st.lists(
        st.tuples(st.sampled_from(["g1", "g2"]), st.integers(0, 10_000)),
        min_size=1, max_size=60,
    )
)
def test_hll_fuzz(spark, data):
    from ocaml_rdf_spark.operators.sketches import hll_estimate, hll_oracle_sql, hll_sketch

    df = spark.createDataFrame([(g, str(v)) for g, v in data], "g string, v string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(g, str(v)) for g, v in data])

    got = sorted(map(tuple, hll_sketch(df, "v", ["g"]).collect()))
    want = sorted(map(tuple, con.execute(hll_oracle_sql("t", "v", ["g"])).fetchall()))
    assert got == want

    got_e = sorted(map(tuple, hll_estimate(df, "v", ["g"]).collect()))
    want_e = sorted(map(tuple, con.execute(hll_oracle_sql("t", "v", ["g"], estimate=True)).fetchall()))
    assert got_e == want_e


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(pairs=edges_st)
def test_scc_fuzz(spark, pairs):
    from ocaml_rdf_spark.operators.cc import scc_components

    got = sorted(map(tuple, scc_components(_edf(spark, pairs)).collect()))
    con = _duck(pairs)
    want = sorted(map(tuple, con.execute("""
        WITH RECURSIVE c(src, dst) AS (
          SELECT src, dst FROM e
          UNION
          SELECT c.src, e.dst FROM c JOIN e ON c.dst = e.src
        )
        SELECT c1.src AS node, MIN(c1.dst) AS component
        FROM c c1 JOIN c c2 ON c2.src = c1.dst AND c2.dst = c1.src
        GROUP BY c1.src
    """).fetchall()))
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(pairs=edges_st, hops=st.integers(1, 3))
def test_harmonic_fuzz(spark, pairs, hops):
    from ocaml_rdf_spark.operators.cc import harmonic_centrality

    seeds = spark.createDataFrame([("n0",), ("n2",)], "node string")
    got = sorted(map(tuple, harmonic_centrality(_edf(spark, pairs), seeds, max_hops=hops).collect()))
    con = _duck(pairs)
    con.execute("CREATE TABLE d (seed VARCHAR, node VARCHAR, dist BIGINT)")
    con.execute("INSERT INTO d VALUES ('n0','n0',0), ('n2','n2',0)")
    for h in range(1, hops + 1):
        con.execute(f"""
            CREATE OR REPLACE TABLE d AS
            SELECT seed, node, MIN(dist) AS dist FROM (
              SELECT seed, node, dist FROM d
              UNION ALL
              SELECT d.seed, e.dst, d.dist + 1 FROM d JOIN e ON e.src = d.node WHERE d.dist = {h - 1}
            ) GROUP BY seed, node
        """)
    want = sorted(map(tuple, con.execute("""
        SELECT node, CAST(SUM(1000000 // dist) AS BIGINT), CAST(COUNT(*) AS BIGINT)
        FROM d WHERE dist > 0 GROUP BY node
    """).fetchall()))
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(pairs=edges_st, iters=st.integers(1, 3))
def test_hits_fuzz(spark, pairs, iters):
    from ocaml_rdf_spark.operators.cc import hits

    got = sorted(map(tuple, hits(_edf(spark, pairs), iters=iters).collect()))
    con = _duck(pairs)
    con.execute("CREATE TABLE ed AS SELECT DISTINCT src, dst FROM e")
    con.execute("""
        CREATE TABLE nodes AS SELECT DISTINCT node FROM
        (SELECT src AS node FROM ed UNION ALL SELECT dst FROM ed)
    """)
    con.execute("CREATE TABLE h AS SELECT node, CAST(1 AS BIGINT) AS hub FROM nodes")
    for _ in range(iters):
        con.execute("""
            CREATE OR REPLACE TABLE a AS
            SELECT n.node, CAST(COALESCE(s.s, 0) AS BIGINT) AS auth FROM nodes n
            LEFT JOIN (SELECT ed.dst AS node, SUM(h.hub) AS s
                       FROM ed JOIN h ON h.node = ed.src GROUP BY ed.dst) s USING (node)
        """)
        con.execute("""
            CREATE OR REPLACE TABLE h AS
            SELECT n.node, CAST(COALESCE(s.s, 0) AS BIGINT) AS hub FROM nodes n
            LEFT JOIN (SELECT ed.src AS node, SUM(a.auth) AS s
                       FROM ed JOIN a ON a.node = ed.dst GROUP BY ed.src) s USING (node)
        """)
    want = sorted(map(tuple, con.execute(
        "SELECT h.node, h.hub, a.auth FROM h JOIN a USING (node)").fetchall()))
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(pairs=edges_st, rounds=st.integers(0, 2))
def test_modularity_fuzz(spark, pairs, rounds):
    from ocaml_rdf_spark.operators.cc import label_propagation, modularity

    e = _edf(spark, pairs)
    labels = label_propagation(e, rounds=rounds)
    got = sorted(map(tuple, modularity(e, labels).collect()))
    lrows = [(r["node"], r["label"]) for r in labels.collect()]
    con = _duck(pairs)
    con.execute("CREATE TABLE labels (node VARCHAR, label VARCHAR)")
    if lrows:
        con.executemany("INSERT INTO labels VALUES (?, ?)", lrows)
    want = sorted(map(tuple, con.execute("""
        WITH se AS (
          SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM e WHERE src <> dst
        ),
        lab AS (
          SELECT la.label AS la, lb.label AS lb
          FROM se JOIN labels la ON la.node = se.a JOIN labels lb ON lb.node = se.b
        ),
        m AS (SELECT COUNT(*) AS m FROM lab),
        ein AS (SELECT la AS label, COUNT(*) AS n FROM lab WHERE la = lb GROUP BY la),
        deg AS (SELECT label, COUNT(*) AS d FROM
                (SELECT la AS label FROM lab UNION ALL SELECT lb FROM lab) GROUP BY label),
        nn AS (SELECT label, COUNT(*) AS n_nodes FROM labels GROUP BY label)
        SELECT nn.label, nn.n_nodes,
               CAST(COALESCE(ein.n, 0) AS BIGINT),
               CAST(COALESCE(deg.d, 0) AS BIGINT),
               CAST(4 * m.m * COALESCE(ein.n, 0)
                    - COALESCE(deg.d, 0) * COALESCE(deg.d, 0) AS BIGINT)
        FROM nn LEFT JOIN ein USING (label) LEFT JOIN deg USING (label) CROSS JOIN m
    """).fetchall()))
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(pairs=edges_st)
def test_assortativity_fuzz(spark, pairs):
    from ocaml_rdf_spark.operators.cc import degree_assortativity

    got = tuple(degree_assortativity(_edf(spark, pairs)).collect()[0])
    con = _duck(pairs)
    row = con.execute("""
        WITH se AS (
          SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM e WHERE src <> dst
        ),
        bi AS (SELECT a, b FROM se UNION ALL SELECT b, a FROM se),
        deg AS (SELECT a AS node, COUNT(*) AS d FROM bi GROUP BY a),
        lab AS (SELECT da.d AS x, db.d AS y
                FROM bi JOIN deg da ON da.node = bi.a JOIN deg db ON db.node = bi.b)
        SELECT CAST(COUNT(*) AS BIGINT), CAST(SUM(x) AS BIGINT),
               CAST(SUM(x*x) AS BIGINT), CAST(SUM(x*y) AS BIGINT) FROM lab
    """).fetchone()
    # an all-self-loop input yields zero simple edges: DuckDB sums go NULL,
    # Spark's empty-agg count is 0 with NULL sums — normalize both to 0
    want = tuple(0 if v is None else v for v in row)
    got = tuple(0 if v is None else v for v in got)
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(
    pairs=edges_st,
    ws=st.lists(st.integers(1, 5), min_size=12, max_size=12),
    rounds=st.integers(1, 4),
)
def test_sssp_fuzz(spark, pairs, ws, rounds):
    """Weighted Bellman-Ford vs a synchronous pure-Python relaxation:
    after k rounds both must hold EXACTLY min cost over ≤k-edge paths."""
    from ocaml_rdf_spark.operators.cc import sssp

    wpairs = [(f"n{a}", f"n{b}", ws[i]) for i, (a, b) in enumerate(pairs)]
    edf = spark.createDataFrame(wpairs, "src string, dst string, w long")
    seeds = spark.createDataFrame([("n0",), ("n3",)], "node string")
    got = sorted(map(tuple, sssp(edf, seeds, max_rounds=rounds).collect()))

    INF = float("inf")
    dist = {"n0": 0, "n3": 0}
    for _ in range(rounds):
        nd = dict(dist)
        for a, b, w in wpairs:
            if a in dist and dist[a] + w < nd.get(b, INF):
                nd[b] = dist[a] + w
        dist = nd
    want = sorted(dist.items())
    assert got == want
