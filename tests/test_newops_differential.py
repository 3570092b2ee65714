"""Differential fuzz: the round-3 continuation operators with nontrivial
distributed machinery — SNM global sort positions (bucketed prefix-sum
rank), k-hop neighborhood expansion (frontier semi-joins), and Bloom
block construction (md5 bit positions + bit_or blocks) — vs independent
DuckDB mirrors on hypothesis-random inputs. All integer/exact, so every
comparison is equality."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys_st = st.lists(
    st.tuples(st.sampled_from(["aa", "ab", "b", "c", "ca"]), st.integers(0, 20)),
    min_size=1, max_size=15, unique=True,
)


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(rows=keys_st, buckets=st.integers(1, 5))
def test_snm_positions_fuzz(spark, rows, buckets):
    from ocaml_rdf_spark.operators.linking import snm_positions

    df = spark.createDataFrame(rows, "k string, id long")
    got = {(r["k"], r["id"]): r["pos"] for r in
           snm_positions(df, ["k", "id"], buckets=buckets).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR, id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {(k, i): p for k, i, p in con.execute(
        "SELECT k, id, ROW_NUMBER() OVER (ORDER BY k, id) - 1 FROM t").fetchall()}
    assert got == want


edge_st = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6)), min_size=1, max_size=14, unique=True
)


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(pairs=edge_st, hops=st.integers(0, 3))
def test_khop_subgraph_fuzz(spark, pairs, hops):
    from ocaml_rdf_spark.operators.cc import khop_subgraph

    rows = [(f"n{a}", "urn:p:e", f"n{b}") for a, b in pairs]
    q = spark.createDataFrame(rows, "s_lex string, pred string, o_lex string").select(
        F.lit(0).cast("tinyint").alias("s_kind"), "s_lex", "pred",
        F.lit(0).cast("tinyint").alias("o_kind"), "o_lex",
    )
    seeds = spark.createDataFrame([("n0",)], "ent string")
    got = {(r["s_lex"], r["o_lex"]) for r in khop_subgraph(q, seeds, hops).collect()}
    # python mirror: grow node set, include touched edges
    nodes = {"n0"}
    want: set = set()
    es = [(f"n{a}", f"n{b}") for a, b in pairs]
    for _ in range(hops):
        hop = {(s, o) for s, o in es if s in nodes or o in nodes}
        want |= hop
        for s, o in hop:
            nodes.add(s)
            nodes.add(o)
    assert got == want


vals_st = st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=4),
                   min_size=1, max_size=12)


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(vals=vals_st, k=st.integers(1, 4))
def test_bloom_build_fuzz(spark, vals, k):
    from ocaml_rdf_spark.operators.sketches import bloom_build

    m = 1 << 10
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {(r["blk"], r["bits"]) for r in bloom_build(df, "v", m_bits=m, k=k).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = {(b, bits) for b, bits in con.execute(f"""
        WITH pos AS (
          SELECT DISTINCT ('0x' || substr(md5(v || ':' || i), 1, 15))::BIGINT % {m} AS p
          FROM (SELECT DISTINCT v FROM t), unnest(range({k})) u(i)
        )
        SELECT p // 32, bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER))
        FROM pos GROUP BY 1
    """).fetchall()}
    assert got == want
