"""Differential fuzz: property-path closure semantics vs DuckDB recursive
CTEs on random digraphs — `p+` (transitive closure), `p*` (closure ∪
zero-length identity over ALL graph terms, §9.3), and a `p/q*` sequence.
The graph always carries extra q-edges so the zero-length term universe
is strictly larger than the p-subgraph (the subtle part of the spec)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocaml_rdf_spark.algebra import Ctx, Var, flatten, select
from ocaml_rdf_spark.graph import Graph
from ocaml_rdf_spark.operators.paths import P, PathPattern, Plus, Seq, Star
from ocaml_rdf_spark.types import Iri

EX = "http://ex.org/"
PPRED, QPRED = EX + "p", EX + "q"

edge = st.tuples(st.integers(0, 4), st.integers(0, 4))
p_edges = st.lists(edge, min_size=1, max_size=8, unique=True)
q_edges = st.lists(edge, min_size=0, max_size=4, unique=True)


def _ctx(spark, pe, qe):
    triples = [(Iri(f"{EX}n{a}"), Iri(PPRED), Iri(f"{EX}n{b}")) for a, b in pe]
    triples += [(Iri(f"{EX}n{a}"), Iri(QPRED), Iri(f"{EX}n{b}")) for a, b in qe]
    return Ctx(Graph.from_triples(spark, triples, name="urn:fuzz").df)


def _spark_pairs(spark, pe, qe, path):
    df = select(PathPattern(Var("s"), path, Var("o")), _ctx(spark, pe, qe))
    return sorted((r["s"], r["o"]) for r in flatten(df).collect())


def _duck(pe, qe):
    con = duckdb.connect()
    con.execute("CREATE TABLE p (src INT, dst INT)")
    con.execute("CREATE TABLE q (src INT, dst INT)")
    con.executemany("INSERT INTO p VALUES (?, ?)", pe)
    if qe:
        con.executemany("INSERT INTO q VALUES (?, ?)", qe)
    return con


def _n(i):
    return f"{EX}n{i}"


_CLOSURE = """
WITH RECURSIVE c(src, dst) AS (
  SELECT src, dst FROM p
  UNION
  SELECT c.src, e.dst FROM c JOIN p e ON c.dst = e.src
)
"""

_TERMS = "SELECT src AS t FROM p UNION SELECT dst FROM p UNION SELECT src FROM q UNION SELECT dst FROM q"


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pe=p_edges, qe=q_edges)
def test_plus_matches_recursive_cte(spark, pe, qe):
    got = _spark_pairs(spark, pe, qe, Plus(P(PPRED)))
    con = _duck(pe, qe)
    want = sorted((_n(a), _n(b)) for a, b in con.execute(
        _CLOSURE + "SELECT DISTINCT src, dst FROM c").fetchall())
    con.close()
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pe=p_edges, qe=q_edges)
def test_star_includes_full_term_universe(spark, pe, qe):
    # p*: closure ∪ (t, t) for EVERY term in the graph — including nodes
    # touched only by q-edges
    got = _spark_pairs(spark, pe, qe, Star(P(PPRED)))
    con = _duck(pe, qe)
    want = sorted((_n(a), _n(b)) for a, b in con.execute(
        _CLOSURE + f"SELECT DISTINCT src, dst FROM c UNION SELECT t, t FROM ({_TERMS})"
    ).fetchall())
    con.close()
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pe=p_edges, qe=q_edges)
def test_seq_p_then_q_star(spark, pe, qe):
    # p/q*: one p-step then any number of q-steps (zero included)
    got = _spark_pairs(spark, pe, qe, Seq(P(PPRED), Star(P(QPRED))))
    con = _duck(pe, qe)
    want = sorted((_n(a), _n(b)) for a, b in con.execute(
        """
WITH RECURSIVE qc(src, dst) AS (
  SELECT src, dst FROM q
  UNION
  SELECT qc.src, e.dst FROM qc JOIN q e ON qc.dst = e.src
),
qstar AS (SELECT DISTINCT src, dst FROM qc
          UNION SELECT t, t FROM (SELECT src AS t FROM p UNION SELECT dst FROM p
                                  UNION SELECT src FROM q UNION SELECT dst FROM q))
SELECT DISTINCT p.src, s.dst FROM p JOIN qstar s ON p.dst = s.src
"""
    ).fetchall())
    con.close()
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pe=p_edges, qe=q_edges, n=st.integers(0, 3), extra=st.integers(0, 2))
def test_repeat_range_fuzz(spark, pe, qe, n, extra):
    """p{n,m} vs a hop-unrolled DuckDB mirror on random digraphs —
    exact-n composition, bounded tail, and the n=0 zero-length rule."""
    from ocaml_rdf_spark.operators.paths import Repeat

    m = n + extra
    got = _spark_pairs(spark, pe, qe, Repeat(P(PPRED), n, m))
    con = _duck(pe, qe)
    # hop k pair sets: h0 = identity over the term universe, hk = h(k-1)⋈p
    parts = [f"h0 AS (SELECT t AS src, t AS dst FROM ({_TERMS}))"]
    for k in range(1, m + 1):
        parts.append(
            f"h{k} AS (SELECT DISTINCT h.src, e.dst FROM h{k - 1} h JOIN p e ON h.dst = e.src)"
        )
    union = " UNION ".join(f"SELECT src, dst FROM h{k}" for k in range(n, m + 1))
    want = sorted(
        (_n(a), _n(b))
        for a, b in con.execute("WITH " + ", ".join(parts) + " " + union).fetchall()
    )
    con.close()
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pe=p_edges, qe=q_edges, n=st.integers(1, 3))
def test_repeat_unbounded_fuzz(spark, pe, qe, n):
    """p{n,} vs exact-n hops composed with the recursive-CTE closure."""
    from ocaml_rdf_spark.operators.paths import Repeat

    got = _spark_pairs(spark, pe, qe, Repeat(P(PPRED), n, None))
    con = _duck(pe, qe)
    parts = ["h1 AS (SELECT DISTINCT src, dst FROM p)"]
    for k in range(2, n + 1):
        parts.append(
            f"h{k} AS (SELECT DISTINCT h.src, e.dst FROM h{k - 1} h JOIN p e ON h.dst = e.src)"
        )
    want = sorted((_n(a), _n(b)) for a, b in con.execute(
        "WITH RECURSIVE c(src, dst) AS (SELECT src, dst FROM p UNION "
        "SELECT c.src, e.dst FROM c JOIN p e ON c.dst = e.src), "
        + ", ".join(parts)
        + f""",
cstar AS (SELECT DISTINCT src, dst FROM c
          UNION SELECT t, t FROM ({_TERMS}))
SELECT DISTINCT h.src, s.dst FROM h{n} h JOIN cstar s ON h.dst = s.src
"""
    ).fetchall())
    con.close()
    assert got == want
