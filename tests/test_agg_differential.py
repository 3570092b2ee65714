"""Differential fuzz: SPARQL aggregates vs DuckDB on random numeric data.

Random (group, value) multisets flow through the FULL text front end
(parse → algebra → Group) and must agree with DuckDB computing over the
same lexical forms — by VALUE (python Decimal), not lexical string, so
the engines' canonical forms may differ but never the number. Values
cross the 2^53 double boundary and carry ≤6 fractional digits to
exercise the exact integer/decimal aggregation tiers (§18.5.1 and the
r2 ADVICE guardrails)."""

from __future__ import annotations

from decimal import Decimal

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocaml_rdf_spark.algebra import Ctx, flatten
from ocaml_rdf_spark.sparql import execute
from ocaml_rdf_spark.types import TRIPLES_SCHEMA, Iri, Literal, triple_row

EX = "urn:x:"
XSD = "http://www.w3.org/2001/XMLSchema#"

ints = st.integers(min_value=-(10**19), max_value=10**19)
decs = st.tuples(st.integers(-10**9, 10**9), st.integers(0, 999999)).map(
    lambda t: Decimal(f"{t[0]}.{t[1]:06d}")
)
value = st.one_of(ints.map(Decimal), decs)
row = st.tuples(st.integers(0, 2), value)  # (group, value)
dataset = st.lists(row, min_size=1, max_size=15)


def _lex(v: Decimal) -> tuple[str, str]:
    if v == v.to_integral_value() and "." not in str(v):
        return str(v), XSD + "integer"
    return str(v), XSD + "decimal"


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=dataset)
def test_aggregates_match_duckdb(spark, data):
    rows = []
    for i, (g, v) in enumerate(data):
        lex, dt = _lex(v)
        rows.append(triple_row(Iri(f"{EX}s{i}"), Iri(f"{EX}g"), Literal(f"g{g}"), graph="urn:g:d"))
        rows.append(triple_row(Iri(f"{EX}s{i}"), Iri(f"{EX}v"), Literal(lex, dtype=dt), graph="urn:g:d"))
    df = spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)
    out = execute(
        f"""PREFIX x: <{EX}>
        SELECT ?g (SUM(?v) AS ?sum) (SUM(DISTINCT ?v) AS ?dsum)
               (MIN(?v) AS ?mn) (MAX(?v) AS ?mx) (COUNT(?v) AS ?n)
        WHERE {{ ?s x:g ?g ; x:v ?v }} GROUP BY ?g""",
        Ctx(df),
    )
    got = {
        r["g"]: tuple(Decimal(r[c]) for c in ("sum", "dsum", "mn", "mx", "n"))
        for r in flatten(out).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (g VARCHAR, v DECIMAL(38, 6))")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", [(f"g{g}", str(v)) for g, v in data]
    )
    want = {
        r[0]: (Decimal(r[1]), Decimal(r[2]), Decimal(r[3]), Decimal(r[4]), Decimal(r[5]))
        for r in con.execute(
            "SELECT g, SUM(v), SUM(DISTINCT v), MIN(v), MAX(v), COUNT(v) FROM t GROUP BY g"
        ).fetchall()
    }
    con.close()
    assert got == want
