"""Differential fuzz: asof_join / range_join vs DuckDB on random inputs.

The suite oracles pin one data distribution; these hypothesis tests throw
random (user, ts) multisets at the operators and demand exact agreement
with DuckDB's native ASOF JOIN / inequality join on every draw — the
same cross-engine discipline as the EBV differential fuzz."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocaml_rdf_spark.operators.temporal import asof_join, range_join

EPOCH = dt.datetime(2024, 1, 1)

# (user, second-offset) pairs; right side deduped per (user, ts) so the
# as-of payload is deterministic on both engines
pair = st.tuples(st.integers(0, 3), st.integers(0, 120))
left_s = st.lists(pair, min_size=1, max_size=12)
right_s = st.lists(pair, min_size=1, max_size=12, unique=True)


def _df(spark, pairs, with_id=False):
    rows = [
        (u, EPOCH + dt.timedelta(seconds=s)) + ((i,) if with_id else ())
        for i, (u, s) in enumerate(pairs)
    ]
    schema = "user_id long, ts timestamp" + (", rid long" if with_id else "")
    return spark.createDataFrame(rows, schema)


def _duck(pairs, with_id=False):
    rows = [
        {"user_id": u, "ts": EPOCH + dt.timedelta(seconds=s), **({"rid": i} if with_id else {})}
        for i, (u, s) in enumerate(pairs)
    ]
    return rows


@pytest.mark.usefixtures("spark")
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lp=left_s, rp=right_s)
def test_asof_matches_duckdb(spark, lp, rp):
    left = _df(spark, lp, with_id=True)
    right = _df(spark, rp)
    got = sorted(
        (r["rid"], r["user_id"], r["ts_asof"])
        for r in asof_join(left, right, on=["user_id"], payload=[]).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE l (user_id BIGINT, ts TIMESTAMP, rid BIGINT)")
    con.execute("CREATE TABLE r (user_id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", [(u, EPOCH + dt.timedelta(seconds=s), i) for i, (u, s) in enumerate(lp)])
    con.executemany("INSERT INTO r VALUES (?, ?)", [(u, EPOCH + dt.timedelta(seconds=s)) for u, s in rp])
    want = sorted(
        tuple(row)
        for row in con.execute(
            "SELECT l.rid, l.user_id, r.ts FROM l ASOF JOIN r"
            " ON l.user_id = r.user_id AND l.ts > r.ts"
        ).fetchall()
    )
    con.close()
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(lp=left_s, rp=right_s, lo=st.integers(-90, 0), span=st.integers(1, 90))
def test_range_matches_duckdb(spark, lp, rp, lo, span):
    hi = lo + span
    left = _df(spark, lp, with_id=True)
    right = _df(spark, rp)
    got = sorted(
        (r["rid"], r["user_id"], r["ts_r"])
        for r in range_join(
            left, right, on=["user_id"], lower_s=lo, upper_s=hi, payload=["ts"]
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE l (user_id BIGINT, ts TIMESTAMP, rid BIGINT)")
    con.execute("CREATE TABLE r (user_id BIGINT, ts TIMESTAMP)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", [(u, EPOCH + dt.timedelta(seconds=s), i) for i, (u, s) in enumerate(lp)])
    con.executemany("INSERT INTO r VALUES (?, ?)", [(u, EPOCH + dt.timedelta(seconds=s)) for u, s in rp])
    want = sorted(
        tuple(row)
        for row in con.execute(
            "SELECT l.rid, l.user_id, r.ts FROM l JOIN r"
            " ON l.user_id = r.user_id"
            f" AND r.ts >= l.ts + ({lo}) * INTERVAL 1 SECOND"
            f" AND r.ts < l.ts + ({hi}) * INTERVAL 1 SECOND"
        ).fetchall()
    )
    con.close()
    assert got == want
