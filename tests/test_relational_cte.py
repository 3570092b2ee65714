"""DuckDB-only consistency checks for the TRIPLES_CTE mirror of
relational.triples_view (no Spark session needed): the CTE must produce
exactly the expected triple counts per graph and per predicate family."""

from __future__ import annotations

import duckdb
import pytest

from ocaml_rdf_spark.relational import TRIPLES_CTE

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "orders"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield c
    c.close()


def test_counts_per_graph(con):
    counts = {t: con.sql(f"SELECT COUNT(*) FROM {t}").fetchone()[0] for t in TABLES}
    rows = con.sql(f"WITH {TRIPLES_CTE} SELECT graph, COUNT(*) FROM triples GROUP BY graph").fetchall()
    got = dict(rows)
    assert got["urn:g:region"] == 2 * counts["region"]
    assert got["urn:g:nation"] == 3 * counts["nation"]
    assert got["urn:g:customer"] == 5 * counts["customer"]
    assert got["urn:g:supplier"] == 4 * counts["supplier"]
    assert got["urn:g:orders"] == 6 * counts["orders"]


def test_no_null_required_fields(con):
    n = con.sql(
        f"WITH {TRIPLES_CTE} SELECT COUNT(*) FROM triples "
        "WHERE s_lex IS NULL OR pred IS NULL OR o_lex IS NULL OR graph IS NULL"
    ).fetchone()[0]
    assert n == 0


def test_literal_kinds_have_dtype(con):
    n = con.sql(
        f"WITH {TRIPLES_CTE} SELECT COUNT(*) FROM triples WHERE o_kind = 2 AND o_dtype IS NULL"
    ).fetchone()[0]
    assert n == 0
    n2 = con.sql(
        f"WITH {TRIPLES_CTE} SELECT COUNT(*) FROM triples WHERE o_kind = 0 AND o_dtype IS NOT NULL"
    ).fetchone()[0]
    assert n2 == 0


def test_fk_objects_resolve(con):
    # every inNation object IRI corresponds to an existing nation subject
    n = con.sql(
        f"""WITH {TRIPLES_CTE}
        SELECT COUNT(*) FROM triples t
        WHERE t.pred = 'urn:p:inNation'
          AND t.o_lex NOT IN (SELECT s_lex FROM triples WHERE pred LIKE '%type' AND o_lex = 'urn:c:Nation')
        """
    ).fetchone()[0]
    assert n == 0
