"""Closure-budget guard (r3 VERDICT task 4): scc_components /
transitive_closure must raise ClosureBudgetExceeded on a graph whose
closure outgrows the budget, and stay exact under it."""

from __future__ import annotations

import pytest

from ocaml_rdf_spark.operators.cc import scc_components
from ocaml_rdf_spark.operators.paths import ClosureBudgetExceeded, transitive_closure


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_guard_fires_on_high_fanout_digraph(spark):
    # dense bipartite-ish random digraph: 40 nodes, every node i -> (i*k+j)%40
    # for 6 successors — closure explodes toward n^2 = 1600 pairs
    pairs = [
        (f"n{i}", f"n{(i * 7 + j) % 40}") for i in range(40) for j in range(1, 7)
    ]
    with pytest.raises(ClosureBudgetExceeded, match="max_closure_edges"):
        scc_components(_edges(spark, pairs), max_closure_edges=500)


def test_guard_fires_even_on_input_alone(spark):
    pairs = [(f"a{i}", f"a{i+1}") for i in range(20)]
    with pytest.raises(ClosureBudgetExceeded, match="input pairs"):
        transitive_closure(_edges(spark, pairs), max_closure_edges=10)


def test_taxonomy_sized_graph_unchanged_under_budget(spark):
    # 3-cycle + tail: cycle members a,b,c with component 'a'; d not on a cycle
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    got = {
        (r["node"], r["component"])
        for r in scc_components(_edges(spark, pairs), max_closure_edges=1000).collect()
    }
    assert got == {("a", "a"), ("b", "a"), ("c", "a")}


def test_budget_probe_does_not_change_closure_values(spark):
    pairs = [(f"c{i}", f"c{i+1}") for i in range(9)]
    base = {
        (r["src"], r["dst"]) for r in transitive_closure(_edges(spark, pairs)).collect()
    }
    guarded = {
        (r["src"], r["dst"])
        for r in transitive_closure(_edges(spark, pairs), max_closure_edges=10_000).collect()
    }
    assert base == guarded and len(base) == 45
