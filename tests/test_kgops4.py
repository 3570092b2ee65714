"""Unit tests for conductance, dangling_report, fs_weights, and the
spatial grid joins on hand-built fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _labels(spark, mapping):
    return spark.createDataFrame(sorted(mapping.items()), "node string, label string")


def test_conductance_two_triangles_bridge(spark):
    # two triangles joined by one bridge edge, labeled by triangle:
    # each community: edges_in=3, edges_out=1, volume=7, 2m=14 →
    # min(7, 14-7)=7 → phi = 1_000_000 // 7 = 142857.
    from ocaml_rdf_spark.operators.cc import conductance

    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")],
    )
    lab = _labels(spark, {"a": "L", "b": "L", "c": "L", "x": "R", "y": "R", "z": "R"})
    out = {r["label"]: r.asDict() for r in conductance(e, lab).collect()}
    for side in ("L", "R"):
        assert out[side]["n_nodes"] == 3
        assert out[side]["edges_in"] == 3
        assert out[side]["edges_out"] == 1
        assert out[side]["volume"] == 7
        assert out[side]["conductance_ppm"] == 142857


def test_conductance_whole_graph_null_denom(spark):
    # single community holding the whole graph: min(vol, 2m - vol) = 0 →
    # NULL phi (division guard), edges_out = 0.
    from ocaml_rdf_spark.operators.cc import conductance

    e = _edges(spark, [("a", "b"), ("b", "c")])
    lab = _labels(spark, {"a": "A", "b": "A", "c": "A"})
    row = conductance(e, lab).collect()[0]
    assert row["edges_out"] == 0 and row["volume"] == 4
    assert row["conductance_ppm"] is None


def test_conductance_duplicate_and_directed_edges_canonicalized(spark):
    # (a,b), (b,a), and a repeat collapse to ONE simple edge.
    from ocaml_rdf_spark.operators.cc import conductance

    e = _edges(spark, [("a", "b"), ("b", "a"), ("a", "b")])
    lab = _labels(spark, {"a": "A", "b": "B"})
    out = {r["label"]: r.asDict() for r in conductance(e, lab).collect()}
    assert out["A"]["edges_out"] == 1 and out["A"]["edges_in"] == 0
    # vol=1 each side, 2m=2 → min(1, 1)=1 → phi = 1e6
    assert out["A"]["conductance_ppm"] == 1000000


def _quads(spark, rows):
    return spark.createDataFrame(
        rows, "s_kind int, s_lex string, pred string, o_kind int, o_lex string"
    )


def test_dangling_report_counts_and_literal_exclusion(spark):
    from ocaml_rdf_spark.operators.stats import dangling_report

    q = _quads(
        spark,
        [
            # urn:a described; urn:b referenced but never described
            (0, "urn:a", "p:knows", 0, "urn:b"),
            (0, "urn:a", "p:knows", 0, "urn:a"),  # self-reference: described
            (0, "urn:a", "p:name", 2, "ghost"),  # literal: excluded entirely
            (0, "urn:c", "p:cites", 0, "urn:b"),  # same dangling term, other pred
            (0, "urn:c", "p:cites", 0, "urn:c"),
        ],
    )
    out = {r["pred"]: r.asDict() for r in dangling_report(q).collect()}
    assert set(out) == {"p:knows", "p:cites"}  # p:name has no non-literal refs
    assert out["p:knows"]["n_refs"] == 2 and out["p:knows"]["n_dangling"] == 1
    assert out["p:knows"]["dangling_ppm"] == 500000
    assert out["p:cites"]["n_refs"] == 2 and out["p:cites"]["n_dangling"] == 1


def test_dangling_report_kind_distinguishes_bnode_from_iri(spark):
    # a bnode object with the same lexical as a described IRI subject is
    # still dangling — term identity is (kind, lex), not lex alone.
    from ocaml_rdf_spark.operators.stats import dangling_report

    q = _quads(
        spark,
        [
            (0, "n1", "p:p", 1, "n1"),  # bnode object _:n1 — never a subject
        ],
    )
    row = dangling_report(q).collect()[0]
    assert row["n_dangling"] == 1


def test_fs_weights_hand_computed(spark):
    from ocaml_rdf_spark.operators.linking import fs_weights

    # 4 pairs, one field: matches {p1, p2}, non-matches {p3, p4};
    # agreement: p1=1, p2=0, p3=1, p4=0 → m = 1/2, u = 1/2.
    comp = spark.createDataFrame(
        [
            ("p1a", "p1b", "name", 1),
            ("p2a", "p2b", "name", 0),
            ("p3a", "p3b", "name", 1),
            ("p4a", "p4b", "name", 0),
        ],
        "rec_a string, rec_b string, field string, agree int",
    )
    gold = spark.createDataFrame(
        [("p1a", "p1b"), ("p2a", "p2b")], "rec_a string, rec_b string"
    )
    row = fs_weights(comp, gold).collect()[0]
    assert row["n_match"] == 2 and row["n_nonmatch"] == 2
    assert row["m_ppm"] == 500000 and row["u_ppm"] == 500000
    assert row["dominance_ppm"] == 1000000


def test_fs_weights_empty_gold_gives_null_m(spark):
    from ocaml_rdf_spark.operators.linking import fs_weights

    comp = spark.createDataFrame(
        [("a", "b", "f", 1)], "rec_a string, rec_b string, field string, agree int"
    )
    gold = spark.createDataFrame([], "rec_a string, rec_b string")
    row = fs_weights(comp, gold).collect()[0]
    assert row["n_match"] == 0 and row["m_ppm"] is None and row["dominance_ppm"] is None


def test_fs_weights_zero_u_dominance_guard(spark):
    from ocaml_rdf_spark.operators.linking import fs_weights

    # all pairs are matches that agree; one non-match that disagrees →
    # u = 0, dominance divides by max(u, 1), not by zero.
    comp = spark.createDataFrame(
        [("m", "m2", "f", 1), ("n", "n2", "f", 0)],
        "rec_a string, rec_b string, field string, agree int",
    )
    gold = spark.createDataFrame([("m", "m2")], "rec_a string, rec_b string")
    row = fs_weights(comp, gold).collect()[0]
    assert row["m_ppm"] == 1000000 and row["u_ppm"] == 0
    assert row["dominance_ppm"] == 1000000 * 1000000


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id long, x long, y long")


def test_grid_radius_join_exact_boundary_and_negative_coords(spark):
    from ocaml_rdf_spark.operators.spatial import grid_radius_join

    left = _pts(spark, [(1, 0, 0), (2, -7, -7)])
    right = _pts(spark, [(10, 3, 4), (11, -7, -2), (12, 100, 100)])
    out = {(r["id_a"], r["id_b"]): r["dist2"] for r in grid_radius_join(left, right, 5).collect()}
    # (1,10): dist2 = 25 = r² — inclusive boundary kept
    # (2,11): dist2 = 25 — negative-coordinate cells floor correctly
    assert out == {(1, 10): 25, (2, 11): 25}


def test_grid_radius_join_no_duplicate_pairs_across_cells(spark):
    # points in different home cells that still qualify meet EXACTLY once.
    from ocaml_rdf_spark.operators.spatial import grid_radius_join

    left = _pts(spark, [(1, 9, 9)])
    right = _pts(spark, [(20, 11, 11)])  # neighbor cell, dist2 = 8 <= 100
    rows = grid_radius_join(left, right, 10).collect()
    assert len(rows) == 1 and rows[0]["dist2"] == 8


def test_grid_nn_join_argmin_and_tiebreak(spark):
    from ocaml_rdf_spark.operators.spatial import grid_nn_join

    left = _pts(spark, [(1, 0, 0), (2, 50, 50)])
    right = _pts(spark, [(30, 0, 3), (31, 3, 0), (32, 1, 1)])
    out = {r["id_a"]: (r["id_b"], r["dist2"]) for r in grid_nn_join(left, right, 5).collect()}
    # nearest is 32 at dist2=2; ties between 30/31 (dist2=9) never reached
    assert out[1] == (32, 2)
    # point 2 has no neighbor within radius → absent
    assert 2 not in out


def test_grid_radius_join_rejects_bad_radius(spark):
    import pytest

    from ocaml_rdf_spark.operators.spatial import grid_radius_join

    with pytest.raises(ValueError):
        grid_radius_join(_pts(spark, []), _pts(spark, []), 0)
