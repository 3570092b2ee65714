"""Registry-order freeze (VERDICT r2 tasks 1 + 10).

The round driver snapshots the FIRST 50 entries of suite.QUERIES — r1/r2
CORRECTNESS keysets were exactly registry positions 0-49, and r2's
insertions silently rotated three green queries out of the window. Dict
order is therefore an interface: this manifest pins it so future
insertions can't displace queries from the driver's correctness gate.
"""

from __future__ import annotations

from ocaml_rdf_spark.suite import DRIVER_WINDOW, QUERIES

# checked-in copy — must be edited DELIBERATELY, together with suite.py
WINDOW_MANIFEST = [
    "path_neg_inv", "reduced_types", "sample_region", "builtins_num",
    "builtins_hash", "builtins_replace", "builtins_cond", "builtins_term",
    "dedup_embedding", "dedup_embedding_lsh", "events_window", "events_session",
    "sparql_text_optional", "sparql_text_union", "sparql_text_minus",
    "sparql_text_exists", "sparql_text_values", "sparql_text_graph",
    "sparql_text_subselect", "sparql_text_construct", "sparql_text_ask",
    "sparql_text_describe", "graph_probes", "serialize_nq", "part_scan",
    "bcast_join", "agg_variants", "agg_decimal", "builtins_term2",
    "sparql_update", "graph_addrem", "media_ann", "media_resize",
    "extract_errors", "sparql_text_describe_var", "cc_distributed",
    "sparql_text_from_empty", "path_deep", "update_bulk", "agg_having",
    "orderby_mixed", "sparql_text_construct_where",
    "path_star", "path_neg", "subselect",
    "olap_shipping", "sparql_text_exists_expr", "repetition", "canon_bnodes", "dedup_paragraph",
]


def test_driver_window_is_frozen():
    assert list(QUERIES)[:50] == WINDOW_MANIFEST
    assert DRIVER_WINDOW == WINDOW_MANIFEST


def test_registry_is_complete():
    # every entry is a (callable, sql-or-None) pair; only the three
    # justified rows-only queries lack oracles
    rows_only = {n for n, (_f, sql) in QUERIES.items() if sql is None}
    assert rows_only == {
        "link_fuzzy", "extract_corpus", "extract_errors", "bpe_train",
        "compression_quality",  # zlib has no SQL form; direct-zlib differential
    }
    for name, (fn, _sql) in QUERIES.items():
        assert callable(fn), name
