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
# (r4 rotation: all 50 r3-confirmed entries replaced with never-driver-
# checked oracled queries + the three new streaming-parity anchors)
WINDOW_MANIFEST = [
    "pagerank", "triangles", "kcore", "bfs_dist", "label_prop", "scc_cycles",
    "louvain", "hyperball",
    "hll_sketch", "hll_estimate", "cms_sketch", "kmv_users",
    "exact_quantiles", "heavy_hitters",
    "rdfs_closure", "owl_rl", "shacl_report",
    "decontaminate", "span_dedup", "pack_offsets", "lm_score", "line_dedup",
    "quality_rules", "pii_scrub", "semdedup", "kmeans", "best_keeper",
    "kg_negs", "dsir",
    "bm25_rank", "postings", "rrf",
    "url_canon", "url_dedup", "asof_attribution", "range_prior_activity",
    "merge_upsert", "graph_diff",
    "rdfstar_prov", "sparql_text_service", "sparql_text_lateral",
    "path_repeat", "dict_terms", "dict_bgp",
    "warc_roundtrip", "mf2_triples", "table_triples",
    "stream_hll", "stream_cms", "stream_dedup",
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
        "unigram_train",  # EM over a segmentation lattice has no SQL form;
                          # differential-fuzzed vs an independent mirror
    }
    for name, (fn, _sql) in QUERIES.items():
        assert callable(fn), name
