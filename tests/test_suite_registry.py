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
# (r5 rotation: all 50 r4-confirmed entries replaced with never-driver-
# checked queries from the BENCH/R4_NOTES.md family-balanced list + the
# two new streaming anchors + the rows-only unigram_encode registration)
WINDOW_MANIFEST = [
    "betweenness", "ktruss", "tri_support", "katz", "hits", "closeness",
    "harmonic", "graph_ecc", "eff_diameter", "conductance", "modularity",
    "sssp",
    "containment", "incr_dedup", "dup_extents", "cdc_chunks", "metablocking",
    "snm_pairs", "blocking_eval", "er_metrics", "er_bcubed", "dawid_skene",
    "rdfs_delta", "owl_consistency", "owl_chain", "same_as_keys",
    "shacl_sparql", "shacl_closed", "skos_audit", "type_infer", "trans_reduce",
    "dp_counts", "privacy_k_anon", "calibration", "auc", "benford",
    "changepoint", "winsorize", "ks_drift",
    "meta_triples", "boilerplate", "template_strip", "sitemap_parse",
    "robots", "redirects",
    "media_png_real", "media_wav_real",
    "stream_sessionize", "stream_attr_clicks", "unigram_encode",
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
        "unigram_encode",  # Viterbi backpointer DP has no SQL form; pinned
                           # by tests/test_unigram.py (r5, VERDICT r4 #1)
    }
    for name, (fn, _sql) in QUERIES.items():
        assert callable(fn), name
