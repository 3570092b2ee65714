"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "suite_seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "triples_per_sec": ...,
   "docs_per_sec": ...}

The headline number the north rule cares about is extraction throughput
(triples/sec over the Common-Crawl-style corpus); the query timings cover
the main operator families (BGP join chain, aggregation, property-path
fixpoint, MinHash dedup, ANN, connected components, columnar scan-agg).
Scaling-efficiency evidence (local[8] vs local[32]) lives in
scripts/scaling_bench.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


#: family rollup (r3 VERDICT task 10): 270 benched queries is too many to
#: eyeball round-over-round — the JSON now carries per-family subtotals so
#: a delta is attributable at a glance. Classification is keyword-based
#: and deliberately coarse (~12 families); unmatched names land in
#: "other" rather than erroring, so adding a query never breaks bench.
_FAMILY_RULES = [
    ("sparql", ("sparql", "bgp", "orderby", "path_", "describe", "rdfstar",
                "reify", "dict_", "prop_table", "rdf_lists", "update",
                "agg_nation", "subselect", "window_topk", "graph_diff")),
    ("kg_infer", ("rdfs", "owl", "shacl", "skos", "r2rml", "type_infer",
                  "shape_infer", "class_align", "prop_align", "ns_migrate",
                  "skolemize", "lit_norm", "canonicalize", "same_as",
                  "graph_digest", "void", "schema_sum", "entity_card",
                  "dangling", "trans_reduce", "bisim", "rule_mine",
                  "direct_map", "prov_graph", "key_profile", "path_profile",
                  "container_members", "khop")),
    ("graph_analytics", ("pagerank", "triangle", "kcore", "bfs", "label_prop",
                         "scc", "louvain", "hyperball", "hits", "salsa",
                         "katz", "betweenness", "closeness", "harmonic",
                         "clustering", "assortativity", "modularity",
                         "conductance", "graph_ecc", "eff_diameter", "bowtie",
                         "butterflies", "ktruss", "tri_support", "mis",
                         "matching", "mst", "simrank", "sssp", "ppr_", "cc_",
                         "linkpred", "cocitation", "node2vec", "random_walks",
                         "spam_mass", "host_authority", "rich_club",
                         "sweep_cut", "temporal_reach", "link_graph",
                         "single_linkage", "topo_", "densest")),
    ("dedup_er", ("dedup", "winnow", "clone_pairs", "dup_extents", "cdc_",
                  "containment", "semdedup", "best_keeper", "blocking",
                  "snm_", "metablocking", "er_", "link_edit", "disambiguate",
                  "fuse_", "truth_weighted", "dawid", "kappa", "fleiss", "krippendorff",
                  "edit_verify", "phonetic", "copy_detect")),
    ("embedding_ann", ("ann_", "kmeans", "jl_project", "pq", "geo_nn",
                       "dbscan", "bitext")),
    ("retrieval", ("bm25", "postings", "phrase", "rrf", "tfidf",
                   "anchor_dict", "textrank")),
    ("text_quality", ("nfc", "quality", "repetition", "lm_score",
                      "readability", "encoding_quality", "compression",
                      "lang_spans", "code_switch", "soft404", "pii_",
                      "license", "char_sets", "sentence_spans", "distinctive",
                      "burstiness", "novelty", "freq_spectrum", "boilerplate",
                      "template_strip", "rel_extract")),
    ("tokenizer_train", ("feat_hash", "vocab", "bpe", "encode_tokens", "kn_counts",
                         "chunk_docs", "pack_offsets", "skipgram",
                         "neg_samples", "pair_lift", "kg_negs", "transe",
                         "distmult", "rank_metrics")),
    ("curation", ("decontaminate", "split", "sample", "resample", "mixture",
                  "dsir", "coverage_pick", "corpus_card", "filter_funnel",
                  "fair_quota", "domain_filter", "crawl_schedule", "privacy",
                  "dp_counts", "graph_anon", "kdeg", "fs_weights")),
    ("sketches_stats", ("kmv", "hll", "cms", "bloom", "quantile",
                        "heavy_hitters", "stats_merge", "changepoint",
                        "drift", "cusum", "ewma", "trend_mk", "kendall", "ols_trend", "lag_corr", "winsorize", "mad_",
                        "benford", "gini", "bootstrap", "auc", "pr_curve",
                        "calibration", "zonemap", "zorder", "hilbert",
                        "skew_report", "overlap_depth")),
    ("events_temporal", ("events_", "funnel", "cohort", "transitions",
                         "burst_windows", "asof", "interval_", "change_rate",
                         "scd2", "range_prior")),
    ("streaming", ("stream_",)),
    ("web_sources", ("warc", "mf2", "meta_triples", "table_triples", "feed",
                     "sitemap", "robots", "redirects", "url_", "surt", "pld",
                     "canon_link", "cidr", "ip_host", "host_profile",
                     "hreflang", "link_spam", "alias_mine", "extract")),
    ("warehouse", ("merge_upsert", "compaction", "olap", "scan_agg",
                   "bcast_join", "part_scan", "rollup", "line_dedup")),
]


def _family(name: str) -> str:
    for fam, keys in _FAMILY_RULES:
        for k in keys:
            if k in name:
                return fam
    return "other"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # 200k pages ≈ 20s+ of extraction at 32 cores, and a separate untimed
    # warmup extraction pays the Python-worker startup + Arrow codepath JIT
    # first — so the timed number is steady-state throughput, comparable
    # round-over-round and to scripts/scaling_bench.py (round-1 bench
    # amortized ~4s of fixed startup into a ~5s window, understating
    # throughput ~3× vs the scaling bench's steady state)
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "200000"))
    n_warm = min(5000, n_pages)

    # headroom for the iterative-closure queries at sf0.1 with 32 concurrent
    # tasks — a local-mode driver IS the executor, and 8g left no slack for
    # shuffle read-ahead buffers under the heaviest joins (observed OOM)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    from ocaml_rdf_spark.session import get_spark

    spark = get_spark(app="ords-bench", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from ocaml_rdf_spark.datagen import gen_pages_df
    from ocaml_rdf_spark.extract import dedup_triples, extract_triples, salted_repartition, split_errors
    from ocaml_rdf_spark.suite import QUERIES

    timings: dict[str, float] = {}

    # warm up the JVM + parquet footers + the POS triple store once (not
    # timed — production queries read an existing SPO/POS-sorted store;
    # building it is pipeline work measured by the pipeline's own metrics)
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    from ocaml_rdf_spark.relational import triples_view

    triples_view(spark, sf_dir).count()

    # headline: KG-construction spine — pages scan → vectorized extraction →
    # set-semantics dedup (the north rule's triples/sec number). The corpus
    # is materialized to parquet first (untimed — generation is test
    # scaffolding, not pipeline work; production reads an Iceberg pages
    # table), matching how BENCH/BASELINE.md measures.
    import atexit
    import shutil
    import tempfile

    pages_dir = tempfile.mkdtemp(prefix="ords_bench_pages_")
    atexit.register(shutil.rmtree, pages_dir, True)
    gen_pages_df(spark, n_pages, parts=cpus).write.mode("overwrite").parquet(pages_dir)

    # untimed warmup: spin up every Python worker + the Arrow serialization
    # path on a small slice so the timed run below measures steady state
    warm = salted_repartition(spark.read.parquet(pages_dir).limit(n_warm), cpus)
    split_errors(extract_triples(warm))[0].count()

    t0 = time.time()
    pages = salted_repartition(spark.read.parquet(pages_dir), cpus * 2)
    triples, _errors = split_errors(extract_triples(pages))
    n_triples = dedup_triples(triples).count()
    extract_sec = time.time() - t0
    timings["extract_pipeline"] = round(extract_sec, 3)

    bench_queries = [
        "bgp_join",
        "agg_nation",
        "orderby_slice",
        "path_plus",
        "path_deep",
        "dedup_exact",
        "dedup_minhash",
        "dedup_paragraph",
        "dedup_clusters",
        "ann_cosine",
        "cc_components",
        "canonicalize",
        "scan_agg",
        "window_topk",
        "bcast_join",
        "events_session",
        "sparql_text_bgp",
        "sparql_text_exists_expr",
        "sparql_update",
        "update_bulk",
        "repetition",
        "sparql_text_service",
        "asof_attribution",
        "range_prior_activity",
        "kmv_users",
        "hash_split",
        "host_profile",
        "stratified_sample",
        "vocab_topk",
        "quantile_sketch",
        "rdfstar_prov",
        "rollup_cascade",
        "rdfs_closure",
        "owl_rl",
        "shacl_report",
        "decontaminate",
        "span_dedup",
        "pack_offsets",
        "olap_cube",
        "pagerank",
        "triangles",
        "graph_diff",
        "url_dedup",
        "bpe_pairs",
        "kcore",
        "nfc_text",
        "bm25_rank",
        "winnow",
        "clone_pairs",
        "lit_norm",
        "bgp_join_stats",
        "quality_rules",
        "describe_cbd",
        "encode_tokens",
        "random_walks",
        "skipgram",
        "neg_samples",
        "pair_lift",
        "bfs_dist",
        "label_prop",
        "lm_score",
        "cms_sketch",
        "cms_estimate",
        "hll_sketch",
        "hll_estimate",
        "chunk_docs",
        "linkpred",
        "scd2_asof",
        "score_resample",
        "scc_cycles",
        "compaction_plan",
        "tfidf_pairs",
        "harmonic",
        "path_repeat",
        "funnel",
        "pii_scrub",
        "line_dedup",
        "kmeans",
        "semdedup",
        "domain_filter",
        "hits",
        "modularity",
        "void_stats",
        "incr_dedup",
        "freq_spectrum",
        "encoding_quality",
        "assortativity",
        "ppr_seeds",
        "clustering_coef",
        "shacl_sparql",
        "kmv_overlap",
        "cohort_retention",
        "event_transitions",
        "ip_host_filter",
        "merge_upsert",
        "kn_counts",
        "same_as_keys",
        "owl_chain",
        "exact_quantiles",
        "graph_digest",
        "skolemize",
        "mixture_plan",
        "fuse_vote",
        "truth_weighted",
        "char_sets",
        "schema_sum",
        "alias_mine",
        "kg_negs",
        "key_profile",
        "blocking_eval",
        "path_profile",
        "crawl_schedule",
        "khop_slice",
        "prov_graph",
        "rdf_lists",
        "snm_pairs",
        "skew_report",
        "bloom_urls",
        "transe_rank",
        "bisim_summary",
        "containment",
        "ns_migrate",
        "corpus_card",
        "rel_extract",
        "type_infer",
        "trans_reduce",
        "rank_metrics",
        "host_split",
        "best_keeper",
        "entity_card",
        "link_graph",
        "anchor_dict",
        "redirects",
        "robots",
        "sssp",
        "class_align",
        "change_rate",
        "host_authority",
        "table_triples",
        "cidr_map",
        "reify_store",
        "reify_rt",
        "sitemap_parse",
        "canon_link",
        "boilerplate",
        "template_strip",
        "link_edit",
        "dict_terms",
        "dict_bgp",
        "prop_table_star",
        "link_spam",
        "pld",
        "meta_triples",
        "mf2_triples",
        "warc_roundtrip",
        "bpe_train",
        "bitext_align",
        "hreflang_clusters",
        "feed_items",
        "readability",
        "url_templates",
        "cocitation",
        "rule_mine",
        "cc_constrained",
        "disambiguate",
        "fuse_numeric",
        "spam_mass",
        "cc_incremental",
        "er_metrics",
        "shape_infer",
        "interval_allen",
        "interval_coalesce",
        "louvain",
        "prop_align",
        "metablocking",
        "conductance",
        "dangling_refs",
        "fs_weights",
        "geo_nn",
        "dbscan_venues",
        "tri_support",
        "ktruss",
        "events_hopping",
        "graph_ecc",
        "betweenness",
        "burst_windows",
        "compression_quality",
        "hyperball",
        "er_bcubed",
        "jl_project",
        "zorder",
        "closeness",
        "ppr_push",
        "copy_detect",
        "temporal_reach",
        "louvain_contract",
        "louvain_level2",
        "hyperball_nf",
        "sentence_spans",
        "container_members",
        "katz",
        "butterflies",
        "dsir",
        "eff_diameter",
        "bowtie",
        "weighted_sample",
        "surt",
        "salsa",
        "mis",
        "phonetic",
        "kappa",
        "matching",
        "pq",
        "soft404",
        "postings",
        "phrase",
        "cluster_split",
        "filter_funnel",
        "log_asof",
        "rrf",
        "direct_map",
        "sparql_text_lateral",
        "shacl_closed",
        "r2rml_map",
        "skos_audit",
        "shacl_pairs",
        "simrank",
        "er_pivot",
        "dup_extents",
        "node2vec",
        "hilbert",
        "privacy_k_anon",
        "privacy_suppress",
        "lang_spans",
        "code_switch",
        "calibration",
        "distmult_rank",
        "coverage_pick",
        "dawid_skene",
        "cdc_chunks",
        "license_scan",
        "krippendorff",
        "edit_verify",
        "heavy_hitters",
        "dp_counts",
        "mst",
        "single_linkage",
        "mad_outliers",
        "benford",
        "stats_merge",
        "changepoint",
        "sweep_cut",
        "zonemap",
        "overlap_depth",
        "graph_anon",
        "kdeg_cost",
        "rich_club",
        "pr_curve",
        "gini",
        "bootstrap",
        "auc",
        "ks_drift",
        "cusum",
        "lag_corr",
        "winsorize",
        "cat_drift",
        "fair_quota",
        "distinctive",
        "burstiness",
        "novelty",
        "rdfs_delta",
        "owl_consistency",
        # r5 additions: 16-bit codec, Viterbi encode, the two new
        # streaming driver anchors (first streaming rows in the bench)
        "media_png16_real",
        "unigram_encode",
        "stream_sessionize",
        "stream_attr_clicks",
        # r5 continuation: topological levels, densest-subgraph peel,
        # EWMA control chart
        "topo_order",
        "densest_core",
        "ewma_hosts",
        "textrank",
        "pagerank_weighted",
        "trend_mk",
        "kendall_metrics",
        "feat_hash",
        "ols_trend",
        "fleiss_items",
    ]
    # quiet-window protocol (r2 task 3): each query timed over R rounds,
    # report the MEDIAN — a single co-tenant-perturbed run (host CPU steal
    # measured >3x on this VM) can no longer masquerade as a plan
    # regression. Round 1 doubles as warmup for per-query shuffle reuse.
    rounds = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3"))
    import statistics

    samples: dict[str, list[float]] = {name: [] for name in bench_queries}
    for _ in range(rounds):
        for name in bench_queries:
            fn, _sql = QUERIES[name]
            t0 = time.time()
            fn(spark, sf_dir).count()
            samples[name].append(time.time() - t0)
    for name, ts in samples.items():
        timings[name] = round(statistics.median(ts), 3)

    total = round(sum(timings.values()), 3)
    fam_totals: dict[str, float] = {}
    fam_counts: dict[str, int] = {}
    for name, sec in timings.items():
        fam = _family(name)
        fam_totals[fam] = fam_totals.get(fam, 0.0) + sec
        fam_counts[fam] = fam_counts.get(fam, 0) + 1
    families = {
        fam: {"sec": round(fam_totals[fam], 3), "n": fam_counts[fam]}
        for fam in sorted(fam_totals)
    }
    out = {
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "families": families,
        "sf": sf_dir,
        "cpus": cpus,
        "rounds": rounds,
        "bench_pages": n_pages,
        "n_triples": n_triples,
        "triples_per_sec": round(n_triples / extract_sec, 1),
        "docs_per_sec": round(n_pages / extract_sec, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
