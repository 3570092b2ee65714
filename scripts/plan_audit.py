"""Physical-plan audit: assert the headline queries compile to the plans
a 100 TB run needs, and write the evidence to BENCH/PLANS.md.

Checks (SURVEY §4): predicate pushdown reaches the parquet scan
(PushedFilters), column pruning (ReadSchema ⊂ table schema), dim-side
broadcast (BroadcastHashJoin, no shuffle of the fact side), partial+final
hash aggregation, and WholeStageCodegen coverage. Run:

    python scripts/plan_audit.py            # writes BENCH/PLANS.md, exit 1 on any failed check
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from ocaml_rdf_spark.session import get_spark
    from ocaml_rdf_spark.suite import QUERIES

    # AQE off for the audit only: an unfinalized AdaptiveSparkPlan hides
    # [codegen id : N] annotations; the static plan shows the full picture
    # (production keeps AQE on — session.py)
    spark = get_spark(
        app="plan-audit", cpus=8, shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # (query, [(check name, regex) | (check name, regex, "absent")
    #          | (check name, regex, "count", n)]) — "absent" asserts the
    # pattern does NOT occur (a negative lookahead regex is vacuous with
    # re.M: some line start always satisfies it, so absence must be a plain
    # containment test); "count" asserts it occurs EXACTLY n times.
    audits = [
        ("part_scan", [
            ("filter pushed to parquet scan", r"PushedFilters: \[.*GreaterThanOrEqual\(p_size,40\)"),
            ("string filter pushed", r"StringStartsWith\(p_type,SMALL\)"),
            ("columns pruned to the 5 needed (of 6)", r"ReadSchema: struct<p_partkey:bigint,p_brand:string,p_type:string,p_size:int,p_retailprice:double>"),
        ]),
        ("bcast_join", [
            ("dim side broadcast", r"BroadcastHashJoin|BroadcastExchange"),
            ("no sort-merge join", r"SortMergeJoin", "absent"),
            ("partial+final agg", r"HashAggregate"),
        ]),
        ("bgp_join", [
            ("pred filter pushed to store scan", r"PushedFilters: \[.*EqualTo\(pred,"),
            ("whole-stage codegen present", r"codegen id :"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
        ]),
        ("scan_agg", [
            ("hash aggregate", r"HashAggregate"),
            ("codegen", r"codegen id :"),
            ("pruned columns only", r"ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_returnflag:string,l_linestatus:string>"),
        ]),
        ("orderby_slice", [
            ("sort+limit fused to top-k", r"TakeOrderedAndProject"),
        ]),
        ("ann_cosine", [
            ("1-row side broadcast", r"BroadcastNestedLoopJoin|BroadcastExchange"),
            ("top-k not full sort", r"TakeOrderedAndProject"),
        ]),
        ("link_exact", [
            ("alias dict broadcast", r"BroadcastHashJoin|BroadcastExchange"),
        ]),
        ("exists_nation", [
            ("semi join, not subquery loop", r"(LeftSemi|SEMI)"),
            ("hash semi join, not nested loop", r"BroadcastNestedLoopJoin", "absent"),
        ]),
        ("notexists_nation", [
            ("anti join", r"(LeftAnti|ANTI)"),
            ("hash anti join, not nested loop", r"BroadcastNestedLoopJoin", "absent"),
        ]),
        ("minus_customers", [
            ("anti join", r"(LeftAnti|ANTI)"),
            ("hash anti join, not nested loop", r"BroadcastNestedLoopJoin", "absent"),
        ]),
        ("sparql_text_describe_var", [
            # DESCRIBE ?var: bindings flow as a DataFrame into a semi join —
            # no driver-side collect of the binding set, and (r3) NO forced
            # broadcast hint: the binding side is unbounded, so the join
            # strategy must be left to stats/AQE (an explicit hint is
            # honored regardless of size → OOM on a large class at 100×)
            ("described-set semi join", r"(LeftSemi|SEMI)"),
            ("no forced broadcast of unbounded bindings", r"ResolvedHint", "absent"),
        ]),
        ("path_deep", [
            # hybrid closure: the per-round joins run inside the fixpoint
            # (localCheckpoint truncates their lineage out of the final
            # plan), so the auditable surface is the closure aggregation —
            # hash agg over the checkpointed pair set, no nested loop
            ("closure hash aggregate", r"HashAggregate"),
            ("no nested-loop round", r"BroadcastNestedLoopJoin", "absent"),
        ]),
        ("olap_shipping", [
            # TPC-H Q3 shape: segment filter pushed to the customer scan,
            # dim side broadcast, partial agg, top-k without a full sort
            ("pushed segment filter", r"PushedFilters:.*c_mktsegment"),
            ("broadcast dim join", r"BroadcastHashJoin"),
            ("partial hash aggregation", r"HashAggregate"),
            ("top-k, no full sort", r"TakeOrderedAndProject"),
        ]),
        ("update_bulk", [
            # store-scale DELETE/INSERT…WHERE: the anti join on the triple
            # key must be hash-based, and the final set-dedup a hash agg
            ("hash anti join", r"(LeftAnti|ANTI)"),
            ("no nested-loop anti join", r"BroadcastNestedLoopJoin", "absent"),
            ("set-semantics hash aggregate", r"HashAggregate"),
        ]),
        ("sparql_text_exists_expr", [
            # expression-level EXISTS: each flag decorrelates into ONE hash
            # left-outer join of the solutions against the DISTINCT
            # sub-pattern key set (certain-bound fast path — the left plan
            # appears once, no self-join; see algebra.ExistsMark). A
            # nested-loop or cartesian product here means the
            # per-row-subquery shape leaked
            ("hash left-outer flag join", r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin).*LeftOuter"),
            ("distinct flag keys", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("canon_bnodes", [
            # WL color refinement: per-round joins are checkpointed away;
            # the auditable tail is the orbit-count hash aggregate and the
            # color join — hash-based, never nested-loop
            ("orbit hash aggregate", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("sparql_text_service", [
            # federation over the in-process registry: both sides are quad
            # DataFrames, so the cross-source join is an ordinary hash join
            # (the geo endpoint's nation/region side is dim-sized →
            # broadcast); the endpoint boundary must NOT force a
            # nested-loop or cartesian shape
            ("cross-source hash join", r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("pred filter pushed into service scan", r"PushedFilters: \[.*EqualTo\(pred,"),
        ]),
        ("asof_attribution", [
            # union+sort as-of join: ONE window over user_id — no
            # inequality join shape anywhere in the plan
            ("single window carry-forward", r"\(\d+\) Window"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no sort-merge inequality join", r"SortMergeJoin .*(<|>)", "absent"),
        ]),
        ("range_prior_activity", [
            # binned range join: the inequality is a post-join FILTER on an
            # EQUI hash join over (user_id, bin) — never a join condition
            ("equi hash join on the bin", r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("kmv_users", [
            # KMV sketch: distinct + per-partition top-k merge — the scan
            # must not feed a full global sort
            ("top-k, no full sort", r"TakeOrderedAndProject"),
            ("distinct via hash aggregate", r"HashAggregate"),
        ]),
        ("host_profile", [
            # mega-host skew: the per-host profile must be the two-stage
            # shape — hash aggregates with partial combine, the final agg
            # reusing the window's host partitioning; no per-host funnel
            ("partial+final hash aggregates", r"HashAggregate"),
            ("host window for dominant lang", r"\(\d+\) Window"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
        ]),
        ("vocab_topk", [
            # stopword-skew-safe vocabulary: two hash aggregates (the
            # (tok, doc) cell stage bounds every reducer) + top-k merge,
            # never a full sort of the vocabulary
            ("two-stage hash aggregates", r"HashAggregate"),
            ("top-k, no full sort", r"TakeOrderedAndProject"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
        ]),
        ("rdfstar_prov", [
            # SPARQL-star quoted pattern over a DERIVED store (computed
            # columns — nothing to push to parquet here): the kind-3
            # discriminator and component access must stay scan-local
            # codegen'd string ops, never a join or UDF
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("whole-stage codegen", r"codegen id :"),
        ]),
        ("rdfstar_store_probe", [
            # same quoted-pattern shape over the MATERIALIZED parquet
            # store: the kind-3 discriminator is a pushed flat filter
            ("quoted-kind filter pushed", r"PushedFilters: \[.*EqualTo\(s_kind,3\)"),
            ("pred filter pushed", r"EqualTo\(pred,"),
        ]),
        ("rollup_cascade", [
            # continuous-aggregate cascade: the raw events parquet is
            # scanned EXACTLY once — hour/day tiers re-aggregate the
            # minute tier's partials, never the source
            ("raw table scanned exactly once", r"^\(\d+\) Scan parquet", "count", 1),
            ("tier exchanges reused, not recomputed", r"^\(\d+\) ReusedExchange", "count", 2),
            ("map-side-combinable hash aggregates", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
        ]),
        ("rdfs_closure", [
            # instance-side RDFS rules: every schema join is a BROADCAST
            # hash join (closed hierarchies are tiny); no instance-data
            # fixpoint, no nested loop
            ("schema sides broadcast", r"BroadcastHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("owl_rl", [
            # property-axiom materialization: axiom sides broadcast; the
            # multi-property closure is pred-prefixed (one fixpoint for
            # all transitive properties); no nested loop/cartesian
            ("axiom sides broadcast", r"BroadcastHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("shacl_report", [
            # validation: shape table broadcast everywhere; cardinality is
            # a map-side-combinable aggregate; class check is an anti join
            ("shape table broadcast", r"BroadcastHashJoin|BroadcastExchange"),
            ("cardinality hash aggregate", r"HashAggregate"),
            ("class check anti join", r"(LeftAnti|ANTI)"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("repetition", [
            # doc-keyed aggregation chains: partial+final hash aggregates,
            # joins back to the doc-id spine are hash joins
            ("map-side-combinable hash aggregate", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("decontaminate", [
            # the benchmark gram set is eval-set-sized and must be the
            # BROADCAST side; the corpus explode feeds it map-only
            ("bench grams broadcast", r"BroadcastHashJoin|BroadcastExchange"),
            ("no sort-merge on the corpus explode", r"SortMergeJoin", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("per-doc agg is hash (map-side combined)", r"HashAggregate"),
        ]),
        ("olap_cube", [
            # all 4 grouping levels from ONE scan: Expand + partial agg,
            # never 4 reads of lineitem
            ("grouping-set expansion", r"Expand"),
            ("single lineitem scan", r"\(\d+\) Scan parquet", "count", 1),
            ("date filter pushed", r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate"),
            ("partial+final agg", r"HashAggregate"),
        ]),
        ("pagerank", [
            # per-iteration: hash joins + map-side-combined groupBy(dst)
            ("hash aggregation per iteration", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("mixture_plan", [
            # corpus agg once; the plan itself is a broadcast join on metadata
            ("target side broadcast", r"BroadcastHashJoin|BroadcastExchange"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("graph_digest", [
            # one distinct + one decimal-sum agg, no joins anywhere
            ("single aggregation pipeline", r"HashAggregate"),
            ("no join at all", r"Join", "absent"),
        ]),
        ("skolemize", [
            ("map-only: zero shuffles", r"Exchange", "absent"),
        ]),
        ("exact_quantiles", [
            # pass 2 is a bucket-pruned top-k, never a global sort
            ("bucket selection is top-k", r"TakeOrderedAndProject"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("owl_chain", [
            # n-step chain = n-1 hash equi-joins, predicates pushed to scan
            ("predicate pushed to store scan", r"PushedFilters: \[.*EqualTo\(pred"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("same_as_keys", [
            # star form: one (pred,key)-keyed min agg per rule, axioms broadcast
            ("key-grouped partial aggregation", r"HashAggregate"),
            ("axiom side broadcast", r"BroadcastHashJoin|BroadcastExchange"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("merge_upsert", [
            # MERGE = one key-shuffled anti join + union, the Iceberg CoW shape
            ("hash anti join on the key", r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin).*LeftAnti"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("kn_counts", [
            ("token-keyed partial aggregation", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("kmv_overlap", [
            # each side: scan + distinct + TakeOrdered(k); set algebra on ≤2k rows
            ("top-k, no full sort", r"TakeOrderedAndProject"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("cohort_retention", [
            ("user-keyed min agg + distinct count", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("event_transitions", [
            ("one user window then count", r"Window"),
            ("map-side-combined count", r"HashAggregate"),
            ("no join at all", r"Join", "absent"),
        ]),
        ("ip_host_filter", [
            ("map-only: zero shuffles", r"Exchange", "absent"),
            ("columns pruned to doc_id", r"ReadSchema: struct<doc_id:bigint>"),
        ]),
        ("shacl_sparql", [
            # constraint queries compile through EP1: bound-predicate scans
            ("predicate pushed to store scan", r"PushedFilters: \[.*EqualTo\(pred"),
            ("hash joins only", r"BroadcastHashJoin|SortMergeJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("ppr_seeds", [
            ("hash aggregation per iteration", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("clustering_coef", [
            ("wedge join is equi (hash/sort-merge)", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("encoding_quality", [
            # map-only column algebra: no exchange anywhere in the plan
            ("zero shuffles", r"Exchange", "absent"),
            ("columns pruned to doc_id+text", r"ReadSchema: struct<doc_id:bigint,text:string>"),
        ]),
        ("assortativity", [
            ("degree agg is partial+final", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("void_stats", [
            # count/count-distinct algebra only: no joins over the quad frame
            ("partial+final aggregation", r"HashAggregate"),
            ("distinct counts via Expand, single scan per section", r"Expand"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("incr_dedup", [
            # all candidate generation is (band, mh)-bucketed equi-joins
            ("bucketed equi-joins", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("freq_spectrum", [
            ("map-side-combined counts", r"HashAggregate"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("hits", [
            # per iteration: two hash joins + two map-side-combined sums
            ("hash aggregation per half-iteration", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("modularity", [
            # community-keyed aggs only; endpoint labeling is equi-joined
            ("community-keyed hash aggregation", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("triangles", [
            # degree-ordered wedge join: every join is a hash equi-join
            # (wedge self-join on the center, closing join on (v1,v2));
            # per-node counts are map-side-combined hash aggregates
            ("hash aggregation (degrees + counts)", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("pack_offsets", [
            # two-stage prefix sum: the corpus-wide window MUST be
            # partitioned by the range bucket (a partition-less window
            # would funnel the corpus through one reducer); the tiny
            # bucket-offset side is broadcast back
            ("corpus window is bucket-partitioned", r"windowspecdefinition\(__b"),
            ("bucket offsets broadcast back", r"BroadcastHashJoin|BroadcastExchange"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("span_dedup", [
            # ONE corpus-sized shuffle: the groupBy on the window hash;
            # the count join back is a hash join on the same key
            ("window-hash aggregate", r"HashAggregate"),
            ("hash join back (never nested loop)", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("graph_diff", [
            # snapshot delta: each EXCEPT DISTINCT must compile to a hash
            # aggregate + null-safe hash ANTI join on the quad key — a
            # nested loop here is quadratic in snapshot size at 100 TB
            ("anti joins on the quad key", r"(LeftAnti|ANTI)"),
            ("set-semantics hash aggregates", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("url_canon", [
            # canonicalization is scan-local Column algebra: NO exchange,
            # NO Python eval in the plan, codegen throughout
            ("map-only (no shuffle)", r"Exchange", "absent"),
            ("no Python in the loop", r"EvalPython", "absent"),
            ("whole-stage codegen", r"codegen id :"),
        ]),
        ("url_dedup", [
            # one shuffle: the canonical-url window; no joins at all
            ("canonical-url window", r"\(\d+\) Window"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no Python in the loop", r"EvalPython", "absent"),
        ]),
        ("bpe_pairs", [
            # pair counting: map-side-combined hash aggregate + top-k
            # merge; pair generation never leaves codegen
            ("partial+final hash aggregate", r"HashAggregate"),
            ("top-k, no full sort", r"TakeOrderedAndProject"),
            ("no Python in the loop", r"EvalPython", "absent"),
        ]),
        ("kcore", [
            # fixed-round peeling: per-round degree aggregates are hash;
            # weak-node anti joins are hash joins, never nested loops
            ("degree hash aggregates", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("bm25_rank", [
            # retrieval scoring: term stats + corpus totals broadcast,
            # per-doc tf is a map-side-combined hash agg, top-k merge
            ("stats sides broadcast", r"BroadcastHashJoin|BroadcastExchange"),
            ("partial+final hash aggregates", r"HashAggregate"),
            ("top-k, no full sort", r"TakeOrderedAndProject"),
            ("no Python in the loop", r"EvalPython", "absent"),
        ]),
        ("winnow", [
            # fingerprint selection: one doc-partitioned window min +
            # distinct — no joins beyond the per-doc gram-count hash join
            ("doc-partitioned window min", r"\(\d+\) Window"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no Python in the loop", r"EvalPython", "absent"),
        ]),
        ("lit_norm", [
            # literal normal form: scan-local CASE/cast algebra — no
            # exchange, no Python, codegen throughout
            ("map-only (no shuffle)", r"Exchange", "absent"),
            ("no Python in the loop", r"EvalPython", "absent"),
            ("whole-stage codegen", r"codegen id :"),
        ]),
        ("random_walks", [
            # per-step join+agg live inside the checkpointed fixpoint
            # (lineage truncated) — the auditable tail is the checkpoint
            # scan, and must stay free of nested-loop/cartesian shapes
            ("checkpointed fixpoint tail", r"ExistingRDD|Scan"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("encode_tokens", [
            # vocab is parameter-bounded -> BROADCAST encode join; the
            # per-doc regroup is the only corpus shuffle beyond counting
            ("vocab side broadcast", r"BroadcastHashJoin|BroadcastExchange"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no Python in the loop", r"EvalPython", "absent"),
        ]),
        ("quality_rules", [
            # rule battery: scan-local array algebra — no exchange, no
            # Python, codegen
            ("map-only (no shuffle)", r"Exchange", "absent"),
            ("no Python in the loop", r"EvalPython", "absent"),
            ("whole-stage codegen", r"codegen id :"),
        ]),
        ("describe_cbd", [
            # CBD: per-round joins are checkpointed away; the auditable
            # tail must stay hash-join shaped (semi joins, no BNLJ)
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("bgp_join_stats", [
            # stats-planned BGP: same physical guarantees as bgp_join —
            # pushed pred filters, hash joins only
            ("pred filter pushed to store scan", r"PushedFilters: \[.*EqualTo\(pred,"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("bfs_dist", [
            # level-synchronous BFS: frontier ⋈ edges is a hash equi-join;
            # visited-set exclusion is a hash anti join, never nested-loop
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("label_prop", [
            # per-round: edges ⋈ labels hash join, map-side-combined
            # (node, label) counts, min_by-struct argmax — the argmax is
            # an aggregate, NOT a per-node window (the only Window nodes
            # allowed are the test graph builder's row_number edges)
            ("hash aggregation (votes + argmax)", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("lm_score", [
            # model training = two map-side-combined aggs; score join is a
            # hash equi-join on (w1, w2); bigram generation is scan-local
            ("hash aggregation (model + per-doc)", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("cms_sketch", [
            # the mergeable summary: map-side partial agg means each task
            # emits ≤ depth·width rows; ONE exchange, no joins at all
            ("map-side-combined aggregation", r"HashAggregate"),
            ("single shuffle", r"\(\d+\) Exchange", "count", 1),
            ("no joins", r"Join", "absent"),
        ]),
        ("nfc_text", [
            # the ONE sanctioned Python column: must be the Arrow-batched
            # pandas-UDF path, never row-at-a-time BatchEvalPython
            ("Arrow-batched pandas UDF", r"ArrowEvalPython"),
            ("no row-at-a-time Python", r"BatchEvalPython", "absent"),
            ("map-only (no shuffle)", r"Exchange", "absent"),
        ]),
        ("hll_sketch", [
            # fixed per-key state: one map-side-combined agg, nothing else
            ("map-side-combined aggregation", r"HashAggregate"),
            ("single shuffle", r"\(\d+\) Exchange", "count", 1),
            ("no joins", r"Join", "absent"),
            ("only the two needed columns read", r"ReadSchema: struct<ts:timestamp,user_id:bigint,event_type:string>|ReadSchema: struct<user_id:bigint,event_type:string>"),
        ]),
        ("rdfs_delta", [
            # DRed incremental closure: schema sides broadcast, candidate/
            # rederive joins are hash joins, no cartesian, no Python
            ("broadcast schema joins", r"BroadcastHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("owl_consistency", [
            # violation report: axiom tables broadcast, self-joins are
            # key-restricted hash joins, no cartesian, no Python.
            # BroadcastNestedLoopJoin IS expected here and benign: the
            # fixture's type branches carry a LITERAL class, so Catalyst
            # constant-folds the semi-join key into the broadcast side
            # and leaves a condition-less existence gate over a
            # schema-sized (0/1-row) broadcast — O(left), no comparisons
            ("broadcast axiom joins", r"BroadcastHashJoin"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("stream_hll", [
            # r4 streaming-parity anchor: the RETURNED frame is the folded
            # register state's read path — join-free, codegen, no Python
            # (the fold itself ran in foreachBatch; this audits what the
            # driver compares)
            ("no joins", r"Join", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("stream_cms", [
            # folded (r, c, cnt) grid: bounded state, no joins, no Python
            ("no joins", r"Join", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("stream_dedup", [
            # survivor hash set: one dedup agg over the memory sink, no
            # joins, no cartesian, no Python
            ("no joins", r"Join", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("stream_sessionize", [
            # r5 anchor: the RETURNED frame is the memory-sink read of the
            # drained closed sessions — join-free, no Python in the read
            # path (the applyInPandasWithState ran inside the drain)
            ("no joins", r"Join", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("stream_attr_clicks", [
            # r5 anchor: memory-sink read of the emitted attribution pairs
            ("no joins", r"Join", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("unigram_encode", [
            # Viterbi segmentation: Arrow-batched mapInPandas over the doc
            # scan with the broadcast piece table in the task closure —
            # Python IS the point here (justified like the parser stage),
            # and nothing else: no joins, no shuffle
            ("Arrow-batched Python stage", r"MapInPandas|ArrowEvalPython"),
            ("no joins", r"Join", "absent"),
            ("map-only (no shuffle)", r"Exchange", "absent"),
        ]),
        ("media_png16_real", [
            # 16-bit decode: Arrow-batched media UDFs (justified), the
            # meta×histogram recombine is a hash join on media_id over
            # 25-row sides, never a product
            ("Arrow-batched Python stage", r"MapInPandas|ArrowEvalPython"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
        ]),
        ("hll_estimate", [
            # read path folds registers per group — still join-free
            ("no joins", r"Join", "absent"),
            ("codegen", r"codegen id :"),
        ]),
        ("chunk_docs", [
            # scan-local chunking: explode+slice only, no shuffle anywhere
            ("map-only (no shuffle)", r"Exchange", "absent"),
            ("no joins", r"Join", "absent"),
            ("generator (explode) present", r"Generate"),
            ("columns pruned to doc_id+text", r"ReadSchema: struct<doc_id:bigint,text:string>"),
        ]),
        ("linkpred", [
            # wedge join must stay an equi-join; candidate pairs are
            # never produced by a product
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("direct edges removed by hash anti join", r"LeftAnti"),
        ]),
        ("scd2_asof", [
            # one key shuffle for the lead() window; probe is a filter
            ("window over the key shuffle", r"Window"),
            ("no joins", r"Join", "absent"),
            ("single shuffle", r"\(\d+\) Exchange", "count", 1),
        ]),
        ("score_resample", [
            # deterministic curation flag: pure scan-side projection
            ("map-only (no shuffle)", r"Exchange", "absent"),
            ("no joins", r"Join", "absent"),
            ("codegen", r"codegen id :"),
        ]),
        ("scc_cycles", [
            # mutual reachability = hash equi-joins over the closure
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            # sorted SMJ output → Catalyst picks SortAggregate; partial
            # (below the Exchange) + final is still map-side-combined
            ("map-side-combined min agg", r"HashAggregate|SortAggregate"),
        ]),
        ("compaction_plan", [
            # metadata-sized plan: the single-partition window is the
            # POINT (one row per file, not per data row)
            ("running-sum window", r"Window"),
            ("no joins", r"Join", "absent"),
        ]),
        ("harmonic", [
            # per-seed frontiers stay hash equi-joins; reciprocal sums
            # are one combined aggregation
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("map-side-combined sum", r"HashAggregate|SortAggregate"),
        ]),
        ("funnel", [
            # one user_id shuffle + scan-local fold: no per-step joins
            ("single shuffle", r"\(\d+\) Exchange", "count", 1),
            ("no joins", r"Join", "absent"),
            ("map-side-combined collect", r"HashAggregate|SortAggregate|ObjectHashAggregate"),
        ]),
        ("path_repeat", [
            # quantifier tail reuses the closure machinery; the auditable
            # surface is hash joins + the distinct aggregate, no BNLJ
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("distinct pair aggregate", r"HashAggregate|SortAggregate"),
        ]),
        ("tfidf_pairs", [
            # inverted-index pair generation: equi-joins only, postings
            # df-capped before the self-join
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("map-side-combined pair agg", r"HashAggregate|SortAggregate"),
        ]),
        ("pii_scrub", [
            # regex scrub is pure projection: pipelines into the scan,
            # nothing to shuffle at any scale
            ("map-only: zero exchanges", r"Exchange", "absent"),
            ("no joins", r"Join", "absent"),
            ("columns pruned to (doc_id, text)", r"ReadSchema: struct<doc_id:bigint,text:string>"),
        ]),
        ("line_dedup", [
            # cross-corpus line counting: map-side-combined agg keyed by
            # line hash; the boilerplate set is small by construction so
            # the drop join broadcasts it
            ("boilerplate set broadcast", r"BroadcastHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("map-side-combined line counts", r"HashAggregate"),
        ]),
        ("kmeans", [
            # Lloyd unroll: exactly 3 assignment passes (2 iterations +
            # final), each a k-row broadcast cross — the ONLY place a
            # nested-loop join is the right plan (k·dim is bytes)
            ("exactly 3 k-row broadcast assignments", r"\(\d+\) BroadcastNestedLoopJoin", "count", 3),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("partial+final centroid agg", r"HashAggregate"),
        ]),
        ("domain_filter", [
            # blocklist broadcast: map-side hash join, corpus never shuffles
            # for the match itself (only the id-keyed join back)
            ("blocklist broadcast", r"BroadcastHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("semdedup", [
            # the pairwise stage must be cluster-equi, never all-pairs:
            # only k-means's 3 intended k-row BNLJ appear
            ("pair join is cluster-equi (sort-merge)", r"SortMergeJoin"),
            ("only k-means's 3 k-row BNLJ", r"\(\d+\) BroadcastNestedLoopJoin", "count", 3),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("fuse_vote", [
            # vote collapse is one map-side-combined agg; ranking is a
            # (s,pred)-keyed window, never a join
            ("map-side-combined vote aggregation", r"HashAggregate"),
            ("winner via window, not self-join", r"Window"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("truth_weighted", [
            # round 2 adds a claims⋈winners hash join + |sources|-row
            # broadcast of the weight table — still no quadratic shape
            ("weight table broadcast", r"BroadcastHashJoin|BroadcastExchange"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("char_sets", [
            # two aggregations (subject-keyed set-collect, then cset count);
            # a pure group-by pipeline — no join of any kind
            ("set-collect + count aggregations", r"HashAggregate"),
            ("no join at all", r"Join", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("schema_sum", [
            # two entity-keyed equi-joins against the type map + one
            # catalog-keyed agg — hash joins only
            ("type-map joins are hash joins", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("alias_mine", [
            # label filter + (alias,uri) agg + alias-keyed window; no joins
            ("alias-keyed aggregation", r"HashAggregate"),
            ("prior split via window", r"Window"),
            ("no join at all", r"Join", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("key_profile", [
            # two orientations × two map-side-combined aggs; the only join
            # is the |preds|-row profile merge
            ("map-side-combined profile aggs", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("blocking_eval", [
            # inverted-index truth + LSH candidates meet in hash equi-joins;
            # the trailing 1-row×1-row metric cross joins are intentional
            ("pair joins are hash equi-joins", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("path_profile", [
            # hub-safe: both sides pre-aggregate to (pred, mid) counts
            # BEFORE the mid-keyed join — aggs below the join in the plan
            ("pre-aggregation below the join", r"HashAggregate"),
            ("mid-keyed equi-join", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("crawl_schedule", [
            # one host-keyed window (politeness serializes a host); the md5
            # stagger is scalar column algebra, no joins anywhere
            ("single host-keyed window", r"Window"),
            ("no join at all", r"Join", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("khop_slice", [
            # frontier expansion = node-keyed LeftSemi hash joins per hop
            ("frontier probes are hash semi-joins", r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin).*LeftSemi"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("prov_graph", [
            # metadata-sized: one stage agg + constant-width melt; the only
            # join-free plan with an explode
            ("stage aggregation", r"HashAggregate"),
            ("melt is a generator, not a join", r"Generate"),
            ("no join at all", r"Join", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("rdf_lists", [
            # per-round frontier→first/rest probes are node-keyed hash joins
            ("spine walk is hash equi-joins", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("snm_pairs", [
            # positions: range exchange + bucket offsets broadcast; the pair
            # join keys on integer block ids — never a raw inequality join
            ("bucket offsets broadcast", r"BroadcastHashJoin|BroadcastExchange"),
            ("pair join keyed on block ids", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("skew_report", [
            ("map-side-combined key counts", r"HashAggregate"),
            ("top-k not full sort", r"TakeOrderedAndProject"),
            ("no cartesian shuffle beyond the 1-row totals", r"CartesianProduct", "absent"),
        ]),
        ("bloom_urls", [
            # filter side is m/32 rows → broadcast; probe never shuffles the
            # corpus on anything but its own id
            ("filter side broadcast", r"BroadcastHashJoin"),
            ("map-side-combined bit_or blocks", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("transe_rank", [
            # embedding-dict hash joins + codegen'd array fold; ranking is
            # top-k, never a full sort
            ("embedding joins are hash joins", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("top-k not full sort", r"TakeOrderedAndProject"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("bisim_summary", [
            # per-round: one target-color hash join + sorted-set agg; the
            # final collapse is two color joins + a catalog-keyed count
            ("color joins are hash joins", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("sorted-set refinement aggs", r"HashAggregate|ObjectHashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("containment", [
            # same bounded inverted-index shape as blocking_eval's truth
            ("pair joins are hash equi-joins", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("ns_migrate", [
            # anchored-prefix rewrite is map-only over the store scan
            ("zero shuffles", r"Exchange", "absent"),
            ("pred filter pushed to store scan", r"PushedFilters: \[.*EqualTo\(pred"),
        ]),
        ("corpus_card", [
            # ONE text scan (fused projection), one lang-keyed agg
            ("single fused aggregation", r"HashAggregate"),
            ("no join at all", r"Join", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("rel_extract", [
            # map-only regexp projections + explode; only the final
            # distinct shuffles
            ("match expansion is a generator", r"Generate"),
            ("no join at all", r"Join", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("trans_reduce", [
            # closure is the audited frontier/doubling plan; the reduction
            # itself is one hash join + one hash anti join
            ("redundancy check is a hash anti join", r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin).*LeftAnti"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("type_infer", [
            # (pred, type) weights are catalog-sized → broadcast into the
            # untyped side; argmax is a subject-keyed window
            ("weight table broadcast", r"BroadcastHashJoin"),
            ("argmax via window", r"Window"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("rank_metrics", [
            # candidate scoring joins + one query-keyed rank window + a
            # 1-row metric agg
            ("scoring joins are hash joins", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("rank via window", r"Window"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("host_split", [
            # map-only md5 bucketing + one split-keyed agg
            ("map-side-combined split counts", r"HashAggregate"),
            ("no join at all", r"Join", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("best_keeper", [
            # cluster pipeline is the audited shape; the re-election is one
            # doc-keyed hash join + a cluster-keyed window
            ("keeper window present", r"Window"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("entity_card", [
            # predicate frequencies broadcast; subject top-k window
            ("predicate stats broadcast", r"BroadcastHashJoin|BroadcastExchange"),
            ("per-subject top-k window", r"Window"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("kg_negs", [
            # dense-id dictionary: bucket offsets broadcast back; candidate
            # pick + filtered-protocol check are hash equi/anti joins
            ("bucket offsets broadcast", r"BroadcastHashJoin|BroadcastExchange"),
            ("filtered protocol is hash anti join", r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin).*LeftAnti"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("link_graph", [
            # scan-local href extraction (explode stays in the scan stage);
            # ONE (src_host, dst_host) shuffle — cells + final = 2 aggs each
            # split partial/final by Catalyst
            ("generate (href explode) present", r"Generate|Expand"),
            ("map-side-combined host agg", r"HashAggregate"),
            ("no join at all", r"Join", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("anchor_dict", [
            # (alias, dst) cells agg THEN per-alias top-k window over the
            # already-partitioned cells; min_count filter before the window
            ("cell counts hash-aggregated", r"HashAggregate"),
            ("per-alias top-k window", r"Window"),
            ("no join at all", r"Join", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("redirects", [
            # pointer doubling: every round is a hash equi-join; terminal
            # probe is a hash left join
            ("doubling rounds are hash joins", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("robots", [
            # rules collapse to one array row per host and BROADCAST; the
            # longest-prefix argmax is scan-local array algebra — the URL
            # set is never shuffled (no exchange on the probe side)
            ("per-host rules broadcast", r"BroadcastHashJoin|BroadcastExchange"),
            ("no sort-merge join of the URL set", r"SortMergeJoin", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("sssp", [
            # Bellman-Ford rounds: the final round's settled-set exclusion
            # (hash LEFT ANTI) + union stay visible; earlier rounds' min-
            # combine aggs sit behind the per-round checkpoints (same
            # truncation as bfs_dist)
            ("settled-set exclusion is a hash anti join", r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin).*LeftAnti"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("class_align", [
            # instance equi-join bounded by assertion volume; class sizes
            # broadcast back; per-class top-k window
            ("class sizes broadcast", r"BroadcastHashJoin|BroadcastExchange"),
            ("per-class top-k window", r"Window"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("change_rate", [
            # one url-keyed shuffle shared by the lag window and the agg
            ("lag window present", r"Window"),
            ("map-side-combined agg", r"HashAggregate"),
            ("no join at all", r"Join", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("host_authority", [
            # two host-keyed aggs + one outer join of |hosts|-sized sides
            ("degree aggs hash-aggregated", r"HashAggregate"),
            ("outer join is hash/merge", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("table_triples", [
            # WebTables extraction is the sanctioned Arrow-batched Python
            # path and stays MAP-ONLY: no exchange, no join
            ("Arrow-batched mapInPandas extraction", r"MapInPandas"),
            ("map-only (no shuffle)", r"Exchange", "absent"),
            ("no join at all", r"Join", "absent"),
        ]),
        ("cidr_map", [
            # bucket-expanded netblocks BROADCAST; prefix test is a filter,
            # never a join condition → hash equi-join only
            ("netblocks broadcast", r"BroadcastHashJoin|BroadcastExchange"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("reify_store", [
            # constant-width melt: one Generate, zero joins, zero shuffles
            ("melt via Generate", r"Generate"),
            ("map-only (no shuffle)", r"Exchange", "absent"),
            ("no join at all", r"Join", "absent"),
        ]),
        ("sitemap_parse", [
            # one block explode + field extracts, all inside the scan stage
            ("block explode via Generate", r"Generate"),
            ("map-only (no shuffle)", r"Exchange", "absent"),
            ("no join at all", r"Join", "absent"),
        ]),
        ("canon_link", [
            # pure per-row column algebra: no explode, no shuffle, no join
            ("map-only (no shuffle)", r"Exchange", "absent"),
            ("no join at all", r"Join", "absent"),
        ]),
        ("reify_rt", [
            # unreify = ONE (stmt, graph)-keyed agg; string-typed max
            # buffers plan as SortAggregate (immutable buffer rule), still
            # partial+final around a single exchange — assert that shape
            ("pivot agg partial+final", r"^\s*(?:\+- )?\*?\s?(?:Sort|Hash)Aggregate \(", "count", 2),
            ("single shuffle", r"^\(\d+\) Exchange", "count", 1),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("boilerplate", [
            # densitometric classifier: one Arrow pass, map-only
            ("Arrow-batched mapInPandas", r"MapInPandas"),
            ("map-only (no shuffle)", r"Exchange", "absent"),
            ("no join at all", r"Join", "absent"),
        ]),
        ("template_strip", [
            # block stream → (host,fp) + host aggs; tiny template set
            # BROADCAST back; no nested loop anywhere
            ("template set broadcast back", r"BroadcastHashJoin|BroadcastExchange"),
            ("map-side-combined aggs", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("link_edit", [
            # alias dictionary broadcast; Levenshtein verify is a filter
            # inside the broadcast join, mention side never shuffles for it
            ("alias dictionary broadcast", r"BroadcastHashJoin|BroadcastExchange"),
            ("levenshtein JVM-side (no Python)", r"ArrowEvalPython|BatchEvalPython", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("dict_bgp", [
            # id-space BGP: the bound predicate stays LEXICAL so it pushes
            # to the scan; joins then carry 8-byte ids; decode at the top
            ("pred filter pushed to scan", r"PushedFilters: \[.*EqualTo\(pred"),
            ("hash joins on ids", r"BroadcastHashJoin|SortMergeJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("prop_table_star", [
            # star as pivot: pred IN (...) pushed; pivot = partial+final
            # agg; only the nation property-table join remains
            ("pred IN pushed to scan", r"PushedFilters: \[.*In\(pred"),
            ("pivot partial+final agg", r"HashAggregate|SortAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("link_spam", [
            # host-graph-sized reciprocity semi-join: hash, never BNLJ
            ("reciprocity as hash semi-join", r"(BroadcastHashJoin|SortMergeJoin).*LeftSemi|LeftSemi.*(BroadcastHashJoin|SortMergeJoin)"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("mf2_triples", [
            # opt-in extraction branch: Arrow pass, map-only
            ("Arrow-batched mapInPandas extraction", r"MapInPandas"),
            ("map-only (no shuffle)", r"Exchange", "absent"),
            ("no join at all", r"Join", "absent"),
        ]),
        ("bitext_align", [
            # exact tier: bounded cross score + two window sums; no BNLJ
            # beyond the documented bounded cross join itself
            ("window top-k neighborhoods", r"Window"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("pld", [
            # PSL longest-match is scan-local array algebra: the only
            # shuffle is the result groupBy; no join, no Python
            ("single shuffle (the groupBy)", r"^\(\d+\) Exchange", "count", 1),
            ("no join at all", r"Join", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("hreflang_clusters", [
            # CC over URL nodes: hash joins only, JVM-side throughout
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("feed_items", [
            # zipped-regex block parsing: map-only, xml never shuffled
            ("map-only (no shuffle)", r"Exchange", "absent"),
            ("no join at all", r"Join", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("readability", [
            # scan-local column algebra: zero shuffles, zero Python
            ("map-only (no shuffle)", r"Exchange", "absent"),
            ("no join at all", r"Join", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("url_templates", [
            # template agg + per-host top-k window; no join, no Python
            ("no join at all", r"Join", "absent"),
            ("per-host top-k window", r"Window"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("cocitation", [
            # out-degree-capped self-join: equi hash join + TakeOrdered
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("global top-k as TakeOrdered", r"TakeOrderedAndProject"),
        ]),
        ("rule_mine", [
            # AMIE body joins: every join is an equi hash join (the pair
            # key / the z entity); min_body prune broadcast
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("min_body prune is broadcast", r"BroadcastHashJoin"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("cc_constrained", [
            # two id hash joins in front of the audited CC kernel
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("disambiguate", [
            # broadcast candidate dictionary; argmax is ONE map-side-
            # combinable aggregate (no window shuffle)
            ("candidate table broadcast", r"BroadcastHashJoin"),
            ("no window (argmax via min_by agg)", r"^\(\d+\) Window", "absent"),
            ("no sort-merge join", r"SortMergeJoin", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("fuse_numeric", [
            # fact-key aggregations + key hash joins; filter pushed to scan
            ("orderkey filter pushed to scan", r"PushedFilters: \[.*l_orderkey"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("cc_incremental", [
            # touched-component routing: hash semi/anti joins only in
            # front of the CC kernel
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("er_metrics", [
            # pair counts from contingency cells: the ONLY non-equi joins
            # are the two 1-row metric crossJoins
            ("1-row metric crossJoins only", r"^\(\d+\) BroadcastNestedLoopJoin", "count", 2),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("shape_infer", [
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("class-size table broadcast", r"BroadcastHashJoin"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("interval_allen", [
            # binned interval join = hash equi-join, never a range BNLJ
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("interval_coalesce", [
            ("no join at all", r"Join", "absent"),
            ("gaps-and-islands window", r"Window"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("louvain", [
            # gain argmax is a min_by agg, never a window; m2 folds to a
            # literal (one count job before plan build). Since the
            # lineage-blowup fix the fixture edges arrive via a
            # localCheckpoint (its row_number window no longer appears in
            # the plan), so the binding assertion is: NO window at all —
            # the argmax must stay an aggregate
            ("argmax window-free (no Window node)", r"^\(\d+\) Window", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("prop_align", [
            # stop-value df cap before the value join; size tables broadcast
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("size tables broadcast", r"BroadcastHashJoin"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("metablocking", [
            # pair gen is a block-keyed equi self-join; the ONLY BNLJ is the
            # 1-row totals broadcast for the mean cut
            ("1-row totals broadcast only", r"^\(\d+\) BroadcastNestedLoopJoin", "count", 1),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("partkey filter pushed to scan", r"PushedFilters: \[.*p_partkey"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("conductance", [
            # endpoint labeling = equi hash joins; community metrics are
            # map-side-combined aggs; m2 folds to a literal pre-plan
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("endpoint label hash joins", r"BroadcastHashJoin|SortMergeJoin"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("dangling_refs", [
            # never-described probe is a hash LeftAnti on the term key —
            # never a nested loop; store scan prunes to the melt columns
            ("anti join is hash", r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin).*LeftAnti"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("fs_weights", [
            # labeled-sample gold side broadcast onto the comparison stream;
            # ONE field-keyed agg after it
            ("gold side broadcast", r"BroadcastHashJoin.*LeftOuter"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("geo_nn", [
            # THE spatial-join guarantee: cell-keyed equi join, never the
            # cross product a naive radius join degenerates to; argmin is a
            # min_by agg, not a window
            ("cell-keyed equi join (hash)", r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("argmin via agg, not window", r"^\(\d+\) Window", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("dbscan_venues", [
            # DBSCAN = bounded radius join + CC + one border join; the
            # all-pairs neighbor scan must never appear
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("cell-keyed neighbor join (hash)", r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("tri_support", [
            # degree-oriented wedge join: hash equi-joins only, skew
            # bounded by orientation; support agg is map-side combined
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("wedge equi joins (hash)", r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("ktruss", [
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("events_hopping", [
            # F.window with slide = map-side expand + ONE partial+final agg
            ("partial+final hash agg", r"HashAggregate"),
            ("no window function", r"^\(\d+\) Window", "absent"),
            ("no Python eval", r"ArrowEvalPython|BatchEvalPython", "absent"),
            ("agg shuffle present (window expand is map-side)", r"Exchange"),
        ]),
        ("graph_ecc", [
            # the BFS frontier joins run inside the per-round
            # localCheckpoints (lineage deliberately cut — paths.py
            # discipline), so the FINAL plan is the (max, count) reduction
            # over the materialized distance set: agg only, nothing else
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("reduction is partial+final hash agg", r"HashAggregate"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("temporal_reach", [
            # rounds inside localCheckpoints; final plan = the last
            # full-outer min-merge — hash join, no BNLJ
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("copy_detect", [
            # co-claim equi self-join on the encoded tuple key + pair agg
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("tuple-key hash joins", r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("ppr_push", [
            # rounds run inside localCheckpoints; final plan = the last
            # full-outer residual merge + projection — hash join, no BNLJ
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("hilbert", [
            # constant-size aggregate() fold per row — map-only bit
            # algebra like zorder, but plan size O(1) in the bit budget
            ("map-only: zero shuffles", r"Exchange", "absent"),
            ("no join anywhere", r"Join", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("zorder", [
            # bit algebra fused into the scan: no shuffle, no join
            ("map-only: zero shuffles", r"Exchange", "absent"),
            ("no join anywhere", r"Join", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("jl_project", [
            # linear map fused into the scan: zero shuffles, zero joins
            ("map-only: zero shuffles", r"Exchange", "absent"),
            ("no join anywhere", r"Join", "absent"),
            ("pruned scan (vec_id + embedding only)", r"ReadSchema: struct<vec_id:bigint,embedding"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("er_bcubed", [
            # three count aggs + two tiny size joins; nothing pair-shaped
            ("no cartesian product in the fold", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("cell/marginal hash aggs", r"HashAggregate"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("hyperball", [
            # merge rounds run inside per-round localCheckpoints; the final
            # plan is the register read path: one node-keyed agg, no joins
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("read path is hash agg", r"HashAggregate"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("burst_windows", [
            # one tumbling agg + ONE type-partitioned window; no joins at all
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no join anywhere", r"Join", "absent"),
            ("single bounded-frame window", r"^\(\d+\) Window"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("betweenness", [
            # forward/backward passes run inside per-round localCheckpoints;
            # the final plan is the seed-summed reduction over materialized
            # dependency rows — joins hash, reduction one agg
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("reduction is partial+final hash agg", r"HashAggregate"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("spam_mass", [
            # two PR runs: per-iter equi hash joins + 1-row total broadcasts
            # (the two crossJoins ARE single-row broadcasts — the intended
            # plan; assert nothing bigger leaks into a BNLJ than those)
            ("1-row total broadcasts only", r"^\(\d+\) BroadcastNestedLoopJoin", "count", 2),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("sentence_spans", [
            # scan-local segmentation: split + array prefix sum + ONE
            # posexplode — zero shuffles, the offsets ride the array
            ("map-only: zero shuffles", r"Exchange", "absent"),
            ("no join anywhere", r"Join", "absent"),
            ("explode via Generate", r"Generate"),
            ("columns pruned to doc_id+text", r"ReadSchema: struct<doc_id:bigint,text:string>"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("container_members", [
            # membership extraction is a predicate-prefix filter (map
            # side); the only join is the container-keyed type decoration
            ("type decoration is a hash join", r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("katz", [
            # per round: ONE edges⋈scores hash join + ONE map-side-combined
            # dst sum; rounds checkpointed — no quadratic shape anywhere
            ("contribution sums are hash aggs", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("butterflies", [
            # wedge generation is a right-keyed equi self-join (hub-capped
            # BEFORE the join via a broadcast anti join); top-k merges
            ("wedge join is equi (hash/merge)", r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
            ("hub cap is a broadcast anti join", r"BroadcastHashJoin.*LeftAnti|LeftAnti.*BuildRight"),
            ("top-k, no full sort", r"TakeOrderedAndProject"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("eff_diameter", [
            # downstream of the checkpointed hyperball rounds everything
            # is curve-sized; the only BNLJ is the 1-row est_total
            # broadcast; the lag window runs over max_hops+1 rows
            ("1-row total broadcast only", r"^\(\d+\) BroadcastNestedLoopJoin", "count", 1),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("bowtie", [
            # two checkpointed BFS passes; the visible tail is the two
            # node-keyed left joins over the node spine — hash, not BNLJ
            ("spine joins are hash joins", r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("weighted_sample", [
            # priority key is scan-local; the ONLY shuffle is the
            # group-keyed top-k window; no joins anywhere
            ("single shuffle (the group window)", r"^\(\d+\) Exchange", "count", 1),
            ("group-keyed top-k window", r"\(\d+\) Window"),
            ("no join at all", r"Join", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("surt", [
            # pure column algebra fused into the scan
            ("map-only: zero shuffles", r"Exchange", "absent"),
            ("no join anywhere", r"Join", "absent"),
            ("whole-stage codegen", r"codegen id :"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("salsa", [
            # checkpointed between rounds (katz discipline): the final
            # half-round's join + divided-contribution sum stay visible
            ("contribution sums are hash aggs", r"HashAggregate"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("mis", [
            # per-round state is eagerly checkpointed (reused 4x within
            # the round); the returned plan is the union of the selected
            # rounds — nothing quadratic anywhere
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("phonetic", [
            # pure translate/regex column algebra fused into the scan
            ("map-only: zero shuffles", r"Exchange", "absent"),
            ("no join anywhere", r"Join", "absent"),
            ("whole-stage codegen", r"codegen id :"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("kappa", [
            # item join + label-vocabulary-sized marginals + 1-row fold;
            # the only BNLJ is the 1-row pe broadcast
            ("1-row pe broadcast only", r"^\(\d+\) BroadcastNestedLoopJoin", "count", 1),
            ("marginal hash aggregates", r"HashAggregate"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("matching", [
            # per-round state eagerly checkpointed; the returned plan is
            # the union of per-round selections — hash shapes only
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("pq", [
            # two audited k-means plans (their k-row broadcast
            # assignments are the only BNLJ: 3 per block) + one vec_id
            # zip join
            ("only the 2x3 k-row broadcast assignments", r"^\(\d+\) BroadcastNestedLoopJoin", "count", 6),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("code zip is a hash join", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("soft404", [
            # phrase battery + token count fused into the scan
            ("map-only: zero shuffles", r"Exchange", "absent"),
            ("no join anywhere", r"Join", "absent"),
            ("whole-stage codegen", r"codegen id :"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("postings", [
            # tokenize+posexplode scan-local; ONE (term,doc)-keyed
            # map-side-combined shuffle; no joins
            ("single shuffle (the postings agg)", r"^\(\d+\) Exchange", "count", 1),
            ("posexplode via Generate", r"Generate"),
            ("no join anywhere", r"Join", "absent"),
            ("map-side-combined agg", r"HashAggregate|ObjectHashAggregate|SortAggregate"),
        ]),
        ("phrase", [
            # per-word position sets meet in doc-keyed hash joins; the
            # adjacency test is array algebra, never a position join
            ("doc-keyed hash joins", r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("cluster_split", [
            # the audited dedup pipeline + one map-only hash over the
            # cluster column — nothing new may appear
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("filter_funnel", [
            # ONE fused scan -> 1-row aggregate -> constant-width melt
            ("melt via Generate, not joins", r"Generate"),
            ("no join anywhere", r"Join", "absent"),
            ("fused flag aggregate", r"HashAggregate|SortAggregate"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("log_asof", [
            # ONE fact-keyed max_by aggregate + map filter; no joins,
            # no windows — replaying N days of patches is one agg pass
            ("fact-keyed max_by hash agg", r"HashAggregate|ObjectHashAggregate|SortAggregate"),
            ("no join anywhere", r"Join", "absent"),
            ("no window", r"^\(\d+\) Window", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("rrf", [
            # fusion is query-result-sized: doc-keyed agg + rank window;
            # never a corpus operation
            ("doc-keyed fusion agg", r"HashAggregate|SortAggregate"),
            ("rank window present", r"\(\d+\) Window"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("sparql_text_lateral", [
            # correlated sub-SELECT LIMIT = ONE window over the
            # correlation key + a hash join back — never a per-binding
            # re-execution, never a nested loop
            ("per-binding top-n via Window", r"\(\d+\) Window"),
            ("correlation join is hash", r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("pred filters pushed to store scan", r"PushedFilters: \[.*EqualTo\(pred"),
        ]),
        ("shacl_closed", [
            # shapes broadcast both for targeting and the allowed-path
            # ANTI join; the data graph never shuffles on a foreign key
            ("shape sides broadcast", r"BroadcastHashJoin|BroadcastExchange"),
            ("allowed-path check is anti join", r"(LeftAnti|ANTI)"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
        ]),
        ("direct_map", [
            # schema-driven constant-width melt: one Generate, zero
            # joins, zero shuffles — each table maps in one scan
            ("melt via Generate", r"Generate"),
            ("map-only (no shuffle)", r"Exchange", "absent"),
            ("no join at all", r"Join", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("r2rml_map", [
            # non-ref arms are the same constant-width melt as direct_map;
            # the ONE join is the referencing object map, hash on the join
            # condition with the dimension-sized parent broadcast
            ("melt via Generate", r"Generate"),
            ("ref-object-map join is hash", r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("skos_audit", [
            # taxonomy-sized inputs: label aggs + hash anti/semi joins;
            # the cycle check is the shared closure fixpoint (checkpointed
            # scans), never a nested loop
            ("label agg present", r"HashAggregate|SortAggregate"),
            ("orphan check is anti join", r"(LeftAnti|ANTI)"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("shacl_pairs", [
            # pair joins keyed on the focus node (per-focus value sets are
            # cardinality-sized); shape table broadcast; order comparison
            # is a filter on the pair join, never a nested loop. The only
            # permitted BNLJ form is LeftSemi against the |shapes|-row
            # predicate list: when a surrounding join pins pred to a
            # literal, Catalyst constant-folds the semi join's equi-key
            # into a trivially-true condition over the schema-sized build
            # side — bounded at any corpus scale
            ("shape targeting broadcast", r"BroadcastHashJoin|BroadcastExchange"),
            ("equals/disjoint are anti/semi joins", r"(LeftAnti|LeftSemi|ANTI|SEMI)"),
            ("no row-x-row nested-loop join", r"BroadcastNestedLoopJoin (Inner|Cross|LeftOuter)", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("simrank", [
            # sparse-state fixpoint: per round state ⋈ edges ⋈ edges (all
            # node-keyed hash joins) + ONE map-side-combined (a,b) sum;
            # in-degrees join by key — never a dense pair matrix
            ("pair sum is hash aggregate", r"HashAggregate|SortAggregate"),
            ("state-edge joins are hash", r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("er_pivot", [
            # per-round election state is eagerly checkpointed (the mis
            # precedent — reused by assignment, eviction AND next-round
            # edges), so the returned plan is the checkpointed-round union
            # joined back to documents; nothing quadratic anywhere
            ("doc join is hash", r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("dup_extents", [
            # map-side window hashing; corpus shuffles are the hash-count
            # agg + the hash join back; island numbering is a doc-keyed
            # window (bounded by document length)
            ("hash-count agg map-side combined", r"HashAggregate|SortAggregate"),
            ("join back is hash", r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
            ("island window is doc-partitioned", r"\(\d+\) Window"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("node2vec", [
            # per-step join+agg live inside the checkpointed fixpoint
            # (the random_walks precedent) — the auditable tail is the
            # checkpoint scan; weighted choice is sequence/transform
            # column algebra, never a Python UDF
            ("checkpointed fixpoint tail", r"ExistingRDD|Scan"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("dsir", [
            # model fitting = two B-row aggs; the only BNLJ are the two
            # 1-row total broadcasts; scoring joins the B-row ratio table
            # broadcast onto the token stream
            ("ratio table broadcast onto tokens", r"BroadcastHashJoin"),
            ("1-row total broadcasts only", r"^\(\d+\) BroadcastNestedLoopJoin", "count", 2),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("privacy_k_anon", [
            # one map-side-combined groupBy on the QI columns — the whole
            # audit is a single agg pass, no joins at any scale
            ("QI class agg map-side combined", r"HashAggregate|SortAggregate"),
            ("no join at all", r"Join", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("privacy_suppress", [
            # rows hash-join against the (small) undersized-class list;
            # never a row×row comparison
            ("class agg present", r"HashAggregate|SortAggregate"),
            ("row-class join is hash", r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("license_scan", [
            # one scan, per-row rlike battery — no shuffle at any crawl size
            ("no shuffle at all", r"Exchange", "absent"),
            ("no join at all", r"Join", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("cdc_chunks", [
            # anchors/boundaries/hashes all ride the token array; ONE
            # posexplode, no shuffle — the sentence_spans plan family
            ("chunk explode present", r"Generate"),
            ("no shuffle at all", r"Exchange", "absent"),
            ("no join at all", r"Join", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("krippendorff", [
            # item-keyed aggs (no joins on the corpus key), one pairable-
            # unit semi-join, |vocab|-sized category totals, 1-row fold
            ("1-row category-total fold only", r"^\(\d+\) BroadcastNestedLoopJoin", "count", 1),
            ("item/category hash aggregates", r"HashAggregate"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("edit_verify", [
            # block-key hash joins (cap semi-joins + candidate join);
            # levenshtein verify is a codegen filter, never a BNLJ
            ("candidate join is hash on the block key", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("novelty", [
            # gram distinct + min-owner agg + ONE gram-keyed hash join
            ("owner join is hash", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("distinctive", [
            # (group, token) cell agg + catalog-sized marginal joins +
            # per-group top-k window — hash shapes only
            ("marginal joins are hash", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("1-row corpus-total broadcast only", r"^\(\d+\) BroadcastNestedLoopJoin", "count", 1),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("burstiness", [
            # (doc, token) agg → token agg → 1-row N broadcast
            ("1-row N broadcast only", r"^\(\d+\) BroadcastNestedLoopJoin", "count", 1),
            ("map-side combined count aggs", r"HashAggregate"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("fair_quota", [
            # host-list rank window + 1-row level fold broadcast back
            ("rank window present", r"\bWindow\b"),
            ("1-row level broadcast only", r"^\(\d+\) BroadcastNestedLoopJoin", "count", 1),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("winsorize", [
            # rank window + group-keyed bounds join (hash) + filter
            ("rank window present", r"\bWindow\b"),
            ("bounds join is hash", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("cat_drift", [
            # tagged union scan + ONE category agg + category-row fold
            ("no join at all", r"Join", "absent"),
            ("category count agg", r"HashAggregate"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("cusum", [
            # two windows on the series key (cumsum + running min), the
            # alarm filter and first-alarm rank — zero joins
            ("series windows present", r"\bWindow\b"),
            ("no join at all", r"Join", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("lag_corr", [
            # ONE shifted-key equi self-join (hash) + map-side fold
            ("shifted self-join is hash", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("auc", [
            # one score-keyed agg + curve windows + 1-row fold, no joins
            ("no join at all", r"Join", "absent"),
            ("score count agg", r"HashAggregate"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("ks_drift", [
            # tagged union scan + value-keyed agg + CDF windows, no joins
            ("no join at all", r"Join", "absent"),
            ("value count agg", r"HashAggregate"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("gini", [
            # one rank window on the group key + one fold — no joins
            ("rank window present", r"\bWindow\b"),
            ("no join at all", r"Join", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("bootstrap", [
            # B replicates ride ONE scan: explode + map-side-combined
            # replicate agg; no joins, no shuffle of B x n rows
            ("replicate explode present", r"Generate"),
            ("map-side combined replicate agg", r"HashAggregate"),
            ("no join at all", r"Join", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("rich_club", [
            # degree agg + two endpoint-degree hash joins; curve windows
            # run on |distinct degrees| rows
            ("degree stamps are hash joins", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("pr_curve", [
            # ONE score-keyed count agg + cumulative windows over the
            # distinct-score curve — no joins
            ("no join at all", r"Join", "absent"),
            ("score count agg", r"HashAggregate"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("graph_anon", [
            # degree agg + ONE endpoint-degree hash join + signature agg
            ("degree join is hash", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("kdeg_cost", [
            # degree agg + global rank window + run-keyed fold (the only
            # joins are the chain-graph FIXTURE's edge construction)
            ("global rank window", r"\bWindow\b"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("zonemap", [
            # stats aggs + one metadata-sized fold — no joins anywhere
            ("no join at all", r"Join", "absent"),
            ("map-side combined stats aggs", r"HashAggregate"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("overlap_depth", [
            # join-free overlap counting: event/probe windows; the only
            # joins stitch per-file counts back (hash, metadata-sized)
            ("stitch joins are hash", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("sweep_cut", [
            # corpus-sized work = one scan + broadcast rank join; the
            # curve windows run on <= k_max rows
            ("rank join is broadcast hash", r"BroadcastHashJoin"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("stats_merge", [
            # per-partition summaries + 1-row merge folds; the only BNLJ
            # is the 1-row estimate broadcast
            ("1-row estimate broadcast only", r"^\(\d+\) BroadcastNestedLoopJoin", "count", 1),
            ("map-side combined summary aggs", r"HashAggregate"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("changepoint", [
            # ONE window pass on the group key + one max_by fold
            ("window cumulative pass", r"\bWindow\b"),
            ("no join at all", r"Join", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("mad_outliers", [
            # two window passes on the group key + two med/MAD stamp
            # joins — hash shapes only, no UDFs
            ("window passes present", r"\bWindow\b"),
            ("stamp joins are hash", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("benford", [
            # scan-local first-digit regexp + ONE (grp,digit) count agg
            # + 9-row-per-group window/fold — no joins at all
            ("no join at all", r"Join", "absent"),
            ("digit count hash agg", r"HashAggregate"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("mst", [
            # per-round state eagerly checkpointed (comp stamps are hash
            # joins, pick is one min_by agg); returned plan = union of
            # checkpointed per-round selections
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("single_linkage", [
            # MSF cut + component relabel: hash joins only
            ("relabel joins are hash", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("heavy_hitters", [
            # sampled nomination + exact verify; N rides two 1-row
            # broadcasts, candidates a broadcast semi-join
            ("two 1-row N broadcasts only", r"^\(\d+\) BroadcastNestedLoopJoin", "count", 2),
            ("candidate semi-join is broadcast hash", r"BroadcastHashJoin"),
            ("map-side combined count aggs", r"HashAggregate"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("dp_counts", [
            # ONE group-count shuffle; the noise is scan-local integer
            # CASE algebra on the group key — no joins anywhere
            ("single shuffle (the group agg)", r"^\(\d+\) Exchange", "count", 1),
            ("no join at all", r"Join", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("lang_spans", [
            # segmentation + per-sentence votes ride the sentence array —
            # the whole operator is one scan-local Generate
            ("sentence explode present", r"Generate"),
            ("no shuffle at all", r"Exchange", "absent"),
            ("no join at all", r"Join", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("code_switch", [
            # two aggs sharing the doc_id key: per-(doc,lang) count partials
            # combine map-side, the doc fold reuses the same partitioning
            ("per-lang agg map-side combined", r"HashAggregate|SortAggregate"),
            ("no join at all", r"Join", "absent"),
            ("no window over the corpus", r"Window", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("calibration", [
            # ONE map-side-combined groupBy on the bin key; B rows out
            ("bin agg map-side combined", r"HashAggregate|SortAggregate"),
            ("no join at all", r"Join", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("distmult_rank", [
            # two entity-keyed hash joins + the 1-row relation broadcast;
            # top-20 via per-partition top-k, never a full sort
            ("entity joins are hash", r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin"),
            ("top-k, no full sort", r"TakeOrderedAndProject"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("dawid_skene", [
            # the EM rounds (hash joins + map-side-combined aggs + the
            # 1-row prior-total broadcast) live behind the per-round
            # localCheckpoint — the visible tail is the checkpointed
            # posterior frame (the fixpoint-family audit shape)
            ("checkpointed EM tail", r"ExistingRDD"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("coverage_pick", [
            # per-round: map-side-combined gain count + covered-gram hash
            # anti join; the anti join lives BEHIND each round's
            # localCheckpoint boundary (the fixpoint-family shape), so the
            # visible tail is checkpoint scans + the pick aggs — assert
            # those plus the absence of any degenerate join form
            ("gain agg map-side combined", r"HashAggregate|SortAggregate"),
            ("checkpointed fixpoint tail", r"ExistingRDD"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("topo_order", [
            # max-relaxation: the returned frame keeps the LAST round's
            # settle visible (anti join + union over checkpointed state);
            # earlier rounds sit behind localCheckpoint barriers
            ("last settle anti join visible", r"LeftAnti"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
            ("checkpointed fixpoint tail", r"ExistingRDD"),
        ]),
        ("densest_core", [
            # peel rounds: degree agg map-side combined; the per-round
            # label frames join the 1-row totals by broadcast — that BNLJ
            # is the accepted 1-row-build-side pattern (ann.py precedent),
            # NOT a data×data product; the edge-shrink anti joins sit
            # behind the round checkpoints
            ("degree agg map-side combined", r"HashAggregate|SortAggregate"),
            ("1-row totals broadcast", r"BroadcastExchange"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("textrank", [
            # per-doc co-occurrence graphs ride one frame: window band is
            # a residual filter on the doc_id equi-join; PR rounds are
            # hash joins + map-side-combined aggs behind checkpoints
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
            ("round agg map-side combined", r"HashAggregate|SortAggregate"),
            ("bounded per-doc top-k window", r"Window"),
        ]),
        ("pagerank_weighted", [
            # same per-iteration plan as pagerank: strength rides the
            # edge pre-joined, map-side-combined contribution agg
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("contribution agg map-side combined", r"HashAggregate|SortAggregate"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("trend_mk", [
            # pair self-join is equi on the series key with t_j > t_i as
            # a residual filter; sign-sum agg map-side combined
            ("series-key equi join", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("sign-sum agg map-side combined", r"HashAggregate|SortAggregate"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("kendall_metrics", [
            # same shape as trend_mk: key-equi pair self-join + sign agg
            ("series-key equi join", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("feat_hash", [
            # tokenize scan-local, one map-side-combined (doc,bucket) agg
            ("no joins", r"Join", "absent"),
            ("generator (explode) present", r"Generate"),
            ("count agg map-side combined", r"HashAggregate"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("ols_trend", [
            # six-sum single aggregation over the series key, no joins in
            # the stat itself (the trailing projections are scalar CASEs)
            ("sums map-side combined", r"HashAggregate"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("fleiss_items", [
            # (item,cat) cell agg map-side combined; totals are 1-row
            # broadcasts; no joins over the raw ratings
            ("cell agg map-side combined", r"HashAggregate"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
        ("ewma_hosts", [
            # lag self-join: equi on the series key with the lag range as
            # a residual filter, one map-side-combined agg — no window
            # over collected arrays, no product
            ("series-key equi join", r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"),
            ("no cartesian product", r"CartesianProduct", "absent"),
            ("no nested-loop join", r"BroadcastNestedLoopJoin", "absent"),
            ("weighted agg map-side combined", r"HashAggregate|SortAggregate"),
            ("JVM-side only (no Python eval)", r"ArrowEvalPython|BatchEvalPython", "absent"),
        ]),
    ]

    # optional argv name filter: `python scripts/plan_audit.py q1 q2` audits
    # only those queries and SKIPS the PLANS.md rewrite (fast iteration);
    # no args = full audit + regenerate PLANS.md
    only = set(sys.argv[1:])
    if only:
        unknown = only - {n for n, _c in audits}
        if unknown:
            raise SystemExit(f"unknown audit name(s): {sorted(unknown)}")
        audits = [(n, c) for n, c in audits if n in only]

    lines = ["# PLANS — physical-plan audit (scripts/plan_audit.py)", "",
             f"Scale factor dir: `{SF}`. Every check is a regex the formatted",
             "plan must match; this file is regenerated by the script and the",
             "script exits non-zero if any check fails (CI-able).", ""]
    failures = 0
    for name, checks in audits:
        fn, _ = QUERIES[name]
        plan = plan_of(fn(spark, SF))
        lines.append(f"## {name}")
        for check in checks:
            label, pat = check[0], check[1]
            if len(check) > 2 and check[2] == "count":
                ok = len(re.findall(pat, plan, re.S | re.M)) == check[3]
            else:
                found = re.search(pat, plan, re.S | re.M) is not None
                ok = (not found) if (len(check) > 2 and check[2] == "absent") else found
            failures += 0 if ok else 1
            lines.append(f"- {'PASS' if ok else 'FAIL'} — {label}")
            print(f"{name}: {'PASS' if ok else 'FAIL'} {label}")
        # keep the scan excerpt lines as evidence
        evidence = [l for l in plan.splitlines() if re.search(
            r"PushedFilters|ReadSchema|BroadcastHashJoin|BroadcastNestedLoopJoin|TakeOrderedAndProject|SortMergeJoin|HashAggregate \(", l)]
        if evidence:
            lines.append("")
            lines.append("```")
            lines.extend(f"  {l.strip()[:120]}" for l in evidence[:10])
            lines.append("```")
        lines.append("")

    if not only:
        out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "PLANS.md")
        with open(out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {out}; {failures} failed checks")
    else:
        print(f"{failures} failed checks (filtered run, PLANS.md untouched)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
