"""Staged pipeline with per-stage checkpointing, per-partition lineage and
metrics tables, and resume-from-checkpoint.

North rule (BASELINE.json:14): "resumable from checkpoint with
per-partition lineage + metrics". The reference's nearest concept is
storage-backend transactions (rdf_graph.ml :: transaction_start/commit/
rollback, SURVEY §2.1) — single-process, in-memory. Here a stage commit
is an atomic directory rename of a completed Parquet write (Iceberg
snapshot commit in production — the TableIO seam below), so a killed run
re-executes only stages whose outputs are missing or whose input
fingerprint changed.

Layout per pipeline root:
    <root>/<stage>/data/            committed stage output (parquet)
    <root>/<stage>/_lineage/        (stage, part_id, row_count, ...)
    <root>/<stage>/_metrics/        (stage, metric, value)
    <root>/<stage>/_SUCCESS.json    commit marker + input fingerprint

At 100 TB: stage outputs are the shuffle barrier of the pipeline —
each stage reads the previous stage's committed files (partition-pruned,
column-pruned), so a resume never recomputes upstream parses.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = "stage string, part_id int, row_count long, status string"


class TableIO:
    """Format seam: parquet locally; an Iceberg catalog in production
    (SURVEY §7 R3 — no Iceberg jars in this sandbox). Only this class
    changes between the two."""

    def __init__(self, root: str):
        self.root = root

    def stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def is_committed(self, stage: str) -> Optional[dict]:
        p = os.path.join(self.stage_dir(stage), "_SUCCESS.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None

    def read(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(os.path.join(self.stage_dir(stage), "data"))

    def commit(self, df: DataFrame, stage: str, fingerprint: str, sort_cols: Optional[list] = None) -> dict:
        """Write data + lineage + metrics, then atomically drop the commit
        marker. A crash before the marker leaves a partial dir that the
        next run overwrites (idempotent)."""
        sdir = self.stage_dir(stage)
        tmp = sdir + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(sdir):
            shutil.rmtree(sdir)
        t0 = time.time()
        out = df
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        out.write.mode("overwrite").parquet(os.path.join(tmp, "data"))

        spark = df.sparkSession
        written = spark.read.parquet(os.path.join(tmp, "data"))
        lineage = (
            written.withColumn("part_id", F.spark_partition_id())
            .groupBy("part_id")
            .agg(F.count(F.lit(1)).alias("row_count"))
            .select(F.lit(stage).alias("stage"), "part_id", "row_count", F.lit("ok").alias("status"))
        )
        lineage.write.mode("overwrite").parquet(os.path.join(tmp, "_lineage"))
        n_rows = written.count()
        dt = time.time() - t0
        metrics = spark.createDataFrame(
            [
                (stage, "rows", float(n_rows)),
                (stage, "seconds", float(dt)),
                (stage, "rows_per_sec", float(n_rows / dt) if dt > 0 else 0.0),
            ],
            schema="stage string, metric string, value double",
        )
        metrics.write.mode("overwrite").parquet(os.path.join(tmp, "_metrics"))
        marker = {"stage": stage, "fingerprint": fingerprint, "rows": n_rows, "seconds": dt, "ts": time.time()}
        with open(os.path.join(tmp, "_SUCCESS.json"), "w") as f:
            json.dump(marker, f)
        os.rename(tmp, sdir)
        return marker


@dataclass
class Stage:
    name: str
    fn: Callable[[SparkSession, "Pipeline"], DataFrame]
    sort_cols: Optional[list] = None


class Pipeline:
    """Run stages in order; skip any whose committed fingerprint matches
    (resume-from-checkpoint). `fingerprint` should capture the input
    identity (corpus path/row count/config), not the data bytes."""

    def __init__(self, spark: SparkSession, root: str, fingerprint: str):
        self.spark = spark
        self.io = TableIO(root)
        self.fingerprint = fingerprint
        self.stages: list[Stage] = []
        self.log: list[dict] = []

    def stage(self, name: str, fn, sort_cols: Optional[list] = None) -> "Pipeline":
        self.stages.append(Stage(name, fn, sort_cols))
        return self

    def output(self, stage: str) -> DataFrame:
        return self.io.read(self.spark, stage)

    def run(self) -> list[dict]:
        for st in self.stages:
            marker = self.io.is_committed(st.name)
            if marker and marker.get("fingerprint") == self.fingerprint:
                self.log.append({**marker, "skipped": True})
                continue
            df = st.fn(self.spark, self)
            marker = self.io.commit(df, st.name, self.fingerprint, st.sort_cols)
            self.log.append({**marker, "skipped": False})
        return self.log


def kg_pipeline(
    spark: SparkSession, root: str, n_pages: int, parts: int = 8,
    ontology: Optional[DataFrame] = None,
    mine_anchors: bool = False,
    extract_opts: Optional[dict] = None,
) -> Pipeline:
    """The full KG-construction pipeline (north rule order): extract →
    [weblinks] → link → canonicalize → [infer] → materialize SPO/POS.
    Each stage committed with lineage + metrics; resumable mid-way.

    `ontology`: optional TRIPLES DataFrame of schema axioms (rdfs:
    subClassOf/subPropertyOf/domain/range, owl: inverseOf/Symmetric/
    TransitiveProperty). When given, an `infer` stage materializes the
    RDFS + OWL-RL entailments over the canonical store (operators/rdfs,
    operators/owlrl — broadcast-schema passes, no instance fixpoints)
    and the SPO/POS sinks serve the asserted ∪ entailed closure.

    `mine_anchors`: adds a `weblinks` stage that mines the corpus's own
    `<a href>` anchor texts into an alias dictionary
    (operators/weblinks.py — the web's crowd-written entity lexicon) and
    UNIONS it into the link stage's dictionary at top prior: a page that
    links the surface form to a URI is first-hand evidence, so mined
    entries outrank the curated dictionary's priors on collisions.

    `extract_opts`: opt-in extractor branches passed through to
    extract_triples (tables / meta / mf2); enabled flags join the
    pipeline fingerprint so a resume never mixes extractor sets."""
    from .datagen import gen_aliases_pandas, gen_pages_df
    from .extract import dedup_triples, extract_triples, salted_repartition, split_errors
    from .operators.cc import canonicalize, connected_components, sameas_edges
    from .operators.linking import link_exact
    from .types import TRIPLE_KEY

    eo = {k: v for k, v in (extract_opts or {}).items() if v}
    fp = (
        f"pages:{n_pages}:v1"
        + (":inf" if ontology is not None else "")
        + (":anch" if mine_anchors else "")
        + ((":" + ",".join(sorted(eo))) if eo else "")
    )
    pipe = Pipeline(spark, root, fp)

    def s_extract(sp, p):
        pages = salted_repartition(gen_pages_df(sp, n_pages, parts=parts), parts)
        triples, errors = split_errors(extract_triples(pages, **eo))
        return triples.unionByName(errors)

    def s_dedup(sp, p):
        triples, _ = split_errors(p.output("extract"))
        return dedup_triples(triples)

    def s_weblinks(sp, p):
        """Anchor-text alias mining over the SAME page set (deterministic
        regeneration, like s_extract): href extraction → normalized
        anchor → top-1 target per alias. Output is the mined dictionary
        (alias, dst_url, n_links, rank)."""
        from .operators.weblinks import anchor_dictionary, extract_links

        pages = gen_pages_df(sp, n_pages, parts=parts).withColumn(
            "html", F.col("html").cast("string")
        )
        return anchor_dictionary(extract_links(pages), min_count=2, k=1)

    def s_link(sp, p):
        """Entity linking (north rule): string-literal objects of the
        deduped triples are the mention source; the alias dictionary is
        broadcast-joined; winners become `urn:x-ords:mentions` triples
        keyed by source url."""
        triples = p.output("dedup")
        # structured-data literals ARE mention surfaces (schema:name etc.) —
        # no capitalization heuristic needed (that's detect_mentions' job on
        # free text); short literals become candidates directly
        mentions = (
            triples.filter((F.col("o_kind") == 2) & (F.col("o_lex").rlike(r"^[A-Za-z][A-Za-z .'-]{1,60}$")))
            .select(
                F.col("src_url").alias("id"),
                F.col("o_lex").alias("mention"),
                F.lower(F.regexp_replace("o_lex", r"[^A-Za-z0-9 ]", "")).alias("norm"),
            )
            .distinct()
        )
        aliases = sp.createDataFrame(gen_aliases_pandas(500))
        if mine_anchors:
            mined = p.output("weblinks").select(
                F.col("alias"),
                F.col("dst_url").alias("uri"),
                # first-hand corpus evidence outranks every curated prior
                # (gen priors are < 1); deterministic constant, no rand()
                F.lit(0.999999).alias("prior"),
            )
            aliases = aliases.unionByName(mined)
        links = link_exact(mentions, aliases)
        return links.select(
            F.lit(0).cast("tinyint").alias("s_kind"),
            F.col("id").cast("string").alias("s_lex"),
            F.lit("urn:x-ords:mentions").alias("pred"),
            F.lit(0).cast("tinyint").alias("o_kind"),
            F.col("uri").cast("string").alias("o_lex"),
            F.lit(None).cast("string").alias("o_dtype"),
            F.lit(None).cast("string").alias("o_lang"),
            F.col("id").cast("string").alias("graph"),
            F.col("id").cast("string").alias("src_url"),
            F.lit("link").alias("extractor"),
            F.lit(None).cast("int").alias("part_id"),
        ).dropDuplicates(["s_lex", "pred", "o_lex"])

    def s_canonical(sp, p):
        triples = p.output("dedup").unionByName(p.output("link"))
        edges = sameas_edges(triples)
        mapping = connected_components(edges)
        return canonicalize(triples, mapping).dropDuplicates(TRIPLE_KEY)

    def s_infer(sp, p):
        from .operators.owlrl import owl_rl_closure
        from .operators.rdfs import rdfs_closure

        store = p.output("canonical").unionByName(ontology)
        return (
            rdfs_closure(store)
            .unionByName(owl_rl_closure(store))
            .dropDuplicates(TRIPLE_KEY)
        )

    def closure(p):
        base = p.output("canonical")
        if ontology is not None:
            base = base.unionByName(ontology).unionByName(p.output("infer")).dropDuplicates(TRIPLE_KEY)
        return base

    def s_spo(sp, p):
        return closure(p).repartition(parts, "s_lex")

    def s_pos(sp, p):
        return closure(p).repartition(parts, "pred")

    pipe.stage("extract", s_extract).stage("dedup", s_dedup)
    if mine_anchors:
        pipe.stage("weblinks", s_weblinks)
    pipe.stage("link", s_link).stage("canonical", s_canonical)
    if ontology is not None:
        pipe.stage("infer", s_infer)
    return pipe.stage("spo", s_spo, sort_cols=["s_lex", "pred", "o_lex"]).stage(
        "pos", s_pos, sort_cols=["pred", "o_lex", "s_lex"]
    )


# --- incremental delta commits (re-crawl path) -------------------------------


def _latest_version(pdir: str) -> int:
    """Highest committed patch number — robust to retention gaps and the
    `_expired.json` marker (a bare len(listdir) miscounts after expiry)."""
    if not os.path.isdir(pdir):
        return 0
    vs = [int(d[1:]) for d in os.listdir(pdir) if d.startswith("v") and d[1:].isdigit()]
    return max(vs) if vs else 0


def _expiry_horizon(pdir: str) -> int:
    p = os.path.join(pdir, "_expired.json")
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(json.load(f).get("horizon", 0))


def commit_delta(
    spark: SparkSession, root: str, stage: str, new_df: DataFrame, fingerprint: str
) -> dict:
    """Incremental re-commit of a committed quad stage: diff the current
    committed output against `new_df` (operators/delta.graph_diff), write
    the RDF-Patch change set as a VERSIONED patch directory, then commit
    the patched store as the new current output.

    Layout: <root>/<stage>__patches/v<N>/ holds patch N (op '+'/'-'
    quads); <stage>/data/ always holds the latest store. The patch chain gives
    (a) a cheap audit artifact per re-crawl — crawl deltas are sparse, so
    the patch is ≪ the snapshot — and (b) time travel via
    `store_at_version` (replaying INVERTED patches backward from latest).
    At 100 TB the store re-commit becomes Iceberg MERGE at the TableIO
    seam; the patch directory maps to the snapshot's changelog.
    """
    from .operators.delta import graph_diff

    io = TableIO(root)
    old = io.read(spark, stage)
    # materialize BEFORE the overwrite: TableIO.commit rmtrees the stage
    # dir first, and both the patch and (typically) new_df read from it
    patch = graph_diff(old, new_df).localCheckpoint()
    new_mat = new_df.localCheckpoint()
    # the patch chain lives BESIDE the stage dir — commit's atomic
    # replace must never take the history with it
    pdir = os.path.join(root, f"{stage}__patches")
    n_prev = _latest_version(pdir)
    vdir = os.path.join(pdir, f"v{n_prev + 1}")
    patch.write.mode("overwrite").parquet(vdir)
    ops = {r["op"]: r["n"] for r in patch.groupBy("op").agg(F.count(F.lit(1)).alias("n")).collect()}
    marker = io.commit(new_mat, stage, fingerprint)
    marker.update(
        {"patch_version": n_prev + 1, "n_added": ops.get("+", 0), "n_removed": ops.get("-", 0)}
    )
    with open(os.path.join(io.stage_dir(stage), "_SUCCESS.json"), "w") as f:
        json.dump(marker, f)
    return marker


def store_at_version(spark: SparkSession, root: str, stage: str, version: int) -> DataFrame:
    """Time travel: reconstruct the stage's store as of patch `version`
    (0 = the original commit) by applying INVERTED patches backward from
    the latest store — each step two hash anti joins + a union
    (operators/delta.apply_patch/invert_patch), so rolling back k sparse
    re-crawls costs k small joins, never a full-history replay."""
    from .operators.delta import apply_patch, invert_patch

    io = TableIO(root)
    pdir = os.path.join(root, f"{stage}__patches")
    n = _latest_version(pdir)
    if not 0 <= version <= n:
        raise ValueError(f"store_at_version: version {version} not in [0, {n}]")
    horizon = _expiry_horizon(pdir)
    if version < horizon:
        raise ValueError(
            f"store_at_version: version {version} expired (retention horizon {horizon})"
        )
    df = io.read(spark, stage)
    from .types import TRIPLE_KEY

    df = df.select(*TRIPLE_KEY)
    for v in range(n, version, -1):
        patch = spark.read.parquet(os.path.join(pdir, f"v{v}"))
        df = apply_patch(df, invert_patch(patch))
    return df


def expire_versions(root: str, stage: str, keep_last: int = 3) -> dict:
    """Patch-chain retention (the Iceberg `expire_snapshots` maintenance
    op): drop the OLDEST patches so only the latest `keep_last` remain
    reachable, bounding history storage on long-running re-crawl
    pipelines — without retention the chain grows one patch per
    re-crawl forever. Time travel keeps working for versions ≥
    (n - keep_last); older versions become unreachable and
    `store_at_version` refuses them (the horizon is recorded in
    `_expired.json` beside the chain, so the error is precise rather
    than a missing-file crash).

    Pure metadata/filesystem work — no Spark job; the patch dirs ARE
    the snapshots' changelogs, so removal is O(expired patches)."""
    import shutil

    pdir = os.path.join(root, f"{stage}__patches")
    versions = sorted(
        (int(d[1:]) for d in os.listdir(pdir) if d.startswith("v")), reverse=True
    ) if os.path.isdir(pdir) else []
    n = versions[0] if versions else 0
    horizon = max(0, n - max(0, keep_last))
    expired = [v for v in versions if v <= horizon]
    for v in expired:
        shutil.rmtree(os.path.join(pdir, f"v{v}"), ignore_errors=True)
    meta = {"stage": stage, "latest": n, "horizon": horizon, "expired": sorted(expired)}
    if os.path.isdir(pdir):
        with open(os.path.join(pdir, "_expired.json"), "w") as f:
            json.dump(meta, f)
    return meta


PROV_NS = "http://www.w3.org/ns/prov#"
ORDS_NS = "urn:x-ords:"


def lineage_to_prov(
    lineage: DataFrame, run_id: str, stage_order: Optional[list] = None
) -> DataFrame:
    """Emit the pipeline's own lineage table as W3C PROV-O triples — the
    provenance the KG publishes about ITSELF (north rule: 'per-partition
    lineage + metrics tables'; PROV-O is how the RDF ecosystem around
    the reference exchanges that metadata). Per stage:

      urn:x-ords:run:{run}:act:{stage}   a prov:Activity
      urn:x-ords:run:{run}:data:{stage}  a prov:Entity ;
        prov:wasGeneratedBy the activity ;
        urn:x-ords:rowCount  Σ row_count  (xsd:integer) ;
        urn:x-ords:partCount COUNT(part)  (xsd:integer)

    and, when `stage_order` (the driver-side stage list — config, not
    data) is given, prov:wasDerivedFrom / prov:used edges chain each
    stage to its predecessor.

    Scale: the lineage table is parts × stages rows (metadata); one
    stage-keyed agg + a constant-width melt (relational.py's explode
    pattern) + a driver-built derivation frame. Output matches the
    TRIPLES quad columns used by the serializers."""
    per_stage = lineage.groupBy("stage").agg(
        F.sum("row_count").alias("n_rows"), F.count(F.lit(1)).alias("n_parts")
    )
    act = F.concat(F.lit(f"{ORDS_NS}run:{run_id}:act:"), F.col("stage"))
    ent = F.concat(F.lit(f"{ORDS_NS}run:{run_id}:data:"), F.col("stage"))
    xsd_int = "http://www.w3.org/2001/XMLSchema#integer"
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    items = [
        (act, F.lit(rdf_type), 0, F.lit(PROV_NS + "Activity"), None),
        (ent, F.lit(rdf_type), 0, F.lit(PROV_NS + "Entity"), None),
        (ent, F.lit(PROV_NS + "wasGeneratedBy"), 0, act, None),
        (ent, F.lit(ORDS_NS + "rowCount"), 2, F.col("n_rows").cast("string"), xsd_int),
        (ent, F.lit(ORDS_NS + "partCount"), 2, F.col("n_parts").cast("string"), xsd_int),
    ]
    structs = [
        F.struct(
            s.alias("s_lex"),
            p.alias("pred"),
            F.lit(k).cast("tinyint").alias("o_kind"),
            o.cast("string").alias("o_lex"),
            F.lit(dt).cast("string").alias("o_dtype"),
        )
        for s, p, k, o, dt in items
    ]
    out = per_stage.select(F.explode(F.array(*structs)).alias("t")).select(
        F.lit(0).cast("tinyint").alias("s_kind"),
        F.col("t.s_lex").alias("s_lex"),
        F.col("t.pred").alias("pred"),
        F.col("t.o_kind").alias("o_kind"),
        F.col("t.o_lex").alias("o_lex"),
        F.col("t.o_dtype").alias("o_dtype"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit(f"{ORDS_NS}run:{run_id}:prov").alias("graph"),
    )
    if stage_order and len(stage_order) > 1:
        spark = lineage.sparkSession
        chain = [
            (
                f"{ORDS_NS}run:{run_id}:data:{cur}",
                PROV_NS + "wasDerivedFrom",
                f"{ORDS_NS}run:{run_id}:data:{prev}",
            )
            for prev, cur in zip(stage_order, stage_order[1:])
        ] + [
            (
                f"{ORDS_NS}run:{run_id}:act:{cur}",
                PROV_NS + "used",
                f"{ORDS_NS}run:{run_id}:data:{prev}",
            )
            for prev, cur in zip(stage_order, stage_order[1:])
        ]
        cdf = spark.createDataFrame(chain, "s_lex string, pred string, o_lex string").select(
            F.lit(0).cast("tinyint").alias("s_kind"),
            "s_lex",
            "pred",
            F.lit(0).cast("tinyint").alias("o_kind"),
            "o_lex",
            F.lit(None).cast("string").alias("o_dtype"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit(f"{ORDS_NS}run:{run_id}:prov").alias("graph"),
        )
        out = out.unionByName(cdf)
    return out
