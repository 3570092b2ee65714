"""KG mining & repair: horn-rule mining, cannot-link canonicalization,
context-embedding entity disambiguation.

After extraction + linking + canonicalization, a KG-construction
pipeline (north rule: triple extraction → linking → canonicalization →
materialize) runs three more enrichment/repair stages that the
reference's graph model makes expressible but does not ship as
operators (SURVEY §2.5 covers CC/linking; these sit beside them):

- **Rule mining** (AMIE family — Galárraga et al., "AMIE: Association
  Rule Mining under Incomplete Evidence", WWW 2013): mine horn rules
  `p(x,y) ⇒ q(x,y)` and `p(x,z) ∧ q(z,y) ⇒ r(x,y)` with support and
  confidence from the triple store itself. Used both to *complete* the
  KG (apply high-confidence rules) and to *sanity-check* extractors
  (a rule whose confidence collapses after a crawl flags a regression).
- **Cannot-link constrained components** (collective entity resolution
  with negative evidence — Bhattacharya & Getoor, TKDD 2007): sameAs
  CC, except two nodes carrying DIFFERENT authoritative identifiers
  (e.g. distinct wikidata QIDs, distinct VAT numbers) must never land
  in one cluster. The repair is edge-level and deterministic: drop
  every sameAs edge whose endpoints carry conflicting non-null strong
  ids, then run the standard large/small-star CC (operators/cc.py).
- **Context disambiguation** (alias → many candidate URIs): rank each
  mention's candidates by `prior × ⟨context-embedding, entity-
  embedding⟩` and keep the argmax — the classic local-compatibility
  linker (Milne & Witten commonness×relatedness shape), expressed as a
  broadcast join + vectorized dot product (operators/ann.py idiom).

Spark shape at 10^12 triples:

- rule mining is join-bound: pair tables are deduped *first* (distinct
  (s,o) per predicate — one map-side-combined shuffle), per-predicate
  cardinalities are computed once and broadcast, and predicate pairs
  below `min_body` are pruned BEFORE the z-join (the AMIE support
  prune — without it the path-body join is |store|² on hub predicates).
  The z-join shuffles on the join entity; hub-z skew is the same shape
  as the CC star skew and is bounded by `max_fanout` (drop z nodes
  whose p-fanout × q-fanout exceeds the cap — documented, counted).
- constrained CC adds two hash joins (edge endpoints × id table, both
  keyed on the node) in front of the audited CC fixpoint; the id table
  is entity-keyed metadata, shuffle-joined, never collected.
- disambiguation broadcasts the candidate table (alias dictionary ×
  small per-alias candidate fanout — dictionary-sized, the link_exact
  broadcast argument), computes the dot product JVM-side with
  F.zip_with/F.aggregate (bit-identical left fold, ann.py), and picks
  the argmax with one map-side-combinable min_by — no window shuffle.

No Python in the loop anywhere: built-in pyspark.sql.functions only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ann import _dot
from .cc import connected_components

PPM = 1_000_000


def _pair_table(triples: DataFrame) -> DataFrame:
    """Distinct (p, s, o) assertion pairs — set semantics, mirroring
    add_triple (rdf_graph.ml :: add_triple, SURVEY §2.1)."""
    return triples.select("p", "s", "o").dropDuplicates()


def mine_same_pair_rules(triples: DataFrame, min_body: int = 2) -> DataFrame:
    """Rules `p(x,y) ⇒ q(x,y)` → (body_p, head_p, body_n, support,
    conf_ppm). `body_n` = |distinct (x,y) asserting p|, `support` =
    |pairs asserting both|, confidence = support/body_n in exact ppm.

    One self-equi-join on the (s,o) pair key: pairs are deduped first,
    predicates below `min_body` pruned before the join via a broadcast
    per-predicate count."""
    pairs = _pair_table(triples)
    cnt = pairs.groupBy("p").agg(F.count(F.lit(1)).alias("body_n"))
    keep = cnt.filter(F.col("body_n") >= min_body)
    # min_body prunes the BODY side only — a rare predicate is still a
    # legitimate rule HEAD (that's precisely the completion case)
    pruned = pairs.join(F.broadcast(keep.select("p")), "p")
    a = pruned.select(F.col("p").alias("body_p"), "s", "o")
    b = pairs.select(F.col("p").alias("head_p"), "s", "o")
    sup = (
        a.join(b, ["s", "o"])
        .filter(F.col("body_p") != F.col("head_p"))
        .groupBy("body_p", "head_p")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return sup.join(
        F.broadcast(keep.withColumnRenamed("p", "body_p")), "body_p"
    ).select(
        "body_p",
        "head_p",
        "body_n",
        "support",
        F.expr(f"support * {PPM} div body_n").alias("conf_ppm"),
    )


def mine_path_rules(
    triples: DataFrame,
    min_body: int = 2,
    min_support: int = 1,
    max_fanout: int | None = None,
) -> DataFrame:
    """Rules `p(x,z) ∧ q(z,y) ⇒ r(x,y)` → (body_p, body_q, head_p,
    body_n, support, conf_ppm).

    body = distinct (x,y) reachable via some z (deduped AFTER the
    z-join: multiple witnesses count once, per AMIE); support counts
    body pairs also asserted under r. `max_fanout` drops hub join
    entities z whose in×out fanout product exceeds the cap (skew guard
    for 100×; None = exact)."""
    pairs = _pair_table(triples)
    cnt = pairs.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    keep = F.broadcast(cnt.filter(F.col("n") >= min_body).select("p"))
    pruned = pairs.join(keep, "p")
    left = pruned.select(F.col("p").alias("body_p"), F.col("s").alias("x"), F.col("o").alias("z"))
    right = pruned.select(F.col("p").alias("body_q"), F.col("s").alias("z"), F.col("o").alias("y"))
    if max_fanout is not None:
        zf = (
            left.groupBy("z").agg(F.count(F.lit(1)).alias("fo"))
            .join(right.groupBy("z").agg(F.count(F.lit(1)).alias("fi")), "z")
            .filter(F.col("fo") * F.col("fi") <= max_fanout)
            .select("z")
        )
        left = left.join(zf, "z", "left_semi")
        right = right.join(zf, "z", "left_semi")
    body = (
        left.join(right, "z")
        .select("body_p", "body_q", "x", "y")
        .dropDuplicates()
    )
    body_n = body.groupBy("body_p", "body_q").agg(F.count(F.lit(1)).alias("body_n"))
    heads = pairs.select(F.col("p").alias("head_p"), F.col("s").alias("x"), F.col("o").alias("y"))
    sup = (
        body.join(heads, ["x", "y"])
        .groupBy("body_p", "body_q", "head_p")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    return sup.join(body_n, ["body_p", "body_q"]).select(
        "body_p",
        "body_q",
        "head_p",
        "body_n",
        "support",
        F.expr(f"support * {PPM} div body_n").alias("conf_ppm"),
    )


def constrained_components(
    edges: DataFrame,
    ids: DataFrame,
    max_iter: int = 30,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Cannot-link CC: `edges(src, dst)` sameAs graph, `ids(node, sid)`
    strong identifiers (nullable / partial). Every edge whose endpoints
    carry DIFFERENT non-null sids is dropped, then standard CC runs →
    (node, component). Nodes with a null sid merge freely (no negative
    evidence), matching the constrained-clustering literature.

    Note the repair is deliberately edge-local (not post-hoc cluster
    splitting): deterministic, one pass, and safe under re-runs —
    cluster-level splitting depends on traversal order and is not
    reproducible across partitionings."""
    sid = ids.select("node", "sid").dropDuplicates(["node"])
    e = (
        edges.select("src", "dst")
        .join(sid.select(F.col("node").alias("src"), F.col("sid").alias("sid_a")), "src", "left")
        .join(sid.select(F.col("node").alias("dst"), F.col("sid").alias("sid_b")), "dst", "left")
        .filter(
            F.col("sid_a").isNull()
            | F.col("sid_b").isNull()
            | (F.col("sid_a") == F.col("sid_b"))
        )
        .select("src", "dst")
    )
    return connected_components(e, max_iter=max_iter, driver_threshold=driver_threshold)


def disambiguate_mentions(mentions: DataFrame, candidates: DataFrame) -> DataFrame:
    """`mentions(mention_id, alias, context: array<float>)` ×
    `candidates(alias, uri, prior_ppm, emb: array<float>)` →
    (mention_id, uri, score) keeping the argmax of
    `score = prior_ppm × ⟨context, emb⟩` per mention (ties broken by
    lexicographically smallest uri — deterministic).

    Candidate table is broadcast (alias dictionary-sized); the argmax
    is a single map-side-combinable min_by over a (−score, uri) sort
    key — no window, no second shuffle."""
    scored = mentions.join(F.broadcast(candidates), "alias").select(
        "mention_id",
        "uri",
        (F.col("prior_ppm").cast("double") * _dot(F.col("context"), F.col("emb"))).alias("score"),
    )
    return (
        scored.groupBy("mention_id")
        .agg(
            F.min_by(
                F.struct("uri", "score"), F.struct(-F.col("score"), F.col("uri"))
            ).alias("best")
        )
        .select("mention_id", F.col("best.uri").alias("uri"), F.col("best.score").alias("score"))
    )
