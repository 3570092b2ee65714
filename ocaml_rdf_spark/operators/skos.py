"""SKOS vocabulary audit — integrity checks over skos:broader /
skos:narrower / label triples, the taxonomy-hygiene pass every
KG-construction pipeline runs before publishing a concept scheme.

The reference models vocabularies as plain graphs (SURVEY §2.1;
/root/reference is empty per §0), so the normative sources are the W3C
SKOS Reference (2009) integrity conditions plus the qSKOS quality-issue
catalogue (Mader et al., public):

- ``broader_cycle``   — concept reachable from itself through
  skos:broader⁺ (qSKOS "hierarchical cycle"; spec demands broader be a
  strict hierarchy).
- ``multiple_pref_label`` — more than one skos:prefLabel in one language
  (SKOS Reference S14).
- ``label_clash``     — the same (language, lexical form) appears as both
  prefLabel and altLabel of a concept (S13: pairwise-disjoint label
  properties).
- ``top_with_broader`` — a top concept (skos:topConceptOf /
  skos:hasTopConcept) that still has a skos:broader arc (qSKOS "top
  concept having broader concept").
- ``orphan``          — a skos:Concept with no semantic relation at all
  (no broader / narrower / related in either direction; qSKOS "orphan
  concept").

Scale shape: ontologies are catalog-sized — they do NOT grow with the
corpus (same documented tier as scc_cycles / bisim_summary). The cycle
check reuses paths.transitive_closure (frontier rounds escalating to
path doubling, O(log diameter)); every other check is one label-keyed
aggregation or a hash anti/semi join. Nothing here touches the
document corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..types import KIND_IRI, RDF_TYPE
from .paths import transitive_closure

SKOS = "http://www.w3.org/2004/02/skos/core#"


def _p(local: str) -> str:
    return SKOS + local


def skos_audit(quads: DataFrame, max_iter: int = 50) -> DataFrame:
    """→ (concept, issue, detail), one row per detected quality issue.

    `quads`: TRIPLES-schema frame holding the concept scheme (callers
    normally pre-filter to the scheme's graph — the audit only reads
    skos:* predicates and rdf:type arcs either way).
    """
    iri_s = F.col("s_kind") == KIND_IRI

    def of_pred(*preds):
        return quads.filter(F.col("pred").isin(*preds) & iri_s)

    # broader edges, both orientations folded in (narrower is the inverse)
    broader = (
        of_pred(_p("broader"))
        .select(F.col("s_lex").alias("src"), F.col("o_lex").alias("dst"))
        .unionByName(
            of_pred(_p("narrower")).select(
                F.col("o_lex").alias("src"), F.col("s_lex").alias("dst")
            )
        )
        .distinct()
    )

    closure = transitive_closure(broader, max_iter=max_iter)
    cycles = (
        closure.filter(F.col("src") == F.col("dst"))
        .select(
            F.col("src").alias("concept"),
            F.lit("broader_cycle").alias("issue"),
            F.lit("skos:broader reaches itself").alias("detail"),
        )
        .distinct()
    )

    pref = of_pred(_p("prefLabel")).select(
        F.col("s_lex").alias("concept"),
        F.coalesce(F.col("o_lang"), F.lit("")).alias("lang"),
        F.col("o_lex").alias("lex"),
    )
    multi_pref = (
        pref.groupBy("concept", "lang")
        .agg(F.count_distinct("lex").alias("n"))
        .filter(F.col("n") > 1)
        .select(
            "concept",
            F.lit("multiple_pref_label").alias("issue"),
            F.concat(F.col("n").cast("string"), F.lit(" prefLabels@"), F.col("lang")).alias("detail"),
        )
    )

    alt = of_pred(_p("altLabel")).select(
        F.col("s_lex").alias("concept"),
        F.coalesce(F.col("o_lang"), F.lit("")).alias("lang"),
        F.col("o_lex").alias("lex"),
    )
    clash = (
        pref.join(alt, ["concept", "lang", "lex"], "inner")
        .select(
            "concept",
            F.lit("label_clash").alias("issue"),
            F.concat(F.lit("pref=alt '"), F.col("lex"), F.lit("'@"), F.col("lang")).alias("detail"),
        )
        .distinct()
    )

    tops = (
        of_pred(_p("topConceptOf"))
        .select(F.col("s_lex").alias("concept"))
        .unionByName(of_pred(_p("hasTopConcept")).select(F.col("o_lex").alias("concept")))
        .distinct()
    )
    top_broader = (
        tops.join(broader.select(F.col("src").alias("concept")).distinct(), "concept", "inner")
        .select(
            "concept",
            F.lit("top_with_broader").alias("issue"),
            F.lit("top concept has skos:broader").alias("detail"),
        )
    )

    concepts = (
        quads.filter((F.col("pred") == RDF_TYPE) & (F.col("o_lex") == _p("Concept")) & iri_s)
        .select(F.col("s_lex").alias("concept"))
        .distinct()
    )
    related = of_pred(_p("related"))
    linked = (
        broader.select(F.col("src").alias("concept"))
        .unionByName(broader.select(F.col("dst").alias("concept")))
        .unionByName(related.select(F.col("s_lex").alias("concept")))
        .unionByName(related.select(F.col("o_lex").alias("concept")))
        .distinct()
    )
    orphans = concepts.join(linked, "concept", "left_anti").select(
        "concept",
        F.lit("orphan").alias("issue"),
        F.lit("no semantic relations").alias("detail"),
    )

    return (
        cycles.unionByName(multi_pref)
        .unionByName(clash)
        .unionByName(top_broader)
        .unionByName(orphans)
    )
