"""Property tables: star-shaped BGPs as ONE pivot instead of k self-joins.

The classic RDF physical-design alternative to a single triples table
(Abadi et al., "Scalable Semantic Web Data Management Using Vertical
Partitioning", VLDB 2007; Jena2 property tables, Wilkinson 2006): subjects
of a class are laid out one-row-per-subject with a column per predicate.
A k-predicate star pattern — the dominant query shape in entity-centric
KGs — then costs ONE pred-pruned scan + ONE subject-keyed shuffle,
instead of k scans and k−1 self-joins of the store.

The reference evaluates patterns per-triple in memory (`rdf_sparql_eval
.ml`, SURVEY §3 EP1); this is the layout that makes the same star cheap
distributed. Scale notes:

- the `pred IN (...)` filter reaches the parquet scan (PushedFilters) —
  on the POS-sorted store (relational.py) that prunes to the row groups
  of exactly the pivoted predicates;
- `groupBy(s).pivot(pred, [known values])` with explicit values skips
  Spark's extra distinct-discovery pass and compiles to ONE partial+final
  hash aggregation — the only shuffle, keyed by subject;
- the optional class guard is a subject-keyed semi-join (same key as the
  pivot: co-partitioned, no second shuffle shape at scale with AQE);
- single-valued predicates take `min(o_lex)` (deterministic under set
  semantics); multi-valued predicates belong in the triples table, not a
  property table — the 2007 paper's own boundary."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..types import RDF_TYPE


def subject_table(quads: DataFrame, preds: dict[str, str], cls: str | None = None) -> DataFrame:
    """(s, <alias per predicate>) property table. `preds` maps output
    column alias → predicate IRI; `cls` restricts subjects to instances
    of an rdf:type class IRI. Missing values are NULL columns."""
    f = quads.filter(F.col("pred").isin(list(preds.values())))
    if cls is not None:
        subjects = quads.filter(
            (F.col("pred") == RDF_TYPE) & (F.col("o_kind") == 0) & (F.col("o_lex") == cls)
        ).select("s_lex")
        f = f.join(subjects, "s_lex", "left_semi")
    pivoted = (
        f.groupBy(F.col("s_lex").alias("s"))
        .pivot("pred", list(preds.values()))
        .agg(F.min("o_lex"))
    )
    return pivoted.select("s", *[F.col(f"`{p}`").alias(a) for a, p in preds.items()])
