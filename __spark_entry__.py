"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json). Fill these in
as you implement operators from SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG-construction spine (SURVEY §7 minimum slice) — generate
    a deterministic Common-Crawl-style corpus, run the vectorized extraction
    stage (JSON-LD/RDFa/microdata/Turtle/N-Triples), dedup with set
    semantics, and return top predicates by triple count joined against the
    sf0.001 documents table's language profile."""
    from pyspark.sql import functions as F

    from ocaml_rdf_spark.datagen import gen_pages_df
    from ocaml_rdf_spark.extract import extract_triples, salted_repartition, split_errors
    from ocaml_rdf_spark.types import TRIPLE_KEY

    pages = salted_repartition(gen_pages_df(spark, 200, parts=4), 8)
    triples, _errors = split_errors(extract_triples(pages))
    deduped = triples.dropDuplicates(TRIPLE_KEY)
    top = (
        deduped.groupBy("pred")
        .agg(F.count(F.lit(1)).alias("n_triples"), F.countDistinct("s_lex").alias("n_subjects"))
        .orderBy(F.desc("n_triples"), F.asc("pred"))
        .limit(20)
    )
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n_docs = docs.count()
    return top.withColumn("corpus_docs", F.lit(n_docs))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Alias every computed/aggregate column so names match ``oracle_sql``.
    """
    return {}


def oracle_sql() -> dict[str, str]:
    """For each key in ``queries()``, equivalent ANSI SQL runnable by
    DuckDB on the same parquet tables (pre-registered views: region
    nation customer supplier part orders lineitem events documents
    embeddings). Omit for non-SQL-expressible ops → driver records a
    weaker rows-only check.
    """
    return {}
