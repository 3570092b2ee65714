"""Relational → RDF triple view over the driver's TPC-H-ish parquet tables.

Purpose: a *deterministic, engine-independent* quad corpus for the
correctness gate. The same logical mapping is defined twice — once as a
scan-once Spark DataFrame melt (`triples_view`), once as a DuckDB SQL CTE
(`TRIPLES_CTE`) — so every SPARQL-algebra operator (SURVEY §2.3) can be
cross-checked value-for-value against a second engine.

This mirrors the reference's "direct mapping" idea (relational rows →
triples; cf. W3C RDB2RDF Direct Mapping, which ocaml-rdf-era tooling
consumed via rdf_graph.ml :: add_triple loops): each row becomes a
subject IRI, each column a predicate, with FK columns emitted as object
IRIs and value columns as typed literals.

Scale notes:
- one scan per source table (explode of a literal struct array — no
  shuffle, no UDF, stays in whole-stage codegen);
- money lands as integer cents (exact, engine-portable — no double
  formatting drift), dates as ISO strings typed xsd:date;
- at 100 TB the same melt runs unchanged: it is embarrassingly parallel
  and Parquet column pruning reads only the melted columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .types import RDF_TYPE, XSD_INTEGER, XSD_NS, XSD_STRING

# vocabulary ----------------------------------------------------------------
C = "urn:c:"  # classes
P = "urn:p:"  # predicates
G = "urn:g:"  # named graphs (one per source table)
XSD_DATE = XSD_NS + "date"

P_NAME = P + "name"
P_IN_REGION = P + "inRegion"
P_IN_NATION = P + "inNation"
P_ACCTBAL = P + "acctbal"  # integer cents
P_SEGMENT = P + "segment"
P_CUSTOMER = P + "customer"
P_STATUS = P + "status"
P_PRICE = P + "price"  # integer cents
P_ODATE = P + "odate"
P_PRIORITY = P + "priority"

IRI_KIND = 0
LIT_KIND = 2


def _cents(col: F.Column) -> F.Column:
    return F.round(col * 100).cast("long").cast("string")


def _melt(df: DataFrame, s_lex: F.Column, graph: str, items: list) -> DataFrame:
    """items: (pred, o_kind, o_lex Column, o_dtype|None). One scan, no UDF."""
    structs = [
        F.struct(
            F.lit(p).alias("pred"),
            F.lit(k).cast("tinyint").alias("o_kind"),
            olex.cast("string").alias("o_lex"),
            F.lit(dt).cast("string").alias("o_dtype"),
        )
        for p, k, olex, dt in items
    ]
    return df.select(s_lex.cast("string").alias("s_lex"), F.explode(F.array(*structs)).alias("t")).select(
        F.lit(0).cast("tinyint").alias("s_kind"),
        "s_lex",
        F.col("t.pred").alias("pred"),
        F.col("t.o_kind").alias("o_kind"),
        F.col("t.o_lex").alias("o_lex"),
        F.col("t.o_dtype").alias("o_dtype"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit(graph).alias("graph"),
        F.lit(None).cast("string").alias("src_url"),
        F.lit("relational").alias("extractor"),
        F.lit(None).cast("int").alias("part_id"),
    )


#: materialized POS-ordered triple stores, keyed (applicationId, sf_dir)
_STORE_CACHE: dict = {}
_STORE_LOCK = __import__("threading").Lock()


def triples_view(spark: SparkSession, sf_dir: str, materialize: bool = True) -> DataFrame:
    """Quad DataFrame (TRIPLES schema) over region/nation/customer/
    supplier/orders. Deterministic; mirrored by TRIPLES_CTE.

    With `materialize` (default), the melt is written ONCE per session to a
    pred-clustered, (pred, s_lex)-sorted parquet store and every query
    reads that — the local stand-in for the north rule's POS-sorted Iceberg
    copy (`WRITE ORDERED BY pred, s_lex`). A bound-predicate triple-pattern
    scan then prunes to the files/row-groups holding that predicate
    (PushedFilters on pred + min/max stats) instead of re-melting all five
    source tables per pattern — a 6-pattern BGP goes from 30 table scans to
    6 pruned store reads. At 100 TB this is exactly the SPO/POS table the
    pipeline materializes (SURVEY §2.1 in-memory-indexes row).
    """
    if materialize:
        # Fixed per-sf cache path (not a fresh mkdtemp per session): repeated
        # sessions reuse one store instead of leaking a copy per run, and the
        # lock + write-to-temp-then-rename makes concurrent first calls share
        # a single write (the losing writer's dir is discarded).
        import hashlib
        import os
        import shutil
        import tempfile

        key = (spark.sparkContext.applicationId, sf_dir)
        with _STORE_LOCK:
            cached = _STORE_CACHE.get(key)
            if cached is not None:
                return cached
            # staleness tag = fingerprint over EVERY source parquet file's
            # (path, mtime, size) — regenerating any table invalidates the
            # store, not just orders.parquet
            h = hashlib.sha1(os.path.abspath(sf_dir).encode())
            for root, _dirs, files in sorted(os.walk(sf_dir)):
                for fn in sorted(files):
                    if fn.endswith(".parquet") or fn == "_SUCCESS":
                        fp = os.path.join(root, fn)
                        st = os.stat(fp)
                        h.update(f"|{fp}|{int(st.st_mtime)}|{st.st_size}".encode())
            tag = h.hexdigest()[:12]
            # per-user 0700 cache root: a shared system tempdir path is
            # pre-creatable/poisonable by other local users
            cache_root = os.path.join(
                tempfile.gettempdir(), f"ords_pos_cache_{os.getuid()}"
            )
            os.makedirs(cache_root, mode=0o700, exist_ok=True)
            os.chmod(cache_root, 0o700)
            path = os.path.join(cache_root, f"store_{tag}")
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                tmp = tempfile.mkdtemp(prefix="ords_pos_store_tmp_")
                (
                    triples_view(spark, sf_dir, materialize=False)
                    .repartition(8, F.col("pred"))
                    .sortWithinPartitions("pred", "s_lex")
                    .write.mode("overwrite")
                    .parquet(tmp)
                )
                try:
                    os.rename(tmp, path)  # atomic publish
                except OSError:  # another process won the race
                    shutil.rmtree(tmp, ignore_errors=True)
            df = spark.read.parquet(path)
            _STORE_CACHE[key] = df
            return df

    rd = lambda t: spark.read.parquet(f"{sf_dir}/{t}.parquet")  # noqa: E731

    region = _melt(
        rd("region"),
        F.concat(F.lit("urn:r:"), F.col("r_regionkey")),
        G + "region",
        [
            (RDF_TYPE, IRI_KIND, F.lit(C + "Region"), None),
            (P_NAME, LIT_KIND, F.col("r_name"), XSD_STRING),
        ],
    )
    nation = _melt(
        rd("nation"),
        F.concat(F.lit("urn:n:"), F.col("n_nationkey")),
        G + "nation",
        [
            (RDF_TYPE, IRI_KIND, F.lit(C + "Nation"), None),
            (P_NAME, LIT_KIND, F.col("n_name"), XSD_STRING),
            (P_IN_REGION, IRI_KIND, F.concat(F.lit("urn:r:"), F.col("n_regionkey")), None),
        ],
    )
    customer = _melt(
        rd("customer"),
        F.concat(F.lit("urn:cu:"), F.col("c_custkey")),
        G + "customer",
        [
            (RDF_TYPE, IRI_KIND, F.lit(C + "Customer"), None),
            (P_NAME, LIT_KIND, F.col("c_name"), XSD_STRING),
            (P_IN_NATION, IRI_KIND, F.concat(F.lit("urn:n:"), F.col("c_nationkey")), None),
            (P_ACCTBAL, LIT_KIND, _cents(F.col("c_acctbal")), XSD_INTEGER),
            (P_SEGMENT, LIT_KIND, F.col("c_mktsegment"), XSD_STRING),
        ],
    )
    supplier = _melt(
        rd("supplier"),
        F.concat(F.lit("urn:su:"), F.col("s_suppkey")),
        G + "supplier",
        [
            (RDF_TYPE, IRI_KIND, F.lit(C + "Supplier"), None),
            (P_NAME, LIT_KIND, F.col("s_name"), XSD_STRING),
            (P_IN_NATION, IRI_KIND, F.concat(F.lit("urn:n:"), F.col("s_nationkey")), None),
            (P_ACCTBAL, LIT_KIND, _cents(F.col("s_acctbal")), XSD_INTEGER),
        ],
    )
    orders = _melt(
        rd("orders"),
        F.concat(F.lit("urn:o:"), F.col("o_orderkey")),
        G + "orders",
        [
            (RDF_TYPE, IRI_KIND, F.lit(C + "Order"), None),
            (P_CUSTOMER, IRI_KIND, F.concat(F.lit("urn:cu:"), F.col("o_custkey")), None),
            (P_STATUS, LIT_KIND, F.col("o_orderstatus"), XSD_STRING),
            (P_PRICE, LIT_KIND, _cents(F.col("o_totalprice")), XSD_INTEGER),
            (P_ODATE, LIT_KIND, F.date_format("o_orderdate", "yyyy-MM-dd"), XSD_DATE),
            (P_PRIORITY, LIT_KIND, F.col("o_orderpriority"), XSD_STRING),
        ],
    )
    out = region
    for part in (nation, customer, supplier, orders):
        out = out.unionByName(part)
    return out


# DuckDB mirror of triples_view: columns s_lex, pred, o_kind, o_lex,
# o_dtype, graph (s_kind is always 0, o_lang always NULL here).
TRIPLES_CTE = f"""
triples AS (
  SELECT 'urn:r:'||r_regionkey AS s_lex, '{RDF_TYPE}' AS pred, 0 AS o_kind,
         'urn:c:Region' AS o_lex, NULL AS o_dtype, 'urn:g:region' AS graph FROM region
  UNION ALL SELECT 'urn:r:'||r_regionkey, '{P_NAME}', 2, r_name, '{XSD_STRING}', 'urn:g:region' FROM region
  UNION ALL SELECT 'urn:n:'||n_nationkey, '{RDF_TYPE}', 0, 'urn:c:Nation', NULL, 'urn:g:nation' FROM nation
  UNION ALL SELECT 'urn:n:'||n_nationkey, '{P_NAME}', 2, n_name, '{XSD_STRING}', 'urn:g:nation' FROM nation
  UNION ALL SELECT 'urn:n:'||n_nationkey, '{P_IN_REGION}', 0, 'urn:r:'||n_regionkey, NULL, 'urn:g:nation' FROM nation
  UNION ALL SELECT 'urn:cu:'||c_custkey, '{RDF_TYPE}', 0, 'urn:c:Customer', NULL, 'urn:g:customer' FROM customer
  UNION ALL SELECT 'urn:cu:'||c_custkey, '{P_NAME}', 2, c_name, '{XSD_STRING}', 'urn:g:customer' FROM customer
  UNION ALL SELECT 'urn:cu:'||c_custkey, '{P_IN_NATION}', 0, 'urn:n:'||c_nationkey, NULL, 'urn:g:customer' FROM customer
  UNION ALL SELECT 'urn:cu:'||c_custkey, '{P_ACCTBAL}', 2, CAST(CAST(round(c_acctbal*100) AS BIGINT) AS VARCHAR), '{XSD_INTEGER}', 'urn:g:customer' FROM customer
  UNION ALL SELECT 'urn:cu:'||c_custkey, '{P_SEGMENT}', 2, c_mktsegment, '{XSD_STRING}', 'urn:g:customer' FROM customer
  UNION ALL SELECT 'urn:su:'||s_suppkey, '{RDF_TYPE}', 0, 'urn:c:Supplier', NULL, 'urn:g:supplier' FROM supplier
  UNION ALL SELECT 'urn:su:'||s_suppkey, '{P_NAME}', 2, s_name, '{XSD_STRING}', 'urn:g:supplier' FROM supplier
  UNION ALL SELECT 'urn:su:'||s_suppkey, '{P_IN_NATION}', 0, 'urn:n:'||s_nationkey, NULL, 'urn:g:supplier' FROM supplier
  UNION ALL SELECT 'urn:su:'||s_suppkey, '{P_ACCTBAL}', 2, CAST(CAST(round(s_acctbal*100) AS BIGINT) AS VARCHAR), '{XSD_INTEGER}', 'urn:g:supplier' FROM supplier
  UNION ALL SELECT 'urn:o:'||o_orderkey, '{RDF_TYPE}', 0, 'urn:c:Order', NULL, 'urn:g:orders' FROM orders
  UNION ALL SELECT 'urn:o:'||o_orderkey, '{P_CUSTOMER}', 0, 'urn:cu:'||o_custkey, NULL, 'urn:g:orders' FROM orders
  UNION ALL SELECT 'urn:o:'||o_orderkey, '{P_STATUS}', 2, o_orderstatus, '{XSD_STRING}', 'urn:g:orders' FROM orders
  UNION ALL SELECT 'urn:o:'||o_orderkey, '{P_PRICE}', 2, CAST(CAST(round(o_totalprice*100) AS BIGINT) AS VARCHAR), '{XSD_INTEGER}', 'urn:g:orders' FROM orders
  UNION ALL SELECT 'urn:o:'||o_orderkey, '{P_ODATE}', 2, strftime(o_orderdate, '%Y-%m-%d'), '{XSD_DATE}', 'urn:g:orders' FROM orders
  UNION ALL SELECT 'urn:o:'||o_orderkey, '{P_PRIORITY}', 2, o_orderpriority, '{XSD_STRING}', 'urn:g:orders' FROM orders
)
""".strip()
