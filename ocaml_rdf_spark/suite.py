"""The driver-contract query suite: every implemented operator from
SURVEY.md §2 (+ the training-data operators) as a `(spark, sf_dir) →
DataFrame` callable paired with an equivalent DuckDB ANSI-SQL oracle.

Registry: `QUERIES[name] = (fn, oracle_sql_or_None)`. Consumed by
`__spark_entry__.py :: queries()/oracle_sql()` and by the local parity
test (tests/test_oracle_parity.py), which runs the same comparison the
driver runs, before the driver does.

Conventions that make cross-engine value-hashing exact (see textops.py
docstring): integers not doubles, md5 not xxhash, lexicographic mins,
explicit tiebreakers under every LIMIT, `CAST(… AS VARCHAR)` wherever the
Spark side is a flattened term lexical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .algebra import (
    Agg,
    BGP,
    Ctx,
    Distinct,
    Filter,
    GraphNode,
    Group,
    LeftJoin,
    Minus,
    OrderBy,
    Project,
    Slice,
    Template,
    TriplePattern as T_,
    UnionNode,
    Values,
    Var,
    construct,
    flatten,
    select,
)
from .functions.builtins import CONTAINS, L, STRLEN, STRSTARTS, SUBSTR, UCASE, V
from .operators.paths import Alt, Inv, P as PP, PathPattern, Plus, Seq
from .relational import (
    P_ACCTBAL,
    P_CUSTOMER,
    P_IN_NATION,
    P_IN_REGION,
    P_NAME,
    P_PRIORITY,
    P_SEGMENT,
    TRIPLES_CTE,
    triples_view,
)
from .types import RDF_TYPE, BNode, Iri, Literal

W = f"WITH {TRIPLES_CTE}"
VS = Var("s")
VO = Var("o")


def _ctx(spark: SparkSession, sf: str) -> Ctx:
    return Ctx(triples_view(spark, sf))


def _flat(node, ctx, *cols) -> DataFrame:
    return flatten(select(node, ctx)).select(*cols)


# ---------------------------------------------------------------------------
# SPARQL algebra over the relational triple view (SURVEY §2.3)
# ---------------------------------------------------------------------------


def q_bgp_join(spark, sf):
    """BGP: 6-pattern conjunctive join, bound-literal scan on region name."""
    node = BGP(
        [
            T_(Var("c"), Iri(RDF_TYPE), Iri("urn:c:Customer")),
            T_(Var("c"), Iri(P_NAME), Var("cname")),
            T_(Var("c"), Iri(P_IN_NATION), Var("n")),
            T_(Var("n"), Iri(P_NAME), Var("nname")),
            T_(Var("n"), Iri(P_IN_REGION), Var("r")),
            T_(Var("r"), Iri(P_NAME), Literal("ASIA")),
        ]
    )
    return _flat(Project(node, ["cname", "nname"]), _ctx(spark, sf), "cname", "nname")


SQL_BGP_JOIN = """
SELECT c_name AS cname, n_name AS nname
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
"""


def q_optional_filter(spark, sf):
    """OPTIONAL with the filter folded into the join condition (§18.5)."""
    left = BGP([T_(Var("n"), Iri(RDF_TYPE), Iri("urn:c:Nation")), T_(Var("n"), Iri(P_NAME), Var("nname"))])
    right = BGP(
        [
            T_(Var("su"), Iri(RDF_TYPE), Iri("urn:c:Supplier")),
            T_(Var("su"), Iri(P_IN_NATION), Var("n")),
            T_(Var("su"), Iri(P_ACCTBAL), Var("sbal")),
        ]
    )
    node = LeftJoin(left, right, V("sbal") > L(990000))
    return _flat(Project(node, ["nname", "sbal"]), _ctx(spark, sf), "nname", "sbal")


SQL_OPTIONAL_FILTER = """
SELECT n_name AS nname,
       CAST(CAST(round(s_acctbal*100) AS BIGINT) AS VARCHAR) AS sbal
FROM nation LEFT JOIN supplier
  ON s_nationkey = n_nationkey AND round(s_acctbal*100) > 990000
"""


def q_union_tag(spark, sf):
    """UNION + BIND: customer∪supplier names tagged by origin."""
    c = BGP([T_(Var("x"), Iri(RDF_TYPE), Iri("urn:c:Customer")), T_(Var("x"), Iri(P_NAME), Var("name"))]).extend(
        "tag", L("c")
    )
    s = BGP([T_(Var("x"), Iri(RDF_TYPE), Iri("urn:c:Supplier")), T_(Var("x"), Iri(P_NAME), Var("name"))]).extend(
        "tag", L("s")
    )
    return _flat(Project(UnionNode(c, s), ["name", "tag"]), _ctx(spark, sf), "name", "tag")


SQL_UNION_TAG = """
SELECT c_name AS name, 'c' AS tag FROM customer
UNION ALL
SELECT s_name AS name, 's' AS tag FROM supplier
"""


def q_minus_customers(spark, sf):
    """MINUS: customers with no URGENT order (anti join on shared var)."""
    left = BGP([T_(Var("c"), Iri(RDF_TYPE), Iri("urn:c:Customer")), T_(Var("c"), Iri(P_NAME), Var("cname"))])
    right = BGP(
        [
            T_(Var("o"), Iri(P_CUSTOMER), Var("c")),
            T_(Var("o"), Iri(P_PRIORITY), Literal("1-URGENT")),
        ]
    )
    return _flat(Project(Minus(left, right), ["cname"]), _ctx(spark, sf), "cname")


SQL_MINUS_CUSTOMERS = """
SELECT c_name AS cname FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def q_filter_builtin(spark, sf):
    """FILTER with builtins: STRSTARTS + numeric < on a typed literal."""
    node = Filter(
        STRSTARTS(V("cname"), L("Customer#0000000")) & (V("bal") < L(0)),
        BGP([T_(Var("c"), Iri(P_NAME), Var("cname")), T_(Var("c"), Iri(P_ACCTBAL), Var("bal"))]),
    )
    return _flat(Project(node, ["cname", "bal"]), _ctx(spark, sf), "cname", "bal")


SQL_FILTER_BUILTIN = """
SELECT c_name AS cname, CAST(CAST(round(c_acctbal*100) AS BIGINT) AS VARCHAR) AS bal
FROM customer
WHERE c_name LIKE 'Customer#0000000%' AND round(c_acctbal*100) < 0
"""


def q_agg_nation(spark, sf):
    """GROUP BY + COUNT/SUM/MIN over customers per nation (§18.5.1)."""
    node = Group(
        BGP(
            [
                T_(Var("c"), Iri(RDF_TYPE), Iri("urn:c:Customer")),
                T_(Var("c"), Iri(P_IN_NATION), Var("n")),
                T_(Var("n"), Iri(P_NAME), Var("nname")),
                T_(Var("c"), Iri(P_ACCTBAL), Var("bal")),
                T_(Var("c"), Iri(P_NAME), Var("cname")),
            ]
        ),
        ["nname"],
        [
            Agg("n_cust", "count_star"),
            Agg("sum_bal", "sum", V("bal")),
            Agg("min_name", "min", V("cname")),
        ],
    )
    return _flat(node, _ctx(spark, sf), "nname", "n_cust", "sum_bal", "min_name")


SQL_AGG_NATION = """
SELECT n_name AS nname,
       CAST(COUNT(*) AS VARCHAR) AS n_cust,
       CAST(CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS VARCHAR) AS sum_bal,
       MIN(c_name) AS min_name
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_agg_concat(spark, sf):
    """GROUP_CONCAT(DISTINCT …; sorted) of nation names per region."""
    node = Group(
        BGP(
            [
                T_(Var("n"), Iri(P_IN_REGION), Var("r")),
                T_(Var("r"), Iri(P_NAME), Var("rname")),
                T_(Var("n"), Iri(P_NAME), Var("nname")),
            ]
        ),
        ["rname"],
        [Agg("nations", "group_concat", V("nname"), distinct=True, separator=",", sorted=True)],
    )
    return _flat(node, _ctx(spark, sf), "rname", "nations")


SQL_AGG_CONCAT = """
SELECT r_name AS rname, string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_orderby_slice(spark, sf):
    """ORDER BY (SPARQL total order on numeric literals) + OFFSET/LIMIT."""
    node = Slice(
        OrderBy(
            BGP(
                [
                    T_(Var("c"), Iri(RDF_TYPE), Iri("urn:c:Customer")),
                    T_(Var("c"), Iri(P_NAME), Var("cname")),
                    T_(Var("c"), Iri(P_ACCTBAL), Var("bal")),
                ]
            ),
            [("bal", False), ("cname", True)],
        ),
        offset=5,
        limit=10,
    )
    return _flat(Project(node, ["cname", "bal"]), _ctx(spark, sf), "cname", "bal")


SQL_ORDERBY_SLICE = """
SELECT c_name AS cname, CAST(CAST(round(c_acctbal*100) AS BIGINT) AS VARCHAR) AS bal
FROM customer
ORDER BY round(c_acctbal*100) DESC, c_name ASC
LIMIT 10 OFFSET 5
"""


def q_distinct_segments(spark, sf):
    node = Distinct(Project(BGP([T_(Var("c"), Iri(P_SEGMENT), Var("seg"))]), ["seg"]))
    return _flat(node, _ctx(spark, sf), "seg")


SQL_DISTINCT_SEGMENTS = "SELECT DISTINCT c_mktsegment AS seg FROM customer"


def q_exists_nation(spark, sf):
    """FILTER EXISTS → semi join (decorrelated by construction)."""
    left = BGP([T_(Var("n"), Iri(RDF_TYPE), Iri("urn:c:Nation")), T_(Var("n"), Iri(P_NAME), Var("nname"))])
    sub = Filter(
        V("b") > L(980000),
        BGP([T_(Var("c"), Iri(P_IN_NATION), Var("n")), T_(Var("c"), Iri(P_ACCTBAL), Var("b"))]),
    )
    return _flat(Project(left.exists(sub), ["nname"]), _ctx(spark, sf), "nname")


SQL_EXISTS_NATION = """
SELECT n_name AS nname FROM nation
WHERE EXISTS (SELECT 1 FROM customer
              WHERE c_nationkey = n_nationkey AND round(c_acctbal*100) > 980000)
"""


def q_notexists_nation(spark, sf):
    left = BGP([T_(Var("n"), Iri(RDF_TYPE), Iri("urn:c:Nation")), T_(Var("n"), Iri(P_NAME), Var("nname"))])
    sub = Filter(
        V("b") > L(980000),
        BGP([T_(Var("c"), Iri(P_IN_NATION), Var("n")), T_(Var("c"), Iri(P_ACCTBAL), Var("b"))]),
    )
    return _flat(Project(left.exists(sub, negated=True), ["nname"]), _ctx(spark, sf), "nname")


SQL_NOTEXISTS_NATION = """
SELECT n_name AS nname FROM nation
WHERE NOT EXISTS (SELECT 1 FROM customer
                  WHERE c_nationkey = n_nationkey AND round(c_acctbal*100) > 980000)
"""


def q_values_regions(spark, sf):
    """VALUES inline-data join (DataToMultiset)."""
    vals = Values([{"rname": Literal("ASIA")}, {"rname": Literal("EUROPE")}])
    node = vals.join(
        BGP(
            [
                T_(Var("r"), Iri(P_NAME), Var("rname")),
                T_(Var("n"), Iri(P_IN_REGION), Var("r")),
                T_(Var("n"), Iri(P_NAME), Var("nname")),
            ]
        )
    )
    return _flat(Project(node, ["rname", "nname"]), _ctx(spark, sf), "rname", "nname")


SQL_VALUES_REGIONS = """
SELECT r_name AS rname, n_name AS nname
FROM region JOIN nation ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE')
"""


def q_graph_counts(spark, sf):
    """GRAPH ?g + aggregate: triple count per named graph (rdf_ds.ml)."""
    node = Group(
        GraphNode(Var("g"), BGP([T_(VS, Var("p"), VO)])),
        ["g"],
        [Agg("n", "count_star")],
    )
    return _flat(node, _ctx(spark, sf), "g", "n")


SQL_GRAPH_COUNTS = W + """
SELECT graph AS g, CAST(COUNT(*) AS VARCHAR) AS n FROM triples GROUP BY graph
"""


def q_path_seq(spark, sf):
    """Property path p1/p2: member --inNation/inRegion--> region, counted."""
    node = Group(
        PathPattern(VS, Seq(PP(P_IN_NATION), PP(P_IN_REGION)), Var("r")),
        ["r"],
        [Agg("n_members", "count_star")],
    )
    return _flat(node, _ctx(spark, sf), "r", "n_members")


SQL_PATH_SEQ = """
SELECT 'urn:r:'||n_regionkey AS r, CAST(COUNT(*) AS VARCHAR) AS n_members
FROM (
  SELECT c_nationkey AS nk FROM customer
  UNION ALL
  SELECT s_nationkey FROM supplier
) m JOIN nation ON m.nk = n_nationkey
GROUP BY n_regionkey
"""


def q_path_inv(spark, sf):
    """Inverse path ^customer: orders per customer, top 10 (+tiebreak)."""
    node = Slice(
        OrderBy(
            Group(
                PathPattern(Var("c"), Inv(PP(P_CUSTOMER)), Var("o")),
                ["c"],
                [Agg("n_orders", "count_star")],
            ),
            [("n_orders", False), ("c", True)],
        ),
        limit=10,
    )
    return _flat(node, _ctx(spark, sf), "c", "n_orders")


SQL_PATH_INV = """
SELECT 'urn:cu:'||o_custkey AS c, CAST(COUNT(*) AS VARCHAR) AS n_orders
FROM orders GROUP BY o_custkey
ORDER BY COUNT(*) DESC, 'urn:cu:'||o_custkey ASC
LIMIT 10
"""


def q_path_plus(spark, sf):
    """(inNation|inRegion)+ — transitive closure via the iterative
    DataFrame fixpoint (distinct node-pair semantics, cycle-safe)."""
    node = PathPattern(VS, Plus(Alt(PP(P_IN_NATION), PP(P_IN_REGION))), VO)
    return _flat(node, _ctx(spark, sf), "s", "o")


SQL_PATH_PLUS = """
SELECT 'urn:cu:'||c_custkey AS s, 'urn:n:'||c_nationkey AS o FROM customer
UNION SELECT 'urn:su:'||s_suppkey, 'urn:n:'||s_nationkey FROM supplier
UNION SELECT 'urn:n:'||n_nationkey, 'urn:r:'||n_regionkey FROM nation
UNION SELECT 'urn:cu:'||c_custkey, 'urn:r:'||n_regionkey
      FROM customer JOIN nation ON c_nationkey = n_nationkey
UNION SELECT 'urn:su:'||s_suppkey, 'urn:r:'||n_regionkey
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
"""


def q_construct_rich(spark, sf):
    """CONSTRUCT: mint `?c urn:p:richIn ?n` triples for high-balance
    customers; output as flattened (s, p, o)."""
    where = Filter(
        V("b") >= L(999000),
        BGP([T_(Var("c"), Iri(P_ACCTBAL), Var("b")), T_(Var("c"), Iri(P_IN_NATION), Var("n"))]),
    )
    out = construct([Template(Var("c"), Iri("urn:p:richIn"), Var("n"))], where, _ctx(spark, sf))
    return out.select(F.col("s_lex").alias("s"), F.col("pred").alias("p"), F.col("o_lex").alias("o"))


SQL_CONSTRUCT_RICH = """
SELECT 'urn:cu:'||c_custkey AS s, 'urn:p:richIn' AS p, 'urn:n:'||c_nationkey AS o
FROM customer WHERE round(c_acctbal*100) >= 999000
"""


def q_find_probe(spark, sf):
    """Graph-API probe g.find(pred=…) (rdf_graph.ml :: find) — P-bound
    pattern, served by the POS sort order at scale (SURVEY §3 EP3)."""
    from .graph import Graph

    g = Graph(triples_view(spark, sf))
    return g.find(pred=Iri(P_SEGMENT)).select(F.col("s_lex").alias("s"), F.col("o_lex").alias("seg"))


SQL_FIND_PROBE = """
SELECT 'urn:cu:'||c_custkey AS s, c_mktsegment AS seg FROM customer
"""


def q_serialize_nt(spark, sf):
    """N-Triples serializer over the region graph (rdf_ttl.ml writer's
    canonical test output — SURVEY §2.2)."""
    from .serializers import to_ntriples

    df = triples_view(spark, sf).filter(F.col("graph") == "urn:g:region")
    return to_ntriples(df).select(F.col("line"))


SQL_SERIALIZE_NT = """
SELECT '<urn:r:'||r_regionkey||'> <urn:p:name> "'||r_name||'" .' AS line FROM region
UNION ALL
SELECT '<urn:r:'||r_regionkey||'> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <urn:c:Region> .' FROM region
"""


def q_builtins_str(spark, sf):
    """String builtins (§17.4.3): UCASE/STRLEN/SUBSTR + CONTAINS filter."""
    node = (
        BGP([T_(Var("n"), Iri(RDF_TYPE), Iri("urn:c:Nation")), T_(Var("n"), Iri(P_NAME), Var("nname"))])
        .filter(CONTAINS(V("nname"), L("1")))
        .extend("uname", UCASE(V("nname")))
        .extend("nlen", STRLEN(V("nname")))
        .extend("pfx", SUBSTR(V("nname"), 1, 6))
    )
    return _flat(Project(node, ["nname", "uname", "nlen", "pfx"]), _ctx(spark, sf), "nname", "uname", "nlen", "pfx")


SQL_BUILTINS_STR = """
SELECT n_name AS nname, upper(n_name) AS uname,
       CAST(length(n_name) AS VARCHAR) AS nlen, substr(n_name, 1, 6) AS pfx
FROM nation WHERE n_name LIKE '%1%'
"""


# ---------------------------------------------------------------------------
# training-data operators over documents/embeddings (driver mandate)
# ---------------------------------------------------------------------------


def _docs(spark, sf):
    return spark.read.parquet(f"{sf}/documents.parquet")


def _embs(spark, sf):
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def q_dedup_exact(spark, sf):
    from .operators.textops import exact_dup_groups

    return exact_dup_groups(_docs(spark, sf))


SQL_DEDUP_EXACT = """
SELECT md5(text) AS hash, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
FROM documents GROUP BY md5(text)
"""


def q_dedup_minhash(spark, sf):
    from .operators.textops import minhash_candidates

    return minhash_candidates(_docs(spark, sf), bands=8, max_bucket=50)


SQL_DEDUP_MINHASH = """
WITH wf AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS w FROM documents
), wz AS (SELECT doc_id, w FROM wf WHERE w <> ''),
b AS (SELECT doc_id, w, unnest(range(8)) AS band FROM wz),
sig AS (SELECT doc_id, band, min(md5(band || ':' || w)) AS mh FROM b GROUP BY doc_id, band),
sized AS (SELECT band, mh, COUNT(*) AS bsz FROM sig GROUP BY band, mh),
small AS (SELECT sig.* FROM sig JOIN sized USING (band, mh) WHERE sized.bsz <= 50),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.band
  FROM small a JOIN small b ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, COUNT(*) AS n_bands FROM pairs GROUP BY doc_a, doc_b
"""


def q_dedup_clusters(spark, sf):
    """Composed corpus dedup pipeline: MinHash-LSH blocking → n-gram
    Jaccard verify → connected components → cluster id + keeper flag per
    document (the end-to-end near-dup dedup a training-data pipeline
    actually runs; the DuckDB mirror computes components with a recursive
    transitive-closure CTE)."""
    from .operators.textops import near_dup_clusters

    return near_dup_clusters(_docs(spark, sf), bands=8, band_min=4, jac_min=60)


SQL_DEDUP_CLUSTERS = """
WITH RECURSIVE wf AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS w FROM documents
), wz AS (SELECT doc_id, w FROM wf WHERE w <> ''),
b AS (SELECT doc_id, w, unnest(range(8)) AS band FROM wz),
sig AS (SELECT doc_id, band, min(md5(band || ':' || w)) AS mh FROM b GROUP BY doc_id, band),
sized AS (SELECT band, mh, COUNT(*) AS bsz FROM sig GROUP BY band, mh),
small AS (SELECT sig.* FROM sig JOIN sized USING (band, mh) WHERE sized.bsz <= 50),
bpairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.band
  FROM small a JOIN small b ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id
),
cand AS (SELECT doc_a, doc_b FROM bpairs GROUP BY doc_a, doc_b HAVING COUNT(*) >= 4),
wlist AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS ws FROM documents),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS g
  FROM wlist, unnest(range(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN grams ga ON ga.doc_id = c.doc_a
  JOIN grams gb ON gb.doc_id = c.doc_b AND gb.g = ga.g
  GROUP BY c.doc_a, c.doc_b
),
ver AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  WHERE floor(COALESCE(i.n_inter, 0) * 100.0 /
        (sa.n_grams + sb.n_grams - COALESCE(i.n_inter, 0))) >= 60
),
sym AS (SELECT doc_a AS a, doc_b AS b FROM ver UNION SELECT doc_b, doc_a FROM ver),
closure AS (
  SELECT a, b FROM sym
  UNION
  SELECT c.a, s.b FROM closure c JOIN sym s ON c.b = s.a
),
comp AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM closure GROUP BY a)
SELECT d.doc_id,
       COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
       CAST(CASE WHEN COALESCE(c.cluster_id, d.doc_id) = d.doc_id THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
FROM documents d LEFT JOIN comp c USING (doc_id)
"""


def q_dedup_simhash(spark, sf):
    from .operators.textops import simhash16

    return simhash16(_docs(spark, sf))


SQL_DEDUP_SIMHASH = """
WITH wf AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS w FROM documents
), wz AS (SELECT doc_id, w FROM wf WHERE w <> ''),
wh AS (
  SELECT doc_id,
         (instr('0123456789abcdef', substr(md5(w),1,1))-1)*4096
       + (instr('0123456789abcdef', substr(md5(w),2,1))-1)*256
       + (instr('0123456789abcdef', substr(md5(w),3,1))-1)*16
       + (instr('0123456789abcdef', substr(md5(w),4,1))-1) AS h
  FROM wz
),
bits AS (SELECT doc_id, h, unnest(range(16)) AS bit FROM wh),
per_bit AS (
  SELECT doc_id, bit,
         SUM(CASE WHEN (h // CAST(pow(2, bit) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END) AS s
  FROM bits GROUP BY doc_id, bit
)
SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
FROM per_bit GROUP BY doc_id
"""


def q_ngram_jaccard(spark, sf):
    from .operators.textops import ngram_jaccard

    docs = _docs(spark, sf)
    pairs = (
        docs.filter((F.col("doc_id") < 100) & (F.col("doc_id") % 2 == 0))
        .select(F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 1).alias("doc_b"))
    )
    return ngram_jaccard(docs, pairs, n=3)


SQL_NGRAM_JACCARD = """
WITH w AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS ws FROM documents),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS g
  FROM w, unnest(range(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 3
),
sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
pairs AS (SELECT doc_id AS doc_a, doc_id + 1 AS doc_b FROM documents
          WHERE doc_id < 100 AND doc_id % 2 = 0),
inter AS (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
  FROM pairs p
  JOIN grams ga ON ga.doc_id = p.doc_a
  JOIN grams gb ON gb.doc_id = p.doc_b AND gb.g = ga.g
  GROUP BY p.doc_a, p.doc_b
)
SELECT p.doc_a, p.doc_b,
       CAST(floor(COALESCE(i.n_inter, 0) * 100.0 /
            (sa.n_grams + sb.n_grams - COALESCE(i.n_inter, 0))) AS BIGINT) AS jac_pct
FROM pairs p
JOIN sizes sa ON sa.doc_id = p.doc_a
JOIN sizes sb ON sb.doc_id = p.doc_b
LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
"""


_SW_EN = "'the','and','of','to','in','is','that','for','with','as'"
_SW_DE = "'der','die','das','und','ist','von','mit','für','auf','ein'"
_SW_FR = "'le','la','les','et','de','un','une','est','pour','dans'"


def q_lang_id(spark, sf):
    from .operators.textops import lang_id

    return lang_id(_docs(spark, sf))


SQL_LANG_ID = f"""
WITH s AS (
  SELECT doc_id,
    len(list_filter(string_split_regex(trim(text), ' +'), x -> lower(x) IN ({_SW_DE}))) AS s_de,
    len(list_filter(string_split_regex(trim(text), ' +'), x -> lower(x) IN ({_SW_EN}))) AS s_en,
    len(list_filter(string_split_regex(trim(text), ' +'), x -> lower(x) IN ({_SW_FR}))) AS s_fr
  FROM documents
)
SELECT doc_id,
  CASE WHEN greatest(s_de, s_en, s_fr) = 0 THEN 'und'
       WHEN s_de = greatest(s_de, s_en, s_fr) THEN 'de'
       WHEN s_en = greatest(s_de, s_en, s_fr) THEN 'en'
       ELSE 'fr' END AS lang_guess,
  CAST(greatest(s_de, s_en, s_fr) AS BIGINT) AS top_hits
FROM s
"""


def q_quality(spark, sf):
    from .operators.textops import quality_score

    return quality_score(_docs(spark, sf))


SQL_QUALITY = f"""
WITH b AS (
  SELECT doc_id,
    CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tok,
    CAST(length(text) AS BIGINT) AS n_chars,
    CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
    CAST(len(list_filter(string_split_regex(trim(text), ' +'), x -> lower(x) IN ({_SW_EN}))) AS BIGINT) AS n_stop
  FROM documents
)
SELECT doc_id,
  n_tok AS n_tokens,
  CAST(floor(n_chars * 100.0 / greatest(n_tok, 1)) AS BIGINT) AS mean_tok_x100,
  CAST(floor(n_punct * 1000.0 / greatest(n_chars, 1)) AS BIGINT) AS punct_x1000,
  CAST(floor(n_stop * 1000.0 / greatest(n_tok, 1)) AS BIGINT) AS stop_x1000,
  CAST((CASE WHEN n_tok >= 10 AND floor(n_chars * 100.0 / greatest(n_tok, 1)) BETWEEN 300 AND 1200 THEN 50 ELSE 0 END)
     + (CASE WHEN floor(n_stop * 1000.0 / greatest(n_tok, 1)) > 0 THEN 30 ELSE 0 END)
     + (CASE WHEN floor(n_punct * 1000.0 / greatest(n_chars, 1)) <= 200 THEN 20 ELSE 0 END) AS BIGINT) AS quality
FROM b
"""


def q_token_counts(spark, sf):
    from .operators.textops import token_counts

    return token_counts(_docs(spark, sf))


SQL_TOKEN_COUNTS = r"""
SELECT doc_id,
  CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS ws_tokens,
  CAST(len(regexp_extract_all(text, '[a-zA-Z]{1,4}|[0-9]{1,3}|[^a-zA-Z0-9\s]')) AS BIGINT) AS bpe_ish_tokens
FROM documents
"""


def q_fingerprint(spark, sf):
    from .operators.textops import fingerprint

    return fingerprint(_docs(spark, sf))


SQL_FINGERPRINT = """
SELECT doc_id,
  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fp
FROM documents
"""


def q_ann_cosine(spark, sf):
    from .operators.ann import cosine_topk

    return cosine_topk(_embs(spark, sf), query_id=0, k=10)


SQL_ANN_COSINE = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       CAST(round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qe) * 10000) AS BIGINT) AS sim_x1e4
FROM embeddings, q WHERE vec_id <> 0
ORDER BY sim_x1e4 DESC, vec_id ASC LIMIT 10
"""


#: deterministic md5 sign-hyperplane bucket ids, DuckDB side (bits=4,
#: dim=64 — mirrors operators/ann.py :: lsh_bucket; list_dot_product is the
#: same left-to-right double summation as Spark's F.aggregate fold)
BUCKET_CTE = """WITH planes AS (
  SELECT p, list(CASE WHEN (instr('0123456789abcdef', substr(md5(p || ':' || d), 1, 1)) - 1) % 2 = 1
                      THEN 1.0 ELSE -1.0 END ORDER BY d) AS wl
  FROM unnest(range(4)) t(p), unnest(range(64)) u(d)
  GROUP BY p
),
signs AS (
  SELECT e.vec_id, pl.p,
         CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), pl.wl) >= 0 THEN 1 ELSE 0 END AS s
  FROM embeddings e, planes pl
),
buckets AS (
  SELECT vec_id, CAST(SUM(s * CAST(pow(2, 3 - p) AS BIGINT)) AS BIGINT) AS bucket
  FROM signs GROUP BY vec_id
)"""


def q_ann_lsh(spark, sf):
    """LSH-bucketed approximate neighbors (scale path). The DuckDB mirror
    recomputes the deterministic md5 sign-hyperplane buckets with
    list_dot_product (same left-to-right double summation — verified
    bit-identical bucket ids across engines at sf0.01)."""
    from .operators.ann import lsh_topk

    return lsh_topk(_embs(spark, sf), query_id=0, k=10, bits=4, dim=64)


SQL_ANN_LSH = BUCKET_CTE + """,
q AS (SELECT b.bucket AS qb, CAST(e.embedding AS DOUBLE[]) AS qe
      FROM buckets b JOIN embeddings e USING (vec_id) WHERE b.vec_id = 0)
SELECT e.vec_id,
       CAST(round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) * 10000) AS BIGINT) AS sim_x1e4
FROM embeddings e JOIN buckets b USING (vec_id), q
WHERE e.vec_id <> 0 AND b.bucket = q.qb
ORDER BY sim_x1e4 DESC, e.vec_id ASC LIMIT 10
"""


SQL_ANN_IVF = """
WITH comps AS (
  SELECT vec_id, vec_id % 8 AS sc, d, CAST(embedding[d+1] AS DOUBLE) AS v
  FROM embeddings, unnest(range(64)) t(d)
),
cent AS (SELECT sc, d, AVG(v) AS c FROM comps GROUP BY sc, d),
cent_l AS (SELECT sc, list(c ORDER BY d) AS centroid FROM cent GROUP BY sc),
sims AS (
  SELECT e.vec_id, c.sc,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.centroid) AS sim
  FROM embeddings e, cent_l c
),
best AS (
  SELECT vec_id, sc, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, sc ASC) AS rn
  FROM sims
)
SELECT sc AS cluster, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM best WHERE rn = 1 GROUP BY sc ORDER BY cluster
"""


def q_ann_ivf(spark, sf):
    """IVF coarse-assignment index build — cluster sizes. Deterministic:
    seed clusters are vec_id % n, centroids are per-dimension means, and
    the DuckDB mirror reproduces the same argmax assignment (double math
    agrees across engines; verified value-exact at sf0.01)."""
    from .operators.ann import knn_join_centroids

    return (
        knn_join_centroids(_embs(spark, sf), n_clusters=8)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------------
# KG construction: entity linking, canonicalization (north rule)
# ---------------------------------------------------------------------------


def q_link_exact(spark, sf):
    """Mention detection + alias broadcast join + top-1 (SURVEY §2.5)."""
    from .operators.linking import detect_mentions, link_exact

    nat = spark.read.parquet(f"{sf}/nation.parquet")
    docs_m = nat.select(
        F.col("n_nationkey").cast("long").alias("doc_id"),
        F.concat(F.lit("Visit "), F.col("n_name"), F.lit(" today")).alias("text"),
    )
    mentions = detect_mentions(docs_m)
    aliases = nat.select(
        F.col("n_name").alias("alias"),
        F.concat(F.lit("urn:n:"), F.col("n_nationkey")).alias("uri"),
        (F.lit(1.0) - F.col("n_nationkey") / 100.0).alias("prior"),
    )
    return link_exact(mentions, aliases)


SQL_LINK_EXACT = """
SELECT CAST(n_nationkey AS BIGINT) AS id, n_name AS mention,
       'urn:n:'||n_nationkey AS uri,
       CAST(round((1.0 - n_nationkey/100.0) * 1000000) AS BIGINT) AS score_x1e6
FROM nation
"""


def q_link_fuzzy(spark, sf):
    """Rows-only: MinHash-LSH blocking over the alias fixture (seeded)."""
    from .datagen import gen_aliases_pandas
    from .operators.linking import link_fuzzy

    ali = spark.createDataFrame(gen_aliases_pandas(200))
    # probe mentions: aliases with the 2nd character dropped (near-miss)
    probes = ali.select(
        F.monotonically_increasing_id().alias("id"),
        F.col("alias").alias("mention"),
        F.lower(F.regexp_replace(F.concat(F.substring("alias", 1, 1), F.expr("substring(alias, 3)")), r"[^A-Za-z0-9 ]", "")).alias("norm"),
    ).limit(60)
    out = link_fuzzy(probes, ali, threshold=0.6)
    return out.groupBy("uri").agg(F.count(F.lit(1)).alias("n_links")).orderBy("uri")


def _cc_edges(spark, sf):
    from pyspark.sql.window import Window

    cust = spark.read.parquet(f"{sf}/customer.parquet")
    w = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy("c_custkey")
    nxt = F.lead("c_custkey").over(w)
    return cust.select(
        F.concat(F.lit("0|urn:cu:"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("0|urn:cu:"), nxt).alias("dst"),
    ).filter(F.col("dst").isNotNull())


def q_cc_components(spark, sf):
    """large-star/small-star connected components over sameAs-style chain
    edges; ground truth is the (nation, segment) grouping the chains were
    built from — the CC algorithm must rediscover it."""
    from .operators.cc import connected_components

    mapping = connected_components(_cc_edges(spark, sf))
    return (
        mapping.groupBy("component")
        .agg(F.count(F.lit(1)).alias("csize"))
        .select(F.regexp_replace("component", r"^0\|", "").alias("canon"), "csize")
    )


SQL_CC_COMPONENTS = """
SELECT MIN('urn:cu:'||c_custkey) AS canon, COUNT(*) AS csize
FROM customer
GROUP BY c_nationkey, c_mktsegment
HAVING COUNT(*) >= 2
"""


def q_canonicalize(spark, sf):
    """Full canonicalization: CC mapping + subj/obj rewrite + set-dedup;
    per-canonical-subject triple counts over the customer graph."""
    from .operators.cc import canonicalize, connected_components
    from .types import TRIPLE_KEY

    triples = triples_view(spark, sf).filter(F.col("graph") == "urn:g:customer")
    mapping = connected_components(_cc_edges(spark, sf))
    rewritten = canonicalize(triples, mapping).dropDuplicates(TRIPLE_KEY)
    return (
        rewritten.filter(F.col("s_lex").startswith("urn:cu:"))
        .groupBy(F.col("s_lex").alias("rep"))
        .agg(F.count(F.lit(1)).alias("n_triples"))
    )


SQL_CANONICALIZE = """
SELECT MIN('urn:cu:'||c_custkey) AS rep,
       CAST(3 + COUNT(*) + COUNT(DISTINCT CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS n_triples
FROM customer
GROUP BY c_nationkey, c_mktsegment
"""


def q_extract_corpus(spark, sf):
    """Rows-only: the full vectorized extraction stage on the deterministic
    synthetic corpus — triples per extractor (SURVEY §3 EP2)."""
    from .datagen import gen_pages_df
    from .extract import dedup_triples, extract_triples, salted_repartition, split_errors

    pages = salted_repartition(gen_pages_df(spark, 200, parts=4), 8)
    triples, _ = split_errors(extract_triples(pages))
    return (
        dedup_triples(triples)
        .groupBy("extractor")
        .agg(F.count(F.lit(1)).alias("n_triples"))
        .orderBy("extractor")
    )


def q_media_meta(spark, sf):
    """Multimodal plumbing: binary column → Arrow-batched metadata UDF
    (decode stubbed; schema/batching real). Cross-checked against SQL."""
    from .operators.media import media_metadata

    docs = _docs(spark, sf).select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.col("text").cast("binary").alias("content"),
    )
    return media_metadata(docs)


SQL_MEDIA_META = """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha,
       'unknown' AS kind,
       CAST(64 + (instr('0123456789abcdef', substr(sha256(text),1,1))-1)*16
               + (instr('0123456789abcdef', substr(sha256(text),2,1))-1) AS INTEGER) AS width,
       CAST(64 + (instr('0123456789abcdef', substr(sha256(text),3,1))-1)*16
               + (instr('0123456789abcdef', substr(sha256(text),4,1))-1) AS INTEGER) AS height,
       CAST(1 + ((instr('0123456789abcdef', substr(sha256(text),5,1))-1)*16
               + (instr('0123456789abcdef', substr(sha256(text),6,1))-1)) % 8 AS INTEGER) AS n_frames
FROM documents
"""


def q_scan_agg(spark, sf):
    """Columnar scan + partial/final hash aggregation at bench scale
    (pushdown + WholeStageCodegen showcase; SURVEY §4)."""
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("sum_qty_x100"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_price_x100"),
        )
    )


SQL_SCAN_AGG = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_x100,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_x100
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q_window_topk(spark, sf):
    """Window function (SURVEY §2.6): top-2 customers by balance/nation."""
    from pyspark.sql.window import Window

    cust = spark.read.parquet(f"{sf}/customer.parquet")
    bal = F.round(F.col("c_acctbal") * 100).cast("long")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc(bal), F.asc("c_custkey"))
    return (
        cust.select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_custkey").alias("custkey"),
            bal.alias("bal_x100"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 2)
    )


SQL_WINDOW_TOPK = """
SELECT nationkey, custkey, bal_x100, rn FROM (
  SELECT c_nationkey AS nationkey, c_custkey AS custkey,
         CAST(round(c_acctbal*100) AS BIGINT) AS bal_x100,
         CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
              ORDER BY round(c_acctbal*100) DESC, c_custkey ASC) AS INTEGER) AS rn
  FROM customer
) WHERE rn <= 2
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES = {
    # SPARQL algebra (SURVEY §2.3–§2.8)
    "bgp_join": (q_bgp_join, SQL_BGP_JOIN),
    "optional_filter": (q_optional_filter, SQL_OPTIONAL_FILTER),
    "union_tag": (q_union_tag, SQL_UNION_TAG),
    "minus_customers": (q_minus_customers, SQL_MINUS_CUSTOMERS),
    "filter_builtin": (q_filter_builtin, SQL_FILTER_BUILTIN),
    "agg_nation": (q_agg_nation, SQL_AGG_NATION),
    "agg_concat": (q_agg_concat, SQL_AGG_CONCAT),
    "orderby_slice": (q_orderby_slice, SQL_ORDERBY_SLICE),
    "distinct_segments": (q_distinct_segments, SQL_DISTINCT_SEGMENTS),
    "exists_nation": (q_exists_nation, SQL_EXISTS_NATION),
    "notexists_nation": (q_notexists_nation, SQL_NOTEXISTS_NATION),
    "values_regions": (q_values_regions, SQL_VALUES_REGIONS),
    "graph_counts": (q_graph_counts, SQL_GRAPH_COUNTS),
    "path_seq": (q_path_seq, SQL_PATH_SEQ),
    "path_inv": (q_path_inv, SQL_PATH_INV),
    "path_plus": (q_path_plus, SQL_PATH_PLUS),
    "construct_rich": (q_construct_rich, SQL_CONSTRUCT_RICH),
    "find_probe": (q_find_probe, SQL_FIND_PROBE),
    "serialize_nt": (q_serialize_nt, SQL_SERIALIZE_NT),
    "builtins_str": (q_builtins_str, SQL_BUILTINS_STR),
    # training-data operators
    "dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "dedup_minhash": (q_dedup_minhash, SQL_DEDUP_MINHASH),
    "dedup_simhash": (q_dedup_simhash, SQL_DEDUP_SIMHASH),
    "dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "ngram_jaccard": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
    "lang_id": (q_lang_id, SQL_LANG_ID),
    "quality": (q_quality, SQL_QUALITY),
    "token_counts": (q_token_counts, SQL_TOKEN_COUNTS),
    "fingerprint": (q_fingerprint, SQL_FINGERPRINT),
    "ann_cosine": (q_ann_cosine, SQL_ANN_COSINE),
    "ann_lsh": (q_ann_lsh, SQL_ANN_LSH),
    "ann_ivf": (q_ann_ivf, SQL_ANN_IVF),
    # KG construction (north rule)
    "link_exact": (q_link_exact, SQL_LINK_EXACT),
    "link_fuzzy": (q_link_fuzzy, None),
    "cc_components": (q_cc_components, SQL_CC_COMPONENTS),
    "canonicalize": (q_canonicalize, SQL_CANONICALIZE),
    "extract_corpus": (q_extract_corpus, None),
    "media_meta": (q_media_meta, SQL_MEDIA_META),
    # relational/scan layer
    "scan_agg": (q_scan_agg, SQL_SCAN_AGG),
    "window_topk": (q_window_topk, SQL_WINDOW_TOPK),
}


# ---------------------------------------------------------------------------
# SPARQL text front end (sparql.py — reference EP1) through the same gate
# ---------------------------------------------------------------------------

_SPARQL_PFX = "PREFIX p: <urn:p:> PREFIX c: <urn:c:> PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>\n"


def _sparql(spark, sf, text, *cols):
    from .sparql import execute

    df = execute(_SPARQL_PFX + text, _ctx(spark, sf))
    return flatten(df).select(*cols)


def q_sparql_text_from(spark, sf):
    """Dataset clause (§13.2): FROM <g> restricts the default graph to the
    merge of the listed graphs — non-GRAPH patterns see only those quads."""
    return _sparql(
        spark, sf,
        """SELECT ?s ?n FROM <urn:g:region> WHERE { ?s p:name ?n }""",
        "s", "n",
    )


SQL_SPARQL_TEXT_FROM = """
SELECT 'urn:r:'||r_regionkey AS s, r_name AS n FROM region
"""


def q_sparql_text_from_named(spark, sf):
    """FROM NAMED: GRAPH ?g ranges over exactly the listed graphs."""
    return _sparql(
        spark, sf,
        """SELECT ?g (COUNT(*) AS ?n)
           FROM NAMED <urn:g:region> FROM NAMED <urn:g:nation>
           WHERE { GRAPH ?g { ?s ?p ?o } } GROUP BY ?g""",
        "g", "n",
    )


SQL_SPARQL_TEXT_FROM_NAMED = """
SELECT 'urn:g:region' AS g, CAST(COUNT(*) * 2 AS VARCHAR) AS n FROM region
UNION ALL
SELECT 'urn:g:nation', CAST(COUNT(*) * 3 AS VARCHAR) FROM nation
"""

QUERIES["sparql_text_from"] = (q_sparql_text_from, SQL_SPARQL_TEXT_FROM)
QUERIES["sparql_text_from_named"] = (q_sparql_text_from_named, SQL_SPARQL_TEXT_FROM_NAMED)


def q_sparql_text_bgp(spark, sf):
    """Textual SPARQL end-to-end: lex→parse→algebra→DataFrame (EP1)."""
    return _sparql(
        spark, sf,
        """SELECT ?cname ?nname WHERE {
             ?cu a c:Customer ; p:name ?cname ; p:inNation ?n .
             ?n p:name ?nname ; p:inRegion ?r .
             ?r p:name "ASIA" .
           }""",
        "cname", "nname",
    )


def q_sparql_text_agg(spark, sf):
    """Textual SPARQL aggregates + HAVING + ORDER."""
    return _sparql(
        spark, sf,
        """SELECT ?nname (COUNT(*) AS ?n_cust) (MIN(?cname) AS ?min_name)
           WHERE { ?cu a c:Customer ; p:name ?cname ; p:inNation ?n .
                   ?n p:name ?nname }
           GROUP BY ?nname HAVING (COUNT(*) > 0)""",
        "nname", "n_cust", "min_name",
    )


SQL_SPARQL_TEXT_AGG = """
SELECT n_name AS nname, CAST(COUNT(*) AS VARCHAR) AS n_cust, MIN(c_name) AS min_name
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_sparql_text_topk(spark, sf):
    """Textual SPARQL OPTIONAL + FILTER + ORDER + LIMIT."""
    return _sparql(
        spark, sf,
        """SELECT ?cname ?bal WHERE {
             ?cu a c:Customer ; p:name ?cname ; p:acctbal ?bal .
             FILTER(?bal >= 0)
           } ORDER BY DESC(?bal) ?cname LIMIT 10""",
        "cname", "bal",
    )


SQL_SPARQL_TEXT_TOPK = """
SELECT c_name AS cname, CAST(CAST(round(c_acctbal*100) AS BIGINT) AS VARCHAR) AS bal
FROM customer WHERE round(c_acctbal*100) >= 0
ORDER BY round(c_acctbal*100) DESC, c_name ASC LIMIT 10
"""


def q_sparql_text_path(spark, sf):
    """Textual SPARQL property path (seq + plus) through the fixpoint."""
    return _sparql(
        spark, sf,
        "SELECT ?s ?o WHERE { ?s (p:inNation|p:inRegion)+ ?o }",
        "s", "o",
    )


QUERIES.update(
    {
        "sparql_text_bgp": (q_sparql_text_bgp, SQL_BGP_JOIN),
        "sparql_text_agg": (q_sparql_text_agg, SQL_SPARQL_TEXT_AGG),
        "sparql_text_topk": (q_sparql_text_topk, SQL_SPARQL_TEXT_TOPK),
        "sparql_text_path": (q_sparql_text_path, SQL_PATH_PLUS),
    }
)


def q_builtins_date(spark, sf):
    """Datetime builtins (§17.4.5): YEAR/MONTH on xsd:date order literals,
    aggregated per (year, month)."""
    from .functions.builtins import MONTH, YEAR

    node = Group(
        BGP([T_(Var("o"), Iri("urn:p:odate"), Var("d"))])
        .extend("y", YEAR(V("d")))
        .extend("m", MONTH(V("d"))),
        ["y", "m"],
        [Agg("n_orders", "count_star")],
    )
    return _flat(node, _ctx(spark, sf), "y", "m", "n_orders")


SQL_BUILTINS_DATE = """
SELECT CAST(CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS VARCHAR) AS y,
       CAST(CAST(strftime(o_orderdate, '%m') AS BIGINT) AS VARCHAR) AS m,
       CAST(COUNT(*) AS VARCHAR) AS n_orders
FROM orders GROUP BY 1, 2
"""

QUERIES["builtins_date"] = (q_builtins_date, SQL_BUILTINS_DATE)


# ---------------------------------------------------------------------------
# coverage batch 2: query forms (ASK/DESCRIBE), remaining path forms,
# sub-SELECT/REDUCED/SAMPLE, remaining builtin families, embedding near-dup,
# event-stream ops (SURVEY §2 rows previously pytest-only → now oracled)
# ---------------------------------------------------------------------------


def q_ask_probe(spark, sf):
    """ASK (rdf_sparql.ml :: execute, boolean form): one true probe, one
    false probe, as a 2-row result."""
    from .algebra import ask

    ctx = _ctx(spark, sf)
    probes = [
        ("asia_region", BGP([T_(Var("r"), Iri(P_NAME), Literal("ASIA"))])),
        ("atlantis_region", BGP([T_(Var("r"), Iri(P_NAME), Literal("ATLANTIS"))])),
    ]
    rows = [(n, str(ask(node, ctx)).lower()) for n, node in probes]
    return spark.createDataFrame(rows, "probe string, result string")


SQL_ASK_PROBE = """
SELECT 'asia_region' AS probe,
       CAST(EXISTS(SELECT 1 FROM region WHERE r_name = 'ASIA') AS VARCHAR) AS result
UNION ALL
SELECT 'atlantis_region',
       CAST(EXISTS(SELECT 1 FROM region WHERE r_name = 'ATLANTIS') AS VARCHAR)
"""


def q_describe_term(spark, sf):
    """DESCRIBE (naive subject-triples variant, as the reference)."""
    from .algebra import describe

    out = describe([Iri("urn:n:0"), Iri("urn:r:1")], _ctx(spark, sf))
    return out.select(F.col("s_lex").alias("s"), F.col("pred").alias("p"), F.col("o_lex").alias("o"))


SQL_DESCRIBE_TERM = W + """
SELECT s_lex AS s, pred AS p, o_lex AS o FROM triples
WHERE s_lex IN ('urn:n:0', 'urn:r:1')
"""


def q_path_opt(spark, sf):
    """p? (ZeroOrOne): identity over every term of the nation graph ∪ the
    inRegion pairs (spec §9.3 zero-length-path semantics)."""
    from .operators.paths import ZeroOrOne

    node = GraphNode("urn:g:nation", PathPattern(VS, ZeroOrOne(PP(P_IN_REGION)), VO))
    return _flat(node, _ctx(spark, sf), "s", "o")


SQL_PATH_OPT = W + """
, nt AS (SELECT * FROM triples WHERE graph = 'urn:g:nation'),
nodes AS (SELECT DISTINCT s_lex AS lex FROM nt UNION SELECT DISTINCT o_lex FROM nt)
SELECT lex AS s, lex AS o FROM nodes
UNION ALL
SELECT DISTINCT s_lex, o_lex FROM nt WHERE pred = 'urn:p:inRegion'
"""


def q_path_star(spark, sf):
    """(inRegion|^inRegion)* : symmetric-closure fixpoint — every ordered
    pair inside a region's {nations ∪ region} component, plus identity over
    all nation-graph terms."""
    from .operators.paths import Star

    node = GraphNode(
        "urn:g:nation",
        PathPattern(VS, Star(Alt(PP(P_IN_REGION), Inv(PP(P_IN_REGION)))), VO),
    )
    return _flat(node, _ctx(spark, sf), "s", "o")


SQL_PATH_STAR = W + """
, nt AS (SELECT * FROM triples WHERE graph = 'urn:g:nation'),
mem AS (SELECT 'urn:n:'||n_nationkey AS lex, n_regionkey AS rk FROM nation
        UNION ALL SELECT DISTINCT 'urn:r:'||n_regionkey, n_regionkey FROM nation),
allnodes AS (SELECT DISTINCT s_lex AS lex FROM nt UNION SELECT DISTINCT o_lex FROM nt)
SELECT a.lex AS s, b.lex AS o FROM mem a JOIN mem b ON a.rk = b.rk
UNION
SELECT lex, lex FROM allnodes
"""


def q_path_neg(spark, sf):
    """!(rdf:type) negated property set over the nation graph."""
    from .operators.paths import Neg

    node = GraphNode("urn:g:nation", PathPattern(VS, Neg([RDF_TYPE]), VO))
    return _flat(node, _ctx(spark, sf), "s", "o")


SQL_PATH_NEG = W + f"""
SELECT DISTINCT s_lex AS s, o_lex AS o FROM triples
WHERE graph = 'urn:g:nation' AND pred <> '{RDF_TYPE}'
"""


def q_path_neg_inv(spark, sf):
    """!(rdf:type|^inRegion) — negated property set with an INVERSE member
    (spec §9.1 / §18.2.2.3): forward edges whose pred is not rdf:type,
    UNION reversed edges whose pred is not inRegion."""
    from .operators.paths import Neg

    node = GraphNode("urn:g:nation", PathPattern(VS, Neg((RDF_TYPE,), (P_IN_REGION,)), VO))
    return _flat(node, _ctx(spark, sf), "s", "o")


SQL_PATH_NEG_INV = W + f"""
SELECT DISTINCT s, o FROM (
  SELECT s_lex AS s, o_lex AS o FROM triples
  WHERE graph = 'urn:g:nation' AND pred <> '{RDF_TYPE}'
  UNION
  SELECT o_lex AS s, s_lex AS o FROM triples
  WHERE graph = 'urn:g:nation' AND pred <> '{P_IN_REGION}'
)
"""


def q_subselect(spark, sf):
    """Sub-SELECT (ToMultiset): inner aggregate joined to the outer BGP."""
    inner = Group(
        BGP([T_(Var("n"), Iri(P_IN_REGION), Var("r"))]),
        ["r"],
        [Agg("n_nations", "count_star")],
    )
    node = inner.join(BGP([T_(Var("r"), Iri(P_NAME), Var("rname"))]))
    return _flat(Project(node, ["rname", "n_nations"]), _ctx(spark, sf), "rname", "n_nations")


SQL_SUBSELECT = """
SELECT r_name AS rname, CAST(COUNT(*) AS VARCHAR) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_reduced_types(spark, sf):
    """REDUCED (we always dedup — conformant, SURVEY §2.3)."""
    from .algebra import Reduced

    node = Reduced(Project(BGP([T_(VS, Iri(RDF_TYPE), Var("t"))]), ["t"]))
    return _flat(node, _ctx(spark, sf), "t")


SQL_REDUCED_TYPES = W + f"""
SELECT DISTINCT o_lex AS t FROM triples WHERE pred = '{RDF_TYPE}'
"""


def q_sample_region(spark, sf):
    """SAMPLE aggregate — deterministic here because each group is
    single-valued (one region name per nation)."""
    node = Group(
        BGP(
            [
                T_(Var("n"), Iri(P_IN_REGION), Var("r")),
                T_(Var("r"), Iri(P_NAME), Var("rname")),
            ]
        ),
        ["n"],
        [Agg("rname_s", "sample", V("rname"))],
    )
    return _flat(node, _ctx(spark, sf), "n", "rname_s")


SQL_SAMPLE_REGION = """
SELECT 'urn:n:'||n_nationkey AS n, r_name AS rname_s
FROM nation JOIN region ON n_regionkey = r_regionkey
"""


def q_builtins_num(spark, sf):
    """Numeric builtins (§17.4.4): ABS on integer arithmetic, CEIL/FLOOR
    and SPARQL ROUND (half toward +∞ — floor(x+0.5), SURVEY §2.8) on an
    integer/decimal division."""
    from .functions.builtins import ABS, CEIL, FLOOR, ROUND

    node = (
        BGP(
            [
                T_(Var("c"), Iri(RDF_TYPE), Iri("urn:c:Customer")),
                T_(Var("c"), Iri(P_NAME), Var("cname")),
                T_(Var("c"), Iri(P_ACCTBAL), Var("bal")),
            ]
        )
        .extend("babs", ABS(V("bal") - L(500000)))
        .extend("bceil", CEIL(V("bal") / L(1000)))
        .extend("bfloor", FLOOR(V("bal") / L(1000)))
        .extend("bround", ROUND(V("bal") / L(1000)))
    )
    return _flat(
        Project(node, ["cname", "babs", "bceil", "bfloor", "bround"]),
        _ctx(spark, sf),
        "cname", "babs", "bceil", "bfloor", "bround",
    )


SQL_BUILTINS_NUM = """
SELECT c_name AS cname,
       CAST(abs(CAST(round(c_acctbal*100) AS BIGINT) - 500000) AS VARCHAR) AS babs,
       CAST(CAST(ceil(CAST(round(c_acctbal*100) AS BIGINT) / 1000.0) AS BIGINT) AS VARCHAR) AS bceil,
       CAST(CAST(floor(CAST(round(c_acctbal*100) AS BIGINT) / 1000.0) AS BIGINT) AS VARCHAR) AS bfloor,
       CAST(CAST(floor(CAST(round(c_acctbal*100) AS BIGINT) / 1000.0 + 0.5) AS BIGINT) AS VARCHAR) AS bround
FROM customer
"""


def q_builtins_hash(spark, sf):
    """Hash builtins (§17.4.6): MD5 / SHA256 over nation names (SHA1/384/512
    are implemented too — pytest-covered; DuckDB has no sha1 to oracle it)."""
    from .functions.builtins import MD5, SHA256

    node = (
        BGP([T_(Var("n"), Iri(RDF_TYPE), Iri("urn:c:Nation")), T_(Var("n"), Iri(P_NAME), Var("nname"))])
        .extend("h_md5", MD5(V("nname")))
        .extend("h_sha256", SHA256(V("nname")))
    )
    return _flat(
        Project(node, ["nname", "h_md5", "h_sha256"]),
        _ctx(spark, sf),
        "nname", "h_md5", "h_sha256",
    )


SQL_BUILTINS_HASH = """
SELECT n_name AS nname, md5(n_name) AS h_md5, sha256(n_name) AS h_sha256
FROM nation
"""


def q_builtins_replace(spark, sf):
    """REGEX filter + REPLACE + STRBEFORE/STRAFTER (§17.4.3)."""
    from .functions.builtins import REGEX, REPLACE, STRAFTER, STRBEFORE

    node = (
        BGP([T_(Var("c"), Iri(RDF_TYPE), Iri("urn:c:Customer")), T_(Var("c"), Iri(P_NAME), Var("cname"))])
        .filter(REGEX(V("cname"), "00[1-9]$"))
        .extend("cid", STRAFTER(V("cname"), L("#")))
        .extend("cpfx", STRBEFORE(V("cname"), L("#")))
        .extend("cdash", REPLACE(V("cname"), "0+", "-"))
    )
    return _flat(
        Project(node, ["cname", "cid", "cpfx", "cdash"]),
        _ctx(spark, sf),
        "cname", "cid", "cpfx", "cdash",
    )


SQL_BUILTINS_REPLACE = """
SELECT c_name AS cname,
       CASE WHEN instr(c_name, '#') > 0 THEN substr(c_name, instr(c_name, '#') + 1) ELSE '' END AS cid,
       CASE WHEN instr(c_name, '#') > 0 THEN substr(c_name, 1, instr(c_name, '#') - 1) ELSE '' END AS cpfx,
       regexp_replace(c_name, '0+', '-', 'g') AS cdash
FROM customer WHERE regexp_matches(c_name, '00[1-9]$')
"""


def q_builtins_cond(spark, sf):
    """BOUND / IF / COALESCE over an OPTIONAL (unbound = NULL struct)."""
    from .functions.builtins import BOUND, COALESCE, IF

    left = BGP([T_(Var("n"), Iri(RDF_TYPE), Iri("urn:c:Nation")), T_(Var("n"), Iri(P_NAME), Var("nname"))])
    right = BGP(
        [
            T_(Var("su"), Iri(RDF_TYPE), Iri("urn:c:Supplier")),
            T_(Var("su"), Iri(P_IN_NATION), Var("n")),
            T_(Var("su"), Iri(P_ACCTBAL), Var("sbal")),
        ]
    )
    node = (
        LeftJoin(left, right, V("sbal") > L(990000))
        .extend("bal_or0", COALESCE(V("sbal"), L(0)))
        .extend("flag", IF(BOUND("sbal"), L("has"), L("none")))
    )
    return _flat(
        Project(node, ["nname", "bal_or0", "flag"]),
        _ctx(spark, sf),
        "nname", "bal_or0", "flag",
    )


SQL_BUILTINS_COND = """
SELECT n_name AS nname,
       CAST(COALESCE(CAST(round(s_acctbal*100) AS BIGINT), 0) AS VARCHAR) AS bal_or0,
       CASE WHEN s_suppkey IS NOT NULL THEN 'has' ELSE 'none' END AS flag
FROM nation LEFT JOIN supplier
  ON s_nationkey = n_nationkey AND round(s_acctbal*100) > 990000
"""


def q_builtins_term(spark, sf):
    """Term accessors (§17.4.2): DATATYPE(?o) per-datatype triple counts.
    DATATYPE of an IRI is an error → unbound (Rdf_dt lattice); COALESCE
    maps the unbound group to a sentinel so the output has no NULL keys."""
    from .functions.builtins import COALESCE, DATATYPE

    node = Group(
        BGP([T_(VS, Var("p"), VO)]).extend("dt", COALESCE(DATATYPE(V("o")), L("urn:x:unbound"))),
        ["dt"],
        [Agg("n", "count_star")],
    )
    return _flat(node, _ctx(spark, sf), "dt", "n")


SQL_BUILTINS_TERM = W + """
SELECT CASE WHEN o_kind = 2 THEN o_dtype ELSE 'urn:x:unbound' END AS dt,
       CAST(COUNT(*) AS VARCHAR) AS n
FROM triples GROUP BY 1
"""


def q_dedup_embedding(spark, sf):
    """Embedding-cosine near-dup pairs (exact tier; LSH-bucketed variant
    is dedup_embedding_lsh)."""
    from .operators.ann import near_dup_pairs

    return near_dup_pairs(_embs(spark, sf), threshold_x1e4=3000, max_id=150)


SQL_DEDUP_EMBEDDING = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           FROM embeddings WHERE vec_id < 150)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(round(list_cosine_similarity(a.e, b.e) * 10000) AS BIGINT) AS sim_x1e4
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.e, b.e) * 10000) >= 3000
"""


def q_dedup_embedding_lsh(spark, sf):
    """LSH-bucketed embedding near-dup (the 10^12-vector path); DuckDB
    mirror recomputes buckets + bucket-local pair cosines."""
    from .operators.ann import near_dup_pairs_lsh

    return near_dup_pairs_lsh(_embs(spark, sf), threshold_x1e4=3000, bits=4, dim=64)


SQL_DEDUP_EMBEDDING_LSH = BUCKET_CTE + """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                         CAST(eb.embedding AS DOUBLE[])) * 10000) AS BIGINT) AS sim_x1e4
FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
JOIN embeddings ea ON ea.vec_id = a.vec_id
JOIN embeddings eb ON eb.vec_id = b.vec_id
WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                   CAST(eb.embedding AS DOUBLE[])) * 10000) >= 3000
"""


def q_events_window(spark, sf):
    """Tumbling 60-min window counts + sums per event_type (the
    Structured-Streaming window aggregation, batch form)."""
    from .operators.events import tumbling_counts

    ev = spark.read.parquet(f"{sf}/events.parquet")
    return tumbling_counts(ev, minutes=60)


SQL_EVENTS_WINDOW = """
SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_x100
FROM events GROUP BY 1, 2
"""


def q_events_session(spark, sf):
    """Gap-based sessionization (30-min gap): per-user session/event counts
    — batch form of applyInPandasWithState session tracking."""
    from .operators.events import session_stats

    ev = spark.read.parquet(f"{sf}/events.parquet")
    return session_stats(ev, gap_minutes=30)


SQL_EVENTS_SESSION = """
WITH o AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, CAST(MAX(sid) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM s GROUP BY user_id
"""


QUERIES.update(
    {
        "ask_probe": (q_ask_probe, SQL_ASK_PROBE),
        "describe_term": (q_describe_term, SQL_DESCRIBE_TERM),
        "path_opt": (q_path_opt, SQL_PATH_OPT),
        "path_star": (q_path_star, SQL_PATH_STAR),
        "path_neg": (q_path_neg, SQL_PATH_NEG),
        "path_neg_inv": (q_path_neg_inv, SQL_PATH_NEG_INV),
        "subselect": (q_subselect, SQL_SUBSELECT),
        "reduced_types": (q_reduced_types, SQL_REDUCED_TYPES),
        "sample_region": (q_sample_region, SQL_SAMPLE_REGION),
        "builtins_num": (q_builtins_num, SQL_BUILTINS_NUM),
        "builtins_hash": (q_builtins_hash, SQL_BUILTINS_HASH),
        "builtins_replace": (q_builtins_replace, SQL_BUILTINS_REPLACE),
        "builtins_cond": (q_builtins_cond, SQL_BUILTINS_COND),
        "builtins_term": (q_builtins_term, SQL_BUILTINS_TERM),
        "dedup_embedding": (q_dedup_embedding, SQL_DEDUP_EMBEDDING),
        "dedup_embedding_lsh": (q_dedup_embedding_lsh, SQL_DEDUP_EMBEDDING_LSH),
        "events_window": (q_events_window, SQL_EVENTS_WINDOW),
        "events_session": (q_events_session, SQL_EVENTS_SESSION),
    }
)


# ---------------------------------------------------------------------------
# SPARQL text front end, batch 2: every composite pattern form through the
# full lex→parse→algebra→DataFrame path (EP1), against the same oracles as
# the programmatic-algebra entries
# ---------------------------------------------------------------------------


def q_sparql_text_optional(spark, sf):
    """Text OPTIONAL + inner FILTER + BIND(COALESCE/IF/BOUND)."""
    return _sparql(
        spark, sf,
        """SELECT ?nname ?bal_or0 ?flag WHERE {
             ?n a c:Nation ; p:name ?nname .
             OPTIONAL { ?su a c:Supplier ; p:inNation ?n ; p:acctbal ?sbal .
                        FILTER(?sbal > 990000) }
             BIND(COALESCE(?sbal, 0) AS ?bal_or0)
             BIND(IF(BOUND(?sbal), "has", "none") AS ?flag)
           }""",
        "nname", "bal_or0", "flag",
    )


def q_sparql_text_union(spark, sf):
    """Text UNION of two tagged groups."""
    return _sparql(
        spark, sf,
        """SELECT ?name ?tag WHERE {
             { ?x a c:Customer ; p:name ?name . BIND("c" AS ?tag) }
             UNION
             { ?x a c:Supplier ; p:name ?name . BIND("s" AS ?tag) }
           }""",
        "name", "tag",
    )


def q_sparql_text_minus(spark, sf):
    """Text MINUS."""
    return _sparql(
        spark, sf,
        """SELECT ?cname WHERE {
             ?c a c:Customer ; p:name ?cname .
             MINUS { ?o p:customer ?c ; p:priority "1-URGENT" . }
           }""",
        "cname",
    )


def q_sparql_text_exists(spark, sf):
    """Text FILTER EXISTS."""
    return _sparql(
        spark, sf,
        """SELECT ?nname WHERE {
             ?n a c:Nation ; p:name ?nname .
             FILTER EXISTS { ?c p:inNation ?n ; p:acctbal ?b . FILTER(?b > 980000) }
           }""",
        "nname",
    )


def q_sparql_text_values(spark, sf):
    """Text VALUES inline data."""
    return _sparql(
        spark, sf,
        """SELECT ?rname ?nname WHERE {
             VALUES ?rname { "ASIA" "EUROPE" }
             ?r p:name ?rname . ?n p:inRegion ?r ; p:name ?nname .
           }""",
        "rname", "nname",
    )


def q_sparql_text_graph(spark, sf):
    """Text GRAPH ?g + COUNT."""
    return _sparql(
        spark, sf,
        """SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } } GROUP BY ?g""",
        "g", "n",
    )


def q_sparql_text_subselect(spark, sf):
    """Text nested sub-SELECT with aggregation joined to the outer pattern."""
    return _sparql(
        spark, sf,
        """SELECT ?rname ?n_nations WHERE {
             { SELECT ?r (COUNT(*) AS ?n_nations) WHERE { ?n p:inRegion ?r } GROUP BY ?r }
             ?r p:name ?rname .
           }""",
        "rname", "n_nations",
    )


def q_sparql_text_construct(spark, sf):
    """Text CONSTRUCT → TRIPLES DataFrame."""
    from .sparql import execute

    out = execute(
        _SPARQL_PFX
        + """CONSTRUCT { ?c p:richIn ?n } WHERE {
               ?c p:acctbal ?b ; p:inNation ?n . FILTER(?b >= 999000)
             }""",
        _ctx(spark, sf),
    )
    return out.select(F.col("s_lex").alias("s"), F.col("pred").alias("p"), F.col("o_lex").alias("o"))


def q_sparql_text_ask(spark, sf):
    """Text ASK (true + false probes)."""
    from .sparql import execute

    ctx = _ctx(spark, sf)
    rows = [
        ("asia_region", str(execute(_SPARQL_PFX + 'ASK { ?r p:name "ASIA" }', ctx)).lower()),
        ("atlantis_region", str(execute(_SPARQL_PFX + 'ASK { ?r p:name "ATLANTIS" }', ctx)).lower()),
    ]
    return spark.createDataFrame(rows, "probe string, result string")


def q_sparql_text_describe(spark, sf):
    """Text DESCRIBE with explicit IRIs."""
    from .sparql import execute

    out = execute(_SPARQL_PFX + "DESCRIBE <urn:n:0> <urn:r:1>", _ctx(spark, sf))
    return out.select(F.col("s_lex").alias("s"), F.col("pred").alias("p"), F.col("o_lex").alias("o"))


QUERIES.update(
    {
        "sparql_text_optional": (q_sparql_text_optional, SQL_BUILTINS_COND),
        "sparql_text_union": (q_sparql_text_union, SQL_UNION_TAG),
        "sparql_text_minus": (q_sparql_text_minus, SQL_MINUS_CUSTOMERS),
        "sparql_text_exists": (q_sparql_text_exists, SQL_EXISTS_NATION),
        "sparql_text_values": (q_sparql_text_values, SQL_VALUES_REGIONS),
        "sparql_text_graph": (q_sparql_text_graph, SQL_GRAPH_COUNTS),
        "sparql_text_subselect": (q_sparql_text_subselect, SQL_SUBSELECT),
        "sparql_text_construct": (q_sparql_text_construct, SQL_CONSTRUCT_RICH),
        "sparql_text_ask": (q_sparql_text_ask, SQL_ASK_PROBE),
        "sparql_text_describe": (q_sparql_text_describe, SQL_DESCRIBE_TERM),
    }
)


# ---------------------------------------------------------------------------
# coverage batch 3: graph-API probes (rdf_graph.ml surface) + N-Quads writer
# ---------------------------------------------------------------------------


def q_graph_probes(spark, sf):
    """subjects_of / objects_of / predicates_of probes (SURVEY §2.1):
    P/O-bound, S/P-bound, and S/O-bound patterns unioned with a probe tag."""
    from .graph import Graph

    g = Graph(triples_view(spark, sf))
    subs = (
        g.subjects_of(Iri(P_IN_REGION), Iri("urn:r:2"))
        .select(F.lit("so").alias("probe"), F.col("s_lex").alias("lex"))
    )
    objs = (
        g.objects_of(Iri("urn:n:3"), Iri(P_NAME))
        .select(F.lit("oo").alias("probe"), F.col("o_lex").alias("lex"))
    )
    preds = (
        g.predicates_of(Iri("urn:n:3"), Iri("urn:r:3"))
        .select(F.lit("po").alias("probe"), F.col("pred").alias("lex"))
    )
    return subs.unionByName(objs).unionByName(preds)


SQL_GRAPH_PROBES = """
SELECT 'so' AS probe, 'urn:n:'||n_nationkey AS lex FROM nation WHERE n_regionkey = 2
UNION ALL
SELECT 'oo', n_name FROM nation WHERE n_nationkey = 3
UNION ALL
SELECT 'po', 'urn:p:inRegion' FROM nation WHERE n_nationkey = 3 AND n_regionkey = 3
"""


def q_serialize_nq(spark, sf):
    """N-Quads writer over the region graph (graph tag in position 4)."""
    from .serializers import to_nquads

    df = triples_view(spark, sf).filter(F.col("graph") == "urn:g:region")
    return to_nquads(df).select(F.col("line"))


SQL_SERIALIZE_NQ = """
SELECT '<urn:r:'||r_regionkey||'> <urn:p:name> "'||r_name||'" <urn:g:region> .' AS line FROM region
UNION ALL
SELECT '<urn:r:'||r_regionkey||'> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <urn:c:Region> <urn:g:region> .' FROM region
"""


QUERIES.update(
    {
        "graph_probes": (q_graph_probes, SQL_GRAPH_PROBES),
        "serialize_nq": (q_serialize_nq, SQL_SERIALIZE_NQ),
    }
)


def q_part_scan(spark, sf):
    """Selective scan over part: predicate + column pruning must reach the
    parquet reader (PushedFilters / 3-column ReadSchema — SURVEY §4)."""
    p = spark.read.parquet(f"{sf}/part.parquet")
    return (
        p.filter((F.col("p_size") >= 40) & (F.col("p_type").startswith("SMALL")))
        .select(
            "p_partkey",
            "p_brand",
            F.round(F.col("p_retailprice") * 100).cast("long").alias("price_x100"),
        )
    )


SQL_PART_SCAN = """
SELECT p_partkey, p_brand, CAST(round(p_retailprice*100) AS BIGINT) AS price_x100
FROM part WHERE p_size >= 40 AND p_type LIKE 'SMALL%'
"""


def q_bcast_join(spark, sf):
    """Fact-dim broadcast join: lineitem ⋈ broadcast(part) → revenue per
    brand. The dim side is explicitly broadcast — no shuffle of the fact
    table, the single exchange is the final partial/final aggregation."""
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    p = spark.read.parquet(f"{sf}/part.parquet").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")).alias(
                "revenue_x100"
            ),
        )
    )


SQL_BCAST_JOIN = """
SELECT p_brand, COUNT(*) AS n_items,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_x100
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


QUERIES.update(
    {
        "part_scan": (q_part_scan, SQL_PART_SCAN),
        "bcast_join": (q_bcast_join, SQL_BCAST_JOIN),
    }
)


def q_agg_variants(spark, sf):
    """Aggregate variants (§18.5.1): COUNT(DISTINCT), AVG (floored to an
    integer lex — raw double lexicals don't compare across engines),
    SUM(DISTINCT)."""
    from .functions.builtins import FLOOR

    node = Group(
        BGP(
            [
                T_(Var("c"), Iri(RDF_TYPE), Iri("urn:c:Customer")),
                T_(Var("c"), Iri(P_IN_NATION), Var("n")),
                T_(Var("c"), Iri(P_SEGMENT), Var("seg")),
                T_(Var("c"), Iri(P_ACCTBAL), Var("bal")),
            ]
        ),
        ["n"],
        [
            Agg("n_segs", "count", V("seg"), distinct=True),
            Agg("avg_bal", "avg", V("bal")),
            Agg("sum_dbal", "sum", V("bal"), distinct=True),
        ],
    ).extend("avg_floor", FLOOR(V("avg_bal")))
    return _flat(Project(node, ["n", "n_segs", "avg_floor", "sum_dbal"]), _ctx(spark, sf),
                 "n", "n_segs", "avg_floor", "sum_dbal")


SQL_AGG_VARIANTS = """
SELECT 'urn:n:'||c_nationkey AS n,
       CAST(COUNT(DISTINCT c_mktsegment) AS VARCHAR) AS n_segs,
       CAST(CAST(floor(AVG(CAST(round(c_acctbal*100) AS BIGINT))) AS BIGINT) AS VARCHAR) AS avg_floor,
       CAST(SUM(DISTINCT CAST(round(c_acctbal*100) AS BIGINT)) AS VARCHAR) AS sum_dbal
FROM customer GROUP BY c_nationkey
"""


def q_builtins_term2(spark, sf):
    """Term-constructor builtins (§17.4.2/3): STRLANG + LANG + LANGMATCHES,
    STRDT + DATATYPE, IRI(), CONCAT, ENCODE_FOR_URI."""
    from .functions.builtins import (
        CONCAT,
        DATATYPE,
        ENCODE_FOR_URI,
        IRI,
        LANG,
        LANGMATCHES,
        STRDT,
        STRLANG,
    )

    node = (
        BGP([T_(Var("n"), Iri(RDF_TYPE), Iri("urn:c:Nation")), T_(Var("n"), Iri(P_NAME), Var("nname"))])
        .extend("tagged", STRLANG(V("nname"), "en-US"))
        .extend("tag", LANG(V("tagged")))
        .filter(LANGMATCHES(LANG(V("tagged")), L("en")))
        .extend("typed", STRDT(V("nname"), "urn:dt:name"))
        .extend("tdt", DATATYPE(V("typed")))
        .extend("slug", IRI(CONCAT(L("urn:x:"), ENCODE_FOR_URI(V("nname")))))
    )
    return _flat(
        Project(node, ["nname", "tag", "tdt", "slug"]),
        _ctx(spark, sf),
        "nname", "tag", "tdt", "slug",
    )


SQL_BUILTINS_TERM2 = """
SELECT n_name AS nname, 'en-US' AS tag, 'urn:dt:name' AS tdt,
       'urn:x:' || replace(replace(n_name, '%', '%25'), ' ', '%20') AS slug
FROM nation
"""


def q_agg_decimal(spark, sf):
    """Exact decimal aggregation (§18.5.1 / rdf_dt.ml's exact decimals):
    SUM over xsd:integer values beyond 2^53 must not drift through double
    (group "a": 2^53+1 + 2^53+3 + 1), AVG over integers is xsd:decimal,
    and SUM/AVG of xsd:decimal keeps exact lexicals (group "b":
    0.1+0.2 = 0.3 exactly, not 0.30000000000000004)."""
    from .functions.builtins import V as _V
    from .types import XSD_DECIMAL, XSD_INTEGER

    rows = [
        {"k": Literal("a"), "v": Literal("9007199254740993", dtype=XSD_INTEGER)},
        {"k": Literal("a"), "v": Literal("9007199254740995", dtype=XSD_INTEGER)},
        {"k": Literal("a"), "v": Literal("1", dtype=XSD_INTEGER)},
        {"k": Literal("b"), "v": Literal("0.1", dtype=XSD_DECIMAL)},
        {"k": Literal("b"), "v": Literal("0.2", dtype=XSD_DECIMAL)},
    ]
    node = Group(Values(rows), ["k"], [Agg("sum_v", "sum", _V("v")), Agg("avg_v", "avg", _V("v"))])
    return _flat(node, _ctx(spark, sf), "k", "sum_v", "avg_v")


SQL_AGG_DECIMAL = """
SELECT 'a' AS k,
  CAST(CAST('9007199254740993' AS HUGEINT) + CAST('9007199254740995' AS HUGEINT) + 1 AS VARCHAR) AS sum_v,
  CAST((CAST('9007199254740993' AS HUGEINT) + CAST('9007199254740995' AS HUGEINT) + 1) // 3 AS VARCHAR) AS avg_v
UNION ALL
SELECT 'b',
  rtrim(rtrim(CAST(CAST('0.1' AS DECIMAL(38,6)) + CAST('0.2' AS DECIMAL(38,6)) AS VARCHAR), '0'), '.'),
  rtrim(rtrim(CAST(CAST((CAST('0.1' AS DECIMAL(38,6)) + CAST('0.2' AS DECIMAL(38,6))) / 2 AS DECIMAL(38,6)) AS VARCHAR), '0'), '.')
"""


QUERIES.update(
    {
        "agg_variants": (q_agg_variants, SQL_AGG_VARIANTS),
        "agg_decimal": (q_agg_decimal, SQL_AGG_DECIMAL),
        "builtins_term2": (q_builtins_term2, SQL_BUILTINS_TERM2),
    }
)


def q_sparql_update(spark, sf):
    """SPARQL 1.1 UPDATE sequence (engine addition — reference is
    query-only): DELETE WHERE, INSERT DATA, and a DELETE/INSERT ... WHERE
    rename, applied functionally to the region graph; the result is the
    full post-update region graph."""
    from .sparql import execute_update

    upd = """
    PREFIX p: <urn:p:>
    DELETE WHERE { GRAPH <urn:g:region> { <urn:r:1> p:name ?n } } ;
    INSERT DATA { GRAPH <urn:g:region> { <urn:r:9> p:name "NEWLAND" } } ;
    DELETE { GRAPH <urn:g:region> { ?r p:name ?n } }
    INSERT { GRAPH <urn:g:region> { ?r <urn:p:name2> ?n } }
    WHERE { GRAPH <urn:g:region> { ?r p:name ?n . FILTER(STRSTARTS(?n, "A")) } }
    """
    out = execute_update(upd, triples_view(spark, sf))
    return out.filter(F.col("graph") == "urn:g:region").select(
        F.col("s_lex").alias("s"), F.col("pred").alias("p"), F.col("o_lex").alias("o")
    )


SQL_SPARQL_UPDATE = f"""
SELECT 'urn:r:'||r_regionkey AS s, '{RDF_TYPE}' AS p, 'urn:c:Region' AS o FROM region
UNION ALL
SELECT 'urn:r:'||r_regionkey,
       CASE WHEN r_name LIKE 'A%' THEN 'urn:p:name2' ELSE 'urn:p:name' END, r_name
FROM region WHERE r_regionkey <> 1
UNION ALL
SELECT 'urn:r:9', 'urn:p:name', 'NEWLAND'
"""

QUERIES["sparql_update"] = (q_sparql_update, SQL_SPARQL_UPDATE)


def q_graph_addrem(spark, sf):
    """Graph mutators (rdf_graph.ml :: add_triple / rem_triple, set
    semantics): add one new + one duplicate triple to the region graph,
    remove one existing — triple count per subject afterwards.

    The r:2 block is the three-valued-logic regression case: a lang-tagged
    and a typed literal sharing region 2's plain "ASIA" lexical form are
    added, then ONLY the lang-tagged one is removed — with plain `==`
    disjuncts the NULL o_dtype/o_lang comparisons used to drop the plain
    and typed siblings too (rem_triple now matches with eqNullSafe)."""
    from .graph import Graph

    g = Graph(triples_view(spark, sf).filter(F.col("graph") == "urn:g:region"), name="urn:g:region")
    g2 = (
        g.add_triple(Iri("urn:r:99"), Iri(P_NAME), Literal("OCEANIA"))           # new
        .add_triple(Iri("urn:r:0"), Iri(P_NAME), Literal("AFRICA"))              # dup → no-op
        .add_triple(Iri("urn:r:2"), Iri(P_NAME), Literal("ASIA", lang="en"))     # lang twin
        .add_triple(Iri("urn:r:2"), Iri(P_NAME), Literal("ASIA", dtype="urn:dt:x"))  # typed twin
        .rem_triple(Iri("urn:r:2"), Iri(P_NAME), Literal("ASIA", lang="en"))     # exact delete: twins survive
        .rem_triple(Iri("urn:r:1"), Iri(P_NAME), Literal("AMERICA"))             # delete
    )
    return g2.df.groupBy(F.col("s_lex").alias("s")).agg(F.count(F.lit(1)).alias("n_triples"))


SQL_GRAPH_ADDREM = """
SELECT 'urn:r:'||r_regionkey AS s,
       CAST(CASE WHEN r_regionkey = 1 THEN 1 WHEN r_regionkey = 2 THEN 3 ELSE 2 END AS BIGINT) AS n_triples
FROM region
UNION ALL
SELECT 'urn:r:99', 1
"""

QUERIES["graph_addrem"] = (q_graph_addrem, SQL_GRAPH_ADDREM)


def q_media_ann(spark, sf):
    """Composed multimodal path — binary column → stub feature extraction
    (mapInPandas) → brute cosine top-k over the features. The shape of a
    production image-dedup / similar-media query. Full value oracle: the
    stub features are sha256-derived, so DuckDB rebuilds them exactly."""
    from .operators.ann import cosine_topk
    from .operators.media import media_features

    docs = _docs(spark, sf).filter(F.col("doc_id") < 300).select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.col("text").cast("binary").alias("content"),
    )
    feats = media_features(docs, dim=16).select(
        F.col("media_id").cast("long").alias("vec_id"), F.col("feature").alias("embedding")
    )
    return cosine_topk(feats, query_id=0, k=5)


#: mirrors operators/media.py :: media_features — component i of the stub
#: embedding is byte i of sha256(text) mapped to [-1, 1]
SQL_MEDIA_ANN = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS vec_id, sha256(text) AS h
  FROM documents WHERE doc_id < 300
),
comp AS (
  SELECT vec_id, i,
         (((instr('0123456789abcdef', substr(h, CAST(i*2+1 AS INT), 1)) - 1) * 16
         + (instr('0123456789abcdef', substr(h, CAST(i*2+2 AS INT), 1)) - 1)) / 255.0) * 2 - 1 AS v
  FROM d, unnest(range(16)) t(i)
),
vecs AS (SELECT vec_id, list(v ORDER BY i) AS emb FROM comp GROUP BY vec_id),
q AS (SELECT emb AS qe FROM vecs WHERE vec_id = 0)
SELECT vec_id,
       CAST(round(list_cosine_similarity(emb, qe) * 10000) AS BIGINT) AS sim_x1e4
FROM vecs, q WHERE vec_id <> 0
ORDER BY sim_x1e4 DESC, vec_id ASC LIMIT 5
"""


def q_media_resize(spark, sf):
    """Resize plumbing — output payload is exactly w*h bytes, and the
    deterministic stub plane (sha256(content) tiled) is value-oracled via
    its hex image."""
    from .operators.media import resize_media

    docs = _docs(spark, sf).filter(F.col("doc_id") < 200).select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.col("text").cast("binary").alias("content"),
    )
    out = resize_media(docs, width=16, height=16)
    return out.select(
        "media_id", "width", "height",
        F.length("content").alias("n_bytes"),
        F.lower(F.hex("content")).alias("payload_hex"),
    )


#: 16×16 = 256 bytes = the 32-byte sha256 seed tiled 8× (media.py ::
#: resize_media's _resize_stub)
SQL_MEDIA_RESIZE = """
SELECT CAST(doc_id AS VARCHAR) AS media_id,
       CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
       CAST(256 AS INT) AS n_bytes,
       repeat(sha256(text), 8) AS payload_hex
FROM documents WHERE doc_id < 200
"""


QUERIES.update(
    {
        "media_ann": (q_media_ann, SQL_MEDIA_ANN),
        "media_resize": (q_media_resize, SQL_MEDIA_RESIZE),
    }
)


def q_extract_errors(spark, sf):
    """Rows-only: parser-error lineage rows from a corpus seeded with
    malformed embedded blocks — errors are data (pred=urn:x-ords:error),
    never task failures (SURVEY §9 extraction row)."""
    from .datagen import gen_pages_df
    from .extract import ERROR_PRED, extract_triples, split_errors

    pages = gen_pages_df(spark, 300, parts=4)
    _, errors = split_errors(extract_triples(pages))
    return (
        errors.groupBy("extractor")
        .agg(F.count(F.lit(1)).alias("n_errors"))
        .orderBy("extractor")
    )


def q_sparql_text_describe_var(spark, sf):
    """Text DESCRIBE ?var WHERE {...}: the variable's bindings are
    resolved first, then described (rdf_sparql.ml's naive DESCRIBE)."""
    from .sparql import execute

    out = execute(
        _SPARQL_PFX + "DESCRIBE ?r WHERE { ?r a c:Region }",
        _ctx(spark, sf),
    )
    return out.select(F.col("s_lex").alias("s"), F.col("pred").alias("p"), F.col("o_lex").alias("o"))


SQL_SPARQL_TEXT_DESCRIBE_VAR = W + """
SELECT s_lex AS s, pred AS p, o_lex AS o FROM triples
WHERE s_lex LIKE 'urn:r:%'
"""

QUERIES.update(
    {
        "extract_errors": (q_extract_errors, None),
        "sparql_text_describe_var": (q_sparql_text_describe_var, SQL_SPARQL_TEXT_DESCRIBE_VAR),
    }
)


def q_cc_distributed(spark, sf):
    """Same components as cc_components but with driver_threshold=0 —
    forces the distributed large-star/small-star rounds (the 10^12-doc
    configuration), so the correctness gate exercises BOTH CC paths."""
    from .operators.cc import connected_components

    mapping = connected_components(_cc_edges(spark, sf), driver_threshold=0)
    return (
        mapping.groupBy("component")
        .agg(F.count(F.lit(1)).alias("csize"))
        .select(F.regexp_replace("component", r"^0\|", "").alias("canon"), "csize")
    )


QUERIES["cc_distributed"] = (q_cc_distributed, SQL_CC_COMPONENTS)


# ---------------------------------------------------------------------------
# round-3 additions: dataset-clause exclusivity, deep-chain paths, bulk
# UPDATE at store scale, HAVING+GROUP_CONCAT, mixed-kind ORDER BY
# ---------------------------------------------------------------------------


def q_sparql_text_from_empty(spark, sf):
    """§13.2 exclusivity: FROM-only dataset ⇒ the named-graph side is
    EMPTY — GRAPH ?g patterns match nothing (r2 ADVICE, fixed r3)."""
    return _sparql(
        spark, sf,
        """SELECT ?g WHERE { GRAPH ?g { ?s p:name ?n } }""".replace(
            "SELECT ?g", "SELECT ?g FROM <urn:g:region>"
        ),
        "g",
    )


SQL_SPARQL_TEXT_FROM_EMPTY = "SELECT 'never' AS g WHERE 1 = 0"


def q_path_deep(spark, sf):
    """Deep-chain p+ (the r2 scale flag): a 127-edge chain built from
    documents doc_ids; the hybrid closure escalates from frontier rounds to
    path DOUBLING, finishing in O(log d) rounds instead of O(d). Returns
    descendants-per-source over the full 8128-pair closure."""
    from .operators.paths import transitive_closure

    d = _docs(spark, sf).filter(F.col("doc_id") < 128)
    edges = d.select(
        F.concat(F.lit("urn:d:"), F.col("doc_id")).alias("src"),
        F.concat(F.lit("urn:d:"), F.col("doc_id") + 1).alias("dst"),
    ).filter(F.col("doc_id") < 127)
    # linear_rounds=2: the relation is KNOWN deep (that's the point of the
    # query), so doubling starts almost immediately — 8 total rounds for
    # d=127 instead of the general-purpose default's 13
    closure = transitive_closure(edges, linear_rounds=2)
    return closure.groupBy("src").agg(F.count(F.lit(1)).alias("n_desc"))


SQL_PATH_DEEP = """
SELECT 'urn:d:'||doc_id AS src, CAST(127 - doc_id AS BIGINT) AS n_desc
FROM documents WHERE doc_id < 127
"""


def q_update_bulk(spark, sf):
    """Store-scale SPARQL UPDATE (r2 task 8): one DELETE/INSERT…WHERE
    renames every customer segment triple (1.5k solutions at sf0.01, 15k
    at sf0.1) against the full triple store — the request-sized
    dropDuplicates path exercised at data scale, not parse scale."""
    from .sparql import execute_update

    upd = """
    PREFIX p: <urn:p:>
    DELETE { GRAPH <urn:g:customer> { ?c p:segment ?seg } }
    INSERT { GRAPH <urn:g:customer> { ?c <urn:p:segment2> ?seg } }
    WHERE { GRAPH <urn:g:customer> { ?c p:segment ?seg } }
    """
    out = execute_update(upd, triples_view(spark, sf))
    return (
        out.filter(F.col("pred").isin("urn:p:segment", "urn:p:segment2"))
        .groupBy("pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_UPDATE_BULK = """
SELECT 'urn:p:segment2' AS pred, COUNT(*) AS n FROM customer
"""


def q_agg_having(spark, sf):
    """GROUP_CONCAT(DISTINCT …; SEPARATOR) + HAVING combined (the r2
    bug-finding class): regions keep their sorted-distinct segment list
    only when populous enough."""
    return _sparql(
        spark, sf,
        """SELECT ?rname (GROUP_CONCAT(DISTINCT ?seg; SEPARATOR="|") AS ?segs)
           WHERE {
             ?c p:inNation ?n . ?n p:inRegion ?r .
             ?r p:name ?rname . ?c p:segment ?seg .
           }
           GROUP BY ?rname HAVING (COUNT(?c) > 250)""",
        "rname", "segs",
    )


SQL_AGG_HAVING = """
SELECT r_name AS rname,
       string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment) AS segs
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name HAVING COUNT(*) > 250
"""


def q_orderby_mixed(spark, sf):
    """ORDER BY over mixed term kinds (SPARQL total order: IRI < literal)
    made hash-observable via DESC + LIMIT: the surviving row set encodes
    the cross-kind ordering."""
    return _sparql(
        spark, sf,
        """SELECT ?s ?o WHERE { GRAPH <urn:g:region> { ?s ?p ?o } }
           ORDER BY DESC(?o) DESC(?s) LIMIT 7""",
        "s", "o",
    )


SQL_ORDERBY_MIXED = """
SELECT s, o FROM (
  SELECT 'urn:r:'||r_regionkey AS s, 'urn:c:Region' AS o, 0 AS k FROM region
  UNION ALL SELECT 'urn:r:'||r_regionkey, r_name, 1 FROM region
) ORDER BY k DESC, o DESC, s DESC LIMIT 7
"""


def q_sparql_text_construct_where(spark, sf):
    """CONSTRUCT WHERE shorthand (§16.2.4, new in r2 — now driver-gated):
    the pattern doubles as template."""
    from .sparql import execute

    out = execute(
        _SPARQL_PFX + "CONSTRUCT WHERE { ?r a c:Region . ?r p:name ?n }",
        _ctx(spark, sf),
    )
    return out.select(
        F.col("s_lex").alias("s"), F.col("pred").alias("p"), F.col("o_lex").alias("o")
    )


SQL_SPARQL_TEXT_CONSTRUCT_WHERE = f"""
SELECT 'urn:r:'||r_regionkey AS s, '{RDF_TYPE}' AS p, 'urn:c:Region' AS o FROM region
UNION ALL
SELECT 'urn:r:'||r_regionkey, 'urn:p:name', r_name FROM region
"""


QUERIES.update(
    {
        "sparql_text_from_empty": (q_sparql_text_from_empty, SQL_SPARQL_TEXT_FROM_EMPTY),
        "path_deep": (q_path_deep, SQL_PATH_DEEP),
        "update_bulk": (q_update_bulk, SQL_UPDATE_BULK),
        "agg_having": (q_agg_having, SQL_AGG_HAVING),
        "orderby_mixed": (q_orderby_mixed, SQL_ORDERBY_MIXED),
        "sparql_text_construct_where": (
            q_sparql_text_construct_where,
            SQL_SPARQL_TEXT_CONSTRUCT_WHERE,
        ),
    }
)


# ---------------------------------------------------------------------------
# driver window (VERDICT r2 task 1): the round driver snapshots the FIRST
# 50 registry entries (r1/r2 CORRECTNESS keysets are exactly registry
# positions 0-49), so dict order is an interface. Never-driver-checked
# queries come first, then this round's new queries, then the three r1
# greens that r2 insertions rotated out of the window, then flagship
# re-confirmations; everything else keeps its historical row. The order is
# FROZEN by tests/test_suite_registry.py — append new queries to the tail
# of DRIVER_WINDOW (displacing a re-confirmation) or after position 49,
# never by insertion into QUERIES construction order.
# ---------------------------------------------------------------------------

DRIVER_WINDOW = [
    # 36 never-driver-checked as of CORRECTNESS_r02
    "path_neg_inv", "reduced_types", "sample_region", "builtins_num",
    "builtins_hash", "builtins_replace", "builtins_cond", "builtins_term",
    "dedup_embedding", "dedup_embedding_lsh", "events_window", "events_session",
    "sparql_text_optional", "sparql_text_union", "sparql_text_minus",
    "sparql_text_exists", "sparql_text_values", "sparql_text_graph",
    "sparql_text_subselect", "sparql_text_construct", "sparql_text_ask",
    "sparql_text_describe", "graph_probes", "serialize_nq", "part_scan",
    "bcast_join", "agg_variants", "agg_decimal", "builtins_term2",
    "sparql_update", "graph_addrem", "media_ann", "media_resize",
    "extract_errors", "sparql_text_describe_var", "cc_distributed",
    # round-3 additions
    "sparql_text_from_empty", "path_deep", "update_bulk", "agg_having",
    "orderby_mixed", "sparql_text_construct_where",
    # r1 greens rotated out of the r2 window
    "path_star", "path_neg", "subselect",
    # flagship re-confirmations
    "bgp_join", "agg_nation", "dedup_clusters", "cc_components", "dedup_minhash",
]

assert len(DRIVER_WINDOW) == 50 and len(set(DRIVER_WINDOW)) == 50
_rest = [n for n in QUERIES if n not in set(DRIVER_WINDOW)]
QUERIES = {n: QUERIES[n] for n in [*DRIVER_WINDOW, *_rest]}


def q_dedup_paragraph(spark, sf):
    """Paragraph-level exact dedup (C4 recipe, textops.paragraph_dedup):
    synthetic 4-paragraph documents where every paragraph text recurs
    twice across the corpus (para i = documents text of i % 40) — the
    second occurrence of each paragraph must be dropped and the survivors
    reassembled in position order."""
    from .operators.textops import paragraph_dedup

    base = _docs(spark, sf).filter(F.col("doc_id") < 40).select(
        F.col("doc_id").alias("k"), "text"
    )
    ids = _docs(spark, sf).filter(F.col("doc_id") < 80).select("doc_id")
    combined = (
        ids.join(base, ids["doc_id"] % 40 == base["k"])
        .select(
            (F.col("doc_id") / 4).cast("long").alias("gid"),
            (F.col("doc_id") % 4).alias("pos"),
            "text",
        )
        .groupBy("gid")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("pos", "text"))), lambda s: s["text"]),
                "\n\n",
            ).alias("text")
        )
        .withColumnRenamed("gid", "doc_id")
    )
    out = paragraph_dedup(combined)
    return out.select(
        "doc_id", F.md5("text").alias("text_md5"), F.col("n_paras").cast("long").alias("n_paras")
    )


SQL_DEDUP_PARAGRAPH = """
WITH paras AS (
  SELECT i.doc_id // 4 AS gid, i.doc_id % 4 AS pos, b.text, md5(b.text) AS h
  FROM (SELECT doc_id FROM documents WHERE doc_id < 80) i
  JOIN (SELECT doc_id AS k, text FROM documents WHERE doc_id < 40) b
    ON i.doc_id % 40 = b.k
),
kept AS (
  SELECT gid, pos, text,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY gid, pos) AS rn
  FROM paras
)
SELECT gid AS doc_id,
       md5(string_agg(text, chr(10)||chr(10) ORDER BY pos)) AS text_md5,
       COUNT(*) AS n_paras
FROM kept WHERE rn = 1 GROUP BY gid
"""

QUERIES["dedup_paragraph"] = (q_dedup_paragraph, SQL_DEDUP_PARAGRAPH)

# deliberate window edit (policy in the DRIVER_WINDOW comment): the new
# paragraph-dedup operator takes the driver slot of re-confirmation
# dedup_minhash (green in r1 AND r2 — its historical rows stand)
DRIVER_WINDOW[DRIVER_WINDOW.index("dedup_minhash")] = "dedup_paragraph"
_rest = [n for n in QUERIES if n not in set(DRIVER_WINDOW)]
QUERIES = {n: QUERIES[n] for n in [*DRIVER_WINDOW, *_rest]}


def q_olap_shipping(spark, sf):
    """Classic OLAP join-agg-topk over the relational layer (TPC-H Q3
    shape): orders × lineitem × customer, segment filter pushed to the
    customer scan, map-side partial aggregation, TakeOrderedAndProject
    top-10 — the relational counterpart of the SPARQL bgp_join plan."""
    cu = spark.read.parquet(f"{sf}/customer.parquet").filter(F.col("c_mktsegment") == "BUILDING")
    od = spark.read.parquet(f"{sf}/orders.parquet").filter(F.col("o_orderdate") < "1995-03-15")
    li = spark.read.parquet(f"{sf}/lineitem.parquet").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .join(F.broadcast(cu), od["o_custkey"] == cu["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            ).alias("revenue_x100")
        )
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_orderpriority",
            "revenue_x100",
        )
        .orderBy(F.desc("revenue_x100"), F.asc("o_date"), F.asc("l_orderkey"))
        .limit(10)
    )


SQL_OLAP_SHIPPING = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_orderpriority,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_x100
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_x100 DESC, o_date ASC, l_orderkey ASC LIMIT 10
"""

QUERIES["olap_shipping"] = (q_olap_shipping, SQL_OLAP_SHIPPING)


def q_sparql_text_exists_expr(spark, sf):
    """Expression-level EXISTS/NOT EXISTS (§17.4.1.4) — forms a top-level
    semi/anti join cannot express: EXISTS under BIND and inside a FILTER
    disjunction. Decorrelated into flag joins by algebra.ExistsMark (one
    distinct-key semi join + one equi join back; never per-row)."""
    return _sparql(
        spark, sf,
        """SELECT ?nname ?rich ?tag WHERE {
             ?n a c:Nation ; p:name ?nname .
             BIND(EXISTS { ?c p:inNation ?n ; p:acctbal ?b . FILTER(?b > 980000) } AS ?rich)
             BIND(IF(NOT EXISTS { ?s a c:Supplier ; p:inNation ?n }, "nosup", "sup") AS ?tag)
             FILTER(EXISTS { ?c2 p:inNation ?n } || ?nname = "KENYA")
           }""",
        "nname", "rich", "tag",
    )


SQL_SPARQL_TEXT_EXISTS_EXPR = """
SELECT n_name AS nname,
       CASE WHEN EXISTS (SELECT 1 FROM customer
                         WHERE c_nationkey = n_nationkey
                           AND round(c_acctbal*100) > 980000)
            THEN 'true' ELSE 'false' END AS rich,
       CASE WHEN NOT EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
            THEN 'nosup' ELSE 'sup' END AS tag
FROM nation
WHERE EXISTS (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey)
   OR n_name = 'KENYA'
"""

QUERIES["sparql_text_exists_expr"] = (q_sparql_text_exists_expr, SQL_SPARQL_TEXT_EXISTS_EXPR)


def q_repetition(spark, sf):
    """Gopher-style repetition quality signals (textops.repetition_stats):
    duplicated-line char fraction + top-bigram count fraction per doc.
    Boilerplate is synthesized deterministically (2 of every 3 docs get a
    repeated promo line appended) so both signals are exercised."""
    from .operators.textops import repetition_stats

    boiler = "CLICK HERE to subscribe CLICK HERE"
    docs = _docs(spark, sf).filter(F.col("doc_id") < 200).select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.col("text"))
        .otherwise(F.concat_ws("\n", F.col("text"), F.lit(boiler), F.lit(boiler)))
        .alias("text"),
    )
    return repetition_stats(docs)


SQL_REPETITION = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text
              ELSE text || chr(10) || 'CLICK HERE to subscribe CLICK HERE'
                        || chr(10) || 'CLICK HERE to subscribe CLICK HERE' END AS text
  FROM documents WHERE doc_id < 200
),
lines AS (
  SELECT doc_id, trim(l) AS line
  FROM d, unnest(string_split(text, chr(10))) AS t(l)
  WHERE length(trim(l)) > 0
),
per AS (SELECT doc_id, line, COUNT(*) AS cnt FROM lines GROUP BY 1, 2),
ls AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_lines,
         CAST(floor(SUM(CASE WHEN cnt > 1 THEN length(line)*cnt ELSE 0 END)
                    * 1000.0 / SUM(length(line)*cnt)) AS BIGINT) AS dup_line_x1000
  FROM per GROUP BY 1
),
ws AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM d),
bg AS (
  SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg
  FROM ws WHERE len(w) >= 2
),
pb AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM bg GROUP BY 1, 2),
bs AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
         CAST(floor(MAX(cnt) * 1000.0 / SUM(cnt)) AS BIGINT) AS top_bigram_x1000
  FROM pb GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(n_lines, 0) AS n_lines,
       COALESCE(dup_line_x1000, 0) AS dup_line_x1000,
       COALESCE(n_bigrams, 0) AS n_bigrams,
       COALESCE(top_bigram_x1000, 0) AS top_bigram_x1000
FROM d LEFT JOIN ls USING (doc_id) LEFT JOIN bs USING (doc_id)
"""

QUERIES["repetition"] = (q_repetition, SQL_REPETITION)


def q_canon_bnodes(spark, sf):
    """Canonical blank-node labeling (operators/canon.py): one bnode per
    customer carrying only its market segment — customers in the same
    segment are structurally indistinguishable, so the WL refinement must
    put them in one automorphism orbit whose size is the segment count."""
    from .operators.canon import canonical_bnode_labels
    from .types import XSD_STRING

    cust = spark.read.parquet(f"{sf}/customer.parquet")
    tr = cust.select(
        F.lit(1).cast("tinyint").alias("s_kind"),
        F.concat(F.lit("cb"), F.col("c_custkey").cast("string")).alias("s_lex"),
        F.lit("urn:p:seg").alias("pred"),
        F.lit(2).cast("tinyint").alias("o_kind"),
        F.col("c_mktsegment").alias("o_lex"),
        F.lit(XSD_STRING).alias("o_dtype"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit("urn:g:canon").alias("graph"),
        F.lit(None).cast("string").alias("src_url"),
        F.lit(None).cast("string").alias("extractor"),
        F.lit(None).cast("int").alias("part_id"),
    )
    return canonical_bnode_labels(tr).select("label", "n_shared")


SQL_CANON_BNODES = """
SELECT 'cb' || c_custkey AS label,
       COUNT(*) OVER (PARTITION BY c_mktsegment) AS n_shared
FROM customer
"""

QUERIES["canon_bnodes"] = (q_canon_bnodes, SQL_CANON_BNODES)


def q_sparql_text_service(spark, sf):
    """SERVICE federation (algebra.ServiceNode) against the in-process
    endpoint registry: the 'geo' endpoint owns the nation/region graphs
    (at 100 TB: a second Iceberg catalog federated through the metastore),
    the local dataset keeps only customers. Both sides are quad DataFrames,
    so Catalyst co-plans the cross-source join — the nation side is
    dimension-sized and broadcast."""
    from .sparql import execute

    tv = triples_view(spark, sf)
    local = tv.filter(F.col("graph") == "urn:g:customer")
    geo = tv.filter(F.col("graph").isin("urn:g:nation", "urn:g:region"))
    ctx = Ctx(local, services={"urn:svc:geo": geo})
    df = execute(
        _SPARQL_PFX
        + """SELECT ?cname ?nname WHERE {
              ?cu a c:Customer ; p:name ?cname ; p:inNation ?n .
              SERVICE <urn:svc:geo> { ?n p:name ?nname ; p:inRegion ?r .
                                      ?r p:name "AFRICA" }
              SERVICE SILENT <urn:svc:absent> { ?n p:missing ?z }
           }""",
        ctx,
    )
    return flatten(df).select("cname", "nname")


SQL_SPARQL_TEXT_SERVICE = """
SELECT c_name AS cname, n_name AS nname
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AFRICA'
"""

QUERIES["sparql_text_service"] = (q_sparql_text_service, SQL_SPARQL_TEXT_SERVICE)


def q_asof_attribution(spark, sf):
    """As-of join (operators/temporal.py): each purchase attributed to the
    user's most recent STRICTLY-prior view. One shuffle on user_id
    (union+sort, no inequality join) — the plan a 100 TB event log needs.
    Views are pre-deduped per (user, ts) so the payload is deterministic."""
    from .operators.temporal import asof_join

    ev = spark.read.parquet(f"{sf}/events.parquet")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
    )
    out = asof_join(purchases, views, on=["user_id"], payload=["view_id"])
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp_ltz"))
    return out.select(
        "event_id",
        "user_id",
        F.col("view_id_asof").alias("view_id"),
        (us("ts") - us("ts_asof")).alias("gap_us"),
    )


SQL_ASOF_ATTRIBUTION = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts, MAX(event_id) AS view_id
      FROM events WHERE event_type = 'view' GROUP BY 1, 2)
SELECT p.event_id, p.user_id, v.view_id,
       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts > v.ts
"""

QUERIES["asof_attribution"] = (q_asof_attribution, SQL_ASOF_ATTRIBUTION)


def q_range_prior_activity(spark, sf):
    """Bounded range join (operators/temporal.py): per purchase, the
    user's activity in the strictly-prior hour. Binned equi-join on
    (user_id, hour-bucket) — the inequality never reaches the join
    condition, so no BNLJ/cartesian at any scale."""
    from .operators.temporal import range_join

    ev = spark.read.parquet(f"{sf}/events.parquet")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    activity = ev.select("user_id", "ts", "event_id", "value")
    rj = range_join(purchases, activity, on=["user_id"], lower_s=-3600, upper_s=0,
                    payload=["ts", "event_id", "value"])
    return rj.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_prior"),
        F.sum(F.round(F.col("value_r") * 100).cast("long")).alias("sum_value_x100"),
    )


SQL_RANGE_PRIOR_ACTIVITY = """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id, COUNT(*) AS n_prior,
       CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_value_x100
FROM p JOIN events e
  ON e.user_id = p.user_id
 AND e.ts >= p.ts - INTERVAL 1 HOUR AND e.ts < p.ts
GROUP BY 1
"""

QUERIES["range_prior_activity"] = (q_range_prior_activity, SQL_RANGE_PRIOR_ACTIVITY)


def q_kmv_users(spark, sf):
    """KMV distinct-count sketch (operators/sketches.py) over event
    user_ids — deterministic (md5, no RNG), so the sketch state AND the
    estimate carry an exact cross-engine oracle, unlike HLL."""
    from .operators.sketches import kmv_distinct

    ev = spark.read.parquet(f"{sf}/events.parquet")
    return kmv_distinct(ev, "user_id", k=128)


from .operators.sketches import kmv_oracle_sql as _kmv_sql  # noqa: E402

QUERIES["kmv_users"] = (q_kmv_users, _kmv_sql("events", "user_id", 128))


def q_hash_split(spark, sf):
    """Deterministic md5-bucket train/val/test split of the document
    corpus (operators/sketches.py) — leak-proof membership that is a
    pure function of doc_id. Map-only + one tiny count shuffle."""
    from .operators.sketches import hash_split

    docs = _docs(spark, sf)
    return hash_split(docs, "doc_id").groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("checksum"),
    )


SQL_HASH_SPLIT = """
WITH b AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 90 THEN 'train' WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS checksum
FROM b GROUP BY 1
"""

QUERIES["hash_split"] = (q_hash_split, SQL_HASH_SPLIT)


def q_host_profile(spark, sf):
    """Per-host corpus profile (operators/urls.py) — the mega-host skew
    axis: two-stage (host, lang) → host aggregation so no reducer sees a
    mega-host's full row set; deterministic dominant language. URLs are
    synthesized from doc_id (documents carries none) with the SAME
    expression in the oracle."""
    from .operators.urls import host_profile

    docs = _docs(spark, sf).withColumn(
        "url",
        F.concat(F.lit("https://h"), (F.col("doc_id") % 37).cast("string"),
                 F.lit(".example/p/"), F.col("doc_id").cast("string")),
    )
    return host_profile(docs)


SQL_HOST_PROFILE = """
WITH d AS (
  SELECT 'https://h' || CAST(doc_id % 37 AS VARCHAR) || '.example/p/' || CAST(doc_id AS VARCHAR) AS url,
         lang, n_chars
  FROM documents
),
c AS (
  SELECT regexp_extract(url, 'https?://([^/]+)', 1) AS host, lang,
         COUNT(*) AS n, SUM(n_chars) AS chars
  FROM d GROUP BY 1, 2
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY host ORDER BY n DESC, lang ASC) AS rk FROM c
)
SELECT host, CAST(SUM(n) AS BIGINT) AS n_docs, CAST(SUM(chars) AS BIGINT) AS total_chars,
       COUNT(*) AS n_langs, MAX(CASE WHEN rk = 1 THEN lang END) AS top_lang
FROM r GROUP BY 1
"""

QUERIES["host_profile"] = (q_host_profile, SQL_HOST_PROFILE)


def q_stratified_sample(spark, sf):
    """Deterministic hash-ordered stratified sample (operators/sketches.py):
    5 docs per language, identical on every run/engine/partitioning."""
    from .operators.sketches import stratified_sample

    return stratified_sample(_docs(spark, sf), "lang", "doc_id", 5).select("doc_id", "lang")


SQL_STRATIFIED_SAMPLE = """
WITH h AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM documents
),
r AS (
  SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rk FROM h
)
SELECT doc_id, lang FROM r WHERE rk <= 5
"""

QUERIES["stratified_sample"] = (q_stratified_sample, SQL_STRATIFIED_SAMPLE)


def q_vocab_topk(spark, sf):
    """Corpus vocabulary top-50 by term frequency with doc frequency
    (operators/textops.py) — skew-safe two-stage (tok, doc) → tok
    aggregation, deterministic tf-desc/tok-asc top-k."""
    from .operators.textops import vocab_topk

    return vocab_topk(_docs(spark, sf), k=50)


SQL_VOCAB_TOPK = """
WITH toks AS (
  SELECT doc_id, t AS tok
  FROM documents,
       unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS u(t)
  WHERE t <> ''
),
pairs AS (SELECT tok, doc_id, COUNT(*) AS n FROM toks GROUP BY 1, 2),
c AS (SELECT tok, CAST(SUM(n) AS BIGINT) AS tf, COUNT(*) AS df FROM pairs GROUP BY 1)
SELECT tok, tf, df FROM c ORDER BY tf DESC, tok ASC LIMIT 50
"""

QUERIES["vocab_topk"] = (q_vocab_topk, SQL_VOCAB_TOPK)


def q_quantile_sketch(spark, sf):
    """Deterministic hash-sample quantile sketch (operators/sketches.py)
    over document lengths — exact cross-engine oracle by construction."""
    from .operators.sketches import hash_sample_quantiles

    return hash_sample_quantiles(_docs(spark, sf), "n_chars", "doc_id", k=256)


from .operators.sketches import quantile_oracle_sql as _q_sql  # noqa: E402

QUERIES["quantile_sketch"] = (q_quantile_sketch, _q_sql("documents", "n_chars", "doc_id", 256))


def q_rdfstar_prov(spark, sf):
    """RDF-star provenance round-trip (beyond the reference): build a
    quoted-term annotation store from the customer table — each quoted
    triple << cust a Customer >> annotated with an integer confidence —
    then run a SPARQL-star text query (quoted pattern + SUBJECT builtin)
    over it. Exercises the full v1 stack: TRIPLE encoding, kind-3 scans
    (pushed s_kind filter), component binding via exact splits."""
    from .functions.terms import t_iri, t_quoted
    from .types import RDF_TYPE, XSD_INTEGER

    cust = spark.read.parquet(f"{sf}/customer.parquet")
    q = t_quoted(
        t_iri(F.concat(F.lit("urn:c:"), F.col("c_custkey").cast("string"))),
        t_iri(F.lit(RDF_TYPE)),
        t_iri(F.lit("urn:c:Customer")),
    )
    tr = cust.select(
        q["kind"].alias("s_kind"),
        q["lex"].alias("s_lex"),
        F.lit("urn:p:conf").alias("pred"),
        F.lit(2).cast("tinyint").alias("o_kind"),
        F.round(F.col("c_acctbal") * 100).cast("long").cast("string").alias("o_lex"),
        F.lit(XSD_INTEGER).alias("o_dtype"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit("urn:g:star").alias("graph"),
        F.lit(None).cast("string").alias("src_url"),
        F.lit(None).cast("string").alias("extractor"),
        F.lit(None).cast("int").alias("part_id"),
    )
    from .sparql import execute

    df = execute(
        """PREFIX p: <urn:p:> PREFIX c: <urn:c:>
           PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
           SELECT ?who ?conf WHERE {
             << ?who rdf:type c:Customer >> p:conf ?conf
             FILTER(?conf > 900000)
           }""",
        Ctx(tr),
    )
    return flatten(df).select("who", "conf")


SQL_RDFSTAR_PROV = """
SELECT 'urn:c:' || CAST(c_custkey AS VARCHAR) AS who,
       CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS VARCHAR) AS conf
FROM customer
WHERE round(c_acctbal * 100) > 900000
"""

QUERIES["rdfstar_prov"] = (q_rdfstar_prov, SQL_RDFSTAR_PROV)


def q_rdfstar_store_probe(spark, sf):
    """Quoted-pattern probe over the MATERIALIZED relational store (which
    holds no quoted terms — result is empty by construction, asserted by
    the oracle). Exists to pin the scan shape: the kind-3 discriminator
    is a flat pushed parquet filter, so at 100 TB a SPARQL-star query
    prunes every non-annotation file via min/max stats before reading."""
    from .sparql import execute

    df = execute(
        _SPARQL_PFX
        + "SELECT ?who ?c WHERE { << ?who p:name ?n >> p:conf ?c }",
        _ctx(spark, sf),
    )
    return flatten(df).select("who", "c")


SQL_RDFSTAR_STORE_PROBE = """
SELECT CAST(NULL AS VARCHAR) AS who, CAST(NULL AS VARCHAR) AS c WHERE 1 = 0
"""

QUERIES["rdfstar_store_probe"] = (q_rdfstar_store_probe, SQL_RDFSTAR_STORE_PROBE)


def q_rollup_cascade(spark, sf):
    """Hypertable-style rollup cascade (operators/events.py): minute /
    hour / day continuous aggregates where each coarser tier re-aggregates
    the previous tier's partials — raw events scanned exactly once."""
    from .operators.events import rollup_cascade

    ev = spark.read.parquet(f"{sf}/events.parquet")
    return rollup_cascade(ev, (1, 60, 1440))


SQL_ROLLUP_CASCADE = """
WITH m AS (
  SELECT CAST(floor(epoch(ts) / 60) AS BIGINT) AS bucket, event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_x100
  FROM events GROUP BY 1, 2
),
h AS (
  SELECT CAST(floor(bucket / 60) AS BIGINT) AS bucket, event_type,
         CAST(SUM(n_events) AS BIGINT) AS n_events,
         CAST(SUM(sum_value_x100) AS BIGINT) AS sum_value_x100
  FROM m GROUP BY 1, 2
),
d AS (
  SELECT CAST(floor(bucket / 24) AS BIGINT) AS bucket, event_type,
         CAST(SUM(n_events) AS BIGINT) AS n_events,
         CAST(SUM(sum_value_x100) AS BIGINT) AS sum_value_x100
  FROM h GROUP BY 1, 2
)
SELECT 1 AS tier_minutes, * FROM m
UNION ALL SELECT 60, * FROM h
UNION ALL SELECT 1440, * FROM d
"""

QUERIES["rollup_cascade"] = (q_rollup_cascade, SQL_ROLLUP_CASCADE)


def q_rdfs_closure(spark, sf):
    """RDFS entailment materialization (operators/rdfs.py): a small
    ontology over the TPC-H KG (Customer/Supplier ⊑ Party ⊑ Agent,
    inNation ⊑ locatedIn, domain/range classes) drives rules
    rdfs2/3/5/7/9/11 — schema hierarchies closed distributedly then
    broadcast, instance rules are single broadcast-join passes. Returns
    the ENTAILED triples only; the oracle reproduces each rule's output
    relationally."""
    from .operators.rdfs import DOMAIN, RANGE, SUBCLASS, SUBPROP, rdfs_closure
    from .types import TRIPLES_SCHEMA, triple_row as _tr

    schema = [
        ("urn:c:Customer", SUBCLASS, "urn:c:Party"),
        ("urn:c:Supplier", SUBCLASS, "urn:c:Party"),
        ("urn:c:Party", SUBCLASS, "urn:c:Agent"),
        ("urn:p:inNation", SUBPROP, "urn:p:locatedIn"),
        ("urn:p:inNation", DOMAIN, "urn:c:Located"),
        ("urn:p:locatedIn", RANGE, "urn:c:Place"),
    ]
    rows = [_tr(Iri(s), Iri(p), Iri(o), graph="urn:g:schema") for s, p, o in schema]
    sdf = spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)
    store = triples_view(spark, sf).unionByName(sdf)
    ent = rdfs_closure(store)
    return ent.select(F.col("s_lex").alias("s"), F.col("pred").alias("p"), F.col("o_lex").alias("o"))


SQL_RDFS_CLOSURE = """
SELECT 'urn:c:Customer' AS s, 'http://www.w3.org/2000/01/rdf-schema#subClassOf' AS p, 'urn:c:Agent' AS o
UNION ALL SELECT 'urn:c:Supplier', 'http://www.w3.org/2000/01/rdf-schema#subClassOf', 'urn:c:Agent'
UNION ALL SELECT 'urn:cu:' || c_custkey, 'urn:p:locatedIn', 'urn:n:' || c_nationkey FROM customer
UNION ALL SELECT 'urn:su:' || s_suppkey, 'urn:p:locatedIn', 'urn:n:' || s_nationkey FROM supplier
UNION ALL SELECT 'urn:cu:' || c_custkey, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', cls
          FROM customer, (VALUES ('urn:c:Located'), ('urn:c:Party'), ('urn:c:Agent')) AS t(cls)
UNION ALL SELECT 'urn:su:' || s_suppkey, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', cls
          FROM supplier, (VALUES ('urn:c:Located'), ('urn:c:Party'), ('urn:c:Agent')) AS t(cls)
UNION ALL SELECT DISTINCT 'urn:n:' || k, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'urn:c:Place'
          FROM (SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier)
"""

QUERIES["rdfs_closure"] = (q_rdfs_closure, SQL_RDFS_CLOSURE)


def q_owl_rl(spark, sf):
    """OWL-RL property axioms (operators/owlrl.py): a locatedIn edge set
    (customer→nation→region) declared owl:TransitiveProperty and
    owl:inverseOf hosts — entails customer→region hops plus the full
    inverse 'hosts' relation (including over closure pairs)."""
    from .operators.owlrl import INVERSE_OF, TRANSITIVE, owl_rl_closure
    from .types import TRIPLES_SCHEMA, triple_row as _tr

    cust = spark.read.parquet(f"{sf}/customer.parquet")
    nat = spark.read.parquet(f"{sf}/nation.parquet")

    def edge(src, dst):
        return F.struct(
            F.lit(0).cast("tinyint").alias("s_kind"), src.alias("s_lex"),
            F.lit("urn:p:locatedIn").alias("pred"),
            F.lit(0).cast("tinyint").alias("o_kind"), dst.alias("o_lex"),
            F.lit(None).cast("string").alias("o_dtype"), F.lit(None).cast("string").alias("o_lang"),
            F.lit("urn:g:owl-data").alias("graph"), F.lit(None).cast("string").alias("src_url"),
            F.lit(None).cast("string").alias("extractor"), F.lit(None).cast("int").alias("part_id"),
        )

    e1 = cust.select(edge(F.concat(F.lit("urn:cu:"), F.col("c_custkey").cast("string")),
                          F.concat(F.lit("urn:n:"), F.col("c_nationkey").cast("string"))).alias("t")).select("t.*")
    e2 = nat.select(edge(F.concat(F.lit("urn:n:"), F.col("n_nationkey").cast("string")),
                         F.concat(F.lit("urn:r:"), F.col("n_regionkey").cast("string"))).alias("t")).select("t.*")
    axioms = spark.createDataFrame(
        [
            _tr(Iri("urn:p:locatedIn"), Iri(RDF_TYPE), Iri(TRANSITIVE), graph="urn:g:owl-schema"),
            _tr(Iri("urn:p:locatedIn"), Iri(INVERSE_OF), Iri("urn:p:hosts"), graph="urn:g:owl-schema"),
        ],
        schema=TRIPLES_SCHEMA,
    )
    store = e1.unionByName(e2).unionByName(axioms)
    ent = owl_rl_closure(store)
    return ent.select(F.col("s_lex").alias("s"), F.col("pred").alias("p"), F.col("o_lex").alias("o"))


SQL_OWL_RL = """
SELECT 'urn:cu:' || c_custkey AS s, 'urn:p:locatedIn' AS p, 'urn:r:' || n_regionkey AS o
FROM customer JOIN nation ON c_nationkey = n_nationkey
UNION ALL SELECT 'urn:n:' || c_nationkey, 'urn:p:hosts', 'urn:cu:' || c_custkey FROM customer
UNION ALL SELECT 'urn:r:' || n_regionkey, 'urn:p:hosts', 'urn:n:' || n_nationkey FROM nation
UNION ALL SELECT 'urn:r:' || n_regionkey, 'urn:p:hosts', 'urn:cu:' || c_custkey
FROM customer JOIN nation ON c_nationkey = n_nationkey
"""

QUERIES["owl_rl"] = (q_owl_rl, SQL_OWL_RL)


def q_shacl_report(spark, sf):
    """SHACL-lite validation (operators/shacl.py) of the TPC-H KG against
    six property shapes — two conforming (name/inRegion cardinality +
    datatype + class + nodeKind), four violating by construction
    (missing property, maxCount 0, wrong class, wrong nodeKind). The
    report is the distributed sh:ValidationReport."""
    from .operators.shacl import SHAPES_SCHEMA, validate

    shapes = spark.createDataFrame(
        [
            ("s1", "urn:c:Nation", "urn:p:name", 1, 1, "http://www.w3.org/2001/XMLSchema#string", None, "Literal"),
            ("s2", "urn:c:Nation", "urn:p:inRegion", 1, 1, None, "urn:c:Region", "IRI"),
            ("s3", "urn:c:Nation", "urn:p:phone", 1, None, None, None, None),
            ("s4", "urn:c:Region", "urn:p:name", None, 0, None, None, None),
            ("s5", "urn:c:Nation", "urn:p:inRegion", None, None, None, "urn:c:Supplier", None),
            ("s6", "urn:c:Nation", "urn:p:name", None, None, None, None, "IRI"),
        ],
        schema=SHAPES_SCHEMA,
    )
    rep = validate(triples_view(spark, sf), shapes)
    return rep.select("focus", "shape_id", "constraint", "detail")


SQL_SHACL_REPORT = """
SELECT 'urn:n:' || n_nationkey AS focus, 's3' AS shape_id, 'minCount' AS constraint,
       'found 0 < 1' AS detail FROM nation
UNION ALL SELECT 'urn:r:' || r_regionkey, 's4', 'maxCount', 'found 1 > 0' FROM region
UNION ALL SELECT 'urn:n:' || n_nationkey, 's5', 'class',
       'value urn:r:' || n_regionkey || ' not a urn:c:Supplier' FROM nation
UNION ALL SELECT 'urn:n:' || n_nationkey, 's6', 'nodeKind', 'value ' || n_name FROM nation
"""

QUERIES["shacl_report"] = (q_shacl_report, SQL_SHACL_REPORT)


# deliberate window edits (policy in the DRIVER_WINDOW comment): this
# round's remaining new oracled queries take the slots of doubly-confirmed
# re-confirmations (bgp_join / agg_nation / cc_components green in r1 AND
# r2, dedup_clusters green in r2 — their historical rows stand)
for _old, _new in [
    ("bgp_join", "olap_shipping"),
    ("agg_nation", "sparql_text_exists_expr"),
    ("dedup_clusters", "repetition"),
    ("cc_components", "canon_bnodes"),
]:
    DRIVER_WINDOW[DRIVER_WINDOW.index(_old)] = _new
_rest = [n for n in QUERIES if n not in set(DRIVER_WINDOW)]
QUERIES = {n: QUERIES[n] for n in [*DRIVER_WINDOW, *_rest]}


def q_decontaminate(spark, sf):
    """Benchmark decontamination (GPT-3/PaLM 8-gram recipe): the "eval
    set" is synthesized deterministically as the first 200 chars of every
    97th document; every corpus doc gets its normalized-8-gram overlap
    stats against the broadcast benchmark gram set."""
    from .operators.textops import decontaminate

    docs = _docs(spark, sf)
    bench = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.substring("text", 1, 200).alias("text")
    )
    return decontaminate(docs, bench, n=8, threshold_pct=50)


SQL_DECONTAMINATE = """
WITH nt AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
  FROM documents
),
cg AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+7], ' ') AS g
  FROM nt, unnest(range(1, len(toks) - 6)) AS t(i)
  WHERE len(toks) >= 8
),
sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM cg GROUP BY doc_id),
bnt AS (
  SELECT string_split(trim(regexp_replace(regexp_replace(lower(substr(text, 1, 200)),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
  FROM documents WHERE doc_id % 97 = 0
),
bg AS (
  SELECT DISTINCT array_to_string(toks[i:i+7], ' ') AS g
  FROM bnt, unnest(range(1, len(toks) - 6)) AS t(i)
  WHERE len(toks) >= 8
),
m AS (SELECT c.doc_id, COUNT(*) AS n_matched FROM cg c JOIN bg USING (g) GROUP BY c.doc_id)
SELECT d.doc_id,
       COALESCE(s.n_grams, 0) AS n_grams,
       COALESCE(m.n_matched, 0) AS n_matched,
       CAST(floor(COALESCE(m.n_matched, 0) * 100.0 /
            greatest(COALESCE(s.n_grams, 0), 1)) AS BIGINT) AS contam_pct,
       CAST(CASE WHEN floor(COALESCE(m.n_matched, 0) * 100.0 /
            greatest(COALESCE(s.n_grams, 0), 1)) >= 50
            THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM documents d LEFT JOIN sizes s USING (doc_id) LEFT JOIN m USING (doc_id)
"""

QUERIES["decontaminate"] = (q_decontaminate, SQL_DECONTAMINATE)


def q_span_dedup(spark, sf):
    """Exact substring-span dedup stats (w=8 token windows, stride 1):
    a window hash occurring >1 time anywhere in the corpus marks a
    duplicated span; per-doc duplicated-window fraction."""
    from .operators.textops import span_dedup

    return span_dedup(_docs(spark, sf), w=8, stride=1)


SQL_SPAN_DEDUP = """
WITH wt AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents
),
wins AS (
  SELECT doc_id, md5(array_to_string(toks[i:i+7], ' ')) AS h
  FROM wt, unnest(range(1, len(toks) - 6)) AS t(i)
  WHERE len(toks) >= 8
),
hot AS (SELECT h, COUNT(*) AS cnt FROM wins GROUP BY h HAVING COUNT(*) > 1),
dups AS (SELECT w.doc_id, COUNT(*) AS n_dup FROM wins w JOIN hot USING (h) GROUP BY w.doc_id),
sizes AS (
  SELECT doc_id, CASE WHEN len(toks) >= 8 THEN len(toks) - 7 ELSE 0 END AS n_windows
  FROM wt
)
SELECT s.doc_id, CAST(s.n_windows AS BIGINT) AS n_windows,
       CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup_windows,
       CAST(floor(COALESCE(d.n_dup, 0) * 100.0 / greatest(s.n_windows, 1)) AS BIGINT) AS dup_pct
FROM sizes s LEFT JOIN dups d USING (doc_id)
"""

QUERIES["span_dedup"] = (q_span_dedup, SQL_SPAN_DEDUP)


def q_pack_offsets(spark, sf):
    """Sequence-packing offsets (concat-and-chunk at seq_len=2048) via the
    two-stage distributed prefix-sum — global doc_id order, no
    single-reducer window."""
    from .operators.textops import pack_offsets

    return pack_offsets(_docs(spark, sf), seq_len=2048, buckets=16)


SQL_PACK_OFFSETS = """
WITH t AS (
  SELECT doc_id, CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tok
  FROM documents
),
o AS (
  SELECT doc_id, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_offset
  FROM t
)
SELECT doc_id, n_tok, tok_offset,
       CAST(CASE WHEN n_tok > 0 THEN tok_offset // 2048 END AS BIGINT) AS first_chunk,
       CAST(CASE WHEN n_tok > 0 THEN (tok_offset + n_tok - 1) // 2048 END AS BIGINT) AS last_chunk,
       CAST(CASE WHEN n_tok > 0
            THEN (tok_offset + n_tok - 1) // 2048 - tok_offset // 2048 + 1
            ELSE 0 END AS BIGINT) AS n_chunks
FROM o
"""

QUERIES["pack_offsets"] = (q_pack_offsets, SQL_PACK_OFFSETS)


def q_olap_cube(spark, sf):
    """CUBE rollup with grouping_id over lineitem (TPC-H Q1 cells at all
    aggregation levels in ONE pass): Spark expands the grouping sets
    map-side and partial-aggregates each — one shuffle for all 4 levels,
    never 4 scans. Integer cents keep the cross-engine sums exact."""
    li = spark.read.parquet(f"{sf}/lineitem.parquet").filter(F.col("l_shipdate") <= "1998-09-02")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("price_x100"),
            F.grouping_id("l_returnflag", "l_linestatus").cast("long").alias("gid"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n_rows", "price_x100")
    )


SQL_OLAP_CUBE = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_x100
FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

QUERIES["olap_cube"] = (q_olap_cube, SQL_OLAP_CUBE)


def q_pagerank(spark, sf):
    """Integer-exact PageRank (3 iterations, d=0.85) on the TPC-H entity
    graph: customers and suppliers point at their nation, nations and
    regions point at each other (cyclic core, dangling leaves). Exact
    BIGINT arithmetic makes the iterative result bit-comparable to the
    unrolled DuckDB mirror."""
    from .operators.cc import pagerank

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    su = spark.read.parquet(f"{sf}/supplier.parquet")
    na = spark.read.parquet(f"{sf}/nation.parquet")
    e = (
        cu.select(F.concat(F.lit("c:"), "c_custkey").alias("src"), F.concat(F.lit("n:"), "c_nationkey").alias("dst"))
        .unionByName(su.select(F.concat(F.lit("s:"), "s_suppkey").alias("src"), F.concat(F.lit("n:"), "s_nationkey").alias("dst")))
        .unionByName(na.select(F.concat(F.lit("n:"), "n_nationkey").alias("src"), F.concat(F.lit("r:"), "n_regionkey").alias("dst")))
        .unionByName(na.select(F.concat(F.lit("r:"), "n_regionkey").alias("src"), F.concat(F.lit("n:"), "n_nationkey").alias("dst")))
    )
    return pagerank(e, iters=3, damping_pct=85)


def _pagerank_sql(iters: int = 3) -> str:
    head = """
WITH edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT 'c:' || c_custkey AS src, 'n:' || c_nationkey AS dst FROM customer
    UNION ALL SELECT 's:' || s_suppkey, 'n:' || s_nationkey FROM supplier
    UNION ALL SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
    UNION ALL SELECT 'r:' || n_regionkey, 'n:' || n_nationkey FROM nation
  )
),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
deg AS (SELECT src, COUNT(*) AS odeg FROM edges GROUP BY src),
n0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes)"""
    parts = [head]
    for i in range(1, iters + 1):
        parts.append(f""",
c{i} AS (SELECT e.dst AS node, SUM(r.rank // d.odeg) AS s
        FROM edges e JOIN n{i-1} r ON e.src = r.node JOIN deg d ON d.src = e.src GROUP BY e.dst),
n{i} AS (SELECT n.node, CAST(150000 + 85 * COALESCE(c.s, 0) // 100 AS BIGINT) AS rank
        FROM nodes n LEFT JOIN c{i} c USING (node))""")
    parts.append(f"\nSELECT node, rank FROM n{iters}")
    return "".join(parts)


QUERIES["pagerank"] = (q_pagerank, _pagerank_sql(3))


def q_triangles(spark, sf):
    """Per-node triangle counts on a chain-with-chords graph: within each
    nation, customer rank r links to ranks r+1 and r+2 — a deterministic
    triangle strip (every interior rank closes two triangles). Exercises
    the degree-ordered wedge join end-to-end; counts are exact integers,
    bit-comparable to the DuckDB a<b<c enumeration."""
    from pyspark.sql.window import Window

    from .operators.cc import triangle_count

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    r = cu.select(
        F.col("c_custkey").cast("string").alias("k"),
        "c_nationkey",
        F.row_number().over(Window.partitionBy("c_nationkey").orderBy("c_custkey")).alias("rn"),
    )
    hop1 = r.select("c_nationkey", (F.col("rn") - 1).alias("rn"), F.col("k").alias("dst"))
    hop2 = r.select("c_nationkey", (F.col("rn") - 2).alias("rn"), F.col("k").alias("dst"))
    e = (
        r.join(hop1, ["c_nationkey", "rn"]).select(F.col("k").alias("src"), "dst")
        .unionByName(r.join(hop2, ["c_nationkey", "rn"]).select(F.col("k").alias("src"), "dst"))
    )
    return triangle_count(e)


SQL_TRIANGLES = """
WITH r AS (
  SELECT CAST(c_custkey AS VARCHAR) AS k, c_nationkey,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
  FROM customer
),
raw AS (
  SELECT a.k AS src, b.k AS dst FROM r a JOIN r b
    ON a.c_nationkey = b.c_nationkey AND b.rn = a.rn + 1
  UNION ALL
  SELECT a.k, b.k FROM r a JOIN r b
    ON a.c_nationkey = b.c_nationkey AND b.rn = a.rn + 2
),
e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM raw WHERE src <> dst),
nodes AS (SELECT DISTINCT node FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)),
t AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
c AS (
  SELECT node, COUNT(*) AS t FROM (
    SELECT x AS node FROM t UNION ALL SELECT y FROM t UNION ALL SELECT z FROM t
  ) GROUP BY node
)
SELECT n.node, CAST(COALESCE(c.t, 0) AS BIGINT) AS triangles
FROM nodes n LEFT JOIN c USING (node)
"""

QUERIES["triangles"] = (q_triangles, SQL_TRIANGLES)


def q_graph_diff(spark, sf):
    """RDF-Patch delta between two KG snapshots (incremental re-crawl
    shape): snapshot B drops every supplier name triple and adds an
    'active' status literal per region. graph_diff emits the change set
    as (quad, op) rows — two null-safe hash anti joins, no nested loop."""
    from .operators.delta import graph_diff
    from .types import TRIPLE_KEY, XSD_STRING

    a = triples_view(spark, sf).select(*TRIPLE_KEY)
    dropped = (F.col("graph") == "urn:g:supplier") & (F.col("pred") == P_NAME)
    adds = spark.read.parquet(f"{sf}/region.parquet").select(
        F.lit(0).alias("s_kind"),
        F.concat(F.lit("urn:r:"), F.col("r_regionkey")).alias("s_lex"),
        F.lit("urn:p:status").alias("pred"),
        F.lit(2).alias("o_kind"),
        F.lit("active").alias("o_lex"),
        F.lit(XSD_STRING).alias("o_dtype"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit("urn:g:region").alias("graph"),
    )
    b = a.filter(~dropped).unionByName(adds)
    return graph_diff(a, b).select(
        "s_lex", "pred", "o_kind", "o_lex", "o_dtype", "graph", "op"
    )


SQL_GRAPH_DIFF = (
    W
    + """,
b AS (
  SELECT * FROM triples
  WHERE NOT (graph = 'urn:g:supplier' AND pred = 'urn:p:name')
  UNION ALL
  SELECT 'urn:r:'||r_regionkey, 'urn:p:status', 2, 'active',
         'http://www.w3.org/2001/XMLSchema#string', 'urn:g:region'
  FROM region
)
SELECT s_lex, pred, o_kind, o_lex, o_dtype, graph, '+' AS op
FROM (SELECT * FROM b EXCEPT SELECT * FROM triples)
UNION ALL
SELECT s_lex, pred, o_kind, o_lex, o_dtype, graph, '-' AS op
FROM (SELECT * FROM triples EXCEPT SELECT * FROM b)
"""
)

QUERIES["graph_diff"] = (q_graph_diff, SQL_GRAPH_DIFF)


def _messy_urls(spark, sf):
    """Deterministic messy-URL corpus (documents carries no url column):
    mixed-case scheme/host, explicit default ports, tracking params,
    unsorted params, fragments, empty paths, one non-http passthrough —
    the SAME expression is synthesized in the DuckDB oracle."""
    d = F.col("doc_id")
    mess = F.concat(
        F.when(d % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://WWW.Ex"), (d % 5).cast("string"), F.lit(".COM"),
        F.when(d % 3 == 0,
               F.when(d % 2 == 0, F.lit(":80")).otherwise(F.lit(":443"))
               ).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.lit("")).otherwise(
            F.concat(F.lit("/p/"), (d % 50).cast("string"))),
        F.when(d % 4 == 0, F.lit("?utm_source=x&b=2&a=1"))
        .when(d % 4 == 1, F.concat(F.lit("?fbclid=f"), d.cast("string")))
        .when(d % 4 == 2, F.lit("?z=9&y=8&utm_campaign=c"))
        .otherwise(F.lit("")),
        F.when(d % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    url = F.when(d % 97 == 0, F.lit("ftp://Mixed.Case/Z")).otherwise(mess)
    return _docs(spark, sf).withColumn("url", url)


_SQL_MESSY_URL = """
  CASE WHEN doc_id % 97 = 0 THEN 'ftp://Mixed.Case/Z'
  ELSE
    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END)
    || '://WWW.Ex' || CAST(doc_id % 5 AS VARCHAR) || '.COM'
    || (CASE WHEN doc_id % 3 = 0
             THEN (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
             ELSE '' END)
    || (CASE WHEN doc_id % 7 = 0 THEN ''
             ELSE '/p/' || CAST(doc_id % 50 AS VARCHAR) END)
    || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=x&b=2&a=1'
             WHEN doc_id % 4 = 1 THEN '?fbclid=f' || CAST(doc_id AS VARCHAR)
             WHEN doc_id % 4 = 2 THEN '?z=9&y=8&utm_campaign=c'
             ELSE '' END)
    || (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END)
  END
""".strip()


def q_url_canon(spark, sf):
    """URL canonicalization (RFC 3986 §6.2 + tracking-param strip) —
    scan-local Column algebra, no UDF/shuffle; every rule value-oracled."""
    from .operators.urls import canonical_url

    return _messy_urls(spark, sf).select(
        "doc_id", "url", canonical_url(F.col("url")).alias("canon")
    )


def _sql_url_canon() -> str:
    from .operators.urls import canonical_url_sql

    return f"""
WITH d AS (SELECT doc_id, {_SQL_MESSY_URL} AS url FROM documents)
SELECT doc_id, url, {canonical_url_sql('url')} AS canon FROM d
"""


SQL_URL_CANON = _sql_url_canon()

QUERIES["url_canon"] = (q_url_canon, SQL_URL_CANON)


def q_url_dedup(spark, sf):
    """Crawl dedup by canonical URL: one row per canonical form, keeping
    the smallest doc_id (deterministic earliest-crawl stand-in). One
    shuffle (canonical-url window)."""
    from .operators.urls import url_dedup

    return url_dedup(_messy_urls(spark, sf)).select("doc_id", "canon_url")


def _sql_url_dedup() -> str:
    from .operators.urls import canonical_url_sql

    return f"""
WITH d AS (SELECT doc_id, {_SQL_MESSY_URL} AS url FROM documents),
c AS (SELECT doc_id, {canonical_url_sql('url')} AS canon_url FROM d)
SELECT doc_id, canon_url FROM c
QUALIFY ROW_NUMBER() OVER (PARTITION BY canon_url ORDER BY doc_id) = 1
"""


SQL_URL_DEDUP = _sql_url_dedup()

QUERIES["url_dedup"] = (q_url_dedup, SQL_URL_DEDUP)


def q_bpe_pairs(spark, sf):
    """BPE merge-step pair counts: top-50 adjacent lowercase-alnum token
    pairs by corpus occurrence count — one map-side-combined shuffle +
    TakeOrderedAndProject."""
    from .operators.textops import bpe_pair_counts

    return bpe_pair_counts(_docs(spark, sf), k=50)


SQL_BPE_PAIRS = """
WITH nt AS (
  SELECT string_split(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
  FROM documents
),
p AS (
  SELECT toks[i] || ' ' || toks[i+1] AS pair
  FROM nt, unnest(range(1, len(toks))) AS t(i)
  WHERE len(toks) >= 2
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
FROM p GROUP BY pair
ORDER BY n DESC, pair ASC
LIMIT 50
"""

QUERIES["bpe_pairs"] = (q_bpe_pairs, SQL_BPE_PAIRS)


def q_kcore(spark, sf):
    """4 rounds of k=3 core peeling on the chain-with-chords customer
    graph (the q_triangles strip) — fixed-round contract, bit-exact vs
    the unrolled DuckDB mirror; rounds ≥ peel depth would give the true
    3-core (pytest covers the fixpoint mode on closed-form graphs)."""
    from pyspark.sql.window import Window

    from .operators.cc import kcore

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    r = cu.select(
        F.col("c_custkey").cast("string").alias("k"),
        "c_nationkey",
        F.row_number().over(Window.partitionBy("c_nationkey").orderBy("c_custkey")).alias("rn"),
    )
    hop1 = r.select("c_nationkey", (F.col("rn") - 1).alias("rn"), F.col("k").alias("dst"))
    hop2 = r.select("c_nationkey", (F.col("rn") - 2).alias("rn"), F.col("k").alias("dst"))
    e = (
        r.join(hop1, ["c_nationkey", "rn"]).select(F.col("k").alias("src"), "dst")
        .unionByName(r.join(hop2, ["c_nationkey", "rn"]).select(F.col("k").alias("src"), "dst"))
    )
    return kcore(e, k=3, rounds=4)


def _kcore_sql(k: int, rounds: int) -> str:
    parts = [
        """WITH r AS (
  SELECT CAST(c_custkey AS VARCHAR) AS kk, c_nationkey,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
  FROM customer
),
raw AS (
  SELECT a.kk AS src, b.kk AS dst FROM r a JOIN r b
    ON a.c_nationkey = b.c_nationkey AND b.rn = a.rn + 1
  UNION ALL
  SELECT a.kk, b.kk FROM r a JOIN r b
    ON a.c_nationkey = b.c_nationkey AND b.rn = a.rn + 2
),
e0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       FROM raw WHERE src <> dst)"""
    ]
    # MATERIALIZED: DuckDB inlines plain CTEs, so each round re-evaluating
    # its predecessor twice would re-run the whole prefix — 2^rounds blowup
    for i in range(rounds):
        parts.append(
            f""",
w{i} AS MATERIALIZED (SELECT node FROM (SELECT a AS node FROM e{i} UNION ALL SELECT b FROM e{i})
         GROUP BY node HAVING COUNT(*) < {k}),
e{i + 1} AS MATERIALIZED (SELECT * FROM e{i} WHERE a NOT IN (SELECT node FROM w{i})
           AND b NOT IN (SELECT node FROM w{i}))"""
        )
    parts.append(
        f"""
SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
FROM (SELECT a AS node FROM e{rounds} UNION ALL SELECT b FROM e{rounds})
GROUP BY node"""
    )
    return "".join(parts)


QUERIES["kcore"] = (q_kcore, _kcore_sql(3, 4))


def q_nfc_text(spark, sf):
    """Unicode NFC normalization ahead of hash dedup: documents text is
    ASCII, so decomposed/composed suffixes are synthesized per doc_id
    (same expression in the oracle); returns the normalized text plus a
    changed flag."""
    from .operators.textops import nfc_normalize_col

    d = F.col("doc_id")
    raw = F.concat(
        F.substring(F.col("text"), 1, 40),
        F.when(d % 3 == 0, F.lit(" cafe\u0301"))   # e + combining acute
        .when(d % 3 == 1, F.lit(" caf\u00e9"))     # precomposed é
        .otherwise(F.lit(" A\u030amlaut")),        # A + combining ring
    )
    norm = nfc_normalize_col(raw)
    return _docs(spark, sf).select(
        "doc_id",
        norm.alias("norm"),
        (norm != raw).cast("int").alias("changed"),
    )


SQL_NFC_TEXT = """
WITH d AS (
  SELECT doc_id,
         substr(text, 1, 40) ||
         CASE WHEN doc_id % 3 = 0 THEN ' cafe' || chr(769)
              WHEN doc_id % 3 = 1 THEN ' caf' || chr(233)
              ELSE ' A' || chr(778) || 'mlaut' END AS raw
  FROM documents
)
SELECT doc_id, nfc_normalize(raw) AS norm,
       CAST(CASE WHEN nfc_normalize(raw) <> raw THEN 1 ELSE 0 END AS INT) AS changed
FROM d
"""

QUERIES["nfc_text"] = (q_nfc_text, SQL_NFC_TEXT)


def q_bm25_rank(spark, sf):
    """Integer-exact BM25-style retrieval ranking (log-free Robertson idf
    — see operators/textops.py::bm25_rank) for a 3-term query; top-20."""
    from .operators.textops import bm25_rank

    return bm25_rank(_docs(spark, sf), ["spark", "window", "customer"], k=20)


SQL_BM25_RANK = """
WITH nt AS (
  SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
  FROM documents
),
tok AS (SELECT doc_id, t.tok FROM nt, unnest(toks) AS t(tok) WHERE t.tok <> ''),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
tot AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM dl),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok
       WHERE tok IN ('spark', 'window', 'customer') GROUP BY doc_id, tok),
dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
s AS (
  SELECT tf.doc_id,
         floor(CAST(1000 * (2*t.n_docs - 2*dfq.df + 1) AS DOUBLE) / (2*dfq.df + 1))
         * floor(CAST(22000 * t.total_len * tf.tf AS DOUBLE)
                 / (10*t.total_len*tf.tf + 3*t.total_len + 9*dl.dl*t.n_docs)) AS s
  FROM tf JOIN dfq USING (tok) JOIN dl USING (doc_id) CROSS JOIN tot t
)
SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score FROM s GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT 20
"""

QUERIES["bm25_rank"] = (q_bm25_rank, SQL_BM25_RANK)


def q_winnow(spark, sf):
    """Winnowing fingerprints (k=5-gram hashes, window=4): the MOSS
    clone-detection index — per-doc selected (pos, fp) set."""
    from .operators.textops import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf), k=5, window=4)


SQL_WINNOW = """
WITH nt AS (
  SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(toks[i:i+4], ' ')) AS h,
         len(toks) - 4 AS n_grams
  FROM nt, unnest(range(1, len(toks) - 3)) AS t(i)
  WHERE len(toks) >= 5
),
m AS (
  SELECT doc_id, pos, n_grams,
         MIN(h || ':' || lpad(CAST(pos AS VARCHAR), 8, '0'))
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS minkey
  FROM g
),
s AS (
  SELECT DISTINCT doc_id, minkey FROM m WHERE pos <= n_grams - 3
)
SELECT doc_id,
       CAST(string_split(minkey, ':')[2] AS INT) AS pos,
       string_split(minkey, ':')[1] AS fp
FROM s
"""

QUERIES["winnow"] = (q_winnow, SQL_WINNOW)


def q_clone_pairs(spark, sf):
    """MOSS clone search: document pairs sharing >= 2 winnowing
    fingerprints (fp-bucketed join with the boilerplate-fp guard)."""
    from .operators.textops import clone_pairs

    return clone_pairs(_docs(spark, sf), k=5, window=4, min_shared=2)


_WINNOW_TAIL = """
SELECT doc_id,
       CAST(string_split(minkey, ':')[2] AS INT) AS pos,
       string_split(minkey, ':')[1] AS fp
FROM s
"""

# reuse SQL_WINNOW's CTE chain (everything up to the final SELECT) and
# continue it with the clone-join stages
SQL_CLONE_PAIRS = (
    SQL_WINNOW.replace(_WINNOW_TAIL.rstrip() + "\n", "").rstrip()
    + """,
fpt AS (
  SELECT DISTINCT doc_id, string_split(minkey, ':')[1] AS fp FROM s
),
keepfp AS (SELECT fp FROM fpt GROUP BY fp HAVING COUNT(*) <= 50),
fk AS (SELECT doc_id, fp FROM fpt JOIN keepfp USING (fp))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fk a JOIN fk b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= 2
"""
)

QUERIES["clone_pairs"] = (q_clone_pairs, SQL_CLONE_PAIRS)


def q_lit_norm(spark, sf):
    """Datatype-aware literal normal form (operators/canon.py): messy
    integer/decimal/boolean lexicals synthesized per doc_id (same
    expressions in the oracle), invalid lexicals pass through."""
    from .operators.canon import normalize_literals

    d = F.col("doc_id")
    kind = d % 4
    lex = (
        F.when(kind == 0, F.concat(F.lit("+0"), (d % 100).cast("string")))
        .when(kind == 1, F.when(d % 8 == 1, F.lit("-0.000"))
              .otherwise(F.concat((d % 10).cast("string"), F.lit(".500"))))
        .when(kind == 2, F.when(d % 8 == 2, F.lit("1")).otherwise(F.lit("true")))
        .otherwise(F.concat(F.lit("x"), d.cast("string")))
    )
    dtype = (
        F.when(kind == 1, F.lit("http://www.w3.org/2001/XMLSchema#decimal"))
        .when(kind == 2, F.lit("http://www.w3.org/2001/XMLSchema#boolean"))
        .otherwise(F.lit("http://www.w3.org/2001/XMLSchema#integer"))
    )
    quads = _docs(spark, sf).select(
        F.lit(0).alias("s_kind"),
        F.concat(F.lit("urn:d:"), d.cast("string")).alias("s_lex"),
        F.lit("urn:p:val").alias("pred"),
        F.lit(2).alias("o_kind"),
        lex.alias("o_lex"),
        dtype.alias("o_dtype"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit("urn:g:x").alias("graph"),
    )
    return normalize_literals(quads).select("s_lex", "o_dtype", "o_lex")


SQL_LIT_NORM = r"""
WITH q AS (
  SELECT 'urn:d:' || CAST(doc_id AS VARCHAR) AS s_lex,
         CASE WHEN doc_id % 4 = 0 THEN '+0' || CAST(doc_id % 100 AS VARCHAR)
              WHEN doc_id % 4 = 1 THEN (CASE WHEN doc_id % 8 = 1 THEN '-0.000'
                   ELSE CAST(doc_id % 10 AS VARCHAR) || '.500' END)
              WHEN doc_id % 4 = 2 THEN (CASE WHEN doc_id % 8 = 2 THEN '1' ELSE 'true' END)
              ELSE 'x' || CAST(doc_id AS VARCHAR) END AS lex,
         CASE WHEN doc_id % 4 = 1 THEN 'http://www.w3.org/2001/XMLSchema#decimal'
              WHEN doc_id % 4 = 2 THEN 'http://www.w3.org/2001/XMLSchema#boolean'
              ELSE 'http://www.w3.org/2001/XMLSchema#integer' END AS o_dtype
  FROM documents
)
SELECT s_lex, o_dtype,
       CASE WHEN o_dtype LIKE '%#integer'
            THEN COALESCE(CAST(TRY_CAST(lex AS HUGEINT) AS VARCHAR), lex)
            WHEN o_dtype LIKE '%#decimal'
            THEN COALESCE(regexp_replace(regexp_replace(
                   CAST(TRY_CAST(lex AS DECIMAL(38,6)) AS VARCHAR),
                   '^(-?\d+)\.0*$', '\1'), '(\.\d*?)0+$', '\1'), lex)
            WHEN o_dtype LIKE '%#boolean'
            THEN CASE WHEN lex IN ('1','true') THEN 'true'
                      WHEN lex IN ('0','false') THEN 'false' ELSE lex END
            ELSE lex END AS o_lex
FROM q
"""

QUERIES["lit_norm"] = (q_lit_norm, SQL_LIT_NORM)


def q_bgp_join_stats(spark, sf):
    """The bgp_join 6-pattern query planned with ANALYZE statistics
    (algebra.analyze → Ctx.stats): greedy smallest-estimate-first,
    connectivity-constrained join order. Same solutions as bgp_join —
    the oracle is identical; what changes is the join tree."""
    from .algebra import analyze

    quads = triples_view(spark, sf)
    ctx = Ctx(quads, stats=analyze(quads))
    node = BGP(
        [
            T_(Var("c"), Iri(RDF_TYPE), Iri("urn:c:Customer")),
            T_(Var("c"), Iri(P_NAME), Var("cname")),
            T_(Var("c"), Iri(P_IN_NATION), Var("n")),
            T_(Var("n"), Iri(P_NAME), Var("nname")),
            T_(Var("n"), Iri(P_IN_REGION), Var("r")),
            T_(Var("r"), Iri(P_NAME), Literal("ASIA")),
        ]
    )
    return _flat(Project(node, ["cname", "nname"]), ctx, "cname", "nname")


QUERIES["bgp_join_stats"] = (q_bgp_join_stats, SQL_BGP_JOIN)


def q_quality_rules(spark, sf):
    """Gopher/C4 heuristic quality-rule battery: exact integer signals +
    0/1 flags per document (operators/textops.py::quality_rules)."""
    from .operators.textops import quality_rules

    return quality_rules(_docs(spark, sf))


SQL_QUALITY_RULES = r"""
WITH d AS (
  SELECT doc_id,
         string_split(text, chr(10)) AS lines,
         list_filter(string_split_regex(trim(text), '\s+'), w -> w <> '') AS ws
  FROM documents
),
m AS (
  SELECT doc_id,
         len(ws) AS n_words,
         greatest(len(lines), 1) AS n_lines,
         -- length() = characters (Spark's length); strlen() is BYTES and
         -- diverges on multibyte codepoints (caught by the fuzz harness)
         list_sum(list_transform(ws, w -> length(w))) AS total_chars,
         len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*•]'))) AS n_bullet,
         len(list_filter(lines, l -> regexp_matches(rtrim(l), '(\.\.\.|…)$'))) AS n_ellipsis,
         len(list_filter(lines, l -> regexp_matches(rtrim(l), '[.!?"]$'))) AS n_terminal,
         len(list_filter(ws, w -> contains(w, '#'))) AS n_hash
  FROM d
),
s AS (
  SELECT doc_id,
         CAST(n_words AS BIGINT) AS n_words,
         CAST(floor(CASE WHEN n_words > 0
              THEN 100.0 * COALESCE(total_chars, 0) / n_words ELSE 0 END) AS BIGINT) AS mean_wl_x100,
         CAST(floor(100.0 * n_bullet / n_lines) AS BIGINT) AS bullet_pct,
         CAST(floor(100.0 * n_ellipsis / n_lines) AS BIGINT) AS ellipsis_pct,
         CAST(n_terminal AS BIGINT) AS n_terminal_lines,
         CAST(floor(100.0 * n_hash / greatest(n_words, 1)) AS BIGINT) AS hash_pct
  FROM m
)
SELECT *,
       CAST(CASE WHEN n_words BETWEEN 50 AND 100000
                  AND mean_wl_x100 BETWEEN 300 AND 1000
                  AND bullet_pct < 90 AND ellipsis_pct < 30
                  AND hash_pct < 10 AND n_terminal_lines >= 1
            THEN 1 ELSE 0 END AS INT) AS keep
FROM s
"""

QUERIES["quality_rules"] = (q_quality_rules, SQL_QUALITY_RULES)


def q_describe_cbd(spark, sf):
    """Concise Bounded Description: the store is augmented with per-
    customer anonymous address structure (cu -> _:a -> _:g bnode chain);
    DESCRIBE <urn:cu:5> with cbd=True must return the base triples plus
    the whole 2-level bnode closure — and nothing else."""
    from .algebra import describe
    from .types import TRIPLE_KEY, Iri as TIri

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    k = F.col("c_custkey").cast("string")

    def syn(skind, slex, pred, okind, olex):
        return cu.select(
            F.lit(skind).alias("s_kind"), slex.alias("s_lex"),
            F.lit(pred).alias("pred"),
            F.lit(okind).alias("o_kind"), olex.alias("o_lex"),
            F.lit(None).cast("string").alias("o_dtype"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit("urn:g:addr").alias("graph"),
        )

    aug = (
        triples_view(spark, sf).select(*TRIPLE_KEY)
        .unionByName(syn(0, F.concat(F.lit("urn:cu:"), k), "urn:p:addr", 1, F.concat(F.lit("a"), k)))
        .unionByName(syn(1, F.concat(F.lit("a"), k), "urn:p:street", 2, F.concat(F.lit("S"), k)))
        .unionByName(syn(1, F.concat(F.lit("a"), k), "urn:p:geo", 1, F.concat(F.lit("g"), k)))
        .unionByName(syn(1, F.concat(F.lit("g"), k), "urn:p:lat", 2, k))
    )
    out = describe([TIri("urn:cu:5")], Ctx(aug), cbd=True)
    # coalesce: the harness sorts row tuples, and a column mixing NULL and
    # strings is unorderable in Python
    return out.select(
        "s_lex", "pred", "o_kind", "o_lex",
        F.coalesce(F.col("o_dtype"), F.lit("")).alias("o_dtype"), "graph",
    )


SQL_DESCRIBE_CBD = (
    W
    + """,
aug AS (
  SELECT * FROM triples
  UNION ALL SELECT 'urn:cu:'||c_custkey, 'urn:p:addr', 1, 'a'||c_custkey, NULL, 'urn:g:addr' FROM customer
  UNION ALL SELECT 'a'||c_custkey, 'urn:p:street', 2, 'S'||c_custkey, NULL, 'urn:g:addr' FROM customer
  UNION ALL SELECT 'a'||c_custkey, 'urn:p:geo', 1, 'g'||c_custkey, NULL, 'urn:g:addr' FROM customer
  UNION ALL SELECT 'g'||c_custkey, 'urn:p:lat', 2, CAST(c_custkey AS VARCHAR), NULL, 'urn:g:addr' FROM customer
)
SELECT s_lex, pred, o_kind, o_lex, COALESCE(o_dtype, '') AS o_dtype, graph FROM aug
WHERE s_lex IN ('urn:cu:5', 'a5', 'g5')
"""
)

QUERIES["describe_cbd"] = (q_describe_cbd, SQL_DESCRIBE_CBD)


def q_encode_tokens(spark, sf):
    """Vocab-rank token encoding (256-token vocabulary): each document
    as its token-id CSV — the tokenizer step between vocab_topk and
    pack_offsets."""
    from .operators.textops import encode_tokens

    return encode_tokens(_docs(spark, sf), vocab_size=256)


SQL_ENCODE_TOKENS = """
WITH nt AS (
  SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
  FROM documents
),
tok AS (
  SELECT doc_id, i AS pos, toks[i] AS tok
  FROM nt, unnest(range(1, len(toks) + 1)) AS t(i)
  WHERE toks[i] <> ''
),
vocab AS (
  SELECT tok, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok ASC) AS tid
  FROM tok GROUP BY tok
  ORDER BY COUNT(*) DESC, tok ASC LIMIT 256
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tok,
       string_agg(CAST(COALESCE(v.tid, 0) AS VARCHAR), ',' ORDER BY pos) AS ids_csv
FROM tok LEFT JOIN vocab v USING (tok)
GROUP BY doc_id
"""

QUERIES["encode_tokens"] = (q_encode_tokens, SQL_ENCODE_TOKENS)


def q_random_walks(spark, sf):
    """Deterministic DeepWalk corpus (2 walks/node, length 3) over the
    directed chain-with-chords customer graph — hash-argmin neighbor
    choice makes every sequence bit-identical across engines."""
    from pyspark.sql.window import Window

    from .operators.walks import random_walks

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    r = cu.select(
        F.col("c_custkey").cast("string").alias("k"),
        "c_nationkey",
        F.row_number().over(Window.partitionBy("c_nationkey").orderBy("c_custkey")).alias("rn"),
    )
    hop1 = r.select("c_nationkey", (F.col("rn") - 1).alias("rn"), F.col("k").alias("dst"))
    hop2 = r.select("c_nationkey", (F.col("rn") - 2).alias("rn"), F.col("k").alias("dst"))
    e = (
        r.join(hop1, ["c_nationkey", "rn"]).select(F.col("k").alias("src"), "dst")
        .unionByName(r.join(hop2, ["c_nationkey", "rn"]).select(F.col("k").alias("src"), "dst"))
    )
    return random_walks(e, walks_per_node=2, walk_len=3)


def _walks_sql(walks_per_node: int, walk_len: int) -> str:
    parts = [
        f"""WITH r AS (
  SELECT CAST(c_custkey AS VARCHAR) AS kk, c_nationkey,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
  FROM customer
),
raw AS (
  SELECT a.kk AS src, b.kk AS dst FROM r a JOIN r b
    ON a.c_nationkey = b.c_nationkey AND b.rn = a.rn + 1
  UNION ALL
  SELECT a.kk, b.kk FROM r a JOIN r b
    ON a.c_nationkey = b.c_nationkey AND b.rn = a.rn + 2
),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM raw UNION ALL SELECT dst FROM raw)),
s0 AS MATERIALIZED (
  SELECT n.node AS start, CAST(t.w AS INT) AS walk, n.node AS cur, n.node AS seq
  FROM nodes n, unnest(range({walks_per_node})) AS t(w)
)"""
    ]
    for i in range(walk_len):
        parts.append(
            f""",
s{i + 1} AS MATERIALIZED (
  SELECT start, walk,
         CASE WHEN k IS NOT NULL THEN string_split(k, chr(31))[2] END AS cur,
         CASE WHEN k IS NOT NULL THEN seq || ',' || string_split(k, chr(31))[2]
              ELSE seq END AS seq
  FROM (
    SELECT start, walk, seq,
           MIN(CASE WHEN e.dst IS NOT NULL THEN
               md5(w.cur || chr(31) || e.dst || chr(31) ||
                   CAST(w.walk AS VARCHAR) || chr(31) || '{i}')
               || chr(31) || e.dst END) AS k
    FROM s{i} w LEFT JOIN raw e ON e.src = w.cur
    GROUP BY start, walk, seq
  )
)"""
        )
    parts.append(f"""
SELECT start, walk, seq FROM s{walk_len}""")
    return "".join(parts)


QUERIES["random_walks"] = (q_random_walks, _walks_sql(2, 3))


def q_skipgram(spark, sf):
    """Skip-gram (center, context) pair counts (window ±2) over the
    deterministic walk corpus — the walks → word2vec training-pairs
    composition, exact end-to-end."""
    from .operators.walks import random_walks, skipgram_pairs

    from pyspark.sql.window import Window

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    r = cu.select(
        F.col("c_custkey").cast("string").alias("k"),
        "c_nationkey",
        F.row_number().over(Window.partitionBy("c_nationkey").orderBy("c_custkey")).alias("rn"),
    )
    hop1 = r.select("c_nationkey", (F.col("rn") - 1).alias("rn"), F.col("k").alias("dst"))
    hop2 = r.select("c_nationkey", (F.col("rn") - 2).alias("rn"), F.col("k").alias("dst"))
    e = (
        r.join(hop1, ["c_nationkey", "rn"]).select(F.col("k").alias("src"), "dst")
        .unionByName(r.join(hop2, ["c_nationkey", "rn"]).select(F.col("k").alias("src"), "dst"))
    )
    return skipgram_pairs(random_walks(e, walks_per_node=2, walk_len=3), window=2)


def _skipgram_sql() -> str:
    base = _walks_sql(2, 3)
    tail = "\nSELECT start, walk, seq FROM s3"
    assert base.endswith(tail)
    return base[: -len(tail)] + """,
sq AS (SELECT string_split(seq, ',') AS t FROM s3),
pr AS (
  SELECT t[i] AS center, t[j] AS context
  FROM sq,
       unnest(range(1, len(t) + 1)) AS a(i),
       unnest(range(1, len(t) + 1)) AS b(j)
  WHERE j <> i AND abs(j - i) <= 2
)
SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n
FROM pr GROUP BY center, context
"""


QUERIES["skipgram"] = (q_skipgram, _skipgram_sql())


def q_neg_samples(spark, sf):
    """Deterministic word2vec negative sampling (k=2, 64-slot unigram
    table) over the skip-gram pairs — pure function of each pair, exact
    cross-engine."""
    from .operators.walks import negative_samples

    return negative_samples(q_skipgram(spark, sf), k=2, table_size=64)


def _neg_samples_sql(k: int, table_size: int) -> str:
    base = _skipgram_sql()
    tail = base.rstrip().rsplit("SELECT center, context", 1)
    return (
        tail[0]
        + f""", pairs AS MATERIALIZED (
SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n
FROM pr GROUP BY center, context
),
tbl AS MATERIALIZED (
  SELECT center AS node,
         ROW_NUMBER() OVER (ORDER BY SUM(n) DESC, center ASC) AS rank
  FROM pairs GROUP BY center
  ORDER BY SUM(n) DESC, center ASC LIMIT {table_size}
),
mm AS (SELECT COUNT(*) AS m FROM tbl),
drawn AS (
  SELECT center, context, t.j,
         (('0x' || substr(md5(center || chr(31) || context || chr(31) ||
            CAST(t.j AS VARCHAR)), 1, 15))::BIGINT % m) + 1 AS idx, m
  FROM pairs, mm, unnest(range({k})) AS t(j)
)
SELECT d.center, d.context, CAST(d.j AS INT) AS j,
       CASE WHEN t1.node <> d.context THEN t1.node ELSE t2.node END AS neg
FROM drawn d
JOIN tbl t1 ON t1.rank = d.idx
JOIN tbl t2 ON t2.rank = (d.idx % d.m) + 1
"""
    )


QUERIES["neg_samples"] = (q_neg_samples, _neg_samples_sql(2, 64))


def q_pair_lift(spark, sf):
    """Lift (PMI-surrogate) scores over the skip-gram pair table —
    integer-exact association mining on the walk corpus."""
    from .operators.walks import pair_lift

    return pair_lift(q_skipgram(spark, sf))


def _pair_lift_sql() -> str:
    base = _skipgram_sql()
    tail = base.rstrip().rsplit("SELECT center, context", 1)
    return (
        tail[0]
        + """, pairs AS MATERIALIZED (
SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n
FROM pr GROUP BY center, context
),
nc AS (SELECT center, SUM(n) AS n_c FROM pairs GROUP BY center),
nx AS (SELECT context, SUM(n) AS n_x FROM pairs GROUP BY context),
tot AS (SELECT SUM(n) AS nn FROM pairs)
SELECT p.center, p.context, p.n,
       CAST(floor(CAST(1000000 * p.n * t.nn AS DOUBLE) / (c.n_c * x.n_x)) AS BIGINT) AS lift_x1m
FROM pairs p JOIN nc c USING (center) JOIN nx x USING (context) CROSS JOIN tot t
"""
    )


QUERIES["pair_lift"] = (q_pair_lift, _pair_lift_sql())


def _chain_graph(spark, sf):
    """The deterministic chain-with-chords customer graph shared by the
    walk/BFS/label-prop queries: per-nation custkey order gives rn, edges
    rn→rn+1 and rn→rn+2 (a DAG with known structure on any scale)."""
    from pyspark.sql.window import Window

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    r = cu.select(
        F.col("c_custkey").cast("string").alias("k"),
        "c_nationkey",
        F.row_number().over(Window.partitionBy("c_nationkey").orderBy("c_custkey")).alias("rn"),
    )
    hop1 = r.select("c_nationkey", (F.col("rn") - 1).alias("rn"), F.col("k").alias("dst"))
    hop2 = r.select("c_nationkey", (F.col("rn") - 2).alias("rn"), F.col("k").alias("dst"))
    e = (
        r.join(hop1, ["c_nationkey", "rn"]).select(F.col("k").alias("src"), "dst")
        .unionByName(r.join(hop2, ["c_nationkey", "rn"]).select(F.col("k").alias("src"), "dst"))
    )
    return r, e


#: shared CTE text for the same graph on the DuckDB side (kept in lockstep
#: with _chain_graph and _walks_sql)
_CHAIN_SQL = """r AS (
  SELECT CAST(c_custkey AS VARCHAR) AS kk, c_nationkey,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
  FROM customer
),
raw AS (
  SELECT a.kk AS src, b.kk AS dst FROM r a JOIN r b
    ON a.c_nationkey = b.c_nationkey AND b.rn = a.rn + 1
  UNION ALL
  SELECT a.kk, b.kk FROM r a JOIN r b
    ON a.c_nationkey = b.c_nationkey AND b.rn = a.rn + 2
)"""


def q_bfs_dist(spark, sf):
    """Multi-source BFS hop distances (max 8 hops) from each nation
    chain's head over the chain-with-chords graph — the Pregel-SSSP
    shape (unit weights) with exact integer hop labels."""
    from .operators.cc import bfs_distances

    r, e = _chain_graph(spark, sf)
    seeds = r.filter(F.col("rn") == 1).select(F.col("k").alias("node"))
    return bfs_distances(e, seeds, max_hops=8)


def _bfs_sql(hops: int) -> str:
    parts = [
        "WITH " + _CHAIN_SQL + """,
s0 AS (SELECT kk AS node, 0 AS dist FROM r WHERE rn = 1)"""
    ]
    for h in range(1, hops + 1):
        parts.append(
            f""",
s{h} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM s{h - 1}
    UNION ALL
    SELECT e.dst, s.dist + 1 FROM s{h - 1} s JOIN raw e ON e.src = s.node
  ) GROUP BY node
)"""
        )
    parts.append(f"\nSELECT node, CAST(dist AS BIGINT) AS dist FROM s{hops}")
    return "".join(parts)


QUERIES["bfs_dist"] = (q_bfs_dist, _bfs_sql(8))


def q_label_prop(spark, sf):
    """Deterministic synchronous label propagation (3 rounds, mode label,
    min tiebreak) over the undirected chain-with-chords graph — bounded
    community detection, exact against a 3×-unrolled QUALIFY mirror."""
    from .operators.cc import label_propagation

    _r, e = _chain_graph(spark, sf)
    return label_propagation(e, rounds=3)


def _label_prop_sql(rounds: int) -> str:
    parts = [
        "WITH " + _CHAIN_SQL + """,
bi AS (SELECT src, dst FROM raw WHERE src <> dst
       UNION SELECT dst, src FROM raw WHERE src <> dst),
l0 AS (SELECT DISTINCT src AS node, src AS label FROM bi)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f""",
c{t} AS (
  SELECT b.src AS node, l.label AS nl, COUNT(*) AS n
  FROM bi b JOIN l{t - 1} l ON l.node = b.dst
  GROUP BY b.src, l.label
),
l{t} AS MATERIALIZED (
  SELECT node, nl AS label FROM c{t}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY node ORDER BY n DESC, nl ASC) = 1
)"""
        )
    parts.append(f"\nSELECT node, label FROM l{rounds}")
    return "".join(parts)


QUERIES["label_prop"] = (q_label_prop, _label_prop_sql(3))


#: shared DuckDB tokenization CTE (lockstep with textops._norm_tokens)
_TOKS_SQL = """nt AS (
  SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
  FROM documents
)"""


def q_lm_score(spark, sf):
    """Bigram-LM pseudo-likelihood quality scores (corpus-trained model,
    integer-quantized conditional probabilities) — the CCNet-style LM
    quality filter, value-exact cross-engine."""
    from .operators.textops import lm_score

    return lm_score(_docs(spark, sf))


SQL_LM_SCORE = f"""
WITH {_TOKS_SQL},
bg AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM nt, unnest(range(1, len(toks))) AS t(i)
),
cb AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY w1, w2),
cp AS (SELECT w1, SUM(n) AS np FROM cb GROUP BY w1),
q AS (SELECT w1, w2, (1000000 * n) // np AS qv FROM cb JOIN cp USING (w1))
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(qv) AS BIGINT) AS score_sum,
       CAST(SUM(qv) // COUNT(*) AS BIGINT) AS score_avg
FROM bg JOIN q USING (w1, w2) GROUP BY doc_id
"""

QUERIES["lm_score"] = (q_lm_score, SQL_LM_SCORE)


def q_cms_sketch(spark, sf):
    """Count-min sketch cells (4×64 BIGINT grid) over the corpus token
    stream — the mergeable-summary shape; cell counts are integer sums,
    bit-identical across partitionings and engines."""
    from .operators.textops import cms_sketch

    return cms_sketch(_docs(spark, sf))


_CMS_CELLS_SQL = """tok AS (
  SELECT toks[i] AS tok
  FROM nt, unnest(range(1, len(toks) + 1)) AS t(i)
  WHERE toks[i] <> ''
),
cells AS (
  SELECT rr.r AS r,
         ('0x' || substr(md5(CAST(rr.r AS VARCHAR) || chr(31) || tok), 1, 15))::BIGINT % 64 AS c
  FROM tok, unnest(range(4)) AS rr(r)
),
sketch AS (
  SELECT CAST(r AS INT) AS r, c, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cells GROUP BY r, c
)"""

SQL_CMS_SKETCH = f"""
WITH {_TOKS_SQL},
{_CMS_CELLS_SQL}
SELECT r, c, cnt FROM sketch
"""

QUERIES["cms_sketch"] = (q_cms_sketch, SQL_CMS_SKETCH)


def q_cms_estimate(spark, sf):
    """Count-min read path: point estimates (min over sketch rows) for
    the 20 most frequent tokens, alongside their exact counts — pins the
    over-estimate values exactly, not just the CMS ≥ invariant."""
    from .operators.textops import cms_estimate

    return cms_estimate(_docs(spark, sf))


SQL_CMS_ESTIMATE = f"""
WITH {_TOKS_SQL},
{_CMS_CELLS_SQL},
tokc AS (SELECT tok, COUNT(*) AS exact_n FROM tok GROUP BY tok),
top AS (SELECT tok, exact_n FROM tokc ORDER BY exact_n DESC, tok ASC LIMIT 20),
probes AS (
  SELECT tok, exact_n, CAST(rr.r AS INT) AS r,
         ('0x' || substr(md5(CAST(rr.r AS VARCHAR) || chr(31) || tok), 1, 15))::BIGINT % 64 AS c
  FROM top, unnest(range(4)) AS rr(r)
)
SELECT p.tok, CAST(p.exact_n AS BIGINT) AS exact_n, CAST(MIN(s.cnt) AS BIGINT) AS est
FROM probes p JOIN sketch s ON s.r = p.r AND s.c = p.c
GROUP BY p.tok, p.exact_n
"""

QUERIES["cms_estimate"] = (q_cms_estimate, SQL_CMS_ESTIMATE)


def q_hll_sketch(spark, sf):
    """Per-group HyperLogLog register state (64 buckets, md5-ranked):
    distinct-user sketch per event_type — the fixed-size mergeable
    per-KEY summary (cell-wise MAX merge), one map-side-combined agg."""
    from .operators.sketches import hll_sketch

    ev = spark.read.parquet(f"{sf}/events.parquet")
    return hll_sketch(ev, "user_id", ["event_type"])


def q_hll_estimate(spark, sf):
    """HLL read path: integer-exact raw estimator + the 64-entry
    linear-counting literal table for the small range — every value
    (nb, s_sum, est) oracled exactly, unlike library approx_count_distinct."""
    from .operators.sketches import hll_estimate

    ev = spark.read.parquet(f"{sf}/events.parquet")
    return hll_estimate(ev, "user_id", ["event_type"])


from .operators.sketches import hll_oracle_sql as _hll_sql  # noqa: E402

QUERIES["hll_sketch"] = (q_hll_sketch, _hll_sql("events", "user_id", ["event_type"]))
QUERIES["hll_estimate"] = (q_hll_estimate, _hll_sql("events", "user_id", ["event_type"], estimate=True))


def q_chunk_docs(spark, sf):
    """Context-window chunking (64-token windows, 16-token overlap) over
    the documents table — scan-local, integer offsets, bounded row width."""
    from .operators.textops import chunk_docs

    return chunk_docs(_docs(spark, sf), chunk_tokens=64, overlap=16)


def _chunk_sql(chunk: int, overlap: int) -> str:
    step = chunk - overlap
    return f"""
WITH {_TOKS_SQL},
d AS (
  SELECT doc_id, toks, len(toks) AS n FROM nt
  WHERE len(toks) > 0 AND toks[1] <> ''
),
c AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS chunk_id, n, toks
  FROM d, unnest(range(0,
      CASE WHEN n <= {chunk} THEN 1 ELSE 1 + (n - {chunk} + {step} - 1) // {step} END
  )) AS t(i)
)
SELECT doc_id, chunk_id,
       CAST(chunk_id * {step} AS BIGINT) AS start_tok,
       CAST(LEAST({chunk}, n - chunk_id * {step}) AS BIGINT) AS n_toks,
       array_to_string(list_slice(toks, chunk_id * {step} + 1, chunk_id * {step} + {chunk}), ' ') AS chunk_text
FROM c
"""


QUERIES["chunk_docs"] = (q_chunk_docs, _chunk_sql(64, 16))


def q_linkpred(spark, sf):
    """Link-prediction scoring (common neighbors + integer resource-
    allocation index) over the undirected chain-with-chords customer
    graph — wedge-generated, hub-capped, direct edges anti-joined out."""
    from .operators.linking import linkpred_scores

    _r, e = _chain_graph(spark, sf)
    return linkpred_scores(e, max_degree=1000)


SQL_LINKPRED = (
    "WITH "
    + _CHAIN_SQL
    + """,
e AS (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE src <> dst GROUP BY 1, 2
),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e
  ) GROUP BY node
),
adj AS (SELECT a AS z, b AS x FROM e UNION ALL SELECT b, a FROM e),
centers AS (SELECT node AS z, 1000000 // deg AS w FROM deg WHERE deg <= 1000),
cadj AS (SELECT adj.z, x, w FROM adj JOIN centers USING (z)),
wedges AS (
  SELECT c1.z, c1.w, c1.x AS a, c2.x AS b
  FROM cadj c1 JOIN cadj c2 ON c1.z = c2.z AND c1.x < c2.x
),
scored AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cn, CAST(SUM(w) AS BIGINT) AS ra
  FROM wedges GROUP BY a, b
)
SELECT s.a, s.b, s.cn, s.ra
FROM scored s LEFT JOIN e ON s.a = e.a AND s.b = e.b
WHERE e.a IS NULL
"""
)

QUERIES["linkpred"] = (q_linkpred, SQL_LINKPRED)


#: probe instant for the SCD2 point-in-time query — mid-range at every SF
_SCD2_TS = "2024-01-15 12:00:00"


def q_scd2_asof(spark, sf):
    """SCD2 point-in-time state: rebuild per-user validity intervals from
    the event history (value observed at ts is valid until the next
    observation) and read the state as of a fixed instant — one window
    shuffle + a map-only probe filter."""
    from .operators.temporal import as_of_snapshot, snapshot_intervals

    ev = spark.read.parquet(f"{sf}/events.parquet")
    iv = snapshot_intervals(
        ev,
        keys=["user_id"],
        ts_col="ts",
        order_cols=["event_id"],
        payload=["event_id", "event_type"],
    )
    return as_of_snapshot(iv, _ts_us := 1705320000000000)  # 2024-01-15T12:00:00Z


SQL_SCD2_ASOF = f"""
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) AS valid_from_us,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us,
         event_id, event_type
  FROM events
)
SELECT user_id, valid_from_us, valid_to_us, event_id, event_type
FROM iv
WHERE valid_from_us <= 1705320000000000
  AND (valid_to_us IS NULL OR valid_to_us > 1705320000000000)
"""

QUERIES["scd2_asof"] = (q_scd2_asof, SQL_SCD2_ASOF)


def q_score_resample(spark, sf):
    """Deterministic quality-weighted resampling flags: keep w.p.
    min(n_chars, 2000)/2000 decided by the doc's own hash — map-only,
    engine-stable corpus curation (never rand())."""
    from .operators.sketches import score_resample

    d = _docs(spark, sf).select("doc_id", "n_chars")
    return score_resample(d, "doc_id", "n_chars", 2000)


SQL_SCORE_RESAMPLE = """
SELECT doc_id, n_chars,
       (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 2000)
         < LEAST(n_chars, 2000) AS kept
FROM documents
"""

QUERIES["score_resample"] = (q_score_resample, SQL_SCORE_RESAMPLE)


def q_scc_cycles(spark, sf):
    """Directed-cycle detection (SCC members + min-member component) over
    a TAXONOMY-SIZED slice of the chain graph (rn ≤ 50 per nation) with
    deterministic loop-back chords every 10 ranks — the hierarchy-repair
    op: skos:broader/subClassOf cycles collapse to equivalence classes
    before closure computation. The slice models the operator's
    documented tier (ontologies don't grow with the corpus); the
    UNBOUNDED chain would make the suite pay the full chain closure —
    path-doubling's seen⋈seen compose step is ~O(n³/6) rows pre-distinct
    on an n-deep chain, which at sf0.1 (n≈600/nation) is a ~1e9-row
    join no 8 GiB bench driver should attempt."""
    from .operators.cc import scc_components

    r, e0 = _chain_graph(spark, sf)
    r = r.filter(F.col("rn") <= 50)
    keys = r.select(F.col("k"))
    e = (
        e0.join(keys.withColumnRenamed("k", "src"), "src", "left_semi")
        .join(keys.withColumnRenamed("k", "dst"), "dst", "left_semi")
        .select("src", "dst")
    )
    # back edge: rank 10k → rank 10k-9 (src is the 10k row's key)
    back = (
        r.filter(F.col("rn") % 10 == 0)
        .select("c_nationkey", "rn", F.col("k").alias("src"))
        .withColumn("rn", F.col("rn") - 9)
        .join(r.select("c_nationkey", "rn", F.col("k").alias("dst")), ["c_nationkey", "rn"])
        .select("src", "dst")
    )
    return scc_components(e.unionByName(back))


SQL_SCC_CYCLES = (
    "WITH RECURSIVE "
    + _CHAIN_SQL
    + """,
rs AS (SELECT kk, c_nationkey, rn FROM r WHERE rn <= 50),
e AS (
  SELECT raw.src, raw.dst FROM raw
  JOIN rs s1 ON s1.kk = raw.src JOIN rs s2 ON s2.kk = raw.dst
),
back AS (
  SELECT a.kk AS src, b.kk AS dst
  FROM rs a JOIN rs b
    ON a.c_nationkey = b.c_nationkey AND a.rn % 10 = 0 AND b.rn = a.rn - 9
),
g AS (SELECT src, dst FROM e UNION SELECT src, dst FROM back),
c(src, dst) AS (
  SELECT src, dst FROM g
  UNION
  SELECT c.src, g.dst FROM c JOIN g ON c.dst = g.src
)
SELECT c1.src AS node, MIN(c1.dst) AS component
FROM c c1 JOIN c c2 ON c2.src = c1.dst AND c2.dst = c1.src
GROUP BY c1.src
"""
)

QUERIES["scc_cycles"] = (q_scc_cycles, SQL_SCC_CYCLES)


def q_compaction_plan(spark, sf):
    """Small-file compaction planning (sequential binpack toward a 4 KiB
    target) over a deterministic file listing synthesized from the
    documents table — metadata-sized plan with an exact SQL mirror."""
    from .store import compaction_plan

    files = _docs(spark, sf).select(
        F.concat_ws("/", F.col("source"), F.col("doc_id").cast("string")).alias("path"),
        F.col("n_chars").alias("bytes"),
    )
    return compaction_plan(files, target_bytes=4096)


SQL_COMPACTION_PLAN = """
WITH files AS (
  SELECT source || '/' || CAST(doc_id AS VARCHAR) AS path,
         CAST(n_chars AS BIGINT) AS bytes
  FROM documents
)
SELECT path, bytes,
       CAST(COALESCE(SUM(bytes) OVER (ORDER BY path ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4096 AS BIGINT) AS bin
FROM files
"""

QUERIES["compaction_plan"] = (q_compaction_plan, SQL_COMPACTION_PLAN)


def q_tfidf_pairs(spark, sf):
    """Weighted term-overlap document pairs (inverted-index all-pairs,
    idf-surrogate integer weights, df-capped postings) over 3-gram
    shingle terms (the synthetic corpus's 31-word vocabulary makes every
    unigram a stop word) — the topical-twin complement of the
    shingle/winnowing dedup family."""
    from .operators.textops import tfidf_pairs

    # the test table is ONE parquet file = one input split; fan the scan
    # out before the trigram explode (a real corpus arrives in thousands
    # of splits and needs no such shuffle)
    docs = _docs(spark, sf).repartition(32, "doc_id")
    return tfidf_pairs(docs, df_cap=20, min_shared=2, term_ngram=3)


SQL_TFIDF_PAIRS = f"""
WITH {_TOKS_SQL},
g AS (
  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS tok
  FROM nt, unnest(range(1, len(toks) - 1)) AS t(i)
  WHERE len(toks) >= 3
),
dfreq AS (SELECT tok, COUNT(*) AS df FROM g GROUP BY tok),
rare AS (SELECT tok, 1000000 // df AS w FROM dfreq WHERE df <= 20),
post AS (SELECT t.doc_id, t.tok, r.w FROM g t JOIN rare r USING (tok)),
pairs AS (
  SELECT p1.doc_id AS a, p2.doc_id AS b, p1.w
  FROM post p1 JOIN post p2 ON p1.tok = p2.tok AND p1.doc_id < p2.doc_id
)
SELECT a, b, CAST(COUNT(*) AS BIGINT) AS shared, CAST(SUM(w) AS BIGINT) AS w_overlap
FROM pairs GROUP BY a, b HAVING COUNT(*) >= 2
"""

QUERIES["tfidf_pairs"] = (q_tfidf_pairs, SQL_TFIDF_PAIRS)


def q_harmonic(spark, sf):
    """Sampled inward harmonic centrality (per-seed BFS, 6 hops, seeds =
    the two chain heads per nation) — integer reciprocal-distance sums,
    exact against a 6×-unrolled per-seed min-dist mirror."""
    from .operators.cc import harmonic_centrality

    r, e = _chain_graph(spark, sf)
    seeds = r.filter(F.col("rn") <= 2).select(F.col("k").alias("node"))
    return harmonic_centrality(e, seeds, max_hops=6)


def _harmonic_sql(hops: int) -> str:
    parts = [
        "WITH " + _CHAIN_SQL + """,
s0 AS (SELECT kk AS seed, kk AS node, 0 AS dist FROM r WHERE rn <= 2)"""
    ]
    for h in range(1, hops + 1):
        parts.append(
            f""",
s{h} AS MATERIALIZED (
  SELECT seed, node, MIN(dist) AS dist FROM (
    SELECT seed, node, dist FROM s{h - 1}
    UNION ALL
    SELECT s.seed, e.dst, s.dist + 1 FROM s{h - 1} s JOIN raw e ON e.src = s.node
  ) GROUP BY seed, node
)"""
        )
    parts.append(
        f"""
SELECT node, CAST(SUM(1000000 // dist) AS BIGINT) AS h, CAST(COUNT(*) AS BIGINT) AS n_sources
FROM s{hops} WHERE dist > 0 GROUP BY node"""
    )
    return "".join(parts)


QUERIES["harmonic"] = (q_harmonic, _harmonic_sql(6))


def q_path_repeat(spark, sf):
    """Quantified path (inNation|inRegion){2,} — SEP-0002/SPARQL-1.2
    quantifiers via Repeat: exactly-n prefix composed with the reflexive
    closure tail; here = exactly the 2-hop customer/supplier→region
    pairs (the hierarchy is 2 deep, so {2,} ≡ {2})."""
    from .operators.paths import Repeat

    node = PathPattern(VS, Repeat(Alt(PP(P_IN_NATION), PP(P_IN_REGION)), 2, None), VO)
    return _flat(node, _ctx(spark, sf), "s", "o")


SQL_PATH_REPEAT = """
SELECT 'urn:cu:'||c_custkey AS s, 'urn:r:'||n_regionkey AS o
FROM customer JOIN nation ON c_nationkey = n_nationkey
UNION
SELECT 'urn:su:'||s_suppkey, 'urn:r:'||n_regionkey
FROM supplier JOIN nation ON s_nationkey = n_nationkey
"""

QUERIES["path_repeat"] = (q_path_repeat, SQL_PATH_REPEAT)


def q_funnel(spark, sf):
    """Ordered funnel view→click→purchase within 24h: one user_id
    shuffle + a scan-local array fold (no per-step join cascade);
    greedy-earliest matching, strict ordering, integer timestamps."""
    from .operators.events import funnel

    ev = spark.read.parquet(f"{sf}/events.parquet")
    return funnel(ev, ["view", "click", "purchase"], within_s=86400)


SQL_FUNNEL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
s1 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
    AND epoch_us(e.ts) <= s1.t1 + 86400000000
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
  FROM events e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
    AND epoch_us(e.ts) <= s1.t1 + 86400000000
  GROUP BY e.user_id
)
SELECT u.user_id,
       CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                 WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS depth,
       s1.t1 AS t1_us,
       (t3 IS NOT NULL) AS completed
FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""

QUERIES["funnel"] = (q_funnel, SQL_FUNNEL)


# ---------------------------------------------------------------------------
# PII scrub, corpus line dedup, integer k-means, SemDeDup (round 3 batch 3)
# ---------------------------------------------------------------------------


def _pii_docs(spark, sf):
    """documents with deterministic PII injected (the synthetic corpus has
    none): doc_id%4 selects email / IPv4 / phone / clean; mirrored
    verbatim in the oracle's CASE."""
    d = _docs(spark, sf)
    did = F.col("doc_id")
    tail = (
        F.when(
            did % 4 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com now")),
        )
        .when(
            did % 4 == 1,
            F.concat(
                F.lit(" server 10."),
                (did % 256).cast("string"),
                F.lit(".0."),
                (did % 100).cast("string"),
                F.lit(" up"),
            ),
        )
        .when(
            did % 4 == 2,
            F.concat(F.lit(" call +1-555-"), (did % 9000 + 1000).cast("string"), F.lit(" or +44-020-7946")),
        )
        .otherwise(F.lit(""))
    )
    return d.select("doc_id", F.concat(F.col("text"), tail).alias("text"))


def q_pii_scrub(spark, sf):
    """Regex PII detect + redact (emails / IPv4 / phone): counts per kind,
    md5 of the redacted text, chars removed. Map-only, codegen (SURVEY
    training-data ops)."""
    from .operators.textops import pii_scrub

    return pii_scrub(_pii_docs(spark, sf))


_PII_TEXT_SQL = """
  SELECT doc_id, text || CASE
    WHEN doc_id % 4 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
    WHEN doc_id % 4 = 1 THEN ' server 10.' || CAST(doc_id % 256 AS VARCHAR)
                             || '.0.' || CAST(doc_id % 100 AS VARCHAR) || ' up'
    WHEN doc_id % 4 = 2 THEN ' call +1-555-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) || ' or +44-020-7946'
    ELSE '' END AS text
  FROM documents
"""

SQL_PII_SCRUB = f"""
WITH d AS ({_PII_TEXT_SQL}),
c AS (
  SELECT doc_id, text,
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
             '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b', '<IP>', 'g'),
           '\\+\\d{{1,2}}-\\d{{3}}-\\d{{4}}', '<PHONE>', 'g') AS clean
  FROM d
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(text, '\\+\\d{{1,2}}-\\d{{3}}-\\d{{4}}')) AS BIGINT) AS n_phone,
       md5(clean) AS clean_md5,
       CAST(length(text) - length(clean) AS BIGINT) AS chars_removed
FROM c
"""

QUERIES["pii_scrub"] = (q_pii_scrub, SQL_PII_SCRUB)


def q_line_dedup(spark, sf):
    """CCNet-style corpus-level line dedup: lines appearing in ≥5 distinct
    docs (injected per-source copyright + global newsletter boilerplate)
    are dropped; per-doc kept-line count + md5 of surviving text."""
    from .operators.textops import line_dedup_corpus

    d = _docs(spark, sf)
    text2 = F.concat(
        F.col("text"),
        F.lit("\n(C) "),
        F.col("source"),
        F.lit(" all rights reserved"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("\nsubscribe to our newsletter")).otherwise(F.lit("")),
    )
    return line_dedup_corpus(d.select("doc_id", text2.alias("text")), min_docs=5)


SQL_LINE_DEDUP = """
WITH d AS (
  SELECT doc_id, text || chr(10) || '(C) ' || source || ' all rights reserved'
         || CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'subscribe to our newsletter' ELSE '' END AS text
  FROM documents
),
p AS (SELECT doc_id, string_split(text, chr(10)) AS parts FROM d),
lines AS (
  SELECT doc_id, pos, line FROM (
    SELECT doc_id, unnest(range(1, len(parts)+1)) AS pos,
           unnest(list_transform(parts, x -> trim(x))) AS line
    FROM p
  ) WHERE length(line) > 0
),
boiler AS (
  SELECT line FROM lines GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 5
),
kept AS (
  SELECT l.* FROM lines l LEFT JOIN boiler b USING (line) WHERE b.line IS NULL
),
ka AS (
  SELECT doc_id, COUNT(*) AS n_lines_kept,
         md5(string_agg(line, chr(10) ORDER BY pos)) AS kept_md5
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, COUNT(*) AS n_lines_in FROM lines GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(tot.n_lines_in, 0) AS n_lines_in,
       COALESCE(ka.n_lines_kept, 0) AS n_lines_kept,
       COALESCE(ka.kept_md5, md5('')) AS kept_md5
FROM d LEFT JOIN tot USING (doc_id) LEFT JOIN ka USING (doc_id)
"""

QUERIES["line_dedup"] = (q_line_dedup, SQL_LINE_DEDUP)


def q_kmeans(spark, sf):
    """Integer-exact Lloyd k-means (k=8, 2 iterations, components ×1000):
    deterministic init from vec_id<k, argmin integer L2, floor-mean
    centroid update — the oracle replays identical iterations as CTEs."""
    from .operators.ann import kmeans_int

    return kmeans_int(_embs(spark, sf), k=8, iters=2, scale=1000)


_KMEANS_CTES = """
q AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qe
  FROM embeddings
),
c0 AS (SELECT CAST(vec_id AS INT) AS cl, qe AS ce FROM q WHERE vec_id < 8),
a1 AS (
  SELECT vec_id, cl FROM (
    SELECT q.vec_id, c.cl,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_sum(list_transform(range(1, len(q.qe)+1),
                                              i -> (q.qe[i]-c.ce[i])*(q.qe[i]-c.ce[i]))), c.cl
           ) AS rn
    FROM q CROSS JOIN c0 c
  ) WHERE rn = 1
),
c1 AS (
  SELECT cl, list(c ORDER BY pos) AS ce FROM (
    SELECT a1.cl, r.i AS pos, CAST(floor(AVG(q.qe[r.i])) AS BIGINT) AS c
    FROM q JOIN a1 USING (vec_id), range(1, 65) r(i)
    GROUP BY a1.cl, r.i
  ) GROUP BY cl
),
a2 AS (
  SELECT vec_id, cl FROM (
    SELECT q.vec_id, c.cl,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_sum(list_transform(range(1, len(q.qe)+1),
                                              i -> (q.qe[i]-c.ce[i])*(q.qe[i]-c.ce[i]))), c.cl
           ) AS rn
    FROM q CROSS JOIN c1 c
  ) WHERE rn = 1
),
c2 AS (
  SELECT cl, list(c ORDER BY pos) AS ce FROM (
    SELECT a2.cl, r.i AS pos, CAST(floor(AVG(q.qe[r.i])) AS BIGINT) AS c
    FROM q JOIN a2 USING (vec_id), range(1, 65) r(i)
    GROUP BY a2.cl, r.i
  ) GROUP BY cl
),
km AS (
  SELECT vec_id, cl AS cluster FROM (
    SELECT q.vec_id, c.cl,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_sum(list_transform(range(1, len(q.qe)+1),
                                              i -> (q.qe[i]-c.ce[i])*(q.qe[i]-c.ce[i]))), c.cl
           ) AS rn
    FROM q CROSS JOIN c2 c
  ) WHERE rn = 1
)
"""

SQL_KMEANS = "WITH " + _KMEANS_CTES + """
SELECT vec_id, cluster FROM km
"""

QUERIES["kmeans"] = (q_kmeans, SQL_KMEANS)


def q_semdedup(spark, sf):
    """SemDeDup (Abbas et al. 2023): k-means clusters → cluster-local
    cosine pairs → drop any vector with a lower-id cluster-mate at
    sim ≥ 0.30 (the synthetic embeddings' same-cluster P99; a real corpus
    uses ~0.95). Pairwise cost is Σ cluster², not N²."""
    from .operators.ann import semdedup_keep

    return semdedup_keep(_embs(spark, sf), k=8, iters=2, scale=1000, threshold_x1e4=3000)


SQL_SEMDEDUP = "WITH " + _KMEANS_CTES + """,
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
dup AS (
  SELECT DISTINCT b.vec_id
  FROM km a JOIN km b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN emb ea ON ea.vec_id = a.vec_id
  JOIN emb eb ON eb.vec_id = b.vec_id
  WHERE CAST(round(list_cosine_similarity(ea.e, eb.e) * 10000) AS BIGINT) >= 3000
)
SELECT km.vec_id, km.cluster,
       CASE WHEN dup.vec_id IS NULL THEN 1 ELSE 0 END AS keep
FROM km LEFT JOIN dup USING (vec_id)
"""

QUERIES["semdedup"] = (q_semdedup, SQL_SEMDEDUP)


def q_domain_filter(spark, sf):
    """Domain-blocklist filter with parent-domain suffix matching: the
    broadcast blocklist blocks messy-URL hosts www.ex1/ex3.com via their
    parent domains; the ftp passthrough yields an empty host (kept)."""
    from .operators.urls import domain_filter

    bl = spark.createDataFrame(
        [("ex1.com",), ("ex3.com",), ("mixed.case",)], schema="domain string"
    )
    return domain_filter(_messy_urls(spark, sf), bl)


SQL_DOMAIN_FILTER = f"""
WITH d AS (SELECT doc_id, {_SQL_MESSY_URL} AS url FROM documents),
h AS (
  SELECT doc_id,
         regexp_replace(regexp_extract(lower(url), 'https?://([^/]+)', 1), ':[0-9]+$', '') AS host
  FROM d
),
bl AS (SELECT * FROM (VALUES ('ex1.com'), ('ex3.com'), ('mixed.case')) v(domain)),
s AS (
  SELECT doc_id, unnest(range(1, len(labels)+1)) AS i,
         unnest(list_transform(range(1, len(labels)+1), j -> array_to_string(labels[j:], '.'))) AS suf
  FROM (SELECT doc_id, string_split(host, '.') AS labels FROM h WHERE length(host) > 0)
),
m AS (
  SELECT doc_id, MIN(i) AS mi FROM s JOIN bl ON s.suf = bl.domain GROUP BY doc_id
),
mb AS (
  SELECT m.doc_id, s.suf AS blocked_by FROM m JOIN s ON s.doc_id = m.doc_id AND s.i = m.mi
)
SELECT h.doc_id, h.host, COALESCE(mb.blocked_by, '') AS blocked_by,
       CASE WHEN mb.blocked_by IS NULL THEN 1 ELSE 0 END AS keep
FROM h LEFT JOIN mb USING (doc_id)
"""

QUERIES["domain_filter"] = (q_domain_filter, SQL_DOMAIN_FILTER)


def q_hits(spark, sf):
    """Integer-exact HITS (3 unnormalized power iterations) on the
    chain-with-chords customer graph: hub/auth BIGINTs bit-comparable to
    the unrolled DuckDB mirror (normalization is a positive scalar, so
    ranking matches normalized HITS exactly)."""
    from .operators.cc import hits

    _r, e = _chain_graph(spark, sf)
    return hits(e, iters=3)


def _hits_sql(iters: int = 3) -> str:
    parts = [
        "WITH " + _CHAIN_SQL + """,
edges AS (SELECT DISTINCT src, dst FROM raw),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
h0 AS (SELECT node, CAST(1 AS BIGINT) AS hub FROM nodes)"""
    ]
    for i in range(1, iters + 1):
        parts.append(f""",
sa{i} AS (SELECT e.dst AS node, SUM(h.hub) AS s
         FROM edges e JOIN h{i-1} h ON h.node = e.src GROUP BY e.dst),
a{i} AS (SELECT n.node, CAST(COALESCE(sa.s, 0) AS BIGINT) AS auth
        FROM nodes n LEFT JOIN sa{i} sa USING (node)),
sh{i} AS (SELECT e.src AS node, SUM(a.auth) AS s
         FROM edges e JOIN a{i} a ON a.node = e.dst GROUP BY e.src),
h{i} AS (SELECT n.node, CAST(COALESCE(sh.s, 0) AS BIGINT) AS hub
        FROM nodes n LEFT JOIN sh{i} sh USING (node))""")
    parts.append(
        f"\nSELECT h.node, h.hub, a.auth FROM h{iters} h JOIN a{iters} a USING (node)"
    )
    return "".join(parts)


QUERIES["hits"] = (q_hits, _hits_sql(3))


def q_modularity(spark, sf):
    """Exact modularity contributions (q_num = 4·m·e_c − d_c², BIGINT) of
    the 3-round label-propagation partition of the chain graph — the
    community-QUALITY half of detection, value-oracled because the (2m)²
    denominator is cleared instead of divided."""
    from .operators.cc import label_propagation, modularity

    _r, e = _chain_graph(spark, sf)
    return modularity(e, label_propagation(e, rounds=3))


def _modularity_sql(rounds: int = 3) -> str:
    # the label-prop mirror, then the modularity algebra on top
    lp = _label_prop_sql(rounds)
    head, _tail = lp.rsplit("\nSELECT", 1)
    return head + f""",
labels AS (SELECT node, label FROM l{rounds}),
se AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE src <> dst
),
lab AS (
  SELECT la.label AS la, lb.label AS lb
  FROM se JOIN labels la ON la.node = se.a JOIN labels lb ON lb.node = se.b
),
m AS (SELECT COUNT(*) AS m FROM lab),
ein AS (SELECT la AS label, COUNT(*) AS edges_in FROM lab WHERE la = lb GROUP BY la),
deg AS (
  SELECT label, COUNT(*) AS deg_sum FROM (
    SELECT la AS label FROM lab UNION ALL SELECT lb FROM lab
  ) GROUP BY label
),
nn AS (SELECT label, COUNT(*) AS n_nodes FROM labels GROUP BY label)
SELECT nn.label, nn.n_nodes,
       CAST(COALESCE(ein.edges_in, 0) AS BIGINT) AS edges_in,
       CAST(COALESCE(deg.deg_sum, 0) AS BIGINT) AS deg_sum,
       CAST(4 * m.m * COALESCE(ein.edges_in, 0)
            - COALESCE(deg.deg_sum, 0) * COALESCE(deg.deg_sum, 0) AS BIGINT) AS q_num
FROM nn LEFT JOIN ein USING (label) LEFT JOIN deg USING (label) CROSS JOIN m
"""


QUERIES["modularity"] = (q_modularity, _modularity_sql(3))


def q_void_stats(spark, sf):
    """W3C VoID dataset description of the quad store: dataset totals,
    property partitions (triples + distinct s/o per predicate), class
    partitions (entities), vocabulary namespaces — the snapshot summary a
    KG pipeline publishes after each build."""
    from .operators.stats import void_stats

    return void_stats(triples_view(spark, sf))


SQL_VOID_STATS = W + """,
q AS (
  SELECT s_lex, pred,
         CAST(o_kind AS VARCHAR) || o_lex || COALESCE(o_dtype, '') AS o_term
  FROM triples
)
SELECT 'dataset' AS part, '' AS key, COUNT(*) AS triples,
       COUNT(DISTINCT s_lex) AS distinct_s, COUNT(DISTINCT o_term) AS distinct_o
FROM q
UNION ALL
SELECT 'property', pred, COUNT(*), COUNT(DISTINCT s_lex), COUNT(DISTINCT o_term)
FROM q GROUP BY pred
UNION ALL
SELECT 'class', o_lex, COUNT(DISTINCT s_lex), COUNT(DISTINCT s_lex), 0
FROM triples WHERE pred = 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
GROUP BY o_lex
UNION ALL
SELECT 'vocabulary', regexp_extract(pred, '^(.*[#/:])', 1), COUNT(*),
       COUNT(DISTINCT pred), 0
FROM q GROUP BY regexp_extract(pred, '^(.*[#/:])', 1)
"""

QUERIES["void_stats"] = (q_void_stats, SQL_VOID_STATS)


def q_incr_dedup(spark, sf):
    """Incremental snapshot dedup: the batch (doc_id % 5 == 0) is admitted
    against the already-indexed rest — MinHash-LSH bucket joins new×index
    and new×lower-id-new only; the indexed corpus is never re-paired."""
    from .operators.textops import incremental_dedup

    d = _docs(spark, sf)
    return incremental_dedup(
        d.filter(F.col("doc_id") % 5 != 0),
        d.filter(F.col("doc_id") % 5 == 0),
        bands=8,
        band_min=4,
        max_bucket=50,
    )


def _incr_dedup_sql() -> str:
    return """
WITH wf AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS w FROM documents
), wz AS (SELECT DISTINCT doc_id, w FROM wf WHERE w <> ''),
b AS (SELECT doc_id, w, unnest(range(8)) AS band FROM wz),
sig AS (SELECT doc_id, band, min(md5(band || ':' || w)) AS mh FROM b GROUP BY doc_id, band),
si0 AS (SELECT * FROM sig WHERE doc_id % 5 <> 0),
sn0 AS (SELECT * FROM sig WHERE doc_id % 5 = 0),
si AS (SELECT s.* FROM si0 s JOIN (SELECT band, mh FROM si0 GROUP BY band, mh HAVING COUNT(*) <= 50) z USING (band, mh)),
sn AS (SELECT s.* FROM sn0 s JOIN (SELECT band, mh FROM sn0 GROUP BY band, mh HAVING COUNT(*) <= 50) z USING (band, mh)),
pi AS (
  SELECT a.doc_id, i.doc_id AS idx_id, COUNT(DISTINCT a.band) AS nb
  FROM sn a JOIN si i ON a.band = i.band AND a.mh = i.mh
  GROUP BY a.doc_id, i.doc_id
),
xi AS (SELECT doc_id, MIN(idx_id) AS idx_dup FROM pi WHERE nb >= 4 GROUP BY doc_id),
pn AS (
  SELECT a.doc_id, n2.doc_id AS doc_b, COUNT(DISTINCT a.band) AS nb
  FROM sn a JOIN sn n2 ON a.band = n2.band AND a.mh = n2.mh AND n2.doc_id < a.doc_id
  GROUP BY a.doc_id, n2.doc_id
),
xn AS (SELECT doc_id, MIN(doc_b) AS batch_dup FROM pn WHERE nb >= 4 GROUP BY doc_id)
SELECT d.doc_id,
       CASE WHEN xi.idx_dup IS NULL AND xn.batch_dup IS NULL THEN 1 ELSE 0 END AS keep,
       COALESCE(CAST(xi.idx_dup AS VARCHAR), CAST(xn.batch_dup AS VARCHAR), '') AS dup_of,
       CASE WHEN xi.idx_dup IS NOT NULL THEN 'index'
            WHEN xn.batch_dup IS NOT NULL THEN 'batch' ELSE '' END AS reason
FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
LEFT JOIN xi USING (doc_id) LEFT JOIN xn USING (doc_id)
"""


QUERIES["incr_dedup"] = (q_incr_dedup, _incr_dedup_sql())


def q_freq_spectrum(spark, sf):
    """Token frequency-of-frequencies with Good-Turing numerators
    (gt_num = (r+1)·n_{r+1}; r* = gt_num/n_r left to the consumer so the
    engine-side values stay exact BIGINTs)."""
    from .operators.textops import freq_spectrum

    return freq_spectrum(_docs(spark, sf))


SQL_FREQ_SPECTRUM = f"""
WITH {_TOKS_SQL},
w AS (SELECT unnest(toks) AS w FROM nt),
c AS (SELECT w, COUNT(*) AS r FROM w WHERE w <> '' GROUP BY w),
s AS (SELECT r, COUNT(*) AS n_r FROM c GROUP BY r)
SELECT s.r, s.n_r, CAST((s.r + 1) * COALESCE(nx.n_r, 0) AS BIGINT) AS gt_num
FROM s LEFT JOIN s nx ON nx.r = s.r + 1
"""

QUERIES["freq_spectrum"] = (q_freq_spectrum, SQL_FREQ_SPECTRUM)


def q_encoding_quality(spark, sf):
    """Mojibake / encoding-quality scoring over a deterministically
    corrupted corpus variant (documents text + per-doc_id injected
    replacement chars, C0/C1 controls, double-encoding digraphs — the
    SAME expression synthesized in the oracle)."""
    from .operators.textops import encoding_quality

    d = F.col("doc_id")
    corrupted = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(d % 4 == 0, F.lit(" \uFFFD\uFFFD"))
            .when(d % 4 == 1, F.lit(" \x01x\x9f"))
            .when(d % 4 == 2, F.lit(" \u00c3\u00a9 \u00c2\u00a0"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return encoding_quality(corrupted)


SQL_ENCODING_QUALITY = r"""
WITH c AS (
  SELECT doc_id, text ||
    CASE CAST(doc_id % 4 AS INTEGER)
      WHEN 0 THEN ' ' || chr(65533) || chr(65533)
      WHEN 1 THEN ' ' || chr(1) || 'x' || chr(159)
      WHEN 2 THEN ' ' || chr(195) || chr(169) || ' ' || chr(194) || chr(160)
      ELSE ''
    END AS text
  FROM documents
),
n AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '\x{FFFD}')) AS BIGINT) AS n_repl,
    CAST(len(regexp_extract_all(text, '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x{9f}]')) AS BIGINT) AS n_ctrl,
    CAST(len(regexp_extract_all(text, '[\x{c3}\x{c2}][\x{80}-\x{ff}]')) AS BIGINT) AS n_double,
    CAST(length(text) AS BIGINT) AS n_chars
  FROM c
)
SELECT doc_id, n_repl, n_ctrl, n_double, n_chars,
       CASE WHEN n_chars > 0
            THEN (1000000 * (5*n_repl + 2*n_ctrl + 3*n_double)) // n_chars
            ELSE 0 END AS penalty
FROM n
"""

QUERIES["encoding_quality"] = (q_encoding_quality, SQL_ENCODING_QUALITY)


def q_assortativity(spark, sf):
    """Exact degree-assortativity components (m2, sx, sxx, sxy; r is the
    consumer's division) of the chain-with-chords graph — the
    assortative/disassortative web-graph characterization, BIGINT-exact
    cross-engine."""
    from .operators.cc import degree_assortativity

    _r, e = _chain_graph(spark, sf)
    return degree_assortativity(e)


SQL_ASSORTATIVITY = "WITH " + _CHAIN_SQL + """,
se AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE src <> dst
),
bi AS (SELECT a, b FROM se UNION ALL SELECT b, a FROM se),
deg AS (SELECT a AS node, COUNT(*) AS d FROM bi GROUP BY a),
lab AS (
  SELECT da.d AS x, db.d AS y
  FROM bi JOIN deg da ON da.node = bi.a JOIN deg db ON db.node = bi.b
)
SELECT CAST(COUNT(*) AS BIGINT) AS m2, CAST(SUM(x) AS BIGINT) AS sx,
       CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(x*y) AS BIGINT) AS sxy
FROM lab
"""

QUERIES["assortativity"] = (q_assortativity, SQL_ASSORTATIVITY)


def q_ppr_seeds(spark, sf):
    """Personalized PageRank (TrustRank shape): teleport mass restricted
    to the per-nation chain heads (rn=1) — rank measures proximity to the
    seed set, integer-exact against the unrolled seeded mirror."""
    from .operators.cc import pagerank

    r, e = _chain_graph(spark, sf)
    seeds = r.filter(F.col("rn") == 1).select(F.col("k").alias("node"))
    return pagerank(e, iters=3, damping_pct=85, seeds=seeds)


def _ppr_sql(iters: int = 3) -> str:
    head = "WITH " + _CHAIN_SQL + """,
edges AS (SELECT DISTINCT src, dst FROM raw),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
sd AS (SELECT kk AS node FROM r WHERE rn = 1),
spine AS (SELECT n.node, CASE WHEN sd.node IS NULL THEN 0 ELSE 1 END AS is_seed
          FROM nodes n LEFT JOIN sd ON sd.node = n.node),
deg AS (SELECT src, COUNT(*) AS odeg FROM edges GROUP BY src),
n0 AS (SELECT node, CAST(is_seed * 1000000 AS BIGINT) AS rank FROM spine)"""
    parts = [head]
    for i in range(1, iters + 1):
        parts.append(f""",
c{i} AS (SELECT e.dst AS node, SUM(r.rank // d.odeg) AS s
        FROM edges e JOIN n{i-1} r ON e.src = r.node JOIN deg d ON d.src = e.src GROUP BY e.dst),
n{i} AS (SELECT sp.node, CAST(sp.is_seed * 150000 + 85 * COALESCE(c.s, 0) // 100 AS BIGINT) AS rank
        FROM spine sp LEFT JOIN c{i} c USING (node))""")
    parts.append(f"\nSELECT node, rank FROM n{iters}")
    return "".join(parts)


QUERIES["ppr_seeds"] = (q_ppr_seeds, _ppr_sql(3))


def q_clustering_coef(spark, sf):
    """Local clustering coefficient components (2·tri, deg·(deg−1)) per
    node of the chain-with-chords graph — exact BIGINTs on top of the
    degree-ordered triangle join."""
    from .operators.cc import clustering_coefficient

    _r, e = _chain_graph(spark, sf)
    return clustering_coefficient(e)


SQL_CLUSTERING_COEF = "WITH " + _CHAIN_SQL + """,
e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM raw WHERE src <> dst),
nodes AS (SELECT DISTINCT node FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)),
t AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1 JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
c AS (
  SELECT node, COUNT(*) AS t FROM (
    SELECT x AS node FROM t UNION ALL SELECT y FROM t UNION ALL SELECT z FROM t
  ) GROUP BY node
),
dg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e
  ) GROUP BY node
)
SELECT n.node, CAST(COALESCE(c.t, 0) AS BIGINT) AS triangles,
       CAST(dg.deg AS BIGINT) AS deg,
       CAST(2 * COALESCE(c.t, 0) AS BIGINT) AS cc_num,
       CAST(dg.deg * (dg.deg - 1) AS BIGINT) AS cc_den
FROM nodes n JOIN dg USING (node) LEFT JOIN c USING (node)
"""

QUERIES["clustering_coef"] = (q_clustering_coef, SQL_CLUSTERING_COEF)


def q_shacl_sparql(spark, sf):
    """SHACL-SPARQL constraints (sh:sparql): violations ARE the rows of a
    SELECT ?this query run through the engine's own EP1 path — negative
    account balances and orders above a price cap, over the TPC-H KG."""
    from .operators.shacl import validate_sparql

    constraints = [
        (
            "s:acctbal-nonneg",
            "account balance must be non-negative",
            _SPARQL_PFX
            + "SELECT ?this ?value WHERE { ?this a c:Customer ; p:acctbal ?value . FILTER(?value < 0) }",
        ),
        (
            "s:price-cap",
            "order exceeds price cap",
            _SPARQL_PFX
            + "SELECT ?this WHERE { ?this a c:Order ; p:price ?v . FILTER(?v > 50000000) }",
        ),
    ]
    return validate_sparql(triples_view(spark, sf), constraints)


SQL_SHACL_SPARQL = """
SELECT 'urn:cu:' || c_custkey AS focus, 's:acctbal-nonneg' AS shape_id,
       'sparql' AS constraint,
       'account balance must be non-negative: ' || CAST(CAST(round(c_acctbal*100) AS BIGINT) AS VARCHAR) AS detail
FROM customer WHERE round(c_acctbal*100) < 0
UNION ALL
SELECT 'urn:o:' || o_orderkey, 's:price-cap', 'sparql', 'order exceeds price cap'
FROM orders WHERE round(o_totalprice*100) > 50000000
"""

QUERIES["shacl_sparql"] = (q_shacl_sparql, SQL_SHACL_SPARQL)


def q_kmv_overlap(spark, sf):
    """KMV sketch set operations: union/intersection estimates for
    {orders.o_custkey} vs {customer.c_custkey} from the two 128-min-value
    sketches alone — the audience-overlap estimator, value-exact because
    KMV state is deterministic (HLL's isn't)."""
    from .operators.sketches import kmv_set_ops

    return kmv_set_ops(
        spark.read.parquet(f"{sf}/orders.parquet"), "o_custkey",
        spark.read.parquet(f"{sf}/customer.parquet"), "c_custkey",
        k=128,
    )


def _kmv_overlap_sql():
    from .operators.sketches import kmv_set_ops_oracle_sql

    return kmv_set_ops_oracle_sql("orders", "o_custkey", "customer", "c_custkey", k=128)


QUERIES["kmv_overlap"] = (q_kmv_overlap, _kmv_overlap_sql())


def q_cohort_retention(spark, sf):
    """Cohort retention triangle over the event stream: first-event week
    cohorts × week offsets × distinct active users."""
    from .operators.events import cohort_retention

    return cohort_retention(spark.read.parquet(f"{sf}/events.parquet"), weeks=8)


SQL_COHORT_RETENTION = """
WITH first AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week FROM events GROUP BY user_id
),
j AS (
  SELECT e.user_id, f.cohort_week,
         CAST(floor(date_diff('day', CAST(f.cohort_week AS DATE), CAST(e.ts AS DATE)) / 7.0) AS BIGINT) AS week_offset
  FROM events e JOIN first f USING (user_id)
)
SELECT strftime(CAST(cohort_week AS DATE), '%Y-%m-%d') AS cohort_week, week_offset,
       COUNT(DISTINCT user_id) AS n_users
FROM j WHERE week_offset <= 8 GROUP BY 1, 2
"""

QUERIES["cohort_retention"] = (q_cohort_retention, SQL_COHORT_RETENTION)


def q_event_transitions(spark, sf):
    """First-order Markov transition counts between consecutive per-user
    events ((ts, event_id)-ordered, deterministic tiebreak)."""
    from .operators.events import event_transitions

    return event_transitions(spark.read.parquet(f"{sf}/events.parquet"))


SQL_EVENT_TRANSITIONS = """
WITH nx AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events
)
SELECT from_type, to_type, COUNT(*) AS n FROM nx WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
"""

QUERIES["event_transitions"] = (q_event_transitions, SQL_EVENT_TRANSITIONS)


#: deterministic host corpus for the IP filter (documents carries no host)
_IP_HOST_CASE = """CASE CAST(doc_id % 5 AS INTEGER)
      WHEN 0 THEN '10.1.' || CAST(doc_id % 200 AS VARCHAR) || '.5'
      WHEN 1 THEN '93.184.' || CAST(doc_id % 250 AS VARCHAR) || '.34'
      WHEN 2 THEN 'www.ex' || CAST(doc_id % 7 AS VARCHAR) || '.com'
      WHEN 3 THEN '256.300.1.' || CAST(doc_id % 9 AS VARCHAR)
      ELSE '192.168.0.' || CAST(doc_id % 250 AS VARCHAR)
    END"""


def q_ip_host_filter(spark, sf):
    """Raw-IP-host crawl filter over a deterministic host mix: RFC-1918
    private, public IP, hostname, not-quite-an-IP ('256.300.…' kept as a
    hostname), link-local — keep = non-IP only."""
    from .operators.urls import ip_host_filter

    d = F.col("doc_id")
    hosts = _docs(spark, sf).select(
        "doc_id",
        F.when(d % 5 == 0, F.concat(F.lit("10.1."), (d % 200).cast("string"), F.lit(".5")))
        .when(d % 5 == 1, F.concat(F.lit("93.184."), (d % 250).cast("string"), F.lit(".34")))
        .when(d % 5 == 2, F.concat(F.lit("www.ex"), (d % 7).cast("string"), F.lit(".com")))
        .when(d % 5 == 3, F.concat(F.lit("256.300.1."), (d % 9).cast("string")))
        .otherwise(F.concat(F.lit("192.168.0."), (d % 250).cast("string")))
        .alias("host"),
    )
    return ip_host_filter(hosts)


SQL_IP_HOST_FILTER = f"""
WITH h AS (SELECT doc_id, {_IP_HOST_CASE} AS host FROM documents),
p AS (
  SELECT doc_id, host, string_split(host, '.') AS parts FROM h
),
c AS (
  SELECT doc_id, host, parts,
         (len(parts) = 4 AND len(list_filter(parts,
             x -> regexp_matches(x, '^[0-9]{{1,3}}$') AND TRY_CAST(x AS INTEGER) <= 255)) = 4) AS is_ip,
         TRY_CAST(parts[1] AS INTEGER) AS o0, TRY_CAST(parts[2] AS INTEGER) AS o1
  FROM p
)
SELECT doc_id, host, CAST(is_ip AS INTEGER) AS is_ip,
       CAST(is_ip AND (o0 = 10 OR (o0 = 172 AND o1 BETWEEN 16 AND 31)
            OR (o0 = 192 AND o1 = 168) OR o0 = 127 OR (o0 = 169 AND o1 = 254)) AS INTEGER) AS is_private,
       CAST(NOT is_ip AS INTEGER) AS keep
FROM c
"""

QUERIES["ip_host_filter"] = (q_ip_host_filter, SQL_IP_HOST_FILTER)


def q_kn_counts(spark, sf):
    """Kneser-Ney continuation counts (N1+(·w), N1+(w·), unigram c_w) —
    the exact-integer quantities interpolated-KN smoothing assembles
    from."""
    from .operators.textops import kn_counts

    return kn_counts(_docs(spark, sf))


SQL_KN_COUNTS = f"""
WITH {_TOKS_SQL},
uni AS (
  SELECT w, COUNT(*) AS c_w FROM (SELECT unnest(toks) AS w FROM nt) WHERE w <> '' GROUP BY w
),
bg AS (
  SELECT DISTINCT toks[i] AS w1, toks[i + 1] AS w2
  FROM nt, unnest(range(1, len(toks))) AS t(i)
  WHERE toks[i] <> '' AND toks[i + 1] <> ''
),
l AS (SELECT w2 AS w, COUNT(*) AS n1plus_left FROM bg GROUP BY w2),
r AS (SELECT w1 AS w, COUNT(*) AS n1plus_right FROM bg GROUP BY w1)
SELECT uni.w, uni.c_w,
       CAST(COALESCE(l.n1plus_left, 0) AS BIGINT) AS n1plus_left,
       CAST(COALESCE(r.n1plus_right, 0) AS BIGINT) AS n1plus_right
FROM uni LEFT JOIN l USING (w) LEFT JOIN r USING (w)
"""

QUERIES["kn_counts"] = (q_kn_counts, SQL_KN_COUNTS)


def q_merge_upsert(spark, sf):
    """Iceberg-style MERGE INTO at the TableIO seam (the warehouse-scale
    form of execute_update's dedup-union, VERDICT r2 design note):
    upsert refreshed acctbal rows for every 10th customer plus one brand-new
    key into the customer-keyed balance table."""
    from .operators.delta import merge_into

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    target = cu.select(
        "c_custkey", F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents")
    )
    src = cu.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", (F.round(F.col("c_acctbal") * 100).cast("long") + 777).alias("bal_cents")
    ).unionByName(
        cu.groupBy().agg((F.max("c_custkey") + 1).alias("c_custkey"))
        .select("c_custkey", F.lit(123456).cast("long").alias("bal_cents"))
    )
    return merge_into(target, src, ["c_custkey"])


SQL_MERGE_UPSERT = """
WITH target AS (
  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents FROM customer
),
src AS (
  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) + 777 AS bal_cents
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT (SELECT MAX(c_custkey) + 1 FROM customer), CAST(123456 AS BIGINT)
)
SELECT t.c_custkey, t.bal_cents FROM target t
WHERE t.c_custkey NOT IN (SELECT c_custkey FROM src)
UNION ALL
SELECT c_custkey, bal_cents FROM src
"""

QUERIES["merge_upsert"] = (q_merge_upsert, SQL_MERGE_UPSERT)


def q_same_as_keys(spark, sf):
    """OWL entity-resolution rules prp-fp/prp-ifp: a functional 'rep'
    property (one representative per bucket — multiple values collapse
    the values) plus an inverse-functional 'segment' key (subjects
    sharing a segment literal collapse) → owl:sameAs star edges feeding
    canonicalization."""
    from .operators.owlrl import FUNCTIONAL, INV_FUNCTIONAL, functional_same_as
    from .types import TRIPLES_SCHEMA, triple_row as _tr

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    base = F.lit(None).cast("string")
    rep = cu.select(
        F.lit(0).cast("tinyint").alias("s_kind"),
        F.concat(F.lit("urn:grp:"), (F.col("c_custkey") % 50).cast("string")).alias("s_lex"),
        F.lit("urn:p:rep").alias("pred"),
        F.lit(0).cast("tinyint").alias("o_kind"),
        F.concat(F.lit("urn:cu:"), F.col("c_custkey").cast("string")).alias("o_lex"),
        base.alias("o_dtype"), base.alias("o_lang"),
        F.lit("urn:g:er").alias("graph"), base.alias("src_url"),
        base.alias("extractor"), F.lit(None).cast("int").alias("part_id"),
    )
    seg = cu.select(
        F.lit(0).cast("tinyint").alias("s_kind"),
        F.concat(F.lit("urn:cu:"), F.col("c_custkey").cast("string")).alias("s_lex"),
        F.lit("urn:p:segkey").alias("pred"),
        F.lit(2).cast("tinyint").alias("o_kind"),
        F.col("c_mktsegment").alias("o_lex"),
        F.lit("http://www.w3.org/2001/XMLSchema#string").alias("o_dtype"), base.alias("o_lang"),
        F.lit("urn:g:er").alias("graph"), base.alias("src_url"),
        base.alias("extractor"), F.lit(None).cast("int").alias("part_id"),
    )
    axioms = spark.createDataFrame(
        [
            _tr(Iri("urn:p:rep"), Iri(RDF_TYPE), Iri(FUNCTIONAL), graph="urn:g:er-schema"),
            _tr(Iri("urn:p:segkey"), Iri(RDF_TYPE), Iri(INV_FUNCTIONAL), graph="urn:g:er-schema"),
        ],
        schema=TRIPLES_SCHEMA,
    )
    ents = functional_same_as(rep.unionByName(seg).unionByName(axioms))
    return ents.select("s_lex", "pred", "o_lex")


SQL_SAME_AS_KEYS = """
WITH fp_m AS (
  SELECT DISTINCT 'urn:grp:' || CAST(c_custkey % 50 AS VARCHAR) AS grp,
         'urn:cu:' || CAST(c_custkey AS VARCHAR) AS m
  FROM customer
),
fp_c AS (SELECT grp, MIN(m) AS cm, COUNT(DISTINCT m) AS n FROM fp_m GROUP BY grp),
fp AS (
  SELECT m.m AS s_lex, c.cm AS o_lex FROM fp_m m JOIN fp_c c USING (grp)
  WHERE c.n > 1 AND m.m <> c.cm
),
ifp_m AS (
  SELECT DISTINCT c_mktsegment AS grp, 'urn:cu:' || CAST(c_custkey AS VARCHAR) AS m
  FROM customer
),
ifp_c AS (SELECT grp, MIN(m) AS cm, COUNT(DISTINCT m) AS n FROM ifp_m GROUP BY grp),
ifp AS (
  SELECT m.m AS s_lex, c.cm AS o_lex FROM ifp_m m JOIN ifp_c c USING (grp)
  WHERE c.n > 1 AND m.m <> c.cm
)
SELECT s_lex, 'http://www.w3.org/2002/07/owl#sameAs' AS pred, o_lex
FROM (SELECT DISTINCT * FROM (SELECT * FROM fp UNION ALL SELECT * FROM ifp))
"""

QUERIES["same_as_keys"] = (q_same_as_keys, SQL_SAME_AS_KEYS)


def q_owl_chain(spark, sf):
    """OWL property chain prp-spo2: inNation ∘ inRegion declared as the
    chain of urn:p:inRegionVia — entails customer→region hops; the chain
    axiom arrives as a real rdf:first/rest list, unrolled driver-side
    (ontology-sized), instances joined head-to-tail."""
    from .operators.owlrl import CHAIN_AXIOM, RDF_FIRST, RDF_NIL, RDF_REST, chain_closure
    from .types import TRIPLES_SCHEMA, triple_row as _tr

    axioms = spark.createDataFrame(
        [
            _tr(Iri("urn:p:inRegionVia"), Iri(CHAIN_AXIOM), BNode("l1"), graph="urn:g:owl-schema"),
            _tr(BNode("l1"), Iri(RDF_FIRST), Iri(P_IN_NATION), graph="urn:g:owl-schema"),
            _tr(BNode("l1"), Iri(RDF_REST), BNode("l2"), graph="urn:g:owl-schema"),
            _tr(BNode("l2"), Iri(RDF_FIRST), Iri(P_IN_REGION), graph="urn:g:owl-schema"),
            _tr(BNode("l2"), Iri(RDF_REST), Iri(RDF_NIL), graph="urn:g:owl-schema"),
        ],
        schema=TRIPLES_SCHEMA,
    )
    ents = chain_closure(triples_view(spark, sf).unionByName(axioms, allowMissingColumns=True))
    return ents.select("s_lex", "pred", "o_lex")


SQL_OWL_CHAIN = """
SELECT DISTINCT s_lex, 'urn:p:inRegionVia' AS pred, o_lex FROM (
  SELECT 'urn:cu:' || c_custkey AS s_lex, 'urn:r:' || n_regionkey AS o_lex
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  UNION ALL
  SELECT 'urn:su:' || s_suppkey, 'urn:r:' || n_regionkey
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
)
"""

QUERIES["owl_chain"] = (q_owl_chain, SQL_OWL_CHAIN)


def q_exact_quantiles(spark, sf):
    """Exact order statistics of order price cents (p25/p50/p75/p99)
    via 2-pass histogram-refine selection — no global sort; rank =
    max(1, ceil(q·n)), value = rank-th smallest."""
    from .operators.sketches import exact_quantiles

    o = spark.read.parquet(f"{sf}/orders.parquet").select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    return exact_quantiles(o, "cents", [0.25, 0.50, 0.75, 0.99])


SQL_EXACT_QUANTILES = """
WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
n AS (SELECT COUNT(*) AS n FROM v),
r AS (SELECT UNNEST([25, 50, 75, 99]) AS q_pct),
k AS (
  SELECT q_pct, GREATEST(1, CAST(ceil(q_pct / 100.0 * n.n) AS BIGINT)) AS rank
  FROM r CROSS JOIN n
)
SELECT k.q_pct, k.rank, w.cents AS value
FROM k JOIN (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM v) w
  ON w.rn = k.rank
"""

QUERIES["exact_quantiles"] = (q_exact_quantiles, SQL_EXACT_QUANTILES)


def q_graph_digest(spark, sf):
    """Order-independent dataset digest (commutative 60-bit-md5 sum mod
    2^63−1 over distinct quads): snapshot equality in one scan + an
    8-byte compare — graph_diff's cheap DID-anything-change companion."""
    from .operators.canon import graph_digest

    return graph_digest(triples_view(spark, sf))


SQL_GRAPH_DIGEST = W + """,
k AS (
  SELECT DISTINCT ('0x' || substr(md5(
    CAST(0 AS VARCHAR) || chr(31) || s_lex || chr(31) || pred || chr(31) ||
    CAST(o_kind AS VARCHAR) || chr(31) || o_lex || chr(31) ||
    COALESCE(o_dtype, '') || chr(31) || '' || chr(31) || COALESCE(graph, '')
  ), 1, 15))::BIGINT AS h
  FROM triples
)
SELECT COUNT(*) AS n_quads,
       CAST(SUM(CAST(h AS HUGEINT)) % 9223372036854775807 AS BIGINT) AS digest
FROM k
"""

QUERIES["graph_digest"] = (q_graph_digest, SQL_GRAPH_DIGEST)


def q_skolemize(spark, sf):
    """RDF 1.1 §3.5 skolemization: bnode subjects (derived per customer)
    become .well-known/genid IRIs; IRI/literal positions pass through."""
    from .operators.canon import skolemize

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    quads = cu.select(
        F.lit(1).cast("tinyint").alias("s_kind"),
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("s_lex"),
        F.lit("urn:p:name").alias("pred"),
        F.lit(2).cast("tinyint").alias("o_kind"),
        F.col("c_name").alias("o_lex"),
    )
    return skolemize(quads).select("s_kind", "s_lex", "pred", "o_kind", "o_lex")


SQL_SKOLEMIZE = """
SELECT CAST(0 AS TINYINT) AS s_kind,
       'https://ords.invalid/.well-known/genid/c' || CAST(c_custkey AS VARCHAR) AS s_lex,
       'urn:p:name' AS pred, CAST(2 AS TINYINT) AS o_kind, c_name AS o_lex
FROM customer
"""

QUERIES["skolemize"] = (q_skolemize, SQL_SKOLEMIZE)


def q_mixture_plan(spark, sf):
    """Training-mixture planner over langid groups: available tokens per
    detected language vs target shares → integer sampling rates +
    starvation flags for a 100k-token run."""
    from .operators.textops import lang_id, mixture_plan, token_counts

    d = _docs(spark, sf)
    toks = token_counts(d).select("doc_id", "ws_tokens")
    groups = (
        lang_id(d)
        .join(toks, "doc_id")
        .groupBy(F.col("lang_guess").alias("grp"))
        .agg(F.sum("ws_tokens").alias("n_tokens"))
    )
    targets = spark.createDataFrame(
        [("en", 600000), ("de", 250000), ("fr", 150000)], "grp string, share_ppm long"
    )
    return mixture_plan(groups, targets, budget_tokens=100000)


SQL_MIXTURE_PLAN = f"""
WITH s AS (
  SELECT doc_id,
    len(list_filter(string_split_regex(trim(text), ' +'), x -> lower(x) IN ({_SW_DE}))) AS s_de,
    len(list_filter(string_split_regex(trim(text), ' +'), x -> lower(x) IN ({_SW_EN}))) AS s_en,
    len(list_filter(string_split_regex(trim(text), ' +'), x -> lower(x) IN ({_SW_FR}))) AS s_fr,
    len(string_split_regex(trim(text), ' +')) AS ws
  FROM documents
),
lg AS (
  SELECT doc_id, ws,
    CASE WHEN greatest(s_de, s_en, s_fr) = 0 THEN 'und'
         WHEN s_de = greatest(s_de, s_en, s_fr) THEN 'de'
         WHEN s_en = greatest(s_de, s_en, s_fr) THEN 'en'
         ELSE 'fr' END AS grp
  FROM s
),
g AS (SELECT grp, SUM(ws) AS n_tokens FROM lg GROUP BY grp),
t AS (SELECT * FROM (VALUES ('en', 600000), ('de', 250000), ('fr', 150000)) v(grp, share_ppm)),
j AS (
  SELECT g.grp, CAST(g.n_tokens AS BIGINT) AS n_tokens,
         CAST(t.share_ppm AS BIGINT) AS share_ppm,
         CAST(100000 AS BIGINT) * t.share_ppm // 1000000 AS want_tokens
  FROM g JOIN t USING (grp)
)
SELECT grp, n_tokens, share_ppm, CAST(want_tokens AS BIGINT) AS want_tokens,
       CAST(LEAST(1000000, 1000000 * want_tokens // n_tokens) AS BIGINT) AS rate_ppm,
       CAST(n_tokens * LEAST(1000000, 1000000 * want_tokens // n_tokens) // 1000000 AS BIGINT) AS planned_tokens,
       CAST(n_tokens < want_tokens AS INTEGER) AS starved
FROM j
"""

QUERIES["mixture_plan"] = (q_mixture_plan, SQL_MIXTURE_PLAN)

def _fuse_claims(spark, sf):
    """Three source graphs asserting each supplier's inNation: srcA is
    always right; srcB corrupts every 7th supplier (+1 mod 25); srcC
    corrupts every 5th (+2 mod 25). At lcm(5,7) the three disagree
    three ways (a tie under uniform weights — exercises the
    deterministic tie-break); at %7-only or %5-only the majority is
    right 2:1."""
    su = spark.read.parquet(f"{sf}/supplier.parquet")
    base = F.lit(None).cast("string")

    def claim(graph, nation_col):
        return su.select(
            F.lit(0).cast("tinyint").alias("s_kind"),
            F.concat(F.lit("urn:su:"), F.col("s_suppkey").cast("string")).alias("s_lex"),
            F.lit(P_IN_NATION).alias("pred"),
            F.lit(0).cast("tinyint").alias("o_kind"),
            F.concat(F.lit("urn:n:"), nation_col.cast("string")).alias("o_lex"),
            base.alias("o_dtype"),
            base.alias("o_lang"),
            F.lit(graph).alias("graph"),
        )

    a = claim("urn:g:srcA", F.col("s_nationkey"))
    b = claim(
        "urn:g:srcB",
        F.when(F.col("s_suppkey") % 7 == 0, (F.col("s_nationkey") + 1) % 25).otherwise(
            F.col("s_nationkey")
        ),
    )
    c = claim(
        "urn:g:srcC",
        F.when(F.col("s_suppkey") % 5 == 0, (F.col("s_nationkey") + 2) % 25).otherwise(
            F.col("s_nationkey")
        ),
    )
    return a.unionByName(b).unionByName(c)


#: DuckDB mirror of _fuse_claims (columns s_lex, pred, o_lex, graph)
_FUSE_CLAIMS_CTE = """
claims AS (
  SELECT 'urn:su:' || s_suppkey AS s_lex, 'urn:p:inNation' AS pred,
         'urn:n:' || s_nationkey AS o_lex, 'urn:g:srcA' AS graph FROM supplier
  UNION ALL
  SELECT 'urn:su:' || s_suppkey, 'urn:p:inNation',
         'urn:n:' || CASE WHEN s_suppkey % 7 = 0 THEN (s_nationkey + 1) % 25
                          ELSE s_nationkey END, 'urn:g:srcB' FROM supplier
  UNION ALL
  SELECT 'urn:su:' || s_suppkey, 'urn:p:inNation',
         'urn:n:' || CASE WHEN s_suppkey % 5 = 0 THEN (s_nationkey + 2) % 25
                          ELSE s_nationkey END, 'urn:g:srcC' FROM supplier
)
"""


def q_fuse_vote(spark, sf):
    """Knowledge fusion by uniform source voting (Knowledge-Vault-style
    truth discovery, one round): winner per (supplier, inNation) fact
    key with vote mass + confidence; deterministic tie-break."""
    from .operators.fusion import fuse_functional

    out = fuse_functional(_fuse_claims(spark, sf))
    return out.select(
        "s_lex", "pred", "o_lex", "votes", "total_votes", "n_values", "n_sources", "confidence"
    )


SQL_FUSE_VOTE = f"""
WITH {_FUSE_CLAIMS_CTE},
votes AS (
  SELECT s_lex, pred, o_lex, COUNT(*) AS votes, COUNT(DISTINCT graph) AS n_sources
  FROM (SELECT DISTINCT * FROM claims) GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *, SUM(votes) OVER (PARTITION BY s_lex, pred) AS total_votes,
         COUNT(*) OVER (PARTITION BY s_lex, pred) AS n_values,
         ROW_NUMBER() OVER (PARTITION BY s_lex, pred ORDER BY votes DESC, o_lex ASC) AS rn
  FROM votes
)
SELECT s_lex, pred, o_lex, CAST(votes AS BIGINT) AS votes,
       CAST(total_votes AS BIGINT) AS total_votes, CAST(n_values AS BIGINT) AS n_values,
       CAST(n_sources AS BIGINT) AS n_sources,
       CAST(votes AS DOUBLE) / total_votes AS confidence
FROM ranked WHERE rn = 1
"""

QUERIES["fuse_vote"] = (q_fuse_vote, SQL_FUSE_VOTE)


def q_truth_weighted(spark, sf):
    """Iterative truth discovery (2 rounds): uniform vote -> per-source
    integer accuracy (n_correct*1000 div n_claims) -> re-vote. srcA
    scores 1000, the corrupting sources less, so round-2 winners are
    srcA's values everywhere — including the lcm(5,7) keys the uniform
    round could only tie-break lexicographically."""
    from .operators.fusion import truth_discovery

    out = truth_discovery(_fuse_claims(spark, sf), iters=2, scale=1000)
    return out.select(
        "s_lex", "pred", "o_lex", "votes", "total_votes", "n_values", "n_sources", "confidence"
    )


SQL_TRUTH_WEIGHTED = f"""
WITH {_FUSE_CLAIMS_CTE},
dclaims AS (SELECT DISTINCT * FROM claims),
v1 AS (
  SELECT s_lex, pred, o_lex, COUNT(*) AS votes
  FROM dclaims GROUP BY 1, 2, 3
),
w1 AS (
  SELECT s_lex, pred, o_lex FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY s_lex, pred ORDER BY votes DESC, o_lex ASC) AS rn
    FROM v1
  ) WHERE rn = 1
),
acc AS (
  SELECT c.graph, COUNT(*) AS n_claims,
         SUM(CASE WHEN w.o_lex IS NOT NULL THEN 1 ELSE 0 END) AS n_correct
  FROM dclaims c
  LEFT JOIN w1 w ON c.s_lex = w.s_lex AND c.pred = w.pred AND c.o_lex = w.o_lex
  GROUP BY c.graph
),
wt AS (SELECT graph, n_correct * 1000 // n_claims AS weight FROM acc),
v2 AS (
  SELECT c.s_lex, c.pred, c.o_lex, SUM(wt.weight) AS votes,
         COUNT(DISTINCT c.graph) AS n_sources
  FROM dclaims c JOIN wt USING (graph)
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *, SUM(votes) OVER (PARTITION BY s_lex, pred) AS total_votes,
         COUNT(*) OVER (PARTITION BY s_lex, pred) AS n_values,
         ROW_NUMBER() OVER (PARTITION BY s_lex, pred ORDER BY votes DESC, o_lex ASC) AS rn
  FROM v2
)
SELECT s_lex, pred, o_lex, CAST(votes AS BIGINT) AS votes,
       CAST(total_votes AS BIGINT) AS total_votes, CAST(n_values AS BIGINT) AS n_values,
       CAST(n_sources AS BIGINT) AS n_sources,
       CAST(votes AS DOUBLE) / total_votes AS confidence
FROM ranked WHERE rn = 1
"""

QUERIES["truth_weighted"] = (q_truth_weighted, SQL_TRUTH_WEIGHTED)


def q_char_sets(spark, sf):
    """Characteristic sets (ICDE'11 cardinality-estimation catalog stat):
    subjects grouped by their distinct-predicate SET — the multi-join
    refinement of the per-predicate stats the BGP planner uses."""
    from .operators.stats import characteristic_sets

    return characteristic_sets(triples_view(spark, sf))


SQL_CHAR_SETS = W + """,
per_s AS (
  SELECT s_lex, array_to_string(list_sort(list(DISTINCT pred)), ' ') AS cset,
         COUNT(*) AS nt
  FROM triples GROUP BY s_lex
)
SELECT cset, CAST(len(string_split(cset, ' ')) AS BIGINT) AS n_preds,
       COUNT(*) AS n_subjects, CAST(SUM(nt) AS BIGINT) AS n_triples
FROM per_s GROUP BY cset
"""

QUERIES["char_sets"] = (q_char_sets, SQL_CHAR_SETS)


def q_schema_sum(spark, sf):
    """Schema/linkset induction: which (subject class, object class)
    pairs each IRI-valued predicate actually connects, per the store's
    own rdf:type triples — the induced ontology of the extracted KG."""
    from .operators.stats import schema_summary

    return schema_summary(triples_view(spark, sf))


SQL_SCHEMA_SUM = W + f""",
types AS (
  SELECT DISTINCT s_lex AS ent, o_lex AS cls FROM triples WHERE pred = '{RDF_TYPE}'
),
inst AS (
  SELECT s_lex, pred, o_lex FROM triples WHERE pred <> '{RDF_TYPE}' AND o_kind = 0
)
SELECT i.pred, COALESCE(ts.cls, '(untyped)') AS s_class,
       COALESCE(tob.cls, '(untyped)') AS o_class,
       COUNT(*) AS n_triples, COUNT(DISTINCT i.s_lex) AS n_subjects,
       COUNT(DISTINCT i.o_lex) AS n_objects
FROM inst i
LEFT JOIN types ts ON i.s_lex = ts.ent
LEFT JOIN types tob ON i.o_lex = tob.ent
GROUP BY 1, 2, 3
"""

QUERIES["schema_sum"] = (q_schema_sum, SQL_SCHEMA_SUM)


def q_alias_mine(spark, sf):
    """Alias-dictionary mining (the producer of link_exact's broadcast
    table): nation names plus digit-stripped altLabels — the shared stem
    ('nation') becomes a genuinely ambiguous alias whose integer prior
    splits across all bearers, the n_entities fan-out mine_aliases
    exists to expose."""
    from .operators.linking import mine_aliases

    na = spark.read.parquet(f"{sf}/nation.parquet")

    def lab(pred, o):
        return na.select(
            F.lit(0).cast("tinyint").alias("s_kind"),
            F.concat(F.lit("urn:n:"), F.col("n_nationkey").cast("string")).alias("s_lex"),
            F.lit(pred).alias("pred"),
            F.lit(2).cast("tinyint").alias("o_kind"),
            o.alias("o_lex"),
        )

    quads = lab("urn:p:name", F.col("n_name")).unionByName(
        lab("urn:p:altLabel", F.regexp_replace(F.col("n_name"), r"[0-9]", ""))
    )
    return mine_aliases(quads, ["urn:p:name", "urn:p:altLabel"])


SQL_ALIAS_MINE = """
WITH labels AS (
  SELECT lower(regexp_replace(n_name, '[^A-Za-z0-9 ]', '', 'g')) AS alias,
         'urn:n:' || n_nationkey AS uri FROM nation
  UNION ALL
  SELECT lower(regexp_replace(regexp_replace(n_name, '[0-9]', '', 'g'),
                              '[^A-Za-z0-9 ]', '', 'g')),
         'urn:n:' || n_nationkey FROM nation
),
c AS (SELECT alias, uri, COUNT(*) AS n_assertions FROM labels GROUP BY 1, 2)
SELECT alias, uri, CAST(n_assertions AS BIGINT) AS n_assertions,
       COUNT(*) OVER (PARTITION BY alias) AS n_entities,
       CAST(n_assertions * 1000000 // SUM(n_assertions) OVER (PARTITION BY alias) AS BIGINT)
         AS prior_ppm
FROM c
"""

QUERIES["alias_mine"] = (q_alias_mine, SQL_ALIAS_MINE)


def q_kg_negs(spark, sf):
    """Corrupt-object negative sampling for KG-embedding training
    (filtered TransE protocol) over the store's IRI-object triples:
    deterministic md5-picked entities from a distributed dense-id
    dictionary; true triples and the positive object are excluded."""
    from .operators.walks import kg_negative_samples

    return kg_negative_samples(triples_view(spark, sf), k=2, buckets=64)


SQL_KG_NEGS = W + """,
evoc AS (
  SELECT DISTINCT ent, ('0x' || substr(md5(ent), 1, 15))::BIGINT % 64 AS b FROM (
    SELECT s_lex AS ent FROM triples
    UNION SELECT o_lex FROM triples WHERE o_kind = 0
  )
),
ents AS (SELECT ent, ROW_NUMBER() OVER (ORDER BY b, ent) - 1 AS ent_id FROM evoc),
nn AS (SELECT COUNT(*) AS c FROM ents),
pos AS (SELECT DISTINCT s_lex, pred, o_lex FROM triples WHERE o_kind = 0),
cand AS (
  SELECT p.s_lex, p.pred, p.o_lex, i.neg_ix,
         ('0x' || substr(md5(p.s_lex || chr(31) || p.pred || chr(31) || p.o_lex
                          || chr(31) || CAST(i.neg_ix AS VARCHAR)), 1, 15))::BIGINT
           % (SELECT c FROM nn) AS nid
  FROM pos p CROSS JOIN (SELECT UNNEST([0, 1]) AS neg_ix) i
),
picked AS (
  SELECT c.s_lex, c.pred, c.o_lex, CAST(c.neg_ix AS INTEGER) AS neg_ix, e.ent AS neg_o
  FROM cand c JOIN ents e ON c.nid = e.ent_id
  WHERE e.ent <> c.o_lex
)
SELECT p.s_lex, p.pred, p.o_lex, p.neg_ix, p.neg_o FROM picked p
WHERE NOT EXISTS (
  SELECT 1 FROM pos t WHERE t.s_lex = p.s_lex AND t.pred = p.pred AND t.o_lex = p.neg_o
)
"""

QUERIES["kg_negs"] = (q_kg_negs, SQL_KG_NEGS)


def q_key_profile(spark, sf):
    """Empirical key discovery over the store: per-predicate functional /
    inverse-functional profile (the data-driven input to same_as_keys
    when no ontology declares prp-fp/prp-ifp)."""
    from .operators.stats import key_discovery

    return key_discovery(triples_view(spark, sf), min_support=2)


SQL_KEY_PROFILE = W + """,
base AS (
  SELECT pred, s_lex AS s,
         CAST(o_kind AS VARCHAR) || chr(31) || o_lex || chr(31) ||
         COALESCE(o_dtype, '') || chr(31) || '' AS v
  FROM triples
),
per_s AS (SELECT pred, s, COUNT(DISTINCT v) AS nv, COUNT(*) AS nt FROM base GROUP BY 1, 2),
fp AS (
  SELECT pred, SUM(nt) AS n_triples, COUNT(*) AS n_subjects,
         MAX(nv) AS max_vals_per_subject
  FROM per_s GROUP BY pred
),
per_v AS (SELECT pred, v, COUNT(DISTINCT s) AS ns FROM base GROUP BY 1, 2),
ifp AS (
  SELECT pred, COUNT(*) AS n_values, MAX(ns) AS max_subjects_per_value
  FROM per_v GROUP BY pred
)
SELECT f.pred, CAST(n_triples AS BIGINT) AS n_triples,
       CAST(n_subjects AS BIGINT) AS n_subjects,
       CAST(n_values AS BIGINT) AS n_values,
       CAST(max_vals_per_subject AS BIGINT) AS max_vals_per_subject,
       CAST(max_subjects_per_value AS BIGINT) AS max_subjects_per_value,
       CAST(CASE WHEN n_subjects >= 2 AND max_vals_per_subject = 1
                 THEN 1 ELSE 0 END AS INTEGER) AS fp_ok,
       CAST(CASE WHEN n_subjects >= 2 AND max_subjects_per_value = 1
                 THEN 1 ELSE 0 END AS INTEGER) AS ifp_ok
FROM fp f JOIN ifp USING (pred)
"""

QUERIES["key_profile"] = (q_key_profile, SQL_KEY_PROFILE)


def q_blocking_eval(spark, sf):
    """Blocking-quality report: the MinHash-LSH blocker (8 bands, any
    band hit) measured against the EXACT inverted-index all-pairs
    Jaccard>=60 ground truth — pairs-completeness (recall) + reduction
    ratio, the two standard record-linkage blocking metrics. On this
    synthetic ~30-word-vocabulary corpus the report is genuinely
    diagnostic: the max_bucket boilerplate guard drops the mega-buckets
    a tiny vocabulary produces, costing recall — exactly the
    miscalibration signal this operator exists to surface before a
    production run."""
    from .operators.linking import blocking_metrics
    from .operators.textops import allpairs_jaccard, minhash_candidates

    docs = _docs(spark, sf)
    cand = minhash_candidates(docs, bands=8, max_bucket=50)
    # n=4 shingles: the synthetic corpus's ~30-word vocabulary makes
    # trigram document frequencies huge (Σ df² explodes); 4-gram entropy
    # restores the bound and yields the IDENTICAL truth set (verified at
    # sf0.01 and sf0.1) ~7x faster
    truth = allpairs_jaccard(docs, n=4, jac_min=60, max_df=50)
    return blocking_metrics(cand, truth, docs.count())


SQL_BLOCKING_EVAL = """
WITH wf AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS w FROM documents
), wz AS (SELECT doc_id, w FROM wf WHERE w <> ''),
b AS (SELECT doc_id, w, unnest(range(8)) AS band FROM wz),
sig AS (SELECT doc_id, band, min(md5(band || ':' || w)) AS mh FROM b GROUP BY doc_id, band),
sized AS (SELECT band, mh, COUNT(*) AS bsz FROM sig GROUP BY band, mh),
small AS (SELECT sig.* FROM sig JOIN sized USING (band, mh) WHERE sized.bsz <= 50),
bpairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.band
  FROM small a JOIN small b ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id
),
cand AS (SELECT DISTINCT doc_a, doc_b FROM bpairs),
wlist AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS ws FROM documents),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(ws[i:i+3], ' ') AS g
  FROM wlist, unnest(range(1, len(ws) - 2)) AS t(i)
  WHERE len(ws) >= 4
),
dfreq AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g),
keep AS (SELECT gr.doc_id, gr.g FROM grams gr JOIN dfreq USING (g) WHERE dfreq.df <= 50),
tpairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM keep a JOIN keep b ON a.g = b.g AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
  FROM tpairs p
  JOIN grams ga ON ga.doc_id = p.doc_a
  JOIN grams gb ON gb.doc_id = p.doc_b AND gb.g = ga.g
  GROUP BY 1, 2
),
ver AS (
  SELECT p.doc_a, p.doc_b
  FROM tpairs p
  JOIN sizes sa ON sa.doc_id = p.doc_a
  JOIN sizes sb ON sb.doc_id = p.doc_b
  LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
  WHERE floor(COALESCE(i.n_inter, 0) * 100.0 /
        (sa.n_grams + sb.n_grams - COALESCE(i.n_inter, 0))) >= 60
),
m AS (
  SELECT (SELECT COUNT(*) FROM cand) AS n_cand,
         (SELECT COUNT(*) FROM ver) AS n_truth,
         (SELECT COUNT(*) FROM ver v JOIN cand c
            ON v.doc_a = c.doc_a AND v.doc_b = c.doc_b) AS n_matched,
         (SELECT COUNT(*) FROM documents) AS nd
)
SELECT CAST(n_cand AS BIGINT) AS n_cand, CAST(n_truth AS BIGINT) AS n_truth,
       CAST(n_matched AS BIGINT) AS n_matched,
       CAST(CASE WHEN n_truth = 0 THEN NULL
                 ELSE n_matched * 1000000 // n_truth END AS BIGINT) AS recall_ppm,
       CAST(nd * (nd - 1) // 2 AS BIGINT) AS n_possible,
       CAST(1000000 - n_cand * 1000000 // (nd * (nd - 1) // 2) AS BIGINT) AS reduction_ppm
FROM m
"""

QUERIES["blocking_eval"] = (q_blocking_eval, SQL_BLOCKING_EVAL)


def q_path_profile(spark, sf):
    """Chain-join cardinality catalog (path statistics): 2-hop predicate
    chain counts via pre-aggregated (pred, mid) count products — the
    hub-safe shape."""
    from .operators.stats import path_profile

    return path_profile(triples_view(spark, sf))


SQL_PATH_PROFILE = W + """,
inst AS (SELECT s_lex, pred, o_lex FROM triples WHERE o_kind = 0),
inta AS (SELECT pred AS p1, o_lex AS mid, COUNT(*) AS n_in FROM inst GROUP BY 1, 2),
outa AS (SELECT pred AS p2, s_lex AS mid, COUNT(*) AS n_out FROM inst GROUP BY 1, 2)
SELECT p1, p2, CAST(SUM(n_in * n_out) AS BIGINT) AS n_chains,
       COUNT(DISTINCT mid) AS n_mid
FROM inta JOIN outa USING (mid)
GROUP BY p1, p2
"""

QUERIES["path_profile"] = (q_path_profile, SQL_PATH_PROFILE)


def q_crawl_schedule(spark, sf):
    """Politeness scheduling of a synthetic frontier (one url per
    document, host = source, bigger docs first): per-host slots + fetch
    times under a 1s crawl delay with md5 host stagger."""
    from .operators.urls import crawl_schedule

    d = _docs(spark, sf)
    frontier = d.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/d/"),
            F.col("doc_id").cast("string")
        ).alias("url"),
        F.col("source").alias("host"),
        F.col("n_chars").cast("long").alias("prio"),
    )
    return crawl_schedule(frontier, priority_col="prio", delay_ms=1000)


SQL_CRAWL_SCHEDULE = """
WITH f AS (
  SELECT 'https://' || source || '.example/d/' || CAST(doc_id AS VARCHAR) AS url,
         source AS host, n_chars AS prio
  FROM documents
),
s AS (
  SELECT url, host,
         CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY prio DESC, url ASC) - 1
              AS BIGINT) AS slot,
         ('0x' || substr(md5(host), 1, 15))::BIGINT % 1000 AS stagger
  FROM f
)
SELECT url, host, slot, CAST(slot * 1000 + stagger AS BIGINT) AS fetch_at_ms FROM s
"""

QUERIES["crawl_schedule"] = (q_crawl_schedule, SQL_CRAWL_SCHEDULE)


def q_khop_slice(spark, sf):
    """2-hop neighborhood extraction around two region seeds (entity-card
    / GNN-fixture slice); undirected expansion, literal leaves included."""
    from .operators.cc import khop_subgraph

    seeds = spark.createDataFrame([("urn:r:0",), ("urn:r:1",)], "ent string")
    out = khop_subgraph(triples_view(spark, sf), seeds, hops=2)
    return out.select("s_lex", "pred", "o_kind", "o_lex").distinct()


SQL_KHOP_SLICE = W + """,
n0 AS (SELECT 'urn:r:0' AS ent UNION SELECT 'urn:r:1'),
t1 AS (
  SELECT * FROM triples
  WHERE s_lex IN (SELECT ent FROM n0)
     OR (o_kind = 0 AND o_lex IN (SELECT ent FROM n0))
),
n1 AS (
  SELECT ent FROM n0
  UNION SELECT s_lex FROM t1
  UNION SELECT o_lex FROM t1 WHERE o_kind = 0
)
SELECT DISTINCT s_lex, pred, CAST(o_kind AS TINYINT) AS o_kind, o_lex
FROM triples
WHERE s_lex IN (SELECT ent FROM n1)
   OR (o_kind = 0 AND o_lex IN (SELECT ent FROM n1))
"""

QUERIES["khop_slice"] = (q_khop_slice, SQL_KHOP_SLICE)


def q_prov_graph(spark, sf):
    """PROV-O emission of a (synthetic, orders-derived) 3-stage lineage
    table: Activity/Entity typing, generation, exact row/part counts,
    and the wasDerivedFrom/used chain — the pipeline's provenance AS
    triples in its own store."""
    from .pipeline import lineage_to_prov

    o = spark.read.parquet(f"{sf}/orders.parquet")
    lineage = (
        o.groupBy(
            F.concat(F.lit("p"), (F.col("o_orderkey") % 3).cast("string")).alias("stage"),
            (F.col("o_custkey") % 8).alias("part_id"),
        )
        .agg(F.count(F.lit(1)).alias("row_count"))
    )
    out = lineage_to_prov(lineage, "r1", stage_order=["p0", "p1", "p2"])
    # NULL-free dtype: a column mixing NULLs and strings sorts/hashes
    # differently across compare layers — '' means "no datatype" here
    return out.select(
        "s_lex", "pred", "o_kind", "o_lex",
        F.coalesce(F.col("o_dtype"), F.lit("")).alias("o_dtype"),
    )


SQL_PROV_GRAPH = """
WITH lin AS (
  SELECT 'p' || CAST(o_orderkey % 3 AS VARCHAR) AS stage,
         o_custkey % 8 AS part_id, COUNT(*) AS row_count
  FROM orders GROUP BY 1, 2
),
per AS (SELECT stage, SUM(row_count) AS n_rows, COUNT(*) AS n_parts FROM lin GROUP BY stage)
SELECT 'urn:x-ords:run:r1:act:' || stage AS s_lex,
       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
       CAST(0 AS TINYINT) AS o_kind,
       'http://www.w3.org/ns/prov#Activity' AS o_lex, '' AS o_dtype
FROM per
UNION ALL
SELECT 'urn:x-ords:run:r1:data:' || stage,
       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', CAST(0 AS TINYINT),
       'http://www.w3.org/ns/prov#Entity', '' FROM per
UNION ALL
SELECT 'urn:x-ords:run:r1:data:' || stage, 'http://www.w3.org/ns/prov#wasGeneratedBy',
       CAST(0 AS TINYINT), 'urn:x-ords:run:r1:act:' || stage, '' FROM per
UNION ALL
SELECT 'urn:x-ords:run:r1:data:' || stage, 'urn:x-ords:rowCount', CAST(2 AS TINYINT),
       CAST(n_rows AS VARCHAR), 'http://www.w3.org/2001/XMLSchema#integer' FROM per
UNION ALL
SELECT 'urn:x-ords:run:r1:data:' || stage, 'urn:x-ords:partCount', CAST(2 AS TINYINT),
       CAST(n_parts AS VARCHAR), 'http://www.w3.org/2001/XMLSchema#integer' FROM per
UNION ALL
SELECT * FROM (VALUES
  ('urn:x-ords:run:r1:data:p1', 'http://www.w3.org/ns/prov#wasDerivedFrom',
   CAST(0 AS TINYINT), 'urn:x-ords:run:r1:data:p0', ''),
  ('urn:x-ords:run:r1:data:p2', 'http://www.w3.org/ns/prov#wasDerivedFrom',
   CAST(0 AS TINYINT), 'urn:x-ords:run:r1:data:p1', ''),
  ('urn:x-ords:run:r1:act:p1', 'http://www.w3.org/ns/prov#used',
   CAST(0 AS TINYINT), 'urn:x-ords:run:r1:data:p0', ''),
  ('urn:x-ords:run:r1:act:p2', 'http://www.w3.org/ns/prov#used',
   CAST(0 AS TINYINT), 'urn:x-ords:run:r1:data:p1', '')
) v(s_lex, pred, o_kind, o_lex, o_dtype)
"""

QUERIES["prov_graph"] = (q_prov_graph, SQL_PROV_GRAPH)


def q_rdf_lists(spark, sf):
    """Distributed rdf:first/rest collection flattening: one list per
    region (its nations in key order) built as real spine triples, then
    walked back to (head, idx, item) by the iterative operator."""
    from pyspark.sql import Window
    from .operators.canon import rdf_lists

    RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    na = spark.read.parquet(f"{sf}/nation.parquet")
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    rows = na.select(
        F.col("n_regionkey").alias("rk"),
        F.col("n_nationkey").alias("nk"),
        (F.row_number().over(w) - 1).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy("n_regionkey")).alias("cnt"),
    )
    node = F.concat(F.lit("urn:l:"), F.col("rk").cast("string"), F.lit(":"), F.col("i").cast("string"))
    nxt = F.when(
        F.col("i") + 1 < F.col("cnt"),
        F.concat(F.lit("urn:l:"), F.col("rk").cast("string"), F.lit(":"), (F.col("i") + 1).cast("string")),
    ).otherwise(F.lit(RDF_NS + "nil"))
    firsts = rows.select(
        node.alias("s_lex"),
        F.lit(RDF_NS + "first").alias("pred"),
        F.lit(0).cast("tinyint").alias("o_kind"),
        F.concat(F.lit("urn:n:"), F.col("nk").cast("string")).alias("o_lex"),
        F.lit(None).cast("string").alias("o_dtype"),
    )
    rests = rows.select(
        node.alias("s_lex"),
        F.lit(RDF_NS + "rest").alias("pred"),
        F.lit(0).cast("tinyint").alias("o_kind"),
        nxt.alias("o_lex"),
        F.lit(None).cast("string").alias("o_dtype"),
    )
    return rdf_lists(firsts.unionByName(rests), max_len=32).select(
        "head", "idx", "o_kind", "item", "o_dtype"
    )


SQL_RDF_LISTS = """
SELECT 'urn:l:' || CAST(n_regionkey AS VARCHAR) || ':0' AS head,
       CAST(ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) - 1
            AS BIGINT) AS idx,
       CAST(0 AS TINYINT) AS o_kind,
       'urn:n:' || CAST(n_nationkey AS VARCHAR) AS item,
       CAST(NULL AS VARCHAR) AS o_dtype
FROM nation
"""

QUERIES["rdf_lists"] = (q_rdf_lists, SQL_RDF_LISTS)


def q_snm_pairs(spark, sf):
    """Sorted-neighborhood blocking over customers keyed by
    (segment | name): every pair within 3 sort positions — the classic
    ER blocker beside MinHash-LSH, with a guaranteed candidate bound."""
    from .operators.linking import snm_pairs

    cu = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.concat(F.col("c_mktsegment"), F.lit("|"), F.col("c_name")).alias("key"),
        F.col("c_custkey").alias("id"),
    )
    return snm_pairs(cu, "key", "id", window=3, buckets=8)


SQL_SNM_PAIRS = """
WITH pos AS (
  SELECT c_custkey AS id,
         ROW_NUMBER() OVER (ORDER BY c_mktsegment || '|' || c_name, c_custkey) - 1 AS pos
  FROM customer
)
SELECT a.id AS id_a, b.id AS id_b, CAST(b.pos - a.pos AS BIGINT) AS dist
FROM pos a JOIN pos b ON b.pos > a.pos AND b.pos - a.pos < 3
"""

QUERIES["snm_pairs"] = (q_snm_pairs, SQL_SNM_PAIRS)


def q_skew_report(spark, sf):
    """Pre-flight join-key skew report: top-10 hottest o_custkey values
    with exact counts and integer ppm share — the evidence a pipeline
    reads before shuffling on that key."""
    from .operators.stats import skew_report

    o = spark.read.parquet(f"{sf}/orders.parquet")
    return skew_report(o, "o_custkey", k=10)


SQL_SKEW_REPORT = """
WITH c AS (SELECT CAST(o_custkey AS VARCHAR) AS key, COUNT(*) AS n FROM orders GROUP BY 1),
t AS (SELECT SUM(n) AS total_rows, COUNT(*) AS n_keys FROM c),
ranked AS (
  SELECT key, n, ROW_NUMBER() OVER (ORDER BY n DESC, key ASC) AS rank FROM c
)
SELECT CAST(rank AS INTEGER) AS rank, key, CAST(n AS BIGINT) AS n,
       CAST(total_rows AS BIGINT) AS total_rows, CAST(n_keys AS BIGINT) AS n_keys,
       CAST(n * 1000000 // total_rows AS BIGINT) AS share_ppm
FROM ranked, t WHERE rank <= 10
"""

QUERIES["skew_report"] = (q_skew_report, SQL_SKEW_REPORT)


def q_bloom_urls(spark, sf):
    """Crawl-history Bloom filter: build over the 80% 'already fetched'
    urls, probe the full frontier — (doc_id, member, maybe_seen); no
    false negatives by construction, false positives at the designed
    deterministic rate."""
    from .operators.sketches import bloom_build, bloom_probe

    d = _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/d/"),
            F.col("doc_id").cast("string")
        ).alias("url"),
    )
    members = d.filter(F.col("doc_id") % 5 != 0)
    bloom = bloom_build(members, "url", m_bits=1 << 16, k=4)
    probed = bloom_probe(d, "url", bloom, "doc_id", m_bits=1 << 16, k=4)
    truth = d.select(
        "doc_id", (F.col("doc_id") % 5 != 0).cast("int").alias("member")
    )
    return probed.withColumnRenamed("id", "doc_id").join(truth, "doc_id")


SQL_BLOOM_URLS = """
WITH d AS (
  SELECT doc_id,
         'https://' || source || '.example/d/' || CAST(doc_id AS VARCHAR) AS url
  FROM documents
),
mem AS (SELECT DISTINCT url FROM d WHERE doc_id % 5 <> 0),
pos AS (
  SELECT ('0x' || substr(md5(url || ':' || i), 1, 15))::BIGINT % 65536 AS p
  FROM mem, unnest(range(4)) AS t(i)
),
bloom AS (
  SELECT p // 32 AS blk,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INTEGER)) AS bits
  FROM pos GROUP BY 1
),
probes AS (
  SELECT doc_id,
         ('0x' || substr(md5(url || ':' || i), 1, 15))::BIGINT % 65536 AS p
  FROM d, unnest(range(4)) AS t(i)
),
hits AS (
  SELECT doc_id,
         CASE WHEN b.bits IS NOT NULL
                   AND (b.bits & (CAST(1 AS BIGINT) << CAST(pr.p % 32 AS INTEGER))) <> 0
              THEN 1 ELSE 0 END AS hit
  FROM probes pr LEFT JOIN bloom b ON pr.p // 32 = b.blk
),
agg AS (
  SELECT doc_id, CAST(CASE WHEN SUM(hit) = 4 THEN 1 ELSE 0 END AS INTEGER) AS maybe_seen
  FROM hits GROUP BY doc_id
)
SELECT a.doc_id, a.maybe_seen, CAST(d.doc_id % 5 <> 0 AS INTEGER) AS member
FROM agg a JOIN d USING (doc_id)
"""

QUERIES["bloom_urls"] = (q_bloom_urls, SQL_BLOOM_URLS)


def q_transe_rank(spark, sf):
    """TransE energy ranking of consecutive-id embedding pairs under the
    zero relation (pure −L1 proximity): top-20 most plausible
    'urn:p:near' facts — the scoring face of the kg_negs training
    pipeline."""
    from .operators.walks import transe_scores

    e = _embs(spark, sf)
    ent_emb = e.select(
        F.concat(F.lit("urn:v:"), F.col("vec_id").cast("string")).alias("ent"),
        "embedding",
    )
    ids = e.select("vec_id")
    pairs = (
        ids.alias("a")
        .join(ids.alias("b"), F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .select(
            F.concat(F.lit("urn:v:"), F.col("a.vec_id").cast("string")).alias("s_lex"),
            F.lit("urn:p:near").alias("pred"),
            F.concat(F.lit("urn:v:"), F.col("b.vec_id").cast("string")).alias("o_lex"),
        )
    )
    out = transe_scores(pairs, ent_emb)
    return out.orderBy(F.desc("score_x1e4"), F.asc("s_lex")).limit(20)


SQL_TRANSE_RANK = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
p AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, a.emb AS ea, b.emb AS eb
  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
)
SELECT 'urn:v:' || CAST(ia AS VARCHAR) AS s_lex, 'urn:p:near' AS pred,
       'urn:v:' || CAST(ib AS VARCHAR) AS o_lex,
       CAST(round(-10000 * list_aggregate(
         list_transform(range(1, len(ea) + 1), i -> abs(ea[i] - eb[i])), 'sum'
       )) AS BIGINT) AS score_x1e4
FROM p ORDER BY score_x1e4 DESC, s_lex ASC LIMIT 20
"""

QUERIES["transe_rank"] = (q_transe_rank, SQL_TRANSE_RANK)


def q_bisim_summary(spark, sf):
    """2-bisimulation quotient graph of the store (structural index):
    nodes colored by 2 rounds of forward refinement from their type
    sets, instance edges collapsed per (s_color, pred, o_color)."""
    from .operators.stats import bisim_summary

    return bisim_summary(triples_view(spark, sf), k=2)


SQL_BISIM_SUMMARY = W + f""",
edges AS (
  SELECT s_lex, pred, o_lex AS t FROM triples
  WHERE pred <> '{RDF_TYPE}' AND o_kind = 0
),
nodes AS (
  SELECT DISTINCT n FROM (
    SELECT s_lex AS n FROM triples
    UNION SELECT o_lex FROM triples WHERE o_kind = 0
  )
),
ty AS (SELECT s_lex AS n, o_lex AS ty FROM triples WHERE pred = '{RDF_TYPE}'),
c0 AS (
  SELECT nodes.n,
         md5(COALESCE(array_to_string(
           list_sort(list(DISTINCT ty.ty) FILTER (WHERE ty.ty IS NOT NULL)), chr(31)
         ), '')) AS color
  FROM nodes LEFT JOIN ty ON nodes.n = ty.n GROUP BY nodes.n
),
d1 AS (
  SELECT e.s_lex AS n, e.pred || chr(30) || c.color AS d
  FROM edges e JOIN c0 c ON e.t = c.n
),
ds1 AS (SELECT n, list_sort(list(DISTINCT d)) AS ds FROM d1 GROUP BY n),
c1 AS (
  SELECT c0.n,
         md5(c0.color || chr(29) || COALESCE(array_to_string(ds1.ds, chr(31)), '')) AS color
  FROM c0 LEFT JOIN ds1 ON c0.n = ds1.n
),
d2 AS (
  SELECT e.s_lex AS n, e.pred || chr(30) || c.color AS d
  FROM edges e JOIN c1 c ON e.t = c.n
),
ds2 AS (SELECT n, list_sort(list(DISTINCT d)) AS ds FROM d2 GROUP BY n),
c2 AS (
  SELECT c1.n,
         md5(c1.color || chr(29) || COALESCE(array_to_string(ds2.ds, chr(31)), '')) AS color
  FROM c1 LEFT JOIN ds2 ON c1.n = ds2.n
)
SELECT sc.color AS s_color, e.pred, oc.color AS o_color,
       COUNT(*) AS n_edges, COUNT(DISTINCT e.s_lex) AS n_src
FROM edges e
JOIN c2 sc ON e.s_lex = sc.n
JOIN c2 oc ON e.t = oc.n
GROUP BY 1, 2, 3
"""

QUERIES["bisim_summary"] = (q_bisim_summary, SQL_BISIM_SUMMARY)


def q_containment(spark, sf):
    """Directional containment dedup over documents: pairs where either
    gram set is >=80% inside the other — the quote/wrapper cases
    symmetric Jaccard misses."""
    from .operators.textops import containment_pairs

    # 4-gram shingles for the same Σ df² reason as blocking_eval
    return containment_pairs(_docs(spark, sf), n=4, cont_min=80, max_df=50)


SQL_CONTAINMENT = """
WITH wlist AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS ws FROM documents),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(ws[i:i+3], ' ') AS g
  FROM wlist, unnest(range(1, len(ws) - 2)) AS t(i)
  WHERE len(ws) >= 4
),
dfreq AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g),
keep AS (SELECT gr.doc_id, gr.g FROM grams gr JOIN dfreq USING (g) WHERE dfreq.df <= 50),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM keep a JOIN keep b ON a.g = b.g AND a.doc_id < b.doc_id
),
inter AS (
  SELECT p.doc_a, p.doc_b, COUNT(*) AS n_inter
  FROM pairs p
  JOIN grams ga ON ga.doc_id = p.doc_a
  JOIN grams gb ON gb.doc_id = p.doc_b AND gb.g = ga.g
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id)
SELECT i.doc_a, i.doc_b,
       CAST(floor(n_inter * 100.0 / sa.n_grams) AS BIGINT) AS cont_a_pct,
       CAST(floor(n_inter * 100.0 / sb.n_grams) AS BIGINT) AS cont_b_pct,
       CAST(floor(n_inter * 100.0 / (sa.n_grams + sb.n_grams - n_inter)) AS BIGINT) AS jac_pct
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE floor(n_inter * 100.0 / sa.n_grams) >= 80
   OR floor(n_inter * 100.0 / sb.n_grams) >= 80
"""

QUERIES["containment"] = (q_containment, SQL_CONTAINMENT)


def q_ns_migrate(spark, sf):
    """Namespace migration: move the nation vocabulary urn:n: to an
    https namespace across subject/object positions (map-only anchored
    prefix rewrite); returns the inNation slice to show both rewritten
    objects and untouched subjects."""
    from .operators.canon import rewrite_namespace

    # filter BEFORE the rewrite: the predicate equality then pushes to the
    # store scan (the rewritten pred is a CASE expression Catalyst can't
    # push); equivalent here because the migration can't mint urn:p: IRIs
    sl = triples_view(spark, sf).filter(F.col("pred") == P_IN_NATION)
    out = rewrite_namespace(sl, "urn:n:", "https://ex.invalid/nation/")
    return out.select("s_lex", "pred", "o_lex")


SQL_NS_MIGRATE = """
SELECT 'urn:cu:' || c_custkey AS s_lex, 'urn:p:inNation' AS pred,
       'https://ex.invalid/nation/' || c_nationkey AS o_lex
FROM customer
UNION ALL
SELECT 'urn:su:' || s_suppkey, 'urn:p:inNation',
       'https://ex.invalid/nation/' || s_nationkey
FROM supplier
"""

QUERIES["ns_migrate"] = (q_ns_migrate, SQL_NS_MIGRATE)


def q_corpus_card(spark, sf):
    """Per-language dataset card: docs, token supply, exact-dup count,
    quality profile — one text scan, one language-keyed agg."""
    from .operators.textops import corpus_card

    return corpus_card(_docs(spark, sf))


SQL_CORPUS_CARD = f"""
WITH per AS (
  SELECT
    CASE WHEN greatest(s_de, s_en, s_fr) = 0 THEN 'und'
         WHEN s_de = greatest(s_de, s_en, s_fr) THEN 'de'
         WHEN s_en = greatest(s_de, s_en, s_fr) THEN 'en'
         ELSE 'fr' END AS lang,
    ws, q, h
  FROM (
    SELECT
      len(list_filter(string_split_regex(trim(text), ' +'), x -> lower(x) IN ({_SW_DE}))) AS s_de,
      len(list_filter(string_split_regex(trim(text), ' +'), x -> lower(x) IN ({_SW_EN}))) AS s_en,
      len(list_filter(string_split_regex(trim(text), ' +'), x -> lower(x) IN ({_SW_FR}))) AS s_fr,
      CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS ws,
      (CASE WHEN len(string_split_regex(trim(text), ' +')) >= 10
                 AND floor(length(text) * 100.0 / greatest(len(string_split_regex(trim(text), ' +')), 1)) BETWEEN 300 AND 1200
            THEN 50 ELSE 0 END)
      + (CASE WHEN floor(len(list_filter(string_split_regex(trim(text), ' +'), x -> lower(x) IN ({_SW_EN}))) * 1000.0
                     / greatest(len(string_split_regex(trim(text), ' +')), 1)) > 0 THEN 30 ELSE 0 END)
      + (CASE WHEN floor((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 1000.0
                     / greatest(length(text), 1)) <= 200 THEN 20 ELSE 0 END) AS q,
      md5(text) AS h
    FROM documents
  )
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(ws) AS BIGINT) AS ws_tokens,
       CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS dup_docs,
       CAST(SUM(q) AS BIGINT) AS quality_sum,
       CAST(SUM(q) * 100 // COUNT(*) AS BIGINT) AS mean_quality_x100
FROM per GROUP BY lang
"""

QUERIES["corpus_card"] = (q_corpus_card, SQL_CORPUS_CARD)


def q_rel_extract(spark, sf):
    """Hearst-style pattern relation extraction over the document corpus:
    'X merge Y' / 'X join Y' patterns to mention-level triples for the
    linking stage."""
    from .extract import extract_relations

    pats = [
        ("urn:p:mergesWith", r"([a-z]+) merge ([a-z]+)"),
        ("urn:p:joinsWith", r"([a-z]+) join ([a-z]+)"),
    ]
    return extract_relations(_docs(spark, sf), pats)


SQL_REL_EXTRACT = """
WITH m AS (
  SELECT doc_id,
         regexp_extract_all(text, '([a-z]+) merge ([a-z]+)', 1) AS a,
         regexp_extract_all(text, '([a-z]+) merge ([a-z]+)', 2) AS b
  FROM documents
),
j AS (
  SELECT doc_id,
         regexp_extract_all(text, '([a-z]+) join ([a-z]+)', 1) AS a,
         regexp_extract_all(text, '([a-z]+) join ([a-z]+)', 2) AS b
  FROM documents
)
SELECT DISTINCT doc_id, subj, pred, obj FROM (
  SELECT doc_id, a[i] AS subj, 'urn:p:mergesWith' AS pred, b[i] AS obj
  FROM m, unnest(range(1, len(a) + 1)) t(i)
  UNION ALL
  SELECT doc_id, a[i], 'urn:p:joinsWith', b[i]
  FROM j, unnest(range(1, len(a) + 1)) t(i)
)
"""

QUERIES["rel_extract"] = (q_rel_extract, SQL_REL_EXTRACT)


def q_type_infer(spark, sf):
    """SDType-style type inference: hide every 10th customer's rdf:type,
    infer it back from the predicate profile (segment/name/inNation/
    acctbal) — the KG-completion 'fill missing types' pass."""
    from .operators.stats import sdtype_infer

    t = triples_view(spark, sf)
    hidden = (F.col("pred") == RDF_TYPE) & F.col("s_lex").startswith("urn:cu:") & (
        F.regexp_extract("s_lex", r"urn:cu:(\d+)", 1).cast("long") % 10 == 0
    )
    return sdtype_infer(t.filter(~hidden))


SQL_TYPE_INFER = W + f""",
t AS (
  SELECT * FROM triples
  WHERE NOT (pred = '{RDF_TYPE}' AND s_lex LIKE 'urn:cu:%'
             AND TRY_CAST(regexp_extract(s_lex, 'urn:cu:(\\d+)', 1) AS BIGINT) % 10 = 0)
),
ty AS (SELECT DISTINCT s_lex AS s, o_lex AS tyv FROM t WHERE pred = '{RDF_TYPE}'),
sp AS (SELECT DISTINCT s_lex AS s, pred FROM t WHERE pred <> '{RDF_TYPE}'),
w AS (
  SELECT sp.pred, ty.tyv, COUNT(*) AS w
  FROM sp JOIN ty USING (s) GROUP BY 1, 2
),
pt AS (SELECT pred, SUM(w) AS n FROM w GROUP BY pred),
un AS (SELECT sp.s, sp.pred FROM sp LEFT JOIN ty USING (s) WHERE ty.s IS NULL),
sc AS (
  SELECT un.s, w.tyv, SUM(w.w) AS score
  FROM un JOIN w USING (pred) GROUP BY 1, 2
),
ev AS (SELECT un.s, SUM(pt.n) AS evidence FROM un JOIN pt USING (pred) GROUP BY 1),
best AS (
  SELECT s, tyv, score, ROW_NUMBER() OVER (PARTITION BY s ORDER BY score DESC, tyv ASC) AS rn
  FROM sc
)
SELECT b.s AS s_lex, b.tyv AS type_guess, CAST(b.score AS BIGINT) AS score,
       CAST(e.evidence AS BIGINT) AS evidence,
       CAST(b.score * 1000000 // e.evidence AS BIGINT) AS conf_ppm
FROM best b JOIN ev e ON b.s = e.s WHERE b.rn = 1
"""

QUERIES["type_infer"] = (q_type_infer, SQL_TYPE_INFER)


def q_trans_reduce(spark, sf):
    """Transitive reduction of the location hierarchy after redundant
    shortcuts are injected (every customer/supplier also edged straight
    to its region): the reduction must return exactly the minimal
    two-level hierarchy — the ontology-maintenance pruning pass."""
    from .operators.paths import transitive_reduction

    t = triples_view(spark, sf)
    cn = t.filter(F.col("pred") == P_IN_NATION).select(
        F.col("s_lex").alias("src"), F.col("o_lex").alias("dst")
    )
    nr = t.filter(F.col("pred") == P_IN_REGION).select(
        F.col("s_lex").alias("src"), F.col("o_lex").alias("dst")
    )
    shortcut = (
        cn.alias("a")
        .join(nr.alias("b"), F.col("a.dst") == F.col("b.src"))
        .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
    )
    edges = cn.unionByName(nr).unionByName(shortcut)
    return transitive_reduction(edges)


SQL_TRANS_REDUCE = """
SELECT 'urn:cu:' || c_custkey AS src, 'urn:n:' || c_nationkey AS dst FROM customer
UNION
SELECT 'urn:su:' || s_suppkey, 'urn:n:' || s_nationkey FROM supplier
UNION
SELECT 'urn:n:' || n_nationkey, 'urn:r:' || n_regionkey FROM nation
"""

QUERIES["trans_reduce"] = (q_trans_reduce, SQL_TRANS_REDUCE)


def q_rank_metrics(spark, sf):
    """Filtered-protocol ranking eval of the zero-relation TransE scorer:
    per query vector, the consecutive-id vector (true) vs 4 md5-picked
    decoys, ranked by -L1 energy -> MRR + Hits@k as exact integers."""
    from .operators.walks import rank_eval, transe_scores

    e = _embs(spark, sf)
    n = e.count()
    ids = e.select("vec_id").filter(F.col("vec_id") < 100)
    true_c = ids.select(
        F.col("vec_id").alias("q"), ((F.col("vec_id") + 1) % n).alias("c"),
        F.lit(1).alias("is_true"),
    )
    negs = (
        ids.select("vec_id", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j"))
        .select(
            F.col("vec_id").alias("q"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat_ws("\x1f", F.col("vec_id").cast("string"),
                                          F.col("j").cast("string"))), 1, 15
                    ), 16, 10
                ).cast("long") % n
            ).alias("c"),
            F.lit(0).alias("is_true"),
        )
        .filter((F.col("c") != F.col("q")) & (F.col("c") != (F.col("q") + 1) % n))
    )
    cand = true_c.unionByName(negs).dropDuplicates(["q", "c"])
    triples = cand.select(
        F.concat(F.lit("urn:v:"), F.col("q").cast("string")).alias("s_lex"),
        F.lit("urn:p:near").alias("pred"),
        F.concat(F.lit("urn:v:"), F.col("c").cast("string")).alias("o_lex"),
    )
    ent_emb = e.select(
        F.concat(F.lit("urn:v:"), F.col("vec_id").cast("string")).alias("ent"), "embedding"
    )
    scored = transe_scores(triples, ent_emb).join(
        cand.select(
            F.concat(F.lit("urn:v:"), F.col("q").cast("string")).alias("s_lex"),
            F.concat(F.lit("urn:v:"), F.col("c").cast("string")).alias("o_lex"),
            "is_true",
        ),
        ["s_lex", "o_lex"],
    ).select(
        F.col("s_lex").alias("query"), F.col("o_lex").alias("candidate"),
        F.col("score_x1e4").alias("score"), "is_true",
    )
    return rank_eval(scored, k_list=(1, 3, 10))


SQL_RANK_METRICS = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
n AS (SELECT COUNT(*) AS c FROM e),
ids AS (SELECT vec_id AS q FROM e WHERE vec_id < 100),
true_c AS (SELECT q, (q + 1) % (SELECT c FROM n) AS c, 1 AS is_true FROM ids),
negs AS (
  SELECT q,
         ('0x' || substr(md5(CAST(q AS VARCHAR) || chr(31) || CAST(j AS VARCHAR)), 1, 15))::BIGINT
           % (SELECT c FROM n) AS c,
         0 AS is_true
  FROM ids, unnest(range(4)) t(j)
),
fneg AS (SELECT * FROM negs WHERE c <> q AND c <> (q + 1) % (SELECT c FROM n)),
cand AS (
  SELECT q, c, MAX(is_true) AS is_true FROM (
    SELECT * FROM true_c UNION ALL SELECT * FROM fneg
  ) GROUP BY q, c
),
scored AS (
  SELECT cand.q, cand.c, cand.is_true,
         CAST(round(-10000 * list_aggregate(
           list_transform(range(1, len(a.emb) + 1), i -> abs(a.emb[i] - b.emb[i])), 'sum'
         )) AS BIGINT) AS score
  FROM cand JOIN e a ON a.vec_id = cand.q JOIN e b ON b.vec_id = cand.c
),
ranked AS (
  SELECT is_true,
         ROW_NUMBER() OVER (
           PARTITION BY q
           ORDER BY score DESC, is_true ASC, 'urn:v:' || CAST(c AS VARCHAR) ASC
         ) AS rk
  FROM scored
),
pos AS (SELECT rk FROM ranked WHERE is_true = 1)
SELECT COUNT(*) AS n_queries,
       CAST(SUM(1000000 // rk) // COUNT(*) AS BIGINT) AS mrr_x1e6,
       CAST(SUM(CASE WHEN rk <= 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS hits1_ppm,
       CAST(SUM(CASE WHEN rk <= 3 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS hits3_ppm,
       CAST(SUM(CASE WHEN rk <= 10 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS hits10_ppm
FROM pos
"""

QUERIES["rank_metrics"] = (q_rank_metrics, SQL_RANK_METRICS)


def q_host_split(spark, sf):
    """Leak-free train/val/test split keyed on the HOST, not the doc —
    near-dup pages from one site can never straddle splits. The output
    proves disjointness: per-split host counts sum to the global host
    count."""
    from .operators.sketches import hash_split

    d = _docs(spark, sf)
    s = hash_split(d, "source", splits=(("train", 90), ("val", 5), ("test", 5)))
    return s.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("source").alias("n_hosts"),
    )


SQL_HOST_SPLIT = """
WITH b AS (
  SELECT source,
         ('0x' || substr(md5(source), 1, 15))::BIGINT % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_hosts
FROM b GROUP BY 1
"""

QUERIES["host_split"] = (q_host_split, SQL_HOST_SPLIT)


def q_best_keeper(spark, sf):
    """Quality-aware dedup keeper: re-elect each near-dup cluster's
    keeper by quality score instead of min doc_id (keep the BEST
    duplicate — the Gopher/CCNet practice)."""
    from .operators.textops import keeper_by_quality, near_dup_clusters, quality_score

    d = _docs(spark, sf)
    clusters = near_dup_clusters(d, bands=8, band_min=4, jac_min=60)
    return keeper_by_quality(clusters, quality_score(d))


SQL_BEST_KEEPER = SQL_DEDUP_CLUSTERS.replace(
    """SELECT d.doc_id,
       COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
       CAST(CASE WHEN COALESCE(c.cluster_id, d.doc_id) = d.doc_id THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
FROM documents d LEFT JOIN comp c USING (doc_id)""",
    """,
cl AS (SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c USING (doc_id)),
q AS (
  SELECT doc_id,
    CAST((CASE WHEN len(string_split_regex(trim(text), ' +')) >= 10
               AND floor(length(text) * 100.0 / greatest(len(string_split_regex(trim(text), ' +')), 1)) BETWEEN 300 AND 1200
          THEN 50 ELSE 0 END)
       + (CASE WHEN floor(len(list_filter(string_split_regex(trim(text), ' +'), x -> lower(x) IN ('the','and','of','to','in','is','that','for','with','as'))) * 1000.0
                / greatest(len(string_split_regex(trim(text), ' +')), 1)) > 0 THEN 30 ELSE 0 END)
       + (CASE WHEN floor((length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) * 1000.0
                / greatest(length(text), 1)) <= 200 THEN 20 ELSE 0 END) AS BIGINT) AS quality
  FROM documents
)
SELECT cl.doc_id, cl.cluster_id, q.quality,
       CAST(CASE WHEN ROW_NUMBER() OVER (
         PARTITION BY cl.cluster_id ORDER BY q.quality DESC, cl.doc_id ASC
       ) = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
FROM cl JOIN q USING (doc_id)""",
)

QUERIES["best_keeper"] = (q_best_keeper, SQL_BEST_KEEPER)


def q_entity_card(spark, sf):
    """Entity-card fact summarization: top-3 most informative facts per
    customer subject (rare predicates first), types excluded."""
    from .operators.stats import entity_facts_topk

    t = triples_view(spark, sf).filter(F.col("s_lex").startswith("urn:cu:"))
    return entity_facts_topk(t, k=3)


SQL_ENTITY_CARD = W + f""",
facts AS (
  SELECT s_lex, pred, o_kind, o_lex FROM triples
  WHERE pred <> '{RDF_TYPE}' AND s_lex LIKE 'urn:cu:%'
),
pf AS (SELECT pred, COUNT(*) AS pf FROM facts GROUP BY pred),
r AS (
  SELECT f.s_lex, f.pred, f.o_kind, f.o_lex,
         ROW_NUMBER() OVER (
           PARTITION BY f.s_lex ORDER BY pf.pf ASC, f.pred ASC, f.o_lex ASC
         ) AS fact_rank
  FROM facts f JOIN pf USING (pred)
)
SELECT s_lex, pred, CAST(o_kind AS TINYINT) AS o_kind, o_lex,
       CAST(fact_rank AS INTEGER) AS fact_rank
FROM r WHERE fact_rank <= 3
"""

QUERIES["entity_card"] = (q_entity_card, SQL_ENTITY_CARD)


# --- web-link-graph family (operators/weblinks.py) ---------------------------
#
# The corpus tables carry no html, so each query synthesizes a per-doc page
# with the SAME deterministic column expressions the oracle reproduces (the
# host_profile convention): the Spark side runs the REAL operators over the
# synthesized html; the DuckDB side computes the expected result from the
# formulas INDEPENDENTLY (no regex mirroring — a stronger oracle than
# expression translation).


def _link_pages(spark, sf):
    """Synthetic page set: url + html with 5 anchors per doc — one absolute
    cross-host, one root-relative (self-host), one protocol-relative
    cross-host, one fragment-only and one mailto (both must be dropped)."""
    d = F.col("doc_id")
    return _docs(spark, sf).select(
        "doc_id",
        F.concat(
            F.lit("https://h"), (d % 37).cast("string"), F.lit(".example/p/"), d.cast("string")
        ).alias("url"),
        F.concat(
            F.lit('<p>intro</p><a href="https://h'), (d % 5).cast("string"),
            F.lit('.example/idx">doc '), (d % 7).cast("string"),
            F.lit('</a><a href="/d/'), d.cast("string"),
            F.lit('">self</a><a href="//h'), ((d * 11 + 5) % 37).cast("string"),
            F.lit('.example/x">'), F.col("lang"),
            F.lit('</a><a href="#top">top</a><a href="mailto:z@w">mail</a>'),
        ).alias("html"),
    )


def q_link_graph(spark, sf):
    """Host-level link graph over extracted hyperlinks: regex href
    extraction + RFC-3986-subset resolution (absolute / root-relative /
    protocol-relative; fragment+mailto dropped), then ONE map-side-combined
    (src_host, dst_host) aggregation with self-loops removed."""
    from .operators.weblinks import extract_links, host_link_graph

    return host_link_graph(extract_links(_link_pages(spark, sf)))


SQL_LINK_GRAPH = """
WITH links AS (
  SELECT 'h' || (doc_id % 37) AS sh, 'h' || (doc_id % 5) AS dh, doc_id FROM documents
  UNION ALL
  SELECT 'h' || (doc_id % 37), 'h' || ((doc_id * 11 + 5) % 37), doc_id FROM documents
)
SELECT sh || '.example' AS src_host, dh || '.example' AS dst_host,
       COUNT(*) AS n_links, COUNT(DISTINCT doc_id) AS n_src_pages
FROM links WHERE sh <> dh GROUP BY 1, 2
"""

QUERIES["link_graph"] = (q_link_graph, SQL_LINK_GRAPH)


def q_anchor_dict(spark, sf):
    """Anchor-text alias dictionary: normalized anchor → top-2 target URLs
    by inbound-link count (the entity-linking lexicon the web crowd-writes).
    The per-doc self links are unique targets, so min_count=2 prunes them —
    only the shared 'doc N' and language anchors survive."""
    from .operators.weblinks import anchor_dictionary, extract_links

    return anchor_dictionary(extract_links(_link_pages(spark, sf)), min_count=2, k=2)


SQL_ANCHOR_DICT = """
WITH links AS (
  SELECT 'doc ' || (doc_id % 7) AS alias,
         'https://h' || (doc_id % 5) || '.example/idx' AS dst_url FROM documents
  UNION ALL
  SELECT lang, 'https://h' || ((doc_id * 11 + 5) % 37) || '.example/x' FROM documents
  UNION ALL
  SELECT 'self', 'https://h' || (doc_id % 37) || '.example/d/' || doc_id FROM documents
),
cells AS (
  SELECT alias, dst_url, COUNT(*) AS n_links FROM links GROUP BY 1, 2
  HAVING COUNT(*) >= 2
)
SELECT alias, dst_url, n_links, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY alias ORDER BY n_links DESC, dst_url ASC) AS rank
  FROM cells
) WHERE rank <= 2
"""

QUERIES["anchor_dict"] = (q_anchor_dict, SQL_ANCHOR_DICT)


def q_redirects(spark, sf):
    """Redirect-chain resolution by pointer doubling (O(log hops) rounds):
    customer-key chains k→k-1 ending at multiples of 8 (length ≤ 7) plus
    planted 2-cycles every 100th key; cycles surface is_cycle with NULL
    final — coalesced to ''/-1 for cross-engine hashing."""
    from .operators.weblinks import resolve_redirects

    c = spark.read.parquet(f"{sf}/customer.parquet")
    k = F.col("c_custkey")
    chain = c.filter(k % 8 != 0).select(
        F.concat(F.lit("u"), k.cast("string")).alias("src"),
        F.concat(F.lit("u"), (k - 1).cast("string")).alias("dst"),
    )
    cyc_keys = c.filter(k % 100 == 0)
    cyc = cyc_keys.select(
        F.concat(F.lit("c"), k.cast("string")).alias("src"),
        F.concat(F.lit("cx"), k.cast("string")).alias("dst"),
    ).unionByName(
        cyc_keys.select(
            F.concat(F.lit("cx"), k.cast("string")).alias("src"),
            F.concat(F.lit("c"), k.cast("string")).alias("dst"),
        )
    )
    out = resolve_redirects(chain.unionByName(cyc), max_hops=16)
    return out.select(
        "src",
        F.coalesce(F.col("final_url"), F.lit("")).alias("final_url"),
        F.when(F.col("is_cycle"), F.lit(-1)).otherwise(F.col("hops")).cast("long").alias("hops"),
        "is_cycle",
    )


SQL_REDIRECTS = """
WITH RECURSIVE r AS (
  SELECT 'u' || c_custkey AS src, 'u' || (c_custkey - 1) AS dst
  FROM customer WHERE c_custkey % 8 <> 0
  UNION ALL
  SELECT 'c' || c_custkey, 'cx' || c_custkey FROM customer WHERE c_custkey % 100 = 0
  UNION ALL
  SELECT 'cx' || c_custkey, 'c' || c_custkey FROM customer WHERE c_custkey % 100 = 0
),
walk(src, cur, hops) AS (
  SELECT src, dst, 1 FROM r
  UNION ALL
  SELECT w.src, r.dst, w.hops + 1 FROM walk w JOIN r ON w.cur = r.src WHERE w.hops < 20
),
last AS (
  SELECT src, cur, hops, ROW_NUMBER() OVER (PARTITION BY src ORDER BY hops DESC) AS rn
  FROM walk
)
SELECT src,
       CASE WHEN hops >= 20 THEN '' ELSE cur END AS final_url,
       CAST(CASE WHEN hops >= 20 THEN -1 ELSE hops END AS BIGINT) AS hops,
       hops >= 20 AS is_cycle
FROM last WHERE rn = 1
"""

QUERIES["redirects"] = (q_redirects, SQL_REDIRECTS)


def q_robots(spark, sf):
    """Robots-rules URL admission: REP longest-prefix match (RFC 9309
    §2.2.2, Allow wins length ties) with rules collapsed to one array row
    per host, broadcast, and the argmax run as scan-local array algebra —
    zero shuffles on the URL set. Hosts ≥ 25 have no rules (default
    allow)."""
    from .operators.weblinks import robots_filter

    n = spark.read.parquet(f"{sf}/nation.parquet")
    nk = F.col("n_nationkey")
    host = F.concat(F.lit("h"), nk.cast("string"), F.lit(".example"))
    rules = (
        n.select(host.alias("host"), F.lit("").alias("prefix"), F.lit(True).alias("allow"))
        .unionByName(n.select(host.alias("host"), F.lit("/private").alias("prefix"), F.lit(False).alias("allow")))
        .unionByName(
            n.filter(nk % 2 == 0).select(
                host.alias("host"), F.lit("/private/pub").alias("prefix"), F.lit(True).alias("allow")
            )
        )
        .unionByName(
            n.filter(nk % 3 == 0).select(
                host.alias("host"), F.lit("/p").alias("prefix"), F.lit(False).alias("allow")
            )
        )
    )
    d = F.col("doc_id")
    path = (
        F.when(d % 5 == 0, F.concat(F.lit("/p/"), d.cast("string")))
        .when(d % 5 == 1, F.lit("/private/x"))
        .when(d % 5 == 2, F.lit("/private/pub/y"))
        .when(d % 5 == 3, F.lit("/open"))
        .otherwise(F.lit(""))
    )
    urls = _docs(spark, sf).select(
        "doc_id",
        F.concat(F.lit("https://h"), (d % 30).cast("string"), F.lit(".example"), path).alias("url"),
    )
    return robots_filter(urls, rules)


SQL_ROBOTS = """
WITH rules AS (
  SELECT 'h' || n_nationkey || '.example' AS host, '' AS prefix, TRUE AS allow FROM nation
  UNION ALL
  SELECT 'h' || n_nationkey || '.example', '/private', FALSE FROM nation
  UNION ALL
  SELECT 'h' || n_nationkey || '.example', '/private/pub', TRUE FROM nation WHERE n_nationkey % 2 = 0
  UNION ALL
  SELECT 'h' || n_nationkey || '.example', '/p', FALSE FROM nation WHERE n_nationkey % 3 = 0
),
u AS (
  SELECT doc_id,
         'https://h' || (doc_id % 30) || '.example' ||
           CASE doc_id % 5 WHEN 0 THEN '/p/' || doc_id WHEN 1 THEN '/private/x'
                WHEN 2 THEN '/private/pub/y' WHEN 3 THEN '/open' ELSE '' END AS url,
         'h' || (doc_id % 30) || '.example' AS host,
         CASE doc_id % 5 WHEN 0 THEN '/p/' || doc_id WHEN 1 THEN '/private/x'
              WHEN 2 THEN '/private/pub/y' WHEN 3 THEN '/open' ELSE '/' END AS path
  FROM documents
),
m AS (
  SELECT u.doc_id, u.url, r.prefix, r.allow,
         ROW_NUMBER() OVER (
           PARTITION BY u.doc_id
           ORDER BY length(COALESCE(r.prefix, '')) DESC,
                    CAST(COALESCE(r.allow, TRUE) AS INT) DESC,
                    COALESCE(r.prefix, '') DESC
         ) AS rn
  FROM u LEFT JOIN rules r ON u.host = r.host AND starts_with(u.path, r.prefix)
)
SELECT doc_id, url, COALESCE(prefix, '') AS rule_prefix, COALESCE(allow, TRUE) AS allowed
FROM m WHERE rn = 1
"""

QUERIES["robots"] = (q_robots, SQL_ROBOTS)


def q_sssp(spark, sf):
    """Weighted shortest paths (distributed Bellman-Ford, 6 relaxation
    rounds = exact min cost over ≤6-edge paths) from each nation chain's
    head over the chain-with-chords graph, md5-derived integer edge
    weights 1..9. The oracle is the same relaxation unrolled as
    materialized CTEs (the bfs_dist protocol, weighted)."""
    from .operators.cc import sssp

    r, e = _chain_graph(spark, sf)
    ew = e.withColumn(
        "w",
        F.conv(F.substring(F.md5(F.concat(F.col("src"), F.lit(">"), F.col("dst"))), 1, 15), 16, 10)
        .cast("long") % 9 + 1,
    )
    seeds = r.filter(F.col("rn") == 1).select(F.col("k").alias("node"))
    return sssp(ew, seeds, max_rounds=6)


def _sssp_sql(rounds: int) -> str:
    parts = [
        "WITH " + _CHAIN_SQL + """,
we AS (
  SELECT src, dst,
         ('0x' || substr(md5(src || '>' || dst), 1, 15))::BIGINT % 9 + 1 AS w
  FROM raw
),
s0 AS (SELECT kk AS node, CAST(0 AS BIGINT) AS dist FROM r WHERE rn = 1)"""
    ]
    for h in range(1, rounds + 1):
        parts.append(
            f""",
s{h} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM s{h - 1}
    UNION ALL
    SELECT e.dst, s.dist + e.w FROM s{h - 1} s JOIN we e ON e.src = s.node
  ) GROUP BY node
)"""
        )
    parts.append(f"\nSELECT node, CAST(dist AS BIGINT) AS dist FROM s{rounds}")
    return "".join(parts)


SQL_SSSP = _sssp_sql(6)

QUERIES["sssp"] = (q_sssp, SQL_SSSP)


def q_class_align(spark, sf):
    """Instance-based ontology alignment: nation classes (vocabulary a)
    matched against region + customer-parity classes (vocabulary b) by
    shared-member Jaccard — each nation class must elect its region
    (containment, jac = |nation|/|region|) over the uninformative parity
    split."""
    from .operators.fusion import class_alignment

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    na = spark.read.parquet(f"{sf}/nation.parquet")
    inst = F.concat(F.lit("i"), F.col("c_custkey").cast("string")).alias("inst")
    ta = cu.select(
        inst,
        F.concat(F.lit("a:n"), F.col("c_nationkey").cast("string")).alias("cls_a"),
    )
    tb = (
        cu.join(na, cu["c_nationkey"] == na["n_nationkey"])
        .select(
            inst,
            F.concat(F.lit("b:r"), F.col("n_regionkey").cast("string")).alias("cls_b"),
        )
        .unionByName(
            cu.select(
                inst,
                F.concat(F.lit("b:par"), (F.col("c_custkey") % 2).cast("string")).alias("cls_b"),
            )
        )
    )
    return class_alignment(ta, tb, k=2)


SQL_CLASS_ALIGN = """
WITH ta AS (
  SELECT DISTINCT 'i' || c_custkey AS inst, 'a:n' || c_nationkey AS cls_a FROM customer
),
tb AS (
  SELECT DISTINCT 'i' || c_custkey AS inst, 'b:r' || n_regionkey AS cls_b
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  UNION
  SELECT DISTINCT 'i' || c_custkey, 'b:par' || (c_custkey % 2) FROM customer
),
na AS (SELECT cls_a, COUNT(*) AS n_a FROM ta GROUP BY 1),
nb AS (SELECT cls_b, COUNT(*) AS n_b FROM tb GROUP BY 1),
inter AS (
  SELECT cls_a, cls_b, COUNT(*) AS n_both
  FROM ta JOIN tb USING (inst) GROUP BY 1, 2
),
j AS (
  SELECT i.cls_a, i.cls_b, na.n_a, nb.n_b, i.n_both,
         CAST(i.n_both * 1000000 AS BIGINT) // (na.n_a + nb.n_b - i.n_both) AS jac_ppm
  FROM inter i JOIN na USING (cls_a) JOIN nb USING (cls_b)
)
SELECT cls_a, cls_b, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(n_both AS BIGINT) AS n_both, jac_ppm, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY cls_a ORDER BY jac_ppm DESC, n_both DESC, cls_b ASC
  ) AS rank FROM j
) WHERE rank <= 2
"""

QUERIES["class_align"] = (q_class_align, SQL_CLASS_ALIGN)


def q_change_rate(spark, sf):
    """Per-URL content change rate from crawl snapshots (events stream as
    fetch history: user bucket = URL, event_type hash = content digest):
    exact integer change_ppm + the hot/warm/cold recrawl tier."""
    from .operators.urls import change_rate

    ev = spark.read.parquet(f"{sf}/events.parquet")
    snaps = ev.select(
        F.concat(F.lit("u"), (F.col("user_id") % 97).cast("string")).alias("url"),
        F.col("ts"),
        F.col("event_id"),
        F.md5(F.col("event_type")).alias("content_hash"),
    )
    return change_rate(snaps, order_cols=("event_id",))


SQL_CHANGE_RATE = """
WITH s AS (
  SELECT 'u' || (user_id % 97) AS url, ts, event_id, md5(event_type) AS h
  FROM events
),
per AS (
  SELECT url,
         CASE WHEN lag(h) OVER (PARTITION BY url ORDER BY ts ASC, event_id ASC) IS NOT NULL
                   AND h <> lag(h) OVER (PARTITION BY url ORDER BY ts ASC, event_id ASC)
              THEN 1 ELSE 0 END AS chg
  FROM s
),
agg AS (
  SELECT url, COUNT(*) AS n_obs, SUM(chg) AS n_changes FROM per GROUP BY 1
)
SELECT url, CAST(n_obs AS BIGINT) AS n_obs, CAST(n_changes AS BIGINT) AS n_changes,
       CAST(CASE WHEN n_obs <= 1 THEN 0
                 ELSE CAST(n_changes * 1000000 AS BIGINT) // (n_obs - 1) END AS BIGINT) AS change_ppm,
       CASE WHEN (CASE WHEN n_obs <= 1 THEN 0
                       ELSE n_changes * 1000000 // (n_obs - 1) END) >= 500000 THEN 'hot'
            WHEN (CASE WHEN n_obs <= 1 THEN 0
                       ELSE n_changes * 1000000 // (n_obs - 1) END) >= 100000 THEN 'warm'
            ELSE 'cold' END AS priority
FROM agg
"""

QUERIES["change_rate"] = (q_change_rate, SQL_CHANGE_RATE)


def q_host_authority(spark, sf):
    """Per-host link-economy profile over the extracted host graph:
    in/out degree + link volumes + integer authority share."""
    from .operators.weblinks import extract_links, host_authority, host_link_graph

    return host_authority(host_link_graph(extract_links(_link_pages(spark, sf))))


SQL_HOST_AUTHORITY = """
WITH links AS (
  SELECT 'h' || (doc_id % 37) AS sh, 'h' || (doc_id % 5) AS dh, doc_id FROM documents
  UNION ALL
  SELECT 'h' || (doc_id % 37), 'h' || ((doc_id * 11 + 5) % 37), doc_id FROM documents
),
hg AS (
  SELECT sh || '.example' AS src_host, dh || '.example' AS dst_host, COUNT(*) AS n_links
  FROM links WHERE sh <> dh GROUP BY 1, 2
),
o AS (SELECT src_host AS host, COUNT(*) AS out_degree, SUM(n_links) AS out_links FROM hg GROUP BY 1),
i AS (SELECT dst_host AS host, COUNT(*) AS in_degree, SUM(n_links) AS in_links FROM hg GROUP BY 1)
SELECT COALESCE(o.host, i.host) AS host,
       CAST(COALESCE(out_degree, 0) AS BIGINT) AS out_degree,
       CAST(COALESCE(out_links, 0) AS BIGINT) AS out_links,
       CAST(COALESCE(in_degree, 0) AS BIGINT) AS in_degree,
       CAST(COALESCE(in_links, 0) AS BIGINT) AS in_links,
       CAST(CASE WHEN COALESCE(in_links, 0) + COALESCE(out_links, 0) = 0 THEN 0
                 ELSE COALESCE(in_links, 0) * 1000000 // (COALESCE(in_links, 0) + COALESCE(out_links, 0))
            END AS BIGINT) AS authority_ppm
FROM o FULL OUTER JOIN i ON o.host = i.host
"""

QUERIES["host_authority"] = (q_host_authority, SQL_HOST_AUTHORITY)


def q_table_triples(spark, sf):
    """WebTables recovery end-to-end: synthesized header-rowed tables →
    the REAL mapInPandas extraction stage with the tables extractor on →
    non-bnode-object triples. The oracle computes the expected mapping
    (type/counts/rowIndex/typed cells/resolved link IRIs) from the
    synthesis formulas independently — no html parsing on the DuckDB
    side."""
    from .extract import extract_triples, split_errors
    from .types import KIND_BNODE

    d = F.col("doc_id")
    pages = _docs(spark, sf).select(
        F.concat(
            F.lit("https://h"), (d % 37).cast("string"), F.lit(".example/p/"), d.cast("string")
        ).alias("url"),
        F.encode(
            F.concat(
                F.lit("<table><tr><th>K</th><th>N Chars</th><th>Link</th></tr><tr><td>d"),
                d.cast("string"),
                F.lit("</td><td>"),
                F.col("n_chars").cast("string"),
                F.lit('</td><td><a href="/e/'),
                (d % 41).cast("string"),
                F.lit('">x</a></td></tr><tr><td>'),
                F.col("lang"),
                F.lit("</td><td>-7</td><td>plain text</td></tr></table>"),
            ),
            "utf-8",
        ).alias("html"),
    )
    triples, _errs = split_errors(extract_triples(pages, tables=True))
    return triples.filter(F.col("o_kind") != KIND_BNODE).select(
        "graph", "pred",
        F.col("o_kind").cast("tinyint").alias("o_kind"),
        "o_lex",
        F.coalesce(F.col("o_dtype"), F.lit("")).alias("o_dtype"),
    )


SQL_TABLE_TRIPLES = """
WITH d AS (
  SELECT 'https://h' || (doc_id % 37) || '.example/p/' || doc_id AS graph,
         'https://h' || (doc_id % 37) || '.example/e/' || (doc_id % 41) AS link,
         'd' || doc_id AS k1, lang AS k2, CAST(n_chars AS VARCHAR) AS nc
  FROM documents
),
xsd AS (SELECT 'http://www.w3.org/2001/XMLSchema#' AS ns)
SELECT graph, pred, CAST(o_kind AS TINYINT) AS o_kind, o_lex, o_dtype FROM (
  SELECT graph, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
         0 AS o_kind, 'urn:x-ords:table:Table' AS o_lex, '' AS o_dtype FROM d
  UNION ALL
  SELECT graph, 'urn:x-ords:table:columnCount', 2, '3', ns || 'integer' FROM d, xsd
  UNION ALL
  SELECT graph, 'urn:x-ords:table:rowCount', 2, '2', ns || 'integer' FROM d, xsd
  UNION ALL
  SELECT graph, 'urn:x-ords:table:rowIndex', 2, '0', ns || 'integer' FROM d, xsd
  UNION ALL
  SELECT graph, 'urn:x-ords:table:rowIndex', 2, '1', ns || 'integer' FROM d, xsd
  UNION ALL
  SELECT graph, 'urn:x-ords:table:col/k', 2, k1, ns || 'string' FROM d, xsd
  UNION ALL
  SELECT graph, 'urn:x-ords:table:col/k', 2, k2, ns || 'string' FROM d, xsd
  UNION ALL
  SELECT graph, 'urn:x-ords:table:col/n-chars', 2, nc, ns || 'integer' FROM d, xsd
  UNION ALL
  SELECT graph, 'urn:x-ords:table:col/n-chars', 2, '-7', ns || 'integer' FROM d, xsd
  UNION ALL
  SELECT graph, 'urn:x-ords:table:col/link', 0, link, '' FROM d
  UNION ALL
  SELECT graph, 'urn:x-ords:table:col/link', 2, 'plain text', ns || 'string' FROM d, xsd
)
"""

QUERIES["table_triples"] = (q_table_triples, SQL_TABLE_TRIPLES)


def q_cidr_map(spark, sf):
    """IP→netblock longest-prefix enrichment (geo/ASN shape): /13 blocks
    per nation plus /16 overrides at each block base — the /16 must win
    where both match; high ip buckets (b ≥ 200) have no block (NULL →
    coalesced for hashing). The bucket-expansion equi-join is the
    operator; the oracle uses a direct theta join + window, so the
    bucketing mechanics are verified against an independent plan."""
    from .operators.urls import cidr_join

    n = spark.read.parquet(f"{sf}/nation.parquet")
    nk = F.col("n_nationkey")
    blocks = n.select(
        F.concat(F.lit("10."), (nk * 8).cast("string"), F.lit(".0.0/13")).alias("cidr"),
        F.concat(F.lit("n"), nk.cast("string")).alias("owner"),
    ).unionByName(
        n.select(
            F.concat(F.lit("10."), (nk * 8).cast("string"), F.lit(".0.0/16")).alias("cidr"),
            F.concat(F.lit("n"), nk.cast("string"), F.lit("x")).alias("owner"),
        )
    )
    ev = spark.read.parquet(f"{sf}/events.parquet")
    ips = ev.select(
        F.concat(
            F.lit("10."), (F.col("user_id") % 210).cast("string"),
            F.lit("."), (F.col("event_id") % 250).cast("string"),
            F.lit("."), (F.col("event_id") % 97).cast("string"),
        ).alias("ip")
    )
    out = cidr_join(ips, blocks)
    return out.select(
        "ip",
        F.coalesce(F.col("cidr"), F.lit("")).alias("cidr"),
        F.coalesce(F.col("prefix_len"), F.lit(-1)).cast("int").alias("prefix_len"),
        F.coalesce(F.col("owner"), F.lit("")).alias("owner"),
    )


SQL_CIDR_MAP = """
WITH blocks AS (
  SELECT '10.' || (n_nationkey * 8) || '.0.0/13' AS cidr, 13 AS k,
         'n' || n_nationkey AS owner,
         CAST(10 * 16777216 + n_nationkey * 8 * 65536 AS BIGINT) AS net
  FROM nation
  UNION ALL
  SELECT '10.' || (n_nationkey * 8) || '.0.0/16', 16, 'n' || n_nationkey || 'x',
         CAST(10 * 16777216 + n_nationkey * 8 * 65536 AS BIGINT)
  FROM nation
),
ips AS (
  SELECT DISTINCT
    '10.' || (user_id % 210) || '.' || (event_id % 250) || '.' || (event_id % 97) AS ip,
    CAST(10 * 16777216 + (user_id % 210) * 65536 + (event_id % 250) * 256 + (event_id % 97) AS BIGINT) AS ipint
  FROM events
),
m AS (
  SELECT ip, cidr, k, owner,
         ROW_NUMBER() OVER (PARTITION BY ip ORDER BY k DESC, cidr ASC) AS rn
  FROM ips JOIN blocks ON (ipint >> (32 - k)) = (net >> (32 - k))
)
SELECT i.ip, COALESCE(m.cidr, '') AS cidr,
       CAST(COALESCE(m.k, -1) AS INTEGER) AS prefix_len,
       COALESCE(m.owner, '') AS owner
FROM ips i LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (ip)
"""

QUERIES["cidr_map"] = (q_cidr_map, SQL_CIDR_MAP)


def q_reify_store(spark, sf):
    """RDF reification of the inNation slice: per input quad a
    deterministic statement IRI (md5 of the quad key) with the four
    rdf:Statement arcs — map-only constant-width melt, ids reproduced
    bit-identically by the DuckDB oracle."""
    from .operators.canon import reify

    sl = triples_view(spark, sf).filter(F.col("pred") == P_IN_NATION)
    out = reify(sl)
    return out.select(
        "s_lex", "pred",
        F.col("o_kind").cast("tinyint").alias("o_kind"),
        "o_lex",
        F.coalesce(F.col("o_dtype"), F.lit("")).alias("o_dtype"),
        "graph",
    )


_STMT_MD5 = (
    "'urn:x-ords:stmt:' || md5('0' || chr(31) || s_lex || chr(31) || pred || chr(31) "
    "|| CAST(o_kind AS VARCHAR) || chr(31) || o_lex || chr(31) || COALESCE(o_dtype, '') "
    "|| chr(31) || '' || chr(31) || graph)"
)

SQL_REIFY_STORE = W + f""",
sl AS (SELECT *, {_STMT_MD5} AS stmt FROM triples WHERE pred = 'urn:p:inNation')
SELECT stmt AS s_lex, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
       CAST(0 AS TINYINT) AS o_kind,
       'http://www.w3.org/1999/02/22-rdf-syntax-ns#Statement' AS o_lex, '' AS o_dtype, graph
FROM sl
UNION ALL
SELECT stmt, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#subject', CAST(0 AS TINYINT), s_lex, '', graph FROM sl
UNION ALL
SELECT stmt, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#predicate', CAST(0 AS TINYINT), pred, '', graph FROM sl
UNION ALL
SELECT stmt, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#object', CAST(o_kind AS TINYINT), o_lex,
       COALESCE(o_dtype, ''), graph FROM sl
"""

QUERIES["reify_store"] = (q_reify_store, SQL_REIFY_STORE)


def q_reify_rt(spark, sf):
    """Reification round-trip: unreify(reify(slice)) must reproduce the
    slice exactly — the oracle IS the untouched slice."""
    from .operators.canon import reify, unreify

    sl = triples_view(spark, sf).filter(F.col("pred") == P_IN_NATION)
    rt = unreify(reify(sl))
    return rt.select(
        "s_lex", "pred",
        F.col("o_kind").cast("tinyint").alias("o_kind"),
        "o_lex", "graph",
    )


SQL_REIFY_RT = W + """
SELECT s_lex, pred, CAST(o_kind AS TINYINT) AS o_kind, o_lex, graph
FROM triples WHERE pred = 'urn:p:inNation'
"""

QUERIES["reify_rt"] = (q_reify_rt, SQL_REIFY_RT)


def q_sitemap_parse(spark, sf):
    """Sitemap XML → url entries: zipped-regex block parsing with exact
    integer priorities; the third (loc-less) block must be dropped.
    Oracle computes the expected entries from the synthesis formulas —
    no XML handling on the DuckDB side."""
    from .operators.weblinks import parse_sitemaps

    d = F.col("doc_id")
    sm = _docs(spark, sf).select(
        F.concat(F.lit("h"), (d % 37).cast("string")).alias("host"),
        F.concat(
            F.lit("<urlset><url><loc>https://h"), (d % 37).cast("string"),
            F.lit(".example/p/"), d.cast("string"),
            F.lit("</loc><lastmod>2026-0"), (d % 9 + 1).cast("string"),
            F.lit("-11</lastmod><changefreq>"),
            F.when(d % 3 == 0, F.lit("daily")).when(d % 3 == 1, F.lit("weekly")).otherwise(F.lit("monthly")),
            F.lit("</changefreq><priority>0."), (d % 5 + 5).cast("string"),
            F.lit("</priority></url><url><loc>https://h"), (d % 37).cast("string"),
            F.lit(".example/idx</loc></url><url><changefreq>never</changefreq></url></urlset>"),
        ).alias("xml"),
    )
    out = parse_sitemaps(sm)
    return out.select(
        "host", "loc",
        F.coalesce(F.col("lastmod"), F.lit("")).alias("lastmod"),
        F.coalesce(F.col("changefreq"), F.lit("")).alias("changefreq"),
        F.coalesce(F.col("priority_x100"), F.lit(-1)).cast("int").alias("priority_x100"),
    )


SQL_SITEMAP_PARSE = """
SELECT 'h' || (doc_id % 37) AS host,
       'https://h' || (doc_id % 37) || '.example/p/' || doc_id AS loc,
       '2026-0' || (doc_id % 9 + 1) || '-11' AS lastmod,
       CASE doc_id % 3 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly' ELSE 'monthly' END AS changefreq,
       CAST((doc_id % 5 + 5) * 10 AS INTEGER) AS priority_x100
FROM documents
UNION ALL
SELECT 'h' || (doc_id % 37), 'https://h' || (doc_id % 37) || '.example/idx',
       '', '', -1
FROM documents
"""

QUERIES["sitemap_parse"] = (q_sitemap_parse, SQL_SITEMAP_PARSE)


def q_canon_link(spark, sf):
    """rel=canonical extraction: both attribute orders, root-/protocol-
    relative resolution, no-declaration fallback to self."""
    from .operators.weblinks import canonical_links

    d = F.col("doc_id")
    origin = F.concat(F.lit("https://h"), (d % 37).cast("string"), F.lit(".example"))
    pages = _docs(spark, sf).select(
        F.concat(origin, F.lit("/p/"), d.cast("string"), F.lit("?ref=x")).alias("url"),
        F.when(
            d % 3 == 0,
            F.concat(F.lit('<head><link rel="canonical" href="/p/'), d.cast("string"), F.lit('"></head>')),
        )
        .when(
            d % 3 == 1,
            F.concat(
                F.lit('<head><link href="//h'), (d % 37).cast("string"),
                F.lit(".example/p/"), d.cast("string"), F.lit('#top" rel="canonical"></head>'),
            ),
        )
        .otherwise(F.lit("<head><title>none</title></head>"))
        .alias("html"),
    )
    return canonical_links(pages)


SQL_CANON_LINK = """
WITH d AS (
  SELECT doc_id,
         'https://h' || (doc_id % 37) || '.example' AS origin,
         'https://h' || (doc_id % 37) || '.example/p/' || doc_id AS clean
  FROM documents
)
SELECT clean || '?ref=x' AS url,
       CASE WHEN doc_id % 3 IN (0, 1) THEN clean ELSE clean || '?ref=x' END AS canonical_url,
       doc_id % 3 IN (0, 1) AS is_cross
FROM d
"""

QUERIES["canon_link"] = (q_canon_link, SQL_CANON_LINK)


def q_warc_roundtrip(spark, sf):
    """WARC 1.0 container round-trip (sources/warc.py — engine scope, not
    in the query-only reference; the production pages table is read FROM
    warc.gz segments per the north rule): synthesize one HTTP response
    record per document (status / content-type / WARC-Date from doc_id
    formulas), gzip one member per record (the splittable Common Crawl
    layout), parse the segment bytes back with the REAL reader, and
    return the parsed envelope + payload byte length. The oracle
    recomputes every field from the synthesis formulas — no WARC parsing
    on the DuckDB side, so any writer/parser disagreement surfaces."""
    from .sources.warc import pages_to_warc, warc_to_pages

    d = F.col("doc_id")
    pages = _docs(spark, sf).select(
        F.concat(
            F.lit("https://w"), (d % 23).cast("string"), F.lit(".example/d/"), d.cast("string")
        ).alias("url"),
        F.concat(
            F.lit("2026-05-1"), (d % 10).cast("string"),
            F.lit("T12:34:5"), (d % 10).cast("string"), F.lit("Z"),
        ).alias("warc_date"),
        F.encode(F.col("text"), "utf-8").alias("html"),
        F.when(d % 4 == 0, F.lit(200))
        .when(d % 4 == 1, F.lit(301))
        .when(d % 4 == 2, F.lit(404))
        .otherwise(F.lit(500))
        .alias("http_status"),
        F.when(d % 2 == 0, F.lit("text/html; charset=utf-8"))
        .otherwise(F.lit("application/xhtml+xml"))
        .alias("content_type"),
    )
    parsed = warc_to_pages(pages_to_warc(pages))
    return parsed.select(
        "url",
        "warc_date",
        "http_status",
        "content_type",
        F.length("html").alias("payload_len"),
        F.col("record_id").startswith("urn:uuid:").alias("id_ok"),
    )


SQL_WARC_ROUNDTRIP = """
SELECT 'https://w' || (doc_id % 23) || '.example/d/' || doc_id AS url,
       '2026-05-1' || (doc_id % 10) || 'T12:34:5' || (doc_id % 10) || 'Z' AS warc_date,
       CASE doc_id % 4 WHEN 0 THEN 200 WHEN 1 THEN 301 WHEN 2 THEN 404 ELSE 500 END AS http_status,
       CASE WHEN doc_id % 2 = 0 THEN 'text/html; charset=utf-8'
            ELSE 'application/xhtml+xml' END AS content_type,
       octet_length(encode(text)) AS payload_len,
       TRUE AS id_ok
FROM documents
"""

QUERIES["warc_roundtrip"] = (q_warc_roundtrip, SQL_WARC_ROUNDTRIP)


def q_meta_triples(spark, sf):
    """Page-metadata extraction (sources/meta.py, opt-in 9th extraction
    branch): synthesize heads carrying <title>, OpenGraph (string + URL
    typed + whitespace-collapse case), a Twitter card, a description
    meta, a viewport meta that must NOT emit, and a rel=alternate
    hreflang link — then run the REAL mapInPandas extraction stage with
    meta=True and return (url, pred, o_kind, o_lex). The oracle
    recomputes all six expected triples per page from the synthesis
    formulas (no html parsing on the DuckDB side); the viewport row is
    absent from both sides by the _PLAIN_META allowlist."""
    from .extract import extract_triples, split_errors

    d = F.col("doc_id")
    origin = F.concat(F.lit("https://m"), (d % 13).cast("string"), F.lit(".example"))
    pages = _docs(spark, sf).select(
        F.concat(origin, F.lit("/p/"), d.cast("string")).alias("url"),
        F.encode(
            F.concat(
                F.lit("<html><head><title>Doc  "), d.cast("string"),
                F.lit('</title><meta property="og:title" content="T'),
                d.cast("string"), F.lit("  "), F.col("lang"),
                F.lit('"><meta property="og:image" content="/img/'),
                (d % 7).cast("string"),
                F.lit('.png"><meta name="twitter:card" content="'),
                F.when(d % 2 == 0, F.lit("summary")).otherwise(F.lit("summary_large_image")),
                F.lit('"><meta name="description" content="'),
                F.col("source"),
                F.lit('"><meta name="viewport" content="width=device-width">'),
                F.lit('<link rel="alternate" hreflang="'), F.col("lang"),
                F.lit('" href="/alt/'), d.cast("string"),
                F.lit('"></head><body></body></html>'),
            ),
            "utf-8",
        ).alias("html"),
    )
    triples, _errs = split_errors(extract_triples(pages, meta=True))
    return triples.select(
        F.col("src_url").alias("url"), "pred", "o_kind", "o_lex"
    )


SQL_META_TRIPLES = """
WITH d AS (
  SELECT doc_id, lang, source,
         'https://m' || (doc_id % 13) || '.example' AS origin,
         'https://m' || (doc_id % 13) || '.example/p/' || doc_id AS url
  FROM documents
)
SELECT url, 'urn:x-ords:meta:title' AS pred, 2 AS o_kind,
       'Doc ' || doc_id AS o_lex FROM d
UNION ALL
SELECT url, 'http://ogp.me/ns#title', 2, 'T' || doc_id || ' ' || lang FROM d
UNION ALL
SELECT url, 'http://ogp.me/ns#image', 0, origin || '/img/' || (doc_id % 7) || '.png' FROM d
UNION ALL
SELECT url, 'urn:x-ords:meta:twitter:card', 2,
       CASE WHEN doc_id % 2 = 0 THEN 'summary' ELSE 'summary_large_image' END FROM d
UNION ALL
SELECT url, 'urn:x-ords:meta:description', 2, source FROM d
UNION ALL
SELECT url, 'urn:x-ords:meta:alternate:' || lang, 0, origin || '/alt/' || doc_id FROM d
"""

QUERIES["meta_triples"] = (q_meta_triples, SQL_META_TRIPLES)


def q_boilerplate(spark, sf):
    """Densitometric boilerplate removal (sources/boilerplate.py):
    synthesize pages with a link-only nav (dropped: link density), the
    document text as a content paragraph (kept: long, linkless), a short
    probe paragraph that straddles the MIN_WORDS threshold by doc_id
    parity, a mixed div holding one inline link under the 1/3 density
    bound (kept), and a 4-word footer (dropped: word threshold even
    though density passes) — then run the REAL mapInPandas classifier.
    Oracle re-derives keep() per block from the synthesis formulas."""
    from .sources.boilerplate import main_text_df

    d = F.col("doc_id")
    probe = F.when(d % 2 == 0, F.lit("short note here")).otherwise(
        F.lit("a longer boilerplate threshold probe line")
    )
    pages = _docs(spark, sf).select(
        F.concat(F.lit("https://b"), (d % 11).cast("string"), F.lit(".example/p/"), d.cast("string")).alias("url"),
        F.encode(
            F.concat(
                F.lit('<html><body><nav><a href="/">home</a> <a href="/a">about</a> <a href="/b">more links</a></nav><p>'),
                F.col("text"),
                F.lit("</p><p>"), probe,
                F.lit("</p><div>tail "), d.cast("string"),
                F.lit(' with <a href="/r">a link</a> inside plus padding words</div>'),
                F.lit('<footer>copyright 2026 <a href="/t">terms</a></footer></body></html>'),
            ),
            "utf-8",
        ).alias("html"),
    )
    return main_text_df(pages)


SQL_BOILERPLATE = """
WITH d AS (
  SELECT doc_id, text,
         'https://b' || (doc_id % 11) || '.example/p/' || doc_id AS url,
         CASE WHEN doc_id % 2 = 1 THEN 'a longer boilerplate threshold probe line' END AS probe,
         'tail ' || doc_id || ' with a link inside plus padding words' AS divtext
  FROM documents
)
SELECT url,
       text || coalesce(chr(10) || probe, '') || chr(10) || divtext AS main_text,
       5 AS n_blocks,
       CASE WHEN doc_id % 2 = 1 THEN 3 ELSE 2 END AS n_kept
FROM d
"""

QUERIES["boilerplate"] = (q_boilerplate, SQL_BOILERPLATE)


def q_template_strip(spark, sf):
    """Cross-page template removal (operators/templates.py): synthesize
    7 hosts whose pages share a host-constant nav + footer (template:
    on every host page), carry the document text as a unique content
    block (kept: fp_pages == 1 except planted duplicate texts), and a
    parity banner that recurs on ~half the host's pages — exactly the
    `fp_pages * 2 >= host_pages` boundary. The oracle re-runs the WHOLE
    algorithm in SQL over the same synthesized block structure (true
    cross-engine differential, not a closed-form answer key)."""
    from .operators.templates import strip_templates

    d = F.col("doc_id")
    h = (d % 7).cast("string")
    parity = F.when(d % 2 == 0, F.concat(F.lit("even promo banner "), h)).otherwise(
        F.concat(F.lit("odd teaser note "), h)
    )
    pages = _docs(spark, sf).select(
        F.concat(F.lit("https://t"), h, F.lit(".example/p/"), d.cast("string")).alias("url"),
        F.encode(
            F.concat(
                F.lit("<html><body><nav>nav home about t"), h,
                F.lit("</nav><p>"), F.col("text"),
                F.lit("</p><div>"), parity,
                F.lit("</div><footer>footer terms t"), h,
                F.lit("</footer></body></html>"),
            ),
            "utf-8",
        ).alias("html"),
    )
    return strip_templates(pages)


SQL_TEMPLATE_STRIP = """
WITH d AS (
  SELECT doc_id, text, CAST(doc_id % 7 AS VARCHAR) AS h,
         'https://t' || (doc_id % 7) || '.example/p/' || doc_id AS url
  FROM documents
), blocks AS (
  SELECT url, h, 0 AS idx, 'nav home about t' || h AS block FROM d
  UNION ALL SELECT url, h, 1, text FROM d
  UNION ALL SELECT url, h, 2,
    CASE WHEN doc_id % 2 = 0 THEN 'even promo banner ' || h
         ELSE 'odd teaser note ' || h END FROM d
  UNION ALL SELECT url, h, 3, 'footer terms t' || h FROM d
), hp AS (
  SELECT h, COUNT(DISTINCT url) AS host_pages FROM blocks GROUP BY h
), fpc AS (
  SELECT h, block, COUNT(DISTINCT url) AS fp_pages FROM blocks GROUP BY h, block
), tmpl AS (
  SELECT fpc.h, fpc.block FROM fpc JOIN hp USING (h)
  WHERE fp_pages >= 2 AND fp_pages * 2 >= host_pages
), kept AS (
  SELECT b.* FROM blocks b
  WHERE NOT EXISTS (SELECT 1 FROM tmpl t WHERE t.h = b.h AND t.block = b.block)
)
SELECT t.url,
       coalesce(k.main_text, '') AS main_text,
       CAST(t.n_blocks AS INT) AS n_blocks,
       CAST(coalesce(k.n_kept, 0) AS INT) AS n_kept
FROM (SELECT url, COUNT(*) AS n_blocks FROM blocks GROUP BY url) t
LEFT JOIN (
  SELECT url, string_agg(block, chr(10) ORDER BY idx) AS main_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY url
) k USING (url)
"""

QUERIES["template_strip"] = (q_template_strip, SQL_TEMPLATE_STRIP)


def q_link_edit(spark, sf):
    """Edit-distance linking tier (operators/linking.py::link_edit):
    probes are nation names with the 2nd character dropped (dist 1 from
    their alias) plus the unchanged names (dist 0); the first-char +
    length-band blocking and the Levenshtein verify are mirrored exactly
    in DuckDB (same unit-cost edit distance both engines)."""
    from .operators.linking import link_edit

    nat = spark.read.parquet(f"{sf}/nation.parquet")
    typo = F.concat(F.substring("n_name", 1, 1), F.expr("substring(n_name, 3)"))
    probes = nat.select(
        F.col("n_nationkey").cast("long").alias("id"),
        typo.alias("mention"),
        F.lower(F.regexp_replace(typo, r"[^A-Za-z0-9 ]", "")).alias("norm"),
    ).unionByName(
        nat.select(
            (F.col("n_nationkey").cast("long") + 100).alias("id"),
            F.col("n_name").alias("mention"),
            F.lower(F.regexp_replace("n_name", r"[^A-Za-z0-9 ]", "")).alias("norm"),
        )
    )
    aliases = nat.select(
        F.col("n_name").alias("alias"),
        F.concat(F.lit("urn:n:"), F.col("n_nationkey")).alias("uri"),
        (F.lit(1.0) - F.col("n_nationkey") / 100.0).alias("prior"),
    )
    return link_edit(probes, aliases, max_dist=2)


SQL_LINK_EDIT = """
WITH probes AS (
  SELECT CAST(n_nationkey AS BIGINT) AS id,
         substr(n_name,1,1) || substr(n_name,3) AS mention,
         lower(regexp_replace(substr(n_name,1,1) || substr(n_name,3), '[^A-Za-z0-9 ]', '', 'g')) AS norm
  FROM nation
  UNION ALL
  SELECT CAST(n_nationkey AS BIGINT) + 100,
         n_name,
         lower(regexp_replace(n_name, '[^A-Za-z0-9 ]', '', 'g'))
  FROM nation
), ali AS (
  SELECT lower(regexp_replace(n_name, '[^A-Za-z0-9 ]', '', 'g')) AS a_norm,
         'urn:n:'||n_nationkey AS uri,
         CAST(round((1.0 - n_nationkey/100.0)*1000000) AS BIGINT) AS prior_x1e6
  FROM nation
), cand AS (
  SELECT id, mention, uri,
         CAST(levenshtein(norm, a_norm) AS INT) AS dist,
         prior_x1e6 - levenshtein(norm, a_norm)*100000 AS score_x1e6
  FROM probes JOIN ali
    ON substr(norm,1,1) = substr(a_norm,1,1)
   AND abs(length(norm) - length(a_norm)) <= 2
  WHERE levenshtein(norm, a_norm) <= 2
)
SELECT id, mention, uri, dist, score_x1e6
FROM (SELECT *, row_number() OVER (PARTITION BY id, mention
                                   ORDER BY score_x1e6 DESC, uri ASC) AS rn
      FROM cand)
WHERE rn = 1
"""

QUERIES["link_edit"] = (q_link_edit, SQL_LINK_EDIT)


def q_dict_terms(spark, sf):
    """Term-dictionary build (operators/dictenc.py): distinct terms of the
    nation graph with 60-bit md5 hash ids — the id assignment itself is
    the oracle surface (DuckDB's ('0x'||substr(md5,1,15))::BIGINT equals
    Spark's conv(...,16,10) bit-for-bit), so both engines must mint the
    SAME integer for every term."""
    from .operators.dictenc import term_dictionary

    t = triples_view(spark, sf).filter(F.col("graph") == "urn:g:nation")
    d = term_dictionary(t)
    return d.select(
        "id",
        F.col("kind").cast("int").alias("kind"),
        "lex",
        F.coalesce("dtype", F.lit("")).alias("dtype"),
        F.coalesce("lang", F.lit("")).alias("lang"),
    )


SQL_DICT_TERMS = f"""
{W},
t AS (SELECT * FROM triples WHERE graph = 'urn:g:nation'),
terms AS (
  SELECT 0 AS kind, s_lex AS lex, CAST(NULL AS VARCHAR) AS dtype, CAST(NULL AS VARCHAR) AS lang FROM t
  UNION SELECT 0, pred, NULL, NULL FROM t
  UNION SELECT 0, graph, NULL, NULL FROM t
  UNION SELECT o_kind, o_lex, o_dtype, NULL FROM t
)
SELECT ('0x' || substr(md5(CAST(kind AS VARCHAR) || chr(31) || lex || chr(31)
                           || coalesce(dtype,'') || chr(31) || coalesce(lang,'')), 1, 15))::BIGINT AS id,
       CAST(kind AS INT) AS kind, lex,
       coalesce(dtype,'') AS dtype, coalesce(lang,'') AS lang
FROM terms
"""

QUERIES["dict_terms"] = (q_dict_terms, SQL_DICT_TERMS)


def q_dict_bgp(spark, sf):
    """Id-space BGP execution + late materialization (dictenc.py): the
    6-pattern customer→nation→region join runs on 8-byte hash ids: the
    bound-predicate filter stays LEXICAL so it pushes to the parquet scan
    (a function-of-column id compare would not; a materialized id store
    gets the same pushdown from long min/max stats), every join carries
    longs, bound objects compare as constant ids, and only the two
    projected columns decode through the dictionary at the top — RDF-3X's
    layout on Spark. Oracle = the plain string-space BGP SQL: the ids
    must cancel exactly."""
    from .operators.dictenc import decode, encode_quads, iri_id, literal_id, term_dictionary
    from .types import XSD_STRING

    t = triples_view(spark, sf)

    def pat(pred_iri):
        return encode_quads(t.filter(F.col("pred") == pred_iri))

    c_type = pat(RDF_TYPE).filter(F.col("o_id") == iri_id("urn:c:Customer")).select(F.col("s_id").alias("c"))
    c_name = pat(P_NAME).select(F.col("s_id").alias("c"), F.col("o_id").alias("cname_id"))
    c_nat = pat(P_IN_NATION).select(F.col("s_id").alias("c"), F.col("o_id").alias("n"))
    n_name = pat(P_NAME).select(F.col("s_id").alias("n"), F.col("o_id").alias("nname_id"))
    n_reg = pat(P_IN_REGION).select(F.col("s_id").alias("n"), F.col("o_id").alias("r"))
    r_asia = pat(P_NAME).filter(F.col("o_id") == literal_id("ASIA", XSD_STRING)).select(F.col("s_id").alias("r"))

    res = c_type.join(c_name, "c").join(c_nat, "c").join(n_name, "n").join(n_reg, "n").join(r_asia, "r")
    dic = term_dictionary(t)
    out = decode(res.select("cname_id", "nname_id"), dic, "cname_id", "cname")
    return decode(out, dic, "nname_id", "nname").select("cname", "nname")


SQL_DICT_BGP = SQL_BGP_JOIN

QUERIES["dict_bgp"] = (q_dict_bgp, SQL_DICT_BGP)


def q_prop_table_star(spark, sf):
    """Property-table layout (operators/proptables.py): the customer
    4-predicate star (name, balance, segment, nation) collapses to one
    pred-pruned scan + one subject pivot, joined to a 1-column nation
    property table — vs 6 self-joins in bgp_join. Same relational answer,
    different physical shape; the oracle is plain SQL over the base
    tables."""
    from .operators.proptables import subject_table

    t = triples_view(spark, sf)
    cust = subject_table(
        t,
        {"cname": P_NAME, "bal": P_ACCTBAL, "seg": P_SEGMENT, "nation": P_IN_NATION},
        cls="urn:c:Customer",
    )
    nat = subject_table(t, {"nname": P_NAME}, cls="urn:c:Nation")
    return (
        cust.filter((F.col("seg") == "AUTOMOBILE") & (F.col("bal").cast("long") > 750000))
        .join(nat, cust["nation"] == nat["s"])
        .select("cname", F.col("bal").cast("long").alias("bal"), "nname")
    )


SQL_PROP_TABLE_STAR = """
SELECT c_name AS cname,
       CAST(round(c_acctbal*100) AS BIGINT) AS bal,
       n_name AS nname
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_mktsegment = 'AUTOMOBILE' AND round(c_acctbal*100) > 750000
"""

QUERIES["prop_table_star"] = (q_prop_table_star, SQL_PROP_TABLE_STAR)


def q_link_spam(spark, sf):
    """Link-farm host scoring (operators/weblinks.py::link_spam) over the
    same synthesized hyperlink corpus as link_graph: reciprocity via a
    host-graph self-semi-join + destination-concentration ppm, mirrored
    edge-for-edge in SQL."""
    from .operators.weblinks import extract_links, host_link_graph, link_spam

    return link_spam(host_link_graph(extract_links(_link_pages(spark, sf))))


SQL_LINK_SPAM = """
WITH links AS (
  SELECT 'h' || (doc_id % 37) AS sh, 'h' || (doc_id % 5) AS dh, doc_id FROM documents
  UNION ALL
  SELECT 'h' || (doc_id % 37), 'h' || ((doc_id * 11 + 5) % 37), doc_id FROM documents
), edges AS (
  SELECT sh || '.example' AS src_host, dh || '.example' AS dst_host,
         COUNT(*) AS n_links
  FROM links WHERE sh <> dh GROUP BY 1, 2
), recip AS (
  SELECT e.src_host, COUNT(*) AS recip_edges
  FROM edges e JOIN edges r
    ON e.src_host = r.dst_host AND e.dst_host = r.src_host
  GROUP BY e.src_host
), agg AS (
  SELECT src_host AS host, COUNT(*) AS out_degree,
         SUM(n_links) AS total_links, MAX(n_links) AS max_links
  FROM edges GROUP BY src_host
)
SELECT host, out_degree,
       coalesce(recip_edges, 0) AS recip_edges,
       coalesce(recip_edges, 0) * 1000000 // out_degree AS recip_ppm,
       max_links * 1000000 // total_links AS top1_ppm,
       CAST(coalesce(recip_edges, 0) * 1000000 // out_degree >= 500000
            AND out_degree >= 2 AS INT) AS spam
FROM agg LEFT JOIN recip ON agg.host = recip.src_host
"""

QUERIES["link_spam"] = (q_link_spam, SQL_LINK_SPAM)


def q_pld(spark, sf):
    """Pay-level-domain extraction (operators/urls.py::pld): synthesize
    hosts across the rule shapes — 2-level rule ('co.uk'), 1-level rule
    ('com'), deep subdomains, unlisted TLD fallback, single label — and
    mirror the longest-suffix match in DuckDB list algebra."""
    from .operators.urls import pld

    d = F.col("doc_id")
    host = (
        F.when(d % 5 == 0, F.concat(F.lit("news.brand"), (d % 9).cast("string"), F.lit(".co.uk")))
        .when(d % 5 == 1, F.concat(F.lit("shop"), (d % 9).cast("string"), F.lit(".com")))
        .when(d % 5 == 2, F.concat(F.lit("a.b.site"), (d % 9).cast("string"), F.lit(".dev")))
        .when(d % 5 == 3, F.concat(F.lit("x.unlisted"), (d % 9).cast("string"), F.lit(".zz")))
        .otherwise(F.lit("localhost"))
    )
    return (
        _docs(spark, sf)
        .select(host.alias("host"))
        .withColumn("pld", pld(F.col("host")))
        .groupBy("host", "pld")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_PLD = """
WITH d AS (
  SELECT CASE
    WHEN doc_id % 5 = 0 THEN 'news.brand' || (doc_id % 9) || '.co.uk'
    WHEN doc_id % 5 = 1 THEN 'shop' || (doc_id % 9) || '.com'
    WHEN doc_id % 5 = 2 THEN 'a.b.site' || (doc_id % 9) || '.dev'
    WHEN doc_id % 5 = 3 THEN 'x.unlisted' || (doc_id % 9) || '.zz'
    ELSE 'localhost' END AS host
  FROM documents
), p AS (
  SELECT host, string_split(host, '.') AS labels,
         list_min(list_filter(range(1, len(string_split(host,'.')) + 1),
           i -> i >= 2 AND list_contains(
             ['com','org','net','io','dev','gov','edu','info','biz',
              'example','test','co.uk','ac.uk','org.uk','gov.uk',
              'com.au','net.au','org.au','co.jp','ne.jp','or.jp',
              'com.br','com.cn','co.in','co.kr','com.mx','co.nz','com.sg'],
             array_to_string(list_slice(string_split(host,'.'), i, len(string_split(host,'.'))), '.')))) AS best
  FROM d
)
SELECT host,
       CASE WHEN best IS NOT NULL
              THEN array_to_string(list_slice(labels, best - 1, len(labels)), '.')
            WHEN len(labels) >= 2
              THEN array_to_string(list_slice(labels, len(labels) - 1, len(labels)), '.')
            ELSE host END AS pld,
       COUNT(*) AS n
FROM p GROUP BY 1, 2
"""

QUERIES["pld"] = (q_pld, SQL_PLD)


def q_mf2_triples(spark, sf):
    """Microformats2 extraction (sources/mf2.py, opt-in branch):
    synthesize h-card pages — p-name span (whitespace collapse), u-url
    relative link (base resolution), dt-bday time@datetime, a nested
    p-author h-card whose own p-name must NOT leak to the parent — and
    run the REAL mapInPandas stage with mf2=True. Returned as
    (url, pred, o_kind, o_lex) with bnode lexicals projected away (the
    item ids are per-page-deterministic but sha1-opaque); the nested
    author edge is counted via o_kind=1 rows instead. Oracle recomputes
    every row from the synthesis formulas."""
    from .extract import extract_triples, split_errors

    d = F.col("doc_id")
    origin = F.concat(F.lit("https://f"), (d % 13).cast("string"), F.lit(".example"))
    pages = _docs(spark, sf).select(
        F.concat(origin, F.lit("/p/"), d.cast("string")).alias("url"),
        F.encode(
            F.concat(
                F.lit('<html><body><div class="h-card"><span class="p-name">Card  '),
                d.cast("string"),
                F.lit('</span><a class="u-url" href="/c/'), d.cast("string"),
                F.lit('">me</a><time class="dt-bday" datetime="19'),
                F.lpad((d % 90).cast("string"), 2, "0"),
                F.lit('-01-02">bday</time><div class="p-author h-card"><b class="p-name">'),
                F.col("source"),
                F.lit("</b></div></div></body></html>"),
            ),
            "utf-8",
        ).alias("html"),
    )
    triples, _errs = split_errors(extract_triples(pages, mf2=True))
    return triples.select(
        F.col("src_url").alias("url"),
        "pred",
        F.col("o_kind").cast("int").alias("o_kind"),
        F.when(F.col("o_kind") == 1, F.lit("")).otherwise(F.col("o_lex")).alias("o_lex"),
    )


SQL_MF2_TRIPLES = """
WITH d AS (
  SELECT doc_id, source,
         'https://f' || (doc_id % 13) || '.example' AS origin,
         'https://f' || (doc_id % 13) || '.example/p/' || doc_id AS url
  FROM documents
)
SELECT url, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS pred,
       0 AS o_kind, 'urn:mf2:h-card' AS o_lex FROM d
UNION ALL
SELECT url, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 0, 'urn:mf2:h-card' FROM d
UNION ALL
SELECT url, 'urn:mf2:p:name', 2, 'Card ' || doc_id FROM d
UNION ALL
SELECT url, 'urn:mf2:p:url', 0, origin || '/c/' || doc_id FROM d
UNION ALL
SELECT url, 'urn:mf2:p:bday', 2, '19' || lpad(CAST(doc_id % 90 AS VARCHAR), 2, '0') || '-01-02' FROM d
UNION ALL
SELECT url, 'urn:mf2:p:author', 1, '' FROM d
UNION ALL
SELECT url, 'urn:mf2:p:name', 2, source FROM d
"""

QUERIES["mf2_triples"] = (q_mf2_triples, SQL_MF2_TRIPLES)


def q_bpe_train(spark, sf):
    """Iterative BPE tokenizer training (textops.bpe_train): the ordered
    merge table, 8 rounds over the corpus's word-frequency table.
    Rows-only by design: the per-round argmax loop is not
    SQL-expressible (like extract_corpus); correctness is pinned by the
    pure-Python reference differential in tests/test_bpe_train.py."""
    from .operators.textops import bpe_train

    return bpe_train(_docs(spark, sf), n_merges=8)


QUERIES["bpe_train"] = (q_bpe_train, None)


def q_bitext_align(spark, sf):
    """Margin-criterion cross-set alignment (operators/ann.py::
    bitext_margin, the CCMatrix/LASER bitext-mining scorer): even
    vec_ids as the source set, odd as the target, k=4 neighborhoods,
    ratio margin >= 1.0 in exact ppm integers. Exact tier over a
    bounded slice (the documented near_dup_pairs bound); the LSH bucket
    join is the production candidate generator."""
    from .operators.ann import bitext_margin

    e = _embs(spark, sf).filter(F.col("vec_id") < 120)
    return bitext_margin(
        e.filter(F.col("vec_id") % 2 == 0),
        e.filter(F.col("vec_id") % 2 == 1),
        k=4,
        margin_ppm_threshold=1000000,
    )


SQL_BITEXT_ALIGN = """
WITH src AS (
  SELECT vec_id AS src_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 120
), dst AS (
  SELECT vec_id AS dst_id, CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings WHERE vec_id % 2 = 1 AND vec_id < 120
), pairs AS (
  SELECT src_id, dst_id,
         CAST(round(list_cosine_similarity(src.e, dst.e) * 100000000) AS BIGINT) AS sim_x1e8
  FROM src, dst
), ks AS (
  SELECT src_id, SUM(sim_x1e8) AS sumk_src
  FROM (SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY sim_x1e8 DESC, dst_id ASC) AS rn FROM pairs)
  WHERE rn <= 4 GROUP BY src_id
), kd AS (
  SELECT dst_id, SUM(sim_x1e8) AS sumk_dst
  FROM (SELECT *, row_number() OVER (PARTITION BY dst_id ORDER BY sim_x1e8 DESC, src_id ASC) AS rn FROM pairs)
  WHERE rn <= 4 GROUP BY dst_id
), scored AS (
  SELECT p.src_id, p.dst_id, p.sim_x1e8,
         CASE WHEN sumk_src + sumk_dst = 0 THEN NULL
              ELSE CAST(2 * 4 * sim_x1e8 * 1000000 AS BIGINT)
                   // CAST(sumk_src + sumk_dst AS BIGINT) END AS margin_ppm
  FROM pairs p JOIN ks USING (src_id) JOIN kd USING (dst_id)
)
SELECT src_id, dst_id, sim_x1e8, margin_ppm
FROM (SELECT *, row_number() OVER (PARTITION BY src_id
        ORDER BY margin_ppm DESC, sim_x1e8 DESC, dst_id ASC) AS rn FROM scored)
WHERE rn = 1 AND margin_ppm >= 1000000
"""

QUERIES["bitext_align"] = (q_bitext_align, SQL_BITEXT_ALIGN)


def q_hreflang_clusters(spark, sf):
    """Translation-cluster mining (operators/weblinks.py::hreflang_edges
    + hreflang_clusters): groups of 3 docs share a cluster (en/fr always,
    de only for even groups), every 5th group's pages mis-annotate a
    bridge to the previous group's en page (merging the two clusters —
    the real-web CMS-misconfiguration case), CC over the symmetrized
    URL graph. Oracle is the closed form of the synthesis — no
    recursion needed on the DuckDB side."""
    from .operators.weblinks import hreflang_clusters, hreflang_edges

    d = F.col("doc_id")
    g = (d - d % 3) / F.lit(3)
    g = g.cast("long")
    r = d % 3
    lang = F.when(r == 0, "en").when(r == 1, "fr").otherwise("de")

    def _u(gc, lc):
        return F.concat(
            F.lit("https://h"), (gc % 37).cast("string"), F.lit(".example/c/"),
            gc.cast("string"), F.lit("/"), lc,
        )

    def _tag(lc, href):
        return F.concat(
            F.lit('<link rel="alternate" hreflang="'), lc, F.lit('" href="'), href, F.lit('">')
        )

    pages = (
        _docs(spark, sf)
        .filter(~((r == 2) & (g % 2 == 1)))
        .select(
            _u(g, lang).alias("url"),
            F.concat(
                _tag(F.lit("en"), _u(g, F.lit("en"))),
                _tag(F.lit("fr"), _u(g, F.lit("fr"))),
                F.when(g % 2 == 0, _tag(F.lit("de"), _u(g, F.lit("de")))).otherwise(F.lit("")),
                F.when(
                    (g % 5 == 0) & (g > 0), _tag(F.lit("en"), _u(g - 1, F.lit("en")))
                ).otherwise(F.lit("")),
            ).alias("html"),
        )
    )
    return hreflang_clusters(hreflang_edges(pages))


SQL_HREFLANG_CLUSTERS = """
WITH grp AS (SELECT DISTINCT doc_id // 3 AS g FROM documents),
m AS (SELECT g, CASE WHEN g % 5 = 0 AND g > 0 THEN g - 1 ELSE g END AS a FROM grp),
nodes AS (
  SELECT a, 'https://h' || (g % 37) || '.example/c/' || g || '/en' AS url, 'en' AS lang FROM m
  UNION ALL
  SELECT a, 'https://h' || (g % 37) || '.example/c/' || g || '/fr', 'fr' FROM m
  UNION ALL
  SELECT a, 'https://h' || (g % 37) || '.example/c/' || g || '/de', 'de' FROM m WHERE g % 2 = 0
)
SELECT MIN(url) AS cluster_id,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_pages,
       array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs
FROM nodes GROUP BY a
"""

QUERIES["hreflang_clusters"] = (q_hreflang_clusters, SQL_HREFLANG_CLUSTERS)


def q_feed_items(spark, sf):
    """Feed-item extraction (operators/weblinks.py::parse_feeds): even
    docs publish RSS 2.0 (two items, the second link-less — dropped per
    the documented subset), odd docs publish Atom (two entries). Oracle
    computes the expected items from the synthesis formulas — no XML on
    the DuckDB side (the sitemap_parse pattern)."""
    from .operators.weblinks import parse_feeds

    d = F.col("doc_id")
    h = (d % 37).cast("string")
    rss = F.concat(
        F.lit("<rss><channel><item><title>post "), d.cast("string"),
        F.lit("-0</title><link>https://h"), h, F.lit(".example/p/"), (d * 2).cast("string"),
        F.lit("</link><pubDate>ts"), d.cast("string"),
        F.lit("</pubDate></item><item><title>draft "), d.cast("string"),
        F.lit("</title><pubDate>tsx</pubDate></item></channel></rss>"),
    )
    atom = F.concat(
        F.lit("<feed><entry><title>a "), d.cast("string"),
        F.lit('-0</title><link href="https://h'), h, F.lit(".example/p/"), (d * 2).cast("string"),
        F.lit('"/><updated>u'), d.cast("string"),
        F.lit("</updated></entry><entry><title>a "), d.cast("string"),
        F.lit('-1</title><link href="https://h'), h, F.lit(".example/p/"),
        (d * 2 + 1).cast("string"), F.lit('"/><updated>u'), d.cast("string"),
        F.lit("</updated></entry></feed>"),
    )
    feeds = _docs(spark, sf).select(
        F.concat(F.lit("https://h"), h, F.lit(".example/feed")).alias("feed_url"),
        F.when(d % 2 == 0, rss).otherwise(atom).alias("xml"),
        "doc_id",
    )
    return parse_feeds(feeds)


SQL_FEED_ITEMS = """
WITH rss AS (
  SELECT 'https://h' || (doc_id % 37) || '.example/feed' AS feed_url,
         'post ' || doc_id || '-0' AS title,
         'https://h' || (doc_id % 37) || '.example/p/' || (doc_id * 2) AS item_url,
         'ts' || doc_id AS ts_raw
  FROM documents WHERE doc_id % 2 = 0
), atom AS (
  SELECT 'https://h' || (doc_id % 37) || '.example/feed',
         'a ' || doc_id || '-' || i,
         'https://h' || (doc_id % 37) || '.example/p/' || (doc_id * 2 + i),
         'u' || doc_id
  FROM documents, (SELECT UNNEST([0, 1]) AS i) WHERE doc_id % 2 = 1
)
SELECT * FROM rss UNION ALL SELECT * FROM atom
"""

QUERIES["feed_items"] = (q_feed_items, SQL_FEED_ITEMS)


def q_readability(spark, sf):
    """Flesch-Kincaid integer-ppm readability over the documents table
    (operators/textops.py::readability). Both engines run the same
    sentence/word/vowel-group regexes, so counts AND the composed grade
    are exact across engines."""
    from .operators.textops import readability

    return readability(_docs(spark, sf))


SQL_READABILITY = """
WITH t AS (
  SELECT doc_id,
         GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
         regexp_extract_all(lower(text), '[^ \t\n]+') AS toks
  FROM documents
), c AS (
  SELECT doc_id, n_sentences,
         GREATEST(len(toks), 1) AS n_words,
         COALESCE(list_sum(list_transform(toks,
             tok -> GREATEST(len(regexp_extract_all(tok, '[aeiouy]+')), 1))), 0) AS n_syllables
  FROM t
)
SELECT doc_id,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       CAST(390000 * n_words AS BIGINT) // CAST(n_sentences AS BIGINT)
         + CAST(11800000 * n_syllables AS BIGINT) // CAST(n_words AS BIGINT)
         - 15590000 AS fk_grade_ppm
FROM c
"""

QUERIES["readability"] = (q_readability, SQL_READABILITY)


def q_url_templates(spark, sf):
    """URL path-template mining (operators/urls.py::url_path_templates):
    per doc an enumerable series URL (/p/{d}), an /about singleton, a
    nested series for even docs, and a hex-id URL for every 10th doc —
    top-3 templates per host with count-desc/template-asc ranking."""
    from .operators.urls import url_path_templates

    d = F.col("doc_id")
    h = F.concat(F.lit("https://h"), (d % 13).cast("string"), F.lit(".example"))
    docs = _docs(spark, sf)
    urls = (
        docs.select(F.concat(h, F.lit("/p/"), d.cast("string")).alias("url"))
        .unionAll(docs.select(F.concat(h, F.lit("/about")).alias("url")))
        .unionAll(
            docs.filter(d % 2 == 0).select(
                F.concat(
                    h, F.lit("/cat/"), (d % 7).cast("string"), F.lit("/item/"), d.cast("string")
                ).alias("url")
            )
        )
        .unionAll(
            docs.filter(d % 10 == 0).select(F.concat(h, F.lit("/s/deadbeefcafe")).alias("url"))
        )
    )
    return url_path_templates(urls, k=3)


SQL_URL_TEMPLATES = """
WITH urls AS (
  SELECT 'h' || (doc_id % 13) || '.example' AS host, '/p/{n}' AS template FROM documents
  UNION ALL
  SELECT 'h' || (doc_id % 13) || '.example', '/about' FROM documents
  UNION ALL
  SELECT 'h' || (doc_id % 13) || '.example', '/cat/{n}/item/{n}' FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'h' || (doc_id % 13) || '.example', '/s/{x}' FROM documents WHERE doc_id % 10 = 0
),
cells AS (
  SELECT host, template, CAST(COUNT(*) AS BIGINT) AS n_urls FROM urls GROUP BY 1, 2
)
SELECT host, template, n_urls, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY host ORDER BY n_urls DESC, template ASC) AS rank
  FROM cells
) WHERE rank <= 3
"""

QUERIES["url_templates"] = (q_url_templates, SQL_URL_TEMPLATES)


def q_cocitation(spark, sf):
    """Related-host discovery by co-citation (operators/weblinks.py::
    cocitation) over the same synthetic link corpus as link_graph:
    out-degree-capped per-source destination sets, ordered pair counts,
    global top-10."""
    from .operators.weblinks import cocitation, extract_links, host_link_graph

    return cocitation(
        host_link_graph(extract_links(_link_pages(spark, sf))), max_out=8, min_cocites=2, k=10
    )


SQL_COCITATION = """
WITH links AS (
  SELECT 'h' || (doc_id % 37) AS sh, 'h' || (doc_id % 5) AS dh FROM documents
  UNION ALL
  SELECT 'h' || (doc_id % 37), 'h' || ((doc_id * 11 + 5) % 37) FROM documents
),
edges AS (
  SELECT sh || '.example' AS src_host, dh || '.example' AS dst_host, COUNT(*) AS n_links
  FROM links WHERE sh <> dh GROUP BY 1, 2
),
capped AS (
  SELECT src_host, dst_host FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY src_host
        ORDER BY n_links DESC, dst_host ASC) AS rn FROM edges
  ) WHERE rn <= 8
),
pairs AS (
  SELECT a.dst_host AS h1, b.dst_host AS h2, CAST(COUNT(DISTINCT a.src_host) AS BIGINT) AS n_cocites
  FROM capped a JOIN capped b ON a.src_host = b.src_host AND a.dst_host < b.dst_host
  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.src_host) >= 2
)
SELECT h1, h2, n_cocites FROM pairs
ORDER BY n_cocites DESC, h1 ASC, h2 ASC LIMIT 10
"""

QUERIES["cocitation"] = (q_cocitation, SQL_COCITATION)


# ---------------------------------------------------------------------------
# KG mining & repair family (operators/kgmine.py): AMIE-lite rule mining,
# cannot-link constrained canonicalization, context disambiguation — plus
# robust numeric fusion (operators/fusion.py) and spam mass (weblinks.py)
# ---------------------------------------------------------------------------


def _rule_triples(spark, sf):
    """Deterministic triple store with planted horn rules: every customer
    is inNation, every nation inRegion; custRegion holds for even
    custkeys (⇒ path-rule confidence ≈ 50%), suppRegion for suppkey % 4
    = 0 (≈ 25%), and likesNation ⊂ inNation on custkey % 3 = 0 (same-
    pair rule at 100% one way, ≈ 33% the other)."""
    cu = spark.read.parquet(f"{sf}/customer.parquet")
    su = spark.read.parquet(f"{sf}/supplier.parquet")
    na = spark.read.parquet(f"{sf}/nation.parquet")
    c_nat = cu.select(
        F.lit("inNation").alias("p"),
        F.concat(F.lit("c:"), "c_custkey").alias("s"),
        F.concat(F.lit("n:"), "c_nationkey").alias("o"),
    )
    s_nat = su.select(
        F.lit("suppNation").alias("p"),
        F.concat(F.lit("s:"), "s_suppkey").alias("s"),
        F.concat(F.lit("n:"), "s_nationkey").alias("o"),
    )
    n_reg = na.select(
        F.lit("inRegion").alias("p"),
        F.concat(F.lit("n:"), "n_nationkey").alias("s"),
        F.concat(F.lit("r:"), "n_regionkey").alias("o"),
    )
    c_reg = (
        cu.filter(F.col("c_custkey") % 2 == 0)
        .join(na, cu["c_nationkey"] == na["n_nationkey"])
        .select(
            F.lit("custRegion").alias("p"),
            F.concat(F.lit("c:"), "c_custkey").alias("s"),
            F.concat(F.lit("r:"), "n_regionkey").alias("o"),
        )
    )
    s_reg = (
        su.filter(F.col("s_suppkey") % 4 == 0)
        .join(na, su["s_nationkey"] == na["n_nationkey"])
        .select(
            F.lit("suppRegion").alias("p"),
            F.concat(F.lit("s:"), "s_suppkey").alias("s"),
            F.concat(F.lit("r:"), "n_regionkey").alias("o"),
        )
    )
    likes = cu.filter(F.col("c_custkey") % 3 == 0).select(
        F.lit("likesNation").alias("p"),
        F.concat(F.lit("c:"), "c_custkey").alias("s"),
        F.concat(F.lit("n:"), "c_nationkey").alias("o"),
    )
    return c_nat.unionByName(s_nat).unionByName(n_reg).unionByName(c_reg).unionByName(s_reg).unionByName(likes)


def q_rule_mine(spark, sf):
    """AMIE-lite horn-rule mining over the planted-rule store: same-pair
    rules p(x,y)⇒q(x,y) and path rules p(x,z)∧q(z,y)⇒r(x,y) with exact
    integer support / ppm confidence, unioned under one schema (kind,
    body_p, body_q, head_p, body_n, support, conf_ppm); low-confidence
    noise rules (< 5%) are cut to keep the report rule-shaped."""
    from .operators.kgmine import mine_path_rules, mine_same_pair_rules

    t = _rule_triples(spark, sf)
    same = mine_same_pair_rules(t, min_body=2).select(
        F.lit("same").alias("kind"),
        "body_p",
        F.lit("").alias("body_q"),
        "head_p",
        "body_n",
        "support",
        "conf_ppm",
    )
    path = mine_path_rules(t, min_body=2, min_support=1).select(
        F.lit("path").alias("kind"), "body_p", "body_q", "head_p", "body_n", "support", "conf_ppm"
    )
    return same.unionByName(path).filter(F.col("conf_ppm") >= 50000)


SQL_RULE_MINE = """
WITH t AS (
  SELECT 'inNation' AS p, 'c:'||c_custkey AS s, 'n:'||c_nationkey AS o FROM customer
  UNION ALL SELECT 'suppNation', 's:'||s_suppkey, 'n:'||s_nationkey FROM supplier
  UNION ALL SELECT 'inRegion', 'n:'||n_nationkey, 'r:'||n_regionkey FROM nation
  UNION ALL SELECT 'custRegion', 'c:'||c_custkey, 'r:'||n_regionkey
    FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_custkey % 2 = 0
  UNION ALL SELECT 'suppRegion', 's:'||s_suppkey, 'r:'||n_regionkey
    FROM supplier JOIN nation ON s_nationkey = n_nationkey WHERE s_suppkey % 4 = 0
  UNION ALL SELECT 'likesNation', 'c:'||c_custkey, 'n:'||c_nationkey FROM customer WHERE c_custkey % 3 = 0
),
pairs AS (SELECT DISTINCT p, s, o FROM t),
cnt AS (SELECT p, COUNT(*) AS body_n FROM pairs GROUP BY p),
keep AS (SELECT p, body_n FROM cnt WHERE body_n >= 2),
pk AS (SELECT pairs.* FROM pairs JOIN keep USING (p)),
same AS (
  SELECT 'same' AS kind, a.p AS body_p, '' AS body_q, b.p AS head_p,
         k.body_n, CAST(COUNT(*) AS BIGINT) AS support,
         CAST(COUNT(*) AS BIGINT) * 1000000 // k.body_n AS conf_ppm
  FROM pk a JOIN pairs b ON a.s = b.s AND a.o = b.o AND a.p <> b.p
  JOIN keep k ON k.p = a.p
  GROUP BY a.p, b.p, k.body_n
),
body AS (
  SELECT DISTINCT a.p AS body_p, b.p AS body_q, a.s AS x, b.o AS y
  FROM pk a JOIN pk b ON a.o = b.s
),
bn AS (SELECT body_p, body_q, CAST(COUNT(*) AS BIGINT) AS body_n FROM body GROUP BY 1, 2),
sup AS (
  SELECT body_p, body_q, h.p AS head_p, CAST(COUNT(*) AS BIGINT) AS support
  FROM body JOIN pairs h ON body.x = h.s AND body.y = h.o
  GROUP BY 1, 2, 3
),
path AS (
  SELECT 'path' AS kind, sup.body_p, sup.body_q, head_p, bn.body_n, support,
         support * 1000000 // bn.body_n AS conf_ppm
  FROM sup JOIN bn USING (body_p, body_q)
)
SELECT * FROM same WHERE conf_ppm >= 50000
UNION ALL SELECT * FROM path WHERE conf_ppm >= 50000
"""

QUERIES["rule_mine"] = (q_rule_mine, SQL_RULE_MINE)


def q_cc_constrained(spark, sf):
    """Cannot-link constrained canonicalization: per-nation custkey
    chains (segments MIXED within a chain), strong id = mktsegment on
    4/5 of the nodes (custkey % 5 = 0 carries none). Edges joining two
    different non-null segments are cut; the surviving islands are the
    components. Ground truth is a gaps-and-islands window computation."""
    from pyspark.sql.window import Window

    from .operators.kgmine import constrained_components

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    r = cu.select(
        F.concat(F.lit("urn:cu:"), "c_custkey").alias("node"),
        "c_nationkey",
        F.when(F.col("c_custkey") % 5 != 0, F.col("c_mktsegment")).alias("sid"),
        F.row_number().over(Window.partitionBy("c_nationkey").orderBy("c_custkey")).alias("rn"),
    )
    nxt = r.select("c_nationkey", (F.col("rn") - 1).alias("rn"), F.col("node").alias("dst"))
    edges = r.join(nxt, ["c_nationkey", "rn"]).select(F.col("node").alias("src"), "dst")
    ids = r.select("node", "sid")
    mapping = constrained_components(edges, ids)
    return mapping.groupBy("component").agg(F.count(F.lit(1)).cast("long").alias("csize")).select(
        F.col("component").alias("canon"), "csize"
    )


SQL_CC_CONSTRAINED = """
WITH r AS (
  SELECT c_custkey AS k, c_nationkey AS n,
         CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS sid,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
  FROM customer
),
f AS (
  SELECT k, n, rn, sid,
         CASE WHEN LAG(sid) OVER w IS NOT NULL AND sid IS NOT NULL
               AND LAG(sid) OVER w <> sid THEN 1 ELSE 0 END AS cut
  FROM r WINDOW w AS (PARTITION BY n ORDER BY rn)
),
isl AS (SELECT k, n, SUM(cut) OVER (PARTITION BY n ORDER BY rn) AS island FROM f)
SELECT MIN('urn:cu:'||k) AS canon, CAST(COUNT(*) AS BIGINT) AS csize
FROM isl GROUP BY n, island HAVING COUNT(*) >= 2
"""

QUERIES["cc_constrained"] = (q_cc_constrained, SQL_CC_CONSTRAINED)


def q_disambiguate(spark, sf):
    """Context disambiguation over the embeddings table: candidates are
    vec_id < 50 (alias = 'ent'||id%10, 5 per alias, priors descending in
    id), mentions are vec_id ≥ 50 with their own vector as context;
    winner = argmax prior×⟨ctx,emb⟩, reported as a rounded integer
    score (the raw double is bit-identical cross-engine; rounding makes
    it hash-stable)."""
    from .operators.kgmine import disambiguate_mentions

    e = _embs(spark, sf)
    cands = e.filter(F.col("vec_id") < 50).select(
        F.concat(F.lit("ent"), (F.col("vec_id") % 10).cast("string")).alias("alias"),
        F.concat(F.lit("urn:e:"), "vec_id").alias("uri"),
        (F.lit(1000000) - F.col("vec_id") * 1000).cast("long").alias("prior_ppm"),
        F.col("embedding").alias("emb"),
    )
    mens = e.filter(F.col("vec_id") >= 50).select(
        F.col("vec_id").alias("mention_id"),
        F.concat(F.lit("ent"), (F.col("vec_id") % 10).cast("string")).alias("alias"),
        F.col("embedding").alias("context"),
    )
    out = disambiguate_mentions(mens, cands)
    return out.select("mention_id", "uri", F.round("score").cast("long").alias("score_x"))


SQL_DISAMBIGUATE = """
WITH cand AS (
  SELECT 'ent'||(vec_id % 10) AS alias, 'urn:e:'||vec_id AS uri,
         CAST(1000000 - vec_id * 1000 AS BIGINT) AS prior,
         CAST(embedding AS DOUBLE[]) AS emb
  FROM embeddings WHERE vec_id < 50
),
men AS (
  SELECT vec_id AS mention_id, 'ent'||(vec_id % 10) AS alias,
         CAST(embedding AS DOUBLE[]) AS ctx
  FROM embeddings WHERE vec_id >= 50
),
scored AS (
  SELECT mention_id, uri, prior * list_dot_product(ctx, emb) AS score
  FROM men JOIN cand USING (alias)
)
SELECT mention_id, uri, CAST(round(score) AS BIGINT) AS score_x FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY mention_id ORDER BY score DESC, uri ASC) AS rn
  FROM scored
) WHERE rn = 1
"""

QUERIES["disambiguate"] = (q_disambiguate, SQL_DISAMBIGUATE)


def q_fuse_numeric(spark, sf):
    """Hampel-filter numeric fusion: per-order quantity claims from each
    supplier on the order, median/MAD outlier rejection (k=3) in doubled
    integer space, survivor mean ×100 via integer div."""
    from .operators.fusion import fuse_numeric

    li = spark.read.parquet(f"{sf}/lineitem.parquet").filter(F.col("l_orderkey") % 7 == 0)
    claims = li.select(
        F.concat(F.lit("o:"), "l_orderkey").alias("s"),
        F.lit("qty").alias("p"),
        F.concat(F.lit("s:"), "l_suppkey").alias("src"),
        F.col("l_quantity").cast("long").alias("val"),
    )
    return fuse_numeric(claims, k_num=3)


SQL_FUSE_NUMERIC = """
WITH c AS (
  SELECT DISTINCT 'o:'||l_orderkey AS s, 'qty' AS p, 's:'||l_suppkey AS src,
         CAST(l_quantity AS BIGINT) AS val
  FROM lineitem WHERE l_orderkey % 7 = 0
),
med AS (SELECT s, p, CAST(2 * median(val) AS BIGINT) AS m2 FROM c GROUP BY s, p),
d AS (SELECT c.*, ABS(val * 2 - m2) AS d FROM c JOIN med USING (s, p)),
mad AS (SELECT s, p, CAST(2 * median(d) AS BIGINT) AS d2 FROM d GROUP BY s, p),
k AS (SELECT d.*, CASE WHEN d.d * 2 <= 3 * mad.d2 THEN 1 ELSE 0 END AS keep
      FROM d JOIN mad USING (s, p))
SELECT s, p, CAST(COUNT(*) AS BIGINT) AS n_claims, CAST(SUM(keep) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN keep = 1 THEN val * 100 ELSE 0 END) // SUM(keep) AS BIGINT) AS fused_x100
FROM k GROUP BY s, p
"""

QUERIES["fuse_numeric"] = (q_fuse_numeric, SQL_FUSE_NUMERIC)


def q_spam_mass(spark, sf):
    """Spam mass over the extracted host link graph: trusted seeds are
    the five hub hosts (h0–h4.example); every host's global PageRank
    share is compared with its trust-personalized share. Hubs score
    spam_ppm = 0-ish; hosts reachable only through the long tail
    approach 1e6. Both PR runs are the integer-exact 3-iteration kernel,
    so the whole report is bit-comparable to the unrolled SQL mirror."""
    from .operators.weblinks import extract_links, host_link_graph, spam_mass

    hg = host_link_graph(extract_links(_link_pages(spark, sf)))
    trusted = spark.range(5).select(F.concat(F.lit("h"), "id", F.lit(".example")).alias("host"))
    return spam_mass(hg, trusted, iters=3)


def _spam_mass_sql(iters: int = 3) -> str:
    head = """
WITH links AS (
  SELECT 'h' || (doc_id % 37) AS sh, 'h' || (doc_id % 5) AS dh FROM documents
  UNION ALL
  SELECT 'h' || (doc_id % 37), 'h' || ((doc_id * 11 + 5) % 37) FROM documents
),
edges AS (
  SELECT DISTINCT sh || '.example' AS src, dh || '.example' AS dst FROM links WHERE sh <> dh
),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
deg AS (SELECT src, COUNT(*) AS odeg FROM edges GROUP BY src),
seeds AS (SELECT 'h' || i || '.example' AS node FROM range(5) t(i)),
spine AS (SELECT n.node, CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS is_seed
          FROM nodes n LEFT JOIN seeds s USING (node)),
p0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
t0 AS (SELECT node, CAST(is_seed * 1000000 AS BIGINT) AS rank FROM spine)"""
    parts = [head]
    for i in range(1, iters + 1):
        for src, dst in [("p", "p"), ("t", "t")]:
            base = "150000" if src == "p" else "sp.is_seed * 150000"
            parts.append(f""",
{src}c{i} AS (SELECT e.dst AS node, SUM(r.rank // d.odeg) AS s
        FROM edges e JOIN {src}{i-1} r ON e.src = r.node JOIN deg d ON d.src = e.src GROUP BY e.dst),
{dst}{i} AS (SELECT sp.node, CAST({base} + 85 * COALESCE(c.s, 0) // 100 AS BIGINT) AS rank
        FROM spine sp LEFT JOIN {src}c{i} c USING (node))""")
    parts.append(f""",
prs AS (SELECT node, rank, rank * 1000000000 // (SELECT SUM(rank) FROM p{iters}) AS rank_ppb FROM p{iters}),
trs AS (SELECT node, rank AS trust, rank * 1000000000 // (SELECT SUM(rank) FROM t{iters}) AS trust_ppb FROM t{iters})
SELECT prs.node AS host, prs.rank, trs.trust,
       CAST(1000000 - LEAST(CAST(1000000 AS BIGINT),
            CASE WHEN rank_ppb = 0 THEN CAST(1000000 AS BIGINT)
                 ELSE trust_ppb * 1000000 // rank_ppb END) AS BIGINT) AS spam_ppm
FROM prs JOIN trs USING (node)""")
    return "".join(parts)


QUERIES["spam_mass"] = (q_spam_mass, _spam_mass_sql(3))


# ---------------------------------------------------------------------------
# incremental canonicalization, ER evaluation, shape induction, temporal
# interval algebra (operators/cc.py, linking.py, shacl.py, temporal.py)
# ---------------------------------------------------------------------------


def q_cc_incremental(spark, sf):
    """Incremental CC: batch 1 = the (nation, segment) chain components;
    the new batch links every segment chain's min custkey to the
    nation-wide min custkey, but ONLY for even nations — so even
    nations collapse to one nation-wide component while odd nations
    keep their (nation, segment) clusters untouched (and provably skip
    the fixpoint: only touched components re-enter it). Ground truth is
    closed-form from the construction."""
    from pyspark.sql.window import Window

    from .operators.cc import connected_components, incremental_components

    mapping = connected_components(_cc_edges(spark, sf))
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    segmin = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.min("c_custkey").alias("sk")
    )
    natmin = cust.groupBy("c_nationkey").agg(F.min("c_custkey").alias("nk"))
    new_edges = (
        segmin.join(natmin, "c_nationkey")
        .filter(F.col("c_nationkey") % 2 == 0)
        .select(
            F.concat(F.lit("0|urn:cu:"), "sk").alias("src"),
            F.concat(F.lit("0|urn:cu:"), "nk").alias("dst"),
        )
    )
    out = incremental_components(mapping, new_edges)
    return (
        out.groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("csize"))
        .select(F.regexp_replace("component", r"^0\|", "").alias("canon"), "csize")
    )


SQL_CC_INCREMENTAL = """
WITH odd AS (
  SELECT MIN('urn:cu:'||c_custkey) AS canon, CAST(COUNT(*) AS BIGINT) AS csize
  FROM customer WHERE c_nationkey % 2 = 1
  GROUP BY c_nationkey, c_mktsegment HAVING COUNT(*) >= 2
),
even AS (
  SELECT MIN('urn:cu:'||c_custkey) AS canon, CAST(COUNT(*) AS BIGINT) AS csize
  FROM customer WHERE c_nationkey % 2 = 0
  GROUP BY c_nationkey HAVING COUNT(*) >= 2
)
SELECT * FROM odd UNION ALL SELECT * FROM even
"""

QUERIES["cc_incremental"] = (q_cc_incremental, SQL_CC_INCREMENTAL)


def q_er_metrics(spark, sf):
    """Pairwise ER evaluation: predicted clusters = gold nation clusters
    with every 50th customer exiled to a per-segment error cluster;
    pairwise P/R/F1 in exact ppm against the nation gold, computed from
    contingency-cell combinatorics (no pair materialization)."""
    from .operators.linking import er_pair_metrics

    cust = spark.read.parquet(f"{sf}/customer.parquet")
    gold = cust.select(
        F.concat(F.lit("urn:cu:"), "c_custkey").alias("node"),
        F.concat(F.lit("n"), "c_nationkey").alias("cluster"),
    )
    pred = cust.select(
        F.concat(F.lit("urn:cu:"), "c_custkey").alias("node"),
        F.when(
            F.col("c_custkey") % 50 == 0, F.concat(F.lit("x"), "c_mktsegment")
        ).otherwise(F.concat(F.lit("n"), "c_nationkey")).alias("cluster"),
    )
    return er_pair_metrics(pred, gold)


SQL_ER_METRICS = """
WITH j AS (
  SELECT 'urn:cu:'||c_custkey AS node,
         CASE WHEN c_custkey % 50 = 0 THEN 'x'||c_mktsegment ELSE 'n'||c_nationkey END AS pc,
         'n'||c_nationkey AS gc
  FROM customer
),
tp AS (SELECT COALESCE(SUM(n*(n-1)//2), 0) AS tp_pairs
       FROM (SELECT COUNT(*) AS n FROM j GROUP BY pc, gc)),
pp AS (SELECT COALESCE(SUM(n*(n-1)//2), 0) AS pred_pairs
       FROM (SELECT COUNT(*) AS n FROM j GROUP BY pc)),
gp AS (SELECT COALESCE(SUM(n*(n-1)//2), 0) AS gold_pairs
       FROM (SELECT COUNT(*) AS n FROM j GROUP BY gc))
SELECT CAST(tp_pairs AS BIGINT) AS tp_pairs, CAST(pred_pairs AS BIGINT) AS pred_pairs,
       CAST(gold_pairs AS BIGINT) AS gold_pairs,
       CAST(CASE WHEN pred_pairs = 0 THEN 0 ELSE tp_pairs * 1000000 // pred_pairs END AS BIGINT) AS precision_ppm,
       CAST(CASE WHEN gold_pairs = 0 THEN 0 ELSE tp_pairs * 1000000 // gold_pairs END AS BIGINT) AS recall_ppm,
       CAST(CASE WHEN pred_pairs + gold_pairs = 0 THEN 0
                 ELSE 2 * tp_pairs * 1000000 // (pred_pairs + gold_pairs) END AS BIGINT) AS f1_ppm
FROM tp, pp, gp
"""

QUERIES["er_metrics"] = (q_er_metrics, SQL_ER_METRICS)


def q_shape_infer(spark, sf):
    """Shape induction over the relational triple view: per (class,
    predicate) the observed cardinality envelope, node kind, datatype
    uniformity, and optionality — the mined sh:PropertyShape table."""
    from .operators.shacl import infer_shapes

    return infer_shapes(triples_view(spark, sf))


SQL_SHAPE_INFER = W + f""",
types AS (
  SELECT DISTINCT s_lex AS ent, o_lex AS cls FROM triples WHERE pred = '{RDF_TYPE}'
),
n_inst AS (SELECT cls, COUNT(*) AS n_instances FROM types GROUP BY cls),
per_subj AS (
  SELECT t.cls, v.pred AS path, v.s_lex, COUNT(*) AS cnt,
         MIN(v.o_kind) AS kmin, MAX(v.o_kind) AS kmax,
         MIN(COALESCE(v.o_dtype, '')) AS dmin, MAX(COALESCE(v.o_dtype, '')) AS dmax
  FROM triples v JOIN types t ON v.s_lex = t.ent
  WHERE v.pred <> '{RDF_TYPE}'
  GROUP BY t.cls, v.pred, v.s_lex
),
prof AS (
  SELECT cls, path, COUNT(*) AS n_with, MIN(cnt) AS min_count, MAX(cnt) AS max_count,
         MIN(kmin) AS kmin, MAX(kmax) AS kmax, MIN(dmin) AS dmin, MAX(dmax) AS dmax
  FROM per_subj GROUP BY cls, path
)
SELECT cls AS target_class, path,
       CAST(n_instances AS BIGINT) AS n_instances, CAST(n_with AS BIGINT) AS n_with,
       CAST(min_count AS BIGINT) AS min_count, CAST(max_count AS BIGINT) AS max_count,
       CASE WHEN kmin <> kmax THEN '(mixed)' WHEN kmin = 0 THEN 'IRI'
            WHEN kmin = 1 THEN 'BlankNode' ELSE 'Literal' END AS node_kind,
       CASE WHEN kmax <> 2 THEN '' WHEN dmin <> dmax THEN '(mixed)' ELSE dmin END AS datatype,
       CASE WHEN n_with < n_instances THEN 1 ELSE 0 END AS opt
FROM prof JOIN n_inst USING (cls)
"""

QUERIES["shape_infer"] = (q_shape_infer, SQL_SHAPE_INFER)


def _event_intervals(spark, sf, parity: int, span_s: int):
    e = spark.read.parquet(f"{sf}/events.parquet").filter(
        F.col("event_id") % 2 == parity
    )
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    return e.select(
        "user_id",
        F.col("event_id").alias("id"),
        us.alias("from_us"),
        (us + span_s * 1_000_000).alias("to_us"),
    )


def q_interval_allen(spark, sf):
    """Allen interval-algebra join over per-user event windows (even
    event ids × odd event ids, 60s/90s spans): every touching or
    intersecting pair labeled with the Allen relation, via the binned
    equi-join (disjoint pairs by design not emitted)."""
    from .operators.temporal import interval_allen

    left = _event_intervals(spark, sf, 0, 60)
    right = _event_intervals(spark, sf, 1, 90)
    out = interval_allen(left, right, ["user_id"], bin_us=600_000_000)
    return out.select(
        "user_id", F.col("l_id").cast("long").alias("l_id"),
        F.col("r_id").cast("long").alias("r_id"), "l_from", "l_to",
        "r_from", "r_to", "relation",
    )


SQL_INTERVAL_ALLEN = """
WITH l AS (
  SELECT user_id, event_id AS l_id, epoch_us(ts) AS l_from,
         epoch_us(ts) + 60000000 AS l_to
  FROM events WHERE event_id % 2 = 0
),
r AS (
  SELECT user_id, event_id AS r_id, epoch_us(ts) AS r_from,
         epoch_us(ts) + 90000000 AS r_to
  FROM events WHERE event_id % 2 = 1
)
SELECT l.user_id, l_id, r_id, l_from, l_to, r_from, r_to,
  CASE
    WHEN l_from = r_from AND l_to = r_to THEN 'equals'
    WHEN l_to = r_from THEN 'meets'
    WHEN r_to = l_from THEN 'met_by'
    WHEN l_from = r_from AND l_to < r_to THEN 'starts'
    WHEN l_from = r_from AND l_to > r_to THEN 'started_by'
    WHEN l_to = r_to AND l_from > r_from THEN 'finishes'
    WHEN l_to = r_to AND l_from < r_from THEN 'finished_by'
    WHEN l_from > r_from AND l_to < r_to THEN 'during'
    WHEN l_from < r_from AND l_to > r_to THEN 'contains'
    WHEN l_from < r_from THEN 'overlaps'
    ELSE 'overlapped_by' END AS relation
FROM l JOIN r ON l.user_id = r.user_id
WHERE l_from <= r_to AND r_from <= l_to
"""

QUERIES["interval_allen"] = (q_interval_allen, SQL_INTERVAL_ALLEN)


def q_interval_coalesce(spark, sf):
    """Temporal PACK: per-user [ts, ts+30min) observation slivers
    coalesced into maximal validity ranges (overlapping-or-touching
    merge), with the per-range sliver count."""
    from .operators.temporal import interval_coalesce

    e = spark.read.parquet(f"{sf}/events.parquet")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    iv = e.select(
        "user_id", us.alias("from_us"), (us + 1_800_000_000).alias("to_us")
    )
    return interval_coalesce(iv, ["user_id"])


SQL_INTERVAL_COALESCE = """
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS f, epoch_us(ts) + 1800000000 AS t FROM events
),
flagged AS (
  SELECT user_id, f, t,
         CASE WHEN f > MAX(t) OVER (PARTITION BY user_id ORDER BY f, t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS newflag
  FROM iv
),
isl AS (
  SELECT user_id, f, t,
         SUM(newflag) OVER (PARTITION BY user_id ORDER BY f, t) AS island
  FROM flagged
)
SELECT user_id, MIN(f) AS from_us, MAX(t) AS to_us, CAST(COUNT(*) AS BIGINT) AS n_merged
FROM isl GROUP BY user_id, island
"""

QUERIES["interval_coalesce"] = (q_interval_coalesce, SQL_INTERVAL_COALESCE)


# ---------------------------------------------------------------------------
# community moves, property alignment, meta-blocking (cc.py, fusion.py,
# linking.py — round-3 batch 4)
# ---------------------------------------------------------------------------


def _strip_edges(spark, sf):
    """The q_triangles chain-with-chords graph (rank r → r+1, r+2 within
    each nation): known dense local structure for community moves."""
    from pyspark.sql.window import Window

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    r = cu.select(
        F.col("c_custkey").cast("string").alias("k"),
        "c_nationkey",
        F.row_number().over(Window.partitionBy("c_nationkey").orderBy("c_custkey")).alias("rn"),
    )
    hop1 = r.select("c_nationkey", (F.col("rn") - 1).alias("rn"), F.col("k").alias("dst"))
    hop2 = r.select("c_nationkey", (F.col("rn") - 2).alias("rn"), F.col("k").alias("dst"))
    return (
        r.join(hop1, ["c_nationkey", "rn"]).select(F.col("k").alias("src"), "dst")
        .unionByName(r.join(hop2, ["c_nationkey", "rn"]).select(F.col("k").alias("src"), "dst"))
    )


def q_louvain(spark, sf):
    """One synchronous Louvain sweep from singleton communities over the
    triangle-strip graph — every node adopts the exact-integer argmax-ΔQ
    neighbor community; reported as community sizes (nodes whose label
    captured ≥ 1 neighbor)."""
    from .operators.cc import louvain_move

    out = louvain_move(_strip_edges(spark, sf))
    return out.groupBy("label").agg(F.count(F.lit(1)).cast("long").alias("n_members"))


SQL_LOUVAIN = """
WITH r AS (
  SELECT CAST(c_custkey AS VARCHAR) AS k, c_nationkey,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
  FROM customer
),
e0 AS (
  SELECT a.k AS src, b.k AS dst FROM r a JOIN r b
    ON a.c_nationkey = b.c_nationkey AND b.rn = a.rn + 1
  UNION ALL
  SELECT a.k, b.k FROM r a JOIN r b
    ON a.c_nationkey = b.c_nationkey AND b.rn = a.rn + 2
),
e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
bi AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)),
deg AS (SELECT src AS node, COUNT(*) AS k FROM bi GROUP BY src),
m2 AS (SELECT COUNT(*) AS m2 FROM bi),
-- singleton start: label(i) = i, sigma(label) = deg(label)
nbrc AS (
  SELECT bi.src AS node, bi.dst AS c, COUNT(*) AS kic FROM bi GROUP BY bi.src, bi.dst
),
cand AS (
  SELECT node, c, MAX(kic) AS kic FROM (
    SELECT node, c, kic FROM nbrc
    UNION ALL SELECT node, node AS c, 0 AS kic FROM deg
  ) GROUP BY node, c
),
scored AS (
  SELECT cand.node, cand.c,
         m2.m2 * cand.kic
           - (dc.k - CASE WHEN cand.c = cand.node THEN dn.k ELSE 0 END) * dn.k AS g
  FROM cand
  JOIN deg dn ON dn.node = cand.node
  JOIN deg dc ON dc.node = cand.c
  CROSS JOIN m2
),
pick AS (
  SELECT node, c AS label FROM (
    SELECT node, c, ROW_NUMBER() OVER (PARTITION BY node ORDER BY g DESC, c ASC) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members FROM pick GROUP BY label
"""

QUERIES["louvain"] = (q_louvain, SQL_LOUVAIN)


def q_prop_align(spark, sf):
    """Instance-based property alignment: vocabulary A asserts nation /
    region / priority value sets, vocabulary B a 15-nation subset, all
    regions, and priorities — Jaccard top-k must pair each A predicate
    with its B sibling at the planted overlap ratio."""
    from .operators.fusion import property_alignment

    na = spark.read.parquet(f"{sf}/nation.parquet")
    rg = spark.read.parquet(f"{sf}/region.parquet")
    od = spark.read.parquet(f"{sf}/orders.parquet")
    a = (
        na.select(F.lit("a:nation").alias("pred"), F.col("n_name").alias("value"))
        .unionByName(rg.select(F.lit("a:region").alias("pred"), F.col("r_name").alias("value")))
        .unionByName(od.select(F.lit("a:priority").alias("pred"), F.col("o_orderpriority").alias("value")))
    )
    b = (
        na.filter(F.col("n_nationkey") < 15)
        .select(F.lit("b:countryName").alias("pred"), F.col("n_name").alias("value"))
        .unionByName(rg.select(F.lit("b:zone").alias("pred"), F.col("r_name").alias("value")))
        .unionByName(od.select(F.lit("b:prio").alias("pred"), F.col("o_orderpriority").alias("value")))
    )
    return property_alignment(a, b, min_overlap=2, max_value_df=1000, k=3)


SQL_PROP_ALIGN = """
WITH a AS (
  SELECT DISTINCT pred AS pa, v FROM (
    SELECT 'a:nation' AS pred, n_name AS v FROM nation
    UNION ALL SELECT 'a:region', r_name FROM region
    UNION ALL SELECT 'a:priority', o_orderpriority FROM orders
  )
),
b AS (
  SELECT DISTINCT pred AS pb, v FROM (
    SELECT 'b:countryName' AS pred, n_name AS v FROM nation WHERE n_nationkey < 15
    UNION ALL SELECT 'b:zone', r_name FROM region
    UNION ALL SELECT 'b:prio', o_orderpriority FROM orders
  )
),
vdf AS (
  SELECT v FROM (
    SELECT v, COUNT(*) AS df FROM (SELECT v FROM a UNION ALL SELECT v FROM b) GROUP BY v
  ) WHERE df <= 1000
),
af AS (SELECT a.* FROM a SEMI JOIN vdf ON a.v = vdf.v),
bf AS (SELECT b.* FROM b SEMI JOIN vdf ON b.v = vdf.v),
na AS (SELECT pa, COUNT(*) AS n_a FROM af GROUP BY pa),
nb AS (SELECT pb, COUNT(*) AS n_b FROM bf GROUP BY pb),
inter AS (
  SELECT pa, pb, CAST(COUNT(*) AS BIGINT) AS overlap
  FROM af JOIN bf USING (v) GROUP BY pa, pb HAVING COUNT(*) >= 2
),
scored AS (
  SELECT pa, pb, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, overlap,
         overlap * 1000000 // (n_a + n_b - overlap) AS jaccard_ppm
  FROM inter JOIN na USING (pa) JOIN nb USING (pb)
)
SELECT pa, pb, n_a, n_b, overlap, CAST(jaccard_ppm AS BIGINT) AS jaccard_ppm,
       CAST(rank AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY pa
      ORDER BY jaccard_ppm DESC, overlap DESC, pb ASC) AS rank
  FROM scored
) WHERE rank <= 3
"""

QUERIES["prop_align"] = (q_prop_align, SQL_PROP_ALIGN)


def q_metablocking(spark, sf):
    """Meta-blocking WEP over token blocking of part names (first 400
    parts): blocks over `max_block_size` purged, CBS edge weights, keep
    pairs strictly above the global mean weight — exact via
    cross-multiplied integers."""
    from .operators.linking import metablocking_wep

    pt = spark.read.parquet(f"{sf}/part.parquet").filter(F.col("p_partkey") < 400)
    blocks = pt.select(
        F.explode(F.split("p_name", " ")).alias("block_id"),
        F.col("p_partkey").cast("long").alias("rec_id"),
    )
    return metablocking_wep(blocks, max_block_size=64)


SQL_METABLOCKING = """
WITH bl AS (
  SELECT DISTINCT tok AS block_id, p_partkey AS rec_id
  FROM (SELECT unnest(string_split(p_name, ' ')) AS tok, p_partkey
        FROM part WHERE p_partkey < 400)
),
kept AS (
  SELECT bl.* FROM bl SEMI JOIN (
    SELECT block_id FROM bl GROUP BY block_id HAVING COUNT(*) <= 64
  ) s ON bl.block_id = s.block_id
),
edges AS (
  SELECT a.rec_id AS rec_a, b.rec_id AS rec_b, CAST(COUNT(*) AS BIGINT) AS weight
  FROM kept a JOIN kept b ON a.block_id = b.block_id AND a.rec_id < b.rec_id
  GROUP BY 1, 2
),
tot AS (SELECT COUNT(*) AS n_edges, SUM(weight) AS sum_w FROM edges)
SELECT rec_a, rec_b, weight FROM edges, tot WHERE weight * n_edges > sum_w
"""

QUERIES["metablocking"] = (q_metablocking, SQL_METABLOCKING)


# ---------------------------------------------------------------------------
# conductance, dangling refs, Fellegi-Sunter weights, spatial grid join
# (cc.py, stats.py, linking.py, spatial.py — round-3 batch 5)
# ---------------------------------------------------------------------------


def q_conductance(spark, sf):
    """Per-nation conductance over the global customer chain+chord graph
    (k -> k+1, k -> k+2): intra-nation runs are dense, nation boundaries
    leak exactly the chain/chord edges that cross them — known small
    cuts, exact integer phi in ppm."""
    from .operators.cc import conductance

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    k = F.col("c_custkey").cast("long")
    e = cu.select(k.cast("string").alias("src"), (k + 1).cast("string").alias("dst")).unionByName(
        cu.select(k.cast("string").alias("src"), (k + 2).cast("string").alias("dst"))
    )
    labels = cu.select(
        k.cast("string").alias("node"), F.col("c_nationkey").cast("string").alias("label")
    )
    return conductance(e, labels)


SQL_CONDUCTANCE = """
WITH cu AS (
  SELECT CAST(c_custkey AS BIGINT) AS k, CAST(c_nationkey AS VARCHAR) AS nat
  FROM customer
),
e0 AS (
  SELECT CAST(k AS VARCHAR) AS src, CAST(k + 1 AS VARCHAR) AS dst FROM cu
  UNION ALL
  SELECT CAST(k AS VARCHAR), CAST(k + 2 AS VARCHAR) FROM cu
),
e AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
),
nodes AS (SELECT CAST(k AS VARCHAR) AS node, nat FROM cu),
lab AS (
  SELECT e.a, e.b, la.nat AS la, lb.nat AS lb
  FROM e JOIN nodes la ON la.node = e.a JOIN nodes lb ON lb.node = e.b
),
m2 AS (SELECT 2 * COUNT(*) AS m2 FROM lab),
ein AS (SELECT la AS label, COUNT(*) AS edges_in FROM lab WHERE la = lb GROUP BY la),
cut AS (SELECT la, lb FROM lab WHERE la <> lb),
eout AS (
  SELECT label, COUNT(*) AS edges_out FROM (
    SELECT la AS label FROM cut UNION ALL SELECT lb FROM cut
  ) GROUP BY label
),
nn AS (SELECT nat AS label, COUNT(*) AS n_nodes FROM nodes GROUP BY nat),
base AS (
  SELECT nn.label, CAST(nn.n_nodes AS BIGINT) AS n_nodes,
         CAST(COALESCE(ein.edges_in, 0) AS BIGINT) AS edges_in,
         CAST(COALESCE(eout.edges_out, 0) AS BIGINT) AS edges_out
  FROM nn LEFT JOIN ein ON ein.label = nn.label
          LEFT JOIN eout ON eout.label = nn.label
),
vol AS (
  SELECT *, CAST(2 * edges_in + edges_out AS BIGINT) AS volume FROM base
)
SELECT label, n_nodes, edges_in, edges_out, volume,
       CASE WHEN least(volume, m2.m2 - volume) <= 0 THEN CAST(NULL AS BIGINT)
            ELSE CAST(edges_out * 1000000 // least(volume, m2.m2 - volume) AS BIGINT)
       END AS conductance_ppm
FROM vol CROSS JOIN m2
"""

QUERIES["conductance"] = (q_conductance, SQL_CONDUCTANCE)


def q_dangling_refs(spark, sf):
    """Referential-integrity audit of the quad store: per predicate, the
    distinct IRI/bnode objects never described as a subject anywhere —
    the crawl-frontier / shape-repair signal."""
    from .operators.stats import dangling_report
    from .relational import triples_view

    return dangling_report(triples_view(spark, sf))


SQL_DANGLING_REFS = W + """,
refs AS (
  SELECT DISTINCT pred, o_kind AS k, o_lex AS lex FROM triples WHERE o_kind <> 2
),
descr AS (SELECT DISTINCT 0 AS k, s_lex AS lex FROM triples),
dang AS (
  SELECT pred FROM refs
  WHERE NOT EXISTS (SELECT 1 FROM descr WHERE descr.k = refs.k AND descr.lex = refs.lex)
),
nr AS (SELECT pred, COUNT(*) AS n_refs FROM refs GROUP BY pred),
nd AS (SELECT pred, COUNT(*) AS n_dangling FROM dang GROUP BY pred)
SELECT nr.pred, CAST(n_refs AS BIGINT) AS n_refs,
       CAST(COALESCE(n_dangling, 0) AS BIGINT) AS n_dangling,
       CAST(COALESCE(n_dangling, 0) * 1000000 // n_refs AS BIGINT) AS dangling_ppm
FROM nr LEFT JOIN nd ON nd.pred = nr.pred
"""

QUERIES["dangling_refs"] = (q_dangling_refs, SQL_DANGLING_REFS)


def q_fs_weights(spark, sf):
    """Fellegi-Sunter m/u estimation over adjacent-customer candidate
    pairs with two comparison fields (segment, nation agreement); gold =
    segment-agreeing pairs (non-degenerate at every SF, so no NULL ppm
    columns — the comparator NaN/NULL gotcha) — m_ppm / u_ppm / integer
    dominance per field, exact ppm."""
    from .operators.linking import fs_weights

    cu = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("k"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
    )
    b = cu.select(
        (F.col("k") - 1).alias("k"), F.col("nat").alias("nat_b"), F.col("seg").alias("seg_b")
    )
    pairs = cu.join(b, "k").select(
        F.col("k").alias("rec_a"), (F.col("k") + 1).alias("rec_b"),
        "nat", "seg", "nat_b", "seg_b",
    )
    comp = pairs.select(
        "rec_a", "rec_b", F.lit("nation").alias("field"),
        (F.col("nat") == F.col("nat_b")).cast("int").alias("agree"),
    ).unionByName(
        pairs.select(
            "rec_a", "rec_b", F.lit("segment").alias("field"),
            (F.col("seg") == F.col("seg_b")).cast("int").alias("agree"),
        )
    )
    gold = pairs.filter(F.col("seg") == F.col("seg_b")).select("rec_a", "rec_b")
    return fs_weights(comp, gold)


SQL_FS_WEIGHTS = """
WITH cu AS (
  SELECT CAST(c_custkey AS BIGINT) AS k, c_nationkey AS nat, c_mktsegment AS seg
  FROM customer
),
pairs AS (
  SELECT a.k AS rec_a, a.k + 1 AS rec_b, a.nat, a.seg,
         b.nat AS nat_b, b.seg AS seg_b
  FROM cu a JOIN cu b ON b.k = a.k + 1
),
comp AS (
  SELECT rec_a, rec_b, 'nation' AS field,
         CASE WHEN nat = nat_b THEN 1 ELSE 0 END AS agree FROM pairs
  UNION ALL
  SELECT rec_a, rec_b, 'segment',
         CASE WHEN seg = seg_b THEN 1 ELSE 0 END FROM pairs
),
gold AS (
  SELECT rec_a, rec_b FROM pairs WHERE seg = seg_b
),
lab AS (
  SELECT c.field, c.agree,
         CASE WHEN g.rec_a IS NOT NULL THEN 1 ELSE 0 END AS is_m
  FROM comp c LEFT JOIN gold g ON g.rec_a = c.rec_a AND g.rec_b = c.rec_b
),
agg AS (
  SELECT field,
         CAST(SUM(is_m) AS BIGINT) AS n_match,
         CAST(SUM(1 - is_m) AS BIGINT) AS n_nonmatch,
         CAST(SUM(CASE WHEN is_m = 1 THEN agree ELSE 0 END) AS BIGINT) AS agree_m,
         CAST(SUM(CASE WHEN is_m = 0 THEN agree ELSE 0 END) AS BIGINT) AS agree_u
  FROM lab GROUP BY field
),
mu AS (
  SELECT field, n_match, n_nonmatch,
         CASE WHEN n_match = 0 THEN CAST(NULL AS BIGINT)
              ELSE CAST(agree_m * 1000000 // n_match AS BIGINT) END AS m_ppm,
         CASE WHEN n_nonmatch = 0 THEN CAST(NULL AS BIGINT)
              ELSE CAST(agree_u * 1000000 // n_nonmatch AS BIGINT) END AS u_ppm
  FROM agg
)
SELECT field, n_match, n_nonmatch, m_ppm, u_ppm,
       CASE WHEN m_ppm IS NULL OR u_ppm IS NULL THEN CAST(NULL AS BIGINT)
            ELSE CAST(m_ppm * 1000000 // greatest(u_ppm, 1) AS BIGINT) END AS dominance_ppm
FROM mu
"""

QUERIES["fs_weights"] = (q_fs_weights, SQL_FS_WEIGHTS)


def q_geo_nn(spark, sf):
    """Nearest gazetteer supplier within 5km for each customer point —
    grid-bucketed radius join (cell = radius, 3x3 neighborhood probe,
    exact integer distance) + min_by argmin; coordinates are synthetic
    signed integers exercising the negative-floor cell path."""
    from .operators.spatial import grid_nn_join

    def pts(df, key):
        k = F.col(key).cast("long")
        return df.select(
            k.alias("id"),
            ((k * 48271) % 100000 - 50000).alias("x"),
            ((k * 69621) % 100000 - 50000).alias("y"),
        )

    cu = pts(spark.read.parquet(f"{sf}/customer.parquet"), "c_custkey")
    su = pts(spark.read.parquet(f"{sf}/supplier.parquet"), "s_suppkey")
    return grid_nn_join(cu, su, radius=5000)


SQL_GEO_NN = """
WITH c AS (
  SELECT CAST(c_custkey AS BIGINT) AS id,
         (CAST(c_custkey AS BIGINT) * 48271) % 100000 - 50000 AS x,
         (CAST(c_custkey AS BIGINT) * 69621) % 100000 - 50000 AS y
  FROM customer
),
s AS (
  SELECT CAST(s_suppkey AS BIGINT) AS id,
         (CAST(s_suppkey AS BIGINT) * 48271) % 100000 - 50000 AS x,
         (CAST(s_suppkey AS BIGINT) * 69621) % 100000 - 50000 AS y
  FROM supplier
),
p AS (
  SELECT c.id AS id_a, s.id AS id_b,
         (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) AS dist2
  FROM c CROSS JOIN s
  WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= 25000000
)
SELECT id_a, id_b, CAST(dist2 AS BIGINT) AS dist2 FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY dist2, id_b) AS rn FROM p
) WHERE rn = 1
"""

QUERIES["geo_nn"] = (q_geo_nn, SQL_GEO_NN)


# ---------------------------------------------------------------------------
# grid DBSCAN, triangle edge support, k-truss, hopping windows, eccentricity
# (spatial.py, cc.py, events.py — round-3 batch 6)
# ---------------------------------------------------------------------------


def q_dbscan_venues(spark, sf):
    """Deterministic DBSCAN over synthetic customer coordinates (the
    geo_nn point cloud, radius 8000, min_pts 3): density clusters =
    CC over core-core proximity, border points attach to the minimum
    core cluster, noise labeled '' — the venue-conflation step."""
    from .operators.spatial import grid_dbscan

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    k = F.col("c_custkey").cast("long")
    pts = cu.select(
        k.alias("id"),
        ((k * 48271) % 100000 - 50000).alias("x"),
        ((k * 69621) % 100000 - 50000).alias("y"),
    )
    return grid_dbscan(pts, radius=8000, min_pts=3)


SQL_DBSCAN_VENUES = """
WITH RECURSIVE c AS (
  SELECT CAST(c_custkey AS BIGINT) AS id,
         (CAST(c_custkey AS BIGINT) * 48271) % 100000 - 50000 AS x,
         (CAST(c_custkey AS BIGINT) * 69621) % 100000 - 50000 AS y
  FROM customer
),
p AS (
  SELECT a.id AS ia, b.id AS ib
  FROM c a JOIN c b
    ON (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 64000000
),
deg AS (SELECT ia AS id, COUNT(*) AS n FROM p GROUP BY ia),
core AS (SELECT id FROM deg WHERE n >= 3),
ce AS (
  SELECT CAST(p.ia AS VARCHAR) AS src, CAST(p.ib AS VARCHAR) AS dst
  FROM p JOIN core x ON x.id = p.ia JOIN core y ON y.id = p.ib
  WHERE p.ia <> p.ib
),
reach(node, label) AS (
  SELECT CAST(id AS VARCHAR), CAST(id AS VARCHAR) FROM core
  UNION
  SELECT ce.dst, reach.label FROM reach JOIN ce ON ce.src = reach.node
),
comp AS (SELECT node, MIN(label) AS cluster FROM reach GROUP BY node),
corelab AS (
  SELECT CAST(core.id AS VARCHAR) AS id, comp.cluster
  FROM core JOIN comp ON comp.node = CAST(core.id AS VARCHAR)
),
border AS (
  SELECT CAST(p.ia AS VARCHAR) AS id, MIN(cl.cluster) AS cluster
  FROM p JOIN corelab cl ON cl.id = CAST(p.ib AS VARCHAR)
  WHERE p.ia <> p.ib
    AND CAST(p.ia AS VARCHAR) NOT IN (SELECT id FROM corelab)
  GROUP BY p.ia
)
SELECT CAST(c.id AS VARCHAR) AS id,
       COALESCE(cl.cluster, b.cluster, '') AS cluster,
       CASE WHEN cl.id IS NOT NULL THEN 'core'
            WHEN b.id IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role
FROM c
LEFT JOIN corelab cl ON cl.id = CAST(c.id AS VARCHAR)
LEFT JOIN border b ON b.id = CAST(c.id AS VARCHAR)
"""

QUERIES["dbscan_venues"] = (q_dbscan_venues, SQL_DBSCAN_VENUES)


def _chain_edges(spark, sf, gaps, dense_half_gaps=()):
    """Customer chain+chord graph with zero-padded string keys (lex order
    == numeric order); gaps in `dense_half_gaps` only emit from the low
    half of the key space (the mixed-density truss fixture)."""
    cu = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("k")
    )
    ks = cu.select(F.col("k").alias("d"))
    half = cu.agg(F.max("k")).first()[0] // 2
    edges = None
    for g in tuple(gaps) + tuple(dense_half_gaps):
        src = cu if g in gaps else cu.filter(F.col("k") <= half)
        e = src.select("k", (F.col("k") + g).alias("d")).join(ks, "d").select(
            F.format_string("%06d", "k").alias("src"),
            F.format_string("%06d", "d").alias("dst"),
        )
        edges = e if edges is None else edges.unionByName(e)
    return edges


def q_tri_support(spark, sf):
    """Per-edge triangle support on the customer chain+chord graph
    (k->k+1, k->k+2): interior gap-1 edges sit in 2 triangles, gap-2
    chords in 1, boundaries fewer — exact integers."""
    from .operators.cc import edge_support

    return edge_support(_chain_edges(spark, sf, (1, 2)))


SQL_TRI_SUPPORT = """
WITH cu AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
e0 AS (
  SELECT k AS s, k + 1 AS d FROM cu
  UNION ALL SELECT k, k + 2 FROM cu
),
e1 AS (SELECT s, d FROM e0 WHERE d IN (SELECT k FROM cu)),
e AS (
  SELECT DISTINCT
    least(lpad(CAST(s AS VARCHAR), 6, '0'), lpad(CAST(d AS VARCHAR), 6, '0')) AS a,
    greatest(lpad(CAST(s AS VARCHAR), 6, '0'), lpad(CAST(d AS VARCHAR), 6, '0')) AS b
  FROM e1
),
tri AS (
  SELECT p.a AS x, p.b AS y, q.b AS z
  FROM e p JOIN e q ON q.a = p.b JOIN e r ON r.a = p.a AND r.b = q.b
),
contrib AS (
  SELECT x AS a, y AS b FROM tri
  UNION ALL SELECT y, z FROM tri
  UNION ALL SELECT x, z FROM tri
),
sup AS (SELECT a, b, COUNT(*) AS s FROM contrib GROUP BY a, b)
SELECT e.a, e.b, CAST(COALESCE(sup.s, 0) AS BIGINT) AS support
FROM e LEFT JOIN sup ON sup.a = e.a AND sup.b = e.b
"""

QUERIES["tri_support"] = (q_tri_support, SQL_TRI_SUPPORT)


def q_ktruss(spark, sf):
    """5-truss of the mixed-density customer graph (5-clique band gaps
    1-4 on the low half, sparse chain gaps 1-2 on the high half): the
    sparse half peels away (support < 3), the clique band survives, the
    seam cascade is local — fixpoint in 2 effective peels at every SF."""
    from .operators.cc import ktruss

    return ktruss(_chain_edges(spark, sf, (1, 2), dense_half_gaps=(3, 4)), k=5)


def _sql_ktruss(rounds: int) -> str:
    """Unrolled k=5 truss peeling mirror: `rounds` triangle-support +
    filter blocks (extra rounds past the fixpoint are no-ops), then one
    final support computation on the converged edge set — exactly the
    operator's return shape."""
    head = """
WITH cu AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
half AS (SELECT MAX(k) // 2 AS h FROM cu),
e0 AS (
  SELECT k AS s, k + 1 AS d FROM cu
  UNION ALL SELECT k, k + 2 FROM cu
  UNION ALL SELECT k, k + 3 FROM cu, half WHERE k <= h
  UNION ALL SELECT k, k + 4 FROM cu, half WHERE k <= h
),
e1 AS (SELECT s, d FROM e0 WHERE d IN (SELECT k FROM cu)),
ed0 AS MATERIALIZED (
  SELECT DISTINCT
    least(lpad(CAST(s AS VARCHAR), 6, '0'), lpad(CAST(d AS VARCHAR), 6, '0')) AS a,
    greatest(lpad(CAST(s AS VARCHAR), 6, '0'), lpad(CAST(d AS VARCHAR), 6, '0')) AS b
  FROM e1
)"""
    # MATERIALIZED stops DuckDB's default CTE inlining — without it each
    # round's 3-way self-join re-expands the whole chain below it and the
    # base scan multiplies ~4x per round (observed: fd exhaustion at 4 rounds)
    blocks = []
    for i in range(rounds):
        cur, nxt = f"ed{i}", f"ed{i + 1}"
        blocks.append(f""",
tri{i} AS MATERIALIZED (
  SELECT p.a AS x, p.b AS y, q.b AS z
  FROM {cur} p JOIN {cur} q ON q.a = p.b JOIN {cur} r ON r.a = p.a AND r.b = q.b
),
sup{i} AS MATERIALIZED (
  SELECT a, b, COUNT(*) AS s FROM (
    SELECT x AS a, y AS b FROM tri{i}
    UNION ALL SELECT y, z FROM tri{i}
    UNION ALL SELECT x, z FROM tri{i}
  ) GROUP BY a, b
),
{nxt} AS MATERIALIZED (
  SELECT e.a, e.b FROM {cur} e JOIN sup{i} su ON su.a = e.a AND su.b = e.b
  WHERE su.s >= 3
)""")
        final = f"""
SELECT su.a, su.b, CAST(su.s AS BIGINT) AS support
FROM sup{i} su JOIN {nxt} e ON e.a = su.a AND e.b = su.b
"""
    return head + "".join(blocks) + final


SQL_KTRUSS = _sql_ktruss(4)

QUERIES["ktruss"] = (q_ktruss, SQL_KTRUSS)


def q_events_hopping(spark, sf):
    """Hopping-window counts (60-min window, 15-min hop) per event type
    — every event lands in exactly 4 windows; bucket = window-start
    epoch in hop units."""
    from .operators.events import hopping_counts

    ev = spark.read.parquet(f"{sf}/events.parquet")
    return hopping_counts(ev, window_minutes=60, hop_minutes=15)


SQL_EVENTS_HOPPING = """
WITH ev AS (
  SELECT event_type, epoch_us(ts) AS t,
         CAST(round(value * 100) AS BIGINT) AS v100
  FROM events
),
x AS (
  SELECT event_type, v100,
         unnest(generate_series(
           (t - 3600000000) // 900000000 + 1,
           t // 900000000)) AS bucket
  FROM ev
)
SELECT CAST(bucket AS BIGINT) AS bucket, event_type,
       COUNT(*) AS n_events, CAST(SUM(v100) AS BIGINT) AS sum_value_x100
FROM x GROUP BY 1, 2
"""

QUERIES["events_hopping"] = (q_events_hopping, SQL_EVENTS_HOPPING)


def q_graph_ecc(spark, sf):
    """Per-seed BFS eccentricity + reach (hop cap 6) from the first
    three customers over the directed customer chain — closed-form
    truth: ecc = min(maxkey - seed, 6), reach = ecc + 1."""
    from .operators.cc import eccentricity

    cu = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("k")
    )
    ks = cu.select(F.col("k").alias("d"))
    e = cu.select("k", (F.col("k") + 1).alias("d")).join(ks, "d").select(
        F.col("k").cast("string").alias("src"), F.col("d").cast("string").alias("dst")
    )
    seeds = cu.filter(F.col("k") <= 3).select(F.col("k").cast("string").alias("node"))
    return eccentricity(e, seeds, max_hops=6)


SQL_GRAPH_ECC = """
WITH mx AS (SELECT MAX(CAST(c_custkey AS BIGINT)) AS mk FROM customer)
SELECT CAST(c_custkey AS VARCHAR) AS seed,
       CAST(least(mk - CAST(c_custkey AS BIGINT), 6) AS BIGINT) AS ecc,
       CAST(least(mk - CAST(c_custkey AS BIGINT), 6) + 1 AS BIGINT) AS n_reached
FROM customer CROSS JOIN mx
WHERE c_custkey <= 3
"""

QUERIES["graph_ecc"] = (q_graph_ecc, SQL_GRAPH_ECC)


def q_betweenness(spark, sf):
    """Seed-sampled Brandes betweenness (integer surrogate, hop cap 6)
    from the first customers over the directed customer chain — chain
    closed form: delta_s(v) = (reach_end(s) - v)*SCALE, bc = sum over
    seeds s < v within the cap."""
    from .operators.cc import betweenness

    cu = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("k")
    )
    ks = cu.select(F.col("k").alias("d"))
    e = cu.select("k", (F.col("k") + 1).alias("d")).join(ks, "d").select(
        F.col("k").cast("string").alias("src"), F.col("d").cast("string").alias("dst")
    )
    seeds = cu.filter(F.col("k") <= 3).select(F.col("k").cast("string").alias("node"))
    return betweenness(e, seeds, max_hops=6)


SQL_BETWEENNESS = """
WITH cu AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
mx AS (SELECT MAX(k) AS mk FROM cu),
seeds AS (SELECT k AS s FROM cu WHERE k <= 3),
pairs AS (
  SELECT v.k AS v, least(mx.mk, se.s + 6) AS reach_end
  FROM cu v CROSS JOIN mx
  JOIN seeds se ON v.k > se.s AND v.k <= se.s + 6
)
SELECT CAST(v AS VARCHAR) AS node,
       CAST(SUM((reach_end - v) * 1000000) AS BIGINT) AS bc
FROM pairs GROUP BY v
"""

QUERIES["betweenness"] = (q_betweenness, SQL_BETWEENNESS)


def q_burst_windows(spark, sf):
    """Burst alarm over 60-min tumbling windows per event type: count >
    200% of the trailing-3 mean (division-cleared integers), cold-start
    windows never flagged."""
    from .operators.events import burst_windows

    ev = spark.read.parquet(f"{sf}/events.parquet")
    return burst_windows(ev, minutes=60, trailing=3, threshold_pct=200)


SQL_BURST_WINDOWS = """
WITH base AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bucket, event_type,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
wd AS (
  SELECT bucket, event_type, n_events,
         CAST(COUNT(*) OVER w AS BIGINT) AS n_prev,
         CAST(COALESCE(SUM(n_events) OVER w, 0) AS BIGINT) AS trailing_sum
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
)
SELECT bucket, event_type, n_events, n_prev, trailing_sum,
       CASE WHEN n_prev = 3 AND n_events * 100 * n_prev > 200 * trailing_sum
            THEN 1 ELSE 0 END AS is_burst
FROM wd
"""

QUERIES["burst_windows"] = (q_burst_windows, SQL_BURST_WINDOWS)


def q_compression_quality(spark, sf):
    """zlib compressibility signal over the documents corpus — rows-only
    by design: zlib is not SQL-expressible (the extract_corpus
    justification); verified by the direct-zlib differential test."""
    from .operators.textops import compression_quality

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return compression_quality(docs)


QUERIES["compression_quality"] = (q_compression_quality, None)


def q_hyperball(spark, sf):
    """HyperBall neighborhood function N(v, 6) over the directed customer
    chain: the iterative register-merge must equal the HLL estimate of
    the TRUE reachable set {v .. v+6} computed independently — registers
    are a pure function of the set."""
    from .operators.cc import hyperball

    cu = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("k")
    )
    ks = cu.select(F.col("k").alias("d"))
    e = cu.select("k", (F.col("k") + 1).alias("d")).join(ks, "d").select(
        F.col("k").cast("string").alias("src"), F.col("d").cast("string").alias("dst")
    )
    return hyperball(e, max_hops=6)


def _sql_hyperball() -> str:
    from .operators.sketches import hll_oracle_sql

    prefix = """WITH cu AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
mx AS (SELECT MAX(k) AS mk FROM cu),
reach AS (
  SELECT CAST(v.k AS VARCHAR) AS node,
         CAST(unnest(generate_series(v.k, least(v.k + 6, mx.mk))) AS VARCHAR) AS member
  FROM cu v CROSS JOIN mx
),
h AS"""
    return hll_oracle_sql("reach", "member", ["node"], estimate=True).replace(
        "WITH h AS", prefix, 1
    )


SQL_HYPERBALL = _sql_hyperball()

QUERIES["hyperball"] = (q_hyperball, SQL_HYPERBALL)


def q_er_bcubed(spark, sf):
    """B-cubed ER evaluation on the exact er_metrics fixture (every 50th
    customer exiled): the per-record view that punishes big-cluster
    errors pairwise F1 under-weights — reported beside er_metrics."""
    from .operators.linking import er_bcubed_metrics

    cust = spark.read.parquet(f"{sf}/customer.parquet")
    gold = cust.select(
        F.concat(F.lit("urn:cu:"), "c_custkey").alias("node"),
        F.concat(F.lit("n"), "c_nationkey").alias("cluster"),
    )
    pred = cust.select(
        F.concat(F.lit("urn:cu:"), "c_custkey").alias("node"),
        F.when(
            F.col("c_custkey") % 50 == 0, F.concat(F.lit("x"), "c_mktsegment")
        ).otherwise(F.concat(F.lit("n"), "c_nationkey")).alias("cluster"),
    )
    return er_bcubed_metrics(pred, gold)


SQL_ER_BCUBED = """
WITH j AS (
  SELECT 'urn:cu:'||c_custkey AS node,
         CASE WHEN c_custkey % 50 = 0 THEN 'x'||c_mktsegment ELSE 'n'||c_nationkey END AS pc,
         'n'||c_nationkey AS gc
  FROM customer
),
cells AS (SELECT pc, gc, COUNT(*) AS n FROM j GROUP BY pc, gc),
psz AS (SELECT pc, COUNT(*) AS size_pc FROM j GROUP BY pc),
gsz AS (SELECT gc, COUNT(*) AS size_gc FROM j GROUP BY gc),
folded AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_records,
         SUM(n * (n * 1000000 // size_pc)) AS ps,
         SUM(n * (n * 1000000 // size_gc)) AS rs
  FROM cells JOIN psz USING (pc) JOIN gsz USING (gc)
),
pr AS (
  SELECT n_records,
         CAST(CASE WHEN n_records = 0 THEN 0 ELSE ps // n_records END AS BIGINT) AS bcubed_p_ppm,
         CAST(CASE WHEN n_records = 0 THEN 0 ELSE rs // n_records END AS BIGINT) AS bcubed_r_ppm
  FROM folded
)
SELECT n_records, bcubed_p_ppm, bcubed_r_ppm,
       CAST(CASE WHEN bcubed_p_ppm + bcubed_r_ppm = 0 THEN 0
                 ELSE 2 * bcubed_p_ppm * bcubed_r_ppm // (bcubed_p_ppm + bcubed_r_ppm)
            END AS BIGINT) AS bcubed_f1_ppm
FROM pr
"""

QUERIES["er_bcubed"] = (q_er_bcubed, SQL_ER_BCUBED)


def q_jl_project(spark, sf):
    """JL ±1 projection of the 64-d embeddings to 8 components, exploded
    to (vec_id, j, val_x1e4) — each component is the left-fold dot
    product, bit-identical to DuckDB list_dot_product."""
    from .operators.ann import jl_project

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    p = jl_project(emb, out_dim=8, dim=64)
    return p.select("vec_id", F.posexplode("proj").alias("j", "d")).select(
        "vec_id",
        F.col("j").cast("int").alias("j"),
        F.round(F.col("d") * 10000).cast("long").alias("val_x1e4"),
    )


def _sql_jl_project() -> str:
    from .operators.ann import _jl_signs

    rows = []
    for j in range(8):
        arr = ", ".join(str(v) for v in _jl_signs(j, 64))
        # DOUBLE[] cast is load-bearing: list_dot_product over the raw
        # FLOAT[] column accumulates in float precision (500/500 last-ulp
        # mismatches vs Spark's double left fold, measured); over DOUBLE[]
        # it is bit-identical
        rows.append(
            f"SELECT vec_id, {j} AS j, "
            f"list_dot_product(CAST(embedding AS DOUBLE[]), [{arr}]) AS d FROM embeddings"
        )
    return (
        "WITH p AS (\n" + "\nUNION ALL\n".join(rows) + "\n)\n"
        "SELECT vec_id, CAST(j AS INT) AS j, "
        "CAST(round(d * 10000) AS BIGINT) AS val_x1e4 FROM p"
    )


SQL_JL_PROJECT = _sql_jl_project()

QUERIES["jl_project"] = (q_jl_project, SQL_JL_PROJECT)


def q_zorder(spark, sf):
    """Z-order key of (custkey mod 1024, nationkey) at 10 bits — the
    Iceberg multi-dimensional layout key, pure bit algebra."""
    from .operators.sketches import zorder_key

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    return cu.select(
        F.col("c_custkey").cast("long").alias("id"),
        zorder_key(
            F.col("c_custkey").cast("long") % 1024,
            F.col("c_nationkey").cast("long"),
            bits=10,
        ).alias("zkey"),
    )


def _sql_zorder(bits: int = 10) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(((a >> {i}) & 1) << {2 * i + 1}) + (((b >> {i}) & 1) << {2 * i})")
    return f"""
WITH cu AS (
  SELECT CAST(c_custkey AS BIGINT) AS id,
         CAST(c_custkey AS BIGINT) % 1024 AS a,
         CAST(c_nationkey AS BIGINT) AS b
  FROM customer
)
SELECT id, CAST({" + ".join(terms)} AS BIGINT) AS zkey FROM cu
"""


SQL_ZORDER = _sql_zorder()

QUERIES["zorder"] = (q_zorder, SQL_ZORDER)


def q_closeness(spark, sf):
    """Sampled closeness from the first three customers over the chain:
    node v reached by seeds s<v within 6 hops at distance v-s — k/D in
    exact ppm, closed-form oracle."""
    from .operators.cc import closeness_centrality

    cu = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("k")
    )
    ks = cu.select(F.col("k").alias("d"))
    e = cu.select("k", (F.col("k") + 1).alias("d")).join(ks, "d").select(
        F.col("k").cast("string").alias("src"), F.col("d").cast("string").alias("dst")
    )
    seeds = cu.filter(F.col("k") <= 3).select(F.col("k").cast("string").alias("node"))
    return closeness_centrality(e, seeds, max_hops=6)


SQL_CLOSENESS = """
WITH cu AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
seeds AS (SELECT k AS s FROM cu WHERE k <= 3),
pairs AS (
  SELECT v.k AS v, v.k - se.s AS dist
  FROM cu v JOIN seeds se ON v.k > se.s AND v.k <= se.s + 6
)
SELECT CAST(v AS VARCHAR) AS node,
       CAST(COUNT(*) AS BIGINT) AS n_sources,
       CAST(SUM(dist) AS BIGINT) AS total_dist,
       CAST(1000000 * COUNT(*) // SUM(dist) AS BIGINT) AS closeness
FROM pairs GROUP BY v
"""

QUERIES["closeness"] = (q_closeness, SQL_CLOSENESS)


def q_ppr_push(spark, sf):
    """Forward-push approximate PPR from the lowest-key customers over
    the chain (alpha 50%, eps 1000 ppm): geometric decay with exact
    floor-remainder conservation — p+r sums to scale per seed."""
    from .operators.cc import ppr_push

    cu = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("k")
    )
    ks = cu.select(F.col("k").alias("d"))
    e = cu.select("k", (F.col("k") + 1).alias("d")).join(ks, "d").select(
        F.col("k").cast("string").alias("src"), F.col("d").cast("string").alias("dst")
    )
    seeds = cu.filter(F.col("k") <= 1).select(F.col("k").cast("string").alias("node"))
    return ppr_push(e, seeds, alpha_pct=50, eps_ppm=1000, max_rounds=12)


def _sql_ppr(rounds: int) -> str:
    """Unrolled mirror of ppr_push's integer round semantics (MATERIALIZED
    per round — the ktruss CTE-inlining lesson); extra rounds past the
    no-active fixpoint are identities."""
    head = """
WITH cu AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
e AS MATERIALIZED (
  SELECT CAST(k AS VARCHAR) AS src, CAST(k + 1 AS VARCHAR) AS dst
  FROM cu WHERE k + 1 IN (SELECT k FROM cu)
),
dg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
s0 AS MATERIALIZED (
  SELECT CAST(k AS VARCHAR) AS node, CAST(0 AS BIGINT) AS p,
         CAST(1000000 AS BIGINT) AS r
  FROM cu WHERE k <= 1
)"""
    blocks = []
    for i in range(rounds):
        cur, nxt = f"s{i}", f"s{i + 1}"
        blocks.append(f""",
st{i} AS MATERIALIZED (
  SELECT s.node, s.p, s.r, COALESCE(d.deg, 0) AS deg
  FROM {cur} s LEFT JOIN dg d ON d.src = s.node
),
k{i} AS MATERIALIZED (
  SELECT node,
    p + CASE WHEN r > 0 AND r >= 1000 * deg AND deg = 0 THEN r
             WHEN r > 0 AND r >= 1000 * deg THEN 50 * r // 100
             ELSE 0 END AS p,
    CASE WHEN r > 0 AND r >= 1000 * deg AND deg = 0 THEN 0
         WHEN r > 0 AND r >= 1000 * deg
              THEN r - 50 * r // 100 - ((50 * r) // (100 * deg)) * deg
         ELSE r END AS r,
    CASE WHEN r > 0 AND r >= 1000 * deg AND deg > 0
         THEN (50 * r) // (100 * deg) ELSE 0 END AS share
  FROM st{i}
),
{nxt} AS MATERIALIZED (
  SELECT COALESCE(a.node, b.node) AS node,
         CAST(COALESCE(a.p, 0) AS BIGINT) AS p,
         CAST(COALESCE(a.r, 0) + COALESCE(b.dr, 0) AS BIGINT) AS r
  FROM (SELECT node, p, r FROM k{i}) a
  FULL OUTER JOIN (
    SELECT e.dst AS node, SUM(x.share) AS dr
    FROM k{i} x JOIN e ON e.src = x.node WHERE x.share > 0 GROUP BY e.dst
  ) b ON b.node = a.node
)""")
        final = f"\nSELECT node, p, r FROM s{i + 1}"
    return head + "".join(blocks) + final


SQL_PPR_PUSH = _sql_ppr(12)

QUERIES["ppr_push"] = (q_ppr_push, SQL_PPR_PUSH)


def q_copy_detect(spark, sf):
    """Source copy detection: the fuse_vote fixture plus srcD which
    COPIES srcB's corruption rule verbatim — (B,D) share every false
    claim, independent pairs share none; truth = srcA (exact by
    construction)."""
    from .operators.fusion import copy_detection

    claims = _fuse_claims(spark, sf)
    su = spark.read.parquet(f"{sf}/supplier.parquet")
    base = F.lit(None).cast("string")
    srcD = su.select(
        F.lit(0).cast("tinyint").alias("s_kind"),
        F.concat(F.lit("urn:su:"), F.col("s_suppkey").cast("string")).alias("s_lex"),
        F.lit("urn:p:inNation").alias("pred"),
        F.lit(0).cast("tinyint").alias("o_kind"),
        F.concat(
            F.lit("urn:n:"),
            F.when(F.col("s_suppkey") % 7 == 0, (F.col("s_nationkey") + 1) % 25)
            .otherwise(F.col("s_nationkey"))
            .cast("string"),
        ).alias("o_lex"),
        base.alias("o_dtype"),
        base.alias("o_lang"),
        F.lit("urn:g:srcD").alias("graph"),
    )
    all_claims = claims.unionByName(srcD)
    truth = claims.filter(F.col("graph") == "urn:g:srcA").drop("graph")
    return copy_detection(all_claims, truth)


SQL_COPY_DETECT = f"""
WITH {_FUSE_CLAIMS_CTE},
all_claims AS (
  SELECT * FROM claims
  UNION ALL
  SELECT 'urn:su:' || s_suppkey, 'urn:p:inNation',
         'urn:n:' || CASE WHEN s_suppkey % 7 = 0 THEN (s_nationkey + 1) % 25
                          ELSE s_nationkey END, 'urn:g:srcD' FROM supplier
),
dedup AS (SELECT DISTINCT s_lex, pred, o_lex, graph FROM all_claims),
truth AS (
  SELECT DISTINCT s_lex, pred, o_lex FROM claims WHERE graph = 'urn:g:srcA'
),
lab AS (
  SELECT d.s_lex, d.pred, d.o_lex, d.graph,
         CASE WHEN t.s_lex IS NOT NULL THEN 1 ELSE 0 END AS is_true
  FROM dedup d LEFT JOIN truth t
    ON t.s_lex = d.s_lex AND t.pred = d.pred AND t.o_lex = d.o_lex
),
pairs AS (
  SELECT a.graph AS src_a, b.graph AS src_b, a.is_true
  FROM lab a JOIN lab b
    ON a.s_lex = b.s_lex AND a.pred = b.pred AND a.o_lex = b.o_lex
  WHERE a.graph < b.graph
),
shared AS (
  SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_shared,
         CAST(SUM(1 - is_true) AS BIGINT) AS n_shared_false
  FROM pairs GROUP BY src_a, src_b
),
sizes AS (SELECT graph, COUNT(*) AS n FROM dedup GROUP BY graph)
SELECT s.src_a, s.src_b, s.n_shared, s.n_shared_false,
       CAST(CASE WHEN n_shared = 0 THEN 0
                 ELSE n_shared_false * 1000000 // n_shared END AS BIGINT) AS shared_false_ppm,
       CAST(n_shared * 1000000 // (sa.n + sb.n - n_shared) AS BIGINT) AS overlap_ppm
FROM shared s
JOIN sizes sa ON sa.graph = s.src_a
JOIN sizes sb ON sb.graph = s.src_b
"""

QUERIES["copy_detect"] = (q_copy_detect, SQL_COPY_DETECT)


def q_temporal_reach(spark, sf):
    """Earliest-arrival temporal reachability over the customer chain
    with NON-MONOTONE edge times ts(k) = (k*7) % 29 — the causality
    filter prunes hops whose edge fired before the information arrived;
    6 relaxation rounds, seeds = lowest-key customers."""
    from .operators.temporal import earliest_arrival

    cu = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("k")
    )
    ks = cu.select(F.col("k").alias("d"))
    e = cu.select("k", (F.col("k") + 1).alias("d")).join(ks, "d").select(
        F.col("k").cast("string").alias("src"),
        F.col("d").cast("string").alias("dst"),
        ((F.col("k") * 7) % 29).alias("ts"),
    )
    seeds = cu.filter(F.col("k") <= 1).select(F.col("k").cast("string").alias("node"))
    return earliest_arrival(e, seeds, max_rounds=6)


def _sql_temporal_reach(rounds: int) -> str:
    seed_ts = -(2**62)
    head = f"""
WITH cu AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
e AS MATERIALIZED (
  SELECT CAST(k AS VARCHAR) AS src, CAST(k + 1 AS VARCHAR) AS dst,
         (k * 7) % 29 AS ts
  FROM cu WHERE k + 1 IN (SELECT k FROM cu)
),
d0 AS MATERIALIZED (
  SELECT CAST(k AS VARCHAR) AS node, CAST({seed_ts} AS BIGINT) AS arrival
  FROM cu WHERE k <= 1
),
f0 AS MATERIALIZED (SELECT * FROM d0)"""
    blocks = []
    for i in range(rounds):
        blocks.append(f""",
rx{i} AS MATERIALIZED (
  SELECT e.dst AS node, MIN(e.ts) AS cand
  FROM f{i} f JOIN e ON e.src = f.node WHERE e.ts >= f.arrival
  GROUP BY e.dst
),
f{i + 1} AS MATERIALIZED (
  SELECT r.node, r.cand AS arrival
  FROM rx{i} r LEFT JOIN d{i} d ON d.node = r.node
  WHERE d.node IS NULL OR r.cand < d.arrival
),
d{i + 1} AS MATERIALIZED (
  SELECT COALESCE(d.node, f.node) AS node,
         least(COALESCE(d.arrival, {2**62}), COALESCE(f.arrival, {2**62})) AS arrival
  FROM d{i} d FULL OUTER JOIN f{i + 1} f ON f.node = d.node
)""")
        final = f"\nSELECT node, CAST(arrival AS BIGINT) AS arrival FROM d{i + 1}"
    return head + "".join(blocks) + final


SQL_TEMPORAL_REACH = _sql_temporal_reach(6)

QUERIES["temporal_reach"] = (q_temporal_reach, SQL_TEMPORAL_REACH)


def q_louvain_contract(spark, sf):
    """Louvain phase-2: contract the chain+chord customer graph by its
    nation partition — the weighted nation super-graph whose diagonal
    counts intra-nation edges."""
    from .operators.cc import louvain_contract

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    k = F.col("c_custkey").cast("long")
    e = cu.select(k.cast("string").alias("src"), (k + 1).cast("string").alias("dst")).unionByName(
        cu.select(k.cast("string").alias("src"), (k + 2).cast("string").alias("dst"))
    )
    labels = cu.select(
        k.cast("string").alias("node"), F.col("c_nationkey").cast("string").alias("label")
    )
    return louvain_contract(e, labels)


SQL_LOUVAIN_CONTRACT = """
WITH cu AS (
  SELECT CAST(c_custkey AS BIGINT) AS k, CAST(c_nationkey AS VARCHAR) AS nat
  FROM customer
),
e0 AS (
  SELECT CAST(k AS VARCHAR) AS src, CAST(k + 1 AS VARCHAR) AS dst FROM cu
  UNION ALL
  SELECT CAST(k AS VARCHAR), CAST(k + 2 AS VARCHAR) FROM cu
),
e AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
),
nodes AS (SELECT CAST(k AS VARCHAR) AS node, nat FROM cu),
lab AS (
  SELECT la.nat AS la, lb.nat AS lb
  FROM e JOIN nodes la ON la.node = e.a JOIN nodes lb ON lb.node = e.b
)
SELECT least(la, lb) AS src, greatest(la, lb) AS dst,
       CAST(COUNT(*) AS BIGINT) AS weight
FROM lab GROUP BY 1, 2
"""

QUERIES["louvain_contract"] = (q_louvain_contract, SQL_LOUVAIN_CONTRACT)


def q_louvain_level2(spark, sf):
    """Weighted Louvain sweep on the CONTRACTED nation super-graph
    (self-loops = intra-nation mass entering strength, never gains) —
    the multi-level loop's level-2 step, exact-integer ΔQ argmax."""
    from .operators.cc import louvain_contract, louvain_move_w

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    k = F.col("c_custkey").cast("long")
    e = cu.select(k.cast("string").alias("src"), (k + 1).cast("string").alias("dst")).unionByName(
        cu.select(k.cast("string").alias("src"), (k + 2).cast("string").alias("dst"))
    )
    labels = cu.select(
        k.cast("string").alias("node"), F.col("c_nationkey").cast("string").alias("label")
    )
    sup = louvain_contract(e, labels)
    return louvain_move_w(sup)


SQL_LOUVAIN_LEVEL2 = """
WITH cu AS (
  SELECT CAST(c_custkey AS BIGINT) AS k, CAST(c_nationkey AS VARCHAR) AS nat
  FROM customer
),
e0 AS (
  SELECT CAST(k AS VARCHAR) AS src, CAST(k + 1 AS VARCHAR) AS dst FROM cu
  UNION ALL
  SELECT CAST(k AS VARCHAR), CAST(k + 2 AS VARCHAR) FROM cu
),
base AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
),
nodes AS (SELECT CAST(k AS VARCHAR) AS node, nat FROM cu),
sup AS (
  SELECT least(la.nat, lb.nat) AS a, greatest(la.nat, lb.nat) AS b,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM base JOIN nodes la ON la.node = base.a JOIN nodes lb ON lb.node = base.b
  GROUP BY 1, 2
),
selfw AS (SELECT a AS node, w AS sw FROM sup WHERE a = b),
ee AS (SELECT a, b, w FROM sup WHERE a <> b),
bi AS (
  SELECT a AS src, b AS dst, w FROM ee
  UNION ALL SELECT b, a, w FROM ee
),
allnodes AS (
  SELECT src AS node FROM bi UNION SELECT node FROM selfw
),
s AS (SELECT src AS node, SUM(w) AS s FROM bi GROUP BY src),
deg AS (
  SELECT n.node, COALESCE(s.s, 0) + 2 * COALESCE(sw.sw, 0) AS k
  FROM allnodes n LEFT JOIN s ON s.node = n.node LEFT JOIN selfw sw ON sw.node = n.node
),
m2 AS (
  SELECT COALESCE((SELECT SUM(w) FROM bi), 0)
         + 2 * COALESCE((SELECT SUM(sw) FROM selfw), 0) AS m2
),
lab AS (SELECT node, node AS label FROM allnodes),
tot AS (
  SELECT l.label, SUM(d.k) AS sigma FROM lab l JOIN deg d ON d.node = l.node GROUP BY l.label
),
nbrc AS (
  SELECT bi.src AS node, l.label AS c, SUM(bi.w) AS kic
  FROM bi JOIN lab l ON l.node = bi.dst GROUP BY bi.src, l.label
),
cand AS (
  SELECT node, c, MAX(kic) AS kic FROM (
    SELECT node, c, kic FROM nbrc
    UNION ALL SELECT node, label AS c, 0 FROM lab
  ) GROUP BY node, c
),
scored AS (
  SELECT cand.node, cand.c,
         m2.m2 * cand.kic
         - (tot.sigma - CASE WHEN cand.c = lab.label THEN deg.k ELSE 0 END) * deg.k AS g
  FROM cand
  JOIN deg ON deg.node = cand.node
  JOIN tot ON tot.label = cand.c
  JOIN lab ON lab.node = cand.node
  CROSS JOIN m2
),
pick AS (
  SELECT node, c AS new_label,
         ROW_NUMBER() OVER (PARTITION BY node ORDER BY g DESC, c ASC) AS rn
  FROM scored
)
SELECT lab.node, COALESCE(p.new_label, lab.label) AS label
FROM lab LEFT JOIN (SELECT node, new_label FROM pick WHERE rn = 1) p
  ON p.node = lab.node
"""

QUERIES["louvain_level2"] = (q_louvain_level2, SQL_LOUVAIN_LEVEL2)


def q_hyperball_nf(spark, sf):
    """Neighborhood-function curve N(h), h = 0..4, over the customer
    chain — every point equals the HLL estimate of the true ball sets
    {v .. v+h}, summed over nodes."""
    from .operators.cc import hyperball_nf

    cu = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("k")
    )
    ks = cu.select(F.col("k").alias("d"))
    e = cu.select("k", (F.col("k") + 1).alias("d")).join(ks, "d").select(
        F.col("k").cast("string").alias("src"), F.col("d").cast("string").alias("dst")
    )
    return hyperball_nf(e, max_hops=4)


def _sql_hyperball_nf() -> str:
    from .operators.sketches import hll_oracle_sql

    prefix = """WITH cu AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
mx AS (SELECT MAX(k) AS mk FROM cu),
hops AS (SELECT unnest(generate_series(0, 4)) AS hop),
reach AS (
  SELECT hops.hop, CAST(v.k AS VARCHAR) AS node,
         CAST(unnest(generate_series(v.k, least(v.k + hops.hop, mx.mk))) AS VARCHAR) AS member
  FROM cu v CROSS JOIN mx CROSS JOIN hops
),
h AS"""
    inner = hll_oracle_sql("reach", "member", ["hop", "node"], estimate=True).replace(
        "WITH h AS", prefix, 1
    )
    return (
        "SELECT CAST(hop AS INT) AS hop, COUNT(*) AS n_nodes, "
        "CAST(SUM(est) AS BIGINT) AS sum_est FROM (\n" + inner + "\n) GROUP BY hop"
    )


SQL_HYPERBALL_NF = _sql_hyperball_nf()

QUERIES["hyperball_nf"] = (q_hyperball_nf, SQL_HYPERBALL_NF)


def q_sentence_spans(spark, sf):
    """Deterministic sentence segmentation with token-offset spans over
    the documents table — scan-local split + array prefix sum, one
    posexplode, no shuffle."""
    from .operators.textops import sentence_spans

    return sentence_spans(_docs(spark, sf))


SQL_SENTENCE_SPANS = """
WITH pieces AS (
  SELECT doc_id,
         str_split(regexp_replace(text, '([.!?]+)[ \t\n\r]+', '\\1' || chr(30), 'g'),
                   chr(30)) AS p
  FROM documents
),
kept AS (
  SELECT doc_id, list_filter(list_transform(p, x -> trim(x)), x -> x <> '') AS s
  FROM pieces
),
ex AS (
  SELECT doc_id, unnest(generate_series(1, len(s))) AS i, s
  FROM kept WHERE len(s) > 0
),
tok AS (
  SELECT doc_id, CAST(i AS BIGINT) AS sent_id, s[i] AS sent,
         CAST(len(list_filter(str_split(trim(regexp_replace(regexp_replace(lower(s[i]),
           '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '), t -> t <> '')) AS BIGINT) AS n_toks,
         CAST(length(s[i]) AS BIGINT) AS n_chars
  FROM ex
)
SELECT doc_id, sent_id,
       CAST(COALESCE(SUM(n_toks) OVER (PARTITION BY doc_id ORDER BY sent_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok,
       n_toks, n_chars, sent
FROM tok
"""

QUERIES["sentence_spans"] = (q_sentence_spans, SQL_SENTENCE_SPANS)


def q_container_members(spark, sf):
    """RDF container (Seq/Bag/Alt) membership flattening: one container
    per region holding its nations as rdf:_n members plus a literal
    member at idx 99; regions 0-2 carry a type arc (Seq/Bag/Alt by key
    mod 3), the rest stay untyped; decoy arcs (non-membership preds)
    must be ignored by the rlike prefix filter."""
    from pyspark.sql.window import Window

    from .operators.canon import container_members
    from .types import RDF_NS, RDF_TYPE

    na = spark.read.parquet(f"{sf}/nation.parquet")
    re_ = spark.read.parquet(f"{sf}/region.parquet")
    w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
    rows = na.select(
        F.col("n_regionkey").alias("rk"),
        F.col("n_nationkey").alias("nk"),
        F.row_number().over(w).alias("i"),
    )
    cont = F.concat(F.lit("urn:c:"), F.col("rk").cast("string"))
    members = rows.select(
        cont.alias("s_lex"),
        F.concat(F.lit(RDF_NS + "_"), F.col("i").cast("string")).alias("pred"),
        F.lit(0).cast("tinyint").alias("o_kind"),
        F.concat(F.lit("urn:n:"), F.col("nk").cast("string")).alias("o_lex"),
        F.lit(None).cast("string").alias("o_dtype"),
    )
    rcont = F.concat(F.lit("urn:c:"), F.col("r_regionkey").cast("string"))
    lits = re_.select(
        rcont.alias("s_lex"),
        F.lit(RDF_NS + "_99").alias("pred"),
        F.lit(2).cast("tinyint").alias("o_kind"),
        F.col("r_name").alias("o_lex"),
        F.lit(None).cast("string").alias("o_dtype"),
    )
    types_ = re_.filter(F.col("r_regionkey") < 3).select(
        rcont.alias("s_lex"),
        F.lit(RDF_TYPE).alias("pred"),
        F.lit(0).cast("tinyint").alias("o_kind"),
        F.concat(
            F.lit(RDF_NS),
            F.element_at(
                F.array(F.lit("Seq"), F.lit("Bag"), F.lit("Alt")),
                (F.col("r_regionkey") % 3 + 1).cast("int"),
            ),
        ).alias("o_lex"),
        F.lit(None).cast("string").alias("o_dtype"),
    )
    decoys = re_.select(
        rcont.alias("s_lex"),
        F.lit(RDF_NS + "_1a").alias("pred"),  # non-numeric suffix: not a member
        F.lit(2).cast("tinyint").alias("o_kind"),
        F.lit("decoy").alias("o_lex"),
        F.lit(None).cast("string").alias("o_dtype"),
    ).unionByName(
        re_.select(
            rcont.alias("s_lex"),
            F.lit(RDF_NS + "value").alias("pred"),
            F.lit(2).cast("tinyint").alias("o_kind"),
            F.lit("decoy2").alias("o_lex"),
            F.lit(None).cast("string").alias("o_dtype"),
        )
    )
    quads = members.unionByName(lits).unionByName(types_).unionByName(decoys)
    return container_members(quads)


SQL_CONTAINER_MEMBERS = """
WITH rows_ AS (
  SELECT n_regionkey AS rk, n_nationkey AS nk,
         ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS i
  FROM nation
),
mem AS (
  SELECT 'urn:c:' || CAST(rk AS VARCHAR) AS container, CAST(i AS BIGINT) AS idx,
         0 AS o_kind, 'urn:n:' || CAST(nk AS VARCHAR) AS item,
         CAST(NULL AS VARCHAR) AS o_dtype
  FROM rows_
  UNION ALL
  SELECT 'urn:c:' || CAST(r_regionkey AS VARCHAR), 99, 2, r_name, NULL FROM region
),
ct AS (
  SELECT 'urn:c:' || CAST(r_regionkey AS VARCHAR) AS container,
         CASE r_regionkey % 3 WHEN 0 THEN 'Seq' WHEN 1 THEN 'Bag' ELSE 'Alt' END AS ctype
  FROM region WHERE r_regionkey < 3
)
SELECT mem.container, ct.ctype, mem.idx, mem.o_kind, mem.item, mem.o_dtype
FROM mem LEFT JOIN ct ON ct.container = mem.container
"""

QUERIES["container_members"] = (q_container_members, SQL_CONTAINER_MEMBERS)


def q_katz(spark, sf):
    """Katz centrality (3 truncated rounds, alpha = 0.20, integer-exact)
    over the chain-with-chords customer graph — per round one hash join
    + one map-side-combined dst sum."""
    from .operators.cc import katz_centrality

    _r, e = _chain_graph(spark, sf)
    return katz_centrality(e, iters=3, alpha_pct=20)


def _katz_sql(iters: int) -> str:
    parts = [
        "WITH "
        + _CHAIN_SQL
        + """,
e AS (SELECT DISTINCT src, dst FROM raw),
n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
x0 AS (SELECT node, CAST(1000000 AS BIGINT) AS katz FROM n)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
x{t} AS (
  SELECT n.node,
         CAST(1000000 + (20 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS katz
  FROM n LEFT JOIN (
    SELECT e.dst, CAST(SUM(x.katz) AS BIGINT) AS s
    FROM e JOIN x{t - 1} x ON x.node = e.src GROUP BY e.dst
  ) c ON c.dst = n.node
)"""
        )
    parts.append(f"\nSELECT node, katz FROM x{iters}")
    return "".join(parts)


SQL_KATZ = _katz_sql(3)

QUERIES["katz"] = (q_katz, SQL_KATZ)


def q_butterflies(spark, sf):
    """Butterfly counting on a bounded-degree customer bipartite graph:
    rights are two staggered membership groups g=⌊k/50⌋ and h=⌊(k+25)/50⌋
    (degree ≤ 50 at EVERY scale — right degree is a fixture constant, so
    wedge volume grows linearly with the corpus, the operator's design
    point) plus one planted boilerplate hub 'all' connected to every
    customer, which the cap (100) drops at every SF — the guard is
    exercised, never load-bearing on a mega-wedge. Two customers in the
    same g AND h group (the 25-key run overlap) share 2 rights → one
    butterfly per pair; top-20 by count."""
    from .operators.cc import butterfly_counts

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    k = F.col("c_custkey").cast("long")
    e = (
        cu.select(
            k.cast("string").alias("l"),
            F.concat(F.lit("g"), (k / 50).cast("long").cast("string")).alias("r"),
        )
        .unionByName(
            cu.select(
                k.cast("string").alias("l"),
                F.concat(F.lit("h"), ((k + 25) / 50).cast("long").cast("string")).alias("r"),
            )
        )
        .unionByName(cu.select(k.cast("string").alias("l"), F.lit("all").alias("r")))
    )
    return butterfly_counts(e, max_right_degree=100, k=20)


SQL_BUTTERFLIES = """
WITH e AS (
  SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS l,
         'g' || CAST(c_custkey // 50 AS VARCHAR) AS r FROM customer
  UNION
  SELECT DISTINCT CAST(c_custkey AS VARCHAR),
         'h' || CAST((c_custkey + 25) // 50 AS VARCHAR) FROM customer
  UNION
  SELECT DISTINCT CAST(c_custkey AS VARCHAR), 'all' FROM customer
),
deg AS (SELECT r, COUNT(*) AS rdeg FROM e GROUP BY r),
bounded AS (SELECT l, e.r FROM e JOIN deg ON deg.r = e.r WHERE deg.rdeg <= 100),
wedges AS (
  SELECT a.l AS l1, b.l AS l2 FROM bounded a JOIN bounded b
  ON a.r = b.r AND a.l < b.l
),
pairs AS (SELECT l1, l2, COUNT(*) AS c FROM wedges GROUP BY 1, 2 HAVING COUNT(*) >= 2),
pp AS (SELECT l1, l2, CAST(c * (c - 1) // 2 AS BIGINT) AS bf FROM pairs),
credit AS (SELECT l1 AS l, bf FROM pp UNION ALL SELECT l2, bf FROM pp)
SELECT l, CAST(COUNT(*) AS BIGINT) AS n_pairs, CAST(SUM(bf) AS BIGINT) AS n_butterflies
FROM credit GROUP BY l
ORDER BY n_butterflies DESC, l ASC LIMIT 20
"""

QUERIES["butterflies"] = (q_butterflies, SQL_BUTTERFLIES)


def q_dsir(spark, sf):
    """DSIR importance weights of the whole corpus toward the English
    slice (lang = 'en') — hashed-unigram target/raw models (256 buckets,
    broadcast-sized forever), integer-quantized ratio sums."""
    from .operators.selection import dsir_weights

    docs = _docs(spark, sf)
    target = docs.filter(F.col("lang") == "en").select("doc_id", "text")
    return dsir_weights(docs, target, buckets=256, scale=1_000_000)


SQL_DSIR = """
WITH tb AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT % 256 AS b
  FROM (
    SELECT doc_id, unnest(list_filter(str_split(trim(regexp_replace(regexp_replace(
             lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
             t -> t <> '')) AS tok
    FROM documents
  )
),
tgt AS (
  SELECT ('0x' || substr(md5(tok), 1, 15))::BIGINT % 256 AS b
  FROM (
    SELECT unnest(list_filter(str_split(trim(regexp_replace(regexp_replace(
             lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
             t -> t <> '')) AS tok
    FROM documents WHERE lang = 'en'
  )
),
raw_cnt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS r_cnt FROM tb GROUP BY b),
tgt_cnt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS t_cnt FROM tgt GROUP BY b),
tots AS (
  SELECT (SELECT COUNT(*) FROM tb) AS r_tot, (SELECT COUNT(*) FROM tgt) AS t_tot
),
ratio AS (
  SELECT raw_cnt.b,
         CAST((1000000 * ((1000000 * (COALESCE(t_cnt, 0) + 1)) // (t_tot + 256)))
              // GREATEST((1000000 * (r_cnt + 1)) // (r_tot + 256), 1) AS BIGINT) AS ratio
  FROM raw_cnt LEFT JOIN tgt_cnt ON tgt_cnt.b = raw_cnt.b CROSS JOIN tots
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(ratio) AS BIGINT) AS w_sum,
       CAST(SUM(ratio) // COUNT(*) AS BIGINT) AS w_avg,
       (SUM(ratio) // COUNT(*)) >= 1000000 AS selected
FROM tb JOIN ratio ON ratio.b = tb.b
GROUP BY doc_id
"""

QUERIES["dsir"] = (q_dsir, SQL_DSIR)


def q_eff_diameter(spark, sf):
    """Effective diameter (90th-percentile interpolated hop count) from
    the HyperBall N(h) curve over the customer chain — the ANF headline
    statistic; everything past the audited rounds is curve-sized."""
    from .operators.cc import effective_diameter

    cu = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("k")
    )
    ks = cu.select(F.col("k").alias("d"))
    e = cu.select("k", (F.col("k") + 1).alias("d")).join(ks, "d").select(
        F.col("k").cast("string").alias("src"), F.col("d").cast("string").alias("dst")
    )
    return effective_diameter(e, max_hops=4, pct=90)


def _sql_eff_diameter() -> str:
    nf = _sql_hyperball_nf()
    return f"""
WITH nf AS ({nf}),
lastv AS (SELECT sum_est AS nH FROM nf WHERE hop = 4),
cur AS (
  SELECT hop, n_nodes, sum_est AS nh, LAG(sum_est) OVER (ORDER BY hop) AS prev
  FROM nf
),
q AS (
  SELECT cur.hop, cur.n_nodes, cur.nh, cur.prev, lastv.nH
  FROM cur CROSS JOIN lastv WHERE 100 * cur.nh >= 90 * lastv.nH
),
pick AS (SELECT * FROM q ORDER BY hop LIMIT 1)
SELECT CAST(90 AS INT) AS pct, CAST(4 AS INT) AS max_hops,
       CAST(n_nodes AS BIGINT) AS n_nodes, CAST(nH AS BIGINT) AS est_total,
       CAST(CASE WHEN hop = 0 THEN 0
                 ELSE 1000 * (hop - 1)
                      + 1000 * (90 * nH - 100 * prev) // (100 * (nh - prev))
            END AS BIGINT) AS d_eff_milli
FROM pick
"""


SQL_EFF_DIAMETER = _sql_eff_diameter()

QUERIES["eff_diameter"] = (q_eff_diameter, SQL_EFF_DIAMETER)


def q_bowtie(spark, sf):
    """Broder bow-tie decomposition of the chain-with-chords graph
    relative to the rn=5 seed per nation (3-hop bound): CORE = the
    seeds, IN = upstream chain, OUT = 6 chain positions downstream,
    OTHER = beyond the bound — closed-form oracle-able because min hop
    count over +1/+2 edges is ceil(gap/2)."""
    from .operators.cc import bowtie_classify

    r, e = _chain_graph(spark, sf)
    seeds = r.filter(F.col("rn") == 5).select(F.col("k").alias("node"))
    out = bowtie_classify(e, seeds, max_hops=3)
    # nullable BIGINTs arrive from DuckDB->pandas as float NaN; the suite
    # convention serializes nullable numerics as VARCHAR on both sides
    return out.select(
        "node", "cls",
        F.col("f_dist").cast("string").alias("f_dist"),
        F.col("b_dist").cast("string").alias("b_dist"),
    )


SQL_BOWTIE = """
WITH r AS (
  SELECT CAST(c_custkey AS VARCHAR) AS kk, c_nationkey,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
  FROM customer
),
cnt AS (SELECT c_nationkey AS nk, COUNT(*) AS n FROM customer GROUP BY 1),
u AS (
  SELECT r.kk AS node, r.rn, cnt.n
  FROM r JOIN cnt ON cnt.nk = r.c_nationkey WHERE cnt.n >= 2
),
d AS (
  SELECT node,
         CASE WHEN n >= 5 AND rn >= 5 AND rn - 5 <= 6
              THEN CAST((rn - 4) // 2 AS VARCHAR) END AS f_dist,
         CASE WHEN n >= 5 AND rn <= 5 AND 5 - rn <= 6
              THEN CAST((6 - rn) // 2 AS VARCHAR) END AS b_dist
  FROM u
)
SELECT node,
       CASE WHEN f_dist IS NOT NULL AND b_dist IS NOT NULL THEN 'CORE'
            WHEN b_dist IS NOT NULL THEN 'IN'
            WHEN f_dist IS NOT NULL THEN 'OUT'
            ELSE 'OTHER' END AS cls,
       f_dist, b_dist
FROM d
"""

QUERIES["bowtie"] = (q_bowtie, SQL_BOWTIE)


def q_weighted_sample(spark, sf):
    """Deterministic weighted 5-sample per market segment, weight =
    account balance shifted positive — the quality-weighted corpus
    sampler; ONE group-keyed top-k window."""
    from .operators.sketches import weighted_sample

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    w = F.round(F.col("c_acctbal") * 100).cast("long") + 100000
    return weighted_sample(cu, "c_mktsegment", "c_custkey", w, k=5)


SQL_WEIGHTED_SAMPLE = """
WITH s AS (
  SELECT c_mktsegment AS grp, c_custkey AS id,
         GREATEST(CAST(round(c_acctbal * 100) AS BIGINT) + 100000, 1) AS w,
         ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM customer
),
p AS (SELECT grp, id, w, h // w AS r FROM s),
rk AS (
  SELECT grp, id, w, CAST(r AS BIGINT) AS r,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY r ASC, id ASC) AS rank
  FROM p
)
SELECT grp, id, w, r, CAST(rank AS INT) AS rank FROM rk WHERE rank <= 5
"""

QUERIES["weighted_sample"] = (q_weighted_sample, SQL_WEIGHTED_SAMPLE)


def q_surt(spark, sf):
    """SURT layout keys (the cc-index/CDX sort key) over the messy-URL
    corpus — map-only; non-web rows yield NULL keys by contract."""
    from .operators.urls import surt_key

    return _messy_urls(spark, sf).select(
        "doc_id", "url", surt_key(F.col("url")).alias("surt")
    )


def _sql_surt() -> str:
    from .operators.urls import surt_key_sql

    return f"""
WITH d AS (SELECT doc_id, {_SQL_MESSY_URL} AS url FROM documents)
SELECT doc_id, url, {surt_key_sql('url')} AS surt FROM d
"""


SQL_SURT = _sql_surt()

QUERIES["surt"] = (q_surt, SQL_SURT)


def q_salsa(spark, sf):
    """SALSA hub/authority (2 integer-exact rounds) over the
    chain-with-chords graph — random-walk-normalized HITS; per
    half-round one hash join + one map-side-combined sum."""
    from .operators.cc import salsa

    _r, e = _chain_graph(spark, sf)
    return salsa(e, iters=2)


def _salsa_sql(iters: int) -> str:
    parts = [
        "WITH "
        + _CHAIN_SQL
        + """,
e AS (SELECT DISTINCT src, dst FROM raw),
n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
od AS (SELECT src, COUNT(*) AS outd FROM e GROUP BY src),
idg AS (SELECT dst, COUNT(*) AS ind FROM e GROUP BY dst),
ew AS (
  SELECT e.src, e.dst, od.outd, idg.ind
  FROM e JOIN od ON od.src = e.src JOIN idg ON idg.dst = e.dst
),
h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS hub FROM n)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
a{t} AS (
  SELECT n.node, CAST(COALESCE(c.s, 0) AS BIGINT) AS auth
  FROM n LEFT JOIN (
    SELECT ew.dst, SUM(h.hub // ew.outd) AS s
    FROM ew JOIN h{t - 1} h ON h.node = ew.src GROUP BY ew.dst
  ) c ON c.dst = n.node
),
h{t} AS (
  SELECT n.node, CAST(COALESCE(c.s, 0) AS BIGINT) AS hub
  FROM n LEFT JOIN (
    SELECT ew.src, SUM(a.auth // ew.ind) AS s
    FROM ew JOIN a{t} a ON a.node = ew.dst GROUP BY ew.src
  ) c ON c.src = n.node
)"""
        )
    parts.append(
        f"""
SELECT n.node, h{iters}.hub, a{iters}.auth
FROM n JOIN h{iters} ON h{iters}.node = n.node
       JOIN a{iters} ON a{iters}.node = n.node"""
    )
    return "".join(parts)


SQL_SALSA = _salsa_sql(2)

QUERIES["salsa"] = (q_salsa, SQL_SALSA)


def q_mis(spark, sf):
    """Deterministic Luby maximal independent set over the (symmetrized)
    chain-with-chords graph — md5 priorities, strictly-smaller-than-all-
    active-neighbors election, 8-round bound (the fixture converges well
    inside it; the oracle unrolls the same rounds)."""
    from .operators.cc import luby_mis

    _r, e = _chain_graph(spark, sf)
    return luby_mis(e, max_rounds=8)


def _mis_sql(rounds: int) -> str:
    parts = [
        "WITH "
        + _CHAIN_SQL
        + """,
e0 AS (SELECT src, dst FROM raw WHERE src <> dst),
und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
  )
),
act1 AS MATERIALIZED (
  SELECT node, ('0x' || substr(md5(node), 1, 15))::BIGINT AS p
  FROM (SELECT DISTINCT src AS node FROM und)
)"""
    ]
    sels = []
    for r in range(1, rounds + 1):
        parts.append(
            f""",
sel{r} AS MATERIALIZED (
  SELECT a.node, a.p FROM act{r} a
  WHERE NOT EXISTS (
    SELECT 1 FROM und e JOIN act{r} b ON b.node = e.dst
    WHERE e.src = a.node
      AND (b.p < a.p OR (b.p = a.p AND b.node < a.node))
  )
),
act{r + 1} AS MATERIALIZED (
  SELECT a.node, a.p FROM act{r} a
  WHERE a.node NOT IN (SELECT node FROM sel{r})
    AND a.node NOT IN (
      SELECT e.dst FROM und e JOIN sel{r} s ON s.node = e.src
    )
)"""
        )
        sels.append(f"SELECT node, CAST({r} AS INT) AS mis_round FROM sel{r}")
    parts.append("\n" + "\nUNION ALL\n".join(sels))
    return "".join(parts)


SQL_MIS = _mis_sql(8)

QUERIES["mis"] = (q_mis, SQL_MIS)


def q_phonetic(spark, sf):
    """Soundex-style phonetic blocking keys (pinned RE2-portable
    variant) over the first word of part names — scan-local key
    derivation, the classic name-ER blocker."""
    from .operators.linking import phonetic_key

    pa = spark.read.parquet(f"{sf}/part.parquet")
    w = F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))
    return pa.select(
        F.col("p_partkey").alias("pk"),
        w.alias("w"),
        phonetic_key(w).alias("skey"),
    )


def _sql_phonetic() -> str:
    from .operators.linking import phonetic_key_sql

    return f"""
WITH p AS (SELECT p_partkey AS pk, split_part(p_name, ' ', 1) AS w FROM part)
SELECT pk, w, {phonetic_key_sql('w')} AS skey FROM p
"""


SQL_PHONETIC = _sql_phonetic()

QUERIES["phonetic"] = (q_phonetic, SQL_PHONETIC)


def q_kappa(spark, sf):
    """Cohen's kappa between two deterministic 'raters' of customer
    segments (rater 2 mislabels every 4th customer with a decoy) —
    the labeled-data QA statistic, exact integer ppm."""
    from .operators.stats import cohen_kappa

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    k = F.col("c_custkey")
    r1 = cu.select(
        k.alias("item"), F.lit("r1").alias("rater"), F.col("c_mktsegment").alias("label")
    )
    r2 = cu.select(
        k.alias("item"),
        F.lit("r2").alias("rater"),
        F.when(k % 4 != 0, F.col("c_mktsegment"))
        .otherwise(F.concat(F.lit("DECOY"), (k % 5).cast("string")))
        .alias("label"),
    )
    return cohen_kappa(r1.unionByName(r2), "r1", "r2")


SQL_KAPPA = """
WITH j AS (
  SELECT c_custkey AS item, c_mktsegment AS la,
         CASE WHEN c_custkey % 4 <> 0 THEN c_mktsegment
              ELSE 'DECOY' || CAST(c_custkey % 5 AS VARCHAR) END AS lb
  FROM customer
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT) AS agree
  FROM j
),
ca AS (SELECT la AS l, CAST(COUNT(*) AS BIGINT) AS na FROM j GROUP BY la),
cb AS (SELECT lb AS l, CAST(COUNT(*) AS BIGINT) AS nb FROM j GROUP BY lb),
pe AS (
  SELECT CAST(COALESCE(SUM(na * nb), 0) AS BIGINT) AS s
  FROM ca JOIN cb ON cb.l = ca.l
),
x AS (
  SELECT n AS n_items, agree AS n_agree,
         CAST(1000000 * agree // n AS BIGINT) AS po_ppm,
         CAST(1000000 * s // (n * n) AS BIGINT) AS pe_ppm
  FROM tot CROSS JOIN pe
)
SELECT n_items, n_agree, po_ppm, pe_ppm,
       CASE WHEN pe_ppm < 1000000
            THEN CAST(1000000 * (po_ppm - pe_ppm) // (1000000 - pe_ppm) AS BIGINT)
       END AS kappa_ppm
FROM x
"""

QUERIES["kappa"] = (q_kappa, SQL_KAPPA)


def q_matching(spark, sf):
    """Locally-dominant greedy matching over the chain-with-chords pairs
    (md5 scores): one-to-one ER assignment — each customer matched at
    most once, deterministic under any partitioning."""
    from .operators.linking import dominant_matching

    _r, e = _chain_graph(spark, sf)
    pairs = e.select(
        F.col("src").alias("a"),
        F.col("dst").alias("b"),
        (
            F.conv(
                F.substring(F.md5(F.concat(F.col("src"), F.lit("|"), F.col("dst"))), 1, 15),
                16, 10,
            ).cast("long")
            % 1000000
        ).alias("score"),
    )
    return dominant_matching(pairs, max_rounds=10)


def _matching_sql(rounds: int) -> str:
    parts = [
        "WITH "
        + _CHAIN_SQL
        + """,
p1 AS MATERIALIZED (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b, MAX(score) AS score
  FROM (
    SELECT src, dst,
           ('0x' || substr(md5(src || '|' || dst), 1, 15))::BIGINT % 1000000 AS score
    FROM (SELECT DISTINCT src, dst FROM raw WHERE src <> dst)
  ) GROUP BY 1, 2
)"""
    ]
    better = (
        "(p2.score > p.score OR (p2.score = p.score AND "
        "(p2.a < p.a OR (p2.a = p.a AND p2.b < p.b))))"
    )
    sels = []
    for r in range(1, rounds + 1):
        parts.append(
            f""",
sel{r} AS MATERIALIZED (
  SELECT p.a, p.b, p.score FROM p{r} p
  WHERE NOT EXISTS (
    SELECT 1 FROM p{r} p2
    WHERE (p2.a = p.a OR p2.b = p.a) AND NOT (p2.a = p.a AND p2.b = p.b)
      AND {better}
  ) AND NOT EXISTS (
    SELECT 1 FROM p{r} p2
    WHERE (p2.a = p.b OR p2.b = p.b) AND NOT (p2.a = p.a AND p2.b = p.b)
      AND {better}
  )
),
m{r} AS MATERIALIZED (SELECT a AS node FROM sel{r} UNION SELECT b FROM sel{r}),
p{r + 1} AS MATERIALIZED (
  SELECT p.a, p.b, p.score FROM p{r} p
  WHERE p.a NOT IN (SELECT node FROM m{r})
    AND p.b NOT IN (SELECT node FROM m{r})
)"""
        )
        sels.append(
            f"SELECT a, b, CAST(score AS BIGINT) AS score, "
            f"CAST({r} AS INT) AS match_round FROM sel{r}"
        )
    parts.append("\n" + "\nUNION ALL\n".join(sels))
    return "".join(parts)


SQL_MATCHING = _matching_sql(10)

QUERIES["matching"] = (q_matching, SQL_MATCHING)


def q_pq(spark, sf):
    """Product-quantization codes (2 blocks x 4 centroids over the
    64-dim embeddings) — the bytes-per-dim compression leg of the
    IVF-PQ stack; each block is the audited integer k-means."""
    from .operators.ann import pq_encode

    return pq_encode(_embs(spark, sf), dim=64, m=2, k=4, iters=2, scale=1000)


def _pq_block_ctes(b: int, bd: int, k: int) -> str:
    lo, hi = b * bd + 1, (b + 1) * bd
    t = f"""
q{b} AS (
  SELECT vec_id,
         list_transform(list_slice(embedding, {lo}, {hi}),
                        x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qe
  FROM embeddings
),
c{b}_0 AS (SELECT CAST(vec_id AS INT) AS cl, qe AS ce FROM q{b} WHERE vec_id < {k})"""
    for it in (1, 2):
        t += f""",
a{b}_{it} AS (
  SELECT vec_id, cl FROM (
    SELECT q.vec_id, c.cl,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_sum(list_transform(range(1, len(q.qe)+1),
                                              i -> (q.qe[i]-c.ce[i])*(q.qe[i]-c.ce[i]))), c.cl
           ) AS rn
    FROM q{b} q CROSS JOIN c{b}_{it - 1} c
  ) WHERE rn = 1
),
c{b}_{it} AS (
  SELECT cl, list(c ORDER BY pos) AS ce FROM (
    SELECT a.cl, r.i AS pos, CAST(floor(AVG(q.qe[r.i])) AS BIGINT) AS c
    FROM q{b} q JOIN a{b}_{it} a USING (vec_id), range(1, {bd + 1}) r(i)
    GROUP BY a.cl, r.i
  ) GROUP BY cl
)"""
    t += f""",
km{b} AS (
  SELECT vec_id, cl AS code FROM (
    SELECT q.vec_id, c.cl,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_sum(list_transform(range(1, len(q.qe)+1),
                                              i -> (q.qe[i]-c.ce[i])*(q.qe[i]-c.ce[i]))), c.cl
           ) AS rn
    FROM q{b} q CROSS JOIN c{b}_2 c
  ) WHERE rn = 1
)"""
    return t


SQL_PQ = (
    "WITH "
    + _pq_block_ctes(0, 32, 4).lstrip()
    + ","
    + _pq_block_ctes(1, 32, 4)
    + """
SELECT km0.vec_id, km0.code AS code_0, km1.code AS code_1
FROM km0 JOIN km1 USING (vec_id)
"""
)

QUERIES["pq"] = (q_pq, SQL_PQ)


def _soft404_docs(spark, sf):
    """Documents with planted soft-404s: every 13th doc becomes a short
    error page (strong signal); doc_id % 13 == 5 docs APPEND one error
    phrase to a long body (a mention, not an error page — must NOT
    flag). The same CASE is synthesized in the oracle."""
    d = F.col("doc_id")
    txt = (
        F.when(d % 13 == 0, F.lit("Oops! Error 404 - page not found. It does not exist."))
        .when(d % 13 == 5, F.concat(F.col("text"), F.lit(" note: one page has been removed")))
        .otherwise(F.col("text"))
    )
    return _docs(spark, sf).withColumn("text", txt)


_SQL_SOFT404_TEXT = """
  CASE WHEN doc_id % 13 = 0 THEN 'Oops! Error 404 - page not found. It does not exist.'
       WHEN doc_id % 13 = 5 THEN text || ' note: one page has been removed'
       ELSE text END
"""


def q_soft404(spark, sf):
    """Soft-404 detection over the planted corpus — map-only phrase
    battery + token count; strong (≥2 hits) or short-body-weak rule."""
    from .operators.textops import soft404_flags

    return soft404_flags(_soft404_docs(spark, sf))


def _sql_soft404() -> str:
    from .operators.textops import SOFT404_PATTERNS

    return f"""
WITH d AS (SELECT doc_id, {_SQL_SOFT404_TEXT} AS text FROM documents),
x AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '{SOFT404_PATTERNS}')) AS INT) AS n_hits,
         CAST(len(list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '), t -> t <> '')) AS BIGINT) AS n_toks
  FROM d
)
SELECT doc_id, n_hits, n_toks,
       (n_hits >= 2 OR (n_hits >= 1 AND n_toks < 50)) AS is_soft404
FROM x
"""


SQL_SOFT404 = _sql_soft404()

QUERIES["soft404"] = (q_soft404, SQL_SOFT404)


def q_postings(spark, sf):
    """Positional inverted index over documents — (term, doc, tf,
    positions CSV); one (term, doc)-keyed map-side-combined shuffle."""
    from .operators.textops import build_postings

    return build_postings(_docs(spark, sf))


SQL_POSTINGS = """
WITH nt AS (
  SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
  FROM documents
),
d AS (SELECT doc_id, toks FROM nt WHERE len(toks) > 0 AND toks[1] <> ''),
p AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS i, toks FROM d),
x AS (SELECT toks[i] AS term, doc_id, i FROM p WHERE toks[i] <> '')
SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf,
       array_to_string(list_sort(list(i)), ',') AS pos_csv
FROM x GROUP BY term, doc_id
"""

QUERIES["postings"] = (q_postings, SQL_POSTINGS)


def q_phrase(spark, sf):
    """Exact phrase search 'fast table' via positional-index adjacency
    (shift + intersect over per-word position sets) — the corpus text is
    never rescanned per query."""
    from .operators.textops import phrase_search

    return phrase_search(_docs(spark, sf), ["fast", "table"])


SQL_PHRASE = """
WITH nt AS (
  SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
  FROM documents
),
d AS (SELECT doc_id, toks FROM nt WHERE len(toks) > 0 AND toks[1] <> ''),
p AS (SELECT doc_id, unnest(generate_series(1, len(toks))) AS i, toks FROM d),
x AS (SELECT doc_id, i, toks[i] AS t FROM p),
p0 AS (SELECT doc_id, list_sort(list(i)) AS l FROM x WHERE t = 'fast' GROUP BY doc_id),
p1 AS (SELECT doc_id, list_sort(list(i)) AS l FROM x WHERE t = 'table' GROUP BY doc_id)
SELECT p0.doc_id,
       CAST(len(list_intersect(list_transform(p0.l, y -> y + 1), p1.l)) AS BIGINT)
         AS n_occurrences
FROM p0 JOIN p1 USING (doc_id)
WHERE len(list_intersect(list_transform(p0.l, y -> y + 1), p1.l)) >= 1
"""

QUERIES["phrase"] = (q_phrase, SQL_PHRASE)


def q_cluster_split(spark, sf):
    """Leak-free splits: near-dup clusters (the audited dedup pipeline)
    hashed to train/val/test BY CLUSTER, so no dup pair straddles
    splits."""
    from .operators.textops import cluster_aware_split

    return cluster_aware_split(_docs(spark, sf), bands=8, band_min=4, jac_min=60)


SQL_CLUSTER_SPLIT = (
    "SELECT doc_id, cluster_id,\n"
    "  CASE WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15))::BIGINT % 10 < 8 THEN 'train'\n"
    "       WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15))::BIGINT % 10 < 9 THEN 'val'\n"
    "       ELSE 'test' END AS split\n"
    "FROM (\n" + SQL_DEDUP_CLUSTERS + "\n)"
)

QUERIES["cluster_split"] = (q_cluster_split, SQL_CLUSTER_SPLIT)


def q_filter_funnel(spark, sf):
    """Quality-filter funnel over documents — marginal kill counts per
    cascade stage, ONE fused text scan + constant-width melt."""
    from .operators.textops import filter_funnel

    return filter_funnel(_docs(spark, sf))


SQL_FILTER_FUNNEL = """
WITH f AS (
  SELECT
    len(list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),
        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '), t -> t <> '')) >= 10 AS f1,
    length(text) <= 20000 AS f2,
    strpos(text, chr(65533)) = 0 AS f3,
    (length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) * 4 <= length(text) AS f4
  FROM documents
),
a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
         CAST(SUM(CASE WHEN f1 AND f2 AND f3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
         CAST(SUM(CASE WHEN f1 AND f2 AND f3 AND f4 THEN 1 ELSE 0 END) AS BIGINT) AS s4
  FROM f
)
SELECT 1 AS stage, 'min_tokens' AS name, n AS n_in, n - s1 AS n_killed, s1 AS n_out FROM a
UNION ALL SELECT 2, 'max_chars', s1, s1 - s2, s2 FROM a
UNION ALL SELECT 3, 'no_mojibake', s2, s2 - s3, s3 FROM a
UNION ALL SELECT 4, 'digit_ratio', s3, s3 - s4, s4 FROM a
"""

QUERIES["filter_funnel"] = (q_filter_funnel, SQL_FILTER_FUNNEL)


def q_log_asof(spark, sf):
    """Assert/retract fact-log replay AS OF 1995-06-01: status facts
    assert at order date; every 3rd order retracts at +10d; every 9th
    re-asserts at +20d; every 5th carries a same-ts retract (the pinned
    delete-over-insert tie). ONE fact-keyed max_by aggregate."""
    from .operators.temporal import log_replay_asof

    o = spark.read.parquet(f"{sf}/orders.parquet")
    k = F.col("o_orderkey")
    t0 = F.unix_micros(F.col("o_orderdate").cast("timestamp_ltz"))
    DAY = 86_400_000_000

    def entry(df, op, ts):
        return df.select(
            F.concat(F.lit("urn:o:"), k.cast("string")).alias("s_lex"),
            F.lit("urn:x:status").alias("pred"),
            F.lit(2).cast("int").alias("o_kind"),
            F.col("o_orderstatus").alias("o_lex"),
            F.lit(None).cast("string").alias("o_dtype"),
            F.lit(op).alias("op"),
            ts.cast("long").alias("ts_us"),
        )

    log = (
        entry(o, "assert", t0)
        .unionByName(entry(o.filter(k % 3 == 0), "retract", t0 + 10 * DAY))
        .unionByName(entry(o.filter(k % 9 == 0), "assert", t0 + 20 * DAY))
        .unionByName(entry(o.filter(k % 5 == 0), "retract", t0))
    )
    return log_replay_asof(log, 801_964_800_000_000)


SQL_LOG_ASOF = """
WITH f AS (
  SELECT 'urn:o:' || CAST(o_orderkey AS VARCHAR) AS s_lex,
         'urn:x:status' AS pred, CAST(2 AS INT) AS o_kind,
         o_orderstatus AS o_lex, CAST(NULL AS VARCHAR) AS o_dtype,
         o_orderkey AS k, epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS t0
  FROM orders
),
log AS (
  SELECT s_lex, pred, o_kind, o_lex, o_dtype, 'assert' AS op, t0 AS ts FROM f
  UNION ALL
  SELECT s_lex, pred, o_kind, o_lex, o_dtype, 'retract', t0 + 864000000000 FROM f WHERE k % 3 = 0
  UNION ALL
  SELECT s_lex, pred, o_kind, o_lex, o_dtype, 'assert', t0 + 1728000000000 FROM f WHERE k % 9 = 0
  UNION ALL
  SELECT s_lex, pred, o_kind, o_lex, o_dtype, 'retract', t0 FROM f WHERE k % 5 = 0
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY s_lex, pred, o_kind, o_lex, o_dtype
    ORDER BY ts DESC, CASE WHEN op = 'retract' THEN 1 ELSE 0 END DESC
  ) AS rn
  FROM log WHERE ts <= 801964800000000
)
SELECT s_lex, pred, o_kind, o_lex, o_dtype FROM ranked WHERE rn = 1 AND op = 'assert'
"""

QUERIES["log_asof"] = (q_log_asof, SQL_LOG_ASOF)


def q_rrf(spark, sf):
    """Reciprocal-rank fusion of two deterministic top-30 document runs
    (length-ranked vs hash-ranked) — the hybrid-retrieval combiner;
    integer 1/(60+rank) masses, deterministic tie order."""
    from pyspark.sql.window import Window

    from .operators.textops import rrf_fuse

    d = _docs(spark, sf)
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast("long")
    w1 = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    w2 = Window.orderBy(h.asc(), F.asc("doc_id"))
    r1 = d.select(
        F.lit("len").alias("run"), "doc_id", F.row_number().over(w1).alias("rank")
    ).filter(F.col("rank") <= 30)
    r2 = d.select(
        F.lit("hash").alias("run"), "doc_id", F.row_number().over(w2).alias("rank")
    ).filter(F.col("rank") <= 30)
    return rrf_fuse(r1.unionByName(r2), k=60)


SQL_RRF = """
WITH r1 AS (
  SELECT 'len' AS run, doc_id,
         row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rank
  FROM documents QUALIFY rank <= 30
),
r2 AS (
  SELECT 'hash' AS run, doc_id,
         row_number() OVER (
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT ASC,
                    doc_id ASC
         ) AS rank
  FROM documents QUALIFY rank <= 30
),
runs AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2),
agg AS (
  SELECT doc_id, CAST(COUNT(DISTINCT run) AS BIGINT) AS n_runs,
         CAST(SUM(1000000 // (60 + rank)) AS BIGINT) AS rrf_score
  FROM runs GROUP BY doc_id
)
SELECT doc_id, n_runs, rrf_score,
       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id ASC) AS INT) AS fused_rank
FROM agg
"""

QUERIES["rrf"] = (q_rrf, SQL_RRF)


def q_direct_map(spark, sf):
    """W3C Direct Mapping of the nation table (PK n_nationkey, FK
    n_regionkey → region) into quads — the principled relational→KG
    ingestion; constant-width melt, zero joins."""
    from .operators.directmap import direct_mapping

    na = spark.read.parquet(f"{sf}/nation.parquet")
    return direct_mapping(
        na, "nation", pk=["n_nationkey"],
        fks={"n_regionkey": ("region", "r_regionkey")},
    )


def _sql_direct_map() -> str:
    from .operators.directmap import enc_sql
    from .types import RDF_TYPE

    s = f"'urn:dm:nation/n_nationkey=' || {enc_sql('n_nationkey')}"
    return f"""
WITH n AS (SELECT * FROM nation)
SELECT {s} AS s_lex, '{RDF_TYPE}' AS pred, 0 AS o_kind,
       'urn:dm:nation' AS o_lex, CAST(NULL AS VARCHAR) AS o_dtype FROM n
UNION ALL
SELECT {s}, 'urn:dm:nation#n_nationkey', 2, CAST(n_nationkey AS VARCHAR),
       'http://www.w3.org/2001/XMLSchema#integer' FROM n WHERE n_nationkey IS NOT NULL
UNION ALL
SELECT {s}, 'urn:dm:nation#n_name', 2, n_name,
       'http://www.w3.org/2001/XMLSchema#string' FROM n WHERE n_name IS NOT NULL
UNION ALL
SELECT {s}, 'urn:dm:nation#n_regionkey', 2, CAST(n_regionkey AS VARCHAR),
       'http://www.w3.org/2001/XMLSchema#integer' FROM n WHERE n_regionkey IS NOT NULL
UNION ALL
SELECT {s}, 'urn:dm:nation#ref-n_regionkey', 0,
       'urn:dm:region/r_regionkey=' || {enc_sql('n_regionkey')},
       CAST(NULL AS VARCHAR) FROM n WHERE n_regionkey IS NOT NULL
"""


SQL_DIRECT_MAP = _sql_direct_map()

QUERIES["direct_map"] = (q_direct_map, SQL_DIRECT_MAP)


def q_sparql_text_lateral(spark, sf):
    """SPARQL 1.2 LATERAL: per-nation top-2 customers by name — the
    correlated sub-SELECT LIMIT that plain joins cannot express;
    compiles to ONE window over the correlation key (algebra.Lateral),
    never a per-binding re-execution."""
    return _sparql(
        spark, sf,
        """SELECT ?nat ?cname WHERE {
             ?nat a c:Nation .
             LATERAL {
               SELECT ?cname WHERE {
                 ?cu p:inNation ?nat ; p:name ?cname .
               } ORDER BY ?cname LIMIT 2
             }
           }""",
        "nat", "cname",
    )


SQL_SPARQL_TEXT_LATERAL = """
SELECT 'urn:n:' || n_nationkey AS nat, c_name AS cname
FROM nation JOIN (
  SELECT c_nationkey, c_name,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_name) AS rn
  FROM customer
) c ON c.c_nationkey = n_nationkey
WHERE rn <= 2
"""

QUERIES["sparql_text_lateral"] = (q_sparql_text_lateral, SQL_SPARQL_TEXT_LATERAL)


def q_shacl_closed(spark, sf):
    """sh:closed validation: a closed Customer shape allowing only name +
    inNation (acctbal/segment arcs violate), a closed Nation shape that
    conforms — SHACL §4.8.1 over the TPC-H KG, broadcast anti join."""
    from .operators.shacl import SHAPES_SCHEMA, validate_closed

    shapes = spark.createDataFrame(
        [
            ("cs1", "urn:c:Customer", "urn:p:name", None, None, None, None, None),
            ("cs1", "urn:c:Customer", "urn:p:inNation", None, None, None, None, None),
            ("cs2", "urn:c:Nation", "urn:p:name", None, None, None, None, None),
            ("cs2", "urn:c:Nation", "urn:p:inRegion", None, None, None, None, None),
        ],
        schema=SHAPES_SCHEMA,
    )
    return validate_closed(triples_view(spark, sf), shapes)


SQL_SHACL_CLOSED = """
SELECT 'urn:cu:' || c_custkey AS focus, 'cs1' AS shape_id,
       'closed' AS constraint, 'unexpected urn:p:acctbal' AS detail FROM customer
UNION ALL
SELECT 'urn:cu:' || c_custkey, 'cs1', 'closed', 'unexpected urn:p:segment' FROM customer
"""

QUERIES["shacl_closed"] = (q_shacl_closed, SQL_SHACL_CLOSED)


def q_r2rml_map(spark, sf):
    """R2RML-lite (W3C R2RML Recommendation): author-controlled
    relational->RDF — nation under a name-keyed IRI template (IRI-safe
    %20 escaping visible in 'UNITED STATES'), customer with a template
    literal label, a language-tagged segment and a referencing object
    map whose parent subject is built FROM THE JOINED nation row
    (c_nationkey = n_nationkey). One equi-join for the ref arm, melt
    everywhere else."""
    from .operators.directmap import ObjectMap, TriplesMap, r2rml_map

    tables = {
        "nation": spark.read.parquet(f"{sf}/nation.parquet"),
        "customer": spark.read.parquet(f"{sf}/customer.parquet"),
    }
    nation_map = TriplesMap(
        name="NationMap",
        table="nation",
        subject_template="urn:v:nation/{n_name}",
        subject_class="urn:v:Nation",
        object_maps=(ObjectMap(pred="urn:v:name", column="n_name", language="en"),),
    )
    cust_map = TriplesMap(
        name="CustMap",
        table="customer",
        subject_template="urn:v:cust/{c_custkey}",
        subject_class="urn:v:Customer",
        object_maps=(
            ObjectMap(pred="urn:v:label", template="{c_name} ({c_mktsegment})",
                      term_type="literal"),
            ObjectMap(pred="urn:v:src", constant="urn:v:tpch"),
            ObjectMap(pred="urn:v:nation",
                      parent=("NationMap", [("c_nationkey", "n_nationkey")])),
        ),
    )
    return r2rml_map(tables, [nation_map, cust_map])


def _sql_r2rml_map() -> str:
    from .operators.directmap import enc_sql
    from .types import RDF_TYPE

    nsub = f"'urn:v:nation/' || {enc_sql('n_name')}"
    csub = "'urn:v:cust/' || CAST(c_custkey AS VARCHAR)"
    return f"""
SELECT {nsub} AS s_lex, '{RDF_TYPE}' AS pred, 0 AS o_kind,
       'urn:v:Nation' AS o_lex, CAST(NULL AS VARCHAR) AS o_dtype,
       CAST(NULL AS VARCHAR) AS o_lang FROM nation
UNION ALL
SELECT {nsub}, 'urn:v:name', 2, n_name, NULL, 'en' FROM nation
  WHERE n_name IS NOT NULL
UNION ALL
SELECT {csub}, '{RDF_TYPE}', 0, 'urn:v:Customer', NULL, NULL FROM customer
UNION ALL
SELECT {csub}, 'urn:v:label', 2, c_name || ' (' || c_mktsegment || ')',
       'http://www.w3.org/2001/XMLSchema#string', NULL FROM customer
  WHERE c_name IS NOT NULL AND c_mktsegment IS NOT NULL
UNION ALL
SELECT {csub}, 'urn:v:src', 0, 'urn:v:tpch', NULL, NULL FROM customer
UNION ALL
SELECT {csub}, 'urn:v:nation', 0, {nsub}, NULL, NULL
  FROM customer JOIN nation ON c_nationkey = n_nationkey
"""


SQL_R2RML_MAP = _sql_r2rml_map()

QUERIES["r2rml_map"] = (q_r2rml_map, SQL_R2RML_MAP)


def q_skos_audit(spark, sf):
    """SKOS taxonomy audit over a scheme derived from the TPC-H KG:
    regions are top concepts, nations sit under their region, and five
    anomalies are planted — a broader 2-cycle (n1<->n2), duplicate
    English prefLabels (nations 0-2), S13 pref/alt label clashes
    (nationkey%5==4), a top concept that still has a broader (n0), and
    orphan segment concepts with no relations. Cycle check is the
    shared transitive-closure fixpoint; everything else is one agg or
    anti/semi join (taxonomies are catalog-sized at every corpus SF)."""
    from .operators.skos import SKOS, skos_audit
    from .types import RDF_TYPE

    na = spark.read.parquet(f"{sf}/nation.parquet")
    re_ = spark.read.parquet(f"{sf}/region.parquet")
    cu = spark.read.parquet(f"{sf}/customer.parquet")
    g = F.lit("urn:g:skos")
    n_iri = F.concat(F.lit("urn:k:n"), F.col("n_nationkey").cast("string"))
    r_iri = F.concat(F.lit("urn:k:r"), F.col("r_regionkey").cast("string"))

    def quad(s, pred, o_kind, o_lex, o_lang=None):
        return [
            F.lit(0).cast("tinyint").alias("s_kind"), s.alias("s_lex"),
            F.lit(pred).alias("pred"),
            F.lit(o_kind).cast("tinyint").alias("o_kind"), o_lex.alias("o_lex"),
            F.lit(None).cast("string").alias("o_dtype"),
            (F.lit(o_lang) if o_lang else F.lit(None)).cast("string").alias("o_lang"),
            g.alias("graph"),
        ]

    parts = [
        re_.select(*quad(r_iri, RDF_TYPE, 0, F.lit(SKOS + "Concept"))),
        re_.select(*quad(r_iri, SKOS + "topConceptOf", 0, F.lit("urn:k:scheme"))),
        re_.select(*quad(r_iri, SKOS + "prefLabel", 2, F.col("r_name"), "en")),
        na.select(*quad(n_iri, RDF_TYPE, 0, F.lit(SKOS + "Concept"))),
        na.select(*quad(n_iri, SKOS + "broader", 0,
                        F.concat(F.lit("urn:k:r"), F.col("n_regionkey").cast("string")))),
        na.select(*quad(n_iri, SKOS + "prefLabel", 2, F.col("n_name"), "en")),
        # planted: broader 2-cycle between n1 and n2
        na.filter(F.col("n_nationkey") == 1).select(
            *quad(n_iri, SKOS + "broader", 0, F.lit("urn:k:n2"))),
        na.filter(F.col("n_nationkey") == 2).select(
            *quad(n_iri, SKOS + "broader", 0, F.lit("urn:k:n1"))),
        # planted: second en prefLabel for nations 0-2
        na.filter(F.col("n_nationkey") < 3).select(
            *quad(n_iri, SKOS + "prefLabel", 2,
                  F.concat(F.col("n_name"), F.lit(" (alt)")), "en")),
        # planted: S13 clash for nationkey%5==4
        na.filter(F.col("n_nationkey") % 5 == 4).select(
            *quad(n_iri, SKOS + "altLabel", 2, F.col("n_name"), "en")),
        # planted: n0 claims top-concept status while having a broader
        na.filter(F.col("n_nationkey") == 0).select(
            *quad(n_iri, SKOS + "topConceptOf", 0, F.lit("urn:k:scheme"))),
        # planted: orphan concept per market segment
        cu.select(F.col("c_mktsegment").alias("seg")).distinct().select(
            *quad(F.concat(F.lit("urn:k:seg-"), F.col("seg")), RDF_TYPE, 0,
                  F.lit(SKOS + "Concept"))),
    ]
    quads = parts[0]
    for p in parts[1:]:
        quads = quads.unionByName(p)
    return skos_audit(quads)


SQL_SKOS_AUDIT = """
WITH RECURSIVE edges AS (
  SELECT 'urn:k:n' || n_nationkey AS src, 'urn:k:r' || n_regionkey AS dst FROM nation
  UNION ALL SELECT 'urn:k:n1', 'urn:k:n2'
  UNION ALL SELECT 'urn:k:n2', 'urn:k:n1'
),
reach AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT DISTINCT src AS concept, 'broader_cycle' AS issue,
       'skos:broader reaches itself' AS detail
  FROM reach WHERE src = dst
UNION ALL
SELECT 'urn:k:n' || n_nationkey, 'multiple_pref_label', '2 prefLabels@en'
  FROM nation WHERE n_nationkey < 3
UNION ALL
SELECT 'urn:k:n' || n_nationkey, 'label_clash',
       'pref=alt ''' || n_name || '''@en'
  FROM nation WHERE n_nationkey % 5 = 4
UNION ALL
SELECT 'urn:k:n0', 'top_with_broader', 'top concept has skos:broader'
UNION ALL
SELECT DISTINCT 'urn:k:seg-' || c_mktsegment, 'orphan', 'no semantic relations'
  FROM customer
"""

QUERIES["skos_audit"] = (q_skos_audit, SQL_SKOS_AUDIT)


def q_shacl_pairs(spark, sf):
    """SHACL §4.4 property-pair constraints over the TPC-H KG with
    planted companion arcs: p:budget = price±1 (sh:lessThan violated
    when orderkey%7==0), p:status2 = status or 'X' (sh:equals violated
    both directions when orderkey%11==3), p:nick = name or name||'~'
    (sh:disjoint violated when custkey%13==5). Pair joins are keyed on
    the focus node; shapes broadcast."""
    from .operators.shacl import PAIR_SHAPES_SCHEMA, validate_pairs
    from .relational import P_PRICE, P_STATUS, XSD_INTEGER, XSD_STRING

    od = spark.read.parquet(f"{sf}/orders.parquet")
    cu = spark.read.parquet(f"{sf}/customer.parquet")

    def arcs(df, s, pred, lex, dtype):
        return df.select(
            F.lit(0).cast("tinyint").alias("s_kind"), s.alias("s_lex"),
            F.lit(pred).alias("pred"), F.lit(2).cast("tinyint").alias("o_kind"),
            lex.alias("o_lex"), F.lit(dtype).alias("o_dtype"),
            F.lit(None).cast("string").alias("o_lang"),
            F.lit("urn:g:derived").alias("graph"),
        )

    o_iri = F.concat(F.lit("urn:o:"), F.col("o_orderkey").cast("string"))
    c_iri = F.concat(F.lit("urn:cu:"), F.col("c_custkey").cast("string"))
    budget = (
        F.round(F.col("o_totalprice") * 100).cast("long")
        + F.when(F.col("o_orderkey") % 7 == 0, F.lit(-1)).otherwise(F.lit(1))
    ).cast("string")
    status2 = F.when(F.col("o_orderkey") % 11 == 3, F.lit("X")).otherwise(F.col("o_orderstatus"))
    nick = F.when(F.col("c_custkey") % 13 == 5, F.col("c_name")).otherwise(
        F.concat(F.col("c_name"), F.lit("~")))
    derived = (
        arcs(od, o_iri, "urn:p:budget", budget, XSD_INTEGER)
        .unionByName(arcs(od, o_iri, "urn:p:status2", status2, XSD_STRING))
        .unionByName(arcs(cu, c_iri, "urn:p:nick", nick, XSD_STRING))
    )
    store = triples_view(spark, sf).unionByName(derived, allowMissingColumns=True)
    shapes = spark.createDataFrame(
        [
            ("lt1", "urn:c:Order", P_PRICE, "urn:p:budget", "lessThan"),
            ("eq1", "urn:c:Order", P_STATUS, "urn:p:status2", "equals"),
            ("dis1", "urn:c:Customer", P_NAME, "urn:p:nick", "disjoint"),
        ],
        schema=PAIR_SHAPES_SCHEMA,
    )
    return validate_pairs(store, shapes)


SQL_SHACL_PAIRS = """
SELECT 'urn:o:' || o_orderkey AS focus, 'lt1' AS shape_id,
       'lessThan' AS constraint,
       'value ' || CAST(CAST(round(o_totalprice*100) AS BIGINT) AS VARCHAR)
         || ' !< '
         || CAST(CAST(round(o_totalprice*100) AS BIGINT) - 1 AS VARCHAR) AS detail
  FROM orders WHERE o_orderkey % 7 = 0
UNION ALL
SELECT 'urn:o:' || o_orderkey, 'eq1', 'equals',
       'value ' || o_orderstatus || ' missing from urn:p:status2'
  FROM orders WHERE o_orderkey % 11 = 3 AND o_orderstatus <> 'X'
UNION ALL
SELECT 'urn:o:' || o_orderkey, 'eq1', 'equals',
       'value X missing from urn:p:status'
  FROM orders WHERE o_orderkey % 11 = 3 AND o_orderstatus <> 'X'
UNION ALL
SELECT 'urn:cu:' || c_custkey, 'dis1', 'disjoint',
       'shared value ' || c_name
  FROM customer WHERE c_custkey % 13 = 5
"""

QUERIES["shacl_pairs"] = (q_shacl_pairs, SQL_SHACL_PAIRS)


def q_simrank(spark, sf):
    """SimRank (2 integer-exact rounds, C=0.80) on the rn<=40
    chain-with-chords slice — structural same-as candidates from shared
    in-neighbor contexts. Catalog-tier operator (the scc_cycles/
    bisim_summary precedent): all-pairs SimRank is quadratic in the
    worst case, so the suite pins the documented ontology-sized slice;
    state stays sparse (diagonal + overlap pairs) at every SF."""
    from .operators.cc import simrank

    r, e = _chain_graph(spark, sf)
    keep = r.filter(F.col("rn") <= 40).select("k")
    e40 = (
        e.join(keep.withColumnRenamed("k", "src"), "src")
        .join(keep.withColumnRenamed("k", "dst"), "dst")
    )
    return simrank(e40, iters=2, c_pct=80)


def _simrank_sql(iters: int) -> str:
    parts = [
        "WITH "
        + _CHAIN_SQL
        + """,
keep AS (SELECT kk FROM r WHERE rn <= 40),
e AS (SELECT DISTINCT src, dst FROM raw
      WHERE src IN (SELECT kk FROM keep) AND dst IN (SELECT kk FROM keep)),
ind AS (SELECT dst AS node, COUNT(*) AS deg FROM e GROUP BY dst),
n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
s0 AS (SELECT node AS a, node AS b, CAST(1000000 AS BIGINT) AS sim FROM n)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
sum{t} AS (
  SELECT e1.dst AS a, e2.dst AS b, CAST(SUM(s.sim) AS BIGINT) AS s
  FROM s{t - 1} s JOIN e e1 ON e1.src = s.a JOIN e e2 ON e2.src = s.b
  GROUP BY e1.dst, e2.dst
),
s{t} AS (
  SELECT node AS a, node AS b, CAST(1000000 AS BIGINT) AS sim FROM n
  UNION ALL
  SELECT x.a, x.b, CAST((80 * x.s) // (100 * da.deg * db.deg) AS BIGINT)
  FROM sum{t} x JOIN ind da ON da.node = x.a JOIN ind db ON db.node = x.b
  WHERE x.a <> x.b AND (80 * x.s) // (100 * da.deg * db.deg) > 0
)"""
        )
    parts.append(f"\nSELECT a, b, sim FROM s{iters} WHERE a < b")
    return "".join(parts)


SQL_SIMRANK = _simrank_sql(2)

QUERIES["simrank"] = (q_simrank, SQL_SIMRANK)


def q_er_pivot(spark, sf):
    """Correlation clustering (deterministic ParallelPivot) over the SAME
    LSH->Jaccard verified near-dup pairs as dedup_clusters — the ER
    alternative to connected components that refuses to snowball weak
    pairwise-match chains into one mega-entity: records merge only when
    directly adjacent to the elected pivot. 6 md5-permutation rounds,
    mirrored round-for-round by the unrolled DuckDB oracle."""
    from .operators.cc import pivot_clusters
    from .operators.textops import minhash_candidates, ngram_jaccard

    docs = _docs(spark, sf)
    pairs = minhash_candidates(docs, 8, 50).filter(F.col("n_bands") >= 4)
    ver = ngram_jaccard(docs, pairs.select("doc_a", "doc_b"), n=3).filter(
        F.col("jac_pct") >= 60
    )
    edges = ver.select(
        F.col("doc_a").cast("string").alias("a"),
        F.col("doc_b").cast("string").alias("b"),
    )
    pc = pivot_clusters(edges, rounds=6)
    out = docs.select("doc_id").join(
        pc.select(F.col("node").cast("long").alias("doc_id"), F.col("cluster").alias("cl")),
        "doc_id", "left",
    )
    cid = F.coalesce(F.col("cl").cast("long"), F.col("doc_id"))
    return out.select(
        "doc_id", cid.alias("cluster_id"),
        (cid == F.col("doc_id")).cast("long").alias("is_keeper"),
    )


def _er_pivot_sql(rounds: int) -> str:
    # lockstep with SQL_DEDUP_CLUSTERS: same candidate generation +
    # verification CTEs (sliced at the component step), then the pivot
    # election unrolled round-for-round
    pre = SQL_DEDUP_CLUSTERS.split("\nsym AS")[0].rstrip().rstrip(",")
    parts = [pre, """,
e0 AS MATERIALIZED (SELECT CAST(doc_a AS VARCHAR) AS a, CAST(doc_b AS VARCHAR) AS b FROM ver
       UNION SELECT CAST(doc_b AS VARCHAR), CAST(doc_a AS VARCHAR) FROM ver),
act0 AS MATERIALIZED (SELECT DISTINCT a AS node FROM e0)"""]
    for t in range(rounds):
        parts.append(f""",
nm{t} AS MATERIALIZED (SELECT a, MIN(md5('pivot:' || b)) AS m FROM e{t} GROUP BY a),
piv{t} AS MATERIALIZED (
  SELECT act.node FROM act{t} act LEFT JOIN nm{t} nm ON nm.a = act.node
  WHERE nm.m IS NULL OR md5('pivot:' || act.node) < nm.m
),
asg{t} AS MATERIALIZED (
  SELECT e.a AS node, arg_min(e.b, md5('pivot:' || e.b)) AS cluster
  FROM e{t} e JOIN piv{t} p ON p.node = e.b GROUP BY e.a
),
out{t} AS MATERIALIZED (SELECT node, node AS cluster FROM piv{t}
           UNION ALL SELECT node, cluster FROM asg{t}),
act{t + 1} AS MATERIALIZED (SELECT node FROM act{t} WHERE node NOT IN (SELECT node FROM out{t})),
e{t + 1} AS MATERIALIZED (SELECT a, b FROM e{t}
           WHERE a IN (SELECT node FROM act{t + 1})
             AND b IN (SELECT node FROM act{t + 1}))""")
    allout = " UNION ALL ".join(f"SELECT node, cluster FROM out{t}" for t in range(rounds))
    parts.append(f""",
allout AS ({allout}
           UNION ALL SELECT node, node AS cluster FROM act{rounds})
SELECT d.doc_id,
       CAST(COALESCE(ao.cluster, CAST(d.doc_id AS VARCHAR)) AS BIGINT) AS cluster_id,
       CAST(CASE WHEN COALESCE(ao.cluster, CAST(d.doc_id AS VARCHAR))
                      = CAST(d.doc_id AS VARCHAR)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
FROM documents d LEFT JOIN allout ao ON ao.node = CAST(d.doc_id AS VARCHAR)""")
    return "".join(parts)


SQL_ER_PIVOT = _er_pivot_sql(6)

QUERIES["er_pivot"] = (q_er_pivot, SQL_ER_PIVOT)


def q_dup_extents(spark, sf):
    """Maximal duplicated-span extents (the Lee et al. cut list): w=8
    corpus-duplicated windows merged per doc into maximal token
    intervals by gaps-and-islands — the actionable output of substring
    dedup (what to REMOVE), beside span_dedup's per-doc ratios."""
    from .operators.textops import dup_span_extents

    return dup_span_extents(_docs(spark, sf), w=8)


SQL_DUP_EXTENTS = """
WITH wt AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS toks FROM documents
),
wins AS (
  SELECT doc_id, i, md5(array_to_string(toks[i:i+7], ' ')) AS h
  FROM wt, unnest(range(1, len(toks) - 6)) AS t(i)
  WHERE len(toks) >= 8
),
hot AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) > 1),
pos AS (SELECT w.doc_id, w.i FROM wins w JOIN hot USING (h)),
isl AS (
  SELECT doc_id, i,
         SUM(CASE WHEN prev IS NULL OR i - prev > 8 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i) AS isl
  FROM (SELECT doc_id, i,
               LAG(i) OVER (PARTITION BY doc_id ORDER BY i) AS prev
        FROM pos)
)
SELECT doc_id, CAST(MIN(i) AS BIGINT) AS span_start,
       CAST(MAX(i) + 7 AS BIGINT) AS span_end,
       COUNT(*) AS n_dup_windows
FROM isl GROUP BY doc_id, isl
"""

QUERIES["dup_extents"] = (q_dup_extents, SQL_DUP_EXTENTS)


def q_node2vec(spark, sf):
    """node2vec-biased second-order walks (p=1/2, q=2 as integer weights
    4/2/1) over the SYMMETRIZED chain-with-chords graph — deterministic
    weighted min-hash choice, mirrored draw-for-draw by the unrolled
    DuckDB oracle."""
    from .operators.walks import node2vec_walks

    _r, e = _chain_graph(spark, sf)
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return node2vec_walks(sym, walks_per_node=1, walk_len=3)


def _node2vec_sql(walk_len: int) -> str:
    parts = [
        "WITH "
        + _CHAIN_SQL
        + """,
sym AS (SELECT DISTINCT src, dst FROM
        (SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw)),
nodes AS (SELECT DISTINCT src AS node FROM sym),
s0 AS MATERIALIZED (
  SELECT n.node AS start, CAST(t.w AS INT) AS walk,
         CAST(NULL AS VARCHAR) AS prev, n.node AS cur, n.node AS seq
  FROM nodes n, unnest(range(1)) AS t(w)
)"""
    ]
    for i in range(walk_len):
        parts.append(
            f""",
s{i + 1} AS MATERIALIZED (
  SELECT start, walk,
         CASE WHEN k IS NOT NULL THEN cur ELSE prev END AS prev,
         CASE WHEN k IS NOT NULL THEN string_split(k, chr(31))[2] END AS cur,
         CASE WHEN k IS NOT NULL THEN seq || ',' || string_split(k, chr(31))[2]
              ELSE seq END AS seq
  FROM (
    SELECT start, walk, prev, cur, seq,
           MIN(CASE WHEN dst IS NOT NULL THEN
               list_min(list_transform(range(1, wgt + 1), c ->
                 md5(cur || chr(31) || dst || chr(31) ||
                     CAST(walk AS VARCHAR) || chr(31) || '{i}' || chr(31) ||
                     CAST(c AS VARCHAR))))
               || chr(31) || dst END) AS k
    FROM (
      SELECT w.start, w.walk, w.prev, w.cur, w.seq, e.dst,
             CASE WHEN w.prev IS NULL THEN 1
                  WHEN e.dst = w.prev THEN 4
                  WHEN b.src IS NOT NULL THEN 2
                  ELSE 1 END AS wgt
      FROM s{i} w
      LEFT JOIN sym e ON e.src = w.cur
      LEFT JOIN sym b ON b.src = w.prev AND b.dst = e.dst
    )
    GROUP BY start, walk, prev, cur, seq
  )
)"""
        )
    parts.append(f"\nSELECT start, walk, seq FROM s{walk_len}")
    return "".join(parts)


SQL_NODE2VEC = _node2vec_sql(3)

QUERIES["node2vec"] = (q_node2vec, SQL_NODE2VEC)


def q_hilbert(spark, sf):
    """Hilbert layout key of (custkey mod 256, nationkey) at 8 bits —
    zorder's successor for multi-dimensional pruning (no seam jumps:
    consecutive key ranges are tight rectangles), pure bit/CASE algebra."""
    from .operators.sketches import hilbert_key

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    return cu.select(
        F.col("c_custkey").cast("long").alias("id"),
        hilbert_key(
            F.col("c_custkey").cast("long") % 256,
            F.col("c_nationkey").cast("long"),
            bits=8,
        ).alias("hkey"),
    )


def _sql_hilbert(bits: int = 8) -> str:
    from .operators.sketches import hilbert_sql

    return f"""
WITH base AS MATERIALIZED (
  SELECT CAST(c_custkey AS BIGINT) AS id,
         CAST(c_custkey AS BIGINT) % 256 AS a,
         CAST(c_nationkey AS BIGINT) AS b
  FROM customer
),
{hilbert_sql('a', 'b', bits)}
SELECT id, hd AS hkey FROM h{bits}
"""


SQL_HILBERT = _sql_hilbert()

QUERIES["hilbert"] = (q_hilbert, SQL_HILBERT)


def q_privacy_k_anon(spark, sf):
    """k-anonymity / l-diversity audit of a quasi-identifier projection of
    customer: QI = (nation, segment), sensitive = acctbal band. One
    map-side-combined groupBy; flags classes smaller than k=60 and
    classes whose sensitive diversity is below l=8."""
    from .operators.privacy import k_anonymity_report

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    df = cu.select(
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    return k_anonymity_report(
        df, ["nation", "segment"], k=60, sensitive_col="bal_band", l=8
    )


SQL_PRIVACY_K_ANON = """
SELECT nation, segment, n, n_sensitive,
       CAST(n >= 60 AS INTEGER) AS k_ok,
       CAST(n_sensitive >= 8 AS INTEGER) AS l_ok
FROM (
  SELECT CAST(c_nationkey AS BIGINT) AS nation,
         c_mktsegment AS segment,
         COUNT(*) AS n,
         COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000) AS BIGINT)) AS n_sensitive
  FROM customer
  GROUP BY 1, 2
)
"""

QUERIES["privacy_k_anon"] = (q_privacy_k_anon, SQL_PRIVACY_K_ANON)


def q_privacy_suppress(spark, sf):
    """Minimal suppression set to reach k=3 over the finer QI
    (nation, segment, acctbal band): the rows whose equivalence class
    is undersized. Hash join of rows against the (small) class list."""
    from .operators.privacy import suppression_plan

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    df = cu.select(
        F.col("c_custkey").cast("long").alias("id"),
        F.col("c_nationkey").cast("long").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("band"),
    )
    return suppression_plan(df, ["nation", "segment", "band"], "id", k=3)


SQL_PRIVACY_SUPPRESS = """
WITH base AS (
  SELECT CAST(c_custkey AS BIGINT) AS id,
         CAST(c_nationkey AS BIGINT) AS nation,
         c_mktsegment AS segment,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS band
  FROM customer
),
small AS (
  SELECT nation, segment, band, COUNT(*) AS n
  FROM base GROUP BY 1, 2, 3 HAVING COUNT(*) < 3
)
SELECT b.id, b.nation, b.segment, b.band, s.n
FROM base b JOIN small s USING (nation, segment, band)
"""

QUERIES["privacy_suppress"] = (q_privacy_suppress, SQL_PRIVACY_SUPPRESS)


def q_lang_spans(spark, sf):
    """Per-sentence language ID (the code-switch substrate): lang_id's
    stopword vote applied to each pinned-segmenter sentence. Map-only —
    segmentation, token votes, and the alphabetical tie-break all ride
    the sentence array; no shuffle, no Python."""
    from .operators.textops import sentence_langs

    return sentence_langs(_docs(spark, sf))


_LANG_SPANS_BASE = """
WITH pieces AS (
  SELECT doc_id,
         str_split(regexp_replace(text, '([.!?]+)[ \t\n\r]+', '\\1' || chr(30), 'g'),
                   chr(30)) AS p
  FROM documents
),
kept AS (
  SELECT doc_id, list_filter(list_transform(p, x -> trim(x)), x -> x <> '') AS s
  FROM pieces
),
ex AS (
  SELECT doc_id, unnest(generate_series(1, len(s))) AS i, s
  FROM kept WHERE len(s) > 0
),
scored AS (
  SELECT doc_id, CAST(i AS BIGINT) AS sent_id,
    len(list_filter(string_split_regex(trim(s[i]), ' +'), x -> lower(x) IN ({de}))) AS s_de,
    len(list_filter(string_split_regex(trim(s[i]), ' +'), x -> lower(x) IN ({en}))) AS s_en,
    len(list_filter(string_split_regex(trim(s[i]), ' +'), x -> lower(x) IN ({fr}))) AS s_fr
  FROM ex
),
voted AS (
  SELECT doc_id, sent_id,
    CASE WHEN greatest(s_de, s_en, s_fr) = 0 THEN 'und'
         WHEN s_de = greatest(s_de, s_en, s_fr) THEN 'de'
         WHEN s_en = greatest(s_de, s_en, s_fr) THEN 'en'
         ELSE 'fr' END AS lang_guess,
    CAST(greatest(s_de, s_en, s_fr) AS BIGINT) AS top_hits
  FROM scored
)
"""


SQL_LANG_SPANS = (
    _LANG_SPANS_BASE.format(de=_SW_DE, en=_SW_EN, fr=_SW_FR)
    + "SELECT doc_id, sent_id, lang_guess, top_hits FROM voted"
)

QUERIES["lang_spans"] = (q_lang_spans, SQL_LANG_SPANS)


def q_code_switch(spark, sf):
    """Document code-switching report over the per-sentence votes:
    confident-sentence count, distinct languages, dominant language
    (most sentences, alphabetical tie-break), switched flag. Two
    map-side-combined aggs sharing the doc_id key; all-abstain docs
    emit no row."""
    from .operators.textops import code_switch_report

    return code_switch_report(_docs(spark, sf))


SQL_CODE_SWITCH = (
    _LANG_SPANS_BASE.format(de=_SW_DE, en=_SW_EN, fr=_SW_FR)
    + """,
conf AS (SELECT doc_id, lang_guess, COUNT(*) AS cnt
         FROM voted WHERE lang_guess <> 'und' GROUP BY 1, 2),
mx AS (SELECT doc_id, MAX(cnt) AS mx_cnt FROM conf GROUP BY doc_id)
SELECT c.doc_id,
       CAST(SUM(c.cnt) AS BIGINT) AS n_sents,
       CAST(COUNT(*) AS BIGINT) AS n_langs,
       MIN(CASE WHEN c.cnt = m.mx_cnt THEN c.lang_guess END) AS dom_lang,
       CAST(MAX(c.cnt) AS BIGINT) AS dom_sents,
       CAST(CASE WHEN COUNT(*) > 1 THEN 1 ELSE 0 END AS BIGINT) AS switched
FROM conf c JOIN mx m USING (doc_id)
GROUP BY c.doc_id
"""
)

QUERIES["code_switch"] = (q_code_switch, SQL_CODE_SWITCH)


def q_calibration(spark, sf):
    """Reliability table of a synthetic order-priority 'confidence':
    score_ppm from the orderkey hash (uniform over bins), label = the
    order actually being high-priority. ONE map-side-combined groupBy
    on the bin key."""
    from .operators.stats import calibration_report

    od = spark.read.parquet(f"{sf}/orders.parquet")
    scored = od.select(
        ((F.col("o_orderkey") * 37 % 101) * 10000).cast("long").alias("score_ppm"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0).alias("label"),
    )
    return calibration_report(scored)


SQL_CALIBRATION = """
WITH scored AS (
  SELECT CAST((o_orderkey * 37 % 101) * 10000 AS BIGINT) AS score_ppm,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS label
  FROM orders
),
b AS (
  SELECT least(score_ppm * 10 // 1000000, 9) AS bin,
         COUNT(*) AS n, SUM(score_ppm) AS ss, SUM(label) AS sl
  FROM scored GROUP BY 1
)
SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
       CAST(ss // n AS BIGINT) AS conf_ppm,
       CAST(sl * 1000000 // n AS BIGINT) AS acc_ppm,
       CAST(abs(ss // n - sl * 1000000 // n) AS BIGINT) AS gap_ppm
FROM b
"""

QUERIES["calibration"] = (q_calibration, SQL_CALIBRATION)


def q_distmult_rank(spark, sf):
    """DistMult bilinear ranking of consecutive-id embedding pairs with
    vec 0's embedding standing in as the relation vector: top-20 most
    plausible 'urn:p:rel' facts — the multiplicative sibling of
    transe_rank (same joins, swapped algebra)."""
    from .operators.walks import distmult_scores

    e = _embs(spark, sf)
    ent_emb = e.select(
        F.concat(F.lit("urn:v:"), F.col("vec_id").cast("string")).alias("ent"),
        "embedding",
    )
    rel_emb = e.filter(F.col("vec_id") == 0).select(
        F.lit("urn:p:rel").alias("pred"), "embedding"
    )
    ids = e.select("vec_id")
    pairs = (
        ids.alias("a")
        .join(ids.alias("b"), F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .select(
            F.concat(F.lit("urn:v:"), F.col("a.vec_id").cast("string")).alias("s_lex"),
            F.lit("urn:p:rel").alias("pred"),
            F.concat(F.lit("urn:v:"), F.col("b.vec_id").cast("string")).alias("o_lex"),
        )
    )
    out = distmult_scores(pairs, ent_emb, rel_emb)
    return out.orderBy(F.desc("score_x1e4"), F.asc("s_lex")).limit(20)


SQL_DISTMULT_RANK = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
r AS (SELECT emb AS er FROM e WHERE vec_id = 0),
p AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, a.emb AS ea, b.emb AS eb, r.er AS er
  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1 CROSS JOIN r
)
SELECT 'urn:v:' || CAST(ia AS VARCHAR) AS s_lex, 'urn:p:rel' AS pred,
       'urn:v:' || CAST(ib AS VARCHAR) AS o_lex,
       CAST(round(10000 * list_aggregate(
         list_transform(range(1, len(ea) + 1), i -> ea[i] * er[i] * eb[i]), 'sum'
       )) AS BIGINT) AS score_x1e4
FROM p ORDER BY score_x1e4 DESC, s_lex ASC LIMIT 20
"""

QUERIES["distmult_rank"] = (q_distmult_rank, SQL_DISTMULT_RANK)


def q_coverage_pick(spark, sf):
    """Greedy max-coverage selection of 3 documents by fresh 3-gram
    count — the submodular diverse-subset pick (near-dups of a pick
    carry ~zero marginal gain). Three rounds of count + 1-row argmax +
    corpus-wide covered-gram anti join."""
    from .operators.selection import coverage_select

    return coverage_select(_docs(spark, sf), k=3, w=3)


def _sql_coverage_pick(rounds: int = 3) -> str:
    parts = ["""
WITH toks AS (
  SELECT doc_id,
         str_split(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS t
  FROM documents
),
g0 AS MATERIALIZED (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 2)) AS i
        FROM toks WHERE len(t) >= 3)
)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
p{r} AS MATERIALIZED (
  SELECT CAST({r} AS BIGINT) AS round, doc_id, CAST(COUNT(*) AS BIGINT) AS gain
  FROM g{r - 1} GROUP BY doc_id ORDER BY gain DESC, doc_id ASC LIMIT 1
),
g{r} AS MATERIALIZED (
  SELECT doc_id, g FROM g{r - 1}
  WHERE g NOT IN (SELECT g FROM g{r - 1}
                  WHERE doc_id IN (SELECT doc_id FROM p{r}))
)""")
    sel = " UNION ALL ".join(f"SELECT * FROM p{r}" for r in range(1, rounds + 1))
    parts.append("\n" + sel)
    return "".join(parts)


SQL_COVERAGE_PICK = _sql_coverage_pick(3)

QUERIES["coverage_pick"] = (q_coverage_pick, SQL_COVERAGE_PICK)


def q_dawid_skene(spark, sf):
    """Dawid-Skene EM posteriors (1 round, pinned integers) over a
    planted 3-rater panel on 100 items derived from orders: rater acc
    always matches the item's true class, nb flips on item%4==1, nc on
    item%5==2 — items ≡ 17 (mod 20) have a WRONG majority that the
    learned confusion matrices must down-weight. K=2 classes keep the
    confusion table schema-sized."""
    from .operators.stats import dawid_skene

    od = spark.read.parquet(f"{sf}/orders.parquet")
    it = od.select((F.col("o_orderkey") % 100).alias("i")).distinct()
    t = F.when(F.col("i") % 3 == 0, F.lit("A")).otherwise(F.lit("B"))
    flip = F.when(t == "A", F.lit("B")).otherwise(F.lit("A"))
    item = F.concat(F.lit("i"), F.lpad(F.col("i").cast("string"), 3, "0"))
    labels = (
        it.select(item.alias("item"), F.lit("acc").alias("rater"), t.alias("label"))
        .unionByName(it.select(
            item.alias("item"), F.lit("nb").alias("rater"),
            F.when(F.col("i") % 4 == 1, flip).otherwise(t).alias("label")))
        .unionByName(it.select(
            item.alias("item"), F.lit("nc").alias("rater"),
            F.when(F.col("i") % 5 == 2, flip).otherwise(t).alias("label")))
    )
    return dawid_skene(labels, iters=1)


SQL_DAWID_SKENE = """
WITH it AS (SELECT DISTINCT o_orderkey % 100 AS i FROM orders),
src AS (
  SELECT 'i' || lpad(CAST(i AS VARCHAR), 3, '0') AS item, 'acc' AS rater,
         CASE WHEN i % 3 = 0 THEN 'A' ELSE 'B' END AS label FROM it
  UNION ALL
  SELECT 'i' || lpad(CAST(i AS VARCHAR), 3, '0'), 'nb',
         CASE WHEN i % 4 = 1 THEN (CASE WHEN i % 3 = 0 THEN 'B' ELSE 'A' END)
              ELSE (CASE WHEN i % 3 = 0 THEN 'A' ELSE 'B' END) END FROM it
  UNION ALL
  SELECT 'i' || lpad(CAST(i AS VARCHAR), 3, '0'), 'nc',
         CASE WHEN i % 5 = 2 THEN (CASE WHEN i % 3 = 0 THEN 'B' ELSE 'A' END)
              ELSE (CASE WHEN i % 3 = 0 THEN 'A' ELSE 'B' END) END FROM it
),
lab AS MATERIALIZED (SELECT item, rater, MIN(label) AS label FROM src GROUP BY 1, 2),
classes AS (SELECT DISTINCT label AS cls FROM lab),
kk AS (SELECT COUNT(*) AS k FROM classes),
n_i AS (SELECT item, COUNT(*) AS n FROM lab GROUP BY 1),
cnt AS (SELECT item, label AS cls, COUNT(*) AS c FROM lab GROUP BY 1, 2),
post0 AS MATERIALIZED (
  SELECT i.item, cl.cls,
         COALESCE(c.c, 0) * CAST(1000000 AS BIGINT) // n.n AS p
  FROM (SELECT DISTINCT item FROM lab) i
  CROSS JOIN classes cl
  LEFT JOIN cnt c ON c.item = i.item AND c.cls = cl.cls
  JOIN n_i n ON n.item = i.item
),
tot AS (SELECT SUM(p) AS t FROM post0),
prior AS MATERIALIZED (
  SELECT cls, CAST(1000000 AS BIGINT) * SUM(p) // greatest((SELECT t FROM tot), 1) AS prior
  FROM post0 GROUP BY cls
),
num AS (
  SELECT l.rater, p.cls, l.label, SUM(p.p) AS nx
  FROM lab l JOIN post0 p ON p.item = l.item GROUP BY 1, 2, 3
),
den AS (SELECT rater, cls, SUM(nx) AS dx FROM num GROUP BY 1, 2),
conf AS MATERIALIZED (
  SELECT n.rater, n.cls, n.label,
         CAST(1000000 AS BIGINT) * (n.nx + 50000)
           // (d.dx + (SELECT k FROM kk) * 50000) AS cp
  FROM num n JOIN den d ON d.rater = n.rater AND d.cls = n.cls
),
contrib AS (
  SELECT l.item, c.cls, l.rater, c.cp
  FROM lab l JOIN conf c ON c.rater = l.rater AND c.label = l.label
),
arrs AS (SELECT item, cls, list(CAST(cp AS BIGINT) ORDER BY rater) AS cs
         FROM contrib GROUP BY 1, 2),
folded AS MATERIALIZED (
  SELECT a.item, a.cls,
         list_reduce(list_prepend(CAST(p.prior AS BIGINT), a.cs),
                     (ac, x) -> ac * x // 1000000) AS acc
  FROM arrs a JOIN prior p USING (cls)
),
ti AS (SELECT item, SUM(acc) AS ti FROM folded GROUP BY 1)
SELECT f.item, f.cls,
       CASE WHEN t.ti > 0 THEN CAST(CAST(1000000 AS BIGINT) * f.acc // t.ti AS BIGINT)
            ELSE CAST(p.prior AS BIGINT) END AS post_ppm
FROM folded f JOIN ti t USING (item) JOIN prior p USING (cls)
"""

QUERIES["dawid_skene"] = (q_dawid_skene, SQL_DAWID_SKENE)


def q_cdc_chunks(spark, sf):
    """Content-defined chunk table over documents (w=4 anchor window,
    expected chunk ~16 tokens): the stable-identity units for
    chunk-store dedup across near-identical crawls. Entirely
    scan-local; the downstream dedup is one chunk_hash agg."""
    from .operators.textops import cdc_chunks

    return cdc_chunks(_docs(spark, sf), w=4, mod=16)


SQL_CDC_CHUNKS = """
WITH toks AS (
  SELECT doc_id,
         str_split(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS t
  FROM documents
),
anch AS (
  SELECT doc_id, t,
         list_prepend(CAST(1 AS BIGINT), list_filter(
           generate_series(CAST(2 AS BIGINT), CAST(len(t) - 3 AS BIGINT)),
           i -> ('0x' || substr(md5(array_to_string(t[i:i+3], ' ')), 1, 15))::BIGINT
                % 16 = 0)) AS b
  FROM toks
),
ends AS (
  SELECT doc_id, t, b,
         list_transform(generate_series(CAST(1 AS BIGINT), CAST(len(b) AS BIGINT)),
           j -> CASE WHEN j < len(b) THEN b[j + 1] - 1 ELSE CAST(len(t) AS BIGINT) END) AS e
  FROM anch
),
ex AS (
  SELECT doc_id, t, b, e, unnest(generate_series(1, len(b))) AS j
  FROM ends
)
SELECT doc_id,
       CAST(j AS BIGINT) AS chunk_ix,
       CAST(b[j] AS BIGINT) AS start_tok,
       CAST(e[j] AS BIGINT) AS end_tok,
       CAST(e[j] - b[j] + 1 AS BIGINT) AS n_toks,
       md5(array_to_string(t[b[j]:e[j]], ' ')) AS chunk_hash
FROM ex
"""

QUERIES["cdc_chunks"] = (q_cdc_chunks, SQL_CDC_CHUNKS)


def q_license_scan(spark, sf):
    """License / usage-rights battery over a planted corpus: doc_id % 17
    routes docs to CC URL / CC phrase / CC0 / MIT / Apache / GPL /
    all-rights-reserved / conflicting declarations; the rest stay
    unlicensed. Map-only rlike algebra, mirrored verbatim in DuckDB."""
    from .operators.textops import license_flags

    d = F.col("doc_id")
    txt = (
        F.when(d % 17 == 0, F.concat(F.col("text"), F.lit(
            " Licensed under https://creativecommons.org/licenses/by-nc-nd/4.0/")))
        .when(d % 17 == 1, F.concat(F.col("text"), F.lit(
            " Content under Creative Commons Attribution-ShareAlike terms.")))
        .when(d % 17 == 2, F.concat(F.col("text"), F.lit(
            " See creativecommons.org/licenses/by/4.0 for reuse.")))
        .when(d % 17 == 3, F.concat(F.col("text"), F.lit(
            " Released under the CC0 public domain dedication.")))
        .when(d % 17 == 4, F.concat(F.col("text"), F.lit(
            " This page ships under the MIT License.")))
        .when(d % 17 == 5, F.concat(F.col("text"), F.lit(
            " Licensed under the Apache License, Version 2.0.")))
        .when(d % 17 == 6, F.concat(F.col("text"), F.lit(
            " Distributed under the GNU General Public License v3.")))
        .when(d % 17 == 7, F.concat(F.col("text"), F.lit(
            " Copyright Example Corp. All rights reserved.")))
        .when(d % 17 == 8, F.concat(F.col("text"), F.lit(
            " All rights reserved. Images: creativecommons.org/licenses/by/2.0.")))
        .otherwise(F.col("text"))
    )
    return license_flags(_docs(spark, sf).withColumn("text", txt))


def _sql_license_scan() -> str:
    from .operators.textops import LICENSE_SIGNALS

    plant = """
  CASE WHEN doc_id % 17 = 0 THEN text || ' Licensed under https://creativecommons.org/licenses/by-nc-nd/4.0/'
       WHEN doc_id % 17 = 1 THEN text || ' Content under Creative Commons Attribution-ShareAlike terms.'
       WHEN doc_id % 17 = 2 THEN text || ' See creativecommons.org/licenses/by/4.0 for reuse.'
       WHEN doc_id % 17 = 3 THEN text || ' Released under the CC0 public domain dedication.'
       WHEN doc_id % 17 = 4 THEN text || ' This page ships under the MIT License.'
       WHEN doc_id % 17 = 5 THEN text || ' Licensed under the Apache License, Version 2.0.'
       WHEN doc_id % 17 = 6 THEN text || ' Distributed under the GNU General Public License v3.'
       WHEN doc_id % 17 = 7 THEN text || ' Copyright Example Corp. All rights reserved.'
       WHEN doc_id % 17 = 8 THEN text || ' All rights reserved. Images: creativecommons.org/licenses/by/2.0.'
       ELSE text END
"""
    flag_cols = ",\n         ".join(
        f"CAST(regexp_matches(lower(text), '{pat}') AS INT) AS {name}"
        for name, pat in LICENSE_SIGNALS
    )
    total = " + ".join(name for name, _ in LICENSE_SIGNALS)
    return f"""
WITH d AS (SELECT doc_id, {plant} AS text FROM documents),
x AS (
  SELECT doc_id,
         {flag_cols}
  FROM d
)
SELECT doc_id, cc_by, cc_nc, cc_nd, cc_sa, cc0, mit, apache, gpl, arr,
       CAST({total} AS BIGINT) AS n_signals,
       CASE WHEN cc_nc = 1 AND cc_nd = 1 THEN 'cc-by-nc-nd'
            WHEN cc_nc = 1 AND cc_sa = 1 THEN 'cc-by-nc-sa'
            WHEN cc_nc = 1 THEN 'cc-by-nc'
            WHEN cc_nd = 1 THEN 'cc-by-nd'
            WHEN cc_sa = 1 THEN 'cc-by-sa'
            WHEN cc_by = 1 THEN 'cc-by'
            WHEN cc0 = 1 THEN 'cc0'
            WHEN mit = 1 THEN 'mit'
            WHEN apache = 1 THEN 'apache-2.0'
            WHEN gpl = 1 THEN 'gpl'
            WHEN arr = 1 THEN 'all-rights-reserved'
            ELSE NULL END AS license_guess
FROM x
"""


SQL_LICENSE_SCAN = _sql_license_scan()

QUERIES["license_scan"] = (q_license_scan, SQL_LICENSE_SCAN)


def q_krippendorff(spark, sf):
    """Krippendorff's alpha over a 3-rater labeling of customer segments
    with MISSING ratings (r2 skips custkey%5==0, r3 skips custkey%3==0 —
    the shape kappa cannot handle): r2 mislabels every 4th, r3 every
    7th with decoys. Exact integer ppm; units with <2 ratings drop."""
    from .operators.stats import krippendorff_alpha

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    k = F.col("c_custkey")
    seg = F.col("c_mktsegment")
    r1 = cu.select(k.alias("item"), F.lit("r1").alias("rater"), seg.alias("label"))
    r2 = cu.filter(k % 5 != 0).select(
        k.alias("item"), F.lit("r2").alias("rater"),
        F.when(k % 4 == 0, F.concat(F.lit("DECOY"), (k % 5).cast("string")))
        .otherwise(seg).alias("label"),
    )
    r3 = cu.filter(k % 3 != 0).select(
        k.alias("item"), F.lit("r3").alias("rater"),
        F.when(k % 7 == 0, F.concat(F.lit("DECOY"), (k % 3).cast("string")))
        .otherwise(seg).alias("label"),
    )
    return krippendorff_alpha(r1.unionByName(r2).unionByName(r3))


SQL_KRIPPENDORFF = """
WITH r AS (
  SELECT c_custkey AS item, 'r1' AS rater, c_mktsegment AS label FROM customer
  UNION ALL
  SELECT c_custkey, 'r2',
         CASE WHEN c_custkey % 4 = 0 THEN 'DECOY' || CAST(c_custkey % 5 AS VARCHAR)
              ELSE c_mktsegment END
  FROM customer WHERE c_custkey % 5 <> 0
  UNION ALL
  SELECT c_custkey, 'r3',
         CASE WHEN c_custkey % 7 = 0 THEN 'DECOY' || CAST(c_custkey % 3 AS VARCHAR)
              ELSE c_mktsegment END
  FROM customer WHERE c_custkey % 3 <> 0
),
pc AS (
  SELECT item, label, COUNT(*) AS o FROM (
    SELECT item, rater, MIN(label) AS label FROM r GROUP BY item, rater
  ) GROUP BY item, label
),
pu AS (
  SELECT item, SUM(o) AS n_u, SUM(o * o) AS s_u
  FROM pc GROUP BY item HAVING SUM(o) >= 2
),
us AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_units, CAST(SUM(n_u) AS BIGINT) AS n,
         CAST(SUM(1000000 * (n_u * n_u - s_u) // (n_u - 1)) AS BIGINT) AS do_scaled
  FROM pu
),
ct AS (
  SELECT CAST(COALESCE(SUM(n_c * n_c), 0) AS BIGINT) AS s_c FROM (
    SELECT label, SUM(o) AS n_c FROM pc JOIN pu USING (item) GROUP BY label
  )
)
SELECT n_units, n AS n_ratings, do_scaled,
       CAST(n * n - s_c AS BIGINT) AS de_num,
       CASE WHEN n * n - s_c > 0
            THEN CAST(1000000 - (n - 1) * do_scaled // (n * n - s_c) AS BIGINT)
       END AS alpha_ppm
FROM us CROSS JOIN ct
"""

QUERIES["krippendorff"] = (q_krippendorff, SQL_KRIPPENDORFF)


def q_edit_verify(spark, sf):
    """Prefix-blocked Levenshtein ER verify: match a half-sized 'dirty
    registry' of SKU-prefixed part names ('m<key mod 997> <p_name>';
    every 4th dirty name has its 'a's deleted) against the clean list —
    block on first-4 chars (the SKU token, so blocks stay discriminative
    where the raw two-word p_name vocabulary is degenerate), verify at
    sim ≥ 0.8 with both engines' classic DP levenshtein."""
    from .operators.linking import blocked_edit_join

    p = spark.read.parquet(f"{sf}/part.parquet")
    sku_name = F.concat(
        F.lit("m"), (F.col("p_partkey") % 997).cast("string"),
        F.lit(" "), F.col("p_name"),
    )
    left = p.select(F.col("p_partkey").alias("id"), sku_name.alias("name"))
    right = p.filter(F.col("p_partkey") % 2 == 0).select(
        F.col("p_partkey").alias("rid"),
        F.when(F.col("p_partkey") % 4 == 0, F.expr(
            "concat('m', CAST(p_partkey % 997 AS STRING), ' ', replace(p_name, 'a', ''))"
        )).otherwise(sku_name).alias("rname"),
    )
    return blocked_edit_join(left, right, block_len=4, min_sim_ppm=800_000)


SQL_EDIT_VERIFY = """
WITH l AS (
  SELECT p_partkey AS id,
         'm' || CAST(p_partkey % 997 AS VARCHAR) || ' ' || p_name AS name
  FROM part
),
r AS (
  SELECT p_partkey AS rid,
         'm' || CAST(p_partkey % 997 AS VARCHAR) || ' ' ||
         CASE WHEN p_partkey % 4 = 0 THEN replace(p_name, 'a', '')
              ELSE p_name END AS rname
  FROM part WHERE p_partkey % 2 = 0
),
lb AS (SELECT id, name, substr(lower(trim(name)), 1, 4) AS bk FROM l),
rb AS (SELECT rid, rname, substr(lower(trim(rname)), 1, 4) AS bk FROM r),
ok AS (
  SELECT bk FROM (SELECT bk, COUNT(*) AS nl FROM lb GROUP BY bk) a
  JOIN (SELECT bk, COUNT(*) AS nr FROM rb GROUP BY bk) b USING (bk)
  WHERE nl * nr <= 1000000
),
cand AS (
  SELECT id, rid, name, rname
  FROM lb JOIN ok USING (bk) JOIN rb USING (bk)
)
SELECT id, rid, name, rname,
       CAST(levenshtein(name, rname) AS BIGINT) AS lev,
       CAST(CASE WHEN greatest(length(name), length(rname)) > 0
                 THEN 1000000 * (greatest(length(name), length(rname))
                                 - levenshtein(name, rname))
                      // greatest(length(name), length(rname))
                 ELSE 1000000 END AS BIGINT) AS sim_ppm
FROM cand
WHERE CASE WHEN greatest(length(name), length(rname)) > 0
           THEN 1000000 * (greatest(length(name), length(rname))
                           - levenshtein(name, rname))
                // greatest(length(name), length(rname))
           ELSE 1000000 END >= 800000
"""

QUERIES["edit_verify"] = (q_edit_verify, SQL_EDIT_VERIFY)


def q_heavy_hitters(spark, sf):
    """φ-heavy hitters over the document token stream (sample-and-verify
    two-pass: the 1/8 occurrence hash-sample nominates, the exact pass
    verifies count > N/40) — exact counts out, sampled shuffle in."""
    from .operators.sketches import phi_heavy_hitters

    toks = (
        _docs(spark, sf)
        .select(
            "doc_id",
            F.posexplode(F.split(F.trim(F.col("text")), " +")).alias("pos", "tok"),
        )
        .filter(F.col("tok") != "")
    )
    occ = toks.select(
        F.col("tok").alias("item"),
        F.concat_ws(":", "doc_id", "pos", "tok").alias("occ"),
    )
    return phi_heavy_hitters(occ, "item", "occ", k=40, sample_mod=8)


def _sql_heavy_hitters() -> str:
    from .operators.sketches import phi_heavy_hitters_sql

    occ = """
  SELECT ws[i + 1] AS item,
         CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR) || ':' || ws[i + 1] AS occ
  FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS ws FROM documents),
       unnest(range(0, len(ws))) AS t(i)
  WHERE ws[i + 1] <> ''
"""
    return phi_heavy_hitters_sql(occ, k=40, sample_mod=8)


SQL_HEAVY_HITTERS = _sql_heavy_hitters()

QUERIES["heavy_hitters"] = (q_heavy_hitters, SQL_HEAVY_HITTERS)


def q_dp_counts(spark, sf):
    """ε=0.5 differentially-private per-language document counts
    (discrete-Laplace inverse-CDF lookup, one deterministic draw per
    (seed, group), noisy counts < 5 suppressed)."""
    from .operators.privacy import dp_group_counts

    return dp_group_counts(
        _docs(spark, sf), "lang", epsilon_ppm=500_000, publish_min=5
    )


def _sql_dp_counts() -> str:
    from .operators.privacy import dp_group_counts_sql

    return dp_group_counts_sql(
        "documents", "lang", epsilon_ppm=500_000, publish_min=5
    )


SQL_DP_COUNTS = _sql_dp_counts()

QUERIES["dp_counts"] = (q_dp_counts, SQL_DP_COUNTS)


def q_mst(spark, sf):
    """Borůvka minimum spanning forest over a 23-node order-flow graph
    (edges o_custkey%23 ↔ (o_orderkey·7+13)%23, weight (o_orderkey·37+
    o_custkey)%99991, lightest parallel edge kept). Oracle = the cycle
    property under the same (w,a,b) total order: an edge is in the MSF
    iff no lighter-bottleneck path connects its endpoints, with the
    bottleneck closure computed by 5 min-max matrix squarings (exact
    for any path ≤ 32 > 22 hops)."""
    from .operators.cc import boruvka_msf

    od = spark.read.parquet(f"{sf}/orders.parquet")
    e = od.select(
        (F.col("o_custkey") % 23).alias("a"),
        ((F.col("o_orderkey") * 7 + 13) % 23).alias("b"),
        ((F.col("o_orderkey") * 37 + F.col("o_custkey")) % 99991).alias("w"),
    )
    return boruvka_msf(e).select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("w").cast("long").alias("w"),
    )


def _sql_mst() -> str:
    # min-max (bottleneck) closure by squaring: r_{k+1} covers paths up
    # to 2^(k+1) hops; 5 squarings ≥ the 22-hop diameter bound of V=23
    sq = """
r{next} AS (
  SELECT u, v, MIN(mx) AS mx FROM (
    SELECT u, v, mx FROM r{cur}
    UNION ALL
    SELECT p.u, q.v, GREATEST(p.mx, q.mx) AS mx
    FROM r{cur} p JOIN r{cur} q ON q.u = p.v AND q.v <> p.u
  ) GROUP BY u, v
)"""
    steps = ",".join(sq.format(cur=i, next=i + 1) for i in range(5))
    return f"""
WITH raw AS (
  SELECT o_custkey % 23 AS x, (o_orderkey * 7 + 13) % 23 AS y,
         (o_orderkey * 37 + o_custkey) % 99991 AS w
  FROM orders
),
eu AS (
  SELECT LEAST(x, y) AS a, GREATEST(x, y) AS b, MIN(w) AS w
  FROM raw WHERE x <> y GROUP BY 1, 2
),
ek AS (SELECT a, b, w, (w * 23 + a) * 23 + b AS key FROM eu),
r0 AS (
  SELECT u, v, MIN(key) AS mx FROM (
    SELECT a AS u, b AS v, key FROM ek
    UNION ALL SELECT b, a, key FROM ek
  ) GROUP BY u, v
),{steps}
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, CAST(w AS BIGINT) AS w
FROM ek
WHERE NOT EXISTS (SELECT 1 FROM r5 WHERE u = ek.a AND v = ek.b AND mx < ek.key)
"""


SQL_MST = _sql_mst()

QUERIES["mst"] = (q_mst, SQL_MST)


def q_single_linkage(spark, sf):
    """Single-linkage clustering = Borůvka MSF cut at τ — the defining
    equivalence (clusters at threshold τ ARE the connected components of
    the τ-thresholded graph) is the oracle: DuckDB computes components
    of the thresholded ORIGINAL edges recursively, Spark cuts the MSF.
    Output (node, cluster = numeric min member, csize)."""
    from .operators.cc import boruvka_msf, connected_components

    od = spark.read.parquet(f"{sf}/orders.parquet")
    e = od.select(
        (F.col("o_custkey") % 23).alias("a"),
        ((F.col("o_orderkey") * 7 + 13) % 23).alias("b"),
        ((F.col("o_orderkey") * 37 + F.col("o_custkey")) % 99991).alias("w"),
    ).filter(F.col("a") != F.col("b"))
    cut = boruvka_msf(e).filter(F.col("w") < 30000)
    comp = connected_components(
        cut.select(F.col("a").cast("string").alias("src"), F.col("b").cast("string").alias("dst"))
    )
    nodes = (
        e.select(F.col("a").alias("node")).unionByName(e.select(F.col("b").alias("node")))
        .distinct().withColumn("nstr", F.col("node").cast("string"))
    )
    lab = (
        nodes.join(comp.withColumnRenamed("node", "nstr"), "nstr", "left")
        .select("node", F.coalesce("component", F.col("nstr")).alias("label"))
    )
    reps = lab.groupBy("label").agg(
        F.min("node").cast("long").alias("cluster"),
        F.count(F.lit(1)).cast("long").alias("csize"),
    )
    return lab.join(reps, "label").select(
        F.col("node").cast("long").alias("node"), "cluster", "csize"
    )


SQL_SINGLE_LINKAGE = """
WITH RECURSIVE raw AS (
  SELECT o_custkey % 23 AS x, (o_orderkey * 7 + 13) % 23 AS y,
         (o_orderkey * 37 + o_custkey) % 99991 AS w
  FROM orders
),
eu AS (
  SELECT LEAST(x, y) AS a, GREATEST(x, y) AS b, MIN(w) AS w
  FROM raw WHERE x <> y GROUP BY 1, 2
),
ts AS (
  SELECT a, b FROM eu WHERE w < 30000
  UNION SELECT b, a FROM eu WHERE w < 30000
),
nodes AS (SELECT DISTINCT a AS node FROM eu UNION SELECT DISTINCT b FROM eu),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT ts.b, reach.label FROM reach JOIN ts ON ts.a = reach.node
),
comp AS (SELECT node, MIN(label) AS cluster FROM reach GROUP BY node)
SELECT CAST(node AS BIGINT) AS node, CAST(cluster AS BIGINT) AS cluster,
       CAST(COUNT(*) OVER (PARTITION BY cluster) AS BIGINT) AS csize
FROM comp
"""

QUERIES["single_linkage"] = (q_single_linkage, SQL_SINGLE_LINKAGE)


def q_mad_outliers(spark, sf):
    """Hampel robust outlier screen per nation over account balances in
    cents, with planted mega-balances (custkey%97==0 → +10M cents):
    |x − med| > 3·MAD flags the plants, and the lower-discrete-median
    arithmetic is identical in both engines."""
    from .operators.stats import mad_outliers

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    t = cu.select(
        F.col("c_nationkey").alias("g"),
        F.col("c_custkey").alias("ck"),
        (
            F.round(F.col("c_acctbal") * 100).cast("long")
            + F.when(F.col("c_custkey") % 97 == 0, 10_000_000).otherwise(0)
        ).alias("val"),
    )
    return mad_outliers(t, "g", "val", k_mad=3).select(
        F.col("g").cast("long").alias("g"), F.col("ck").cast("long").alias("ck"),
        "val", F.col("med").cast("long").alias("med"), F.col("mad").cast("long").alias("mad"),
    )


SQL_MAD_OUTLIERS = """
WITH t AS (
  SELECT c_nationkey AS g, c_custkey AS ck,
         CAST(round(c_acctbal * 100) AS BIGINT)
         + CASE WHEN c_custkey % 97 = 0 THEN 10000000 ELSE 0 END AS val
  FROM customer
),
med AS (
  SELECT g, val AS med FROM (
    SELECT g, val, ROW_NUMBER() OVER (PARTITION BY g ORDER BY val) AS rn,
           COUNT(*) OVER (PARTITION BY g) AS n
    FROM t
  ) WHERE rn = (n + 1) // 2
),
dev AS (
  SELECT t.g, ck, val, med, abs(val - med) AS adev
  FROM t JOIN med ON med.g = t.g
),
mad AS (
  SELECT g, adev AS mad FROM (
    SELECT g, adev, ROW_NUMBER() OVER (PARTITION BY g ORDER BY adev, val) AS rn,
           COUNT(*) OVER (PARTITION BY g) AS n
    FROM dev
  ) WHERE rn = (n + 1) // 2
)
SELECT CAST(dev.g AS BIGINT) AS g, CAST(ck AS BIGINT) AS ck, val,
       CAST(med AS BIGINT) AS med, CAST(mad AS BIGINT) AS mad
FROM dev JOIN mad ON mad.g = dev.g
WHERE adev > 3 * mad
"""

QUERIES["mad_outliers"] = (q_mad_outliers, SQL_MAD_OUTLIERS)


def q_benford(spark, sf):
    """Benford first-digit audit: 'organic' order totals (cents) vs a
    'template' source whose values are fabricated (500000 + key%7 —
    first digit always 5). The fabricated group's total-variation
    distance from Benford is the flag."""
    from .operators.stats import benford_audit

    od = spark.read.parquet(f"{sf}/orders.parquet")
    organic = od.select(
        F.lit("organic").alias("src"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("val"),
    )
    template = od.select(
        F.lit("template").alias("src"),
        (F.lit(500000) + F.col("o_orderkey") % 7).cast("long").alias("val"),
    )
    return benford_audit(organic.unionByName(template), "src", "val", min_n=50)


def _sql_benford() -> str:
    from .operators.stats import BENFORD_PPM

    arr = "[" + ",".join(str(v) for v in BENFORD_PPM) + "]"
    return f"""
WITH src AS (
  SELECT 'organic' AS grp, CAST(round(o_totalprice * 100) AS BIGINT) AS val FROM orders
  UNION ALL
  SELECT 'template', CAST(500000 + o_orderkey % 7 AS BIGINT) FROM orders
),
dd AS (
  SELECT grp, CAST(regexp_extract(CAST(abs(val) AS VARCHAR), '[1-9]', 0) AS INT) AS d
  FROM src WHERE regexp_extract(CAST(abs(val) AS VARCHAR), '[1-9]', 0) <> ''
),
per AS (SELECT grp, d, COUNT(*) AS o FROM dd GROUP BY grp, d),
sc AS (
  SELECT grp, d, o, SUM(o) OVER (PARTITION BY grp) AS n, {arr}[d] AS e,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY o DESC, d ASC) AS rn1
  FROM per
),
fold AS (
  SELECT grp, MAX(n) AS n,
         SUM(abs(1000000 * o // n - e)) + {sum(BENFORD_PPM)} - SUM(e) AS tv,
         COALESCE(MAX(CASE WHEN d = 1 THEN 1000000 * o // n END), 0) AS share1,
         MAX(CASE WHEN rn1 = 1 THEN d END) AS top_digit
  FROM sc GROUP BY grp
)
SELECT grp, CAST(n AS BIGINT) AS n, CAST(tv // 2 AS BIGINT) AS tvd_ppm,
       CAST(share1 AS BIGINT) AS share1_ppm, CAST(top_digit AS BIGINT) AS top_digit
FROM fold WHERE n >= 50
"""


SQL_BENFORD = _sql_benford()

QUERIES["benford"] = (q_benford, SQL_BENFORD)


def q_stats_merge(spark, sf):
    """Mergeable partition statistics: 16 'files' of orders each publish
    (n, sum, min, max, HLL registers); table stats come from MERGING the
    summaries. The oracle computes the same stats by DIRECT full scan —
    equality is the mergeability proof (register merge by per-bucket
    MAX is lossless)."""
    from .operators.sketches import merge_stats, partition_stats

    od = spark.read.parquet(f"{sf}/orders.parquet").select(
        (F.col("o_orderkey") % 16).alias("part"),
        F.col("o_custkey").alias("val"),
    )
    scalars, registers = partition_stats(od, "part", "val")
    return merge_stats(scalars, registers)


def _sql_stats_merge() -> str:
    from .operators.sketches import hll_oracle_sql

    hll = hll_oracle_sql("(SELECT o_custkey AS v FROM orders)", "v", (), estimate=True)
    return f"""
WITH direct AS (
  SELECT CAST(COUNT(DISTINCT o_orderkey % 16) AS BIGINT) AS n_parts,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(o_custkey) AS BIGINT) AS vsum,
         CAST(MIN(o_custkey) AS BIGINT) AS vmin,
         CAST(MAX(o_custkey) AS BIGINT) AS vmax
  FROM orders
),
h AS ({hll})
SELECT n_parts, n, vsum, vmin, vmax, h.nb, h.s_sum, h.est
FROM direct CROSS JOIN h
"""


SQL_STATS_MERGE = _sql_stats_merge()

QUERIES["stats_merge"] = (q_stats_merge, SQL_STATS_MERGE)


def q_changepoint(spark, sf):
    """Exact two-segment least-squares changepoint per nation over a
    40-day synthetic crawl-volume series with a planted regime shift at
    day 15+(nation%10): the detector must recover each plant."""
    from .operators.temporal import changepoint

    na = spark.read.parquet(f"{sf}/nation.parquet")
    days = na.select(
        F.col("n_nationkey").alias("g"),
        F.explode(F.sequence(F.lit(0), F.lit(39))).alias("day"),
    )
    x = (
        F.lit(100) + (F.col("g") * F.col("day")) % 5
        + F.when(F.col("day") >= 15 + F.col("g") % 10, 50).otherwise(0)
    )
    series = days.withColumn("x", x.cast("long"))
    return changepoint(series, "g", "day", "x", scale=100).select(
        F.col("grp").cast("long").alias("grp"), "n", "split_t",
        "pre_mean_xs", "post_mean_xs", "score",
    )


SQL_CHANGEPOINT = """
WITH series AS (
  SELECT n_nationkey AS g, i AS day,
         CAST(100 + (n_nationkey * i) % 5
              + CASE WHEN i >= 15 + n_nationkey % 10 THEN 50 ELSE 0 END AS BIGINT) AS x
  FROM nation, unnest(range(0, 40)) AS t(i)
),
cum AS (
  SELECT g, day, x,
         SUM(x) OVER (PARTITION BY g ORDER BY day) AS a,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY day) AS s,
         COUNT(*) OVER (PARTITION BY g) AS n,
         SUM(x) OVER (PARTITION BY g) AS tot
  FROM series
),
cand AS (
  SELECT g, n, day AS split_t, s,
         100 * a * a // s + 100 * (tot - a) * (tot - a) // (n - s) AS score,
         100 * a // s AS pre_mean_xs,
         100 * (tot - a) // (n - s) AS post_mean_xs
  FROM cum WHERE s < n
),
pick AS (
  SELECT g, n, split_t, pre_mean_xs, post_mean_xs, score,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY score DESC, s ASC) AS rn
  FROM cand
)
SELECT CAST(g AS BIGINT) AS grp, CAST(n AS BIGINT) AS n,
       CAST(split_t AS BIGINT) AS split_t,
       CAST(pre_mean_xs AS BIGINT) AS pre_mean_xs,
       CAST(post_mean_xs AS BIGINT) AS post_mean_xs,
       CAST(score AS BIGINT) AS score
FROM pick WHERE rn = 1
"""

QUERIES["changepoint"] = (q_changepoint, SQL_CHANGEPOINT)


def q_sweep_cut(spark, sf):
    """ACL sweep cut over the chain-with-chords graph: exact ≤2-hop walk
    counts from the min-custkey seed are the diffusion scores; the sweep
    returns the conductance curve over the top-10 score/deg prefix order
    with the best (local community) prefix flagged."""
    from .operators.cc import sweep_cut

    _r, e = _chain_graph(spark, sf)
    sym = e.select("src", "dst").unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    cu = spark.read.parquet(f"{sf}/customer.parquet")
    seed = cu.agg(F.min("c_custkey").cast("string").alias("sd"))
    h1 = sym.join(F.broadcast(seed), F.col("src") == F.col("sd")).select(
        F.col("dst").alias("node"), F.lit(1).alias("c")
    )
    h2 = (
        sym.join(F.broadcast(seed), F.col("src") == F.col("sd"))
        .select(F.col("dst").alias("mid"))
        .join(sym.select(F.col("src").alias("mid"), F.col("dst").alias("node")), "mid")
        .groupBy("node").agg(F.count(F.lit(1)).alias("c"))
    )
    scores = (
        h1.unionByName(h2).groupBy("node").agg(F.sum("c").cast("long").alias("score"))
    )
    return sweep_cut(e, scores, k_max=10).select(
        "k", "node", "deg", "vol", "cut", "cond_ppm", "is_best"
    )


SQL_SWEEP_CUT = (
    "WITH "
    + _CHAIN_SQL
    + """,
sym AS (SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw),
sd AS (SELECT CAST(MIN(c_custkey) AS VARCHAR) AS sd FROM customer),
h1 AS (SELECT dst AS node, 1 AS c FROM sym, sd WHERE src = sd),
h2 AS (
  SELECT s2.dst AS node, COUNT(*) AS c
  FROM sym s1 JOIN sd ON s1.src = sd.sd
  JOIN sym s2 ON s2.src = s1.dst
  GROUP BY s2.dst
),
scores AS (
  SELECT node, CAST(SUM(c) AS BIGINT) AS score
  FROM (SELECT * FROM h1 UNION ALL SELECT * FROM h2) GROUP BY node
),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM sym WHERE src <> dst
),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
),
m2 AS (SELECT 2 * COUNT(*) AS m2 FROM und),
ranked AS (
  SELECT node, score, deg,
         ROW_NUMBER() OVER (ORDER BY score * 1000000 // deg DESC, node ASC) AS k
  FROM scores JOIN deg USING (node)
  ORDER BY score * 1000000 // deg DESC, node ASC LIMIT 10
),
within AS (
  SELECT GREATEST(ra.k, rb.k) AS k, COUNT(*) AS nw
  FROM und JOIN ranked ra ON ra.node = und.a JOIN ranked rb ON rb.node = und.b
  GROUP BY 1
),
curve AS (
  SELECT r.k, r.node, CAST(r.deg AS BIGINT) AS deg,
         CAST(SUM(r.deg) OVER (ORDER BY r.k) AS BIGINT) AS vol,
         CAST(SUM(r.deg) OVER (ORDER BY r.k)
              - 2 * SUM(COALESCE(w.nw, 0)) OVER (ORDER BY r.k) AS BIGINT) AS cut,
         LEAST(SUM(r.deg) OVER (ORDER BY r.k),
               m2.m2 - SUM(r.deg) OVER (ORDER BY r.k)) AS den
  FROM ranked r LEFT JOIN within w ON w.k = r.k CROSS JOIN m2
),
scored AS (
  SELECT k, node, deg, vol, cut,
         CASE WHEN den > 0 THEN CAST(1000000 * cut // den AS BIGINT) END AS cond_ppm
  FROM curve
),
pick AS (
  SELECT k AS bk FROM scored
  ORDER BY COALESCE(cond_ppm, 2000000) ASC, k ASC LIMIT 1
)
SELECT k, node, deg, vol, cut, cond_ppm,
       CAST(CASE WHEN k = (SELECT bk FROM pick) THEN 1 ELSE 0 END AS INT) AS is_best
FROM scored
"""
)

QUERIES["sweep_cut"] = (q_sweep_cut, SQL_SWEEP_CUT)


def _file_stats(spark, sf):
    """Per-'file' zone stats for orders under two layouts: clustered
    (custkey-range files) vs scattered (orderkey-hash files) — the
    side-by-side that shows zone maps only pay on clustered data."""
    from .operators.sketches import partition_stats

    od = spark.read.parquet(f"{sf}/orders.parquet")
    out = []
    for layout, part in (
        ("clustered", F.expr("o_custkey div 64")),
        ("scattered", F.col("o_orderkey") % 32),
    ):
        d = od.select(part.alias("part"), F.col("o_custkey").alias("val"))
        sc, _regs = partition_stats(d, "part", "val")
        out.append(sc.withColumn("layout", F.lit(layout)))
    return out[0].unionByName(out[1]).select("layout", "part", "n", "vmin", "vmax")


_SQL_FILE_STATS = """
fs AS (
  SELECT layout, part, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(MIN(val) AS BIGINT) AS vmin, CAST(MAX(val) AS BIGINT) AS vmax
  FROM (
    SELECT 'clustered' AS layout, o_custkey // 64 AS part, o_custkey AS val FROM orders
    UNION ALL
    SELECT 'scattered', o_orderkey % 32, o_custkey FROM orders
  ) GROUP BY layout, part
)"""


def q_zonemap(spark, sf):
    """Zone-map pruning simulation for val ∈ [1000, 1999] over the two
    layouts — the clustered layout skips nearly everything, the
    scattered one scans every file."""
    from .operators.sketches import zonemap_prune

    return zonemap_prune(_file_stats(spark, sf), 1000, 1999)


SQL_ZONEMAP = (
    "WITH " + _SQL_FILE_STATS + """
SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(CASE WHEN NOT (vmax < 1000 OR vmin > 1999) THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       CAST(SUM(n) AS BIGINT) AS rows_total,
       CAST(SUM(CASE WHEN NOT (vmax < 1000 OR vmin > 1999) THEN n ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST(1000000 * (SUM(n) - SUM(CASE WHEN NOT (vmax < 1000 OR vmin > 1999) THEN n ELSE 0 END))
            // SUM(n) AS BIGINT) AS skip_ppm
FROM fs GROUP BY layout
"""
)

QUERIES["zonemap"] = (q_zonemap, SQL_ZONEMAP)


def q_overlap_depth(spark, sf):
    """Zone-overlap clustering depth for the same two layouts; the
    oracle counts overlaps by an INDEPENDENT interval self-join (files
    are metadata-sized there), the operator by join-free sort-position
    counting — agreement checks the sweep arithmetic."""
    from .operators.sketches import overlap_depth

    return overlap_depth(_file_stats(spark, sf))


SQL_OVERLAP_DEPTH = (
    "WITH " + _SQL_FILE_STATS + """,
ov AS (
  SELECT a.layout, a.part, COUNT(*) - 1 AS ov
  FROM fs a JOIN fs b
    ON b.layout = a.layout AND b.vmin <= a.vmax AND b.vmax >= a.vmin
  GROUP BY a.layout, a.part
)
SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(100 * SUM(ov) // COUNT(*) AS BIGINT) AS avg_overlap_x100,
       CAST(MAX(ov) AS BIGINT) AS max_overlap
FROM ov GROUP BY layout
"""
)

QUERIES["overlap_depth"] = (q_overlap_depth, SQL_OVERLAP_DEPTH)


def q_graph_anon(spark, sf):
    """Structural re-identifiability of the chain-with-chords graph
    release: H1 (degree) and H2 (degree + sorted neighbor degrees)
    signature classes with sizes — singleton classes are uniquely
    re-identifiable nodes. Fixture degrees ≤ 4, far under the
    truncation cap, so the oracle mirrors untruncated."""
    from .operators.privacy import graph_anonymity

    _r, e = _chain_graph(spark, sf)
    return graph_anonymity(e)


SQL_GRAPH_ANON = (
    "WITH "
    + _CHAIN_SQL
    + """,
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE src <> dst
),
adj AS (SELECT a AS v, b AS u FROM und UNION ALL SELECT b, a FROM und),
deg AS (SELECT v, COUNT(*) AS deg FROM adj GROUP BY v),
h1 AS (
  SELECT 1 AS level, CAST(deg AS VARCHAR) AS sig, CAST(COUNT(*) AS BIGINT) AS n
  FROM deg GROUP BY deg
),
nbr AS (SELECT adj.v AS v, d2.deg AS udeg FROM adj JOIN deg d2 ON d2.v = adj.u),
h2s AS (
  SELECT v, string_agg(CAST(udeg AS VARCHAR), ',' ORDER BY udeg) AS nsig
  FROM nbr GROUP BY v
),
h2 AS (
  SELECT 2 AS level, CAST(deg AS VARCHAR) || '|' || nsig AS sig,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM h2s JOIN deg USING (v) GROUP BY 2
)
SELECT * FROM h1 UNION ALL SELECT * FROM h2
"""
)

QUERIES["graph_anon"] = (q_graph_anon, SQL_GRAPH_ANON)


def q_kdeg_cost(spark, sf):
    """Greedy k-degree-anonymization price quote (k=7) for the chain
    graph: sort degrees desc, runs of 7 (last run absorbs remainder),
    raise to run max — Σ raised degrees is the edge-addition budget."""
    from .operators.privacy import kdeg_cost

    _r, e = _chain_graph(spark, sf)
    return kdeg_cost(e, k=7)


SQL_KDEG_COST = (
    "WITH "
    + _CHAIN_SQL
    + """,
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM raw WHERE src <> dst
),
deg AS (
  SELECT v, COUNT(*) AS deg FROM (
    SELECT a AS v FROM und UNION ALL SELECT b FROM und
  ) GROUP BY v
),
ranked AS (
  SELECT v, deg, ROW_NUMBER() OVER (ORDER BY deg DESC, v ASC) AS rn,
         COUNT(*) OVER () AS tot
  FROM deg
),
g AS (
  SELECT LEAST((rn - 1) // 7, GREATEST(tot // 7 - 1, 0)) AS grp, deg
  FROM ranked
),
pg AS (SELECT grp, MAX(deg) AS gmax, SUM(deg) AS gsum, COUNT(*) AS gn FROM g GROUP BY grp)
SELECT 7 AS k, CAST(SUM(gn) AS BIGINT) AS n_nodes,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(gmax * gn - gsum) AS BIGINT) AS added_degree_total
FROM pg
"""
)

QUERIES["kdeg_cost"] = (q_kdeg_cost, SQL_KDEG_COST)


def q_rich_club(spark, sf):
    """Rich-club coefficient curve over a 211-node 1-in-5-sampled
    order-flow graph (degree spread 8-24 distinct values across sf —
    a denser modulus saturates into a complete graph and the curve
    vacates) — do high-degree nodes preferentially interlink? One row
    per degree threshold with ≥2 qualifying nodes."""
    from .operators.cc import rich_club

    od = spark.read.parquet(f"{sf}/orders.parquet").filter(
        F.col("o_orderkey") % 5 == 0
    )
    e = od.select(
        (F.col("o_custkey") % 211).alias("src"),
        ((F.col("o_orderkey") * 7 + 13) % 211).alias("dst"),
    )
    return rich_club(e)


SQL_RICH_CLUB = """
WITH raw AS (
  SELECT o_custkey % 211 AS x, (o_orderkey * 7 + 13) % 211 AS y
  FROM orders WHERE o_orderkey % 5 = 0
),
und AS (
  SELECT DISTINCT LEAST(x, y) AS a, GREATEST(x, y) AS b
  FROM raw WHERE x <> y
),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
),
nh AS (SELECT deg, COUNT(*) AS nn FROM deg GROUP BY deg),
eh AS (
  SELECT LEAST(da.deg, db.deg) AS deg, COUNT(*) AS ne
  FROM und JOIN deg da ON da.node = und.a JOIN deg db ON db.node = und.b
  GROUP BY 1
),
hist AS (
  SELECT COALESCE(nh.deg, eh.deg) AS deg, COALESCE(nn, 0) AS nn, COALESCE(ne, 0) AS ne
  FROM nh FULL JOIN eh ON eh.deg = nh.deg
),
curve AS (
  SELECT deg AS k,
         COALESCE(SUM(nn) OVER (ORDER BY deg DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_k,
         COALESCE(SUM(ne) OVER (ORDER BY deg DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS e_k
  FROM hist
)
SELECT CAST(k AS BIGINT) AS k, CAST(n_k AS BIGINT) AS n_k,
       CAST(e_k AS BIGINT) AS e_k,
       CAST(1000000 * 2 * e_k // (n_k * (n_k - 1)) AS BIGINT) AS phi_ppm
FROM curve WHERE n_k >= 2
"""

QUERIES["rich_club"] = (q_rich_club, SQL_RICH_CLUB)


def q_pr_curve(spark, sf):
    """Precision-recall threshold curve for a deterministic scored
    matcher over customers (score correlates with the planted truth
    flag): exact counts + pinned ppm rates per distinct score, max-F1
    row flagged (ties → highest threshold)."""
    from .operators.stats import pr_curve

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    k = F.col("c_custkey")
    scored = cu.select(
        ((k * 7) % 100).cast("long").alias("score"),
        (((k * 7) % 100 + k % 13) > 60).cast("int").alias("is_true"),
    )
    return pr_curve(scored)


SQL_PR_CURVE = """
WITH scored AS (
  SELECT CAST((c_custkey * 7) % 100 AS BIGINT) AS score,
         CASE WHEN (c_custkey * 7) % 100 + c_custkey % 13 > 60 THEN 1 ELSE 0 END AS is_true
  FROM customer
),
per AS (
  SELECT score AS thr, SUM(is_true) AS t, SUM(1 - is_true) AS f
  FROM scored GROUP BY score
),
cum AS (
  SELECT thr,
         CAST(SUM(t) OVER (ORDER BY thr DESC) AS BIGINT) AS tp,
         CAST(SUM(f) OVER (ORDER BY thr DESC) AS BIGINT) AS fp,
         CAST(SUM(t) OVER () - SUM(t) OVER (ORDER BY thr DESC) AS BIGINT) AS fn
  FROM per
),
rates AS (
  SELECT thr, tp, fp, fn,
         CAST(1000000 * tp // (tp + fp) AS BIGINT) AS prec_ppm,
         CAST(CASE WHEN tp + fn > 0 THEN 1000000 * tp // (tp + fn) ELSE 0 END AS BIGINT) AS rec_ppm
  FROM cum
),
f1 AS (
  SELECT thr, tp, fp, fn, prec_ppm, rec_ppm,
         CAST(CASE WHEN prec_ppm + rec_ppm > 0
                   THEN 2 * prec_ppm * rec_ppm // (prec_ppm + rec_ppm)
                   ELSE 0 END AS BIGINT) AS f1_ppm
  FROM rates
),
pick AS (SELECT thr AS bthr FROM f1 ORDER BY f1_ppm DESC, thr DESC LIMIT 1)
SELECT thr, tp, fp, fn, prec_ppm, rec_ppm, f1_ppm,
       CAST(CASE WHEN thr = (SELECT bthr FROM pick) THEN 1 ELSE 0 END AS INT) AS is_best
FROM f1
"""

QUERIES["pr_curve"] = (q_pr_curve, SQL_PR_CURVE)


def q_gini(spark, sf):
    """Per-language Gini concentration of document sizes (the corpus-
    card diversity scalar): exact sorted-cumulative identity in pinned
    integer ppm."""
    from .operators.stats import gini_ppm

    return gini_ppm(
        _docs(spark, sf).select("lang", F.col("n_chars").cast("long").alias("v")),
        "lang", "v",
    )


SQL_GINI = """
WITH ranked AS (
  SELECT lang, n_chars AS v,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars ASC) AS i
  FROM documents
),
agg AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s,
         CAST(SUM(i * v) AS BIGINT) AS ws
  FROM ranked GROUP BY lang
)
SELECT lang, n, s,
       CASE WHEN s > 0
            THEN CAST(1000000 * (2 * ws - (n + 1) * s) // (n * s) AS BIGINT)
       END AS gini_ppm
FROM agg
"""

QUERIES["gini"] = (q_gini, SQL_GINI)


def q_bootstrap(spark, sf):
    """Poisson bootstrap of the mean document size: 32 replicates ride
    ONE scan via per-(replicate, doc) Poisson(1) hash weights; the
    replicate table (b, n_eff, mean_ppm) is fully oracled."""
    from .operators.stats import poisson_bootstrap

    return poisson_bootstrap(
        _docs(spark, sf).select("doc_id", F.col("n_chars").cast("long").alias("v")),
        "doc_id", "v", replicates=32,
    )


def _sql_bootstrap() -> str:
    from .operators.stats import _poisson1_thresholds

    case = "CASE " + " ".join(
        f"WHEN u < {upper} THEN {k}" for upper, k in _poisson1_thresholds()
    ) + " END"
    return f"""
WITH expl AS (
  SELECT i AS b, doc_id, n_chars AS v
  FROM documents, unnest(range(0, 32)) AS t(i)
),
w AS (
  SELECT b, v,
         ('0x' || substr(md5('boot1:' || CAST(b AS VARCHAR) || ':' ||
                              CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         % {1 << 30} AS u
  FROM expl
),
wk AS (SELECT b, v, {case} AS wt FROM w)
SELECT CAST(b AS INT) AS b, CAST(SUM(wt) AS BIGINT) AS n_eff,
       CASE WHEN SUM(wt) > 0
            THEN CAST(1000000 * SUM(wt * v) // SUM(wt) AS BIGINT)
       END AS mean_ppm
FROM wk GROUP BY b
"""


SQL_BOOTSTRAP = _sql_bootstrap()

QUERIES["bootstrap"] = (q_bootstrap, SQL_BOOTSTRAP)


def q_auc(spark, sf):
    """Exact ROC-AUC (Mann-Whitney with doubled tie ranks) of the same
    deterministic correlated scorer as pr_curve — the threshold-free
    ranking-quality scalar."""
    from .operators.stats import auc_exact

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    k = F.col("c_custkey")
    scored = cu.select(
        ((k * 7) % 100).cast("long").alias("score"),
        (((k * 7) % 100 + k % 13) > 60).cast("int").alias("is_true"),
    )
    return auc_exact(scored)


SQL_AUC = """
WITH scored AS (
  SELECT CAST((c_custkey * 7) % 100 AS BIGINT) AS score,
         CASE WHEN (c_custkey * 7) % 100 + c_custkey % 13 > 60 THEN 1 ELSE 0 END AS is_true
  FROM customer
),
per AS (
  SELECT score AS s, SUM(is_true) AS p, COUNT(*) AS c FROM scored GROUP BY score
),
cur AS (
  SELECT s, p, c,
         COALESCE(SUM(c) OVER (ORDER BY s ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
  FROM per
),
fold AS (
  SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
         CAST(SUM(c) - SUM(p) AS BIGINT) AS n_neg,
         CAST(SUM(p * (2 * bef + c + 1)) AS BIGINT) AS r2
  FROM cur
)
SELECT n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0
            THEN CAST(1000000 * (r2 - n_pos * (n_pos + 1))
                      // (2 * n_pos * n_neg) AS BIGINT)
       END AS auc_ppm
FROM fold
"""

QUERIES["auc"] = (q_auc, SQL_AUC)


def q_ks_drift(spark, sf):
    """Two-sample KS drift between even-id documents and odd-id
    documents with a planted +40-char shift — the binning-free
    distribution-drift alarm, exact integer ppm."""
    from .operators.stats import ks_drift

    d = _docs(spark, sf)
    a = d.filter(F.col("doc_id") % 2 == 0).select(F.col("n_chars").cast("long").alias("v"))
    b = d.filter(F.col("doc_id") % 2 == 1).select(
        (F.col("n_chars") + 40).cast("long").alias("v")
    )
    return ks_drift(a, b, "v")


SQL_KS_DRIFT = """
WITH tagged AS (
  SELECT CAST(n_chars AS BIGINT) AS v, 1 AS sa FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT CAST(n_chars + 40 AS BIGINT), 0 FROM documents WHERE doc_id % 2 = 1
),
per AS (
  SELECT v, CAST(SUM(sa) AS BIGINT) AS ca, CAST(SUM(1 - sa) AS BIGINT) AS cb
  FROM tagged GROUP BY v
),
cur AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v ASC) AS fa,
         SUM(cb) OVER (ORDER BY v ASC) AS fb,
         SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
  FROM per
),
d AS (
  SELECT v, na, nb,
         abs(1000000 * fa // na - 1000000 * fb // nb) AS dd
  FROM cur
),
pick AS (SELECT v AS bv, dd FROM d ORDER BY dd DESC, v ASC LIMIT 1)
SELECT CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
       CAST((SELECT dd FROM pick) AS BIGINT) AS d_ppm,
       CAST((SELECT bv FROM pick) AS BIGINT) AS at_value
FROM d
"""

QUERIES["ks_drift"] = (q_ks_drift, SQL_KS_DRIFT)


def q_cusum(spark, sf):
    """Page's CUSUM drift alarm over per-nation 40-day series: nations
    g%3==0 get a +30 volume shift at day 20+g%5; the alarm must fire on
    exactly those nations a few days after their shift (the prefix-min
    closed form makes the sequential statistic two windows)."""
    from .operators.temporal import cusum_alarm

    na = spark.read.parquet(f"{sf}/nation.parquet")
    days = na.select(
        F.col("n_nationkey").alias("g"),
        F.explode(F.sequence(F.lit(0), F.lit(39))).alias("day"),
    )
    x = (
        F.lit(100) + (F.col("g") * F.col("day")) % 5
        + F.when(
            (F.col("g") % 3 == 0) & (F.col("day") >= 20 + F.col("g") % 5), 30
        ).otherwise(0)
    )
    series = days.withColumn("x", x.cast("long"))
    return cusum_alarm(series, "g", "day", "x", mu=102, slack=10, threshold=60).select(
        F.col("g").cast("long").alias("g"), F.col("day").cast("long").alias("day"),
        "s", "first_alarm",
    )


SQL_CUSUM = """
WITH series AS (
  SELECT n_nationkey AS g, i AS day,
         CAST(100 + (n_nationkey * i) % 5
              + CASE WHEN n_nationkey % 3 = 0 AND i >= 20 + n_nationkey % 5
                     THEN 30 ELSE 0 END AS BIGINT) AS x
  FROM nation, unnest(range(0, 40)) AS t(i)
),
p AS (
  SELECT g, day, SUM(x - 112) OVER (PARTITION BY g ORDER BY day) AS p
  FROM series
),
s AS (
  SELECT g, day,
         CAST(p - MIN(LEAST(p, 0)) OVER (PARTITION BY g ORDER BY day) AS BIGINT) AS s
  FROM p
),
a AS (SELECT g, day, s FROM s WHERE s > 60)
SELECT CAST(g AS BIGINT) AS g, CAST(day AS BIGINT) AS day, s,
       CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY g ORDER BY day) = 1
                 THEN 1 ELSE 0 END AS INT) AS first_alarm
FROM a
"""

QUERIES["cusum"] = (q_cusum, SQL_CUSUM)


def q_lag_corr(spark, sf):
    """Lag-7 autocorrelation of per-nation daily volumes with a planted
    weekly cycle (+20 every 7th day) — seasonality detection in exact
    integer sufficient statistics + r² ppm."""
    from .operators.stats import lag_corr

    na = spark.read.parquet(f"{sf}/nation.parquet")
    days = na.select(
        F.col("n_nationkey").alias("g"),
        F.explode(F.sequence(F.lit(0), F.lit(55))).alias("day"),
    )
    x = (
        F.lit(100)
        + F.when(F.col("day") % 7 == 0, 20).otherwise(0)
        + (F.col("g") * F.col("day")) % 3
    )
    series = days.withColumn("x", x.cast("long"))
    return lag_corr(series, "g", "day", "x", lag=7).select(
        F.col("g").cast("long").alias("g"), "lag", "n", "ncov", "r2_ppm", "sign",
    )


SQL_LAG_CORR = """
WITH series AS (
  SELECT n_nationkey AS g, i AS day,
         CAST(100 + CASE WHEN i % 7 = 0 THEN 20 ELSE 0 END
              + (n_nationkey * i) % 3 AS BIGINT) AS x
  FROM nation, unnest(range(0, 56)) AS t(i)
),
j AS (
  SELECT a.g, a.x AS x, b.x AS y
  FROM series a JOIN series b ON b.g = a.g AND b.day = a.day + 7
),
fold AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
  FROM j GROUP BY g
)
SELECT CAST(g AS BIGINT) AS g, CAST(7 AS INT) AS lag, n,
       CAST(n * sxy - sx * sy AS BIGINT) AS ncov,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(1000000 * (n * sxy - sx * sy) * (n * sxy - sx * sy)
                      // ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS BIGINT)
       END AS r2_ppm,
       CAST(CASE WHEN n * sxy - sx * sy > 0 THEN 1
                 WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 0 END AS INT) AS sign
FROM fold
"""

QUERIES["lag_corr"] = (q_lag_corr, SQL_LAG_CORR)


def q_winsorize(spark, sf):
    """Per-nation winsorization of account balances (cents) at the
    exact discrete [25%, 75%] quantiles (IQR clipping — tail quantiles
    are degenerate on the small per-nation groups of the low-sf
    fixtures: ceil(0.99·n) = n IS the max, so nothing would cap), with
    planted absurd values (custkey%89==0 → ±10M cents)."""
    from .operators.stats import winsorize

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    k = F.col("c_custkey")
    t = cu.select(
        F.col("c_nationkey").alias("g"), k.alias("id"),
        (
            F.round(F.col("c_acctbal") * 100).cast("long")
            + F.when(k % 89 == 0, F.when(k % 2 == 0, 10_000_000).otherwise(-10_000_000))
            .otherwise(0)
        ).alias("v"),
    )
    return winsorize(t, "g", "id", "v", lo_ppm=250_000, hi_ppm=750_000).select(
        F.col("g").cast("long").alias("g"), F.col("id").cast("long").alias("id"),
        "v", "vlo", "vhi", "v_capped",
    )


SQL_WINSORIZE = """
WITH t AS (
  SELECT c_nationkey AS g, c_custkey AS id,
         CAST(round(c_acctbal * 100) AS BIGINT)
         + CASE WHEN c_custkey % 89 = 0
                THEN CASE WHEN c_custkey % 2 = 0 THEN 10000000 ELSE -10000000 END
                ELSE 0 END AS v
  FROM customer
),
ranked AS (
  SELECT g, id, v,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, id) AS rn,
         COUNT(*) OVER (PARTITION BY g) AS n
  FROM t
),
bounds AS (
  SELECT g,
         MIN(CASE WHEN rn = GREATEST(1, (250000 * n + 999999) // 1000000) THEN v END) AS vlo,
         MAX(CASE WHEN rn = GREATEST(1, (750000 * n + 999999) // 1000000) THEN v END) AS vhi
  FROM ranked
  WHERE rn = GREATEST(1, (250000 * n + 999999) // 1000000)
     OR rn = GREATEST(1, (750000 * n + 999999) // 1000000)
  GROUP BY g
)
SELECT CAST(t.g AS BIGINT) AS g, CAST(id AS BIGINT) AS id, v,
       CAST(vlo AS BIGINT) AS vlo, CAST(vhi AS BIGINT) AS vhi,
       CAST(LEAST(GREATEST(v, vlo), vhi) AS BIGINT) AS v_capped
FROM t JOIN bounds ON bounds.g = t.g
WHERE v < vlo OR v > vhi
"""

QUERIES["winsorize"] = (q_winsorize, SQL_WINSORIZE)


def q_cat_drift(spark, sf):
    """Categorical mix drift: language distribution of even-id docs vs
    odd-id docs with a third of odd 'de' docs relabeled 'fr' — the
    TVD-in-ppm alarm with the top-moving category."""
    from .operators.stats import cat_drift

    d = _docs(spark, sf)
    a = d.filter(F.col("doc_id") % 2 == 0).select("lang")
    b = d.filter(F.col("doc_id") % 2 == 1).select(
        F.when((F.col("lang") == "de") & (F.col("doc_id") % 3 == 0), "fr")
        .otherwise(F.col("lang")).alias("lang")
    )
    return cat_drift(a, b, "lang")


SQL_CAT_DRIFT = """
WITH tagged AS (
  SELECT lang AS c, 1 AS sa FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT CASE WHEN lang = 'de' AND doc_id % 3 = 0 THEN 'fr' ELSE lang END, 0
  FROM documents WHERE doc_id % 2 = 1
),
per AS (
  SELECT c, CAST(SUM(sa) AS BIGINT) AS ca, CAST(SUM(1 - sa) AS BIGINT) AS cb
  FROM tagged GROUP BY c
),
dev AS (
  SELECT c, ca, cb,
         SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb,
         abs(CASE WHEN SUM(ca) OVER () > 0 THEN 1000000 * ca // SUM(ca) OVER () ELSE 0 END
             - CASE WHEN SUM(cb) OVER () > 0 THEN 1000000 * cb // SUM(cb) OVER () ELSE 0 END) AS d
  FROM per
),
pick AS (SELECT c, d FROM dev ORDER BY d DESC, c ASC LIMIT 1)
SELECT CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
       CAST(COUNT(*) AS BIGINT) AS n_cats,
       CAST(SUM(d) // 2 AS BIGINT) AS tvd_ppm,
       (SELECT c FROM pick) AS top_mover,
       CAST((SELECT d FROM pick) AS BIGINT) AS top_dev_ppm
FROM dev
"""

QUERIES["cat_drift"] = (q_cat_drift, SQL_CAT_DRIFT)


def q_fair_quota(spark, sf):
    """Max-min fair crawl-budget allocation (water-filling) over 97
    synthetic host demands (1..23 via count mod) against a budget of
    200 — small hosts fully served, big hosts share the level θ; exact
    integer θ and the deliberately-unallocated slack reported."""
    from .operators.urls import fair_quota

    od = spark.read.parquet(f"{sf}/orders.parquet")
    demands = (
        od.groupBy((F.col("o_custkey") % 97).cast("long").alias("host"))
        .agg((F.count(F.lit(1)) % 23 + 1).cast("long").alias("demand"))
    )
    return fair_quota(demands, budget=200)


SQL_FAIR_QUOTA = """
WITH d AS (
  SELECT CAST(o_custkey % 97 AS BIGINT) AS host,
         CAST(COUNT(*) % 23 + 1 AS BIGINT) AS demand
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT host, demand,
         ROW_NUMBER() OVER (ORDER BY demand, host) AS k,
         SUM(demand) OVER (ORDER BY demand, host) AS p,
         COUNT(*) OVER () AS n
  FROM d
),
feas AS (
  SELECT k, p, demand, n FROM ranked WHERE p + (n - k) * demand <= 200
  UNION ALL
  SELECT 0, 0, 0, (SELECT MAX(n) FROM ranked)
),
ks AS (SELECT k, p, demand AS dd, n FROM feas ORDER BY k DESC LIMIT 1),
lvl AS (
  SELECT CASE WHEN k < n THEN CAST((200 - p) // (n - k) AS BIGINT) END AS theta,
         CAST(CASE WHEN k < n THEN (200 - p) % (n - k) ELSE 0 END AS BIGINT) AS slack
  FROM ks
)
SELECT host, demand,
       CAST(CASE WHEN theta IS NULL THEN demand
                 ELSE LEAST(demand, theta) END AS BIGINT) AS alloc,
       theta, slack
FROM d CROSS JOIN lvl
"""

QUERIES["fair_quota"] = (q_fair_quota, SQL_FAIR_QUOTA)


def q_distinctive(spark, sf):
    """Per-language distinctive vocabulary (top-5 smoothed odds ratio
    vs the rest of the corpus) with planted language-specific marker
    tokens (every lang-L doc gets ' marker<L>' appended) — the markers
    must dominate their language's ranking."""
    from .operators.textops import distinctive_terms

    d = _docs(spark, sf).withColumn(
        "text", F.concat(F.col("text"), F.lit(" zq"), F.col("lang"))
    )
    return distinctive_terms(d, "lang", "text", k=5, min_count=5)


SQL_DISTINCTIVE = """
WITH toks AS (
  SELECT lang AS grp, unnest(string_split_regex(trim(text || ' zq' || lang), ' +')) AS token
  FROM documents
),
cell AS (
  SELECT grp, token, COUNT(*) AS n FROM toks WHERE token <> '' GROUP BY grp, token
),
gtot AS (SELECT grp, SUM(n) AS gt FROM cell GROUP BY grp),
ttot AS (SELECT token, SUM(n) AS tt FROM cell GROUP BY token),
alltot AS (SELECT SUM(n) AS at FROM cell),
scored AS (
  SELECT c.grp, c.token, c.n,
         1000000 * (c.n + 1) * (at - gt - tt + c.n + 1)
           // ((gt - c.n + 1) * (tt - c.n + 1)) AS or_x1e6
  FROM cell c JOIN gtot USING (grp) JOIN ttot USING (token) CROSS JOIN alltot
  WHERE c.n >= 5
),
ranked AS (
  SELECT grp, token, n, or_x1e6,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY or_x1e6 DESC, token ASC) AS rank
  FROM scored
)
SELECT grp, token, CAST(n AS BIGINT) AS n_in, CAST(or_x1e6 AS BIGINT) AS or_x1e6,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
"""

QUERIES["distinctive"] = (q_distinctive, SQL_DISTINCTIVE)


def q_burstiness(spark, sf):
    """Token burstiness (Fano factor of per-doc counts) over the corpus
    with a planted bursty token (doc_id%19==0 docs get ' zzb' ×6) —
    bursty content tokens score far above the ≈1.0 Poisson floor."""
    from .operators.textops import burstiness

    d = _docs(spark, sf).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 19 == 0,
            F.concat(F.col("text"), F.lit(" zzb zzb zzb zzb zzb zzb")),
        ).otherwise(F.col("text")),
    )
    return burstiness(d, "text", min_total=50)


SQL_BURSTINESS = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 19 = 0 THEN text || ' zzb zzb zzb zzb zzb zzb'
              ELSE text END AS text
  FROM documents
),
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS token FROM d
),
per_doc AS (
  SELECT doc_id, token, COUNT(*) AS x FROM toks WHERE token <> '' GROUP BY doc_id, token
),
per_tok AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS n_docs_with,
         CAST(SUM(x) AS BIGINT) AS total, CAST(SUM(x * x) AS BIGINT) AS sx2
  FROM per_doc GROUP BY token
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents)
SELECT token, n_docs_with, total,
       CAST(1000000 * (nd * sx2 - total * total) // ((nd - 1) * total) AS BIGINT) AS fano_ppm
FROM per_tok CROSS JOIN nd
WHERE total >= 50
"""

QUERIES["burstiness"] = (q_burstiness, SQL_BURSTINESS)


def q_novelty(spark, sf):
    """Per-document 3-gram novelty vs all earlier documents, with
    planted full duplicates (doc_id%13==3 docs carry doc_id−3's text
    when that doc exists) — duplicates must score ≈0 novelty while
    early originals score high."""
    from .operators.textops import novelty_scores

    d = _docs(spark, sf)
    src = d.select(F.col("doc_id").alias("src_id"), F.col("text").alias("src_text"))
    planted = (
        d.withColumn(
            "want_src",
            F.when(F.col("doc_id") % 13 == 3, F.col("doc_id") - 3),
        )
        .join(src, F.col("want_src") == F.col("src_id"), "left")
        .select(
            "doc_id",
            F.coalesce("src_text", F.col("text")).alias("text"),
        )
    )
    return novelty_scores(planted, n=3)


SQL_NOVELTY = """
WITH planted AS (
  SELECT d.doc_id, COALESCE(s.text, d.text) AS text
  FROM documents d
  LEFT JOIN documents s
    ON d.doc_id % 13 = 3 AND s.doc_id = d.doc_id - 3
),
w AS (SELECT doc_id, string_split_regex(trim(text), ' +') AS ws FROM planted),
grams AS (
  SELECT DISTINCT doc_id AS doc,
         array_to_string(ws[i + 1 : i + 3], ' ') AS gram
  FROM w, unnest(range(0, GREATEST(len(ws) - 2, 0))) AS t(i)
  WHERE len(ws) >= 3 AND array_to_string(ws[i + 1 : i + 3], ' ') <> ''
),
owner AS (SELECT gram, MIN(doc) AS owner FROM grams GROUP BY gram)
SELECT CAST(doc AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN owner = doc THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(1000000 * SUM(CASE WHEN owner = doc THEN 1 ELSE 0 END) // COUNT(*) AS BIGINT) AS novelty_ppm
FROM grams JOIN owner USING (gram)
GROUP BY doc
"""

QUERIES["novelty"] = (q_novelty, SQL_NOVELTY)


# ---------------------------------------------------------------------------
# Round-4 batch A: streaming-parity driver anchors (VERDICT r3 task 6).
#
# The streaming layer (streaming.py) is pytest-parity-verified by nature —
# a StreamingQuery can't be handed to the driver's collect/compare gate.
# These three entries close that gap for the DETERMINISTIC streaming ops:
# each drains a real multi-micro-batch availableNow run (input split into
# 8 files, maxFilesPerTrigger=2 → 4 micro-batches, so the cross-batch
# state fold is genuinely exercised) and returns the folded STATE as a
# static DataFrame, which the driver then compares against the batch
# operator's DuckDB oracle. Integer register/counter state makes the
# stream/batch agreement bit-exact, not approximate.


def _stream_spool(spark, df, prefix, n_files=8):
    """Write a DataFrame as an n_files-part parquet directory in scratch
    space so the file-source stream sees multiple micro-batches. Driver
    scratch only (bounded: sf-test-sized inputs); production streams read
    the arriving table in place."""
    import tempfile

    path = tempfile.mkdtemp(prefix=f"ords_{prefix}_")
    df.repartition(n_files).write.mode("overwrite").parquet(path)
    return path


def q_stream_hll(spark, sf):
    """Streaming HLL distinct-user estimates per event_type: 4-batch
    availableNow drain folding per-batch register sketches by cell-wise
    MAX (streaming.stream_hll_estimate), then the integer-exact read
    path. Oracle = the BATCH hll_estimate SQL over the same rows — the
    max-merge is associative/commutative/idempotent, so the micro-batch
    fold is bit-identical to the one-shot sketch."""
    from .streaming import stream_hll_estimate

    ev = spark.read.parquet(f"{sf}/events.parquet")
    path = _stream_spool(spark, ev, "shll")
    h = stream_hll_estimate(spark, path, "user_id", ["event_type"], max_files_per_batch=2)
    h.query.awaitTermination(300)
    return h.estimates()


QUERIES["stream_hll"] = (q_stream_hll, _hll_sql("events", "user_id", ["event_type"], estimate=True))


def q_stream_cms(spark, sf):
    """Streaming count-min token-frequency grid: 4-batch availableNow
    drain folding per-batch cell counts by cell-wise SUM
    (streaming.stream_cms_sketch). Oracle = the BATCH cms_sketch SQL —
    integer sums are associative, so batch/stream/shard orderings agree
    exactly."""
    from .streaming import stream_cms_sketch

    docs = _docs(spark, sf)
    path = _stream_spool(spark, docs, "scms")
    h = stream_cms_sketch(spark, path, max_files_per_batch=2)
    h.query.awaitTermination(300)
    return h.cells()


QUERIES["stream_cms"] = (q_stream_cms, SQL_CMS_SKETCH)


def q_stream_dedup(spark, sf):
    """Streaming exact dedup: every document text spooled TWICE (second
    copy under doc_id+1000000), drained through dropDuplicates-on-md5
    state across 4 micro-batches, memory sink. Which doc_id survives a
    duplicate pair is scheduler-dependent, so the driver-compared
    projection is the surviving CONTENT-HASH SET — exactly one survivor
    per distinct text, which the oracle states as DISTINCT md5(text)
    over the original table."""
    import uuid

    from .streaming import stream_dedup_exact

    base = _docs(spark, sf).select("doc_id", "text")
    doubled = base.unionByName(base.withColumn("doc_id", F.col("doc_id") + 1000000))
    path = _stream_spool(spark, doubled, "sdedup")
    sink = f"ords_stream_dedup_{uuid.uuid4().hex}"
    q = (
        stream_dedup_exact(spark, path, max_files_per_batch=2)
        .writeStream.format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink).select(F.md5(F.col("text").cast("binary")).alias("text_md5")).distinct()


SQL_STREAM_DEDUP = "SELECT DISTINCT md5(text) AS text_md5 FROM documents"

QUERIES["stream_dedup"] = (q_stream_dedup, SQL_STREAM_DEDUP)


# ---------------------------------------------------------------------------
# Round-4 window rotation (VERDICT r3 task 1): replace all 50 driver-
# confirmed r3 entries with 50 never-driver-checked oracled queries —
# the §8 families with the strongest scale claims (graph analytics,
# sketches, closures, curation, retrieval, sources) plus the three new
# streaming-parity anchors. Policy unchanged (comment at the original
# DRIVER_WINDOW): edits must be deliberate and land together with the
# WINDOW_MANIFEST copy in tests/test_suite_registry.py.

DRIVER_WINDOW[:] = [
    # graph analytics
    "pagerank", "triangles", "kcore", "bfs_dist", "label_prop", "scc_cycles",
    "louvain", "hyperball",
    # sketches / stats
    "hll_sketch", "hll_estimate", "cms_sketch", "kmv_users",
    "exact_quantiles", "heavy_hitters",
    # ontology / validation closures
    "rdfs_closure", "owl_rl", "shacl_report",
    # curation / dedup / training prep
    "decontaminate", "span_dedup", "pack_offsets", "lm_score", "line_dedup",
    "quality_rules", "pii_scrub", "semdedup", "kmeans", "best_keeper",
    "kg_negs", "dsir",
    # retrieval
    "bm25_rank", "postings", "rrf",
    # urls / temporal / warehouse
    "url_canon", "url_dedup", "asof_attribution", "range_prior_activity",
    "merge_upsert", "graph_diff",
    # SPARQL frontier + dictionary encoding
    "rdfstar_prov", "sparql_text_service", "sparql_text_lateral",
    "path_repeat", "dict_terms", "dict_bgp",
    # web-source extractors
    "warc_roundtrip", "mf2_triples", "table_triples",
    # streaming-parity anchors (new r4)
    "stream_hll", "stream_cms", "stream_dedup",
]

assert len(DRIVER_WINDOW) == 50 and len(set(DRIVER_WINDOW)) == 50
assert all(QUERIES[n][1] is not None for n in DRIVER_WINDOW)
_rest = [n for n in QUERIES if n not in set(DRIVER_WINDOW)]
QUERIES = {n: QUERIES[n] for n in [*DRIVER_WINDOW, *_rest]}


def q_rdfs_delta(spark, sf):
    """Incremental RDFS closure maintenance (DRed — operators/rdfs.py ::
    rdfs_closure_delta): the q_rdfs_closure ontology + store, then a
    delta batch — DELETE the inNation edges of every 5th customer and
    the rdf:type Customer assertion of every 7th, ADD 50 fresh subjects
    with inNation edges — maintained incrementally from the old
    materialized closure. The ORACLE is a FULL RECOMPUTE over the
    updated base in SQL, so the driver pins incremental ≡ recompute."""
    from .operators.rdfs import DOMAIN, RANGE, SUBCLASS, SUBPROP, rdfs_closure, rdfs_closure_delta
    from .types import RDF_TYPE as _RT, TRIPLES_SCHEMA, triple_row as _tr

    schema = [
        ("urn:c:Customer", SUBCLASS, "urn:c:Party"),
        ("urn:c:Supplier", SUBCLASS, "urn:c:Party"),
        ("urn:c:Party", SUBCLASS, "urn:c:Agent"),
        ("urn:p:inNation", SUBPROP, "urn:p:locatedIn"),
        ("urn:p:inNation", DOMAIN, "urn:c:Located"),
        ("urn:p:locatedIn", RANGE, "urn:c:Place"),
    ]
    rows = [_tr(Iri(s), Iri(p), Iri(o), graph="urn:g:schema") for s, p, o in schema]
    base = triples_view(spark, sf).unionByName(spark.createDataFrame(rows, schema=TRIPLES_SCHEMA))
    old_inf = rdfs_closure(base)

    def t(s_col, p, o_col):
        return F.struct(
            F.lit(0).cast("tinyint").alias("s_kind"), s_col.alias("s_lex"),
            F.lit(p).alias("pred"),
            F.lit(0).cast("tinyint").alias("o_kind"), o_col.alias("o_lex"),
            F.lit(None).cast("string").alias("o_dtype"), F.lit(None).cast("string").alias("o_lang"),
            F.lit("urn:g:delta").alias("graph"), F.lit(None).cast("string").alias("src_url"),
            F.lit(None).cast("string").alias("extractor"), F.lit(None).cast("int").alias("part_id"),
        )

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    del_edges = cu.filter(F.col("c_custkey") % 5 == 0).select(
        t(F.concat(F.lit("urn:cu:"), F.col("c_custkey").cast("string")), "urn:p:inNation",
          F.concat(F.lit("urn:n:"), F.col("c_nationkey").cast("string"))).alias("t")
    ).select("t.*")
    del_types = cu.filter(F.col("c_custkey") % 7 == 0).select(
        t(F.concat(F.lit("urn:cu:"), F.col("c_custkey").cast("string")), _RT,
          F.lit("urn:c:Customer")).alias("t")
    ).select("t.*")
    delete = del_edges.unionByName(del_types)
    add = spark.range(50).select(
        t(F.concat(F.lit("urn:x:NEW"), F.col("id").cast("string")), "urn:p:inNation",
          F.concat(F.lit("urn:n:"), (F.col("id") % 25).cast("string"))).alias("t")
    ).select("t.*")

    ent = rdfs_closure_delta(base, old_inf, add, delete)
    return ent.select(F.col("s_lex").alias("s"), F.col("pred").alias("p"), F.col("o_lex").alias("o"))


SQL_RDFS_DELTA = """
SELECT 'urn:c:Customer' AS s, 'http://www.w3.org/2000/01/rdf-schema#subClassOf' AS p, 'urn:c:Agent' AS o
UNION ALL SELECT 'urn:c:Supplier', 'http://www.w3.org/2000/01/rdf-schema#subClassOf', 'urn:c:Agent'
UNION ALL SELECT 'urn:cu:' || c_custkey, 'urn:p:locatedIn', 'urn:n:' || c_nationkey
          FROM customer WHERE c_custkey % 5 <> 0
UNION ALL SELECT 'urn:su:' || s_suppkey, 'urn:p:locatedIn', 'urn:n:' || s_nationkey FROM supplier
UNION ALL SELECT 'urn:x:NEW' || i, 'urn:p:locatedIn', 'urn:n:' || (i % 25) FROM range(50) AS t(i)
UNION ALL SELECT 'urn:cu:' || c_custkey, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'urn:c:Located'
          FROM customer WHERE c_custkey % 5 <> 0
UNION ALL SELECT 'urn:cu:' || c_custkey, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', cls
          FROM customer, (VALUES ('urn:c:Party'), ('urn:c:Agent')) AS t(cls)
          WHERE c_custkey % 7 <> 0
UNION ALL SELECT 'urn:su:' || s_suppkey, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', cls
          FROM supplier, (VALUES ('urn:c:Located'), ('urn:c:Party'), ('urn:c:Agent')) AS t(cls)
UNION ALL SELECT 'urn:x:NEW' || i, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'urn:c:Located'
          FROM range(50) AS t(i)
UNION ALL SELECT DISTINCT 'urn:n:' || k, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'urn:c:Place'
          FROM (SELECT c_nationkey AS k FROM customer WHERE c_custkey % 5 <> 0
                UNION SELECT s_nationkey FROM supplier
                UNION SELECT i % 25 FROM range(50) AS t(i))
"""

QUERIES["rdfs_delta"] = (q_rdfs_delta, SQL_RDFS_DELTA)


def q_owl_consistency(spark, sf):
    """OWL 2 RL consistency report (operators/owlrl.py :: owl_consistency
    — the spec's false-conclusion rules cax-dw / prp-irp / prp-asyp /
    prp-pdw as violation rows): a fixture ontology over the customer
    table plants each violation class deterministically (every 10th
    customer typed into a disjoint class, every 9th chain edge
    reciprocated under an asymmetric property, every 13th customer
    self-looped under an irreflexive one, every 11th liking AND
    disliking the same nation under disjoint properties)."""
    from .operators.owlrl import (
        ASYMMETRIC, DISJOINT_WITH, IRREFLEXIVE, PROP_DISJOINT_WITH, owl_consistency,
    )
    from .types import TRIPLES_SCHEMA, triple_row as _tr

    axioms = [
        ("urn:c:Customer", DISJOINT_WITH, "urn:c:Blocked"),
        ("urn:p:refBy", RDF_TYPE, ASYMMETRIC),
        ("urn:p:self", RDF_TYPE, IRREFLEXIVE),
        ("urn:p:likes", PROP_DISJOINT_WITH, "urn:p:dislikes"),
    ]
    ax = spark.createDataFrame(
        [_tr(Iri(s), Iri(p), Iri(o), graph="urn:g:ax") for s, p, o in axioms],
        schema=TRIPLES_SCHEMA,
    )

    def t(s_col, p, o_col):
        return F.struct(
            F.lit(0).cast("tinyint").alias("s_kind"), s_col.alias("s_lex"),
            F.lit(p).alias("pred"),
            F.lit(0).cast("tinyint").alias("o_kind"), o_col.alias("o_lex"),
            F.lit(None).cast("string").alias("o_dtype"), F.lit(None).cast("string").alias("o_lang"),
            F.lit("urn:g:cons").alias("graph"), F.lit(None).cast("string").alias("src_url"),
            F.lit(None).cast("string").alias("extractor"), F.lit(None).cast("int").alias("part_id"),
        )

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    k = F.col("c_custkey")
    cu_iri = F.concat(F.lit("urn:cu:"), k.cast("string"))
    parts = [
        cu.select(t(cu_iri, RDF_TYPE, F.lit("urn:c:Customer")).alias("t")),
        cu.filter(k % 10 == 0).select(t(cu_iri, RDF_TYPE, F.lit("urn:c:Blocked")).alias("t")),
        cu.filter(k % 13 == 0).select(t(cu_iri, "urn:p:self", cu_iri).alias("t")),
        cu.select(t(cu_iri, "urn:p:likes", F.concat(F.lit("urn:n:"), (k % 25).cast("string"))).alias("t")),
        cu.filter(k % 11 == 0).select(
            t(cu_iri, "urn:p:dislikes", F.concat(F.lit("urn:n:"), (k % 25).cast("string"))).alias("t")
        ),
    ]
    # forward chain edges k -> k+1 (only where k+1 exists), reversed every 9th
    b = cu.select(F.col("c_custkey").alias("k2"))
    fwd = cu.join(b, k + 1 == F.col("k2"))
    parts.append(fwd.select(
        t(cu_iri, "urn:p:refBy", F.concat(F.lit("urn:cu:"), F.col("k2").cast("string"))).alias("t")
    ))
    parts.append(fwd.filter(k % 9 == 0).select(
        t(F.concat(F.lit("urn:cu:"), F.col("k2").cast("string")), "urn:p:refBy", cu_iri).alias("t")
    ))
    inst = parts[0]
    for p_ in parts[1:]:
        inst = inst.unionByName(p_)
    store = ax.unionByName(inst.select("t.*"))
    return owl_consistency(store)


SQL_OWL_CONSISTENCY = """
SELECT 'cax-dw' AS rule, 'urn:cu:' || c_custkey AS node,
       'urn:c:Blocked' AS detail_a, 'urn:c:Customer' AS detail_b
FROM customer WHERE c_custkey % 10 = 0
UNION ALL
SELECT 'prp-irp', 'urn:cu:' || c_custkey, 'urn:p:self', 'urn:cu:' || c_custkey
FROM customer WHERE c_custkey % 13 = 0
UNION ALL
SELECT 'prp-asyp',
       LEAST('urn:cu:' || a.c_custkey, 'urn:cu:' || b.c_custkey),
       'urn:p:refBy',
       GREATEST('urn:cu:' || a.c_custkey, 'urn:cu:' || b.c_custkey)
FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
WHERE a.c_custkey % 9 = 0
UNION ALL
SELECT 'prp-pdw', 'urn:cu:' || c_custkey,
       'urn:p:dislikes urn:p:likes', 'urn:n:' || (c_custkey % 25)
FROM customer WHERE c_custkey % 11 = 0
"""

QUERIES["owl_consistency"] = (q_owl_consistency, SQL_OWL_CONSISTENCY)


def q_unigram_train(spark, sf):
    """Unigram-LM tokenizer training (textops.unigram_train — Kudo 2018,
    the SentencePiece model): distributed word-freq + substring seed,
    driver-local EM + prune (the bpe_train scale discipline — zero Spark
    jobs in the loop). Rows-only BY DESIGN: EM marginals over a
    segmentation lattice are not SQL-expressible; correctness is pinned
    by tests/test_unigram.py's differential fuzz against an
    independently written enumeration-based mirror (±1 ppm)."""
    from .operators.textops import unigram_train

    return unigram_train(
        _docs(spark, sf), vocab_size=48, seed_size=256, max_piece_len=4, n_em_rounds=2
    )


QUERIES["unigram_train"] = (q_unigram_train, None)


def q_media_png_real(spark, sf):
    """REAL PNG decode through the media operator (r4 — operators/png.py):
    one synthetic (4+k%8)×(3+k%5) image per nation, encoded with the
    deterministic from-scratch encoder, decoded back by media_metadata's
    real path. width/height/n_frames are closed-form in the key, so the
    oracle states them relationally; a stub decode (hash-derived dims)
    would mismatch every row."""
    from .operators.media import media_metadata
    from .operators.png import png_encode

    rows = []
    for r in spark.read.parquet(f"{sf}/nation.parquet").collect():  # 25 rows
        k = int(r["n_nationkey"])
        w, h = 4 + k % 8, 3 + k % 5
        px = [[((x * 7 + y * 13 + k) % 256, 0, 0, 255) for x in range(w)] for y in range(h)]
        rows.append((f"png:{k}", bytearray(png_encode(px))))
    df = spark.createDataFrame(rows, "media_id string, content binary")
    return media_metadata(df).select(
        "media_id", "kind",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_frames").cast("long").alias("n_frames"),
    )


SQL_MEDIA_PNG_REAL = """
SELECT 'png:' || n_nationkey AS media_id, 'image' AS kind,
       CAST(4 + n_nationkey % 8 AS BIGINT) AS width,
       CAST(3 + n_nationkey % 5 AS BIGINT) AS height,
       CAST(1 AS BIGINT) AS n_frames
FROM nation
"""

QUERIES["media_png_real"] = (q_media_png_real, SQL_MEDIA_PNG_REAL)


def q_media_wav_real(spark, sf):
    """REAL PCM WAV decode through the media operator (r4 —
    operators/wav.py): one 16-bit mono file per nation with 64+k sample
    frames at 8000 Hz. n_frames and the exact byte size (44-byte
    header + 2 bytes/frame) are closed-form in the key — the oracle
    would catch a stub decode or an off-by-one in RIFF chunk framing."""
    import struct

    from .operators.media import media_metadata

    rows = []
    for r in spark.read.parquet(f"{sf}/nation.parquet").collect():  # 25 rows
        k = int(r["n_nationkey"])
        n = 64 + k
        data = b"".join(struct.pack("<h", (i * 37 + k) % 200 - 100) for i in range(n))
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
            + b"data" + struct.pack("<I", len(data)) + data
        rows.append((f"wav:{k}", bytearray(b"RIFF" + struct.pack("<I", len(body)) + body)))
    df = spark.createDataFrame(rows, "media_id string, content binary")
    return media_metadata(df).select(
        "media_id", "kind", "n_bytes",
        F.col("n_frames").cast("long").alias("n_frames"),
    )


SQL_MEDIA_WAV_REAL = """
SELECT 'wav:' || n_nationkey AS media_id, 'audio' AS kind,
       CAST(44 + 2 * (64 + n_nationkey) AS BIGINT) AS n_bytes,
       CAST(64 + n_nationkey AS BIGINT) AS n_frames
FROM nation
"""

QUERIES["media_wav_real"] = (q_media_wav_real, SQL_MEDIA_WAV_REAL)


# ---------------------------------------------------------------------------
# Round-5 batch A: unigram Viterbi driver registration + two more
# streaming-parity anchors (VERDICT r4 tasks 3 and 9).


def q_unigram_encode(spark, sf):
    """Viterbi encode under a unigram LM trained on the same corpus
    (textops.unigram_train → textops.unigram_encode): the SentencePiece
    round-trip — train the piece table, then segment every document into
    its max-probability piece sequence. Rows-only BY DESIGN (VERDICT r4
    "what's wrong" #1): the backpointer DP has no tractable SQL form;
    value correctness is pinned by tests/test_unigram.py (tie-breaks,
    <unk> coverage, differential fuzz of the train side) — this entry
    exists so the driver EXECUTES the encode path end-to-end."""
    from .operators.textops import unigram_encode, unigram_train

    docs = _docs(spark, sf)
    pieces = unigram_train(
        docs, vocab_size=48, seed_size=256, max_piece_len=4, n_em_rounds=2
    ).select("piece", "logprob_ppm")
    return unigram_encode(docs, pieces)


QUERIES["unigram_encode"] = (q_unigram_encode, None)


def _stream_spool_ordered(spark, df, prefix, order_cols, n_files=8):
    """Write a DataFrame as n_files single-file parquet slices that are
    CONTIGUOUS in `order_cols` order, with strictly increasing mtimes, so
    the file-source stream's micro-batches replay the data in event-time
    order — the arrival contract a sessionizing stream assumes. Driver
    scratch only (bounded: sf-test-sized inputs); production streams read
    the arriving table in place, where arrival order IS event order."""
    import os
    import tempfile
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = tempfile.mkdtemp(prefix=f"ords_{prefix}_")
    pdf = df.orderBy(*order_cols).toPandas()
    n = len(pdf)
    t0 = time.time()
    for i in range(n_files):
        lo, hi = i * n // n_files, (i + 1) * n // n_files
        fp = os.path.join(path, f"{i:04d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pdf.iloc[lo:hi], preserve_index=False), fp,
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )
        os.utime(fp, (t0 + i, t0 + i))  # pin listing order = slice order
    return path


def q_stream_sessionize(spark, sf):
    """Streaming gap-sessionization driver anchor (r4 anchor recipe —
    streaming.stream_sessionize, the applyInPandasWithState operator):
    events spooled as 8 time-ordered slices, drained availableNow with
    maxFilesPerTrigger=2 → 4 micro-batches, so per-user open-session
    state genuinely carries ACROSS batches (extend / close / carry-in
    merge all exercised). The drain emits exactly the CLOSED sessions —
    each user's final session stays in state awaiting the
    processing-time timeout — so the oracle is the batch gap-session
    aggregate MINUS each user's last session."""
    import uuid

    from .streaming import stream_sessionize

    ev = spark.read.parquet(f"{sf}/events.parquet")
    path = _stream_spool_ordered(spark, ev, "ssess", ["ts", "event_id"])
    sink = f"ords_stream_sess_{uuid.uuid4().hex}"
    sdf = stream_sessionize(
        spark, path, gap_minutes=30, max_files_per_batch=2, flush_timeout=False
    )
    # state-store partition count is fixed at stream start from
    # spark.sql.shuffle.partitions; 150 users don't need 32 state
    # partitions × 4 micro-batches of Python worker round-trips, so
    # scope it down for the drain (production sizes this to the cluster)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(sink).select(
        "user_id", "session_idx", "start_us", "end_us", "n_events"
    )


SQL_STREAM_SESSIONIZE = """
WITH o AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, us,
         SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
),
agg AS (
  SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
         CAST(MIN(us) AS BIGINT) AS start_us, CAST(MAX(us) AS BIGINT) AS end_us,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM s GROUP BY user_id, sid
),
last AS (SELECT user_id, MAX(session_idx) AS li FROM agg GROUP BY user_id)
SELECT a.user_id, a.session_idx, a.start_us, a.end_us, a.n_events
FROM agg a JOIN last l ON a.user_id = l.user_id AND a.session_idx <> l.li
"""

QUERIES["stream_sessionize"] = (q_stream_sessionize, SQL_STREAM_SESSIONIZE)


def q_stream_attr_clicks(spark, sf):
    """Watermarked stream-stream attribution join driver anchor
    (streaming.stream_attribute_clicks): every (view, click) pair for
    the same user with the click inside [view_ts, view_ts+30min),
    drained availableNow across 4 micro-batches — cross-batch pairs
    (an impression in batch 1 matching a click in batch 3) only exist
    because BOTH sides' state stores carry forward. Inner-join matches
    emit as they arrive, so the drain equals the batch join exactly.
    The spool is randomly partitioned (order-free is the point here);
    the anchor watermark is set beyond the fixture's time span so NO
    state is evicted mid-drain — production uses the real horizon+delay
    watermark, which is what bounds state at 100 TB/day."""
    import uuid

    from .streaming import stream_attribute_clicks

    ev = spark.read.parquet(f"{sf}/events.parquet")
    path = _stream_spool(spark, ev, "sattr")
    sink = f"ords_stream_attr_{uuid.uuid4().hex}"
    sdf = stream_attribute_clicks(
        spark, path, horizon_minutes=30, watermark="3650 days", max_files_per_batch=2
    )
    # stream-stream join = TWO state stores per partition; fixture-sized
    # state doesn't need 32 of each per micro-batch (same scoping as the
    # sessionize anchor — production sizes this to the cluster)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return spark.table(sink).select("user_id", "imp_id", "click_id", "gap_us")


SQL_STREAM_ATTR_CLICKS = """
SELECT i.user_id, i.event_id AS imp_id, c.event_id AS click_id,
       CAST(epoch_us(c.ts) - epoch_us(i.ts) AS BIGINT) AS gap_us
FROM events i
JOIN events c
  ON c.user_id = i.user_id
 AND c.ts >= i.ts
 AND c.ts < i.ts + INTERVAL 30 MINUTE
WHERE i.event_type = 'view' AND c.event_type = 'click'
"""

QUERIES["stream_attr_clicks"] = (q_stream_attr_clicks, SQL_STREAM_ATTR_CLICKS)


# ---------------------------------------------------------------------------
# Round-5 window rotation (VERDICT r4 task 1): replace all 50 driver-
# confirmed r4 entries with 50 never-driver-checked queries — the
# family-balanced list from BENCH/R4_NOTES.md (graph analytics, ER/dedup,
# inference/KG, curation/stats, web sources, the two real codecs) plus
# this round's three new entries (the two streaming anchors and the
# rows-only unigram Viterbi registration). Policy unchanged (comment at
# the original DRIVER_WINDOW): edits land together with the
# WINDOW_MANIFEST copy in tests/test_suite_registry.py.

DRIVER_WINDOW[:] = [
    # graph analytics
    "betweenness", "ktruss", "tri_support", "katz", "hits", "closeness",
    "harmonic", "graph_ecc", "eff_diameter", "conductance", "modularity",
    "sssp",
    # ER / dedup
    "containment", "incr_dedup", "dup_extents", "cdc_chunks", "metablocking",
    "snm_pairs", "blocking_eval", "er_metrics", "er_bcubed", "dawid_skene",
    # inference / KG maintenance
    "rdfs_delta", "owl_consistency", "owl_chain", "same_as_keys",
    "shacl_sparql", "shacl_closed", "skos_audit", "type_infer", "trans_reduce",
    # curation / stats
    "dp_counts", "privacy_k_anon", "calibration", "auc", "benford",
    "changepoint", "winsorize", "ks_drift",
    # web sources
    "meta_triples", "boilerplate", "template_strip", "sitemap_parse",
    "robots", "redirects",
    # real media codecs (r4 additions, never driver-checked)
    "media_png_real", "media_wav_real",
    # new r5 entries
    "stream_sessionize", "stream_attr_clicks", "unigram_encode",
]

assert len(DRIVER_WINDOW) == 50 and len(set(DRIVER_WINDOW)) == 50
# every window entry except the justified rows-only Viterbi has an oracle
assert all(QUERIES[n][1] is not None for n in DRIVER_WINDOW if n != "unigram_encode")
_rest = [n for n in QUERIES if n not in set(DRIVER_WINDOW)]
QUERIES = {n: QUERIES[n] for n in [*DRIVER_WINDOW, *_rest]}


def q_media_png16_real(spark, sf):
    """REAL 16-bit PNG decode through the media operator (r5 — the
    bit-depth-matrix extension of operators/png.py): one constant-color
    16-bit RGBA image per nation, gray level g16 = v<<8 | (k & 0xFF)
    with v = (997·k + 31) % 256. Dimensions prove the 16-bit stride/
    filter path (a decoder mishandling 2-byte samples raises and falls
    to the stub's hash dims); the histogram's hot bin proves the
    SAMPLE VALUES — the BT.601 luma of gray v is v, so the single
    occupied bin is v div 16, closed-form in the key."""
    from .operators.media import media_features, media_metadata
    from .operators.png import png_encode

    rows = []
    for r in spark.read.parquet(f"{sf}/nation.parquet").collect():  # 25 rows
        k = int(r["n_nationkey"])
        w, h = 3 + k % 5, 2 + k % 4
        v = (997 * k + 31) % 256
        g16 = (v << 8) | (k & 0xFF)
        px = [[(g16, g16, g16, 0xFFFF) for _x in range(w)] for _y in range(h)]
        rows.append((f"png16:{k}", bytearray(png_encode(px, bit_depth=16))))
    df = spark.createDataFrame(rows, "media_id string, content binary")
    meta = media_metadata(df).select(
        "media_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
    )
    hot = media_features(df).select(
        "media_id",
        (F.expr("array_position(feature, array_max(feature))") - 1)
        .cast("long")
        .alias("hot_bin"),
        F.expr("CAST(array_max(feature) AS DOUBLE)").alias("hot_val"),
    )
    return meta.join(hot, "media_id")


SQL_MEDIA_PNG16_REAL = """
SELECT 'png16:' || n_nationkey AS media_id,
       CAST(3 + n_nationkey % 5 AS BIGINT) AS width,
       CAST(2 + n_nationkey % 4 AS BIGINT) AS height,
       CAST(((997 * n_nationkey + 31) % 256) // 16 AS BIGINT) AS hot_bin,
       CAST(1.0 AS DOUBLE) AS hot_val
FROM nation
"""

QUERIES["media_png16_real"] = (q_media_png16_real, SQL_MEDIA_PNG16_REAL)


# ---------------------------------------------------------------------------
# round-5 batch B: topological levels, densest-subgraph peeling, EWMA chart
# ---------------------------------------------------------------------------


def q_topo_order(spark, sf):
    """Topological levels (Kahn layering = longest-path depth) over the
    deterministic multiply-DAG on custkeys: edges k→2k, k→2k+1, k→3k
    wherever the target is an existing custkey. Every edge multiplies,
    so the graph is acyclic with depth ≤ log₂(max custkey) — the mirror
    unrolls 16 max-relaxation rounds, exact for any sf with custkeys
    below 2¹⁶ per the idempotence-past-convergence contract."""
    from .operators.cc import topo_levels

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    keys = cu.select(F.col("c_custkey").alias("id"))
    cand = keys.select(
        F.col("id").alias("a"),
        F.explode(
            F.array(F.col("id") * 2, F.col("id") * 2 + 1, F.col("id") * 3)
        ).alias("b"),
    )
    e = cand.join(
        keys.withColumnRenamed("id", "b"), "b", "left_semi"
    ).select(
        F.col("a").cast("string").alias("src"), F.col("b").cast("string").alias("dst")
    )
    return topo_levels(e, max_rounds=16, probe_every=4).select(
        "node", F.col("level").cast("long").alias("level")
    )


def _topo_sql(rounds: int) -> str:
    parts = [
        """WITH k AS (SELECT c_custkey AS id FROM customer),
e AS (
  SELECT CAST(a.id AS VARCHAR) AS src, CAST(b.id AS VARCHAR) AS dst
  FROM k a JOIN k b ON b.id IN (2 * a.id, 2 * a.id + 1, 3 * a.id)
  WHERE a.id <> b.id
),
l0 AS (
  SELECT node, CAST(0 AS BIGINT) AS level FROM (
    SELECT src AS node FROM e UNION SELECT dst FROM e
  )
)"""
    ]
    for h in range(1, rounds + 1):
        parts.append(
            f""",
l{h} AS MATERIALIZED (
  SELECT node, MAX(level) AS level FROM (
    SELECT node, level FROM l{h - 1}
    UNION ALL
    SELECT e.dst, l.level + 1 FROM l{h - 1} l JOIN e ON e.src = l.node
  ) GROUP BY node
)"""
        )
    parts.append(f"\nSELECT node, CAST(level AS BIGINT) AS level FROM l{rounds}")
    return "".join(parts)


SQL_TOPO_ORDER = _topo_sql(16)

QUERIES["topo_order"] = (q_topo_order, SQL_TOPO_ORDER)


def q_densest_core(spark, sf):
    """Charikar/Bahmani densest-subgraph peel labels over the chain
    background plus a planted clique (custkey ≡ 0 mod 97, capped at 40
    members so the plant stays parameter-bounded at every sf): the
    clique must survive to the last peel rounds. Fixed rounds=20 — the
    mirror unrolls the SAME 20 synchronous rounds with the identical
    integer cross-multiply threshold, so the labels are exact at every
    scale (survivors past round 20 are labeled 20 on both sides)."""
    from .operators.cc import densest_peel

    _r, chain = _chain_graph(spark, sf)
    cu = spark.read.parquet(f"{sf}/customer.parquet")
    cl = cu.filter(
        (F.col("c_custkey") % 97 == 0) & (F.col("c_custkey") < 97 * 41)
    ).select(F.col("c_custkey").alias("id"))
    clique = (
        cl.withColumnRenamed("id", "ai")
        .join(cl.withColumnRenamed("id", "bi"), F.col("ai") < F.col("bi"))
        .select(
            F.col("ai").cast("string").alias("src"),
            F.col("bi").cast("string").alias("dst"),
        )
    )
    return densest_peel(chain.unionByName(clique), rounds=20)


def _densest_sql(rounds: int) -> str:
    parts = [
        "WITH " + _CHAIN_SQL + """,
cl AS (SELECT c_custkey AS id FROM customer WHERE c_custkey % 97 = 0 AND c_custkey < 97 * 41),
e0 AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM (
    SELECT src, dst FROM raw
    UNION ALL
    SELECT CAST(x.id AS VARCHAR), CAST(y.id AS VARCHAR) FROM cl x JOIN cl y ON x.id < y.id
  ) WHERE src <> dst
)"""
    ]
    for i in range(rounds):
        parts.append(
            f""",
d{i} AS (
  SELECT node, COUNT(*) AS n FROM (
    SELECT a AS node FROM e{i} UNION ALL SELECT b FROM e{i}
  ) GROUP BY node
),
t{i} AS (SELECT COUNT(*) AS nv, CAST(SUM(n) AS BIGINT) AS s2e FROM d{i}),
w{i} AS (SELECT node FROM d{i}, t{i} WHERE n * nv * 100 <= 200 * s2e),
e{i + 1} AS MATERIALIZED (
  SELECT a, b FROM e{i}
  WHERE a NOT IN (SELECT node FROM w{i}) AND b NOT IN (SELECT node FROM w{i})
)"""
        )
    labels = "\nUNION ALL\n".join(
        f"SELECT node, CAST({i} AS BIGINT) AS peel_round FROM w{i}" for i in range(rounds)
    )
    parts.append(
        f"""
SELECT node, peel_round FROM ({labels}
UNION ALL
SELECT node, CAST({rounds} AS BIGINT) FROM (
  SELECT a AS node FROM e{rounds} UNION SELECT b FROM e{rounds}
))"""
    )
    return "".join(parts)


SQL_DENSEST_CORE = _densest_sql(20)

QUERIES["densest_core"] = (q_densest_core, SQL_DENSEST_CORE)


def q_ewma_hosts(spark, sf):
    """EWMA control chart over a synthetic 60-day per-nation crawl-volume
    series with one planted spike per nation at day 17+(g mod 13): the
    chart must flag exactly the plants. Integer-exact truncated-window
    EWMA (alpha=1/5, W=12) — the mirror runs the identical lag self-join
    with the same integer weight table."""
    from .operators.temporal import ewma_anomaly

    na = spark.read.parquet(f"{sf}/nation.parquet")
    days = na.select(
        F.col("n_nationkey").alias("g"),
        F.explode(F.sequence(F.lit(1), F.lit(60))).alias("t"),
    )
    x = (
        F.lit(100)
        + (F.col("g") * F.col("t")) % 7
        + F.when(F.col("t") == 17 + F.col("g") % 13, 900).otherwise(0)
    )
    series = days.withColumn("x", x.cast("long"))
    out = ewma_anomaly(series, "g", "t", "x", threshold_milli=300_000)
    return out.select(
        F.col("g").cast("long").alias("g"),
        F.col("t").cast("long").alias("t"),
        "x",
        # -1 sentinel for the history-less first row: a NULL bigint would
        # round-trip as NaN through the oracle's pandas frame
        F.coalesce("pred_milli", F.lit(-1).cast("long")).alias("pred_milli"),
        "anomaly",
    )


def _ewma_sql(window: int = 12, alpha_num: int = 1, alpha_den: int = 5) -> str:
    beta = alpha_den - alpha_num
    wt = ", ".join(
        f"({lag}, {alpha_num * beta ** (lag - 1) * alpha_den ** (window - lag)})"
        for lag in range(1, window + 1)
    )
    return f"""
WITH s AS (
  SELECT CAST(n_nationkey AS BIGINT) AS g, CAST(d.t AS BIGINT) AS t,
         CAST(100 + (n_nationkey * d.t) % 7
              + CASE WHEN d.t = 17 + n_nationkey % 13 THEN 900 ELSE 0 END AS BIGINT) AS x
  FROM nation, generate_series(1, 60) d(t)
),
w(lag, wt) AS (VALUES {wt}),
j AS (
  SELECT a.g, a.t, a.x, b.x AS bx, a.t - b.t AS lag
  FROM s a LEFT JOIN s b ON a.g = b.g AND b.t BETWEEN a.t - {window} AND a.t - 1
),
agg AS (
  SELECT j.g, j.t, j.x,
         CAST(SUM(j.bx * w.wt) AS BIGINT) AS n, CAST(SUM(w.wt) AS BIGINT) AS d
  FROM j LEFT JOIN w ON w.lag = j.lag
  GROUP BY j.g, j.t, j.x
)
SELECT g, t, x,
       COALESCE(CAST(1000 * n // d AS BIGINT), -1) AS pred_milli,
       COALESCE(ABS(x * d - n) * 1000 > 300000 * d, FALSE) AS anomaly
FROM agg
"""


SQL_EWMA_HOSTS = _ewma_sql()

QUERIES["ewma_hosts"] = (q_ewma_hosts, SQL_EWMA_HOSTS)


def q_textrank(spark, sf):
    """TextRank top-3 keywords per document (operators/textops.py):
    window-2 co-occurrence graph over ≥4-char house tokens, 3
    integer-exact PageRank rounds, token-ascending tie-break. The mirror
    unrolls the same 3 rounds with identical integer division."""
    from .operators.textops import textrank_keywords

    return textrank_keywords(_docs(spark, sf), k=3, window=2, iters=3)


def _textrank_sql(iters: int = 3, window: int = 2, scale: int = 1_000_000,
                  damping_pct: int = 85, min_len: int = 4, k: int = 3) -> str:
    base = (100 - damping_pct) * scale // 100
    parts = [f"""
WITH lists AS (
  SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text),
         '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS l
  FROM documents
),
toks AS (
  SELECT doc_id, pos, tok FROM (
    SELECT doc_id, CAST(generate_subscripts(l, 1) AS BIGINT) AS pos, unnest(l) AS tok
    FROM lists
  ) WHERE tok <> '' AND length(tok) >= {min_len}
),
und AS (
  SELECT DISTINCT a.doc_id, LEAST(a.tok, b.tok) AS x, GREATEST(a.tok, b.tok) AS y
  FROM toks a JOIN toks b
    ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND {window} AND a.tok <> b.tok
),
dir AS (
  SELECT doc_id, x AS src, y AS dst FROM und
  UNION ALL
  SELECT doc_id, y AS src, x AS dst FROM und
),
deg AS (SELECT doc_id, src, COUNT(*) AS deg FROM dir GROUP BY 1, 2),
nodes AS (SELECT DISTINCT doc_id, tok FROM toks),
pr0 AS (SELECT doc_id, tok, CAST({scale} AS BIGINT) AS pr FROM nodes)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
pr{i} AS MATERIALIZED (
  SELECT n.doc_id, n.tok,
         CAST({base} + ({damping_pct} * COALESCE(s.acc, 0)) // 100 AS BIGINT) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.doc_id, e.dst AS tok, SUM(p.pr // d.deg) AS acc
    FROM dir e
    JOIN deg d ON d.doc_id = e.doc_id AND d.src = e.src
    JOIN pr{i - 1} p ON p.doc_id = e.doc_id AND p.tok = e.src
    GROUP BY 1, 2
  ) s ON s.doc_id = n.doc_id AND s.tok = n.tok
)""")
    parts.append(f"""
SELECT doc_id, tok, CAST(rnk AS BIGINT) AS rnk, CAST(pr AS BIGINT) AS score FROM (
  SELECT doc_id, tok, pr,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pr DESC, tok ASC) AS rnk
  FROM pr{iters}
) WHERE rnk <= {k}""")
    return "".join(parts)


SQL_TEXTRANK = _textrank_sql()

QUERIES["textrank"] = (q_textrank, SQL_TEXTRANK)


def q_pagerank_weighted(spark, sf):
    """Weighted PageRank over the chain-with-chords graph with the sssp
    md5-derived integer edge weights 1..9 (operators/cc.py::pagerank,
    weight_col): contribution = rank·w div strength. 3 integer-exact
    rounds; the mirror unrolls the same rounds with identical division
    order."""
    from .operators.cc import pagerank

    _r, e = _chain_graph(spark, sf)
    ew = e.withColumn(
        "w",
        F.conv(F.substring(F.md5(F.concat(F.col("src"), F.lit(">"), F.col("dst"))), 1, 15), 16, 10)
        .cast("long") % 9 + 1,
    )
    return pagerank(ew, iters=3, weight_col="w").select(
        "node", F.col("rank").cast("long").alias("rank")
    )


def _pagerank_weighted_sql(iters: int = 3, damping_pct: int = 85, scale: int = 1_000_000) -> str:
    base = (scale * (100 - damping_pct)) // 100
    parts = [
        "WITH " + _CHAIN_SQL + """,
we AS (
  SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM (
    SELECT src, dst,
           ('0x' || substr(md5(src || '>' || dst), 1, 15))::BIGINT % 9 + 1 AS w
    FROM raw
  ) GROUP BY 1, 2
),
st AS (SELECT src, CAST(SUM(w) AS BIGINT) AS odeg FROM we GROUP BY 1),
nodes AS (SELECT src AS node FROM we UNION SELECT dst FROM we),
""" + f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank FROM nodes)"
    ]
    for i in range(1, iters + 1):
        parts.append(f""",
r{i} AS MATERIALIZED (
  SELECT n.node,
         CAST({base} + {damping_pct} * COALESCE(s.acc, 0) // 100 AS BIGINT) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM(p.rank * e.w // t.odeg) AS acc
    FROM we e JOIN st t ON t.src = e.src JOIN r{i - 1} p ON p.node = e.src
    GROUP BY 1
  ) s ON s.node = n.node
)""")
    parts.append(f"\nSELECT node, rank FROM r{iters}")
    return "".join(parts)


SQL_PAGERANK_WEIGHTED = _pagerank_weighted_sql()

QUERIES["pagerank_weighted"] = (q_pagerank_weighted, SQL_PAGERANK_WEIGHTED)


def q_trend_mk(spark, sf):
    """Mann-Kendall trend per nation over a 30-day synthetic volume
    series: nations ≡ 0 mod 3 get a rising ramp (+2/day), ≡ 1 mod 3 a
    falling one, ≡ 2 a flat series with deterministic jitter — the test
    must sign each correctly (operators/temporal.py::mann_kendall)."""
    from .operators.temporal import mann_kendall

    na = spark.read.parquet(f"{sf}/nation.parquet")
    days = na.select(
        F.col("n_nationkey").alias("g"),
        F.explode(F.sequence(F.lit(1), F.lit(30))).alias("t"),
    )
    x = (
        F.lit(500)
        + F.when(F.col("g") % 3 == 0, 2 * F.col("t"))
        .when(F.col("g") % 3 == 1, -2 * F.col("t"))
        .otherwise(0)
        + (F.col("g") * F.col("t")) % 3
    )
    series = days.withColumn("x", x.cast("long"))
    return mann_kendall(series, "g", "t", "x")


SQL_TREND_MK = """
WITH s AS (
  SELECT CAST(n_nationkey AS BIGINT) AS g, CAST(d.t AS BIGINT) AS t,
         CAST(500
              + CASE n_nationkey % 3 WHEN 0 THEN 2 * d.t WHEN 1 THEN -2 * d.t ELSE 0 END
              + (n_nationkey * d.t) % 3 AS BIGINT) AS x
  FROM nation, generate_series(1, 30) d(t)
),
p AS (
  SELECT a.g, SIGN(b.x - a.x) AS sg
  FROM s a JOIN s b ON a.g = b.g AND b.t > a.t
),
agg AS (SELECT g, CAST(SUM(sg) AS BIGINT) AS s_stat, COUNT(*) AS np FROM p GROUP BY 1),
n AS (SELECT g, COUNT(*) AS n FROM s GROUP BY 1)
SELECT agg.g, CAST(n.n AS BIGINT) AS n, agg.s_stat,
       CAST(CASE WHEN agg.s_stat < 0 THEN -((1000000 * -agg.s_stat) // agg.np)
                 ELSE (1000000 * agg.s_stat) // agg.np END AS BIGINT) AS tau_ppm
FROM agg JOIN n ON n.g = agg.g
"""

QUERIES["trend_mk"] = (q_trend_mk, SQL_TREND_MK)


def q_kendall_metrics(spark, sf):
    """Kendall tau-a between two document quality proxies per source —
    n_chars vs distinct-ish token estimate (a deterministic second
    metric) over a doc_id-sampled series (quadratic pair count bounded
    by the sample, the operator's documented lever)."""
    from .operators.temporal import kendall_tau

    docs = _docs(spark, sf).filter(F.col("doc_id") % 7 == 0)
    d = docs.select(
        F.col("source").alias("g"),
        F.col("doc_id").alias("t"),
        F.col("n_chars").cast("long").alias("x"),
        (F.length("text") % 997).cast("long").alias("y"),
    )
    return kendall_tau(d, "g", "t", "x", "y")


SQL_KENDALL_METRICS = """
WITH s AS (
  SELECT source AS g, doc_id AS t, CAST(n_chars AS BIGINT) AS x,
         CAST(length(text) % 997 AS BIGINT) AS y
  FROM documents WHERE doc_id % 7 = 0
),
p AS (
  SELECT a.g, SIGN(b.x - a.x) * SIGN(b.y - a.y) AS sg
  FROM s a JOIN s b ON a.g = b.g AND b.t > a.t
),
agg AS (SELECT g, CAST(SUM(sg) AS BIGINT) AS s_stat, COUNT(*) AS np FROM p GROUP BY 1),
n AS (SELECT g, COUNT(*) AS n FROM s GROUP BY 1)
SELECT agg.g, CAST(n.n AS BIGINT) AS n, agg.s_stat,
       CAST(CASE WHEN agg.s_stat < 0 THEN -((1000000 * -agg.s_stat) // agg.np)
                 ELSE (1000000 * agg.s_stat) // agg.np END AS BIGINT) AS tau_ppm
FROM agg JOIN n ON n.g = agg.g
"""

QUERIES["kendall_metrics"] = (q_kendall_metrics, SQL_KENDALL_METRICS)


def q_feat_hash(spark, sf):
    """Hashing-trick features over the documents table, 256 buckets
    (operators/textops.py::feature_hash) — exact md5-mod bucket ids, one
    map-side-combined count agg."""
    from .operators.textops import feature_hash

    return feature_hash(_docs(spark, sf), buckets=256)


SQL_FEAT_HASH = """
WITH toks AS (
  SELECT doc_id, t AS tok
  FROM documents,
       unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS u(t)
  WHERE t <> ''
)
SELECT doc_id,
       CAST(('0x' || substr(md5(tok), 1, 15))::BIGINT % 256 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM toks GROUP BY 1, 2
"""

QUERIES["feat_hash"] = (q_feat_hash, SQL_FEAT_HASH)


def q_ols_trend(spark, sf):
    """OLS trend per nation over a 40-day series with a planted slope
    (+3/day for even nations, -1/day odd) and deterministic jitter —
    slope_milli must recover the plant sign/magnitude per group
    (operators/temporal.py::ols_trend). NULL sentinels -> -10^15 for the
    oracle's pandas round-trip (same reason as ewma's -1)."""
    from .operators.temporal import ols_trend

    na = spark.read.parquet(f"{sf}/nation.parquet")
    days = na.select(
        F.col("n_nationkey").alias("g"),
        F.explode(F.sequence(F.lit(1), F.lit(40))).alias("t"),
    )
    x = (
        F.lit(1000)
        + F.when(F.col("g") % 2 == 0, 3 * F.col("t")).otherwise(-F.col("t"))
        + (F.col("g") * F.col("t")) % 5
    )
    out = ols_trend(days.withColumn("x", x.cast("long")), "g", "t", "x")
    sent = F.lit(-(10 ** 15)).cast("long")
    return out.select(
        F.col("g").cast("long").alias("g"),
        "n",
        F.coalesce("slope_milli", sent).alias("slope_milli"),
        F.coalesce("intercept_milli", sent).alias("intercept_milli"),
        F.coalesce("r2_ppm", sent).alias("r2_ppm"),
    )


SQL_OLS_TREND = """
WITH s AS (
  SELECT CAST(n_nationkey AS BIGINT) AS g, CAST(d.t AS BIGINT) AS t,
         CAST(1000 + CASE WHEN n_nationkey % 2 = 0 THEN 3 * d.t ELSE -d.t END
              + (n_nationkey * d.t) % 5 AS BIGINT) AS x
  FROM nation, generate_series(1, 40) d(t)
),
agg AS (
  SELECT g, COUNT(*) AS n, SUM(t) AS st, SUM(x) AS sx,
         SUM(t * t) AS stt, SUM(x * x) AS sxx, SUM(t * x) AS stx
  FROM s GROUP BY 1 HAVING COUNT(*) >= 2
),
c AS (
  SELECT g, CAST(n AS BIGINT) AS n, st, sx, stt, sxx, stx,
         (n * stx - st * sx) AS num,
         (n * stt - st * st) AS den_t,
         (n * sxx - sx * sx) AS den_x
  FROM agg
),
sl AS (
  SELECT *, CASE WHEN den_t = 0 THEN NULL
    WHEN 1000 * num < 0 THEN -((-(1000 * num)) // den_t)
    ELSE (1000 * num) // den_t END AS slope_milli
  FROM c
),
ic AS (
  SELECT *, CASE WHEN slope_milli IS NULL THEN NULL
    WHEN 1000 * sx - slope_milli * st < 0 THEN -((-(1000 * sx - slope_milli * st)) // n)
    ELSE (1000 * sx - slope_milli * st) // n END AS intercept_milli,
    CASE WHEN 1000000 * num < 0 THEN -((-(1000000 * num)) // den_t)
         ELSE (1000000 * num) // den_t END AS q1
  FROM sl
)
SELECT g, n,
       COALESCE(CAST(slope_milli AS BIGINT), -1000000000000000) AS slope_milli,
       COALESCE(CAST(intercept_milli AS BIGINT), -1000000000000000) AS intercept_milli,
       COALESCE(CAST(CASE WHEN den_t = 0 OR den_x = 0 THEN NULL
         WHEN q1 * num < 0 THEN -((-(q1 * num)) // den_x)
         ELSE (q1 * num) // den_x END AS BIGINT), -1000000000000000) AS r2_ppm
FROM ic
"""

QUERIES["ols_trend"] = (q_ols_trend, SQL_OLS_TREND)


def q_fleiss_items(spark, sf):
    """Fleiss' kappa over a synthetic 5-rater labeling of customers:
    rater r labels customer k as category (k % 4) unless (k + r) % 7 = 0,
    in which case they disagree to ((k + r) % 4) — planted
    mostly-agreeing design, exact rational kappa
    (operators/stats.py::fleiss_kappa)."""
    from .operators.stats import fleiss_kappa

    cu = spark.read.parquet(f"{sf}/customer.parquet")
    k = F.col("c_custkey")
    r = F.col("r")
    ratings = cu.select(
        k.alias("item"), F.explode(F.sequence(F.lit(1), F.lit(5))).alias("r")
    ).select(
        "item",
        F.when((F.col("item") + r) % 7 == 0, (F.col("item") + r) % 4)
        .otherwise(F.col("item") % 4).cast("long").alias("cat"),
    )
    return fleiss_kappa(ratings, "item", "cat")


SQL_FLEISS_ITEMS = """
WITH ratings AS (
  SELECT c_custkey AS item,
         CAST(CASE WHEN (c_custkey + d.r) % 7 = 0 THEN (c_custkey + d.r) % 4
              ELSE c_custkey % 4 END AS BIGINT) AS cat
  FROM customer, generate_series(1, 5) d(r)
),
cell AS (SELECT item, cat, COUNT(*) AS nij FROM ratings GROUP BY 1, 2),
pi AS (SELECT item, SUM(nij) AS ni, SUM(nij * (nij - 1)) AS po_i FROM cell GROUP BY 1),
ct AS (SELECT CAST(SUM(cj * cj) AS BIGINT) AS pe_n FROM (SELECT cat, SUM(nij) AS cj FROM cell GROUP BY 1)),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items, CAST(SUM(po_i) AS BIGINT) AS po_n FROM pi),
c AS (
  SELECT n_items, CAST(5 AS BIGINT) AS n_raters,
         CAST(po_n AS HUGEINT) AS po_n, CAST(pe_n AS HUGEINT) AS pe_n,
         CAST(n_items * 5 * 4 AS HUGEINT) AS po_d,
         CAST(n_items * 5 * n_items * 5 AS HUGEINT) AS pe_d
  FROM t, ct
)
SELECT CAST(n_items AS BIGINT) AS n_items, n_raters,
       CAST(CASE WHEN pe_d = pe_n THEN NULL
         WHEN 1000000 * (po_n * pe_d - pe_n * po_d) < 0
           THEN -((-(1000000 * (po_n * pe_d - pe_n * po_d))) // (po_d * (pe_d - pe_n)))
         ELSE (1000000 * (po_n * pe_d - pe_n * po_d)) // (po_d * (pe_d - pe_n))
       END AS BIGINT) AS kappa_ppm
FROM c
"""

QUERIES["fleiss_items"] = (q_fleiss_items, SQL_FLEISS_ITEMS)
