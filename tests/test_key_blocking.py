"""Key discovery (stats.key_discovery), exact all-pairs Jaccard ground
truth (textops.allpairs_jaccard), and blocking-quality metrics
(linking.blocking_metrics)."""

from pyspark.sql import functions as F

from ocaml_rdf_spark.operators.linking import blocking_metrics
from ocaml_rdf_spark.operators.stats import key_discovery
from ocaml_rdf_spark.operators.textops import allpairs_jaccard


def _quads(spark, rows):
    """rows: (s_lex, pred, o_lex literal)."""
    df = spark.createDataFrame(rows, "s_lex string, pred string, o_lex string")
    return df.select(
        F.lit(0).cast("tinyint").alias("s_kind"),
        "s_lex",
        "pred",
        F.lit(2).cast("tinyint").alias("o_kind"),
        "o_lex",
        F.lit(None).cast("string").alias("o_dtype"),
        F.lit(None).cast("string").alias("o_lang"),
    )


def test_key_discovery_profiles(spark):
    q = _quads(
        spark,
        [
            # email: functional AND inverse-functional (an ER key)
            ("e1", "urn:p:email", "a@x"),
            ("e2", "urn:p:email", "b@x"),
            # city: functional but shared values (not a key)
            ("e1", "urn:p:city", "paris"),
            ("e2", "urn:p:city", "paris"),
            # tag: multi-valued per subject AND unique per value
            ("e1", "urn:p:tag", "red"),
            ("e1", "urn:p:tag", "blue"),
            ("e2", "urn:p:tag", "green"),
            # solo: functional-looking but support below min_support
            ("e1", "urn:p:solo", "only"),
        ],
    )
    out = {r["pred"]: r for r in key_discovery(q, min_support=2).collect()}
    email = out["urn:p:email"]
    assert email["fp_ok"] == 1 and email["ifp_ok"] == 1
    city = out["urn:p:city"]
    assert city["fp_ok"] == 1 and city["ifp_ok"] == 0
    assert city["max_subjects_per_value"] == 2
    tag = out["urn:p:tag"]
    assert tag["fp_ok"] == 0 and tag["ifp_ok"] == 1
    assert tag["max_vals_per_subject"] == 2 and tag["n_values"] == 3
    solo = out["urn:p:solo"]
    assert solo["fp_ok"] == 0 and solo["ifp_ok"] == 0  # support gate


def test_key_discovery_duplicate_assertion_not_a_violation(spark):
    q = _quads(spark, [("e1", "urn:p:v", "x"), ("e1", "urn:p:v", "x"), ("e2", "urn:p:v", "y")])
    row = key_discovery(q, min_support=2).collect()[0]
    # same value twice is still ONE distinct value → functional holds
    assert row["fp_ok"] == 1 and row["n_triples"] == 3


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_allpairs_jaccard_finds_near_dups(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),  # near-dup of 1
            (3, "one two three four five six"),  # unrelated
            (4, "one two three four five six"),  # exact dup of 3
        ],
    )
    out = {(r["doc_a"], r["doc_b"]): r["jac_pct"] for r in
           allpairs_jaccard(docs, n=3, jac_min=50, max_df=50).collect()}
    assert (3, 4) in out and out[(3, 4)] == 100
    assert (1, 2) in out and 50 <= out[(1, 2)] < 100
    assert not any({a, b} & {3, 4} and {a, b} & {1, 2} for a, b in out)


def test_allpairs_jaccard_max_df_drops_boilerplate_only_pairs(spark):
    # 'x y z' is shared by every doc (df=3 > max_df=2) — with no other
    # shared gram the pair is never even considered
    docs = _docs(spark, [(1, "x y z a b c"), (2, "x y z d e f"), (3, "x y z g h i")])
    out = allpairs_jaccard(docs, n=3, jac_min=1, max_df=2).collect()
    assert out == []


def test_blocking_metrics_counts_and_ppm(spark):
    cand = spark.createDataFrame(
        [(1, 2), (3, 1), (5, 6)], "doc_a long, doc_b long"  # (3,1) unordered
    )
    truth = spark.createDataFrame(
        [(1, 2), (1, 3), (7, 8), (9, 10)], "doc_a long, doc_b long"
    )
    row = blocking_metrics(cand, truth, n_items=10).collect()[0]
    assert row["n_cand"] == 3 and row["n_truth"] == 4
    assert row["n_matched"] == 2  # (1,2) and canonicalized (1,3)
    assert row["recall_ppm"] == 500000
    assert row["n_possible"] == 45
    assert row["reduction_ppm"] == 1000000 - 3 * 1000000 // 45


def test_blocking_metrics_null_recall_on_empty_truth(spark):
    cand = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    truth = spark.createDataFrame([], "doc_a long, doc_b long")
    row = blocking_metrics(cand, truth, n_items=5).collect()[0]
    assert row["n_truth"] == 0 and row["recall_ppm"] is None


def test_containment_catches_embedded_doc(spark):
    from ocaml_rdf_spark.operators.textops import containment_pairs

    long = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),  # fully inside 2
            (2, long),
            (3, "one two three four five"),  # unrelated
        ],
    )
    out = {(r["doc_a"], r["doc_b"]): r for r in
           containment_pairs(docs, n=3, cont_min=80, max_df=10).collect()}
    assert (1, 2) in out
    r = out[(1, 2)]
    assert r["cont_a_pct"] == 100  # every gram of 1 is in 2
    assert r["cont_b_pct"] < 50 and r["jac_pct"] < 50  # jaccard alone misses it
    assert not any(3 in p for p in out)


def test_rewrite_namespace_positions_and_passthrough(spark):
    from pyspark.sql import functions as F
    from ocaml_rdf_spark.operators.canon import rewrite_namespace

    rows = [
        (0, "urn:a:s1", "urn:a:p", 0, "urn:a:o1", None),
        (0, "urn:b:s2", "urn:a:p", 2, "urn:a:looks-like-iri", None),  # literal untouched
        (1, "urn:a:bnode-label", "urn:b:p", 0, "urn:b:o", None),  # bnode subject untouched
    ]
    df = spark.createDataFrame(
        rows, "s_kind int, s_lex string, pred string, o_kind int, o_lex string, o_dtype string"
    ).select(
        F.col("s_kind").cast("tinyint"), "s_lex", "pred",
        F.col("o_kind").cast("tinyint"), "o_lex", "o_dtype",
    )
    out = rewrite_namespace(df, "urn:a:", "urn:z:").collect()
    got = {(r["s_kind"], r["s_lex"], r["pred"], r["o_kind"], r["o_lex"]) for r in out}
    assert (0, "urn:z:s1", "urn:z:p", 0, "urn:z:o1") in got
    assert (0, "urn:b:s2", "urn:z:p", 2, "urn:a:looks-like-iri") in got
    assert (1, "urn:a:bnode-label", "urn:b:p", 0, "urn:b:o") in got
