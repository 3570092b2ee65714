"""Alias-dictionary mining (linking.mine_aliases) and KG-embedding
negative sampling (walks.entity_dense_ids / kg_negative_samples)."""

from pyspark.sql import functions as F

from ocaml_rdf_spark.operators.linking import mine_aliases
from ocaml_rdf_spark.operators.walks import entity_dense_ids, kg_negative_samples


def _label_quads(spark, rows):
    """rows: (s_lex, pred, o_lex literal)."""
    df = spark.createDataFrame(rows, "s_lex string, pred string, o_lex string")
    return df.select(
        F.lit(0).cast("tinyint").alias("s_kind"),
        "s_lex",
        "pred",
        F.lit(2).cast("tinyint").alias("o_kind"),
        "o_lex",
    )


def _iri_quads(spark, rows):
    """rows: (s_lex, pred, o_lex IRI)."""
    df = spark.createDataFrame(rows, "s_lex string, pred string, o_lex string")
    return df.select(
        F.lit(0).cast("tinyint").alias("s_kind"),
        "s_lex",
        "pred",
        F.lit(0).cast("tinyint").alias("o_kind"),
        "o_lex",
        F.lit(None).cast("string").alias("o_dtype"),
        F.lit(None).cast("string").alias("o_lang"),
    )


def test_mine_aliases_normalizes_and_splits_prior(spark):
    q = _label_quads(
        spark,
        [
            ("urn:e:us", "urn:p:name", "United States"),
            ("urn:e:us", "urn:p:altLabel", "United-States!"),  # normalizes same
            ("urn:e:uk", "urn:p:altLabel", "United states"),  # case-folds same
            ("urn:e:x", "urn:p:ignored", "United States"),  # pred not listed
        ],
    )
    out = {
        (r["alias"], r["uri"]): r
        for r in mine_aliases(q, ["urn:p:name", "urn:p:altLabel"]).collect()
    }
    # normalization: lower + strip non-alnum (keeping spaces) — the
    # hyphenated form collapses to 'unitedstates', a separate alias
    assert set(a for a, _u in out) == {"unitedstates", "united states"}
    us = out[("united states", "urn:e:us")]
    uk = out[("united states", "urn:e:uk")]
    assert us["n_assertions"] == 1 and uk["n_assertions"] == 1
    assert us["n_entities"] == 2 and uk["n_entities"] == 2
    assert us["prior_ppm"] == 500000 and uk["prior_ppm"] == 500000
    hy = out[("unitedstates", "urn:e:us")]
    assert hy["n_entities"] == 1 and hy["prior_ppm"] == 1000000


def test_entity_dense_ids_are_a_bijection(spark):
    q = _iri_quads(
        spark,
        [(f"urn:e:{i}", "urn:p:knows", f"urn:e:{(i + 1) % 30}") for i in range(30)],
    )
    ids = entity_dense_ids(q, buckets=4).collect()
    assert len(ids) == 30
    assert sorted(r["ent_id"] for r in ids) == list(range(30))
    # deterministic across parallelism
    again = entity_dense_ids(q.repartition(7), buckets=4).collect()
    assert {r["ent"]: r["ent_id"] for r in ids} == {r["ent"]: r["ent_id"] for r in again}


def test_kg_negative_samples_filtered_protocol(spark):
    q = _iri_quads(
        spark,
        [(f"urn:e:{i}", "urn:p:knows", f"urn:e:{(i + 1) % 10}") for i in range(10)],
    )
    negs = kg_negative_samples(q, k=3, buckets=4)
    rows = negs.collect()
    assert 0 < len(rows) <= 30
    true_set = {(f"urn:e:{i}", "urn:p:knows", f"urn:e:{(i + 1) % 10}") for i in range(10)}
    for r in rows:
        # filtered: never a true triple, never the positive object itself
        assert (r["s_lex"], r["pred"], r["neg_o"]) not in true_set
        assert r["neg_o"] != r["o_lex"]
        assert r["neg_o"].startswith("urn:e:")  # drawn from the entity pool
    # deterministic
    again = kg_negative_samples(q.repartition(5), k=3, buckets=4).collect()
    key = lambda r: (r["s_lex"], r["pred"], r["o_lex"], r["neg_ix"], r["neg_o"])  # noqa: E731
    assert sorted(map(key, rows)) == sorted(map(key, again))
