"""Dictionary encoding (operators/dictenc.py): id determinism, term-kind
separation, late-decode round-trip, and the collision audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocaml_rdf_spark.operators.dictenc import (
    collision_audit,
    decode,
    encode_quads,
    iri_id,
    literal_id,
    term_dictionary,
)


def _quads(spark, rows):
    return spark.createDataFrame(
        rows,
        "s_kind int, s_lex string, pred string, o_kind int, o_lex string, "
        "o_dtype string, o_lang string, graph string",
    )


XS = "http://www.w3.org/2001/XMLSchema#string"


def test_same_lexical_different_kind_gets_different_ids(spark):
    # IRI <x>, plain literal "x", typed literal "x"^^xsd:string, and
    # "x"@en must all intern to distinct ids
    q = _quads(
        spark,
        [
            (0, "urn:s", "urn:p", 0, "x", None, None, "urn:g"),
            (0, "urn:s", "urn:p", 2, "x", None, None, "urn:g"),
            (0, "urn:s", "urn:p", 2, "x", XS, None, "urn:g"),
            (0, "urn:s", "urn:p", 2, "x", None, "en", "urn:g"),
        ],
    )
    d = term_dictionary(q)
    xs = d.filter(F.col("lex") == "x").collect()
    assert len(xs) == 4
    assert len({r["id"] for r in xs}) == 4
    assert collision_audit(d).count() == 0


def test_encode_is_consistent_with_dictionary(spark):
    q = _quads(spark, [(0, "urn:s", "urn:p", 2, "hello", XS, None, "urn:g")])
    enc = encode_quads(q).collect()[0]
    d = {(r["kind"], r["lex"], r["dtype"]): r["id"] for r in term_dictionary(q).collect()}
    assert enc["s_id"] == d[(0, "urn:s", None)]
    assert enc["p_id"] == d[(0, "urn:p", None)]
    assert enc["g_id"] == d[(0, "urn:g", None)]
    assert enc["o_id"] == d[(2, "hello", XS)]


def test_constant_ids_match_encoded_ids(spark):
    q = _quads(spark, [(0, "urn:s", "urn:p", 2, "ASIA", XS, None, "urn:g")])
    row = (
        encode_quads(q)
        .select(
            (F.col("p_id") == iri_id("urn:p")).alias("p_ok"),
            (F.col("o_id") == literal_id("ASIA", XS)).alias("o_ok"),
        )
        .collect()[0]
    )
    assert row["p_ok"] and row["o_ok"]


def test_decode_round_trip(spark):
    q = _quads(
        spark,
        [
            (0, "urn:a", "urn:p", 0, "urn:b", None, None, "urn:g"),
            (0, "urn:b", "urn:p", 0, "urn:c", None, None, "urn:g"),
        ],
    )
    dic = term_dictionary(q)
    out = decode(encode_quads(q).select("s_id"), dic, "s_id", "s_lex")
    assert sorted(r["s_lex"] for r in out.collect()) == ["urn:a", "urn:b"]


def test_collision_audit_catches_forged_collision(spark):
    dic = spark.createDataFrame(
        [(7, 0, "urn:a", None, None), (7, 0, "urn:b", None, None), (9, 2, "x", None, None)],
        "id long, kind int, lex string, dtype string, lang string",
    )
    bad = collision_audit(dic).collect()
    assert len(bad) == 1 and bad[0]["id"] == 7 and bad[0]["n_terms"] == 2


def test_store_id_space_is_collision_free(spark):
    from ocaml_rdf_spark.relational import triples_view

    d = term_dictionary(triples_view(spark, "/root/testdata/sf0.001"))
    assert collision_audit(d).count() == 0
