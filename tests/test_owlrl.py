"""Unit tests for OWL-RL property-axiom materialization (operators/owlrl.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
from ocaml_rdf_spark.operators.owlrl import INVERSE_OF, SYMMETRIC, TRANSITIVE, owl_rl_closure
from ocaml_rdf_spark.types import RDF_TYPE, TRIPLES_SCHEMA, Iri, Literal, triple_row

EX = "http://ex.org/"


def _store(spark, triples):
    rows = [
        triple_row(Iri(s), Iri(p), o if isinstance(o, Literal) else Iri(o), graph="urn:g:d")
        for s, p, o in triples
    ]
    return spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)


def _spo(df):
    return {(r["s_lex"], r["pred"], r["o_lex"]) for r in df.collect()}


def test_symmetric_property(spark):
    got = _spo(owl_rl_closure(_store(spark, [
        (EX + "knows", RDF_TYPE, SYMMETRIC),
        (EX + "a", EX + "knows", EX + "b"),
    ])))
    assert got == {(EX + "b", EX + "knows", EX + "a")}


def test_inverse_both_directions(spark):
    got = _spo(owl_rl_closure(_store(spark, [
        (EX + "parentOf", INVERSE_OF, EX + "childOf"),
        (EX + "a", EX + "parentOf", EX + "b"),
        (EX + "c", EX + "childOf", EX + "d"),
    ])))
    assert (EX + "b", EX + "childOf", EX + "a") in got
    assert (EX + "d", EX + "parentOf", EX + "c") in got


def test_transitive_through_inverse(spark):
    # edges asserted via the INVERSE predicate still participate in the
    # transitive property's closure (phase-1 expansion before closure)
    got = _spo(owl_rl_closure(_store(spark, [
        (EX + "anc", RDF_TYPE, TRANSITIVE),
        (EX + "anc", INVERSE_OF, EX + "desc"),
        (EX + "a", EX + "anc", EX + "b"),
        (EX + "c", EX + "desc", EX + "b"),  # i.e. b anc c
    ])))
    assert (EX + "a", EX + "anc", EX + "c") in got       # via the flipped edge
    assert (EX + "c", EX + "desc", EX + "a") in got      # inverse of the closure pair


def test_two_transitive_properties_do_not_mix(spark):
    got = _spo(owl_rl_closure(_store(spark, [
        (EX + "p", RDF_TYPE, TRANSITIVE),
        (EX + "q", RDF_TYPE, TRANSITIVE),
        (EX + "a", EX + "p", EX + "b"),
        (EX + "b", EX + "q", EX + "c"),
    ])))
    # no cross-property chaining
    assert not any(o == EX + "c" and s == EX + "a" for s, _p, o in got)


def test_literal_objects_never_flip(spark):
    got = _spo(owl_rl_closure(_store(spark, [
        (EX + "p", RDF_TYPE, SYMMETRIC),
        (EX + "a", EX + "p", Literal("v")),
    ])))
    assert got == set()


def test_functional_same_as_fp_and_ifp(spark):
    from ocaml_rdf_spark.operators.owlrl import (
        FUNCTIONAL, INV_FUNCTIONAL, SAME_AS, functional_same_as,
    )
    from ocaml_rdf_spark.types import RDF_TYPE

    rows = [
        # fp: x rep y1 / y2 -> y1 sameAs y2 (star to min)
        (0, "urn:x", "urn:p:rep", 0, "urn:b", None, None),
        (0, "urn:x", "urn:p:rep", 0, "urn:a", None, None),
        # ifp: two subjects share a literal email key
        (0, "urn:p1", "urn:p:mbox", 2, "a@ex.org", "http://www.w3.org/2001/XMLSchema#string", None),
        (0, "urn:p2", "urn:p:mbox", 2, "a@ex.org", "http://www.w3.org/2001/XMLSchema#string", None),
        # same lexical but different LANGUAGE tag: NOT the same key
        (0, "urn:p3", "urn:p:mbox", 2, "b@ex.org", None, "en"),
        (0, "urn:p4", "urn:p:mbox", 2, "b@ex.org", None, "fr"),
        (0, "urn:p:rep", RDF_TYPE, 0, FUNCTIONAL, None, None),
        (0, "urn:p:mbox", RDF_TYPE, 0, INV_FUNCTIONAL, None, None),
    ]
    quads = spark.createDataFrame(
        rows,
        "s_kind int, s_lex string, pred string, o_kind int, o_lex string, o_dtype string, o_lang string",
    ).withColumn("graph", F.lit("g")).withColumn("src_url", F.lit(None).cast("string")) \
     .withColumn("extractor", F.lit(None).cast("string")).withColumn("part_id", F.lit(None).cast("int"))
    out = [(r["s_lex"], r["pred"], r["o_lex"]) for r in functional_same_as(quads).collect()]
    assert sorted(out) == [
        ("urn:b", SAME_AS, "urn:a"),      # fp star to the min value
        ("urn:p2", SAME_AS, "urn:p1"),    # ifp email collision
    ]


def test_functional_same_as_literal_values_skipped_for_fp(spark):
    from ocaml_rdf_spark.operators.owlrl import FUNCTIONAL, functional_same_as
    from ocaml_rdf_spark.types import RDF_TYPE

    rows = [
        # fp with LITERAL values: inconsistency, not a sameAs between literals
        (0, "urn:x", "urn:p:age", 2, "4", None, None),
        (0, "urn:x", "urn:p:age", 2, "5", None, None),
        (0, "urn:p:age", RDF_TYPE, 0, FUNCTIONAL, None, None),
    ]
    quads = spark.createDataFrame(
        rows,
        "s_kind int, s_lex string, pred string, o_kind int, o_lex string, o_dtype string, o_lang string",
    ).withColumn("graph", F.lit("g")).withColumn("src_url", F.lit(None).cast("string")) \
     .withColumn("extractor", F.lit(None).cast("string")).withColumn("part_id", F.lit(None).cast("int"))
    assert functional_same_as(quads).count() == 0


def test_chain_closure_grandparent(spark):
    from ocaml_rdf_spark.operators.owlrl import (
        CHAIN_AXIOM, RDF_FIRST, RDF_NIL, RDF_REST, chain_closure,
    )

    rows = [
        (0, "urn:a", "urn:p:parent", 0, "urn:b"),
        (0, "urn:b", "urn:p:parent", 0, "urn:c"),
        (0, "urn:c", "urn:p:parent", 0, "urn:d"),
        (0, "urn:gp", CHAIN_AXIOM, 1, "l1"),
        (1, "l1", RDF_FIRST, 0, "urn:p:parent"),
        (1, "l1", RDF_REST, 1, "l2"),
        (1, "l2", RDF_FIRST, 0, "urn:p:parent"),
        (1, "l2", RDF_REST, 0, RDF_NIL),
    ]
    quads = spark.createDataFrame(
        rows, "s_kind int, s_lex string, pred string, o_kind int, o_lex string"
    ).withColumn("o_dtype", F.lit(None).cast("string")) \
     .withColumn("o_lang", F.lit(None).cast("string")) \
     .withColumn("graph", F.lit("g"))
    out = sorted(
        (r["s_lex"], r["pred"], r["o_lex"]) for r in chain_closure(quads).collect()
    )
    # 2-step chain: grandparent pairs only (a->c, b->d), no transitive bleed
    assert out == [("urn:a", "urn:gp", "urn:c"), ("urn:b", "urn:gp", "urn:d")]


def test_chain_closure_entailments_exclude_asserted(spark):
    from ocaml_rdf_spark.operators.owlrl import (
        CHAIN_AXIOM, RDF_FIRST, RDF_NIL, RDF_REST, chain_closure,
    )

    rows = [
        (0, "urn:a", "urn:p:p1", 0, "urn:b"),
        (0, "urn:b", "urn:p:p2", 0, "urn:c"),
        (0, "urn:a", "urn:pc", 0, "urn:c"),  # already asserted
        (0, "urn:pc", CHAIN_AXIOM, 1, "l1"),
        (1, "l1", RDF_FIRST, 0, "urn:p:p1"),
        (1, "l1", RDF_REST, 1, "l2"),
        (1, "l2", RDF_FIRST, 0, "urn:p:p2"),
        (1, "l2", RDF_REST, 0, RDF_NIL),
    ]
    quads = spark.createDataFrame(
        rows, "s_kind int, s_lex string, pred string, o_kind int, o_lex string"
    ).withColumn("o_dtype", F.lit(None).cast("string")) \
     .withColumn("o_lang", F.lit(None).cast("string")) \
     .withColumn("graph", F.lit("g"))
    assert chain_closure(quads).count() == 0
