"""Unit tests for RDFS entailment materialization (operators/rdfs.py) —
rule-by-rule micro cases; bulk parity is the rdfs_closure suite oracle."""

from __future__ import annotations

from ocaml_rdf_spark.operators.rdfs import DOMAIN, RANGE, SUBCLASS, SUBPROP, rdfs_closure
from ocaml_rdf_spark.types import RDF_TYPE, TRIPLES_SCHEMA, Iri, Literal, triple_row

EX = "http://ex.org/"


def _store(spark, triples):
    rows = [triple_row(Iri(s) if isinstance(s, str) else s, Iri(p), o if isinstance(o, Literal) else Iri(o), graph="urn:g:d") for s, p, o in triples]
    return spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)


def _spo(df):
    return {(r["s_lex"], r["pred"], r["o_lex"]) for r in df.collect()}


def test_subprop_then_domain_fires(spark):
    # p ⊑ q, q domain C: the domain rule must see the EXPANDED statement
    store = _store(spark, [
        (EX + "p", SUBPROP, EX + "q"),
        (EX + "q", DOMAIN, EX + "C"),
        (EX + "x", EX + "p", EX + "y"),
    ])
    got = _spo(rdfs_closure(store))
    assert (EX + "x", EX + "q", EX + "y") in got        # rdfs7
    assert (EX + "x", RDF_TYPE, EX + "C") in got       # rdfs2 via expansion


def test_range_skips_literals(spark):
    store = _store(spark, [
        (EX + "p", RANGE, EX + "C"),
        (EX + "x", EX + "p", Literal("lit")),
        (EX + "x", EX + "p", EX + "y"),
    ])
    got = _spo(rdfs_closure(store))
    assert (EX + "y", RDF_TYPE, EX + "C") in got
    assert not any(s == "lit" for s, _p, _o in got)


def test_subclass_cycle_terminates(spark):
    # A ⊑ B ⊑ A with x : A — closure terminates, x gets both types
    store = _store(spark, [
        (EX + "A", SUBCLASS, EX + "B"),
        (EX + "B", SUBCLASS, EX + "A"),
        (EX + "x", RDF_TYPE, EX + "A"),
    ])
    got = _spo(rdfs_closure(store))
    assert (EX + "x", RDF_TYPE, EX + "B") in got
    # reflexive pairs from the cycle are entailed schema rows
    assert (EX + "A", SUBCLASS, EX + "A") in got


def test_deep_hierarchy_inherits_all(spark):
    chain = [(EX + f"C{i}", SUBCLASS, EX + f"C{i+1}") for i in range(5)]
    store = _store(spark, chain + [(EX + "x", RDF_TYPE, EX + "C0")])
    got = _spo(rdfs_closure(store))
    for i in range(1, 6):
        assert (EX + "x", RDF_TYPE, EX + f"C{i}") in got


def test_asserted_triples_not_re_emitted(spark):
    store = _store(spark, [
        (EX + "A", SUBCLASS, EX + "B"),
        (EX + "x", RDF_TYPE, EX + "A"),
        (EX + "x", RDF_TYPE, EX + "B"),  # already asserted
    ])
    got = _spo(rdfs_closure(store))
    assert (EX + "x", RDF_TYPE, EX + "B") not in got


def test_schema_closure_driver_vs_distributed(spark):
    """The adaptive driver fast path (cc.py precedent) must agree with
    the forced-distributed fixpoint on chains and cycles."""
    from ocaml_rdf_spark.operators.rdfs import SUBCLASS, rdfs_closure
    from ocaml_rdf_spark.types import TRIPLES_SCHEMA, Iri, triple_row

    chain = [(f"urn:c:C{i}", SUBCLASS, f"urn:c:C{i+1}") for i in range(6)]
    cyc = [("urn:c:X", SUBCLASS, "urn:c:Y"), ("urn:c:Y", SUBCLASS, "urn:c:X")]
    inst = [("urn:i:a", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "urn:c:C0")]
    rows = [triple_row(Iri(s), Iri(p), Iri(o), graph="urn:g:t") for s, p, o in chain + cyc + inst]
    df = spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)

    fast = rdfs_closure(df)
    slow = rdfs_closure(df, schema_driver_limit=0)
    key = ["s_kind", "s_lex", "pred", "o_kind", "o_lex"]
    f = {tuple(r) for r in fast.select(*key).collect()}
    s = {tuple(r) for r in slow.select(*key).collect()}
    assert f == s
    # chain inheritance reached the top
    assert (0, "urn:i:a", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", 0, "urn:c:C6") in f
