"""Incremental RDFS closure maintenance (DRed — rdfs_closure_delta):
the maintained inferred set must be SET-EQUAL to a full recompute over
the updated base, across additions, deletions, rederivable deletions,
and the schema-change fallback."""

from __future__ import annotations

import pytest

from ocaml_rdf_spark.operators.rdfs import (
    DOMAIN,
    RANGE,
    SUBCLASS,
    SUBPROP,
    rdfs_closure,
    rdfs_closure_delta,
)
from ocaml_rdf_spark.types import RDF_TYPE, TRIPLES_SCHEMA, Iri, triple_row

KEY = ("s_kind", "s_lex", "pred", "o_kind", "o_lex")


def _df(spark, rows):
    return spark.createDataFrame(
        [triple_row(Iri(s), Iri(p), Iri(o), graph="urn:g:t") for s, p, o in rows],
        schema=TRIPLES_SCHEMA,
    )


def _set(df):
    return {tuple(r[k] for k in KEY) for r in df.collect()}


SCHEMA = [
    ("urn:C", SUBCLASS, "urn:P"),
    ("urn:P", SUBCLASS, "urn:A"),
    ("urn:p:in", SUBPROP, "urn:p:loc"),
    ("urn:p:in", DOMAIN, "urn:L"),
    ("urn:p:loc", RANGE, "urn:Pl"),
]
BASE = SCHEMA + [
    ("urn:x1", RDF_TYPE, "urn:C"),
    ("urn:x2", RDF_TYPE, "urn:C"),
    ("urn:x1", "urn:p:in", "urn:n1"),
    ("urn:x2", "urn:p:in", "urn:n2"),
    ("urn:x2", RDF_TYPE, "urn:P"),  # asserted AND derivable from x2:C
]


def _check(spark, add_rows, del_rows):
    base = _df(spark, BASE)
    old_inf = rdfs_closure(base)
    add, delete = _df(spark, add_rows), _df(spark, del_rows)
    got = rdfs_closure_delta(base, old_inf, add, delete)
    updated = base.join(delete.select(*KEY).distinct(), list(KEY), "left_anti").unionByName(add)
    want = rdfs_closure(updated)
    assert _set(got) == _set(want)
    return _set(got)


def test_pure_addition(spark):
    got = _check(spark, [("urn:x3", "urn:p:in", "urn:n3")], [])
    assert (0, "urn:x3", RDF_TYPE, 0, "urn:L") in got
    assert (0, "urn:x3", "urn:p:loc", 0, "urn:n3") in got
    assert (0, "urn:n3", RDF_TYPE, 0, "urn:Pl") in got


def test_pure_deletion_cascades(spark):
    # deleting x1's only support removes loc/L/Pl(n1) inferences
    got = _check(spark, [], [("urn:x1", "urn:p:in", "urn:n1")])
    assert (0, "urn:x1", "urn:p:loc", 0, "urn:n1") not in got
    assert (0, "urn:x1", RDF_TYPE, 0, "urn:L") not in got
    assert (0, "urn:n1", RDF_TYPE, 0, "urn:Pl") not in got
    # x1's class chain is untouched
    assert (0, "urn:x1", RDF_TYPE, 0, "urn:P") in got


def test_deleted_but_rederivable_statement_reappears(spark):
    # (x2 type P) was ASSERTED (so excluded from old_inferred) and is
    # also derivable from (x2 type C); deleting the assertion must
    # surface it as an INFERENCE — the over-delete/rederive corner
    got = _check(spark, [], [("urn:x2", RDF_TYPE, "urn:P")])
    assert (0, "urn:x2", RDF_TYPE, 0, "urn:P") in got
    assert (0, "urn:x2", RDF_TYPE, 0, "urn:A") in got


def test_mixed_add_delete(spark):
    got = _check(
        spark,
        [("urn:x1", "urn:p:in", "urn:n9"), ("urn:x9", RDF_TYPE, "urn:C")],
        [("urn:x2", "urn:p:in", "urn:n2"), ("urn:x1", RDF_TYPE, "urn:C")],
    )
    assert (0, "urn:x9", RDF_TYPE, 0, "urn:A") in got
    assert (0, "urn:n9", RDF_TYPE, 0, "urn:Pl") in got
    assert (0, "urn:n2", RDF_TYPE, 0, "urn:Pl") not in got
    assert (0, "urn:x1", RDF_TYPE, 0, "urn:P") not in got  # sole support deleted


def test_schema_change_falls_back_to_full_recompute(spark):
    got = _check(spark, [("urn:A", SUBCLASS, "urn:Top")], [])
    assert (0, "urn:x1", RDF_TYPE, 0, "urn:Top") in got


def test_shared_support_survives(spark):
    # n2 is Pl via x2's edge; add another edge to n2 then delete x2's —
    # Pl(n2) must survive via the remaining support
    got = _check(
        spark,
        [("urn:x7", "urn:p:in", "urn:n2")],
        [("urn:x2", "urn:p:in", "urn:n2")],
    )
    assert (0, "urn:n2", RDF_TYPE, 0, "urn:Pl") in got


def test_differential_fuzz_random_deltas(spark):
    """Seeded random ontologies + random add/delete batches: DRed must
    equal the full recompute every time (3 seeded rounds, each with a
    random class DAG, property tree, domain/range axioms, instance
    edges/types, and a random delta split)."""
    import random

    for seed in (11, 23, 47):
        rng = random.Random(seed)
        classes = [f"urn:C{i}" for i in range(6)]
        props = [f"urn:p{i}" for i in range(4)]
        schema = []
        for i in range(1, 6):
            schema.append((classes[i], SUBCLASS, classes[rng.randrange(i)]))
        for i in range(1, 4):
            schema.append((props[i], SUBPROP, props[rng.randrange(i)]))
        for p in rng.sample(props, 2):
            schema.append((p, DOMAIN, rng.choice(classes)))
        for p in rng.sample(props, 2):
            schema.append((p, RANGE, rng.choice(classes)))
        nodes = [f"urn:n{i}" for i in range(12)]
        inst = []
        for _ in range(30):
            inst.append((rng.choice(nodes), rng.choice(props), rng.choice(nodes)))
        for _ in range(12):
            inst.append((rng.choice(nodes), RDF_TYPE, rng.choice(classes)))
        inst = sorted(set(inst))
        k = len(inst)
        del_rows = rng.sample(inst, k // 4)
        add_rows = [
            (f"urn:m{i}", rng.choice(props), rng.choice(nodes)) for i in range(5)
        ] + [(f"urn:m{i}", RDF_TYPE, rng.choice(classes)) for i in range(3)]

        base = _df(spark, schema + inst)
        old_inf = rdfs_closure(base)
        got = rdfs_closure_delta(base, old_inf, _df(spark, add_rows), _df(spark, del_rows))
        updated = base.join(
            _df(spark, del_rows).select(*KEY).distinct(), list(KEY), "left_anti"
        ).unionByName(_df(spark, add_rows))
        want = rdfs_closure(updated)
        assert _set(got) == _set(want), f"seed {seed} diverged"
