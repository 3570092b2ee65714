"""Differential fuzz of the expression DSL's dual boolean representation.

Every boolean-producing E node carries two builders: `fn` (the
xsd:boolean TERM struct, what SELECT/BIND materializes) and `bfn` (the
raw boolean Column the EBV consumers read — builtins.ebv_e). The whole
fast path rests on one identity: ebv(fn(vm)) ≡ bfn(vm) under SPARQL 3VL,
for EVERY expression shape. This test enumerates seeded-random
expression trees over a deliberately nasty term table (unbound, IRIs,
bnodes, plain/lang/typed strings, the numeric tower, valid and
ILL-FORMED booleans and numerics) and asserts the two paths agree
row-for-row — NULL (error) included.

This is the reference's (data, expr, expected) test style turned
generative: instead of hand-picking expected values, the term form IS
the oracle for the raw form (and vice versa) — they are computed by
disjoint code paths (terms.ebv's §17.2.2 CASE vs the kernels' raw
booleans), so agreement is evidence, not tautology.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ocaml_rdf_spark.functions import builtins as B
from ocaml_rdf_spark.functions.terms import ebv
from ocaml_rdf_spark.types import Iri, Literal, TRIPLES_SCHEMA  # noqa: F401

XSD = "http://www.w3.org/2001/XMLSchema#"

# one column per term flavor; None = unbound
TERMS = {
    "iri": Iri("http://ex.org/a"),
    "iri2": Iri("http://ex.org/b"),
    "s_plain": Literal("hello"),
    "s_empty": Literal(""),
    "s_lang": Literal("bonjour", lang="fr"),
    "i_small": Literal("7", dtype=XSD + "integer"),
    "i_neg": Literal("-3", dtype=XSD + "integer"),
    "i_zero": Literal("0", dtype=XSD + "integer"),
    "dbl": Literal("2.5", dtype=XSD + "double"),
    "dec_": Literal("7.000", dtype=XSD + "decimal"),
    "num_bad": Literal("seven", dtype=XSD + "integer"),
    "b_true": Literal("true", dtype=XSD + "boolean"),
    "b_false": Literal("false", dtype=XSD + "boolean"),
    "b_bad": Literal("maybe", dtype=XSD + "boolean"),
    "dt": Literal("2024-01-02T03:04:05Z", dtype=XSD + "dateTime"),
    "unk": Literal("x", dtype="http://ex.org/custom"),
}
VARS = list(TERMS) + ["unbound"]


def _term_struct(t):
    from ocaml_rdf_spark.functions.terms import term_lit

    return term_lit(t)


def _vm():
    vm = {v: _term_struct(t) for v, t in TERMS.items()}
    vm["unbound"] = F.lit(None).cast("struct<kind:tinyint,lex:string,dtype:string,lang:string>")
    return vm


def _rand_leaf(rng) -> B.E:
    r = rng.random()
    if r < 0.55:
        return B.V(rng.choice(VARS))
    if r < 0.70:
        return B.L(rng.choice(["hello", "", "zzz"]))
    if r < 0.85:
        return B.L(rng.choice([0, 7, -3, 42]))
    if r < 0.93:
        return B.L(rng.choice([2.5, -0.0]))
    return B.L(rng.choice([True, False]))


def _rand_bool_expr(rng, depth: int) -> B.E:
    """A boolean-producing expression tree (every node here sets bfn or is
    consumed via ebv_e by a combinator that does)."""
    if depth <= 0:
        kind = rng.choice(["cmp", "bound", "isx", "in", "same"])
    else:
        kind = rng.choice(
            ["cmp", "and", "or", "not", "bound", "isx", "in", "same", "if", "cmp", "and", "or", "not"]
        )
    if kind == "cmp":
        a, b = _rand_leaf(rng), _rand_leaf(rng)
        op = rng.choice(["eq", "ne", "lt", "gt", "le", "ge"])
        return {
            "eq": lambda: a == b,
            "ne": lambda: a != b,
            "lt": lambda: a < b,
            "gt": lambda: a > b,
            "le": lambda: a <= b,
            "ge": lambda: a >= b,
        }[op]()
    if kind == "and":
        return _rand_bool_expr(rng, depth - 1) & _rand_bool_expr(rng, depth - 1)
    if kind == "or":
        return _rand_bool_expr(rng, depth - 1) | _rand_bool_expr(rng, depth - 1)
    if kind == "not":
        return ~_rand_bool_expr(rng, depth - 1)
    if kind == "bound":
        return B.BOUND(rng.choice(VARS))
    if kind == "isx":
        f = rng.choice([B.IS_IRI, B.IS_BLANK, B.IS_LITERAL, B.IS_NUMERIC])
        return f(B.V(rng.choice(VARS)))
    if kind == "in":
        return B.IN(_rand_leaf(rng), _rand_leaf(rng), _rand_leaf(rng))
    if kind == "same":
        return B.SAME_TERM(_rand_leaf(rng), _rand_leaf(rng))
    # if: boolean IF whose branches are boolean terms (keeps the result
    # comparable through both paths; condition exercises ebv_e)
    return B.IF(
        _rand_bool_expr(rng, depth - 1),
        _rand_bool_expr(rng, depth - 1),
        _rand_bool_expr(rng, depth - 1),
    )


N_EXPRS = 48
BATCH = 8


@pytest.mark.parametrize("seed", [11, 23])
def test_term_form_and_raw_form_agree(spark, seed):
    rng = random.Random(seed)
    exprs = [_rand_bool_expr(rng, depth=2) for _ in range(N_EXPRS // 2)]
    df = spark.range(1)
    vm = _vm()
    for start in range(0, len(exprs), BATCH):
        cols = []
        for i, e in enumerate(exprs[start : start + BATCH]):
            cols.append(ebv(e.fn(vm)).alias(f"t{i}"))  # term path, full §17.2.2 EBV
            cols.append(B.ebv_e(e, vm).alias(f"r{i}"))  # raw path
        row = df.select(*cols).collect()[0]
        for i in range(len(cols) // 2):
            t, r = row[f"t{i}"], row[f"r{i}"]
            assert t == r, f"seed={seed} expr#{start+i}: term-path {t!r} != raw-path {r!r}"


def test_filter_matches_manual_ebv(spark):
    """End-to-end: Filter keeps exactly the rows whose raw EBV is true."""
    from ocaml_rdf_spark.algebra import Ctx, Filter
    from ocaml_rdf_spark.types import triple_row

    rng = random.Random(99)
    rows = [
        triple_row(Iri("http://ex.org/s%d" % i), Iri("http://ex.org/p"), t, graph="urn:g")
        for i, t in enumerate(TERMS.values())
    ]
    df = spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)
    ctx = Ctx(df)
    from ocaml_rdf_spark.algebra import BGP, TriplePattern, Var

    bgp = BGP([TriplePattern(Var("s"), Iri("http://ex.org/p"), Var("o"))])
    for _ in range(6):
        e = _rand_bool_expr(rng, depth=2)
        # restrict vars to ?o (the only one bound here)
        e2 = _remap_vars(e, rng)
        got, _, _ = Filter(e2, bgp).compile(ctx)
        manual = bgp.compile(ctx)[0]
        vm = {"s": F.col("s"), "o": F.col("o")}
        expect = manual.filter(F.coalesce(B.ebv_e(e2, vm), F.lit(False)))
        a = sorted(r["s"]["lex"] for r in got.select("s").collect())
        b = sorted(r["s"]["lex"] for r in expect.select("s").collect())
        assert a == b


def _remap_vars(e, rng):
    """Rebuild leaf V() refs onto ?o — cheap structural remap: we simply
    generate expressions that only use ?o by swapping the varmap at eval
    time (V closures read vm[name]; provide every name as ?o)."""

    class _VMProxy(dict):
        def __getitem__(self, k):
            return F.col("o")

    orig_fn, orig_bfn = e.fn, e.bfn
    proxy = _VMProxy()
    out = B.E(lambda vm: orig_fn(proxy), (lambda vm: orig_bfn(proxy)) if orig_bfn else None)
    return out
