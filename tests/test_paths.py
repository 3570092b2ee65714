"""Property-path evaluation tests (SURVEY §2.5)."""

import pytest

from ocaml_rdf_spark.algebra import BGP, Ctx, TriplePattern as T, Var, flatten, select
from ocaml_rdf_spark.graph import Graph
from ocaml_rdf_spark.operators.paths import Alt, Inv, Neg, P, PathPattern, Plus, Seq, Star, ZeroOrOne
from ocaml_rdf_spark.types import Iri

EX = "http://ex.org/"


def iri(x):
    return Iri(EX + x)


@pytest.fixture(scope="module")
def ctx(spark):
    knows = Iri(EX + "knows")
    likes = Iri(EX + "likes")
    # chain a->b->c->d, plus a cycle x->y->x, plus likes edge
    triples = [
        (iri("a"), knows, iri("b")),
        (iri("b"), knows, iri("c")),
        (iri("c"), knows, iri("d")),
        (iri("x"), knows, iri("y")),
        (iri("y"), knows, iri("x")),
        (iri("a"), likes, iri("d")),
    ]
    g = Graph.from_triples(spark, triples, name="urn:paths")
    return Ctx(g.df.cache())


def rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in flatten(df).collect())


def test_predicate_path(ctx):
    got = rows(select(PathPattern(Var("s"), P(EX + "likes"), Var("o")), ctx), "s", "o")
    assert got == [(EX + "a", EX + "d")]


def test_inverse(ctx):
    got = rows(select(PathPattern(Var("s"), Inv(P(EX + "likes")), Var("o")), ctx), "s", "o")
    assert got == [(EX + "d", EX + "a")]


def test_sequence(ctx):
    got = rows(select(PathPattern(iri("a"), Seq(P(EX + "knows"), P(EX + "knows")), Var("o")), ctx), "o")
    assert got == [(EX + "c",)]


def test_alternative(ctx):
    got = rows(select(PathPattern(iri("a"), Alt(P(EX + "knows"), P(EX + "likes")), Var("o")), ctx), "o")
    assert got == [(EX + "b",), (EX + "d",)]


def test_plus_transitive(ctx):
    got = rows(select(PathPattern(iri("a"), Plus(P(EX + "knows")), Var("o")), ctx), "o")
    assert got == [(EX + "b",), (EX + "c",), (EX + "d",)]


def test_plus_cycle_safe(ctx):
    got = rows(select(PathPattern(iri("x"), Plus(P(EX + "knows")), Var("o")), ctx), "o")
    # cycle: x reaches y and x itself; must terminate
    assert got == [(EX + "x",), (EX + "y",)]


def test_star_includes_identity(ctx):
    got = rows(select(PathPattern(iri("a"), Star(P(EX + "knows")), Var("o")), ctx), "o")
    assert (EX + "a",) in got and (EX + "d",) in got


def test_zero_or_one(ctx):
    got = rows(select(PathPattern(iri("a"), ZeroOrOne(P(EX + "knows")), Var("o")), ctx), "o")
    assert got == [(EX + "a",), (EX + "b",)]


def test_negated_property_set(ctx):
    got = rows(select(PathPattern(iri("a"), Neg([EX + "knows"]), Var("o")), ctx), "o")
    assert got == [(EX + "d",)]


def test_path_composes_with_bgp(ctx):
    node = PathPattern(Var("s"), Plus(P(EX + "knows")), Var("o")).join(
        BGP([T(Var("s"), Iri(EX + "likes"), Var("l"))])
    )
    got = rows(select(node, ctx), "s", "o", "l")
    assert (EX + "a", EX + "d", EX + "d") in got
