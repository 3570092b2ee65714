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


def test_deep_chain_path_doubling(spark):
    """≥64-deep chain: hybrid closure escalates to path doubling — round
    count stays O(linear_rounds + log2 d), nowhere near d, and the pair
    set is exactly the d*(d+1)/2 chain closure (r2 scale-flag fixture)."""
    import math

    from ocaml_rdf_spark.operators.paths import transitive_closure

    d = 100  # edges a0→a1→…→a100
    knows = Iri(EX + "knows")
    triples = [(iri(f"n{i}"), knows, iri(f"n{i+1}")) for i in range(d)]
    g = Graph.from_triples(spark, triples, name="urn:chain")
    pairs = P(EX + "knows").pairs(Ctx(g.df))

    rounds: list[int] = []
    closure = transitive_closure(pairs, linear_rounds=4, rounds_out=rounds)
    assert closure.count() == d * (d + 1) // 2
    assert rounds[0] <= 4 + math.ceil(math.log2(d)) + 1, rounds
    assert rounds[0] < d // 2

    # spot-check endpoints: n0 reaches n100, nothing reaches n0
    got = {(r["src"]["lex"], r["dst"]["lex"]) for r in closure.collect()}
    assert (EX + "n0", EX + f"n{d}") in got
    assert not any(dst == EX + "n0" for _src, dst in got)


def test_plus_equivalent_under_doubling(ctx):
    """Plus with linear_rounds forced to 0 (pure doubling) matches the
    default hybrid on the same graph — algorithm choice is invisible."""
    from ocaml_rdf_spark.operators.paths import transitive_closure

    base = P(EX + "knows").pairs(ctx)
    a = {(r["src"]["lex"], r["dst"]["lex"]) for r in transitive_closure(base).collect()}
    b = {
        (r["src"]["lex"], r["dst"]["lex"])
        for r in transitive_closure(base, linear_rounds=0).collect()
    }
    assert a == b and len(a) > 0


def _chain_ctx(spark, n=6):
    from ocaml_rdf_spark.algebra import Ctx
    from ocaml_rdf_spark.types import Iri, TRIPLES_SCHEMA, triple_row

    EX = "http://ex.org/"
    t = [
        triple_row(Iri(f"{EX}n{i}"), Iri(EX + "p"), Iri(f"{EX}n{i+1}"), graph="urn:g")
        for i in range(n)
    ]
    return Ctx(spark.createDataFrame(t, schema=TRIPLES_SCHEMA))


def _ends(pairs_df, start="http://ex.org/n0"):
    return sorted(
        int(r["dst"]["lex"].rsplit("n", 1)[1])
        for r in pairs_df.collect()
        if r["src"]["lex"] == start
    )


def test_repeat_exact_and_range(spark):
    from ocaml_rdf_spark.operators.paths import P, Repeat

    ctx = _chain_ctx(spark)
    assert _ends(Repeat(P("http://ex.org/p"), 3, 3).pairs(ctx)) == [3]
    assert _ends(Repeat(P("http://ex.org/p"), 2, 4).pairs(ctx)) == [2, 3, 4]


def test_repeat_zero_lower_bound_includes_identity(spark):
    from ocaml_rdf_spark.operators.paths import P, Repeat

    ctx = _chain_ctx(spark)
    # {0,2}: zero-length (the node itself) plus 1 and 2 hops
    assert _ends(Repeat(P("http://ex.org/p"), 0, 2).pairs(ctx)) == [0, 1, 2]


def test_repeat_unbounded_tail_matches_plus_star(spark):
    from ocaml_rdf_spark.operators.paths import P, Plus, Repeat, Star

    ctx = _chain_ctx(spark)
    pp = "http://ex.org/p"
    one_up = sorted(map(str, Repeat(P(pp), 1, None).pairs(ctx).collect()))
    plus = sorted(map(str, Plus(P(pp)).pairs(ctx).collect()))
    assert one_up == plus
    zero_up = sorted(map(str, Repeat(P(pp), 0, None).pairs(ctx).collect()))
    star = sorted(map(str, Star(P(pp)).pairs(ctx).collect()))
    assert zero_up == star


def test_repeat_cycle_terminates(spark):
    from ocaml_rdf_spark.algebra import Ctx
    from ocaml_rdf_spark.operators.paths import P, Repeat
    from ocaml_rdf_spark.types import Iri, TRIPLES_SCHEMA, triple_row

    EX = "http://ex.org/"
    t = [
        triple_row(Iri(EX + "a"), Iri(EX + "p"), Iri(EX + "b"), graph="urn:g"),
        triple_row(Iri(EX + "b"), Iri(EX + "p"), Iri(EX + "a"), graph="urn:g"),
    ]
    ctx = Ctx(spark.createDataFrame(t, schema=TRIPLES_SCHEMA))
    # on a 2-cycle, {2,5} from a reaches a (even hops) and b (odd hops)
    out = {(r["src"]["lex"], r["dst"]["lex"]) for r in Repeat(P(EX + "p"), 2, 5).pairs(ctx).collect()}
    assert (EX + "a", EX + "a") in out and (EX + "a", EX + "b") in out


def test_repeat_validates_bounds(spark):
    import pytest as _pt

    from ocaml_rdf_spark.operators.paths import P, Repeat

    ctx = _chain_ctx(spark)
    with _pt.raises(ValueError):
        Repeat(P("http://ex.org/p"), 3, 2).pairs(ctx)
