"""SPARQL-algebra evaluation tests on a fixture graph — W3C-style semantics
checks for BGP/Join/LeftJoin/Filter/Union/Minus/Extend/Group/OrderBy/Slice/
Exists/Values/Construct (SURVEY §2.3-2.4)."""

import pytest

from ocaml_rdf_spark.algebra import (
    BGP,
    Agg,
    Ctx,
    Template,
    TriplePattern as T,
    Values,
    Var,
    ask,
    construct,
    flatten,
    select,
)
from ocaml_rdf_spark.functions.builtins import (
    BOUND,
    CONCAT,
    CONTAINS,
    DATATYPE,
    IF,
    IN,
    IS_IRI,
    IS_LITERAL,
    IS_NUMERIC,
    LANG,
    LANGMATCHES,
    L,
    REGEX,
    REPLACE,
    ROUND,
    SAME_TERM,
    STR,
    STRLEN,
    SUBSTR,
    UCASE,
    V,
)
from ocaml_rdf_spark.graph import Graph
from ocaml_rdf_spark.types import XSD_INTEGER, Iri, Literal

EX = "http://ex.org/"


def iri(x):
    return Iri(EX + x)


@pytest.fixture(scope="module")
def ctx(spark):
    name = Iri(EX + "name")
    age = Iri(EX + "age")
    knows = Iri(EX + "knows")
    city = Iri(EX + "city")
    triples = [
        (iri("alice"), name, Literal("Alice")),
        (iri("alice"), age, Literal("30", dtype=XSD_INTEGER)),
        (iri("alice"), knows, iri("bob")),
        (iri("alice"), city, Literal("Paris")),
        (iri("bob"), name, Literal("Bob")),
        (iri("bob"), age, Literal("25", dtype=XSD_INTEGER)),
        (iri("bob"), knows, iri("carol")),
        (iri("carol"), name, Literal("Carol", lang="en")),
        (iri("carol"), age, Literal("35", dtype=XSD_INTEGER)),
        (iri("dave"), name, Literal("Dave")),
    ]
    g = Graph.from_triples(spark, triples, name="urn:g1")
    return Ctx(g.df.cache())


def rows(df, *cols):
    return sorted(
        (tuple(r[c] for c in cols) for r in flatten(df).collect()),
        key=lambda t: tuple("" if x is None else x for x in t),
    )


def test_bgp_single_pattern(ctx):
    df = select(BGP([T(Var("s"), Iri(EX + "age"), Var("a"))]), ctx)
    assert rows(df, "s", "a") == [
        (EX + "alice", "30"),
        (EX + "bob", "25"),
        (EX + "carol", "35"),
    ]


def test_bgp_join_on_shared_var(ctx):
    df = select(
        BGP(
            [
                T(Var("s"), Iri(EX + "knows"), Var("o")),
                T(Var("o"), Iri(EX + "name"), Var("n")),
            ]
        ),
        ctx,
    )
    assert rows(df, "s", "n") == [(EX + "alice", "Bob"), (EX + "bob", "Carol")]


def test_filter_numeric_comparison(ctx):
    node = BGP([T(Var("s"), Iri(EX + "age"), Var("a"))]).filter(V("a") > L(26))
    assert rows(select(node, ctx), "s") == [(EX + "alice",), (EX + "carol",)]


def test_filter_errors_drop(ctx):
    # comparing a name (string) to an int is a type error -> row dropped
    node = BGP([T(Var("s"), Iri(EX + "name"), Var("n"))]).filter(V("n") > L(26))
    assert rows(select(node, ctx), "s") == []


def test_left_join_optional(ctx):
    node = BGP([T(Var("s"), Iri(EX + "name"), Var("n"))]).left_join(
        BGP([T(Var("s"), Iri(EX + "city"), Var("c"))])
    )
    got = rows(select(node, ctx), "s", "c")
    assert (EX + "alice", "Paris") in got
    assert (EX + "bob", None) in got and (EX + "dave", None) in got


def test_left_join_condition_in_join_not_postfilter(ctx):
    # OPTIONAL { ?s ex:age ?a FILTER(?a > 28) } keeps non-matching s with unbound a
    node = BGP([T(Var("s"), Iri(EX + "name"), Var("n"))]).left_join(
        BGP([T(Var("s"), Iri(EX + "age"), Var("a"))]), V("a") > L(28)
    )
    got = dict(rows(select(node, ctx), "s", "a"))
    assert got[EX + "alice"] == "30" and got[EX + "bob"] is None


def test_union_unbound_columns(ctx):
    a = BGP([T(Var("s"), Iri(EX + "city"), Var("c"))])
    b = BGP([T(Var("s"), Iri(EX + "age"), Var("a"))])
    df = select(a.union(b), ctx)
    got = rows(df, "s", "c", "a")
    assert (EX + "alice", "Paris", None) in got
    assert (EX + "bob", None, "25") in got


def test_minus(ctx):
    node = BGP([T(Var("s"), Iri(EX + "name"), Var("n"))]).minus(
        BGP([T(Var("s"), Iri(EX + "city"), Var("c"))])
    )
    assert rows(select(node, ctx), "s") == [(EX + "bob",), (EX + "carol",), (EX + "dave",)]


def test_minus_disjoint_domain_keeps_all(ctx):
    node = BGP([T(Var("s"), Iri(EX + "name"), Var("n"))]).minus(
        BGP([T(Var("x"), Iri(EX + "city"), Var("c"))])
    )
    assert len(rows(select(node, ctx), "s")) == 4


def test_extend_bind(ctx):
    node = BGP([T(Var("s"), Iri(EX + "age"), Var("a"))]).extend("a2", V("a") + L(1))
    got = dict(rows(select(node, ctx), "s", "a2"))
    assert got[EX + "alice"] == "31"


def test_group_aggregates(ctx):
    node = BGP([T(Var("s"), Iri(EX + "age"), Var("a"))]).group(
        [],
        [
            Agg("n", "count_star"),
            Agg("total", "sum", V("a")),
            Agg("avg_age", "avg", V("a")),
            Agg("min_age", "min", V("a")),
            Agg("max_age", "max", V("a")),
        ],
    )
    r = flatten(select(node, ctx)).collect()[0]
    assert (r["n"], r["total"], r["min_age"], r["max_age"]) == ("3", "90", "25", "35")
    assert float(r["avg_age"]) == 30.0


def test_group_by_key_and_group_concat(ctx):
    node = BGP([T(Var("s"), Var("p"), Var("o"))]).group(
        ["s"], [Agg("n", "count_star"), Agg("ps", "group_concat", V("p"), distinct=True, separator="|")]
    )
    got = {r[0]: r[1] for r in rows(select(node, ctx), "s", "n")}
    assert got[EX + "alice"] == "4" and got[EX + "dave"] == "1"


def test_order_by_slice(ctx):
    node = (
        BGP([T(Var("s"), Iri(EX + "age"), Var("a"))])
        .order_by(("a", False))
        .slice(offset=1, limit=1)
    )
    assert rows(select(node, ctx), "s") == [(EX + "alice",)]


def test_order_by_sparql_total_order(ctx):
    # unbound < blank < iri < literal
    node = BGP([T(Var("s"), Iri(EX + "name"), Var("n"))]).left_join(
        BGP([T(Var("s"), Iri(EX + "city"), Var("c"))])
    ).order_by("c")
    got = [r["c"] for r in flatten(select(node, ctx)).collect()]
    assert got[:3] == [None, None, None] and got[3] == "Paris"


def test_exists_and_not_exists(ctx):
    base = BGP([T(Var("s"), Iri(EX + "name"), Var("n"))])
    sub = BGP([T(Var("s"), Iri(EX + "knows"), Var("w"))])
    assert rows(select(base.exists(sub), ctx), "s") == [(EX + "alice",), (EX + "bob",)]
    assert rows(select(base.exists(sub, negated=True), ctx), "s") == [(EX + "carol",), (EX + "dave",)]


def test_values(ctx):
    node = BGP([T(Var("s"), Iri(EX + "name"), Var("n"))]).join(
        Values([{"s": iri("alice")}, {"s": iri("dave")}])
    )
    assert rows(select(node, ctx), "n") == [("Alice",), ("Dave",)]


def test_ask(ctx):
    assert ask(BGP([T(iri("alice"), Iri(EX + "knows"), iri("bob"))]), ctx)
    assert not ask(BGP([T(iri("bob"), Iri(EX + "knows"), iri("alice"))]), ctx)


def test_graph_var_binds(ctx):
    node = BGP([T(Var("s"), Iri(EX + "name"), Var("n"), g=Var("g"))])
    assert all(g == "urn:g1" for (g,) in rows(select(node, ctx), "g"))


def test_construct(ctx):
    tpl = [Template(Var("s"), Iri(EX + "greets"), Var("o"))]
    df = construct(tpl, BGP([T(Var("s"), Iri(EX + "knows"), Var("o"))]), ctx)
    got = sorted((r["s_lex"], r["pred"], r["o_lex"]) for r in df.collect())
    assert got == [
        (EX + "alice", EX + "greets", EX + "bob"),
        (EX + "bob", EX + "greets", EX + "carol"),
    ]


def test_builtins_on_graph(ctx):
    node = (
        BGP([T(Var("s"), Iri(EX + "name"), Var("n"))])
        .extend("u", UCASE(V("n")))
        .extend("l", STRLEN(V("n")))
        .extend("sub", SUBSTR(V("n"), 1, 2))
        .extend("has_a", CONTAINS(V("n"), L("a")))
        .extend("lg", LANG(V("n")))
        .extend("dt", DATATYPE(V("n")))
        .extend("isi", IS_IRI(V("s")))
        .filter(REGEX(V("n"), "^[AC]", ""))
    )
    got = {r["n"]: r for r in flatten(select(node, ctx)).collect()}
    assert set(got) == {"Alice", "Carol"}
    assert got["Alice"]["u"] == "ALICE" and got["Alice"]["l"] == "5" and got["Alice"]["sub"] == "Al"
    assert got["Carol"]["lg"] == "en"
    assert got["Alice"]["dt"].endswith("XMLSchema#string")
    assert got["Carol"]["dt"].endswith("langString")
    assert got["Alice"]["isi"] == "true"


def test_builtin_if_coalesce_bound(ctx):
    node = (
        BGP([T(Var("s"), Iri(EX + "name"), Var("n"))])
        .left_join(BGP([T(Var("s"), Iri(EX + "city"), Var("c"))]))
        .extend("has_city", BOUND("c"))
        .extend("place", IF(BOUND("c"), V("c"), L("nowhere")))
    )
    got = {r["n"]: (r["has_city"], r["place"]) for r in flatten(select(node, ctx)).collect()}
    assert got["Alice"] == ("true", "Paris")
    assert got["Bob"] == ("false", "nowhere")


def test_langmatches_and_str(ctx):
    node = (
        BGP([T(Var("s"), Iri(EX + "name"), Var("n"))])
        .filter(LANGMATCHES(LANG(V("n")), L("en")))
    )
    assert rows(select(node, ctx), "n") == [("Carol",)]


def test_in_and_sameterm(ctx):
    node = BGP([T(Var("s"), Iri(EX + "name"), Var("n"))]).filter(
        IN(V("s"), L(iri("alice")), L(iri("bob")))
    )
    assert len(rows(select(node, ctx), "s")) == 2


def test_arithmetic_division_and_round(ctx):
    node = (
        BGP([T(Var("s"), Iri(EX + "age"), Var("a"))])
        .extend("half", V("a") / L(2))
        .extend("r", ROUND(V("half")))
        .filter(V("s") == L(iri("bob")))
    )
    r = flatten(select(node, ctx)).collect()[0]
    assert float(r["half"]) == 12.5
    assert r["r"] == "13"  # round-half-up toward +inf


def test_bgp_order_stats_connectivity_and_selectivity():
    """Pure-planner test: with stats the order is smallest-estimate-first
    but must stay CONNECTED (no cross join between disconnected
    prefixes); without stats, boundness order is unchanged."""
    from ocaml_rdf_spark.algebra import TriplePattern, Var, _bgp_order
    from ocaml_rdf_spark.types import Iri, Literal

    def T(s, p, o):
        return TriplePattern(s, p, o)

    pats = [
        T(Var("a"), Iri("urn:p:big"), Var("b")),        # est 1000
        T(Var("b"), Iri("urn:p:mid"), Var("c")),        # est 100
        T(Var("x"), Iri("urn:p:tiny"), Literal("k")),   # est 10/50 — smallest, but DISCONNECTED
        T(Var("c"), Iri("urn:p:link"), Var("x")),       # est 200 — bridges c↔x
    ]
    stats = {
        "urn:p:big": (1000, 100, 100),
        "urn:p:mid": (100, 50, 50),
        "urn:p:tiny": (10, 5, 50),
        "urn:p:link": (200, 100, 100),
    }
    order = _bgp_order(pats, stats)
    # seed = tiny (global min); then connectivity forces link before mid/big
    assert order[0] == 2
    assert order[1] == 3  # only pattern sharing ?x
    assert set(order[2:]) == {0, 1}
    assert order[2] == 1  # mid (est 100) before big (est 1000), both connected via c/b

    # without stats: boundness first (pattern 2 has 2 bound positions)
    assert _bgp_order(pats, None)[0] == 2

    # absent predicate = empty scan seeds first
    stats2 = dict(stats)
    pats2 = pats + [T(Var("a"), Iri("urn:p:nowhere"), Var("z"))]
    assert _bgp_order(pats2, stats2)[0] == 4
