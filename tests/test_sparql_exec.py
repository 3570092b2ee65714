"""End-to-end SPARQL-text execution against an in-memory dataset —
the reference's own test style (W3C evaluation cases, SURVEY §5):
(data, query, expected solutions) triples."""

from __future__ import annotations

import pytest

from ocaml_rdf_spark.algebra import Ctx, flatten
from ocaml_rdf_spark.sparql import execute, parse_query
from ocaml_rdf_spark.types import TRIPLES_SCHEMA, Iri, Literal, triple_row

EX = "http://ex.org/"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"
PFX = f"PREFIX ex: <{EX}>\n"


@pytest.fixture(scope="module")
def ctx(spark):
    t = [
        (Iri(EX + "alice"), Iri(EX + "name"), Literal("Alice")),
        (Iri(EX + "alice"), Iri(EX + "age"), Literal("30", dtype=XSD_INT)),
        (Iri(EX + "alice"), Iri(EX + "knows"), Iri(EX + "bob")),
        (Iri(EX + "bob"), Iri(EX + "name"), Literal("Bob")),
        (Iri(EX + "bob"), Iri(EX + "age"), Literal("25", dtype=XSD_INT)),
        (Iri(EX + "bob"), Iri(EX + "knows"), Iri(EX + "carol")),
        (Iri(EX + "carol"), Iri(EX + "name"), Literal("Carol")),
        (Iri(EX + "alice"), Iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"), Iri(EX + "Person")),
        (Iri(EX + "bob"), Iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"), Iri(EX + "Person")),
    ]
    rows = [triple_row(s, p, o, graph="urn:g:main") for s, p, o in t]
    rows.append(triple_row(Iri(EX + "dave"), Iri(EX + "name"), Literal("Dave"), graph="urn:g:other"))
    df = spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)
    return Ctx(df)


def rows(df, *cols):
    out = flatten(df)
    if cols:
        out = out.select(*cols)
    return sorted(tuple(r) for r in out.collect())


def test_select_join(ctx):
    df = execute(PFX + "SELECT ?n ?m WHERE { ?x ex:knows ?y . ?x ex:name ?n . ?y ex:name ?m }", ctx)
    assert rows(df, "n", "m") == [("Alice", "Bob"), ("Bob", "Carol")]


def test_filter_numeric(ctx):
    df = execute(PFX + "SELECT ?n WHERE { ?x ex:name ?n ; ex:age ?a FILTER(?a > 27) }", ctx)
    assert rows(df) == [("Alice",)]


def test_optional_and_bound(ctx):
    df = execute(
        PFX + "SELECT ?n ?a WHERE { ?x ex:name ?n OPTIONAL { ?x ex:age ?a } }", ctx
    )
    # default context = RDF merge of ALL graphs (Dave lives in urn:g:other)
    assert rows(df, "n", "a") == [("Alice", "30"), ("Bob", "25"), ("Carol", None), ("Dave", None)]


def test_union_and_distinct(ctx):
    df = execute(
        PFX + "SELECT DISTINCT ?n WHERE { { ?x ex:name ?n } UNION { ?x ex:name ?n } }", ctx
    )
    assert rows(df) == [("Alice",), ("Bob",), ("Carol",), ("Dave",)]


def test_minus(ctx):
    df = execute(PFX + "SELECT ?n WHERE { ?x ex:name ?n MINUS { ?x ex:age ?a } }", ctx)
    assert rows(df) == [("Carol",), ("Dave",)]


def test_not_exists(ctx):
    df = execute(PFX + "SELECT ?n WHERE { ?x ex:name ?n FILTER NOT EXISTS { ?x ex:knows ?y } }", ctx)
    assert rows(df) == [("Carol",), ("Dave",)]


def test_bind_expression(ctx):
    df = execute(PFX + 'SELECT ?u WHERE { ?x ex:name ?n BIND(UCASE(?n) AS ?u) FILTER(STRSTARTS(?n, "A")) }', ctx)
    assert rows(df) == [("ALICE",)]


def test_aggregate_group(ctx):
    df = execute(
        PFX + "SELECT ?x (COUNT(*) AS ?n) WHERE { ?x ex:knows ?y } GROUP BY ?x", ctx
    )
    assert rows(df, "x", "n") == [(EX + "alice", "1"), (EX + "bob", "1")]


def test_aggregate_no_groupby(ctx):
    df = execute(PFX + "SELECT (COUNT(*) AS ?n) (SUM(?a) AS ?s) WHERE { ?x ex:age ?a }", ctx)
    assert rows(df, "n", "s") == [("2", "55")]


def test_having(ctx):
    df = execute(
        PFX + "SELECT ?x (COUNT(*) AS ?n) WHERE { ?x ex:name ?m } GROUP BY ?x HAVING (COUNT(*) > 0)", ctx
    )
    assert len(rows(df, "x", "n")) == 4


def test_order_limit_offset(ctx):
    df = execute(PFX + "SELECT ?n WHERE { ?x ex:name ?n } ORDER BY DESC(?n) LIMIT 2 OFFSET 1", ctx)
    # DESC: Dave, Carol, Bob, Alice → offset 1 limit 2 → Carol, Bob
    out = [r[0] for r in flatten(df).collect()]
    assert out == ["Carol", "Bob"]


def test_values(ctx):
    df = execute(PFX + 'SELECT ?x ?n WHERE { VALUES ?n { "Alice" "Bob" } ?x ex:name ?n }', ctx)
    assert rows(df, "n") == [("Alice",), ("Bob",)]


def test_graph_named(ctx):
    df = execute(PFX + "SELECT ?n WHERE { GRAPH <urn:g:other> { ?x ex:name ?n } }", ctx)
    assert rows(df) == [("Dave",)]


def test_graph_var(ctx):
    df = execute(PFX + "SELECT DISTINCT ?g WHERE { GRAPH ?g { ?x ex:name ?n } }", ctx)
    assert rows(df) == [("urn:g:main",), ("urn:g:other",)]


def test_property_path_plus(ctx):
    df = execute(PFX + "SELECT ?y WHERE { ex:alice ex:knows+ ?y }", ctx)
    assert rows(df) == [(EX + "bob",), (EX + "carol",)]


def test_property_path_seq_inverse(ctx):
    df = execute(PFX + "SELECT ?n WHERE { ?y ^ex:knows/ex:name ?n }", ctx)
    # ?y known-by someone; name of that someone
    assert rows(df) == [("Alice",), ("Bob",)]


def test_ask(ctx):
    assert execute(PFX + 'ASK { ?x ex:name "Alice" }', ctx) is True
    assert execute(PFX + 'ASK { ?x ex:name "Nobody" }', ctx) is False


def test_construct(ctx):
    df = execute(
        PFX + "CONSTRUCT { ?y ex:knownBy ?x } WHERE { ?x ex:knows ?y }", ctx
    )
    got = sorted((r["s_lex"], r["pred"], r["o_lex"]) for r in df.collect())
    assert got == [
        (EX + "bob", EX + "knownBy", EX + "alice"),
        (EX + "carol", EX + "knownBy", EX + "bob"),
    ]


def test_describe(ctx):
    df = execute(PFX + "DESCRIBE ex:alice", ctx)
    assert df.count() == 4  # alice's 4 triples


def test_subselect_filter(ctx):
    df = execute(
        PFX
        + """SELECT ?x WHERE {
             { SELECT ?x (COUNT(*) AS ?n) WHERE { ?x ex:knows ?y } GROUP BY ?x }
             FILTER(?n >= 1)
           }""",
        ctx,
    )
    assert rows(df, "x") == [(EX + "alice",), (EX + "bob",)]


def test_in_and_if(ctx):
    df = execute(
        PFX + 'SELECT ?n WHERE { ?x ex:name ?n FILTER(?n IN ("Alice", "Carol")) }', ctx
    )
    assert rows(df) == [("Alice",), ("Carol",)]


def test_group_concat_sorted(ctx):
    df = execute(
        PFX + 'SELECT (GROUP_CONCAT(?n; SEPARATOR=",") AS ?all) WHERE { ?x ex:name ?n }', ctx
    )
    assert rows(df) == [("Alice,Bob,Carol,Dave",)]


# --- dataset-clause exclusivity (§13.2: any FROM/FROM NAMED replaces the
# WHOLE dataset — the unspecified side is EMPTY, not unrestricted) ---------


def test_from_only_empties_named_graphs(ctx):
    df = execute(PFX + "SELECT ?g FROM <urn:g:main> WHERE { GRAPH ?g { ?x ex:name ?n } }", ctx)
    assert df.count() == 0


def test_from_named_only_empties_default_graph(ctx):
    df = execute(PFX + "SELECT ?n FROM NAMED <urn:g:other> WHERE { ?x ex:name ?n }", ctx)
    assert df.count() == 0


def test_from_named_graph_iri_still_matches(ctx):
    df = execute(
        PFX + "SELECT ?n FROM NAMED <urn:g:other> WHERE { GRAPH <urn:g:other> { ?x ex:name ?n } }",
        ctx,
    )
    assert rows(df, "n") == [("Dave",)]


def test_from_both_sides_restrict(ctx):
    df = execute(
        PFX
        + "SELECT ?n FROM <urn:g:main> FROM NAMED <urn:g:other> "
        + "WHERE { ?x ex:name ?n . FILTER NOT EXISTS { GRAPH <urn:g:main> { ?x ex:age ?a } } }",
        ctx,
    )
    # default graph = main only; GRAPH <main> is outside FROM NAMED → the
    # NOT EXISTS probe matches nothing, so every name survives
    assert rows(df, "n") == [("Alice",), ("Bob",), ("Carol",)]


# --- exact-tier guardrails (rdf_dt.ml-style numeric tower, ADVICE r2) ------

XSD_PFX = "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"


def _bind1(ctx, expr):
    df = execute(PFX + XSD_PFX + f"SELECT ?r WHERE {{ BIND({expr} AS ?r) }}", ctx)
    return df.collect()[0]["r"]


def test_dec_sub_scale6_falls_back_to_double(ctx):
    # "0.0000001" does not round-trip through decimal(38,6): the exact tier
    # must DECLINE (double approximation), never silently round to 0
    t = _bind1(ctx, '"0.0000001"^^xsd:decimal + "0"^^xsd:decimal')
    assert t["dtype"].endswith("double")
    assert abs(float(t["lex"]) - 1e-7) < 1e-20


def test_dec_within_scale6_stays_exact(ctx):
    t = _bind1(ctx, '"0.000001"^^xsd:decimal + "0.000001"^^xsd:decimal')
    assert t["dtype"].endswith("decimal")
    assert t["lex"] == "0.000002"


def test_decimal_overflow_demotes_to_double(ctx):
    # decimal(38,6) multiply overflow: must NOT throw (ANSI) nor return an
    # expression error — demote to the double tier like float promotion
    big = '"' + "9" * 30 + '"^^xsd:decimal'
    t = _bind1(ctx, f"{big} * {big}")
    assert t["dtype"].endswith("double")
    assert float(t["lex"]) == pytest.approx(float("9" * 30) ** 2, rel=1e-12)


def test_integer_exact_beyond_double(ctx):
    # 2^53+1 survives the exact tier (would drift through double)
    t = _bind1(ctx, '"9007199254740993"^^xsd:integer + "2"^^xsd:integer')
    assert t["dtype"].endswith("integer")
    assert t["lex"] == "9007199254740995"


# -- expression-level EXISTS / NOT EXISTS (spec §17.4.1.4) -------------------


def test_exists_in_bind(ctx):
    df = execute(
        PFX + "SELECT ?n ?has WHERE { ?x ex:name ?n . "
        "BIND(EXISTS { ?x ex:age ?a } AS ?has) }",
        ctx,
    )
    assert rows(df, "n", "has") == [
        ("Alice", "true"), ("Bob", "true"), ("Carol", "false"), ("Dave", "false"),
    ]


def test_exists_in_filter_disjunction(ctx):
    # EXISTS as one arm of || — not expressible as a top-level semi join
    df = execute(
        PFX + 'SELECT ?n WHERE { ?x ex:name ?n . '
        'FILTER(NOT EXISTS { ?x ex:age ?a } || ?n = "Alice") }',
        ctx,
    )
    assert rows(df) == [("Alice",), ("Carol",), ("Dave",)]


def test_exists_in_if(ctx):
    df = execute(
        PFX + 'SELECT ?n ?t WHERE { ?x ex:name ?n . '
        'BIND(IF(EXISTS { ?x ex:knows ?y }, "social", "loner") AS ?t) }',
        ctx,
    )
    assert rows(df, "n", "t") == [
        ("Alice", "social"), ("Bob", "social"), ("Carol", "loner"), ("Dave", "loner"),
    ]


def test_exists_uncorrelated_expr(ctx):
    # no shared vars: one flag for the whole multiset
    df = execute(
        PFX + 'SELECT ?n WHERE { ?x ex:name ?n . '
        'FILTER(EXISTS { ?q ex:name "NoSuch" } || ?n = "Bob") }',
        ctx,
    )
    assert rows(df) == [("Bob",)]


def test_exists_expr_rejected_in_select(ctx):
    import pytest as _pytest

    with _pytest.raises(SyntaxError):
        parse_query(
            PFX + "SELECT (EXISTS { ?x ex:age ?a } AS ?b) WHERE { ?x ex:name ?n }"
        )


def test_exists_marker_not_in_result(ctx):
    df = execute(
        PFX + 'SELECT * WHERE { ?x ex:name ?n . '
        'FILTER(EXISTS { ?x ex:age ?a } || ?n = "Carol") }',
        ctx,
    )
    assert not [c for c in df.columns if c.startswith("__ex")]


# -- pattern blank nodes are non-distinguished variables (§4.1.4) ------------


def test_bnode_property_list_matches(ctx):
    df = execute(PFX + "SELECT ?n WHERE { [ ex:name ?n ; ex:age ?a ] }", ctx)
    assert rows(df) == [("Alice",), ("Bob",)]


def test_labeled_pattern_bnode_is_var(ctx):
    # _:w must NOT probe stored bnodes by label — it binds like a var
    df = execute(PFX + "SELECT ?n WHERE { _:w ex:knows ?y . _:w ex:name ?n }", ctx)
    assert rows(df) == [("Alice",), ("Bob",)]


def test_select_star_hides_pattern_bnodes(ctx):
    df = execute(PFX + "SELECT * WHERE { [ ex:name ?n ] }", ctx)
    assert df.columns == ["n"]


# ---------------------------------------------------------------------------
# 3VL corners of the raw-boolean (bfn) EBV path (§17.2.2, §17.4.1.5-6):
# SPARQL's error-tolerant logical table must survive the ebv(t_bool(c)) ≡ c
# shortcut — errors are NULL booleans end-to-end
# ---------------------------------------------------------------------------


def test_or_error_true_is_true(ctx):
    """error || true = true: Carol has no age, so ?a > 27 errors, but the
    second disjunct rescues her row."""
    df = execute(
        PFX + 'SELECT ?n WHERE { ?x ex:name ?n OPTIONAL { ?x ex:age ?a } FILTER(?a > 27 || ?n = "Carol") }',
        ctx,
    )
    assert rows(df) == [("Alice",), ("Carol",)]


def test_or_error_false_is_error(ctx):
    """error || false = error → row dropped (Carol/Dave have no age)."""
    df = execute(
        PFX + 'SELECT ?n WHERE { ?x ex:name ?n OPTIONAL { ?x ex:age ?a } FILTER(?a > 27 || ?n = "nobody") }',
        ctx,
    )
    assert rows(df) == [("Alice",)]


def test_and_false_error_is_false(ctx):
    """false && error = false (not error): all rows dropped either way,
    so probe the complement: !(?n = \"Alice\" && ?a > 0) keeps Carol —
    false && error = false, negated true."""
    df = execute(
        PFX + 'SELECT ?n WHERE { ?x ex:name ?n OPTIONAL { ?x ex:age ?a } '
        'FILTER(!(?n = "Alice" && ?a > 0) && ?n != "Dave") }',
        ctx,
    )
    # Carol: (false && error)=false, !false=true, true && true = true ✓
    # Bob: (false && true)=false → true ✓; Alice: (true && true) → false ✗
    assert rows(df) == [("Bob",), ("Carol",)]


def test_and_true_error_is_error(ctx):
    """true && error = error → dropped (Carol: name matches, age errors)."""
    df = execute(
        PFX + 'SELECT ?n WHERE { ?x ex:name ?n OPTIONAL { ?x ex:age ?a } FILTER(?n = "Carol" && ?a > 0) }',
        ctx,
    )
    assert rows(df) == []


def test_not_error_is_error(ctx):
    """!error = error → dropped, not flipped to true."""
    df = execute(
        PFX + "SELECT ?n WHERE { ?x ex:name ?n OPTIONAL { ?x ex:age ?a } FILTER(!(?a > 27)) }",
        ctx,
    )
    assert rows(df) == [("Bob",)]


def test_if_error_condition_is_error(ctx):
    """§17.4.1.2: IF(error, t, e) = error — BIND leaves the var unbound,
    it must NOT take the else branch."""
    df = execute(
        PFX + 'SELECT ?n ?tag WHERE { ?x ex:name ?n OPTIONAL { ?x ex:age ?a } '
        'BIND(IF(?a > 27, "old", "young") AS ?tag) }',
        ctx,
    )
    assert rows(df, "n", "tag") == [
        ("Alice", "old"),
        ("Bob", "young"),
        ("Carol", None),
        ("Dave", None),
    ]


def test_ebv_invalid_boolean_lexical_is_false(ctx, spark):
    """§17.2.2: an xsd:boolean with an ill-formed lexical EBVs to false
    (not error) — data-path booleans take the full-ebv branch, not bfn."""
    rows_ = [
        triple_row(Iri(EX + "s1"), Iri(EX + "flag"), Literal("true", dtype="http://www.w3.org/2001/XMLSchema#boolean"), graph="urn:g:main"),
        triple_row(Iri(EX + "s2"), Iri(EX + "flag"), Literal("maybe", dtype="http://www.w3.org/2001/XMLSchema#boolean"), graph="urn:g:main"),
    ]
    c2 = Ctx(spark.createDataFrame(rows_, schema=TRIPLES_SCHEMA))
    df = execute(PFX + "SELECT ?s WHERE { ?s ex:flag ?f FILTER(?f) }", c2)
    got = rows(df)
    assert got == [(EX + "s1",)]
    # and the negation: EBV false (not error) ⇒ !false = true keeps s2
    df2 = execute(PFX + "SELECT ?s WHERE { ?s ex:flag ?f FILTER(!?f) }", c2)
    assert rows(df2) == [(EX + "s2",)]


def test_trailing_values_clause(ctx):
    # grammar [28] ValuesClause: textually after the solution modifiers,
    # algebraically joined after HAVING (§18.2.4.3) — filters + extends
    df = execute(
        PFX
        + """SELECT ?n ?tag WHERE { ?x ex:name ?n }
             VALUES (?n ?tag) { ("Alice" "seen") ("Carol" UNDEF) }""",
        ctx,
    )
    assert rows(df, "n", "tag") == [("Alice", "seen"), ("Carol", None)]


def test_trailing_values_after_order_limit(ctx):
    df = execute(
        PFX
        + """SELECT ?n WHERE { ?x ex:name ?n }
             ORDER BY ?n LIMIT 10
             VALUES ?n { "Bob" "Dave" "Nobody" }""",
        ctx,
    )
    assert rows(df, "n") == [("Bob",), ("Dave",)]


def test_a_keyword_in_path(ctx):
    # 'a' (rdf:type) as a path step and with modifiers — grammar PathPrimary
    df = execute(PFX + "SELECT ?n WHERE { ?x a/^a ?y . ?y ex:name ?n . FILTER(?x = ex:alice) }", ctx)
    assert rows(df, "n") == [("Alice",), ("Bob",)]
    df2 = execute(PFX + "SELECT ?t WHERE { ?x ex:knows/a ?t }", ctx)
    assert rows(df2, "t") == [(EX + "Person",)]


def test_describe_cbd_cycle_and_bounds(spark):
    """CBD: bnode cycles terminate; IRI objects are never followed;
    shared bnodes come back once."""
    from ocaml_rdf_spark.algebra import Ctx, describe
    from ocaml_rdf_spark.types import Iri

    rows = [
        # seed -> bnode cycle a <-> b, each with a literal leaf
        (0, "urn:s", "urn:p", 1, "a", None, None, "g"),
        (1, "a", "urn:p", 1, "b", None, None, "g"),
        (1, "b", "urn:p", 1, "a", None, None, "g"),
        (1, "a", "urn:leaf", 2, "la", None, None, "g"),
        (1, "b", "urn:leaf", 2, "lb", None, None, "g"),
        # IRI object: must NOT be followed
        (0, "urn:s", "urn:q", 0, "urn:other", None, None, "g"),
        (0, "urn:other", "urn:leaf", 2, "nope", None, None, "g"),
    ]
    df = spark.createDataFrame(
        rows,
        "s_kind int, s_lex string, pred string, o_kind int, o_lex string,"
        " o_dtype string, o_lang string, graph string",
    )
    out = describe([Iri("urn:s")], Ctx(df), cbd=True)
    got = {(r["s_lex"], r["pred"], r["o_lex"]) for r in out.collect()}
    assert ("urn:s", "urn:p", "a") in got
    assert ("a", "urn:p", "b") in got and ("b", "urn:p", "a") in got
    assert ("a", "urn:leaf", "la") in got and ("b", "urn:leaf", "lb") in got
    assert ("urn:s", "urn:q", "urn:other") in got
    assert ("urn:other", "urn:leaf", "nope") not in got
    assert len(got) == 6
    # naive mode unchanged: only direct triples
    naive = describe([Iri("urn:s")], Ctx(df))
    assert naive.count() == 2


def test_now_constant_within_query_uuid_unique_per_solution(spark):
    """§17.4.5.1: NOW() returns the SAME value for every solution of one
    query execution (Spark's current_timestamp is query-constant, which
    realizes exactly this); UUID()/STRUUID() must differ per solution."""
    from ocaml_rdf_spark.graph import Graph
    from ocaml_rdf_spark.sparql import execute
    from ocaml_rdf_spark.types import Iri, Literal

    g = Graph.from_triples(
        spark, [(Iri(f"urn:s{i}"), Iri("urn:p"), Literal(str(i))) for i in range(6)]
    )
    from ocaml_rdf_spark.algebra import Ctx

    rows = execute(
        "SELECT ?o ?t ?u WHERE { ?s <urn:p> ?o BIND(NOW() AS ?t) BIND(STRUUID() AS ?u) }",
        Ctx(g.df),
    ).collect()
    assert len(rows) == 6
    ts = {r["t"]["lex"] for r in rows}
    assert len(ts) == 1, f"NOW() must be query-constant, got {ts}"
    us = [r["u"]["lex"] for r in rows]
    assert len(set(us)) == 6, "STRUUID() must be fresh per solution"
    import re
    assert all(re.fullmatch(r"[0-9a-f-]{36}", u) for u in us)


# --------------------------------------------------------------------------
# SPARQL 1.2 LATERAL (SEP-0006)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def lat_ctx(spark):
    t = []
    for g, members in (("g1", ["ann", "bob", "cat"]), ("g2", ["dan", "eve"])):
        for m in members:
            t.append((Iri(EX + m), Iri(EX + "inGroup"), Iri(EX + g)))
            t.append((Iri(EX + m), Iri(EX + "name"), Literal(m.title())))
    rows_ = [triple_row(s, p, o, graph="urn:g:main") for s, p, o in t]
    df = spark.createDataFrame(rows_, schema=TRIPLES_SCHEMA)
    return Ctx(df)


def test_lateral_top1_per_binding(lat_ctx):
    df = execute(PFX + """SELECT ?g ?n WHERE {
        ?m0 ex:inGroup ?g .
        LATERAL {
          SELECT ?n WHERE { ?m ex:inGroup ?g ; ex:name ?n . }
          ORDER BY ?n LIMIT 1
        }
    }""", lat_ctx)
    # every member row of a group pairs with that group's FIRST name
    assert rows(df, "g", "n") == [
        (EX + "g1", "Ann")] * 3 + [(EX + "g2", "Dan")] * 2


def test_lateral_desc_limit2_distinct_outer(lat_ctx):
    df = execute(PFX + """SELECT DISTINCT ?g ?n WHERE {
        ?m0 ex:inGroup ?g .
        LATERAL {
          SELECT ?n WHERE { ?m ex:inGroup ?g ; ex:name ?n . }
          ORDER BY DESC(?n) LIMIT 2
        }
    }""", lat_ctx)
    assert rows(df, "g", "n") == [
        (EX + "g1", "Bob"), (EX + "g1", "Cat"),
        (EX + "g2", "Dan"), (EX + "g2", "Eve"),
    ]


def test_lateral_offset(lat_ctx):
    df = execute(PFX + """SELECT DISTINCT ?g ?n WHERE {
        ?m0 ex:inGroup ?g .
        LATERAL {
          SELECT ?n WHERE { ?m ex:inGroup ?g ; ex:name ?n . }
          ORDER BY ?n OFFSET 1 LIMIT 1
        }
    }""", lat_ctx)
    assert rows(df, "g", "n") == [(EX + "g1", "Bob"), (EX + "g2", "Eve")]


def test_lateral_plain_group_is_join(lat_ctx):
    df = execute(PFX + """SELECT ?m ?n WHERE {
        ?m ex:inGroup ?g .
        LATERAL { ?m ex:name ?n . }
    }""", lat_ctx)
    assert rows(df, "n") == [("Ann",), ("Bob",), ("Cat",), ("Dan",), ("Eve",)]


def test_lateral_limit_without_order_is_deterministic(lat_ctx, spark):
    q = PFX + """SELECT DISTINCT ?g ?n WHERE {
        ?m0 ex:inGroup ?g .
        LATERAL { SELECT ?n WHERE { ?m ex:inGroup ?g ; ex:name ?n . } LIMIT 2 }
    }"""
    a = rows(execute(q, lat_ctx), "g", "n")
    b = rows(execute(q, lat_ctx), "g", "n")
    assert a == b
    assert len([r for r in a if r[0] == EX + "g1"]) == 2
    assert len([r for r in a if r[0] == EX + "g2"]) == 2
