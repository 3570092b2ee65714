"""SPARQL 1.1 UPDATE over the functional quad store (sparql.execute_update).

Engine addition: the fork-era reference is query-only (SURVEY §8), so these
tests encode the W3C SPARQL 1.1 Update semantics directly — INSERT DATA is
a set insert, DELETE DATA removes exactly the named triple (null-safe on
dtype/lang like Graph.rem_triple), DELETE/INSERT WHERE computes both
template sets against the pre-update store, CLEAR slices by graph.
"""

from __future__ import annotations

import pytest

from ocaml_rdf_spark.graph import Graph
from ocaml_rdf_spark.sparql import execute_update
from ocaml_rdf_spark.types import DEFAULT_GRAPH, Iri, Literal


EX = "http://ex.org/"


@pytest.fixture(scope="module")
def g(spark):
    triples = [
        (Iri(EX + "a"), Iri(EX + "name"), Literal("Alice")),
        (Iri(EX + "a"), Iri(EX + "age"), Literal("30", dtype="http://www.w3.org/2001/XMLSchema#integer")),
        (Iri(EX + "b"), Iri(EX + "name"), Literal("Bob")),
        (Iri(EX + "b"), Iri(EX + "name"), Literal("Bob", lang="en")),
    ]
    return Graph.from_triples(spark, triples, name=DEFAULT_GRAPH)


def _spo(df):
    return {
        (r["s_lex"], r["pred"], r["o_lex"], r["o_dtype"], r["o_lang"], r["graph"])
        for r in df.select("s_lex", "pred", "o_lex", "o_dtype", "o_lang", "graph").collect()
    }


def test_insert_data_set_semantics(g):
    out = execute_update(
        f'INSERT DATA {{ <{EX}c> <{EX}name> "Carol" . <{EX}a> <{EX}name> "Alice" }}',
        g.df,
    )
    rows = _spo(out)
    assert (EX + "c", EX + "name", "Carol", "http://www.w3.org/2001/XMLSchema#string", None, DEFAULT_GRAPH) in rows
    # duplicate insert is a no-op (set semantics)
    assert len(rows) == 5


def test_delete_data_null_safe_twins(g):
    # removing the lang-tagged "Bob"@en must NOT remove plain "Bob"
    out = execute_update(f'DELETE DATA {{ <{EX}b> <{EX}name> "Bob"@en }}', g.df)
    rows = _spo(out)
    lexes = {(r[0], r[2], r[4]) for r in rows}
    assert (EX + "b", "Bob", None) in lexes
    assert (EX + "b", "Bob", "en") not in lexes
    assert len(rows) == 3


def test_delete_where(g):
    out = execute_update(f"DELETE WHERE {{ ?s <{EX}name> ?n }}", g.df)
    rows = _spo(out)
    assert len(rows) == 1  # only the age triple survives
    assert next(iter(rows))[1] == EX + "age"


def test_delete_insert_where(g):
    out = execute_update(
        f"""
        DELETE {{ ?s <{EX}name> ?n }}
        INSERT {{ ?s <{EX}label> ?n }}
        WHERE {{ ?s <{EX}name> ?n . FILTER(LANG(?n) = "") }}
        """,
        g.df,
    )
    rows = _spo(out)
    preds = sorted(r[1] for r in rows)
    # plain-literal names renamed to label; "Bob"@en untouched
    assert preds == [EX + "age", EX + "label", EX + "label", EX + "name"]


def test_insert_graph_template_and_clear(g):
    upd = f"""
    INSERT {{ GRAPH <urn:g:copy> {{ ?s <{EX}name> ?n }} }}
    WHERE {{ ?s <{EX}name> ?n }} ;
    CLEAR DEFAULT
    """
    out = execute_update(upd, g.df)
    rows = _spo(out)
    assert rows and all(r[5] == "urn:g:copy" for r in rows)
    assert len(rows) == 3


def test_clear_graph_and_all(g):
    out = execute_update("CLEAR GRAPH <urn:g:nope>", g.df)
    assert out.count() == 4  # clearing an absent graph removes nothing
    out = execute_update("CLEAR ALL", g.df)
    assert out.count() == 0


def test_with_graph_routing(g, spark):
    out = execute_update(
        f'WITH <urn:g:w> INSERT DATA {{ <{EX}x> <{EX}p> "v" }}', g.df
    )
    assert out.filter(out.graph == "urn:g:w").count() == 1


def test_sequence_of_operations(g):
    out = execute_update(
        f"""
        INSERT DATA {{ <{EX}c> <{EX}name> "Carol" }} ;
        DELETE WHERE {{ <{EX}a> ?p ?o }} ;
        CREATE GRAPH <urn:g:new>
        """,
        g.df,
    )
    rows = _spo(out)
    assert not any(r[0] == EX + "a" for r in rows)
    assert any(r[0] == EX + "c" for r in rows)


def test_vars_in_data_rejected(g):
    with pytest.raises(SyntaxError):
        execute_update(f"INSERT DATA {{ ?s <{EX}p> 1 }}", g.df)


def test_empty_update_rejected(g):
    with pytest.raises(SyntaxError):
        execute_update("", g.df)


def test_using_overrides_with_for_where(g, spark):
    """USING <g2> makes WHERE match only g2 while templates still route to
    the WITH graph (Update spec 3.1.3)."""
    from ocaml_rdf_spark.sparql import execute_update

    seeded = execute_update(
        f'INSERT DATA {{ GRAPH <urn:g:src> {{ <{EX}z> <{EX}name> "Zed" }} }}', g.df
    )
    out = execute_update(
        f"""
        WITH <urn:g:dst>
        INSERT {{ ?s <{EX}label> ?n }}
        USING <urn:g:src>
        WHERE {{ ?s <{EX}name> ?n }}
        """,
        seeded,
    )
    added = out.filter(out.graph == "urn:g:dst")
    rows = {(r["s_lex"], r["pred"], r["o_lex"]) for r in added.collect()}
    # only the urn:g:src triple matched WHERE (not the 4 default-graph ones)
    assert rows == {(EX + "z", EX + "label", "Zed")}


def test_update_model_based_random_sequences(g, spark):
    """Model-based check: random INSERT DATA / DELETE DATA / DELETE WHERE
    sequences applied both to the DataFrame executor and to a pure-Python
    quad-set model must agree exactly (set semantics end-to-end)."""
    import random

    from ocaml_rdf_spark.types import DEFAULT_GRAPH

    rng = random.Random(20260817)
    subs = [f"{EX}s{i}" for i in range(4)]
    preds = [f"{EX}p{i}" for i in range(3)]

    def lit(i):
        return f'"v{i}"'

    # model: set of (s, p, lex)
    model = set()
    ops = []
    for _ in range(12):
        kind = rng.choice(["ins", "del", "delw"])
        s, p, i = rng.choice(subs), rng.choice(preds), rng.randrange(4)
        if kind == "ins":
            ops.append(f"INSERT DATA {{ <{s}> <{p}> {lit(i)} }}")
            model.add((s, p, f"v{i}"))
        elif kind == "del":
            ops.append(f"DELETE DATA {{ <{s}> <{p}> {lit(i)} }}")
            model.discard((s, p, f"v{i}"))
        else:
            ops.append(f"DELETE WHERE {{ <{s}> <{p}> ?o }}")
            model = {t for t in model if not (t[0] == s and t[1] == p)}

    from ocaml_rdf_spark.graph import Graph

    empty = Graph.empty(spark)
    out = execute_update(" ;\n".join(ops), empty.df)
    got = {(r["s_lex"], r["pred"], r["o_lex"]) for r in out.collect()}
    assert got == model, f"\nops:\n" + "\n".join(ops)


# --- blank-node rules (Update spec §3.1.1 / grammar) -----------------------


def test_bnodes_rejected_in_delete_data(g):
    with pytest.raises(SyntaxError):
        execute_update('DELETE DATA { _:b <http://ex.org/p> "v" }', g.df)


def test_bnodes_rejected_in_delete_template(g):
    with pytest.raises(SyntaxError):
        execute_update(
            "DELETE { _:b <http://ex.org/p> ?o } WHERE { ?s <http://ex.org/p> ?o }", g.df
        )


def test_bnodes_rejected_in_delete_where(g):
    with pytest.raises(SyntaxError):
        execute_update("DELETE WHERE { _:b <http://ex.org/p> ?o }", g.df)


def test_insert_data_bnodes_fresh_per_request(g, spark):
    """INSERT DATA bnode labels are request-scoped: the same label inserted
    twice mints two distinct store bnodes, and neither is the raw label."""
    from ocaml_rdf_spark.graph import Graph

    df = Graph.empty(spark).df
    df = execute_update('INSERT DATA { _:x <http://ex.org/p> "v" }', df)
    df = execute_update('INSERT DATA { _:x <http://ex.org/p> "v" }', df)
    subs = [r["s_lex"] for r in df.select("s_lex").collect()]
    assert len(subs) == 2 and len(set(subs)) == 2
    assert all(s != "x" for s in subs)


def test_insert_template_bnodes_fresh_per_request(g, spark):
    """Re-running the same INSERT…WHERE mints NEW bnodes each request."""
    from ocaml_rdf_spark.graph import Graph
    from ocaml_rdf_spark.types import TRIPLES_SCHEMA, triple_row

    base = spark.createDataFrame(
        [triple_row(Iri(EX + "s"), Iri(EX + "p"), Literal("v"), graph=DEFAULT_GRAPH)],
        schema=TRIPLES_SCHEMA,
    )
    upd = "INSERT { ?s <http://ex.org/tag> _:t } WHERE { ?s <http://ex.org/p> ?o }"
    df = execute_update(upd, base)
    df = execute_update(upd, df)
    tags = [r["o_lex"] for r in df.filter("pred = 'http://ex.org/tag'").collect()]
    assert len(tags) == 2 and len(set(tags)) == 2


def test_using_only_empties_named_side(g, spark):
    """USING-only WHERE dataset: GRAPH ?g matches nothing (Update §3.1.3,
    same exclusivity as FROM/FROM NAMED)."""
    from ocaml_rdf_spark.graph import Graph
    from ocaml_rdf_spark.types import TRIPLES_SCHEMA, triple_row

    base = spark.createDataFrame(
        [triple_row(Iri(EX + "s"), Iri(EX + "p"), Literal("v"), graph="urn:g:a")],
        schema=TRIPLES_SCHEMA,
    )
    out = execute_update(
        "DELETE { GRAPH <urn:g:a> { ?s ?p ?o } } USING <urn:g:a> WHERE { GRAPH ?g { ?s ?p ?o } }",
        base,
    )
    assert out.count() == 1  # nothing matched, nothing deleted


# --- graph management: COPY / MOVE / ADD (Update spec §3.2.3–3.2.5) --------


@pytest.fixture()
def gm(spark):
    from ocaml_rdf_spark.types import TRIPLES_SCHEMA, triple_row

    rows = [
        triple_row(Iri(EX + "a"), Iri(EX + "p"), Literal("1"), graph=DEFAULT_GRAPH),
        triple_row(Iri(EX + "b"), Iri(EX + "p"), Literal("2"), graph="urn:g:one"),
        triple_row(Iri(EX + "c"), Iri(EX + "p"), Literal("3"), graph="urn:g:two"),
    ]
    return spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)


def _by_graph(df):
    out = {}
    for r in df.select("s_lex", "graph").collect():
        out.setdefault(r["graph"], set()).add(r["s_lex"])
    return out


def test_copy_replaces_destination(gm):
    out = execute_update("COPY <urn:g:one> TO <urn:g:two>", gm)
    g = _by_graph(out)
    assert g["urn:g:two"] == {EX + "b"}  # dst emptied, src copied
    assert g["urn:g:one"] == {EX + "b"}  # src intact


def test_move_drops_source(gm):
    out = execute_update("MOVE <urn:g:one> TO <urn:g:two>", gm)
    g = _by_graph(out)
    assert g["urn:g:two"] == {EX + "b"}
    assert "urn:g:one" not in g


def test_add_unions_set_semantics(gm):
    out = execute_update("ADD <urn:g:one> TO <urn:g:two> ; ADD <urn:g:one> TO <urn:g:two>", gm)
    g = _by_graph(out)
    assert g["urn:g:two"] == {EX + "b", EX + "c"}
    assert g["urn:g:one"] == {EX + "b"}
    assert out.count() == 4  # idempotent re-ADD (set semantics)


def test_copy_default_roundtrip(gm):
    out = execute_update("COPY DEFAULT TO GRAPH <urn:g:three> ; MOVE GRAPH <urn:g:three> TO DEFAULT", gm)
    g = _by_graph(out)
    assert g[DEFAULT_GRAPH] == {EX + "a"}
    assert "urn:g:three" not in g


def test_copy_to_self_noop(gm):
    out = execute_update("COPY <urn:g:one> TO <urn:g:one>", gm)
    assert out.count() == 3


# --- LOAD (§3.1.4 — local file:// documents; no network) -------------------


def test_load_ntriples_into_graph(gm, tmp_path):
    doc = tmp_path / "d.nt"
    doc.write_text('<http://ex.org/x> <http://ex.org/p> "lx" .\n')
    out = execute_update(f"LOAD <file://{doc}> INTO GRAPH <urn:g:ld>", gm)
    g = _by_graph(out)
    assert g["urn:g:ld"] == {EX + "x"}


def test_load_turtle_default_graph(gm, tmp_path):
    doc = tmp_path / "d.ttl"
    doc.write_text('@prefix ex: <http://ex.org/> . ex:y ex:p "ly" .\n')
    out = execute_update(f"LOAD <file://{doc}>", gm)
    g = _by_graph(out)
    assert EX + "y" in g[DEFAULT_GRAPH]


def test_load_http_raises_silent_noop(gm):
    with pytest.raises(Exception):
        execute_update("LOAD <http://example.org/remote.nt>", gm)
    out = execute_update("LOAD SILENT <http://example.org/remote.nt>", gm)
    assert out.count() == 3  # SILENT: failure is a no-op


def test_graph_var_template(spark):
    # GRAPH ?g in modify templates: instantiated per solution, so the
    # rewrite stays inside each source graph (copy name->label per graph)
    triples = [(Iri(EX + "x"), Iri(EX + "name"), Literal("X"))]
    g1 = Graph.from_triples(spark, triples, name="urn:g:one").df
    g2 = Graph.from_triples(spark, [(Iri(EX + "y"), Iri(EX + "name"), Literal("Y"))], name="urn:g:two").df
    store = g1.unionByName(g2)
    out = execute_update(
        f"INSERT {{ GRAPH ?g {{ ?s <{EX}label> ?n }} }} WHERE {{ GRAPH ?g {{ ?s <{EX}name> ?n }} }}",
        store,
    )
    rows = _spo(out)
    assert (EX + "x", EX + "label", "X", "http://www.w3.org/2001/XMLSchema#string", None, "urn:g:one") in rows
    assert (EX + "y", EX + "label", "Y", "http://www.w3.org/2001/XMLSchema#string", None, "urn:g:two") in rows
    assert len(rows) == 4


def test_graph_var_delete_template(spark):
    store = Graph.from_triples(
        spark,
        [(Iri(EX + "x"), Iri(EX + "name"), Literal("X")),
         (Iri(EX + "x"), Iri(EX + "age"), Literal("1"))],
        name="urn:g:one",
    ).df
    out = execute_update(
        f"DELETE {{ GRAPH ?g {{ ?s <{EX}name> ?n }} }} WHERE {{ GRAPH ?g {{ ?s <{EX}name> ?n }} }}",
        store,
    )
    rows = _spo(out)
    assert len(rows) == 1 and next(iter(rows))[1] == EX + "age"


def test_graph_var_in_data_rejected(g):
    with pytest.raises(SyntaxError):
        execute_update(f'INSERT DATA {{ GRAPH ?g {{ <{EX}c> <{EX}p> "v" }} }}', g.df)
