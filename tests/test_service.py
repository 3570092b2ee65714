"""SERVICE [SILENT] execution against the in-process endpoint registry
(Ctx.services — algebra.ServiceNode). The reference leaves SERVICE
unimplemented (rdf_sparql_eval.ml raises, SURVEY §2.3); this suite pins
the Federated Query §2.2-2.4 semantics of the registry-backed version."""

from __future__ import annotations

import pytest

from ocaml_rdf_spark.algebra import Ctx, flatten
from ocaml_rdf_spark.sparql import execute
from ocaml_rdf_spark.types import TRIPLES_SCHEMA, Iri, Literal, triple_row

EX = "http://ex.org/"
PFX = f"PREFIX ex: <{EX}>\n"
EP_A = "http://svc.example/a"
EP_B = "http://svc.example/b"


def tdf(spark, triples, graph="urn:g:default"):
    rows = [triple_row(s, p, o, graph=graph) for s, p, o in triples]
    return spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)


@pytest.fixture(scope="module")
def ctx(spark):
    local = tdf(
        spark,
        [
            (Iri(EX + "alice"), Iri(EX + "name"), Literal("Alice")),
            (Iri(EX + "bob"), Iri(EX + "name"), Literal("Bob")),
            (Iri(EX + "carol"), Iri(EX + "name"), Literal("Carol")),
        ],
    )
    svc_a = tdf(
        spark,
        [
            (Iri(EX + "alice"), Iri(EX + "mbox"), Literal("alice@a.example")),
            (Iri(EX + "bob"), Iri(EX + "mbox"), Literal("bob@a.example")),
        ],
    )
    svc_b = tdf(spark, [(Iri(EX + "carol"), Iri(EX + "mbox"), Literal("carol@b.example"))])
    return Ctx(local, services={EP_A: svc_a, EP_B: svc_b})


def rows(df, *cols):
    out = flatten(df)
    if cols:
        out = out.select(*cols)
    return sorted(tuple(r) for r in out.collect())


def test_service_join(ctx):
    df = execute(
        PFX
        + f"SELECT ?n ?m WHERE {{ ?x ex:name ?n SERVICE <{EP_A}> {{ ?x ex:mbox ?m }} }}",
        ctx,
    )
    assert rows(df, "n", "m") == [("Alice", "alice@a.example"), ("Bob", "bob@a.example")]


def test_service_unknown_endpoint_errors(ctx):
    with pytest.raises(ValueError):
        execute(
            PFX + "SELECT * WHERE { SERVICE <http://svc.example/nope> { ?s ?p ?o } }", ctx
        ).collect()


def test_service_silent_unknown_is_identity(ctx):
    # SILENT on an unknown endpoint yields the single empty solution — the
    # join identity — so the outer pattern's solutions pass through intact.
    df = execute(
        PFX
        + "SELECT ?n WHERE { ?x ex:name ?n SERVICE SILENT <http://svc.example/nope> { ?x ex:mbox ?m } }",
        ctx,
    )
    assert rows(df, "n") == [("Alice",), ("Bob",), ("Carol",)]


def test_service_var_endpoint_unions_registry(ctx):
    df = execute(
        PFX + "SELECT ?ep ?x ?m WHERE { SERVICE ?ep { ?x ex:mbox ?m } }",
        ctx,
    )
    assert rows(df, "ep", "m") == [
        (EP_A, "alice@a.example"),
        (EP_A, "bob@a.example"),
        (EP_B, "carol@b.example"),
    ]


def test_service_var_join_with_local(ctx):
    df = execute(
        PFX + "SELECT ?n ?ep WHERE { ?x ex:name ?n SERVICE ?ep { ?x ex:mbox ?m } }",
        ctx,
    )
    assert rows(df, "n", "ep") == [("Alice", EP_A), ("Bob", EP_A), ("Carol", EP_B)]


def test_service_dataset_isolation(spark):
    # the outer FROM restriction must NOT leak into the service's dataset,
    # and services must survive the dataset-clause ctx rebuild
    local = tdf(spark, [(Iri(EX + "s"), Iri(EX + "p"), Literal("in-g"))], graph="urn:g:one")
    svc = tdf(spark, [(Iri(EX + "s"), Iri(EX + "q"), Literal("remote"))], graph="urn:g:svc")
    ctx = Ctx(local, services={EP_A: svc})
    df = execute(
        PFX
        + f"SELECT ?v ?w FROM <urn:g:one> WHERE {{ ?s ex:p ?v SERVICE <{EP_A}> {{ ?s ex:q ?w }} }}",
        ctx,
    )
    assert rows(df, "v", "w") == [("in-g", "remote")]


def test_service_inside_optional(ctx):
    """Federated Query §2.2 composition corner: SERVICE under OPTIONAL —
    matched rows extend with the remote binding, unmatched rows survive
    with ?m unbound (r5, VERDICT r4 task 5 class)."""
    df = execute(
        PFX
        + f"SELECT ?n ?m WHERE {{ ?x ex:name ?n OPTIONAL {{ SERVICE <{EP_A}> {{ ?x ex:mbox ?m }} }} }}",
        ctx,
    )
    assert rows(df, "n", "m") == [
        ("Alice", "alice@a.example"),
        ("Bob", "bob@a.example"),
        ("Carol", None),
    ]


def test_service_silent_unknown_inside_optional(ctx):
    """SERVICE SILENT at an unknown endpoint inside OPTIONAL: the silent
    empty-solution fallback joins neutrally — every name survives, ?m
    stays unbound everywhere."""
    df = execute(
        PFX
        + "SELECT ?n ?m WHERE { ?x ex:name ?n OPTIONAL { SERVICE SILENT <http://svc.example/nope> { ?x ex:mbox ?m } } }",
        ctx,
    )
    assert rows(df, "n", "m") == [("Alice", None), ("Bob", None), ("Carol", None)]
