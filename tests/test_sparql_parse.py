"""SPARQL text-front-end parse tests (structure only — no Spark).
End-to-end execution parity is in test_sparql_exec.py."""

from __future__ import annotations

import pytest

from ocaml_rdf_spark import algebra as A
from ocaml_rdf_spark.operators import paths as P
from ocaml_rdf_spark.sparql import parse_query
from ocaml_rdf_spark.types import RDF_TYPE, Iri, Literal

PFX = "PREFIX ex: <http://ex.org/> PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"


def unwrap(node, *types):
    """Walk down through the given wrapper types, returning the first node
    that isn't one of them."""
    while isinstance(node, types):
        node = node.child if hasattr(node, "child") else node
    return node


def test_select_bgp_shapes():
    q = parse_query(PFX + "SELECT ?n ?m WHERE { ?x a ex:T ; ex:name ?n . ?x ex:knows ?y . ?y ex:name ?m }")
    assert q.form == "select" and q.projection == ["n", "m"]
    proj = q.node
    assert isinstance(proj, A.Project)
    bgp = proj.child
    assert isinstance(bgp, A.BGP)
    assert len(bgp.patterns) == 4
    assert bgp.patterns[0].p == Iri(RDF_TYPE)
    assert bgp.patterns[0].o == Iri("http://ex.org/T")


def test_prefix_and_literal_forms():
    q = parse_query(
        PFX + 'SELECT * WHERE { ?s ex:p "plain" ; ex:q "tagged"@en-US ; ex:r "5"^^xsd:integer ; ex:n 42 ; ex:d 3.14 ; ex:b true }'
    )
    bgp = q.node
    assert isinstance(bgp, A.BGP)
    objs = [tp.o for tp in bgp.patterns]
    assert Literal("plain") in objs
    assert Literal("tagged", lang="en-us") in objs
    assert Literal("5", dtype="http://www.w3.org/2001/XMLSchema#integer") in objs
    assert Literal("42", dtype="http://www.w3.org/2001/XMLSchema#integer") in objs
    assert Literal("3.14", dtype="http://www.w3.org/2001/XMLSchema#decimal") in objs
    assert Literal("true", dtype="http://www.w3.org/2001/XMLSchema#boolean") in objs


def test_optional_filter_hoisted_into_leftjoin():
    q = parse_query(PFX + "SELECT * WHERE { ?x ex:name ?n OPTIONAL { ?x ex:age ?a FILTER(?a > 18) } }")
    lj = q.node
    assert isinstance(lj, A.LeftJoin)
    assert lj.expr is not None  # hoisted, not a post-filter
    assert isinstance(lj.right, A.BGP)


def test_union_minus_graph_bind_values():
    q = parse_query(
        PFX
        + """SELECT * WHERE {
          { ?x ex:a ?v } UNION { ?x ex:b ?v }
          MINUS { ?x ex:bad true }
          GRAPH ?g { ?x ex:in ?w }
          BIND(?v AS ?vv)
          VALUES ?z { ex:one ex:two }
        }"""
    )
    node = q.node
    assert isinstance(node, A.Extend) or isinstance(node, A.Join)
    # walk: must contain Union, Minus, GraphNode, Values somewhere
    found = set()

    def walk(n):
        found.add(type(n).__name__)
        for attr in ("child", "left", "right", "sub"):
            c = getattr(n, attr, None)
            if c is not None and isinstance(c, A.Node):
                walk(c)

    walk(node)
    assert {"UnionNode", "Minus", "GraphNode", "Extend", "Values"} <= found


def test_filter_exists_not_exists():
    q = parse_query(PFX + "SELECT * WHERE { ?x ex:p ?v FILTER NOT EXISTS { ?x ex:q ?w } }")
    ef = q.node
    assert isinstance(ef, A.ExistsFilter) and ef.negated
    q2 = parse_query(PFX + "SELECT * WHERE { ?x ex:p ?v FILTER EXISTS { ?x ex:q ?w } }")
    assert isinstance(q2.node, A.ExistsFilter) and not q2.node.negated


def test_aggregates_group_having():
    q = parse_query(
        PFX
        + """SELECT ?g (COUNT(*) AS ?n) (SUM(?v) AS ?s)
            WHERE { ?x ex:group ?g ; ex:val ?v }
            GROUP BY ?g HAVING (COUNT(*) > 2) ORDER BY DESC(?n) LIMIT 5"""
    )
    # Slice(Project(OrderBy(Extend(Extend(Filter(Group(...)))))))
    n = q.node
    assert isinstance(n, A.Slice) and n.limit == 5
    n = n.child
    assert isinstance(n, A.Project) and n.vars == ["g", "n", "s"]
    n = n.child
    assert isinstance(n, A.OrderBy)
    n = n.child
    while isinstance(n, A.Extend):
        n = n.child
    assert isinstance(n, A.Filter)
    g = n.child
    assert isinstance(g, A.Group)
    assert g.by == ["g"]
    kinds = sorted(a.kind for a in g.aggs)
    assert kinds == ["count", "count_star", "sum"] or kinds == ["count_star", "count_star", "sum"]


def test_property_paths():
    q = parse_query(PFX + "SELECT * WHERE { ?x ex:a/ex:b ?y . ?y ^ex:c ?z . ?z (ex:d|ex:e)+ ?w . ?w !(ex:f) ?u }")
    found = []

    def walk(n):
        if isinstance(n, P.PathPattern):
            found.append(n.path)
        for attr in ("child", "left", "right"):
            c = getattr(n, attr, None)
            if c is not None and isinstance(c, A.Node):
                walk(c)

    walk(q.node)
    types = {type(p).__name__ for p in found}
    assert {"Seq", "Inv", "Plus", "Neg"} <= types


def test_plain_iri_path_is_triple_pattern():
    q = parse_query(PFX + "SELECT * WHERE { ?x ex:p ?y }")
    assert isinstance(q.node, A.BGP) and len(q.node.patterns) == 1


def test_bnode_property_list_and_collection():
    q = parse_query(PFX + "SELECT * WHERE { ?x ex:addr [ ex:city ?c ; ex:zip ?z ] . ?l ex:items (ex:a ex:b) }")
    # SELECT * hides the pattern-bnode vars behind a Project (§18.2.4.4)
    assert isinstance(q.node, A.Project)
    assert q.node.vars == ["c", "l", "x", "z"]
    bgp = q.node.child
    assert isinstance(bgp, A.BGP)
    preds = [tp.p.value for tp in bgp.patterns if isinstance(tp.p, Iri)]
    assert "http://ex.org/city" in preds and "http://ex.org/zip" in preds
    assert any(p.endswith("#first") for p in preds) and any(p.endswith("#rest") for p in preds)
    # pattern bnodes act as non-distinguished VARIABLES, not label probes
    from ocaml_rdf_spark.types import BNode as _BN

    assert not any(isinstance(t, _BN) for tp in bgp.patterns for t in (tp.s, tp.o))
    anon_subjects = [tp.s for tp in bgp.patterns if getattr(tp.s, "name", "").startswith("__bn_")]
    assert anon_subjects, "bnode property list must compile to hidden vars"


def test_construct_ask_describe_forms():
    qc = parse_query(PFX + "CONSTRUCT { ?x ex:copied ?v } WHERE { ?x ex:orig ?v }")
    assert qc.form == "construct" and len(qc.templates) == 1
    qa = parse_query(PFX + "ASK { ?x ex:p ?v }")
    assert qa.form == "ask"
    qd = parse_query(PFX + "DESCRIBE ex:thing")
    assert qd.form == "describe" and qd.describe_terms == [Iri("http://ex.org/thing")]


def test_subselect():
    q = parse_query(
        PFX + "SELECT ?g WHERE { { SELECT ?g (COUNT(*) AS ?n) WHERE { ?x ex:g ?g } GROUP BY ?g } FILTER(?n > 1) }"
    )
    assert isinstance(q.node, A.Project)


def test_distinct_after_projection_before_slice():
    q = parse_query(PFX + "SELECT DISTINCT ?v WHERE { ?x ex:p ?v } LIMIT 3")
    assert isinstance(q.node, A.Slice)
    assert isinstance(q.node.child, A.Distinct)
    assert isinstance(q.node.child.child, A.Project)


def test_service_parses():
    q = parse_query(PFX + "SELECT * WHERE { SERVICE <http://remote/> { ?s ?p ?o } }")
    svc = q.node.child if isinstance(q.node, A.Project) else q.node
    assert isinstance(svc, A.ServiceNode)
    assert svc.endpoint == "http://remote/"
    assert svc.silent is False

    q2 = parse_query(PFX + "SELECT * WHERE { SERVICE SILENT ?ep { ?s ?p ?o } }")
    svc2 = q2.node.child if isinstance(q2.node, A.Project) else q2.node
    assert isinstance(svc2, A.ServiceNode)
    assert isinstance(svc2.endpoint, A.Var)
    assert svc2.silent is True


def test_expression_builtins_parse():
    q = parse_query(
        PFX
        + """SELECT * WHERE { ?x ex:name ?n
            FILTER(STRLEN(?n) > 3 && CONTAINS(UCASE(?n), "A") || REGEX(?n, "^b", "i"))
            FILTER(?n IN ("x", "y") || isIRI(?x) || BOUND(?n))
            BIND(IF(?n = "z", 1, 0) + ABS(-2) AS ?score)
        }"""
    )
    assert q.node is not None


def test_negative_syntax():
    for bad in [
        "SELECT WHERE { ?s ?p ?o }",          # empty projection
        "SELECT * WHERE { ?s ?p }",            # incomplete triple
        "SELECT * WHERE { ?s ex:p ?o }",       # unknown prefix
        "SELECT * { ?s ?p ?o",                 # unclosed brace
    ]:
        with pytest.raises((SyntaxError, Exception)):
            parse_query(bad)
