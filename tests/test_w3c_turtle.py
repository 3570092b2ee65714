"""W3C rdf-tests-style Turtle parser suite (manifest-driven, like the
reference runs the W3C Turtle suite — SURVEY §5): `rdft:TestTurtleEval`
cases compare the parsed graph against an N-Triples expectation modulo
blank-node bijection; `rdft:TestTurtleNegativeSyntax` documents must be
rejected. Pure Python — no Spark session needed."""

from __future__ import annotations

import os
from itertools import permutations

import pytest

from ocaml_rdf_spark.sources.ntriples import parse_ntriples
from ocaml_rdf_spark.sources.turtle import TurtleParser
from ocaml_rdf_spark.types import BNode, Iri, Literal

CASES = os.path.join(os.path.dirname(__file__), "w3c_cases_ttl")
BASE = "urn:x-ttl-cases/"
MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
RDFT = "http://www.w3.org/ns/rdftest#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def _read(name: str) -> str:
    with open(os.path.join(CASES, name)) as f:
        return f.read()


def _local(term) -> str:
    v = term.value
    return v[len(BASE):] if v.startswith(BASE) else v


def load_manifest():
    triples = TurtleParser(_read("manifest.ttl"), base=BASE).parse()
    by_s: dict = {}
    for s, p, o in triples:
        by_s.setdefault(s.value, []).append((p.value, o))

    def prop(skey, pred):
        for p, o in by_s.get(skey, []):
            if p == pred:
                return o
        return None

    cases = []
    for skey, pos in by_s.items():
        types = {t.value for p, t in pos if p == RDF_TYPE and isinstance(t, Iri)}
        if RDFT + "TestTurtleEval" in types:
            cases.append(
                {
                    "name": prop(skey, MF + "name").lexical,
                    "input": _local(prop(skey, MF + "action")),
                    "expected": _local(prop(skey, MF + "result")),
                }
            )
        elif RDFT + "TestTurtleNegativeSyntax" in types:
            cases.append({"name": prop(skey, MF + "name").lexical, "input": _local(prop(skey, MF + "action")), "negative": True})
    return sorted(cases, key=lambda c: c["name"])


MANIFEST = load_manifest()
EVAL = [c for c in MANIFEST if not c.get("negative")]
NEG = [c for c in MANIFEST if c.get("negative")]
assert len(EVAL) == 24 and len(NEG) == 11, (len(EVAL), len(NEG))


def _t(x):
    if isinstance(x, Iri):
        return (0, x.value, None, None)
    if isinstance(x, BNode):
        return (1, x.label, None, None)
    assert isinstance(x, Literal)
    dt = None if (x.lang or x.dtype in (None, XSD_STRING)) else x.dtype
    return (2, x.lexical, dt, x.lang or None)


def _triples(parsed):
    return [(_t(s), _t(p), _t(o)) for s, p, o in parsed]


def _bnode_labels(triples):
    return sorted({t[1] for tr in triples for t in tr if t[0] == 1})


def _iso(got, want) -> bool:
    g, w = _bnode_labels(got), _bnode_labels(want)
    if len(g) != len(w):
        return False

    def rename(ts, m):
        return sorted(tuple((1, m[t[1]], None, None) if t[0] == 1 else t for t in tr) for tr in ts)

    if not g:
        return sorted(got) == sorted(want)
    for perm in permutations(w):
        if rename(got, dict(zip(g, perm))) == sorted(tuple(tr) for tr in want):
            return True
    return False


@pytest.mark.parametrize("case", EVAL, ids=[c["name"] for c in EVAL])
def test_turtle_eval(case):
    base = "http://host.example/dir/" if case["name"] == "t-base-rel" else BASE
    got = _triples(TurtleParser(_read(case["input"]), base=base).parse())
    want = _triples(list(parse_ntriples(_read(case["expected"]))))
    assert _iso(got, want), f"{case['name']}:\ngot:  {sorted(got)}\nwant: {sorted(want)}"


@pytest.mark.parametrize("case", NEG, ids=[c["name"] for c in NEG])
def test_turtle_negative(case):
    with pytest.raises(Exception):
        TurtleParser(_read(case["input"]), base=BASE).parse()
