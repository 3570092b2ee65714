"""W3C-style manifest-driven evaluation suite — the reference's own test
infrastructure reproduced (SURVEY §5: DAWG/SPARQL-WG manifest.ttl entries
pointing at .rq query / .ttl data / .srx expected results, with the
manifest itself parsed BY THE LIBRARY — dogfooding, exactly as
src/rdf_sparql_test.ml does).

Comparison semantics per the W3C runner:
- SELECT: solution multisets, equal modulo a blank-node bijection;
  ordered (sequence) comparison when the test is named *-ordered;
- ASK: boolean equality;
- CONSTRUCT: graph isomorphism modulo blank-node bijection.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from itertools import permutations

import pytest

from ocaml_rdf_spark.algebra import Ctx
from ocaml_rdf_spark.graph import Graph
from ocaml_rdf_spark.sources.turtle import TurtleParser
from ocaml_rdf_spark.sparql import execute
from ocaml_rdf_spark.types import BNode, Iri, Literal

CASES = os.path.join(os.path.dirname(__file__), "w3c_cases")
BASE = "urn:x-cases/"
MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
QT = "http://www.w3.org/2001/sw/DataAccess/tests/test-query#"
UT = "http://www.w3.org/2009/sparql/tests/test-update#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
SRX = "{http://www.w3.org/2005/sparql-results#}"


def _read(name: str) -> str:
    with open(os.path.join(CASES, name)) as f:
        return f.read()


def _local(iri_or_term) -> str:
    v = iri_or_term.value if isinstance(iri_or_term, Iri) else str(iri_or_term)
    return v[len(BASE):] if v.startswith(BASE) else v


def load_manifest() -> list[dict]:
    """Parse manifest.ttl with OUR Turtle parser (dogfooding)."""
    triples = TurtleParser(_read("manifest.ttl"), base=BASE).parse()
    by_s: dict = {}
    for s, p, o in triples:
        key = s.label if isinstance(s, BNode) else s.value
        by_s.setdefault(key, []).append((p.value, o))

    def prop(skey, pred):
        for p, o in by_s.get(skey, []):
            if p == pred:
                return o
        return None

    cases = []
    for skey, pos in by_s.items():
        types = {t.value for p, t in pos if p == RDF_TYPE and isinstance(t, Iri)}
        if MF + "QueryEvaluationTest" in types:
            action = prop(skey, MF + "action")
            akey = action.label if isinstance(action, BNode) else action.value
            cases.append(
                {
                    "name": prop(skey, MF + "name").lexical,
                    "query": _local(prop(akey, QT + "query")),
                    "data": _local(prop(akey, QT + "data")),
                    "result": _local(prop(skey, MF + "result")),
                }
            )
        elif MF + "NegativeSyntaxTest" in types:
            cases.append(
                {
                    "name": prop(skey, MF + "name").lexical,
                    "query": _local(prop(skey, MF + "action")),
                    "negative": True,
                }
            )
        elif MF + "PositiveSyntaxTest11" in types:
            cases.append(
                {
                    "name": prop(skey, MF + "name").lexical,
                    "query": _local(prop(skey, MF + "action")),
                    "pos_syntax": True,
                }
            )
        elif UT + "UpdateEvaluationTest" in types:
            action = prop(skey, MF + "action")
            akey = action.label if isinstance(action, BNode) else action.value
            cases.append(
                {
                    "name": prop(skey, MF + "name").lexical,
                    "request": _local(prop(akey, UT + "request")),
                    "data": _local(prop(akey, UT + "data")),
                    "result": _local(prop(skey, MF + "result")),
                    "update": True,
                }
            )
        elif MF + "NegativeUpdateSyntaxTest11" in types:
            cases.append(
                {
                    "name": prop(skey, MF + "name").lexical,
                    "request": _local(prop(skey, MF + "action")),
                    "neg_update": True,
                }
            )
    return sorted(cases, key=lambda c: c["name"])


MANIFEST = load_manifest()
EVAL_CASES = [c for c in MANIFEST if not c.get("negative") and not c.get("update") and not c.get("neg_update") and not c.get("pos_syntax")]
POS_SYNTAX_CASES = [c for c in MANIFEST if c.get("pos_syntax")]
NEG_CASES = [c for c in MANIFEST if c.get("negative")]
UPDATE_CASES = [c for c in MANIFEST if c.get("update")]
NEG_UPDATE_CASES = [c for c in MANIFEST if c.get("neg_update")]
assert (
    len(EVAL_CASES) == 190
    and len(POS_SYNTAX_CASES) == 19
    and len(NEG_CASES) == 20
    and len(UPDATE_CASES) == 25
    and len(NEG_UPDATE_CASES) == 5
), (
    f"manifest parse found {len(EVAL_CASES)} eval / {len(POS_SYNTAX_CASES)} pos-syntax / "
    f"{len(NEG_CASES)} negative / "
    f"{len(UPDATE_CASES)} update / {len(NEG_UPDATE_CASES)} neg-update"
)


# -- term normalization -------------------------------------------------------

def _norm(kind, lex, dtype, lang):
    """4-tuple term with RDF 1.1 normalization: plain == xsd:string, and a
    lang-tagged literal's implied rdf:langString is dropped (SRX encodes it
    as xml:lang with no datatype attribute)."""
    if kind == 2 and (dtype == XSD_STRING or lang):
        dtype = None
    return (kind, lex, dtype, lang or None)


def _parse_srx_solutions(text: str):
    root = ET.fromstring(text)
    b = root.find(f"{SRX}boolean")
    if b is not None:
        return ("ask", b.text == "true")
    rows = []
    for res in root.findall(f"{SRX}results/{SRX}result"):
        row = {}
        for binding in res.findall(f"{SRX}binding"):
            v = binding.get("name")
            child = binding[0]
            tag = child.tag[len(SRX):]
            if tag == "uri":
                row[v] = _norm(0, child.text or "", None, None)
            elif tag == "bnode":
                row[v] = _norm(1, child.text or "", None, None)
            else:
                lang = child.get("{http://www.w3.org/XML/1998/namespace}lang")
                row[v] = _norm(2, child.text or "", child.get("datatype"), lang)
        rows.append(row)
    return ("select", rows)


def _collect_solutions(df):
    rows = []
    for r in df.collect():
        row = {}
        for v in df.columns:
            t = r[v]
            if t is not None and t["kind"] is not None:
                row[v] = _norm(t["kind"], t["lex"], t["dtype"], t["lang"])
        rows.append(row)
    return rows


def _bnode_labels(rows):
    out = set()
    for row in rows:
        for t in (row.values() if isinstance(row, dict) else row):
            if t[0] == 1:
                out.add(t[1])
    return sorted(out)


def _rename(rows, mapping):
    def m(t):
        return (1, mapping[t[1]], None, None) if t[0] == 1 else t

    if rows and isinstance(rows[0], dict):
        return [{v: m(t) for v, t in row.items()} for row in rows]
    return [tuple(m(t) for t in row) for row in rows]


def _canon_multiset(rows):
    if rows and isinstance(rows[0], dict):
        return sorted(tuple(sorted(r.items())) for r in rows)
    return sorted(rows)


def _equal_mod_bnodes(got, want, ordered=False):
    """Multiset (or sequence) equality under some bnode bijection."""
    g_labels, w_labels = _bnode_labels(got), _bnode_labels(want)
    if len(g_labels) != len(w_labels):
        return False
    if not g_labels:
        return (got == want) if ordered else (_canon_multiset(got) == _canon_multiset(want))
    for perm in permutations(w_labels):
        mapping = dict(zip(g_labels, perm))
        r = _rename(got, mapping)
        if ordered:
            if r == want:
                return True
        elif _canon_multiset(r) == _canon_multiset(want):
            return True
    return False


def _graph_triples(df):
    out = []
    for r in df.select("s_kind", "s_lex", "pred", "o_kind", "o_lex", "o_dtype", "o_lang").collect():
        out.append(
            (
                _norm(r["s_kind"], r["s_lex"], None, None),
                _norm(0, r["pred"], None, None),
                _norm(r["o_kind"], r["o_lex"], r["o_dtype"], r["o_lang"]),
            )
        )
    return out


def _ttl_triples(text: str):
    out = []
    for s, p, o in TurtleParser(text, base=BASE).parse():
        def t(x):
            if isinstance(x, Iri):
                return _norm(0, x.value, None, None)
            if isinstance(x, BNode):
                return _norm(1, x.label, None, None)
            assert isinstance(x, Literal)
            return _norm(2, x.lexical, x.dtype, x.lang)

        out.append((t(s), t(p), t(o)))
    return out


@pytest.fixture(scope="module")
def ctx_cache(spark):
    cache: dict = {}

    def get(data_file: str) -> Ctx:
        if data_file not in cache:
            if data_file.endswith(".trig"):
                # named-graph datasets (property-path × GRAPH cases):
                # parsed with OUR TriG parser — dogfooding, as with Turtle
                from ocaml_rdf_spark.sources.trig import TriGParser
                from ocaml_rdf_spark.types import DEFAULT_GRAPH, TRIPLES_SCHEMA, triple_row

                rows = [
                    triple_row(s, p, o, graph=(g.value if isinstance(g, Iri) else DEFAULT_GRAPH))
                    for s, p, o, g in TriGParser(_read(data_file), base=BASE).parse_quads()
                ]
                cache[data_file] = Ctx(spark.createDataFrame(rows, schema=TRIPLES_SCHEMA))
            else:
                triples = TurtleParser(_read(data_file), base=BASE).parse()
                g = Graph.from_triples(spark, triples)
                cache[data_file] = Ctx(g.df)
        return cache[data_file]

    return get


@pytest.mark.parametrize("case", NEG_CASES, ids=[c["name"] for c in NEG_CASES])
def test_w3c_negative_syntax(case):
    """NegativeSyntaxTest: the grammar must reject the document."""
    from ocaml_rdf_spark.sparql import parse_query

    with pytest.raises((SyntaxError, IndexError)):
        parse_query(_read(case["query"]))


@pytest.mark.parametrize("case", POS_SYNTAX_CASES, ids=[c["name"] for c in POS_SYNTAX_CASES])
def test_w3c_positive_syntax(case):
    """PositiveSyntaxTest11: the grammar must ACCEPT the document (parse
    only, no evaluation) — the breadth companion to the negative set."""
    from ocaml_rdf_spark.sparql import parse_query

    parse_query(_read(case["query"]))


@pytest.mark.parametrize("case", EVAL_CASES, ids=[c["name"] for c in EVAL_CASES])
def test_w3c_case(case, ctx_cache):
    ctx = ctx_cache(case["data"])
    out = execute(_read(case["query"]), ctx)
    ordered = case["name"].endswith("-ordered")

    if case["result"].endswith(".ttl"):  # CONSTRUCT — graph isomorphism
        got = _graph_triples(out)
        want = _ttl_triples(_read(case["result"]))
        assert _equal_mod_bnodes(got, want), f"{case['name']}: graphs differ\n{got}\nvs\n{want}"
        return

    form, want = _parse_srx_solutions(_read(case["result"]))
    if form == "ask":
        assert out == want, f"{case['name']}: ASK {out} != {want}"
        return
    got = _collect_solutions(out)
    assert _equal_mod_bnodes(got, want, ordered=ordered), (
        f"{case['name']}: solutions differ\ngot:  {_canon_multiset(got)}\nwant: {_canon_multiset(want)}"
    )


# --- SPARQL 1.1 Update conformance (spec §3 examples as manifest data) ------


def _trig_quads(text: str):
    """TriG doc (parsed with OUR TriG parser — dogfooding) → normalized
    4-tuple quads; the default graph maps to the engine's DEFAULT_GRAPH."""
    from ocaml_rdf_spark.sources.trig import TriGParser
    from ocaml_rdf_spark.types import DEFAULT_GRAPH

    out = []
    for s, p, o, g in TriGParser(text, base=BASE).parse_quads():
        def t(x):
            if isinstance(x, Iri):
                return _norm(0, x.value, None, None)
            if isinstance(x, BNode):
                return _norm(1, x.label, None, None)
            assert isinstance(x, Literal)
            return _norm(2, x.lexical, x.dtype, x.lang)

        gname = g.value if isinstance(g, Iri) else (g.label if g is not None else DEFAULT_GRAPH)
        out.append((t(s), t(p), t(o), _norm(0, gname, None, None)))
    return out


def _store_quads(df):
    out = []
    for r in df.select("s_kind", "s_lex", "pred", "o_kind", "o_lex", "o_dtype", "o_lang", "graph").collect():
        out.append(
            (
                _norm(r["s_kind"], r["s_lex"], None, None),
                _norm(0, r["pred"], None, None),
                _norm(r["o_kind"], r["o_lex"], r["o_dtype"], r["o_lang"]),
                _norm(0, r["graph"], None, None),
            )
        )
    return out


@pytest.mark.parametrize("case", UPDATE_CASES, ids=[c["name"] for c in UPDATE_CASES])
def test_w3c_update_case(case, spark):
    """UpdateEvaluationTest: request applied to the TriG dataset must yield
    exactly the expected quad store (modulo blank-node bijection)."""
    from ocaml_rdf_spark.sources.trig import TriGParser
    from ocaml_rdf_spark.sparql import execute_update
    from ocaml_rdf_spark.types import DEFAULT_GRAPH, TRIPLES_SCHEMA, triple_row

    rows = [
        triple_row(s, p, o, graph=(g.value if isinstance(g, Iri) else DEFAULT_GRAPH))
        for s, p, o, g in TriGParser(_read(case["data"]), base=BASE).parse_quads()
    ]
    df = spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)
    out = execute_update(_read(case["request"]), df)
    got = _store_quads(out)
    want = _trig_quads(_read(case["result"]))
    assert _equal_mod_bnodes(got, want), (
        f"{case['name']}: stores differ\ngot:  {sorted(got)}\nwant: {sorted(want)}"
    )


@pytest.mark.parametrize("case", NEG_UPDATE_CASES, ids=[c["name"] for c in NEG_UPDATE_CASES])
def test_w3c_negative_update_syntax(case):
    from ocaml_rdf_spark.sparql import Parser

    with pytest.raises((SyntaxError, IndexError)):
        Parser(_read(case["request"])).parse_update()
