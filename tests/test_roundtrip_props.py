"""Property-based round-trip tests (hypothesis) for the pure-Python
parser/serializer kernel — SURVEY §5 round-trip strategy, no Spark:
random term → N-Triples text → parse → identical term."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocaml_rdf_spark.sources.ntriples import parse_ntriples
from ocaml_rdf_spark.sources.turtle import TurtleParser
from ocaml_rdf_spark.types import XSD_NS, BNode, Iri, Literal

# IRI-safe characters (RFC 3987 unreserved subset — enough for round-trip)
iri_s = st.builds(
    lambda local: Iri("http://ex.org/" + local),
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-_.~", min_size=1, max_size=30),
)

bnode_s = st.builds(
    lambda l: BNode(l),
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=20),
)

# lexical forms: printable unicode incl. the escape-relevant chars
lex_s = st.text(
    alphabet=st.characters(exclude_categories=("Cs", "Cc"), include_characters='"\\\n\r\t'),
    max_size=60,
)

lang_s = st.sampled_from(["en", "en-us", "de", "fr-ca", "zh-hans"])
dtype_s = st.sampled_from(
    [None, XSD_NS + "integer", XSD_NS + "double", XSD_NS + "boolean", "http://ex.org/custom"]
)

literal_s = st.one_of(
    st.builds(lambda lx: Literal(lx), lex_s),
    st.builds(lambda lx, lg: Literal(lx, lang=lg), lex_s, lang_s),
    st.builds(lambda lx, dt: Literal(lx, dtype=dt), lex_s, dtype_s),
)

subject_s = st.one_of(iri_s, bnode_s)
object_s = st.one_of(iri_s, bnode_s, literal_s)


def _norm(t):
    """RDF 1.1 normalization applied by our pipeline: plain → xsd:string."""
    if isinstance(t, Literal) and t.lang is None and t.dtype is None:
        return Literal(t.lexical, dtype=None)
    return t


@settings(max_examples=200, deadline=None)
@given(s=subject_s, p=iri_s, o=object_s)
def test_ntriples_roundtrip(s, p, o):
    line = f"{s.nt()} {p.nt()} {o.nt()} ."
    triples = list(parse_ntriples(line))
    assert len(triples) == 1
    s2, p2, o2 = triples[0]
    assert s2 == s
    assert p2 == p
    # parser may normalize plain literal to no-dtype form; compare modulo that
    if isinstance(o, Literal):
        assert isinstance(o2, Literal)
        assert o2.lexical == o.lexical
        assert (o2.lang or None) == (o.lang or None)
        assert (o2.dtype or XSD_NS + "string") == (o.dtype or XSD_NS + "string") or o2.dtype == o.dtype
    else:
        assert o2 == o


@settings(max_examples=100, deadline=None)
@given(s=iri_s, p=iri_s, o=object_s)
def test_turtle_roundtrip_via_ntriples_syntax(s, p, o):
    """N-Triples is valid Turtle: the Turtle parser must accept the same
    line and produce the same triple (the reference funnels N-Triples
    through its Turtle grammar — SURVEY §2.2)."""
    line = f"{s.nt()} {p.nt()} {o.nt()} ."
    t1 = list(parse_ntriples(line))
    t2 = TurtleParser(line, base="http://base.org/").parse()
    assert len(t2) == 1
    assert t1[0][0] == t2[0][0] and t1[0][1] == t2[0][1]
    a, b = t1[0][2], t2[0][2]
    if isinstance(a, Literal):
        assert a.lexical == b.lexical and (a.lang or None) == (b.lang or None)
    else:
        assert a == b


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(subject_s, iri_s, object_s), min_size=1, max_size=10))
def test_ntriples_multiline_roundtrip(triples):
    doc = "\n".join(f"{s.nt()} {p.nt()} {o.nt()} ." for s, p, o in triples)
    parsed = list(parse_ntriples(doc))
    assert len(parsed) == len(triples)
