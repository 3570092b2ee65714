"""W3C-style Turtle grammar coverage (FIXTURES §B3 checklist): prefixes/base,
`a`, `;`/`,` lists, bnode property lists, collections, numeric/boolean
shorthand, long strings + escapes, lang tags, datatyped literals, relative
IRI resolution, UTF-8, negative-syntax cases."""

import pytest

from ocaml_rdf_spark.sources.turtle import TurtleSyntaxError, parse_turtle
from ocaml_rdf_spark.types import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    BNode,
    Iri,
    Literal,
)

EX = "http://example.org/"


def P(doc, base=None):
    return list(parse_turtle(doc, base=base))


def test_prefix_and_a():
    got = P("@prefix ex: <http://example.org/> . ex:s a ex:T .")
    assert got == [(Iri(EX + "s"), Iri(RDF_TYPE), Iri(EX + "T"))]


def test_sparql_style_directives_case_insensitive():
    got = P("PrEfIx ex: <http://example.org/>\nBaSe <http://b.org/>\nex:s ex:p <rel> .")
    assert got == [(Iri(EX + "s"), Iri(EX + "p"), Iri("http://b.org/rel"))]


def test_empty_prefix_and_semicolon_comma():
    doc = "@prefix : <http://example.org/> . :s :p :o1 , :o2 ; :q :o3 ."
    got = P(doc)
    assert len(got) == 3
    assert {o.value for _, _, o in got} == {EX + "o1", EX + "o2", EX + "o3"}


def test_numeric_boolean_shorthand():
    got = P("@prefix : <http://e/> . :s :i 42 ; :n -7 ; :d 3.14 ; :e 1e3 ; :e2 -2.5E-1 ; :b true ; :b2 false .")
    lits = {(o.lexical, o.dtype) for _, _, o in got}
    assert lits == {
        ("42", XSD_INTEGER),
        ("-7", XSD_INTEGER),
        ("3.14", XSD_DECIMAL),
        ("1e3", XSD_DOUBLE),
        ("-2.5E-1", XSD_DOUBLE),
        ("true", XSD_BOOLEAN),
        ("false", XSD_BOOLEAN),
    }


def test_integer_then_statement_dot():
    got = P("@prefix : <http://e/> . :s :p 5.")
    assert got[0][2] == Literal("5", dtype=XSD_INTEGER)


def test_bnode_property_list_nested():
    got = P("@prefix : <http://e/> . :s :p [ :q [ :r 1 ] ] .")
    assert len(got) == 3
    kinds = [(type(s).__name__, type(o).__name__) for s, _, o in got]
    assert ("BNode", "Literal") in kinds


def test_anon_subject_and_object():
    got = P("@prefix : <http://e/> . [] :p [] .")
    (s, _, o), = got
    assert isinstance(s, BNode) and isinstance(o, BNode) and s != o


def test_collection():
    got = P("@prefix : <http://e/> . :s :p ( :a :b ) .")
    preds = [p.value for _, p, _ in got]
    assert preds.count(RDF_FIRST) == 2 and preds.count(RDF_REST) == 2
    assert any(o == Iri(RDF_NIL) for _, _, o in got)


def test_empty_collection_is_nil():
    got = P("@prefix : <http://e/> . :s :p () .")
    assert got == [(Iri("http://e/s"), Iri("http://e/p"), Iri(RDF_NIL))]


def test_long_strings_and_quotes():
    got = P('@prefix : <http://e/> . :s :p """multi\nline "quoted" text""" ; :q \'\'\'x\'y\'\'\' .')
    lex = {o.lexical for _, _, o in got}
    assert 'multi\nline "quoted" text' in lex and "x'y" in lex


def test_lang_and_datatype():
    got = P('@prefix : <http://e/> . @prefix x: <http://www.w3.org/2001/XMLSchema#> . :s :p "a"@en-GB ; :q "5"^^x:int .')
    objs = {(o.lexical, o.lang, o.dtype) for _, _, o in got}
    assert ("a", "en-GB", None) in objs
    assert ("5", None, "http://www.w3.org/2001/XMLSchema#int") in objs


def test_relative_iri_resolution_and_base_directive():
    got = P("@base <http://h.org/dir/> . <x> <p> <../y> .")
    s, p, o = got[0]
    assert (s.value, p.value, o.value) == ("http://h.org/dir/x", "http://h.org/dir/p", "http://h.org/y")


def test_unicode_content():
    got = P('@prefix : <http://e/> . :s :p "héllo wörld ✓ 中文" .')
    assert got[0][2].lexical == "héllo wörld ✓ 中文"


def test_pname_local_escapes():
    got = P("@prefix ex: <http://e/> . ex:s ex:p ex:o\\+1 .")
    assert got[0][2] == Iri("http://e/o+1")


def test_comments_everywhere():
    got = P("# top\n@prefix : <http://e/> . # mid\n:s :p # before obj\n :o . # end")
    assert len(got) == 1


NEGATIVE = [
    ":s :p :o .",  # undefined prefix
    "@prefix : <http://e/> . :s :p .",  # missing object
    "@prefix : <http://e/> . :s :p :o",  # missing dot
    "@prefix : <http://e/> :s :p :o .",  # @prefix needs its dot
    '@prefix : <http://e/> . :s :p "unterminated .',
    "@prefix : <http://e/> . :s :p ( :a .",  # unterminated collection
    "@prefix : <http://e/> . :s :p [ :q 1 .",  # unterminated bnode list
    "<rel> <p> <o> .",  # relative IRI without base
]


@pytest.mark.parametrize("doc", NEGATIVE)
def test_negative_syntax(doc):
    with pytest.raises((TurtleSyntaxError, ValueError)):
        P(doc)
