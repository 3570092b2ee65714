"""W3C-style N-Triples cases: positive eval + negative syntax (SURVEY §5,
FIXTURES §B3). The reference runs the W3C rdf-tests suites; these cases
mirror that suite's coverage shape."""

import pytest

from ocaml_rdf_spark.sources.ntriples import NTSyntaxError, parse_ntriples
from ocaml_rdf_spark.types import BNode, Iri, Literal

EX = "http://example.org/"


def P(doc):
    return list(parse_ntriples(doc))


def test_basic_triple():
    got = P(f"<{EX}s> <{EX}p> <{EX}o> .")
    assert got == [(Iri(EX + "s"), Iri(EX + "p"), Iri(EX + "o"))]


def test_comments_and_blanks():
    assert P("# nothing\n\n   \n") == []


def test_literal_plain_lang_typed():
    doc = (
        f'<{EX}s> <{EX}p> "plain" .\n'
        f'<{EX}s> <{EX}p> "hola"@es .\n'
        f'<{EX}s> <{EX}p> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .'
    )
    os_ = [o for _, _, o in P(doc)]
    assert os_ == [
        Literal("plain"),
        Literal("hola", lang="es"),
        Literal("5", dtype="http://www.w3.org/2001/XMLSchema#integer"),
    ]


def test_escapes():
    doc = f'<{EX}s> <{EX}p> "a\\tb\\nc\\"d\\\\e\\u00e9\\U0001F600" .'
    (_, _, o), = P(doc)
    assert o.lexical == 'a\tb\nc"d\\eé😀'


def test_iri_uchar_escape():
    (s, _, _), = P(f"<http://ex.org/\\u00e9> <{EX}p> <{EX}o> .")
    assert s.value == "http://ex.org/é"


def test_bnodes():
    got = P(f"_:a <{EX}p> _:b1.x .")
    # '.x' after a label: label chars include '.', but trailing '.' is the dot…
    assert got[0][0] == BNode("a")


def test_no_final_newline_and_crlf():
    assert len(P(f"<{EX}s> <{EX}p> <{EX}o> .\r\n<{EX}s> <{EX}p2> <{EX}o> .")) == 2


NEGATIVE = [
    "<http://ex.org/s> <http://ex.org/p> .",  # missing object
    '<http://ex.org/s> "lit" <http://ex.org/o> .',  # literal predicate
    '"lit" <http://ex.org/p> <http://ex.org/o> .',  # literal subject
    "<http://ex.org/s> <http://ex.org/p> <http://ex.org/o>",  # no dot
    '<http://ex.org/s> <http://ex.org/p> "x"^^<http://e> extra .',  # trailing junk
    "<http://ex.org/s> <http://ex.org/p> <rel/iri> .",  # relative IRI
    '<http://ex.org/s> <http://ex.org/p> "bad\\q" .',  # bad escape
    '<http://ex.org/s> <http://ex.org/p> "unterminated .',
]


@pytest.mark.parametrize("doc", NEGATIVE)
def test_negative_syntax(doc):
    with pytest.raises((NTSyntaxError, ValueError)):
        P(doc)


def test_nquads_graph():
    from ocaml_rdf_spark.sources.ntriples import parse_ntriples

    got = list(parse_ntriples(f"<{EX}s> <{EX}p> <{EX}o> <{EX}g> .", quads=True))
    assert got[0][3] == Iri(EX + "g")
