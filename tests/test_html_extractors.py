"""JSON-LD / RDFa / microdata extraction golden cases + text determinism."""

from ocaml_rdf_spark.sources.html_text import extract_text
from ocaml_rdf_spark.sources.jsonld import extract_jsonld
from ocaml_rdf_spark.sources.microdata import extract_microdata
from ocaml_rdf_spark.sources.rdfa import extract_rdfa
from ocaml_rdf_spark.types import RDF_TYPE, BNode, Iri, Literal

S = "https://schema.org/"
URL = "https://ex.org/page/1"


def test_jsonld_basic():
    doc = (
        '{"@context": {"schema": "https://schema.org/"},'
        '"@id": "https://ex.org/e1", "@type": "schema:Person",'
        '"schema:name": "Ada", "schema:age": 36, "schema:cool": true}'
    )
    got = set(extract_jsonld(doc, base=URL))
    e = Iri("https://ex.org/e1")
    assert (e, Iri(RDF_TYPE), Iri(S + "Person")) in got
    assert (e, Iri(S + "name"), Literal("Ada")) in got
    assert (e, Iri(S + "age"), Literal("36", dtype="http://www.w3.org/2001/XMLSchema#integer")) in got
    assert (e, Iri(S + "cool"), Literal("true", dtype="http://www.w3.org/2001/XMLSchema#boolean")) in got


def test_jsonld_vocab_nested_and_graph():
    doc = (
        '{"@context": {"@vocab": "https://schema.org/"}, "@graph": ['
        '{"@id": "https://ex.org/a", "knows": {"@id": "https://ex.org/b", "name": "B"}},'
        '{"@id": "https://ex.org/c", "name": {"@value": "C", "@language": "de"}}]}'
    )
    got = set(extract_jsonld(doc, base=URL))
    assert (Iri("https://ex.org/a"), Iri(S + "knows"), Iri("https://ex.org/b")) in got
    assert (Iri("https://ex.org/b"), Iri(S + "name"), Literal("B")) in got
    assert (Iri("https://ex.org/c"), Iri(S + "name"), Literal("C", lang="de")) in got


def test_jsonld_nested_without_id_is_bnode():
    doc = '{"@context": {"@vocab": "https://schema.org/"}, "@id": "https://ex.org/a", "address": {"streetAddress": "Main St 1"}}'
    got = extract_jsonld(doc, base=URL)
    bn = [o for s, p, o in got if p.value == S + "address"]
    assert len(bn) == 1 and isinstance(bn[0], BNode)
    assert (bn[0], Iri(S + "streetAddress"), Literal("Main St 1")) in got


def test_jsonld_relative_id_resolves_against_page():
    doc = '{"@context": {"@vocab": "https://schema.org/"}, "@id": "#frag", "name": "X"}'
    got = extract_jsonld(doc, base=URL)
    assert (Iri(URL + "#frag"), Iri(S + "name"), Literal("X")) in got


def test_jsonld_invalid_json_yields_nothing():
    assert extract_jsonld("{not json", base=URL) == []


def test_rdfa_lite():
    html = (
        f'<html><body><div vocab="{S}" typeof="Person" about="#me">'
        '<span property="name">Eve</span>'
        f'<a property="worksFor" href="https://ex.org/org">Org</a>'
        '<span property="age" datatype="xsd:integer" content="30">thirty</span>'
        "</div></body></html>"
    )
    got = set(extract_rdfa(html, base=URL))
    me = Iri(URL + "#me")
    assert (me, Iri(RDF_TYPE), Iri(S + "Person")) in got
    assert (me, Iri(S + "name"), Literal("Eve")) in got
    assert (me, Iri(S + "worksFor"), Iri("https://ex.org/org")) in got
    assert (me, Iri(S + "age"), Literal("30", dtype="http://www.w3.org/2001/XMLSchema#integer")) in got


def test_rdfa_lang_inheritance():
    html = f'<html lang="fr"><body><div vocab="{S}" about="#a"><span property="name">Zoé</span></div></body></html>'
    got = set(extract_rdfa(html, base=URL))
    assert (Iri(URL + "#a"), Iri(S + "name"), Literal("Zoé", lang="fr")) in got


def test_rdfa_typeof_chaining_bnode():
    html = (
        f'<div vocab="{S}" about="#a">'
        '<div property="address" typeof="PostalAddress">'
        '<span property="streetAddress">Elm St</span></div></div>'
    )
    got = extract_rdfa(html, base=URL)
    addr = [o for s, p, o in got if p.value == S + "address"]
    assert len(addr) == 1 and isinstance(addr[0], BNode)
    assert (addr[0], Iri(RDF_TYPE), Iri(S + "PostalAddress")) in got
    assert (addr[0], Iri(S + "streetAddress"), Literal("Elm St")) in got


def test_microdata():
    html = (
        f'<div itemscope itemtype="{S}Product" itemid="#p">'
        '<span itemprop="name">Widget</span>'
        '<meta itemprop="sku" content="S1">'
        '<link itemprop="url" href="/w">'
        f'<span itemprop="offers" itemscope itemtype="{S}Offer" itemid="#o">'
        '<meta itemprop="price" content="9"></span></div>'
    )
    got = set(extract_microdata(html, base=URL))
    p = Iri(URL + "#p")
    o = Iri(URL + "#o")
    assert (p, Iri(RDF_TYPE), Iri(S + "Product")) in got
    assert (p, Iri(S + "name"), Literal("Widget")) in got
    assert (p, Iri(S + "sku"), Literal("S1")) in got
    assert (p, Iri(S + "url"), Iri("https://ex.org/w")) in got
    assert (p, Iri(S + "offers"), o) in got
    assert (o, Iri(S + "price"), Literal("9")) in got


def test_microdata_bnode_without_itemid():
    html = f'<div itemscope itemtype="{S}Thing"><span itemprop="name">T</span></div>'
    got = extract_microdata(html, base=URL)
    assert any(isinstance(s, BNode) and p.value == S + "name" for s, p, o in got)


def test_text_extraction_rules():
    html = (
        "<html><head><title>T</title><style>x{}</style><script>var a;</script></head>"
        "<body><h1> A  B </h1><p>c<b>d</b>e</p><div>f<span> g </span></div></body></html>"
    )
    assert extract_text(html) == "T\nA B\ncde\nf g"


def test_text_extraction_deterministic():
    html = "<p>a</p><p>b</p>" * 100
    assert extract_text(html) == extract_text(html) == "\n".join(["a", "b"] * 100)


def test_jsonld_list_chain():
    """@list maps to an rdf:first/rest/nil chain (JSON-LD → RDF list
    semantics, same desugaring as Turtle collections)."""
    from ocaml_rdf_spark.sources.jsonld import extract_jsonld
    from ocaml_rdf_spark.types import RDF_FIRST, RDF_NIL, RDF_REST, BNode, Iri, Literal

    doc = '{"@context": {"ex": "http://e/"}, "@id": "http://e/s", "ex:steps": {"@list": ["a", "b"]}}'
    ts = extract_jsonld(doc, base="http://b/")
    firsts = [(s, o) for s, p, o in ts if p.value == RDF_FIRST]
    rests = [(s, o) for s, p, o in ts if p.value == RDF_REST]
    assert [o.lexical for _, o in firsts] == ["a", "b"]
    assert rests[-1][1] == Iri(RDF_NIL)
    # the subject property points at the chain head
    head = [o for s, p, o in ts if p.value == "http://e/steps"]
    assert head == [firsts[0][0]]
    # empty list → rdf:nil directly
    ts2 = extract_jsonld('{"@id": "http://e/s", "http://e/p": {"@list": []}}', base=None)
    assert ts2 == [(Iri("http://e/s"), Iri("http://e/p"), Iri(RDF_NIL))]
