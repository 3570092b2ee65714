"""RDF/XML reader tests (rdf_xml.ml parity — SURVEY §2.2): W3C-style
positive cases + negative-syntax cases. Pure Python (no Spark session)."""

from __future__ import annotations

import pytest

from ocaml_rdf_spark.sources.rdfxml import parse_rdfxml
from ocaml_rdf_spark.types import RDF_FIRST, RDF_NIL, RDF_NS, RDF_REST, RDF_TYPE, BNode, Iri, Literal

RDF_DECL = f'xmlns:rdf="{RDF_NS}"'
EX = "http://ex.org/"


def nts(triples):
    return {(s.nt(), p.nt(), o.nt()) for s, p, o in triples}


def test_typed_node_and_literals():
    doc = f"""<rdf:RDF {RDF_DECL} xmlns:ex="{EX}">
      <ex:Person rdf:about="http://ex.org/a">
        <ex:name xml:lang="en">Alice</ex:name>
        <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</ex:age>
      </ex:Person></rdf:RDF>"""
    got = nts(parse_rdfxml(doc))
    assert ("<http://ex.org/a>", f"<{RDF_TYPE}>", f"<{EX}Person>") in got
    assert ("<http://ex.org/a>", f"<{EX}name>", '"Alice"@en') in got
    assert (
        "<http://ex.org/a>",
        f"<{EX}age>",
        '"30"^^<http://www.w3.org/2001/XMLSchema#integer>',
    ) in got


def test_rdf_id_and_base_resolution():
    doc = f"""<rdf:RDF {RDF_DECL} xmlns:ex="{EX}" xml:base="http://base.org/dir/">
      <rdf:Description rdf:ID="frag"><ex:p rdf:resource="rel"/></rdf:Description>
    </rdf:RDF>"""
    got = nts(parse_rdfxml(doc, base="http://ignored.org/"))
    assert ("<http://base.org/dir/#frag>", f"<{EX}p>", "<http://base.org/dir/rel>") in got


def test_property_attributes_and_nodeid():
    doc = f"""<rdf:RDF {RDF_DECL} xmlns:ex="{EX}">
      <rdf:Description rdf:nodeID="b1" ex:tag="v"><ex:knows rdf:nodeID="b2"/></rdf:Description>
    </rdf:RDF>"""
    got = nts(parse_rdfxml(doc))
    assert ("_:b1", f"<{EX}tag>", '"v"') in got
    assert ("_:b1", f"<{EX}knows>", "_:b2") in got


def test_parse_type_resource_and_collection():
    doc = f"""<rdf:RDF {RDF_DECL} xmlns:ex="{EX}">
      <rdf:Description rdf:about="http://ex.org/s">
        <ex:addr rdf:parseType="Resource"><ex:city>Paris</ex:city></ex:addr>
        <ex:list rdf:parseType="Collection">
          <rdf:Description rdf:about="http://ex.org/i1"/>
          <rdf:Description rdf:about="http://ex.org/i2"/>
        </ex:list>
      </rdf:Description></rdf:RDF>"""
    trips = parse_rdfxml(doc)
    got = nts(trips)
    assert any(p.nt() == f"<{EX}city>" and o.nt() == '"Paris"' for _, p, o in trips)
    firsts = [t for t in trips if t[1].value == RDF_FIRST]
    rests = [t for t in trips if t[1].value == RDF_REST]
    assert len(firsts) == 2 and len(rests) == 2
    assert any(o.nt() == f"<{RDF_NIL}>" for _, _, o in rests)


def test_parse_type_literal_xmlliteral():
    doc = f"""<rdf:RDF {RDF_DECL} xmlns:ex="{EX}">
      <rdf:Description rdf:about="http://ex.org/s">
        <ex:html rdf:parseType="Literal">a <b>bold</b> move</ex:html>
      </rdf:Description></rdf:RDF>"""
    (t,) = [t for t in parse_rdfxml(doc) if t[1].value == EX + "html"]
    assert isinstance(t[2], Literal)
    assert t[2].dtype == RDF_NS + "XMLLiteral"
    assert "<b>bold</b>" in t[2].lexical


def test_containers_li_numbering():
    doc = f"""<rdf:RDF {RDF_DECL}>
      <rdf:Seq rdf:about="http://ex.org/seq"><rdf:li>x</rdf:li><rdf:li>y</rdf:li></rdf:Seq>
    </rdf:RDF>"""
    got = nts(parse_rdfxml(doc))
    assert ("<http://ex.org/seq>", f"<{RDF_NS}_1>", '"x"') in got
    assert ("<http://ex.org/seq>", f"<{RDF_NS}_2>", '"y"') in got
    assert ("<http://ex.org/seq>", f"<{RDF_TYPE}>", f"<{RDF_NS}Seq>") in got


def test_nested_node_element():
    doc = f"""<rdf:RDF {RDF_DECL} xmlns:ex="{EX}">
      <rdf:Description rdf:about="http://ex.org/s">
        <ex:knows><ex:Person rdf:about="http://ex.org/o"/></ex:knows>
      </rdf:Description></rdf:RDF>"""
    got = nts(parse_rdfxml(doc))
    assert ("<http://ex.org/s>", f"<{EX}knows>", "<http://ex.org/o>") in got
    assert ("<http://ex.org/o>", f"<{RDF_TYPE}>", f"<{EX}Person>") in got


def test_negative_malformed_xml_raises():
    with pytest.raises(Exception):
        parse_rdfxml("<rdf:RDF><unclosed>")


def test_negative_obsolete_attrs_raise():
    doc = f'<rdf:RDF {RDF_DECL}><rdf:Description rdf:aboutEach="#x"/></rdf:RDF>'
    with pytest.raises(ValueError):
        parse_rdfxml(doc)


def test_roundtrip_via_writer(spark):
    """parse → TRIPLES df → to_rdfxml → parse again → same triple set
    (modulo bnode naming — none here)."""
    from ocaml_rdf_spark.serializers import to_rdfxml
    from ocaml_rdf_spark.types import TRIPLES_SCHEMA, triple_row

    doc = f"""<rdf:RDF {RDF_DECL} xmlns:ex="{EX}">
      <ex:Person rdf:about="http://ex.org/a">
        <ex:name xml:lang="en">Alice</ex:name>
        <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</ex:age>
        <ex:knows rdf:resource="http://ex.org/b"/>
      </ex:Person></rdf:RDF>"""
    trips = parse_rdfxml(doc)
    rows = [triple_row(s, p, o, graph="g") for s, p, o in trips]
    df = spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)
    xml = to_rdfxml(df, {"ex": EX})
    again = parse_rdfxml(xml)
    assert nts(trips) == nts(again)
