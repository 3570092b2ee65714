"""SPARQL results formats (results.py): JSON/XML golden structure and
JSON round-trip — the reference's rdf_json.ml / SPARQL-protocol results
surface (SURVEY §2.2 results-format row)."""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

import pytest

from ocaml_rdf_spark.algebra import BGP, Ctx, Project, TriplePattern as T_, Var, select
from ocaml_rdf_spark.types import Iri, Literal


@pytest.fixture(scope="module")
def solutions(spark):
    from ocaml_rdf_spark.relational import P_NAME, triples_view

    ctx = Ctx(triples_view(spark, "/root/testdata/sf0.001"))
    node = Project(
        BGP([T_(Var("r"), Iri("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"), Iri("urn:c:Region")),
             T_(Var("r"), Iri(P_NAME), Var("rname"))]),
        ["r", "rname"],
    )
    return select(node, ctx)


def test_sparql_json_golden(solutions):
    from ocaml_rdf_spark.results import to_sparql_json

    doc = json.loads(to_sparql_json(solutions))
    assert set(doc["head"]["vars"]) == {"r", "rname"}
    rows = doc["results"]["bindings"]
    assert len(rows) == 5
    by_name = {b["rname"]["value"]: b for b in rows}
    assert by_name["ASIA"]["r"]["type"] == "uri"
    assert by_name["ASIA"]["rname"]["type"] == "literal"
    # RDF 1.1 style: xsd:string is the implicit datatype and is elided
    assert "datatype" not in by_name["ASIA"]["rname"]


def test_sparql_json_roundtrip(solutions):
    from ocaml_rdf_spark.results import parse_sparql_json, to_sparql_json

    s = to_sparql_json(solutions)
    cols, rows = parse_sparql_json(s)
    assert sorted(cols) == ["r", "rname"]
    assert len(rows) == 5
    # rows hold (kind, lex, dtype, lang) tuples; xsd:string restored on parse
    vals = {r["rname"][1] for r in rows}
    assert "ASIA" in vals and "EUROPE" in vals
    kinds = {r["rname"][0] for r in rows} | {r["r"][0] for r in rows}
    assert kinds == {0, 2}


def test_sparql_xml_golden(solutions):
    from ocaml_rdf_spark.results import to_sparql_xml

    root = ET.fromstring(to_sparql_xml(solutions))
    ns = {"s": "http://www.w3.org/2005/sparql-results#"}
    vars_ = [v.get("name") for v in root.findall("s:head/s:variable", ns)]
    assert sorted(vars_) == ["r", "rname"]
    results = root.findall("s:results/s:result", ns)
    assert len(results) == 5
    uris = {u.text for u in root.findall(".//s:uri", ns)}
    assert any(u.startswith("urn:r:") for u in uris)


def test_ask_formats():
    from ocaml_rdf_spark.results import to_ask_json, to_ask_xml

    assert json.loads(to_ask_json(True)) == {"head": {}, "boolean": True}
    assert json.loads(to_ask_json(False))["boolean"] is False
    root = ET.fromstring(to_ask_xml(True))
    ns = {"s": "http://www.w3.org/2005/sparql-results#"}
    assert root.find("s:boolean", ns).text == "true"


def test_sparql_csv_golden(solutions):
    from ocaml_rdf_spark.results import to_sparql_csv

    csv = to_sparql_csv(solutions)
    lines = csv.split("\r\n")
    assert lines[0] in ("r,rname", "rname,r")
    assert len([l for l in lines if l]) == 6  # header + 5 rows
    assert any("ASIA" in l for l in lines[1:])


def test_sparql_tsv_roundtrip(solutions):
    """TSV is the lossless text format: serialize → parse → identical
    (kind, lex, dtype, lang) tuples, unbound cells stay unbound."""
    from ocaml_rdf_spark.results import parse_sparql_tsv, to_sparql_tsv

    tsv = to_sparql_tsv(solutions)
    vars_, rows = parse_sparql_tsv(tsv)
    assert set(vars_) == {"r", "rname"}
    got = {
        (row["r"], row["rname"]) for row in rows
    }
    want = set()
    for r in solutions.collect():
        want.add(
            (
                (0, r["r"]["lex"], None, None),
                (2, r["rname"]["lex"], r["rname"]["dtype"], None),
            )
        )
    assert got == want


def test_sparql_tsv_term_syntax():
    from ocaml_rdf_spark.results import parse_sparql_tsv

    tsv = '?a\t?b\n<urn:x>\t"v"@en\n_:b0\t"3"^^<http://www.w3.org/2001/XMLSchema#integer>\n"tab\\there"\t\n'
    vars_, rows = parse_sparql_tsv(tsv)
    assert vars_ == ["a", "b"]
    assert rows[0]["a"] == (0, "urn:x", None, None)
    assert rows[0]["b"] == (2, "v", "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "en")
    assert rows[1]["a"] == (1, "b0", None, None)
    assert rows[1]["b"] == (2, "3", "http://www.w3.org/2001/XMLSchema#integer", None)
    assert rows[2]["a"] == (2, "tab\there", "http://www.w3.org/2001/XMLSchema#string", None)
    assert "b" not in rows[2]


def test_sparql_csv_bnode_prefixed(spark):
    """W3C CSV results: blank nodes serialize as _:label (ADVICE r2 —
    IRIs/literals bare is correct, bnodes are not)."""
    from ocaml_rdf_spark.algebra import Ctx, select
    from ocaml_rdf_spark.results import to_sparql_csv
    from ocaml_rdf_spark.types import TRIPLES_SCHEMA, BNode, Iri, Literal, triple_row

    df = spark.createDataFrame(
        [triple_row(BNode("n1"), Iri("urn:p"), Literal("v"), graph="urn:g")],
        schema=TRIPLES_SCHEMA,
    )
    node = BGP([T_(Var("s"), Iri("urn:p"), Var("o"))])
    csv = to_sparql_csv(select(node, Ctx(df)))
    lines = [l for l in csv.split("\r\n") if l]
    body = lines[1].split(",")
    assert "_:n1" in body and "v" in body


def _qt_df(spark):
    from ocaml_rdf_spark.types import Iri, Literal, QuotedTriple

    qt = QuotedTriple(Iri("urn:s"), Iri("urn:p"), Literal("o, v", lang="en"))
    df = spark.createDataFrame(
        [((3, qt.encode(), None, None), (0, "urn:g", None, None))],
        "t struct<kind:tinyint,lex:string,dtype:string,lang:string>, "
        "g struct<kind:tinyint,lex:string,dtype:string,lang:string>",
    )
    return qt, df


def test_sparql_tsv_triple_term_roundtrip(spark):
    """SPARQL 1.2 triple terms survive the TSV round-trip: the cell is the
    NT-star text, the parser rebuilds the identical encoded term."""
    from ocaml_rdf_spark.results import parse_sparql_tsv, to_sparql_tsv

    qt, df = _qt_df(spark)
    tsv = to_sparql_tsv(df)
    assert '<< <urn:s> <urn:p> "o, v"@en >>' in tsv
    vars_, rows = parse_sparql_tsv(tsv)
    assert vars_ == ["t", "g"]
    assert rows[0]["t"] == (3, qt.encode(), None, None)
    assert rows[0]["g"] == (0, "urn:g", None, None)


def test_sparql_csv_triple_term_golden(spark):
    """CSV is lossy but must still write triple terms as their NT-star
    text with RFC-4180 escaping (the cell contains commas and quotes)."""
    from ocaml_rdf_spark.results import to_sparql_csv

    _qt, df = _qt_df(spark)
    lines = to_sparql_csv(df).split("\r\n")
    assert lines[0] == "t,g"
    assert lines[1] == '"<< <urn:s> <urn:p> ""o, v""@en >>",urn:g'
