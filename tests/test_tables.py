"""WebTables recovery extractor (sources/tables.py) + its opt-in
integration into the extraction stage (extract.py, extractor 'tables').

Engine addition beyond the reference (ocaml-rdf parses explicit RDF
syntaxes only); mapping follows the public WebTables recipe (Cafarella
et al., VLDB 2008): header-rowed tables are relational, rows are
entities, column headers are properties."""

from __future__ import annotations

from ocaml_rdf_spark.sources.tables import NS, extract_tables
from ocaml_rdf_spark.types import XSD_DECIMAL, XSD_INTEGER, BNode, Iri, Literal

RELATIONAL = """
<table>
 <tr><th>Name</th><th>Population</th><th>Site</th></tr>
 <tr><td>Berlin</td><td>3769495</td><td><a href="/wiki/Berlin">link</a></td></tr>
 <tr><td>Paris</td><td>2.1</td><td><a href="https://paris.example/">p</a></td></tr>
 <tr><td>Oslo</td><td></td></tr>
</table>
"""


def _by_pred(triples):
    out = {}
    for s, p, o in triples:
        out.setdefault(p.value, []).append((s, o))
    return out


def test_relational_table_mapping():
    got = _by_pred(extract_tables(RELATIONAL, base="https://ex.org/page"))
    assert got["http://www.w3.org/1999/02/22-rdf-syntax-ns#type"][0][1] == Iri(NS + "Table")
    assert got[NS + "columnCount"][0][1] == Literal("3", dtype=XSD_INTEGER)
    assert got[NS + "rowCount"][0][1] == Literal("3", dtype=XSD_INTEGER)
    # header slugs lowercase; values typed: int, decimal, plain
    names = [o for _s, o in got[NS + "col/name"]]
    assert names == [Literal("Berlin"), Literal("Paris"), Literal("Oslo")]
    pops = [o for _s, o in got[NS + "col/population"]]
    assert pops == [
        Literal("3769495", dtype=XSD_INTEGER),
        Literal("2.1", dtype=XSD_DECIMAL),
    ]
    # single-<a> cells become IRIs resolved against the page
    sites = [o for _s, o in got[NS + "col/site"]]
    assert sites == [Iri("https://ex.org/wiki/Berlin"), Iri("https://paris.example/")]
    # ragged row 2 has no site/population cells → absent, not padded
    assert len(got[NS + "rowIndex"]) == 2 + 1  # 3 rows


def test_layout_and_headerless_tables_skipped():
    assert extract_tables("<table><tr><td>a</td><td>b</td></tr></table>") == []
    assert extract_tables("<table><tr><th>only header</th></tr></table>") == []
    # mixed th/td first row outside thead is not a header row
    assert extract_tables(
        "<table><tr><th>h</th><td>d</td></tr><tr><td>1</td><td>2</td></tr></table>"
    ) == []


def test_thead_td_row_counts_as_header():
    got = extract_tables(
        "<table><thead><tr><td>H One</td></tr></thead>"
        "<tbody><tr><td>42</td></tr></tbody></table>"
    )
    preds = {p.value for _s, p, _o in got}
    assert NS + "col/h-one" in preds


def test_header_slug_percent_encoding():
    got = extract_tables(
        "<table><tr><th>Preis (€)</th></tr><tr><td>9</td></tr></table>"
    )
    preds = {p.value for _s, p, _o in got}
    assert NS + "col/preis-%28%E2%82%AC%29" in preds


def test_nested_table_is_its_own_relation():
    html = """
    <table><tr><th>Outer</th></tr>
     <tr><td><table><tr><th>Inner</th></tr><tr><td>5</td></tr></table></td></tr>
    </table>"""
    got = extract_tables(html)
    preds = [p.value for _s, p, _o in got]
    assert NS + "col/inner" in preds
    # the outer table's single data cell holds only the nested table →
    # no outer cell value triple, but the outer row exists
    assert NS + "col/outer" not in preds
    assert preds.count(NS + "rowIndex") == 2


def test_mixed_content_cell_is_text_not_link():
    got = extract_tables(
        '<table><tr><th>C</th></tr>'
        '<tr><td>see <a href="https://x.example/">x</a></td></tr></table>'
    )
    vals = [o for _s, p, o in got if p.value == NS + "col/c"]
    assert vals == [Literal("see x")]


def test_extract_page_tables_opt_in():
    from ocaml_rdf_spark.extract import extract_page

    page = f"<html><body>{RELATIONAL}</body></html>".encode()
    off_rows, off_errs = extract_page("https://ex.org/p", page)
    assert off_rows == [] and off_errs == []  # marker fast path skips
    on_rows, on_errs = extract_page("https://ex.org/p", page, tables=True)
    assert on_errs == []
    assert on_rows and all(r[9] == "tables" for r in on_rows)
    # bnode labels are globally salted + deterministic (url|ext|label sha1)
    again, _ = extract_page("https://ex.org/p", page, tables=True)
    assert on_rows == again
    other, _ = extract_page("https://ex.org/q", page, tables=True)
    assert {r[1] for r in other}.isdisjoint({r[1] for r in on_rows if r[0] == 1})


def test_extract_triples_tables_flag(spark):
    from ocaml_rdf_spark.extract import extract_triples, split_errors

    pages = spark.createDataFrame(
        [("https://ex.org/p", bytearray(f"<html><body>{RELATIONAL}</body></html>".encode()))],
        "url string, html binary",
    )
    t, e = split_errors(extract_triples(pages, tables=True))
    rows = t.collect()
    assert e.count() == 0
    assert {r.extractor for r in rows} == {"tables"}
    assert sum(1 for r in rows if r.pred == NS + "rowIndex") == 3
    assert extract_triples(pages).count() == 0  # default: off


def test_tables_corpus_golden_pr(spark):
    """Opt-in corpus path: gen_pages_df(tables=True) + the tables
    extractor must reproduce the generator's golden table triples with
    P/R = 1.0 (same gate as every other extractor), keep the text
    byte-identity invariant, and leave the frozen default corpus
    untouched."""
    from pyspark.sql import functions as F

    from ocaml_rdf_spark.datagen import gen_golden_df, gen_pages_df
    from ocaml_rdf_spark.extract import extract_text_df, extract_triples, split_errors
    from ocaml_rdf_spark.types import TRIPLE_KEY

    N = 120
    pages = gen_pages_df(spark, N, parts=4, tables=True).cache()
    triples, errors = split_errors(extract_triples(pages, tables=True))
    assert errors.count() == 0
    got = triples.filter(F.col("extractor") == "tables").select(*TRIPLE_KEY)
    want = (
        gen_golden_df(spark, N, parts=4, tables=True)
        .filter(F.col("extractor") == "tables")
        .select(*TRIPLE_KEY)
    )
    n_got, n_want = got.count(), want.count()
    assert n_want > 0
    assert got.intersect(want).count() == n_got == n_want  # exact P/R = 1.0
    # byte-identical extracted text with the table block present
    recomputed = extract_text_df(pages).withColumnRenamed("text", "text2")
    bad = pages.select("url", "text").join(recomputed, "url").filter(
        F.col("text") != F.col("text2")
    )
    assert bad.count() == 0
    # frozen default corpus unchanged: tables=False html has no <table>
    frozen = gen_pages_df(spark, 50, parts=2)
    assert frozen.filter(F.col("html").cast("string").contains("<table")).count() == 0
