"""Page-metadata extractor (sources/meta.py): golden mappings, the
opt-in gate in the extraction stage, and non-emission rules."""

from __future__ import annotations

from ocaml_rdf_spark.extract import extract_page
from ocaml_rdf_spark.sources.htmldom import parse_html
from ocaml_rdf_spark.sources.meta import extract_meta_tree
from ocaml_rdf_spark.types import Iri, Literal

BASE = "https://x.example/a/b"

HTML = """<html><head>
<title> Two   Words </title>
<meta property="og:title" content="OG Title">
<meta property="og:url" content="https://canon.example/page">
<meta property="og:image" content="/img/1.png">
<meta property="og:image:secure_url" content="https://cdn.example/i.png">
<meta property="og:image:width" content="640">
<meta name="twitter:card" content="summary">
<meta name="Description" content="A page.">
<meta name="viewport" content="width=device-width">
<meta name="keywords" content="">
<link rel="alternate" hreflang="fr-CA" href="/fr/p">
<link rel="alternate" type="application/rss+xml" href="/feed">
<link rel="stylesheet" href="/s.css">
</head><body><title>second title ignored</title></body></html>"""


def test_golden_mapping():
    rows = extract_meta_tree(parse_html(HTML), base=BASE)
    got = {(p.value, o) for _s, p, o in rows}
    assert all(s == Iri(BASE) for s, _p, _o in rows)
    assert got == {
        ("urn:x-ords:meta:title", Literal("Two Words")),
        ("http://ogp.me/ns#title", Literal("OG Title")),
        ("http://ogp.me/ns#url", Iri("https://canon.example/page")),
        ("http://ogp.me/ns#image", Iri("https://x.example/img/1.png")),
        ("http://ogp.me/ns#image:secure_url", Iri("https://cdn.example/i.png")),
        ("http://ogp.me/ns#image:width", Literal("640")),
        ("urn:x-ords:meta:twitter:card", Literal("summary")),
        ("urn:x-ords:meta:description", Literal("A page.")),
        ("urn:x-ords:meta:alternate:fr-CA", Iri("https://x.example/fr/p")),
    }
    # viewport (not allowlisted), empty keywords, rel-without-hreflang,
    # stylesheet, and the second <title> all emit nothing — exactly 9 rows
    assert len(rows) == 9


def test_extract_page_gate():
    html = b'<html><head><meta property="og:title" content="T"></head></html>'
    on, errs_on = extract_page("https://h.example/p", html, meta=True)
    off, errs_off = extract_page("https://h.example/p", html)
    assert errs_on == [] and errs_off == []
    assert any(r[2] == "http://ogp.me/ns#title" for r in on)
    # og: uses property= (an RDFa marker) so the page reaches the DOM parse
    # even with meta off — but the meta branch itself must stay silent
    assert not any(r[9] == "meta" for r in off)

    # title-only page: no RDFa marker at all — only the meta gate opens it
    tonly = b"<html><head><title>T</title></head></html>"
    assert extract_page("https://h.example/t", tonly)[0] == []
    rows, _ = extract_page("https://h.example/t", tonly, meta=True)
    assert rows and rows[0][2] == "urn:x-ords:meta:title"


def test_dom_shared_with_other_extractors():
    html = (
        b"<html><head><title>T</title></head><body>"
        b'<div itemscope itemtype="http://schema.org/Person">'
        b'<span itemprop="name">Ada</span></div></body></html>'
    )
    rows, errs = extract_page("https://h.example/p", html, meta=True)
    assert errs == []
    exts = {r[9] for r in rows}
    assert exts == {"meta", "microdata"}
