"""Microformats2 extractor (sources/mf2.py): root/property parsing, the
per-tag value table, nesting isolation, and the opt-in extract.py gate."""

from __future__ import annotations

from ocaml_rdf_spark.sources.mf2 import extract_mf2
from ocaml_rdf_spark.types import RDF_TYPE, BNode, Iri, Literal

HCARD = """<html><body>
<div class="h-card">
  <span class="p-name">Ada   Lovelace</span>
  <a class="u-url" href="/ada">home</a>
  <img class="u-photo" src="ada.png" alt="portrait">
  <time class="dt-bday" datetime="1815-12-10">Dec 10</time>
  <abbr class="p-org" title="Analytical Engines Ltd">AEL</abbr>
</div>
</body></html>"""


def _by_pred(triples):
    out = {}
    for s, p, o in triples:
        out.setdefault(p.value, []).append((s, o))
    return out

def test_hcard_properties_and_value_table():
    t = extract_mf2(HCARD, base="https://ex.org/people")
    by = _by_pred(t)
    assert by[RDF_TYPE][0][1] == Iri("urn:mf2:h-card")
    assert by["urn:mf2:p:name"][0][1] == Literal("Ada Lovelace")  # ws collapsed
    assert by["urn:mf2:p:url"][0][1] == Iri("https://ex.org/ada")  # resolved
    assert by["urn:mf2:p:photo"][0][1] == Iri("https://ex.org/ada.png")
    assert by["urn:mf2:p:bday"][0][1] == Literal("1815-12-10")  # datetime attr
    assert by["urn:mf2:p:org"][0][1] == Literal("Analytical Engines Ltd")  # abbr title
    # all property subjects are the same item bnode
    assert len({s for p, pairs in by.items() for s, _ in pairs}) == 1


def test_nested_item_via_property_class():
    html = """<article class="h-entry">
      <h1 class="p-name">Post</h1>
      <div class="p-author h-card"><span class="p-name">Bob</span></div>
    </article>"""
    t = extract_mf2(html)
    by = _by_pred(t)
    entry = [s for s, o in by[RDF_TYPE] if o == Iri("urn:mf2:h-entry")][0]
    card = [s for s, o in by[RDF_TYPE] if o == Iri("urn:mf2:h-card")][0]
    assert (entry, card) in by["urn:mf2:p:author"]
    names = dict((s, o) for s, o in by["urn:mf2:p:name"])
    # "Bob" belongs to the card, NOT the entry (nesting isolation)
    assert names[card] == Literal("Bob") and names[entry] == Literal("Post")


def test_independent_sibling_roots():
    html = '<div class="h-card"><b class="p-name">A</b></div><div class="h-card"><b class="p-name">B</b></div>'
    t = extract_mf2(html)
    by = _by_pred(t)
    assert len(by[RDF_TYPE]) == 2
    assert len({s for s, _ in by["urn:mf2:p:name"]}) == 2


def test_u_without_base_requires_absolute():
    html = '<div class="h-card"><a class="u-url" href="/rel">x</a><a class="u-uid" href="https://a.ex/p">y</a></div>'
    by = _by_pred(extract_mf2(html))
    assert "urn:mf2:p:url" not in by  # relative, no base -> dropped
    assert by["urn:mf2:p:uid"][0][1] == Iri("https://a.ex/p")


def test_no_mf2_no_triples():
    assert extract_mf2("<div class='card h'><p class='name'>x</p></div>") == []
    assert extract_mf2("<div class='hello'>h-card in text only</div>") == []


def test_extract_page_gate_and_globalized_bnodes():
    from ocaml_rdf_spark.extract import extract_page

    html = HCARD.encode()
    off, _ = extract_page("https://ex.org/p", html)  # default: branch off
    assert not any(r[9] == "mf2" for r in off)
    on, errs = extract_page("https://ex.org/p", html, mf2=True)
    mf2_rows = [r for r in on if r[9] == "mf2"]
    assert errs == [] and len(mf2_rows) == 6
    # bnode labels are globalized per (url, extractor): 16-hex sha1
    assert all(r[0] == 1 and len(r[1]) == 16 and int(r[1], 16) >= 0 for r in mf2_rows)
