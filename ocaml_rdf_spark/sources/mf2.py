"""Microformats2 (h-card / h-entry / h-feed …) → RDF triples.

Not in the reference (north-rule extractor scope, like RDFa/microdata):
microformats2 is the third big in-HTML structured-data idiom on the real
web (class-attribute based, microformats.org/wiki/microformats2) —
IndieWeb sites, contact pages, and blog posts carry h-card/h-entry where
they carry no JSON-LD. This implements the documented PARSING SUBSET of
the mf2 parsing spec:

- roots: any element with a class token starting `h-` (all such tokens
  become rdf:type `urn:mf2:<token>`);
- properties: class tokens `p-x` (plain text value), `u-x` (URL value:
  href/src/data by tag, resolved against the page base → IRI object),
  `dt-x` (datetime attr of time/ins/del, else text), `e-x` (subset: the
  collapsed inner text);
- value resolution by tag follows the spec's per-tag table for the
  common cases: img/area alt (p-), abbr title (p-), data/input value,
  a/area/link href (u-), img/audio/video/source src (u-);
- an element that is BOTH a property and a root (`class="p-author
  h-card"`) becomes a nested item linked from the parent through the
  property, and its own properties do NOT leak to the parent (spec
  nesting rule);
- out of scope (documented, rare): value-class-pattern (`.value`
  spans), implied properties (implied name/url/photo), e-* inner-HTML
  payloads.

RDF mapping (no W3C mapping exists; deterministic, like the WebTables
extractor's slugged predicates): items are fresh bnodes, predicates are
`urn:mf2:p:<name>` (the prefix letter is dropped — p-name/u-url/dt-x
map by NAME), types are `urn:mf2:<h-token>` IRIs. u-* objects are IRIs
when resolvable, else dropped; everything else is a plain literal.
Bnodes globalize per (url, extractor) in extract.py like every branch.
"""

from __future__ import annotations

import re

from ..types import RDF_TYPE, BNode, Iri, Literal, Term
from .htmldom import Node, parse_html
from .iri import is_absolute, resolve

_WS = re.compile(r"[ \t\r\n\f\v]+")

_U_TAGS = {
    "a": "href",
    "area": "href",
    "link": "href",
    "img": "src",
    "audio": "src",
    "video": "src",
    "source": "src",
    "iframe": "src",
    "object": "data",
}


def _classes(el: Node) -> list[str]:
    return [c for c in _WS.split((el.get("class") or "").strip()) if c]


def _root_tokens(el: Node) -> list[str]:
    return [c for c in _classes(el) if c.startswith("h-") and len(c) > 2]


def _prop_tokens(el: Node) -> list[tuple[str, str]]:
    """[(kind, name)] for p-/u-/dt-/e- class tokens."""
    out = []
    for c in _classes(el):
        for pref in ("p-", "u-", "dt-", "e-"):
            if c.startswith(pref) and len(c) > len(pref):
                out.append((pref[:-1], c[len(pref):]))
                break
    return out


def _collapse(s: str) -> str:
    return _WS.sub(" ", s).strip()


class Mf2Extractor:
    def __init__(self, base: str | None, bnode_prefix: str = "mf"):
        self.base = base
        self._bn = 0
        self._bnode_prefix = bnode_prefix
        self.triples: list[tuple[Term, Iri, Term]] = []

    def fresh_bnode(self) -> BNode:
        self._bn += 1
        return BNode(f"{self._bnode_prefix}{self._bn}")

    def extract(self, html: str) -> list[tuple[Term, Iri, Term]]:
        root = parse_html(html)
        self._scan_for_roots(root)
        return self.triples

    def _scan_for_roots(self, node: Node) -> None:
        for c in node.children:
            if not isinstance(c, Node):
                continue
            if _root_tokens(c):
                self._item(c)
            else:
                self._scan_for_roots(c)

    def _item(self, el: Node) -> Term:
        node = self.fresh_bnode()
        for t in _root_tokens(el):
            self.triples.append((node, Iri(RDF_TYPE), Iri(f"urn:mf2:{t}")))
        for c in el.children:
            if isinstance(c, Node):
                self._props(c, node)
        return node

    def _props(self, el: Node, item: Term) -> None:
        props = _prop_tokens(el)
        roots = _root_tokens(el)
        if props and roots:
            # nested item as property value; its insides belong to IT
            child = self._item(el)
            for _kind, name in props:
                self.triples.append((item, Iri(f"urn:mf2:p:{name}"), child))
            return
        if roots:
            # root without a property class: independent top-level item
            self._item(el)
            return
        for kind, name in props:
            value = self._value(el, kind)
            if value is not None:
                self.triples.append((item, Iri(f"urn:mf2:p:{name}"), value))
        # property elements may still contain further properties of the
        # SAME item (and nested roots are found through this descent too)
        for c in el.children:
            if isinstance(c, Node):
                self._props(c, item)

    def _value(self, el: Node, kind: str) -> Term | None:
        if kind == "u":
            attr = _U_TAGS.get(el.tag)
            raw = (el.get(attr) or "").strip() if attr else ""
            if not raw:
                raw = _collapse(el.text())
            if not raw:
                return None
            if self.base is not None:
                try:
                    return Iri(resolve(raw, self.base))
                except Exception:
                    return None
            return Iri(raw) if is_absolute(raw) else None
        if kind == "dt":
            if el.tag in ("time", "ins", "del") and el.get("datetime"):
                return Literal(el.get("datetime").strip())
            return Literal(_collapse(el.text()))
        # p- and e- (subset): per-tag attribute values, else collapsed text
        if el.tag in ("img", "area") and el.get("alt") is not None:
            return Literal(el.get("alt"))
        if el.tag == "abbr" and el.get("title"):
            return Literal(el.get("title"))
        if el.tag in ("data", "input") and el.get("value") is not None:
            return Literal(el.get("value"))
        return Literal(_collapse(el.text()))


def extract_mf2(html: str, base: str | None = None) -> list[tuple[Term, Iri, Term]]:
    return Mf2Extractor(base).extract(html)


def extract_mf2_tree(dom: Node, base: str | None = None) -> list[tuple[Term, Iri, Term]]:
    """Shared-DOM variant (extract.py parses once per page)."""
    ex = Mf2Extractor(base)
    ex._scan_for_roots(dom)
    return ex.triples
