"""HTML Microdata → RDF, per the W3C microdata-to-RDF mapping (subset).

Not in the reference (north-rule extractor, BASELINE.json:6). Covers
itemscope/itemtype/itemid/itemprop; property IRIs are the itemtype's
vocabulary base + name (schema.org style) or absolute IRIs; URL-valued
elements (a/link/img/...) produce IRI objects resolved against the page
URL; nested itemscopes produce linked items; `content`/datetime/meta
handled. itemref is NOT supported (rare; documented limitation).
"""

from __future__ import annotations

import re

from ..types import RDF_TYPE, BNode, Iri, Literal, Term
from .htmldom import Node, parse_html
from .iri import is_absolute, resolve

_WS = re.compile(r"[ \t\r\n]+")
_URL_PROP_TAGS = {
    "a": "href",
    "area": "href",
    "link": "href",
    "audio": "src",
    "embed": "src",
    "iframe": "src",
    "img": "src",
    "source": "src",
    "track": "src",
    "video": "src",
    "object": "data",
}


def _vocab_of(itemtype: str) -> str:
    """Vocabulary base for property-name expansion: up to the last / or #."""
    for sep in ("#", "/"):
        i = itemtype.rfind(sep)
        if i >= 0:
            return itemtype[: i + 1]
    return itemtype


class MicrodataExtractor:
    def __init__(self, base: str | None, bnode_prefix: str = "mb"):
        self.base = base
        self._bn = 0
        self._bnode_prefix = bnode_prefix
        self.triples: list[tuple[Term, Iri, Term]] = []

    def fresh_bnode(self) -> BNode:
        self._bn += 1
        return BNode(f"{self._bnode_prefix}{self._bn}")

    def extract(self, html: str) -> list[tuple[Term, Iri, Term]]:
        root = parse_html(html)
        for el in root.walk():
            if el.tag == "#root":
                continue
            if el.has("itemscope") and not el.has("itemprop"):
                self._item(el)
        return self.triples

    def _item(self, el: Node) -> Term:
        itemid = el.get("itemid")
        node: Term
        if itemid and self.base is not None:
            try:
                node = Iri(resolve(itemid.strip(), self.base))
            except Exception:
                node = self.fresh_bnode()
        elif itemid and is_absolute(itemid.strip()):
            node = Iri(itemid.strip())
        else:
            node = self.fresh_bnode()
        vocab = ""
        itemtype = el.get("itemtype")
        if itemtype:
            types = _WS.split(itemtype.strip())
            if types and types[0]:
                vocab = _vocab_of(types[0])
            for t in types:
                if t and is_absolute(t):
                    self.triples.append((node, Iri(RDF_TYPE), Iri(t)))
        self._props(el, node, vocab)
        return node

    def _props(self, scope: Node, node: Term, vocab: str):
        for c in scope.children:
            if not isinstance(c, Node):
                continue
            prop = c.get("itemprop")
            if prop:
                if c.has("itemscope"):
                    child = self._item(c)
                    self._emit(node, prop, child, vocab)
                else:
                    value = self._value(c)
                    if value is not None:
                        self._emit(node, prop, value, vocab)
                    # non-itemscope property elements may still contain
                    # further properties of THIS item
                    self._props(c, node, vocab)
                continue
            if c.has("itemscope"):
                # unreferenced nested top-level item: handled by extract()'s walk
                self._item(c)
                continue
            self._props(c, node, vocab)

    def _emit(self, node: Term, props: str, value: Term, vocab: str):
        for p in _WS.split(props.strip()):
            if not p:
                continue
            if is_absolute(p):
                pred = p
            elif vocab:
                pred = vocab + p
            else:
                continue
            self.triples.append((node, Iri(pred), value))

    def _value(self, el: Node) -> Term | None:
        url_attr = _URL_PROP_TAGS.get(el.tag)
        if url_attr is not None:
            v = el.get(url_attr)
            if v is None:
                return None
            v = v.strip()
            if self.base is not None:
                try:
                    return Iri(resolve(v, self.base))
                except Exception:
                    return None
            return Iri(v) if is_absolute(v) else None
        if el.tag == "meta":
            return Literal(el.get("content") or "")
        if el.tag == "data" and el.get("value") is not None:
            return Literal(el.get("value"))
        if el.tag in ("time",) and el.get("datetime") is not None:
            return Literal(el.get("datetime"))
        if el.get("content") is not None:
            return Literal(el.get("content"))
        return Literal(_WS.sub(" ", el.text()).strip())


def extract_microdata(html: str, base: str | None, bnode_prefix: str = "mb"):
    return MicrodataExtractor(base, bnode_prefix).extract(html)


def extract_microdata_tree(root, base: str | None, bnode_prefix: str = "mb"):
    """Microdata over an already-parsed DOM (shared-parse fast path)."""
    x = MicrodataExtractor(base, bnode_prefix)
    for el in root.walk():
        if el.tag == "#root":
            continue
        if el.has("itemscope") and not el.has("itemprop"):
            x._item(el)
    return x.triples
