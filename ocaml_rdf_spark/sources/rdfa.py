"""RDFa Lite 1.1 extraction — attribute walk over the mini-DOM.

Not in the reference (north-rule extractor, BASELINE.json:6). Covers the
RDFa Lite attribute set: vocab, prefix, typeof, property, resource, about,
href/src, content, datatype, plus inherited subjects and lang (from
lang/xml:lang). Chaining: an element with `property` and `typeof` but no
resource/about/href creates a bnode object that becomes the subject for
its subtree (the common schema.org nesting pattern).
"""

from __future__ import annotations

import re

from ..types import RDF_TYPE, BNode, Iri, Literal, Term
from .htmldom import Node, parse_html
from .iri import is_absolute, resolve

_WS = re.compile(r"[ \t\r\n]+")

# initial context: common prefixes every RDFa processor ships (subset)
INITIAL_PREFIXES = {
    "schema": "https://schema.org/",
    "dc": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "og": "http://ogp.me/ns#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "owl": "http://www.w3.org/2002/07/owl#",
}


class RdfaExtractor:
    def __init__(self, base: str | None, bnode_prefix: str = "rb"):
        self.base = base
        self._bn = 0
        self._bnode_prefix = bnode_prefix
        self.triples: list[tuple[Term, Iri, Term]] = []

    def fresh_bnode(self) -> BNode:
        self._bn += 1
        return BNode(f"{self._bnode_prefix}{self._bn}")

    def extract(self, html: str) -> list[tuple[Term, Iri, Term]]:
        root = parse_html(html)
        self._walk(root, subject=None, vocab=None, prefixes=dict(INITIAL_PREFIXES), lang=None)
        return self.triples

    # -- helpers -------------------------------------------------------------

    def _curie_or_iri(self, value: str, vocab: str | None, prefixes: dict, *, term_ok: bool) -> str | None:
        value = value.strip()
        if not value:
            return None
        if ":" in value:
            prefix, rest = value.split(":", 1)
            if prefix in prefixes and not rest.startswith("//"):
                return prefixes[prefix] + rest
            if is_absolute(value):
                return value
            return None
        if term_ok and vocab:
            return vocab + value
        return None

    def _resource_ref(self, value: str, vocab: str | None, prefixes: dict) -> Term | None:
        value = value.strip()
        if value.startswith("_:"):
            return BNode("u" + value[2:])
        iri = self._curie_or_iri(value, vocab, prefixes, term_ok=False)
        if iri:
            return Iri(iri)
        if self.base is not None:
            try:
                return Iri(resolve(value, self.base))
            except Exception:
                return None
        return None

    # -- the walk ------------------------------------------------------------

    def _walk(self, node: Node, subject: Term | None, vocab: str | None, prefixes: dict, lang: str | None):
        for c in node.children:
            if isinstance(c, Node):
                self._element(c, subject, vocab, prefixes, lang)

    def _element(self, el: Node, subject: Term | None, vocab: str | None, prefixes: dict, lang: str | None):
        a = el.attrs
        if "vocab" in a and a["vocab"]:
            vocab = a["vocab"].strip()
        if "prefix" in a and a["prefix"]:
            prefixes = dict(prefixes)
            toks = _WS.split(a["prefix"].strip())
            for i in range(0, len(toks) - 1, 2):
                p = toks[i]
                if p.endswith(":"):
                    prefixes[p[:-1]] = toks[i + 1]
        lang = a.get("lang") or a.get("xml:lang") or lang

        typeof = a.get("typeof")
        prop = a.get("property")
        about = a.get("about")
        resource = a.get("resource") or a.get("href") or a.get("src")

        new_subject: Term | None = None
        obj: Term | None = None

        if about is not None:
            new_subject = self._resource_ref(about, vocab, prefixes)
        if prop is not None and new_subject is None:
            # property element: object is resource/content/text
            if resource is not None:
                obj = self._resource_ref(resource, vocab, prefixes)
            elif typeof is not None:
                obj = self.fresh_bnode()
            else:
                content = a.get("content")
                dt = a.get("datatype")
                dtype = self._curie_or_iri(dt, vocab, prefixes, term_ok=True) if dt else None
                lex = content if content is not None else _WS.sub(" ", el.text()).strip()
                obj = Literal(lex, lang=None if dtype else lang, dtype=dtype)
        elif new_subject is None:
            if resource is not None:
                new_subject = self._resource_ref(resource, vocab, prefixes)
            elif typeof is not None:
                new_subject = self.fresh_bnode()

        # emit typeof
        type_target = None
        if typeof is not None:
            type_target = obj if (prop is not None and isinstance(obj, (Iri, BNode))) else (new_subject or subject)
            if type_target is not None:
                for t in _WS.split(typeof.strip()):
                    ti = self._curie_or_iri(t, vocab, prefixes, term_ok=True)
                    if ti:
                        self.triples.append((type_target, Iri(RDF_TYPE), Iri(ti)))

        # emit property triples
        if prop is not None and obj is not None and subject is not None:
            for p in _WS.split(prop.strip()):
                pi = self._curie_or_iri(p, vocab, prefixes, term_ok=True)
                if pi:
                    self.triples.append((subject, Iri(pi), obj))

        # subject for children: chained object > new subject > inherited
        child_subject = subject
        if prop is not None and isinstance(obj, (Iri, BNode)):
            child_subject = obj
        elif new_subject is not None:
            child_subject = new_subject
        elif subject is None and typeof is not None and type_target is not None:
            child_subject = type_target

        # literal property elements don't recurse for RDFa semantics of text,
        # but children may still carry their own about/typeof — recurse always.
        self._walk(el, child_subject, vocab, prefixes, lang)


def extract_rdfa(html: str, base: str | None, bnode_prefix: str = "rb"):
    return RdfaExtractor(base, bnode_prefix).extract(html)


def extract_rdfa_tree(root, base: str | None, bnode_prefix: str = "rb"):
    """RDFa over an already-parsed DOM (shared-parse fast path)."""
    x = RdfaExtractor(base, bnode_prefix)
    x._walk(root, subject=None, vocab=None, prefixes=dict(INITIAL_PREFIXES), lang=None)
    return x.triples
