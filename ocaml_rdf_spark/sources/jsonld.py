"""JSON-LD → triples: a deterministic subset of JSON-LD 1.0 expansion.

Not in the reference (it has no HTML extractors) — required by the north
rule (BASELINE.json:6): `<script type="application/ld+json">` blocks are
the dominant structured-data carrier on the modern web.

Supported: @context (prefix maps, @vocab, term→IRI, {"@id":..,"@type":"@id"}
coercions), @id, @type (string or list), @graph, @value/@language/@type
literals, @list (→ rdf:first/rest/nil chain, same desugaring as Turtle
collections), nested node objects (→ linked bnodes), arrays, plain
string/number/bool values, relative-IRI resolution against the page URL.
Unsupported keywords are skipped, never fatal (web JSON-LD is dirty; an
extractor that throws on 10^12 documents is useless — errors surface as
zero triples + a lineage error row instead).
"""

from __future__ import annotations

import json
import re
from typing import Any

from ..types import (
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DOUBLE,
    XSD_INTEGER,
    BNode,
    Iri,
    Literal,
    Term,
)
from .iri import is_absolute, resolve

_KEYWORDS = frozenset(
    "@context @id @type @value @language @graph @list @set @reverse @index @vocab @base".split()
)
_TERM_RX = re.compile(r"^[A-Za-z_][\w.-]*$")


class _Ctx:
    __slots__ = ("vocab", "base", "terms", "prefixes", "coercions")

    def __init__(self, base: str | None):
        self.vocab: str | None = None
        self.base = base
        self.terms: dict[str, str] = {}
        self.prefixes: dict[str, str] = {}
        self.coercions: dict[str, str] = {}  # term -> "@id" | datatype iri


def _load_context(ctx: _Ctx, c: Any) -> None:
    if isinstance(c, list):
        for item in c:
            _load_context(ctx, item)
        return
    if isinstance(c, str):
        return  # remote contexts: no network — skip (documented limitation)
    if not isinstance(c, dict):
        return
    if "@vocab" in c and isinstance(c["@vocab"], str):
        ctx.vocab = c["@vocab"]
    if "@base" in c and isinstance(c["@base"], str):
        ctx.base = c["@base"]
    for k, v in c.items():
        if k.startswith("@"):
            continue
        if isinstance(v, str):
            ctx.terms[k] = v
            if v.endswith(("/", "#", ":")):
                ctx.prefixes[k] = v
        elif isinstance(v, dict) and isinstance(v.get("@id"), str):
            ctx.terms[k] = v["@id"]
            t = v.get("@type")
            if isinstance(t, str):
                ctx.coercions[k] = t


def _expand_iri(ctx: _Ctx, value: str, *, vocab: bool) -> str | None:
    if value in ctx.terms:
        value = ctx.terms[value]
    if ":" in value:
        prefix, rest = value.split(":", 1)
        if prefix in ctx.prefixes and not rest.startswith("//"):
            return ctx.prefixes[prefix] + rest
        if is_absolute(value):
            return value
    if vocab and ctx.vocab:
        return ctx.vocab + value
    if ctx.base:
        try:
            return resolve(value, ctx.base)
        except Exception:
            return None
    return None


class JsonLdExtractor:
    def __init__(self, base: str | None, bnode_prefix: str = "jb"):
        self.base = base
        self._bn = 0
        self._bnode_prefix = bnode_prefix
        self.triples: list[tuple[Term, Iri, Term]] = []

    def fresh_bnode(self) -> BNode:
        self._bn += 1
        return BNode(f"{self._bnode_prefix}{self._bn}")

    def extract(self, doc_text: str) -> list[tuple[Term, Iri, Term]]:
        try:
            data = json.loads(doc_text)
        except Exception:
            return []
        self._node(data, _Ctx(self.base))
        return self.triples

    def _node(self, data: Any, ctx: _Ctx) -> Term | None:
        if isinstance(data, list):
            for item in data:
                self._node(item, ctx)
            return None
        if not isinstance(data, dict):
            return None
        if "@context" in data:
            ctx = self._child_ctx(ctx)
            _load_context(ctx, data["@context"])
        if "@graph" in data:
            g = data["@graph"]
            for item in g if isinstance(g, list) else [g]:
                self._node(item, ctx)
            # a node object may coexist with @graph; fall through
        if "@value" in data:
            return self._value_object(data, ctx)
        subj: Term | None = None
        raw_id = data.get("@id")
        if isinstance(raw_id, str):
            if raw_id.startswith("_:"):
                subj = BNode("u" + raw_id[2:])
            else:
                iri = _expand_iri(ctx, raw_id, vocab=False)
                subj = Iri(iri) if iri else None
        has_props = any(k not in ("@context", "@id", "@graph") for k in data)
        if subj is None:
            if not has_props:
                return None
            subj = self.fresh_bnode()
        types = data.get("@type")
        if isinstance(types, str):
            types = [types]
        if isinstance(types, list):
            for t in types:
                if isinstance(t, str):
                    ti = _expand_iri(ctx, t, vocab=True)
                    if ti:
                        self.triples.append((subj, Iri(RDF_TYPE), Iri(ti)))
        for k, v in data.items():
            if k in _KEYWORDS or k.startswith("@"):
                continue
            pred = _expand_iri(ctx, k, vocab=True)
            if pred is None:
                continue
            self._values(subj, Iri(pred), v, ctx, coercion=ctx.coercions.get(k))
        return subj

    def _child_ctx(self, ctx: _Ctx) -> _Ctx:
        c = _Ctx(ctx.base)
        c.vocab = ctx.vocab
        c.terms = dict(ctx.terms)
        c.prefixes = dict(ctx.prefixes)
        c.coercions = dict(ctx.coercions)
        return c

    def _values(self, subj: Term, pred: Iri, v: Any, ctx: _Ctx, coercion: str | None) -> None:
        if isinstance(v, list):
            for item in v:
                self._values(subj, pred, item, ctx, coercion)
            return
        obj = self._to_object(v, ctx, coercion)
        if obj is not None:
            self.triples.append((subj, pred, obj))

    def _to_object(self, v: Any, ctx: _Ctx, coercion: str | None) -> Term | None:
        if isinstance(v, dict):
            if "@value" in v:
                return self._value_object(v, ctx)
            if "@list" in v:
                # RDF list mapping: rdf:first/rest chain ending in rdf:nil
                # (same desugaring as Turtle collections)
                items = v["@list"] if isinstance(v["@list"], list) else [v["@list"]]
                objs = [self._to_object(i, ctx, coercion) for i in items]
                objs = [o for o in objs if o is not None]
                if not objs:
                    return Iri(RDF_NIL)
                cells = [self.fresh_bnode() for _ in objs]
                for i, o in enumerate(objs):
                    self.triples.append((cells[i], Iri(RDF_FIRST), o))
                    rest: Term = cells[i + 1] if i + 1 < len(cells) else Iri(RDF_NIL)
                    self.triples.append((cells[i], Iri(RDF_REST), rest))
                return cells[0]
            return self._node(v, ctx)
        if isinstance(v, bool):
            return Literal("true" if v else "false", dtype=XSD_BOOLEAN)
        if isinstance(v, int):
            return Literal(str(v), dtype=XSD_INTEGER)
        if isinstance(v, float):
            return Literal(repr(v), dtype=XSD_DOUBLE)
        if isinstance(v, str):
            if coercion == "@id":
                iri = _expand_iri(ctx, v, vocab=False)
                return Iri(iri) if iri else None
            if coercion and coercion not in ("@id",):
                dt = _expand_iri(ctx, coercion, vocab=True)
                return Literal(v, dtype=dt) if dt else Literal(v)
            return Literal(v)
        return None

    def _value_object(self, v: dict, ctx: _Ctx) -> Term | None:
        val = v.get("@value")
        if val is None:
            return None
        if isinstance(val, bool):
            lex, dt = ("true" if val else "false"), XSD_BOOLEAN
        elif isinstance(val, int):
            lex, dt = str(val), XSD_INTEGER
        elif isinstance(val, float):
            lex, dt = repr(val), XSD_DOUBLE
        else:
            lex, dt = str(val), None
        lang = v.get("@language")
        if isinstance(lang, str) and lang and dt is None:
            return Literal(lex, lang=lang)
        t = v.get("@type")
        if isinstance(t, str):
            ti = _expand_iri(ctx, t, vocab=True)
            if ti:
                return Literal(lex, dtype=ti)
        return Literal(lex, dtype=dt)


def extract_jsonld(doc_text: str, base: str | None, bnode_prefix: str = "jb"):
    return JsonLdExtractor(base, bnode_prefix).extract(doc_text)
