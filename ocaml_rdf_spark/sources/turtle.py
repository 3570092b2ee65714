"""Turtle reader — W3C Turtle 1.1 grammar, streaming recursive descent.

Parity: rdf_ttl.ml + rdf_ttl_lex.ml (ulex) + rdf_ttl_parser.mly (SURVEY
§2.2): prefixes/@base (+ SPARQL-style PREFIX/BASE), `a`, `;`/`,` predicate
and object lists, `[...]` blank-node property lists, `(...)` collections
desugared to rdf:first/rest/nil, numeric/boolean shorthand literals, short
and long strings with escapes, lang tags, datatyped literals, relative-IRI
resolution against the base, comments, UTF-8.

Designed to run inside mapInPandas over Arrow batches of document strings:
instantiate `TurtleParser` once per document (cheap), call `.parse()`, get
a list of (s, p, o) Term triples. Blank-node labels are kept document-local;
the extraction stage rewrites them to partition-safe deterministic ids
(SURVEY §1.3).
"""

from __future__ import annotations

import re
from typing import Iterator

from ..types import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, XSD_BOOLEAN, XSD_DECIMAL, XSD_DOUBLE, XSD_INTEGER, BNode, Iri, Literal, Term
from .iri import resolve, validate
from .ntriples import _unescape  # same ECHAR/UCHAR tables


class TurtleSyntaxError(ValueError):
    def __init__(self, msg: str, pos: int):
        super().__init__(f"Turtle syntax error at offset {pos}: {msg}")
        self.pos = pos


_WS_COMMENT = re.compile(r"(?:[ \t\r\n]+|#[^\r\n]*)+")
# IRIREF ::= '<' ([^#x00-#x20<>"{}|^`\] | UCHAR)* '>' — \uXXXX/\UXXXXXXXX
# escapes ARE legal inside IRIREFs (any other backslash breaks the match)
_IRIREF = re.compile(r'<((?:[^<>"{}|^`\\\x00-\x20]|\\u[0-9a-fA-F]{4}|\\U[0-9a-fA-F]{8})*)>')
# PLX = %-encoded pair | PN_LOCAL_ESC (backslash escape) \u2014 a single unit
_PLX = r"(?:%[0-9A-Fa-f]{2}|\\[_~.\-!$&'()*+,;=/?#@%])"
_PNL_CHAR = rf"(?:[\w\u00C0-\uFFFF:-]|{_PLX})"  # PN_CHARS | ':' (no dot)
_PNAME = re.compile(
    r"((?:[A-Za-z\u00C0-\uFFFF][\w\u00C0-\uFFFF.-]*)?):"  # prefix (may be empty)
    rf"({_PNL_CHAR}(?:(?:{_PNL_CHAR}|\.)*{_PNL_CHAR})?)?"  # local: no trailing dot
)
_BLANK = re.compile(r"_:([\w\u00C0-\uFFFF](?:[\w\u00C0-\uFFFF.-]*[\w\u00C0-\uFFFF-])?)")
_LANGTAG = re.compile(r"@([A-Za-z]+(?:-[A-Za-z0-9]+)*)")
_NUMBER = re.compile(
    r"[+-]?(?:"
    r"(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+"  # double
    r"|\d*\.\d+"  # decimal (digits required after the dot)
    r"|\d+"  # integer (a trailing bare '.' is the statement terminator)
    r")"
)
_BOOLEAN = re.compile(r"(?:true|false)(?![\w\u00C0-\uFFFF.-])")
_ANON = re.compile(r"\[[ \t\r\n]*\]")
_PREFIX_DIR = re.compile(r"@prefix\b")
_BASE_DIR = re.compile(r"@base\b")
_SPARQL_PREFIX = re.compile(r"(?i:PREFIX)\b")
_SPARQL_BASE = re.compile(r"(?i:BASE)\b")
_A_VERB = re.compile(r"a(?![\w\u00C0-\uFFFF.-])")
_LOCAL_ESC = re.compile(r"\\([_~.\-!$&'()*+,;=/?#@%])")

_LONG_SQ = "'''"
_LONG_DQ = '"""'


class TurtleParser:
    def __init__(self, doc: str, base: str | None = None, bnode_prefix: str = "b"):
        self.s = doc
        self.i = 0
        self.n = len(doc)
        self.base = base
        self.prefixes: dict[str, str] = {}
        self._bn = 0
        self._bnode_prefix = bnode_prefix
        self.triples: list[tuple[Term, Iri, Term]] = []

    # -- machinery ----------------------------------------------------------

    def err(self, msg: str):
        raise TurtleSyntaxError(msg, self.i)

    def ws(self):
        m = _WS_COMMENT.match(self.s, self.i)
        if m:
            self.i = m.end()

    def eof(self) -> bool:
        self.ws()
        return self.i >= self.n

    def peek(self) -> str:
        return self.s[self.i] if self.i < self.n else ""

    def match(self, rx: re.Pattern):
        self.ws()
        m = rx.match(self.s, self.i)
        if m:
            self.i = m.end()
        return m

    def expect(self, ch: str):
        self.ws()
        if self.s[self.i : self.i + len(ch)] != ch:
            self.err(f"expected {ch!r}")
        self.i += len(ch)

    def fresh_bnode(self) -> BNode:
        self._bn += 1
        return BNode(f"{self._bnode_prefix}{self._bn}")

    # -- terminals ----------------------------------------------------------

    def iriref_or_pname(self) -> Iri | None:
        m = self.match(_IRIREF)
        if m:
            raw = _unescape(m.group(1), 0, allow_echar=False)
            return Iri(validate(resolve(raw, self.base)))
        m = self.match(_PNAME)
        if m:
            prefix, local = m.group(1), m.group(2) or ""
            if prefix not in self.prefixes:
                self.err(f"undefined prefix {prefix!r}:")
            local = _LOCAL_ESC.sub(r"\1", local)
            return Iri(self.prefixes[prefix] + local)
        return None

    def _long_string(self, quote3: str) -> str | None:
        if self.s[self.i : self.i + 3] != quote3:
            return None
        j = self.i + 3
        s = self.s
        while j < self.n:
            if s[j] == "\\":
                j += 2
                continue
            if s[j : j + 3] == quote3:
                # greedily include up to 2 extra quote chars inside
                while s[j + 3 : j + 4] == quote3[0] and s[j + 1 : j + 4] == quote3:
                    j += 1
                raw = s[self.i + 3 : j]
                self.i = j + 3
                return _unescape(raw, 0)
            j += 1
        self.err("unterminated long string")

    def _short_string(self, quote: str) -> str | None:
        if self.peek() != quote:
            return None
        j = self.i + 1
        s = self.s
        while j < self.n:
            c = s[j]
            if c == "\\":
                j += 2
                continue
            if c == quote:
                raw = s[self.i + 1 : j]
                self.i = j + 1
                return _unescape(raw, 0)
            if c in "\r\n":
                break
            j += 1
        self.err("unterminated string")

    def string(self) -> str | None:
        self.ws()
        for q3 in (_LONG_DQ, _LONG_SQ):
            r = self._long_string(q3)
            if r is not None:
                return r
        for q in ('"', "'"):
            r = self._short_string(q)
            if r is not None:
                return r
        return None

    def literal(self) -> Literal | None:
        lex = self.string()
        if lex is not None:
            m = self.match(_LANGTAG)
            if m:
                return Literal(lex, lang=m.group(1))
            self.ws()
            if self.s[self.i : self.i + 2] == "^^":
                self.i += 2
                dt = self.iriref_or_pname()
                if dt is None:
                    self.err("expected datatype IRI after ^^")
                return Literal(lex, dtype=dt.value)
            return Literal(lex)
        m = self.match(_NUMBER)
        if m:
            tok = m.group(0)
            if "e" in tok or "E" in tok:
                return Literal(tok, dtype=XSD_DOUBLE)
            if "." in tok:
                return Literal(tok, dtype=XSD_DECIMAL)
            return Literal(tok, dtype=XSD_INTEGER)
        m = self.match(_BOOLEAN)
        if m:
            return Literal(m.group(0), dtype=XSD_BOOLEAN)
        return None

    # -- grammar ------------------------------------------------------------

    def parse(self) -> list[tuple[Term, Iri, Term]]:
        while not self.eof():
            self.statement()
        return self.triples

    def statement(self):
        if self.match(_PREFIX_DIR):
            self._prefix_decl(dot=True)
        elif self.match(_BASE_DIR):
            self._base_decl(dot=True)
        elif self._lookahead_sparql_prefix():
            self._prefix_decl(dot=False)
        elif self._lookahead_sparql_base():
            self._base_decl(dot=False)
        else:
            self.triples_stmt()
            self.expect(".")

    def _lookahead_sparql_prefix(self) -> bool:
        self.ws()
        m = _SPARQL_PREFIX.match(self.s, self.i)
        if m:
            self.i = m.end()
            return True
        return False

    def _lookahead_sparql_base(self) -> bool:
        self.ws()
        m = _SPARQL_BASE.match(self.s, self.i)
        if m:
            self.i = m.end()
            return True
        return False

    def _prefix_decl(self, dot: bool):
        self.ws()
        m = _PNAME.match(self.s, self.i)
        if not m or m.group(2):
            self.err("expected PNAME_NS in prefix declaration")
        self.i = m.end()
        prefix = m.group(1)
        m2 = self.match(_IRIREF)
        if not m2:
            self.err("expected IRIREF in prefix declaration")
        iri = _unescape(m2.group(1), 0, allow_echar=False)
        self.prefixes[prefix] = resolve(iri, self.base)
        if dot:
            self.expect(".")

    def _base_decl(self, dot: bool):
        m = self.match(_IRIREF)
        if not m:
            self.err("expected IRIREF in base declaration")
        iri = _unescape(m.group(1), 0, allow_echar=False)
        self.base = validate(resolve(iri, self.base))
        if dot:
            self.expect(".")

    def triples_stmt(self):
        self.ws()
        if self.peek() == "[" and not _ANON.match(self.s, self.i):
            # blankNodePropertyList as subject; predicateObjectList optional
            subj = self.bnode_property_list()
            self.ws()
            if self.peek() != ".":
                self.predicate_object_list(subj)
            return
        subj = self.subject()
        self.predicate_object_list(subj)

    def quoted_triple(self):
        """Turtle-star `<< qtSubject verb qtObject >>` (RDF-star CG).
        v1: single-level — a nested quote errors."""
        from ..types import QuotedTriple

        self.i += 2  # '<<'
        self.ws()
        if self.s.startswith("<<", self.i):
            self.err("nested quoted triples are not supported (v1)")
        m = self.match(_BLANK)
        if m:
            s: Term = BNode(m.group(1))
        else:
            s = self.iriref_or_pname()
            if s is None:
                self.err("expected quoted-triple subject")
        p = self.verb()
        self.ws()
        if self.s.startswith("<<", self.i):
            self.err("nested quoted triples are not supported (v1)")
        m = self.match(_BLANK)
        if m:
            o: Term = BNode(m.group(1))
        else:
            o = self.literal()
            if o is None:
                o = self.iriref_or_pname()
            if o is None:
                self.err("expected quoted-triple object")
        self.ws()
        if not self.s.startswith(">>", self.i):
            self.err("expected '>>' closing quoted triple")
        self.i += 2
        try:
            return QuotedTriple(s, p, o)
        except ValueError as e:
            self.err(str(e))

    def subject(self) -> Term:
        self.ws()
        c = self.peek()
        if self.s.startswith("<<", self.i):
            return self.quoted_triple()
        if c == "(":
            return self.collection()
        m = self.match(_ANON)
        if m:
            return self.fresh_bnode()
        m = self.match(_BLANK)
        if m:
            return BNode(m.group(1))
        t = self.iriref_or_pname()
        if t is None:
            self.err("expected subject")
        return t

    def verb(self) -> Iri:
        self.ws()
        m = _A_VERB.match(self.s, self.i)
        if m:
            self.i = m.end()
            return Iri(RDF_TYPE)
        t = self.iriref_or_pname()
        if t is None:
            self.err("expected predicate")
        return t

    def object_(self) -> Term:
        self.ws()
        c = self.peek()
        if self.s.startswith("<<", self.i):
            return self.quoted_triple()
        if c == "(":
            return self.collection()
        if c == "[":
            m = _ANON.match(self.s, self.i)
            if m:
                self.i = m.end()
                return self.fresh_bnode()
            return self.bnode_property_list()
        m = self.match(_BLANK)
        if m:
            return BNode(m.group(1))
        lit = self.literal()
        if lit is not None:
            return lit
        t = self.iriref_or_pname()
        if t is None:
            self.err("expected object")
        return t

    def predicate_object_list(self, subj: Term):
        while True:
            p = self.verb()
            while True:
                o = self.object_()
                self.triples.append((subj, p, o))
                self.ws()
                if self.s.startswith("{|", self.i):
                    # RDF-star annotation: assert (s, p, o) AND annotate
                    # << s p o >> with the bracketed predicateObjectList
                    from ..types import QuotedTriple

                    self.i += 2
                    try:
                        qt = QuotedTriple(subj, p, o)
                    except ValueError as e:
                        self.err(str(e))
                    self.predicate_object_list(qt)
                    self.ws()
                    if not self.s.startswith("|}", self.i):
                        self.err("expected '|}' closing annotation")
                    self.i += 2
                    self.ws()
                if self.peek() == ",":
                    self.i += 1
                    continue
                break
            self.ws()
            if self.peek() == ";":
                self.i += 1
                self.ws()
                # ';' may be trailing (before '.', ']', or another ';')
                while self.peek() == ";":
                    self.i += 1
                    self.ws()
                if self.peek() in (".", "]", "") or self.peek() == ",":
                    return
                continue
            return

    def bnode_property_list(self) -> BNode:
        self.expect("[")
        node = self.fresh_bnode()
        self.predicate_object_list(node)
        self.ws()
        self.expect("]")
        return node

    def collection(self) -> Term:
        self.expect("(")
        items: list[Term] = []
        while True:
            self.ws()
            if self.peek() == ")":
                self.i += 1
                break
            if self.i >= self.n:
                self.err("unterminated collection")
            items.append(self.object_())
        if not items:
            return Iri(RDF_NIL)
        first_iri, rest_iri, nil = Iri(RDF_FIRST), Iri(RDF_REST), Iri(RDF_NIL)
        nodes = [self.fresh_bnode() for _ in items]
        for k, (node, item) in enumerate(zip(nodes, items)):
            self.triples.append((node, first_iri, item))
            self.triples.append((node, rest_iri, nodes[k + 1] if k + 1 < len(nodes) else nil))
        return nodes[0]


def parse_turtle(doc: str, base: str | None = None, bnode_prefix: str = "b") -> Iterator[tuple[Term, Iri, Term]]:
    return iter(TurtleParser(doc, base=base, bnode_prefix=bnode_prefix).parse())
