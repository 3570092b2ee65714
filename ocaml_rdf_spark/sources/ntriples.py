"""N-Triples / N-Quads reader — W3C N-Triples 1.1 grammar.

Parity: the reference routes NT through its Turtle machinery
(rdf_ttl.ml, SURVEY §2.2); here it is a dedicated fast path: line split +
a small hand scanner per line, no regex backtracking, designed to be run
over whole Arrow batches inside mapInPandas (one call parses one document).
"""

from __future__ import annotations

from ..types import BNode, Iri, Literal, Term
from .iri import validate


class NTSyntaxError(ValueError):
    def __init__(self, msg: str, lineno: int):
        super().__init__(f"N-Triples syntax error at line {lineno}: {msg}")
        self.lineno = lineno


_HEX = "0123456789abcdefABCDEF"
_ECHAR = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f", '"': '"', "'": "'", "\\": "\\"}


def _unescape(s: str, lineno: int, allow_echar: bool = True) -> str:
    if "\\" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        if i + 1 >= n:
            raise NTSyntaxError("dangling backslash", lineno)
        e = s[i + 1]
        if e == "u" or e == "U":
            width = 4 if e == "u" else 8
            h = s[i + 2 : i + 2 + width]
            if len(h) != width or any(ch not in _HEX for ch in h):
                raise NTSyntaxError(f"bad \\{e} escape", lineno)
            cp = int(h, 16)
            if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
                raise NTSyntaxError(f"escape out of range: {h}", lineno)
            out.append(chr(cp))
            i += 2 + width
        elif allow_echar and e in _ECHAR:
            out.append(_ECHAR[e])
            i += 2
        else:
            raise NTSyntaxError(f"bad escape \\{e}", lineno)
    return "".join(out)


class _Line:
    __slots__ = ("s", "i", "n", "lineno")

    def __init__(self, s: str, lineno: int):
        self.s = s
        self.i = 0
        self.n = len(s)
        self.lineno = lineno

    def err(self, msg: str):
        raise NTSyntaxError(msg, self.lineno)

    def skip_ws(self):
        s, n = self.s, self.n
        while self.i < n and s[self.i] in " \t\r":
            self.i += 1

    def at_end_or_comment(self) -> bool:
        self.skip_ws()
        return self.i >= self.n or self.s[self.i] == "#"

    def _until(self, stop: str) -> str:
        """Consume up to unescaped `stop`; returns raw (still-escaped) slice."""
        s = self.s
        j = self.i
        while j < self.n:
            c = s[j]
            if c == "\\":
                j += 2
                continue
            if c == stop:
                raw = s[self.i : j]
                self.i = j + 1
                return raw
            j += 1
        self.err(f"unterminated, expected {stop!r}")

    def term(self, *, as_predicate: bool = False, allow_literal: bool = True) -> Term:
        self.skip_ws()
        if self.i >= self.n:
            self.err("unexpected end of line")
        c = self.s[self.i]
        if self.s.startswith("<<", self.i):
            # N-Triples-star quoted triple << s p o >> (single-level v1)
            if as_predicate:
                self.err("predicate must be an IRI")
            from ..types import QuotedTriple

            self.i += 2
            s = self.term(allow_literal=False)
            p = self.term(as_predicate=True)
            o = self.term()
            self.skip_ws()
            if self.s[self.i : self.i + 2] != ">>":
                self.err("expected '>>' closing quoted triple")
            self.i += 2
            try:
                return QuotedTriple(s, p, o)
            except ValueError as e:
                self.err(str(e))
        if c == "<":
            self.i += 1
            raw = self._until(">")
            iri = _unescape(raw, self.lineno, allow_echar=False)
            return Iri(validate(iri))
        if as_predicate:
            self.err("predicate must be an IRI")
        if c == "_":
            if self.s[self.i : self.i + 2] != "_:":
                self.err("bad blank node")
            self.i += 2
            j = self.i
            s = self.s
            while j < self.n and (s[j].isalnum() or s[j] in "_-.·"):
                j += 1
            # trailing '.' belongs to the statement terminator
            while j > self.i and s[j - 1] == ".":
                j -= 1
            if j == self.i:
                self.err("empty blank node label")
            label = s[self.i : j]
            self.i = j
            return BNode(label)
        if c == '"':
            if not allow_literal:
                self.err("literal not allowed here")
            self.i += 1
            raw = self._until('"')
            lex = _unescape(raw, self.lineno)
            # suffix: @lang or ^^<iri> or nothing
            if self.i < self.n and self.s[self.i] == "@":
                self.i += 1
                j = self.i
                s = self.s
                while j < self.n and (s[j].isalnum() or s[j] == "-"):
                    j += 1
                if j == self.i:
                    self.err("empty language tag")
                lang = s[self.i : j]
                self.i = j
                return Literal(lex, lang=lang)
            if self.s[self.i : self.i + 2] == "^^":
                self.i += 2
                if self.i >= self.n or self.s[self.i] != "<":
                    self.err("expected datatype IRI")
                self.i += 1
                raw = self._until(">")
                dt = _unescape(raw, self.lineno, allow_echar=False)
                return Literal(lex, dtype=validate(dt))
            return Literal(lex)
        self.err(f"unexpected character {c!r}")

    def expect_dot(self):
        self.skip_ws()
        if self.i >= self.n or self.s[self.i] != ".":
            self.err("expected '.'")
        self.i += 1
        if not self.at_end_or_comment():
            self.err("trailing content after '.'")


def parse_ntriples(doc: str, *, quads: bool = False):
    """Yield (s, p, o[, g]) Term tuples. Raises NTSyntaxError on bad input
    (negative-syntax cases must fail, SURVEY §5)."""
    for lineno, line in enumerate(doc.split("\n"), start=1):
        ln = _Line(line, lineno)
        if ln.at_end_or_comment():
            continue
        s = ln.term(allow_literal=False)
        p = ln.term(as_predicate=True)
        o = ln.term()
        g = None
        if quads:
            ln.skip_ws()
            if ln.i < ln.n and ln.s[ln.i] != ".":
                g = ln.term(allow_literal=False)
        ln.expect_dot()
        if quads:
            yield (s, p, o, g)
        else:
            yield (s, p, o)
