"""HTML relational tables → RDF (the WebTables recovery path).

Not in the reference (ocaml-rdf parses only explicit RDF syntaxes); this
is the north rule's web-KG scope applied to the LARGEST structured-data
source on the web that carries no RDF markup at all: header-rowed
`<table>` elements (Cafarella et al., "WebTables: Exploring the Power of
Tables on the Web", VLDB 2008 — the public recipe this follows: detect
relational tables by a header row, treat each data row as an entity and
each column header as a property).

Mapping (deliberately minimal and lossless enough to round-trip the
relational content):

- a `<table>` whose first row is all-`<th>` (or that has a `<thead>`)
  and that has ≥ 1 data row is RELATIONAL; anything else (layout
  tables, header-less data dumps) is skipped — precision over recall,
  the WebTables finding.
- table node: fresh bnode, `(table, rdf:type, ords:Table)` plus
  `ords:columnCount` / `ords:rowCount` integer literals.
- per data row: fresh bnode, `(table, ords:row, row)` and
  `(row, ords:rowIndex, n)` (0-based, xsd:integer).
- per cell: `(row, <ords:col/{header-slug}>, value)` — header text is
  whitespace-collapsed, lowercased, spaces→`-`, then percent-encoded
  with the shared `encode_for_uri` rules so the predicate IRI is
  deterministic and collision-free per header text.
- cell VALUE: if the cell contains exactly one `<a href>` the object is
  the resolved IRI (the entity-link recovery that makes web tables a KG
  source); else integer-looking text → xsd:integer literal,
  decimal-looking → xsd:decimal, otherwise a plain string literal of
  the whitespace-collapsed cell text. Empty cells emit nothing.
- ragged rows: cells beyond the header count are dropped; missing
  trailing cells are simply absent (RDF is sparse — no NULL padding).

Vocabulary base `urn:x-ords:table:` — a private-use URN namespace, same
convention as the pipeline's error predicate (types.py ERROR_PRED).
"""

from __future__ import annotations

import re

from ..types import RDF_TYPE, XSD_DECIMAL, XSD_INTEGER, BNode, Iri, Literal, Term
from .htmldom import Node, parse_html
from .iri import is_absolute, resolve

NS = "urn:x-ords:table:"
T_TABLE = Iri(NS + "Table")
P_ROW = Iri(NS + "row")
P_ROW_INDEX = Iri(NS + "rowIndex")
P_COLS = Iri(NS + "columnCount")
P_ROWS = Iri(NS + "rowCount")

_WS = re.compile(r"\s+")
_INT = re.compile(r"^[+-]?[0-9]+$")
_DEC = re.compile(r"^[+-]?(?:[0-9]+\.[0-9]*|\.[0-9]+)$")
# RFC 3986 unreserved — everything else is %-encoded in the column slug
_UNRESERVED = re.compile(r"[A-Za-z0-9._~-]")


def _slug(header: str) -> str:
    s = _WS.sub(" ", header).strip().lower().replace(" ", "-")
    out = []
    for ch in s:
        if _UNRESERVED.match(ch):
            out.append(ch)
        else:
            out.append("".join(f"%{b:02X}" for b in ch.encode("utf-8")))
    return "".join(out)


def _cells(tr: Node) -> list[Node]:
    return [c for c in tr.children if isinstance(c, Node) and c.tag in ("td", "th")]


def _rows(table: Node) -> list[Node]:
    """All <tr> of THIS table (not of nested tables), section-flattened
    in document order (thead rows first only if the document puts them
    first — html.parser keeps document order)."""
    out = []
    stack = [table]
    while stack:
        n = stack.pop(0)
        for c in n.children:
            if not isinstance(c, Node):
                continue
            if c.tag == "tr":
                out.append(c)
            elif c.tag in ("thead", "tbody", "tfoot"):
                stack.append(c)
    return out


def _cell_text(cell: Node) -> str:
    """Cell text EXCLUDING nested tables (a nested table is its own
    relation, extracted separately — its text is not the outer cell's
    value) and the usual non-text tags."""
    from .htmldom import NON_TEXT_TAGS

    parts: list[str] = []

    def rec(n: Node) -> None:
        for c in n.children:
            if isinstance(c, str):
                parts.append(c)
            elif c.tag != "table" and c.tag not in NON_TEXT_TAGS:
                rec(c)

    rec(cell)
    return "".join(parts)


def _only_link(cell: Node) -> Node | None:
    """The cell's single <a href>, if the cell holds nothing else but
    whitespace."""
    link = None
    for c in cell.children:
        if isinstance(c, str):
            if c.strip():
                return None
        elif c.tag == "a" and c.has("href"):
            if link is not None:
                return None
            link = c
        else:
            return None
    return link


class TableExtractor:
    def __init__(self, base: str | None, bnode_prefix: str = "tb"):
        self.base = base
        self._bn = 0
        self._bnode_prefix = bnode_prefix
        self.triples: list[tuple[Term, Iri, Term]] = []

    def fresh_bnode(self) -> BNode:
        self._bn += 1
        return BNode(f"{self._bnode_prefix}{self._bn}")

    def extract_tree(self, root: Node) -> list[tuple[Term, Iri, Term]]:
        for el in root.walk():
            if el.tag == "table":
                self._table(el)
        return self.triples

    def _resolve(self, href: str) -> Iri | None:
        href = href.strip()
        if self.base is not None:
            try:
                return Iri(resolve(href, self.base))
            except Exception:
                return None
        return Iri(href) if is_absolute(href) else None

    def _value(self, cell: Node) -> Term | None:
        link = _only_link(cell)
        if link is not None:
            iri = self._resolve(link.get("href") or "")
            if iri is not None:
                return iri
            # unresolvable link: fall through to its text
        text = _WS.sub(" ", _cell_text(cell)).strip()
        if not text:
            return None
        if _INT.match(text):
            return Literal(text, dtype=XSD_INTEGER)
        if _DEC.match(text):
            return Literal(text, dtype=XSD_DECIMAL)
        return Literal(text)

    def _table(self, el: Node) -> None:
        rows = _rows(el)
        if len(rows) < 2:
            return
        head = _cells(rows[0])
        in_thead = rows[0].parent is not None and rows[0].parent.tag == "thead"
        if not head or not (in_thead or all(c.tag == "th" for c in head)):
            return
        headers = [_slug(c.text()) for c in head]
        if not any(headers):
            return
        preds = [Iri(NS + "col/" + h) if h else None for h in headers]
        data = rows[1:]
        t = self.fresh_bnode()
        emit = self.triples.append
        emit((t, Iri(RDF_TYPE), T_TABLE))
        emit((t, P_COLS, Literal(str(len(headers)), dtype=XSD_INTEGER)))
        emit((t, P_ROWS, Literal(str(len(data)), dtype=XSD_INTEGER)))
        for i, tr in enumerate(data):
            cells = _cells(tr)
            r = self.fresh_bnode()
            emit((t, P_ROW, r))
            emit((r, P_ROW_INDEX, Literal(str(i), dtype=XSD_INTEGER)))
            for pred, cell in zip(preds, cells):
                if pred is None:
                    continue
                v = self._value(cell)
                if v is not None:
                    emit((r, pred, v))


def extract_tables_tree(root: Node, base: str | None = None) -> list[tuple[Term, Iri, Term]]:
    return TableExtractor(base).extract_tree(root)


def extract_tables(html: str, base: str | None = None) -> list[tuple[Term, Iri, Term]]:
    return extract_tables_tree(parse_html(html), base=base)
