"""TriG reader — W3C TriG 1.1 (Turtle + named-graph blocks) → quads.

The reference parses Turtle only (rdf_ttl.ml, SURVEY §2.2); TriG is the
companion W3C syntax that carries the dataset structure our quad store is
built on (rdf_ds.ml's default + named graphs), so the engine accepts it as
a first-class source alongside N-Quads.

Grammar subset (TriG 1.1): directives (@prefix/@base + SPARQL forms),
`GRAPH label { triples }`, bare `label { triples }`, `{ triples }`
(default-graph block), and plain Turtle triple statements (default graph).
Graph labels are IRIs or blank nodes. Runs per-document inside mapInPandas
like TurtleParser (document-local blank labels; the extraction stage
rewrites them to partition-safe ids).
"""

from __future__ import annotations

import re

from ..types import BNode, Iri, Term
from .turtle import _BLANK, TurtleParser

_GRAPH_KW = re.compile(r"(?i:GRAPH)\b")


class TriGParser(TurtleParser):
    def __init__(self, doc: str, base: str | None = None, bnode_prefix: str = "b"):
        super().__init__(doc, base, bnode_prefix)
        #: (s, p, o, graph) — graph None = default graph
        self.quads: list[tuple[Term, Iri, Term, Term | None]] = []

    # -- grammar ------------------------------------------------------------

    def parse_quads(self) -> list[tuple[Term, Iri, Term, Term | None]]:
        while not self.eof():
            self._block()
        return self.quads

    def _graph_label(self) -> Term | None:
        """Lookahead: IRI/PNAME/blank-node label followed by '{' — only
        then consume it as a graph label."""
        save = self.i
        m = self.match(_BLANK)
        if m:
            label: Term = BNode(m.group(1))
        else:
            try:
                t = self.iriref_or_pname()
            except Exception:
                self.i = save
                return None
            if t is None:
                self.i = save
                return None
            label = t
        self.ws()
        if self.peek() != "{":
            self.i = save
            return None
        return label

    def _block(self):
        from .turtle import _BASE_DIR, _PREFIX_DIR

        if self.match(_PREFIX_DIR):
            self._prefix_decl(dot=True)
            return
        if self.match(_BASE_DIR):
            self._base_decl(dot=True)
            return
        if self._lookahead_sparql_prefix():
            self._prefix_decl(dot=False)
            return
        if self._lookahead_sparql_base():
            self._base_decl(dot=False)
            return
        self.ws()
        save = self.i
        if self.match(_GRAPH_KW):
            label = self._graph_label()
            if label is None:
                self.err("expected graph label after GRAPH")
            self._wrapped(label)
            return
        self.i = save
        if self.peek() == "{":
            self._wrapped(None)
            return
        label = self._graph_label()
        if label is not None:
            self._wrapped(label)
            return
        # plain Turtle statement in the default graph
        n0 = len(self.triples)
        self.triples_stmt()
        self.expect(".")
        self._tag(n0, None)

    def _wrapped(self, graph: Term | None):
        self.expect("{")
        while True:
            self.ws()
            if self.peek() == "}":
                break
            if self.eof():
                self.err("unterminated graph block")
            n0 = len(self.triples)
            self.triples_stmt()
            self._tag(n0, graph)
            self.ws()
            if self.peek() == ".":
                self.i += 1
        self.expect("}")

    def _tag(self, n0: int, graph: Term | None):
        for s, p, o in self.triples[n0:]:
            self.quads.append((s, p, o, graph))


def parse_trig(doc: str, base: str | None = None, bnode_prefix: str = "b"):
    """→ list of (s, p, o, graph) quads; graph None = default graph."""
    return TriGParser(doc, base, bnode_prefix).parse_quads()
