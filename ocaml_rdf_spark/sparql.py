"""SPARQL 1.1 query-text front end: string → algebra Nodes → DataFrame.

Parity: the reference's EP1 (SURVEY §3) — `Rdf_sparql.execute`:
lex (rdf_sparql_lex.ml) → parse (rdf_sparql_parser.mly) → expand
(rdf_sparql_expand.ml, prefixed names → absolute IRIs) → translate
(rdf_sparql_algebra.ml) → evaluate (rdf_sparql_eval.ml). Here the four
middle stages collapse into one recursive-descent parser that builds the
algebra tree of algebra.py directly (expansion happens inline; the spec
§18.2 translation rules are encoded in how group-graph-patterns fold into
Join/LeftJoin/Filter/Union/Minus/Extend nodes), and "evaluate" is
`Node.compile` → Catalyst.

Coverage: SELECT (DISTINCT/REDUCED, expr AS ?v), ASK, CONSTRUCT,
DESCRIBE; BGPs with `a`, `;`/`,` lists, bnode property lists `[...]`,
collections `(...)`; property paths (^, /, |, ?, *, +, !); OPTIONAL,
UNION, MINUS, GRAPH, FILTER (incl. EXISTS/NOT EXISTS), BIND, VALUES,
sub-SELECT; GROUP BY / HAVING / aggregates (COUNT SUM AVG MIN MAX SAMPLE
GROUP_CONCAT, DISTINCT, SEPARATOR); ORDER BY / LIMIT / OFFSET; all §17
builtins in functions/builtins.py. SERVICE [SILENT] evaluates against an
in-process endpoint registry (Ctx.services — algebra.ServiceNode; the
reference leaves SERVICE unimplemented, rdf_sparql_eval.ml / SURVEY §2.3).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional, Union

from . import algebra as A
from .algebra import Agg, Ctx, Node, Template, TriplePattern, Var
from .functions import builtins as B
from .functions.builtins import E, L, V
from .operators import paths as P
from .types import (
    RDF_FIRST, RDF_NIL, RDF_NS, RDF_REST, RDF_TYPE, XSD_NS,
    BNode, Iri, Literal, QuotedTriple, Term,
)

# ---------------------------------------------------------------------------
# tokenizer (rdf_sparql_lex.ml)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRIREF><[^<>"{}|^`\\\s]*>)
  | (?P<STRING>'''(?:[^'\\]|\\.|'(?!''))*'''|\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|'(?:[^'\\\n]|\\.)*'|"(?:[^"\\\n]|\\.)*")
  | (?P<VAR>[?$][A-Za-z_][A-Za-z_0-9]*)
  | (?P<BNODE>_:[A-Za-z_0-9][A-Za-z_0-9.-]*)
  | (?P<PNAME>[A-Za-z_][A-Za-z_0-9.-]*?:(?:\\[_~.!$&'()*+,;=/?\#@%-]|[A-Za-z_0-9:%.-])*(?:\\[_~.!$&'()*+,;=/?\#@%-]|[A-Za-z_0-9:%-])|[A-Za-z_][A-Za-z_0-9.-]*?:|:(?:\\[_~.!$&'()*+,;=/?\#@%-]|[A-Za-z_0-9:%.-])*(?:\\[_~.!$&'()*+,;=/?\#@%-]|[A-Za-z_0-9:%-])|:)
  | (?P<NUM>[+-]?(?:\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?))
  | (?P<KW>[A-Za-z][A-Za-z_0-9]*)
  | (?P<OP>\^\^|&&|\|\||!=|<<|>>|<=|>=|\{\||\|\}|[{}()\[\].,;*/+\-!=<>|^?@a])
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "select", "distinct", "reduced", "where", "ask", "construct", "describe",
    "base", "prefix", "from", "named", "optional", "union", "minus", "graph",
    "filter", "bind", "values", "service", "group", "by", "having", "order",
    "asc", "desc", "limit", "offset", "as", "in", "not", "exists", "undef",
    "true", "false", "a", "separator", "lateral",
}

_AGG_KEYWORDS = {"count", "sum", "avg", "min", "max", "sample", "group_concat"}

#: keywords that may start a bare-function ORDER BY condition (§18 grammar:
#: OrderCondition ::= ... | Constraint); excludes solution-modifier words
_ORDER_FN_KWS = _AGG_KEYWORDS | {
    "bound", "if", "coalesce", "sameterm", "isiri", "isuri", "isblank",
    "isliteral", "isnumeric", "str", "lang", "datatype", "strlen", "ucase",
    "lcase", "strstarts", "strends", "contains", "strbefore", "strafter",
    "encode_for_uri", "concat", "langmatches", "abs", "ceil", "floor",
    "round", "year", "month", "day", "hours", "minutes", "seconds", "tz",
    "timezone", "md5", "sha1", "sha256", "sha384", "sha512", "rand", "now",
    "uuid", "struuid", "bnode", "iri", "uri", "substr", "replace", "regex",
    "strdt", "strlang", "istriple", "triple", "subject", "predicate", "object",
}


@dataclass
class Tok:
    kind: str  # IRIREF STRING VAR BNODE PNAME NUM KW OP LANGTAG EOF
    text: str
    pos: int


def tokenize(s: str) -> list[Tok]:
    out: list[Tok] = []
    i = 0
    while i < len(s):
        # langtag needs the preceding '@'
        m = _TOKEN_RE.match(s, i)
        if not m:
            raise SyntaxError(f"SPARQL lex error at {i}: {s[i:i+20]!r}")
        kind = m.lastgroup
        text = m.group()
        i = m.end()
        if kind == "WS":
            continue
        if kind == "OP" and text == "@":
            lm = re.match(r"[A-Za-z]+(-[A-Za-z0-9]+)*", s[i:])
            if not lm:
                raise SyntaxError(f"bad langtag at {i}")
            out.append(Tok("LANGTAG", lm.group(), i))
            i += lm.end()
            continue
        out.append(Tok(kind, text, m.start()))
    out.append(Tok("EOF", "", len(s)))
    return out


def _unescape(body: str) -> str:
    return (
        body.replace("\\t", "\t").replace("\\n", "\n").replace("\\r", "\r")
        .replace("\\\"", '"').replace("\\'", "'").replace("\\\\", "\\")
    )


# ---------------------------------------------------------------------------
# parsed query container
# ---------------------------------------------------------------------------


@dataclass
class Query:
    form: str  # select | ask | construct | describe
    node: Optional[Node] = None
    projection: Optional[list] = None  # var names, None = *
    templates: list = field(default_factory=list)  # CONSTRUCT
    describe_terms: list = field(default_factory=list)
    describe_vars: list = field(default_factory=list)
    from_graphs: list = field(default_factory=list)     # FROM <g> (default-graph merge)
    from_named: list = field(default_factory=list)      # FROM NAMED <g>


class Parser:
    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0
        self.base: Optional[str] = None
        self.prefixes: dict[str, str] = {}
        self._bn = 0
        self._anon = 0
        #: aggregates collected while parsing the current SELECT's
        #: expressions: each AGG(...) in SELECT/HAVING/ORDER becomes a
        #: synthetic `__aggN` output of the Group node, and the expression
        #: tree references it as a plain var (spec §18.2.4.1 sample/agg
        #: separation). Scoped per (sub-)SELECT.
        self._aggs: list[Agg] = []
        #: expression-level EXISTS patterns collected while parsing the
        #: current FILTER/BIND expression; the enclosing group attaches
        #: them as algebra.ExistsMark nodes. Leftovers at end of parse
        #: mean EXISTS appeared in a context that can't host the mark
        #: (SELECT expr / HAVING / ORDER BY) — rejected there.
        self._pending_marks: list = []
        self._mark_n = 0

    # -- token helpers ------------------------------------------------------

    def peek(self, k: int = 0) -> Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.kind == "KW" and t.text.lower() in kws

    def eat_kw(self, kw: str) -> None:
        if not self.at_kw(kw):
            raise SyntaxError(f"expected {kw.upper()} at {self.peek().text!r}")
        self.next()

    def at_op(self, op: str) -> bool:
        t = self.peek()
        return t.kind == "OP" and t.text == op

    def eat_op(self, op: str) -> None:
        if not self.at_op(op):
            raise SyntaxError(f"expected {op!r} got {self.peek().text!r}")
        self.next()

    def fresh_bnode(self) -> BNode:
        self._anon += 1
        return BNode(f"qb{self._anon}")

    # -- query-pattern bnodes are non-distinguished variables (§4.1.4) ------

    def _bn_pos(self, x):
        """In a graph PATTERN a blank node is a variable that can never be
        selected — NOT a by-label probe of stored bnodes (spec §4.1.4;
        rdf_sparql_algebra.ml treats pattern bnodes the same way). Same
        label → same hidden var across the query (the grammar already
        forbids reusing a label across BGPs, so one namespace is safe)."""
        return Var(f"__bn_{x.label}") if isinstance(x, BNode) else x

    def _bn_tp(self, tp):
        return TriplePattern(self._bn_pos(tp.s), self._bn_pos(tp.p), self._bn_pos(tp.o), tp.g)

    def _bn_path(self, pn):
        return P.PathPattern(self._bn_pos(pn.s), pn.path, self._bn_pos(pn.o))

    # -- terms --------------------------------------------------------------

    def expand_pname(self, pname: str) -> str:
        pfx, _, local = pname.partition(":")
        if pfx not in self.prefixes:
            raise SyntaxError(f"unknown prefix {pfx!r}:")
        # PN_LOCAL_ESC: drop the backslash (\. -> .); PERCENT (%41) stays
        # verbatim per the grammar -- it is NOT percent-decoded
        local = re.sub(r"\\([_~.!$&'()*+,;=/?#@%-])", r"\1", local)
        return self.prefixes[pfx] + local

    def parse_iri_tok(self, t: Tok) -> Iri:
        if t.kind == "IRIREF":
            from .sources.iri import resolve

            ref = t.text[1:-1]
            return Iri(resolve(ref, self.base) if self.base else ref)
        if t.kind == "PNAME":
            return Iri(self.expand_pname(t.text))
        raise SyntaxError(f"expected IRI, got {t.text!r}")

    def parse_literal_tok(self) -> Literal:
        t = self.next()
        body = t.text
        if body.startswith(("'''", '"""')):
            lex = _unescape(body[3:-3])
        else:
            lex = _unescape(body[1:-1])
        nt = self.peek()
        if nt.kind == "LANGTAG":
            self.next()
            return Literal(lex, lang=nt.text.lower())
        if nt.kind == "OP" and nt.text == "^^":
            self.next()
            dt = self.parse_iri_tok(self.next())
            return Literal(lex, dtype=dt.value)
        return Literal(lex)

    def _num_literal(self, text: str) -> Literal:
        if re.fullmatch(r"[+-]?\d+", text):
            return Literal(text, dtype=XSD_NS + "integer")
        if re.fullmatch(r"[+-]?(\d+\.\d*|\.\d+)", text):
            return Literal(text, dtype=XSD_NS + "decimal")
        return Literal(text, dtype=XSD_NS + "double")

    # -- prologue + entry ---------------------------------------------------

    def parse_query(self) -> Query:
        while self.at_kw("base", "prefix"):
            if self.at_kw("base"):
                self.next()
                self.base = self.next().text[1:-1]
            else:
                self.next()
                pt = self.next()
                if pt.kind != "PNAME" or not pt.text.endswith(":"):
                    # PNAME may carry only "pfx:"
                    if pt.kind != "PNAME":
                        raise SyntaxError("expected prefix name")
                pfx = pt.text[:-1] if pt.text.endswith(":") else pt.text.split(":")[0]
                iri = self.parse_iri_tok(self.next())
                self.prefixes[pfx] = iri.value
        if self.at_kw("select"):
            q = self.parse_select()
        elif self.at_kw("ask"):
            q = self.parse_ask()
        elif self.at_kw("construct"):
            q = self.parse_construct()
        elif self.at_kw("describe"):
            q = self.parse_describe()
        else:
            raise SyntaxError(f"expected query form, got {self.peek().text!r}")
        if self._pending_marks:
            # marks are consumed by the enclosing group pattern; leftovers
            # mean EXISTS sat in SELECT/HAVING/ORDER BY expressions, where
            # there is no group to host the flag join
            raise SyntaxError("EXISTS is only supported inside FILTER/BIND expressions")
        if self.peek().kind != "EOF":
            # a grammar slip (e.g. an unsupported solution-modifier form)
            # must be an error, not silently-ignored trailing tokens that
            # would make the query "succeed" with different semantics
            raise SyntaxError(f"unexpected trailing tokens at {self.peek().text!r}")
        return q

    # -- query forms --------------------------------------------------------

    def _dataset_clause(self) -> tuple[list, list]:
        """DatasetClause* (spec §13.2): FROM iri | FROM NAMED iri."""
        froms: list[str] = []
        named: list[str] = []
        while self.at_kw("from"):
            self.next()
            if self.at_kw("named"):
                self.next()
                named.append(self.parse_iri_tok(self.next()).value)
            else:
                froms.append(self.parse_iri_tok(self.next()).value)
        return froms, named

    def parse_select(self) -> Query:
        outer_aggs = self._aggs
        self._aggs = []
        self.eat_kw("select")
        distinct = reduced = False
        if self.at_kw("distinct"):
            distinct = True
            self.next()
        elif self.at_kw("reduced"):
            reduced = True
            self.next()
        proj: Optional[list] = None
        exprs: list[tuple[str, E]] = []
        if self.at_op("*"):
            self.next()
        else:
            proj = []
            while True:
                if self.peek().kind == "VAR":
                    proj.append(self.next().text[1:])
                elif self.at_op("("):
                    self.next()
                    e = self.parse_expr()
                    self.eat_kw("as")
                    v = self.next().text[1:]
                    self.eat_op(")")
                    proj.append(v)
                    exprs.append((v, e))
                else:
                    break
            if not proj:
                raise SyntaxError("empty SELECT clause")
        froms, named = self._dataset_clause()
        if self.at_kw("where"):
            self.next()
        pattern = self.parse_group_graph_pattern()
        # §19.8 note 13: a SELECT (expr AS ?v) target must be neither
        # in-scope in the WHERE pattern nor repeated in the SELECT clause
        if proj is not None and exprs:
            pat_scope = _in_scope_vars(pattern)
            for v, _e in exprs:
                if v in pat_scope:
                    raise SyntaxError(f"SELECT: AS target ?{v} is already in scope")
                if proj.count(v) > 1:
                    raise SyntaxError(f"SELECT: duplicate variable ?{v}")
        node, offset, limit = self._solution_modifiers(pattern, proj, exprs)
        # §18.2.4: with GROUP BY (explicit, or implicit via aggregates) a
        # projected plain variable must be a group key (SELECT expressions
        # evaluate over the group and are fine)
        if proj is not None and getattr(self, "_last_group_by", None) is not None:
            expr_names = {v for v, _e in exprs}
            for v in proj:
                if v not in expr_names and v not in self._last_group_by:
                    raise SyntaxError(
                        f"SELECT: variable ?{v} is neither grouped nor aggregated"
                    )
        elif proj is None and getattr(self, "_last_group_by", None) is not None:
            # grammar note: SELECT * is not permitted with GROUP BY — it
            # would project every in-scope var, grouped or not
            raise SyntaxError("SELECT * is not allowed with GROUP BY")
        if proj is not None:
            node = A.Project(node, proj)
        else:
            # SELECT *: project only the distinguished vars — pattern
            # bnodes (hidden __bn_ vars) never reach the result (§18.2.4.4)
            scope = _in_scope_vars(pattern)
            vis = sorted(v for v in scope if not v.startswith("__bn_"))
            if len(vis) != len(scope):
                node = A.Project(node, vis)
        if distinct or reduced:
            # §15.1: with DISTINCT/REDUCED, ORDER BY may only reference
            # projected variables — enforce for plain-var conditions (an
            # unprojected var would otherwise sort by null, silently).
            # Expression conditions are opaque pre-session and stay
            # unchecked here.
            if getattr(self, "_order_conds", None):
                projected = set(proj) if proj is not None else set(
                    v for v in _in_scope_vars(pattern) if not v.startswith("__bn_")
                )
                for cond in self._order_conds:
                    c = cond[0] if isinstance(cond, tuple) else cond
                    if isinstance(c, str) and c not in projected and not c.startswith("__agg"):
                        raise SyntaxError(
                            f"ORDER BY ?{c} with SELECT DISTINCT requires ?{c} to be projected"
                        )
            node = A.Distinct(node)
            # Distinct is a shuffle (dropDuplicates) — it does NOT preserve
            # the ORDER BY ordering the spec's sequence semantics require
            # (§18.2.4: DISTINCT keeps the solution sequence ordered), so
            # re-apply the sort on the deduped projection. ORDER BY vars
            # must be projected when DISTINCT is used (spec constraint,
            # enforced above), so the conditions still resolve.
            if getattr(self, "_order_conds", None):
                node = A.OrderBy(node, self._order_conds)
        if offset or limit is not None:
            node = A.Slice(node, offset or 0, limit)
        self._aggs = outer_aggs
        return Query("select", node=node, projection=proj, from_graphs=froms, from_named=named)

    def parse_ask(self) -> Query:
        self.eat_kw("ask")
        froms, named = self._dataset_clause()
        if self.at_kw("where"):
            self.next()
        node = self.parse_group_graph_pattern()
        return Query("ask", node=node, from_graphs=froms, from_named=named)

    def parse_construct(self) -> Query:
        self.eat_kw("construct")
        if self.at_kw("where") or self.at_kw("from"):
            # CONSTRUCT WHERE { tp* } shorthand (§16.2.4): the pattern IS
            # the template; spec restricts the pattern to a plain BGP
            froms, named = self._dataset_clause()
            self.eat_kw("where")
            self.eat_op("{")
            tps, paths = self._triples_block(allow_paths=False)
            if paths:
                raise SyntaxError("CONSTRUCT WHERE allows only triple patterns")
            self.eat_op("}")
            templates = [Template(tp.s, tp.p, tp.o) for tp in tps]
            # pattern side: bnodes are hidden vars; template side keeps
            # them (minted fresh per solution at instantiation)
            node = A.BGP([self._bn_tp(tp) for tp in tps])
            node, offset, limit = self._solution_modifiers(node, None, [])
            if offset or limit is not None:
                node = A.Slice(node, offset or 0, limit)
            return Query("construct", node=node, templates=templates, from_graphs=froms, from_named=named)
        self.eat_op("{")
        templates: list[Template] = []
        tps, paths = self._triples_block(allow_paths=False)
        if paths:
            raise SyntaxError("property paths not allowed in CONSTRUCT template")
        templates = [Template(tp.s, tp.p, tp.o) for tp in tps]
        self.eat_op("}")
        froms, named = self._dataset_clause()
        if self.at_kw("where"):
            self.next()
        node = self.parse_group_graph_pattern()
        node, offset, limit = self._solution_modifiers(node, None, [])
        if offset or limit is not None:
            node = A.Slice(node, offset or 0, limit)
        return Query("construct", node=node, templates=templates, from_graphs=froms, from_named=named)

    def parse_describe(self) -> Query:
        self.eat_kw("describe")
        terms: list[Term] = []
        dvars: list[str] = []
        while True:
            t = self.peek()
            if t.kind == "VAR":
                dvars.append(self.next().text[1:])
            elif t.kind in ("IRIREF", "PNAME"):
                terms.append(self.parse_iri_tok(self.next()))
            else:
                break
        froms, named = self._dataset_clause()
        node = None
        if self.at_kw("where") or self.at_op("{"):
            if self.at_kw("where"):
                self.next()
            node = self.parse_group_graph_pattern()
        return Query("describe", node=node, describe_terms=terms, describe_vars=dvars, from_graphs=froms, from_named=named)

    def _solution_modifiers(self, node: Node, proj, select_exprs) -> tuple:
        """GROUP BY / HAVING / ORDER / LIMIT / OFFSET per spec §18.2.4-5:
        Group(+synthetic __aggN outputs) → HAVING filters → SELECT-expr
        Extends → OrderBy. Project/Distinct/Slice are applied by the
        caller (they depend on the query form)."""
        group_by: list[str] = []
        pre_extends: list[tuple[str, E]] = []
        having: list[E] = []
        order: list = []
        limit = offset = None

        if self.at_kw("group"):
            self.next()
            self.eat_kw("by")
            while True:
                t = self.peek()
                if t.kind == "VAR":
                    group_by.append(self.next().text[1:])
                elif self.at_op("("):
                    self.next()
                    e = self.parse_expr()
                    if self.at_kw("as"):
                        self.next()
                        v = self.next().text[1:]
                    else:
                        # grammar [20]: '(' Expression ')' — AS is optional;
                        # an anonymous key binds an internal, unprojectable var
                        v = f"__gk{len(group_by)}"
                    self.eat_op(")")
                    pre_extends.append((v, e))
                    group_by.append(v)
                elif t.kind == "KW" and t.text.lower() in _ORDER_FN_KWS and t.text.lower() not in _AGG_KEYWORDS:
                    # GroupCondition ::= BuiltInCall — anonymous key bound
                    # to an internal var (spec: the key is not projectable)
                    e = self._function_call()
                    v = f"__gk{len(group_by)}"
                    pre_extends.append((v, e))
                    group_by.append(v)
                else:
                    break
        if self.at_kw("having"):
            self.next()
            while True:
                if self.at_op("("):
                    self.next()
                    having.append(self.parse_expr())
                    self.eat_op(")")
                elif self.peek().kind == "KW" and self.peek().text.lower() in _ORDER_FN_KWS:
                    # HavingCondition ::= Constraint, which admits a bare
                    # BuiltInCall (HAVING CONTAINS(...)); aggregates route
                    # through the same __aggN synthesis as ORDER BY
                    having.append(self._function_call())
                else:
                    break
        if self.at_kw("order"):
            self.next()
            self.eat_kw("by")
            while True:
                if self.at_kw("asc", "desc"):
                    asc = self.next().text.lower() == "asc"
                    self.eat_op("(")
                    e = self.parse_expr()
                    self.eat_op(")")
                    order.append((e, asc))
                elif self.peek().kind == "VAR":
                    order.append((self.next().text[1:], True))
                elif self.at_op("("):
                    self.next()
                    order.append((self.parse_expr(), True))
                    self.eat_op(")")
                elif self.peek().kind == "KW" and self.peek().text.lower() in _ORDER_FN_KWS:
                    # bare BuiltInCall order condition, e.g. ORDER BY STR(?x)
                    # or ORDER BY COUNT(*) (aggregate: routed through the
                    # same __aggN synthesis as SELECT expressions)
                    order.append((self._function_call(), True))
                else:
                    break
        for _ in range(2):
            if self.at_kw("limit"):
                self.next()
                limit = int(self.next().text)
            elif self.at_kw("offset"):
                self.next()
                offset = int(self.next().text)
        # trailing ValuesClause (grammar [28]; §18.2.4.3): textually LAST,
        # but in the algebra the inline data joins the pattern after HAVING
        # and before SELECT expressions / ORDER / slice
        values_node = None
        if self.at_kw("values"):
            self.next()
            values_node = self.parse_values()

        for v, e in pre_extends:
            node = A.Extend(node, v, e)

        self._last_group_by = group_by if (group_by or self._aggs) else None
        if group_by or self._aggs:
            node = A.Group(node, group_by, list(self._aggs))
        for e in having:
            node = A.Filter(e, node)
        if values_node is not None:
            node = A.Join(node, values_node)
        for v, e in select_exprs:
            node = A.Extend(node, v, e)
        if order:
            node = A.OrderBy(node, order)
        self._order_conds = order  # parse_select re-sorts after DISTINCT
        return node, offset, limit

    # -- group graph pattern (spec §18.2.2) ---------------------------------

    def parse_group_graph_pattern(self) -> Node:
        self.eat_op("{")
        # sub-SELECT
        if self.at_kw("select"):
            q = self.parse_select()
            self.eat_op("}")
            return q.node
        acc: Optional[Node] = None
        filters: list[tuple[E, list]] = []  # (expr, its EXISTS marks)
        exists_filters: list[tuple[Node, bool]] = []
        group_marks: list[str] = []  # flag columns to drop at group end

        def join_acc(n: Node):
            nonlocal acc
            acc = n if acc is None else A.Join(acc, n)

        while not self.at_op("}"):
            if self.at_kw("optional"):
                self.next()
                right = self.parse_group_graph_pattern()
                left = acc if acc is not None else A.BGP([])
                # spec §18.2.2.4: OPTIONAL { P FILTER(e) } = LeftJoin(L,P,e)
                # (e may reference left-side vars — it must be part of the
                # join condition, not a post-filter inside P)
                expr = None
                if isinstance(right, A.Filter):
                    expr, right = right.expr, right.child
                acc = A.LeftJoin(left, right, expr)
            elif self.at_kw("minus"):
                self.next()
                right = self.parse_group_graph_pattern()
                left = acc if acc is not None else A.BGP([])
                acc = A.Minus(left, right)
            elif self.at_kw("graph"):
                self.next()
                t = self.next()
                g: Union[Var, str]
                if t.kind == "VAR":
                    g = Var(t.text[1:])
                else:
                    g = self.parse_iri_tok(t).value
                sub = self.parse_group_graph_pattern()
                join_acc(A.GraphNode(g, sub))
            elif self.at_kw("filter"):
                self.next()
                if self.at_kw("exists"):
                    self.next()
                    exists_filters.append((self.parse_group_graph_pattern(), False))
                elif self.at_kw("not") and self.peek(1).text.lower() == "exists":
                    self.next()
                    self.next()
                    exists_filters.append((self.parse_group_graph_pattern(), True))
                else:
                    n0 = len(self._pending_marks)
                    if self.at_op("("):
                        self.next()
                        fe = self.parse_expr()
                        self.eat_op(")")
                    else:
                        fe = self.parse_primary_expr()
                    marks = self._pending_marks[n0:]
                    del self._pending_marks[n0:]
                    filters.append((fe, marks))
            elif self.at_kw("bind"):
                self.next()
                self.eat_op("(")
                n0 = len(self._pending_marks)
                e = self.parse_expr()
                self.eat_kw("as")
                v = self.next().text[1:]
                self.eat_op(")")
                base = acc if acc is not None else A.BGP([])
                # §19.8 grammar note 12: the BIND target must not be
                # in-scope in the group at the point of the BIND
                if v in _in_scope_vars(base):
                    raise SyntaxError(f"BIND: variable ?{v} is already in scope")
                marks = self._pending_marks[n0:]
                del self._pending_marks[n0:]
                for sub_p, mk in marks:
                    base = A.ExistsMark(base, sub_p, mk)
                    group_marks.append(mk)
                acc = A.Extend(base, v, e)
            elif self.at_kw("lateral"):
                # SPARQL 1.2 LATERAL (SEP-0006): correlated group — the
                # right side sees the left solution's bindings; a
                # correlated sub-SELECT LIMIT becomes per-binding top-n
                # (algebra.Lateral: window over the correlation key)
                self.next()
                right = self.parse_group_graph_pattern()
                left = acc if acc is not None else A.BGP([])
                # SEP-0006 scoping: vars ASSIGNED inside the lateral part
                # (BIND / SELECT ... AS) must not already be in scope from
                # the left — outer bindings are visible inside, so the
                # assignment would re-bind them (the §19.8 note-12 rule
                # lifted across the LATERAL boundary)
                bad = sorted(_assigned_vars(right) & _in_scope_vars(left))
                if bad:
                    raise SyntaxError(
                        f"LATERAL: variable ?{bad[0]} is assigned inside "
                        "but already in scope from the left"
                    )
                acc = A.Lateral(left, right)
            elif self.at_kw("values"):
                self.next()
                join_acc(self.parse_values())
            elif self.at_kw("service"):
                # SERVICE [SILENT] (iri|?var) GroupGraphPattern — Federated
                # Query; evaluated against Ctx.services (algebra.ServiceNode)
                self.next()
                silent = False
                if self.at_kw("silent"):
                    self.next()
                    silent = True
                t = self.next()
                ep: Union[Var, str]
                if t.kind == "VAR":
                    ep = Var(t.text[1:])
                else:
                    ep = self.parse_iri_tok(t).value
                sub = self.parse_group_graph_pattern()
                join_acc(A.ServiceNode(ep, sub, silent))
            elif self.at_op("{"):
                sub = self.parse_group_graph_pattern()
                # union chain?
                while self.at_kw("union"):
                    self.next()
                    sub = A.UnionNode(sub, self.parse_group_graph_pattern())
                join_acc(sub)
            else:
                tps, path_nodes = self._triples_block(allow_paths=True)
                if tps:
                    join_acc(A.BGP([self._bn_tp(tp) for tp in tps]))
                for pn in path_nodes:
                    join_acc(self._bn_path(pn))
            if self.at_op("."):
                self.next()
        self.eat_op("}")
        node = acc if acc is not None else A.BGP([])
        for fe, marks in filters:
            for sub_f, mk in marks:
                node = A.ExistsMark(node, sub_f, mk)
                group_marks.append(mk)
            node = A.Filter(fe, node)
        for sub, neg in exists_filters:
            node = A.ExistsFilter(node, sub, neg)
        if group_marks:
            node = A.DropMarks(node, group_marks)
        return node

    def parse_values(self) -> Node:
        # VALUES ?v { ... } | VALUES (?a ?b) { (..) (..) }
        t = self.next()
        rows: list[dict] = []
        if t.kind == "VAR":
            v = t.text[1:]
            self.eat_op("{")
            while not self.at_op("}"):
                rows.append({v: self._values_term()})
            self.eat_op("}")
        else:
            if not (t.kind == "OP" and t.text == "("):
                raise SyntaxError("expected var or ( after VALUES")
            vs = []
            while self.peek().kind == "VAR":
                vs.append(self.next().text[1:])
            self.eat_op(")")
            self.eat_op("{")
            while self.at_op("("):
                self.next()
                row = {}
                for v in vs:
                    row[v] = self._values_term()
                self.eat_op(")")
                rows.append(row)
            self.eat_op("}")
        return A.Values(rows)

    def _values_term(self):
        t = self.peek()
        if t.kind == "OP" and t.text == "<<":
            # SPARQL-star DataBlockValue: ground quoted triple only
            q = self._quoted([], [])
            if isinstance(q, A.QuotedPattern):
                raise SyntaxError("variables not allowed in VALUES data")
            return q
        if t.kind == "KW" and t.text.lower() == "undef":
            self.next()
            return None
        return self.parse_graph_term()

    # -- triples block ------------------------------------------------------

    def parse_graph_term(self) -> Term:
        t = self.peek()
        if t.kind in ("IRIREF", "PNAME"):
            return self.parse_iri_tok(self.next())
        if t.kind == "STRING":
            return self.parse_literal_tok()
        if t.kind == "NUM":
            self.next()
            return self._num_literal(t.text)
        if t.kind == "KW" and t.text.lower() in ("true", "false"):
            self.next()
            return Literal(t.text.lower(), dtype=XSD_NS + "boolean")
        if t.kind == "BNODE":
            self.next()
            return BNode(t.text[2:])
        raise SyntaxError(f"expected RDF term, got {t.text!r}")

    def _quoted(self, tps, path_nodes):
        """`<< s p o >>` — ground → types.QuotedTriple term; any Var →
        algebra.QuotedPattern (SPARQL-star quoted triple pattern)."""
        self.next()  # '<<'
        s = self._var_or_term(tps, path_nodes)
        p = self._parse_verb(allow_paths=False)
        o = self._var_or_term(tps, path_nodes)
        if not (self.peek().kind == "OP" and self.peek().text == ">>"):
            raise SyntaxError("expected '>>' closing quoted triple")
        self.next()
        for x in (s, p, o):
            if isinstance(x, (A.QuotedPattern, QuotedTriple)):
                raise SyntaxError("nested quoted triples are not supported (v1)")
        if any(isinstance(x, Var) for x in (s, p, o)):
            return A.QuotedPattern(s, p, o)
        return QuotedTriple(s, p, o)

    def _var_or_term(self, tps, path_nodes):
        t = self.peek()
        if t.kind == "VAR":
            return Var(self.next().text[1:])
        if t.kind == "OP" and t.text == "<<":
            return self._quoted(tps, path_nodes)
        if t.kind == "OP" and t.text == "[":
            self.next()
            b = self.fresh_bnode()
            if not self.at_op("]"):
                self._pred_obj_list(b, tps, path_nodes)
            self.eat_op("]")
            return b
        if t.kind == "OP" and t.text == "(":
            self.next()
            items = []
            while not self.at_op(")"):
                items.append(self._var_or_term(tps, path_nodes))
            self.eat_op(")")
            if not items:
                return Iri(RDF_NIL)
            cells = [self.fresh_bnode() for _ in items]
            for i, item in enumerate(items):
                tps.append(TriplePattern(cells[i], Iri(RDF_FIRST), item))
                rest = cells[i + 1] if i + 1 < len(cells) else Iri(RDF_NIL)
                tps.append(TriplePattern(cells[i], Iri(RDF_REST), rest))
            return cells[0]
        return self.parse_graph_term()

    def _triples_block(self, allow_paths: bool) -> tuple[list, list]:
        tps: list[TriplePattern] = []
        path_nodes: list[Node] = []
        while True:
            s = self._var_or_term(tps, path_nodes)
            if not (self.at_op("]") or self.at_op("}") or self.at_op(".")):
                self._pred_obj_list(s, tps, path_nodes, allow_paths=allow_paths)
            if self.at_op("."):
                self.next()
                t = self.peek()
                if t.kind == "OP" and t.text in ("}",):
                    break
                if t.kind == "KW" and t.text.lower() in (
                    "optional", "minus", "graph", "filter", "bind", "values", "service", "group",
                    "order", "limit", "offset", "having", "lateral",
                ):
                    break
                if t.kind == "OP" and t.text == "{":
                    break
                if t.kind == "EOF":
                    break
                continue
            break
        return tps, path_nodes

    def _pred_obj_list(self, s, tps, path_nodes, allow_paths: bool = True) -> None:
        while True:
            pred = self._parse_verb(allow_paths)
            while True:
                o = self._var_or_term(tps, path_nodes)
                if isinstance(pred, tuple):  # ('path', Path)
                    path_nodes.append(P.PathPattern(s, pred[1], o))
                else:
                    tps.append(TriplePattern(s, pred, o))
                if self.at_op("{|"):
                    # RDF-star annotation: s p o {| a1 v1 ; ... |} — the
                    # asserted triple PLUS annotations on << s p o >>
                    if isinstance(pred, tuple):
                        raise SyntaxError("annotation on a property-path triple")
                    for x in (s, pred, o):
                        if isinstance(x, (A.QuotedPattern, QuotedTriple)):
                            raise SyntaxError("nested quoted triples are not supported (v1)")
                    if any(isinstance(x, Var) for x in (s, pred, o)):
                        qsubj = A.QuotedPattern(s, pred, o)
                    else:
                        qsubj = QuotedTriple(s, pred, o)
                    self.next()
                    self._pred_obj_list(qsubj, tps, path_nodes, allow_paths=False)
                    if not (self.peek().kind == "OP" and self.peek().text == "|}"):
                        raise SyntaxError("expected '|}' closing annotation")
                    self.next()
                if self.at_op(","):
                    self.next()
                    continue
                break
            if self.at_op(";"):
                self.next()
                if self.at_op(".") or self.at_op("]") or self.at_op("}"):
                    break
                continue
            break

    def _parse_verb(self, allow_paths: bool):
        t = self.peek()
        if t.kind == "VAR":
            return Var(self.next().text[1:])
        if (t.kind == "KW" and t.text == "a") or (t.kind == "OP" and t.text == "a"):
            if not allow_paths:
                self.next()
                return Iri(RDF_TYPE)
            # fall through: 'a' may START a path (a/ex:p, a+, ...) —
            # _path_primary handles the keyword; a bare 'a' comes back
            # through the simple-IRI slot as an ordinary triple pattern
        if allow_paths:
            path, simple = self._parse_path()
            if simple is not None:
                return simple
            return ("path", path)
        return self.parse_iri_tok(self.next())

    # property paths: PathAlt ::= PathSeq ('|' PathSeq)* ; PathSeq ::=
    # PathElt ('/' PathElt)* ; PathElt ::= '^'? Primary ('?'|'*'|'+')?
    def _parse_path(self):
        """→ (Path, Iri|None). The second slot is set when the whole path is
        a plain IRI (normal triple pattern — cheaper than a PathPattern)."""
        path = self._path_seq()
        simple = path.iri if isinstance(path, P.P) else None
        while self.at_op("|"):
            self.next()
            path = P.Alt(path, self._path_seq())
            simple = None
        return path, (Iri(simple) if simple else None)

    def _path_seq(self):
        p = self._path_elt()
        while self.at_op("/"):
            self.next()
            p = P.Seq(p, self._path_elt())
        return p

    def _path_elt(self):
        inv = False
        if self.at_op("^"):
            self.next()
            inv = True
        p = self._path_primary()
        if self.at_op("?"):
            # lookahead: '?' followed by varname is a VAR token, so a bare
            # OP '?' here is the zero-or-one modifier
            self.next()
            p = P.ZeroOrOne(p)
        elif self.at_op("*"):
            self.next()
            p = P.Star(p)
        elif self.at_op("+"):
            self.next()
            p = P.Plus(p)
        elif self.at_op("{"):
            # path quantifier p{n}, p{n,}, p{n,m}, p{,m} (SEP-0002 /
            # SPARQL 1.2 paths; unambiguous here — an object term never
            # starts with '{')
            self.next()
            lo = None
            if self.peek().kind == "NUM":
                lo = int(self.next().text)
            if self.at_op(","):
                self.next()
                hi = int(self.next().text) if self.peek().kind == "NUM" else None
            else:
                hi = lo  # {n} = exactly n
            self.eat_op("}")
            if lo is None and hi is None:
                raise SyntaxError("path quantifier needs at least one bound")
            p = P.Repeat(p, lo or 0, hi)
        if inv:
            p = P.Inv(p)
        return p

    def _path_primary(self):
        t = self.peek()
        if t.kind == "OP" and t.text == "(":
            self.next()
            p, _ = self._parse_path()
            self.eat_op(")")
            return p
        if t.kind == "OP" and t.text == "!":
            # PathNegatedPropertySet (§9.1): members may be iri or ^iri
            self.next()
            iris, inv_iris = [], []

            def member():
                target = iris
                if self.at_op("^"):
                    self.next()
                    target = inv_iris
                it = self.next()
                if it.kind == "KW" and it.text == "a":
                    target.append(RDF_TYPE)
                else:
                    target.append(self.parse_iri_tok(it).value)

            if self.at_op("("):
                self.next()
                while True:
                    member()
                    if self.at_op("|"):
                        self.next()
                        continue
                    break
                self.eat_op(")")
            else:
                member()
            return P.Neg(tuple(iris), tuple(inv_iris))
        if t.kind == "KW" and t.text == "a":
            self.next()
            return P.P(RDF_TYPE)
        return P.P(self.parse_iri_tok(self.next()).value)

    # -- expressions (§17; precedence climbing) -----------------------------

    def parse_expr(self) -> E:
        return self._or_expr()

    def _mark_agg(self, e: E, spec=None) -> E:
        e._has_agg = True  # type: ignore[attr-defined]
        if spec is not None:
            e._agg_spec = spec  # type: ignore[attr-defined]
        return e

    def _or_expr(self) -> E:
        e = self._and_expr()
        while self.at_op("||"):
            self.next()
            r = self._and_expr()
            ha = getattr(e, "_has_agg", False) or getattr(r, "_has_agg", False)
            e = e | r
            if ha:
                self._mark_agg(e)
        return e

    def _and_expr(self) -> E:
        e = self._rel_expr()
        while self.at_op("&&"):
            self.next()
            r = self._rel_expr()
            ha = getattr(e, "_has_agg", False) or getattr(r, "_has_agg", False)
            e = e & r
            if ha:
                self._mark_agg(e)
        return e

    def _rel_expr(self) -> E:
        e = self._add_expr()
        t = self.peek()
        if t.kind == "OP" and t.text in ("=", "!=", "<", ">", "<=", ">="):
            self.next()
            r = self._add_expr()
            ha = getattr(e, "_has_agg", False) or getattr(r, "_has_agg", False)
            e = {
                "=": lambda: e == r, "!=": lambda: e != r, "<": lambda: e < r,
                ">": lambda: e > r, "<=": lambda: e <= r, ">=": lambda: e >= r,
            }[t.text]()
            if ha:
                self._mark_agg(e)
            return e
        if t.kind == "KW" and t.text.lower() == "in":
            self.next()
            return B.IN(e, *self._expr_list())
        if t.kind == "KW" and t.text.lower() == "not" and self.peek(1).text.lower() == "in":
            self.next()
            self.next()
            return ~B.IN(e, *self._expr_list())
        return e

    def _expr_list(self) -> list[E]:
        self.eat_op("(")
        out = []
        while not self.at_op(")"):
            out.append(self.parse_expr())
            if self.at_op(","):
                self.next()
        self.eat_op(")")
        return out

    def _add_expr(self) -> E:
        e = self._mul_expr()
        while self.at_op("+") or self.at_op("-"):
            op = self.next().text
            r = self._mul_expr()
            ha = getattr(e, "_has_agg", False) or getattr(r, "_has_agg", False)
            e = (e + r) if op == "+" else (e - r)
            if ha:
                self._mark_agg(e)
        return e

    def _mul_expr(self) -> E:
        e = self._unary_expr()
        while self.at_op("*") or self.at_op("/"):
            op = self.next().text
            r = self._unary_expr()
            ha = getattr(e, "_has_agg", False) or getattr(r, "_has_agg", False)
            e = (e * r) if op == "*" else (e / r)
            if ha:
                self._mark_agg(e)
        return e

    def _unary_expr(self) -> E:
        if self.at_op("!"):
            self.next()
            return ~self._unary_expr()
        if self.at_op("-"):
            self.next()
            return L(0) - self._unary_expr()
        if self.at_op("+"):
            self.next()
            return self._unary_expr()
        return self.parse_primary_expr()

    def parse_primary_expr(self) -> E:
        t = self.peek()
        if t.kind == "OP" and t.text == "(":
            self.next()
            e = self.parse_expr()
            self.eat_op(")")
            return e
        if t.kind == "VAR":
            return V(self.next().text[1:])
        if t.kind == "STRING":
            lit = self.parse_literal_tok()
            return B.E(lambda vm, lit=lit: B.term_lit(lit))
        if t.kind == "NUM":
            self.next()
            lit = self._num_literal(t.text)
            return B.E(lambda vm, lit=lit: B.term_lit(lit))
        if t.kind == "KW" and t.text.lower() in ("true", "false"):
            self.next()
            return L(t.text.lower() == "true")
        if t.kind == "KW":
            return self._function_call()
        if t.kind in ("IRIREF", "PNAME"):
            iri = self.parse_iri_tok(self.next())
            if self.at_op("("):  # extension / xsd-cast function by IRI
                args = self._expr_list()
                if iri.value.startswith(XSD_NS):
                    return B.XSD_CAST(args[0], iri.value)
                if iri.value in B.IRI_FUNS:
                    return B.IRI_FUNS[iri.value](*args)
                raise SyntaxError(f"unknown function <{iri.value}>")
            return B.E(lambda vm, iri=iri: B.term_lit(iri))
        raise SyntaxError(f"unexpected token {t.text!r} in expression")

    def _exists_expr(self, negated: bool) -> E:
        """EXISTS { P } inside an expression → a fresh flag var fed by an
        ExistsMark node that the enclosing group attaches (decorrelated —
        never a per-row subquery)."""
        sub = self.parse_group_graph_pattern()
        marker = f"__ex{self._mark_n}"
        self._mark_n += 1
        self._pending_marks.append((sub, marker))
        e = B.EXISTS_MARK(marker)
        return ~e if negated else e

    def _function_call(self) -> E:
        name = self.next().text.lower()
        if name in _AGG_KEYWORDS:
            return self._aggregate(name)
        if name == "exists":
            return self._exists_expr(False)
        if name == "not":
            # 'NOT IN' is consumed by _rel_expr before primaries; a bare
            # NOT here can only begin NOT EXISTS.
            self.eat_kw("exists")
            return self._exists_expr(True)

        simple = {
            "bound": None, "if": B.IF, "coalesce": B.COALESCE, "sameterm": B.SAME_TERM,
            "isiri": B.IS_IRI, "isuri": B.IS_IRI, "isblank": B.IS_BLANK,
            "isliteral": B.IS_LITERAL, "isnumeric": B.IS_NUMERIC, "str": B.STR,
            "lang": B.LANG, "datatype": B.DATATYPE, "strlen": B.STRLEN,
            "ucase": B.UCASE, "lcase": B.LCASE, "strstarts": B.STRSTARTS,
            "strends": B.STRENDS, "contains": B.CONTAINS, "strbefore": B.STRBEFORE,
            "strafter": B.STRAFTER, "encode_for_uri": B.ENCODE_FOR_URI,
            "concat": B.CONCAT, "langmatches": B.LANGMATCHES, "abs": B.ABS,
            "ceil": B.CEIL, "floor": B.FLOOR, "round": B.ROUND,
            "year": B.YEAR, "month": B.MONTH, "day": B.DAY, "hours": B.HOURS,
            "minutes": B.MINUTES, "seconds": B.SECONDS, "tz": B.TZ,
            "timezone": B.TIMEZONE,
            "md5": B.MD5, "sha1": B.SHA1, "sha256": B.SHA256, "sha384": B.SHA384,
            "sha512": B.SHA512,
            # SPARQL-star (RDF-star CG; beyond the reference)
            "istriple": B.IS_TRIPLE, "triple": B.TRIPLE_FN, "subject": B.SUBJECT,
            "predicate": B.PREDICATE, "object": B.OBJECT,
        }
        if name == "bound":
            self.eat_op("(")
            v = self.next().text[1:]
            self.eat_op(")")
            return B.BOUND(v)
        if name in ("rand",):
            self.eat_op("(")
            self.eat_op(")")
            return B.RAND()
        if name == "now":
            self.eat_op("(")
            self.eat_op(")")
            return B.NOW()
        if name in ("uuid",):
            self.eat_op("(")
            self.eat_op(")")
            return B.UUID()
        if name == "struuid":
            self.eat_op("(")
            self.eat_op(")")
            return B.STRUUID()
        if name == "bnode":
            self.eat_op("(")
            if self.at_op(")"):
                self.next()
                return B.BNODE()
            e = self.parse_expr()
            self.eat_op(")")
            return B.BNODE(e)
        if name == "iri" or name == "uri":
            a = self._expr_list()
            return B.IRI(a[0], self.base)
        if name == "substr":
            self.eat_op("(")
            x = self.parse_expr()
            self.eat_op(",")
            start = int(self.next().text)
            length = None
            if self.at_op(","):
                self.next()
                length = int(self.next().text)
            self.eat_op(")")
            return B.SUBSTR(x, start, length)
        if name in ("strdt", "strlang"):
            self.eat_op("(")
            x = self.parse_expr()
            self.eat_op(",")
            if name == "strdt":
                dt = self.parse_iri_tok(self.next()).value
                self.eat_op(")")
                return B.STRDT(x, dt)
            tag = self.parse_literal_tok().lexical
            self.eat_op(")")
            return B.STRLANG(x, tag)
        if name in ("regex", "replace"):
            self.eat_op("(")
            x = self.parse_expr()
            self.eat_op(",")
            pattern = self.parse_literal_tok().lexical
            repl = None
            flags = ""
            if name == "replace":
                self.eat_op(",")
                repl = self.parse_literal_tok().lexical
            if self.at_op(","):
                self.next()
                flags = self.parse_literal_tok().lexical
            self.eat_op(")")
            if name == "regex":
                return B.REGEX(x, pattern, flags)
            return B.REPLACE(x, pattern, repl or "", flags)
        fn = simple.get(name)
        if fn is not None:
            return fn(*self._expr_list())
        raise SyntaxError(f"unknown function {name!r}")

    def _aggregate(self, name: str) -> E:
        self.eat_op("(")
        distinct = False
        if self.at_kw("distinct"):
            distinct = True
            self.next()
        sep = " "
        out = f"__agg{len(self._aggs)}"
        if name == "count" and self.at_op("*"):
            self.next()
            self.eat_op(")")
            self._aggs.append(Agg(out, "count_star", distinct=distinct))
            return self._mark_agg(V(out))
        inner = self.parse_expr()
        if name == "group_concat" and self.at_op(";"):
            self.next()
            self.eat_kw("separator")
            self.eat_op("=")
            sep = self.parse_literal_tok().lexical
        self.eat_op(")")
        # sorted=True: deterministic distributed GROUP_CONCAT (algebra.Agg)
        self._aggs.append(
            Agg(out, name, inner, distinct=distinct, separator=sep, sorted=(name == "group_concat"))
        )
        return self._mark_agg(V(out))


# ---------------------------------------------------------------------------
# public API (rdf_sparql.ml :: execute)
# ---------------------------------------------------------------------------


def _assigned_vars(n) -> set:
    """Vars ASSIGNED (BIND / SELECT-expression AS → algebra.Extend)
    anywhere inside a pattern — the set SEP-0006 forbids from colliding
    with the LATERAL left side's in-scope vars."""
    if n is None or not isinstance(n, A.Node):
        return set()
    out = {n.var} if isinstance(n, A.Extend) else set()
    for v in vars(n).values():
        if isinstance(v, A.Node):
            out |= _assigned_vars(v)
    return out


def _in_scope_vars(n) -> set:
    """Syntactic in-scope variables of a pattern (spec §18.2.1): the vars
    a later BIND/AS may NOT re-assign. MINUS right sides and anonymous
    group keys don't project out; sub-SELECTs expose only their
    projection."""
    if n is None:
        return set()
    if isinstance(n, A.Project):
        return set(n.vars)
    if isinstance(n, A.Minus):
        return _in_scope_vars(n.left)
    if isinstance(n, A.BGP):
        out = set()
        for tp in n.patterns:
            for x in (tp.s, tp.p, tp.o, tp.g):
                if isinstance(x, Var):
                    out.add(x.name)
        return out
    if isinstance(n, P.PathPattern):
        return {x.name for x in (n.s, n.o) if isinstance(x, Var)}
    if isinstance(n, A.Extend):
        return _in_scope_vars(n.child) | {n.var}
    if isinstance(n, A.GraphNode):
        out = _in_scope_vars(n.child)
        if isinstance(n.g, Var):
            out.add(n.g.name)
        return out
    if isinstance(n, A.Values):
        return {v for row in n.rows for v in row}
    if isinstance(n, A.Group):
        return set(n.by) | {a.out for a in n.aggs}
    # generic: union over Node-valued attributes (Join, LeftJoin, Union,
    # Filter, Distinct, OrderBy, Slice, ...)
    out = set()
    for v in vars(n).values():
        if isinstance(v, A.Node):
            out |= _in_scope_vars(v)
    return out


def parse_query(text: str) -> Query:
    return Parser(text).parse_query()


def execute(text: str, ctx: Ctx):
    """Run a SPARQL query string against a dataset context.

    SELECT → DataFrame of term-struct columns (use algebra.flatten for
    lexical strings); ASK → bool; CONSTRUCT → TRIPLES DataFrame;
    DESCRIBE → TRIPLES DataFrame."""
    q = parse_query(text)
    if q.from_graphs or q.from_named:
        # §13.2: any dataset clause replaces the WHOLE dataset — the
        # unspecified side becomes EMPTY ([]), not unrestricted (None).
        # FROM-only ⇒ GRAPH patterns match nothing; FROM NAMED-only ⇒
        # non-GRAPH patterns see an empty default graph.
        ctx = Ctx(
            ctx.quads,
            ctx.graph,
            default_graphs=list(q.from_graphs),
            named_graphs=list(q.from_named),
            services=ctx.services,
        )
    if q.form == "select":
        df, c, m = q.node.compile(ctx)
        return df
    if q.form == "ask":
        return A.ask(q.node, ctx)
    if q.form == "construct":
        return A.construct(q.templates, q.node, ctx)
    if q.form == "describe":
        terms = list(q.describe_terms)
        keys_df = None
        if q.describe_vars and q.node is not None:
            # bindings stay a DataFrame end-to-end: the distinct IRI set is
            # semi-joined inside algebra.describe, never collected to the
            # driver (unbounded at scale — DESCRIBE over a large class).
            df, _, _ = q.node.compile(ctx)
            from pyspark.sql import functions as F

            for v in q.describe_vars:
                part = df.select(
                    F.col(v)["kind"].alias("s_kind"), F.col(v)["lex"].alias("s_lex")
                ).filter(F.col("s_kind") == 0)
                keys_df = part if keys_df is None else keys_df.unionByName(part)
        return A.describe(terms, ctx, keys_df=keys_df)
    raise ValueError(q.form)


# ---------------------------------------------------------------------------
# SPARQL 1.1 UPDATE (engine addition — the fork-era reference is query-only,
# SURVEY §8 "Not implemented"; semantics per the W3C SPARQL 1.1 Update spec)
#
# Spark-first realization: updates are FUNCTIONAL — each operation maps the
# quad DataFrame to a new quad DataFrame (INSERT = union + set-dedup,
# DELETE = null-safe equi anti join on the triple key, DELETE/INSERT WHERE =
# one WHERE compilation feeding both template instantiations). At the sink
# these become Iceberg MERGE INTO / DELETE FROM snapshot commits
# (pipeline.py); nothing here collects to the driver.
#
# Scope: INSERT DATA, DELETE DATA, DELETE WHERE, [WITH g] DELETE/INSERT
# ... WHERE (incl. GRAPH ?var templates, instantiated per solution),
# USING / USING NAMED, CLEAR/DROP (GRAPH g | DEFAULT | NAMED | ALL),
# CREATE (no-op — graphs exist implicitly as quad rows), COPY/MOVE/ADD,
# LOAD file:// only (no network).
# ---------------------------------------------------------------------------


@dataclass
class UpdateOp:
    kind: str  # insert_data | delete_data | modify | clear | create
    data: list = field(default_factory=list)              # [(TriplePattern ground, graph|None)]
    delete_templates: list = field(default_factory=list)  # [(Template, graph|None)]
    insert_templates: list = field(default_factory=list)
    node: Optional[Node] = None
    target: Optional[str] = None                          # clear: 'default'|'named'|'all'|iri; copy/move/add: source
    target2: Optional[str] = None                         # copy/move/add: destination ('default'|iri); load: INTO graph
    silent: bool = False                                  # load: failure → no-op
    with_graph: Optional[str] = None
    using_graphs: list = field(default_factory=list)      # USING <g> (WHERE default graph)
    using_named: list = field(default_factory=list)       # USING NAMED <g>


def _mk_update_parser_methods():
    """Attach update parsing to Parser (kept separate from the query
    grammar for readability; same token stream / term parsers)."""

    def _prologue(self):
        while self.at_kw("base", "prefix"):
            if self.at_kw("base"):
                self.next()
                self.base = self.next().text[1:-1]
            else:
                self.next()
                pt = self.next()
                if pt.kind != "PNAME":
                    raise SyntaxError("expected prefix name")
                pfx = pt.text[:-1] if pt.text.endswith(":") else pt.text.split(":")[0]
                iri = self.parse_iri_tok(self.next())
                self.prefixes[pfx] = iri.value

    def parse_update(self):
        ops = []
        while True:
            _prologue(self)
            if self.peek().kind == "EOF":
                break
            ops.append(self._update_op())
            if self.at_op(";"):
                self.next()
                continue
            break
        if self.peek().kind != "EOF":
            raise SyntaxError(f"trailing tokens in update: {self.peek().text!r}")
        if not ops:
            raise SyntaxError("empty update request")
        return ops

    def _quad_block(self):
        """QuadPattern: { TriplesBlock? (GRAPH iri { TriplesBlock? } '.'?)* }
        → [(TriplePattern, graph-IRI|None)]."""
        self.eat_op("{")
        out = []
        while not self.at_op("}"):
            if self.at_kw("graph"):
                self.next()
                gt = self.next()
                # GRAPH ?var is legal in modify templates (instantiated per
                # solution); DATA forms reject it via _ground
                g = Var(gt.text[1:]) if gt.kind == "VAR" else self.parse_iri_tok(gt).value
                self.eat_op("{")
                if not self.at_op("}"):
                    tps, paths = self._triples_block(allow_paths=False)
                    if paths:
                        raise SyntaxError("property paths not allowed in update templates")
                    out.extend((tp, g) for tp in tps)
                self.eat_op("}")
                if self.at_op("."):
                    self.next()
            else:
                tps, paths = self._triples_block(allow_paths=False)
                if paths:
                    raise SyntaxError("property paths not allowed in update templates")
                out.extend((tp, None) for tp in tps)
        self.eat_op("}")
        return out

    def _ground(self, quads, forbid_bnodes=False):
        for tp, g in quads:
            for x in (tp.s, tp.p, tp.o, g):
                if isinstance(x, (Var, A.QuotedPattern)):
                    raise SyntaxError("variables not allowed in INSERT/DELETE DATA")
                if forbid_bnodes and isinstance(x, BNode):
                    raise SyntaxError("blank nodes not allowed in DELETE DATA")
        return quads

    def _no_bnodes(self, quads, where):
        """Update grammar: DELETE templates / DELETE WHERE patterns must
        not contain blank nodes (they could never match-by-label, and the
        spec forbids them outright)."""
        for tp, _g in quads:
            for x in (tp.s, tp.p, tp.o):
                if isinstance(x, BNode):
                    raise SyntaxError(f"blank nodes not allowed in {where}")
        return quads

    def _quads_to_node(self, quads):
        """DELETE WHERE: the quad pattern is both template and WHERE."""
        by_g: dict = {}
        for tp, g in quads:
            by_g.setdefault(g, []).append(tp)
        node = None
        for g, tps in by_g.items():
            sub = A.BGP(tps)
            if g is not None:
                sub = A.GraphNode(g, sub)
            node = sub if node is None else A.Join(node, sub)
        return node

    def _templates(self, quads):
        return [(Template(tp.s, tp.p, tp.o), g) for tp, g in quads]

    def _using_clause(self):
        """UsingClause* (Update spec §3.1.3 — the WHERE-side dataset;
        when present it REPLACES the WITH graph for pattern matching)."""
        usings, named = [], []
        while self.at_kw("using"):
            self.next()
            if self.at_kw("named"):
                self.next()
                named.append(self.parse_iri_tok(self.next()).value)
            else:
                usings.append(self.parse_iri_tok(self.next()).value)
        return usings, named

    def _update_op(self):
        if self.at_kw("create"):
            self.next()
            if self.at_kw("silent"):
                self.next()
            self.eat_kw("graph")
            self.parse_iri_tok(self.next())
            return UpdateOp("create")  # graphs exist implicitly — no-op
        if self.at_kw("clear", "drop"):
            self.next()
            if self.at_kw("silent"):
                self.next()
            if self.at_kw("graph"):
                self.next()
                return UpdateOp("clear", target=self.parse_iri_tok(self.next()).value)
            t = self.next().text.lower()
            if t not in ("default", "named", "all"):
                raise SyntaxError(f"CLEAR: expected GRAPH/DEFAULT/NAMED/ALL, got {t!r}")
            return UpdateOp("clear", target=t)
        if self.at_kw("load"):
            # LOAD SILENT? iri (INTO GRAPH iri)? — §3.1.4. Only file:// (or
            # bare-path) sources are supported: the sandbox/engine has no
            # network; http IRIs raise at execution, SILENT downgrades any
            # load failure to a no-op per spec.
            self.next()
            silent = False
            if self.at_kw("silent"):
                self.next()
                silent = True
            src = self.parse_iri_tok(self.next()).value
            into = None
            if self.at_kw("into"):
                self.next()
                self.eat_kw("graph")
                into = self.parse_iri_tok(self.next()).value
            return UpdateOp("load", target=src, target2=into, silent=silent)
        if self.at_kw("copy", "move", "add"):
            # (COPY|MOVE|ADD) SILENT? GraphOrDefault TO GraphOrDefault
            # (Update spec §3.2.3–3.2.5)
            kind = self.next().text.lower()
            if self.at_kw("silent"):
                self.next()

            def graph_or_default():
                if self.at_kw("default"):
                    self.next()
                    return "default"
                if self.at_kw("graph"):
                    self.next()
                return self.parse_iri_tok(self.next()).value

            src = graph_or_default()
            self.eat_kw("to")
            return UpdateOp(kind, target=src, target2=graph_or_default())
        with_graph = None
        if self.at_kw("with"):
            self.next()
            with_graph = self.parse_iri_tok(self.next()).value
        if self.at_kw("insert"):
            self.next()
            if self.at_kw("data"):
                self.next()
                return UpdateOp("insert_data", data=self._ground(self._quad_block()), with_graph=with_graph)
            ins = self._quad_block()
            usings, unamed = self._using_clause()
            self.eat_kw("where")
            node = self.parse_group_graph_pattern()
            return UpdateOp(
                "modify",
                insert_templates=self._templates(ins),
                node=node,
                with_graph=with_graph,
                using_graphs=usings,
                using_named=unamed,
            )
        if self.at_kw("delete"):
            self.next()
            if self.at_kw("data"):
                self.next()
                return UpdateOp(
                    "delete_data",
                    data=self._ground(self._quad_block(), forbid_bnodes=True),
                    with_graph=with_graph,
                )
            if self.at_kw("where"):
                self.next()
                pat = self._no_bnodes(self._quad_block(), "DELETE WHERE")
                return UpdateOp(
                    "modify",
                    delete_templates=self._templates(pat),
                    node=self._quads_to_node(pat),
                    with_graph=with_graph,
                )
            dels = self._no_bnodes(self._quad_block(), "DELETE templates")
            ins = []
            if self.at_kw("insert"):
                self.next()
                ins = self._quad_block()
            usings, unamed = self._using_clause()
            self.eat_kw("where")
            node = self.parse_group_graph_pattern()
            return UpdateOp(
                "modify",
                delete_templates=self._templates(dels),
                insert_templates=self._templates(ins),
                node=node,
                with_graph=with_graph,
                using_graphs=usings,
                using_named=unamed,
            )
        raise SyntaxError(f"expected update operation, got {self.peek().text!r}")

    Parser.parse_update = parse_update
    Parser._using_clause = _using_clause
    Parser._update_op = _update_op
    Parser._quad_block = _quad_block
    Parser._ground = _ground
    Parser._no_bnodes = _no_bnodes
    Parser._quads_to_node = _quads_to_node
    Parser._templates = _templates


_mk_update_parser_methods()


def _load_document(iri: str) -> list:
    """LOAD source → [(s, p, o)]. file:// or bare local paths only;
    format by extension (.nt, .ttl, .rdf/.xml), base = the source IRI."""
    if iri.startswith(("http://", "https://")):
        raise ValueError(f"LOAD over the network is not supported: {iri}")
    path = iri[len("file://"):] if iri.startswith("file://") else iri
    with open(path) as f:
        text = f.read()
    low = path.lower()
    if low.endswith(".nt"):
        from .sources.ntriples import parse_ntriples

        return list(parse_ntriples(text))
    if low.endswith(".ttl"):
        from .sources.turtle import TurtleParser

        return TurtleParser(text, base=iri).parse()
    if low.endswith((".rdf", ".xml")):
        from .sources.rdfxml import parse_rdfxml

        return parse_rdfxml(text, base=iri)
    raise ValueError(f"LOAD: unsupported document format: {path}")


def _anti_join_quads(df, dels):
    """Remove every quad in `dels` from `df`: null-safe equality on all
    TRIPLE_KEY components — all-equi, so Catalyst plans a hash anti join
    (never a nested loop); o_dtype/o_lang NULLs compare null-safely."""
    from pyspark.sql import functions as F

    from .types import TRIPLE_KEY

    L, R = df.alias("l"), dels.alias("r")
    cond = F.lit(True)
    for k in TRIPLE_KEY:
        cond = cond & F.col(f"l.{k}").eqNullSafe(F.col(f"r.{k}"))
    return L.join(R, cond, "left_anti")


def execute_update(text: str, quads, default_graph: Optional[str] = None):
    """Apply a SPARQL-Update request to a quad DataFrame → new DataFrame.

    Functional (rdf_graph.ml mutates in place; immutable DataFrames +
    Iceberg snapshot commits are the Spark realization — SURVEY §1.3
    transactions row). `default_graph` receives triples whose template/
    data has no GRAPH wrapper and no WITH."""
    from pyspark.sql import functions as F

    from .types import DEFAULT_GRAPH, TRIPLES_SCHEMA, TRIPLE_KEY, triple_row

    default_graph = default_graph or DEFAULT_GRAPH
    spark = quads.sparkSession
    ops = Parser(text).parse_update()
    # per-request nonce: INSERT DATA / INSERT-template bnodes must be FRESH
    # each request (re-running the same update mints new bnodes, and labels
    # never collide with store bnodes)
    import uuid

    nonce = uuid.uuid4().hex[:12]
    df = quads
    for op in ops:
        if op.kind == "create":
            continue
        if op.kind == "clear":
            if op.target == "all":
                df = df.filter(F.lit(False))
            elif op.target == "default":
                df = df.filter(F.col("graph") != default_graph)
            elif op.target == "named":
                df = df.filter(F.col("graph") == default_graph)
            else:
                df = df.filter(F.col("graph") != op.target)
            continue
        if op.kind == "load":
            # §3.1.4 — file:// / local-path documents only (no network in
            # this engine; http(s) raises, or no-ops under SILENT). The
            # document's own format (by extension) picks the parser; the
            # source IRI is the parse base per spec.
            try:
                triples = _load_document(op.target)
            except Exception:
                if op.silent:
                    continue
                raise
            g = op.target2 or default_graph
            rows = [triple_row(s, p, o, graph=g) for s, p, o in triples]
            if rows:
                lit = spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)
                df = df.unionByName(lit).dropDuplicates(TRIPLE_KEY)
            continue
        if op.kind in ("copy", "move", "add"):
            # §3.2.3–3.2.5: COPY empties dst then inserts all of src; MOVE
            # additionally drops src; ADD unions into dst (set semantics).
            # All three are graph-column rewrites — no join, one narrow
            # map + (ADD only) one set-dedup shuffle.
            src = default_graph if op.target == "default" else op.target
            dst = default_graph if op.target2 == "default" else op.target2
            if src == dst:
                continue
            moved = df.filter(F.col("graph") == src).withColumn("graph", F.lit(dst))
            if op.kind in ("copy", "move"):
                df = df.filter(F.col("graph") != dst)
            df = df.unionByName(moved)
            if op.kind == "move":
                df = df.filter(F.col("graph") != src)
            if op.kind == "add":
                df = df.dropDuplicates(TRIPLE_KEY)
            continue
        if op.kind in ("insert_data", "delete_data"):
            # INSERT DATA bnode labels are scoped to the REQUEST (Update
            # spec §3.1.1): salt them with the per-request nonce so they
            # never co-refer with same-labeled bnodes already in the store
            # (DELETE DATA bnodes are rejected at parse).
            def _salt(x):
                return BNode(f"{x.label}-{nonce}") if isinstance(x, BNode) else x

            rows = [
                triple_row(_salt(tp.s), tp.p, _salt(tp.o), graph=g or op.with_graph or default_graph)
                for tp, g in op.data
            ]
            lit = spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)
            if op.kind == "insert_data":
                df = df.unionByName(lit).dropDuplicates(TRIPLE_KEY)
            else:
                df = _anti_join_quads(df, F.broadcast(lit))
            continue
        # modify: one WHERE compilation feeds both template sets, both
        # evaluated against the PRE-update store (spec: delete and insert
        # sets are computed first, then applied delete-before-insert).
        # USING overrides WITH for the WHERE side (Update spec §3.1.3).
        if op.using_graphs or op.using_named:
            # like FROM/FROM NAMED (§13.2): any USING clause replaces the
            # whole WHERE-side dataset — the unspecified side is EMPTY
            ctx = Ctx(
                df, None,
                default_graphs=list(op.using_graphs),
                named_graphs=list(op.using_named),
            )
        elif op.with_graph is not None:
            ctx = Ctx(df, op.with_graph)
        else:
            # §3.1.3: absent WITH/USING, the WHERE side matches the Graph
            # Store's DEFAULT graph (named graphs stay reachable through
            # GRAPH patterns) — not the store-wide union view that a bare
            # Ctx(graph=None) gives the query side
            ctx = Ctx(df, None, default_graphs=[default_graph])
        def inst(templates):
            items = [(t, g or op.with_graph or default_graph) for t, g in templates]
            return A.instantiate_quads(items, op.node, ctx, nonce=nonce)

        dels = inst(op.delete_templates) if op.delete_templates else None
        ins = inst(op.insert_templates) if op.insert_templates else None
        if dels is not None:
            df = _anti_join_quads(df, dels)
        if ins is not None:
            df = df.unionByName(ins).dropDuplicates(TRIPLE_KEY)
    return df
