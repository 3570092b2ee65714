"""SPARQL algebra (spec §18.2) → Spark DataFrame plans.

Parity: rdf_sparql_types.ml (AST) + rdf_sparql_algebra.ml (translation) +
rdf_sparql_eval.ml / rdf_sparql_ms.ml (multiset evaluation) — SURVEY §2.3.
The reference evaluates solution-mapping multisets tuple-at-a-time; here a
solution multiset IS a DataFrame with one TERM_STRUCT column per variable
(NULL = unbound), and every algebra operator is a DataFrame transformation,
so Catalyst gets the whole tree: predicate pushdown into the quad scans,
join reordering, AQE skew handling — none of which the reference has
(SURVEY §4).

Compatibility rule (rdf_sparql_ms.ml :: compatible): two mappings join iff
they agree on shared *bound* vars. Nodes track which vars are certainly
bound; when all shared vars are certain on both sides the join condition is
plain (hash-joinable) equality, otherwise the null-tolerant compatibility
condition is emitted (SURVEY §2.3 Join note).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .functions.builtins import E, ebv_e
from .functions.terms import ebv, sort_key, t_iri, term_lit
from .types import KIND_LITERAL, Term
from .types import Iri as PyIri

# ---------------------------------------------------------------------------
# variables & patterns
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Var:
    name: str


Position = Union[Var, Term]


@dataclass(frozen=True)
class QuotedPattern:
    """RDF-star quoted-triple pattern `<< s p o >>` in a subject/object
    position: matches stored quoted-triple terms (kind 3) whose components
    unify with s/p/o. Ground components become flat string filters on the
    field encoding; Var components bind via exact splits (types.QuotedTriple
    encoding). Inner patterns must be single-level (v1)."""

    s: Position
    p: Position
    o: Position


@dataclass(frozen=True)
class TriplePattern:
    s: Position
    p: Position
    o: Position
    g: Union[Var, str, None] = None  # None = inherit context


class Ctx:
    """Dataset context: the quad DataFrame + active-graph state (rdf_ds.ml).

    `default_graphs` / `named_graphs` realize SPARQL dataset clauses
    (§13.2, FROM / FROM NAMED): None = unrestricted (default graph = RDF
    merge of all graphs; GRAPH ?g ranges over all graphs); a list
    restricts the respective side. All restrictions compile to graph-
    column filters on the leaf scans, so they push down and prune the
    graph-partitioned store."""

    def __init__(
        self,
        quads: DataFrame,
        graph: Union[Var, str, None] = None,
        default_graphs: Optional[list] = None,
        named_graphs: Optional[list] = None,
        services: Optional[dict] = None,
        stats: Optional[dict] = None,
    ):
        self.quads = quads
        self.graph = graph  # None = union of all graphs (RDF merge view)
        self.default_graphs = default_graphs
        self.named_graphs = named_graphs
        # SERVICE registry: endpoint IRI -> quad DataFrame (§SERVICE node).
        self.services = services
        # optional ANALYZE output (predicate → (n, n_subj, n_obj), see
        # `analyze`): planner metadata for stats-driven BGP ordering.
        # None ⇒ the boundness heuristic (unchanged default behavior).
        self.stats = stats

    def with_graph(self, g: Union[Var, str, None]) -> "Ctx":
        return Ctx(self.quads, g, self.default_graphs, self.named_graphs, self.services, self.stats)


def analyze(quads: DataFrame) -> dict:
    """ANALYZE for the triple store: per-predicate row count and distinct
    subject/object counts → {pred: (n, n_subj, n_obj)}. The result is
    planner metadata (like Spark's own table statistics): it is collected
    to the driver, but is bounded by the VOCABULARY size — predicates
    number in the thousands even on a 10^12-triple web corpus — and at
    production scale it is computed once per store commit and cached in
    the catalog, not per query."""
    rows = (
        quads.groupBy("pred")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct("s_lex").alias("ns"),
            F.approx_count_distinct("o_lex").alias("no"),
        )
        .collect()
    )
    return {r["pred"]: (r["n"], max(r["ns"], 1), max(r["no"], 1)) for r in rows}


#: compile result: (solutions DataFrame, certainly-bound vars, maybe-bound vars)
CompileOut = tuple[DataFrame, frozenset, frozenset]


def _varmap(df_vars, qualifier: Optional[str] = None) -> dict:
    if qualifier:
        return {v: F.col(f"{qualifier}.{v}") for v in df_vars}
    return {v: F.col(v) for v in df_vars}


# ---------------------------------------------------------------------------
# algebra nodes
# ---------------------------------------------------------------------------


class Node:
    def compile(self, ctx: Ctx) -> CompileOut:
        raise NotImplementedError

    # fluent builders -------------------------------------------------------
    def join(self, other: "Node") -> "Node":
        return Join(self, other)

    def left_join(self, other: "Node", expr: Optional[E] = None) -> "Node":
        return LeftJoin(self, other, expr)

    def filter(self, expr: E) -> "Node":
        return Filter(expr, self)

    def union(self, other: "Node") -> "Node":
        return UnionNode(self, other)

    def minus(self, other: "Node") -> "Node":
        return Minus(self, other)

    def extend(self, var: str, expr: E) -> "Node":
        return Extend(self, var, expr)

    def project(self, *vars_: str) -> "Node":
        return Project(self, list(vars_))

    def distinct(self) -> "Node":
        return Distinct(self)

    def group(self, by: Sequence[str], aggs: Sequence["Agg"]) -> "Node":
        return Group(self, list(by), list(aggs))

    def order_by(self, *conds) -> "Node":
        return OrderBy(self, list(conds))

    def slice(self, offset: int = 0, limit: Optional[int] = None) -> "Node":
        return Slice(self, offset, limit)

    def exists(self, sub: "Node", negated: bool = False) -> "Node":
        return ExistsFilter(self, sub, negated)


def _bound_filters(pos: str, t: Term) -> list[Column]:
    """Flat equality predicates for a bound pattern position (parquet-
    pushable, unlike struct equality). Plain literals are normalized to
    xsd:string on BOTH sides (types.triple_row / functions.terms.term_lit),
    so field-wise equality is exactly struct equality here."""
    from .types import KIND_BNODE, KIND_IRI, XSD_STRING, BNode, Literal
    from .types import Iri as _Iri

    if pos == "p":
        if isinstance(t, _Iri):
            return [F.col("pred") == t.value]
        return [F.lit(False)]  # non-IRI predicate matches nothing
    kcol, lcol = f"{pos}_kind", f"{pos}_lex"
    if isinstance(t, _Iri):
        return [F.col(kcol) == KIND_IRI, F.col(lcol) == t.value]
    if isinstance(t, BNode):
        return [F.col(kcol) == KIND_BNODE, F.col(lcol) == t.label]
    from .types import KIND_TRIPLE, QuotedTriple

    if isinstance(t, QuotedTriple):  # ground RDF-star term: canonical lex
        return [F.col(kcol) == KIND_TRIPLE, F.col(lcol) == t.encode()]
    assert isinstance(t, Literal)
    if pos == "s":
        return [F.lit(False)]  # literal subjects match nothing (rdf_term.ml)
    conds = [F.col(kcol) == KIND_LITERAL, F.col(lcol) == t.lexical]
    if t.lang:
        conds.append(F.col("o_lang") == t.lang)
    else:
        conds.append(F.col("o_dtype") == (t.dtype or XSD_STRING))
    return conds


def _graph_in(graphs: list) -> Column:
    """Graph-restriction predicate; [] = match nothing (a dataset clause
    replaced this side of the dataset with the empty set, §13.2)."""
    return F.col("graph").isin(*graphs) if graphs else F.lit(False)


def _scan(ctx: Ctx, tp: TriplePattern) -> CompileOut:
    """One triple-pattern scan: bound positions become pushed filters,
    var positions become TERM_STRUCT columns (rdf_sparql_eval.ml ::
    eval_bgp's candidate extension, turned columnar)."""
    df = ctx.quads
    g = tp.g if tp.g is not None else ctx.graph
    if isinstance(g, str):
        if ctx.named_graphs is not None and g not in ctx.named_graphs:
            df = df.filter(F.lit(False))  # GRAPH <iri> outside FROM NAMED
        else:
            df = df.filter(F.col("graph") == g)
    elif isinstance(g, Var) and ctx.named_graphs is not None:
        df = df.filter(_graph_in(ctx.named_graphs))
    elif isinstance(g, Var):
        # GRAPH ?var ranges over NAMED graphs only (§13.3): rows living in
        # the store's distinguished default graph are not named
        from .types import DEFAULT_GRAPH

        df = df.filter(F.col("graph") != DEFAULT_GRAPH)
    elif g is None and ctx.default_graphs is not None:
        df = df.filter(_graph_in(ctx.default_graphs))

    s_struct = F.struct(
        F.col("s_kind").alias("kind"),
        F.col("s_lex").alias("lex"),
        F.lit(None).cast("string").alias("dtype"),
        F.lit(None).cast("string").alias("lang"),
    )
    p_struct = t_iri(F.col("pred"))
    o_struct = F.struct(
        F.col("o_kind").alias("kind"),
        F.col("o_lex").alias("lex"),
        F.col("o_dtype").alias("dtype"),
        F.col("o_lang").alias("lang"),
    )
    pos_cols = {"s": s_struct, "p": p_struct, "o": o_struct}
    out: dict[str, Column] = {}
    for pos, item in (("s", tp.s), ("p", tp.p), ("o", tp.o)):
        if isinstance(item, Var):
            if item.name in out:  # repeated var within one pattern
                df = df.filter(pos_cols[pos].eqNullSafe(out[item.name]))
            else:
                out[item.name] = pos_cols[pos]
        elif isinstance(item, QuotedPattern):
            # RDF-star: match kind-3 terms; ground inner components are
            # exact string filters on the canonical field encoding, Var
            # components bind via splits (the kind filter pushes to the
            # scan; component work is scan-local string ops)
            from .types import KIND_TRIPLE, QT_FSEP, QT_SEP, _qt_field

            kcol, lcol = f"{pos}_kind", f"{pos}_lex"
            df = df.filter(F.col(kcol) == KIND_TRIPLE)
            for i, inner in ((1, item.s), (2, item.p), (3, item.o)):
                fld = F.element_at(F.split(F.col(lcol), QT_SEP), i)
                if isinstance(inner, Var):
                    fs = F.split(fld, QT_FSEP)
                    col = F.struct(
                        F.element_at(fs, 1).cast("tinyint").alias("kind"),
                        F.element_at(fs, 2).alias("lex"),
                        F.nullif(F.element_at(fs, 3), F.lit("")).alias("dtype"),
                        F.nullif(F.element_at(fs, 4), F.lit("")).alias("lang"),
                    )
                    if inner.name in out:
                        df = df.filter(col.eqNullSafe(out[inner.name]))
                    else:
                        out[inner.name] = col
                else:
                    df = df.filter(fld == _qt_field(inner))
        else:
            # bound position: flat per-field equality predicates, NOT a
            # struct comparison — struct equality cannot push to the
            # parquet scan; these reach PushedFilters and prune the
            # POS/SPO store's files and row groups (SURVEY §3 EP3)
            for c in _bound_filters(pos, item):
                df = df.filter(c)
    if isinstance(g, Var):
        gcol = t_iri(F.col("graph"))
        if g.name in out:
            # GRAPH ?g { ?g ... } / shared var: the graph variable is
            # ALSO a pattern position — join-compatibility filter, not
            # overwrite (the term must equal the graph IRI)
            df = df.filter(out[g.name].eqNullSafe(gcol))
        out[g.name] = gcol
    if not out:
        # fully ground pattern: empty-binding solution per match
        df = df.select(F.lit(1).alias("__m"))
        return df, frozenset(), frozenset()
    df = df.select(*[c.alias(v) for v, c in out.items()])
    return df, frozenset(out), frozenset()


def _merge_join(
    left: CompileOut, right: CompileOut, how: str, extra: Optional[E] = None
) -> CompileOut:
    ldf, lc, lm = left
    rdf, rc, rm = right
    lvars, rvars = lc | lm, rc | rm
    shared = lvars & rvars

    if not shared and how == "inner" and extra is None:
        df = ldf.crossJoin(rdf)
        return df, lc | rc, lm | rm

    L, R = ldf.alias("l"), rdf.alias("r")
    cond = F.lit(True)
    for v in sorted(shared):
        lv, rv = F.col(f"l.{v}"), F.col(f"r.{v}")
        if v in lc and v in rc:
            cond = cond & lv.eqNullSafe(rv)  # hash-joinable equality
        else:
            cond = cond & (lv.eqNullSafe(rv) | lv.isNull() | rv.isNull())
    if extra is not None:
        vm = {}
        for v in lvars | rvars:
            if v in shared:
                vm[v] = F.coalesce(F.col(f"l.{v}"), F.col(f"r.{v}"))
            elif v in lvars:
                vm[v] = F.col(f"l.{v}")
            else:
                vm[v] = F.col(f"r.{v}")
        cond = cond & F.coalesce(ebv_e(extra, vm), F.lit(False))

    out_cols = []
    for v in sorted(lvars | rvars):
        if v in shared:
            out_cols.append(F.coalesce(F.col(f"l.{v}"), F.col(f"r.{v}")).alias(v))
        elif v in lvars:
            out_cols.append(F.col(f"l.{v}").alias(v))
        else:
            out_cols.append(F.col(f"r.{v}").alias(v))
    df = L.join(R, cond, how).select(*out_cols)
    if how == "inner":
        return df, lc | rc, (lm | rm) - (lc | rc)
    # left_outer: right-side vars become maybe-bound
    return df, lc, (lm | rvars) - lc


def _bgp_order(patterns: Sequence, stats: Optional[dict]) -> list:
    """Join order for a BGP, as pattern indices. Pure function (no
    SparkSession) so it unit-tests directly.

    Without stats: the original cheap heuristic — more bound positions
    first (Catalyst/AQE may still reorder the resulting inner joins).

    With stats (Ctx.stats, from `analyze`): greedy smallest-estimated-
    cardinality first, CONNECTED patterns only once a seed is chosen —
    each step must share a variable with what is already joined, so the
    plan never manufactures a cross join between disconnected prefixes
    (the boundness order can: two selective but unrelated patterns first
    ⇒ their join is a Cartesian product). Estimates: n(pred), divided by
    distinct subjects/objects per bound s/o position; an unbound
    predicate scans the whole store; a predicate absent from the stats
    is an empty scan — cheapest possible, seed it first."""

    def boundness(tp) -> int:
        return sum(0 if isinstance(x, Var) else 1 for x in (tp.s, tp.p, tp.o))

    if stats is None:
        return sorted(range(len(patterns)), key=lambda i: (-boundness(patterns[i]), i))

    total = sum(n for n, _s, _o in stats.values()) or 1

    def est(tp) -> float:
        if isinstance(tp.p, Var):
            base, ns, no = total, 1, 1
        elif tp.p.value in stats:
            base, ns, no = stats[tp.p.value]
        else:
            return 0.0
        e = float(base)
        if not isinstance(tp.s, Var):
            e /= ns
        if not isinstance(tp.o, Var):
            e /= no
        return e

    def tpvars(tp) -> set:
        out = {x.name for x in (tp.s, tp.p, tp.o) if isinstance(x, Var)}
        if isinstance(getattr(tp, "g", None), Var):
            out.add(tp.g.name)
        return out

    remaining = set(range(len(patterns)))
    costs = {i: est(patterns[i]) for i in remaining}
    order: list = []
    bound: set = set()
    while remaining:
        pool = [i for i in remaining if tpvars(patterns[i]) & bound] if bound else []
        pool = pool or list(remaining)
        i = min(pool, key=lambda j: (costs[j], -boundness(patterns[j]), j))
        order.append(i)
        remaining.remove(i)
        bound |= tpvars(patterns[i])
    return order


@dataclass
class BGP(Node):
    """Basic graph pattern: conjunctive triple patterns, equi-joined on
    shared vars (SURVEY §2.3 BGP row)."""

    patterns: Sequence[TriplePattern]

    def compile(self, ctx: Ctx) -> CompileOut:
        if not self.patterns:
            spark = ctx.quads.sparkSession
            return spark.range(1).select(F.lit(1).alias("__unit")), frozenset(), frozenset()
        ordered = _bgp_order(self.patterns, ctx.stats)
        acc = _scan(ctx, self.patterns[ordered[0]])
        for i in ordered[1:]:
            acc = _merge_join(acc, _scan(ctx, self.patterns[i]), "inner")
        return acc


@dataclass
class Join(Node):
    left: Node
    right: Node

    def compile(self, ctx: Ctx) -> CompileOut:
        # a SILENT service on an unknown endpoint is STATICALLY the unit
        # multiset (one empty solution — the join identity): elide it here
        # instead of emitting a 1-row cross join into the plan
        for keep, drop in ((self.left, self.right), (self.right, self.left)):
            if isinstance(drop, ServiceNode) and drop.is_join_identity(ctx):
                return keep.compile(ctx)
        return _merge_join(self.left.compile(ctx), self.right.compile(ctx), "inner")


@dataclass
class LeftJoin(Node):
    """OPTIONAL: the filter expression is part of the join condition
    (spec §18.5 — NOT a post-filter)."""

    left: Node
    right: Node
    expr: Optional[E] = None

    def compile(self, ctx: Ctx) -> CompileOut:
        return _merge_join(self.left.compile(ctx), self.right.compile(ctx), "left_outer", self.expr)


@dataclass
class Filter(Node):
    expr: E
    child: Node

    def compile(self, ctx: Ctx) -> CompileOut:
        df, c, m = self.child.compile(ctx)
        vm = _varmap(c | m)
        return df.filter(F.coalesce(ebv_e(self.expr, vm), F.lit(False))), c, m


@dataclass
class UnionNode(Node):
    left: Node
    right: Node

    def compile(self, ctx: Ctx) -> CompileOut:
        ldf, lc, lm = self.left.compile(ctx)
        rdf, rc, rm = self.right.compile(ctx)
        for v in (rc | rm) - (lc | lm):
            ldf = ldf.withColumn(v, F.lit(None).cast("struct<kind:tinyint,lex:string,dtype:string,lang:string>"))
        for v in (lc | lm) - (rc | rm):
            rdf = rdf.withColumn(v, F.lit(None).cast("struct<kind:tinyint,lex:string,dtype:string,lang:string>"))
        df = ldf.unionByName(rdf)
        return df, lc & rc, (lc | lm | rc | rm) - (lc & rc)


@dataclass
class Minus(Node):
    """MINUS (spec §18.5): remove mappings compatible with some right-side
    mapping sharing ≥1 bound var — anti join + domain-overlap guard."""

    left: Node
    right: Node

    def compile(self, ctx: Ctx) -> CompileOut:
        ldf, lc, lm = self.left.compile(ctx)
        rdf, rc, rm = self.right.compile(ctx)
        shared = (lc | lm) & (rc | rm)
        # GRAPH ?g { A MINUS B }: per the §18.2.2.2 translation the MINUS
        # is evaluated PER GRAPH with ?g not yet in scope — this engine
        # instead threads ?g through both sides' scans, which is exactly
        # the per-graph restriction when another var is shared, but must
        # NOT count toward §18.5's domain-overlap test on its own (r5 fix,
        # pinned by graph-minus-unshared)
        gname = ctx.graph.name if isinstance(ctx.graph, Var) else None
        effective = shared - {gname}
        if not effective:
            return ldf, lc, lm  # disjoint domains: remove nothing
        L, R = ldf.alias("l"), rdf.alias("r")
        # Fast path: vars certainly bound on BOTH sides compile to plain
        # null-safe equality — Catalyst extracts these as hash-join keys, so
        # the anti join is a shuffle/broadcast HASH join, never a
        # BroadcastNestedLoopJoin (the O(L×R) scale killer). Only the
        # maybe-bound vars keep the null-tolerant compat condition, riding
        # along as a post-join filter on the hash join.
        certain = shared & lc & rc
        compat = F.lit(True)
        overlap = F.lit(True) if (certain & effective) else F.lit(False)
        for v in sorted(shared):
            lv, rv = F.col(f"l.{v}"), F.col(f"r.{v}")
            if v in certain:
                compat = compat & lv.eqNullSafe(rv)  # hash-joinable key
            else:
                compat = compat & (lv.eqNullSafe(rv) | lv.isNull() | rv.isNull())
                if v != gname:  # ?g never contributes domain overlap
                    overlap = overlap | (lv.isNotNull() & rv.isNotNull())
        df = L.join(R, compat & overlap, "left_anti")
        return df, lc, lm


@dataclass
class GraphNode(Node):
    """GRAPH g {P}: IRI ⇒ filter pushed to leaf scans; var ⇒ graph column
    becomes a bound var (SURVEY §2.3 Graph row)."""

    g: Union[Var, str]
    child: Node

    def compile(self, ctx: Ctx) -> CompileOut:
        df, c, m = self.child.compile(ctx.with_graph(self.g))
        if isinstance(self.g, Var):
            return df, c | {self.g.name}, m - {self.g.name}
        return df, c, m


@dataclass
class ServiceNode(Node):
    """SERVICE [SILENT] endpoint {P} — SPARQL 1.1 Federated Query, evaluated
    against an in-process service REGISTRY (Ctx.services: endpoint IRI →
    quad DataFrame). The reference leaves SERVICE unimplemented
    (rdf_sparql_eval.ml raises — SURVEY §2.3); this goes beyond it the same
    way UPDATE does, but keeps the sandbox's no-network mandate: a "remote"
    endpoint is just another quad table (at 100 TB: a different Iceberg
    catalog/table federated through the same metastore), so the service
    sub-pattern compiles with the ordinary BGP/join machinery and Catalyst
    co-plans BOTH sides — cross-source join pushdown a real HTTP federation
    can't have. An HTTP transport would slot in exactly here (fetch →
    createDataFrame), kept out of scope per the sandbox contract.

    Semantics (Federated Query §2.2-2.4):
    - known endpoint: evaluate P against THAT service's dataset (its own
      default-graph merge; GRAPH inside ranges over its graphs).
    - unknown endpoint: error — unless SILENT, which yields the single
      empty solution (the join identity), so the enclosing group proceeds.
    - SERVICE ?var: like GRAPH ?var over the registry — the union of every
      registered endpoint's evaluation, ?var bound to the endpoint IRI
      (the spec leaves variable endpoints implementation-defined)."""

    endpoint: Union[Var, str]
    pattern: Node
    silent: bool = False

    def _sub_ctx(self, ctx: Ctx, quads: DataFrame) -> Ctx:
        # fresh dataset: the outer query's FROM/FROM NAMED restrictions and
        # active graph do NOT propagate into the service's dataset
        return Ctx(quads, None, None, None, ctx.services)

    def is_join_identity(self, ctx: Ctx) -> bool:
        """True iff this node compiles to exactly one empty solution —
        SILENT + unknown endpoint. Lets Join elide the node instead of
        planning a 1-row cross join."""
        return (
            self.silent
            and isinstance(self.endpoint, str)
            and self.endpoint not in (ctx.services or {})
        )

    def compile(self, ctx: Ctx) -> CompileOut:
        services = ctx.services or {}
        if isinstance(self.endpoint, str):
            quads = services.get(self.endpoint)
            if quads is None:
                if self.silent:
                    return BGP([]).compile(ctx)  # one empty solution
                raise ValueError(f"SERVICE: unknown endpoint <{self.endpoint}>")
            return self.pattern.compile(self._sub_ctx(ctx, quads))
        # variable endpoint: union over the registry, tagging the IRI
        v = self.endpoint.name
        outs = []
        c0 = m0 = None
        for iri in sorted(services):
            df, c, m = self.pattern.compile(self._sub_ctx(ctx, services[iri]))
            if v in c | m:
                # ?v also used inside P: keep only solutions matching this
                # endpoint's IRI (join-compatibility, not overwrite)
                df = df.filter(F.col(v).eqNullSafe(term_lit(PyIri(iri))) | F.col(v).isNull())
            df = df.withColumn(v, term_lit(PyIri(iri)))
            outs.append(df)
            c0, m0 = c, m
        if not outs:
            empty = self.pattern.compile(self._sub_ctx(ctx, ctx.quads.filter(F.lit(False))))
            df, c, m = empty
            return df.withColumn(
                v, F.lit(None).cast("struct<kind:tinyint,lex:string,dtype:string,lang:string>")
            ), c | {v}, m - {v}
        out = outs[0]
        for nxt in outs[1:]:
            out = out.unionByName(nxt)
        return out, (c0 | {v}), m0 - {v}


@dataclass
class Extend(Node):
    """BIND: expression errors leave the var unbound (NULL struct)."""

    child: Node
    var: str
    expr: E

    def compile(self, ctx: Ctx) -> CompileOut:
        df, c, m = self.child.compile(ctx)
        vm = _varmap(c | m)
        return df.withColumn(self.var, self.expr(vm)), c, m | {self.var}


@dataclass
class Values(Node):
    """VALUES / DataToMultiset: inline data joined in (broadcast-sized)."""

    rows: Sequence[dict]  # var -> Term | None

    def compile(self, ctx: Ctx) -> CompileOut:
        spark = ctx.quads.sparkSession
        vars_ = sorted({v for row in self.rows for v in row})
        from .types import term_kind

        data = []
        for row in self.rows:
            rec = []
            for v in vars_:
                t = row.get(v)
                if t is None:
                    rec.append(None)
                else:
                    from .types import BNode, Iri, Literal

                    if isinstance(t, Literal):
                        lang = t.lang
                        from .types import RDF_LANGSTRING, XSD_STRING

                        dt = RDF_LANGSTRING if lang else (t.dtype or XSD_STRING)
                        rec.append((KIND_LITERAL, t.lexical, dt, lang))
                    elif isinstance(t, Iri):
                        rec.append((0, t.value, None, None))
                    else:
                        from .types import KIND_TRIPLE, QuotedTriple

                        if isinstance(t, QuotedTriple):
                            rec.append((KIND_TRIPLE, t.encode(), None, None))
                        else:
                            rec.append((1, t.label, None, None))
            data.append(tuple(rec))
        schema = ", ".join(f"{v} struct<kind:tinyint,lex:string,dtype:string,lang:string>" for v in vars_)
        df = spark.createDataFrame(data, schema=schema)
        certain = frozenset(v for v in vars_ if all(row.get(v) is not None for row in self.rows))
        return df, certain, frozenset(vars_) - certain


@dataclass
class Project(Node):
    child: Node
    vars: list

    def compile(self, ctx: Ctx) -> CompileOut:
        df, c, m = self.child.compile(ctx)
        have = c | m
        cols = []
        for v in self.vars:
            if v in have:
                cols.append(F.col(v))
            else:
                cols.append(F.lit(None).cast("struct<kind:tinyint,lex:string,dtype:string,lang:string>").alias(v))
        return df.select(*cols), c & set(self.vars), frozenset(self.vars) - c


@dataclass
class Distinct(Node):
    child: Node

    def compile(self, ctx: Ctx) -> CompileOut:
        df, c, m = self.child.compile(ctx)
        return df.dropDuplicates(), c, m


#: REDUCED ≡ Distinct here (always dedup is spec-conformant, SURVEY §2.3)
Reduced = Distinct


@dataclass
class OrderBy(Node):
    """ORDER BY with the SPARQL total order: each condition is (expr, asc)
    or just an expr/var name; keys are synthesized sort-key structs so the
    whole thing stays a native Spark sort (→ TakeOrderedAndProject under
    LIMIT)."""

    child: Node
    conds: list

    def compile(self, ctx: Ctx) -> CompileOut:
        df, c, m = self.child.compile(ctx)
        vm = _varmap(c | m)
        keys = []
        for cond in self.conds:
            asc = True
            if isinstance(cond, tuple):
                cond, asc = cond
            if isinstance(cond, str):
                col = vm[cond]
            else:
                col = cond(vm)
            k = sort_key(col)
            keys.append(k.asc_nulls_first() if asc else k.desc_nulls_last())
        return df.orderBy(*keys), c, m


@dataclass
class Slice(Node):
    child: Node
    offset: int = 0
    limit: Optional[int] = None

    def compile(self, ctx: Ctx) -> CompileOut:
        df, c, m = self.child.compile(ctx)
        if self.offset:
            df = df.offset(self.offset)
        if self.limit is not None:
            df = df.limit(self.limit)
        return df, c, m


@dataclass
class ExistsFilter(Node):
    """FILTER EXISTS / NOT EXISTS — decorrelated by construction into a
    semi/anti join on shared vars (SURVEY §4 subquery-decorrelation row).

    Substitution semantics (spec §8.1.1 + the EXISTS errata): a
    top-level filter INSIDE the sub-pattern may reference outer-scope
    variables the sub-pattern itself never binds (FILTER EXISTS { ?s
    :limit ?lim . FILTER(?lim < ?age) } with ?age bound outside).
    Evaluating such a filter sub-side would read ?age as unbound →
    error → drop, making EXISTS false everywhere. Instead, each
    top-level sub filter is probed for its variable set
    (builtins.expr_vars); filters that reference outer-only variables
    are HOISTED into the semi/anti-join condition, where both scopes
    are visible — outer binding wins where both bind (coalesce(l, r),
    the substitution rule; equal anyway for certain-bound shared vars).
    Local filters stay sub-side so predicate pushdown is unaffected.
    Known limit: only TOP-LEVEL sub filters are substituted; a
    correlated filter nested deeper (inside an OPTIONAL/UNION within
    the EXISTS group) still evaluates its outer reference as unbound."""

    child: Node
    sub: Node
    negated: bool = False

    def compile(self, ctx: Ctx) -> CompileOut:
        from .functions.builtins import expr_vars

        ldf, lc, lm = self.child.compile(ctx)
        sub, top_filters = self.sub, []
        while isinstance(sub, Filter):
            top_filters.append(sub.expr)
            sub = sub.child
        rdf, rc, rm = sub.compile(ctx)
        inner_vars, outer_vars = rc | rm, lc | lm
        hoisted = []
        vmr = _varmap(inner_vars)
        for e in top_filters:
            vs = expr_vars(e)
            if vs is not None and (vs - inner_vars) & outer_vars:
                hoisted.append(e)
            else:
                # local (or unprobeable): evaluate sub-side, as before
                rdf = rdf.filter(F.coalesce(ebv_e(e, vmr), F.lit(False)))
        shared = outer_vars & inner_vars
        how = "left_anti" if self.negated else "left_semi"
        if not shared and not hoisted:
            # uncorrelated: keep all iff sub (non)empty
            nonempty = len(rdf.take(1)) > 0
            keep = (not nonempty) if self.negated else nonempty
            return (ldf, lc, lm) if keep else (ldf.filter(F.lit(False)), lc, lm)
        L, R = ldf.alias("l"), rdf.alias("r")
        # Same hash-join fast path as Minus: certainly-bound shared vars emit
        # plain null-safe equality (extractable equi keys → hash semi/anti
        # join); only maybe-bound vars get the null-tolerant compat form.
        certain = shared & lc & rc
        cond = F.lit(True)
        for v in sorted(shared):
            lv, rv = F.col(f"l.{v}"), F.col(f"r.{v}")
            if v in certain:
                cond = cond & lv.eqNullSafe(rv)
            else:
                cond = cond & (lv.eqNullSafe(rv) | lv.isNull() | rv.isNull())
        if hoisted:
            vmc = {}
            for v in outer_vars | inner_vars:
                if v in outer_vars and v in inner_vars:
                    vmc[v] = F.coalesce(F.col(f"l.{v}"), F.col(f"r.{v}"))
                elif v in inner_vars:
                    vmc[v] = F.col(f"r.{v}")
                else:
                    vmc[v] = F.col(f"l.{v}")
            # non-var columns an expression may read (ExistsMark flags of a
            # nested EXISTS) live on the sub-side frame, not in rc/rm
            for e in hoisted:
                for v in (expr_vars(e) or frozenset()) - vmc.keys():
                    if v in rdf.columns:
                        vmc[v] = F.col(f"r.{v}")
                    elif v in ldf.columns:
                        vmc[v] = F.col(f"l.{v}")
            for e in hoisted:
                cond = cond & F.coalesce(ebv_e(e, vmc), F.lit(False))
        return L.join(R, cond, how), lc, lm


@dataclass
class ExistsMark(Node):
    """Expression-level EXISTS (spec §17.4.1.4 used inside FILTER/BIND
    expressions, not as a whole filter — rdf_sparql_eval.ml :: eval_exists,
    SURVEY §2.8): decorrelate the sub-pattern into a boolean flag column
    `marker` on the solution multiset.

    The flag for a row depends only on that row's shared-var bindings.
    When every shared var is certain-bound on BOTH sides (the common
    case), the flag keys come from the SUB-PATTERN side alone: one hash
    left-outer join of the solutions against the distinct sub-pattern
    key set (distinct ⇒ at most one match ⇒ no row duplication). The
    left plan appears exactly once — chained EXISTS marks grow the
    logical plan linearly. The earlier formulation (distinct LEFT keys →
    semi-join → join back) embedded `ldf` on both sides of a self-join,
    doubling the analyzed tree per mark: 3 chained marks made Catalyst
    analyze the main subtree 8× (measured 4.9 s for one .filter call at
    sf0.01), and cost an extra shuffle per mark at runtime.

    Maybe-bound shared vars (non-well-designed patterns) keep the
    two-join form: an unbound value is join-compatible with anything, so
    a left row can match many sub-keys and the per-DISTINCT-left-key
    semi join is what avoids row duplication."""

    child: Node
    sub: Node
    marker: str

    def compile(self, ctx: Ctx) -> CompileOut:
        from .functions.builtins import expr_vars

        ldf, lc, lm = self.child.compile(ctx)
        sub, top_filters = self.sub, []
        while isinstance(sub, Filter):
            top_filters.append(sub.expr)
            sub = sub.child
        rdf, rc, rm = sub.compile(ctx)
        inner_vars, outer_vars = rc | rm, lc | lm
        hoisted, hoist_outer = [], set()
        vmr = _varmap(inner_vars)
        for e in top_filters:
            vs = expr_vars(e)
            if vs is not None and (vs - inner_vars) & outer_vars:
                hoisted.append(e)
                hoist_outer |= (vs - inner_vars) & outer_vars
            else:
                rdf = rdf.filter(F.coalesce(ebv_e(e, vmr), F.lit(False)))
        shared = sorted(outer_vars & inner_vars)
        if hoisted:
            # correlated mark (substitution semantics, same hoisting rule
            # as ExistsFilter): the flag depends on shared vars AND the
            # outer-only vars the hoisted filters read, so key the
            # decorrelation on both — distinct key rows → semi-join with
            # the full condition → join back (≤1 match per key combo, no
            # row duplication)
            keys = sorted(set(shared) | hoist_outer)
            certain = set(shared) & lc & rc
            lk = ldf.select(*keys).dropDuplicates()
            L, R = lk.alias("l"), rdf.alias("r")
            cond = F.lit(True)
            for v in shared:
                lv, rv = F.col(f"l.{v}"), F.col(f"r.{v}")
                if v in certain:
                    cond = cond & lv.eqNullSafe(rv)
                else:
                    cond = cond & (lv.eqNullSafe(rv) | lv.isNull() | rv.isNull())
            vmc = {}
            for v in outer_vars | inner_vars:
                if v in outer_vars and v in inner_vars:
                    vmc[v] = F.coalesce(F.col(f"l.{v}"), F.col(f"r.{v}"))
                elif v in inner_vars:
                    vmc[v] = F.col(f"r.{v}")
                elif v in hoist_outer:
                    vmc[v] = F.col(f"l.{v}")
                # other outer vars are invisible at the key join; hoisted
                # exprs never read them (that's what hoist_outer means)
            for e in hoisted:
                cond = cond & F.coalesce(ebv_e(e, vmc), F.lit(False))
            matched = (
                L.join(R, cond, "left_semi")
                .select(*[F.col(v).alias(f"__k_{v}") for v in keys])
                .withColumn(self.marker, F.lit(True))
            )
            back = F.lit(True)
            for v in keys:
                back = back & ldf[v].eqNullSafe(matched[f"__k_{v}"])
            out = (
                ldf.join(matched, back, "left_outer")
                .drop(*[f"__k_{v}" for v in keys])
                .withColumn(self.marker, F.coalesce(F.col(self.marker), F.lit(False)))
            )
            return out, lc, lm
        if not shared:
            # uncorrelated: one flag for every row
            nonempty = len(rdf.take(1)) > 0
            return ldf.withColumn(self.marker, F.lit(nonempty)), lc, lm
        certain = set(shared) & lc & rc
        if certain == set(shared):
            rkeys = (
                rdf.select(*[F.col(v).alias(f"__k_{v}") for v in shared])
                .dropDuplicates()
                .withColumn(self.marker, F.lit(True))
            )
            cond = F.lit(True)
            for v in shared:
                cond = cond & ldf[v].eqNullSafe(rkeys[f"__k_{v}"])
            out = (
                ldf.join(rkeys, cond, "left_outer")
                .drop(*[f"__k_{v}" for v in shared])
                .withColumn(self.marker, F.coalesce(F.col(self.marker), F.lit(False)))
            )
            return out, lc, lm
        lk = ldf.select(*shared).dropDuplicates()
        L, R = lk.alias("l"), rdf.alias("r")
        cond = F.lit(True)
        for v in shared:
            lv, rv = F.col(f"l.{v}"), F.col(f"r.{v}")
            if v in certain:
                cond = cond & lv.eqNullSafe(rv)
            else:
                # maybe-bound: unbound is join-compatible with anything
                cond = cond & (lv.eqNullSafe(rv) | lv.isNull() | rv.isNull())
        matched = (
            L.join(R, cond, "left_semi")
            .select(*[F.col(v).alias(f"__k_{v}") for v in shared])
            .withColumn(self.marker, F.lit(True))
        )
        back = F.lit(True)
        for v in shared:
            back = back & ldf[v].eqNullSafe(matched[f"__k_{v}"])
        out = (
            ldf.join(matched, back, "left_outer")
            .drop(*[f"__k_{v}" for v in shared])
            .withColumn(self.marker, F.coalesce(F.col(self.marker), F.lit(False)))
        )
        return out, lc, lm


@dataclass
class DropMarks(Node):
    """Drop internal flag columns (ExistsMark markers) once every
    expression that references them has been applied."""

    child: Node
    cols: Sequence[str]

    def compile(self, ctx: Ctx) -> CompileOut:
        df, c, m = self.child.compile(ctx)
        return df.drop(*self.cols), c, m


# ---------------------------------------------------------------------------
# aggregation (spec §18.5.1; rdf_sparql_eval.ml :: eval_agg — SURVEY §2.4)
# ---------------------------------------------------------------------------


@dataclass
class Agg:
    out: str
    kind: str  # count | count_star | sum | avg | min | max | sample | group_concat
    expr: Optional[E] = None  # None only for count_star
    distinct: bool = False
    separator: str = " "
    #: GROUP_CONCAT only: sort the collected lexical forms first. The spec
    #: leaves concat order undefined (the reference uses multiset order —
    #: SURVEY §2.4); sorting makes it deterministic across partitionings,
    #: which a distributed engine needs for reproducible output.
    sorted: bool = False


@dataclass
class Group(Node):
    child: Node
    by: list  # var names (use Extend first for computed keys)
    aggs: list

    def compile(self, ctx: Ctx) -> CompileOut:
        from .types import XSD_DOUBLE, XSD_INTEGER

        df, c, m = self.child.compile(ctx)
        vm = _varmap(c | m)
        from .functions.terms import num, t_double, t_int

        proj = [F.col(v) for v in self.by]
        agg_inputs = {}
        for a in self.aggs:
            if a.expr is not None:
                agg_inputs[a.out] = self.aggs.index(a)
                proj.append(a.expr(vm).alias(f"__in_{a.out}"))
            elif a.kind == "count_star" and a.distinct:
                # COUNT(DISTINCT *) counts distinct SOLUTIONS (§18.5.1): pack
                # every in-scope variable into one struct so count_distinct
                # sees the whole row (a bare multi-column count_distinct would
                # drop rows with any unbound var — SQL NULL semantics; the
                # struct itself is never NULL)
                proj.append(
                    F.struct(*[F.col(v) for v in sorted(c | m)]).alias(f"__in_{a.out}")
                )
        gdf = df.select(*proj) if proj else df
        grouped = gdf.groupBy(*[F.col(v) for v in self.by]) if self.by else gdf.groupBy()

        aggs = []
        for a in self.aggs:
            i = F.col(f"__in_{a.out}")
            if a.kind == "count_star":
                e = F.count_distinct(i) if a.distinct else F.count(F.lit(1))
                aggs.append(t_int(e).alias(a.out))
            elif a.kind == "count":
                e = F.count_distinct(i) if a.distinct else F.count(i)
                aggs.append(t_int(e).alias(a.out))
            elif a.kind in ("sum", "avg"):
                from .functions.terms import DEC_T, EXACT_DTYPES as _EXACT_DT, dec, t_decimal, t_int_exact

                n = num(i)
                n_in = F.when(i.isNull(), F.lit(None).cast("double")).otherwise(n)
                poisoned = F.max(i.isNotNull() & n.isNull())  # non-numeric bound value
                if a.distinct:
                    val = F.sum_distinct(n_in) if a.kind == "sum" else (F.sum_distinct(n_in) / F.count_distinct(n_in))
                else:
                    val = F.sum(n_in) if a.kind == "sum" else F.avg(n_in)
                # exact tier (rdf_dt.ml keeps decimals exact — §18.5.1): when
                # every bound input is an integer/decimal literal, aggregate
                # in decimal(38,6) so sums beyond 2^53 don't drift through
                # double, and AVG over integers yields xsd:decimal per spec
                d = dec(i)
                d_in = F.when(i.isNull(), F.lit(None).cast(DEC_T)).otherwise(d)
                all_exact = F.coalesce(
                    F.min(F.coalesce(i["dtype"].isin(*_EXACT_DT) & d.isNotNull(), F.lit(False))),
                    F.lit(True),
                )
                if a.distinct:
                    dval = (
                        F.sum_distinct(d_in)
                        if a.kind == "sum"
                        else (F.sum_distinct(d_in) / F.count_distinct(d_in))
                    )
                else:
                    dval = F.sum(d_in) if a.kind == "sum" else F.avg(d_in)
                # empty group: SUM() = integer 0 per spec, so all_int defaults true
                all_int = F.coalesce(F.min(F.coalesce(i["dtype"] == XSD_INTEGER, F.lit(False))), F.lit(True))
                zero = F.lit(0.0) if a.kind == "sum" else F.lit(None).cast("double")
                val = F.coalesce(val, zero)
                res = F.when(poisoned, F.lit(None).cast("double")).otherwise(val)
                dzero = F.lit(0).cast(DEC_T) if a.kind == "sum" else F.lit(None).cast(DEC_T)
                dres = F.when(poisoned, F.lit(None).cast(DEC_T)).otherwise(F.coalesce(dval, dzero))
                if a.kind == "sum":
                    term = (
                        F.when(all_exact & all_int, t_int_exact(dres))
                        .when(all_exact, t_decimal(dres))
                        .otherwise(t_double(res))
                    )
                else:  # AVG over exact inputs → xsd:decimal (§18.5.1)
                    term = F.when(all_exact, t_decimal(dres)).otherwise(t_double(res))
                aggs.append(term.alias(a.out))
            elif a.kind in ("min", "max"):
                k = sort_key(i)
                e = F.min_by(i, k) if a.kind == "min" else F.max_by(i, k)
                aggs.append(e.alias(a.out))
            elif a.kind == "sample":
                aggs.append(F.first(i, ignorenulls=True).alias(a.out))
            elif a.kind == "group_concat":
                lexes = F.collect_list(i["lex"])
                if a.distinct:
                    lexes = F.array_distinct(lexes)
                if a.sorted:
                    lexes = F.array_sort(lexes)
                from .functions.terms import t_string

                aggs.append(t_string(F.concat_ws(a.separator, lexes)).alias(a.out))
            else:
                raise ValueError(f"unknown aggregate {a.kind}")
        out = grouped.agg(*aggs) if aggs else grouped.agg(F.count(F.lit(1)).alias("__n")).drop("__n")
        names = frozenset(self.by) | {a.out for a in self.aggs}
        return out, frozenset(self.by), names - frozenset(self.by)


# ---------------------------------------------------------------------------
# query forms (rdf_sparql.ml :: execute — SURVEY §2.3 ASK/CONSTRUCT rows)
# ---------------------------------------------------------------------------


def ask(node: Node, ctx: Ctx) -> bool:
    df, _, _ = node.compile(ctx)
    return len(df.take(1)) > 0


def select(node: Node, ctx: Ctx) -> DataFrame:
    df, _, _ = node.compile(ctx)
    return df


def flatten(df: DataFrame) -> DataFrame:
    """Term-struct solution DF → plain string columns (lex only) — for
    display, tests, and DuckDB-oracle comparison. Quoted triples (kind 3)
    render as `<< s p o >>` component lexicals instead of the raw
    field encoding."""
    from .types import KIND_TRIPLE, QT_FSEP, QT_SEP

    def render(c: Column) -> Column:
        def comp(i: int) -> Column:
            return F.element_at(F.split(F.element_at(F.split(c["lex"], QT_SEP), i), QT_FSEP), 2)

        qt = F.concat(F.lit("<< "), comp(1), F.lit(" "), comp(2), F.lit(" "), comp(3), F.lit(" >>"))
        return F.when(c["kind"] == KIND_TRIPLE, qt).otherwise(c["lex"])

    return df.select(*[render(F.col(c)).alias(c) for c in df.columns])


@dataclass
class Template:
    s: Position
    p: Position
    o: Position



def _solution_fingerprint(vm: dict, nonce: Optional[str] = None) -> Column:
    """Deterministic per-solution id for CONSTRUCT/UPDATE template bnodes
    (spec §16.2.1: template bnodes are FRESH per solution; the same label
    within one solution's instantiation co-refers). sha1 over every
    binding's full term; duplicate solutions collapse, which is harmless
    because the output is set-deduped."""
    parts = []
    for v in sorted(vm):
        t = vm[v]
        parts.append(
            F.coalesce(
                F.concat_ws(
                    "\x1e",
                    t["kind"].cast("string"), t["lex"],
                    F.coalesce(t["dtype"], F.lit("")), F.coalesce(t["lang"], F.lit("")),
                ),
                F.lit(""),
            )
        )
    return F.sha1(F.concat_ws("\x1f", F.lit(nonce or "s"), *parts))


def _template_col(x: Position, vm: dict, sid: Column) -> Column:
    """Template slot → term Column: vars bind, bnodes mint per-solution
    labels (label ∥ solution-fingerprint), constants inline."""
    from .types import BNode as _BNode

    if isinstance(x, Var):
        return vm[x.name]
    if isinstance(x, _BNode):
        from .functions.terms import t_bnode

        return t_bnode(F.concat(F.lit(x.label + "."), F.substring(sid, 1, 16)))
    if isinstance(x, QuotedPattern):
        # CONSTRUCT/UPDATE-star: build the quoted term per solution (the
        # TRIPLE() constructor errors → NULL → the quad is dropped, same
        # rule as other ill-formed instantiations)
        from .functions.terms import t_quoted

        return t_quoted(
            _template_col(x.s, vm, sid), _template_col(x.p, vm, sid), _template_col(x.o, vm, sid)
        )
    return term_lit(x)


def construct(templates: Sequence[Template], node: Node, ctx: Ctx, graph: str = "urn:x-ords:constructed") -> DataFrame:
    """CONSTRUCT: instantiate templates per solution, drop ill-formed
    triples, set-dedup (spec: CONSTRUCT yields a graph = triple set)."""
    df, c, m = node.compile(ctx)
    vm = _varmap(c | m)
    sid = _solution_fingerprint(vm)
    outs = []
    for t in templates:
        s, p, o = _template_col(t.s, vm, sid), _template_col(t.p, vm, sid), _template_col(t.o, vm, sid)
        row = df.select(
            s["kind"].alias("s_kind"),
            s["lex"].alias("s_lex"),
            p["lex"].alias("pred"),
            o["kind"].alias("o_kind"),
            o["lex"].alias("o_lex"),
            o["dtype"].alias("o_dtype"),
            o["lang"].alias("o_lang"),
            F.lit(graph).alias("graph"),
            F.lit(None).cast("string").alias("src_url"),
            F.lit("construct").alias("extractor"),
            F.lit(None).cast("int").alias("part_id"),
        ).filter(
            s["kind"].isNotNull()
            & (s["kind"] != KIND_LITERAL)
            & p["kind"].isNotNull()
            & (p["kind"] == 0)
            & o["kind"].isNotNull()
        )
        outs.append(row)
    out = outs[0]
    for r in outs[1:]:
        out = out.unionByName(r)
    from .types import TRIPLE_KEY

    return out.dropDuplicates(TRIPLE_KEY)


def instantiate_quads(
    items: Sequence[tuple["Template", str]], node: Node, ctx: Ctx, extractor: str = "update",
    nonce: Optional[str] = None,
) -> DataFrame:
    """Instantiate (template, graph-IRI) pairs per solution of `node` —
    the shared kernel of CONSTRUCT and SPARQL-Update DELETE/INSERT
    templates: ill-formed triples (unbound var, literal subject/predicate)
    are dropped per spec, output is a set-semantics TRIPLES DataFrame.

    `nonce` (UPDATE path) salts template-bnode fingerprints so each
    request mints fresh bnodes (Update spec §3.1.1); CONSTRUCT omits it —
    its output labels are arbitrary, and determinism helps the oracles."""
    df, c, m = node.compile(ctx)
    vm = _varmap(c | m)
    sid = _solution_fingerprint(vm, nonce=nonce)
    outs = []
    for t, graph in items:
        s, p, o = _template_col(t.s, vm, sid), _template_col(t.p, vm, sid), _template_col(t.o, vm, sid)
        if isinstance(graph, Var):
            # GRAPH ?g template: the graph name comes from the solution —
            # must be a bound IRI, else the quad is dropped (ill-formed
            # instantiation, same rule as unbound template vars)
            if graph.name in vm:
                gterm = vm[graph.name]
                gcol, gok = gterm["lex"], gterm["kind"].isNotNull() & (gterm["kind"] == 0)
            else:  # never bound: no instantiation from this template
                gcol, gok = F.lit(None).cast("string"), F.lit(False)
        else:
            gcol, gok = F.lit(graph), F.lit(True)
        row = df.select(
            s["kind"].alias("s_kind"),
            s["lex"].alias("s_lex"),
            p["lex"].alias("pred"),
            o["kind"].alias("o_kind"),
            o["lex"].alias("o_lex"),
            o["dtype"].alias("o_dtype"),
            o["lang"].alias("o_lang"),
            gcol.alias("graph"),
            F.lit(None).cast("string").alias("src_url"),
            F.lit(extractor).alias("extractor"),
            F.lit(None).cast("int").alias("part_id"),
        ).filter(
            s["kind"].isNotNull()
            & (s["kind"] != KIND_LITERAL)
            & p["kind"].isNotNull()
            & (p["kind"] == 0)
            & o["kind"].isNotNull()
            & gok
        )
        outs.append(row)
    out = outs[0]
    for r in outs[1:]:
        out = out.unionByName(r)
    from .types import TRIPLE_KEY

    return out.dropDuplicates(TRIPLE_KEY)


def describe(
    terms: Sequence[Term],
    ctx: Ctx,
    keys_df: Optional[DataFrame] = None,
    cbd: bool = False,
    max_rounds: int = 32,
) -> DataFrame:
    """DESCRIBE. Default: the naive variant, as the reference — emit
    triples whose subject is a described resource (rdf_sparql.ml, SURVEY
    §2.3). `cbd=True` upgrades to the Concise Bounded Description
    (the de-facto DESCRIBE of SPARQL endpoints): blank-node OBJECTS of
    included triples are followed transitively, so anonymous structure
    (addresses, geo nodes, rdf lists) comes back whole — IRI objects are
    never followed (that's the "bounded" in CBD).

    `keys_df` (s_kind tinyint, s_lex string) carries DESCRIBE ?var bindings
    as a DataFrame — semi-joined directly, never collected to the driver
    (DESCRIBE over a large class stays distributed).

    Scale: the CBD loop is a frontier fixpoint like transitive_closure —
    per round one anti join (new bnode keys) + one semi join (their
    triples); rounds = bnode-chain depth, which is document-structure
    depth (single digits in the wild), and cycles terminate via the
    done-set anti join. localCheckpoint caps lineage."""
    from .types import KIND_BNODE as _BN
    from .types import term_kind

    spark = ctx.quads.sparkSession
    keys = [(term_kind(t), t.value if isinstance(t, PyIri) else getattr(t, "label", None)) for t in terms]
    kdf = spark.createDataFrame(keys, schema="s_kind tinyint, s_lex string")
    if keys_df is not None:
        # DESCRIBE ?var: the binding set is unbounded (a large class at
        # 100× would OOM a forced broadcast — an explicit hint is honored
        # regardless of size). No hint: AQE/stats pick broadcast when the
        # set is small and degrade to a shuffle hash semi join when not.
        done = kdf.unionByName(keys_df).dropDuplicates()
        seed = ctx.quads.join(done, ["s_kind", "s_lex"], "left_semi")
    else:
        # literal DESCRIBE <term> list: bounded by the query text — broadcast.
        done = kdf.dropDuplicates()
        seed = ctx.quads.join(F.broadcast(done), ["s_kind", "s_lex"], "left_semi")
    if not cbd:
        return seed
    out = seed
    for _ in range(max_rounds):
        bn = (
            out.filter(F.col("o_kind") == _BN)
            .select(
                F.lit(_BN).cast("tinyint").alias("s_kind"),
                F.col("o_lex").alias("s_lex"),
            )
            .distinct()
            .join(done, ["s_kind", "s_lex"], "left_anti")
            .localCheckpoint()
        )
        if bn.isEmpty():
            break
        out = out.unionByName(
            ctx.quads.join(bn, ["s_kind", "s_lex"], "left_semi")
        ).localCheckpoint(eager=False)
        done = done.unionByName(bn)
    return out


@dataclass
class Lateral(Node):
    """SPARQL 1.2 LATERAL (SEP-0006, adopted into the 1.2 draft — the
    per-binding correlated group: evaluate the right pattern once per
    LEFT solution with its bindings visible inside). The case plain
    joins cannot express is a correlated sub-SELECT with LIMIT —
    "top-n per outer binding" — and that is exactly what this node
    distributes:

    - right WITHOUT a top-level Slice: LATERAL ≡ Join (the spec's own
      equivalence for modifier-free patterns; the correlated vars are
      the join keys, so Catalyst plans the ordinary hash join).
    - right = Slice(...) (a sub-SELECT with LIMIT/OFFSET): the global
      slice becomes a WINDOW row_number PARTITIONED BY the correlated
      vars (outer ∩ inner scope), ordered by the sub-SELECT's ORDER BY
      keys — per-group top-n, ONE shuffle on the correlation key, never
      a per-solution re-execution (the driver-loop shape a naive
      LATERAL evaluator degrades to). Inner solutions depend only on
      the correlated vars, so equal outer bindings sharing one group is
      semantics, not an approximation.

    Pinned: LIMIT without ORDER BY inside LATERAL is nondeterministic
    per spec — here it orders by the SPARQL sort keys of all projected
    vars ascending (deterministic, documented); DISTINCT dedups the
    widened projection (correlated vars are constant within a group, so
    per-group results are identical to the spec's)."""

    left: Node
    right: Node

    def compile(self, ctx: Ctx) -> CompileOut:
        lout = self.left.compile(ctx)
        lvars = lout[1] | lout[2]
        if isinstance(self.right, Slice):
            rout = self._rebuild(self.right, ctx, lvars)
        else:
            rout = self._correlate(self.right, lvars).compile(ctx)
        return _merge_join(lout, rout, "inner")

    # -- correlated sub-SELECT rebuild (no Slice) ---------------------------
    def _correlate(self, n: Node, lvars: frozenset) -> Node:
        """A sub-SELECT inside LATERAL sees the OUTER bindings (SEP-0006
        substitution), even for vars it doesn't project: Group collapses
        PER correlated-var value (the standard aggregate decorrelation —
        outer vars become extra group keys), and Project keeps the
        correlated vars visible so the outer hash join restricts
        per-binding (r5 fix, pinned by lateral-agg). Walking the child
        spine covers every sub-SELECT shape (Project/Extend/Distinct/
        OrderBy/Filter wrappers); patterns without a projection already
        retain their vars, so LATERAL ≡ Join there, unchanged."""
        import dataclasses

        from .sparql import _in_scope_vars

        if isinstance(n, Project):
            child = self._correlate(n.child, lvars)
            extra = sorted((_in_scope_vars(child) & lvars) - set(n.vars))
            return dataclasses.replace(n, child=child, vars=list(n.vars) + extra)
        if isinstance(n, Group):
            extra = sorted((_in_scope_vars(n.child) & lvars) - set(n.by))
            return dataclasses.replace(n, by=list(n.by) + extra)
        if hasattr(n, "child") and isinstance(getattr(n, "child", None), Node):
            return dataclasses.replace(n, child=self._correlate(n.child, lvars))
        return n

    # -- correlated-slice rebuild -------------------------------------------
    def _rebuild(self, n: Node, ctx: Ctx, lvars: frozenset) -> CompileOut:
        df, c, m, keys = self._below(n.child, ctx, lvars)
        shared = sorted((c | m) & lvars)
        if not keys:
            # pinned fallback: deterministic order over the visible vars
            keys = []
            for i, v in enumerate(sorted(c | m)):
                kn = f"__latk{i}"
                df = df.withColumn(kn, sort_key(F.col(v)))
                keys.append((kn, True))
        part = [F.col(v) for v in shared] or [F.lit(1)]
        order = [
            (F.col(kn).asc_nulls_first() if asc else F.col(kn).desc_nulls_last())
            for kn, asc in keys
        ]
        from pyspark.sql.window import Window as _W

        w = _W.partitionBy(*part).orderBy(*order)
        df = df.withColumn("__lat_rn", F.row_number().over(w))
        cond = F.col("__lat_rn") > n.offset
        if n.limit is not None:
            cond = cond & (F.col("__lat_rn") <= n.offset + n.limit)
        df = df.filter(cond).drop("__lat_rn", *[kn for kn, _ in keys])
        return df, c, m

    def _below(self, n: Node, ctx: Ctx, lvars: frozenset):
        """Compile the chain under the Slice, deferring sorts: OrderBy
        materializes its keys as __latk columns (a later OrderBy —
        parse_select's post-DISTINCT re-sort — supersedes them);
        Project widens with the correlated vars and live key columns;
        Distinct drops key columns first (they are recomputed by the
        superseding OrderBy in the only chain shape that has one)."""
        if isinstance(n, OrderBy):
            df, c, m, old = self._below(n.child, ctx, lvars)
            df = df.drop(*[kn for kn, _ in old])
            vm = _varmap(c | m)
            keys = []
            for i, cond in enumerate(n.conds):
                asc = True
                if isinstance(cond, tuple):
                    cond, asc = cond
                col = vm[cond] if isinstance(cond, str) else cond(vm)
                kn = f"__latk{i}"
                df = df.withColumn(kn, sort_key(col))
                keys.append((kn, asc))
            return df, c, m, keys
        if isinstance(n, Distinct):
            df, c, m, keys = self._below(n.child, ctx, lvars)
            return df.drop(*[kn for kn, _ in keys]).dropDuplicates(), c, m, []
        if isinstance(n, Project):
            df, c, m, keys = self._below(n.child, ctx, lvars)
            have = c | m
            keep = list(dict.fromkeys(list(n.vars) + sorted(have & lvars)))
            cols = []
            for v in keep:
                if v in have:
                    cols.append(F.col(v))
                else:
                    cols.append(
                        F.lit(None)
                        .cast("struct<kind:tinyint,lex:string,dtype:string,lang:string>")
                        .alias(v)
                    )
            cols += [F.col(kn) for kn, _ in keys]
            return df.select(*cols), c & set(keep), (frozenset(n.vars) - c) | (m & set(keep)), keys
        # fallback (Extend/Group/pattern): correlate aggregates first, so a
        # sliced aggregate sub-select groups per outer binding too (the
        # Project branch above already widens with the correlated vars)
        out = self._correlate(n, lvars).compile(ctx)
        return out[0], out[1], out[2], []
