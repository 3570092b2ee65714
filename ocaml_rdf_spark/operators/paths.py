"""SPARQL 1.1 property paths (spec §18.2.2.3 / §9).

Parity: rdf_sparql_algebra.ml's path translation + eval's recursive path
evaluation (SURVEY §2.5). A path value is a DataFrame of distinct
(src, dst) TERM_STRUCT pairs; `p+`/`p*` use an iterative frontier fixpoint
with localCheckpoint per round to cut lineage (SURVEY §7 R5) — the same
machinery scales to the owl:sameAs closure (canonicalize.py supersedes it
with large-star/small-star for the giant-component case).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..algebra import Ctx, Node, CompileOut, Var, Position
from ..functions.terms import t_iri, term_lit
from ..types import Term


def _s_struct():
    return F.struct(
        F.col("s_kind").alias("kind"),
        F.col("s_lex").alias("lex"),
        F.lit(None).cast("string").alias("dtype"),
        F.lit(None).cast("string").alias("lang"),
    )


def _o_struct():
    return F.struct(
        F.col("o_kind").alias("kind"),
        F.col("o_lex").alias("lex"),
        F.col("o_dtype").alias("dtype"),
        F.col("o_lang").alias("lang"),
    )


class Path:
    def pairs(self, ctx: Ctx) -> DataFrame:
        """→ DataFrame(src TERM_STRUCT, dst TERM_STRUCT), distinct."""
        raise NotImplementedError

    def matches_zero(self) -> bool:
        """True when the path admits a ZERO-LENGTH match (spec §18.4 ALP:
        p*, p?, p{0,m}, and compositions that can reduce to them). Drives
        PathPattern's ground-endpoint identity rule — ALP yields a ground
        start term ITSELF regardless of whether it occurs in the graph,
        so in-graph identity pairs alone under-report."""
        return False


def _base(ctx: Ctx) -> DataFrame:
    df = ctx.quads
    if isinstance(ctx.graph, str):
        if ctx.named_graphs is not None and ctx.graph not in ctx.named_graphs:
            return df.filter(F.lit(False))
        return df.filter(F.col("graph") == ctx.graph)
    if isinstance(ctx.graph, Var):
        # GRAPH ?var: ranges over NAMED graphs only (§13.3), restricted by
        # FROM NAMED when present — same dataset rule as the BGP scan
        if ctx.named_graphs is not None:
            from ..algebra import _graph_in

            return df.filter(_graph_in(ctx.named_graphs))
        from ..types import DEFAULT_GRAPH

        return df.filter(F.col("graph") != DEFAULT_GRAPH)
    if ctx.graph is None and ctx.default_graphs is not None:
        from ..algebra import _graph_in

        return df.filter(_graph_in(ctx.default_graphs))
    return df


def _graph_keyed(ctx: Ctx) -> bool:
    """True under GRAPH ?var: path endpoints are PACKED as
    struct(g, t) so every downstream composition — Seq's hash join, the
    closure fixpoint, identity pairs — automatically stays within one
    named graph (struct equality can't match across different g) and the
    whole multi-graph evaluation remains ONE distributed plan keyed by
    (graph, node) instead of a per-graph loop. PathPattern.compile
    unpacks and binds the graph variable. (r4: GRAPH ?g { path } used to
    merge all graphs' edges into one closure AND drop the ?g binding —
    caught by the pp-graph manifest cases.)"""
    return isinstance(ctx.graph, Var)


def _packed(g_col, t_col):
    return F.struct(g_col.alias("g"), t_col.alias("t"))


@dataclass
class P(Path):
    """PredicatePath: a plain IRI."""

    iri: str

    def pairs(self, ctx: Ctx) -> DataFrame:
        df = _base(ctx).filter(F.col("pred") == self.iri)
        if _graph_keyed(ctx):
            return df.select(
                _packed(F.col("graph"), _s_struct()).alias("src"),
                _packed(F.col("graph"), _o_struct()).alias("dst"),
            ).distinct()
        return df.select(_s_struct().alias("src"), _o_struct().alias("dst")).distinct()


@dataclass
class Inv(Path):
    """^p — inverse."""

    p: Path

    def pairs(self, ctx: Ctx) -> DataFrame:
        d = self.p.pairs(ctx)
        return d.select(F.col("dst").alias("src"), F.col("src").alias("dst"))

    def matches_zero(self) -> bool:
        return self.p.matches_zero()


@dataclass
class Seq(Path):
    """p1/p2 — sequence: join on the intermediate node."""

    a: Path
    b: Path

    def pairs(self, ctx: Ctx) -> DataFrame:
        a = self.a.pairs(ctx).alias("a")
        b = self.b.pairs(ctx).alias("b")
        return (
            a.join(b, F.col("a.dst").eqNullSafe(F.col("b.src")), "inner")
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
            .distinct()
        )

    def matches_zero(self) -> bool:
        return self.a.matches_zero() and self.b.matches_zero()


@dataclass
class Alt(Path):
    """p1|p2 — alternative."""

    a: Path
    b: Path

    def pairs(self, ctx: Ctx) -> DataFrame:
        return self.a.pairs(ctx).unionByName(self.b.pairs(ctx)).distinct()

    def matches_zero(self) -> bool:
        return self.a.matches_zero() or self.b.matches_zero()


@dataclass
class Neg(Path):
    """!(p1|...|pj|^pj+1|...|^pn) — negated property set (spec §9.1).

    Translation per §18.2.2.3: with forward members P and inverse members Q,
    !(P|^Q) = NPS(P) ∪ inv(NPS(Q)); a branch exists only when it has members
    (so !(^q) matches no forward edges at all). NPS(S) = edges whose
    predicate is not in S."""

    iris: Sequence[str] = ()
    inv_iris: Sequence[str] = ()

    def pairs(self, ctx: Ctx) -> DataFrame:
        df = _base(ctx)
        if _graph_keyed(ctx):
            s_col = _packed(F.col("graph"), _s_struct())
            o_col = _packed(F.col("graph"), _o_struct())
        else:
            s_col, o_col = _s_struct(), _o_struct()
        parts = []
        if self.iris or not self.inv_iris:
            fwd = df.filter(~F.col("pred").isin(*self.iris)) if self.iris else df
            parts.append(fwd.select(s_col.alias("src"), o_col.alias("dst")))
        if self.inv_iris:
            inv = df.filter(~F.col("pred").isin(*self.inv_iris))
            parts.append(inv.select(o_col.alias("src"), s_col.alias("dst")))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.distinct()


def _graph_nodes(ctx: Ctx) -> DataFrame:
    df = _base(ctx)
    if _graph_keyed(ctx):
        s_col = _packed(F.col("graph"), _s_struct())
        o_col = _packed(F.col("graph"), _o_struct())
    else:
        s_col, o_col = _s_struct(), _o_struct()
    return (
        df.select(s_col.alias("n"))
        .unionByName(df.select(o_col.alias("n")))
        .distinct()
    )


def _identity_pairs(ctx: Ctx) -> DataFrame:
    n = _graph_nodes(ctx)
    return n.select(F.col("n").alias("src"), F.col("n").alias("dst"))


@dataclass
class ZeroOrOne(Path):
    """p? — identity ∪ p (zero-length matches every graph term, spec §9.3)."""

    p: Path

    def pairs(self, ctx: Ctx) -> DataFrame:
        return self.p.pairs(ctx).unionByName(_identity_pairs(ctx)).distinct()

    def matches_zero(self) -> bool:
        return True


class ClosureBudgetExceeded(RuntimeError):
    """Raised when a transitive closure outgrows `max_closure_edges`.

    The closure SIZE (not the round count — doubling keeps rounds
    O(log d)) is the real budget of closure-riding operators: on a
    schema/taxonomy graph or a per-host link subgraph the closure is
    small; on the raw web graph it is quadratic in the giant SCC and no
    cluster materializes it. The guard turns that documented tiering
    into a hard error instead of trusting the caller to read it."""


def transitive_closure(
    edges: DataFrame,
    max_iter: int = 50,
    linear_rounds: int = 8,
    rounds_out: list | None = None,
    max_closure_edges: int | None = None,
) -> DataFrame:
    """Distinct-pair transitive closure: frontier expansion, escalating to
    path doubling on deep graphs.

    Phase 1 (≤ `linear_rounds` rounds): frontier ⋈ edges → new pairs —
    one cheap small-⋈-small join per round; covers the common shallow
    hierarchy in `depth` rounds. Phase 2 (graph still growing after that):
    path DOUBLING — seen ⋈ seen composes every known path with every other,
    so reachable length doubles per round and a diameter-d chain finishes
    in O(log d) further rounds instead of O(d) (the r2 scale flag: a deep
    skos:broader+ at 100× would otherwise pay diameter × |closure| anti-join
    work). Doubling rounds cost a bigger join, which is why it is not
    phase 1. localCheckpoint per round truncates lineage (SURVEY §7 R5);
    the per-round isEmpty() probe is the single materializing action.

    `rounds_out`: optional list; total round count is appended (test/
    observability hook).

    `max_closure_edges`: optional hard budget on the materialized
    closure — raise `ClosureBudgetExceeded` the first round the pair
    count crosses it (checked on the already-checkpointed round result,
    so the probe costs one count over materialized partitions, no
    recompute). Callers whose algorithm RIDES the closure (scc_components)
    set a default; plain path queries leave it off.
    """
    edges = edges.select("src", "dst").distinct().localCheckpoint(eager=False)
    seen = edges
    frontier = edges
    rounds = 0
    done = False
    seen_count = None
    if max_closure_edges is not None:
        seen_count = seen.count()
        if seen_count > max_closure_edges:
            raise ClosureBudgetExceeded(
                f"transitive_closure: {seen_count} input pairs already exceed "
                f"max_closure_edges={max_closure_edges}"
            )
    for _ in range(min(linear_rounds, max_iter)):
        rounds += 1
        nxt = (
            frontier.alias("f")
            .join(edges.alias("e"), F.col("f.dst").eqNullSafe(F.col("e.src")), "inner")
            .select(F.col("f.src").alias("src"), F.col("e.dst").alias("dst"))
            .distinct()
            .exceptAll(seen)
            .localCheckpoint(eager=False)
        )
        if max_closure_edges is not None:
            n_new = nxt.count()
            if n_new == 0:
                done = True
                break
            seen_count += n_new
            if seen_count > max_closure_edges:
                raise ClosureBudgetExceeded(
                    f"transitive_closure: closure reached {seen_count} pairs "
                    f"(> max_closure_edges={max_closure_edges}) after {rounds} "
                    "rounds and is still growing — this graph is not in the "
                    "schema/taxonomy tier this closure is for; use undirected "
                    "CC or a bounded-hop BFS instead"
                )
        elif nxt.isEmpty():
            done = True
            break
        seen = seen.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    while not done and rounds < max_iter:
        rounds += 1
        new = (
            seen.alias("a")
            .join(seen.alias("b"), F.col("a.dst").eqNullSafe(F.col("b.src")), "inner")
            .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
            .distinct()
            .exceptAll(seen)
            .localCheckpoint(eager=False)
        )
        if max_closure_edges is not None:
            n_new = new.count()
            if n_new == 0:
                break
            seen_count += n_new
            if seen_count > max_closure_edges:
                raise ClosureBudgetExceeded(
                    f"transitive_closure: closure reached {seen_count} pairs "
                    f"(> max_closure_edges={max_closure_edges}) in doubling "
                    f"round {rounds} — this graph is not in the schema/"
                    "taxonomy tier this closure is for; use undirected CC "
                    "or a bounded-hop BFS instead"
                )
        elif new.isEmpty():
            break
        seen = seen.unionByName(new).localCheckpoint(eager=False)
    if rounds_out is not None:
        rounds_out.append(rounds)
    return seen


@dataclass
class Plus(Path):
    """p+ — one-or-more (transitive closure, distinct node pairs)."""

    p: Path
    max_iter: int = 50

    def pairs(self, ctx: Ctx) -> DataFrame:
        return transitive_closure(self.p.pairs(ctx), self.max_iter)

    def matches_zero(self) -> bool:
        return self.p.matches_zero()


@dataclass
class Star(Path):
    """p* — zero-or-more: closure ∪ identity."""

    p: Path
    max_iter: int = 50

    def pairs(self, ctx: Ctx) -> DataFrame:
        return transitive_closure(self.p.pairs(ctx), self.max_iter).unionByName(
            _identity_pairs(ctx)
        ).distinct()

    def matches_zero(self) -> bool:
        return True


@dataclass
class PathPattern(Node):
    """Algebra leaf: `s path o` — composes with BGP joins like any pattern."""

    s: Position
    path: Path
    o: Position

    def compile(self, ctx: Ctx) -> CompileOut:
        d = self.path.pairs(ctx)
        keyed = _graph_keyed(ctx)
        if self.path.matches_zero() and not (
            isinstance(self.s, Var) and isinstance(self.o, Var)
        ):
            # spec §18.4 ALP: a zero-length path from a GROUND term yields
            # the term itself whether or not it occurs in the graph —
            # in-graph identity pairs alone under-report (r5 fix, pinned
            # by pp-graph-star-zero). Under GRAPH ?var the ground term
            # matches in EVERY in-scope named graph.
            gterm = term_lit(self.s if not isinstance(self.s, Var) else self.o)
            if keyed:
                extra = _base(ctx).select("graph").distinct().select(
                    _packed(F.col("graph"), gterm).alias("src"),
                    _packed(F.col("graph"), gterm).alias("dst"),
                )
            else:
                extra = ctx.quads.sparkSession.range(1).select(
                    gterm.alias("src"), gterm.alias("dst")
                )
            d = d.unionByName(extra).distinct()
        # packed mode: endpoints are struct(g, t) — unpack the term for
        # filters/bindings and bind ?g from the packing (both endpoints
        # carry the same g by construction)
        src_t = F.col("src.t") if keyed else F.col("src")
        dst_t = F.col("dst.t") if keyed else F.col("dst")
        out = {}
        gname = ctx.graph.name if keyed else None
        if keyed:
            out[gname] = t_iri(F.col("src.g"))
        if isinstance(self.s, Var):
            if self.s.name == gname:
                # GRAPH ?g { ?g path ?x }: the subject shares the graph
                # variable — join-compatibility filter against the packed
                # graph IRI, never overwrite the ?g binding
                d = d.filter(src_t.eqNullSafe(t_iri(F.col("src.g"))))
            else:
                out[self.s.name] = src_t
        else:
            d = d.filter(src_t.eqNullSafe(term_lit(self.s)))
        if isinstance(self.o, Var):
            if self.o.name == gname:
                d = d.filter(dst_t.eqNullSafe(t_iri(F.col("src.g"))))
            elif isinstance(self.s, Var) and self.o.name == self.s.name:
                d = d.filter(src_t.eqNullSafe(dst_t))
            else:
                out[self.o.name] = dst_t
        else:
            d = d.filter(dst_t.eqNullSafe(term_lit(self.o)))
        if not out:
            return d.select(F.lit(1).alias("__m")), frozenset(), frozenset()
        return d.select(*[c.alias(v) for v, c in out.items()]), frozenset(out), frozenset()


@dataclass
class Repeat(Path):
    """p{n,m} — quantified path (public proposal SEP-0002, adopted into
    the SPARQL 1.2 path discussion; not in 1.1): between `n` and `m`
    hops of p, `m=None` = unbounded (p{n,}). Special cases reduce to
    1.1 forms — p{0,1}=p?, p{0,}=p*, p{1,}=p+ — but the bounded general
    case is genuinely new and what hierarchy queries want ("2 to 4
    levels up").

    Evaluation: the single-hop pair set materializes ONCE
    (localCheckpoint — every composition round joins against it), the
    exact-n prefix composes n joins, and the bounded tail unions one
    frontier⋈hop round per extra hop — m-n rounds, each a hash
    equi-join, never re-reading the store. n=0 starts from the
    zero-length identity over the graph's term universe (the p* rule,
    spec §9.3). Unbounded tails reuse the closure machinery
    (transitive_closure — frontier rounds escalating to path doubling)."""

    p: Path
    n: int
    m: Optional[int] = None

    def pairs(self, ctx: Ctx) -> DataFrame:
        if self.n < 0 or (self.m is not None and self.m < self.n):
            raise ValueError("Repeat: require 0 <= n <= m")
        hop = self.p.pairs(ctx).localCheckpoint(eager=False)

        def compose(a: DataFrame, b: DataFrame) -> DataFrame:
            return (
                a.alias("a")
                .join(b.alias("b"), F.col("a.dst").eqNullSafe(F.col("b.src")), "inner")
                .select(F.col("a.src").alias("src"), F.col("b.dst").alias("dst"))
                .distinct()
            )

        if self.n == 0:
            base = _identity_pairs(ctx)
        else:
            base = hop
            for _ in range(self.n - 1):
                base = compose(base, hop)
        if self.m is None:
            # n-or-more: exact-n prefix composed with the reflexive closure
            closure = transitive_closure(hop.select(F.col("src"), F.col("dst")))
            tail = closure.unionByName(_identity_pairs(ctx)).distinct()
            return compose(base, tail)
        acc, frontier = base, base
        for _ in range(self.m - self.n):
            frontier = compose(frontier, hop).localCheckpoint(eager=False)
            acc = acc.unionByName(frontier)
        return acc.distinct()

    def matches_zero(self) -> bool:
        return self.n == 0 or self.p.matches_zero()


def transitive_reduction(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Transitive reduction of a DAG edge set (src, dst): drop every edge
    implied by a longer path — the ontology-maintenance pass that prunes
    redundant skos:broader / rdfs:subClassOf shortcuts after merges, so
    the stored hierarchy stays minimal and the closure stays derivable.

    An edge (a,c) is redundant iff some b exists with edge (a,b) and c
    reachable from b — i.e. (a,c) also appears as edge ∘ closure. For a
    DAG the reduction is unique (Aho, Garey & Ullman 1972). Cycles would
    make 'redundant' ill-defined; run scc_components first and reduce
    the condensation if the input may have cycles.

    Scale shape: one `transitive_closure` (frontier → path-doubling, the
    audited O(log d) plan) + one edge⋈closure hash join + one hash anti
    join — hierarchy edges are ontology-tier data (≪ instance scale)."""
    e = edges.select("src", "dst").distinct()
    clo = transitive_closure(e, max_iter=max_iter)
    via = (
        e.alias("d")
        .join(clo.alias("c"), F.col("d.dst") == F.col("c.src"), "inner")
        .select(F.col("d.src").alias("src"), F.col("c.dst").alias("dst"))
        .distinct()
    )
    return e.join(via, ["src", "dst"], "left_anti")
