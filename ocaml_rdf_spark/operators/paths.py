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
from typing import Sequence

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


def _base(ctx: Ctx) -> DataFrame:
    df = ctx.quads
    if isinstance(ctx.graph, str):
        if ctx.named_graphs is not None and ctx.graph not in ctx.named_graphs:
            return df.filter(F.lit(False))
        return df.filter(F.col("graph") == ctx.graph)
    if ctx.graph is None and ctx.default_graphs is not None:
        return df.filter(F.col("graph").isin(*ctx.default_graphs))
    return df


@dataclass
class P(Path):
    """PredicatePath: a plain IRI."""

    iri: str

    def pairs(self, ctx: Ctx) -> DataFrame:
        df = _base(ctx).filter(F.col("pred") == self.iri)
        return df.select(_s_struct().alias("src"), _o_struct().alias("dst")).distinct()


@dataclass
class Inv(Path):
    """^p — inverse."""

    p: Path

    def pairs(self, ctx: Ctx) -> DataFrame:
        d = self.p.pairs(ctx)
        return d.select(F.col("dst").alias("src"), F.col("src").alias("dst"))


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


@dataclass
class Alt(Path):
    """p1|p2 — alternative."""

    a: Path
    b: Path

    def pairs(self, ctx: Ctx) -> DataFrame:
        return self.a.pairs(ctx).unionByName(self.b.pairs(ctx)).distinct()


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
        parts = []
        if self.iris or not self.inv_iris:
            fwd = df.filter(~F.col("pred").isin(*self.iris)) if self.iris else df
            parts.append(fwd.select(_s_struct().alias("src"), _o_struct().alias("dst")))
        if self.inv_iris:
            inv = df.filter(~F.col("pred").isin(*self.inv_iris))
            parts.append(inv.select(_o_struct().alias("src"), _s_struct().alias("dst")))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.distinct()


def _graph_nodes(ctx: Ctx) -> DataFrame:
    df = _base(ctx)
    return (
        df.select(_s_struct().alias("n"))
        .unionByName(df.select(_o_struct().alias("n")))
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


def transitive_closure(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Distinct-pair transitive closure by iterated frontier expansion.

    Each round: frontier ⋈ edges → new pairs not yet seen; localCheckpoint
    truncates lineage so round N's plan doesn't embed rounds 1..N-1
    (SURVEY §7 R5). Rounds = graph diameter; for the long-chain case prefer
    canonicalize.connected_components (O(log n) rounds) when the relation
    is symmetric.
    """
    # lazy localCheckpoints: the per-round isEmpty() probe is the single
    # action that materializes the new frontier (and, transitively, the
    # accumulated `seen` within the same job) — small graphs are
    # scheduling-bound, so one job per round instead of three
    edges = edges.select("src", "dst").distinct().localCheckpoint(eager=False)
    seen = edges
    frontier = edges
    for _ in range(max_iter):
        nxt = (
            frontier.alias("f")
            .join(edges.alias("e"), F.col("f.dst").eqNullSafe(F.col("e.src")), "inner")
            .select(F.col("f.src").alias("src"), F.col("e.dst").alias("dst"))
            .distinct()
            .exceptAll(seen)
            .localCheckpoint(eager=False)
        )
        if nxt.isEmpty():
            break
        seen = seen.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    return seen


@dataclass
class Plus(Path):
    """p+ — one-or-more (transitive closure, distinct node pairs)."""

    p: Path
    max_iter: int = 50

    def pairs(self, ctx: Ctx) -> DataFrame:
        return transitive_closure(self.p.pairs(ctx), self.max_iter)


@dataclass
class Star(Path):
    """p* — zero-or-more: closure ∪ identity."""

    p: Path
    max_iter: int = 50

    def pairs(self, ctx: Ctx) -> DataFrame:
        return transitive_closure(self.p.pairs(ctx), self.max_iter).unionByName(
            _identity_pairs(ctx)
        ).distinct()


@dataclass
class PathPattern(Node):
    """Algebra leaf: `s path o` — composes with BGP joins like any pattern."""

    s: Position
    path: Path
    o: Position

    def compile(self, ctx: Ctx) -> CompileOut:
        d = self.path.pairs(ctx)
        out = {}
        if isinstance(self.s, Var):
            out[self.s.name] = F.col("src")
        else:
            d = d.filter(F.col("src").eqNullSafe(term_lit(self.s)))
        if isinstance(self.o, Var):
            if isinstance(self.s, Var) and self.o.name == self.s.name:
                d = d.filter(F.col("src").eqNullSafe(F.col("dst")))
            else:
                out[self.o.name] = F.col("dst")
        else:
            d = d.filter(F.col("dst").eqNullSafe(term_lit(self.o)))
        if not out:
            return d.select(F.lit(1).alias("__m")), frozenset(), frozenset()
        return d.select(*[c.alias(v) for v, c in out.items()]), frozenset(out), frozenset()
