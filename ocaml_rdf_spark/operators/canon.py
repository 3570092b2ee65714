"""Canonical blank-node labeling — RDFC-1.0-style hash refinement as a
distributed DataFrame fixpoint.

The reference compares graphs modulo blank-node bijection in its W3C test
harness (src/rdf_sparql_test.ml :: graph isomorphism check — SURVEY §5)
and mints per-graph counter labels (rdf_graph.ml :: new_blank_id). Neither
works across a 10^12-document corpus: two extractions of the same page
must serialize identically even though their bnode counters differ. This
module assigns each blank node a label derived ONLY from the graph's
structure (Weisfeiler–Lehman color refinement, the same first-degree
mechanism RDFC-1.0 / URDNA2015 uses before its recursive tie-break), so
isomorphic graphs get identical labels regardless of input labels.

Algorithm: every bnode starts with one color; each round re-colors it with
the hash of the SORTED multiset of its edge descriptors — (direction,
predicate, neighbor) where a ground neighbor contributes its term hash and
a bnode neighbor its current color — plus its own previous color. The
color partition is monotone (can only split), so the fixpoint arrives in
at most diameter-of-bnode-subgraph rounds; we stop as soon as the number
of distinct colors stops growing.

Known limit (documented, matches RDFC without the N-degree recursion):
bnodes in a nontrivial automorphism orbit are structurally
indistinguishable and share a label — `n_shared` in the output flags
them. For corpus-scale graph dedup this is exactly right: isomorphic
graphs still canonicalize to identical triple sets.

Scale design:
- each round: two broadcast-free hash joins (bnode endpoints against the
  color table, keyed by lex) + one map-side-combinable groupBy — the same
  inventory as one connected-components round;
- `localCheckpoint` per round truncates lineage (SURVEY §7 R5);
- convergence is a countDistinct aggregate, never a collect of nodes;
- degree skew: a mega-degree bnode concentrates its descriptor list on
  one task; the list is bounded by that node's degree (not corpus size),
  and sort_array of a multi-million entry list is the signal to model the
  hub as an IRI, not a bnode (boilerplate hubs are, in practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..types import KIND_BNODE


def _ground_hash(kind_col, lex_col, dtype_col, lang_col):
    """Stable hash of a non-bnode term (IRIs / literals are already
    canonical identities)."""
    return F.md5(
        F.concat_ws(
            "\x1f",
            kind_col.cast("string"),
            lex_col,
            F.coalesce(dtype_col, F.lit("")),
            F.coalesce(lang_col, F.lit("")),
        )
    )


def canonical_bnode_labels(
    triples: DataFrame, max_rounds: int = 16, checkpoint: bool = True
) -> DataFrame:
    """→ (label, canon, n_shared): for every distinct bnode label in
    `triples`, its structure-derived canonical label `canon` (``c`` + 32
    hex chars) and how many input bnodes share that canonical color
    (1 = uniquely pinned, >1 = automorphism orbit)."""
    bn_s = F.col("s_kind") == KIND_BNODE
    bn_o = F.col("o_kind") == KIND_BNODE

    # static edge descriptors: (bnode label, direction+predicate, ground
    # part or neighbor-bnode label)
    edges = (
        triples.filter(bn_s)
        .select(
            F.col("s_lex").alias("b"),
            F.concat(F.lit("+"), F.col("pred")).alias("dp"),
            F.when(bn_o, F.lit(None)).otherwise(
                _ground_hash(F.col("o_kind"), F.col("o_lex"), F.col("o_dtype"), F.col("o_lang"))
            ).alias("ground"),
            F.when(bn_o, F.col("o_lex")).alias("nbr"),
        )
        .unionByName(
            triples.filter(bn_o).select(
                F.col("o_lex").alias("b"),
                F.concat(F.lit("-"), F.col("pred")).alias("dp"),
                F.when(bn_s, F.lit(None)).otherwise(
                    _ground_hash(F.col("s_kind"), F.col("s_lex"), F.lit(None), F.lit(None))
                ).alias("ground"),
                F.when(bn_s, F.col("s_lex")).alias("nbr"),
            )
        )
    )
    if checkpoint:
        edges = edges.localCheckpoint(eager=False)

    colors = (
        edges.select("b").dropDuplicates().withColumn("color", F.md5(F.lit("")))
    )
    n_colors = 1
    for _ in range(max_rounds):
        nbr_colors = colors.select(
            F.col("b").alias("nbr"), F.col("color").alias("nbr_color")
        )
        desc = (
            edges.join(nbr_colors, "nbr", "left")
            .select(
                "b",
                F.concat_ws(
                    "\x1f", F.col("dp"), F.coalesce(F.col("ground"), F.col("nbr_color"))
                ).alias("d"),
            )
        )
        own = colors.select("b", F.col("color").alias("prev"))
        new_colors = (
            desc.groupBy("b")
            .agg(F.sort_array(F.collect_list("d")).alias("ds"))
            .join(own, "b")
            .select(
                "b",
                F.md5(F.concat_ws("\x1e", F.col("prev"), F.concat_ws("\x1d", F.col("ds")))).alias(
                    "color"
                ),
            )
        )
        if checkpoint:
            new_colors = new_colors.localCheckpoint(eager=False)
        n_new = new_colors.select(F.countDistinct("color")).first()[0]
        colors = new_colors
        if n_new == n_colors:
            break  # partition stable: refinement is monotone, fixpoint reached
        n_colors = n_new

    orbit = colors.groupBy("color").agg(F.count(F.lit(1)).alias("n_shared"))
    return (
        colors.join(orbit, "color")
        .select(
            F.col("b").alias("label"),
            F.concat(F.lit("c"), F.col("color")).alias("canon"),
            "n_shared",
        )
    )


def canonicalize_bnodes(triples: DataFrame, max_rounds: int = 16) -> DataFrame:
    """Rewrite every bnode lexical in `triples` to its canonical label —
    the output triple SET is identical for isomorphic inputs (up to
    automorphism orbits, whose members are interchangeable anyway)."""
    labels = canonical_bnode_labels(triples, max_rounds=max_rounds)
    s_map = labels.select(F.col("label").alias("s_lex_old"), F.col("canon").alias("s_canon"))
    o_map = labels.select(F.col("label").alias("o_lex_old"), F.col("canon").alias("o_canon"))
    bn_s = F.col("s_kind") == KIND_BNODE
    bn_o = F.col("o_kind") == KIND_BNODE
    out = (
        triples.join(s_map, bn_s & (F.col("s_lex") == F.col("s_lex_old")), "left")
        .join(o_map, bn_o & (F.col("o_lex") == F.col("o_lex_old")), "left")
        .withColumn("s_lex", F.when(bn_s, F.col("s_canon")).otherwise(F.col("s_lex")))
        .withColumn("o_lex", F.when(bn_o, F.col("o_canon")).otherwise(F.col("o_lex")))
        .drop("s_lex_old", "s_canon", "o_lex_old", "o_canon")
    )
    return out


# --- literal normal form ------------------------------------------------------

XSD = "http://www.w3.org/2001/XMLSchema#"


def normalize_literals(triples: DataFrame) -> DataFrame:
    """Datatype-aware literal normal form for the set-semantics store:
    "01"^^xsd:integer, "+1"^^xsd:integer and "1"^^xsd:integer denote the
    same value but are three distinct quads to a byte-keyed dedup — the
    same drift problem NFC solves for strings, at the typed-literal tier.

    Rules (a deterministic DEDUP normal form; documented where it differs
    from the XSD canonical mapping):
    - xsd:integer/long/int/short/byte (± unsigned/negative/positive/non*):
      exact integer re-serialization (leading zeros/plus dropped, -0 → 0);
    - xsd:decimal: exact decimal(38,6) value, trailing fractional zeros
      and a bare trailing point dropped — integral values render WITHOUT
      ".0" (XSD's canonical keeps one fractional digit; a normal form
      must only be injective on values, and "1" is friendlier to joins
      against integer-typed literals' lexicals);
    - xsd:boolean: "1"/"0" → "true"/"false";
    - lexicals that do not parse keep their original form (an invalid
      literal is semantic garbage but must not be silently altered);
    - every other datatype, plain/lang strings, IRIs, bnodes: unchanged.

    Scan-local Column algebra — no UDF, no shuffle; run it BEFORE
    dedup_triples so the set semantics see values, not spellings."""
    lex = F.col("o_lex")
    is_lit = F.col("o_kind") == 2
    int_types = [
        XSD + t
        for t in (
            "integer", "long", "int", "short", "byte",
            "nonNegativeInteger", "nonPositiveInteger",
            "negativeInteger", "positiveInteger",
            "unsignedLong", "unsignedInt", "unsignedShort", "unsignedByte",
        )
    ]
    from ..functions.terms import _INEXACT_LEX, dec_canon

    int_norm = lex.try_cast("decimal(38,0)").cast("string")
    # _INEXACT_LEX guard (functions/terms.py): Spark's decimal cast ROUNDS
    # a 7th+ nonzero fractional digit instead of nulling — normalizing such
    # a lexical would silently change the value, so it keeps its spelling
    dec_norm = F.when(
        ~lex.rlike(_INEXACT_LEX), dec_canon(lex.try_cast("decimal(38,6)"))
    ).otherwise(F.lit(None).cast("string"))
    bool_norm = (
        F.when(lex.isin("1", "true"), F.lit("true"))
        .when(lex.isin("0", "false"), F.lit("false"))
        .otherwise(F.lit(None).cast("string"))
    )
    normed = (
        F.when(is_lit & F.col("o_dtype").isin(int_types), F.coalesce(int_norm, lex))
        .when(is_lit & (F.col("o_dtype") == XSD + "decimal"), F.coalesce(dec_norm, lex))
        .when(is_lit & (F.col("o_dtype") == XSD + "boolean"), F.coalesce(bool_norm, lex))
        .otherwise(lex)
    )
    return triples.withColumn("o_lex", normed)


SKOLEM_BASE = "https://ords.invalid/.well-known/genid/"


def skolemize(quads: DataFrame, base: str = SKOLEM_BASE) -> DataFrame:
    """Blank-node skolemization (RDF 1.1 Concepts §3.5): replace every
    blank node with a fresh globally-unique IRI under
    `.well-known/genid/` so the data can leave the local scope (bnode
    labels are file-scoped; skolem IRIs survive joins across snapshots,
    exports, and federation). Map-only column algebra — kind 1 terms
    become kind 0 with lex = base || label; everything else passes
    through. Inverse of `unskolemize` for round-trips."""
    def sk(kind, lex):
        return (
            F.when(F.col(kind) == 1, F.concat(F.lit(base), F.col(lex))).otherwise(F.col(lex)).alias(lex),
            F.when(F.col(kind) == 1, F.lit(0)).otherwise(F.col(kind)).cast("tinyint").alias(kind),
        )

    s_lex, s_kind = sk("s_kind", "s_lex")
    o_lex, o_kind = sk("o_kind", "o_lex")
    others = [c for c in quads.columns if c not in ("s_kind", "s_lex", "o_kind", "o_lex")]
    return quads.select(s_kind, s_lex, o_kind, o_lex, *others)


def unskolemize(quads: DataFrame, base: str = SKOLEM_BASE) -> DataFrame:
    """Inverse of `skolemize`: IRIs under `base` become blank nodes with
    the trailing label. skolemize∘unskolemize is the identity on any
    graph whose IRIs don't collide with `base` (the .well-known contract)."""
    n = len(base)

    def unsk(kind, lex):
        hit = (F.col(kind) == 0) & F.col(lex).startswith(base)
        return (
            F.when(hit, F.substring(F.col(lex), n + 1, 1 << 30)).otherwise(F.col(lex)).alias(lex),
            F.when(hit, F.lit(1)).otherwise(F.col(kind)).cast("tinyint").alias(kind),
        )

    s_lex, s_kind = unsk("s_kind", "s_lex")
    o_lex, o_kind = unsk("o_kind", "o_lex")
    others = [c for c in quads.columns if c not in ("s_kind", "s_lex", "o_kind", "o_lex")]
    return quads.select(s_kind, s_lex, o_kind, o_lex, *others)


def graph_digest(quads: DataFrame) -> DataFrame:
    """Order-independent dataset digest → ONE row (n_quads, digest):
    digest = Σ (mod 2^63) of each distinct quad's 60-bit md5 — a
    COMMUTATIVE hash combine, so the value is independent of row order,
    partitioning, AND engine (the associative-integer rule), and two
    snapshots compare with one scan each + an 8-byte equality instead of
    a full EXCEPT join (graph_diff is the tool when you need the WHICH;
    this answers the cheaper DID-anything-change). Set semantics: the
    distinct collapses duplicate assertions exactly like the store's
    dedup. Collision odds for k quads ≈ k²/2^61 — fine for change
    DETECTION (a pipeline gate re-verifies with graph_diff on mismatch,
    never trusts equality for correctness-critical merges)."""
    key = F.concat_ws(
        "\x1f",
        F.col("s_kind").cast("string"), "s_lex", "pred",
        F.col("o_kind").cast("string"), "o_lex",
        F.coalesce("o_dtype", F.lit("")), F.coalesce("o_lang", F.lit("")),
        F.coalesce("graph", F.lit("")),
    )
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return (
        quads.select(h.alias("h")).distinct()
        .agg(
            F.count(F.lit(1)).alias("n_quads"),
            # sum in DECIMAL(38,0): BIGINT would overflow past ~8k quads
            # (k × 2^60); decimal holds 10^38 ≈ 10^20 quads
            F.pmod(F.sum(F.col("h").cast("decimal(38,0)")), F.lit(2**63 - 1))
            .cast("long")
            .alias("digest"),
        )
    )


def rdf_lists(quads: DataFrame, max_len: int = 64) -> DataFrame:
    """Flatten every rdf:first/rdf:rest collection spine in the store to
    (head, idx, o_kind, item, o_dtype) rows — the distributed inverse of
    the Turtle reader's `(...)` expansion (sources/turtle.py) and the
    JSON-LD @list chains (sources/jsonld.py). A 'head' is a spine node
    that is not itself the rdf:rest of another node, so nested/shared
    tails flatten once per entry point; idx is 0-based.

    Scale shape: one iterative walk, each round = ONE node-keyed hash
    join frontier→rest + a first-lookup join, localCheckpoint per round
    (the paths.py fixpoint discipline). RDF collections are data-
    structure-sized (argument lists, chain axioms — tens of entries,
    not millions), so `max_len` rounds is a correctness cap, not a
    scalability concern; rounds stop early when the frontier drains.
    Malformed spines (missing rdf:first) contribute no row at that cell
    but the walk continues through rdf:rest."""
    from pyspark.sql import functions as _F

    RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    first = quads.filter(_F.col("pred") == RDF_NS + "first").select(
        _F.col("s_lex").alias("node"),
        _F.col("o_kind").alias("item_kind"),
        _F.col("o_lex").alias("item"),
        _F.col("o_dtype").alias("item_dtype"),
    )
    rest = quads.filter(_F.col("pred") == RDF_NS + "rest").select(
        _F.col("s_lex").alias("node"), _F.col("o_lex").alias("next")
    )
    spine_nodes = first.select("node").unionByName(rest.select("node")).distinct()
    tails = rest.select(_F.col("next").alias("node")).distinct()
    heads = spine_nodes.join(tails, "node", "left_anti").select(
        _F.col("node").alias("head"), _F.col("node").alias("cur")
    )
    out = None
    frontier = heads.localCheckpoint(eager=True)
    for idx in range(max_len):
        cell = frontier.join(first, frontier.cur == first.node, "inner").select(
            "head",
            _F.lit(idx).cast("long").alias("idx"),
            _F.col("item_kind").alias("o_kind"),
            _F.col("item").alias("item"),
            _F.col("item_dtype").alias("o_dtype"),
        )
        out = cell if out is None else out.unionByName(cell)
        nxt = (
            frontier.join(rest, frontier.cur == rest.node, "inner")
            .filter(_F.col("next") != RDF_NS + "nil")
            .select("head", _F.col("next").alias("cur"))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        frontier = nxt
    return out if out is not None else quads.limit(0).select(
        _F.col("s_lex").alias("head"),
        _F.lit(0).cast("long").alias("idx"),
        _F.col("o_kind"),
        _F.col("o_lex").alias("item"),
        _F.col("o_dtype"),
    )


def rewrite_namespace(quads: DataFrame, old_prefix: str, new_prefix: str) -> DataFrame:
    """Namespace migration — rewrite every IRI under `old_prefix` to
    `new_prefix` across subject / predicate / IRI-object positions (the
    admin operation behind vocabulary upgrades and .invalid→production
    domain moves; cf. rdf_graph.ml's namespace bindings, SURVEY §2.1).
    Literals and non-matching IRIs pass through untouched. Map-only
    anchored-prefix column algebra: ZERO shuffles at any store size, and
    the same quad count out as in (rewriting never merges rows here —
    run the store's set-dedup sink after if the rewrite can collide)."""
    def rw(col: F.Column, is_iri: F.Column) -> F.Column:
        hit = is_iri & col.startswith(old_prefix)
        return F.when(
            hit, F.concat(F.lit(new_prefix), F.substring(col, len(old_prefix) + 1, 2**30))
        ).otherwise(col)

    out = quads.withColumn("s_lex", rw(F.col("s_lex"), F.col("s_kind") == 0))
    out = out.withColumn("pred", rw(F.col("pred"), F.lit(True)))
    return out.withColumn("o_lex", rw(F.col("o_lex"), F.col("o_kind") == 0))


# --- RDF reification (rdf:Statement) ------------------------------------------
#
# The classic statement-about-statements mechanism (RDF 1.1 §5.3 /
# rdf:Statement vocabulary) — the pre-RDF-star way to attach provenance or
# qualifiers to individual triples, still what most legacy KGs (Wikidata
# dumps, YAGO2) ship. ocaml-rdf exposes the vocabulary terms (rdf_rdf.ml);
# the distributed rewrite both ways is the engine's store-level addition.
# The RDF-star path (types.py KIND_TRIPLE + the SPARQL-star surface) is the
# modern equivalent; reify/unreify interoperate with stores that predate it.

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_QKEY_COLS = ("s_kind", "s_lex", "pred", "o_kind", "o_lex", "o_dtype", "o_lang", "graph")


def _stmt_iri() -> F.Column:
    """Deterministic statement IRI: md5 of the full quad key (unit-separated,
    null-coalesced) — re-reifying the same store yields the same ids, so
    set-semantics dedup keeps reification idempotent."""
    parts = []
    for c in _QKEY_COLS:
        parts.append(F.coalesce(F.col(c).cast("string"), F.lit("")))
        parts.append(F.lit("\x1f"))
    return F.concat(F.lit("urn:x-ords:stmt:"), F.md5(F.concat(*parts[:-1])))


def reify(quads: DataFrame) -> DataFrame:
    """Quad store slice → RDF reification quads: per input quad a
    deterministic statement IRI carrying rdf:type rdf:Statement,
    rdf:subject, rdf:predicate, rdf:object (object keeps its
    kind/dtype/lang), in the SAME graph. Map-only: a constant-width
    melt (one explode of a 4-struct array), no shuffle, no UDF."""
    from ..types import KIND_IRI

    stmt = _stmt_iri()
    i = F.lit(KIND_IRI).cast("tinyint")
    nul = F.lit(None).cast("string")

    def row(pred: str, ok, olex, odt, olang):
        return F.struct(
            F.lit(_RDF_NS + pred).alias("pred"),
            ok.cast("tinyint").alias("o_kind"),
            olex.alias("o_lex"),
            odt.alias("o_dtype"),
            olang.alias("o_lang"),
        )

    melted = quads.select(
        i.alias("s_kind"),
        stmt.alias("s_lex"),
        F.col("graph"),
        F.explode(
            F.array(
                row("type", i, F.lit(_RDF_NS + "Statement"), nul, nul),
                row("subject", F.col("s_kind"), F.col("s_lex"), nul, nul),
                row("predicate", i, F.col("pred"), nul, nul),
                row("object", F.col("o_kind"), F.col("o_lex"), F.col("o_dtype"), F.col("o_lang")),
            )
        ).alias("_r"),
    )
    return melted.select(
        "s_kind", "s_lex",
        F.col("_r.pred").alias("pred"),
        F.col("_r.o_kind").alias("o_kind"),
        F.col("_r.o_lex").alias("o_lex"),
        F.col("_r.o_dtype").alias("o_dtype"),
        F.col("_r.o_lang").alias("o_lang"),
        "graph",
    )


def unreify(quads: DataFrame) -> DataFrame:
    """Inverse of `reify`: collapse rdf:subject/predicate/object groups
    back to plain quads. ONE (statement, graph)-keyed aggregation with
    map-side combine; statements missing any of the three component
    arcs are dropped (incomplete reification — the W3C vocabulary makes
    no integrity promise, so silence is the only spec-true option).
    Works on ANY store: non-reification rows are pre-filtered by
    predicate, which pushes to the scan."""
    rei = quads.filter(
        F.col("pred").isin(
            _RDF_NS + "subject", _RDF_NS + "predicate", _RDF_NS + "object"
        )
    )

    def pick(pred: str, col: str):
        return F.max(
            F.when(F.col("pred") == _RDF_NS + pred, F.col(col))
        )

    g = rei.groupBy("s_lex", "graph").agg(
        pick("subject", "o_kind").alias("s_kind2"),
        pick("subject", "o_lex").alias("s_lex2"),
        pick("predicate", "o_lex").alias("pred2"),
        pick("object", "o_kind").alias("o_kind2"),
        pick("object", "o_lex").alias("o_lex2"),
        pick("object", "o_dtype").alias("o_dtype2"),
        pick("object", "o_lang").alias("o_lang2"),
    )
    return g.filter(
        F.col("s_lex2").isNotNull() & F.col("pred2").isNotNull() & F.col("o_lex2").isNotNull()
    ).select(
        F.col("s_kind2").cast("tinyint").alias("s_kind"),
        F.col("s_lex2").alias("s_lex"),
        F.col("pred2").alias("pred"),
        F.col("o_kind2").cast("tinyint").alias("o_kind"),
        F.col("o_lex2").alias("o_lex"),
        F.col("o_dtype2").alias("o_dtype"),
        F.col("o_lang2").alias("o_lang"),
        "graph",
    )


def container_members(quads: DataFrame) -> DataFrame:
    """Flatten RDF container membership (rdf:Seq / rdf:Bag / rdf:Alt,
    RDF 1.1 Schema §5.1) to (container, ctype, idx, o_kind, item,
    o_dtype) rows — the container counterpart of `rdf_lists` and the
    distributed realization of rdfs:member entailment (RDFS rule over
    rdfs:ContainerMembershipProperty): every rdf:_n arc is a member at
    1-based position n. ocaml-rdf models containers alongside
    collections in its term API (SURVEY §2.1); this is the read side.

    `ctype` is the container's declared rdf:type local name
    ('Seq'/'Bag'/'Alt', NULL when undeclared — membership does not
    require the type arc). idx ordering is only meaningful for Seq;
    Bag/Alt rows keep n as an identity, per spec. Indexes need not be
    contiguous (the spec imposes no gap rule) — rows surface exactly the
    arcs present.

    Scale shape: membership extraction is a map-only predicate-prefix
    filter + integer extraction (pred-clustered store files prune to the
    rdf:_n range via min/max stats); the type decoration is ONE hash
    join against the rdf:type slice keyed by container id. Nothing
    iterative — unlike list spines, containers index members directly,
    which is exactly why RDF offers both."""
    from pyspark.sql import functions as _F

    from ..types import RDF_NS, RDF_TYPE

    mem = quads.filter(
        _F.col("pred").startswith(RDF_NS + "_")
        & _F.col("pred").substr(_F.lit(len(RDF_NS) + 2), _F.length("pred")).rlike("^[0-9]+$")
    ).select(
        _F.col("s_lex").alias("container"),
        # TRY_CAST, not CAST: Catalyst may constant-fold/reorder the
        # projection ahead of the rlike filter, and ANSI CAST then
        # errors on non-member preds (e.g. rdf:type) it would never see
        _F.expr(f"TRY_CAST(substring(pred, {len(RDF_NS) + 2}) AS BIGINT)").alias("idx"),
        "o_kind",
        _F.col("o_lex").alias("item"),
        "o_dtype",
    )
    ctypes = (
        quads.filter(
            (_F.col("pred") == RDF_TYPE)
            & _F.col("o_lex").isin(RDF_NS + "Seq", RDF_NS + "Bag", RDF_NS + "Alt")
        )
        .select(
            _F.col("s_lex").alias("container"),
            _F.substring_index("o_lex", "#", -1).alias("ctype"),
        )
        # a (malformed) container declaring several types picks the
        # lexicographic min — deterministic under any partitioning
        .groupBy("container")
        .agg(_F.min("ctype").alias("ctype"))
    )
    return mem.join(ctypes, "container", "left").select(
        "container", "ctype", "idx", "o_kind", "item", "o_dtype"
    )
