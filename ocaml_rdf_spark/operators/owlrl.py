"""OWL 2 RL property-axiom materialization — the companion to
operators/rdfs.py (and to the owl:sameAs handling in operators/cc.py):
the three instance-scale property axioms every KG pipeline materializes:

  prp-inv   x p y, p owl:inverseOf q (either direction) ⇒ y q x
  prp-symp  x p y, p a owl:SymmetricProperty            ⇒ y p x
  prp-trp   x p y, y p z, p a owl:TransitiveProperty    ⇒ x p z

Evaluation order reaches the combined fixpoint without iterating the
rule set: mirror symmetric edges and expand inverses FIRST (so a
transitive property fed through its inverse is closed too), close each
transitive property, then re-apply inverse/symmetric to the closure
output (closure(p) pairs seen through inverseOf / symmetry). The
per-property transitive closure runs as ONE fixpoint over ALL
transitive properties simultaneously: node ids are prefixed with the
property (`pred US node`), so the frontier join's dst=src equality
implies pred equality — k properties cost one closure, not k.

Scale: axiom triples broadcast; symmetric/inverse expansion is one
broadcast join pass; the closure iterates only over rows of transitive
properties (pred-pushed scan), diameter-bounded with path doubling
(operators/paths.transitive_closure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..types import RDF_TYPE, TRIPLE_KEY

OWL_NS = "http://www.w3.org/2002/07/owl#"
INVERSE_OF = OWL_NS + "inverseOf"
SYMMETRIC = OWL_NS + "SymmetricProperty"
TRANSITIVE = OWL_NS + "TransitiveProperty"

_SEP = "\x1f"


def owl_rl_closure(triples: DataFrame, graph: str = "urn:g:owl") -> DataFrame:
    """→ ENTAILED triples only (graph = `graph`, extractor = 'owl'),
    asserted statements excluded. IRI/BNode positions only (property
    axioms never touch literals' object slots other than pass-through:
    literal objects are kept for symmetric/inverse? No — an inverse or
    symmetric edge with a literal object would put a literal in subject
    position, which RDF forbids; such statements are skipped)."""
    from .paths import transitive_closure

    inv = (
        triples.filter((F.col("pred") == INVERSE_OF) & (F.col("s_kind") == 0) & (F.col("o_kind") == 0))
        .select(F.col("s_lex").alias("a"), F.col("o_lex").alias("b"))
        .distinct()
    )
    # inverseOf is symmetric in effect: expand both directions
    inv_both = inv.unionByName(inv.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = (
        triples.filter((F.col("pred") == RDF_TYPE) & (F.col("o_lex") == SYMMETRIC))
        .select(F.col("s_lex").alias("p")).distinct()
    )
    trp = (
        triples.filter((F.col("pred") == RDF_TYPE) & (F.col("o_lex") == TRANSITIVE))
        .select(F.col("s_lex").alias("p")).distinct()
    )

    # resource-to-resource statements only (literal objects cannot flip)
    stmts = (
        triples.filter(F.col("o_kind").isin(0, 1) & F.col("s_kind").isin(0, 1))
        .select("s_kind", "s_lex", "pred", "o_kind", "o_lex")
        .distinct()
    )

    def flip(df):
        return df.select(
            F.col("o_kind").alias("s_kind"), F.col("o_lex").alias("s_lex"),
            F.col("pred"), F.col("s_kind").alias("o_kind"), F.col("s_lex").alias("o_lex"),
        )

    def inv_of(df):
        return (
            df.join(F.broadcast(inv_both.withColumnRenamed("a", "pred")), "pred", "inner")
            .select(
                F.col("o_kind").alias("s_kind"), F.col("o_lex").alias("s_lex"),
                F.col("b").alias("pred"), F.col("s_kind").alias("o_kind"), F.col("s_lex").alias("o_lex"),
            )
        )

    def sym_of(df):
        return flip(df.join(F.broadcast(sym.withColumnRenamed("p", "pred")), "pred", "inner"))

    # phase 1: inverse + symmetric expansion over asserted statements
    expanded = stmts.unionByName(inv_of(stmts)).unionByName(sym_of(stmts)).distinct()

    # phase 2: one simultaneous closure over every transitive property —
    # node ids carry the property prefix so dst=src implies same pred
    tedges = expanded.join(F.broadcast(trp.withColumnRenamed("p", "pred")), "pred", "inner")
    keyed = tedges.select(
        F.concat_ws(_SEP, "pred", F.col("s_kind").cast("string"), "s_lex").alias("src"),
        F.concat_ws(_SEP, "pred", F.col("o_kind").cast("string"), "o_lex").alias("dst"),
    )
    closed = transitive_closure(keyed)
    closure_stmts = closed.select(
        F.split(F.col("src"), _SEP).alias("s3"), F.split(F.col("dst"), _SEP).alias("o3")
    ).select(
        F.element_at("s3", 2).cast("tinyint").alias("s_kind"),
        F.element_at("s3", 3).alias("s_lex"),
        F.element_at("s3", 1).alias("pred"),
        F.element_at("o3", 2).cast("tinyint").alias("o_kind"),
        F.element_at("o3", 3).alias("o_lex"),
    )

    # phase 3: closure pairs seen through inverse / symmetry
    out5 = (
        expanded.unionByName(closure_stmts)
        .unionByName(inv_of(closure_stmts))
        .unionByName(sym_of(closure_stmts))
        .distinct()
    )
    out = (
        out5.withColumn("o_dtype", F.lit(None).cast("string"))
        .withColumn("o_lang", F.lit(None).cast("string"))
        .withColumn("graph", F.lit(graph))
        .withColumn("src_url", F.lit(None).cast("string"))
        .withColumn("extractor", F.lit("owl"))
        .withColumn("part_id", F.lit(None).cast("int"))
        .dropDuplicates(TRIPLE_KEY)
    )
    asserted = triples.select("s_kind", "s_lex", "pred", "o_kind", "o_lex").distinct()
    return out.join(asserted, ["s_kind", "s_lex", "pred", "o_kind", "o_lex"], "left_anti")


FUNCTIONAL = OWL_NS + "FunctionalProperty"
INV_FUNCTIONAL = OWL_NS + "InverseFunctionalProperty"
SAME_AS = OWL_NS + "sameAs"


def functional_same_as(triples: DataFrame, graph: str = "urn:g:owl") -> DataFrame:
    """OWL 2 RL entity-resolution rules prp-fp / prp-ifp → owl:sameAs
    triples (entailments only):

      prp-fp   p a owl:FunctionalProperty;  x p y₁, x p y₂ ⇒ y₁ sameAs y₂
      prp-ifp  p a owl:InverseFunctionalProperty; x₁ p y, x₂ p y
                                                  ⇒ x₁ sameAs x₂

    THE mechanical entity-resolution step of a KG pipeline: declare
    foaf:mbox inverse-functional and every pair of subjects sharing an
    email collapses — the produced sameAs edges feed `cc.canonicalize`
    exactly like asserted sameAs does. prp-ifp keys may be literals
    (emails ARE literals); prp-fp emits resource pairs only (a literal
    in subject position is an inconsistency report, not a triple —
    skipped, matching the owl_rl_closure literal rule).

    Scale + determinism: groups emit STAR form (each member sameAs the
    group minimum), not pairwise — O(k) rows per k-member collision
    group instead of O(k²), and under sameAs transitivity the closure
    is identical (CC re-derives the classes either way). One
    (pred, key)-keyed min aggregation per rule, axioms broadcast; a
    mega-collision key (half the web shares mailto:'') partial-
    aggregates to ONE min before the shuffle — callers drop junk keys
    beforehand like every blocking step."""
    fp = (
        triples.filter((F.col("pred") == RDF_TYPE) & (F.col("o_lex") == FUNCTIONAL))
        .select(F.col("s_lex").alias("p")).distinct()
    )
    ifp = (
        triples.filter((F.col("pred") == RDF_TYPE) & (F.col("o_lex") == INV_FUNCTIONAL))
        .select(F.col("s_lex").alias("p")).distinct()
    )
    stmts = triples.select("s_kind", "s_lex", "pred", "o_kind", "o_lex", "o_dtype", "o_lang")

    # prp-fp: group by (pred, subject term), values must be resources
    fp_rows = (
        stmts.join(F.broadcast(fp.withColumnRenamed("p", "pred")), "pred")
        .filter(F.col("o_kind").isin(0, 1))
        .select(
            F.concat_ws(_SEP, "pred", F.col("s_kind").cast("string"), "s_lex").alias("grp"),
            F.col("o_kind").alias("m_kind"), F.col("o_lex").alias("m_lex"),
        )
    )
    # prp-ifp: group by (pred, object term incl. datatype/lang), members are subjects
    ifp_rows = (
        stmts.join(F.broadcast(ifp.withColumnRenamed("p", "pred")), "pred")
        .select(
            F.concat_ws(
                _SEP, "pred", F.col("o_kind").cast("string"), "o_lex",
                F.coalesce("o_dtype", F.lit("")), F.coalesce("o_lang", F.lit("")),
            ).alias("grp"),
            F.col("s_kind").alias("m_kind"), F.col("s_lex").alias("m_lex"),
        )
    )

    def star(rows):
        members = rows.dropDuplicates()
        canon = members.groupBy("grp").agg(
            F.min(F.struct("m_kind", "m_lex")).alias("c"),
            F.countDistinct("m_kind", "m_lex").alias("n"),
        ).filter(F.col("n") > 1)
        return (
            members.join(canon, "grp")
            .filter((F.col("m_kind") != F.col("c.m_kind")) | (F.col("m_lex") != F.col("c.m_lex")))
            .select(
                F.col("m_kind").cast("tinyint").alias("s_kind"),
                F.col("m_lex").alias("s_lex"),
                F.lit(SAME_AS).alias("pred"),
                F.col("c.m_kind").cast("tinyint").alias("o_kind"),
                F.col("c.m_lex").alias("o_lex"),
            )
        )

    out5 = star(fp_rows).unionByName(star(ifp_rows)).distinct()
    out = (
        out5.withColumn("o_dtype", F.lit(None).cast("string"))
        .withColumn("o_lang", F.lit(None).cast("string"))
        .withColumn("graph", F.lit(graph))
        .withColumn("src_url", F.lit(None).cast("string"))
        .withColumn("extractor", F.lit("owl"))
        .withColumn("part_id", F.lit(None).cast("int"))
    )
    asserted = triples.select("s_kind", "s_lex", "pred", "o_kind", "o_lex").distinct()
    return out.join(asserted, ["s_kind", "s_lex", "pred", "o_kind", "o_lex"], "left_anti")


CHAIN_AXIOM = OWL_NS + "propertyChainAxiom"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"


def chain_closure(triples: DataFrame, graph: str = "urn:g:owl") -> DataFrame:
    """OWL 2 RL rule prp-spo2 — property chains: for each axiom
    ``p owl:propertyChainAxiom (p1 … pn)``, entail ``x p y`` wherever
    ``x p1∘…∘pn y`` (e.g. hasParent∘hasParent ⇒ hasGrandparent; the KG
    use: collapse multi-hop shapes the ontology names). → entailed
    triples only, asserted excluded — the owl_rl_closure contract.

    The axiom side (chain heads + rdf:first/rest list spine) is
    ONTOLOGY-sized metadata: it is collected and unrolled at the driver
    (same documented bounded-collect tier as the serializer helpers —
    ontologies don't grow with the corpus). Each n-step chain then
    compiles to n instance-scale DataFrames equi-joined head-to-tail
    (hash joins on the shared node term), exactly the plan the SPARQL
    Seq path operator produces — O(n−1) joins per chain, predicates
    pushed to the store scan, nothing iterative (prp-spo2 is not a
    fixpoint; combined with prp-trp the caller re-runs owl passes to
    their joint fixpoint, matching the standard rule-engine loop)."""
    ax = triples.filter(F.col("pred") == CHAIN_AXIOM).select(
        F.col("s_lex").alias("p"), F.col("o_lex").alias("head")
    )
    spine = triples.filter(F.col("pred").isin(RDF_FIRST, RDF_REST)).select(
        "s_lex", "pred", "o_lex"
    )
    # driver-side unroll (ontology-sized by contract)
    firsts, rests = {}, {}
    for r in spine.collect():
        (firsts if r["pred"] == RDF_FIRST else rests)[r["s_lex"]] = r["o_lex"]
    chains = []
    for r in ax.collect():
        node, steps = r["head"], []
        while node != RDF_NIL and node in firsts:
            steps.append(firsts[node])
            node = rests.get(node, RDF_NIL)
        if len(steps) >= 2:
            chains.append((r["p"], steps))
    stmts = triples.select("s_kind", "s_lex", "pred", "o_kind", "o_lex")
    outs = []
    for p, steps in chains:
        cur = stmts.filter(F.col("pred") == steps[0]).select(
            "s_kind", "s_lex", F.col("o_kind").alias("m_kind"), F.col("o_lex").alias("m_lex")
        )
        for q in steps[1:]:
            nxt = stmts.filter(F.col("pred") == q).select(
                F.col("s_kind").alias("m_kind"), F.col("s_lex").alias("m_lex"),
                F.col("o_kind").alias("n_kind"), F.col("o_lex").alias("n_lex"),
            )
            cur = cur.join(nxt, ["m_kind", "m_lex"]).select(
                "s_kind", "s_lex",
                F.col("n_kind").alias("m_kind"), F.col("n_lex").alias("m_lex"),
            )
        outs.append(
            cur.select(
                F.col("s_kind").cast("tinyint").alias("s_kind"), "s_lex",
                F.lit(p).alias("pred"),
                F.col("m_kind").cast("tinyint").alias("o_kind"),
                F.col("m_lex").alias("o_lex"),
            )
        )
    if not outs:
        return triples.select("s_kind", "s_lex", "pred", "o_kind", "o_lex").limit(0).withColumn(
            "o_dtype", F.lit(None).cast("string")
        ).withColumn("o_lang", F.lit(None).cast("string")).withColumn(
            "graph", F.lit(graph)
        ).withColumn("src_url", F.lit(None).cast("string")).withColumn(
            "extractor", F.lit("owl")
        ).withColumn("part_id", F.lit(None).cast("int"))
    out5 = outs[0]
    for o in outs[1:]:
        out5 = out5.unionByName(o)
    out = (
        out5.distinct()
        .withColumn("o_dtype", F.lit(None).cast("string"))
        .withColumn("o_lang", F.lit(None).cast("string"))
        .withColumn("graph", F.lit(graph))
        .withColumn("src_url", F.lit(None).cast("string"))
        .withColumn("extractor", F.lit("owl"))
        .withColumn("part_id", F.lit(None).cast("int"))
    )
    asserted = triples.select("s_kind", "s_lex", "pred", "o_kind", "o_lex").distinct()
    return out.join(asserted, ["s_kind", "s_lex", "pred", "o_kind", "o_lex"], "left_anti")


DISJOINT_WITH = OWL_NS + "disjointWith"
PROP_DISJOINT_WITH = OWL_NS + "propertyDisjointWith"
IRREFLEXIVE = OWL_NS + "IrreflexiveProperty"
ASYMMETRIC = OWL_NS + "AsymmetricProperty"


def owl_consistency(triples: DataFrame) -> DataFrame:
    """OWL 2 RL consistency check — the spec's `false`-conclusion rules
    as a VIOLATION REPORT instead of an explosion (every production KG
    pipeline gates serving on this; a 10^12-triple store with one
    disjointness clash must name the clashing entities, not refuse to
    load):

      cax-dw    C1 owl:disjointWith C2;  x type C1, x type C2   → clash
      prp-irp   p a owl:IrreflexiveProperty;  x p x             → clash
      prp-asyp  p a owl:AsymmetricProperty;   x p y ∧ y p x     → clash
      prp-pdw   p owl:propertyDisjointWith q; x p y ∧ x q y     → clash

    → (rule, node, detail_a, detail_b), set semantics:
      cax-dw:   (rule, x,  C1, C2)  with C1 < C2 (one row per unordered
                class pair — disjointWith is symmetric)
      prp-irp:  (rule, x,  p,  x)
      prp-asyp: (rule, x,  p,  y)   with x < y (one row per unordered
                node pair — the clash is the PAIR)
      prp-pdw:  (rule, x,  p ‖ q packed as 'p q' min-first, y)

    Runs over ASSERTED statements — materialize the closure first
    (rdfs_closure / owl_rl_closure) and check the union when inferred
    types must participate (the standard pipeline order).

    Scale: axiom tables are schema-sized broadcasts; cax-dw joins the
    type scan to itself ON THE SUBJECT KEY after a broadcast-semi
    restriction to disjoint-mentioned classes (never all-pairs of
    types); prp-asyp/pdw are one self-equi-join each on (s,o)/(o,s)
    keys restricted to the axiom predicates. One dedup shuffle total
    per rule."""
    iri = (F.col("s_kind") == 0) & (F.col("o_kind") == 0)
    # symmetric closure of the disjointness axioms (declared either way)
    dj = (
        triples.filter((F.col("pred") == DISJOINT_WITH) & iri)
        .select(F.col("s_lex").alias("c1"), F.col("o_lex").alias("c2"))
    )
    dj = dj.unionByName(dj.select(F.col("c2").alias("c1"), F.col("c1").alias("c2"))).distinct()
    pdw = (
        triples.filter((F.col("pred") == PROP_DISJOINT_WITH) & iri)
        .select(F.col("s_lex").alias("p1"), F.col("o_lex").alias("p2"))
    )
    pdw = pdw.unionByName(pdw.select(F.col("p2").alias("p1"), F.col("p1").alias("p2"))).distinct()

    def _props_of(cls_iri):
        return (
            triples.filter((F.col("pred") == RDF_TYPE) & (F.col("o_lex") == cls_iri))
            .select(F.col("s_lex").alias("p"))
            .distinct()
        )

    types = triples.filter(F.col("pred") == RDF_TYPE).select(
        F.col("s_lex").alias("x"), F.col("o_lex").alias("cls")
    ).distinct()
    # restrict the type scan to disjoint-mentioned classes BEFORE the
    # subject self-join (the axiom side broadcasts)
    dj_types = types.join(
        F.broadcast(dj.select(F.col("c1").alias("cls")).distinct()), "cls", "left_semi"
    )
    cax_dw = (
        dj_types.alias("a")
        .join(dj_types.alias("b"), F.col("a.x") == F.col("b.x"))
        .join(
            F.broadcast(dj),
            (F.col("a.cls") == F.col("c1")) & (F.col("b.cls") == F.col("c2")),
            "left_semi",
        )
        .filter(F.col("a.cls") < F.col("b.cls"))
        .select(
            F.lit("cax-dw").alias("rule"), F.col("a.x").alias("node"),
            F.col("a.cls").alias("detail_a"), F.col("b.cls").alias("detail_b"),
        )
    )

    edges = triples.select(
        F.col("s_lex").alias("x"), F.col("pred").alias("p"), F.col("o_lex").alias("y"),
        F.col("s_kind"), F.col("o_kind"), F.col("o_dtype"), F.col("o_lang"),
    )
    irr = edges.join(F.broadcast(_props_of(IRREFLEXIVE)), "p", "left_semi").filter(
        (F.col("s_kind") == F.col("o_kind")) & (F.col("x") == F.col("y"))
    ).select(
        F.lit("prp-irp").alias("rule"), F.col("x").alias("node"),
        F.col("p").alias("detail_a"), F.col("y").alias("detail_b"),
    )

    # carry term kinds through the self-joins so only IDENTICAL RDF terms
    # clash — a literal object whose lexical form equals an IRI must not
    # match it (subjects are never literals, so kind equality on the
    # crossed x↔y comparisons is exact: both sides are then IRI/bnode,
    # where dtype/lang are null by construction)
    asy_edges = edges.join(F.broadcast(_props_of(ASYMMETRIC)), "p", "left_semi").select(
        "x", "p", "y", "s_kind", "o_kind"
    )
    asy = (
        asy_edges.alias("a")
        .join(
            asy_edges.alias("b"),
            (F.col("a.p") == F.col("b.p"))
            & (F.col("a.x") == F.col("b.y")) & (F.col("a.s_kind") == F.col("b.o_kind"))
            & (F.col("a.y") == F.col("b.x")) & (F.col("a.o_kind") == F.col("b.s_kind")),
        )
        .filter(F.col("a.x") < F.col("a.y"))
        .select(
            F.lit("prp-asyp").alias("rule"), F.col("a.x").alias("node"),
            F.col("a.p").alias("detail_a"), F.col("a.y").alias("detail_b"),
        )
    )

    # object↔object comparison here, so literals CAN meet literals: the
    # full term identity is (kind, lex, dtype, lang) — eqNullSafe on
    # dtype/lang keeps "5"^^xsd:int vs "5"^^xsd:string and "a"@en vs
    # "a"@de apart while plain↔plain (both null) still matches
    pdw_edges = edges.join(
        F.broadcast(pdw.select(F.col("p1").alias("p")).distinct()), "p", "left_semi"
    ).select("x", "p", "y", "s_kind", "o_kind", "o_dtype", "o_lang")
    pdw_v = (
        pdw_edges.alias("a")
        .join(
            pdw_edges.alias("b"),
            (F.col("a.x") == F.col("b.x")) & (F.col("a.s_kind") == F.col("b.s_kind"))
            & (F.col("a.y") == F.col("b.y")) & (F.col("a.o_kind") == F.col("b.o_kind"))
            & F.col("a.o_dtype").eqNullSafe(F.col("b.o_dtype"))
            & F.col("a.o_lang").eqNullSafe(F.col("b.o_lang")),
        )
        .join(
            F.broadcast(pdw),
            (F.col("a.p") == F.col("p1")) & (F.col("b.p") == F.col("p2")),
            "left_semi",
        )
        .filter(F.col("a.p") < F.col("b.p"))
        .select(
            F.lit("prp-pdw").alias("rule"), F.col("a.x").alias("node"),
            F.concat(F.col("a.p"), F.lit(" "), F.col("b.p")).alias("detail_a"),
            F.col("a.y").alias("detail_b"),
        )
    )

    return cax_dw.unionByName(irr).unionByName(asy).unionByName(pdw_v).distinct()
