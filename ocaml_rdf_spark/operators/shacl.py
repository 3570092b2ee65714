"""SHACL-lite validation — the constraint layer of a KG pipeline
(W3C SHACL core, the subset that covers most real shape graphs):
per-(targetClass, path) property shapes with

  minCount / maxCount        cardinality over each focus node
  datatype                   every value a literal of the given datatype
  class                      every value an instance of the given class
  nodeKind                   sh:IRI | sh:Literal | sh:BlankNode

Output is a violation report table (focus, shape_id, constraint,
detail), empty = conforms — the distributed analogue of a SHACL
engine's sh:ValidationReport.

Scale design: one pass per constraint family, all joins keyed on the
focus/value columns with the (tiny) shape table BROADCAST:
- targeting is a semi-join of rdf:type rows against the shape's class;
- cardinality is a per-(focus, shape) count with map-side combine —
  minCount violations come from a LEFT anti/left join (absent focus =
  count 0), maxCount from a filter on the same aggregate;
- datatype/nodeKind are scan-local predicates on the value rows;
- class constraints semi-join values against typed instances.
No fixpoints, no per-row Python; the report is itself a DataFrame that
can be committed as a pipeline stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..types import RDF_TYPE

#: shape table schema (one row per property shape):
#: shape_id string, target_class string, path string,
#: min_count int?, max_count int?, datatype string?, cls string?,
#: node_kind string? ('IRI' | 'Literal' | 'BlankNode')
SHAPES_SCHEMA = (
    "shape_id string, target_class string, path string, min_count int, "
    "max_count int, datatype string, cls string, node_kind string"
)

_KIND_OF = {"IRI": 0, "BlankNode": 1, "Literal": 2}


def validate(triples: DataFrame, shapes: DataFrame) -> DataFrame:
    """→ violations (focus, shape_id, constraint, detail). Empty ⇒ the
    data graph conforms to every shape."""
    b_shapes = F.broadcast(shapes)

    # focus nodes: instances of each shape's target class
    focus = (
        triples.filter(F.col("pred") == RDF_TYPE)
        .select(F.col("s_kind").alias("f_kind"), F.col("s_lex").alias("focus"), F.col("o_lex").alias("target_class"))
        .join(b_shapes, "target_class")
    )

    # value rows per (focus, shape): the shape path's statements
    vals = focus.join(
        triples.select(
            F.col("s_kind").alias("f_kind"), F.col("s_lex").alias("focus"),
            F.col("pred").alias("path"), F.col("o_kind"), F.col("o_lex"), F.col("o_dtype"),
        ),
        ["f_kind", "focus", "path"],
        "left",
    )

    reports = []

    # cardinality: count value rows per focus+shape (0 when the left join
    # found none — o_kind NULL marks the miss)
    counts = vals.groupBy("focus", "shape_id", "min_count", "max_count").agg(
        F.sum(F.when(F.col("o_kind").isNotNull(), 1).otherwise(0)).alias("n")
    )
    reports.append(
        counts.filter(F.col("min_count").isNotNull() & (F.col("n") < F.col("min_count"))).select(
            "focus", "shape_id", F.lit("minCount").alias("constraint"),
            F.concat(F.lit("found "), F.col("n").cast("string"), F.lit(" < "), F.col("min_count").cast("string")).alias("detail"),
        )
    )
    reports.append(
        counts.filter(F.col("max_count").isNotNull() & (F.col("n") > F.col("max_count"))).select(
            "focus", "shape_id", F.lit("maxCount").alias("constraint"),
            F.concat(F.lit("found "), F.col("n").cast("string"), F.lit(" > "), F.col("max_count").cast("string")).alias("detail"),
        )
    )

    present = vals.filter(F.col("o_kind").isNotNull())

    # datatype: every value a literal of the given datatype
    reports.append(
        present.filter(
            F.col("datatype").isNotNull()
            & ((F.col("o_kind") != 2) | (F.col("o_dtype") != F.col("datatype")))
        ).select(
            "focus", "shape_id", F.lit("datatype").alias("constraint"),
            F.concat(F.lit("value "), F.col("o_lex")).alias("detail"),
        ).distinct()
    )

    # nodeKind
    kind_expr = F.create_map(
        *[x for k, v in _KIND_OF.items() for x in (F.lit(k), F.lit(v))]
    )[F.col("node_kind")]
    reports.append(
        present.filter(F.col("node_kind").isNotNull() & (F.col("o_kind") != kind_expr)).select(
            "focus", "shape_id", F.lit("nodeKind").alias("constraint"),
            F.concat(F.lit("value "), F.col("o_lex")).alias("detail"),
        ).distinct()
    )

    # class: every value typed with the constraint class (semi-join the
    # typed-instance set; violations = anti side)
    typed = triples.filter(F.col("pred") == RDF_TYPE).select(
        F.col("s_kind").alias("o_kind"), F.col("s_lex").alias("o_lex"), F.col("o_lex").alias("cls")
    ).distinct()
    cls_vals = present.filter(F.col("cls").isNotNull())
    reports.append(
        cls_vals.join(typed, ["o_kind", "o_lex", "cls"], "left_anti").select(
            "focus", "shape_id", F.lit("class").alias("constraint"),
            F.concat(F.lit("value "), F.col("o_lex"), F.lit(" not a "), F.col("cls")).alias("detail"),
        ).distinct()
    )

    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def validate_sparql(quads: DataFrame, constraints) -> DataFrame:
    """SHACL-SPARQL constraint components (W3C SHACL §5, sh:sparql): each
    constraint carries a SELECT query whose RESULT ROWS are the
    violations — the projected `?this` variable is the focus node (the
    spec's convention). → the same report table as `validate`:
    (focus, shape_id, constraint='sparql', detail), where detail is the
    shape's sh:message, plus ': <value lexical>' when the query also
    projects `?value`.

    `constraints` is a list of (shape_id, message, select_query_text)
    triples. Deviation from the spec's full machinery, documented: the
    TARGETING lives inside each query (`?this a ex:C . FILTER …`) instead
    of $this pre-binding — every target selector is expressible that way,
    and it lets the constraint run as ONE distributed query instead of a
    per-focus loop.

    This dogfoods the engine: the queries compile through the same
    lex→parse→algebra→DataFrame path as user SPARQL (EP1), so constraint
    checking inherits every optimization the query layer has (pushed
    predicate scans, hash anti joins for NOT EXISTS) and runs at the same
    100 TB scale as any other query — a validation pass is a union of N
    SELECTs, nothing per-row."""
    from ..algebra import Ctx, flatten
    from ..sparql import execute

    ctx = Ctx(quads)
    reports = []
    for shape_id, message, query in constraints:
        df = flatten(execute(query, ctx))
        if "this" not in df.columns:
            raise ValueError(f"sh:sparql constraint {shape_id!r} must project ?this")
        detail = (
            F.concat(F.lit(message), F.lit(": "), F.col("value").cast("string"))
            if "value" in df.columns
            else F.lit(message)
        )
        reports.append(
            df.select(
                F.col("this").alias("focus"),
                F.lit(shape_id).alias("shape_id"),
                F.lit("sparql").alias("constraint"),
                detail.alias("detail"),
            ).distinct()
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def infer_shapes(quads: DataFrame, min_instances: int = 1) -> DataFrame:
    """Shape INDUCTION — mine the property shapes the data actually
    satisfies (the inverse of `validate`; ShapeDesigner/SheXer family):
    for every (rdf:type class, predicate) pair, the observed cardinality
    envelope and value profile →

      (target_class, path, n_instances, n_with, min_count, max_count,
       node_kind, datatype, opt)

    `n_instances` counts the class's typed instances, `n_with` those
    having ≥1 `path` triple; min_count/max_count are the per-instance
    triple-count envelope over instances that HAVE the predicate;
    `node_kind` is 'IRI'/'Literal'/'BlankNode' or '(mixed)';
    `datatype` the single literal datatype or '(mixed)' (''
    for non-literal paths); `opt` = 1 when some instance lacks the
    predicate (the mined minCount is 0). Feeding the output's
    non-optional rows straight back into `validate` must report zero
    violations on the mining corpus — the induction/validation
    round-trip (tested).

    Scale: one entity-keyed hash join (instance rows × type rows), one
    (class, path, subject)-keyed count with map-side combine, one
    (class, path) rollup — reduce side is catalog-sized. Multi-typed
    subjects contribute to each of their classes (standard)."""
    types = quads.filter(F.col("pred") == RDF_TYPE).select(
        F.col("s_lex").alias("ent"), F.col("o_lex").alias("cls")
    ).dropDuplicates()
    n_inst = types.groupBy("cls").agg(F.count(F.lit(1)).alias("n_instances"))
    vals = quads.filter(F.col("pred") != RDF_TYPE).select(
        F.col("s_lex").alias("ent"), F.col("pred").alias("path"), "o_kind", "o_dtype"
    )
    per_subj = (
        vals.join(types, "ent")
        .groupBy("cls", "path", "ent")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("o_kind").alias("k_min"),
            F.max("o_kind").alias("k_max"),
            F.min(F.coalesce("o_dtype", F.lit(""))).alias("d_min"),
            F.max(F.coalesce("o_dtype", F.lit(""))).alias("d_max"),
        )
    )
    prof = per_subj.groupBy("cls", "path").agg(
        F.count(F.lit(1)).alias("n_with"),
        F.min("cnt").alias("min_count"),
        F.max("cnt").alias("max_count"),
        F.min("k_min").alias("kmin"),
        F.max("k_max").alias("kmax"),
        F.min("d_min").alias("dmin"),
        F.max("d_max").alias("dmax"),
    )
    kind = (
        F.when(F.col("kmin") != F.col("kmax"), F.lit("(mixed)"))
        .when(F.col("kmin") == 0, F.lit("IRI"))
        .when(F.col("kmin") == 1, F.lit("BlankNode"))
        .otherwise(F.lit("Literal"))
    )
    dtype = F.when(F.col("kmax") != 2, F.lit("")).when(
        F.col("dmin") != F.col("dmax"), F.lit("(mixed)")
    ).otherwise(F.col("dmin"))
    return (
        prof.join(F.broadcast(n_inst), "cls")
        .filter(F.col("n_instances") >= int(min_instances))
        .select(
            F.col("cls").alias("target_class"),
            "path",
            F.col("n_instances").cast("long").alias("n_instances"),
            F.col("n_with").cast("long").alias("n_with"),
            F.col("min_count").cast("long").alias("min_count"),
            F.col("max_count").cast("long").alias("max_count"),
            kind.alias("node_kind"),
            dtype.alias("datatype"),
            (F.col("n_with") < F.col("n_instances")).cast("int").alias("opt"),
        )
    )


def validate_closed(
    triples: DataFrame,
    shapes: DataFrame,
    ignored: tuple = (RDF_TYPE,),
) -> DataFrame:
    """sh:closed (W3C SHACL §4.8.1): a closed shape's focus nodes may
    carry ONLY the predicates its property shapes declare (plus
    `ignored` — sh:ignoredProperties; rdf:type by default, since
    targeting itself uses it). Every shape in the `shapes` frame passed
    here is treated as closed; open shapes simply aren't passed.

    → the same report table as `validate`: one (focus, shape_id,
    'closed', 'unexpected <pred>') row per distinct offending
    (focus, pred). Typical use unions this onto `validate`'s report —
    the suite query does exactly that, so the full core + closed report
    stays one DataFrame.

    Scale shape: focus targeting is the audited rdf:type semi-join with
    the shape table broadcast; the allowed-path check is a broadcast
    hash ANTI join of the focus nodes' outgoing arcs against the
    (shape, path) list — shapes are ontology-sized, so the data graph
    pays one scan + one broadcast anti join, never a shuffle keyed on
    anything but its own subjects."""
    b_shapes = F.broadcast(shapes.select("shape_id", "target_class").distinct())
    allowed = F.broadcast(
        shapes.select("shape_id", "path").distinct()
    )
    focus = (
        triples.filter(F.col("pred") == RDF_TYPE)
        .select(
            F.col("s_kind").alias("f_kind"),
            F.col("s_lex").alias("focus"),
            F.col("o_lex").alias("target_class"),
        )
        .join(b_shapes, "target_class")
        .select("f_kind", "focus", "shape_id")
        .distinct()
    )
    arcs = triples.filter(~F.col("pred").isin(*ignored)).select(
        F.col("s_kind").alias("f_kind"), F.col("s_lex").alias("focus"),
        F.col("pred").alias("path"),
    )
    offending = (
        focus.join(arcs, ["f_kind", "focus"])
        .join(allowed, ["shape_id", "path"], "left_anti")
        .select(
            "focus", "shape_id", F.lit("closed").alias("constraint"),
            F.concat(F.lit("unexpected "), F.col("path")).alias("detail"),
        )
        .distinct()
    )
    return offending


#: pair-constraint shape table (one row per property-pair shape):
#: shape_id, target_class, path, path2, op ('equals' | 'disjoint' |
#: 'lessThan' | 'lessThanOrEquals')
PAIR_SHAPES_SCHEMA = (
    "shape_id string, target_class string, path string, path2 string, op string"
)

_NUMERIC_DT = [
    "http://www.w3.org/2001/XMLSchema#integer",
    "http://www.w3.org/2001/XMLSchema#decimal",
    "http://www.w3.org/2001/XMLSchema#double",
    "http://www.w3.org/2001/XMLSchema#float",
    "http://www.w3.org/2001/XMLSchema#long",
    "http://www.w3.org/2001/XMLSchema#int",
]


def validate_pairs(triples: DataFrame, shapes: DataFrame) -> DataFrame:
    """Property-pair constraint components (W3C SHACL §4.4): sh:equals,
    sh:disjoint, sh:lessThan, sh:lessThanOrEquals between the value sets
    of two predicates on each focus node.

    Pinned comparison semantics for the order ops (§4.4.3 delegates to
    SPARQL '<'): when BOTH values are literals with numeric datatypes the
    comparison is numeric (decimal(38,6) cast); otherwise it is lexical
    string comparison — which is also the correct order for xsd:date /
    xsd:dateTime canonical forms. Pair ops over mixed IRI/literal values
    compare on the lexical form.

    → the standard report table (focus, shape_id, constraint, detail).

    Scale shape: targeting = the broadcast rdf:type semi-join; each op
    joins the TWO value-row sets of one focus node on (focus, shape) —
    per-focus value sets are property-cardinality-sized (single digits),
    so the pair join is |focus|-bounded, hash-partitioned on the focus
    key, never a corpus cross product. equals/disjoint join on full value
    identity; the order ops join per focus and filter the comparison."""
    b_shapes = F.broadcast(shapes)
    focus = (
        triples.filter(F.col("pred") == RDF_TYPE)
        .select(
            F.col("s_kind").alias("f_kind"), F.col("s_lex").alias("focus"),
            F.col("o_lex").alias("target_class"),
        )
        .join(b_shapes, "target_class")
        .select("f_kind", "focus", "shape_id", "path", "path2", "op")
        .distinct()
    )

    # Only arcs whose predicate is some shape's path/path2 can ever join —
    # the side() equi-joins already guarantee it. Making the restriction a
    # broadcast semi-join BEFORE the focus joins means the corpus-sized
    # exchange carries only shape-relevant predicates (the POS store prunes
    # to those predicate clusters), not the whole store.
    shape_preds = (
        shapes.select(F.col("path").alias("pred"))
        .unionByName(shapes.select(F.col("path2").alias("pred")))
        .distinct()
    )
    relevant = triples.join(F.broadcast(shape_preds), "pred", "left_semi")

    def side(path_col: str, prefix: str) -> DataFrame:
        return (
            focus.join(
                relevant.select(
                    F.col("s_kind").alias("f_kind"), F.col("s_lex").alias("focus"),
                    F.col("pred").alias(path_col), F.col("o_kind").alias(f"{prefix}_kind"),
                    F.col("o_lex").alias(f"{prefix}_lex"), F.col("o_dtype").alias(f"{prefix}_dtype"),
                ),
                ["f_kind", "focus", path_col],
                "inner",
            )
        )

    # NOTE (perf, probed at sf0.1): the four report legs consume v1/v2 up
    # to 4x each, but interposing localCheckpoint barriers here measured
    # SLOWER warm (8.1s vs 7.0s median, interleaved A/B) — AQE exchange
    # reuse already dedupes the repeated store-union legs, and the barrier
    # only adds materialization + kills stage overlap. Keep the pure plan.
    v1, v2 = side("path", "a"), side("path2", "b")
    key = ["f_kind", "focus", "shape_id", "op"]

    # equals: report every value of path absent from path2's value set,
    # and every value of path2 absent from path's (both directions, §4.4.1)
    eq1 = (
        v1.filter(F.col("op") == "equals")
        .join(
            v2.select(*key, F.col("b_kind").alias("a_kind"),
                      F.col("b_lex").alias("a_lex"), F.col("b_dtype").alias("a_dtype")),
            key + ["a_kind", "a_lex", "a_dtype"], "left_anti",
        )
        .select("focus", "shape_id", F.lit("equals").alias("constraint"),
                F.concat(F.lit("value "), F.col("a_lex"), F.lit(" missing from "),
                         F.col("path2")).alias("detail"))
    )
    eq2 = (
        v2.filter(F.col("op") == "equals")
        .join(
            v1.select(*key, F.col("a_kind").alias("b_kind"),
                      F.col("a_lex").alias("b_lex"), F.col("a_dtype").alias("b_dtype")),
            key + ["b_kind", "b_lex", "b_dtype"], "left_anti",
        )
        .select("focus", "shape_id", F.lit("equals").alias("constraint"),
                F.concat(F.lit("value "), F.col("b_lex"), F.lit(" missing from "),
                         F.col("path")).alias("detail"))
    )

    # disjoint: violation per value present in BOTH sets
    dis = (
        v1.filter(F.col("op") == "disjoint")
        .join(
            v2.select(*key, F.col("b_kind").alias("a_kind"),
                      F.col("b_lex").alias("a_lex"), F.col("b_dtype").alias("a_dtype")),
            key + ["a_kind", "a_lex", "a_dtype"], "left_semi",
        )
        .select("focus", "shape_id", F.lit("disjoint").alias("constraint"),
                F.concat(F.lit("shared value "), F.col("a_lex")).alias("detail"))
    )

    # lessThan / lessThanOrEquals: per-focus pair join, comparison filtered
    pairs = (
        v1.filter(F.col("op").isin("lessThan", "lessThanOrEquals"))
        .join(v2.select(*key, "b_kind", "b_lex", "b_dtype"), key, "inner")
    )
    num = (
        F.col("a_dtype").isin(_NUMERIC_DT) & F.col("b_dtype").isin(_NUMERIC_DT)
        & (F.col("a_kind") == 2) & (F.col("b_kind") == 2)
    )
    a_num = F.col("a_lex").try_cast("decimal(38,6)")
    b_num = F.col("b_lex").try_cast("decimal(38,6)")
    lt = F.when(num, a_num < b_num).otherwise(F.col("a_lex") < F.col("b_lex"))
    le = F.when(num, a_num <= b_num).otherwise(F.col("a_lex") <= F.col("b_lex"))
    ok = F.when(F.col("op") == "lessThan", lt).otherwise(le)
    order_viol = (
        pairs.filter(~F.coalesce(ok, F.lit(False)))
        .select("focus", "shape_id", F.col("op").alias("constraint"),
                F.concat(F.lit("value "), F.col("a_lex"), F.lit(" !< "),
                         F.col("b_lex")).alias("detail"))
        .distinct()
    )

    return eq1.unionByName(eq2).unionByName(dis).unionByName(order_viol)
