"""W3C Direct Mapping of relational data to RDF (the 2012 W3C
Recommendation "A Direct Mapping of Relational Data to RDF") — the
principled relational→KG ingestion path. The reference ships MySQL /
PostgreSQL storage BACKENDS (`rdf_my.ml`, `rdf_postgresql.ml`, SURVEY
§2.1 — triples stored IN a database); this operator is the other
direction every KG-construction pipeline needs: existing relational
tables become triples, so warehouse facts join the crawl-extracted
graph under one vocabulary. /root/reference is empty (SURVEY §0); the
normative source is the W3C spec itself.

Implemented subset of the Recommendation, pinned:

- row node: IRI `<base><Table>/<pk>=<val>(;<pk2>=<val2>…)` for tables
  with a primary key (spec §2.1 "row node" / IRI-safe form); composite
  keys join with `;`. Values are percent-encoded over the PINNED
  reserved set (space % # / ? & = + — the characters that occur in
  TPC-H-ish data and would break IRI parsing; full RFC-3987 escaping is
  a superset that never changes these cases).
- type arc: `rdf:type <base><Table>`.
- literal arc per non-null column: predicate `<base><Table>#<col>`,
  object a TYPED literal with the datatype derived from the COLUMN TYPE
  (spec §2.3 datatype table): int/bigint → xsd:integer, double/float →
  xsd:double, boolean → xsd:boolean, date → xsd:date, timestamp →
  xsd:dateTime, everything else xsd:string. Lexical forms are the
  engine's canonical CAST-to-string (pinned; the oracle mirrors it).
- foreign-key arc per declared FK: predicate `<base><Table>#ref-<col>`
  pointing at the TARGET row node (spec §2.1 "reference triple");
  NULL FKs emit nothing.

Scale shape: the whole mapping is a constant-width melt — one
`explode` of a per-row literal/ref array built from the STATIC schema
(column list known at plan time, never a data pass), zero joins, zero
shuffles; at 100 TB each table maps in one embarrassingly parallel
scan, and the output unions into the quad store through the ordinary
set-dedup sink."""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Mapping, Optional, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..types import RDF_TYPE

XSD = "http://www.w3.org/2001/XMLSchema#"

#: pinned percent-encoding set for IRI-embedded values (see module doc)
_ENC = [("%", "%25"), (" ", "%20"), ("#", "%23"), ("/", "%2F"),
        ("?", "%3F"), ("&", "%26"), ("=", "%3D"), ("+", "%2B")]


def _enc(col: Column) -> Column:
    out = col.cast("string")
    for raw, esc in _ENC:
        out = F.replace(out, F.lit(raw), F.lit(esc))
    return out


def enc_sql(expr: str) -> str:
    """DuckDB mirror of the pinned percent-encoding (kept adjacent)."""
    out = f"CAST({expr} AS VARCHAR)"
    for raw, esc in _ENC:
        out = f"replace({out}, '{raw}', '{esc}')"
    return out


def _xsd_of(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return XSD + "integer"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return XSD + "double"
    if isinstance(dt, T.BooleanType):
        return XSD + "boolean"
    if isinstance(dt, T.DateType):
        return XSD + "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return XSD + "dateTime"
    return XSD + "string"


def direct_mapping(
    df: DataFrame,
    table: str,
    pk: Sequence[str],
    fks: Optional[Mapping[str, Tuple[str, str]]] = None,
    base: str = "urn:dm:",
) -> DataFrame:
    """Map one relational DataFrame to quads per the W3C Direct Mapping
    subset above. `pk` names the primary-key columns (≥ 1 — keyless
    tables are out of the pinned subset); `fks` maps a local column to
    (target_table, target_pk_column). Returns the standard partial-quad
    frame (s_lex, pred, o_kind, o_lex, o_dtype)."""
    pk = list(pk)
    if not pk:
        raise ValueError("direct_mapping: need >= 1 primary-key column")
    fks = dict(fks or {})
    row_iri = F.concat(
        F.lit(f"{base}{table}/"),
        *sum(
            (
                [F.lit(("" if i == 0 else ";") + c + "="), _enc(F.col(c))]
                for i, c in enumerate(pk)
            ),
            [],
        ),
    )
    arcs = [
        F.struct(
            F.lit(RDF_TYPE).alias("pred"),
            F.lit(0).cast("tinyint").alias("o_kind"),
            F.lit(f"{base}{table}").alias("o_lex"),
            F.lit(None).cast("string").alias("o_dtype"),
        )
    ]
    for field in df.schema.fields:
        c = field.name
        arcs.append(
            F.when(
                F.col(c).isNotNull(),
                F.struct(
                    F.lit(f"{base}{table}#{c}").alias("pred"),
                    F.lit(2).cast("tinyint").alias("o_kind"),
                    F.col(c).cast("string").alias("o_lex"),
                    F.lit(_xsd_of(field.dataType)).alias("o_dtype"),
                ),
            )
        )
    for c, (ttable, tpk) in fks.items():
        arcs.append(
            F.when(
                F.col(c).isNotNull(),
                F.struct(
                    F.lit(f"{base}{table}#ref-{c}").alias("pred"),
                    F.lit(0).cast("tinyint").alias("o_kind"),
                    F.concat(
                        F.lit(f"{base}{ttable}/{tpk}="), _enc(F.col(c))
                    ).alias("o_lex"),
                    F.lit(None).cast("string").alias("o_dtype"),
                ),
            )
        )
    melted = df.select(
        row_iri.alias("s_lex"),
        F.explode(F.array(*arcs)).alias("a"),
    ).filter(F.col("a").isNotNull())
    return melted.select(
        "s_lex", "a.pred", "a.o_kind", "a.o_lex", "a.o_dtype"
    )


# ---------------------------------------------------------------------------
# R2RML-lite: customized relational→RDF mappings (W3C R2RML Recommendation,
# 2012). Where the Direct Mapping above fixes vocabulary and IRI shape from
# the schema, R2RML lets the mapping author pick them: subject IRI templates,
# per-predicate object maps (column / template / constant, typed or
# language-tagged), and referencing object maps that join a child logical
# table to a parent triples map (spec §8). The reference has no relational
# ingestion (SURVEY §2.1 lists MySQL/PostgreSQL as triple STORAGE backends,
# /root/reference is empty per SURVEY §0); the normative source is the spec.
#
# Pinned subset:
# - logical tables are named DataFrames (rr:tableName; no rr:sqlQuery — at
#   this layer a view IS a DataFrame the caller prepares);
# - term maps: rr:template with {col} placeholders (IRI-safe percent-encoding
#   over the same pinned set as the Direct Mapping, spec §7.3 "IRI-safe
#   version"), rr:column, rr:constant; rr:termType IRI or Literal;
#   rr:datatype / rr:language on literal maps (natural datatype from the
#   column type when neither is given, spec §10.2);
# - rows where any referenced column is NULL generate no triple for that
#   term map (spec §10.1);
# - rr:parentTriplesMap + rr:joinCondition: equi-join child→parent, object =
#   the parent's subject IRI (spec §8). Join shape: plain hash equi-join on
#   the join-condition columns; dimension-sized parents broadcast under AQE,
#   fact-fact joins shuffle on the FK — exactly the relational star shape.
#
# Scale shape: everything except referencing object maps is the same
# constant-width melt as the Direct Mapping (one scan, zero shuffles). Each
# referencing object map adds ONE equi-join before its melt arm; at 100 TB
# the parent side is usually a dimension (broadcast) and the child scan
# stays embarrassingly parallel.
# ---------------------------------------------------------------------------

_TPL_RE = re.compile(r"\{([^{}]+)\}")


def _template_col(
    template: str, df: DataFrame, iri_safe: bool = True, qualify: bool = False
) -> Column:
    """rr:template → concat of literal segments and (IRI-safe) column
    refs. Raises KeyError on a placeholder naming a missing column.
    `qualify` resolves refs against `df` itself (disambiguates post-join
    same-named columns, e.g. a self-referencing parent map)."""
    parts = []
    pos = 0
    for m in _TPL_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos:m.start()]))
        name = m.group(1)
        if name not in df.columns:
            raise KeyError(f"r2rml template references unknown column {name!r}")
        ref = df[name] if qualify else F.col(name)
        parts.append(_enc(ref) if iri_safe else ref.cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    return F.concat(*parts) if parts else F.lit("")


def _template_nulls(template: str) -> list:
    return _TPL_RE.findall(template)


@dataclass
class ObjectMap:
    """One rr:predicateObjectMap arm. Exactly one of column / template /
    constant / parent must be set."""

    pred: str
    column: Optional[str] = None
    template: Optional[str] = None
    constant: Optional[str] = None
    #: (parent_map_name, [(child_col, parent_col), ...]) — rr:parentTriplesMap
    parent: Optional[Tuple[str, Sequence[Tuple[str, str]]]] = None
    #: "iri" or "literal"; default: iri for template/parent/constant-IRI,
    #: literal for column (spec §7.4 default term types)
    term_type: Optional[str] = None
    datatype: Optional[str] = None
    language: Optional[str] = None


@dataclass
class TriplesMap:
    """rr:TriplesMap over a named logical table."""

    name: str
    table: str
    subject_template: str
    subject_class: Optional[str] = None
    object_maps: Sequence[ObjectMap] = field(default_factory=tuple)


def r2rml_map(tables: Mapping[str, DataFrame], maps: Sequence[TriplesMap]) -> DataFrame:
    """Execute an R2RML-lite mapping: every TriplesMap melts its logical
    table into (s_lex, pred, o_kind, o_lex, o_dtype, o_lang) partial quads;
    referencing object maps equi-join child→parent first. Output is the
    UNION of all maps (caller routes it through the set-dedup sink)."""
    by_name = {m.name: m for m in maps}
    outs = []
    for tm in maps:
        df = tables[tm.table]
        subj = _template_col(tm.subject_template, df)
        subj_guard = [F.col(c).isNotNull() for c in _template_nulls(tm.subject_template)]

        def lit_struct(pred, o_kind, o_lex, o_dtype, o_lang, guards):
            s = F.struct(
                F.lit(pred).alias("pred"),
                F.lit(o_kind).cast("tinyint").alias("o_kind"),
                o_lex.alias("o_lex"),
                (F.lit(o_dtype) if isinstance(o_dtype, (str, type(None))) else o_dtype)
                .cast("string")
                .alias("o_dtype"),
                F.lit(o_lang).cast("string").alias("o_lang"),
            )
            cond = None
            for g in guards:
                cond = g if cond is None else (cond & g)
            return F.when(cond, s) if cond is not None else s

        arcs = []
        if tm.subject_class:
            arcs.append(lit_struct(RDF_TYPE, 0, F.lit(tm.subject_class), None, None, []))
        join_arms = []  # (ObjectMap) — referencing maps handled separately
        for om in tm.object_maps:
            set_n = sum(x is not None for x in (om.column, om.template, om.constant, om.parent))
            if set_n != 1:
                raise ValueError(f"ObjectMap for {om.pred}: exactly one source required")
            if om.parent is not None:
                join_arms.append(om)
                continue
            if om.constant is not None:
                tt = om.term_type or "iri"
                if tt == "iri":
                    arcs.append(lit_struct(om.pred, 0, F.lit(om.constant), None, None, []))
                else:
                    arcs.append(
                        lit_struct(
                            om.pred, 2, F.lit(om.constant),
                            None if om.language else (om.datatype or XSD + "string"),
                            om.language, [],
                        )
                    )
            elif om.template is not None:
                tt = om.term_type or "iri"
                guards = [F.col(c).isNotNull() for c in _template_nulls(om.template)]
                val = _template_col(om.template, df, iri_safe=(tt == "iri"))
                if tt == "iri":
                    arcs.append(lit_struct(om.pred, 0, val, None, None, guards))
                else:
                    arcs.append(
                        lit_struct(
                            om.pred, 2, val,
                            None if om.language else (om.datatype or XSD + "string"),
                            om.language, guards,
                        )
                    )
            else:  # column
                fld = {f.name: f for f in df.schema.fields}.get(om.column)
                if fld is None:
                    raise KeyError(f"r2rml column map references unknown column {om.column!r}")
                tt = om.term_type or "literal"
                if tt == "iri":
                    arcs.append(
                        lit_struct(om.pred, 0, F.col(om.column).cast("string"), None, None,
                                   [F.col(om.column).isNotNull()])
                    )
                else:
                    # natural datatype from the column type (spec §10.2)
                    arcs.append(
                        lit_struct(
                            om.pred, 2, F.col(om.column).cast("string"),
                            None if om.language else (om.datatype or _xsd_of(fld.dataType)),
                            om.language, [F.col(om.column).isNotNull()],
                        )
                    )

        base_guard = None
        for g in subj_guard:
            base_guard = g if base_guard is None else (base_guard & g)
        melted = df
        if base_guard is not None:
            melted = melted.filter(base_guard)
        if arcs:
            outs.append(
                melted.select(subj.alias("s_lex"), F.explode(F.array(*arcs)).alias("a"))
                .filter(F.col("a").isNotNull())
                .select("s_lex", "a.pred", "a.o_kind", "a.o_lex", "a.o_dtype", "a.o_lang")
            )

        for om in join_arms:
            pname, conds = om.parent
            ptm = by_name.get(pname)
            if ptm is None:
                raise KeyError(f"rr:parentTriplesMap {pname!r} not among maps")
            pdf = tables[ptm.table]
            pcols = sorted({p for (_c, p) in conds} | set(_template_nulls(ptm.subject_template)))
            parent = pdf.select(*pcols).dropDuplicates([p for (_c, p) in conds])
            cond = None
            child = df if base_guard is None else df.filter(base_guard)
            for (ccol, pcol) in conds:
                piece = child[ccol] == parent[pcol]
                cond = piece if cond is None else (cond & piece)
            joined = child.join(parent, cond, "inner")
            psubj = _template_col(ptm.subject_template, parent, qualify=True)
            csubj = _template_col(tm.subject_template, child, qualify=True)
            outs.append(
                joined.select(
                    csubj.alias("s_lex"),
                    F.lit(om.pred).alias("pred"),
                    F.lit(0).cast("tinyint").alias("o_kind"),
                    psubj.alias("o_lex"),
                    F.lit(None).cast("string").alias("o_dtype"),
                    F.lit(None).cast("string").alias("o_lang"),
                )
            )

    if not outs:
        raise ValueError("r2rml_map: no triples maps produced output")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
