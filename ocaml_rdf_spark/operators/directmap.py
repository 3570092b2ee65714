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
