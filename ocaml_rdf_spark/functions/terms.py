"""Term-struct Column helpers: the Spark realization of the reference's
SPARQL value lattice (rdf_dt.ml :: value, SURVEY §1.1).

A variable binding is a Column of TERM_STRUCT (kind, lex, dtype, lang);
NULL struct = unbound. The lattice's lazy coercions (to_int/to_float/
to_bool/to_datetime) become try_cast-derived Columns; the lattice's `Err`
value maps to SQL NULL (documented deviation, SURVEY §2.8 / R4) — which
composes correctly with FILTER's errors⇒drop rule because NULL is not true.

Everything here stays inside whole-stage codegen: CreateNamedStruct +
GetStructField chains are collapsed by Catalyst's SimplifyExtractValueOps,
so building intermediate structs is free after optimization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..types import (
    KIND_BNODE,
    KIND_IRI,
    KIND_LITERAL,
    NUMERIC_DTYPES,
    RDF_LANGSTRING,
    XSD_BOOLEAN,
    XSD_DATETIME,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_FLOAT as _XSD_FLOAT,
    XSD_INTEGER,
    XSD_STRING,
    BNode,
    Iri,
    Literal,
    Term,
)

def _null_s() -> Column:
    return F.lit(None).cast("string")


def mk_term(kind: Column, lex: Column, dtype: Column | None = None, lang: Column | None = None) -> Column:
    return F.struct(
        kind.cast("tinyint").alias("kind"),
        lex.cast("string").alias("lex"),
        (dtype if dtype is not None else _null_s()).cast("string").alias("dtype"),
        (lang if lang is not None else _null_s()).cast("string").alias("lang"),
    )


def null_term() -> Column:
    """Unbound / error (Rdf_dt.Err ≈ NULL struct)."""
    return F.lit(None).cast("struct<kind:tinyint,lex:string,dtype:string,lang:string>")


def t_iri(lex: Column | str) -> Column:
    lex = F.lit(lex) if isinstance(lex, str) else lex
    return F.when(lex.isNotNull(), mk_term(F.lit(KIND_IRI), lex)).otherwise(null_term())


def t_bnode(lex: Column | str) -> Column:
    lex = F.lit(lex) if isinstance(lex, str) else lex
    return F.when(lex.isNotNull(), mk_term(F.lit(KIND_BNODE), lex)).otherwise(null_term())


def t_string(lex: Column | str) -> Column:
    lex = F.lit(lex) if isinstance(lex, str) else lex
    return F.when(lex.isNotNull(), mk_term(F.lit(KIND_LITERAL), lex, F.lit(XSD_STRING))).otherwise(null_term())


def t_typed(lex: Column, dtype: Column | str) -> Column:
    dtype = F.lit(dtype) if isinstance(dtype, str) else dtype
    return F.when(
        lex.isNotNull() & dtype.isNotNull(), mk_term(F.lit(KIND_LITERAL), lex, dtype)
    ).otherwise(null_term())


def t_lang(lex: Column, lang: Column) -> Column:
    return F.when(
        lex.isNotNull() & lang.isNotNull(),
        mk_term(F.lit(KIND_LITERAL), lex, F.lit(RDF_LANGSTRING), lang),
    ).otherwise(null_term())


def t_bool(c: Column) -> Column:
    """boolean Column → xsd:boolean term; NULL (error) propagates."""
    return F.when(
        c.isNotNull(),
        mk_term(F.lit(KIND_LITERAL), F.when(c, "true").otherwise("false"), F.lit(XSD_BOOLEAN)),
    ).otherwise(null_term())


def t_int(c: Column) -> Column:
    return F.when(c.isNotNull(), mk_term(F.lit(KIND_LITERAL), c.cast("long").cast("string"), F.lit(XSD_INTEGER))).otherwise(null_term())


def t_double(c: Column) -> Column:
    return F.when(c.isNotNull(), mk_term(F.lit(KIND_LITERAL), c.cast("double").cast("string"), F.lit(XSD_DOUBLE))).otherwise(null_term())


def term_lit(t: Term) -> Column:
    """A constant Term → literal term-struct Column."""
    from ..types import KIND_TRIPLE, QuotedTriple

    if isinstance(t, Iri):
        return t_iri(t.value)
    if isinstance(t, BNode):
        return t_bnode(t.label)
    if isinstance(t, QuotedTriple):
        return mk_term(F.lit(KIND_TRIPLE), F.lit(t.encode()))
    assert isinstance(t, Literal)
    if t.lang:
        return t_lang(F.lit(t.lexical), F.lit(t.lang))
    return t_typed(F.lit(t.lexical), t.dtype or XSD_STRING)


# ---------------------------------------------------------------------------
# RDF-star quoted-triple kernels (types.QuotedTriple encoding: components
# split on QT_SEP, fields on QT_FSEP — raw lexicals, exact splits)
# ---------------------------------------------------------------------------


def _qt_field_col(t: Column) -> Column:
    from ..types import QT_FSEP

    return F.concat_ws(
        QT_FSEP,
        t["kind"].cast("string"),
        t["lex"],
        F.coalesce(t["dtype"], F.lit("")),
        F.coalesce(t["lang"], F.lit("")),
    )


def t_quoted(s: Column, p: Column, o: Column) -> Column:
    """TRIPLE(s, p, o) — SPARQL-star constructor. Errors (NULL) on: any
    NULL argument, literal/quoted subject, non-IRI predicate, quoted
    object (v1 single-level), or separator chars in a literal lexical."""
    from ..types import KIND_TRIPLE, QT_FSEP, QT_SEP

    def clean(t: Column) -> Column:
        return (t["kind"] != KIND_LITERAL) | (
            ~t["lex"].contains(QT_SEP) & ~t["lex"].contains(QT_FSEP)
        )

    ok = (
        s.isNotNull() & p.isNotNull() & o.isNotNull()
        & s["kind"].isin(KIND_IRI, KIND_BNODE)
        & (p["kind"] == KIND_IRI)
        & (o["kind"] != KIND_TRIPLE)
        & clean(o)
    )
    enc = F.concat_ws(QT_SEP, _qt_field_col(s), _qt_field_col(p), _qt_field_col(o))
    return F.when(ok, mk_term(F.lit(KIND_TRIPLE), enc)).otherwise(null_term())


def qt_component(t: Column, i: int) -> Column:
    """SUBJECT/PREDICATE/OBJECT(t) for i=1/2/3 — error (NULL) unless t is
    a quoted triple."""
    from ..types import KIND_TRIPLE, QT_FSEP, QT_SEP

    fields = F.split(F.element_at(F.split(t["lex"], QT_SEP), i), QT_FSEP)
    out = mk_term(
        F.element_at(fields, 1).cast("tinyint"),
        F.element_at(fields, 2),
        F.nullif(F.element_at(fields, 3), F.lit("")),
        F.nullif(F.element_at(fields, 4), F.lit("")),
    )
    return F.when(t.isNotNull() & (t["kind"] == KIND_TRIPLE), out).otherwise(null_term())


def is_triple(t: Column) -> Column:
    from ..types import KIND_TRIPLE

    return F.when(t.isNotNull(), t["kind"] == KIND_TRIPLE).otherwise(F.lit(None).cast("boolean"))


# ---------------------------------------------------------------------------
# lattice accessors / coercions (rdf_dt.ml :: to_int/to_float/to_bool/...)
# ---------------------------------------------------------------------------


def kind(t: Column) -> Column:
    return t["kind"]


def lex(t: Column) -> Column:
    return t["lex"]


def dtype(t: Column) -> Column:
    return t["dtype"]


def lang(t: Column) -> Column:
    return t["lang"]


def is_iri(t: Column) -> Column:
    return t["kind"] == KIND_IRI


def is_blank(t: Column) -> Column:
    return t["kind"] == KIND_BNODE


def is_literal(t: Column) -> Column:
    return t["kind"] == KIND_LITERAL


def is_numeric_dtype(t: Column) -> Column:
    return t["dtype"].isin(*NUMERIC_DTYPES)


def num(t: Column) -> Column:
    """Numeric value or NULL (xsd numeric tower collapsed to double; the
    reference's promotion lattice int<decimal<float<double ends at double
    for every mixed-type comparison anyway)."""
    return F.when(is_numeric_dtype(t), t["lex"].try_cast("double")).otherwise(F.lit(None).cast("double"))


#: exact branch of the numeric tower (rdf_dt.ml keeps decimals exact —
#: everything here is integer/decimal, never float/double)
EXACT_DTYPES = tuple(d for d in NUMERIC_DTYPES if d not in (XSD_DOUBLE, _XSD_FLOAT))

#: working decimal type for exact aggregation: 6 fractional digits covers
#: xsd:decimal lexicals in practice; 32 integral digits ≫ 2^63
DEC_T = "decimal(38,6)"


#: lexical does NOT round-trip through decimal(38,6): a nonzero digit past
#: the 6th fractional place (Spark's cast ROUNDS rather than nulls, which
#: would silently corrupt the "exact" tier — e.g. "0.0000001" → 0.000000)
_INEXACT_LEX = r"\.\d{6}\d*[1-9]"


def dec(t: Column) -> Column:
    """Exact numeric value as decimal(38,6), NULL when the term is not an
    exact-tower literal, its lexical doesn't parse as a decimal, or the
    lexical wouldn't round-trip at scale 6 (those fall back to the double
    tier in _arith — approximate beats silently-rounded-but-labeled-exact)."""
    fits = t["dtype"].isin(*EXACT_DTYPES) & ~t["lex"].rlike(_INEXACT_LEX)
    return F.when(fits, t["lex"].try_cast(DEC_T)).otherwise(F.lit(None).cast(DEC_T))


def dec_canon(c: Column) -> Column:
    """decimal Column → canonical xsd:decimal lexical: no trailing
    fractional zeros; integral values print without '.0' (XSD 1.1
    decimalCanonicalMap, same rule as builtins._arith division)."""
    s = c.cast("string")
    s = F.regexp_replace(s, r"^(-?\d+)\.0*$", "$1")
    return F.regexp_replace(s, r"(\.\d*?)0+$", "$1")


def t_decimal(c: Column) -> Column:
    return F.when(
        c.isNotNull(), mk_term(F.lit(KIND_LITERAL), dec_canon(c), F.lit(XSD_DECIMAL))
    ).otherwise(null_term())


def t_int_exact(c: Column) -> Column:
    """Integer term from a decimal Column — exact lexical beyond 2^53
    (never routes through double/long)."""
    return F.when(
        c.isNotNull(),
        mk_term(F.lit(KIND_LITERAL), c.cast("decimal(38,0)").cast("string"), F.lit(XSD_INTEGER)),
    ).otherwise(null_term())


def num_strict(t: Column) -> Column:
    """Numeric value, also accepting plain-string lexical numbers is NOT
    done (spec: untyped strings are not numbers)."""
    return num(t)


def boolv(t: Column) -> Column:
    return F.when(t["dtype"] == XSD_BOOLEAN, t["lex"].try_cast("boolean")).otherwise(F.lit(None).cast("boolean"))


def ts(t: Column) -> Column:
    """xsd:dateTime or xsd:date literal → timestamp (rdf_dt.ml ::
    to_datetime; date lexicals parse as midnight)."""
    from ..types import XSD_NS

    return F.when(
        t["dtype"].isin(XSD_DATETIME, XSD_NS + "date"), t["lex"].try_cast("timestamp")
    ).otherwise(F.lit(None).cast("timestamp"))


def is_simple_string(t: Column) -> Column:
    return (t["kind"] == KIND_LITERAL) & t["dtype"].isin(XSD_STRING) & t["lang"].isNull()


def is_stringish(t: Column) -> Column:
    return (t["kind"] == KIND_LITERAL) & (t["dtype"].isin(XSD_STRING, RDF_LANGSTRING))


# ---------------------------------------------------------------------------
# effective boolean value (spec §17.2.2; rdf_sparql_eval.ml :: ebv)
# ---------------------------------------------------------------------------


def ebv(t: Column) -> Column:
    """EBV as boolean Column; NULL = type error (FILTER drops it)."""
    return (
        F.when(t.isNull(), F.lit(None).cast("boolean"))
        .when(t["kind"] != KIND_LITERAL, F.lit(None).cast("boolean"))
        .when(t["dtype"] == XSD_BOOLEAN, F.coalesce(t["lex"].try_cast("boolean"), F.lit(False)))
        .when(is_numeric_dtype(t), F.coalesce(t["lex"].try_cast("double") != 0.0, F.lit(False)))
        .when(t["dtype"].isin(XSD_STRING, RDF_LANGSTRING), F.length(t["lex"]) > 0)
        .otherwise(F.lit(None).cast("boolean"))
    )


# ---------------------------------------------------------------------------
# SPARQL total order for ORDER BY (spec §15.1; eval :: sort_solutions):
# unbound < blank < IRI < literal; literals by numeric value when numeric,
# then datetime, then string value. Synthesized as ONE sortable struct so
# Spark's native sort (and TakeOrderedAndProject for LIMIT) applies.
# ---------------------------------------------------------------------------


def sort_key(t: Column) -> Column:
    from ..types import KIND_TRIPLE

    kind_rank = (
        F.when(t.isNull(), 0)
        .when(t["kind"] == KIND_BNODE, 1)
        .when(t["kind"] == KIND_IRI, 2)
        .when(t["kind"] == KIND_TRIPLE, 4)  # triple terms order after literals
        .otherwise(3)
    )
    return F.struct(
        kind_rank.alias("r"),
        num(t).alias("n"),
        ts(t).cast("double").alias("t"),
        t["lex"].alias("s"),
        t["lang"].alias("lg"),
    )
