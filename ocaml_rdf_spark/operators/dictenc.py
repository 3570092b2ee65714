"""Dictionary encoding of RDF terms: id-space execution + late decode.

Every production triple store (RDF-3X §3.1, Jena TDB node table, Virtuoso
IRI_ID) replaces term lexicals with fixed-width integer ids before query
execution: joins then shuffle 8-byte longs instead of ~60-byte IRIs, sort
keys are single words, and row width in every exchange drops ~5-10×. The
reference keeps OCaml term values in memory (`rdf_term.ml`, SURVEY §1.2);
this module is the Spark-scale equivalent of that interning.

Design choices (each load-bearing at 100 TB):

- **Hash ids, not row_number ids.** id = first 60 bits of md5 of the
  term's canonical key. Encoding is therefore MAP-ONLY — no global sort,
  no dictionary join, no driver round-trip — and deterministic across
  partitionings and engines (DuckDB: `('0x'||substr(md5(k),1,15))::BIGINT`
  equals Spark's `conv(substring(md5(k),1,15),16,10)` bit-for-bit).
  A sequence-id dictionary would need a total order over 10^11 distinct
  terms (one giant sort) and makes incremental loads re-number.
- **60 bits, audited.** Birthday bound: collision probability over N
  distinct terms ≈ N²/2^61 — at N = 10^9 terms that is ~0.43, so
  production widens the key to two longs (128-bit md5, same layout);
  the single-long variant here keeps the suite oracle exact while
  `collision_audit` (a groupBy over the dictionary — cheap, runs with
  the build) proves the id space clean for the actual data.
- **Late materialization.** Queries join/filter entirely in id space and
  decode ONLY projected columns at the end — each decode is one join
  against the id-partitioned dictionary, carrying result rows, not
  intermediate rows (RDF-3X §3.2's "dictionary join at the very top").

Term identity follows TRIPLE_KEY: (kind, lex, dtype, lang) — a plain
literal, a typed literal, and an IRI with the same lexical get distinct
ids. The canonical key packs the four fields with US (0x1f) separators,
NULLs as '' (terms never contain control chars post-parse)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"  # ASCII unit separator

#: kinds follow types.py: 0 = IRI, 1 = bnode, 2 = literal
KIND_IRI = 0


def term_key(kind: Column, lex: Column, dtype: Column | None = None, lang: Column | None = None) -> Column:
    """Canonical packed key for a term; NULL dtype/lang normalize to ''."""
    return F.concat_ws(
        SEP,
        kind.cast("int").cast("string"),
        lex,
        F.coalesce(dtype if dtype is not None else F.lit(None).cast("string"), F.lit("")),
        F.coalesce(lang if lang is not None else F.lit(None).cast("string"), F.lit("")),
    )


def term_id(key: Column) -> Column:
    """60-bit id: first 15 hex chars of md5(key) as a long (map-only)."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def iri_id(lex: str | Column) -> Column:
    """Constant-foldable id of an IRI/graph term — for bound patterns."""
    c = F.lit(lex) if isinstance(lex, str) else lex
    return term_id(term_key(F.lit(KIND_IRI), c))


def literal_id(lex: str | Column, dtype: str | None = None, lang: str | None = None) -> Column:
    c = F.lit(lex) if isinstance(lex, str) else lex
    return term_id(term_key(F.lit(2), c, F.lit(dtype), F.lit(lang)))


def _quad_parts(quads: DataFrame) -> tuple[Column, Column]:
    cols = set(quads.columns)
    s_kind = F.col("s_kind").cast("int") if "s_kind" in cols else F.lit(KIND_IRI)
    o_lang = F.col("o_lang") if "o_lang" in cols else F.lit(None).cast("string")
    return s_kind, o_lang


def encode_quads(quads: DataFrame) -> DataFrame:
    """Quad store → (g_id, s_id, p_id, o_id) longs. Map-only: hash ids
    need no dictionary lookup, so encoding pipelines with the scan."""
    s_kind, o_lang = _quad_parts(quads)
    return quads.select(
        term_id(term_key(F.lit(KIND_IRI), F.col("graph"))).alias("g_id"),
        term_id(term_key(s_kind, F.col("s_lex"))).alias("s_id"),
        term_id(term_key(F.lit(KIND_IRI), F.col("pred"))).alias("p_id"),
        term_id(term_key(F.col("o_kind"), F.col("o_lex"), F.col("o_dtype"), o_lang)).alias("o_id"),
    )


def term_dictionary(quads: DataFrame) -> DataFrame:
    """Distinct (id, kind, lex, dtype, lang) over every term position.
    One shuffle (the distinct); at scale this is the id-partitioned node
    table the decode joins probe."""
    s_kind, o_lang = _quad_parts(quads)
    nul = F.lit(None).cast("string")
    parts = [
        quads.select(s_kind.alias("kind"), F.col("s_lex").alias("lex"), nul.alias("dtype"), nul.alias("lang")),
        quads.select(F.lit(KIND_IRI).alias("kind"), F.col("pred").alias("lex"), nul.alias("dtype"), nul.alias("lang")),
        quads.select(F.lit(KIND_IRI).alias("kind"), F.col("graph").alias("lex"), nul.alias("dtype"), nul.alias("lang")),
        quads.select(
            F.col("o_kind").cast("int").alias("kind"),
            F.col("o_lex").alias("lex"),
            F.col("o_dtype").alias("dtype"),
            o_lang.alias("lang"),
        ),
    ]
    terms = parts[0]
    for p in parts[1:]:
        terms = terms.unionByName(p)
    terms = terms.distinct()
    return terms.select(
        term_id(term_key(F.col("kind"), F.col("lex"), F.col("dtype"), F.col("lang"))).alias("id"),
        "kind",
        "lex",
        "dtype",
        "lang",
    )


def decode(df: DataFrame, dictionary: DataFrame, id_col: str, out_col: str) -> DataFrame:
    """Late materialization: join one id column back to its lexical."""
    d = dictionary.select(F.col("id").alias(id_col), F.col("lex").alias(out_col))
    return df.join(d, id_col).drop(id_col)


def collision_audit(dictionary: DataFrame) -> DataFrame:
    """Ids claimed by >1 distinct term — must be empty for the id space
    to be sound (production: widen to 128-bit / two longs)."""
    return (
        dictionary.groupBy("id")
        .agg(
            F.countDistinct(
                term_key(F.col("kind"), F.col("lex"), F.col("dtype"), F.col("lang"))
            ).alias("n_terms")
        )
        .filter(F.col("n_terms") > 1)
    )
