"""Core data model: the TRIPLES DataFrame schema + Python-side term types.

Mirrors the reference's fundamental datum (rdf_term.ml :: term / triple,
SURVEY.md §1.1): a triple is (subject term, predicate IRI, object term);
a dataset tags each triple with a named-graph IRI (rdf_ds.ml).

Design decision (SURVEY §1.3, refined): the OCaml sum type

    type term = Iri of iri | Literal of literal | Blank_ of blank_id

is flattened into **top-level primitive columns**, not a nested struct:

    s_kind TINYINT, s_lex STRING,                      -- subject (IRI|BNODE)
    pred   STRING,                                     -- predicate (always IRI)
    o_kind TINYINT, o_lex STRING, o_dtype STRING, o_lang STRING,
    graph  STRING,
    src_url STRING, extractor STRING, part_id INT      -- provenance (north rule)

Rationale at 100 TB: top-level primitives get Parquet/Iceberg column
statistics, dictionary encoding, predicate pushdown and column pruning with
zero struct-flattening work in the scan; equality on a bound position is a
single pushed filter. A struct encoding keeps pushdown in Spark 4 but loses
DuckDB-oracle comparability and dictionary encoding on some writers. The
discriminated union survives: `kind` is the tag (0=IRI, 1=BNODE, 2=LITERAL).

Literals keep their **lexical form verbatim** in `o_lex` (round-trip
fidelity, SURVEY §5); typed interpretation happens lazily via try_cast in
the expression layer (functions/builtins.py), mirroring rdf_dt.ml's lazy
value lattice.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

from pyspark.sql import types as T

# term kind tags (discriminated-union flattening of rdf_term.ml :: term)
KIND_IRI = 0
KIND_BNODE = 1
KIND_LITERAL = 2
#: RDF-star quoted triple (beyond the reference — rdf_term.ml predates
#: RDF-star). lex carries the field-encoded embedded triple; see
#: QuotedTriple for the encoding and the single-level restriction.
KIND_TRIPLE = 3

#: separators for the quoted-triple lex encoding: components split on
#: US (unit sep), fields within a component split on RS (record sep) —
#: both forbidden inside IRIs outright and rejected in embedded literal
#: lexicals at construction, so splits are exact (no escaping needed)
QT_SEP = "\x1f"
QT_FSEP = "\x1e"

# Well-known IRIs
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
RDF_LANGSTRING = RDF_NS + "langString"
XSD_STRING = XSD_NS + "string"
XSD_INTEGER = XSD_NS + "integer"
XSD_DECIMAL = XSD_NS + "decimal"
XSD_DOUBLE = XSD_NS + "double"
XSD_FLOAT = XSD_NS + "float"
XSD_BOOLEAN = XSD_NS + "boolean"
XSD_DATETIME = XSD_NS + "dateTime"
OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"

#: Reserved named-graph IRI for the default graph (rdf_ds.ml's default graph).
DEFAULT_GRAPH = "urn:x-ords:default"

NUMERIC_DTYPES = (
    XSD_INTEGER,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_FLOAT,
    XSD_NS + "int",
    XSD_NS + "long",
    XSD_NS + "short",
    XSD_NS + "byte",
    XSD_NS + "nonNegativeInteger",
    XSD_NS + "positiveInteger",
    XSD_NS + "unsignedInt",
    XSD_NS + "unsignedLong",
)

# ---------------------------------------------------------------------------
# Spark schema for the quad store
# ---------------------------------------------------------------------------

TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("s_kind", T.ByteType(), False),
        T.StructField("s_lex", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("o_kind", T.ByteType(), False),
        T.StructField("o_lex", T.StringType(), False),
        T.StructField("o_dtype", T.StringType(), True),
        T.StructField("o_lang", T.StringType(), True),
        T.StructField("graph", T.StringType(), False),
        T.StructField("src_url", T.StringType(), True),
        T.StructField("extractor", T.StringType(), True),
        T.StructField("part_id", T.IntegerType(), True),
    ]
)

#: Columns that identify a triple for set semantics (rdf_graph.ml's
#: add_triple is a set insert — duplicates are no-ops).
TRIPLE_KEY = ["s_kind", "s_lex", "pred", "o_kind", "o_lex", "o_dtype", "o_lang", "graph"]

#: Arrow/pandas-friendly column order for extractor output batches.
TRIPLES_COLUMNS = [f.name for f in TRIPLES_SCHEMA.fields]

#: schema of a variable binding inside the SPARQL-algebra solution DataFrame:
#: one struct column per variable (NULL column value = unbound).
TERM_STRUCT = T.StructType(
    [
        T.StructField("kind", T.ByteType(), True),
        T.StructField("lex", T.StringType(), True),
        T.StructField("dtype", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Python-side term values (used by the pure-Python parsers inside pandas
# UDF batches; never row-at-a-time on DataFrames)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Iri:
    """IRI term (rdf_term.ml :: Iri). `value` is the absolute IRI string."""

    value: str

    def nt(self) -> str:
        return f"<{self.value}>"


@dataclass(frozen=True)
class BNode:
    """Blank node (rdf_term.ml :: Blank_). Label WITHOUT the `_:` prefix."""

    label: str

    def nt(self) -> str:
        return f"_:{self.label}"


@dataclass(frozen=True)
class Literal:
    """Literal (rdf_term.ml :: literal): lexical form + optional lang/dtype."""

    lexical: str
    lang: Optional[str] = None
    dtype: Optional[str] = None

    def nt(self) -> str:
        esc = (
            self.lexical.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace("\t", "\\t")
        )
        if self.lang:
            return f'"{esc}"@{self.lang}'
        if self.dtype and self.dtype != XSD_STRING:
            return f'"{esc}"^^<{self.dtype}>'
        return f'"{esc}"'


@dataclass(frozen=True)
class QuotedTriple:
    """RDF-star quoted triple term `<< s p o >>` (RDF 1.2 / RDF-star CG).

    v1 scope: SINGLE-LEVEL quoting — components must be Iri/BNode/Literal,
    not further quoted triples (the annotation/provenance use case; a
    nested quote raises at construction). The flat-column store encodes a
    quoted term's components losslessly into its lex with control-char
    separators (QT_SEP between components, QT_FSEP between a component's
    kind/lex/dtype/lang fields — raw lexicals, NO escaping), so SPARQL-star
    accessors (SUBJECT/PREDICATE/OBJECT) and quoted patterns are pure
    `split` Column expressions. Literals containing U+001E/U+001F are
    rejected at construction to keep the splits exact."""

    s: "Term"
    p: Iri
    o: "Term"

    def __post_init__(self):
        if isinstance(self.s, (QuotedTriple,)) or isinstance(self.o, (QuotedTriple,)):
            raise ValueError("nested quoted triples are not supported (v1 single-level)")
        if isinstance(self.s, Literal):
            raise ValueError("literal subject inside a quoted triple")
        if not isinstance(self.p, Iri):
            raise ValueError("quoted-triple predicate must be an IRI")
        for t in (self.s, self.o):
            if isinstance(t, Literal) and (QT_SEP in t.lexical or QT_FSEP in t.lexical):
                raise ValueError("U+001E/U+001F in embedded literal lexical")

    def encode(self) -> str:
        return QT_SEP.join(_qt_field(t) for t in (self.s, self.p, self.o))

    def nt(self) -> str:
        return f"<< {self.s.nt()} {self.p.nt()} {self.o.nt()} >>"


def _qt_field(t: "Term") -> str:
    if isinstance(t, Iri):
        return f"{KIND_IRI}{QT_FSEP}{t.value}{QT_FSEP}{QT_FSEP}"
    if isinstance(t, BNode):
        return f"{KIND_BNODE}{QT_FSEP}{t.label}{QT_FSEP}{QT_FSEP}"
    assert isinstance(t, Literal)
    if t.lang:
        dtype, lang = RDF_LANGSTRING, t.lang
    else:
        dtype, lang = (t.dtype or XSD_STRING), ""
    return f"{KIND_LITERAL}{QT_FSEP}{t.lexical}{QT_FSEP}{dtype}{QT_FSEP}{lang}"


def qt_decode(enc: str) -> "QuotedTriple":
    """Inverse of QuotedTriple.encode."""
    parts = enc.split(QT_SEP)
    if len(parts) != 3:
        raise ValueError(f"malformed quoted-triple encoding: {enc!r}")

    def term(f: str) -> "Term":
        k, lex, dtype, lang = f.split(QT_FSEP)
        k = int(k)
        if k == KIND_IRI:
            return Iri(lex)
        if k == KIND_BNODE:
            return BNode(lex)
        if dtype == RDF_LANGSTRING:
            return Literal(lex, lang=lang)
        return Literal(lex, dtype=None if dtype == XSD_STRING else dtype)

    s, p, o = (term(f) for f in parts)
    assert isinstance(p, Iri)
    return QuotedTriple(s, p, o)


Term = Union[Iri, BNode, Literal, QuotedTriple]


def term_kind(t: Term) -> int:
    if isinstance(t, Iri):
        return KIND_IRI
    if isinstance(t, BNode):
        return KIND_BNODE
    if isinstance(t, QuotedTriple):
        return KIND_TRIPLE
    return KIND_LITERAL


def triple_row(
    s: Term,
    p: Iri,
    o: Term,
    graph: str,
    src_url: Optional[str] = None,
    extractor: Optional[str] = None,
    part_id: Optional[int] = None,
) -> tuple:
    """Flatten a parsed (s, p, o) into a TRIPLES row tuple (TRIPLES_COLUMNS
    order). Subjects must be IRI/BNODE, predicate IRI — enforced here, the
    same invariant rdf_term.ml encodes in its triple type."""
    sk = term_kind(s)
    if sk == KIND_LITERAL:
        raise ValueError("literal subject is not a valid RDF triple")
    if not isinstance(p, Iri):
        raise ValueError("predicate must be an IRI")
    ok = term_kind(o)
    if ok == KIND_LITERAL:
        o_lex, o_dtype, o_lang = o.lexical, o.dtype, o.lang
        # RDF 1.1: a plain literal is xsd:string; a lang literal is
        # rdf:langString. Normalize so equality/set-dedup is canonical.
        if o_lang:
            o_dtype = RDF_LANGSTRING
        elif o_dtype is None:
            o_dtype = XSD_STRING
        lex = o_lex
    elif ok == KIND_TRIPLE:
        lex, o_dtype, o_lang = o.encode(), None, None
    else:
        lex = o.value if ok == KIND_IRI else o.label
        o_dtype, o_lang = None, None
    s_lex = s.encode() if sk == KIND_TRIPLE else (s.value if sk == KIND_IRI else s.label)
    return (sk, s_lex, p.value, ok, lex, o_dtype, o_lang, graph, src_url, extractor, part_id)
