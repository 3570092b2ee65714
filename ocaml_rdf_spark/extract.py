"""Extraction stage: pages DataFrame → TRIPLES DataFrame.

Parity: the reference's document-load entry point (rdf_ttl.ml ::
from_string → g.add_triple loop, SURVEY §3 EP2), re-expressed as ONE
vectorized `mapInPandas` pass per the north rule (BASELINE.json:6,16):
each Arrow batch of pages runs text extraction + all embedded-format
parsers (JSON-LD, RDFa, microdata, inline Turtle, inline N-Triples) in
pure Python, emitting exploded triple rows. No row-at-a-time Python UDFs.

Scale design:
- `salted_repartition` spreads mega-host skew before the CPU-heavy parse
  (north rule): key = xxhash64(host) combined with a per-url salt.
- Parser errors NEVER kill a task at 10^12-doc scale: they become lineage
  error rows (pred = ERROR_PRED) filtered out by `split_errors`.
- Blank-node labels are document-local in parsers; rewritten here to
  deterministic partition-safe ids sha1(url|extractor|label) — SURVEY §1.3,
  replacing the reference's mutable counter (rdf_graph.ml :: new_blank_id).
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sources.html_text import extract_text
from .sources.htmldom import collect_raw_blocks, parse_html
from .sources.jsonld import extract_jsonld
from .sources.microdata import extract_microdata_tree
from .sources.ntriples import parse_ntriples
from .sources.rdfa import extract_rdfa_tree
from .sources.rdfxml import parse_rdfxml
from .sources.turtle import TurtleParser
from .types import TRIPLE_KEY, TRIPLES_COLUMNS, TRIPLES_SCHEMA, BNode, Iri, Term, triple_row

ERROR_PRED = "urn:x-ords:error"

EXTRACTORS = (
    "jsonld", "rdfa", "microdata", "turtle", "trig", "ntriples", "rdfxml", "tables", "meta", "mf2",
)


def _global_bnode(term: Term, url: str, ext: str) -> Term:
    if isinstance(term, BNode):
        h = hashlib.sha1(f"{url}|{ext}|{term.label}".encode()).hexdigest()[:16]
        return BNode(h)
    return term


#: conservative structured-data markers: every extractor's trigger implies
#: at least one of these substrings (script types for the raw-block
#: formats; itemscope for microdata; property/typeof/vocab/prefix for
#: RDFa). A page containing NONE cannot emit a triple OR an error row, so
#: the DOM parse — ~40% of per-page CPU — is skipped outright. On this
#: synthetic corpus ~0.6% of pages skip; on real Common Crawl the
#: no-structured-data majority makes this the dominant fast path.
#: mf2 fast-path gate: an h- root token inside a class attribute
_MF2_MARK = re.compile(r'class\s*=\s*["\'][^"\']*\bh-[a-z]')

_MARKERS = (
    "ld+json", "text/turtle", "application/trig", "rdf+xml", "ntriples",
    "itemscope", "property", "typeof", "vocab", "prefix",
)


def extract_page(
    url: str, html_bytes: bytes, tables: bool = False, meta: bool = False, mf2: bool = False
) -> tuple[list[tuple], list[tuple]]:
    """Parse one page; returns (triple_rows, error_rows) in TRIPLES row form.

    `tables` opts into the WebTables recovery path (sources/tables.py):
    OFF by default because table triples are lower-precision than
    explicit RDF markup (no vocabulary, heuristic header detection) —
    a pipeline turns it on for coverage, not correctness. With it on,
    `<table` joins the marker fast-path set so table-only pages still
    reach the DOM parse. `meta` likewise opts into the page-metadata
    extractor (sources/meta.py: OpenGraph / Twitter cards / description
    meta / title / hreflang alternates) with its own marker gate, and
    `mf2` into the microformats2 extractor (sources/mf2.py: h-card/
    h-entry class-token items, the IndieWeb structured-data idiom) gated
    on an `h-` token inside a class attribute."""
    rows: list[tuple] = []
    errors: list[tuple] = []
    html = html_bytes.decode("utf-8", errors="replace")
    low = html.lower()
    if (
        not any(m in low for m in _MARKERS)
        and not (tables and "<table" in low)
        and not (meta and ("<meta" in low or "<title" in low))
        and not (mf2 and _MF2_MARK.search(low) is not None)
    ):
        return rows, errors

    def emit(triples, ext: str):
        for s, p, o in triples:
            s = _global_bnode(s, url, ext)
            o = _global_bnode(o, url, ext)
            try:
                rows.append(triple_row(s, p, o, graph=url, src_url=url, extractor=ext))
            except ValueError:
                pass  # ill-formed triple (literal subject etc.) — drop

    def err(ext: str, e: Exception):
        msg = f"{type(e).__name__}: {e}"[:500]
        errors.append(
            (0, url, ERROR_PRED, 2, msg, "http://www.w3.org/2001/XMLSchema#string", None, url, url, ext, None)
        )

    # ONE tolerant DOM parse per page, shared by the raw-block collector and
    # both attribute-walk extractors (was 3 full html.parser passes — the
    # parse is the extractor hot path, ~2/3 of per-page CPU)
    dom = parse_html(html)

    # script/pre payload blocks (script is CDATA → raw/entity-preserving)
    for tag, attrs, raw in collect_raw_blocks(dom):
        btype = (attrs.get("type") or "").split(";")[0].strip().lower()
        if tag == "script" and btype == "application/ld+json":
            try:
                emit(extract_jsonld(raw, base=url), "jsonld")
            except Exception as e:  # pragma: no cover - extractor is lenient
                err("jsonld", e)
        elif tag == "script" and btype == "text/turtle":
            try:
                emit(TurtleParser(raw, base=url).parse(), "turtle")
            except Exception as e:
                err("turtle", e)
        elif tag == "script" and btype == "application/trig":
            # TriG carries its own graph labels: named-graph quads keep
            # their label in the graph column; default-graph quads use the
            # page url like every other extractor
            try:
                from .sources.trig import parse_trig
                from .types import BNode as _B, Iri as _I

                for s, p, o, g in parse_trig(raw, base=url):
                    s2, o2 = _global_bnode(s, url, "trig"), _global_bnode(o, url, "trig")
                    if isinstance(g, _B):
                        gname = "_:" + _global_bnode(g, url, "trig").label
                    elif isinstance(g, _I):
                        gname = g.value
                    else:
                        gname = url
                    try:
                        rows.append(triple_row(s2, p, o2, graph=gname, src_url=url, extractor="trig"))
                    except ValueError:
                        pass
            except Exception as e:
                err("trig", e)
        elif tag == "script" and btype == "application/rdf+xml":
            # NOTE: no html-unescape — XML carries its own entities
            try:
                emit(parse_rdfxml(raw, base=url), "rdfxml")
            except Exception as e:
                err("rdfxml", e)
        elif tag == "pre" and "ntriples" in (attrs.get("class") or ""):
            # no unescape: <pre> is not CDATA, so the DOM builder already
            # converted charrefs exactly once (collect_raw_blocks docstring)
            try:
                emit(list(parse_ntriples(raw)), "ntriples")
            except Exception as e:
                err("ntriples", e)

    # attribute-based formats over the tolerant DOM
    try:
        emit(extract_rdfa_tree(dom, base=url), "rdfa")
    except Exception as e:
        err("rdfa", e)
    try:
        emit(extract_microdata_tree(dom, base=url), "microdata")
    except Exception as e:
        err("microdata", e)
    if tables:
        try:
            from .sources.tables import extract_tables_tree

            emit(extract_tables_tree(dom, base=url), "tables")
        except Exception as e:
            err("tables", e)
    if meta:
        try:
            from .sources.meta import extract_meta_tree

            emit(extract_meta_tree(dom, base=url), "meta")
        except Exception as e:
            err("meta", e)
    if mf2:
        try:
            from .sources.mf2 import extract_mf2_tree

            emit(extract_mf2_tree(dom, base=url), "mf2")
        except Exception as e:
            err("mf2", e)

    return rows, errors


def extract_triples(
    pages: DataFrame, with_text: bool = False, tables: bool = False, meta: bool = False,
    mf2: bool = False,
) -> DataFrame:
    """pages (url, warc_ts, html, ...) → TRIPLES DataFrame (+ error rows).

    One Arrow batch in, one triples batch out; parser instances are
    per-document but allocation-light. Set-semantics dedup is NOT applied
    here (do it once globally at materialization — cheaper than per-batch).
    `tables=True` adds the WebTables recovery extractor, `meta=True` the
    page-metadata extractor, `mf2=True` the microformats2 extractor
    (extract_page).
    """
    cols = ["url", "html"] + (["text"] if with_text else [])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for url, html_bytes in zip(pdf["url"], pdf["html"]):
                rows, errors = extract_page(url, bytes(html_bytes), tables=tables, meta=meta, mf2=mf2)
                out.extend(rows)
                out.extend(errors)
            yield pd.DataFrame(out, columns=TRIPLES_COLUMNS)

    return pages.select(*cols).mapInPandas(run, schema=TRIPLES_SCHEMA)


def extract_text_df(pages: DataFrame) -> DataFrame:
    """(url, text) recomputed from html — the byte-identity check input."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "text": [extract_text(bytes(h)) for h in pdf["html"]],
                }
            )

    return pages.select("url", "html").mapInPandas(run, schema="url string, text string")


def split_errors(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean triples, error/lineage rows)."""
    return df.filter(F.col("pred") != ERROR_PRED), df.filter(F.col("pred") == ERROR_PRED)


def dedup_triples(df: DataFrame) -> DataFrame:
    """Set-semantics dedup (rdf_graph.ml :: add_triple is a set insert).

    Dedups on a 128-bit double-xxhash64 of the triple key instead of the 8
    wide string columns: the shuffle carries the same rows either way, but
    hash-key grouping avoids multi-column string comparison/hashing in the
    aggregate — measured ~2x faster end-to-end at 2.8M triples, and the
    gap grows with triple count. Collision odds at 10^12 triples:
    n^2 / 2^129 ≈ 1.5e-15 — below any practical concern (and a collision
    loses one duplicate-looking triple, it does not corrupt data).
    dropDuplicates(TRIPLE_KEY) remains the byte-exact fallback.
    """
    return (
        df.withColumn("__h1", F.xxhash64(*TRIPLE_KEY))
        .withColumn("__h2", F.xxhash64(F.lit(7), *TRIPLE_KEY))
        .dropDuplicates(["__h1", "__h2"])
        .drop("__h1", "__h2")
    )


def salted_repartition(pages: DataFrame, num_partitions: int, salt_buckets: int = 16) -> DataFrame:
    """Spread mega-host skew before the parse stage (north rule).

    Key = (host-hash, per-url salt): pages from one mega-host land on up to
    `salt_buckets` partitions instead of one. At 100 TB this is the
    difference between a straggler task parsing 20% of the corpus and an
    even spread; AQE cannot fix skew inside a mapInPandas stage on its own.
    """
    host = F.lower(F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://([^/:@]+@)?([^/:?#]+)", 2))
    salt = F.pmod(F.xxhash64("url"), F.lit(salt_buckets))
    return pages.repartition(num_partitions, F.xxhash64(host), salt)


def extract_relations(
    docs: DataFrame,
    patterns: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pattern-based relation extraction (the Hearst-pattern family —
    'X such as Y', 'X works for Y'): each pattern is (pred_iri, regex
    with exactly TWO capture groups); every non-overlapping match emits
    a mention-level (doc_id, subj, pred, obj) row for the linking stage
    to resolve into IRIs. Deduplicated per (doc, pred, subj, obj).

    Map-only per pattern: two regexp_extract_all projections zipped and
    exploded — no UDF, no shuffle before the final distinct; N patterns
    scan the corpus once each (union of narrow projections over the
    same scan — Catalyst caches the parquet footer work, and at 100 TB
    patterns are better batched into one alternation per predicate
    family if the pattern list grows past a handful)."""
    outs = []
    for pred, rx in patterns:
        g1 = F.regexp_extract_all(F.col(text_col), F.lit(rx), F.lit(1))
        g2 = F.regexp_extract_all(F.col(text_col), F.lit(rx), F.lit(2))
        pairs = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.arrays_zip(g1.alias("s"), g2.alias("o"))).alias("z"),
        )
        outs.append(
            pairs.select(
                "doc_id",
                F.col("z.s").alias("subj"),
                F.lit(pred).alias("pred"),
                F.col("z.o").alias("obj"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.distinct()
