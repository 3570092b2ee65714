"""Serializers: quad DataFrame → N-Triples / N-Quads / Turtle / Graphviz.

Parity: rdf_ttl.ml :: to_string/to_file, rdf_dot.ml (SURVEY §2.2). The
formatting is pure Catalyst string expressions (concat/when/replace) so a
100 TB store serializes as a scan + write.text with zero Python in the
row path; N-Triples is the canonical test output (W3C suites compare NT).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .types import KIND_BNODE, KIND_IRI, KIND_LITERAL, KIND_TRIPLE, QT_FSEP, QT_SEP, RDF_LANGSTRING, XSD_STRING


def _esc(c: Column) -> Column:
    """N-Triples string escaping (ECHAR subset actually required)."""
    for src, dst in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")):
        c = F.replace(c, F.lit(src), F.lit(dst))
    return c


def _qt_nt(enc: Column) -> Column:
    """Quoted-triple lex encoding → N-Triples-star `<< s p o >>` text."""

    def comp(i: int) -> Column:
        fs = F.split(F.element_at(F.split(enc, QT_SEP), i), QT_FSEP)
        k, l = F.element_at(fs, 1), F.element_at(fs, 2)
        d, g = F.element_at(fs, 3), F.element_at(fs, 4)
        lit_body = F.concat(F.lit('"'), _esc(l), F.lit('"'))
        return (
            F.when(k == str(KIND_IRI), F.concat(F.lit("<"), l, F.lit(">")))
            .when(k == str(KIND_BNODE), F.concat(F.lit("_:"), l))
            .when(g != "", F.concat(lit_body, F.lit("@"), g))
            .when(
                (d != "") & (d != XSD_STRING) & (d != RDF_LANGSTRING),
                F.concat(lit_body, F.lit("^^<"), d, F.lit(">")),
            )
            .otherwise(lit_body)
        )

    return F.concat(F.lit("<< "), comp(1), F.lit(" "), comp(2), F.lit(" "), comp(3), F.lit(" >>"))


def term_nt(kind: Column, lex: Column, dtype: Column | None = None, lang: Column | None = None) -> Column:
    """One term in N-Triples syntax (incl. N-Triples-star quoted terms)."""
    iri = F.concat(F.lit("<"), lex, F.lit(">"))
    bnode = F.concat(F.lit("_:"), lex)
    if dtype is None:
        return (
            F.when(kind == KIND_IRI, iri)
            .when(kind == KIND_TRIPLE, _qt_nt(lex))
            .otherwise(bnode)
        )
    lit_body = F.concat(F.lit('"'), _esc(lex), F.lit('"'))
    lit = (
        F.when(lang.isNotNull(), F.concat(lit_body, F.lit("@"), lang))
        .when(
            dtype.isNotNull() & (dtype != XSD_STRING) & (dtype != RDF_LANGSTRING),
            F.concat(lit_body, F.lit("^^<"), dtype, F.lit(">")),
        )
        .otherwise(lit_body)
    )
    return (
        F.when(kind == KIND_IRI, iri)
        .when(kind == KIND_BNODE, bnode)
        .when(kind == KIND_TRIPLE, _qt_nt(lex))
        .otherwise(lit)
    )


def to_ntriples(df: DataFrame) -> DataFrame:
    """→ one `line` column per triple (subject predicate object .)."""
    return df.select(
        F.concat_ws(
            " ",
            term_nt(F.col("s_kind"), F.col("s_lex")),
            F.concat(F.lit("<"), F.col("pred"), F.lit(">")),
            term_nt(F.col("o_kind"), F.col("o_lex"), F.col("o_dtype"), F.col("o_lang")),
            F.lit("."),
        ).alias("line")
    )


def to_nquads(df: DataFrame) -> DataFrame:
    return df.select(
        F.concat_ws(
            " ",
            term_nt(F.col("s_kind"), F.col("s_lex")),
            F.concat(F.lit("<"), F.col("pred"), F.lit(">")),
            term_nt(F.col("o_kind"), F.col("o_lex"), F.col("o_dtype"), F.col("o_lang")),
            F.concat(F.lit("<"), F.col("graph"), F.lit(">")),
            F.lit("."),
        ).alias("line")
    )


def write_ntriples(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    to_ntriples(df).write.mode(mode).text(path)


def _compact(lex: Column, namespaces: dict[str, str]) -> Column:
    """IRI → prefixed name when a namespace matches (longest wins)."""
    out = F.concat(F.lit("<"), lex, F.lit(">"))
    for prefix, ns in sorted(namespaces.items(), key=lambda kv: -len(kv[1])):
        local = F.substring(lex, len(ns) + 1, 2**31 - 1)
        ok = lex.startswith(ns) & local.rlike(r"^[A-Za-z0-9_][A-Za-z0-9_.-]*$") & ~local.contains(".")
        out = F.when(ok, F.concat(F.lit(prefix + ":"), local)).otherwise(out)
    return out


def to_turtle(df: DataFrame, namespaces: dict[str, str] | None = None) -> str:
    """Turtle with prefix compaction and subject grouping. DRIVER-SIDE
    assembly of the final string — intended for result graphs / debug, not
    the 100 TB store (use write_ntriples there; same graph, line-parallel)."""
    ns = dict(namespaces or {})
    s_txt = (
        F.when(F.col("s_kind") == KIND_IRI, _compact(F.col("s_lex"), ns))
        .when(F.col("s_kind") == KIND_TRIPLE, _qt_nt(F.col("s_lex")))
        .otherwise(F.concat(F.lit("_:"), F.col("s_lex")))
    )
    p_txt = F.when(F.col("pred") == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", F.lit("a")).otherwise(
        _compact(F.col("pred"), ns)
    )
    lit_body = F.concat(F.lit('"'), _esc(F.col("o_lex")), F.lit('"'))
    o_txt = (
        F.when(F.col("o_kind") == KIND_IRI, _compact(F.col("o_lex"), ns))
        .when(F.col("o_kind") == KIND_BNODE, F.concat(F.lit("_:"), F.col("o_lex")))
        .when(F.col("o_kind") == KIND_TRIPLE, _qt_nt(F.col("o_lex")))
        .when(F.col("o_lang").isNotNull(), F.concat(lit_body, F.lit("@"), F.col("o_lang")))
        .when(
            F.col("o_dtype").isNotNull() & (F.col("o_dtype") != XSD_STRING),
            F.concat(lit_body, F.lit("^^"), _compact(F.col("o_dtype"), ns)),
        )
        .otherwise(lit_body)
    )
    grouped = (
        df.select(s_txt.alias("s"), F.concat_ws(" ", p_txt, o_txt).alias("po"))
        .groupBy("s")
        .agg(F.concat_ws(" ;\n    ", F.sort_array(F.collect_list("po"))).alias("body"))
        .orderBy("s")
    )
    lines = [f"@prefix {p}: <{iri}> ." for p, iri in sorted(ns.items())]
    if lines:
        lines.append("")
    for r in grouped.collect():
        lines.append(f"{r['s']} {r['body']} .")
    return "\n".join(lines) + "\n"


def to_dot(df: DataFrame, limit: int = 200) -> str:
    """Graphviz export (rdf_dot.ml) — debug helper on a bounded sample."""
    rows = df.limit(limit).collect()
    out = ["digraph g {"]
    for r in rows:
        s = f'"{r["s_lex"]}"'
        o = f'"{r["o_lex"]}"'
        out.append(f'  {s} -> {o} [label="{r["pred"]}"];')
    out.append("}")
    return "\n".join(out)


def to_rdfxml(df: DataFrame, namespaces: dict[str, str] | None = None) -> str:
    """RDF/XML writer (rdf_xml.ml :: to_string — SURVEY §2.2). Driver-side
    assembly grouped by subject; round-trips through sources/rdfxml.py.
    Like to_turtle, intended for result graphs / debug — the scale sink is
    N-Triples/Parquet."""
    from xml.sax.saxutils import escape, quoteattr

    from .types import RDF_NS

    ns = {"rdf": RDF_NS, **(namespaces or {})}

    def qname(iri: str):
        for p, base in sorted(ns.items(), key=lambda kv: -len(kv[1])):
            if iri.startswith(base):
                local = iri[len(base):]
                if local and all(c.isalnum() or c in "_-" for c in local) and not local[0].isdigit():
                    return f"{p}:{local}", None
        return None, iri

    rows = df.collect()
    by_subj: dict[tuple, list] = {}
    for r in rows:
        by_subj.setdefault((r["s_kind"], r["s_lex"]), []).append(r)

    out = ["<?xml version=\"1.0\" encoding=\"utf-8\"?>"]
    decls = " ".join(f'xmlns:{p}={quoteattr(iri)}' for p, iri in sorted(ns.items()))
    out.append(f"<rdf:RDF {decls}>")
    for (sk, slex), triples in sorted(by_subj.items(), key=lambda kv: kv[0]):
        about = f"rdf:about={quoteattr(slex)}" if sk == KIND_IRI else f"rdf:nodeID={quoteattr(slex)}"
        out.append(f"  <rdf:Description {about}>")
        for r in sorted(triples, key=lambda r: (r["pred"], r["o_kind"], r["o_lex"])):
            q, full = qname(r["pred"])
            tag = q if q else "ns1:" + r["pred"].rsplit("/", 1)[-1].rsplit("#", 1)[-1]
            extra = "" if q else f' xmlns:ns1={quoteattr(full.rsplit(full.rsplit("/", 1)[-1].rsplit("#", 1)[-1], 1)[0])}'
            if r["o_kind"] == KIND_IRI:
                out.append(f"    <{tag}{extra} rdf:resource={quoteattr(r['o_lex'])}/>")
            elif r["o_kind"] == KIND_BNODE:
                out.append(f"    <{tag}{extra} rdf:nodeID={quoteattr(r['o_lex'])}/>")
            else:
                attrs = ""
                if r["o_lang"]:
                    attrs = f" xml:lang={quoteattr(r['o_lang'])}"
                elif r["o_dtype"] and r["o_dtype"] != XSD_STRING:
                    attrs = f" rdf:datatype={quoteattr(r['o_dtype'])}"
                out.append(f"    <{tag}{extra}{attrs}>{escape(r['o_lex'])}</{tag}>")
        out.append("  </rdf:Description>")
    out.append("</rdf:RDF>")
    return "\n".join(out) + "\n"


def to_trig(df: DataFrame, default_graph: str | None = None) -> str:
    """Quad DataFrame → TriG string: one `<graph> { ... }` block per named
    graph (rows whose graph equals `default_graph` emit as bare default-
    graph statements). DRIVER-SIDE assembly like to_turtle — debug/result
    graphs; the 100 TB store serializes line-parallel N-Quads instead."""
    from .types import DEFAULT_GRAPH

    default_graph = default_graph or DEFAULT_GRAPH
    lines_df = df.select(
        F.col("graph"),
        F.concat_ws(
            " ",
            term_nt(F.col("s_kind"), F.col("s_lex")),
            F.concat(F.lit("<"), F.col("pred"), F.lit(">")),
            term_nt(F.col("o_kind"), F.col("o_lex"), F.col("o_dtype"), F.col("o_lang")),
            F.lit("."),
        ).alias("line"),
    )
    by_graph: dict[str, list[str]] = {}
    for r in lines_df.collect():
        by_graph.setdefault(r["graph"], []).append(r["line"])
    out: list[str] = []
    for g in sorted(by_graph):
        if g == default_graph:
            out.extend(sorted(by_graph[g]))
        else:
            out.append(f"<{g}> {{")
            out.extend(f"  {l}" for l in sorted(by_graph[g]))
            out.append("}")
    return "\n".join(out) + "\n"


def to_jsonld(df: DataFrame) -> str:
    """Flat EXPANDED-form JSON-LD document: {"@graph": [node, ...]} with
    full-IRI property keys and {"@id"} / {"@value", "@type"/"@language"}
    object forms — completing the writer set (the JSON-LD READER landed
    in round 1; the reference family likewise ships serializer pairs,
    SURVEY §2.2). rdf:type stays a plain property key (expanded JSON-LD
    treats it identically to "@type" for triple emission, and it keeps
    the writer symmetric with sources/jsonld.py — round-trip tested).

    DRIVER-SIDE string assembly of the final document, like to_turtle:
    intended for result graphs / debug, not the 100 TB store. The
    per-object JSON is built distributed via to_json (null struct fields
    are omitted, which yields exactly the @id-vs-@value shapes), and
    nodes/predicates/objects are sorted — byte-deterministic output.
    """
    subj = F.when(F.col("s_kind") == KIND_IRI, F.col("s_lex")).otherwise(
        F.concat(F.lit("_:"), F.col("s_lex"))
    )
    is_lit = F.col("o_kind") == KIND_LITERAL
    o_json = F.to_json(
        F.struct(
            F.when(F.col("o_kind") == KIND_IRI, F.col("o_lex"))
            .when(F.col("o_kind") == KIND_BNODE, F.concat(F.lit("_:"), F.col("o_lex")))
            .alias("@id"),
            F.when(is_lit, F.col("o_lex")).alias("@value"),
            F.when(
                is_lit
                & F.col("o_lang").isNull()
                & F.col("o_dtype").isNotNull()
                & (F.col("o_dtype") != XSD_STRING),
                F.col("o_dtype"),
            ).alias("@type"),
            F.when(is_lit & F.col("o_lang").isNotNull(), F.col("o_lang")).alias(
                "@language"
            ),
        )
    )
    # IRIs and bnode labels cannot contain '"' or '\', so the property key
    # and @id embed directly; literal content goes through to_json above
    props = (
        df.select(subj.alias("s"), F.col("pred").alias("p"), o_json.alias("oj"))
        .groupBy("s", "p")
        .agg(F.sort_array(F.collect_list("oj")).alias("ojs"))
        .select(
            "s",
            F.concat(
                F.lit('"'), F.col("p"), F.lit('":['),
                F.concat_ws(",", F.col("ojs")), F.lit("]"),
            ).alias("pj"),
        )
    )
    nodes = (
        props.groupBy("s")
        .agg(F.sort_array(F.collect_list("pj")).alias("pjs"))
        .select(
            F.col("s"),
            F.concat(
                F.lit('{"@id":"'), F.col("s"), F.lit('",'),
                F.concat_ws(",", F.col("pjs")), F.lit("}"),
            ).alias("node"),
        )
        .orderBy("s")
    )
    return '{"@graph":[' + ",".join(r["node"] for r in nodes.collect()) + "]}"


def write_sorted_ntriples(df: DataFrame, path: str, shards: int = 8, mode: str = "overwrite") -> None:
    """Globally-sorted N-Triples export in `shards` files: shard i's
    lines all sort before shard i+1's, and each shard is internally
    sorted — so `cat part-00000 part-00001 …` (the natural shard order)
    yields one globally-ordered file without any merge step. This is
    what a canonical-dump publisher needs (diffable dumps, binary-
    searchable shards, stable byte output for signing).

    Plan shape: `repartitionByRange` samples the key distribution and
    range-partitions the lines (ONE shuffle, skew-balanced by sampling),
    then `sortWithinPartitions` sorts each shard independently — the
    scalable alternative to `orderBy.coalesce(1)`, whose single final
    partition caps throughput at one task regardless of cluster size.
    Deterministic given deterministic input: the line set is exact;
    only shard BOUNDARIES may move with sampling, never line content or
    global order."""
    lines = to_ntriples(df)
    (
        lines.repartitionByRange(shards, F.col("line"))
        .sortWithinPartitions("line")
        .write.mode(mode)
        .text(path)
    )
