"""SPARQL query-results serializers: JSON (application/sparql-results+json)
and XML (application/sparql-results+xml).

Parity: rdf_json.ml + the results side of rdf_sparql_protocol.ml
(SURVEY §2.2 — the HTTP client itself is out of scope offline, but the
result formats are kept as test goldens / interchange). Operates on a
solutions DataFrame of TERM_STRUCT columns (algebra.py output);
driver-side assembly — result sets are human-scale, the 100 TB data
plane uses parquet/N-Triples.
"""

from __future__ import annotations

import json
from xml.sax.saxutils import escape, quoteattr

from pyspark.sql import DataFrame

from .types import KIND_BNODE, KIND_IRI, RDF_LANGSTRING, XSD_STRING


def _term_json(t) -> dict:
    if t["kind"] == KIND_IRI:
        return {"type": "uri", "value": t["lex"]}
    if t["kind"] == KIND_BNODE:
        return {"type": "bnode", "value": t["lex"]}
    from .types import KIND_TRIPLE, qt_decode, term_kind

    if t["kind"] == KIND_TRIPLE:
        # SPARQL 1.2 results JSON: nested triple term
        qt = qt_decode(t["lex"])

        def py(term):
            from .types import Iri as _I, BNode as _B

            if isinstance(term, _I):
                return {"type": "uri", "value": term.value}
            if isinstance(term, _B):
                return {"type": "bnode", "value": term.label}
            out = {"type": "literal", "value": term.lexical}
            if term.lang:
                out["xml:lang"] = term.lang
            elif term.dtype and term.dtype not in (XSD_STRING,):
                out["datatype"] = term.dtype
            return out

        return {
            "type": "triple",
            "value": {"subject": py(qt.s), "predicate": py(qt.p), "object": py(qt.o)},
        }
    out = {"type": "literal", "value": t["lex"]}
    if t["lang"]:
        out["xml:lang"] = t["lang"]
    elif t["dtype"] and t["dtype"] not in (XSD_STRING,):
        out["datatype"] = t["dtype"]
    return out


def to_sparql_json(df: DataFrame, limit: int | None = None) -> str:
    """Solutions DF → SPARQL 1.1 Results JSON string."""
    cols = df.columns
    rows = df.limit(limit).collect() if limit else df.collect()
    bindings = []
    for r in rows:
        b = {}
        for v in cols:
            t = r[v]
            if t is not None and t["kind"] is not None:
                b[v] = _term_json(t)
        bindings.append(b)
    return json.dumps(
        {"head": {"vars": cols}, "results": {"bindings": bindings}},
        ensure_ascii=False,
        sort_keys=True,
    )


def to_sparql_xml(df: DataFrame, limit: int | None = None) -> str:
    """Solutions DF → SPARQL Query Results XML Format string."""
    cols = df.columns
    rows = df.limit(limit).collect() if limit else df.collect()
    out = ['<?xml version="1.0"?>', '<sparql xmlns="http://www.w3.org/2005/sparql-results#">', "  <head>"]
    for v in cols:
        out.append(f"    <variable name={quoteattr(v)}/>")
    out.append("  </head>")
    out.append("  <results>")
    for r in rows:
        out.append("    <result>")
        for v in cols:
            t = r[v]
            if t is None or t["kind"] is None:
                continue
            if t["kind"] == KIND_IRI:
                body = f"<uri>{escape(t['lex'])}</uri>"
            elif t["kind"] == KIND_BNODE:
                body = f"<bnode>{escape(t['lex'])}</bnode>"
            elif t["kind"] == 3:  # SPARQL 1.2 XML triple term
                from .types import qt_decode

                qt = qt_decode(t["lex"])

                def x(term, tag):
                    from .types import BNode as _B, Iri as _I

                    if isinstance(term, _I):
                        inner = f"<uri>{escape(term.value)}</uri>"
                    elif isinstance(term, _B):
                        inner = f"<bnode>{escape(term.label)}</bnode>"
                    elif term.lang:
                        inner = f"<literal xml:lang={quoteattr(term.lang)}>{escape(term.lexical)}</literal>"
                    elif term.dtype and term.dtype != XSD_STRING:
                        inner = f"<literal datatype={quoteattr(term.dtype)}>{escape(term.lexical)}</literal>"
                    else:
                        inner = f"<literal>{escape(term.lexical)}</literal>"
                    return f"<{tag}>{inner}</{tag}>"

                body = f"<triple>{x(qt.s, 'subject')}{x(qt.p, 'predicate')}{x(qt.o, 'object')}</triple>"
            elif t["lang"]:
                body = f"<literal xml:lang={quoteattr(t['lang'])}>{escape(t['lex'])}</literal>"
            elif t["dtype"] and t["dtype"] != XSD_STRING:
                body = f"<literal datatype={quoteattr(t['dtype'])}>{escape(t['lex'])}</literal>"
            else:
                body = f"<literal>{escape(t['lex'])}</literal>"
            out.append(f"      <binding name={quoteattr(v)}>{body}</binding>")
        out.append("    </result>")
    out.append("  </results>")
    out.append("</sparql>")
    return "\n".join(out) + "\n"


def to_ask_json(result: bool) -> str:
    return json.dumps({"head": {}, "boolean": bool(result)})


def to_ask_xml(result: bool) -> str:
    return (
        '<?xml version="1.0"?>\n<sparql xmlns="http://www.w3.org/2005/sparql-results#">'
        f"<head/><boolean>{'true' if result else 'false'}</boolean></sparql>\n"
    )


def parse_sparql_json(s: str) -> tuple[list[str], list[dict]]:
    """Inverse of to_sparql_json (for protocol-client-style tests):
    → (vars, [ {var: (kind, lex, dtype, lang)} ])."""
    doc = json.loads(s)
    if "boolean" in doc:
        return [], [{"__ask": doc["boolean"]}]
    vars_ = doc["head"]["vars"]
    rows = []
    for b in doc["results"]["bindings"]:
        row = {}
        for v, t in b.items():
            if t["type"] == "uri":
                row[v] = (0, t["value"], None, None)
            elif t["type"] == "bnode":
                row[v] = (1, t["value"], None, None)
            elif t["type"] == "triple":
                # SPARQL 1.2 nested triple term → QuotedTriple encoding
                from .types import BNode as _B, Iri as _I, Literal as _L, QuotedTriple as _QT

                def term(d):
                    if d["type"] == "uri":
                        return _I(d["value"])
                    if d["type"] == "bnode":
                        return _B(d["value"])
                    return _L(d["value"], lang=d.get("xml:lang"), dtype=d.get("datatype"))

                val = t["value"]
                qt = _QT(term(val["subject"]), term(val["predicate"]), term(val["object"]))
                row[v] = (3, qt.encode(), None, None)
            else:
                lang = t.get("xml:lang")
                dt = t.get("datatype") or (RDF_LANGSTRING if lang else XSD_STRING)
                row[v] = (2, t["value"], dt, lang)
        rows.append(row)
    return vars_, rows


def parse_sparql_xml(s: str) -> tuple[list[str], list[dict]]:
    """Inverse of to_sparql_xml (the protocol-client side of the results
    surface, rdf_sparql_protocol.ml / rdf_xml result parsing):
    → (vars, [ {var: (kind, lex, dtype, lang)} ]); ASK → ([], [{"__ask": bool}])."""
    import xml.etree.ElementTree as ET

    NS = "{http://www.w3.org/2005/sparql-results#}"
    root = ET.fromstring(s)
    b = root.find(f"{NS}boolean")
    if b is not None:
        return [], [{"__ask": b.text == "true"}]
    vars_ = [v.get("name") for v in root.findall(f"{NS}head/{NS}variable")]
    rows = []
    for res in root.findall(f"{NS}results/{NS}result"):
        row = {}
        for binding in res.findall(f"{NS}binding"):
            v = binding.get("name")
            child = binding[0]
            tag = child.tag[len(NS):]
            if tag == "uri":
                row[v] = (KIND_IRI, child.text or "", None, None)
            elif tag == "bnode":
                row[v] = (KIND_BNODE, child.text or "", None, None)
            else:
                lang = child.get("{http://www.w3.org/XML/1998/namespace}lang")
                dt = child.get("datatype") or (RDF_LANGSTRING if lang else XSD_STRING)
                row[v] = (2, child.text or "", dt, lang)
        rows.append(row)
    return vars_, rows


# ---------------------------------------------------------------------------
# CSV / TSV results (SPARQL 1.1 Query Results CSV and TSV Formats — the
# remaining two W3C result serializations; CSV is lossy by design (no term
# kind), TSV round-trips terms in N-Triples-ish syntax)
# ---------------------------------------------------------------------------


def to_sparql_csv(df: DataFrame, limit: int | None = None) -> str:
    """Solutions DF → text/csv per the W3C CSV results format: header row
    of variable names; values are the STR() of each term (no quoting of
    kind), RFC-4180 escaping; unbound → empty field."""
    cols = df.columns
    rows = df.limit(limit).collect() if limit else df.collect()

    def esc(v: str) -> str:
        if any(c in v for c in (",", '"', "\n", "\r")):
            return '"' + v.replace('"', '""') + '"'
        return v

    out = [",".join(esc(c) for c in cols)]
    for r in rows:
        cells = []
        for v in cols:
            t = r[v]
            if t is None or t["kind"] is None:
                cells.append("")
            elif t["kind"] == KIND_BNODE:
                # W3C CSV results: blank nodes serialize as _:label
                # (only IRIs and literals are written bare)
                cells.append(esc("_:" + t["lex"]))
            elif t["kind"] == 3:
                from .types import qt_decode

                cells.append(esc(qt_decode(t["lex"]).nt()))
            else:
                cells.append(esc(t["lex"]))
        out.append(",".join(cells))
    return "\r\n".join(out) + "\r\n"


def _term_tsv(t) -> str:
    if t is None or t["kind"] is None:
        return ""
    if t["kind"] == KIND_IRI:
        return f"<{t['lex']}>"
    if t["kind"] == KIND_BNODE:
        return f"_:{t['lex']}"
    if t["kind"] == 3:  # TSV cells use NT syntax; NT-star for triple terms
        from .types import qt_decode

        return qt_decode(t["lex"]).nt()
    lex = (
        t["lex"].replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
        .replace("\r", "\\r").replace("\t", "\\t")
    )
    if t["lang"]:
        return f'"{lex}"@{t["lang"]}'
    if t["dtype"] and t["dtype"] != XSD_STRING:
        return f'"{lex}"^^<{t["dtype"]}>'
    return f'"{lex}"'


def to_sparql_tsv(df: DataFrame, limit: int | None = None) -> str:
    """Solutions DF → text/tab-separated-values per the W3C TSV results
    format: `?var` header, N-Triples-style terms, unbound → empty field.
    Unlike CSV this is lossless (term kind/datatype/lang survive)."""
    cols = df.columns
    rows = df.limit(limit).collect() if limit else df.collect()
    out = ["\t".join("?" + c for c in cols)]
    for r in rows:
        out.append("\t".join(_term_tsv(r[v]) for v in cols))
    return "\n".join(out) + "\n"


def parse_sparql_tsv(s: str) -> tuple[list[str], list[dict]]:
    """Inverse of to_sparql_tsv → (vars, [ {var: (kind, lex, dtype, lang)} ])
    — reuses the N-Triples term grammar for each cell."""
    from .sources.ntriples import _Line

    def parse_term(cell: str):
        return _Line(cell, 0).term()

    lines = s.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    vars_ = [h.lstrip("?$") for h in lines[0].split("\t")] if lines else []
    rows = []
    for line in lines[1:]:
        row = {}
        for v, cell in zip(vars_, line.split("\t")):
            if cell == "":
                continue
            t = parse_term(cell)
            from .types import BNode as _B, Iri as _I, Literal as _L

            if isinstance(t, _I):
                row[v] = (KIND_IRI, t.value, None, None)
            elif isinstance(t, _B):
                row[v] = (KIND_BNODE, t.label, None, None)
            else:
                from .types import QuotedTriple as _QT

                if isinstance(t, _QT):
                    row[v] = (3, t.encode(), None, None)
                else:
                    dt = RDF_LANGSTRING if t.lang else (t.dtype or XSD_STRING)
                    row[v] = (2, t.lexical, dt, t.lang)
        rows.append(row)
    return vars_, rows
