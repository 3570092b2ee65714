"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §B).

Every record is a pure function of (seed, row index) — independent of
partitioning — so generation distributes via ``spark.range(n).mapInPandas``
and two runs (or two cluster sizes) produce byte-identical corpora. Hosts
follow a Zipf(s=1.2) distribution to reproduce mega-host skew on purpose
(north rule: salted repartitioning must be exercised).

The generator emits BOTH the page html and the golden triples it embedded
(B2) plus the golden visible text (B6) — that is what makes extraction
P/R and the byte-identity invariant computable without external data.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import html as html_mod
import json
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .types import (
    PAGES_SCHEMA,
    RDF_NS,
    RDF_TYPE,
    TRIPLES_COLUMNS,
    TRIPLES_SCHEMA,
    XSD_DATETIME,
    XSD_DECIMAL,
    XSD_INTEGER,
    BNode,
    Iri,
    Literal,
    Term,
    triple_row,
)

SCHEMA_NS = "https://schema.org/"
SEED = 42
N_HOSTS = 100
ZIPF_S = 1.2
LANGS = ["en", "es", "de", "fr", "zh"]

_FIRST = ["alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi", "ivan", "judy", "mallory", "oscar", "peggy", "trent", "victor", "wendy"]
_LAST = ["adams", "baker", "clark", "davis", "evans", "frank", "ghosh", "hoang", "ibanez", "jones", "kumar", "lopez", "meyer", "novak", "okafor", "patel"]
_JOBS = ["engineer", "editor", "artist", "analyst", "chef", "pilot", "nurse", "teacher"]
_PRODUCTS = ["widget", "gadget", "sprocket", "gizmo", "doohickey", "contraption", "apparatus", "device"]
_ORGS = ["acme", "globex", "initech", "umbrella", "hooli", "stark", "wayne", "wonka"]
_WORDS = (
    "the quick brown fox jumps over lazy dog while seven wizards brew "
    "amber potions under ancient oak trees near silver rivers and stone "
    "bridges that travellers cross each morning carrying baskets of fresh "
    "bread olives cheese and letters bound for distant harbour towns"
).split()

# precomputed zipf cumulative weights over host ranks
_ZIPF_W = [1.0 / ((r + 1) ** ZIPF_S) for r in range(N_HOSTS)]
_ZIPF_TOT = sum(_ZIPF_W)
_ZIPF_CUM = []
_acc = 0.0
for _w in _ZIPF_W:
    _acc += _w
    _ZIPF_CUM.append(_acc / _ZIPF_TOT)

_EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _pick_host(u: float) -> str:
    lo, hi = 0, N_HOSTS - 1
    while lo < hi:
        mid = (lo + hi) // 2
        if _ZIPF_CUM[mid] < u:
            lo = mid + 1
        else:
            hi = mid
    return f"host{lo:03d}.example.org"


def _sentence(rng: random.Random, nwords: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(nwords))


def page_record(i: int, seed: int = SEED, tables: bool = False) -> dict:
    """One page: html + golden text + golden triples. Pure function of
    (seed, i). `tables=False` (the default) is frozen — byte-identical
    output across rounds; `tables=True` appends an opt-in relational
    html table (block 7) with its golden triples/text for the WebTables
    extractor, drawn AFTER every frozen block so the default path's RNG
    stream is untouched."""
    rng = random.Random((seed << 34) ^ (i * 0x9E3779B97F4A7C15))
    host = _pick_host(rng.random())
    url = f"https://{host}/page/{i}"
    lang = rng.choice(LANGS)
    person = f"{rng.choice(_FIRST)} {rng.choice(_LAST)}"
    job = rng.choice(_JOBS)
    org = rng.choice(_ORGS)
    org_uri = f"https://{host}/org/{org}"
    product = rng.choice(_PRODUCTS)
    price = rng.randrange(1, 5000)
    wordcount = rng.randrange(50, 5000)
    title = f"Page {i} about {product} and {person}"

    frags: list[str] = []  # html fragments
    lines: list[str] = []  # golden extracted-text lines, in order
    triples: list[tuple[Term, Iri, Term, str]] = []  # (s, p, o, extractor)

    frags.append(f"<html lang=\"{lang}\"><head><title>{title}</title>")
    lines.append(title)

    # -- block 1: JSON-LD (invisible) ---------------------------------------
    if rng.random() < 0.65:
        ent = f"{url}#person"
        obj = {
            "@context": {"schema": SCHEMA_NS},
            "@id": ent,
            "@type": "schema:Person",
            "schema:name": person,
            "schema:jobTitle": job,
            "schema:worksFor": {
                "@id": org_uri,
                "@type": "schema:Organization",
                "schema:name": org,
            },
        }
        frags.append(
            '<script type="application/ld+json">'
            + json.dumps(obj, sort_keys=True, separators=(",", ":"))
            + "</script>"
        )
        e = Iri(ent)
        o = Iri(org_uri)
        triples += [
            (e, Iri(RDF_TYPE), Iri(SCHEMA_NS + "Person"), "jsonld"),
            (e, Iri(SCHEMA_NS + "name"), Literal(person), "jsonld"),
            (e, Iri(SCHEMA_NS + "jobTitle"), Literal(job), "jsonld"),
            (e, Iri(SCHEMA_NS + "worksFor"), o, "jsonld"),
            (o, Iri(RDF_TYPE), Iri(SCHEMA_NS + "Organization"), "jsonld"),
            (o, Iri(SCHEMA_NS + "name"), Literal(org), "jsonld"),
        ]
    frags.append("</head><body>")

    frags.append(f"<h1>{title}</h1>")
    lines.append(title)
    for k in range(rng.randrange(1, 4)):
        s = _sentence(rng, rng.randrange(8, 25)) + "."
        frags.append(f"<p>{s}</p>")
        lines.append(s)

    # -- block 2: RDFa (visible spans) ---------------------------------------
    if rng.random() < 0.6:
        ent = f"{url}#author"
        frags.append(
            f'<div vocab="{SCHEMA_NS}" typeof="Person" about="#author">'
            f'<span property="name">{person}</span> '
            f'<span property="jobTitle">{job}</span> '
            f'<a property="worksFor" href="{org_uri}">{org}</a></div>'
        )
        lines.append(f"{person} {job} {org}")
        e = Iri(ent)
        # RDFa plain literals inherit the in-scope language from <html lang>
        triples += [
            (e, Iri(RDF_TYPE), Iri(SCHEMA_NS + "Person"), "rdfa"),
            (e, Iri(SCHEMA_NS + "name"), Literal(person, lang=lang), "rdfa"),
            (e, Iri(SCHEMA_NS + "jobTitle"), Literal(job, lang=lang), "rdfa"),
            (e, Iri(SCHEMA_NS + "worksFor"), Iri(org_uri), "rdfa"),
        ]

    # -- block 3: microdata (visible) -----------------------------------------
    if rng.random() < 0.6:
        ent = f"{url}#product"
        frags.append(
            f'<div itemscope itemtype="{SCHEMA_NS}Product" itemid="#product">'
            f'<span itemprop="name">{product}</span>'
            f'<meta itemprop="sku" content="SKU-{i}">'
            f'<link itemprop="url" href="/p/{product}">'
            f'<span itemprop="offers" itemscope itemtype="{SCHEMA_NS}Offer" itemid="#offer">'
            f'<meta itemprop="price" content="{price}"></span></div>'
        )
        lines.append(product)
        e = Iri(ent)
        off = Iri(f"{url}#offer")
        triples += [
            (e, Iri(RDF_TYPE), Iri(SCHEMA_NS + "Product"), "microdata"),
            (e, Iri(SCHEMA_NS + "name"), Literal(product), "microdata"),
            (e, Iri(SCHEMA_NS + "sku"), Literal(f"SKU-{i}"), "microdata"),
            (e, Iri(SCHEMA_NS + "url"), Iri(f"https://{host}/p/{product}"), "microdata"),
            (e, Iri(SCHEMA_NS + "offers"), off, "microdata"),
            (off, Iri(RDF_TYPE), Iri(SCHEMA_NS + "Offer"), "microdata"),
            (off, Iri(SCHEMA_NS + "price"), Literal(str(price)), "microdata"),
        ]

    # -- block 4: inline Turtle script (invisible) ----------------------------
    if rng.random() < 0.55:
        ent = f"{url}#article"
        ttl = (
            f"@prefix s: <{SCHEMA_NS}> .\n"
            f"<#article> a s:Article ;\n"
            f'  s:headline "{title}"@{lang} ;\n'
            f"  s:wordCount {wordcount} ;\n"
            f"  s:author <#author> .\n"
        )
        frags.append(f'<script type="text/turtle">{ttl}</script>')
        e = Iri(ent)
        triples += [
            (e, Iri(RDF_TYPE), Iri(SCHEMA_NS + "Article"), "turtle"),
            (e, Iri(SCHEMA_NS + "headline"), Literal(title, lang=lang), "turtle"),
            (e, Iri(SCHEMA_NS + "wordCount"), Literal(str(wordcount), dtype=XSD_INTEGER), "turtle"),
            (e, Iri(SCHEMA_NS + "author"), Iri(f"{url}#author"), "turtle"),
        ]

    # -- block 5: inline N-Triples <pre> (VISIBLE, entity-escaped) ------------
    if rng.random() < 0.5:
        ent = f"{url}#page"
        nt = (
            f"<{ent}> <{RDF_TYPE}> <{SCHEMA_NS}WebPage> .\n"
            f'<{ent}> <{SCHEMA_NS}name> "{title}" .\n'
            f"<{ent}> <{SCHEMA_NS}about> <{org_uri}> .\n"
        )
        frags.append('<pre class="ntriples">' + html_mod.escape(nt) + "</pre>")
        # pre is one block: inner newlines collapse to spaces, trimmed
        lines.append(" ".join(nt.strip().split("\n")))
        e = Iri(ent)
        triples += [
            (e, Iri(RDF_TYPE), Iri(SCHEMA_NS + "WebPage"), "ntriples"),
            (e, Iri(SCHEMA_NS + "name"), Literal(title), "ntriples"),
            (e, Iri(SCHEMA_NS + "about"), Iri(org_uri), "ntriples"),
        ]

    # -- block 6: RDF/XML script (invisible; exercises rdf_xml.ml parity) -----
    if rng.random() < 0.45:
        ent = f"{url}#event"
        start = f"2026-{1 + i % 12:02d}-{1 + i % 28:02d}T00:00:00Z"
        xml = (
            f'<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:s="{SCHEMA_NS}">'
            f'<s:Event rdf:about="#event">'
            f'<s:name xml:lang="{lang}">Launch of {product}</s:name>'
            f'<s:location rdf:resource="{org_uri}"/>'
            f'<s:startDate rdf:datatype="{XSD_DATETIME}">{start}</s:startDate>'
            f"</s:Event></rdf:RDF>"
        )
        frags.append(f'<script type="application/rdf+xml">{xml}</script>')
        e = Iri(ent)
        triples += [
            (e, Iri(RDF_TYPE), Iri(SCHEMA_NS + "Event"), "rdfxml"),
            (e, Iri(SCHEMA_NS + "name"), Literal(f"Launch of {product}", lang=lang), "rdfxml"),
            (e, Iri(SCHEMA_NS + "location"), Iri(org_uri), "rdfxml"),
            (e, Iri(SCHEMA_NS + "startDate"), Literal(start, dtype=XSD_DATETIME), "rdfxml"),
        ]

    # -- block 7 (opt-in): relational html table (WebTables recovery) ---------
    # golden bnode labels mirror extract._global_bnode's salt (url|ext|label
    # sha1/16) — kept in lockstep; the tables extractor mints tb1 (table),
    # tb2.. (rows) in document order, so labels are fully predictable
    if tables and rng.random() < 0.6:
        weight = f"{i % 50}.5"
        frags.append(
            "<table><tr><th>Spec</th><th>Value</th><th>More</th></tr>"
            f'<tr><td>price</td><td>{price}</td><td><a href="/p/{product}">buy</a></td></tr>'
            f"<tr><td>weight</td><td>{weight}</td><td>kg</td></tr></table>"
        )
        lines += ["Spec", "Value", "More", "price", str(price), "buy", "weight", weight, "kg"]

        def _tb(label: str) -> BNode:
            return BNode(hashlib.sha1(f"{url}|tables|{label}".encode()).hexdigest()[:16])

        t, r1, r2 = _tb("tb1"), _tb("tb2"), _tb("tb3")
        tns = "urn:x-ords:table:"
        triples += [
            (t, Iri(RDF_TYPE), Iri(tns + "Table"), "tables"),
            (t, Iri(tns + "columnCount"), Literal("3", dtype=XSD_INTEGER), "tables"),
            (t, Iri(tns + "rowCount"), Literal("2", dtype=XSD_INTEGER), "tables"),
            (t, Iri(tns + "row"), r1, "tables"),
            (r1, Iri(tns + "rowIndex"), Literal("0", dtype=XSD_INTEGER), "tables"),
            (r1, Iri(tns + "col/spec"), Literal("price"), "tables"),
            (r1, Iri(tns + "col/value"), Literal(str(price), dtype=XSD_INTEGER), "tables"),
            (r1, Iri(tns + "col/more"), Iri(f"https://{host}/p/{product}"), "tables"),
            (t, Iri(tns + "row"), r2, "tables"),
            (r2, Iri(tns + "rowIndex"), Literal("1", dtype=XSD_INTEGER), "tables"),
            (r2, Iri(tns + "col/spec"), Literal("weight"), "tables"),
            (r2, Iri(tns + "col/value"), Literal(weight, dtype=XSD_DECIMAL), "tables"),
            (r2, Iri(tns + "col/more"), Literal("kg"), "tables"),
        ]

    frags.append("</body></html>")
    text = "\n".join(lines)
    ts = _EPOCH + dt.timedelta(seconds=i)
    return {
        "url": url,
        "warc_ts": ts,
        "html": "".join(frags).encode("utf-8"),
        "text": text,
        "lang": lang,
        "_triples": triples,
    }


# ---------------------------------------------------------------------------
# Distributed generation
# ---------------------------------------------------------------------------


def gen_pages_df(spark: SparkSession, n: int, seed: int = SEED, parts: int | None = None, tables: bool = False) -> DataFrame:
    """pages DataFrame (B1 schema) generated in parallel, deterministic."""

    def gen(batches):
        for pdf in batches:
            recs = [page_record(int(i), seed, tables=tables) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "url": [r["url"] for r in recs],
                    "warc_ts": [r["warc_ts"] for r in recs],
                    "html": [r["html"] for r in recs],
                    "text": [r["text"] for r in recs],
                    "lang": [r["lang"] for r in recs],
                }
            )

    rng_df = spark.range(0, n, numPartitions=parts or max(8, n // 4096))
    return rng_df.mapInPandas(gen, schema=PAGES_SCHEMA)


def gen_golden_df(spark: SparkSession, n: int, seed: int = SEED, parts: int | None = None, tables: bool = False) -> DataFrame:
    """Golden triples (B2) the generator embedded — the P/R oracle."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                r = page_record(int(i), seed, tables=tables)
                for s, p, o, ext in r["_triples"]:
                    rows.append(triple_row(s, p, o, graph=r["url"], src_url=r["url"], extractor=ext))
            yield pd.DataFrame(rows, columns=TRIPLES_COLUMNS)

    rng_df = spark.range(0, n, numPartitions=parts or max(8, n // 4096))
    return rng_df.mapInPandas(gen, schema=TRIPLES_SCHEMA)


def gen_pages_pandas(n: int, seed: int = SEED, tables: bool = False) -> pd.DataFrame:
    """Driver-side tiny corpora for pytest."""
    recs = [page_record(i, seed, tables=tables) for i in range(n)]
    return pd.DataFrame([{k: v for k, v in r.items() if k != "_triples"} for r in recs])


# ---------------------------------------------------------------------------
# Entity-linking + canonicalization fixtures (B4, B5)
# ---------------------------------------------------------------------------


def gen_aliases_pandas(n: int = 5000, seed: int = SEED) -> pd.DataFrame:
    """Alias dictionary: surface form → canonical URI (+ prior).
    Contains ambiguous aliases and near-miss spellings (FIXTURES §B4)."""
    rng = random.Random(seed * 7 + 1)
    rows = []
    ents = []
    for f in _FIRST:
        for l in _LAST:
            ents.append((f"{f} {l}", f"https://kb.example.org/person/{f}_{l}"))
    for o in _ORGS:
        ents.append((o, f"https://kb.example.org/org/{o}"))
    for p in _PRODUCTS:
        ents.append((p, f"https://kb.example.org/product/{p}"))
    k = 0
    while len(rows) < n:
        name, uri = ents[k % len(ents)]
        k += 1
        rows.append({"alias": name, "uri": uri, "prior": round(rng.random(), 6)})
        # near-miss spelling (exercises MinHash-LSH blocking)
        if rng.random() < 0.3 and len(name) > 4:
            j = rng.randrange(1, len(name) - 1)
            rows.append({"alias": name[:j] + name[j + 1 :], "uri": uri, "prior": round(rng.random() * 0.5, 6)})
        # ambiguity: same alias, second uri
        if rng.random() < 0.1:
            rows.append({"alias": name, "uri": uri + "_alt", "prior": round(rng.random() * 0.3, 6)})
    return pd.DataFrame(rows[:n]).drop_duplicates(subset=["alias", "uri"]).reset_index(drop=True)


def gen_sameas_pandas(seed: int = SEED) -> pd.DataFrame:
    """owl:sameAs / bnode-equivalence edges with chains, stars, a big
    component, cycles, singleton-adjacent shapes (FIXTURES §B5)."""
    rng = random.Random(seed * 13 + 5)
    edges: list[tuple[str, str]] = []

    def node(g: str, i: int) -> str:
        return f"https://kb.example.org/{g}/{i}"

    for c in range(50):  # chains of length 4
        a = [node(f"chain{c}", i) for i in range(4)]
        edges += list(zip(a, a[1:]))
    for s in range(30):  # stars
        hub = node(f"star{s}", 0)
        edges += [(hub, node(f"star{s}", i)) for i in range(1, 8)]
    big = [node("big", i) for i in range(10000)]  # one 10k-node component
    perm = list(range(1, 10000))
    rng.shuffle(perm)
    prev = 0
    for i in perm:
        edges.append((big[prev], big[i]))
        prev = i if rng.random() < 0.5 else prev
    for c in range(20):  # cycles
        a = [node(f"cycle{c}", i) for i in range(5)]
        edges += list(zip(a, a[1:])) + [(a[-1], a[0])]
    rng.shuffle(edges)
    return pd.DataFrame(edges, columns=["a", "b"])


def corpus_fingerprint(n: int, seed: int = SEED) -> str:
    """sha256 over the first k pages' text — determinism smoke value."""
    h = hashlib.sha256()
    for i in range(min(n, 64)):
        h.update(page_record(i, seed)["text"].encode())
    return h.hexdigest()
