"""Differential fuzz for the late-round-3 operators: dictionary-encoding
id parity (Spark vs DuckDB must mint identical 60-bit ids for arbitrary
terms), pay-level-domain extraction vs an independent pure-Python PSL
mirror, and cross-page template stripping vs a pure-Python mirror of the
frequency rule — same generative style as the other differential
harnesses (EBV, temporal, URLs, fusion)."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# dictenc: id parity on arbitrary term tuples
# --------------------------------------------------------------------------

LEXES = ["urn:a", "x", "", "ASIA", "héllo wörld", "a\tb", "line1\nline2",
         "0", "-3.14", "http://ex.org/p#f", "名前", "🌊", "'quoted'",
         'very "long" lexical with spaces and | pipes']
DTYPES = [None, "http://www.w3.org/2001/XMLSchema#string",
          "http://www.w3.org/2001/XMLSchema#integer", "urn:custom"]
LANGS = [None, "en", "en-GB", "zh-Hans"]


def test_dictenc_id_parity_cross_engine(spark):
    from ocaml_rdf_spark.operators.dictenc import term_id, term_key

    rng = random.Random(20260819)
    rows = []
    for i in range(300):
        kind = rng.choice([0, 1, 2, 2])  # literals more often
        lex = rng.choice(LEXES)
        dt = rng.choice(DTYPES) if kind == 2 else None
        lang = rng.choice(LANGS) if kind == 2 and dt is None else None
        rows.append((i, kind, lex, dt, lang))
    pdf = pd.DataFrame(rows, columns=["i", "kind", "lex", "dtype", "lang"])

    sdf = spark.createDataFrame(pdf.astype(object).where(pdf.notna(), None))
    got = {
        r["i"]: r["id"]
        for r in sdf.select(
            "i", term_id(term_key(F.col("kind"), F.col("lex"), F.col("dtype"), F.col("lang"))).alias("id")
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        r[0]: r[1]
        for r in con.sql(
            "SELECT i, ('0x' || substr(md5(CAST(kind AS VARCHAR) || chr(31) || lex || chr(31) "
            "|| coalesce(dtype,'') || chr(31) || coalesce(lang,'')), 1, 15))::BIGINT FROM t"
        ).fetchall()
    }
    assert got == want


# --------------------------------------------------------------------------
# pld: Spark column algebra vs an independent Python PSL implementation
# --------------------------------------------------------------------------


def _pld_py(host: str, rules: set[str]) -> str:
    labels = host.split(".")
    n = len(labels)
    best = None
    for i in range(2, n + 1):  # 1-based start, must leave >=1 label before
        if ".".join(labels[i - 1:]) in rules:
            best = i
            break  # smallest i = longest suffix
    if best is not None:
        return ".".join(labels[best - 2:])
    if n >= 2:
        return ".".join(labels[-2:])
    return host


def test_pld_cross_impl_fuzz(spark):
    from ocaml_rdf_spark.operators.urls import PSL_SUBSET, pld

    rng = random.Random(20260819)
    parts = ["a", "b", "www", "news", "shop1", "x9", "co", "uk", "com",
             "example", "dev", "zz", "gov", "ac", "org", "test"]
    hosts = []
    for _ in range(400):
        n = rng.randint(1, 5)
        hosts.append(".".join(rng.choice(parts) for _ in range(n)))
    pdf = pd.DataFrame({"i": range(len(hosts)), "host": hosts})
    sdf = spark.createDataFrame(pdf)
    got = {r["i"]: r["p"] for r in sdf.select("i", pld(F.col("host")).alias("p")).collect()}
    rules = set(PSL_SUBSET)
    for i, h in enumerate(hosts):
        assert got[i] == _pld_py(h, rules), (h, got[i], _pld_py(h, rules))


# --------------------------------------------------------------------------
# templates: strip_templates vs a pure-Python mirror of the frequency rule
# --------------------------------------------------------------------------


def _strip_py(pages: list[tuple[str, list[str]]], min_pages: int = 2):
    """pages: [(url, [block texts])]; host = url's netloc."""
    from collections import defaultdict

    host_of = lambda u: u.split("//")[1].split("/")[0]
    host_pages = defaultdict(set)
    fp_pages = defaultdict(set)
    for url, blocks in pages:
        h = host_of(url)
        host_pages[h].add(url)
        for b in set(blocks):
            fp_pages[(h, b)].add(url)
    tmpl = {
        (h, b)
        for (h, b), us in fp_pages.items()
        if len(us) >= min_pages and len(us) * 2 >= len(host_pages[h])
    }
    out = {}
    for url, blocks in pages:
        h = host_of(url)
        kept = [b for b in blocks if (h, b) not in tmpl]
        out[url] = ("\n".join(kept), len(blocks), len(kept))
    return out


def test_template_strip_cross_impl_fuzz(spark):
    from ocaml_rdf_spark.operators.templates import strip_templates

    rng = random.Random(20260819)
    block_pool = [f"block text number {i} with words" for i in range(12)]
    pages = []
    for h in range(5):
        for p in range(rng.randint(1, 8)):
            url = f"https://h{h}.example/p/{p}"
            blocks = [rng.choice(block_pool) for _ in range(rng.randint(1, 5))]
            # de-dup within page: identical blocks on one page segment apart
            # but count once per page in both impls; keep them unique per
            # page to sidestep within-page multiplicity in the mirror
            blocks = list(dict.fromkeys(blocks))
            pages.append((url, blocks))
    html = [
        (url, "<html><body>" + "".join(f"<p>{b}</p>" for b in blocks) + "</body></html>")
        for url, blocks in pages
    ]
    pg = spark.createDataFrame([(u, x.encode()) for u, x in html], "url string, html binary")
    got = {
        r["url"]: (r["main_text"], r["n_blocks"], r["n_kept"])
        for r in strip_templates(pg).collect()
    }
    assert got == _strip_py(pages)
