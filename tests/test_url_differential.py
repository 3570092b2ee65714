"""Differential fuzz of the hand-mirrored normal forms.

canonical_url (Spark Column algebra) and canonical_url_sql (DuckDB) are
two implementations of one spec built from the same regexes; likewise
normalize_literals and the lit_norm oracle CASE. The suite pins fixed
patterns — this harness generates seeded-random messy inputs (plus
pathological non-URLs / non-lexicals) and asserts the two engines agree
row-for-row, the same generative style as the other differential
harnesses (EBV, temporal, paths, aggregates)."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
from pyspark.sql import functions as F

SCHEMES = ["http", "HTTP", "https", "HtTpS", "ftp", ""]
HOSTS = ["Ex.COM", "ex.com", "WWW.Ex.Org", "ex.com:80", "EX.com:443",
         "ex.com:8080", "ex.com:", ""]
PATHS = ["", "/", "/A/b", "/p%20q", "//double", "/dot./x"]
PARAMS = ["a=1", "B=2", "utm_source=x", "UTM_Campaign=Y", "fbclid=zzz",
          "flag", "", "=bare", "a=1=2", "ref=9", "REF=9", "_ga=G"]
FRAGS = ["", "#f", "#a?b=1", "##"]
WEIRD = ["", " ", "not a url", "mailto:x@y.z", "http//missing.colon",
         "https://", "://host/x", "HTTP://ex.com?#", "http://ex.com?&&",
         "  HTTPS://Pad.Me/x?b=2&a=1#z  ", "http://[::1]:80/x"]


def _gen(rng: random.Random) -> str:
    if rng.random() < 0.15:
        return rng.choice(WEIRD)
    scheme = rng.choice(SCHEMES)
    host = rng.choice(HOSTS)
    path = rng.choice(PATHS)
    q = "&".join(rng.choice(PARAMS) for _ in range(rng.randint(0, 4)))
    frag = rng.choice(FRAGS)
    url = f"{scheme}://{host}{path}"
    if q or rng.random() < 0.2:
        url += "?" + q
    return url + frag


def test_canonical_url_cross_engine(spark):
    from ocaml_rdf_spark.operators.urls import canonical_url, canonical_url_sql

    rng = random.Random(20260817)
    urls = [_gen(rng) for _ in range(400)]
    pdf = pd.DataFrame({"i": range(len(urls)), "url": urls})

    sdf = spark.createDataFrame(pdf)
    got = {
        r["i"]: r["c"]
        for r in sdf.select("i", canonical_url(F.col("url")).alias("c")).collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        r[0]: r[1]
        for r in con.sql(f"SELECT i, {canonical_url_sql('url')} FROM t").fetchall()
    }
    diffs = [(urls[i], got[i], want[i]) for i in got if got[i] != want[i]]
    assert not diffs, diffs[:5]


def test_normalize_literals_cross_engine(spark):
    from ocaml_rdf_spark.operators.canon import normalize_literals

    XSD = "http://www.w3.org/2001/XMLSchema#"
    rng = random.Random(99)
    lexes = ["0", "-0", "+7", "007", "9007199254740993", "1.5", "1.500",
             "-0.000", ".5", "0.0000001", "1e3", "12345678901234567890" * 3,
             "true", "false", "1", "0", "TRUE", "maybe", "", " 1", "1 ",
             "--1", "+.5", "-.", "1.", "nan"]
    dtypes = [XSD + "integer", XSD + "decimal", XSD + "boolean", XSD + "string", None]
    rows = [
        (i, rng.choice(lexes), rng.choice(dtypes)) for i in range(300)
    ]
    pdf = pd.DataFrame(rows, columns=["i", "lex", "dt"])

    quads = spark.createDataFrame(
        [(0, f"s{i}", "p", 2, lx, dt, None, "g") for i, lx, dt in rows],
        "s_kind int, s_lex string, pred string, o_kind int, o_lex string,"
        " o_dtype string, o_lang string, graph string",
    )
    got = {
        int(r["s_lex"][1:]): r["o_lex"]
        for r in normalize_literals(quads).collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    want = {
        r[0]: r[1]
        for r in con.sql(r"""
            SELECT i,
              CASE WHEN dt = 'http://www.w3.org/2001/XMLSchema#integer'
                   THEN COALESCE(CAST(TRY_CAST(lex AS HUGEINT) AS VARCHAR), lex)
                   WHEN dt = 'http://www.w3.org/2001/XMLSchema#decimal'
                   THEN CASE WHEN regexp_matches(lex, '\.\d{6}\d*[1-9]') THEN lex
                        ELSE COALESCE(regexp_replace(regexp_replace(
                          CAST(TRY_CAST(lex AS DECIMAL(38,6)) AS VARCHAR),
                          '^(-?\d+)\.0*$', '\1'), '(\.\d*?)0+$', '\1'), lex) END
                   WHEN dt = 'http://www.w3.org/2001/XMLSchema#boolean'
                   THEN CASE WHEN lex IN ('1','true') THEN 'true'
                             WHEN lex IN ('0','false') THEN 'false' ELSE lex END
                   ELSE lex END
            FROM t""").fetchall()
    }
    diffs = [(rows[i][1], rows[i][2], got[i], want[i]) for i in got if got[i] != want[i]]
    assert not diffs, diffs[:8]


def test_quality_rules_cross_engine(spark):
    """quality_rules vs the suite's DuckDB mirror on seeded-random
    multi-line texts (bullets, ellipses both spellings, hashes, unicode,
    empty/whitespace lines) — the rule battery is regex-heavy dual code."""
    from ocaml_rdf_spark.operators.textops import quality_rules
    from ocaml_rdf_spark.suite import SQL_QUALITY_RULES

    rng = random.Random(7)
    words = ["word", "a", "hyperlongword", "#tag", "x1", "…", "...", "end."]
    line_starts = ["", "- ", "* ", "• ", "  - ", "plain "]
    line_ends = ["", ".", "...", "…", "!", '?"', " "]

    def gen_text():
        lines = []
        for _ in range(rng.randint(0, 6)):
            body = " ".join(rng.choice(words) for _ in range(rng.randint(0, 12)))
            lines.append(rng.choice(line_starts) + body + rng.choice(line_ends))
        return "\n".join(lines)

    rows = [(i, gen_text()) for i in range(250)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])

    sdf = spark.createDataFrame(pdf)
    got = {r["doc_id"]: tuple(r[c] for c in sorted(r.asDict()) if c != "doc_id")
           for r in quality_rules(sdf).collect()}
    con = duckdb.connect()
    con.register("documents", pdf)
    ddf = con.sql(SQL_QUALITY_RULES).df()
    cols = [c for c in sorted(ddf.columns) if c != "doc_id"]
    want = {int(r["doc_id"]): tuple(r[c] for c in cols)
            for r in ddf.to_dict("records")}
    diffs = [(rows[i][1][:60], got[i], want[i]) for i in got if got[i] != want[i]]
    assert not diffs, diffs[:3]
