"""Differential fuzz for the newest text/curation operators — chunk_docs,
tfidf_pairs, score_resample — vs independent DuckDB mirrors on
hypothesis-random documents. The suite oracles pin one corpus shape;
these drive the same code over adversarial inputs (empty docs,
punctuation-only, repeated tokens, boundary-length token streams)."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small vocab + punctuation noise so normalization paths are exercised
word = st.sampled_from(["aa", "bb", "Cc", "d9", "!!", "", "e e"])
doc = st.lists(word, min_size=0, max_size=20).map(" ".join)
docs_st = st.lists(doc, min_size=1, max_size=10)

_TOKS = """
nt AS (
  SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
  FROM t
)
"""


def _setup(spark, texts):
    rows = [(i, s) for i, s in enumerate(texts)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    return sdf, con


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(texts=docs_st, chunk=st.integers(2, 6), overlap=st.integers(0, 3))
def test_chunk_docs_fuzz(spark, texts, chunk, overlap):
    from ocaml_rdf_spark.operators.textops import chunk_docs

    if overlap >= chunk:
        overlap = chunk - 1
    step = chunk - overlap
    sdf, con = _setup(spark, texts)
    got = sorted(map(tuple, chunk_docs(sdf, chunk, overlap).collect()))
    want = sorted(map(tuple, con.execute(f"""
        WITH {_TOKS},
        d AS (SELECT doc_id, toks, len(toks) AS n FROM nt
              WHERE len(toks) > 0 AND toks[1] <> ''),
        c AS (
          SELECT doc_id, CAST(i AS BIGINT) AS chunk_id, n, toks
          FROM d, unnest(range(0,
            CASE WHEN n <= {chunk} THEN 1 ELSE 1 + (n - {chunk} + {step} - 1) // {step} END)) AS u(i)
        )
        SELECT doc_id, chunk_id, CAST(chunk_id * {step} AS BIGINT),
               CAST(LEAST({chunk}, n - chunk_id * {step}) AS BIGINT),
               array_to_string(list_slice(toks, chunk_id * {step} + 1, chunk_id * {step} + {chunk}), ' ')
        FROM c
    """).fetchall()))
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(texts=docs_st, cap=st.integers(1, 8), min_shared=st.integers(1, 3))
def test_tfidf_pairs_fuzz(spark, texts, cap, min_shared):
    from ocaml_rdf_spark.operators.textops import tfidf_pairs

    sdf, con = _setup(spark, texts)
    got = sorted(map(tuple, tfidf_pairs(sdf, df_cap=cap, min_shared=min_shared).collect()))
    want = sorted(map(tuple, con.execute(f"""
        WITH {_TOKS},
        toks AS (
          SELECT DISTINCT doc_id, toks[i] AS tok
          FROM nt, unnest(range(1, len(toks) + 1)) AS u(i)
          WHERE toks[i] <> ''
        ),
        dfreq AS (SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok),
        rare AS (SELECT tok, 1000000 // df AS w FROM dfreq WHERE df <= {cap}),
        post AS (SELECT x.doc_id, x.tok, r.w FROM toks x JOIN rare r USING (tok)),
        pairs AS (
          SELECT p1.doc_id AS a, p2.doc_id AS b, p1.w
          FROM post p1 JOIN post p2 ON p1.tok = p2.tok AND p1.doc_id < p2.doc_id
        )
        SELECT a, b, CAST(COUNT(*) AS BIGINT), CAST(SUM(w) AS BIGINT)
        FROM pairs GROUP BY a, b HAVING COUNT(*) >= {min_shared}
    """).fetchall()))
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(
    scores=st.lists(st.integers(-5, 3000), min_size=1, max_size=30),
    max_score=st.integers(1, 2000),
)
def test_score_resample_fuzz(spark, scores, max_score):
    from ocaml_rdf_spark.operators.sketches import score_resample

    rows = [(i, s) for i, s in enumerate(scores)]
    sdf = spark.createDataFrame(rows, "doc_id long, score long")
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, score BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got = sorted(map(tuple, score_resample(sdf, "doc_id", "score", max_score).collect()))
    want = sorted(map(tuple, con.execute(f"""
        SELECT doc_id, score,
               (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % {max_score})
                 < LEAST(score, {max_score}) AS kept
        FROM t
    """).fetchall()))
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(
        st.sampled_from(["https://x.ex/a", "/rel/p", "//y.ex/q", "#f", "mailto:a@b", ""]),
        st.text(alphabet="ab <>&\n\t", max_size=8),
    ),
    max_size=5,
))
def test_extract_links_fuzz(spark, anchors):
    """extract_links (Java-regex column algebra) vs a pure-Python re
    mirror on randomized href kinds + anchor bodies (anchor text uses a
    tag-free alphabet after escaping — the operator's documented
    contract excludes nested markup)."""
    import re as _re

    from ocaml_rdf_spark.operators.weblinks import extract_links

    def esc(t):
        return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    src = "http://s.ex/d/1"
    html = "".join(f'<a href="{h}">{esc(a)}</a>' for h, a in anchors)
    df = spark.createDataFrame([(src, html)], ["url", "html"])
    got = sorted((r.dst_url, r.anchor) for r in extract_links(df).collect())

    want = []
    for h, a in [(m.group(1), m.group(2)) for m in
                 _re.finditer(r'<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>', html)]:
        if _re.match(r"^https?://", h):
            dst = h
        elif h.startswith("//"):
            dst = "http:" + h
        elif h.startswith("/"):
            dst = "http://s.ex" + h
        else:
            continue
        dst = _re.sub(r"#.*$", "", dst)
        if dst:
            want.append((dst, _re.sub(r"\s+", " ", a).strip()))
    assert got == sorted(want)


@given(
    st.lists(
        st.text(alphabet="abcdefghy .!?XYZ'", min_size=0, max_size=30),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_readability_matches_python_reference(spark, texts):
    """Flesch-Kincaid integer recipe: Spark column algebra == a direct
    Python re-implementation of the documented formula on arbitrary
    punctuation/whitespace soup."""
    import re as _re

    from ocaml_rdf_spark.operators.textops import readability

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in readability(df).collect()}
    for i, t in enumerate(texts):
        n_sent = max(len(_re.findall(r"[.!?]+", t)), 1)
        toks = _re.findall(r"[^ \t\n]+", t.lower())
        n_words = max(len(toks), 1)
        n_syll = sum(max(len(_re.findall(r"[aeiouy]+", w)), 1) for w in toks)
        fk = (390000 * n_words) // n_sent + (11800000 * n_syll) // n_words - 15590000
        r = got[i]
        assert (r["n_sentences"], r["n_words"], r["n_syllables"]) == (n_sent, n_words, n_syll)
        assert r["fk_grade_ppm"] == fk
