"""Differential fuzz: the engine's ORDER BY total order (functions/terms
:: sort_key, evaluated by Spark's struct ordering) vs an independent
Python reference of the documented order — SPARQL §15.1 (unbound < bnode
< IRI < literal, numeric/date literals by value) plus the engine's
deterministic extension (triple terms last; value ties broken by lexical
then language). Random mixed-kind term lists, including numeric lexical
variants ("1" vs "1.0" vs "+1"), invalid numerics, dates, lang tags, and
quoted triples."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from ocaml_rdf_spark.functions.terms import sort_key
from ocaml_rdf_spark.types import XSD_NS

XSD_INT = XSD_NS + "integer"
XSD_DEC = XSD_NS + "decimal"
XSD_DBL = XSD_NS + "double"
XSD_STR = XSD_NS + "string"
XSD_DT = XSD_NS + "dateTime"
LANGSTR = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

# term 4-tuples (kind, lex, dtype, lang); kind 3 lex uses the QT encoding
num_lex = st.one_of(
    st.integers(-50, 50).map(str),
    st.integers(-50, 50).map(lambda i: f"+{i}" if i >= 0 else str(i)),
    st.tuples(st.integers(-9, 9), st.integers(0, 99)).map(lambda t: f"{t[0]}.{t[1]:02d}"),
    st.just("abc"),  # invalid numeric lexical → not a number, lex-ordered
    st.just(""),
)
word = st.text(alphabet="abcxyz<>\"'0129 ", max_size=6)

terms = st.one_of(
    st.none(),  # unbound
    word.map(lambda w: (1, "b" + w.replace(" ", ""), None, None)),
    word.map(lambda w: (0, "http://x/" + w.replace(" ", ""), None, None)),
    st.tuples(num_lex, st.sampled_from([XSD_INT, XSD_DEC, XSD_DBL])).map(
        lambda t: (2, t[0], t[1], None)
    ),
    word.map(lambda w: (2, w, XSD_STR, None)),
    st.tuples(word, st.sampled_from(["en", "de", "en-GB"])).map(
        lambda t: (2, t[0], LANGSTR, t[1])
    ),
    st.integers(0, 3).map(
        lambda d: (2, f"2024-01-0{d+1}T0{d}:00:00", XSD_DT, None)
    ),
    word.map(
        lambda w: (
            3,
            f"0\x1ehttp://x/{w.replace(' ', '')}\x1e\x1e\x1f0\x1ehttp://p/\x1e\x1e\x1f2\x1ev\x1e{XSD_STR}\x1e",
            None,
            None,
        )
    ),
)


def _ref_key(t):
    """Independent reference of the documented total order."""
    if t is None:
        return (0, 0.0, 0.0, "", "")
    kind, lex, dtype, lang = t
    rank = {1: 1, 0: 2, 2: 3, 3: 4}[kind]
    # numeric value (nulls-first encoded as -inf sentinel, matching
    # Spark's struct comparison where a null field sorts first asc)
    numv = None
    if kind == 2 and dtype in (XSD_INT, XSD_DEC, XSD_DBL):
        try:
            numv = float(lex)
        except ValueError:
            numv = None
    tsv = None
    if kind == 2 and dtype == XSD_DT:
        tsv = dt.datetime.fromisoformat(lex).timestamp()
    NEG = float("-inf")
    return (
        rank,
        NEG if numv is None else numv,
        NEG if tsv is None else tsv,
        lex,
        "" if lang is None else "\x01" + lang,  # null lang sorts first
    )


@pytest.mark.usefixtures("spark")
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.lists(terms, min_size=1, max_size=40))
def test_total_order_matches_reference(spark, data):
    rows = [(i, t) for i, t in enumerate(data)]
    df = spark.createDataFrame(
        rows, "i long, x struct<kind:tinyint,lex:string,dtype:string,lang:string>"
    )
    got = [r["i"] for r in df.orderBy(sort_key(F.col("x")).asc(), F.col("i").asc()).collect()]
    want = [i for i, _t in sorted(rows, key=lambda r: (_ref_key(r[1]), r[0]))]
    assert got == want
