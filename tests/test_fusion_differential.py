"""Differential fuzz: knowledge fusion (fuse_functional / truth_discovery)
vs an independent pure-Python mirror on hypothesis-random multi-source
claim sets. The suite oracles pin the operators on ONE structured
conflict corpus (supplier nations, 3 sources); these drive the same
DataFrame code over random claim matrices — duplicate assertions,
single-source facts, all-way ties, sources with disjoint fact sets —
where hand-reasoning misses corners. Vote mass is integer by design, so
every comparison is equality."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

claim = st.tuples(
    st.integers(0, 3),  # subject id
    st.integers(0, 4),  # value id
    st.integers(0, 3),  # source id
)
claims_st = st.lists(claim, min_size=1, max_size=20)

_SETTINGS = dict(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _qdf(spark, claims):
    rows = [(f"e{s}", f"v{v}", f"g{g}") for s, v, g in claims]
    df = spark.createDataFrame(rows, "s_lex string, o_lex string, graph string")
    n = F.lit(None).cast("string")
    return df.select(
        F.lit(0).cast("tinyint").alias("s_kind"),
        "s_lex",
        F.lit("urn:p:x").alias("pred"),
        F.lit(0).cast("tinyint").alias("o_kind"),
        "o_lex",
        n.alias("o_dtype"),
        n.alias("o_lang"),
        "graph",
    )


def _mirror_vote(claims, weights=None):
    """Pure-Python fuse_functional: claims = {(subj, val, src)};
    weights: src -> int (default 1). Returns {subj: (winner, votes,
    total, n_values)} with the (votes desc, value asc) tie-break."""
    dedup = {(s, v, g) for s, v, g in claims}
    votes: dict = {}
    for s, v, g in dedup:
        w = 1 if weights is None else weights.get(g, 0)
        votes.setdefault(s, {}).setdefault(v, 0)
        votes[s][v] += w
    out = {}
    for s, vals in votes.items():
        winner = sorted(vals.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out[s] = (winner[0], winner[1], sum(vals.values()), len(vals))
    return out


def _mirror_truth(claims, scale=1000):
    """Pure-Python truth_discovery(iters=2)."""
    r1 = _mirror_vote(claims)
    dedup = {(s, v, g) for s, v, g in claims}
    per_src: dict = {}
    for s, v, g in dedup:
        ok = 1 if r1[s][0] == v else 0
        n, c = per_src.get(g, (0, 0))
        per_src[g] = (n + 1, c + ok)
    weights = {g: c * scale // n for g, (n, c) in per_src.items()}
    return _mirror_vote(claims, weights)


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(claims=claims_st)
def test_fuse_functional_fuzz(spark, claims):
    from ocaml_rdf_spark.operators.fusion import fuse_functional

    got = {
        r["s_lex"]: (r["o_lex"], r["votes"], r["total_votes"], r["n_values"])
        for r in fuse_functional(_qdf(spark, claims)).collect()
    }
    want = {
        f"e{s}": (f"v{w}", vo, t, nv)
        for s, (w, vo, t, nv) in _mirror_vote(claims).items()
    }
    assert got == want


@pytest.mark.usefixtures("spark")
@settings(**_SETTINGS)
@given(claims=claims_st)
def test_truth_discovery_fuzz(spark, claims):
    from ocaml_rdf_spark.operators.fusion import truth_discovery

    got = {
        r["s_lex"]: (r["o_lex"], r["votes"], r["total_votes"])
        for r in truth_discovery(_qdf(spark, claims), iters=2, scale=1000).collect()
    }
    want = {
        f"e{s}": (f"v{w}", vo, t)
        for s, (w, vo, t, _nv) in _mirror_truth(claims).items()
    }
    assert got == want
