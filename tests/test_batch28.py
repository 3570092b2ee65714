"""Batch-28: odds-ratio distinctive terms and Fano-factor burstiness,
vs exact Python mirrors."""

from __future__ import annotations

import random


def _dt_mirror(docs, k, min_count):
    cell, gtot, ttot, at = {}, {}, {}, 0
    for g, text in docs:
        for t in text.strip().split():
            cell[(g, t)] = cell.get((g, t), 0) + 1
            gtot[g] = gtot.get(g, 0) + 1
            ttot[t] = ttot.get(t, 0) + 1
            at += 1
    scored = {}
    for (g, t), n in cell.items():
        if n < min_count:
            continue
        a, b = n + 1, gtot[g] - n + 1
        c, d = ttot[t] - n + 1, at - gtot[g] - ttot[t] + n + 1
        scored.setdefault(g, []).append((1_000_000 * a * d // (b * c), t, n))
    out = {}
    for g, rows in scored.items():
        rows.sort(key=lambda r: (-r[0], r[1]))
        for rank, (o, t, n) in enumerate(rows[:k], 1):
            out[(g, t)] = (n, o, rank)
    return out


def _dt_run(spark, docs, k, min_count):
    from ocaml_rdf_spark.operators.textops import distinctive_terms

    df = spark.createDataFrame(docs, "lang string, text string")
    out = distinctive_terms(df, "lang", "text", k=k, min_count=min_count)
    return {(r["grp"], r["token"]): (r["n_in"], r["or_x1e6"], r["rank"])
            for r in out.collect()}


def test_distinctive_planted_markers_rank_first(spark):
    docs = []
    for g, marker in (("en", "hello"), ("de", "hallo")):
        docs += [(g, f"common words here {marker}")] * 10
    out = _dt_run(spark, docs, k=2, min_count=5)
    assert out == _dt_mirror(docs, 2, 5)
    assert out[("en", "hello")][2] == 1 and out[("de", "hallo")][2] == 1
    # shared tokens have OR ≈ 1e6 (balanced groups) — far below markers
    assert out[("en", "hello")][1] > 10 * out.get(("en", "common"), (0, 1, 0))[1]


def test_distinctive_min_count_gate_and_tie_order(spark):
    docs = [("a", "x x x x x y"), ("b", "z z z z z y")]
    out = _dt_run(spark, docs, k=5, min_count=5)
    assert out == _dt_mirror(docs, 5, 5)
    assert ("a", "y") not in out  # below min_count


def test_distinctive_random_vs_mirror(spark):
    rng = random.Random(2828)
    vocab = [f"w{i}" for i in range(8)]
    docs = [
        (rng.choice("ab"), " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 15))))
        for _ in range(40)
    ]
    assert _dt_run(spark, docs, 3, 2) == _dt_mirror(docs, 3, 2)


def _fano_mirror(docs, min_total):
    per_doc = {}
    for i, (_id, text) in enumerate(docs):
        for t in text.strip().split():
            per_doc[(i, t)] = per_doc.get((i, t), 0) + 1
    agg = {}
    for (_i, t), x in per_doc.items():
        nw, tot, sx2 = agg.get(t, (0, 0, 0))
        agg[t] = (nw + 1, tot + x, sx2 + x * x)
    nd = len(docs)
    return {
        t: (nw, tot, 1_000_000 * (nd * sx2 - tot * tot) // ((nd - 1) * tot))
        for t, (nw, tot, sx2) in agg.items() if tot >= min_total
    }


def _fano_run(spark, docs, min_total):
    from ocaml_rdf_spark.operators.textops import burstiness

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r["token"]: (r["n_docs_with"], r["total"], r["fano_ppm"])
            for r in burstiness(df, "text", min_total=min_total).collect()}


def test_fano_uniform_token_is_subpoisson(spark):
    # exactly once per doc: variance 0 → Fano 0
    docs = [(i, "the filler") for i in range(60)]
    out = _fano_run(spark, docs, min_total=50)
    assert out == _fano_mirror(docs, 50)
    assert out["the"][2] == 0


def test_fano_bursty_token_overdispersed(spark):
    docs = [(i, "base " + ("burst " * 10 if i % 10 == 0 else "")) for i in range(100)]
    out = _fano_run(spark, docs, min_total=50)
    assert out == _fano_mirror(docs, 50)
    assert out["burst"][2] > 5_000_000 and out["base"][2] == 0


def test_fano_random_vs_mirror(spark):
    rng = random.Random(2829)
    vocab = ["p", "q", "r"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(10, 40))))
        for i in range(30)
    ]
    assert _fano_run(spark, docs, 20) == _fano_mirror(docs, 20)
