"""Per-doc n-gram novelty vs an exact Python mirror: duplicates score
zero, short docs emit nothing, order defines ownership."""

from __future__ import annotations

import random


def _mirror(docs, n=3):
    gramsets = {}
    for i, text in docs:
        ws = text.strip().split()
        gs = {" ".join(ws[j:j + n]) for j in range(len(ws) - n + 1)} if len(ws) >= n else set()
        gramsets[i] = gs
    owner = {}
    for i in sorted(gramsets):
        for g in gramsets[i]:
            owner.setdefault(g, i)
    out = {}
    for i, gs in gramsets.items():
        if not gs:
            continue
        new = sum(1 for g in gs if owner[g] == i)
        out[i] = (len(gs), new, 1_000_000 * new // len(gs))
    return out


def _run(spark, docs, n=3):
    from ocaml_rdf_spark.operators.textops import novelty_scores

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_grams"], r["n_new"], r["novelty_ppm"])
        for r in novelty_scores(df, n=n).collect()
    }


def test_novelty_duplicate_scores_zero(spark):
    docs = [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w")]
    out = _run(spark, docs)
    assert out == _mirror(docs)
    assert out[1][2] == 1_000_000 and out[2][2] == 0 and out[3][2] == 1_000_000


def test_novelty_partial_overlap(spark):
    docs = [(1, "a b c d"), (2, "b c d e")]
    out = _run(spark, docs)
    assert out == _mirror(docs)
    # doc 2 grams: "b c d" (seen), "c d e" (new) → 500000
    assert out[2] == (2, 1, 500_000)


def test_novelty_short_docs_emit_nothing(spark):
    docs = [(1, "a b"), (2, ""), (3, "x y z")]
    out = _run(spark, docs)
    assert out == _mirror(docs)
    assert set(out) == {3}


def test_novelty_random_vs_mirror(spark):
    rng = random.Random(2929)
    vocab = list("abcdefg")
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12))))
        for i in range(25)
    ]
    assert _run(spark, docs) == _mirror(docs)
