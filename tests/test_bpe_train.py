"""BPE merge-rule training (textops.bpe_train): known-corpus merges,
greedy non-overlapping apply semantics, and a differential fuzz against
a pure-Python reference implementation (Sennrich-style: regex
non-overlapping replace over the space-joined symbol string)."""

from __future__ import annotations

import random
import re
from collections import Counter

from ocaml_rdf_spark.operators.textops import bpe_train


def _bpe_py(texts: list[str], n_merges: int) -> list[tuple[int, str, str, int]]:
    words = Counter()
    for t in texts:
        t = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip()
        for w in t.split(" "):
            if w:
                words[w] += 1
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in words.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += f
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, n))
        new_vocab = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def _run(spark, texts, n):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train(df, n_merges=n).orderBy("rank").collect()
    ]


def test_known_corpus_first_merges(spark):
    # 'low' x5, 'lower' x2: '</w>'-terminated chars; most frequent pair is
    # (l, o) with count 7; then (lo, w) 7; then w</w> from 'low' x5
    texts = ["low low low low low", "lower lower"]
    got = _run(spark, texts, 3)
    assert got[0] == (1, "l", "o", 7)
    assert got[1] == (2, "lo", "w", 7)
    assert got[2] == (3, "low", "</w>", 5)


def test_overlapping_merge_is_non_overlapping_greedy(spark):
    # 'aaaa' -> [a,a,a,a,</w>]; merge (a,a) applied greedily gives
    # [aa,aa,</w>] (an overlapping-buggy apply would leave [aa,a,a,</w>]
    # and change every later round) — pin rounds 1-4 to the reference
    # mirror, and assert round 1 and the (a,a)-is-gone consequence
    texts = ["aaaa bbbb", "aaaa bbbb", "aaaa bbbb"]
    got = _run(spark, texts, 4)
    assert got == _bpe_py(texts, 4)
    assert got[0][1:4] == ("a", "a", 9)
    assert all((l, r) != ("a", "a") for _, l, r, _ in got[1:])


def test_differential_vs_python_reference(spark):
    rng = random.Random(20260819)
    alphabet = "abcde "
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(5, 60)))
        for _ in range(30)
    ]
    assert _run(spark, texts, 8) == _bpe_py(texts, 8)


def test_large_n_merges_no_per_round_jobs(spark):
    """r4 rewrite: phase 2 is driver-local (incremental pair counts), so
    a tokenizer-sized merge count is cheap — 200 merges over a small
    corpus still matches the mirror exactly and runs no per-round Spark
    jobs (the loop never touches a DataFrame)."""
    rng = random.Random(20260821)
    alphabet = "abcdefg "
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(10, 80)))
        for _ in range(60)
    ]
    assert _run(spark, texts, 200) == _bpe_py(texts, 200)


def test_vocab_guard_fires(spark):
    import pytest

    df = spark.createDataFrame([("aa bb cc dd ee",)], "text string")
    with pytest.raises(ValueError, match="max_vocab_rows"):
        bpe_train(df, n_merges=2, max_vocab_rows=3)
