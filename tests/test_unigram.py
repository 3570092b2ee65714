"""Unigram-LM tokenizer training (textops.unigram_train): known-corpus
piece discovery + differential fuzz against an INDEPENDENTLY written
pure-Python mirror (dict-based EM over explicit segmentation
enumeration, not the library's forward-backward lattice)."""

from __future__ import annotations

import math
import random
import re
from collections import Counter

import pytest

from ocaml_rdf_spark.operators.textops import unigram_train


def _mirror(texts, vocab_size, seed_size, max_piece_len, n_em_rounds, prune_frac):
    words = Counter()
    for t in texts:
        t = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", t.lower())).strip()
        for w in t.split(" "):
            if w:
                words[w] += 1
    wlist = sorted(words.items())
    subw = Counter()
    for w, f in wlist:
        for L in range(1, min(max_piece_len, len(w)) + 1):
            for i in range(len(w) - L + 1):
                subw[w[i : i + L]] += f
    seed = sorted(subw.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    chars = sorted({c for w, _ in wlist for c in w})
    pieces = sorted({p for p, _ in seed} | set(chars))

    def segmentations(w, pset, maxlen):
        # explicit enumeration with memo — deliberately different
        # formulation from the library's forward-backward
        memo = {}

        def rec(j):
            if j == len(w):
                return [[]]
            if j in memo:
                return memo[j]
            out = []
            for L in range(1, min(maxlen, len(w) - j) + 1):
                p = w[j : j + L]
                if p in pset:
                    for rest in rec(j + L):
                        out.append([p] + rest)
            memo[j] = out
            return out

        return rec(0)

    def em(pieces_list, probs, rounds):
        pr = dict(zip(pieces_list, probs))
        maxlen = max(len(p) for p in pieces_list)
        pset = set(pieces_list)
        for _ in range(rounds):
            exp = Counter()
            for w, f in wlist:
                segs = segmentations(w, pset, maxlen)
                seg_ps = [math.prod(pr[p] for p in seg) for seg in segs]
                z = sum(seg_ps)
                if z <= 0:
                    continue
                for seg, sp in zip(segs, seg_ps):
                    share = f * sp / z
                    for p in seg:
                        exp[p] += share
            zz = sum(exp.values())
            if zz <= 0:
                break
            pr = {p: max(exp.get(p, 0.0) / zz, 1e-12) for p in pieces_list}
        return [pr[p] for p in pieces_list]

    probs = em(pieces, [1.0 / len(pieces)] * len(pieces), n_em_rounds)
    char_set = set(chars)
    while len(pieces) > max(vocab_size, len(char_set)):
        n_drop = min(
            max(1, int(len(pieces) * prune_frac)),
            len(pieces) - max(vocab_size, len(char_set)),
        )
        order = sorted(
            range(len(pieces)),
            key=lambda i: (pieces[i] in char_set, probs[i], pieces[i]),
        )
        drop = {i for i in order[:n_drop] if pieces[i] not in char_set}
        if not drop:
            break
        keep = [i for i in range(len(pieces)) if i not in drop]
        pieces = [pieces[i] for i in keep]
        kept = [probs[i] for i in keep]
        z = sum(kept)
        probs = [p / z for p in kept]
        probs = em(pieces, probs, 1)
    out = sorted(
        ((p, probs[i], p in char_set) for i, p in enumerate(pieces)),
        key=lambda t: (-t[1], t[0]),
    )
    return [(p, int(round(math.log(pr) * 1_000_000)), c) for p, pr, c in out]


def _run(spark, texts, **kw):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        (r["piece"], r["logprob_ppm"], r["is_char"])
        for r in unigram_train(df, **kw).collect()
    ]


def test_frequent_multichar_piece_wins(spark):
    texts = ["abab abab abab cd", "abab abab cd cd"]
    got = _run(spark, texts, vocab_size=8, seed_size=32, max_piece_len=4)
    pieces = [p for p, _, _ in got]
    # 'abab' (or at least 'ab') must outrank bare chars
    top = pieces[0]
    assert top in ("abab", "ab")
    assert set("abcd") <= set(pieces)  # coverage: chars always kept


def test_matches_independent_mirror(spark):
    rng = random.Random(20260821)
    texts = [
        "".join(rng.choice("abc ") for _ in range(rng.randint(8, 40)))
        for _ in range(20)
    ]
    kw = dict(vocab_size=10, seed_size=40, max_piece_len=3, n_em_rounds=3, prune_frac=0.25)
    got = _run(spark, texts, **kw)
    want = _mirror(texts, **kw)
    # piece sets and ppm log-probs must agree (±1 ppm for float rounding)
    assert [p for p, _, _ in got] == [p for p, _, _ in want]
    for (p1, lp1, c1), (p2, lp2, c2) in zip(got, want):
        assert c1 == c2 and abs(lp1 - lp2) <= 1, (p1, lp1, lp2)


def test_vocab_size_respected(spark):
    texts = ["the quick brown fox jumps over the lazy dog"] * 3
    got = _run(spark, texts, vocab_size=30, seed_size=200, max_piece_len=5)
    n_chars = len({c for c in "thequickbrownfoxjumpsoverlazydg"})
    assert max(30, n_chars) >= len(got) >= n_chars


def test_encode_viterbi_matches_mirror(spark):
    from ocaml_rdf_spark.operators.textops import unigram_encode, unigram_train

    texts = ["abab abab cd abab", "ababcd cd ab"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    pieces = unigram_train(df, vocab_size=8, seed_size=32, max_piece_len=4)
    ptab = {r["piece"]: r["logprob_ppm"] for r in pieces.collect()}
    maxlen = max(len(p) for p in ptab)

    def viterbi(w):
        NEG = float("-inf")
        best, back = [NEG] * (len(w) + 1), [None] * (len(w) + 1)
        best[0] = 0.0
        for j in range(1, len(w) + 1):
            for L in range(min(maxlen, j), 0, -1):
                p = w[j - L : j]
                if p in ptab and best[j - L] > NEG and best[j - L] + ptab[p] > best[j]:
                    best[j], back[j] = best[j - L] + ptab[p], L
        out, j = [], len(w)
        while j > 0:
            out.append(w[j - back[j] : j])
            j -= back[j]
        return out[::-1]

    got = {r["doc_id"]: r["pieces_ssv"] for r in unigram_encode(df, pieces).collect()}
    for i, t in enumerate(texts):
        want = []
        for w in t.split(" "):
            want.extend(viterbi(w))
        assert got[i] == " ".join(want)
        assert "".join(got[i].split(" ")) == t.replace(" ", "")  # lossless


def test_encode_unk_for_uncovered(spark):
    from ocaml_rdf_spark.operators.textops import unigram_encode

    df = spark.createDataFrame([(0, "xyz ab")], "doc_id long, text string")
    pieces = spark.createDataFrame(
        [("a", -100000, True), ("b", -120000, True)],
        "piece string, logprob_ppm long, is_char boolean",
    )
    got = unigram_encode(df, pieces).collect()[0]
    assert got["pieces_ssv"] == "<unk> a b"
