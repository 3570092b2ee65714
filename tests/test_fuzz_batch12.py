"""Seeded differential fuzz for the batch-12 operators: random inputs vs
exact Python mirrors / structural invariants (the test_scc_fuzz /
pivot_clusters differential pattern — deterministic seeds, no flaky RNG)."""

import hashlib
import random

SCALE = 10**6


def _toks(rng, n, vocab):
    return [rng.choice(vocab) for _ in range(n)]


def test_cdc_chunks_fuzz_invariants(spark):
    from ocaml_rdf_spark.operators.textops import cdc_chunks

    rng = random.Random(1234)
    vocab = [f"w{j}" for j in range(12)]
    docs = []
    for d in range(30):
        n = rng.randint(0, 40)
        docs.append((f"d{d:02d}", " ".join(_toks(rng, n, vocab))))
    df = spark.createDataFrame(docs, "doc_id string, text string")
    w, mod = 3, 4
    rows = cdc_chunks(df, w=w, mod=mod).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in docs:
        toks = text.split() if text else [""]
        cs = sorted(by_doc[doc_id], key=lambda r: r["chunk_ix"])
        # tiling: starts at 1, contiguous, ends at n
        assert cs[0]["start_tok"] == 1
        for a, b in zip(cs, cs[1:]):
            assert b["start_tok"] == a["end_tok"] + 1
        assert cs[-1]["end_tok"] == len(toks)
        for c in cs:
            # every chunk hash is the md5 of its token slice
            piece = " ".join(toks[c["start_tok"] - 1 : c["end_tok"]])
            assert c["chunk_hash"] == hashlib.md5(piece.encode()).hexdigest()
            # every non-initial boundary is a content anchor
            if c["start_tok"] > 1:
                g = " ".join(toks[c["start_tok"] - 1 : c["start_tok"] - 1 + w])
                hv = int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
                assert hv % mod == 0, (doc_id, c["start_tok"], g)


def _py_greedy_cover(doc_grams, k):
    covered, out = set(), []
    for rnd in range(1, k + 1):
        gains = sorted(
            ((len(gs - covered), d) for d, gs in doc_grams.items()),
            key=lambda t: (-t[0], t[1]),
        )
        g, d = gains[0]
        if g == 0:
            break
        out.append((rnd, d, g))
        covered |= doc_grams[d]
    return out


def test_coverage_select_fuzz_vs_python(spark):
    from ocaml_rdf_spark.operators.selection import coverage_select

    rng = random.Random(77)
    vocab = [f"t{j}" for j in range(8)]
    for trial in range(3):
        docs = []
        for d in range(12):
            n = rng.randint(3, 25)
            docs.append((f"x{d:02d}", " ".join(_toks(rng, n, vocab))))
        df = spark.createDataFrame(docs, "doc_id string, text string")
        got = sorted(
            coverage_select(df, k=4, w=3).collect(), key=lambda r: r["round"]
        )
        doc_grams = {
            d: {
                " ".join(t.split()[i : i + 3])
                for i in range(len(t.split()) - 2)
            }
            for d, t in docs
            if len(t.split()) >= 3
        }
        want = _py_greedy_cover(doc_grams, 4)
        assert [(r["round"], r["doc_id"], r["gain"]) for r in got] == want, trial


def test_dawid_skene_fuzz_vs_mirror(spark):
    from ocaml_rdf_spark.operators.stats import dawid_skene

    from tests.test_dawid_skene import _mirror

    rng = random.Random(5150)
    for trial in range(2):
        rows = []
        raters = ["r1", "r2", "r3", "r4"]
        labels = ["A", "B", "C"]
        for i in range(25):
            for r in raters:
                if rng.random() < 0.8:  # missing labels are part of the shape
                    rows.append((f"i{i:02d}", r, rng.choice(labels)))
        df = spark.createDataFrame(rows, "item string, rater string, label string")
        got = {
            (r["item"], r["cls"]): r["post_ppm"]
            for r in dawid_skene(df, iters=2).collect()
        }
        assert got == _mirror(rows, 2), trial
