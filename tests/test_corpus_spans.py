"""Unit tests for decontaminate() and span_dedup() (operators/textops.py):
edge cases the sf-level oracle parity test can't isolate — short docs,
empty benchmark sets, exact clone detection, stride behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocaml_rdf_spark.operators.textops import decontaminate, span_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_contained_doc(spark):
    eight = "a b c d e f g h"
    docs = _docs(
        spark,
        [
            (1, eight + " extra tail words here"),   # shares the bench 8-gram
            (2, "totally different content " * 4),   # no overlap
            (3, "tiny"),                             # < 8 tokens -> 0 grams
        ],
    )
    bench = spark.createDataFrame([(eight,)], "text string")
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=8, threshold_pct=10).collect()}
    assert out[1]["n_matched"] == 1 and out[1]["flagged"] == 1
    assert out[2]["n_matched"] == 0 and out[2]["flagged"] == 0
    assert out[3]["n_grams"] == 0 and out[3]["contam_pct"] == 0
    # every corpus doc gets a row even with zero overlap
    assert set(out) == {1, 2, 3}


def test_decontaminate_normalizes_case_and_punct(spark):
    docs = _docs(spark, [(1, "The Quick, Brown FOX jumps over the lazy dog!!")])
    bench = spark.createDataFrame([("the quick brown fox jumps over the lazy dog",)], "text string")
    row = decontaminate(docs, bench, n=8, threshold_pct=50).collect()[0]
    assert row["n_matched"] > 0 and row["flagged"] == 1


def test_decontaminate_empty_bench(spark):
    docs = _docs(spark, [(1, "one two three four five six seven eight nine")])
    bench = spark.createDataFrame([], "text string")
    row = decontaminate(docs, bench).collect()[0]
    assert row["n_matched"] == 0 and row["flagged"] == 0 and row["n_grams"] == 2


def test_span_dedup_detects_cross_doc_clone(spark):
    clone = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = _docs(
        spark,
        [
            (1, clone + " unique1 unique2 unique3"),
            (2, "other prefix words " + clone),
            (3, "no duplication at all in this document body here"),
        ],
    )
    out = {r["doc_id"]: r for r in span_dedup(docs, w=8).collect()}
    # the shared 8-token run is a duplicated window in BOTH docs
    assert out[1]["n_dup_windows"] >= 1 and out[2]["n_dup_windows"] >= 1
    assert out[3]["n_dup_windows"] == 0 and out[3]["dup_pct"] == 0


def test_span_dedup_repeat_within_one_doc(spark):
    run = "r1 r2 r3 r4 r5 r6 r7 r8"
    docs = _docs(spark, [(1, run + " mid " + run)])
    row = span_dedup(docs, w=8).collect()[0]
    assert row["n_dup_windows"] >= 2  # both occurrences count


def test_span_dedup_short_doc_and_counts(spark):
    docs = _docs(spark, [(1, "a b c"), (2, " ".join(f"t{i}" for i in range(12)))])
    out = {r["doc_id"]: r for r in span_dedup(docs, w=8, stride=1).collect()}
    assert out[1]["n_windows"] == 0
    assert out[2]["n_windows"] == 5  # 12 - 8 + 1


def test_span_dedup_stride(spark):
    docs = _docs(spark, [(1, " ".join(f"t{i}" for i in range(20)))])
    row = span_dedup(docs, w=8, stride=4).collect()[0]
    assert row["n_windows"] == 4  # positions 1,5,9,13 -> (20-8)//4 + 1


def test_pack_offsets_contiguous(spark):
    from ocaml_rdf_spark.operators.textops import pack_offsets

    docs = _docs(
        spark,
        [(i, " ".join(f"w{j}" for j in range(5 + (i * 7) % 11))) for i in range(30)],
    )
    rows = sorted(pack_offsets(docs, seq_len=16, buckets=4).collect(), key=lambda r: r["doc_id"])
    # offsets form an exact prefix sum in doc_id order (no gaps/overlap)
    expect = 0
    for r in rows:
        assert r["tok_offset"] == expect
        expect += r["n_tok"]
    # chunk arithmetic
    for r in rows:
        assert r["first_chunk"] == r["tok_offset"] // 16
        assert r["last_chunk"] == (r["tok_offset"] + r["n_tok"] - 1) // 16
        assert r["n_chunks"] == r["last_chunk"] - r["first_chunk"] + 1


def test_pack_offsets_spanning_doc(spark):
    from ocaml_rdf_spark.operators.textops import pack_offsets

    docs = _docs(spark, [(1, " ".join(["a"] * 10)), (2, " ".join(["b"] * 40)), (3, "c")])
    out = {r["doc_id"]: r for r in pack_offsets(docs, seq_len=16, buckets=2).collect()}
    assert out[1]["first_chunk"] == 0 and out[1]["last_chunk"] == 0
    assert out[2]["tok_offset"] == 10 and out[2]["first_chunk"] == 0 and out[2]["last_chunk"] == 3
    assert out[2]["n_chunks"] == 4
    assert out[3]["tok_offset"] == 50 and out[3]["first_chunk"] == 3


def test_bpe_pair_counts_exact(spark):
    from ocaml_rdf_spark.operators.textops import bpe_pair_counts

    rows = [
        (1, "the cat sat"),          # pairs: "the cat", "cat sat"
        (2, "THE cat! sat."),        # normalizes to the same two pairs
        (3, "cat"),                  # single token: no pairs
        (4, "!!"),                   # no tokens: no pairs
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["pair"]: r["n"] for r in bpe_pair_counts(docs, k=10).collect()}
    assert out == {"the cat": 2, "cat sat": 2}


def test_bpe_pair_counts_topk_tiebreak(spark):
    from ocaml_rdf_spark.operators.textops import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "b a"), (3, "a b")], "doc_id long, text string"
    )
    got = [(r["pair"], r["n"]) for r in bpe_pair_counts(docs, k=2).collect()]
    assert got == [("a b", 2), ("b a", 1)]


def test_nfc_normalize_unifies_hash_keys(spark):
    """Composed and decomposed spellings of the same word must share a
    dedup hash after NFC."""
    from ocaml_rdf_spark.operators.textops import nfc_normalize_col

    rows = [(1, "cafe\u0301"), (2, "caf\u00e9"), (3, "plain")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = docs.select(
        "doc_id", F.md5(nfc_normalize_col(F.col("text"))).alias("h")
    ).collect()
    h = {r["doc_id"]: r["h"] for r in out}
    assert h[1] == h[2]
    assert h[1] != h[3]


def test_bm25_rank_hand_computed(spark):
    """Tiny corpus, every integer verified by hand:
    N=3, L=8; idf_x1k(apple, df=1)=floor(5000/3)=1666,
    idf_x1k(cherry, df=2)=600; tfn doc1(tf=2,dl=3)=floor(352000/265)=1328,
    doc2(tf=1,dl=2)=floor(176000/158)=1113, doc3(tf=3,dl=3)=
    floor(528000/345)=1530."""
    from ocaml_rdf_spark.operators.textops import bm25_rank

    rows = [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry cherry cherry")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["doc_id"], r["score"]) for r in bm25_rank(docs, ["apple", "cherry"], k=5).collect()]
    assert got == [(1, 1666 * 1328), (3, 600 * 1530), (2, 600 * 1113)]


def test_bm25_rank_rare_term_dominates(spark):
    """A doc matching only the rare term outranks one matching only the
    common term (idf monotone in df without the log)."""
    from ocaml_rdf_spark.operators.textops import bm25_rank

    rows = [(i, "common filler words here") for i in range(1, 9)]
    rows += [(9, "rare common"), (10, "common filler")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [r["doc_id"] for r in bm25_rank(docs, ["rare", "common"], k=3).collect()]
    assert got[0] == 9


def test_winnow_guarantee_shared_run(spark):
    """Matching token runs of length >= window + k - 1 (= 8 at k=5, w=4)
    must share at least one fingerprint regardless of offset."""
    from ocaml_rdf_spark.operators.textops import winnow_fingerprints

    clone = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"one two three {clone} four five six"),
        (2, f"{clone} completely different tail words here"),
        (3, "unrelated text with no overlap at all whatsoever ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(docs, k=5, window=4).collect()
    fps = {}
    for r in out:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] & fps[2], "clone run must share a fingerprint"
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])


def test_winnow_density_and_short_doc(spark):
    from ocaml_rdf_spark.operators.textops import winnow_fingerprints

    rows = [(1, "a b c d"), (2, " ".join(f"t{i}" for i in range(30)))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(docs, k=5, window=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["pos"])
    assert 1 not in by_doc          # 4 tokens < k: no grams, no fps
    # 30 tokens -> 26 grams -> 23 full windows; selections are ~1/window
    assert 5 <= len(by_doc[2]) <= 23


def test_clone_pairs_finds_clone_and_guards_boilerplate(spark):
    from ocaml_rdf_spark.operators.textops import clone_pairs

    clone = " ".join(f"c{i}" for i in range(12))
    rows = [
        (1, f"{clone} unique one tail"),
        (2, f"other head {clone}"),
        (3, "totally different words without any shared runs here at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]): r["n_shared"] for r in clone_pairs(docs, min_shared=1).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 1
    assert all(p == (1, 2) for p in got)

    # boilerplate guard: a fingerprint in >max_fp_docs docs never joins
    boiler = " ".join(f"b{i}" for i in range(12))
    many = [(i, f"{boiler} doc specific {i} word") for i in range(1, 6)]
    docs2 = spark.createDataFrame(many, "doc_id long, text string")
    assert clone_pairs(docs2, min_shared=1, max_fp_docs=3).count() == 0


def test_quality_rules_trip_wires(spark):
    from ocaml_rdf_spark.operators.textops import quality_rules

    good = " ".join(["word"] * 60) + "."
    rows = [
        (1, good),                                        # passes all
        (2, "short doc."),                                # word count
        (3, " ".join(["a"] * 60) + "."),                  # mean word len < 3
        (4, "\n".join(f"- item {i}" for i in range(10)) + "\nplain."),  # bullets... 10/11 lines = 90%? floor(1000/11)=90 -> fails <90
        (5, "\n".join((f"cliffhanger {i}..." if i else good) for i in range(4))),  # 3/4 ellipsis = 75%
        (6, " ".join(["#tag"] * 60) + "."),               # hash ratio 100%
        (7, " ".join(["word"] * 60)),                     # no terminal punctuation
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in quality_rules(docs).collect()}
    assert out[1]["keep"] == 1
    for d in (2, 3, 4, 5, 6, 7):
        assert out[d]["keep"] == 0, (d, dict(out[d].asDict()))
    assert out[1]["n_words"] == 60 and out[1]["mean_wl_x100"] < 500
    assert out[4]["bullet_pct"] >= 90
    assert out[5]["ellipsis_pct"] == 75
    assert out[6]["hash_pct"] == 100
    assert out[7]["n_terminal_lines"] == 0


def test_encode_tokens_ranks_and_oov(spark):
    from ocaml_rdf_spark.operators.textops import encode_tokens

    rows = [
        (1, "b b b a a c"),   # freq: b=3, a=2(+1 below)=3... see below
        (2, "a rare"),
    ]
    # corpus counts: b=3, a=3, c=1, rare=1 → rank by (n desc, tok asc):
    # a=1, b=2, c=3, rare=4; vocab_size=3 ⇒ rare is OOV (0)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in encode_tokens(docs, vocab_size=3).collect()}
    assert out[1]["ids_csv"] == "2,2,2,1,1,3"
    assert out[2]["ids_csv"] == "1,0"
    assert out[1]["n_tok"] == 6 and out[2]["n_tok"] == 2


# ---------------------------------------------------------------------------
# bigram LM scoring + count-min sketch
# ---------------------------------------------------------------------------


def test_lm_score_hand_computed(spark):
    from ocaml_rdf_spark.operators.textops import lm_score

    # corpus: "a b" ×3 and "a c" ×1 → n(a,b)=3, n(a,c)=1, n(a,·)=4
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in lm_score(docs).collect()}
    assert out[1]["n_bigrams"] == 1
    assert out[1]["score_sum"] == 750_000  # 1e6 * 3 // 4
    assert out[4]["score_sum"] == 250_000  # 1e6 * 1 // 4
    assert out[1]["score_avg"] == 750_000


def test_lm_score_fluent_beats_shuffled(spark):
    from ocaml_rdf_spark.operators.textops import lm_score

    # repeated fluent sentence vs a one-off scramble of the same words:
    # the scramble's bigrams are rare under the corpus model
    fluent = "the cat sat on the mat"
    docs = spark.createDataFrame(
        [(i, fluent) for i in range(5)] + [(99, "mat the on sat cat the")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["score_avg"] for r in lm_score(docs).collect()}
    assert out[0] > out[99]


def test_lm_score_short_docs_absent(spark):
    from ocaml_rdf_spark.operators.textops import lm_score

    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "a b")], "doc_id long, text string"
    )
    ids = {r["doc_id"] for r in lm_score(docs).collect()}
    assert ids == {3}


def test_cms_overestimates_and_totals(spark):
    import pyspark.sql.functions as F

    from ocaml_rdf_spark.operators.textops import cms_estimate, cms_sketch

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma alpha") for i in range(10)], "doc_id long, text string"
    )
    cells = cms_sketch(docs).collect()
    # every sketch row r sums to the total token count (40)
    per_row = {}
    for r in cells:
        per_row[r["r"]] = per_row.get(r["r"], 0) + r["cnt"]
    assert per_row == {0: 40, 1: 40, 2: 40, 3: 40}
    est = {r["tok"]: r for r in cms_estimate(docs, probe_k=3).collect()}
    assert est["alpha"]["exact_n"] == 20
    for r in est.values():
        assert r["est"] >= r["exact_n"]  # CMS never under-estimates


def test_cms_partitioning_invariant(spark):
    from ocaml_rdf_spark.operators.textops import cms_sketch

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{i % 3} common") for i in range(50)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, cms_sketch(docs.repartition(1)).collect()))
    b = sorted(map(tuple, cms_sketch(docs.repartition(13)).collect()))
    assert a == b


# --- chunk_docs ---------------------------------------------------------------


def test_chunk_docs_offsets_and_overlap(spark):
    from ocaml_rdf_spark.operators.textops import chunk_docs

    toks = [f"w{i}" for i in range(10)]
    docs = _docs(spark, [(1, " ".join(toks))])
    out = sorted(
        chunk_docs(docs, chunk_tokens=4, overlap=1).collect(), key=lambda r: r["chunk_id"]
    )
    # step 3: starts 0,3,6 — the chunk at 6 already covers the final token,
    # so no degenerate tail chunk is emitted
    assert [(r["start_tok"], r["n_toks"]) for r in out] == [(0, 4), (3, 4), (6, 4)]
    assert out[0]["chunk_text"] == "w0 w1 w2 w3"
    assert out[1]["chunk_text"] == "w3 w4 w5 w6"  # 1-token overlap
    assert out[2]["chunk_text"] == "w6 w7 w8 w9"


def test_chunk_docs_single_chunk_and_exact_fit(spark):
    from ocaml_rdf_spark.operators.textops import chunk_docs

    docs = _docs(spark, [(1, "a b c"), (2, " ".join(f"t{i}" for i in range(4)))])
    out = chunk_docs(docs, chunk_tokens=4, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # n <= chunk_tokens → exactly one chunk, even at exact fit
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_toks"] == 3
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_toks"] == 4


def test_chunk_docs_empty_doc_yields_nothing(spark):
    from ocaml_rdf_spark.operators.textops import chunk_docs

    docs = _docs(spark, [(1, ""), (2, "   "), (3, "!!!"), (4, "one")])
    out = chunk_docs(docs, chunk_tokens=4, overlap=1).collect()
    assert {r["doc_id"] for r in out} == {4}


def test_chunk_docs_covers_every_token(spark):
    from ocaml_rdf_spark.operators.textops import chunk_docs

    n = 53
    docs = _docs(spark, [(7, " ".join(f"w{i}" for i in range(n)))])
    out = chunk_docs(docs, chunk_tokens=8, overlap=3).collect()
    covered = set()
    for r in out:
        covered |= set(range(r["start_tok"], r["start_tok"] + r["n_toks"]))
    assert covered == set(range(n))
    # every chunk's text matches its offsets exactly
    for r in out:
        assert r["chunk_text"] == " ".join(
            f"w{i}" for i in range(r["start_tok"], r["start_tok"] + r["n_toks"])
        )


def test_chunk_docs_rejects_bad_overlap(spark):
    from ocaml_rdf_spark.operators.textops import chunk_docs
    import pytest as _pt

    with _pt.raises(ValueError):
        chunk_docs(_docs(spark, [(1, "a")]), chunk_tokens=4, overlap=4)


# --- tfidf_pairs ----------------------------------------------------------------


def test_tfidf_pairs_rare_term_dominates(spark):
    from ocaml_rdf_spark.operators.textops import tfidf_pairs

    docs = _docs(
        spark,
        [
            (1, "alpha beta zzz qqq"),
            (2, "alpha beta zzz qqq"),   # shares rare zzz+qqq with 1
            (3, "alpha beta"),            # shares only common terms
            (4, "alpha beta"),
            (5, "alpha beta"),
            (6, "alpha beta"),
        ],
    )
    out = {(r["a"], r["b"]): (r["shared"], r["w_overlap"]) for r in
           tfidf_pairs(docs, df_cap=3, min_shared=2).collect()}
    # alpha/beta have df 6 > cap → excluded; zzz/qqq df 2 → weight 500k each
    assert out == {(1, 2): (2, 1_000_000)}


def test_tfidf_pairs_set_semantics_and_threshold(spark):
    from ocaml_rdf_spark.operators.textops import tfidf_pairs

    docs = _docs(spark, [(1, "zzz zzz zzz qqq"), (2, "zzz qqq"), (3, "zzz www")])
    out = {(r["a"], r["b"]): r["shared"] for r in
           tfidf_pairs(docs, df_cap=10, min_shared=2).collect()}
    # repeated zzz counts once; (1,3)/(2,3) share only 1 term → filtered
    assert out == {(1, 2): 2}


def test_tfidf_pairs_shingle_terms(spark):
    from ocaml_rdf_spark.operators.textops import tfidf_pairs

    docs = _docs(
        spark,
        [(1, "the quick brown fox jumps"), (2, "a quick brown fox runs"), (3, "the slow red fox sits")],
    )
    out = {(r["a"], r["b"]): r["shared"] for r in
           tfidf_pairs(docs, df_cap=10, min_shared=1, term_ngram=3).collect()}
    # only 1 and 2 share a trigram ("quick brown fox")
    assert out == {(1, 2): 1}


# --- maximal duplicated-span extents (dup_span_extents) -------------------

def test_dup_span_extents_merges_overlaps(spark):
    from ocaml_rdf_spark.operators.textops import dup_span_extents

    # 20-token docs; docs 1 and 2 share tokens 5..16 (12 tokens) -> with
    # w=8 the duplicated window starts are 5..9 in doc1's coordinates,
    # merging into ONE extent [5, 16]; doc3 is clean
    shared = [f"s{i}" for i in range(12)]
    d1 = [f"a{i}" for i in range(4)] + shared + [f"a{i}" for i in range(4, 8)]
    d2 = [f"b{i}" for i in range(4)] + shared + [f"b{i}" for i in range(4, 8)]
    d3 = [f"c{i}" for i in range(20)]
    docs = spark.createDataFrame(
        [(1, " ".join(d1)), (2, " ".join(d2)), (3, " ".join(d3))],
        "doc_id long, text string",
    )
    out = {(r.doc_id): (r.span_start, r.span_end, r.n_dup_windows)
           for r in dup_span_extents(docs, w=8).collect()}
    assert out == {1: (5, 16, 5), 2: (5, 16, 5)}


def test_dup_span_extents_splits_distant_islands(spark):
    from ocaml_rdf_spark.operators.textops import dup_span_extents

    # two copies of an 8-token phrase at positions 1 and 29 of doc1
    # (gap 28 > w) -> two separate extents in doc1; doc2 carries one copy
    ph = [f"p{i}" for i in range(8)]
    d1 = ph + [f"x{i}" for i in range(20)] + ph
    d2 = [f"y{i}" for i in range(6)] + ph + [f"y{i}" for i in range(6, 12)]
    docs = spark.createDataFrame(
        [(1, " ".join(d1)), (2, " ".join(d2))], "doc_id long, text string",
    )
    rows = sorted(
        (r.doc_id, r.span_start, r.span_end) for r in
        dup_span_extents(docs, w=8).collect()
    )
    assert rows == [(1, 1, 8), (1, 29, 36), (2, 7, 14)]
