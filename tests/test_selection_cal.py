"""coverage_select (greedy max-coverage), calibration_report/ECE,
distmult_scores, sentence_langs/code_switch_report.

Each test pins semantics against a hand-computable fixture or an exact
Python mirror; cross-engine value parity lives in the suite oracles
(`coverage_pick`, `calibration`, `distmult_rank`, `lang_spans`,
`code_switch`)."""

from pyspark.sql import functions as F


# ---------------------------------------------------------------- coverage


def _cov_docs(spark):
    # d1 covers A B C D; d2 covers C D E (overlap 2 with d1); d3 is a
    # near-clone of d1 (covers A B C); d4 covers F alone.
    rows = [
        ("d1", "a b c d e f"),          # 3-grams: abc bcd cde def
        ("d2", "c d e f g h"),          # cde def efg fgh
        ("d3", "a b c d e x"),          # abc bcd cde dex? -> abc bcd cde "d e x"
        ("d4", "p q r s"),              # pqr qrs
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def _py_greedy(doc_grams, k):
    covered, out = set(), []
    remaining = {d: set(gs) for d, gs in doc_grams.items()}
    for rnd in range(1, k + 1):
        gains = sorted(
            ((len(gs - covered), d) for d, gs in remaining.items()),
            key=lambda t: (-t[0], t[1]),
        )
        g, d = gains[0]
        out.append((rnd, d, g))
        covered |= remaining[d]
    return out


def _grams(text, w=3):
    t = text.split()
    return {" ".join(t[i : i + w]) for i in range(len(t) - w + 1)}


def test_coverage_select_matches_python_greedy(spark):
    from ocaml_rdf_spark.operators.selection import coverage_select

    docs = _cov_docs(spark)
    got = sorted(
        coverage_select(docs, k=3, w=3).collect(), key=lambda r: r["round"]
    )
    doc_grams = {d: _grams(t) for d, t in [
        ("d1", "a b c d e f"), ("d2", "c d e f g h"),
        ("d3", "a b c d e x"), ("d4", "p q r s"),
    ]}
    want = _py_greedy(doc_grams, 3)
    assert [(r["round"], r["doc_id"], r["gain"]) for r in got] == want
    # the near-clone d3 must NOT be picked while the distinct d4 is
    assert "d4" in {r["doc_id"] for r in got}
    assert "d3" not in {r["doc_id"] for r in got}


def test_coverage_select_saturation_truncates(spark):
    from ocaml_rdf_spark.operators.selection import coverage_select

    # two identical docs + one distinct: after rounds 1-2 every shingle
    # is covered, so round 3 (the clone, gain 0) is NOT emitted
    rows = [("a", "x y z w"), ("b", "x y z w"), ("c", "m n o p")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["round"]: (r["doc_id"], r["gain"])
           for r in coverage_select(docs, k=3, w=3).collect()}
    assert got == {1: ("a", 2), 2: ("c", 2)}  # tie a/b -> min doc_id; no round 3


# ------------------------------------------------------------- calibration


def test_calibration_report_hand_computed(spark):
    from ocaml_rdf_spark.operators.stats import (
        calibration_report,
        expected_calibration_error,
    )

    # bin width 100_000 ppm at bins=10; two populated bins:
    # bin 9 [900k,1M]: scores 900k,1M -> conf 950k, labels 1,1 -> acc 1M, gap 50k
    # bin 1 [100k,200k): scores 150k,150k -> conf 150k, labels 1,0 -> acc 500k, gap 350k
    rows = [(900_000, 1), (1_000_000, 1), (150_000, 1), (150_000, 0)]
    df = spark.createDataFrame(rows, "score_ppm long, label int")
    rep = {r["bin"]: r for r in calibration_report(df).collect()}
    assert set(rep) == {1, 9}
    assert (rep[9]["n"], rep[9]["conf_ppm"], rep[9]["acc_ppm"], rep[9]["gap_ppm"]) == (
        2, 950_000, 1_000_000, 50_000)
    assert (rep[1]["n"], rep[1]["conf_ppm"], rep[1]["acc_ppm"], rep[1]["gap_ppm"]) == (
        2, 150_000, 500_000, 350_000)
    ece = expected_calibration_error(df).collect()[0]
    # (2*50k + 2*350k) div 4 = 200k; mce 350k
    assert (ece["n"], ece["ece_ppm"], ece["mce_ppm"]) == (4, 200_000, 350_000)


def test_calibration_top_bin_includes_perfect_score(spark):
    from ocaml_rdf_spark.operators.stats import calibration_report

    df = spark.createDataFrame([(1_000_000, 1)], "score_ppm long, label int")
    [r] = calibration_report(df, bins=4).collect()
    assert r["bin"] == 3  # 1e6 joins the top bin, not a phantom bin 4


# --------------------------------------------------------------- distmult


def test_distmult_hand_computed_and_vs_transe(spark):
    from ocaml_rdf_spark.operators.walks import distmult_scores, transe_scores

    ent = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("b", [3.0, -1.0])],
        "ent string, embedding array<float>",
    )
    rel = spark.createDataFrame(
        [("p", [2.0, 1.0])], "pred string, embedding array<float>"
    )
    tr = spark.createDataFrame([("a", "p", "b")], "s_lex string, pred string, o_lex string")
    [dm] = distmult_scores(tr, ent, rel).collect()
    # sum(1*2*3, 2*1*-1) = 6 - 2 = 4 -> 40000
    assert dm["score_x1e4"] == 40_000
    [dm0] = distmult_scores(tr, ent, None).collect()
    # <a,b> = 3 - 2 = 1 -> 10000
    assert dm0["score_x1e4"] == 10_000
    # symmetric relation: distmult score(a,p,b) == score(b,p,a); transe differs
    tr2 = spark.createDataFrame([("b", "p", "a")], "s_lex string, pred string, o_lex string")
    assert distmult_scores(tr2, ent, rel).collect()[0]["score_x1e4"] == 40_000
    t1 = transe_scores(tr, ent, rel).collect()[0]["score_x1e4"]
    t2 = transe_scores(tr2, ent, rel).collect()[0]["score_x1e4"]
    assert t1 != t2  # the asymmetry DistMult cannot model (its known limit)


# ----------------------------------------------------- sentence languages


def test_sentence_langs_votes_per_sentence(spark):
    from ocaml_rdf_spark.operators.textops import sentence_langs

    text = "the cat and the dog is in that house. der hund ist von der die das. zzz qqq."
    docs = spark.createDataFrame([("d1", text)], "doc_id string, text string")
    got = {r["sent_id"]: (r["lang_guess"], r["top_hits"])
           for r in sentence_langs(docs).collect()}
    assert got[1][0] == "en" and got[1][1] >= 4
    assert got[2][0] == "de" and got[2][1] >= 4
    assert got[3] == ("und", 0)  # no stopword hits -> abstain


def test_code_switch_report(spark):
    from ocaml_rdf_spark.operators.textops import code_switch_report

    rows = [
        ("mixed", "the cat and the dog is here. der hund ist von der die das. "
                  "the end of the story is that."),
        ("mono", "the cat and the dog. the end of that story."),
        ("und", "zzz qqq. xxx yyy."),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r for r in code_switch_report(docs).collect()}
    assert "und" not in got  # all-abstain docs emit no row
    m = got["mixed"]
    assert (m["n_sents"], m["n_langs"], m["dom_lang"], m["dom_sents"], m["switched"]) == (
        3, 2, "en", 2, 1)
    s = got["mono"]
    assert (s["n_langs"], s["switched"]) == (1, 0)


# ------------------------------------------------------------ CDC chunking


def test_cdc_chunks_partition_and_coordinates(spark):
    from ocaml_rdf_spark.operators.textops import cdc_chunks

    docs = spark.createDataFrame(
        [("d1", "aa bb cc dd ee ff gg hh ii jj"), ("short", "x y")],
        "doc_id string, text string",
    )
    rows = sorted(
        cdc_chunks(docs, w=3, mod=2).collect(),
        key=lambda r: (r["doc_id"], r["chunk_ix"]),
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # chunks tile the doc exactly: start at 1, contiguous, end at n
    for doc, toks in [("d1", 10), ("short", 2)]:
        cs = by_doc[doc]
        assert cs[0]["start_tok"] == 1
        for a, b in zip(cs, cs[1:]):
            assert b["start_tok"] == a["end_tok"] + 1
        assert cs[-1]["end_tok"] == toks
        assert all(c["n_toks"] == c["end_tok"] - c["start_tok"] + 1 for c in cs)
    assert len(by_doc["short"]) == 1  # < w tokens -> single chunk


def test_cdc_chunks_realign_after_insertion(spark):
    from ocaml_rdf_spark.operators.textops import cdc_chunks

    base = "the quick brown fox jumps over the lazy dog near the old stone bridge today"
    edited = "INSERTED " + base  # one token prepended
    docs = spark.createDataFrame(
        [("a", base), ("b", edited)], "doc_id string, text string"
    )
    rows = cdc_chunks(docs, w=3, mod=4).collect()
    ha = {r["chunk_hash"] for r in rows if r["doc_id"] == "a"}
    hb = {r["chunk_hash"] for r in rows if r["doc_id"] == "b"}
    # content-defined boundaries re-align after the edit: most of a's
    # chunks survive verbatim in b (fixed-offset chunking would share 0)
    shared = ha & hb
    assert len(shared) >= max(1, len(ha) - 2), (ha, hb)


# -------------------------------------------------------- license battery


def test_license_flags_table(spark):
    from ocaml_rdf_spark.operators.textops import license_flags

    rows = [
        ("ccbyncnd", "Photo licensed under https://creativecommons.org/licenses/by-nc-nd/4.0/"),
        ("ccbysa", "Content available under Creative Commons Attribution-ShareAlike."),
        ("ccby", "See creativecommons.org/licenses/by/4.0 for terms."),
        ("cc0", "Released under the CC0 public domain dedication."),
        ("mit", "This code ships under the MIT License."),
        ("apache", "Licensed under the Apache License, Version 2.0."),
        ("gpl", "Distributed under the GNU General Public License v3."),
        ("arr", "Copyright 2024 Example Corp. All rights reserved."),
        ("none", "Just an ordinary article about gardening."),
        ("conflict", "All rights reserved. Images: creativecommons.org/licenses/by/2.0."),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r for r in license_flags(docs).collect()}
    assert got["ccbyncnd"]["license_guess"] == "cc-by-nc-nd"
    assert got["ccbysa"]["license_guess"] == "cc-by-sa"
    assert got["ccby"]["license_guess"] == "cc-by"
    assert got["cc0"]["license_guess"] == "cc0"
    assert got["mit"]["license_guess"] == "mit"
    assert got["apache"]["license_guess"] == "apache-2.0"
    assert got["gpl"]["license_guess"] == "gpl"
    assert got["arr"]["license_guess"] == "all-rights-reserved"
    assert got["none"]["license_guess"] is None and got["none"]["n_signals"] == 0
    # conflicting declarations keep BOTH flags; precedence favors the CC url
    cf = got["conflict"]
    assert cf["arr"] == 1 and cf["cc_by"] == 1 and cf["n_signals"] >= 2
    assert cf["license_guess"] == "cc-by"
