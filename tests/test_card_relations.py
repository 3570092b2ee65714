"""Corpus dataset card (textops.corpus_card) and pattern relation
extraction (extract.extract_relations)."""

from ocaml_rdf_spark.extract import extract_relations
from ocaml_rdf_spark.operators.textops import corpus_card


def test_corpus_card_per_language_rollup(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog is here for now with that"),  # en
            (2, "the cat and the dog is here for now with that"),  # exact dup
            (3, "der hund und die katze ist von mit für auf ein"),  # de
            (4, "zz qq ww"),  # und
        ],
        "doc_id long, text string",
    )
    out = {r["lang"]: r for r in corpus_card(docs).collect()}
    assert set(out) == {"en", "de", "und"}
    en = out["en"]
    assert en["n_docs"] == 2 and en["dup_docs"] == 1
    assert en["ws_tokens"] == 22
    assert en["quality_sum"] == en["mean_quality_x100"] * 2 // 100
    de = out["de"]
    assert de["n_docs"] == 1 and de["dup_docs"] == 0
    assert out["und"]["ws_tokens"] == 3


def test_extract_relations_patterns_and_dedup(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha merge beta and gamma join delta"),
            (2, "alpha merge beta again alpha merge beta"),  # dup within doc
            (3, "nothing here"),
        ],
        "doc_id long, text string",
    )
    pats = [
        ("urn:p:mergesWith", r"([a-z]+) merge ([a-z]+)"),
        ("urn:p:joinsWith", r"([a-z]+) join ([a-z]+)"),
    ]
    out = {(r["doc_id"], r["pred"], r["subj"], r["obj"]) for r in
           extract_relations(docs, pats).collect()}
    assert (1, "urn:p:mergesWith", "alpha", "beta") in out
    assert (1, "urn:p:joinsWith", "gamma", "delta") in out
    assert (2, "urn:p:mergesWith", "alpha", "beta") in out
    assert len([k for k in out if k[0] == 2]) == 1  # in-doc dedup
    assert not any(k[0] == 3 for k in out)


def test_extract_relations_non_overlapping_matches(spark):
    # 'a merge b merge c': the first match consumes 'b', so 'b merge c'
    # never fires — leftmost non-overlapping in both engines
    docs = spark.createDataFrame([(1, "a merge b merge c")], "doc_id long, text string")
    out = extract_relations(docs, [("urn:p:m", r"([a-z]+) merge ([a-z]+)")]).collect()
    assert {(r["subj"], r["obj"]) for r in out} == {("a", "b")}
