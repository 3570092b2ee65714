"""Unit tests for the KG-construction operators: connected components /
canonicalization (north-rule shapes: chains, stars, cycles, big
component), entity linking, staged pipeline resume, media plumbing."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------------------
# connected components (operators/cc.py)
# ---------------------------------------------------------------------------


def _cc(spark, edges, threshold):
    from ocaml_rdf_spark.operators.cc import connected_components

    df = spark.createDataFrame(edges, schema="src string, dst string")
    # threshold=0 forces the distributed large-star/small-star path;
    # a large threshold takes the driver union-find fast path — both must
    # produce identical components
    out = connected_components(df, driver_threshold=threshold)
    return {r["node"]: r["component"] for r in out.collect()}


@pytest.mark.parametrize("threshold", [0, 1_000_000], ids=["distributed", "driver"])
def test_cc_chain(spark, threshold):
    m = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d")], threshold)
    assert m == {"a": "a", "b": "a", "c": "a", "d": "a"}


@pytest.mark.parametrize("threshold", [0, 1_000_000], ids=["distributed", "driver"])
def test_cc_star_and_cycle(spark, threshold):
    edges = [("hub", f"s{i}") for i in range(1, 6)]
    edges += [("x1", "x2"), ("x2", "x3"), ("x3", "x1")]  # cycle
    m = _cc(spark, edges, threshold)
    assert all(m[f"s{i}"] == "hub" for i in range(1, 6))
    assert m["hub"] == "hub"
    assert m["x1"] == m["x2"] == m["x3"] == "x1"


@pytest.mark.parametrize("threshold", [0, 1_000_000], ids=["distributed", "driver"])
def test_cc_two_components_deterministic_rep(spark, threshold):
    m = _cc(spark, [("b", "a"), ("c", "b"), ("z", "y")], threshold)
    assert m["a"] == m["b"] == m["c"] == "a"
    assert m["y"] == m["z"] == "y"


def test_cc_fixture_shapes(spark):
    """The datagen sameAs fixture: chains, stars, cycles + one 10k-node
    component — CC must find exactly the designed component count."""
    from ocaml_rdf_spark.datagen import gen_sameas_pandas
    from ocaml_rdf_spark.operators.cc import connected_components

    pdf = gen_sameas_pandas()
    edges = spark.createDataFrame(pdf).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    comp = connected_components(edges)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("n"))
    by_size = {r["component"]: r["n"] for r in sizes.collect()}
    # 50 chains (4 nodes) + 30 stars (8 nodes) + 20 cycles (5) + 1 big (10k)
    assert len(by_size) == 50 + 30 + 20 + 1
    assert max(by_size.values()) == 10000
    assert sorted(by_size.values()).count(4) == 50
    assert sorted(by_size.values()).count(8) == 30
    assert sorted(by_size.values()).count(5) == 20


def test_canonicalize_rewrites_subjects_and_objects(spark):
    from ocaml_rdf_spark.operators.cc import canonicalize, connected_components, sameas_edges
    from ocaml_rdf_spark.types import OWL_SAMEAS, TRIPLE_KEY

    rows = [
        # a sameAs b; both have a name triple; x references b as object
        (0, "urn:a", OWL_SAMEAS, 0, "urn:b", None, None, "g", None, None, None),
        (0, "urn:a", "urn:p:name", 2, "A", "http://www.w3.org/2001/XMLSchema#string", None, "g", None, None, None),
        (0, "urn:b", "urn:p:name", 2, "A", "http://www.w3.org/2001/XMLSchema#string", None, "g", None, None, None),
        (0, "urn:x", "urn:p:knows", 0, "urn:b", None, None, "g", None, None, None),
    ]
    from ocaml_rdf_spark.types import TRIPLES_SCHEMA

    df = spark.createDataFrame(rows, schema=TRIPLES_SCHEMA)
    mapping = connected_components(sameas_edges(df))
    out = canonicalize(df, mapping).dropDuplicates(TRIPLE_KEY)
    got = {(r["s_lex"], r["pred"], r["o_lex"]) for r in out.collect()}
    # subjects and objects both collapse to urn:a; the two name triples dedup
    assert ("urn:a", "urn:p:name", "A") in got
    assert ("urn:x", "urn:p:knows", "urn:a") in got
    assert not any("urn:b" in t for tr in got for t in tr)
    assert len([t for t in got if t[1] == "urn:p:name"]) == 1


# ---------------------------------------------------------------------------
# entity linking (operators/linking.py)
# ---------------------------------------------------------------------------


def test_detect_mentions_capitalized_runs(spark):
    from ocaml_rdf_spark.operators.linking import detect_mentions

    docs = spark.createDataFrame(
        [(1, "I met Ada Lovelace in London yesterday"), (2, "nothing here")],
        schema="doc_id long, text string",
    )
    m = detect_mentions(docs)
    got = {(r["id"], r["mention"]) for r in m.collect()}
    assert (1, "Ada Lovelace") in got
    assert (1, "London") in got
    assert not any(i == 2 for i, _ in got)


def test_link_exact_top1_by_prior(spark):
    from ocaml_rdf_spark.operators.linking import detect_mentions, link_exact

    docs = spark.createDataFrame([(1, "Hello Paris")], schema="doc_id long, text string")
    aliases = spark.createDataFrame(
        [("Paris", "urn:city:paris", 0.9), ("Paris", "urn:person:paris", 0.4)],
        schema="alias string, uri string, prior double",
    )
    out = link_exact(detect_mentions(docs), aliases).collect()
    rows = [(r["mention"], r["uri"]) for r in out]
    assert ("Paris", "urn:city:paris") in rows
    assert all(u != "urn:person:paris" for _, u in rows)


def test_link_fuzzy_recovers_near_miss(spark):
    from ocaml_rdf_spark.operators.linking import link_fuzzy

    aliases = spark.createDataFrame(
        [("Acme Corporation", "urn:org:acme", 0.9), ("Windmill Software", "urn:org:wind", 0.8)],
        schema="alias string, uri string, prior double",
    )
    # near-miss: one char dropped
    mentions = spark.createDataFrame(
        [(1, "Acme Coporation", "acme coporation")], schema="id long, mention string, norm string"
    )
    out = link_fuzzy(mentions, aliases, threshold=0.6).collect()
    assert len(out) == 1 and out[0]["uri"] == "urn:org:acme"


def test_link_edit_distance_tier(spark):
    from ocaml_rdf_spark.operators.linking import link_edit

    aliases = spark.createDataFrame(
        [("Acme Corp", "urn:org:acme", 0.9), ("Acme Core", "urn:org:core", 0.9),
         ("Windmill", "urn:org:wind", 0.8)],
        schema="alias string, uri string, prior double",
    )
    mentions = spark.createDataFrame(
        [(1, "Acme Corp", "acme corp"),    # dist 0 to acme, 1 to core -> acme
         (2, "Acme Cor", "acme cor"),      # dist 1 to BOTH -> uri tiebreak (acme < core)
         (3, "Wind", "wind"),              # dist 4 > max_dist AND outside length band
         (4, "Bcme Corp", "bcme corp")],   # dist 1 but first-char block excludes
        schema="id long, mention string, norm string",
    )
    out = {r["id"]: r for r in link_edit(mentions, aliases, max_dist=2).collect()}
    assert out[1]["uri"] == "urn:org:acme" and out[1]["dist"] == 0
    assert out[1]["score_x1e6"] == 900000
    assert out[2]["uri"] == "urn:org:acme" and out[2]["dist"] == 1
    assert out[2]["score_x1e6"] == 800000
    assert 3 not in out and 4 not in out


# ---------------------------------------------------------------------------
# staged pipeline: lineage, metrics, resume (pipeline.py)
# ---------------------------------------------------------------------------


def test_pipeline_commit_resume(spark, tmp_path):
    from ocaml_rdf_spark.pipeline import kg_pipeline

    root = str(tmp_path / "pipe")
    pipe = kg_pipeline(spark, root, n_pages=40, parts=2)
    log1 = pipe.run()
    assert all(not e["skipped"] for e in log1)
    assert len(log1) == 6

    # outputs + lineage + metrics + marker exist per stage
    for st in ["extract", "dedup", "link", "canonical", "spo", "pos"]:
        assert os.path.exists(os.path.join(root, st, "_SUCCESS.json"))
        lineage = spark.read.parquet(os.path.join(root, st, "_lineage"))
        assert lineage.filter(F.col("status") == "ok").count() > 0
        metrics = spark.read.parquet(os.path.join(root, st, "_metrics"))
        assert {r["metric"] for r in metrics.collect()} >= {"rows", "seconds"}

    # resume: all stages skip, outputs unchanged
    pipe2 = kg_pipeline(spark, root, n_pages=40, parts=2)
    log2 = pipe2.run()
    assert all(e["skipped"] for e in log2)

    # kill-mid-run simulation: wipe a middle stage, only it (and nothing
    # upstream) re-runs; output identical
    import shutil

    before = sorted(
        tuple(r) for r in spark.read.parquet(os.path.join(root, "canonical", "data")).collect()
    )
    shutil.rmtree(os.path.join(root, "canonical"))
    pipe3 = kg_pipeline(spark, root, n_pages=40, parts=2)
    log3 = pipe3.run()
    skipped = {i: e["skipped"] for i, e in enumerate(log3)}
    assert skipped[0] and skipped[1] and skipped[2] and not skipped[3]
    after = sorted(
        tuple(r) for r in spark.read.parquet(os.path.join(root, "canonical", "data")).collect()
    )
    assert before == after

    # fingerprint change (different corpus) invalidates everything
    pipe4 = kg_pipeline(spark, root, n_pages=41, parts=2)
    log4 = pipe4.run()
    assert all(not e["skipped"] for e in log4)


# ---------------------------------------------------------------------------
# media plumbing (operators/media.py)
# ---------------------------------------------------------------------------


def test_media_metadata_and_frames(spark):
    from ocaml_rdf_spark.operators.media import frame_sample, media_features, media_metadata

    png = b"\x89PNG\r\n\x1a\n" + b"x" * 64
    wav = b"RIFF" + b"y" * 64
    mp4 = b"\x00\x00\x00\x18ftypmp42" + b"z" * 64
    df = spark.createDataFrame(
        [("p1", bytearray(png)), ("a1", bytearray(wav)), ("v1", bytearray(mp4))],
        schema="media_id string, content binary",
    )
    meta = {r["media_id"]: r.asDict() for r in media_metadata(df).collect()}
    assert meta["p1"]["kind"] == "image"
    assert meta["a1"]["kind"] == "audio"
    assert meta["v1"]["kind"] == "video"
    assert meta["p1"]["n_bytes"] == len(png)
    assert all(64 <= m["width"] <= 64 + 255 for m in meta.values())

    feats = media_features(df, dim=16).collect()
    assert all(len(r["feature"]) == 16 for r in feats)
    # deterministic across runs
    feats2 = media_features(df, dim=16).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))

    frames = frame_sample(df, every_n=1).groupBy("media_id").count().collect()
    assert all(1 <= r["count"] <= 8 for r in frames)


# ---------------------------------------------------------------------------
# textops edge cases not covered by the oracle gate
# ---------------------------------------------------------------------------


def test_minhash_bucket_skew_guard(spark):
    from ocaml_rdf_spark.operators.textops import minhash_candidates

    # 60 identical docs: with max_bucket=50 the mega-bucket is dropped →
    # no quadratic pair explosion (0 pairs), the web-scale safety property
    docs = spark.createDataFrame(
        [(i, "same text here") for i in range(60)], schema="doc_id long, text string"
    )
    assert minhash_candidates(docs, bands=4, max_bucket=50).count() == 0
    # 10 identical docs stay under the cap → all 45 pairs, 4/4 bands agree
    docs10 = spark.createDataFrame(
        [(i, "same text here") for i in range(10)], schema="doc_id long, text string"
    )
    pairs = minhash_candidates(docs10, bands=4, max_bucket=50).collect()
    assert len(pairs) == 45
    assert all(r["n_bands"] == 4 for r in pairs)


def test_ngram_jaccard_short_docs(spark):
    from ocaml_rdf_spark.operators.textops import ngram_jaccard

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "xy"), (4, "p q r")],
        schema="doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (3, 4)], schema="doc_a long, doc_b long")
    out = {(r["doc_a"], r["doc_b"]): r["jac_pct"] for r in ngram_jaccard(docs, pairs).collect()}
    assert out[(1, 2)] == 100
    assert (3, 4) not in out  # doc 3 has <3 words → no grams → pair dropped


def test_ann_lsh_subset_of_bruteforce_space(spark):
    from ocaml_rdf_spark.operators.ann import cosine_topk, lsh_topk

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = [r["vec_id"] for r in cosine_topk(embs, 0, k=10).collect()]
    approx = [r["vec_id"] for r in lsh_topk(embs, 0, k=10, bits=3, dim=64).collect()]
    assert len(exact) == 10
    assert len(approx) >= 1
    # recall@10 of the LSH tier is imperfect by design but nonzero
    assert len(set(exact) & set(approx)) >= 1


# ---------------------------------------------------------------------------
# SPO/POS store materialization + probe routing (store.py)
# ---------------------------------------------------------------------------


def test_store_write_and_probe_routing(spark, tmp_path):
    from ocaml_rdf_spark.relational import P_NAME, triples_view
    from ocaml_rdf_spark.store import TripleStore, write_store
    from ocaml_rdf_spark.types import Iri, Literal

    triples = triples_view(spark, "/root/testdata/sf0.001")
    root = str(tmp_path / "store")
    info = write_store(triples, root, parts=2)
    assert info["rows"] == triples.count()

    st = TripleStore(spark, root)
    # S-bound routes to SPO; P-bound to POS
    assert st.pick(sub=Iri("urn:n:0")) is st.spo
    assert st.pick(pred=Iri(P_NAME)) is st.pos
    # probes return the same rows as filtering the full set
    got = {(r["s_lex"], r["o_lex"]) for r in st.find(pred=Iri(P_NAME)).collect()}
    want = {
        (r["s_lex"], r["o_lex"])
        for r in triples.filter(F.col("pred") == P_NAME).collect()
    }
    assert got == want
    one = st.find(sub=Iri("urn:r:1"), pred=Iri(P_NAME)).collect()
    assert len(one) == 1 and one[0]["o_kind"] == 2

    # the probe's bound position reaches the parquet scan as a pushed filter
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        st.find(pred=Iri(P_NAME)).explain("formatted")
    assert "PushedFilters: [IsNotNull(pred), EqualTo(pred," in buf.getvalue()


def test_media_resize_shapes(spark):
    from ocaml_rdf_spark.operators.media import resize_media

    docs = spark.createDataFrame(
        [("m1", b"\x89PNG\r\n\x1a\nabcdef"), ("m2", b"hello world")],
        schema="media_id string, content binary",
    )
    out = resize_media(docs, width=8, height=4).collect()
    assert {r["media_id"] for r in out} == {"m1", "m2"}
    assert all(len(r["content"]) == 32 and r["width"] == 8 and r["height"] == 4 for r in out)
    # deterministic: same input → same resized bytes
    out2 = resize_media(docs, width=8, height=4).collect()
    assert {r["media_id"]: bytes(r["content"]) for r in out} == {r["media_id"]: bytes(r["content"]) for r in out2}


def test_dataset_named_graphs(spark):
    """Dataset = default graph + named graphs over one quad DF (rdf_ds.ml
    :: dataset/simple_dataset — SURVEY §1.1 Dataset row)."""
    from ocaml_rdf_spark.graph import Dataset
    from ocaml_rdf_spark.relational import triples_view
    from ocaml_rdf_spark.types import Iri

    ds = Dataset(triples_view(spark, "/root/testdata/sf0.001"), default_graph="urn:g:region")
    names = {r["graph"] for r in ds.graph_names().collect()}
    assert names == {"urn:g:region", "urn:g:nation", "urn:g:customer", "urn:g:supplier", "urn:g:orders"}
    assert ds.default().size() == 10  # 5 regions x (type + name)
    nation = ds.graph("urn:g:nation")
    assert nation.size() == 75  # 25 nations x (type + name + inRegion)
    # union of all graphs sees every triple; a named slice only its own
    assert ds.union_all_graphs().size() > nation.size()
    assert nation.exists(sub=Iri("urn:n:0"))
    assert not nation.exists(sub=Iri("urn:r:0"))  # region subject not in nation graph


def test_repetition_stats_micro(spark):
    from ocaml_rdf_spark.operators.textops import repetition_stats

    docs = spark.createDataFrame(
        [
            # 4 lines, "dup dup" line repeated twice (2*7=14 of 24 chars);
            # bigrams: "dup dup" x3 ("dup dup\ndup dup" splits to 4 words
            # -> 3 bigrams all "dup dup") + ... compute explicitly below
            (0, "alpha beta\ndup dup\ndup dup\ngamma"),
            (1, "one two three"),  # no dup lines, all bigrams unique
            (2, ""),  # degenerate: no lines, no bigrams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in repetition_stats(docs).collect()}
    # doc 0 lines: "alpha beta"(10), "dup dup"(7) x2, "gamma"(5)
    #   dup chars = 14, total = 29 -> floor(14000/29) = 482
    assert out[0]["n_lines"] == 4
    assert out[0]["dup_line_x1000"] == 482
    # doc 0 words: alpha beta dup dup dup dup gamma -> 6 bigrams,
    #   "dup dup" appears 3x -> floor(3000/6) = 500
    assert out[0]["n_bigrams"] == 6
    assert out[0]["top_bigram_x1000"] == 500
    assert out[1]["dup_line_x1000"] == 0
    assert out[1]["n_bigrams"] == 2 and out[1]["top_bigram_x1000"] == 500
    assert out[2]["n_lines"] == 0 and out[2]["n_bigrams"] == 0


# -- canonical blank-node labeling (operators/canon.py) ----------------------


def _tr(spark, rows):
    from ocaml_rdf_spark.types import TRIPLES_SCHEMA, triple_row

    return spark.createDataFrame(
        [triple_row(s, p, o, graph="urn:g:c") for s, p, o in rows], schema=TRIPLES_SCHEMA
    )


def _canon_set(spark, rows):
    from ocaml_rdf_spark.operators.canon import canonicalize_bnodes

    df = canonicalize_bnodes(_tr(spark, rows))
    return sorted(
        (r["s_kind"], r["s_lex"], r["pred"], r["o_kind"], r["o_lex"]) for r in df.collect()
    )


def test_canon_isomorphism_invariance(spark):
    from ocaml_rdf_spark.types import BNode, Iri, Literal

    ex = "http://ex/"
    g1 = [
        (BNode("a"), Iri(ex + "name"), Literal("x")),
        (BNode("a"), Iri(ex + "next"), BNode("b")),
        (BNode("b"), Iri(ex + "name"), Literal("y")),
        (Iri(ex + "root"), Iri(ex + "head"), BNode("a")),
    ]
    # same graph, bnodes relabeled by an arbitrary bijection
    g2 = [
        (BNode("zz9"), Iri(ex + "name"), Literal("x")),
        (BNode("zz9"), Iri(ex + "next"), BNode("q")),
        (BNode("q"), Iri(ex + "name"), Literal("y")),
        (Iri(ex + "root"), Iri(ex + "head"), BNode("zz9")),
    ]
    assert _canon_set(spark, g1) == _canon_set(spark, g2)


def test_canon_distinguishes_structure(spark):
    from ocaml_rdf_spark.operators.canon import canonical_bnode_labels
    from ocaml_rdf_spark.types import BNode, Iri, Literal

    ex = "http://ex/"
    rows = [
        (BNode("a"), Iri(ex + "name"), Literal("x")),
        (BNode("b"), Iri(ex + "name"), Literal("y")),
        (BNode("c"), Iri(ex + "name"), Literal("x")),  # automorphic with a
    ]
    out = {r["label"]: r for r in canonical_bnode_labels(_tr(spark, rows)).collect()}
    assert out["a"]["canon"] == out["c"]["canon"]
    assert out["a"]["n_shared"] == 2 and out["c"]["n_shared"] == 2
    assert out["b"]["canon"] != out["a"]["canon"] and out["b"]["n_shared"] == 1


def test_canon_directed_chain_separates(spark):
    from ocaml_rdf_spark.operators.canon import canonical_bnode_labels
    from ocaml_rdf_spark.types import BNode, Iri

    ex = "http://ex/"
    n = 8
    rows = [(BNode(f"c{i}"), Iri(ex + "next"), BNode(f"c{i+1}")) for i in range(n - 1)]
    out = canonical_bnode_labels(_tr(spark, rows)).collect()
    assert len(out) == n
    assert len({r["canon"] for r in out}) == n  # fully separated
    assert all(r["n_shared"] == 1 for r in out)


def test_minhash_signature_col_agrees_with_batch(spark):
    import pyspark.sql.functions as F

    from ocaml_rdf_spark.operators.textops import (
        minhash_signature_col,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta  epsilon"), (2, "alpha")],
        "doc_id long, text string",
    )
    per_row = {
        r["doc_id"]: r["sig"].split("|")
        for r in docs.select("doc_id", minhash_signature_col(F.col("text")).alias("sig")).collect()
    }
    batch = {}
    for r in minhash_signatures(docs).collect():
        batch.setdefault(r["doc_id"], {})[r["band"]] = r["mh"]
    for did, sig in per_row.items():
        assert sig == [batch[did][b] for b in range(8)]


def test_pipeline_with_inference_stage(spark, tmp_path):
    from ocaml_rdf_spark.operators.owlrl import INVERSE_OF
    from ocaml_rdf_spark.operators.rdfs import DOMAIN, RANGE, SUBCLASS
    from ocaml_rdf_spark.pipeline import kg_pipeline
    from ocaml_rdf_spark.types import RDF_TYPE, TRIPLES_SCHEMA, Iri, triple_row

    S = "https://schema.org/"
    axioms = [
        (S + "Person", SUBCLASS, S + "Thing"),
        (S + "Organization", SUBCLASS, S + "Thing"),
        (S + "worksFor", DOMAIN, S + "Person"),
        (S + "worksFor", RANGE, S + "Organization"),
        (S + "worksFor", INVERSE_OF, S + "employee"),
    ]
    onto = spark.createDataFrame(
        [triple_row(Iri(s), Iri(p), Iri(o), graph="urn:g:onto") for s, p, o in axioms],
        schema=TRIPLES_SCHEMA,
    )
    root = str(tmp_path / "pipe-inf")
    pipe = kg_pipeline(spark, root, n_pages=40, parts=2, ontology=onto)
    log = pipe.run()
    assert [not e["skipped"] for e in log] == [True] * 7  # infer stage present

    spo = spark.read.parquet(os.path.join(root, "spo", "data"))
    ent = spo.filter(F.col("extractor").isin("rdfs", "owl"))
    assert ent.count() > 0
    # every worksFor subject is entailed a Person and a Thing type
    workers = {r["s_lex"] for r in spo.filter(F.col("pred") == S + "worksFor").collect()}
    thing_typed = {
        r["s_lex"]
        for r in spo.filter((F.col("pred") == RDF_TYPE) & (F.col("o_lex") == S + "Thing")).collect()
    }
    assert workers and workers <= thing_typed
    # inverse employee edges materialized
    assert spo.filter(F.col("pred") == S + "employee").count() > 0
    # resume: everything skips, including infer
    log2 = kg_pipeline(spark, root, n_pages=40, parts=2, ontology=onto).run()
    assert all(e["skipped"] for e in log2)


def test_pagerank_symmetric_cycle(spark):
    from ocaml_rdf_spark.operators.cc import pagerank

    e = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    out = {r["node"]: r["rank"] for r in pagerank(e, iters=5).collect()}
    # a perfectly symmetric 2-cycle keeps both ranks equal at the start mass
    assert out["a"] == out["b"] == 1_000_000


def test_pagerank_hub_dominates(spark):
    from ocaml_rdf_spark.operators.cc import pagerank

    e = spark.createDataFrame(
        [("l1", "hub"), ("l2", "hub"), ("l3", "hub"), ("hub", "l1")],
        "src string, dst string",
    )
    out = {r["node"]: r["rank"] for r in pagerank(e, iters=3).collect()}
    assert out["hub"] > out["l1"] > out["l2"] == out["l3"]  # l1 gets the hub's back-edge


def test_pagerank_dangling_keeps_base(spark):
    from ocaml_rdf_spark.operators.cc import pagerank

    e = spark.createDataFrame([("a", "sink")], "src string, dst string")
    out = {r["node"]: r["rank"] for r in pagerank(e, iters=2).collect()}
    assert out["a"] == 150_000  # no in-edges: base only
    # sink receives a's contribution but its own mass leaks (dangling)
    assert out["sink"] > out["a"]


def test_pagerank_partitioning_invariant(spark):
    from ocaml_rdf_spark.operators.cc import pagerank

    rows = [(f"u{i}", f"u{(i * 7 + 3) % 50}") for i in range(200)]
    e = spark.createDataFrame(rows, "src string, dst string")
    a = sorted(map(tuple, pagerank(e.repartition(2), iters=3).collect()))
    b = sorted(map(tuple, pagerank(e.repartition(16), iters=3).collect()))
    assert a == b  # integer arithmetic: bit-identical across partitionings


def test_triangles_k4(spark):
    from ocaml_rdf_spark.operators.cc import triangle_count

    nodes = ["a", "b", "c", "d"]
    e = spark.createDataFrame(
        [(x, y) for x in nodes for y in nodes if x < y], "src string, dst string"
    )
    out = {r["node"]: r["triangles"] for r in triangle_count(e).collect()}
    # K4: each vertex sits in C(3,2) = 3 triangles
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangles_square_has_none(spark):
    from ocaml_rdf_spark.operators.cc import triangle_count

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], "src string, dst string"
    )
    out = {r["node"]: r["triangles"] for r in triangle_count(e).collect()}
    assert out == {"a": 0, "b": 0, "c": 0, "d": 0}


def test_triangles_direction_and_dup_invariant(spark):
    from ocaml_rdf_spark.operators.cc import triangle_count

    # same triangle given twice, once per direction, plus a self loop
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "c"), ("a", "a")],
        "src string, dst string",
    )
    out = {r["node"]: r["triangles"] for r in triangle_count(e).collect()}
    assert out == {"a": 1, "b": 1, "c": 1}


def test_triangles_hub_skew(spark):
    from ocaml_rdf_spark.operators.cc import triangle_count

    # hub connected to 40 leaves; leaves form a chain, so triangle i =
    # (hub, leaf_i, leaf_{i+1}); hub's raw degree is 40 but the degree
    # orientation generates its wedges at the low-degree leaves
    rows = [("hub", f"l{i}") for i in range(40)]
    rows += [(f"l{i}", f"l{i+1}") for i in range(39)]
    e = spark.createDataFrame(rows, "src string, dst string")
    out = {r["node"]: r["triangles"] for r in triangle_count(e).collect()}
    assert out["hub"] == 39
    assert out["l0"] == out["l39"] == 1
    assert out["l5"] == 2  # interior leaf: two adjacent chain triangles


# --- graph delta (diff / patch / invert) ------------------------------------


def _quads(spark, rows):
    from ocaml_rdf_spark.types import TRIPLE_KEY

    return spark.createDataFrame(
        [
            (0, s, p, 2, o, dt, lang, g)
            for (s, p, o, dt, lang, g) in rows
        ],
        "s_kind int, s_lex string, pred string, o_kind int, o_lex string,"
        " o_dtype string, o_lang string, graph string",
    ).select(*TRIPLE_KEY)


def _qset(df):
    return {tuple(r) for r in df.collect()}


def test_graph_diff_patch_roundtrip(spark):
    from ocaml_rdf_spark.operators.delta import apply_patch, graph_diff, invert_patch

    old = _quads(
        spark,
        [
            ("s1", "p", "a", None, None, "g"),
            ("s2", "p", "b", "urn:dt", None, "g"),
            ("s3", "p", "c", None, "en", "g2"),
        ],
    )
    new = _quads(
        spark,
        [
            ("s1", "p", "a", None, None, "g"),   # unchanged
            ("s2", "p", "b2", "urn:dt", None, "g"),  # value changed: -old +new
            ("s4", "p", "d", None, None, "g"),   # added
        ],
    )
    d = graph_diff(old, new)
    ops = {(r["s_lex"], r["op"]) for r in d.collect()}
    assert ops == {("s2", "+"), ("s2", "-"), ("s3", "-"), ("s4", "+")}
    # apply: old + diff == new (set equality)
    assert _qset(apply_patch(old, d)) == _qset(new)
    # invert: new + inverse == old
    assert _qset(apply_patch(new, invert_patch(d))) == _qset(old)
    # idempotent re-apply
    assert _qset(apply_patch(apply_patch(old, d), d)) == _qset(new)


def test_graph_diff_null_semantics(spark):
    """NULL o_dtype/o_lang compare equal — a quad differing only in dtype
    presence is a real change, identical NULL-bearing quads are not."""
    from ocaml_rdf_spark.operators.delta import graph_diff

    old = _quads(spark, [("s", "p", "x", None, None, "g")])
    same = _quads(spark, [("s", "p", "x", None, None, "g")])
    typed = _quads(spark, [("s", "p", "x", "urn:dt", None, "g")])
    assert graph_diff(old, same).count() == 0
    ops = sorted(r["op"] for r in graph_diff(old, typed).collect())
    assert ops == ["+", "-"]


def test_graph_diff_set_semantics(spark):
    """Duplicate rows within a snapshot are one logical quad."""
    from ocaml_rdf_spark.operators.delta import graph_diff

    old = _quads(spark, [("s", "p", "x", None, None, "g")] * 3)
    new = _quads(spark, [("s", "p", "x", None, None, "g")])
    assert graph_diff(old, new).count() == 0


# --- k-core peeling ----------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_kcore_k4_with_tail(spark):
    """K4 is the 3-core; the pendant tail peels away (one node per round
    from the free end — the cascade the fixpoint loop must follow)."""
    from ocaml_rdf_spark.operators.cc import kcore

    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    tail = [("d", "t1"), ("t1", "t2"), ("t2", "t3")]
    out = {r["node"]: r["deg"] for r in kcore(_edges(spark, k4 + tail), k=3).collect()}
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_kcore_chain_dissolves(spark):
    from ocaml_rdf_spark.operators.cc import kcore

    chain = [(f"n{i}", f"n{i+1}") for i in range(6)]
    assert kcore(_edges(spark, chain), k=2).count() == 0


def test_kcore_cycle_survives_k2(spark):
    from ocaml_rdf_spark.operators.cc import kcore

    cyc = [(f"n{i}", f"n{(i+1) % 5}") for i in range(5)]
    out = {r["node"]: r["deg"] for r in kcore(_edges(spark, cyc), k=2).collect()}
    assert out == {f"n{i}": 2 for i in range(5)}


def test_kcore_direction_dup_selfloop_invariant(spark):
    """Both directions + duplicates + self-loops canonicalize away."""
    from ocaml_rdf_spark.operators.cc import kcore

    tri = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "c"), ("a", "a")]
    out = {r["node"]: r["deg"] for r in kcore(_edges(spark, tri), k=2).collect()}
    assert out == {"a": 2, "b": 2, "c": 2}


def test_kcore_fixed_rounds_intermediate_state(spark):
    """rounds=1 on K4+tail: only the current free end is gone."""
    from ocaml_rdf_spark.operators.cc import kcore

    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    tail = [("d", "t1"), ("t1", "t2")]
    out = {r["node"]: r["deg"] for r in kcore(_edges(spark, k4 + tail), k=3, rounds=1).collect()}
    # round 1 removes t2 (deg1) and t1 (deg 2 < 3)... both < 3 → both gone
    assert out == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_commit_delta_and_time_travel(spark, tmp_path):
    """Incremental re-crawl path: commit_delta records a versioned patch
    per re-commit and store_at_version reconstructs any snapshot by
    replaying inverted patches backward."""
    from ocaml_rdf_spark.pipeline import Pipeline, commit_delta, store_at_version

    root = str(tmp_path / "pipe")

    def quads(rows):
        return _quads(spark, rows)

    v0 = quads([("s1", "p", "a", None, None, "g"), ("s2", "p", "b", None, None, "g")])
    v1 = quads([("s1", "p", "a", None, None, "g"), ("s3", "p", "c", None, None, "g")])
    v2 = quads([("s3", "p", "c2", None, None, "g")])

    pipe = Pipeline(spark, root, "fp0").stage("store", lambda sp, p: v0)
    pipe.run()

    m1 = commit_delta(spark, root, "store", v1, "fp1")
    assert (m1["n_added"], m1["n_removed"]) == (1, 1)   # +s3, -s2
    m2 = commit_delta(spark, root, "store", v2, "fp2")
    assert (m2["n_added"], m2["n_removed"]) == (1, 2)   # +c2, -s1, -c

    assert _qset(store_at_version(spark, root, "store", 2)) == _qset(v2)
    assert _qset(store_at_version(spark, root, "store", 1)) == _qset(v1)
    assert _qset(store_at_version(spark, root, "store", 0)) == _qset(v0)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        store_at_version(spark, root, "store", 3)


def test_normalize_literals_rules(spark):
    from ocaml_rdf_spark.operators.canon import normalize_literals

    XSD = "http://www.w3.org/2001/XMLSchema#"
    rows = [
        # (lex, dtype, expected)
        ("+042", XSD + "integer", "42"),
        ("-0", XSD + "integer", "0"),
        ("007", XSD + "long", "7"),
        ("1.500", XSD + "decimal", "1.5"),
        ("-0.000", XSD + "decimal", "0"),
        (".5", XSD + "decimal", "0.5"),
        ("0.0000001", XSD + "decimal", "0.0000001"),  # >6 frac digits: UNCHANGED (cast would round)
        ("1", XSD + "boolean", "true"),
        ("0", XSD + "boolean", "false"),
        ("maybe", XSD + "boolean", "maybe"),          # invalid: unchanged
        ("xyz", XSD + "integer", "xyz"),              # invalid: unchanged
        ("01", XSD + "string", "01"),                 # untyped-for-us dtype: unchanged
        ("01", None, "01"),                           # plain literal: unchanged
    ]
    quads = spark.createDataFrame(
        [(0, f"s{i}", "p", 2, lex, dt, None, "g") for i, (lex, dt, _e) in enumerate(rows)],
        "s_kind int, s_lex string, pred string, o_kind int, o_lex string,"
        " o_dtype string, o_lang string, graph string",
    )
    got = {r["s_lex"]: r["o_lex"] for r in normalize_literals(quads).collect()}
    for i, (lex, dt, exp) in enumerate(rows):
        assert got[f"s{i}"] == exp, (lex, dt, got[f"s{i}"], exp)
    # IRI objects untouched even if they look numeric
    iri = spark.createDataFrame(
        [(0, "s", "p", 0, "01", "http://www.w3.org/2001/XMLSchema#integer", None, "g")],
        "s_kind int, s_lex string, pred string, o_kind int, o_lex string,"
        " o_dtype string, o_lang string, graph string",
    )
    assert normalize_literals(iri).first()["o_lex"] == "01"


def test_bucketed_store_star_join_has_no_shuffle(spark, tmp_path):
    """A star-pattern self-join over the bucketed store must be
    exchange-free: both sides read co-located buckets."""
    import io
    from contextlib import redirect_stdout

    from ocaml_rdf_spark.relational import triples_view
    from ocaml_rdf_spark.store import write_bucketed_store

    quads = triples_view(spark, "/root/testdata/sf0.001").select(
        "s_kind", "s_lex", "pred", "o_kind", "o_lex", "o_dtype", "o_lang", "graph"
    )
    name = "ords_test_bucketed_store"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_bucketed_store(quads, name, buckets=4)
    t = spark.table(name)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = t.filter(F.col("pred") == "urn:p:name").select(
            "s_lex", F.col("o_lex").alias("name")
        )
        b = t.filter(F.col("pred") == "urn:p:inNation").select(
            "s_lex", F.col("o_lex").alias("nation")
        )
        j = a.join(b, "s_lex")
        buf = io.StringIO()
        with redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange hashpartitioning" not in plan, plan
        # and the join is real: every customer/supplier has both preds
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_incremental_components_equals_full_recompute(spark):
    from ocaml_rdf_spark.operators.cc import connected_components, incremental_components

    old = [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q")]
    # batch: intra-component (a,c), merges two comps (c,x), brand-new
    # chain (m,n)+(n,o), new node onto old comp (q,z), isolated self (s,s)
    new = [("a", "c"), ("c", "x"), ("m", "n"), ("n", "o"), ("q", "z"), ("s", "s")]

    def edges(rows):
        return spark.createDataFrame(rows, "src string, dst string")

    mapping = connected_components(edges(old))
    inc = incremental_components(mapping, edges(new))
    full = connected_components(edges(old + new))
    got = {(r["node"], r["component"]) for r in inc.collect()}
    want = {(r["node"], r["component"]) for r in full.collect()}
    # full CC drops isolated nodes ('s' self-loop); incremental likewise
    assert got == want
    # spot checks: merged component keeps the global min id
    comp = dict(got)
    assert comp["y"] == comp["a"] == "a"
    assert comp["z"] == comp["p"] == "p"
    assert comp["o"] == "m"


def test_incremental_components_quotient_only_batch(spark):
    """A batch fully inside one existing component must be a no-op."""
    from ocaml_rdf_spark.operators.cc import connected_components, incremental_components

    old = [("a", "b"), ("b", "c")]
    mapping = connected_components(
        spark.createDataFrame(old, "src string, dst string")
    )
    inc = incremental_components(
        mapping, spark.createDataFrame([("a", "c"), ("c", "b")], "src string, dst string")
    )
    assert {(r["node"], r["component"]) for r in inc.collect()} == {
        ("a", "a"), ("b", "a"), ("c", "a")
    }


def test_random_walks_determinism_and_dead_ends(spark):
    from ocaml_rdf_spark.operators.cc import kcore  # noqa: F401  (module warm)
    from ocaml_rdf_spark.operators.walks import random_walks

    # a -> b -> c (dead end); d isolated source edge d -> a
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "a")], "src string, dst string"
    )
    out = {(r["start"], r["walk"]): r["seq"] for r in random_walks(e, 1, walk_len=5).collect()}
    # chains are forced (single out-neighbor); dead ends truncate
    assert out[("a", 0)] == "a,b,c"
    assert out[("b", 0)] == "b,c"
    assert out[("c", 0)] == "c"
    assert out[("d", 0)] == "d,a,b,c"

    # determinism across partitionings: same sequences from repartitioned edges
    out2 = {
        (r["start"], r["walk"]): r["seq"]
        for r in random_walks(e.repartition(7), 1, walk_len=5).collect()
    }
    assert out == out2

    # branching: the choice is a pure function -> two runs agree, and
    # different walk ids may diverge but each is stable
    eb = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("a", "z")], "src string, dst string"
    )
    w1 = {(r["start"], r["walk"]): r["seq"] for r in random_walks(eb, 3, 1).collect()}
    w2 = {(r["start"], r["walk"]): r["seq"] for r in random_walks(eb, 3, 1).collect()}
    assert w1 == w2
    assert len({w1[("a", i)] for i in range(3)}) >= 2  # hash spreads choices


def test_skipgram_pairs_window_and_counts(spark):
    from ocaml_rdf_spark.operators.walks import skipgram_pairs

    walks = spark.createDataFrame(
        [("a", 0, "a,b,c,d"), ("x", 0, "x")], "start string, walk int, seq string"
    )
    out = {(r["center"], r["context"]): r["n"] for r in skipgram_pairs(walks, window=1).collect()}
    # window 1 over a,b,c,d: adjacent pairs both directions; singleton emits nothing
    assert out == {
        ("a", "b"): 1, ("b", "a"): 1, ("b", "c"): 1,
        ("c", "b"): 1, ("c", "d"): 1, ("d", "c"): 1,
    }
    # window 2 adds distance-2 pairs and counts accumulate across walks
    walks2 = spark.createDataFrame(
        [("a", 0, "a,b,c"), ("a", 1, "a,b,c")], "start string, walk int, seq string"
    )
    out2 = {(r["center"], r["context"]): r["n"] for r in skipgram_pairs(walks2, window=2).collect()}
    assert out2[("a", "c")] == 2 and out2[("a", "b")] == 2 and out2[("c", "a")] == 2


def test_negative_samples_determinism_and_bump(spark):
    from ocaml_rdf_spark.operators.walks import negative_samples

    pairs = spark.createDataFrame(
        [("a", "b", 3), ("b", "a", 3), ("a", "c", 1)],
        "center string, context string, n long",
    )
    out1 = {(r["center"], r["context"], r["j"]): r["neg"] for r in negative_samples(pairs, k=3).collect()}
    out2 = {(r["center"], r["context"], r["j"]): r["neg"] for r in negative_samples(pairs, k=3).collect()}
    assert out1 == out2 and len(out1) == 9
    # a negative never equals the true context unless the table has one slot
    for (c, ctx, _j), neg in out1.items():
        assert neg != ctx or len({"a", "b"}) == 1
    # table capped: with table_size=1 every negative is the top center
    # ('a' or 'b' tie -> freq desc, node asc -> 'a'); pairs with context
    # 'a' bump back onto the single slot (degenerate, documented)
    out3 = {(r["center"], r["context"], r["j"]): r["neg"] for r in negative_samples(pairs, k=1, table_size=1).collect()}
    assert all(n == "a" for n in out3.values())


def test_pair_lift_hand_computed(spark):
    from ocaml_rdf_spark.operators.walks import pair_lift

    pairs = spark.createDataFrame(
        [("a", "b", 4), ("a", "c", 1), ("d", "b", 1)],
        "center string, context string, n long",
    )
    # N=6; n_a=5, n_d=1; n_b=5, n_c=1
    out = {(r["center"], r["context"]): r["lift_x1m"] for r in pair_lift(pairs).collect()}
    assert out[("a", "b")] == 1_000_000 * 4 * 6 // (5 * 5)   # 960000
    assert out[("a", "c")] == 1_000_000 * 1 * 6 // (5 * 1)   # 1200000
    assert out[("d", "b")] == 1_000_000 * 1 * 6 // (1 * 5)   # 1200000


def test_bfs_multi_source_min_distance(spark):
    from ocaml_rdf_spark.operators.cc import bfs_distances

    # diamond + tail: s→a→c, s→b→c, c→d; second seed t→d gives d dist 1
    e = spark.createDataFrame(
        [("s", "a"), ("s", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("t", "d")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("s",), ("t",)], "node string")
    out = {r["node"]: r["dist"] for r in bfs_distances(e, seeds, max_hops=8).collect()}
    assert out == {"s": 0, "t": 0, "a": 1, "b": 1, "c": 2, "d": 1}


def test_bfs_hop_cap_and_unreachable(spark):
    from ocaml_rdf_spark.operators.cc import bfs_distances

    # chain a→b→c→d, cap at 2 hops: d stays out; island never appears
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    out = {r["node"]: r["dist"] for r in bfs_distances(e, seeds, max_hops=2).collect()}
    assert out == {"a": 0, "b": 1, "c": 2}


def test_bfs_cycle_terminates(spark):
    from ocaml_rdf_spark.operators.cc import bfs_distances

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    out = {r["node"]: r["dist"] for r in bfs_distances(e, seeds, max_hops=50).collect()}
    assert out == {"a": 0, "b": 1, "c": 2}


def test_label_prop_two_cliques_bridge(spark):
    from ocaml_rdf_spark.operators.cc import label_propagation

    # two 4-cliques {a,b,c,d} and {p,q,r,s} joined by bridge d–p: the mode
    # vote keeps each clique on its own label; CC would merge them into one
    cl = lambda ns: [(x, y) for i, x in enumerate(ns) for y in ns[i + 1:]]
    e = spark.createDataFrame(
        cl(["a", "b", "c", "d"]) + cl(["p", "q", "r", "s"]) + [("d", "p")],
        "src string, dst string",
    )
    out = {r["node"]: r["label"] for r in label_propagation(e, rounds=3).collect()}
    assert {out[n] for n in "abcd"} == {"a"}
    assert {out[n] for n in "pqrs"} == {"p"}


def test_label_prop_round_zero_is_identity(spark):
    from ocaml_rdf_spark.operators.cc import label_propagation

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    out = {r["node"]: r["label"] for r in label_propagation(e, rounds=0).collect()}
    assert out == {"a": "a", "b": "b"}


def test_linkpred_path_graph(spark):
    # a-b-c: the only candidate pair is (a,c) via center b (deg 2)
    from ocaml_rdf_spark.operators.linking import linkpred_scores

    e = _edges(spark, [("a", "b"), ("b", "c")])
    out = linkpred_scores(e).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a"], r["b"], r["cn"], r["ra"]) == ("a", "c", 1, 500_000)


def test_linkpred_excludes_direct_edges(spark):
    # triangle: every pair is adjacent → no candidates at all
    from ocaml_rdf_spark.operators.linking import linkpred_scores

    e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    assert linkpred_scores(e).count() == 0


def test_linkpred_two_common_neighbors_sum(spark):
    # a-x-b and a-y-b (a,b non-adjacent): cn=2, ra = 1/2 + 1/2 scaled
    from ocaml_rdf_spark.operators.linking import linkpred_scores

    e = _edges(spark, [("a", "x"), ("x", "b"), ("a", "y"), ("y", "b")])
    rows = {(r["a"], r["b"]): (r["cn"], r["ra"]) for r in linkpred_scores(e).collect()}
    assert rows[("a", "b")] == (2, 1_000_000)
    # x and y also share {a, b} as common neighbors
    assert rows[("x", "y")] == (2, 1_000_000)


def test_linkpred_hub_cap_drops_mega_center(spark):
    # star center with deg > cap generates no wedges; the true degree
    # still feeds RA weights of surviving centers
    from ocaml_rdf_spark.operators.linking import linkpred_scores

    star = [("hub", f"s{i}") for i in range(5)] + [("s0", "s1")]
    e = _edges(spark, star)
    out = {(r["a"], r["b"]): (r["cn"], r["ra"]) for r in linkpred_scores(e, max_degree=4).collect()}
    # hub (deg 5) is dropped as a center: s_i pairs via hub vanish,
    # but (hub, s-neighbors-of-s0/s1 wedges) survive via centers s0/s1
    assert all("hub" in pair for pair in out)
    # undirected dup/direction invariance
    rev = _edges(spark, [(b, a) for a, b in star] + star)
    out2 = {(r["a"], r["b"]): (r["cn"], r["ra"]) for r in linkpred_scores(rev, max_degree=4).collect()}
    assert out == out2


def test_scc_two_cycle_vs_parallel_edges(spark):
    # direction matters: a⇄b is a cycle; a→b twice is not
    from ocaml_rdf_spark.operators.cc import scc_components

    cyc = _edges(spark, [("a", "b"), ("b", "a")])
    out = {r["node"]: r["component"] for r in scc_components(cyc).collect()}
    assert out == {"a": "a", "b": "a"}
    dag = _edges(spark, [("a", "b"), ("a", "b")])
    assert scc_components(dag).count() == 0


def test_scc_self_loop_and_dag_tail(spark):
    from ocaml_rdf_spark.operators.cc import scc_components

    e = _edges(spark, [("x", "x"), ("x", "y"), ("y", "z")])
    out = {r["node"]: r["component"] for r in scc_components(e).collect()}
    assert out == {"x": "x"}  # the DAG tail never enters a component


def test_scc_two_separate_cycles_bridged(spark):
    # two 3-cycles joined by a one-way bridge stay separate SCCs
    from ocaml_rdf_spark.operators.cc import scc_components

    e = _edges(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"),
         ("c", "p"),  # one-way bridge
         ("p", "q"), ("q", "r"), ("r", "p")],
    )
    out = {r["node"]: r["component"] for r in scc_components(e).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "p": "p", "q": "p", "r": "p"}


def test_scc_feeds_canonicalize_like_cc(spark):
    # the SCC mapping slots into canonicalize() the same way sameAs CC does
    from ocaml_rdf_spark.operators.cc import scc_components

    e = _edges(spark, [("0|urn:a", "0|urn:b"), ("0|urn:b", "0|urn:a")])
    out = {r["node"]: r["component"] for r in scc_components(e).collect()}
    assert out == {"0|urn:a": "0|urn:a", "0|urn:b": "0|urn:a"}


def test_compaction_plan_packs_toward_target(spark):
    from ocaml_rdf_spark.store import compaction_plan

    files = spark.createDataFrame(
        [(f"f{i:02d}", 100) for i in range(10)], "path string, bytes long"
    )
    out = {r["path"]: r["bin"] for r in compaction_plan(files, target_bytes=300).collect()}
    # exclusive cumsum: f00-f02 (cum 0,100,200) → bin 0; f03-f05 → bin 1; …
    assert out == {f"f{i:02d}": i // 3 for i in range(10)}


def test_compaction_plan_oversize_file_gets_own_bin(spark):
    from ocaml_rdf_spark.store import compaction_plan

    files = spark.createDataFrame(
        [("a", 50), ("b", 9000), ("c", 50), ("d", 50)], "path string, bytes long"
    )
    rows = {r["path"]: r["bin"] for r in compaction_plan(files, target_bytes=100).collect()}
    # the rule cuts the concatenated byte stream at every multiple of the
    # target and assigns each file to the bin where it STARTS: a and b
    # share bin 0 (b starts at 50), then the giant eats bins 1..90 so c
    # starts in bin 90 and d in bin 91
    assert rows == {"a": 0, "b": 0, "c": 90, "d": 91}


def test_compaction_plan_is_path_deterministic(spark):
    from ocaml_rdf_spark.store import compaction_plan

    files = [(f"p{i}", (i * 37) % 400 + 1) for i in range(30)]
    df = spark.createDataFrame(files, "path string, bytes long")
    a = sorted(map(tuple, compaction_plan(df, 512).collect()))
    b = sorted(map(tuple, compaction_plan(df.repartition(5), 512).collect()))
    assert a == b
    import pytest as _pt
    with _pt.raises(ValueError):
        compaction_plan(df, 0)


def test_harmonic_centrality_path_graph(spark):
    # a→b→c, seeds {a}: h(b) = 1/1, h(c) = 1/2 (scaled); a unreachable from itself
    from ocaml_rdf_spark.operators.cc import harmonic_centrality

    e = _edges(spark, [("a", "b"), ("b", "c")])
    seeds = spark.createDataFrame([("a",)], "node string")
    out = {r["node"]: (r["h"], r["n_sources"]) for r in harmonic_centrality(e, seeds).collect()}
    assert out == {"b": (1_000_000, 1), "c": (500_000, 1)}


def test_harmonic_centrality_multi_seed_sums(spark):
    # x→m and y→m: h(m) = 1/1 + 1/1 from two sources
    from ocaml_rdf_spark.operators.cc import harmonic_centrality

    e = _edges(spark, [("x", "m"), ("y", "m"), ("m", "z")])
    seeds = spark.createDataFrame([("x",), ("y",)], "node string")
    out = {r["node"]: (r["h"], r["n_sources"]) for r in harmonic_centrality(e, seeds).collect()}
    assert out["m"] == (2_000_000, 2)
    assert out["z"] == (1_000_000, 2)  # dist 2 from both: 500k + 500k


def test_per_seed_bfs_keeps_labels(spark):
    # the multi-source collapse would lose this: two seeds, different dists
    from ocaml_rdf_spark.operators.cc import bfs_distances_per_seed

    e = _edges(spark, [("a", "b"), ("b", "c"), ("s2", "c")])
    seeds = spark.createDataFrame([("a",), ("s2",)], "node string")
    out = {(r["seed"], r["node"]): r["dist"] for r in bfs_distances_per_seed(e, seeds).collect()}
    assert out[("a", "c")] == 2 and out[("s2", "c")] == 1
    assert ("s2", "b") not in out  # unreachable pairs absent, not null


def test_expire_versions_retention(spark, tmp_path):
    """Patch-chain retention: old versions become unreachable with a
    precise error, newer time travel still works, and the NEXT commit
    numbers correctly despite the gap."""
    from ocaml_rdf_spark.pipeline import (
        Pipeline, commit_delta, expire_versions, store_at_version,
    )

    root = str(tmp_path / "pipe")

    def quads(rows):
        return _quads(spark, rows)

    vs = [
        quads([(f"s{i}", "p", f"o{i}", None, None, "g")]) for i in range(5)
    ]
    Pipeline(spark, root, "fp0").stage("store", lambda sp, p: vs[0]).run()
    for i, v in enumerate(vs[1:], start=1):
        commit_delta(spark, root, "store", v, f"fp{i}")

    meta = expire_versions(root, "store", keep_last=2)
    # latest patch is v4 → horizon 2: v1, v2 expired; v3, v4 kept
    assert meta["latest"] == 4 and meta["horizon"] == 2
    assert meta["expired"] == [1, 2]

    # versions >= horizon still reconstruct exactly
    assert _qset(store_at_version(spark, root, "store", 4)) == _qset(vs[4])
    assert _qset(store_at_version(spark, root, "store", 3)) == _qset(vs[3])
    assert _qset(store_at_version(spark, root, "store", 2)) == _qset(vs[2])

    import pytest as _pytest

    with _pytest.raises(ValueError, match="expired"):
        store_at_version(spark, root, "store", 1)

    # the chain keeps numbering correctly after the gap
    m = commit_delta(spark, root, "store", vs[0], "fp5")
    assert m["patch_version"] == 5
    assert _qset(store_at_version(spark, root, "store", 5)) == _qset(vs[0])


def test_hits_star_hub(spark):
    from ocaml_rdf_spark.operators.cc import hits

    # one hub pointing at 3 authorities: after any #iters the hub has the
    # max hub score and zero auth; leaves have zero hub, equal auth
    e = spark.createDataFrame(
        [("h", "a1"), ("h", "a2"), ("h", "a3")], "src string, dst string"
    )
    out = {r["node"]: (r["hub"], r["auth"]) for r in hits(e, iters=2).collect()}
    assert out["h"][1] == 0 and out["h"][0] > 0
    assert out["a1"] == out["a2"] == out["a3"]
    assert out["a1"][0] == 0 and out["a1"][1] > 0


def test_hits_partitioning_invariant(spark):
    from ocaml_rdf_spark.operators.cc import hits

    rows = [(f"u{i}", f"u{(i * 7 + 3) % 40}") for i in range(150)]
    e = spark.createDataFrame(rows, "src string, dst string")
    a = sorted(map(tuple, hits(e.repartition(2), iters=3).collect()))
    b = sorted(map(tuple, hits(e.repartition(16), iters=3).collect()))
    assert a == b  # integer arithmetic: bit-identical across partitionings


def test_modularity_two_cliques(spark):
    from ocaml_rdf_spark.operators.cc import modularity

    # two triangles joined by one bridge edge; the natural partition
    clique = [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
              ("b1", "b2"), ("b2", "b3"), ("b1", "b3"), ("a1", "b1")]
    e = spark.createDataFrame(clique, "src string, dst string")
    labels = spark.createDataFrame(
        [("a1", "A"), ("a2", "A"), ("a3", "A"), ("b1", "B"), ("b2", "B"), ("b3", "B")],
        "node string, label string",
    )
    rows = {r["label"]: r for r in modularity(e, labels).collect()}
    m = 7
    for lab in ("A", "B"):
        r = rows[lab]
        assert r["edges_in"] == 3 and r["deg_sum"] == 7  # 2*3 intra + 1 bridge end
        assert r["q_num"] == 4 * m * 3 - 7 * 7
    # Q = Σ q_num / (4m²) ≈ 0.357 > 0: community structure detected
    q = sum(r["q_num"] for r in rows.values()) / (4 * m * m)
    assert 0.3 < q < 0.4


def test_modularity_single_community_is_zero(spark):
    from ocaml_rdf_spark.operators.cc import modularity

    # everything in one community: e_c = m, d_c = 2m → q_num = 4m·m − 4m² = 0
    e = spark.createDataFrame([("x", "y"), ("y", "z")], "src string, dst string")
    labels = spark.createDataFrame(
        [("x", "C"), ("y", "C"), ("z", "C")], "node string, label string"
    )
    rows = modularity(e, labels).collect()
    assert len(rows) == 1 and rows[0]["q_num"] == 0


def test_assortativity_star_is_disassortative(spark):
    from ocaml_rdf_spark.operators.cc import degree_assortativity

    # star K1,3: every edge joins deg 3 with deg 1 -> r = -1
    e = spark.createDataFrame(
        [("h", "a"), ("h", "b"), ("h", "c")], "src string, dst string"
    )
    r = degree_assortativity(e).collect()[0]
    m2, sx, sxx, sxy = r["m2"], r["sx"], r["sxx"], r["sxy"]
    assert m2 == 6
    num = m2 * sxy - sx * sx
    den = m2 * sxx - sx * sx
    assert den > 0 and num / den == -1.0


def test_assortativity_cycle_is_degenerate(spark):
    from ocaml_rdf_spark.operators.cc import degree_assortativity

    # 3-cycle: all degrees equal -> variance 0 (den == 0, r undefined)
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    r = degree_assortativity(e).collect()[0]
    assert r["m2"] * r["sxx"] - r["sx"] * r["sx"] == 0


def test_ppr_mass_flows_from_seeds(spark):
    from ocaml_rdf_spark.operators.cc import pagerank

    # path s -> a -> b with seed {s}: rank decays with distance from the seed
    e = spark.createDataFrame([("s", "a"), ("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("s",)], "node string")
    out = {r["node"]: r["rank"] for r in pagerank(e, iters=3, seeds=seeds).collect()}
    assert out["s"] > out["a"] > out["b"] > 0


def test_ppr_unreachable_node_scores_zero(spark):
    from ocaml_rdf_spark.operators.cc import pagerank

    e = spark.createDataFrame([("s", "a"), ("x", "y")], "src string, dst string")
    seeds = spark.createDataFrame([("s",)], "node string")
    out = {r["node"]: r["rank"] for r in pagerank(e, iters=3, seeds=seeds).collect()}
    assert out["x"] == 0 and out["y"] == 0 and out["a"] > 0


def test_ppr_all_seeds_equals_vanilla(spark):
    from ocaml_rdf_spark.operators.cc import pagerank

    rows = [(f"u{i}", f"u{(i * 3 + 1) % 10}") for i in range(20)]
    e = spark.createDataFrame(rows, "src string, dst string")
    every = e.select(F.col("src").alias("node")).unionByName(
        e.select(F.col("dst").alias("node"))
    ).dropDuplicates()
    a = sorted(map(tuple, pagerank(e, iters=3).collect()))
    b = sorted(map(tuple, pagerank(e, iters=3, seeds=every).collect()))
    assert a == b


def test_clustering_coefficient_k4_and_path(spark):
    from ocaml_rdf_spark.operators.cc import clustering_coefficient

    # K4 plus a pendant: K4 nodes have cc 1 (deg-3 node: 3 tri, den 6),
    # the pendant has deg 1 -> den 0 (undefined)
    nodes = ["a", "b", "c", "d"]
    e = spark.createDataFrame(
        [(x, y) for x in nodes for y in nodes if x < y] + [("d", "p")],
        "src string, dst string",
    )
    out = {r["node"]: r for r in clustering_coefficient(e).collect()}
    assert out["a"]["cc_num"] == 6 and out["a"]["cc_den"] == 6      # cc = 1
    assert out["d"]["triangles"] == 3 and out["d"]["cc_den"] == 12  # deg 4
    assert out["p"]["cc_den"] == 0 and out["p"]["triangles"] == 0


def test_skolemize_round_trip(spark):
    from ocaml_rdf_spark.operators.canon import skolemize, unskolemize

    quads = spark.createDataFrame(
        [
            (1, "b0", "urn:p:knows", 1, "b1", None, None, "g"),
            (0, "urn:x", "urn:p:name", 2, "x", None, None, "g"),
        ],
        "s_kind int, s_lex string, pred string, o_kind int, o_lex string, o_dtype string, o_lang string, graph string",
    )
    sk = skolemize(quads)
    rows = {r["s_lex"]: r for r in sk.collect()}
    assert all(r["s_kind"] != 1 and r["o_kind"] != 1 for r in sk.collect())
    assert "https://ords.invalid/.well-known/genid/b0" in rows
    back = sorted(map(tuple, unskolemize(sk).select(*quads.columns).collect()))
    orig = sorted(map(tuple, quads.collect()))
    assert back == orig


def test_graph_digest_detects_change_and_ignores_order(spark):
    from ocaml_rdf_spark.operators.canon import graph_digest

    rows = [
        (0, "urn:a", "urn:p:x", 2, "1", None, None, "g"),
        (0, "urn:b", "urn:p:x", 2, "2", None, None, "g"),
        (0, "urn:c", "urn:p:x", 2, "3", None, None, "g"),
    ]
    schema = "s_kind int, s_lex string, pred string, o_kind int, o_lex string, o_dtype string, o_lang string, graph string"
    a = spark.createDataFrame(rows, schema)
    b = spark.createDataFrame(list(reversed(rows)) + [rows[0]], schema)  # reordered + dup
    da = graph_digest(a).collect()[0]
    db = graph_digest(b.repartition(7)).collect()[0]
    assert (da["n_quads"], da["digest"]) == (db["n_quads"], db["digest"])
    c = spark.createDataFrame(rows[:2], schema)
    dc = graph_digest(c).collect()[0]
    assert (dc["n_quads"], dc["digest"]) != (da["n_quads"], da["digest"])


def test_pipeline_mine_anchors_stage(spark, tmp_path):
    """mine_anchors=True adds the weblinks stage (corpus anchor-text
    alias mining) and its dictionary feeds entity linking at top prior:
    org mentions must resolve to the SITE org URIs the pages themselves
    link (https://<host>/org/<Org>), outranking the curated kb.example
    dictionary."""
    from pyspark.sql import functions as F

    from ocaml_rdf_spark.pipeline import kg_pipeline

    root = str(tmp_path / "pipe_anch")
    pipe = kg_pipeline(spark, root, n_pages=60, parts=2, mine_anchors=True)
    log = pipe.run()
    assert [e["stage"] for e in log] == [
        "extract", "dedup", "weblinks", "link", "canonical", "spo", "pos"
    ]
    assert not any(e["skipped"] for e in log)
    mined = pipe.output("weblinks")
    assert mined.count() > 0
    # every mined alias is a page-visible anchor pointing at a site URI
    assert mined.filter(~F.col("dst_url").startswith("https://")).count() == 0
    links = pipe.output("link")
    site_org = links.filter(F.col("o_lex").rlike("^https://[^/]+/org/")).count()
    assert site_org > 0, "anchor-mined org URIs must win some links"
    # resume: a second run replays from commits (no stage re-runs)
    log2 = kg_pipeline(spark, root, n_pages=60, parts=2, mine_anchors=True).run()
    assert all(e["skipped"] for e in log2)
    # the baseline pipeline (mine_anchors off) is untouched: different
    # fingerprint, no weblinks stage
    base = kg_pipeline(spark, str(tmp_path / "pipe_base"), n_pages=60, parts=2)
    assert "weblinks" not in [st.name for st in base.stages]
