"""Unit + differential tests for the final round-3 operator batch:
sentence segmentation spans, RDF container membership, Katz centrality,
butterfly counting, and DSIR importance weights — each checked against
hand-computed goldens or an independent pure-Python mirror (the suite's
DuckDB oracles cover the cross-engine axis; these pin the semantics on
adversarial small cases the synthetic tables don't reach)."""

from __future__ import annotations

import hashlib
import itertools
import re
from collections import Counter

from pyspark.sql import functions as F

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


# --------------------------------------------------------------------------
# sentence_spans
# --------------------------------------------------------------------------

def _py_sentences(text: str) -> list[str]:
    pieces = re.sub(r"([.!?]+)[ \t\n\r]+", "\\1\x1e", text).split("\x1e")
    return [p.strip() for p in pieces if p.strip()]


def _py_norm_toks(s: str) -> list[str]:
    s = re.sub(r"[^a-z0-9 ]", " ", s.lower())
    s = re.sub(r" +", " ", s).strip()
    return [t for t in s.split(" ") if t]


def test_sentence_spans_golden(spark):
    from ocaml_rdf_spark.operators.textops import sentence_spans

    docs = [
        (1, "Hello world. Second one!  Third?No split here. Tail"),
        (2, "No terminator at all"),
        (3, "Ends with terminator. "),
        (4, "!!! ???"),           # punctuation-only sentences: n_toks = 0
        (5, ""),                  # empty: no rows
        (6, "A.B. then c! d"),    # "A.B" stays whole; ". " after it splits
        (7, "Multi...  dots. Ok"),
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.sent_id): (r.start_tok, r.n_toks, r.n_chars, r.sent)
        for r in sentence_spans(sdf).collect()
    }

    expected = {}
    for doc_id, text in docs:
        off = 0
        for i, sent in enumerate(_py_sentences(text), start=1):
            nt = len(_py_norm_toks(sent))
            expected[(doc_id, i)] = (off, nt, len(sent), sent)
            off += nt
    assert got == expected
    # spot-pin the interesting rows
    assert expected[(1, 1)] == (0, 2, 12, "Hello world.")
    assert expected[(1, 3)][3] == "Third?No split here."
    assert (4, 1) in expected and expected[(4, 1)][1] == 0  # "!!!" keeps its row
    assert all(k[0] != 5 for k in expected)
    assert expected[(6, 1)][3] == "A.B." and expected[(6, 2)][3] == "then c!"


def test_sentence_spans_offsets_are_prefix_sums(spark):
    from ocaml_rdf_spark.operators.textops import sentence_spans

    sdf = spark.createDataFrame(
        [(1, "one two. three four five! six. seven eight nine ten?")],
        "doc_id long, text string",
    )
    rows = sorted(sentence_spans(sdf).collect(), key=lambda r: r.sent_id)
    assert [r.start_tok for r in rows] == [0, 2, 5, 6]
    assert [r.n_toks for r in rows] == [2, 3, 1, 4]


# --------------------------------------------------------------------------
# container_members
# --------------------------------------------------------------------------

def _quads(spark, rows):
    return spark.createDataFrame(
        rows, "s_lex string, pred string, o_kind tinyint, o_lex string, o_dtype string"
    )


def test_container_members_golden(spark):
    from ocaml_rdf_spark.operators.canon import container_members

    q = _quads(spark, [
        ("urn:c1", RDF_NS + "_1", 0, "urn:a", None),
        ("urn:c1", RDF_NS + "_2", 2, "lit", "http://www.w3.org/2001/XMLSchema#string"),
        ("urn:c1", RDF_NS + "_10", 0, "urn:b", None),      # gaps allowed
        ("urn:c1", RDF_NS + "type", 0, RDF_NS + "Seq", None),
        ("urn:c2", RDF_NS + "_1", 0, "urn:x", None),        # untyped container
        ("urn:c2", RDF_NS + "_1a", 0, "urn:decoy", None),   # non-numeric: ignored
        ("urn:c3", RDF_NS + "type", 0, RDF_NS + "Bag", None),  # typed, no members
        ("urn:c1", "urn:p", 0, "urn:other", None),          # unrelated arc
    ])
    got = {
        (r.container, r.idx): (r.ctype, r.o_kind, r.item, r.o_dtype)
        for r in container_members(q).collect()
    }
    assert got == {
        ("urn:c1", 1): ("Seq", 0, "urn:a", None),
        ("urn:c1", 2): ("Seq", 2, "lit", "http://www.w3.org/2001/XMLSchema#string"),
        ("urn:c1", 10): ("Seq", 0, "urn:b", None),
        ("urn:c2", 1): (None, 0, "urn:x", None),
    }


def test_container_members_multi_type_is_deterministic(spark):
    from ocaml_rdf_spark.operators.canon import container_members

    q = _quads(spark, [
        ("urn:c", RDF_NS + "_1", 0, "urn:a", None),
        ("urn:c", RDF_NS + "type", 0, RDF_NS + "Seq", None),
        ("urn:c", RDF_NS + "type", 0, RDF_NS + "Alt", None),  # malformed double type
    ])
    [r] = container_members(q).collect()
    assert r.ctype == "Alt"  # lexicographic min, pinned


# --------------------------------------------------------------------------
# katz_centrality
# --------------------------------------------------------------------------

def _py_katz(edges, iters=3, alpha_pct=20, scale=1_000_000):
    e = sorted(set(edges))
    nodes = {n for p in e for n in p}
    x = {n: scale for n in nodes}
    for _ in range(iters):
        s = Counter()
        for u, v in e:
            s[v] += x[u]
        x = {n: scale + (alpha_pct * s.get(n, 0)) // 100 for n in nodes}
    return x


def test_katz_golden_star_and_chain(spark):
    from ocaml_rdf_spark.operators.cc import katz_centrality

    # hub with 3 in-edges plus a 3-chain feeding one spoke; a duplicate
    # edge must not double-count (set semantics)
    edges = [("a", "h"), ("b", "h"), ("c", "h"), ("x", "a"), ("y", "x"),
             ("a", "h")]
    sdf = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.katz for r in katz_centrality(sdf, iters=3).collect()}
    assert got == _py_katz(edges)
    # the hub outranks everything; a length-2 path contributes alpha^2
    assert got["h"] == max(got.values())
    assert got["a"] > got["y"] == 1_000_000


def test_katz_cycle_is_finite_per_round(spark):
    from ocaml_rdf_spark.operators.cc import katz_centrality

    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    sdf = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.katz for r in katz_centrality(sdf, iters=4).collect()}
    exp = _py_katz(edges, iters=4)
    assert got == exp
    assert len(set(got.values())) == 1  # symmetric cycle: identical scores


# --------------------------------------------------------------------------
# butterfly_counts
# --------------------------------------------------------------------------

def _py_butterflies(edges, cap=1000, k=20):
    e = sorted(set(edges))
    rdeg = Counter(r for _, r in e)
    kept = [(l, r) for l, r in e if rdeg[r] <= cap]
    nbrs = {}
    for l, r in kept:
        nbrs.setdefault(l, set()).add(r)
    credit = Counter()
    bfs = Counter()
    for l1, l2 in itertools.combinations(sorted(nbrs), 2):
        c = len(nbrs[l1] & nbrs[l2])
        if c >= 2:
            bf = c * (c - 1) // 2
            for l in (l1, l2):
                credit[l] += 1
                bfs[l] += bf
    rows = sorted(((l, credit[l], bfs[l]) for l in credit),
                  key=lambda t: (-t[2], t[0]))[:k]
    return rows


def test_butterfly_golden(spark):
    from ocaml_rdf_spark.operators.cc import butterfly_counts

    # K_{2,2} on (a,b)x(r1,r2) = exactly one butterfly; c shares only one
    # right neighbor with each -> contributes nothing; duplicate edges
    # collapse
    edges = [("a", "r1"), ("a", "r2"), ("b", "r1"), ("b", "r2"),
             ("c", "r1"), ("a", "r1"),
             # a 3x3 biclique: every pair of (p,q,s) closes C(3,2)=3
             ("p", "x"), ("p", "y"), ("p", "z"),
             ("q", "x"), ("q", "y"), ("q", "z"),
             ("s", "x"), ("s", "y"), ("s", "z")]
    sdf = spark.createDataFrame(edges, "l string, r string")
    got = [(r.l, r.n_pairs, r.n_butterflies) for r in butterfly_counts(sdf).collect()]
    assert got == _py_butterflies(edges)
    as_map = {l: (p, b) for l, p, b in got}
    assert as_map["a"] == (1, 1) and as_map["b"] == (1, 1)
    assert as_map["p"] == (2, 6) and "c" not in as_map


def test_butterfly_hub_cap_drops_boilerplate(spark):
    from ocaml_rdf_spark.operators.cc import butterfly_counts

    # r_hub connects everyone (degree 4 > cap 3) and must not create
    # wedges; only the r1/r2 pair survives
    edges = [(l, "r_hub") for l in "abcd"] + [
        ("a", "r1"), ("b", "r1"), ("a", "r2"), ("b", "r2")]
    sdf = spark.createDataFrame(edges, "l string, r string")
    got = [(r.l, r.n_pairs, r.n_butterflies)
           for r in butterfly_counts(sdf, max_right_degree=3).collect()]
    assert got == [("a", 1, 1), ("b", 1, 1)]
    assert got == _py_butterflies(edges, cap=3)


# --------------------------------------------------------------------------
# dsir_weights
# --------------------------------------------------------------------------

def _py_bucket(tok: str, buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % buckets


def _py_dsir(docs, target, buckets=256, scale=1_000_000):
    tb = [(d, _py_bucket(t, buckets)) for d, txt in docs for t in _py_norm_toks(txt)]
    tg = [_py_bucket(t, buckets) for _, txt in target for t in _py_norm_toks(txt)]
    r_cnt, t_cnt = Counter(b for _, b in tb), Counter(tg)
    r_tot, t_tot = len(tb), len(tg)
    ratio = {
        b: (scale * ((scale * (t_cnt.get(b, 0) + 1)) // (t_tot + buckets)))
        // max((scale * (r_cnt[b] + 1)) // (r_tot + buckets), 1)
        for b in r_cnt
    }
    out = {}
    for d, _ in docs:
        rs = [ratio[b] for dd, b in tb if dd == d]
        if rs:
            w = sum(rs)
            out[d] = (len(rs), w, w // len(rs), w // len(rs) >= scale)
    return out


def test_dsir_golden_shift(spark):
    from ocaml_rdf_spark.operators.selection import dsir_weights

    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "der schnelle braune fuchs springt"),
        (3, "the dog sleeps. The fox runs!"),
        (4, "zzz qqq unrelated junk tokens"),
        (5, "   "),  # no tokens: no row
    ]
    target = [(t[0], t[1]) for t in docs if t[0] in (1, 3)]  # English slice
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    tdf = spark.createDataFrame(target, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.w_sum, r.w_avg, r.selected)
        for r in dsir_weights(sdf, tdf, buckets=64).collect()
    }
    assert got == _py_dsir(docs, target, buckets=64)
    # target-like docs select in; the German and junk docs score lower
    assert got[1][3] and got[3][3]
    assert got[1][2] > got[2][2] and got[3][2] > got[4][2]
    assert 5 not in got


# --------------------------------------------------------------------------
# effective_diameter
# --------------------------------------------------------------------------

def _py_eff_diameter(points, pct):
    # points: [(hop, sum_est)] sorted; mirrors the pinned integer algebra
    nH = dict(points)[max(h for h, _ in points)]
    prev = None
    for h, nh in points:
        if 100 * nh >= pct * nH:
            if h == 0:
                return 0
            return 1000 * (h - 1) + (1000 * (pct * nH - 100 * prev)) // (100 * (nh - prev))
        prev = nh
    raise AssertionError("unreachable: last point always qualifies")


def test_effective_diameter_matches_curve_interpolation(spark):
    from ocaml_rdf_spark.operators.cc import effective_diameter, hyperball_nf

    n = 12
    edges = [(str(i), str(i + 1)) for i in range(n)]
    sdf = spark.createDataFrame(edges, "src string, dst string")
    curve = sorted(
        (r.hop, r.sum_est) for r in hyperball_nf(sdf, max_hops=6).collect()
    )
    for pct in (50, 90, 100):
        [row] = effective_diameter(sdf, max_hops=6, pct=pct).collect()
        assert row.d_eff_milli == _py_eff_diameter(curve, pct), pct
        assert row.est_total == curve[-1][1] and row.pct == pct
    # sanity: the 100% point is a whole number of hops <= max_hops
    [row] = effective_diameter(sdf, max_hops=6, pct=100).collect()
    assert row.d_eff_milli % 1000 == 0 and row.d_eff_milli <= 6000


# --------------------------------------------------------------------------
# bowtie_classify
# --------------------------------------------------------------------------

def test_bowtie_golden(spark):
    from ocaml_rdf_spark.operators.cc import bowtie_classify

    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("f", "c"),
             ("c", "g"), ("g", "c"),     # cycle through the seed -> CORE
             ("x", "y")]                 # disconnected -> OTHER
    sdf = spark.createDataFrame(edges, "src string, dst string")
    seeds = spark.createDataFrame([("c",)], "node string")
    got = {r.node: (r.cls, r.f_dist, r.b_dist)
           for r in bowtie_classify(sdf, seeds, max_hops=6).collect()}
    assert got == {
        "c": ("CORE", 0, 0), "g": ("CORE", 1, 1),
        "a": ("IN", None, 2), "b": ("IN", None, 1), "f": ("IN", None, 1),
        "d": ("OUT", 1, None), "e": ("OUT", 2, None),
        "x": ("OTHER", None, None), "y": ("OTHER", None, None),
    }


def test_bowtie_hop_bound_moves_far_nodes_to_other(spark):
    from ocaml_rdf_spark.operators.cc import bowtie_classify

    chain = [(str(i), str(i + 1)) for i in range(10)]
    sdf = spark.createDataFrame(chain, "src string, dst string")
    seeds = spark.createDataFrame([("0",)], "node string")
    got = {r.node: r.cls for r in bowtie_classify(sdf, seeds, max_hops=3).collect()}
    assert got["3"] == "OUT" and got["4"] == "OTHER"  # bound at 3 hops


# --------------------------------------------------------------------------
# weighted_sample
# --------------------------------------------------------------------------

def _py_weighted_sample(rows, k):
    # rows: (grp, id, w); mirrors the pinned h div w priority rule
    out = {}
    for grp, i, w in rows:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        out.setdefault(grp, []).append((h // max(w, 1), i, max(w, 1)))
    res = []
    for grp, lst in out.items():
        for rank, (r, i, w) in enumerate(sorted(lst), start=1):
            if rank <= k:
                res.append((grp, i, w, r, rank))
    return sorted(res)


def test_weighted_sample_matches_python_mirror(spark):
    from ocaml_rdf_spark.operators.sketches import weighted_sample

    rows = [("g1", i, (i * 37) % 11 + 1) for i in range(1, 40)] + [
        ("g2", i, 5) for i in range(100, 130)]
    sdf = spark.createDataFrame(rows, "grp string, id long, w long")
    got = sorted(
        (r.grp, r.id, r.w, r.r, r.rank)
        for r in weighted_sample(sdf, "grp", "id", F.col("w"), k=4).collect()
    )
    assert got == _py_weighted_sample(rows, 4)


def test_weighted_sample_weight_dominates_and_partitioning_invariant(spark):
    from ocaml_rdf_spark.operators.sketches import weighted_sample

    rows = [("g", i, 1) for i in range(1, 50)] + [("g", 999, 1_000_000_000)]
    sdf = spark.createDataFrame(rows, "grp string, id long, w long")
    top = weighted_sample(sdf, "grp", "id", F.col("w"), k=1).collect()
    assert [r.id for r in top] == [999]  # r = h div 1e9 ~ 0 beats every h div 1
    a = sorted(map(tuple, weighted_sample(sdf.repartition(1), "grp", "id", F.col("w"), k=7).collect()))
    b = sorted(map(tuple, weighted_sample(sdf.repartition(16), "grp", "id", F.col("w"), k=7).collect()))
    assert a == b


# --------------------------------------------------------------------------
# surt_key
# --------------------------------------------------------------------------

def test_surt_key_golden(spark):
    from ocaml_rdf_spark.operators.urls import surt_key

    cases = [
        ("https://www.Example.COM/Path/To?Q=1#frag", "com,example)/path/to?q=1"),
        ("HTTP://blog.sub.Example.com:8080/A", "com,example,sub,blog)/a"),
        ("https://example.com", "com,example)/"),
        ("https://www.www2.org/x", "org,www2)/x"),      # only ONE leading www.
        ("ftp://example.com/x", None),                   # non-web -> NULL
        ("not a url", None),
        ("http://Example.com:80/", "com,example)/"),
    ]
    sdf = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                                "i long, url string")
    got = {r.i: r.k for r in sdf.select("i", surt_key(F.col("url")).alias("k")).collect()}
    for i, (_u, want) in enumerate(cases):
        assert got[i] == want, (i, _u, got[i], want)


def test_surt_key_clusters_domain_contiguously(spark):
    from ocaml_rdf_spark.operators.urls import surt_key

    urls = ["https://a.example.com/1", "https://zz-other.net/x",
            "https://www.example.com/2", "https://m.example.com/3"]
    sdf = spark.createDataFrame([(u,) for u in urls], "url string")
    keys = sorted(r.k for r in sdf.select(surt_key(F.col("url")).alias("k")).collect())
    # the three example.com subdomains sort adjacent under SURT order
    assert [k.startswith("com,example") for k in keys] == [True, True, True, False]


# --------------------------------------------------------------------------
# salsa
# --------------------------------------------------------------------------

def _py_salsa(edges, iters=2, scale=1_000_000):
    e = sorted(set(edges))
    nodes = sorted({n for p in e for n in p})
    outd = Counter(u for u, _ in e)
    ind = Counter(v for _, v in e)
    h = {n: scale for n in nodes}
    a = {n: 0 for n in nodes}
    for _ in range(iters):
        a = {n: 0 for n in nodes}
        for u, v in e:
            a[v] += h[u] // outd[u]
        h = {n: 0 for n in nodes}
        for u, v in e:
            h[u] += a[v] // ind[v]
    return {n: (h[n], a[n]) for n in nodes}


def test_salsa_golden(spark):
    from ocaml_rdf_spark.operators.cc import salsa

    # hub u fans out to 3 authorities; w endorses one of them too;
    # dup edge collapses
    edges = [("u", "x"), ("u", "y"), ("u", "z"), ("w", "x"), ("u", "x")]
    sdf = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: (r.hub, r.auth) for r in salsa(sdf, iters=2).collect()}
    assert got == _py_salsa(edges)
    # x has 2 endorsers but each endorsement is divided per-link:
    # SALSA's point vs HITS — w's whole weight lands on x
    assert got["x"][1] > got["y"][1] == got["z"][1]


def test_salsa_degree_normalization_vs_hits_shape(spark):
    from ocaml_rdf_spark.operators.cc import salsa

    # a 1000-out-degree spammer hub contributes 1/1000 per link: its
    # targets gain ~nothing vs a focused endorser's target
    edges = [("spam", f"t{i}") for i in range(10)] + [("focus", "good")]
    sdf = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.auth for r in salsa(sdf, iters=1).collect()}
    assert got["good"] == 1_000_000 and got["t0"] == 100_000


# --------------------------------------------------------------------------
# luby_mis
# --------------------------------------------------------------------------

def _py_mis(edges, max_rounds=8):
    und = set()
    for u, v in edges:
        if u != v:
            und.add((u, v)); und.add((v, u))
    pr = {n: (int(hashlib.md5(n.encode()).hexdigest()[:15], 16), n)
          for n in {x for p in und for x in p}}
    active = set(pr)
    out = {}
    for rnd in range(1, max_rounds + 1):
        if not active:
            break
        sel = {a for a in active
               if not any(b in active and pr[b] < pr[a]
                          for (x, b) in und if x == a)}
        for s in sel:
            out[s] = rnd
        drop = set(sel) | {b for (a, b) in und if a in sel}
        active -= drop
    return out


def test_luby_mis_matches_python_mirror_and_is_maximal(spark):
    from ocaml_rdf_spark.operators.cc import luby_mis

    edges = [(str(i), str(i + 1)) for i in range(30)] + [
        ("0", "15"), ("7", "22"), ("a", "b"), ("c", "c")]  # chord + island + self-loop
    sdf = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.mis_round for r in luby_mis(sdf, max_rounds=8).collect()}
    assert got == _py_mis(edges)
    # independence: no edge inside the set; maximality: every non-member
    # has a member neighbor
    und = {(u, v) for u, v in edges if u != v} | {(v, u) for u, v in edges if u != v}
    members = set(got)
    assert not any(u in members and v in members for u, v in und)
    nodes = {x for p in und for x in p}
    for n in nodes - members:
        assert any(v in members for u, v in und if u == n), n


def test_luby_mis_partitioning_invariant(spark):
    from ocaml_rdf_spark.operators.cc import luby_mis

    edges = [(str(i), str((i * 7) % 40)) for i in range(80)]
    sdf = spark.createDataFrame(edges, "src string, dst string")
    a = sorted(map(tuple, luby_mis(sdf.repartition(1), max_rounds=8).collect()))
    b = sorted(map(tuple, luby_mis(sdf.repartition(16), max_rounds=8).collect()))
    assert a == b and a


# --------------------------------------------------------------------------
# phonetic_key
# --------------------------------------------------------------------------

def test_phonetic_key_golden(spark):
    from ocaml_rdf_spark.operators.linking import phonetic_key

    cases = [
        ("Robert", "R163"), ("Rupert", "R163"),       # classic pair blocks together
        ("Tymczak", "T522"), ("Pfister", "P236"),
        ("Honeyman", "H555"), ("Jackson", "J250"),
        ("Ashcraft", "A226"),  # pinned deviation: classic (H/W-transparent) is A261
        ("o'Brien", "O165"), ("  Lee  ", "L000"),
        ("123", None), ("", None),
    ]
    sdf = spark.createDataFrame([(i, n) for i, (n, _) in enumerate(cases)],
                                "i long, name string")
    got = {r.i: r.k for r in sdf.select(
        "i", phonetic_key(F.col("name")).alias("k")).collect()}
    for i, (name, want) in enumerate(cases):
        assert got[i] == want, (name, got[i], want)


# --------------------------------------------------------------------------
# cohen_kappa
# --------------------------------------------------------------------------

def test_cohen_kappa_golden(spark):
    from ocaml_rdf_spark.operators.stats import cohen_kappa

    # classic worked example: 2 raters, yes/no, po=0.7, pe=0.5, kappa=0.4
    rows = []
    for i in range(20):
        ra = "yes" if i < 10 else "no"
        # agree on 14 items (7 yes-yes, 7 no-no), disagree on 6
        rb = ra if (i % 10) < 7 else ("no" if ra == "yes" else "yes")
        rows += [(i, "A", ra), (i, "B", rb)]
    sdf = spark.createDataFrame(rows, "item long, rater string, label string")
    [r] = cohen_kappa(sdf, "A", "B").collect()
    assert (r.n_items, r.n_agree) == (20, 14)
    assert r.po_ppm == 700000 and r.pe_ppm == 500000
    assert r.kappa_ppm == 400000


def test_cohen_kappa_degenerate_and_dups(spark):
    from ocaml_rdf_spark.operators.stats import cohen_kappa

    # one-label world: pe = 1 -> kappa undefined (NULL); duplicate labels
    # by one rater collapse to min
    rows = [(1, "A", "x"), (1, "A", "z"), (1, "B", "x"), (2, "A", "x"), (2, "B", "x"),
            (3, "C", "ignored")]
    sdf = spark.createDataFrame(rows, "item long, rater string, label string")
    [r] = cohen_kappa(sdf, "A", "B").collect()
    assert (r.n_items, r.n_agree, r.po_ppm, r.pe_ppm) == (2, 2, 1000000, 1000000)
    assert r.kappa_ppm is None


# --------------------------------------------------------------------------
# dominant_matching
# --------------------------------------------------------------------------

def _py_matching(pairs, max_rounds=10):
    canon = {}
    for a, b, s in pairs:
        if a == b:
            continue
        key = (min(a, b), max(a, b))
        canon[key] = max(canon.get(key, -1), s)
    p = {k: v for k, v in canon.items()}
    out = {}
    for rnd in range(1, max_rounds + 1):
        if not p:
            break
        def k(ab):  # (score desc, a asc, b asc)
            return (-p[ab], ab[0], ab[1])
        best = {}
        for (a, b) in p:
            for x in (a, b):
                if x not in best or k((a, b)) < k(best[x]):
                    best[x] = (a, b)
        sel = [ab for ab in p if best[ab[0]] == ab and best[ab[1]] == ab]
        for ab in sel:
            out[ab] = (p[ab], rnd)
        matched = {x for ab in sel for x in ab}
        p = {ab: s for ab, s in p.items() if ab[0] not in matched and ab[1] not in matched}
    return {(a, b): v for (a, b), v in out.items()}


def test_dominant_matching_is_a_matching_and_mirrors(spark):
    from ocaml_rdf_spark.operators.linking import dominant_matching

    pairs = [("a", "b", 90), ("b", "c", 80), ("c", "d", 85), ("d", "e", 10),
             ("x", "y", 50), ("y", "x", 70),   # reverse dup -> max(score)
             ("z", "z", 99)]                   # self-pair dropped
    sdf = spark.createDataFrame(pairs, "a string, b string, score long")
    got = {(r.a, r.b): (r.score, r.match_round)
           for r in dominant_matching(sdf, max_rounds=10).collect()}
    assert got == _py_matching(pairs)
    # one-to-one: no endpoint twice
    ends = [x for ab in got for x in ab]
    assert len(ends) == len(set(ends))
    # the path a-b-c-d-e with scores 90,80,85,10: (a,b) and (c,d) are
    # locally dominant round 1; (d,e) dies with d; nothing left for b/e
    assert ("a", "b") in got and ("c", "d") in got and ("x", "y") in got
    assert got[("x", "y")][0] == 70


def test_dominant_matching_round2_pickup(spark):
    from ocaml_rdf_spark.operators.linking import dominant_matching

    # chain with strictly decreasing scores: only the head pair is
    # dominant each round -> rounds advance down the chain
    pairs = [(f"n{i}", f"n{i+1}", 100 - i) for i in range(6)]
    sdf = spark.createDataFrame(pairs, "a string, b string, score long")
    got = {(r.a, r.b): r.match_round for r in dominant_matching(sdf, max_rounds=10).collect()}
    assert got == {("n0", "n1"): 1, ("n2", "n3"): 2, ("n4", "n5"): 3}


# --------------------------------------------------------------------------
# pq_encode
# --------------------------------------------------------------------------

def test_pq_encode_blocks_equal_blockwise_kmeans(spark):
    from ocaml_rdf_spark.operators.ann import kmeans_int, pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = {r.vec_id: (r.code_0, r.code_1)
           for r in pq_encode(emb, dim=64, m=2, k=4).collect()}
    b0 = {r.vec_id: r.cluster for r in kmeans_int(
        emb.select("vec_id", F.slice("embedding", 1, 32).alias("embedding")), k=4).collect()}
    b1 = {r.vec_id: r.cluster for r in kmeans_int(
        emb.select("vec_id", F.slice("embedding", 33, 32).alias("embedding")), k=4).collect()}
    assert got == {v: (b0[v], b1[v]) for v in b0}
    # codes actually use the space (more than one distinct code per block)
    assert len({c for c, _ in got.values()}) > 1
    assert len({c for _, c in got.values()}) > 1


def test_pq_encode_guards_ragged_blocks(spark):
    import pytest as _pytest
    from ocaml_rdf_spark.operators.ann import pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with _pytest.raises(ValueError):
        pq_encode(emb, dim=64, m=3)


# --------------------------------------------------------------------------
# soft404_flags
# --------------------------------------------------------------------------

def test_soft404_rules(spark):
    from ocaml_rdf_spark.operators.textops import soft404_flags

    long_filler = " ".join(["word"] * 100)
    docs = [
        (1, "Oops! Error 404 - page not found."),            # 2 hits, short
        (2, long_filler + " error 404"),                      # 1 hit, long: NOT flagged
        (3, "sorry this does not exist"),                     # 1 hit, short: flagged
        (4, long_filler),                                     # clean
        (5, long_filler + " error 404 ... page not found"),   # 2 hits, long: flagged
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_hits, r.is_soft404) for r in soft404_flags(sdf).collect()}
    assert got[1] == (2, True) and got[2] == (1, False)
    assert got[3] == (1, True) and got[4] == (0, False) and got[5] == (2, True)


# --------------------------------------------------------------------------
# build_postings / phrase_search
# --------------------------------------------------------------------------

def test_postings_positions_and_tf(spark):
    from ocaml_rdf_spark.operators.textops import build_postings

    sdf = spark.createDataFrame(
        [(1, "to be or not to be"), (2, "Be!"), (3, "   ")],
        "doc_id long, text string",
    )
    got = {(r.term, r.doc_id): (r.tf, r.pos_csv) for r in build_postings(sdf).collect()}
    assert got[("to", 1)] == (2, "1,5")
    assert got[("be", 1)] == (2, "2,6")
    assert got[("or", 1)] == (1, "3") and got[("not", 1)] == (1, "4")
    assert got[("be", 2)] == (1, "1")
    assert all(d != 3 for (_t, d) in got)


def test_phrase_search_adjacency(spark):
    from ocaml_rdf_spark.operators.textops import phrase_search

    sdf = spark.createDataFrame(
        [
            (1, "the quick fox. the quick fox jumps."),  # 2 occurrences of "quick fox"
            (2, "quick brown fox"),                      # words present, not adjacent
            (3, "fox quick"),                            # reversed: no match
            (4, "a a a"),                                # repeated-word phrase case
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_occurrences for r in phrase_search(sdf, ["quick", "fox"]).collect()}
    assert got == {1: 2}
    rep = {r.doc_id: r.n_occurrences for r in phrase_search(sdf, ["a", "a"]).collect()}
    assert rep == {4: 2}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        phrase_search(sdf, ["one"])
    with _pytest.raises(ValueError):
        phrase_search(sdf, ["Quick", "fox"])  # not normalized


# --------------------------------------------------------------------------
# cluster_aware_split
# --------------------------------------------------------------------------

def test_cluster_split_is_leak_free(spark):
    from ocaml_rdf_spark.operators.textops import cluster_aware_split

    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    docs = [(1, base), (2, base + "iota"), (3, "totally different content here " * 6),
            (4, base + "kappa"), (5, "another unrelated body of words " * 6)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    rows = cluster_aware_split(sdf, bands=8, band_min=4, jac_min=60).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    # every cluster lands in exactly one split (the leak-free property)
    assert all(len(s) == 1 for s in by_cluster.values())
    # docs 1/2/4 are near-dups -> one cluster
    cl = {r.doc_id: r.cluster_id for r in rows}
    assert cl[1] == cl[2] == cl[4] == 1 and cl[3] == 3 and cl[5] == 5


# --------------------------------------------------------------------------
# filter_funnel
# --------------------------------------------------------------------------

def test_filter_funnel_marginal_cascade(spark):
    from ocaml_rdf_spark.operators.textops import filter_funnel

    ok = " ".join(["tok"] * 20)
    docs = [
        (1, ok),                       # passes all
        (2, "short"),                  # killed at stage 1
        (3, "x" * 25000 + " " + ok),   # killed at stage 2 (long)
        (4, ok + " �"),           # killed at stage 3 (mojibake)
        (5, ok + " " + "9" * 200),     # killed at stage 4 (digits > 25%)
        (6, "12 34 " + ok),            # digits fine: passes
    ]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.stage: (r.name, r.n_in, r.n_killed, r.n_out)
           for r in filter_funnel(sdf).collect()}
    assert got[1] == ("min_tokens", 6, 1, 5)
    assert got[2] == ("max_chars", 5, 1, 4)
    assert got[3] == ("no_mojibake", 4, 1, 3)
    assert got[4] == ("digit_ratio", 3, 1, 2)


# --------------------------------------------------------------------------
# log_replay_asof
# --------------------------------------------------------------------------

def test_log_replay_asof_semantics(spark):
    from ocaml_rdf_spark.operators.temporal import log_replay_asof

    K = ("s_lex", "pred", "o_kind", "o_lex", "o_dtype")
    mk = lambda s, o: (s, "urn:p", 2, o, None)  # noqa: E731
    log = [
        mk("a", "x") + ("assert", 100),                      # alive
        mk("b", "x") + ("assert", 100), mk("b", "x") + ("retract", 200),   # dead
        mk("c", "x") + ("assert", 100), mk("c", "x") + ("retract", 200),
        mk("c", "x") + ("assert", 300),                      # re-asserted: alive
        mk("d", "x") + ("assert", 100), mk("d", "x") + ("retract", 100),   # tie: retract wins
        mk("e", "x") + ("assert", 999),                      # after T: invisible
        mk("f", "x") + ("retract", 50),                      # retract-only: dead
        mk("a", "y") + ("assert", 100),                      # second fact on a: independent
    ]
    sdf = spark.createDataFrame(
        log, "s_lex string, pred string, o_kind int, o_lex string, o_dtype string, "
             "op string, ts_us long")
    got = {(r.s_lex, r.o_lex) for r in log_replay_asof(sdf, 500).collect()}
    assert got == {("a", "x"), ("c", "x"), ("a", "y")}
    # as-of BEFORE the retract: b alive, c alive (first assert)
    got2 = {(r.s_lex, r.o_lex) for r in log_replay_asof(sdf, 150).collect()}
    assert got2 == {("a", "x"), ("b", "x"), ("c", "x"), ("a", "y")}


# --------------------------------------------------------------------------
# rrf_fuse
# --------------------------------------------------------------------------

def test_rrf_fuse_golden(spark):
    from ocaml_rdf_spark.operators.textops import rrf_fuse

    runs = [("A", 1, 1), ("A", 2, 2), ("A", 3, 3),
            ("B", 2, 1), ("B", 4, 2)]
    sdf = spark.createDataFrame(runs, "run string, doc_id long, rank int")
    got = {r.doc_id: (r.n_runs, r.rrf_score, r.fused_rank)
           for r in rrf_fuse(sdf, k=60).collect()}
    s = lambda r: 1_000_000 // (60 + r)  # noqa: E731
    assert got[2] == (2, s(2) + s(1), 1)   # in both runs: wins
    assert got[1] == (1, s(1), 2)
    assert got[4] == (1, s(2), 3)
    assert got[3] == (1, s(3), 4)


# --------------------------------------------------------------------------
# direct_mapping (W3C Direct Mapping subset)
# --------------------------------------------------------------------------

def test_direct_mapping_rules(spark):
    import datetime

    from ocaml_rdf_spark.operators.directmap import direct_mapping

    rows = [
        (1, "a b#c", 2.5, True, datetime.date(2020, 1, 2), 10),
        (2, None, None, None, None, None),
    ]
    sdf = spark.createDataFrame(
        rows, "id int, nm string, val double, ok boolean, d date, fk int"
    )
    quads = direct_mapping(
        sdf, "t", pk=["id"], fks={"fk": ("u", "uid")}, base="urn:x:"
    ).collect()
    by = {}
    for r in quads:
        by.setdefault(r.s_lex, {})[r.pred] = (r.o_kind, r.o_lex, r.o_dtype)
    s1, s2 = "urn:x:t/id=1", "urn:x:t/id=2"
    XSD = "http://www.w3.org/2001/XMLSchema#"
    # typed literals per column type; reserved chars encoded only in IRIs
    assert by[s1]["urn:x:t#nm"] == (2, "a b#c", XSD + "string")
    assert by[s1]["urn:x:t#val"] == (2, "2.5", XSD + "double")
    assert by[s1]["urn:x:t#ok"] == (2, "true", XSD + "boolean")
    assert by[s1]["urn:x:t#d"] == (2, "2020-01-02", XSD + "date")
    assert by[s1]["urn:x:t#ref-fk"] == (0, "urn:x:u/uid=10", None)
    # type arc on every row; NULL columns emit nothing
    assert by[s1]["http://www.w3.org/1999/02/22-rdf-syntax-ns#type"][1] == "urn:x:t"
    assert set(by[s2]) == {
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", "urn:x:t#id"}


def test_direct_mapping_composite_pk_and_encoding(spark):
    from ocaml_rdf_spark.operators.directmap import direct_mapping

    sdf = spark.createDataFrame([("a b", "x/y=z", 1)], "k1 string, k2 string, v int")
    [s] = direct_mapping(sdf, "t", pk=["k1", "k2"]).select("s_lex").distinct().collect()
    assert s.s_lex == "urn:dm:t/k1=a%20b;k2=x%2Fy%3Dz"
    import pytest as _pytest
    with _pytest.raises(ValueError):
        direct_mapping(sdf, "t", pk=[])
