"""Web-link-graph operators: extraction, host graph, anchor dictionary,
redirect resolution, robots rules (operators/weblinks.py).

Reference parity: ocaml-rdf surfaces hrefs only as RDFa/microdata IRI
objects (rdf_rdfa.ml); the explicit link-graph layer is an engine
addition per the north rule's web-KG scope (SURVEY §2.2/§8)."""

from __future__ import annotations

import pytest

from ocaml_rdf_spark.operators.weblinks import (
    anchor_dictionary,
    extract_links,
    host_link_graph,
    resolve_redirects,
    robots_filter,
)


@pytest.fixture(scope="module")
def links(spark):
    pages = spark.createDataFrame(
        [
            (
                "https://a.example/p/1",
                '<p>x</p><a href="https://b.example/q">B  Page</a>'
                '<a class="z" href="/local">Loc</a>'
                '<a href="//c.example/r">CC</a>'
                '<a href="#frag">skip</a><a href="mailto:x@y">m</a>'
                '<a href="https://a.example/self#sec">Self</a>',
            ),
            (
                "https://b.example/p/2",
                '<a href="https://a.example/p/1">A   page</a> '
                '<a href="https://a.example/p/1">a page</a>',
            ),
        ],
        ["url", "html"],
    )
    return extract_links(pages)


def test_extract_links_resolution(links):
    rows = {(r.src_url, r.dst_url, r.anchor) for r in links.collect()}
    assert rows == {
        # absolute passes through; anchor whitespace collapsed
        ("https://a.example/p/1", "https://b.example/q", "B Page"),
        # root-relative resolves against the source origin
        ("https://a.example/p/1", "https://a.example/local", "Loc"),
        # protocol-relative inherits the source scheme
        ("https://a.example/p/1", "https://c.example/r", "CC"),
        # fragment stripped from resolved target
        ("https://a.example/p/1", "https://a.example/self", "Self"),
        # duplicates preserved at the edge level (counted downstream) —
        # but these two differ in anchor case anyway
        ("https://b.example/p/2", "https://a.example/p/1", "A page"),
        ("https://b.example/p/2", "https://a.example/p/1", "a page"),
    }


def test_host_link_graph_drops_self_loops(links):
    hg = {
        (r.src_host, r.dst_host): (r.n_links, r.n_src_pages)
        for r in host_link_graph(links).collect()
    }
    assert hg == {
        ("a.example", "b.example"): (1, 1),
        ("a.example", "c.example"): (1, 1),
        ("b.example", "a.example"): (2, 1),
    }
    withself = {
        (r.src_host, r.dst_host): r.n_links
        for r in host_link_graph(links, keep_self=True).collect()
    }
    assert withself[("a.example", "a.example")] == 2


def test_anchor_dictionary_casefold_and_topk(links):
    ad = {
        (r.alias, r.rank): (r.dst_url, r.n_links)
        for r in anchor_dictionary(links, min_count=2, k=1).collect()
    }
    # 'A page' + 'a page' casefold together and clear min_count=2
    assert ad == {("a page", 1): ("https://a.example/p/1", 2)}


def test_resolve_redirects_chains_and_cycles(spark):
    red = spark.createDataFrame(
        [("u1", "u2"), ("u2", "u3"), ("u3", "u4"),
         ("c1", "c2"), ("c2", "c1"), ("x1", "u2")],
        ["src", "dst"],
    )
    out = {r.src: (r.final_url, r.hops, r.is_cycle)
           for r in resolve_redirects(red, max_hops=16).collect()}
    assert out["u1"] == ("u4", 3, False)
    assert out["u2"] == ("u4", 2, False)
    assert out["u3"] == ("u4", 1, False)
    assert out["x1"] == ("u4", 3, False)
    assert out["c1"][0] is None and out["c1"][2] is True
    assert out["c2"][0] is None and out["c2"][2] is True


def test_resolve_redirects_deep_chain_logarithmic(spark):
    # 60-deep chain resolves within ceil(log2(64)) = 6 doubling rounds
    red = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(60)], ["src", "dst"]
    )
    out = {r.src: (r.final_url, r.hops, r.is_cycle)
           for r in resolve_redirects(red, max_hops=64).collect()}
    assert out["n0"] == ("n60", 60, False)
    assert out["n59"] == ("n60", 1, False)


def test_robots_longest_prefix_match(spark):
    rules = spark.createDataFrame(
        [("a.example", "/private", False),
         ("a.example", "/private/pub", True),
         ("a.example", "", True),
         ("b.example", "/", False)],
        ["host", "prefix", "allow"],
    )
    urls = spark.createDataFrame(
        [("https://a.example/private/x",),
         ("https://a.example/private/pub/y",),
         ("https://a.example/open",),
         ("https://a.example",),  # no path → '/'
         ("https://b.example/anything",),
         ("https://c.example/no-rules",)],
        ["url"],
    )
    out = {r.url: (r.rule_prefix, r.allowed)
           for r in robots_filter(urls, rules).collect()}
    assert out["https://a.example/private/x"] == ("/private", False)
    # longest prefix wins over the shorter Disallow
    assert out["https://a.example/private/pub/y"] == ("/private/pub", True)
    assert out["https://a.example/open"] == ("", True)
    assert out["https://a.example"] == ("", True)
    assert out["https://b.example/anything"] == ("/", False)
    # host without rules → allowed by default
    assert out["https://c.example/no-rules"] == ("", True)


def test_parse_sitemaps_fields_and_dropped_blocks(spark):
    from ocaml_rdf_spark.operators.weblinks import parse_sitemaps

    sm = spark.createDataFrame(
        [("h1",
          '<?xml version="1.0"?><urlset>'
          "<url><loc>https://h1/a</loc><lastmod>2026-01-02</lastmod>"
          "<changefreq>daily</changefreq><priority>0.8</priority></url>"
          "<url><loc> https://h1/b </loc><priority>1.0</priority></url>"
          "<url><changefreq>never</changefreq></url></urlset>")],
        ["host", "xml"],
    )
    rows = {r.loc: (r.host, r.lastmod, r.changefreq, r.priority_x100)
            for r in parse_sitemaps(sm).collect()}
    # loc-less block dropped; loc whitespace trimmed; priority exact x100
    assert rows == {
        "https://h1/a": ("h1", "2026-01-02", "daily", 80),
        "https://h1/b": ("h1", None, None, 100),
    }


def test_canonical_links_orders_resolution_fallback(spark):
    from ocaml_rdf_spark.operators.weblinks import canonical_links

    pg = spark.createDataFrame(
        [("https://a.ex/p?x=1", '<head><link rel="canonical" href="https://a.ex/p"></head>'),
         ("https://a.ex/q", '<head><link href="/q" rel="canonical"></head>'),
         ("https://a.ex/r", "<head><title>none</title></head>"),
         ("https://a.ex/s", '<head><link rel="canonical" href="//b.ex/s2#frag"></head>')],
        ["url", "html"],
    )
    out = {r.url: (r.canonical_url, r.is_cross) for r in canonical_links(pg).collect()}
    assert out["https://a.ex/p?x=1"] == ("https://a.ex/p", True)   # query stripped by declaration
    assert out["https://a.ex/q"] == ("https://a.ex/q", False)       # href-then-rel order, self
    assert out["https://a.ex/r"] == ("https://a.ex/r", False)       # no declaration → self
    assert out["https://a.ex/s"] == ("https://b.ex/s2", True)       # protocol-relative + fragment strip


def test_link_spam_reciprocity_and_concentration(spark):
    from ocaml_rdf_spark.operators.weblinks import link_spam

    # farm ring a<->b, a<->c (recip 2/2); editorial host d -> a,b,c (recip 0/3);
    # concentrated host e -> a with huge volume
    edges = spark.createDataFrame(
        [("a", "b", 10), ("b", "a", 10), ("a", "c", 10), ("c", "a", 1),
         ("d", "a", 1), ("d", "b", 1), ("d", "c", 2),
         ("e", "a", 99), ("e", "b", 1)],
        "src_host string, dst_host string, n_links long",
    )
    out = {r["host"]: r for r in link_spam(edges).collect()}
    assert out["a"]["recip_ppm"] == 1000000 and out["a"]["spam"] == 1
    assert out["b"]["recip_ppm"] == 1000000  # out_degree 1 < min_out -> not spam
    assert out["b"]["spam"] == 0
    assert out["d"]["recip_ppm"] == 0 and out["d"]["spam"] == 0
    assert out["d"]["top1_ppm"] == 500000  # 2 of 4 links to c
    assert out["e"]["top1_ppm"] == 990000 and out["e"]["spam"] == 0


def test_hreflang_one_directional_annotation_still_clusters(spark):
    """Symmetrization must not require reciprocal annotation: only the
    en page declares alternates, yet all three URLs share a cluster;
    fragments are stripped and self-links dropped."""
    from ocaml_rdf_spark.operators.weblinks import hreflang_clusters, hreflang_edges

    pages = spark.createDataFrame(
        [
            (
                "https://s.example/en",
                '<link rel="alternate" hreflang="en" href="https://s.example/en">'
                '<link rel="alternate" hreflang="fr" href="https://s.example/fr#top">'
                '<link rel="alternate" hreflang="de" href="https://s.example/de">',
            ),
            ("https://s.example/fr", "<p>no annotations here</p>"),
            ("https://other.example/x", '<link rel="alternate" hreflang="en" href="https://other.example/y">'),
        ],
        "url string, html string",
    )
    e = hreflang_edges(pages)
    assert e.filter("src_url = alt_url").count() == 1  # self-claim kept
    assert e.filter("alt_url LIKE '%#%'").count() == 0  # fragment stripped
    out = {r["cluster_id"]: r for r in hreflang_clusters(e).collect()}
    big = out["https://s.example/de"]  # lexicographic min of the trio
    assert big["n_pages"] == 3 and big["langs"] == "de,en,fr"
    assert out["https://other.example/x"]["n_pages"] == 2


def test_parse_feeds_subset_contract(spark):
    """RSS linkless items drop; Atom entries parse; first match wins
    inside a block."""
    from ocaml_rdf_spark.operators.weblinks import parse_feeds

    feeds = spark.createDataFrame(
        [
            (
                "https://a.example/feed",
                "<rss><channel>"
                "<item><title>one</title><link>https://a.example/1</link>"
                "<link>https://a.example/ignored</link><pubDate>t1</pubDate></item>"
                "<item><title>linkless</title><pubDate>t2</pubDate></item>"
                "</channel></rss>",
            ),
            (
                "https://b.example/feed",
                '<feed><entry><title>e1</title><link href="https://b.example/1"/>'
                "<updated>u1</updated></entry></feed>",
            ),
        ],
        "feed_url string, xml string",
    )
    rows = {(r["feed_url"], r["item_url"]): r for r in parse_feeds(feeds).collect()}
    assert ("https://a.example/feed", "https://a.example/1") in rows
    assert rows[("https://a.example/feed", "https://a.example/1")]["ts_raw"] == "t1"
    assert len([k for k in rows if k[0] == "https://a.example/feed"]) == 1  # linkless dropped
    assert rows[("https://b.example/feed", "https://b.example/1")]["title"] == "e1"


def test_cocitation_hub_guard_caps_contribution(spark):
    """A directory host citing many destinations contributes only its
    top-max_out pairs; a pair needs min_cocites distinct sources."""
    from ocaml_rdf_spark.operators.weblinks import cocitation

    rows = [("hub", f"d{i}", 100 - i) for i in range(10)]  # d0..d9, weights desc
    rows += [("s1", "d0", 1), ("s1", "d1", 1), ("s2", "d0", 1), ("s2", "d1", 1)]
    edges = spark.createDataFrame(rows, "src_host string, dst_host string, n_links long")
    out = {(r["h1"], r["h2"]): r["n_cocites"] for r in cocitation(edges, max_out=2, min_cocites=2, k=10).collect()}
    # hub keeps only (d0,d1); with s1+s2 that pair has 3 cocites
    assert out == {("d0", "d1"): 3}
