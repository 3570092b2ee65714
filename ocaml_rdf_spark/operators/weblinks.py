"""Hyperlink graph construction — the web-link layer of a KG pipeline.

A Common-Crawl-style corpus is not just pages: the `<a href>` edges
BETWEEN pages are a first-class KG signal. Production web-KG systems
mine three artifacts from them, all built here with pure
`pyspark.sql.functions` column algebra (no UDF, no driver loop):

- `extract_links`  — (src_url, dst_url, anchor) edge list from raw
  html. Scan-local: two zipped `regexp_extract_all` projections (the
  `rel_extract` pattern) + CASE-based reference resolution. No shuffle.
- `host_link_graph` — host-level weighted edge list. ONE map-side-
  combined shuffle on (src_host, dst_host); self-loops dropped. A
  mega-host's outlinks spread across its distinct destination hosts,
  so no reducer sees a mega-host's full row set.
- `anchor_dictionary` — normalized anchor text → top-k target URLs
  with counts: the classic alias-dictionary source that feeds entity
  linking (`operators/linking.py` consumes exactly this (alias, uri)
  shape). Two stages: (anchor, dst) cell counts WITH map-side combine,
  then a per-anchor top-k window over the already-partitioned cells.

Reference parity: ocaml-rdf models the page graph only implicitly
(RDFa `href` objects become IRI terms — `rdf_rdfa.ml`); the explicit
link-graph operators are engine additions mandated by the north rule's
web-scale KG-construction scope (SURVEY §2.2, §8).

Scale notes (100 TB): link extraction is embarrassingly parallel and
pipelines with the triple-extraction scan (same pass over html).
The host graph is orders of magnitude smaller than the page graph
(|hosts|² bounded, counts combined map-side). The anchor dictionary
is bounded by distinct (anchor, dst) pairs; the `min_count` filter is
applied BEFORE the window so tail anchors never reach the rank stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .urls import url_host

# one <a ...> tag with a double-quoted href and a tag-free anchor body;
# mirrored verbatim by the DuckDB oracles (RE2/Java-common subset:
# character classes + lazy-free alternation only)
_A_HREF = '<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>'
#: scheme+host of an absolute http(s) URL (the resolution origin)
_ORIGIN_RE = "^(https?://[^/?#]+)"


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url, anchor) hyperlink edges from raw html.

    Resolution is the engine-portable subset of RFC 3986 §5 relative
    resolution: absolute http(s) hrefs pass through, root-relative
    hrefs (``/path``) resolve against the source URL's scheme+host,
    protocol-relative hrefs (``//host/path``) inherit the source
    scheme. Everything else — fragment-only, mailto:, javascript:,
    path-relative — is dropped (documented subset; the full resolver
    lives in sources/iri.py for parser-side use where exactness is
    mandated). Fragments are stripped from resolved targets, anchor
    text is whitespace-normalized, and empty targets are dropped.

    Scan-local, zero shuffles; the html column never leaves the scan.
    """
    html = F.col(html_col)
    hrefs = F.regexp_extract_all(html, F.lit(_A_HREF), F.lit(1))
    texts = F.regexp_extract_all(html, F.lit(_A_HREF), F.lit(2))
    src = F.col(url_col)
    scheme = F.regexp_extract(src, "^(https?):", 1)
    origin = F.regexp_extract(src, _ORIGIN_RE, 1)

    out = (
        pages.select(
            src.alias("src_url"),
            scheme.alias("_scheme"),
            origin.alias("_origin"),
            F.explode(F.arrays_zip(hrefs.alias("href"), texts.alias("anchor"))).alias("_a"),
        )
        .select(
            "src_url",
            "_scheme",
            "_origin",
            F.col("_a.href").alias("_href"),
            F.trim(F.regexp_replace(F.col("_a.anchor"), r"\s+", " ")).alias("anchor"),
        )
        .withColumn(
            "dst_url",
            F.when(F.col("_href").rlike("^https?://"), F.col("_href"))
            .when(
                F.col("_href").startswith("//"),
                F.concat(F.col("_scheme"), F.lit(":"), F.col("_href")),
            )
            .when(
                F.col("_href").startswith("/"),
                F.concat(F.col("_origin"), F.col("_href")),
            ),
        )
        .withColumn("dst_url", F.regexp_replace(F.col("dst_url"), "#.*$", ""))
        .filter(F.col("dst_url").isNotNull() & (F.col("dst_url") != ""))
    )
    return out.select("src_url", "dst_url", "anchor")


def host_link_graph(links: DataFrame, keep_self: bool = False) -> DataFrame:
    """Host-level link graph: (src_host, dst_host, n_links, n_src_pages).

    ONE shuffle — the (src_host, dst_host) groupBy, map-side combined.
    `n_src_pages` (distinct linking pages per host edge) rides the same
    shuffle as an exact count-distinct over the grouped cells: the
    pre-aggregation on (src_host, dst_host, src_url) bounds every
    reducer by the edge's distinct page count, never a mega-host's raw
    outlink multiset. Self-edges (intra-host navigation, the vast
    majority of real-web links) are dropped unless `keep_self`.
    """
    e = links.select(
        url_host(F.col("src_url")).alias("src_host"),
        url_host(F.col("dst_url")).alias("dst_host"),
        F.col("src_url"),
    )
    if not keep_self:
        e = e.filter(F.col("src_host") != F.col("dst_host"))
    cells = e.groupBy("src_host", "dst_host", "src_url").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return cells.groupBy("src_host", "dst_host").agg(
        F.sum("_n").cast("long").alias("n_links"),
        F.count(F.lit(1)).cast("long").alias("n_src_pages"),
    )


def anchor_dictionary(
    links: DataFrame, min_count: int = 2, k: int = 1
) -> DataFrame:
    """Anchor-text alias dictionary: (alias, dst_url, n_links, rank).

    The web's crowd-sourced entity lexicon: how pages NAME the things
    they link to. Anchor text is lowercased + whitespace-collapsed;
    anchors that are empty or longer than 64 chars (navigation
    boilerplate) are dropped. Per (alias, dst_url) counts aggregate
    with map-side combine; `min_count` prunes the tail BEFORE the
    per-alias top-k window, and the window reuses the cells' alias
    partitioning. Output feeds `linking.link_exact`'s broadcast
    dictionary directly.
    """
    cells = (
        links.select(
            F.lower(F.trim(F.regexp_replace(F.col("anchor"), r"\s+", " "))).alias("alias"),
            F.col("dst_url"),
        )
        .filter((F.col("alias") != "") & (F.length("alias") <= 64))
        .groupBy("alias", "dst_url")
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"))
        .filter(F.col("n_links") >= min_count)
    )
    w = Window.partitionBy("alias").orderBy(
        F.col("n_links").desc(), F.col("dst_url").asc()
    )
    return (
        cells.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("alias", "dst_url", "n_links", "rank")
    )


def resolve_redirects(redirects: DataFrame, max_hops: int = 64) -> DataFrame:
    """Resolve redirect chains to their final targets by pointer doubling.

    Input: single-hop (src, dst) redirect pairs — a functional graph
    (one outgoing edge per src; duplicate srcs are rejected upstream by
    the caller or collapse arbitrarily). Output: one row per input src
    with (src, final_url, hops, is_cycle). `final_url` is the first URL
    reached that has no outgoing redirect; chains longer than
    `max_hops` — which on a functional graph means a cycle — surface
    `is_cycle = true` with `final_url` NULL.

    O(log max_hops) rounds: each round composes the current jump table
    with itself (`state.cur ⇄ jump.src` equi-join), exactly the
    path-doubling discipline of `paths.transitive_closure` — after r
    rounds every chain of length ≤ 2^r is fully resolved. Each round is
    one hash join on the shrinking unresolved set + one on the jump
    table; lineage is cut per round with localCheckpoint so plans stay
    flat. Redirect sets are crawl-metadata-sized (≪ corpus), so every
    join side is small; at 100 TB the jump table still fits the
    broadcast threshold for all real crawls (<1B redirects).
    """
    import math

    rounds = max(1, math.ceil(math.log2(max_hops)))
    # jump[src] = (reach, hops): the 2^r-step transition table
    jump = redirects.select(
        F.col("src").alias("j_src"), F.col("dst").alias("j_dst"), F.lit(1).alias("j_hops")
    ).localCheckpoint(eager=False)
    # state: one row per original src
    state = redirects.select(
        F.col("src"), F.col("dst").alias("cur"), F.lit(1).alias("hops")
    ).localCheckpoint(eager=False)

    for _ in range(rounds):
        state = (
            state.join(jump, state["cur"] == jump["j_src"], "left")
            .select(
                "src",
                F.coalesce(F.col("j_dst"), F.col("cur")).alias("cur"),
                (F.col("hops") + F.coalesce(F.col("j_hops"), F.lit(0))).alias("hops"),
            )
            .localCheckpoint(eager=False)
        )
        jump = (
            jump.alias("a")
            .join(
                jump.select(
                    F.col("j_src").alias("b_src"),
                    F.col("j_dst").alias("b_dst"),
                    F.col("j_hops").alias("b_hops"),
                ).alias("b"),
                F.col("a.j_dst") == F.col("b.b_src"),
                "left",
            )
            .select(
                F.col("a.j_src").alias("j_src"),
                F.coalesce(F.col("b.b_dst"), F.col("a.j_dst")).alias("j_dst"),
                (F.col("a.j_hops") + F.coalesce(F.col("b.b_hops"), F.lit(0))).alias("j_hops"),
            )
            .localCheckpoint(eager=False)
        )

    # terminal = cur has no outgoing redirect; anything still moving
    # after 2^rounds ≥ max_hops steps is a cycle
    srcs = redirects.select(F.col("src").alias("t_src")).distinct()
    return (
        state.join(srcs, state["cur"] == srcs["t_src"], "left")
        .select(
            "src",
            F.when(F.col("t_src").isNull(), F.col("cur")).alias("final_url"),
            F.col("hops").cast("long").alias("hops"),
            F.col("t_src").isNotNull().alias("is_cycle"),
        )
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Apply robots.txt-style longest-prefix-match rules to a URL set.

    `rules`: (host, prefix, allow) — parsed Allow/Disallow lines, one
    row each (prefix = path prefix, '' matches everything). Matching
    per REP (RFC 9309 §2.2.2): among the rules of the URL's host whose
    prefix is a prefix of the URL path, the LONGEST prefix wins; Allow
    wins prefix-length ties; a URL with no matching rule (or no rules
    for its host) is allowed.

    Plan — ZERO shuffles on the URL set: the rules collapse to ONE row
    per host (`collect_list`, a rules-sized agg), broadcast-hash-join
    to the URLs (1:1, no row multiplication), and the longest-match
    argmax runs as array algebra (`filter` + `array_max` over a
    (len, allow, prefix) struct — struct comparison is field-order
    lexicographic in Spark, so the max IS the REP winner) inside the
    scan stage. Returns the input rows + (rule_prefix, allowed).
    """
    path = F.coalesce(
        F.nullif(F.regexp_extract(F.col(url_col), "^https?://[^/?#]+([/][^#]*)?", 1), F.lit("")),
        F.lit("/"),
    )
    per_host = rules.groupBy(F.col("host").alias("_rhost")).agg(
        F.collect_list(F.struct(F.col("prefix"), F.col("allow"))).alias("_rules")
    )
    u = urls.withColumn("_host", url_host(F.col(url_col))).withColumn("_path", path)
    j = u.join(F.broadcast(per_host), F.col("_host") == F.col("_rhost"), "left")

    def _matches(p):
        return lambda r: p.startswith(r["prefix"])

    matched = F.filter(F.coalesce(F.col("_rules"), F.array()), _matches(F.col("_path")))

    def _key(r):
        return F.struct(
            F.length(r["prefix"]).alias("len"),
            r["allow"].cast("int").alias("a"),
            r["prefix"].alias("prefix"),
        )

    best = F.array_max(F.transform(matched, _key))
    return j.select(
        *[F.col(c) for c in urls.columns],
        F.coalesce(best["prefix"], F.lit("")).alias("rule_prefix"),
        F.coalesce(best["a"] == 1, F.lit(True)).alias("allowed"),
    )


def host_authority(host_edges: DataFrame) -> DataFrame:
    """Per-host authority profile over a `host_link_graph` edge list:
    out_degree / in_degree (distinct peer hosts), out_links / in_links
    (link volumes), and authority_ppm = in_links * 1e6 div
    (in_links + out_links) — the link-economy asymmetry signal quality
    classifiers consume (content farms link out, authorities get linked
    to).

    Two host-keyed aggregates over the (already tiny) host graph + one
    full outer join; all-integer math."""
    out_ = host_edges.groupBy(F.col("src_host").alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("out_degree"),
        F.sum("n_links").cast("long").alias("out_links"),
    )
    in_ = host_edges.groupBy(F.col("dst_host").alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("in_degree"),
        F.sum("n_links").cast("long").alias("in_links"),
    )
    j = out_.join(in_, "host", "full_outer").select(
        "host",
        F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
        F.coalesce("out_links", F.lit(0)).alias("out_links"),
        F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        F.coalesce("in_links", F.lit(0)).alias("in_links"),
    )
    return j.withColumn(
        "authority_ppm",
        F.expr(
            "CASE WHEN in_links + out_links = 0 THEN 0 "
            "ELSE CAST(in_links * 1000000 AS BIGINT) div (in_links + out_links) END"
        ),
    )


def spam_mass(
    host_edges: DataFrame,
    trusted: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Spam mass per host (Gyöngyi et al., "Link Spam Detection Based on
    Mass Estimation", VLDB 2006): the fraction of a host's PageRank that
    does NOT flow from a trusted seed set. `host_edges(src_host,
    dst_host, ...)` is the host link graph; `trusted(host)` the vetted
    seed list (e.g. .gov/.edu cores). Returns (host, rank, trust,
    spam_ppm) where `rank`/`trust` are the integer-exact global and
    seed-personalized PageRank scores (operators/cc.py :: pagerank) and
    spam_ppm = 1e6 − min(1e6, trust_share/rank_share in ppm): 0 for
    fully-trusted hosts, →1e6 for hosts whose rank comes entirely from
    the spam-reachable part of the web.

    The share normalization (each score over its own global sum) makes
    the two runs comparable without dividing the seed base (which would
    break exact-integer PPR): nested integer div, deterministic and
    engine-portable. Shape: two 3-iteration PR runs over the same
    pre-joined degree-carrying edge set (each iteration = one hash join
    + one map-side-combined aggregate), one 1-row total broadcast each,
    one final host-keyed join."""
    from .cc import pagerank

    edges = host_edges.select(
        F.col("src_host").alias("src"), F.col("dst_host").alias("dst")
    )
    seeds = trusted.select(F.col("host").alias("node"))
    pr = pagerank(edges, iters=iters, damping_pct=damping_pct)
    tr = pagerank(edges, iters=iters, damping_pct=damping_pct, seeds=seeds)
    pr_tot = pr.agg(F.sum("rank").alias("rt"))
    tr_tot = tr.agg(F.sum("rank").alias("tt"))
    prs = pr.crossJoin(F.broadcast(pr_tot)).select(
        "node", "rank", F.expr("rank * 1000000000 div rt").alias("rank_ppb")
    )
    trs = tr.crossJoin(F.broadcast(tr_tot)).select(
        F.col("node").alias("tnode"),
        F.col("rank").alias("trust"),
        F.expr("rank * 1000000000 div tt").alias("trust_ppb"),
    )
    return (
        prs.join(trs, prs["node"] == trs["tnode"])
        .select(
            F.col("node").alias("host"),
            "rank",
            "trust",
            F.expr(
                "CAST(1000000 - LEAST(CAST(1000000 AS BIGINT), "
                "CASE WHEN rank_ppb = 0 THEN CAST(1000000 AS BIGINT) "
                "ELSE trust_ppb * 1000000 div rank_ppb END) AS BIGINT)"
            ).alias("spam_ppm"),
        )
    )


def parse_sitemaps(sitemaps: DataFrame, xml_col: str = "xml") -> DataFrame:
    """XML sitemap (sitemaps.org <urlset>) → one row per <url> entry:
    (loc, lastmod, changefreq, priority_x100) plus every other input
    column passed through (host, fetch time, …).

    Scan-local zipped-regex parsing (the rel_extract pattern): one
    `(?s)<url>…</url>` block explode, then per-field extracts inside
    the block — no XML DOM, no UDF, no shuffle; a malformed block
    yields NULL fields, never an error. `priority` is surfaced as an
    exact integer ×100 (the engine-wide no-floats rule); `lastmod`
    stays the lexical W3C datetime (typed interpretation is the
    consumer's try_cast, the same lazy rule as RDF literals).

    At 100 TB: sitemap fetches are crawl metadata (≪ corpus); the op
    composes with `change_rate` (lastmod vs observed change) and
    `crawl_schedule` (priority → slot ordering)."""
    passthrough = [c for c in sitemaps.columns if c != xml_col]
    blocks = F.regexp_extract_all(F.col(xml_col), F.lit(r"(?s)<url>(.*?)</url>"), F.lit(1))
    b = F.col("_block")
    pr = F.regexp_extract(b, r"<priority>\s*([0-9.]+)\s*</priority>", 1)
    return (
        sitemaps.select(*passthrough, F.explode(blocks).alias("_block"))
        .select(
            *passthrough,
            F.nullif(F.regexp_extract(b, r"<loc>\s*([^<]*?)\s*</loc>", 1), F.lit("")).alias("loc"),
            F.nullif(F.regexp_extract(b, r"<lastmod>\s*([^<]*?)\s*</lastmod>", 1), F.lit("")).alias("lastmod"),
            F.nullif(F.regexp_extract(b, r"<changefreq>\s*([a-z]+)\s*</changefreq>", 1), F.lit("")).alias("changefreq"),
            F.when(pr != "", (pr.cast("decimal(4,2)") * 100).cast("int")).alias("priority_x100"),
        )
        .filter(F.col("loc").isNotNull())
    )


def canonical_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Page-declared canonical URL (`<link rel="canonical" href=…>`) per
    page: (url, canonical_url, is_cross) — the dedup-preference signal
    crawlers honor BEFORE any content comparison (a page declaring a
    different canonical is a self-identified duplicate).

    Handles both attribute orders (rel-then-href and href-then-rel),
    resolves root-/protocol-relative hrefs like `extract_links`, strips
    fragments, and falls back to the page's own URL when no canonical
    is declared (is_cross = false then, by definition). Scan-local,
    zero shuffles."""
    html = F.col(html_col)
    h1 = F.regexp_extract(html, r'<link [^>]*rel="canonical"[^>]*href="([^"]*)"', 1)
    h2 = F.regexp_extract(html, r'<link [^>]*href="([^"]*)"[^>]*rel="canonical"', 1)
    href = F.coalesce(F.nullif(h1, F.lit("")), F.nullif(h2, F.lit("")))
    src = F.col(url_col)
    scheme = F.regexp_extract(src, "^(https?):", 1)
    origin = F.regexp_extract(src, _ORIGIN_RE, 1)
    resolved = (
        F.when(href.rlike("^https?://"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
    )
    canon = F.coalesce(F.regexp_replace(resolved, "#.*$", ""), src)
    return pages.select(
        src.alias("url"),
        canon.alias("canonical_url"),
        (canon != src).alias("is_cross"),
    )


def link_spam(
    host_edges: DataFrame,
    min_out: int = 2,
    recip_ppm_threshold: int = 500000,
) -> DataFrame:
    """Link-farm signals per source host over a `host_link_graph` edge
    list: reciprocity (fraction of out-edges whose reverse edge exists —
    the farm-ring signature: SEO link exchanges reciprocate, editorial
    links mostly don't; cf. Gyöngyi & Garcia-Molina, "Link spam
    alliances", VLDB 2005) and destination concentration (top-1 target's
    share of the host's outlink volume — farms pump few targets).

    Shapes at scale: the host graph is orders smaller than the page
    graph, so the reciprocity probe is a host-graph × host-graph hash
    semi-join and both profiles are host-keyed aggs. All-integer ppm
    math ⇒ exact cross-engine oracle.

    → (host, out_degree, recip_edges, recip_ppm, top1_ppm, spam)."""
    e = host_edges.select("src_host", "dst_host", "n_links")
    rev = e.select(F.col("dst_host").alias("src_host"), F.col("src_host").alias("dst_host"))
    recip = (
        e.join(rev, ["src_host", "dst_host"], "left_semi")
        .groupBy("src_host")
        .agg(F.count(F.lit(1)).cast("long").alias("recip_edges"))
    )
    agg = e.groupBy("src_host").agg(
        F.count(F.lit(1)).cast("long").alias("out_degree"),
        F.sum("n_links").cast("long").alias("total_links"),
        F.max("n_links").cast("long").alias("max_links"),
    )
    j = agg.join(recip, "src_host", "left").select(
        F.col("src_host").alias("host"),
        "out_degree",
        F.coalesce("recip_edges", F.lit(0)).cast("long").alias("recip_edges"),
        "total_links",
        "max_links",
    )
    j = j.withColumn(
        "recip_ppm", F.expr("CAST(recip_edges * 1000000 AS BIGINT) div out_degree")
    ).withColumn("top1_ppm", F.expr("CAST(max_links * 1000000 AS BIGINT) div total_links"))
    return j.select(
        "host",
        "out_degree",
        "recip_edges",
        "recip_ppm",
        "top1_ppm",
        ((F.col("recip_ppm") >= recip_ppm_threshold) & (F.col("out_degree") >= min_out))
        .cast("int")
        .alias("spam"),
    )


# one <link rel="alternate" hreflang="…" href="…"> tag in the synthesis
# attribute order; mirrored verbatim by the DuckDB oracle
_HREFLANG = '<link rel="alternate" hreflang="([^"]*)" href="([^"]*)"[^>]*>'


def hreflang_edges(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, hreflang, alt_url) translation-alternate edges from
    ``<link rel="alternate" hreflang>`` tags (the multilingual-site
    idiom search engines consume; Google's hreflang guidelines ask for
    reciprocal annotation, so the edge set is NEARLY symmetric — the
    cluster step symmetrizes explicitly rather than trusting webmasters).

    Scan-local like `extract_links`: two zipped `regexp_extract_all`
    projections, fragment strip. Self-references are KEPT — a spec-
    conformant hreflang block lists the page itself, and that row is
    the page's own language claim (the cluster step uses it for lang
    labeling and skips it when building CC edges). No shuffle."""
    html = F.col(html_col)
    langs = F.regexp_extract_all(html, F.lit(_HREFLANG), F.lit(1))
    hrefs = F.regexp_extract_all(html, F.lit(_HREFLANG), F.lit(2))
    src = F.col(url_col)
    out = pages.select(
        src.alias("src_url"),
        F.explode(F.arrays_zip(langs.alias("hreflang"), hrefs.alias("href"))).alias("_l"),
    ).select(
        "src_url",
        F.col("_l.hreflang").alias("hreflang"),
        F.regexp_replace(F.col("_l.href"), "#.*$", "").alias("alt_url"),
    )
    return out.filter(F.col("alt_url") != "")


def hreflang_clusters(edges: DataFrame) -> DataFrame:
    """Translation clusters from hreflang edges: symmetrize (annotation
    is only *supposed* to be reciprocal), connected-components over URL
    nodes (large/small-star at scale — the same machinery as owl:sameAs
    canonicalization), then one per-cluster aggregation:

        (cluster_id = lexicographic-min URL, n_pages, langs)

    where `langs` is the sorted distinct set of language codes CLAIMED
    for each member URL by its in-edges (an x-default or regional code
    shows up verbatim). This is the page-alignment prior that feeds
    bitext mining (`operators/ann.py::bitext_margin`): cluster members
    are translation candidates before any embedding is computed.

    Scale: edges are host-local in the common case (same-site
    alternates), so the symmetrize + CC shuffles are skew-light; the
    per-cluster agg is map-side combined. Cluster sizes are bounded by
    a site's language count (tens), never corpus-scale."""
    from .cc import connected_components

    e = edges.filter(F.col("src_url") != F.col("alt_url")).select(
        F.col("src_url").alias("src"), F.col("alt_url").alias("dst")
    )
    sym = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    comp = connected_components(sym)
    # language claimed for each member URL: every (alt_url, hreflang)
    # row INCLUDING self-references (a page's own declared language)
    node_lang = edges.select(
        F.col("alt_url").alias("node"), F.col("hreflang").alias("lang")
    ).distinct()
    labeled = comp.join(node_lang, "node", "left")
    return (
        labeled.groupBy(F.col("component").alias("cluster_id"))
        .agg(
            F.countDistinct("node").cast("long").alias("n_pages"),
            F.array_join(F.array_sort(F.collect_set("lang")), ",").alias("langs"),
        )
    )


#: one RSS <item> or Atom <entry> block (non-greedy body)
_RSS_ITEM = "<item>(.*?)</item>"
_ATOM_ENTRY = "<entry>(.*?)</entry>"


def parse_feeds(feeds: DataFrame, url_col: str = "feed_url", xml_col: str = "xml") -> DataFrame:
    """RSS 2.0 / Atom feed items → (feed_url, title, item_url, ts_raw).

    The discovery layer next to sitemaps (`parse_sitemaps`): feeds carry
    the *fresh* URLs plus editorial titles. Documented parsing subset,
    same contract as the sitemap parser: RSS ``<item>`` blocks with
    ``<title>/<link>/<pubDate>`` children, Atom ``<entry>`` blocks with
    ``<title>/<link href="…"/>/<updated>``; items without a link are
    dropped; first match wins inside a block. Zipped regex projections,
    map-only, html never leaves the scan — feed XML needs no DOM."""
    xml = F.col(xml_col)

    def _fields(block_re: str, link_re: str, ts_re: str):
        blocks = F.regexp_extract_all(xml, F.lit(block_re), F.lit(1))
        return F.transform(
            blocks,
            lambda b: F.struct(
                F.regexp_extract(b, "<title>([^<]*)</title>", 1).alias("title"),
                F.regexp_extract(b, link_re, 1).alias("item_url"),
                F.regexp_extract(b, ts_re, 1).alias("ts_raw"),
            ),
        )

    rss = _fields(_RSS_ITEM, "<link>([^<]*)</link>", "<pubDate>([^<]*)</pubDate>")
    atom = _fields(_ATOM_ENTRY, '<link href="([^"]*)"[^>]*/>', "<updated>([^<]*)</updated>")
    out = feeds.select(
        F.col(url_col).alias("feed_url"),
        F.explode(F.concat(rss, atom)).alias("_i"),
    ).select("feed_url", F.col("_i.title").alias("title"),
             F.col("_i.item_url").alias("item_url"), F.col("_i.ts_raw").alias("ts_raw"))
    return out.filter(F.col("item_url") != "")


def cocitation(
    host_edges: DataFrame, max_out: int = 8, min_cocites: int = 2, k: int = 10
) -> DataFrame:
    """Related-host discovery by co-citation (Dean & Henzinger, WWW8:
    two hosts are related when many sources link to BOTH): per-source
    top-`max_out` destinations by link weight (the hub guard — a
    directory page citing 10k hosts would otherwise contribute
    O(out²) pairs), ordered self-join on the source key, pair count,
    global top-k.

    Scale shape: the self-join is equi on src_host AFTER the out-degree
    cap, so each source contributes ≤ max_out·(max_out−1)/2 rows —
    Σ bounded by |hosts|·max_out², never |edges|². The pair agg is
    map-side combined; top-k is TakeOrdered."""
    w = Window.partitionBy("src_host").orderBy(F.desc("n_links"), F.asc("dst_host"))
    capped = (
        host_edges.select("src_host", "dst_host", "n_links")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_out)
        .select("src_host", "dst_host")
    )
    a = capped.select(F.col("src_host").alias("s"), F.col("dst_host").alias("h1"))
    b = capped.select(F.col("src_host").alias("s"), F.col("dst_host").alias("h2"))
    pairs = (
        a.join(b, "s")
        .filter(F.col("h1") < F.col("h2"))
        .groupBy("h1", "h2")
        .agg(F.countDistinct("s").cast("long").alias("n_cocites"))
        .filter(F.col("n_cocites") >= min_cocites)
    )
    return pairs.orderBy(F.desc("n_cocites"), F.asc("h1"), F.asc("h2")).limit(k)
