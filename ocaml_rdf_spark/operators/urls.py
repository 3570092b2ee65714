"""URL/host corpus profiling — the north rule's skew axis made first-class.

A Common-Crawl-style corpus is dominated by mega-hosts (the reference
pipeline salts url-host repartitioning for exactly this reason —
extract.py does the same on the write path). This module is the READ
side: per-host corpus statistics computed with the two-stage shapes that
survive a mega-host at 100 TB.

Scale design:
- `url_host` is a scan-local regexp — no shuffle.
- `host_profile` computes per-host doc counts, total chars, exact
  distinct-language counts, and the dominant language via the two-stage
  (host, lang) → host aggregation: the first groupBy spreads a
  mega-host's rows across (host, lang) cells WITH map-side combine, so
  no reducer ever sees more than one row per (host, lang) — a direct
  `countDistinct(lang)` per host would instead funnel every row of a
  mega-host through one reducer. The dominant language falls out of a
  row_number over the same cells (count desc, lang asc — fully
  deterministic), and the final per-host aggregate reuses the window's
  host partitioning (no extra shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: host part of an http(s) URL; mirrored verbatim by the DuckDB oracle
_HOST_RE = "https?://([^/]+)"


def url_host(col: Column) -> Column:
    return F.regexp_extract(col, _HOST_RE, 1)


# --- URL canonicalization ----------------------------------------------------
#
# Crawl frontiers and re-crawls hand the pipeline the same page under many
# spellings: scheme/host case, explicit default ports, tracking query params,
# param order, fragments. Canonicalizing BEFORE url-keyed dedup/joins is the
# standard web-pipeline fix (cf. RFC 3986 §6.2 normalization + the tracking-
# param strip every production crawler applies). Everything below is pure
# `pyspark.sql.functions` Column algebra — scan-local, whole-stage codegen,
# no shuffle, no UDF — and each rule is mirrored expression-for-expression
# by the DuckDB oracle (suite `url_canon`).

#: query-param names that never identify content (analytics/click tracking);
#: any name starting with "utm_" is dropped too
TRACKING_PARAMS = [
    "fbclid", "gclid", "dclid", "msclkid", "yclid", "twclid",
    "igshid", "mc_cid", "mc_eid", "wbraid", "gbraid", "_ga", "ref",
]

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([/][^?#]*)"


def canonical_url(col: Column) -> Column:
    """RFC-3986-style canonical form of an http(s) URL:

    - scheme and host lowercased; explicit default port (:80 http,
      :443 https) dropped;
    - empty path becomes "/";
    - fragment dropped;
    - query params: tracking params removed (utm_* + TRACKING_PARAMS,
      name match case-insensitive), survivors sorted bytewise, empty
      query dropped.

    Non-http(s) values pass through trimmed but otherwise untouched
    (canonicalization is only defined for web URLs here).
    """
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(u, r"\?([^#]*)", 1)
    name = lambda p: F.lower(F.split_part(p, F.lit("="), F.lit(1)))  # noqa: E731
    kept = F.filter(
        F.split(q, "&"),
        lambda p: (p != "")
        & ~name(p).startswith("utm_")
        & ~name(p).isin(TRACKING_PARAMS),
    )
    qs = F.array_join(F.array_sort(kept), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when(scheme.isin("http", "https") & (host != ""), canon).otherwise(u)


def canonical_url_sql(expr: str) -> str:
    """DuckDB mirror of canonical_url over a VARCHAR SQL expression —
    the same regexes and rules, kept adjacent so they evolve together."""
    tracking = ", ".join(f"'{t}'" for t in TRACKING_PARAMS)
    return f"""(
  CASE WHEN lower(regexp_extract(trim({expr}), '{_SCHEME_RE}', 1)) IN ('http','https')
            AND regexp_extract(trim({expr}), '{_HOSTPORT_RE}', 1) <> ''
  THEN lower(regexp_extract(trim({expr}), '{_SCHEME_RE}', 1)) || '://' ||
       CASE WHEN lower(regexp_extract(trim({expr}), '{_SCHEME_RE}', 1)) = 'http'
            THEN regexp_replace(lower(regexp_extract(trim({expr}), '{_HOSTPORT_RE}', 1)), ':80$', '')
            ELSE regexp_replace(lower(regexp_extract(trim({expr}), '{_HOSTPORT_RE}', 1)), ':443$', '')
       END ||
       CASE WHEN regexp_extract(trim({expr}), '{_PATH_RE}', 1) = '' THEN '/'
            ELSE regexp_extract(trim({expr}), '{_PATH_RE}', 1) END ||
       CASE WHEN COALESCE(array_to_string(list_sort(list_filter(
                 string_split(regexp_extract(trim({expr}), '\\?([^#]*)', 1), '&'),
                 p -> p <> '' AND NOT starts_with(lower(string_split(p, '=')[1]), 'utm_')
                      AND lower(string_split(p, '=')[1]) NOT IN ({tracking}))), '&'), '') = ''
            THEN ''
            ELSE '?' || array_to_string(list_sort(list_filter(
                 string_split(regexp_extract(trim({expr}), '\\?([^#]*)', 1), '&'),
                 p -> p <> '' AND NOT starts_with(lower(string_split(p, '=')[1]), 'utm_')
                      AND lower(string_split(p, '=')[1]) NOT IN ({tracking}))), '&')
       END
  ELSE trim({expr}) END
)"""


def url_dedup(
    docs: DataFrame, url_col: str = "url", order_col: str = "doc_id"
) -> DataFrame:
    """Crawl dedup by canonical URL: one row per canonical form, keeping
    the first occurrence under `order_col` ascending (earliest crawl /
    smallest id — a pure-function tie-break, never first-seen-by-task).

    One shuffle on the canonical url (window row_number); at 100 TB the
    canonical column is also the right bucketing key for the pages table
    so re-crawl merges become storage-partitioned joins.
    """
    w = Window.partitionBy("canon_url").orderBy(F.col(order_col).asc())
    return (
        docs.withColumn("canon_url", canonical_url(F.col(url_col)))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def host_profile(
    docs: DataFrame, url_col: str = "url", lang_col: str = "lang", chars_col: str = "n_chars"
) -> DataFrame:
    """Per-host corpus profile: (host, n_docs, total_chars, n_langs,
    top_lang). Two-stage aggregation — see module docstring."""
    cells = (
        docs.select(
            url_host(F.col(url_col)).alias("host"),
            F.col(lang_col).alias("lang"),
            F.col(chars_col).alias("chars"),
        )
        .groupBy("host", "lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("chars").alias("chars"))
    )
    w = Window.partitionBy("host").orderBy(F.col("n").desc(), F.col("lang").asc())
    return (
        cells.withColumn("rk", F.row_number().over(w))
        .groupBy("host")
        .agg(
            F.sum("n").alias("n_docs"),
            F.sum("chars").alias("total_chars"),
            F.count(F.lit(1)).alias("n_langs"),
            F.max_by("lang", -F.col("rk")).alias("top_lang"),
        )
    )


def domain_suffixes(host: Column) -> Column:
    """All dot-suffix chains of a host: 'a.ads.ex.com' →
    ['a.ads.ex.com', 'ads.ex.com', 'ex.com', 'com'] — scan-local array
    algebra, bounded by the label count (≤ ~6 real-world)."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(".", F.slice(labels, i, n - i + 1)),
    )


#: Embedded public-suffix subset (publicsuffix.org list format, exact
#: rules only). A production run loads the full ~9k-rule PSL through the
#: same membership test — as a broadcast array (still scan-local) or a
#: broadcast join if the rule set outgrows a literal. Wildcard (*.ck) and
#: exception (!www.ck) rules are out of scope for the subset; the
#: fallback below matches the PSL's own prevailing-'*' default.
PSL_SUBSET = [
    "com", "org", "net", "io", "dev", "gov", "edu", "info", "biz",
    "example", "test", "co.uk", "ac.uk", "org.uk", "gov.uk",
    "com.au", "net.au", "org.au", "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "co.in", "co.kr", "com.mx", "co.nz", "com.sg",
]


def pld(host: Column, rules: list[str] = PSL_SUBSET) -> Column:
    """Pay-level domain (registrable domain): one label + the LONGEST
    matching public suffix — the unit production pipelines group, rate-
    limit, and dedup by ('bbc.co.uk', not 'co.uk' or 'news.bbc.co.uk').

    Scan-local column algebra (no shuffle, no UDF): try every suffix
    start position, keep those whose dot-joined tail is a PSL rule with
    at least one label before it, take the smallest start (= longest
    suffix), and emit that start minus one. Hosts with no matching rule
    fall back to the PSL prevailing-'*' default (last two labels);
    single-label hosts pass through."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    rule_arr = F.array(*[F.lit(r) for r in rules])

    def _is_rule(i: Column) -> Column:
        return (i >= F.lit(2)) & F.array_contains(rule_arr, F.concat_ws(".", F.slice(labels, i, n - i + 1)))

    best = F.array_min(F.filter(F.sequence(F.lit(1), n), _is_rule))
    return (
        F.when(best.isNotNull(), F.concat_ws(".", F.slice(labels, best - 1, n - best + 2)))
        .when(n >= 2, F.concat_ws(".", F.slice(labels, n - 1, 2)))
        .otherwise(host)
    )


def domain_filter(
    docs: DataFrame, blocklist: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Domain-blocklist filtering with parent-domain matching (the
    standard crawl-corpus safety/quality gate): a document is blocked when
    its url host — or ANY parent domain of it — appears in `blocklist
    (domain)`, so 'bad.com' blocks 'ads.tracker.bad.com'. `blocked_by`
    reports the MOST-specific matching entry (deterministic min suffix
    index).

    → (id, host, blocked_by ('' when kept), keep ∈ {0,1}).

    100 TB shape: suffix expansion is scan-local (≤6 rows per doc,
    no corpus-length explode); the blocklist — even a multi-million-entry
    industry list is MBs — broadcasts, so the match is a map-side hash
    join with zero shuffle of the corpus; the final left join back is
    keyed by the doc id. No regex-per-entry scan anywhere."""
    hosts = docs.select(
        id_col,
        # lowercase BEFORE host extraction: the scheme regex is
        # case-sensitive and crawl urls arrive as 'HTTP://HOST'
        F.regexp_replace(url_host(F.lower(F.col(url_col))), ":[0-9]+$", "").alias("host"),
    )
    sufs = hosts.filter(F.length("host") > 0).select(
        id_col,
        F.posexplode(domain_suffixes(F.col("host"))).alias("i", "suf"),
    )
    hits = (
        sufs.join(F.broadcast(blocklist.select(F.col("domain").alias("suf"))), "suf")
        .groupBy(id_col)
        .agg(F.min_by("suf", "i").alias("blocked_by"))
    )
    return (
        hosts.join(hits, id_col, "left")
        .select(
            id_col,
            "host",
            # '' (not NULL) for unblocked: the value-hash gate sorts rows,
            # and a mixed NULL/string column is unorderable there
            F.coalesce("blocked_by", F.lit("")).alias("blocked_by"),
            F.when(F.col("blocked_by").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("keep"),
        )
    )


def ip_host_filter(docs: DataFrame, host_col: str = "host", id_col: str = "doc_id") -> DataFrame:
    """Raw-IP-host crawl filter: pages served from a bare IPv4 address
    instead of a hostname are a strong spam/misconfiguration signal
    (no DNS identity, no domain reputation), and PRIVATE ranges
    (RFC 1918 10/8, 172.16/12, 192.168/16, loopback 127/8, link-local
    169.254/16) additionally indicate an intranet leak that must not
    enter a training corpus. → (doc_id, host, is_ip, is_private, keep):
    keep = 1 only for non-IP hosts (the standard crawl policy).

    A host is an IP only if it is EXACTLY four dotted decimal octets
    each 0-255 ('256.1.2.3' and '1.2.3.4.5' are hostnames, kept).
    Pure split/cast/comparison column algebra — map-only, zero shuffles,
    whole-stage codegen at any corpus size; identical semantics in the
    DuckDB mirror (same split, same bounds)."""
    h = F.col(host_col)
    parts = F.split(h, r"\.")
    octet_ok = F.forall(
        parts, lambda p: p.rlike("^[0-9]{1,3}$") & (p.try_cast("int") <= 255)
    )
    is_ip = (F.size(parts) == 4) & octet_ok
    # F.get (not getItem): out-of-bounds must be NULL, not an ANSI error,
    # for hosts with < 2 labels
    o = [F.get(parts, i).try_cast("int") for i in range(2)]
    is_private = is_ip & (
        (o[0] == 10)
        | ((o[0] == 172) & (o[1] >= 16) & (o[1] <= 31))
        | ((o[0] == 192) & (o[1] == 168))
        | (o[0] == 127)
        | ((o[0] == 169) & (o[1] == 254))
    )
    return docs.select(
        id_col,
        h.alias("host"),
        is_ip.cast("int").alias("is_ip"),
        is_private.cast("int").alias("is_private"),
        (~is_ip).cast("int").alias("keep"),
    )


def crawl_schedule(
    frontier: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    priority_col: str | None = None,
    delay_ms: int = 1000,
) -> DataFrame:
    """Politeness-aware crawl-frontier scheduling: per-host fetch slots
    under a fixed crawl delay, with a deterministic per-host stagger so
    the fleet's first requests don't all fire at t=0 (the thundering-
    herd guard every polite crawler carries).

      slot        — 0-based position within the host's queue, ordered by
                    (priority DESC, url) — deterministic under ties
      fetch_at_ms — slot · delay_ms + (md5(host) mod delay_ms)

    Scale shape: ONE host-keyed window. A mega-host queue landing on one
    reducer is not an accident here — politeness SERIALIZES a host, so
    its queue order is inherently a per-host total order; the window
    group is exactly that queue. Hosts are the parallelism unit (the
    same salted-repartition story as extract.py's url-host salting does
    NOT apply: order within host is the semantics). Cap per-host queue
    length upstream if a single host's frontier outgrows executor
    memory — that cap is crawl policy, not an engine limit."""
    from pyspark.sql import Window

    order = [F.col(url_col).asc()]
    if priority_col:
        order = [F.col(priority_col).desc()] + order
    w = Window.partitionBy(host_col).orderBy(*order)
    slot = (F.row_number().over(w) - 1).cast("long")
    stagger = (
        F.conv(F.substring(F.md5(F.col(host_col)), 1, 15), 16, 10).cast("long")
        % int(delay_ms)
    )
    return frontier.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        slot.alias("slot"),
        (slot * int(delay_ms) + stagger).alias("fetch_at_ms"),
    )


def change_rate(
    snaps: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    hash_col: str = "content_hash",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-URL content change rate from crawl-snapshot history — the
    recrawl-scheduling estimator (Cho & Garcia-Molina's change-frequency
    model, the counting tier): how often did successive fetches of the
    same URL produce different content?

    Input: one row per fetch with the URL, fetch timestamp, and a
    content hash (any stable digest — md5 of the extracted text is the
    pipeline's convention). `order_cols` breaks timestamp ties
    deterministically (pass the fetch id when timestamps can collide).
    Output per URL: n_obs, n_changes (hash differs from the previous
    fetch's), change_ppm = n_changes * 1e6 div (n_obs - 1) (0 for a
    single observation — no evidence is 'cold', matching the
    scheduler's conservative default), and the priority tier the crawl
    scheduler consumes ('hot' ≥ 50%, 'warm' ≥ 10%, else 'cold').

    ONE url-keyed shuffle: the lag window and the per-URL aggregate
    share the same partitioning, and all math is integer (exact,
    engine-portable)."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in order_cols]
    w = Window.partitionBy(url_col).orderBy(*order)
    per = snaps.select(
        F.col(url_col).alias("url"),
        F.when(
            F.lag(F.col(hash_col)).over(w).isNotNull()
            & (F.col(hash_col) != F.lag(F.col(hash_col)).over(w)),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("chg"),
    )
    agg = per.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("chg").cast("long").alias("n_changes"),
    )
    rate = F.when(F.col("n_obs") <= 1, F.lit(0)).otherwise(
        F.expr("CAST(n_changes * 1000000 AS BIGINT) div (n_obs - 1)")
    )
    return agg.select(
        "url", "n_obs", "n_changes",
        rate.cast("long").alias("change_ppm"),
    ).withColumn(
        "priority",
        F.when(F.col("change_ppm") >= 500000, F.lit("hot"))
        .when(F.col("change_ppm") >= 100000, F.lit("warm"))
        .otherwise(F.lit("cold")),
    )


def _ip_int(col: Column) -> Column:
    """Dotted-quad IPv4 → 32-bit integer (exact, engine-portable)."""
    p = F.split(col, r"\.")
    return (
        p[0].cast("long") * 16777216
        + p[1].cast("long") * 65536
        + p[2].cast("long") * 256
        + p[3].cast("long")
    )


def cidr_join(
    ips: DataFrame,
    blocks: DataFrame,
    ip_col: str = "ip",
    cidr_col: str = "cidr",
) -> DataFrame:
    """Longest-prefix-match of IPv4 addresses to CIDR netblocks — the
    geo/ASN enrichment join (host IP → registry block), expressed as an
    EQUI join so it scales: the inequality "ip falls inside block" never
    reaches a join condition.

    Mechanics: both sides are bucketed at /16. A block with prefix_len
    ≥ 16 lands in exactly one bucket; a coarser block explodes into its
    2^(16-k) covered buckets (bounded by the block table itself —
    registry data is metadata-sized, so the expansion is cheap and the
    bucketed block table broadcasts). The join is then bucket == bucket
    (hash), the exact prefix test `ip >> (32-k) == net >> (32-k)` is a
    post-join FILTER, and RFC-longest-prefix wins via one max_by per ip
    (prefix_len desc, cidr asc on ties).

    Returns ONE ROW PER DISTINCT ip value: (ip, cidr, prefix_len,
    <every other block column>) with NULLs for unmatched ips — a mapping
    table the caller joins back to its fact rows (broadcast at real
    scale; re-joining here would force a second pass over the facts).
    """
    meta = [c for c in blocks.columns if c != cidr_col]
    k = F.split(F.col(cidr_col), "/")[1].cast("int")
    net = _ip_int(F.split(F.col(cidr_col), "/")[0])
    lo16 = F.floor(net / 65536).cast("long")
    n_buckets = F.when(k >= 16, F.lit(1).cast("long")).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(16 - _k AS INT))")
    )
    b = (
        blocks.withColumn("_k", k)
        .withColumn("_net", net)
        .withColumn("_lo", lo16)
        .withColumn("_bucket", F.explode(F.sequence(F.col("_lo"), F.col("_lo") + n_buckets - 1)))
        .select(cidr_col, "_k", "_net", "_bucket", *meta)
    )
    u = ips.select(F.col(ip_col).alias("ip")).dropDuplicates().withColumn(
        "_ip", _ip_int(F.col("ip"))
    )
    matched = (
        u.join(
            F.broadcast(b),
            F.floor(F.col("_ip") / 65536).cast("long") == F.col("_bucket"),
        )
        .filter(F.expr("_ip div shiftleft(CAST(1 AS BIGINT), CAST(32 - _k AS INT)) = _net div shiftleft(CAST(1 AS BIGINT), CAST(32 - _k AS INT))"))
        .groupBy("ip")
        .agg(
            F.max_by(
                F.struct(F.col(cidr_col).alias("cidr"), F.col("_k").alias("prefix_len"),
                         *[F.col(c).alias(c) for c in meta]),
                F.struct(F.col("_k"), F.col(cidr_col)),
            ).alias("_best")
        )
    )
    out = u.select("ip").join(matched, "ip", "left")
    return out.select(
        "ip",
        F.col("_best.cidr").alias("cidr"),
        F.col("_best.prefix_len").alias("prefix_len"),
        *[F.col(f"_best.{c}").alias(c) for c in meta],
    )


def url_path_templates(urls: DataFrame, url_col: str = "url", k: int = 3) -> DataFrame:
    """Sister-page template mining: generalize each URL's path by
    collapsing variable segments — digit runs → ``{n}``, long lower-hex
    runs (≥8 chars: ids, hashes) → ``{x}`` — then count URLs per
    (host, template) and keep each host's top-`k` templates.

    The classic crawl-scheduling/site-structure primitive (URL pattern
    trees à la Koppula et al., WSDM'10 "Learning URL patterns for
    webpage de-duplication"): template multiplicity separates
    enumerable content series (/p/{n}) from singleton editorial pages,
    and template-level counts drive dedup rules, crawl budgets, and
    per-template sampling.

    Shape: generalization is map-only regex algebra; ONE map-side-
    combined (host, template) agg; per-host top-k is a window over the
    already-partitioned cells. Mega-host safety: a host's rows are its
    distinct templates (bounded by site structure), not its URLs."""
    u = F.col(url_col)
    host = url_host(u)
    path = F.coalesce(F.regexp_extract(u, "^https?://[^/?#]+([^?#]*)", 1), F.lit(""))
    tpl = F.regexp_replace(
        F.regexp_replace(path, "[0-9]+", "{n}"), "\\b[a-f]{8,}\\b", "{x}"
    )
    cells = (
        urls.select(host.alias("host"), F.when(tpl == "", F.lit("/")).otherwise(tpl).alias("template"))
        .groupBy("host", "template")
        .agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
    )
    w = Window.partitionBy("host").orderBy(F.desc("n_urls"), F.asc("template"))
    return (
        cells.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("host", "template", "n_urls", "rank")
    )


def surt_key(col: Column) -> Column:
    """SURT key (Sort-friendly URI Reordering Transform — the CDX /
    Common-Crawl cc-index layout key): `com,example)/path?query` for
    `https://www.Example.com/Path?Query`. Rows sorted/range-partitioned
    by this key cluster a registered domain's pages CONTIGUOUSLY across
    subdomains (www./m./blog. interleave under plain-URL order), which
    is what makes per-domain scans of a petabyte URL index file-prunable
    — the same layout argument as `zorder_key`, specialized to URLs.

    Pinned subset (documented deviations from full CDX canonicalization,
    which also strips session params etc. — compose with
    `canonical_url` first for that): scheme dropped; host lowercased,
    ONE leading `www.` stripped, any `:port` dropped, labels reversed
    and comma-joined; `)` separator; path lowercased (empty → `/`);
    query lowercased, kept verbatim after `?`; fragment dropped.
    Non-http(s) rows (no scheme-host shape) yield NULL — a sort key is
    only defined for web URLs.

    Map-only column algebra: regex extracts + one array reverse, zero
    shuffles at any index size; the DuckDB oracle mirrors every rule
    expression-for-expression."""
    u = F.trim(col)
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(u, _HOSTPORT_RE, 1))
    host = F.regexp_replace(F.regexp_replace(host, ":[0-9]+$", ""), "^www\\.", "")
    rev = F.array_join(F.reverse(F.split(host, "\\.")), ",")
    path = F.lower(F.regexp_extract(u, _PATH_RE, 1))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.lower(F.regexp_extract(u, r"\?([^#]*)", 1))
    key = F.concat(
        rev, F.lit(")"), path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when(scheme.isin("http", "https") & (host != ""), key).otherwise(
        F.lit(None).cast("string")
    )


def surt_key_sql(expr: str) -> str:
    """DuckDB mirror of surt_key — same regexes and rules, adjacent so
    they evolve together (the canonical_url/canonical_url_sql pattern)."""
    host = (
        f"regexp_replace(regexp_replace(lower(regexp_extract(trim({expr}), "
        f"'{_HOSTPORT_RE}', 1)), ':[0-9]+$', ''), '^www\\.', '')"
    )
    path = (
        f"CASE WHEN lower(regexp_extract(trim({expr}), '{_PATH_RE}', 1)) = '' THEN '/' "
        f"ELSE lower(regexp_extract(trim({expr}), '{_PATH_RE}', 1)) END"
    )
    q = f"lower(regexp_extract(trim({expr}), '\\?([^#]*)', 1))"
    return f"""(
  CASE WHEN lower(regexp_extract(trim({expr}), '{_SCHEME_RE}', 1)) IN ('http','https')
            AND {host} <> ''
  THEN array_to_string(list_reverse(string_split({host}, '.')), ',') || ')' || {path} ||
       CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END
  ELSE NULL END
)"""


def fair_quota(demands: DataFrame, budget: int) -> DataFrame:
    """Max-min fair budget allocation over host demands (water-filling —
    the crawl-ops allocator behind a global fetch budget: every host
    gets min(demand, θ) with the water level θ set so the budget is
    spent; small hosts are fully served, mega-hosts share the rest
    equally — the max-min fairness definition): with demands sorted
    ascending and prefix sums P_k,

        k* = largest k with P_k + (n−k)·d_k ≤ B   (θ ≥ d_k, i.e. the
             k smallest demands are genuinely below the water line —
             and maximality puts the exact θ under d_{k+1}),
        θ  = (B − P_{k*}) div (n − k*)                 (k* < n)

    (θ NULL and every demand fully met when Σd ≤ B). Integer-floor θ
    semantics pinned: Σ alloc ≤ B with slack = (B − P_{k*}) mod (n−k*)
    reported on every row — the deliberately-unallocated remainder of
    integer water-filling (distributing it would break equal-share
    fairness; callers roll it into the next budget period).

    Output: (host, demand, alloc, theta, slack).

    Scale shape: one global sort-rank window over the HOST list (hosts
    are aggregates — 10⁷ rows for the whole web, not corpus-sized), a
    1-row k* fold, and a broadcast stamp back onto the host rows."""
    w = Window.orderBy(F.col("demand").asc(), F.col("host").asc())
    ranked = (
        demands.select("host", "demand")
        .withColumn("__k", F.row_number().over(w))
        .withColumn("__p", F.sum("demand").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))))
    )
    feasible = ranked.filter(
        F.col("__p") + (F.col("__n") - F.col("__k")) * F.col("demand") <= budget
    ).select("__k", "__p", "demand", "__n")
    # k = 0 (nobody fully served, θ = B div n) is ALWAYS feasible — it is
    # the answer when the budget sits below even the smallest demand's
    # uniform level, where the filter above matches no ranked row
    k0 = ranked.agg(F.max("__n").alias("__n")).select(
        F.lit(0).alias("__k"), F.lit(0).cast("long").alias("__p"),
        F.lit(0).cast("long").alias("demand"), "__n",
    )
    kstar = feasible.unionByName(k0).agg(
        F.max_by(
            F.struct(
                F.col("__k").alias("k"), F.col("__p").alias("p"),
                F.col("demand").alias("d"), F.col("__n").alias("n"),
            ),
            F.col("__k"),
        ).alias("s")
    ).select(
        F.col("s.k").alias("k"), F.col("s.p").alias("p"),
        F.col("s.d").alias("d"), F.col("s.n").alias("n"),
    )
    level = kstar.select(
        F.when(
            F.col("k") < F.col("n"),
            F.expr(f"({budget} - p) div (n - k)"),
        ).cast("long").alias("theta"),
        F.when(
            F.col("k") < F.col("n"),
            F.expr(f"({budget} - p) % (n - k)"),
        ).otherwise(0).cast("long").alias("slack"),
    )
    return (
        demands.select("host", "demand")
        .crossJoin(F.broadcast(level))
        .select(
            "host", F.col("demand").cast("long").alias("demand"),
            F.when(F.col("theta").isNull(), F.col("demand"))
            .otherwise(F.least(F.col("demand"), F.col("theta")))
            .cast("long").alias("alloc"),
            "theta", "slack",
        )
    )
