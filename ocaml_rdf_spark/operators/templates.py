"""Cross-page template detection: frequency-based boilerplate removal.

Complements `sources/boilerplate.py` (densitometric, single-page): the
other standard recipe (Gibson/Punera/Tomkins "The volume and evolution of
web page templates", WWW 2005; Bar-Yossef & Rajagopalan's frequent-
pagelet detection) drops a block because the SAME text recurs across many
pages of the SAME host — nav bars, footers, cookie banners, sidebars —
regardless of its link density. Not in the reference (ocaml-rdf consumes
clean RDF); this is the north rule's training-data scope, where per-host
chrome is the dominant duplicated text at crawl scale.

Rule (integer-exact, so the DuckDB oracle can mirror it bit-for-bit):

    template(host, block) ⇔ fp_pages >= MIN_PAGES
                            AND fp_pages * 2 >= host_pages

where fp_pages = distinct pages of `host` containing the block and
host_pages = distinct pages of the host. A block on >= half the host's
pages (and at least MIN_PAGES absolutely, so 2-page hosts don't nuke
unique content) is chrome.

Scale design (10^12 docs, mega-host skew):
- block segmentation is the SAME Arrow `mapInPandas` pass as extraction
  (`sources/boilerplate.py::text_blocks` — one html parse, map-only);
- fingerprints are JVM-side `md5(block)` — blocks never shuffle as full
  text, only (host, fp) cells do;
- both statistics are map-side-combined aggs keyed by (host, fp) and
  host; a mega-host's rows spread across its fp cells in the first agg,
  so no reducer sees more than one row per (host, fp) — the same
  two-stage shape as `urls.py::host_profile`;
- the template set is tiny (per-host chrome, not per-page) → broadcast
  anti join back onto the block stream; the page side shuffles once,
  keyed by url, to reassemble main text in block order.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.boilerplate import text_blocks
from .urls import url_host

#: a block must recur on at least this many distinct pages to be chrome
MIN_PAGES = 2

PAGE_BLOCKS_SCHEMA = "url string, idx int, block string"


def page_blocks(pages: DataFrame) -> DataFrame:
    """(url, html binary, …) → (url, idx, block): block-level text runs in
    document order, segmented exactly like `boilerplate.text_blocks` (one
    Arrow batch pass, map-only — pipelines with extraction)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                for i, (text, _chars, _link) in enumerate(text_blocks(bytes(html))):
                    rows.append((url, i, text))
            yield pd.DataFrame(rows, columns=["url", "idx", "block"])

    return pages.select("url", "html").mapInPandas(run, schema=PAGE_BLOCKS_SCHEMA)


def template_fps(blocks: DataFrame, min_pages: int = MIN_PAGES) -> DataFrame:
    """(host, fp) pairs classified as per-host template chrome. Input must
    carry (url, block); host is derived from the url, fp = md5(block)."""
    b = blocks.select(url_host(F.col("url")).alias("host"), "url", F.md5("block").alias("fp"))
    host_pages = b.groupBy("host").agg(F.countDistinct("url").alias("host_pages"))
    fp_pages = b.groupBy("host", "fp").agg(F.countDistinct("url").alias("fp_pages"))
    return (
        fp_pages.join(host_pages, "host")
        .filter((F.col("fp_pages") >= min_pages) & (F.col("fp_pages") * 2 >= F.col("host_pages")))
        .select("host", "fp", "fp_pages", "host_pages")
    )


MAIN_TEXT_SCHEMA = "url string, main_text string, n_blocks int, n_kept int"


def strip_templates(pages: DataFrame, min_pages: int = MIN_PAGES) -> DataFrame:
    """(url, html, …) → (url, main_text, n_blocks, n_kept) with per-host
    template blocks removed. main_text preserves document block order."""
    blocks = page_blocks(pages).withColumn("host", url_host(F.col("url"))).withColumn("fp", F.md5("block"))
    blocks = blocks.localCheckpoint(eager=False)  # 3 consumers; don't re-parse the corpus
    tmpl = F.broadcast(template_fps(blocks, min_pages).select("host", "fp"))
    kept = blocks.join(tmpl, ["host", "fp"], "left_anti")
    totals = blocks.groupBy("url").agg(F.count("*").cast("int").alias("n_blocks"))
    body = kept.groupBy("url").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("idx", "block"))), lambda x: x["block"]),
            "\n",
        ).alias("main_text"),
        F.count("*").cast("int").alias("n_kept"),
    )
    return totals.join(body, "url", "left").select(
        "url",
        F.coalesce("main_text", F.lit("")).alias("main_text"),
        "n_blocks",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )
