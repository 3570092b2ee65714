"""Densitometric boilerplate removal: HTML → main-content text blocks.

Not in the reference (ocaml-rdf consumes clean RDF); this is the north
rule's training-data scope: at Common-Crawl scale the dominant text
cleaning step is separating article content from navigation/footer
chrome. The classifier follows the published densitometric recipe
(Kohlschütter et al., "Boilerplate Detection using Shallow Text
Features", WSDM 2010 / the jusText heuristic): segment the page into
block-level text runs, score each by LINK DENSITY (chars of text under
`<a>` ÷ total chars) and LENGTH (word count), keep long low-link blocks.

Deliberately context-free (no neighbor smoothing pass): two fixed rules

    keep(block) = link_chars * 3 < chars  AND  words >= MIN_WORDS

make the classifier order-independent and cross-engine reproducible —
the suite oracle re-derives keep() in SQL, which a stateful smoothing
pass would prevent. Precision/recall tradeoff is documented, not tuned.

Block segmentation reuses html_text.py's exact rules (BLOCK_TAGS
boundaries, script/style dropped, whitespace collapsed per block), so
`"\\n".join(all block texts)` == `extract_text(html)` — snapshot-tested
invariant that keeps the two extractors from drifting apart.

Scale: one `mapInPandas` pass (Arrow batches, no per-row UDFs), map-only
— no shuffle; at 10^12 docs this pipelines with extraction in the same
stage.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .htmldom import BLOCK_TAGS, NON_TEXT_TAGS, Node, parse_html

_WS = re.compile(r"[ \t\r\n\f\v ]+")

#: density rule is link_chars * 3 < chars — the 1/3 threshold kept as an
#: integer comparison so the boundary is exact in every engine
MIN_WORDS = 5


def text_blocks(html: str | bytes) -> list[tuple[str, int, int]]:
    """Segment into block-level text runs: [(block_text, total_chars,
    link_chars)] in document order. Char counts are measured on the
    collapsed text (what the density is about), link_chars = collapsed
    length of text under any `<a>` ancestor within the block."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    root = parse_html(html)
    blocks: list[tuple[str, int, int]] = []
    buf: list[tuple[str, bool]] = []  # (raw text, under <a>)

    def flush() -> None:
        if not buf:
            return
        whole = _WS.sub(" ", "".join(t for t, _ in buf)).strip()
        link = _WS.sub(" ", "".join(t for t, in_a in buf if in_a)).strip()
        buf.clear()
        if whole:
            blocks.append((whole, len(whole), len(link)))

    def walk(node: Node, in_a: bool) -> None:
        for c in node.children:
            if isinstance(c, str):
                buf.append((c, in_a))
                continue
            if c.tag in NON_TEXT_TAGS:
                continue
            child_in_a = in_a or c.tag == "a"
            if c.tag in BLOCK_TAGS:
                flush()
                walk(c, child_in_a)
                flush()
            else:
                walk(c, child_in_a)

    walk(root, False)
    flush()
    return blocks


def classify_blocks(
    blocks: list[tuple[str, int, int]],
    min_words: int = MIN_WORDS,
) -> list[tuple[str, bool]]:
    """[(block_text, keep?)] under the two fixed rules. Density compares
    as link_chars * 3 < total_chars — integer-exact, no float rounding
    at the boundary."""
    out = []
    for text, chars, link_chars in blocks:
        words = text.count(" ") + 1 if text else 0
        keep = link_chars * 3 < chars and words >= min_words
        out.append((text, keep))
    return out


def main_text(html: str | bytes) -> str:
    """Kept blocks joined with '\\n' (same join as extract_text)."""
    return "\n".join(t for t, keep in classify_blocks(text_blocks(html)) if keep)


MAIN_TEXT_SCHEMA = "url string, main_text string, n_blocks int, n_kept int"


def main_text_df(pages: DataFrame) -> DataFrame:
    """(url, html binary, …) → (url, main_text, n_blocks, n_kept)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, html in zip(pdf["url"], pdf["html"]):
                cls = classify_blocks(text_blocks(bytes(html)))
                kept = [t for t, k in cls if k]
                rows.append((url, "\n".join(kept), len(cls), len(kept)))
            yield pd.DataFrame(rows, columns=["url", "main_text", "n_blocks", "n_kept"])

    return pages.select("url", "html").mapInPandas(run, schema=MAIN_TEXT_SCHEMA)
