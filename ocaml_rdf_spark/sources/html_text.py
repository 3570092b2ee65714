"""Deterministic HTML → text extraction (the byte-identity invariant target,
BASELINE.json:16).

Rules (fixed, documented, and snapshot-tested so they can never drift):

1. script/style/template/noscript contents are dropped.
2. Every BLOCK_TAGS element boundary (open and close) is a line boundary.
3. Within a line, whitespace runs (including newlines from the source)
   collapse to a single ASCII space; leading/trailing whitespace trimmed.
4. Empty lines are dropped; lines join with "\n"; no trailing newline.
"""

from __future__ import annotations

import re

from .htmldom import BLOCK_TAGS, NON_TEXT_TAGS, Node, parse_html

_WS = re.compile(r"[ \t\r\n\f\v ]+")


def _emit(node: Node, lines: list[str], buf: list[str]) -> None:
    for c in node.children:
        if isinstance(c, str):
            buf.append(c)
        else:
            if c.tag in NON_TEXT_TAGS:
                continue
            if c.tag in BLOCK_TAGS:
                _flush(lines, buf)
                _emit(c, lines, buf)
                _flush(lines, buf)
            else:
                _emit(c, lines, buf)


def _flush(lines: list[str], buf: list[str]) -> None:
    if buf:
        line = _WS.sub(" ", "".join(buf)).strip()
        if line:
            lines.append(line)
        buf.clear()


def extract_text(html: str | bytes) -> str:
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    root = parse_html(html)
    lines: list[str] = []
    buf: list[str] = []
    _emit(root, lines, buf)
    _flush(lines, buf)
    return "\n".join(lines)
