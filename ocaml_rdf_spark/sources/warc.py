"""WARC 1.0 (ISO 28500) reader/writer — the container format of Common
Crawl segments.

Not in the reference (flh/ocaml-rdf parses RDF syntaxes, not web
archives); this is engine scope from the north rule: the production
pages table (url, warc_ts, html, …) is materialized FROM `*.warc.gz`
segment files, so the engine owns the record parse (SURVEY §2.2 sources;
the input_hint's `warc_ts` column IS the WARC-Date header).

Format notes (public spec + Common Crawl conventions):

- A record is `WARC/1.0\\r\\n` + header lines + blank line + a content
  block of exactly `Content-Length` octets + `\\r\\n\\r\\n`.
- `response` records carry `Content-Type: application/http;
  msgtype=response`: the block is an HTTP/1.1 status line + headers +
  blank line + payload (the HTML bytes).
- Common Crawl gzips ONE record per gzip member and concatenates the
  members. That convention is what makes a 100 TB segment splittable:
  a reader handed an arbitrary byte range resyncs on the next gzip
  member boundary (magic ``1f 8b``), so records never straddle worker
  splits. The writer here follows it (deterministic members: mtime=0,
  no filename) and the parser accepts both gzipped and plain input.

Scale design: both directions run as `mapInPandas` over Arrow batches —
one batch of (url, …) rows in, one batch of records out, no per-row
Python UDFs (north rule). Record IDs are deterministic
(`urn:uuid:` from sha1(url|date), RFC 9562 name-based shape) so a
re-run of the same input produces byte-identical segments — the same
idempotence contract as the extraction stage's bnode ids (extract.py).
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

CRLF = b"\r\n"
GZIP_MAGIC = b"\x1f\x8b"

#: HTTP reason phrases for the statuses the synthetic corpus and tests
#: exercise; anything else gets a bare "Status" phrase (parsers must not
#: depend on the phrase — RFC 9112 §4 says it's free text).
_REASONS = {200: "OK", 301: "Moved Permanently", 302: "Found", 404: "Not Found", 500: "Internal Server Error"}


def _record_id(url: str, date: str) -> str:
    h = hashlib.sha1(f"{url}|{date}".encode()).hexdigest()
    # RFC 9562 name-based layout: version nibble 5, variant bits 10
    return (
        f"urn:uuid:{h[0:8]}-{h[8:12]}-5{h[13:16]}-"
        f"{'89ab'[int(h[16], 16) % 4]}{h[17:20]}-{h[20:32]}"
    )


def format_warc_record(
    url: str,
    date: str,
    payload: bytes,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
    warc_type: str = "response",
) -> bytes:
    """One WARC record (uncompressed bytes). `date` is the WARC-Date
    lexical (``YYYY-MM-DDThh:mm:ssZ``) — kept as a string end to end so
    round-trips are byte-exact regardless of session timezone."""
    reason = _REASONS.get(status, "Status")
    http_head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("ascii")
    block = http_head + payload
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Record-ID: <{_record_id(url, date)}>\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode("ascii")
    return head + block + CRLF + CRLF


def gzip_member(record: bytes) -> bytes:
    """Deterministic single-member gzip (mtime=0, no name, fixed level) —
    byte-identical across runs/partitions, per the idempotence contract."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", compresslevel=6, mtime=0) as f:
        f.write(record)
    return buf.getvalue()


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the CC segment layout)."""
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(data[pos:]))
        tail = d.unused_data
        pos = len(data) - len(tail) if tail else len(data)
    return b"".join(out)


def parse_warc(data: bytes) -> list[dict]:
    """Parse a WARC segment (gzipped members or plain concatenation) into
    record dicts: warc_type, url, warc_date, record_id, http_status,
    content_type, payload (bytes).

    Tolerant by the error contract of the extraction stage: a malformed
    record head stops the scan of THIS segment (returns what parsed so
    far) rather than raising — at 10^12 docs a truncated tail file must
    not kill a task; callers see the short count in lineage metrics.
    """
    if data[:2] == GZIP_MAGIC:
        data = _gunzip_members(data)
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = data.find(CRLF + CRLF, pos)
        if head_end < 0 or not data.startswith(b"WARC/", pos):
            break
        headers: dict[str, str] = {}
        lines = data[pos:head_end].split(CRLF)
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.decode("ascii", "replace").strip().lower()] = v.decode(
                "utf-8", "replace"
            ).strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        if head_end + 4 + clen > n:
            break  # truncated final record — drop, don't emit a short payload
        block = data[head_end + 4 : head_end + 4 + clen]
        pos = head_end + 4 + clen

        rec = {
            "warc_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "record_id": headers.get("warc-record-id", "").strip("<>"),
            "http_status": None,
            "content_type": None,
            "payload": block,
        }
        if headers.get("content-type", "").startswith("application/http"):
            split = block.find(CRLF + CRLF)
            if split >= 0:
                http_head, payload = block[:split], block[split + 4 :]
                head_lines = http_head.split(CRLF)
                parts = head_lines[0].split(b" ", 2)
                if len(parts) >= 2 and parts[1].isdigit():
                    rec["http_status"] = int(parts[1])
                for line in head_lines[1:]:
                    k, _, v = line.partition(b":")
                    if k.decode("ascii", "replace").strip().lower() == "content-type":
                        rec["content_type"] = v.decode("ascii", "replace").strip()
                rec["payload"] = payload
        records.append(rec)
    return records


PAGES_FROM_WARC_SCHEMA = (
    "url string, warc_date string, record_id string, http_status int, "
    "content_type string, html binary"
)


def pages_to_warc(pages: DataFrame, compress: bool = True) -> DataFrame:
    """(url, warc_date, html[, http_status, content_type]) → (url, warc
    binary): one response record per page, one gzip member per record
    (the splittable CC layout). Arrow-batched; no per-row UDFs."""
    cols = pages.columns

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            statuses = pdf["http_status"] if "http_status" in cols else [200] * len(pdf)
            ctypes = (
                pdf["content_type"]
                if "content_type" in cols
                else ["text/html; charset=utf-8"] * len(pdf)
            )
            blobs = []
            for url, date, html, st, ct in zip(
                pdf["url"], pdf["warc_date"], pdf["html"], statuses, ctypes
            ):
                rec = format_warc_record(url, date, bytes(html), status=int(st), content_type=ct)
                blobs.append(gzip_member(rec) if compress else rec)
            yield pd.DataFrame({"url": pdf["url"], "warc": blobs})

    return pages.mapInPandas(run, schema="url string, warc binary")


def warc_to_pages(segments: DataFrame, col: str = "warc") -> DataFrame:
    """(… , warc binary) → exploded page rows (PAGES_FROM_WARC_SCHEMA).
    Each input row may hold a whole multi-record segment; only
    ``response`` records become pages (request/metadata records are
    archive plumbing, not documents)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for blob in pdf[col]:
                for r in parse_warc(bytes(blob)):
                    if r["warc_type"] != "response":
                        continue
                    out.append(
                        (
                            r["url"],
                            r["warc_date"],
                            r["record_id"],
                            r["http_status"],
                            r["content_type"],
                            r["payload"],
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=["url", "warc_date", "record_id", "http_status", "content_type", "html"],
            )

    return segments.select(col).mapInPandas(run, schema=PAGES_FROM_WARC_SCHEMA)
