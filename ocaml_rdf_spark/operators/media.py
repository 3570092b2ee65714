"""Multimodal columns: image/audio/video as opaque `binary` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched `mapInPandas` stages.

Decode is REAL for PNG (r4: operators/png.py — a from-scratch spec
decoder/encoder on stdlib zlib: chunk CRCs, all five scanline filters,
color types 0/2/3/4/6; metadata, nearest-neighbor resize, and a luma-
histogram feature all run on actual pixels) and for PCM WAV audio
(wav.py — RIFF parsing, 8/16-bit sample decode, integer RMS-energy
histogram feature). Other formats (JPEG, compressed audio, video)
remain STUBBED per the sandbox's no-codec-libs mandate,
behind `_decode_stub` — a deterministic fake derived from the bytes —
with the Spark-side plumbing (schema, batch shape, partitioning, UDF
signature) real and tested; swap in PIL/libav in production and
nothing else changes.

Scale notes: media bytes never enter a shuffle — metadata is computed in
a map-only pass and only the (small) feature rows move. Partition by a
content-hash prefix when materializing so mega-site skew (one host's
images) spreads (same salting rationale as extract.salted_repartition).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video|unknown
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def _sniff_kind(b: bytes) -> str:
    if b[:8] == b"\x89PNG\r\n\x1a\n" or b[:3] == b"\xff\xd8\xff":
        return "image"
    if b[:4] == b"RIFF" or b[:3] == b"ID3":
        return "audio"
    if len(b) > 8 and b[4:8] == b"ftyp":
        return "video"
    return "unknown"


def _decode_stub(b: bytes) -> dict:
    """Deterministic fake decode. REPLACE with a real decoder (PIL /
    libav) in production; raises nothing, returns stable pseudo-metadata
    derived from a content hash so tests are reproducible."""
    h = hashlib.sha256(b).digest()
    return {
        "width": 64 + h[0],
        "height": 64 + h[1],
        "n_frames": 1 + h[2] % 8,
    }


def _decode(b: bytes) -> dict:
    """Real decode where we have a codec, stub elsewhere (r4: PNG is
    REAL — operators/png.py, a from-scratch spec decoder with CRC +
    un-filter + full pixel verification). A malformed or out-of-scope
    PNG (interlace, non-8-bit) falls back to the stub rather than
    killing the batch — same error-tolerance posture as extract's
    error rows."""
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import PngError, png_meta

        try:
            return png_meta(b)
        except PngError:
            return _decode_stub(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        from .wav import WavError, wav_meta

        try:
            return wav_meta(b)
        except WavError:
            return _decode_stub(b)
    return _decode_stub(b)


def media_metadata(df: DataFrame, id_col: str = "media_id", bytes_col: str = "content") -> DataFrame:
    """(id, binary) → typed metadata rows. Arrow-batched; one pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[bytes_col]):
                b = bytes(raw)
                meta = _decode(b)
                rows.append(
                    (
                        str(mid),
                        len(b),
                        hashlib.sha256(b).hexdigest(),
                        _sniff_kind(b),
                        meta["width"],
                        meta["height"],
                        meta["n_frames"],
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return df.select(id_col, bytes_col).mapInPandas(run, schema=MEDIA_META_SCHEMA)


def media_features(df: DataFrame, dim: int = 16, id_col: str = "media_id", bytes_col: str = "content") -> DataFrame:
    """(id, binary) → deterministic feature vector. PNG bytes get a REAL
    feature (16-bin luma histogram from the full pixel decode —
    operators/png.py); other formats keep the stub pseudo-embedding
    until their codecs land. Batch shape and schema are
    production-real either way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .png import PngError, png_histogram
        from .wav import WavError, wav_energy_histogram

        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[bytes_col]):
                b = bytes(raw)
                vec = None
                if b[:8] == b"\x89PNG\r\n\x1a\n":
                    try:
                        vec = [float(v) for v in png_histogram(b, bins=dim)]
                    except PngError:
                        vec = None
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    try:
                        vec = [float(v) for v in wav_energy_histogram(b, bins=dim)]
                    except WavError:
                        vec = None
                if vec is None:
                    d = hashlib.sha256(b).digest()
                    vec = [((d[i % 32] / 255.0) * 2 - 1) for i in range(dim)]
                rows.append((str(mid), vec))
            yield pd.DataFrame(rows, columns=["media_id", "feature"])

    return df.select(id_col, bytes_col).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 2, max_frames: int = 64, id_col: str = "media_id", bytes_col: str = "content") -> DataFrame:
    """Video frame-sampling plumbing: 1 media row → n_frames/every_n frame
    rows (stub frames = byte slices). Real decoder swaps in unchanged.
    `max_frames` caps the per-row fan-out: a real decode can report
    sample/frame counts in the millions (r4: WAV decode is real and
    n_frames = sample frames), and an uncapped explode of one row into
    millions is a row-width bomb, not sampling."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[bytes_col]):
                b = bytes(raw)
                n = min(_decode(b)["n_frames"], max_frames)
                for fno in range(0, n, every_n):
                    lo = (fno * 16) % max(len(b), 1)
                    rows.append((str(mid), fno, b[lo : lo + 16]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame"])

    return df.select(id_col, bytes_col).mapInPandas(run, schema=out_schema)


def resize_media(df: DataFrame, width: int = 32, height: int = 32, id_col: str = "media_id", bytes_col: str = "content") -> DataFrame:
    """Resize: (id, binary) → (id, width, height, binary). PNG bytes get
    a REAL nearest-neighbor resample + deterministic re-encode
    (operators/png.py); other formats keep the stub payload — a
    content-hash-seeded byte plane of exactly width*height bytes, so
    downstream stages see real post-resize batch shapes either way."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("content", T.BinaryType(), False),
        ]
    )

    def _resize_stub(b: bytes) -> bytes:
        seed = hashlib.sha256(b).digest()
        reps = (width * height) // len(seed) + 1
        return (seed * reps)[: width * height]

    def _resize(b: bytes) -> bytes:
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            from .png import PngError, png_resize

            try:
                return png_resize(b, width, height)
            except PngError:
                return _resize_stub(b)
        return _resize_stub(b)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (str(mid), width, height, _resize(bytes(raw)))
                for mid, raw in zip(pdf[id_col], pdf[bytes_col])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "content"])

    return df.select(id_col, bytes_col).mapInPandas(run, schema=out_schema)
