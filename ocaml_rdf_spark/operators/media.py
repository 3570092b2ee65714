"""Multimodal columns: image/audio/video as opaque `binary` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched `mapInPandas` stages.

The decode step is STUBBED (per driver instructions: no image/audio libs
in this container) behind `_decode_stub`, which yields a deterministic
fake derived from the bytes — the Spark-side plumbing (schema, batch
shape, partitioning, UDF signature) is real and tested. Swap
`_decode_stub` for PIL/librosa in production; nothing else changes.

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


def media_metadata(df: DataFrame, id_col: str = "media_id", bytes_col: str = "content") -> DataFrame:
    """(id, binary) → typed metadata rows. Arrow-batched; one pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[bytes_col]):
                b = bytes(raw)
                meta = _decode_stub(b)
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
    """(id, binary) → deterministic pseudo-embedding (stub for a real
    vision/audio encoder). Batch shape and schema are production-real."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[bytes_col]):
                d = hashlib.sha256(bytes(raw)).digest()
                vec = [((d[i % 32] / 255.0) * 2 - 1) for i in range(dim)]
                rows.append((str(mid), vec))
            yield pd.DataFrame(rows, columns=["media_id", "feature"])

    return df.select(id_col, bytes_col).mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 2, id_col: str = "media_id", bytes_col: str = "content") -> DataFrame:
    """Video frame-sampling plumbing: 1 media row → n_frames/every_n frame
    rows (stub frames = byte slices). Real decoder swaps in unchanged."""
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
                n = _decode_stub(b)["n_frames"]
                for fno in range(0, n, every_n):
                    lo = (fno * 16) % max(len(b), 1)
                    rows.append((str(mid), fno, b[lo : lo + 16]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame"])

    return df.select(id_col, bytes_col).mapInPandas(run, schema=out_schema)


def resize_media(df: DataFrame, width: int = 32, height: int = 32, id_col: str = "media_id", bytes_col: str = "content") -> DataFrame:
    """Resize plumbing: (id, binary) → (id, width, height, binary). The
    stub 'resized' payload is a deterministic content-hash-seeded byte
    plane of exactly width*height bytes (so downstream stages see the
    real post-resize batch shapes/sizes); a real decoder+resampler swaps
    into `_resize_stub` unchanged."""
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

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (str(mid), width, height, _resize_stub(bytes(raw)))
                for mid, raw in zip(pdf[id_col], pdf[bytes_col])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "content"])

    return df.select(id_col, bytes_col).mapInPandas(run, schema=out_schema)
