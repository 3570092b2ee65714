"""Pure-Python PCM WAV codec — the second REAL media decoder (after
png.py): RIFF/WAVE container parsing per the original IBM/Microsoft
spec, PCM 8-bit (unsigned) and 16-bit (signed little-endian) sample
decode, and integer audio features. Out of scope (raises WavError,
callers fall back to the deterministic stub): compressed format tags
(IEEE float, ADPCM, MP3-in-WAV), bit depths other than 8/16 — stated,
not silently wrong.

Everything downstream is INTEGER math (RMS via integer square sums,
equal-width energy bins), so features are bit-identical across
platforms — the repo's oracle discipline.

Scale note: like png.py this is per-sample Python, deliberately living
inside the Arrow-batched mapInPandas stage in media.py; the Spark story
is the batching, and a vectorized decoder swaps in without touching the
plan.
"""

from __future__ import annotations

import struct


class WavError(ValueError):
    """Malformed or out-of-scope WAV (callers may fall back to a stub)."""


def wav_decode(b: bytes):
    """→ (sample_rate, n_channels, bits, frames) with frames = list of
    per-frame tuples of ints (one int per channel), 16-bit signed or
    8-bit recentred to signed (-128..127)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE file")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (clen,) = struct.unpack("<I", b[i + 4 : i + 8])
        body = b[i + 8 : i + 8 + clen]
        if len(body) != clen:
            raise WavError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise WavError("missing fmt or data chunk")
    if len(fmt) < 16:
        raise WavError("fmt chunk too short")
    tag, n_ch, rate, _byterate, block, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag != 1:
        raise WavError(f"non-PCM format tag {tag} not supported")
    if bits not in (8, 16):
        raise WavError(f"bit depth {bits} not supported (8/16 only)")
    if n_ch == 0 or rate == 0:
        raise WavError("zero channels or sample rate")
    bytes_per = bits // 8
    if block != n_ch * bytes_per:
        raise WavError("block align does not match channels × depth")
    n_frames = len(data) // block
    frames = []
    for f in range(n_frames):
        off = f * block
        ch_vals = []
        for c in range(n_ch):
            o = off + c * bytes_per
            if bits == 16:
                (v,) = struct.unpack_from("<h", data, o)
            else:
                v = data[o] - 128  # 8-bit WAV is unsigned; recentre
            ch_vals.append(v)
        frames.append(tuple(ch_vals))
    return rate, n_ch, bits, frames


def wav_meta(b: bytes) -> dict:
    """Metadata via full decode (a lying header raises — png_meta's
    rule). n_frames = sample frames; width/height have no audio
    meaning and stay None in the media schema."""
    rate, n_ch, bits, frames = wav_decode(b)
    return {
        "width": None,
        "height": None,
        "n_frames": len(frames),
        "sample_rate": rate,
        "n_channels": n_ch,
        "bits": bits,
    }


def wav_energy_histogram(b: bytes, bins: int = 16, window: int = 256) -> list:
    """Deterministic audio feature: per-window integer RMS² energy
    (mean of squared first-channel samples over `window` frames,
    integer division), log-free equal-width bins over the 16-bit energy
    range, L1-normalized at the very end — the audio twin of
    png_histogram."""
    _rate, _n_ch, bits, frames = wav_decode(b)
    if not frames:
        raise WavError("no frames")
    # normalize 8-bit to the 16-bit scale so the bin edges are one range
    shift = 8 if bits == 8 else 0
    energies = []
    for start in range(0, len(frames), window):
        chunk = frames[start : start + window]
        s = sum((fr[0] << shift) * (fr[0] << shift) for fr in chunk)
        energies.append(s // len(chunk))  # mean square, integer
    # max mean-square for 16-bit signed is 32768² = 2³⁰
    counts = [0] * bins
    for e in energies:
        idx = (e * bins) >> 30
        counts[min(idx, bins - 1)] += 1
    n = len(energies)
    return [c / n for c in counts]
