"""PCM WAV codec (operators/wav.py): spec-anchored hand-built RIFF
bytes (struct-written in the test, not via the library), known-signal
energy features, rejection boundaries, and media-operator integration."""

from __future__ import annotations

import struct

import pytest

from ocaml_rdf_spark.operators.wav import (
    WavError,
    wav_decode,
    wav_energy_histogram,
    wav_meta,
)


def _wav(samples_per_ch, rate=8000, bits=16, tag=1):
    """Hand-assemble a RIFF/WAVE file: samples_per_ch = list of frames,
    each a tuple of per-channel ints."""
    n_ch = len(samples_per_ch[0]) if samples_per_ch else 1
    bytes_per = bits // 8
    block = n_ch * bytes_per
    data = bytearray()
    for fr in samples_per_ch:
        for v in fr:
            if bits == 16:
                data += struct.pack("<h", v)
            else:
                data += bytes([v + 128])
    fmt = struct.pack("<HHIIHH", tag, n_ch, rate, rate * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_16bit_stereo():
    frames = [(100, -100), (200, -200), (32767, -32768)]
    rate, n_ch, bits, got = wav_decode(_wav(frames, rate=44100))
    assert (rate, n_ch, bits) == (44100, 2, 16)
    assert got == frames


def test_decode_8bit_recentred():
    frames = [(0,), (127,), (-128,)]
    _r, _c, bits, got = wav_decode(_wav(frames, bits=8))
    assert bits == 8 and got == frames


def test_meta_counts_frames():
    m = wav_meta(_wav([(1, 2)] * 50, rate=16000))
    assert m["n_frames"] == 50 and m["sample_rate"] == 16000
    assert m["n_channels"] == 2 and m["width"] is None


def test_energy_histogram_known_signals():
    # silence -> all energy in bin 0
    h = wav_energy_histogram(_wav([(0,)] * 512), bins=16, window=256)
    assert h[0] == 1.0
    # full-scale square wave: mean square = 32767^2 ~= 2^30 -> top bin
    h = wav_energy_histogram(_wav([(32767,), (-32767,)] * 256), bins=16, window=256)
    assert h[-1] == 1.0
    # half silence, half loud (two windows)
    mix = [(0,)] * 256 + [(32767,)] * 256
    h = wav_energy_histogram(_wav(mix), bins=16, window=256)
    assert h[0] == 0.5 and h[-1] == 0.5


def test_rejections():
    with pytest.raises(WavError, match="RIFF"):
        wav_decode(b"nope")
    with pytest.raises(WavError, match="format tag"):
        wav_decode(_wav([(1,)], tag=3))  # IEEE float
    # truncated data chunk
    good = _wav([(1,)] * 4)
    with pytest.raises(WavError, match="truncated"):
        wav_decode(good[:-3])


def test_media_operators_take_real_wav_path(spark):
    from ocaml_rdf_spark.operators.media import media_features, media_metadata

    wav = _wav([(0,)] * 512, rate=22050)
    df = spark.createDataFrame(
        [("wav1", bytearray(wav)), ("txt1", bytearray(b"plain bytes"))],
        "media_id string, content binary",
    )
    meta = {r["media_id"]: r for r in media_metadata(df).collect()}
    assert meta["wav1"]["kind"] == "audio"
    assert meta["wav1"]["n_frames"] == 512 and meta["wav1"]["width"] is None
    feats = {r["media_id"]: list(r["feature"]) for r in media_features(df).collect()}
    assert feats["wav1"][0] == 1.0  # silence -> bin 0
    assert any(v < 0 for v in feats["txt1"])  # stub path unchanged
