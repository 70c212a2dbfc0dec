"""Audio codec + featurizer (operators/audio.py): real RIFF round-trip,
chunk-walk robustness, exact-integer features vs pure-Python, stub path,
and the honest NotImplementedError contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.operators.audio import (
    decode_wav,
    extract_audio_features,
    make_fake_audio,
    make_wav,
    wav_header,
)


def test_wav_roundtrip_exact():
    samples = np.array([0, 100, -32768, 32767, -1, 1], dtype=np.int16)
    blob = make_wav(16_000, 1, samples)
    rate, ch, got = decode_wav(blob)
    assert (rate, ch) == (16_000, 1)
    assert np.array_equal(got, samples)


def test_wav_chunk_walk_skips_extra_chunks():
    """A LIST/INFO chunk between fmt and data (common in the wild) must
    not confuse the parser; odd-sized chunks are word-aligned."""
    samples = np.array([5, -5, 7], dtype=np.int16)
    payload = samples.astype("<i2").tobytes()
    info = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded odd chunk
    head = wav_header(8_000, 1, len(payload))
    # splice the LIST chunk in front of the data chunk
    blob = head[:36] + info + head[36:] + payload
    # fix RIFF size (not validated, but keep honest)
    rate, ch, got = decode_wav(blob)
    assert rate == 8_000 and np.array_equal(got, samples)


def test_decode_rejects_non_riff_and_non_pcm():
    with pytest.raises(ValueError):
        decode_wav(b"OggS" + b"\x00" * 40)
    bad_fmt = bytearray(make_wav(8_000, 1, np.array([1], dtype=np.int16)))
    bad_fmt[20:22] = struct.pack("<H", 85)  # fmt tag -> MP3
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(bad_fmt))


def test_features_match_python_reference(spark):
    rows = [
        (1, make_wav(8_000, 1, np.array([3, -4, 0, 0, 6, -6], dtype=np.int16))),
        (2, make_wav(16_000, 2, np.arange(-8, 8, dtype=np.int16))),
        (3, make_fake_audio(22_050, 1, b"\x01\x00\xff\xff\x00\x00\x05\x00")),
    ]
    media = spark.createDataFrame(rows, "media_id BIGINT, content BINARY")
    got = {r["media_id"]: r.asDict() for r in extract_audio_features(media).collect()}

    # id=1: samples 3,-4,0,0,6,-6 → peak 6, energy 9+16+36+36=97,
    # signs + - + - → 3 crossings, 6 frames @8k → 0 ms
    assert got[1]["sample_rate"] == 8_000
    assert got[1]["n_samples"] == 6
    assert got[1]["duration_ms"] == 0
    assert got[1]["peak"] == 6
    assert got[1]["energy"] == 97
    assert got[1]["zero_crossings"] == 3

    # id=2: stereo, 16 samples → 8 frames @16k
    s = np.arange(-8, 8, dtype=np.int64)
    assert got[2]["n_channels"] == 2
    assert got[2]["n_samples"] == 16
    assert got[2]["energy"] == int(np.sum(s * s))
    assert got[2]["zero_crossings"] == 1

    # id=3: FAKEAUD payload read as PCM LE int16: 1, -1, 0, 5
    assert got[3]["sample_rate"] == 22_050
    assert got[3]["n_samples"] == 4
    assert got[3]["peak"] == 5
    assert got[3]["energy"] == 1 + 1 + 0 + 25
    assert got[3]["zero_crossings"] == 2


def test_unknown_codec_is_honest(spark):
    media = spark.createDataFrame(
        [(1, b"ID3\x03mp3bytes")], "media_id BIGINT, content BINARY"
    )
    with pytest.raises(Exception, match="no audio codec"):
        extract_audio_features(media).collect()


def test_q135_runs_and_is_scalar_only(spark):
    from superstore_data_pipeline_analytics_dashboard__spark.plans import (
        catalog_queries as Q,
    )
    from tests.conftest import SF_SMOKE

    out = Q.QUERIES["q135_audio_features"](spark, SF_SMOKE)
    rows = out.collect()
    assert rows
    # real-WAV rows: 256 payload bytes = 128 samples @8k -> 16 ms
    real = [r for r in rows if r["media_id"] % 2 == 0]
    assert real and all(
        r["n_samples"] == 128 and r["duration_ms"] == 16 for r in real
    )
    fake = [r for r in rows if r["media_id"] % 2 == 1]
    assert fake and all(r["sample_rate"] == 8_000 for r in fake)
