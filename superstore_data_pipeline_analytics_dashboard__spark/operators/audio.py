"""Audio columns: WAV/PCM as opaque ``binary`` + typed metadata,
completing the modality set next to ``multimodal.py``'s image/video.

Same architecture as the image side: Python touches bytes ONLY inside
Arrow ``mapInPandas`` batches (the industry shape — real audio stacks
drive native decoders exactly like this); everything upstream and
downstream of the batch boundary is plain DataFrame.  The RIFF/WAVE
PCM-16 codec here is REAL (pure struct/numpy — RIFF framing, fmt/data
chunk walk, LE int16 samples); compressed formats (MP3/Opus/FLAC) ride
the ``FAKEAUD`` container or raise the honest ``NotImplementedError``,
mirroring ``_decode_image``'s contract in a codec-less container.

Features are EXACT integers (sample counts, integer duration math,
peak, int64 energy, zero crossings) so tests assert exact values — a
learned embedding model would run on the same Arrow batches.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "make_wav",
    "wav_header",
    "decode_wav",
    "make_fake_audio",
    "extract_audio_features",
]

AUDIO_FEATURES_SCHEMA = (
    "media_id BIGINT, sample_rate INT, n_channels INT, n_samples BIGINT, "
    "duration_ms BIGINT, peak INT, energy BIGINT, zero_crossings BIGINT"
)


def wav_header(sample_rate: int, n_channels: int, n_data_bytes: int) -> bytes:
    """The 44-byte canonical PCM-16 RIFF header for a known payload size
    — constant for fixed-size payloads, so a catalog query can prepend
    it as a binary literal JVM-side (the q67 PPM trick, audio edition).
    """
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n_data_bytes)
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, n_channels, sample_rate, byte_rate, block_align, 16
        )
        + b"data"
        + struct.pack("<I", n_data_bytes)
    )


def make_wav(sample_rate: int, n_channels: int, samples: np.ndarray) -> bytes:
    """Serialize int16 samples (interleaved if multi-channel) to a real
    PCM-16 WAV file."""
    payload = np.asarray(samples, dtype="<i2").tobytes()
    return wav_header(sample_rate, n_channels, len(payload)) + payload


def make_fake_audio(sample_rate: int, n_channels: int, payload: bytes) -> bytes:
    """The stub container for compressed formats: metadata is typed and
    parseable, the payload is treated as raw PCM bytes downstream."""
    return b"FAKEAUD|%d|%d|" % (sample_rate, n_channels) + payload


def decode_wav(content: bytes) -> tuple[int, int, np.ndarray]:
    """REAL RIFF/WAVE PCM-16 parse → (sample_rate, n_channels, samples).

    Walks the chunk list (fmt may be followed by LIST/INFO etc. before
    data), validates PCM-16, and tolerates the truncated final sample a
    sloppy writer produces."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, rate, channels, bits = 12, None, None, None
    data = None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM-16 supported (fmt={fmt}, bits={bits})"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    usable = len(data) - (len(data) % 2)
    samples = np.frombuffer(data[:usable], dtype="<i2")
    return rate, channels, samples


def _decode_audio(content: bytes) -> tuple[int, int, np.ndarray]:
    if content[:4] == b"RIFF":
        return decode_wav(content)
    if content.startswith(b"FAKEAUD|"):
        _, rate, ch, payload = content.split(b"|", 3)
        usable = len(payload) - (len(payload) % 2)
        return int(rate), int(ch), np.frombuffer(payload[:usable], dtype="<i2")
    raise NotImplementedError(
        "no audio codec for this payload in this environment (WAV/FAKEAUD supported)"
    )


def extract_audio_features(
    media: DataFrame, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Decode + featurize each clip: exact-integer signal stats.

    duration_ms uses integer math (frames·1000 div rate) so the value is
    engine-exact; energy is the int64 sum of squared samples (bounded:
    2^31 per sample² × clip length keeps real clips far under 2^63)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                rate, ch, samples = _decode_audio(bytes(content))
                frames = len(samples) // max(ch, 1)
                s64 = samples.astype(np.int64)
                signs = np.sign(s64)
                nz = signs[signs != 0]
                zc = int(np.count_nonzero(nz[1:] != nz[:-1])) if nz.size else 0
                out.append(
                    (
                        mid,
                        rate,
                        ch,
                        int(len(samples)),
                        frames * 1000 // rate,
                        int(np.max(np.abs(s64))) if s64.size else 0,
                        int(np.sum(s64 * s64)),
                        zc,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_channels",
                    "n_samples",
                    "duration_ms",
                    "peak",
                    "energy",
                    "zero_crossings",
                ],
            )

    return media.select(
        F.col(id_col).alias(id_col), F.col(content_col).alias(content_col)
    ).mapInPandas(gen, schema=AUDIO_FEATURES_SCHEMA)
