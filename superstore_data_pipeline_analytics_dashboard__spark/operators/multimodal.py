"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas`` (the only places in
the engine where Python touches row data — vectorized, never per-row UDFs).

The container has no real codec libraries, so DECODING IS STUBBED: real
codecs are attempted via import (PIL / soundfile); otherwise payloads in
the deterministic FAKE container format below are parsed, and anything
else raises ``NotImplementedError``. Everything AROUND the decode — the
schemas, the mapInPandas batch iteration, the partitioning, the exploded
frame grain — is real and tested, and is what matters at 100 TB: a real
decoder drops into ``_decode_image`` without touching any plan.

FAKE container format (deterministic, for tests):
    images: b"FAKEIMG|<width>|<height>|<payload-bytes>"
    video:  b"FAKEVID|<n_frames>|<width>|<height>|<payload-bytes>"

Scale notes: media tables should be written partitioned/bucketed by
``media_id`` so per-item ops are narrow; feature extraction is a pure map
(no shuffle); frame sampling explodes rows but keeps partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURES_SCHEMA = (
    "media_id BIGINT, width INT, height INT, n_bytes INT, features ARRAY<DOUBLE>"
)
FRAMES_SCHEMA = "media_id BIGINT, frame_no INT, width INT, height INT, frame BINARY"
RESIZED_SCHEMA = "media_id BIGINT, width INT, height INT, content BINARY"


def make_fake_image(width: int, height: int, payload: bytes) -> bytes:
    return b"FAKEIMG|%d|%d|" % (width, height) + payload


def make_fake_video(n_frames: int, width: int, height: int, payload: bytes) -> bytes:
    return b"FAKEVID|%d|%d|%d|" % (n_frames, width, height) + payload


def _decode_image(content: bytes) -> tuple[int, int, bytes]:
    """→ (width, height, pixel-payload). Real decoder if available, else
    the FAKE container, else NotImplementedError (documented stub)."""
    try:  # pragma: no cover - PIL absent in this container
        from io import BytesIO

        from PIL import Image

        img = Image.open(BytesIO(content))
        return img.width, img.height, img.tobytes()
    except Exception:
        # PIL missing OR payload not a real image — fall through to the
        # FAKE container either way (a FAKEIMG payload must decode even
        # on hosts that do have codecs installed).
        pass
    if content.startswith(b"FAKEIMG|"):
        _, w, h, payload = content.split(b"|", 3)
        return int(w), int(h), payload
    raise NotImplementedError(
        "no image codec in this environment and payload is not FAKEIMG"
    )


def _decode_video(content: bytes) -> tuple[int, int, int, bytes]:
    if content.startswith(b"FAKEVID|"):
        _, n, w, h, payload = content.split(b"|", 4)
        return int(n), int(w), int(h), payload
    raise NotImplementedError(
        "no video codec in this environment and payload is not FAKEVID"
    )


def extract_image_features(
    media: DataFrame, id_col: str = "media_id", content_col: str = "content",
    n_features: int = 8,
) -> DataFrame:
    """Decode + featurize each image: (media_id, width, height, n_bytes,
    features[n_features]). The fake featurizer is a byte-histogram fold —
    deterministic, so tests can assert exact values; a real model would
    run here on the same Arrow batches."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                w, h, payload = _decode_image(bytes(content))
                feats = [0.0] * n_features
                for i, b in enumerate(payload):
                    feats[i % n_features] += b
                total = sum(feats) or 1.0
                out.append((mid, w, h, len(payload), [f / total for f in feats]))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "n_bytes", "features"]
            )

    return media.select(
        F.col(id_col).alias(id_col), F.col(content_col).alias(content_col)
    ).mapInPandas(gen, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int,
    id_col: str = "media_id", content_col: str = "content",
) -> DataFrame:
    """Resize every image to (width, height). Fake path: re-wrap the
    payload under the new header (a real resampler slots in here)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                _, _, payload = _decode_image(bytes(content))
                out.append((mid, width, height, make_fake_image(width, height, payload)))
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "content"])

    return media.select(
        F.col(id_col).alias(id_col), F.col(content_col).alias(content_col)
    ).mapInPandas(gen, schema=RESIZED_SCHEMA)


def sample_frames(
    media: DataFrame, every_n: int = 2,
    id_col: str = "media_id", content_col: str = "content",
) -> DataFrame:
    """Video → one row per sampled frame (media_id, frame_no, w, h, frame).
    Grain change happens INSIDE the Arrow batch (no Spark explode needed);
    output keeps the input partitioning."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                n, w, h, payload = _decode_video(bytes(content))
                frame_sz = max(len(payload) // max(n, 1), 1)
                for i in range(0, n, every_n):
                    frame = payload[i * frame_sz : (i + 1) * frame_sz]
                    out.append((mid, i, w, h, make_fake_image(w, h, frame)))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_no", "width", "height", "frame"]
            )

    return media.select(
        F.col(id_col).alias(id_col), F.col(content_col).alias(content_col)
    ).mapInPandas(gen, schema=FRAMES_SCHEMA)
