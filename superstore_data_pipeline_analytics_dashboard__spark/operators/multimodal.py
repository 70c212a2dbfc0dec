"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas`` (the only places in
the engine where Python touches row data — vectorized, never per-row UDFs).

Decode support, in probe order:

* **PPM (P6)** and **24-bit BI_RGB BMP** — REAL decoders/encoders below,
  pure struct+numpy, no codec library needed. Decoded pixels feed real
  featurization and real nearest-neighbor resampling.
* PIL, if the host has it (absent in this container) — covers
  JPEG/PNG/….
* the deterministic FAKE container format (tests, and the honest stub
  for compressed formats this environment cannot decode):
      images: b"FAKEIMG|<width>|<height>|<payload-bytes>"
      video:  b"FAKEVID|<n_frames>|<width>|<height>|<payload-bytes>"
* anything else raises ``NotImplementedError``.

Everything around the decode — the schemas, the mapInPandas batch
iteration, the partitioning, the exploded frame grain — is identical for
every branch, which is the 100 TB-relevant part: a JPEG codec drops into
``_decode_image`` without touching any plan.

Scale notes: media tables should be written partitioned/bucketed by
``media_id`` so per-item ops are narrow; feature extraction is a pure map
(no shuffle); frame sampling explodes rows but keeps partitioning.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
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


# ------------------------------------------------ real codec: PPM (P6)

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → binary PPM."""
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        pixels, dtype=np.uint8
    ).tobytes()


def decode_ppm(content: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) → (h, w, 3) uint8 RGB. Handles the
    full header grammar: arbitrary whitespace and ``#`` comments."""
    if content[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":
            while i < len(content) and content[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(content) and not content[j : j + 1].isspace():
            j += 1
        tokens.append(int(content[i:j]))
        i = j
    i += 1  # exactly one whitespace byte after maxval, then raster
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    return (
        np.frombuffer(content, np.uint8, count=w * h * 3, offset=i)
        .reshape(h, w, 3)
        .copy()
    )


# -------------------------------------- real codec: BMP (24-bit BI_RGB)

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed bottom-up BMP."""
    h, w = pixels.shape[:2]
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    bgr = np.ascontiguousarray(pixels[..., ::-1], dtype=np.uint8)
    pad = b"\x00" * (row_size - w * 3)
    rows = [bgr[y].tobytes() + pad for y in range(h - 1, -1, -1)]
    return header + dib + b"".join(rows)


def decode_bmp(content: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP (top-down or bottom-up) → (h, w, 3) uint8 RGB."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", content, 10)
    w, h = struct.unpack_from("<ii", content, 18)
    _, bpp = struct.unpack_from("<HH", content, 26)
    (comp,) = struct.unpack_from("<I", content, 30)
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit BI_RGB BMP supported")
    bottom_up, h = h > 0, abs(h)
    row_size = (w * 3 + 3) & ~3
    raster = np.frombuffer(
        content, np.uint8, count=row_size * h, offset=data_off
    ).reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        raster = raster[::-1]
    return raster[..., ::-1].copy()  # BGR → RGB


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample of an (h, w, 3) array — index gather,
    the real kernel behind :func:`resize_images` for decodable formats."""
    ys = (np.arange(height) * pixels.shape[0]) // height
    xs = (np.arange(width) * pixels.shape[1]) // width
    return pixels[ys][:, xs]


def _decode_image_array(content: bytes) -> np.ndarray | None:
    """Real-pixel decode where possible (PPM/BMP/PIL), else None."""
    if content[:2] == b"P6":
        return decode_ppm(content)
    if content[:2] == b"BM":
        return decode_bmp(content)
    try:  # pragma: no cover - PIL absent in this container
        from io import BytesIO

        from PIL import Image

        img = Image.open(BytesIO(content)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    except Exception:
        return None


def _decode_image(content: bytes) -> tuple[int, int, bytes]:
    """→ (width, height, pixel-payload). Real decoders first (PPM/BMP
    here, PIL if the host has it), then the FAKE container, else
    NotImplementedError (the honest stub for compressed formats in a
    codec-less environment)."""
    arr = _decode_image_array(content)
    if arr is not None:
        return arr.shape[1], arr.shape[0], arr.tobytes()
    if content.startswith(b"FAKEIMG|"):
        _, w, h, payload = content.split(b"|", 3)
        return int(w), int(h), payload
    raise NotImplementedError(
        "no codec for this payload in this environment (PPM/BMP/FAKEIMG supported)"
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
    """Resize every image to (width, height). Decodable formats
    (PPM/BMP/PIL) go through a REAL nearest-neighbor resample and come
    back as PPM; FAKE containers re-wrap their payload under the new
    header (the stub path for codec-less compressed formats)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                raw = bytes(content)
                arr = _decode_image_array(raw)
                if arr is not None:
                    resized = encode_ppm(resize_nearest(arr, width, height))
                else:
                    _, _, payload = _decode_image(raw)
                    resized = make_fake_image(width, height, payload)
                out.append((mid, width, height, resized))
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
