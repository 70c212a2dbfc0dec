"""Multimodal plumbing tests: schemas, Arrow batch shape, grain changes.
The decode itself is the documented deterministic fake (no codecs here)."""

import pytest
from pyspark.sql import functions as F

from superstore_data_pipeline_analytics_dashboard__spark.operators import multimodal as M


@pytest.fixture()
def images(spark):
    rows = [
        (1, M.make_fake_image(4, 2, b"\x01\x02\x03\x04\x05\x06\x07\x08")),
        (2, M.make_fake_image(8, 8, bytes(range(64)))),
    ]
    return spark.createDataFrame(rows, "media_id BIGINT, content BINARY")


def test_extract_image_features(spark, images):
    out = M.extract_image_features(images, n_features=4)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,width:int,height:int,n_bytes:int,features:array<double>>"
    )
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["width"] == 4 and rows[1]["height"] == 2
    assert rows[1]["n_bytes"] == 8
    assert len(rows[1]["features"]) == 4
    assert abs(sum(rows[1]["features"]) - 1.0) < 1e-9
    # deterministic: same payload → same features
    again = {r["media_id"]: r for r in M.extract_image_features(images, n_features=4).collect()}
    assert again[1]["features"] == rows[1]["features"]


def test_resize_round_trips_through_decoder(spark, images):
    resized = M.resize_images(images, 2, 2)
    feats = M.extract_image_features(resized)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert rows[1]["width"] == 2 and rows[1]["height"] == 2
    assert rows[1]["n_bytes"] == 8  # payload untouched by the fake resampler


def test_sample_frames_grain(spark):
    vids = spark.createDataFrame(
        [(7, M.make_fake_video(6, 3, 3, bytes(range(60))))],
        "media_id BIGINT, content BINARY",
    )
    frames = M.sample_frames(vids, every_n=2)
    rows = frames.orderBy("frame_no").collect()
    assert [r["frame_no"] for r in rows] == [0, 2, 4]
    assert all(r["width"] == 3 for r in rows)
    # sampled frames decode as images
    as_imgs = frames.select(F.col("media_id"), F.col("frame").alias("content"))
    assert M.extract_image_features(as_imgs).count() == 3


def test_unknown_payload_raises_not_implemented(spark):
    bad = spark.createDataFrame([(1, b"JPEGmaybe")], "media_id BIGINT, content BINARY")
    with pytest.raises(Exception, match="NotImplementedError|no image codec"):
        M.extract_image_features(bad).collect()


def test_ppm_bmp_roundtrip_exact():
    import numpy as np

    from superstore_data_pipeline_analytics_dashboard__spark.operators.multimodal import (
        decode_bmp, decode_ppm, encode_bmp, encode_ppm,
    )

    rng = np.random.RandomState(3)
    for w, h in [(1, 1), (3, 2), (5, 4), (7, 3)]:  # odd widths hit BMP row padding
        px = rng.randint(0, 256, size=(h, w, 3)).astype("uint8")
        assert (decode_ppm(encode_ppm(px)) == px).all()
        assert (decode_bmp(encode_bmp(px)) == px).all()
    # PPM header grammar: comments + arbitrary whitespace
    px = np.arange(12, dtype="uint8").reshape(2, 2, 3)
    hdr = b"P6 # comment\n# another\n 2\t2 \n255\n" + px.tobytes()
    assert (decode_ppm(hdr) == px).all()


def test_resize_real_formats_nearest():
    import numpy as np

    from superstore_data_pipeline_analytics_dashboard__spark.operators.multimodal import (
        decode_ppm, encode_bmp, resize_nearest,
    )

    # 4x4 checkerboard -> 2x2 must pick exact source pixels (0,0),(0,2),(2,0),(2,2)
    px = np.zeros((4, 4, 3), dtype="uint8")
    px[::2, ::2] = 255
    small = resize_nearest(px, 2, 2)
    assert (small == np.array([[[255]*3, [255]*3], [[255]*3, [255]*3]])).all()
    assert small.shape == (2, 2, 3)
    # upscale keeps blocks
    big = resize_nearest(small, 4, 4)
    assert (big == 255).all()
    del encode_bmp, decode_ppm  # imported for the spark test below


def test_real_decode_through_spark(spark):
    import numpy as np

    from superstore_data_pipeline_analytics_dashboard__spark.operators.multimodal import (
        decode_ppm, encode_bmp, encode_ppm, extract_image_features, make_fake_image,
        resize_images,
    )

    rng = np.random.RandomState(11)
    ppm_px = rng.randint(0, 256, size=(3, 5, 3)).astype("uint8")
    bmp_px = rng.randint(0, 256, size=(4, 3, 3)).astype("uint8")
    rows = [
        (1, bytearray(encode_ppm(ppm_px))),
        (2, bytearray(encode_bmp(bmp_px))),
        (3, bytearray(make_fake_image(9, 9, b"\x01\x02\x03\x04"))),
    ]
    df = spark.createDataFrame(rows, "media_id BIGINT, content BINARY")

    feats = {r["media_id"]: r for r in extract_image_features(df).collect()}
    assert (feats[1]["width"], feats[1]["height"]) == (5, 3)
    assert feats[1]["n_bytes"] == 5 * 3 * 3
    assert (feats[2]["width"], feats[2]["height"]) == (3, 4)
    assert feats[3]["n_bytes"] == 4  # fake payload length

    resized = {r["media_id"]: r for r in resize_images(df, 2, 2).collect()}
    got = decode_ppm(bytes(resized[1]["content"]))
    ys = (np.arange(2) * 3) // 2
    xs = (np.arange(2) * 5) // 2
    assert (got == ppm_px[ys][:, xs]).all()
    assert bytes(resized[3]["content"]).startswith(b"FAKEIMG|2|2|")
