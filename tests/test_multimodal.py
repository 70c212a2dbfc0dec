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
