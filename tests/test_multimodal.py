import pytest
from pyspark.sql import functions as F

from graphit_spark.functions import multimodal as M


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(0, 40).select(F.col("id").alias("doc_id"))


def test_attach_and_probe_metadata(spark, docs):
    imgs = M.attach_fake_images(docs)
    meta = M.image_metadata(imgs).collect()
    assert len(meta) == 40
    for r in meta:
        assert r["format"] == "fakeimg"
        assert r["width"] == 16 + r["doc_id"] % 48
        assert r["height"] == 16 + (r["doc_id"] * 7) % 48


def test_features_deterministic(spark, docs):
    imgs = M.attach_fake_images(docs)
    a = {r["doc_id"]: r["px_mean"] for r in M.image_features(imgs).collect()}
    b = {r["doc_id"]: r["px_mean"] for r in M.image_features(imgs).collect()}
    assert a == b
    assert all(0.0 <= v <= 255.0 for v in a.values())


def test_features_unknown_format_raises(spark):
    df = spark.createDataFrame([(1, b"REALJPEG....")], "doc_id long, image binary")
    with pytest.raises(Exception) as ei:
        M.image_features(df).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sample_fanout(spark):
    rows = [(i, M.fake_video(i, frames=6)) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, video binary")
    frames = M.frame_sample(df, every_n=2).collect()
    # 6 frames, every 2nd -> 3 per video
    assert len(frames) == 8 * 3
    f0 = [r for r in frames if r["doc_id"] == 3]
    assert sorted(r["frame_idx"] for r in f0) == [0, 2, 4]
    w, h = 8 + 3 % 24, 8 + 9 % 24
    assert all(len(bytes(r["frame"])) == w * h for r in f0)


def test_image_resize_roundtrips_through_metadata(spark):
    from graphit_spark.functions.multimodal import (
        attach_fake_images, image_metadata, image_resize, image_features,
    )

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    imgs = attach_fake_images(docs)
    resized = image_resize(imgs, 8, 10)
    meta = {r["doc_id"]: (r["width"], r["height"])
            for r in image_metadata(resized).collect()}
    assert all(v == (8, 10) for v in meta.values())
    # resized container still feeds the feature extractor
    feats = image_features(resized).collect()
    assert len(feats) == 6 and all(0 <= r["px_mean"] <= 255 for r in feats)


def test_image_resize_deterministic(spark):
    from graphit_spark.functions.multimodal import attach_fake_images, image_resize

    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    a = {r["doc_id"]: bytes(r["image"])
         for r in image_resize(attach_fake_images(docs), 5, 5).collect()}
    b = {r["doc_id"]: bytes(r["image"])
         for r in image_resize(attach_fake_images(docs), 5, 5).collect()}
    assert a == b


def test_audio_features(spark):
    from graphit_spark.functions.multimodal import attach_fake_audio, audio_features

    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    rows = audio_features(attach_fake_audio(docs)).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["sample_rate"] in (8000, 12000, 16000)
        assert r["duration_sec"] > 0 and 0 <= r["rms"] <= 255
