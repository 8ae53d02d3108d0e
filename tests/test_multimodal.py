"""Multimodal plumbing tests: schema, batch shapes, fan-out, error isolation.

The decode kernels are stubs (no PIL/ffmpeg in this container,
engine/multimodal.py); what's tested is the real Spark-side machinery."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.multimodal import frame_sample, image_features, resize_plan, synthetic_media


def test_image_features_schema_and_errors(spark):
    media = synthetic_media(spark, 30)
    out = image_features(media)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,channels:int,mean_luma:double,error:string>"
    )
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 30
    for mid, r in rows.items():
        if mid % 3 == 2:  # video rows -> error isolated, not dropped
            assert r["error"].startswith("not an image")
            assert r["mean_luma"] is None
        else:
            assert r["error"] is None and r["mean_luma"] is not None


def test_image_features_deterministic(spark):
    media = synthetic_media(spark, 30)
    a = sorted(map(tuple, image_features(media).collect()))
    b = sorted(map(tuple, image_features(media.repartition(7)).collect()))
    assert a == b


def test_frame_sample_fanout(spark):
    media = synthetic_media(spark, 30)
    frames = frame_sample(media, every_ms=500)
    per = {r["media_id"]: r["n"] for r in frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    vids = {r["media_id"]: r["duration_ms"] for r in media.where(F.col("mime") == "video/mp4").collect()}
    assert set(per) == set(vids)
    for mid, n in per.items():
        assert n == -(-vids[mid] // 500)  # ceil(duration/step)
    # frame payloads are binary and non-null
    assert frames.where(F.col("frame").isNull()).count() == 0


def test_resize_plan(spark):
    media = synthetic_media(spark, 20)
    plans = {r["media_id"]: r for r in resize_plan(media, max_side=100).collect()}
    for mid, r in plans.items():
        assert max(r["target_w"], r["target_h"]) <= 101  # rounding tolerance
        if max(r["width"], r["height"]) <= 100:
            assert (r["target_w"], r["target_h"]) == (r["width"], r["height"])
