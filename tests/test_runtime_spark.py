"""Multimodal plumbing (Arrow batch shapes, stubbed decode) and the
checkpoint/resume ledger (kill-resume without recompute)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from jema_js_spark.operators.multimodal import (
    attach_media_metadata,
    decode_image_features,
    resize_images,
    sample_video_frames,
)
from jema_js_spark.runtime.checkpoint import CheckpointLedger, run_partitioned


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, bytes([i % 251] * (100 + i * 7))) for i in range(20)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    return attach_media_metadata(df)


def test_decode_features(media):
    out = decode_image_features(media).collect()
    assert len(out) == 20
    ok = [r for r in out if r["decode_error"] is None]
    assert len(ok) == 20
    for r in ok:
        assert r["width"] >= 32 and r["height"] >= 32
        assert 0 <= r["mean_r"] <= 255


def test_decode_determinism(media):
    a = {r["media_id"]: r["mean_r"] for r in decode_image_features(media).collect()}
    b = {r["media_id"]: r["mean_r"] for r in
         decode_image_features(media.repartition(7)).collect()}
    assert a == b


def test_decode_error_isolated(spark):
    # a row with no metadata must yield a per-row error, not a task crash
    df = spark.createDataFrame(
        [(1, b"xx")], "media_id long, payload binary"
    ).withColumn("kind", F.lit("image")).withColumn(
        "meta", F.lit(None).cast(
            "struct<width:int,height:int,channels:int,sample_rate:int,"
            "n_frames:int,duration_ms:int>"))
    out = decode_image_features(df).collect()
    assert len(out) == 1 and out[0]["decode_error"] is not None


def test_resize(media):
    out = resize_images(media, target=16).collect()
    assert len(out) == 20
    for r in out:
        assert r["meta"]["width"] == 16 and r["meta"]["height"] == 16
        assert len(bytes(r["payload"])) == 16 * 16 * 3


def test_video_frame_sampling(spark):
    df = spark.createDataFrame(
        [(1, 100, 4000), (2, 10, 400)],
        "media_id long, n_frames int, duration_ms int"
    ).select("media_id", F.struct(
        F.lit(64).alias("width"), F.lit(64).alias("height"),
        F.lit(3).alias("channels"), F.lit(None).cast("int").alias("sample_rate"),
        F.col("n_frames"), F.col("duration_ms")).alias("meta"))
    out = sample_video_frames(df, every_ms=1000).collect()
    per_id = {}
    for r in out:
        per_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    # 100 frames / 4000ms at 1 frame/s → every 25th frame
    assert per_id[1][:3] == [0, 25, 50]
    assert len(per_id[2]) >= 1


def test_checkpoint_resume(spark):
    df = spark.range(100).withColumn("day", F.pmod(F.col("id"), F.lit(5)))
    with tempfile.TemporaryDirectory() as tmp:
        ledger = CheckpointLedger(spark, f"{tmp}/ledger", run_id="r1")
        calls = []

        def work(part, key):
            calls.append(key)
            return {"n": part.count()}

        r1 = run_partitioned(spark, df, "day", ledger, work)
        assert len(calls) == 5 and all(m["n"] == 20 for m in r1.values())

        # simulated crash-resume: second run must skip all completed work
        calls.clear()
        r2 = run_partitioned(spark, df, "day", ledger, work)
        assert calls == []
        assert all(m.get("skipped") for m in r2.values())

        # partial ledger: wipe two keys under a new run id → only those rerun
        ledger2 = CheckpointLedger(spark, f"{tmp}/ledger", run_id="r2")
        ledger2.mark_done("0", {})
        ledger2.mark_done("1", {})
        calls.clear()
        run_partitioned(spark, df, "day", ledger2, work)
        assert sorted(calls) == ["2", "3", "4"]
