"""Multimodal pipeline tests: RAW1 container round-trip, resize math,
features, frame sampling, and end-to-end Spark stage plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.multimodal import (
    decode_media,
    generate_media,
    image_resize_stage,
    media_features_stage,
    pack_audio,
    pack_image,
    pack_video,
    video_frame_sample_stage,
)


def test_raw1_roundtrip():
    img = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    kind, arr, meta = decode_media(pack_image(img))
    assert kind == "image" and np.array_equal(arr, img)
    assert meta == {"height": 5, "width": 4, "channels": 3}

    pcm = (np.sin(np.arange(100)) * 1000).astype(np.int16)
    kind, arr, meta = decode_media(pack_audio(pcm, 8000))
    assert kind == "audio" and np.array_equal(arr, pcm)
    assert meta["sample_rate"] == 8000

    vid = np.arange(3 * 2 * 2 * 3, dtype=np.uint8).reshape(3, 2, 2, 3)
    kind, arr, meta = decode_media(pack_video(vid))
    assert kind == "video" and np.array_equal(arr, vid)


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG\r\n\x1a\nnotreally")


def test_generate_media_schema_and_counts(spark, sf_dir):
    media = generate_media(spark, sf_dir)
    media.cache()
    counts = {r["kind"]: r["n"] for r in media.groupBy("kind").agg(F.count("*").alias("n")).collect()}
    assert counts["image"] == 500
    assert counts["audio"] == len([i for i in range(500) if i % 3 == 0])
    assert counts["video"] == len([i for i in range(500) if i % 5 == 0])
    row = media.filter("kind = 'image'").orderBy("media_id").first()
    assert row["mime"] == "image/raw1" and row["channels"] == 3
    media.unpersist()


def test_resize_stage(spark, sf_dir):
    media = generate_media(spark, sf_dir).filter("kind = 'image'").limit(10)
    out = image_resize_stage(media, 4, 4).collect()
    for r in out:
        kind, arr, _ = decode_media(bytes(r["resized"]))
        assert arr.shape == (4, 4, 3)
    # deterministic: nearest-neighbor picks exact source pixels
    src = decode_media(bytes(out[0]["content"]))[1]
    dst = decode_media(bytes(out[0]["resized"]))[1]
    h, w, _ = src.shape
    ys = (np.arange(4) * h // 4).clip(0, h - 1)
    xs = (np.arange(4) * w // 4).clip(0, w - 1)
    assert np.array_equal(dst, src[ys][:, xs])


def test_features_stage(spark, sf_dir):
    media = generate_media(spark, sf_dir).limit(30)
    out = media_features_stage(media).collect()
    for r in out:
        assert r["phash"] is not None
        assert r["embedding"] is not None and len(r["embedding"]) == 16
        if r["kind"] == "image":
            assert len(r["feat_mean"]) == 3
    # embeddings feed the similarity operators directly
    df = media_features_stage(generate_media(spark, sf_dir).limit(50)).select(
        "media_id", "embedding"
    )
    from crawl4ai_spark.operators.similarity import cosine_topk

    q = [float(x) for x in df.first()["embedding"]]
    top = cosine_topk(df, "embedding", q, k=5, id_cols=["media_id"]).collect()
    assert len(top) == 5 and abs(top[0]["cosine_sim"] - 1.0) < 1e-9


def test_video_frame_sampling(spark, sf_dir):
    media = generate_media(spark, sf_dir).filter("kind = 'video'").limit(5)
    frames = video_frame_sample_stage(media, every_k=2).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in by_media.values():
        assert sorted(idxs) == [0, 2, 4]  # 6 frames sampled every 2
        kind, arr, _ = decode_media(bytes(frames[0]["frame"]))
        assert kind == "image" and arr.shape == (4, 4, 3)


def test_corrupt_and_empty_media_degrade_to_null(spark):
    """Truncated RAW1 payloads and zero-length audio must yield null
    rows, never a task-killing exception (struct.error / IndexError
    used to escape the NotImplementedError-only catch)."""
    import numpy as np

    from crawl4ai_spark.functions.multimodal import (
        MediaDecodeError,
        decode_media,
        image_resize_stage,
        media_features_stage,
        pack_audio,
        pack_image,
    )

    truncated = pack_image(
        np.zeros((4, 4, 3), dtype=np.uint8)
    )[:10]  # header cut mid-struct
    empty_audio = pack_audio(np.array([], dtype=np.int16), 16000)
    good = pack_image(np.full((4, 4, 3), 7, dtype=np.uint8))

    import pytest as _pytest

    with _pytest.raises(MediaDecodeError):
        decode_media(truncated)

    df = spark.createDataFrame(
        [(1, bytearray(truncated)), (2, bytearray(empty_audio)),
         (3, bytearray(good))],
        "media_id long, content binary",
    )
    feats = media_features_stage(df).toPandas().sort_values("media_id")
    assert feats.iloc[0]["feat_mean"] is None  # truncated -> null
    assert feats.iloc[1]["feat_mean"] is None  # empty audio -> null
    assert feats.iloc[2]["feat_mean"] is not None
    resized = image_resize_stage(df, 2, 2).toPandas().sort_values("media_id")
    assert resized.iloc[0]["resized"] is None
    assert resized.iloc[2]["resized"] is not None
