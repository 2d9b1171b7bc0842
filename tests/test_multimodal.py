"""Multimodal column plumbing: raw codec round-trip, feature extraction,
resize, frame sampling, codec stubs."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oco3_data_transformer_spark.operators import multimodal as M


def test_synthetic_corpus_deterministic(spark):
    a = {r.item_id: r.payload for r in M.synthetic_images(spark, 5).collect()}
    b = {r.item_id: r.payload for r in M.synthetic_images(spark, 5).collect()}
    assert a == b
    assert len(a[0]) == 8 * 6 * 3


def test_image_features_match_numpy(spark):
    imgs = M.synthetic_images(spark, 6)
    feats = {r.item_id: r for r in M.image_features(imgs).collect()}
    assert len(feats) == 6
    for item_id in range(6):
        rng = np.random.default_rng(item_id)
        arr = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
        assert feats[item_id].mean_intensity == pytest.approx(float(arr.mean()))
        assert feats[item_id].std_intensity == pytest.approx(float(arr.std()))
        assert feats[item_id].n_bytes == arr.size


def test_resize_nearest_neighbor(spark):
    imgs = M.synthetic_images(spark, 3, width=8, height=6)
    small = M.resize_images(imgs, out_w=4, out_h=3).collect()
    assert all((r.width, r.height) == (4, 3) for r in small)
    r0 = next(r for r in small if r.item_id == 0)
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    ys = (np.arange(3) * 6 // 3)
    xs = (np.arange(4) * 8 // 4)
    expect = arr[ys[:, None], xs[None, :], :]
    got = np.frombuffer(r0.payload, dtype=np.uint8).reshape(3, 4, 3)
    np.testing.assert_array_equal(got, expect)


def test_frame_sampling(spark):
    h, w, c, n_frames = 2, 3, 1, 7
    video = np.arange(n_frames * h * w * c, dtype=np.uint8)
    df = spark.createDataFrame(
        [
            {
                "item_id": 1, "codec": "raw", "width": w, "height": h,
                "channels": c, "n_frames": n_frames, "payload": video.tobytes(),
            }
        ]
    )
    frames = M.sample_frames(df, every_n=3).collect()
    assert sorted(r.frame_idx for r in frames) == [0, 3, 6]
    f3 = next(r for r in frames if r.frame_idx == 3)
    expect = video.reshape(n_frames, h, w, c)[3].tobytes()
    assert f3.payload == expect


def test_unknown_codec_raises(spark):
    df = M.synthetic_images(spark, 1).withColumn("codec", F.lit("jpeg"))
    with pytest.raises(Exception) as ei:
        M.image_features(df).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_audio_features_match_numpy(spark):
    clips = M.synthetic_audio(spark, 4, sample_rate=8000, seconds=0.25)
    feats = {r.item_id: r for r in M.audio_features(clips).collect()}
    raw = {r.item_id: r for r in clips.collect()}
    assert set(feats) == {0, 1, 2, 3}
    for item_id, r in feats.items():
        x = np.frombuffer(raw[item_id].payload, dtype="<i2").astype(np.float64) / 32768.0
        assert r.duration_s == pytest.approx(0.25)
        assert r.rms == pytest.approx(float(np.sqrt(np.mean(x**2))), rel=1e-9)
        assert r.peak == pytest.approx(float(np.abs(x).max()), rel=1e-9)
        # a ~0.5-amplitude sine has rms near 0.35
        assert 0.2 < r.rms < 0.5


def test_audio_unknown_codec_raises(spark):
    clips = M.synthetic_audio(spark, 1).withColumn("codec", F.lit("mp3"))
    with pytest.raises(Exception, match="mp3"):
        M.audio_features(clips).collect()
