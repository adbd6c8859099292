"""Video-column plumbing: real Y4M codec, seek-based frame sampling, batched
feature extraction with per-row degradation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gchq_data_quality_spark.functions.images import psnr, sample_video_frames
from gchq_data_quality_spark.functions.video import (
    encode_y4m,
    looks_like_y4m,
    sample_y4m_frames,
    synth_y4m_bytes,
    with_video_features,
    y4m_frame_count,
)


def test_y4m_roundtrip_psnr():
    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, (24, 32, 3), dtype=np.uint8) for _ in range(4)]
    data = encode_y4m(frames, fps=10)
    fps, sampled = sample_y4m_frames(data, every_n=1)
    assert fps == 10
    assert [k for k, _ in sampled] == [0, 1, 2, 3]
    for (_, got), want in zip(sampled, frames, strict=True):
        # RGB->YUV->RGB integer round-trip: lossy only by rounding
        assert psnr(got, want) >= 40.0


def test_y4m_sampling_is_strided():
    data = synth_y4m_bytes(n_frames=12, motion=5)
    assert y4m_frame_count(data) == 12
    _, sampled = sample_y4m_frames(data, every_n=5)
    assert [k for k, _ in sampled] == [0, 5, 10]
    frames = sample_video_frames(data, "y4m", every_n=5)
    assert len(frames) == 3 and frames[0].shape == (24, 32, 3)


def test_y4m_rejects_garbage():
    with pytest.raises(ValueError):
        sample_y4m_frames(b"definitely not video")
    with pytest.raises(NotImplementedError):
        sample_video_frames(b"\x00" * 100, "mp4")


@pytest.fixture(scope="module")
def video_df(spark):
    rows = [
        (0, synth_y4m_bytes(n_frames=12, fps=6, motion=4), "y4m"),
        (1, synth_y4m_bytes(n_frames=6, fps=3, motion=0), "y4m"),   # static clip
        (2, b"corrupt video payload", "y4m"),
        (3, synth_y4m_bytes(n_frames=4), "mp4"),                     # undecodable fmt
        (4, None, "y4m"),
    ]
    return spark.createDataFrame(rows, "video_id long, bytes binary, fmt string")


def test_looks_like_y4m_native(spark, video_df):
    got = {
        r.video_id: r.ok
        for r in video_df.select(
            "video_id", looks_like_y4m(F.col("bytes")).alias("ok")
        ).collect()
    }
    assert got == {0: True, 1: True, 2: False, 3: True, 4: False}


def test_video_features_batched(spark, video_df):
    feats = {r.video_id: r for r in with_video_features(video_df, every_n=2).collect()}
    ok = feats[0]
    assert ok.decode_error is None
    assert ok.n_frames == 12 and ok.fps == 6
    assert ok.duration_sec == pytest.approx(2.0)
    assert ok.n_sampled == 6
    assert ok.motion > 1.0          # moving gradient has inter-frame change
    assert feats[1].motion == pytest.approx(0.0, abs=0.5)  # static clip
    for bad in (2, 3, 4):
        assert feats[bad].decode_error is not None
        assert feats[bad].n_frames is None
    assert "NotImplementedError" in feats[3].decode_error
