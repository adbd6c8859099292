"""Audio-column plumbing: real WAV codec, native metadata checks, batched
feature extraction with per-row degradation (never task failure)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gchq_data_quality_spark.functions.audio import (
    audio_metadata_consistent,
    decode_wav,
    looks_like_wav,
    synth_wav_bytes,
    with_audio_features,
)


def test_wav_roundtrip_decode():
    raw = synth_wav_bytes(freq_hz=440, seconds=0.5, sample_rate=8000, channels=2)
    sr, ch, frames = decode_wav(raw)
    assert (sr, ch) == (8000, 2)
    assert frames.shape == (4000, 2)
    # a sine at half amplitude: peak ~0.5*32767
    assert 15000 < np.abs(frames).max() <= 16384


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"not audio at all, definitely not RIFF....")


@pytest.fixture(scope="module")
def audio_df(spark):
    rows = [
        (0, synth_wav_bytes(440, 0.25, 8000), 8000, 1, "wav"),
        (1, synth_wav_bytes(880, 0.50, 16000), 16000, 1, "wav"),
        (2, b"corrupt payload", 8000, 1, "wav"),
        (3, synth_wav_bytes(220, 0.25, 8000), 44100, 1, "wav"),  # wrong declared sr
        (4, synth_wav_bytes(330, 0.25, 8000), 8000, 1, "mp3"),   # undecodable fmt
        (5, None, 8000, 1, "wav"),
    ]
    return spark.createDataFrame(
        rows, "audio_id long, bytes binary, sample_rate int, channels int, fmt string"
    )


def test_looks_like_wav_native(spark, audio_df):
    got = {
        r.audio_id: r.ok
        for r in audio_df.select(
            "audio_id", looks_like_wav(F.col("bytes")).alias("ok")
        ).collect()
    }
    assert got == {0: True, 1: True, 2: False, 3: True, 4: True, 5: False}


def test_audio_metadata_consistent_native(spark, audio_df):
    got = {
        r.audio_id: r.ok
        for r in audio_df.select(
            "audio_id",
            audio_metadata_consistent(
                F.col("bytes"), F.col("sample_rate"), F.col("channels")
            ).alias("ok"),
        ).collect()
    }
    assert got[0] is True and got[1] is True
    assert got[2] is False  # corrupt
    assert got[3] is False  # declared 44100 vs actual 8000
    assert got[5] is False  # NULL payload


def test_metadata_check_stays_native(spark, audio_df):
    plan = (
        audio_df.select(
            audio_metadata_consistent(
                F.col("bytes"), F.col("sample_rate"), F.col("channels")
            )
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_audio_features_batched(spark, audio_df):
    feats = {r.audio_id: r for r in with_audio_features(audio_df).collect()}
    ok = feats[0]
    assert ok.decode_error is None
    assert ok.duration_sec == pytest.approx(0.25, abs=1e-6)
    assert ok.decoded_sample_rate == 8000
    # half-amplitude sine RMS = 0.5/sqrt(2) ~ 0.3536
    assert ok.rms == pytest.approx(0.3536, abs=0.01)
    # 440 Hz sine crosses zero ~2*440 times/sec
    assert ok.zero_crossing_rate * 8000 == pytest.approx(880, rel=0.02)
    assert ok.clipping_ratio == 0.0

    assert feats[1].duration_sec == pytest.approx(0.5, abs=1e-6)
    # corrupt / unsupported / NULL rows degrade, don't fail the task
    for bad in (2, 4, 5):
        assert feats[bad].decode_error is not None
        assert feats[bad].duration_sec is None
    assert "NotImplementedError" in feats[4].decode_error
