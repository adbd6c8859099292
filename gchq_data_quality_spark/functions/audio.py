"""Audio-column plumbing: opaque WAV bytes + typed metadata + batched
feature extraction.

Mirrors the image-column design (functions/images.py): the audio payload is
an opaque ``binary`` column; cheap structural checks stay native Column
expressions (RIFF magic, declared-vs-actual consistency), and the expensive
decode runs batched in ``mapInPandas`` — one Arrow batch in, one out, NO
per-row Python UDFs.

WAV/PCM16 is decodable with numpy alone (RIFF header walk + frombuffer), so
this module is a REAL codec, not a stub — the same role PPM plays for images
in this sandbox (no Pillow/ffmpeg; other codecs would slot into
``decode_audio`` behind the same interface).

Scale notes: feature extraction is embarrassingly parallel over row batches;
the bytes column never shuffles (derive features, drop or keep payload as the
caller chooses). Malformed rows degrade to NULL features, never task
failures — the quality-filter pipeline's rule chassis then counts them.
"""

from __future__ import annotations

import io
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# Deterministic synthetic WAV (tests / fixtures)
# ---------------------------------------------------------------------------

def synth_wav_bytes(
    freq_hz: float = 440.0,
    seconds: float = 0.25,
    sample_rate: int = 8000,
    channels: int = 1,
    amplitude: float = 0.5,
) -> bytes:
    """A deterministic PCM16 sine-wave WAV (pure numpy, no audio libs)."""
    n = int(seconds * sample_rate)
    t = np.arange(n, dtype=np.float64) / sample_rate
    wave = (amplitude * np.sin(2 * np.pi * freq_hz * t) * 32767.0).astype(np.int16)
    if channels > 1:
        wave = np.repeat(wave[:, None], channels, axis=1).reshape(-1)
    data = wave.tobytes()
    byte_rate = sample_rate * channels * 2
    header = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    return header + fmt + b"data" + struct.pack("<I", len(data)) + data


# ---------------------------------------------------------------------------
# Decode (worker-side, batched)
# ---------------------------------------------------------------------------

def decode_wav(raw: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, channels, int16 samples [n_frames, channels]).

    Walks RIFF chunks; raises ValueError on anything that is not PCM16 WAV.
    """
    if raw is None or len(raw) < 44 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    buf = io.BytesIO(raw)
    buf.seek(12)
    sample_rate = channels = bits = None
    data = None
    while True:
        head = buf.read(8)
        if len(head) < 8:
            break
        cid, size = head[:4], struct.unpack("<I", head[4:])[0]
        body = buf.read(size)
        if cid == b"fmt ":
            fmt_code, channels, sample_rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_code != 1 or bits != 16:
                raise ValueError(f"unsupported WAV format code={fmt_code} bits={bits}")
        elif cid == b"data":
            data = body
        if size % 2:
            buf.read(1)
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    frames = samples.reshape(-1, channels) if channels else samples[:, None]
    return sample_rate, channels, frames


def decode_audio(raw: bytes, fmt: str) -> tuple[int, int, np.ndarray]:
    """Dispatch by container format. WAV is real; compressed codecs (mp3,
    flac, ogg) need external decoders absent from this sandbox and raise —
    the mapInPandas wrapper degrades those rows to NULL features, never a
    task failure (same policy as images.decode_image for non-PPM codecs)."""
    if fmt and fmt.lower() in ("wav", "wave"):
        return decode_wav(raw)
    raise NotImplementedError(f"no decoder for audio format {fmt!r} in this runtime")


# ---------------------------------------------------------------------------
# Native structural checks (no decode, no Python)
# ---------------------------------------------------------------------------

def looks_like_wav(bytes_col: Column) -> Column:
    """Cheap native magic check: RIFF....WAVE header, NULL-safe False."""
    return F.coalesce(
        (F.substring(bytes_col, 1, 4) == F.lit(b"RIFF"))
        & (F.substring(bytes_col, 9, 4) == F.lit(b"WAVE")),
        F.lit(False),
    )


def audio_metadata_consistent(
    bytes_col: Column, sample_rate_col: Column, channels_col: Column
) -> Column:
    """Declared metadata matches the fmt chunk — as a NATIVE expression.

    For canonical PCM WAV the fmt chunk starts at byte 13: channels at
    offset 23 (little-endian uint16) and sample rate at 25 (uint32). We
    extract both with substring + byte arithmetic — no UDF, so this rides in
    whole-stage codegen like images.metadata_consistent does for PPM.
    """
    def _le_uint(col: Column, pos: int, nbytes: int) -> Column:
        total = F.lit(0).cast("long")
        for i in range(nbytes):
            byte = F.conv(F.hex(F.substring(col, pos + i, 1)), 16, 10).cast("long")
            total = total + F.shiftleft(byte, 8 * i)
        return total

    declared_ok = (
        looks_like_wav(bytes_col)
        & (F.substring(bytes_col, 13, 4) == F.lit(b"fmt "))
        & (_le_uint(bytes_col, 23, 2) == channels_col.cast("long"))
        & (_le_uint(bytes_col, 25, 4) == sample_rate_col.cast("long"))
    )
    return F.coalesce(declared_ok, F.lit(False))


# ---------------------------------------------------------------------------
# Batched feature extraction (mapInPandas)
# ---------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("decoded_sample_rate", T.IntegerType()),
        T.StructField("decoded_channels", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
        T.StructField("clipping_ratio", T.DoubleType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def _features_for(raw: bytes, fmt: str) -> dict:
    try:
        sr, ch, frames = decode_audio(raw, fmt)
        mono = frames.astype(np.float64).mean(axis=1) / 32768.0
        n = len(mono)
        if n == 0:
            raise ValueError("empty audio payload")
        crossings = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        return {
            "duration_sec": n / sr,
            "decoded_sample_rate": sr,
            "decoded_channels": ch,
            "rms": float(np.sqrt(np.mean(mono**2))),
            "zero_crossing_rate": crossings / max(n - 1, 1),
            "clipping_ratio": float(np.mean(np.abs(mono) >= 32766 / 32768)),
            "decode_error": None,
        }
    except (
        ValueError, NotImplementedError, struct.error, IndexError, OverflowError
    ) as exc:
        return {
            "duration_sec": None,
            "decoded_sample_rate": None,
            "decoded_channels": None,
            "rms": None,
            "zero_crossing_rate": None,
            "clipping_ratio": None,
            "decode_error": f"{type(exc).__name__}: {exc}",
        }


def with_audio_features(
    df: DataFrame, bytes_col: str = "bytes", fmt_col: str = "fmt"
) -> DataFrame:
    """Append the AUDIO_FEATURES_SCHEMA columns, batched via mapInPandas.

    Per-row failures become NULL features + a ``decode_error`` string; the
    quality-filter rules then treat undecodable audio like any other defect.
    """
    out_schema = T.StructType(list(df.schema.fields) + list(AUDIO_FEATURES_SCHEMA.fields))
    feature_names = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _features_for(raw, fmt)
                for raw, fmt in zip(pdf[bytes_col], pdf[fmt_col], strict=True)
            ]
            fdf = pd.DataFrame(feats, columns=feature_names, index=pdf.index)
            yield pd.concat([pdf, fdf], axis=1)

    return df.mapInPandas(extract, out_schema)
