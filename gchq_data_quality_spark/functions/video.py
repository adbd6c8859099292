"""Video-column plumbing: a REAL pure-numpy codec (Y4M / YUV4MPEG2, C444)
plus batched frame sampling and feature extraction.

Completes the multimodal trio (images: PPM, audio: WAV, video: Y4M) — each
modality has one dependency-free real codec so the Spark-side plumbing is
verifiable end-to-end in this sandbox; compressed codecs (mp4/webm) slot in
behind the same ``decode`` dispatch when ffmpeg/pyav exist.

Why Y4M is the right sandbox codec: frames are FIXED SIZE (C444: 3·w·h bytes
after a 6-byte FRAME marker), so sampling every Nth frame is a *seek*, not a
scan — the same property real pipelines get from keyframe indexes. The
sampler touches only the bytes of sampled frames.

Scale notes: feature extraction is mapInPandas over row batches (one video
per row); per-row failures degrade to NULL features + an error string,
never task failures. Video bytes never shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_FRAME_MARK = b"FRAME\n"


# ---------------------------------------------------------------------------
# Colour transforms (BT.601 full-range, pure numpy)
# ---------------------------------------------------------------------------

def _rgb_to_yuv(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = 128.0 + (b - y) * 0.564
    v = 128.0 + (r - y) * 0.713
    return np.clip(np.rint(np.stack([y, u, v], axis=-1)), 0, 255).astype(np.uint8)


def _yuv_to_rgb(yuv: np.ndarray) -> np.ndarray:
    y, u, v = (yuv[..., i].astype(np.float64) for i in range(3))
    r = y + 1.403 * (v - 128.0)
    b = y + 1.773 * (u - 128.0)
    g = (y - 0.299 * r - 0.114 * b) / 0.587
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Y4M container (C444)
# ---------------------------------------------------------------------------

def encode_y4m(frames: list[np.ndarray], fps: int = 30) -> bytes:
    """RGB (h, w, 3) uint8 frames -> YUV4MPEG2 C444 bytes."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w, c = frames[0].shape
    if c != 3:
        raise ValueError("frames must be (h, w, 3)")
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C444\n" % (w, h, fps)]
    for frame in frames:
        if frame.shape != (h, w, 3):
            raise ValueError("all frames must share one shape")
        yuv = _rgb_to_yuv(frame)
        out.append(_FRAME_MARK)
        out.append(np.ascontiguousarray(yuv.transpose(2, 0, 1)).tobytes())
    return b"".join(out)


def _parse_y4m_header(data: bytes) -> tuple[int, int, int, int]:
    """-> (w, h, fps, header_len). Raises ValueError on non-Y4M."""
    if data is None or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("missing Y4M header terminator")
    w = h = fps = None
    colorspace = "C420"
    for token in data[10:nl].split(b" "):
        if token.startswith(b"W"):
            w = int(token[1:])
        elif token.startswith(b"H"):
            h = int(token[1:])
        elif token.startswith(b"F"):
            fps = int(token[1:].split(b":")[0])
        elif token.startswith(b"C"):
            colorspace = token.decode()
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    if colorspace != "C444":
        raise ValueError(f"unsupported Y4M colorspace {colorspace} (C444 only)")
    return w, h, fps or 30, nl + 1


def y4m_frame_count(data: bytes) -> int:
    w, h, _, header_len = _parse_y4m_header(data)
    frame_bytes = len(_FRAME_MARK) + 3 * w * h
    return (len(data) - header_len) // frame_bytes


def sample_y4m_frames(
    data: bytes, every_n: int = 30, max_frames: int | None = None
) -> tuple[int, list[tuple[int, np.ndarray]]]:
    """-> (fps, [(frame_index, rgb_frame), ...]) for frames 0, N, 2N, ...

    Fixed-size C444 frames make this a seek per sample: only the sampled
    frames' bytes are ever touched or converted.
    """
    w, h, fps, header_len = _parse_y4m_header(data)
    plane = w * h
    frame_bytes = len(_FRAME_MARK) + 3 * plane
    n_frames = (len(data) - header_len) // frame_bytes
    sampled = []
    for k in range(0, n_frames, max(every_n, 1)):
        off = header_len + k * frame_bytes
        if data[off : off + len(_FRAME_MARK)] != _FRAME_MARK:
            raise ValueError(f"corrupt FRAME marker at frame {k}")
        body = np.frombuffer(data, dtype=np.uint8, count=3 * plane,
                             offset=off + len(_FRAME_MARK))
        yuv = body.reshape(3, h, w).transpose(1, 2, 0)
        sampled.append((k, _yuv_to_rgb(yuv)))
        if max_frames is not None and len(sampled) >= max_frames:
            break
    return fps, sampled


def decode_video_frames(
    data: bytes, fmt: str, every_n: int = 30, max_frames: int | None = None
) -> tuple[int, list[tuple[int, np.ndarray]]]:
    """Dispatch by container format. Y4M is real; compressed containers need
    external decoders absent from this sandbox and raise — the mapInPandas
    wrapper degrades those rows to NULL features, never a task failure."""
    if fmt and fmt.lower() in ("y4m", "yuv4mpeg2"):
        return sample_y4m_frames(data, every_n, max_frames)
    raise NotImplementedError(
        f"no decoder for video format {fmt!r} in this runtime (y4m supported; "
        "mp4/webm need ffmpeg/pyav)"
    )


# ---------------------------------------------------------------------------
# Deterministic synthetic clip (tests / fixtures)
# ---------------------------------------------------------------------------

def synth_y4m_bytes(
    n_frames: int = 12, w: int = 32, h: int = 24, fps: int = 6, motion: int = 3
) -> bytes:
    """A moving-gradient clip: frame k shifts a fixed gradient by k*motion
    pixels — deterministic, no RNG, visible inter-frame motion."""
    xs = np.arange(w, dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)[:, None]
    frames = []
    for k in range(n_frames):
        r = ((xs + k * motion) * 255 // max(w - 1, 1)) % 256
        g = (ys * 255 // max(h - 1, 1)) % 256
        # with motion=0 every frame is identical (a truly static clip)
        b = np.full((h, w), (k * 17 * min(motion, 1)) % 256, dtype=np.int64)
        frame = np.stack(
            [np.broadcast_to(r, (h, w)), np.broadcast_to(g, (h, w)), b], axis=-1
        ).astype(np.uint8)
        frames.append(frame)
    return encode_y4m(frames, fps=fps)


# ---------------------------------------------------------------------------
# Native structural check + batched feature extraction
# ---------------------------------------------------------------------------

def looks_like_y4m(bytes_col: Column) -> Column:
    """Cheap native magic check, NULL-safe False."""
    return F.coalesce(
        F.substring(bytes_col, 1, 9) == F.lit(b"YUV4MPEG2"), F.lit(False)
    )


VIDEO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.IntegerType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("n_sampled", T.IntegerType()),
        T.StructField("mean_brightness", T.DoubleType()),
        T.StructField("motion", T.DoubleType()),
        T.StructField("decode_error", T.StringType()),
    ]
)


def _features_for(raw: bytes, fmt: str, every_n: int) -> dict:
    try:
        fps, sampled = decode_video_frames(raw, fmt, every_n=every_n)
        if not sampled:
            raise ValueError("no frames")
        n_frames = y4m_frame_count(raw)
        lumas = [f.astype(np.float64).mean(axis=-1) for _, f in sampled]
        motion = (
            float(np.mean([np.abs(b - a).mean() for a, b in zip(lumas, lumas[1:], strict=False)]))
            if len(lumas) > 1
            else 0.0
        )
        return {
            "n_frames": n_frames,
            "fps": fps,
            "duration_sec": n_frames / fps,
            "n_sampled": len(sampled),
            "mean_brightness": float(np.mean([l.mean() for l in lumas])),
            "motion": motion,
            "decode_error": None,
        }
    except (ValueError, NotImplementedError, IndexError, OverflowError) as exc:
        return {
            "n_frames": None,
            "fps": None,
            "duration_sec": None,
            "n_sampled": None,
            "mean_brightness": None,
            "motion": None,
            "decode_error": f"{type(exc).__name__}: {exc}",
        }


def with_video_features(
    df: DataFrame,
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    every_n: int = 5,
) -> DataFrame:
    """Append VIDEO_FEATURES_SCHEMA columns, batched via mapInPandas."""
    out_schema = T.StructType(list(df.schema.fields) + list(VIDEO_FEATURES_SCHEMA.fields))
    names = [f.name for f in VIDEO_FEATURES_SCHEMA.fields]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _features_for(raw, fmt, every_n)
                for raw, fmt in zip(pdf[bytes_col], pdf[fmt_col], strict=True)
            ]
            fdf = pd.DataFrame(feats, columns=names, index=pdf.index)
            yield pd.concat([pdf, fdf], axis=1)

    return df.mapInPandas(extract, out_schema)
