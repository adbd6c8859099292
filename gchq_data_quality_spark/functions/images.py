"""Multimodal (image) column plumbing.

Images travel through the pipeline as opaque ``binary`` columns with typed
metadata (image_id, w, h, fmt, phash) — the engine never mutates the bytes
(the north rule's per-row invariant: decoded pixels allclose / PSNR >= 40 dB
and caption equality).

Real, dependency-free codec: PPM (P6) encode/decode in pure numpy — the
synthetic fixtures use it so pixel-level verification needs no native codec.
JPEG/PNG decode is STUBBED behind NotImplementedError (Pillow absent in this
environment); the Spark-side plumbing (schema, batch shape, mapInPandas
signature) is real and tested either way.

Metadata consistency is a native Column expression (no UDF): for PPM the
byte length is a closed-form function of (w, h).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Pure-numpy PPM (P6) codec
# ---------------------------------------------------------------------------

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_ppm expects (h, w, 3) uint8")
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """binary PPM (P6) -> (h, w, 3) uint8."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    parts = data.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    pixels = np.frombuffer(parts[3], dtype=np.uint8, count=w * h * 3)
    return pixels.reshape(h, w, 3)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    """Decode by format. PPM is real; compressed codecs are stubbed until an
    imaging library is available in the runtime."""
    if fmt == "ppm":
        return decode_ppm(data)
    raise NotImplementedError(
        f"decode for format {fmt!r} requires an imaging library (Pillow/cv2) "
        "not present in this environment; PPM is the supported codec here"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def ppm_expected_length(w: Column, h: Column) -> Column:
    """Exact byte length of a P6 PPM with 255 maxval: header + 3*w*h."""
    header = (
        F.lit(3)  # "P6\n"
        + F.length(w.cast("string"))
        + F.lit(1)
        + F.length(h.cast("string"))
        + F.lit(5)  # "\n255\n"
    )
    return header + 3 * w * h


def metadata_consistent(
    bytes_col: Column, w: Column, h: Column, fmt: Column
) -> Column:
    """True where the binary payload is consistent with its metadata.

    Native expression — for ppm an exact length check + magic bytes; for
    other formats only non-emptiness (decode stubs can't verify)."""
    length = F.length(bytes_col)
    ppm_ok = (length == ppm_expected_length(w, h)) & (
        bytes_col.substr(1, 2) == F.lit(b"P6")
    )
    return F.when(fmt == "ppm", ppm_ok).otherwise(length > 0)


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resize in pure numpy (index striding, no deps)."""
    h, w, _ = pixels.shape
    rows = (np.arange(out_h) * h // out_h).astype(np.int64)
    cols = (np.arange(out_w) * w // out_w).astype(np.int64)
    return pixels[rows][:, cols]


def sample_video_frames(data: bytes, fmt: str, every_n: int = 30) -> list[np.ndarray]:
    """Frame sampling for video payloads.

    Real for Y4M (pure-numpy seekable codec, functions/video.py); compressed
    containers (mp4/webm) raise NotImplementedError until ffmpeg/pyav exist
    in the runtime — callers fail loudly rather than silently producing
    garbage.
    """
    from gchq_data_quality_spark.functions.video import decode_video_frames

    _, sampled = decode_video_frames(data, fmt, every_n=every_n)
    return [frame for _, frame in sampled]


RESIZE_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def resize_images(
    df: DataFrame, out_w: int, out_h: int,
    id_col: str = "image_id", bytes_col: str = "bytes", fmt_col: str = "fmt",
) -> DataFrame:
    """Batched image resize via mapInPandas (PPM real, other codecs skipped).

    Undecodable/unsupported rows pass through untouched (a transform in a
    10^12-row pipeline must degrade per-row, never fail the task).
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        for pdf in batches:
            out_bytes, out_ws, out_hs = [], [], []
            for raw, fmt in zip(pdf[bytes_col], pdf[fmt_col], strict=True):
                try:
                    img = decode_image(bytes(raw), fmt)
                    resized = resize_nearest(img, out_w, out_h)
                    out_bytes.append(encode_ppm(resized))
                    out_ws.append(out_w)
                    out_hs.append(out_h)
                except (
                    NotImplementedError,
                    ValueError,
                    _struct.error,
                    IndexError,
                    OverflowError,
                ):
                    out_bytes.append(bytes(raw))
                    out_ws.append(None)
                    out_hs.append(None)
            yield pd.DataFrame(
                {
                    "image_id": pdf[id_col],
                    "bytes": out_bytes,
                    "w": out_ws,
                    "h": out_hs,
                    "fmt": pdf[fmt_col],
                }
            )

    # Only the columns the UDF reads cross the Arrow boundary; original
    # dims (w/h) are not required on the input — output dims are the
    # requested ones (or NULL on passthrough).
    return df.select(id_col, bytes_col, fmt_col).mapInPandas(
        _resize, schema=RESIZE_SCHEMA
    )


def average_hash(pixels: np.ndarray) -> int:
    """64-bit perceptual aHash: 8x8 nearest-neighbour downscale of the
    grayscale image, one bit per cell = (cell >= mean). Robust to resizing
    and small noise; near-duplicate images differ in a few bits (compare
    with hamming distance). Returned as a SIGNED 64-bit int so it round-
    trips a Spark LongType column exactly."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    rows = (np.arange(8) * h // 8).astype(np.int64)
    cols = (np.arange(8) * w // 8).astype(np.int64)
    small = gray[rows][:, cols]
    bits = (small >= small.mean()).flatten()
    value = 0
    for b in bits:
        value = (value << 1) | int(b)
    # two's-complement into int64 range
    return value - (1 << 64) if value >= (1 << 63) else value


def difference_hash(pixels: np.ndarray) -> int:
    """64-bit perceptual dHash: 9x8 grayscale downscale, one bit per cell
    = (left < right neighbour) — a horizontal-gradient signature. A second
    INDEPENDENT hash family to aHash (gradient vs global-mean): two
    near-dup images colliding on both families is far stronger evidence
    than either alone, and dHash is insensitive to global brightness
    shifts that flip aHash bits. Same signed-64 convention as
    ``average_hash`` so it rides the same LongType columns and
    ``dedup.fingerprint_pairs`` engine."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    rows = (np.arange(8) * h // 8).astype(np.int64)
    cols = (np.arange(9) * w // 9).astype(np.int64)
    small = gray[rows][:, cols]
    bits = (small[:, :-1] < small[:, 1:]).flatten()
    value = 0
    for b in bits:
        value = (value << 1) | int(b)
    return value - (1 << 64) if value >= (1 << 63) else value


_HASH_METHODS = {"ahash": average_hash, "dhash": difference_hash}


def with_image_ahash(
    df: DataFrame, id_col: str = "image_id", bytes_col: str = "bytes",
    fmt_col: str = "fmt", method: str = "ahash",
) -> DataFrame:
    """(<id_col>, ahash, decode_ok) via batched mapInPandas decode.

    Feed the result to ``dedup.fingerprint_pairs`` for perceptual near-dup
    pairs — the image-modality analogue of text simhash, sharing its
    rotation-bucket LSH verification stage. ``method`` picks the hash
    family ("ahash" global-mean bits, "dhash" horizontal-gradient bits);
    the output column is named ``ahash`` either way so downstream engine
    calls don't branch. The id column keeps the caller's name and type (a
    StructType, not a DDL string, so names with backticks or other special
    characters survive — ADVICE r4). Undecodable or malformed rows
    (truncated buffers included) get NULL ahash / decode_ok=false, never a
    task failure — but only for the EXPECTED data-error exceptions;
    programming errors still surface.
    """
    if method not in _HASH_METHODS:
        raise ValueError(f"unknown hash method {method!r}")
    hash_fn = _HASH_METHODS[method]
    from pyspark.sql.types import BooleanType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("ahash", LongType()),
            StructField("decode_ok", BooleanType()),
        ]
    )

    def _hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        for pdf in batches:
            n = len(pdf)
            hashes = np.zeros(n, dtype=object)
            ok = np.zeros(n, dtype=bool)
            for i, (raw, fmt) in enumerate(
                zip(pdf[bytes_col], pdf[fmt_col], strict=True)
            ):
                try:
                    img = decode_image(bytes(raw), fmt)
                    hashes[i] = hash_fn(img)
                except (
                    NotImplementedError,  # stubbed codec
                    ValueError,           # malformed header / reshape
                    _struct.error,        # truncated binary fields
                    IndexError,           # short split/parts
                    OverflowError,        # absurd dims from corrupt header
                ):
                    # data errors mean "not decodable", not "fail the task";
                    # genuine programming errors (NameError/TypeError) are
                    # NOT swallowed (ADVICE r4)
                    hashes[i] = None
                    continue
                ok[i] = True
            yield pd.DataFrame(
                {id_col: pdf[id_col], "ahash": hashes, "decode_ok": ok}
            )

    return df.select(id_col, bytes_col, fmt_col).mapInPandas(
        _hashes, schema=schema
    )


# ---------------------------------------------------------------------------
# Spark-side feature extraction (mapInPandas, Arrow batches)
# ---------------------------------------------------------------------------

IMAGE_FEATURE_SCHEMA = (
    "image_id string, mean_r double, mean_g double, mean_b double, "
    "brightness double, decode_ok boolean"
)


def extract_image_features(
    df: DataFrame, id_col: str = "image_id", bytes_col: str = "bytes", fmt_col: str = "fmt"
) -> DataFrame:
    """Per-image channel means via mapInPandas (batched decode).

    The decode itself is the PPM numpy path (stub for other codecs -> NULL
    features with decode_ok=false, never a task failure). Partition-parallel;
    each batch decodes into one numpy loop — the pattern scales to any
    decoder by swapping decode_image.
    """

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct as _struct

        for pdf in batches:
            out = {
                "image_id": pdf[id_col],
                "mean_r": np.full(len(pdf), np.nan),
                "mean_g": np.full(len(pdf), np.nan),
                "mean_b": np.full(len(pdf), np.nan),
                "brightness": np.full(len(pdf), np.nan),
                "decode_ok": np.zeros(len(pdf), dtype=bool),
            }
            for i, (raw, fmt) in enumerate(zip(pdf[bytes_col], pdf[fmt_col], strict=True)):
                try:
                    img = decode_image(bytes(raw), fmt)
                except (
                    NotImplementedError,
                    ValueError,
                    _struct.error,
                    IndexError,
                    OverflowError,
                ):
                    continue
                means = img.reshape(-1, 3).mean(axis=0)
                out["mean_r"][i] = means[0]
                out["mean_g"][i] = means[1]
                out["mean_b"][i] = means[2]
                out["brightness"][i] = float(means.mean())
                out["decode_ok"][i] = True
            yield pd.DataFrame(out)

    return df.select(id_col, bytes_col, fmt_col).mapInPandas(
        _features, schema=IMAGE_FEATURE_SCHEMA
    )


# ---------------------------------------------------------------------------
# Decode-free metadata quality flags (native Columns)
# ---------------------------------------------------------------------------

def image_size_flags(
    w: Column,
    h: Column,
    min_side: int = 64,
    max_aspect: float = 3.0,
    max_pixels: int = 89_478_485,  # PIL's decompression-bomb default
) -> Column:
    """LAION-style image curation gates from METADATA ALONE — no decode.

    Returns a struct of booleans: ``too_small`` (either side under
    min_side), ``extreme_aspect`` (long/short side ratio over max_aspect),
    ``too_large`` (pixel count over max_pixels — the decompression-bomb
    gate), and ``ok`` (none of the above, both dims present and positive).
    At 100 TB the whole gate is a pruned scan of two int columns + codegen
    comparisons; the binary payload is never read for rows dropped here,
    which is exactly why size gates go FIRST in an image pipeline. NULL or
    non-positive dims -> ok=false with all specific flags false (unknown,
    not proven bad)."""
    valid = w.isNotNull() & h.isNotNull() & (w > 0) & (h > 0)
    long_side = F.greatest(w, h).cast("double")
    short_side = F.least(w, h).cast("double")
    too_small = valid & (F.least(w, h) < min_side)
    extreme = valid & (long_side / short_side > max_aspect)
    too_large = valid & (w.cast("long") * h > max_pixels)
    ok = valid & ~too_small & ~extreme & ~too_large
    return F.struct(
        F.coalesce(too_small, F.lit(False)).alias("too_small"),
        F.coalesce(extreme, F.lit(False)).alias("extreme_aspect"),
        F.coalesce(too_large, F.lit(False)).alias("too_large"),
        F.coalesce(ok, F.lit(False)).alias("ok"),
    )
