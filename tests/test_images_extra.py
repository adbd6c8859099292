"""Multimodal plumbing: resize (real for PPM), feature extraction, stubs."""

from __future__ import annotations

import numpy as np
import pytest

from gchq_data_quality_spark.functions.images import (
    decode_ppm,
    encode_ppm,
    extract_image_features,
    resize_images,
    resize_nearest,
    sample_video_frames,
)
from gchq_data_quality_spark.sources.synthetic import generate_images_df

SF = "/root/testdata/sf0.001"


def test_resize_nearest_numpy():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 16, 3), dtype=np.uint8)
    out = resize_nearest(img, 8, 8)
    assert out.shape == (8, 8, 3)
    # corner pixels map to source corners under nearest-neighbour
    assert (out[0, 0] == img[0, 0]).all()


def test_resize_images_spark(spark):
    df = generate_images_df(spark, 20)
    out = resize_images(df, 8, 8)
    rows = out.collect()
    assert len(rows) == 20
    for row in rows:
        assert row.w == 8 and row.h == 8
        decoded = decode_ppm(bytes(row.bytes))
        assert decoded.shape == (8, 8, 3)


def test_resize_passthrough_on_unknown_codec(spark):
    df = generate_images_df(spark, 5).withColumn(
        "fmt", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("jpeg")
    )
    rows = resize_images(df, 8, 8).collect()
    # unsupported codec -> original bytes pass through, dims null
    assert all(r.w is None and r.h is None for r in rows)


def test_resize_and_features_survive_truncated_buffers(spark):
    """Struct-level garbage (truncated header/payload, not just an unknown
    codec) must degrade per-row in resize_images AND extract_image_features —
    the same expected-data-error tuple as the ahash loop (ADVICE r4)."""
    good = encode_ppm(np.zeros((4, 4, 3), dtype=np.uint8))
    rows = [
        ("ok", good, "ppm"),
        ("trunc_header", good[:5], "ppm"),          # IndexError in decode_ppm
        ("trunc_pixels", b"P6\n4 4\n255\n\x00", "ppm"),  # short frombuffer
        ("not_ppm", b"garbage", "ppm"),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")

    resized = {r.image_id: r for r in resize_images(df, 2, 2).collect()}
    assert resized["ok"].w == 2 and resized["ok"].h == 2
    for bad in ("trunc_header", "trunc_pixels", "not_ppm"):
        assert resized[bad].w is None  # passthrough, not task failure

    feats = {r.image_id: r for r in extract_image_features(df).collect()}
    assert feats["ok"].decode_ok
    for bad in ("trunc_header", "trunc_pixels", "not_ppm"):
        assert not feats[bad].decode_ok
        b = feats[bad].brightness
        assert b is None or b != b  # NULL or NaN, never a decoded value


def test_feature_extraction(spark):
    df = generate_images_df(spark, 10)
    feats = extract_image_features(df).collect()
    assert len(feats) == 10
    assert all(f.decode_ok for f in feats)
    for f in feats:
        assert 0.0 <= f.brightness <= 255.0
    # cross-check one image against a local decode
    row = df.filter("image_id = 'img00000000'").collect()[0]
    img = decode_ppm(bytes(row.bytes))
    expected = img.reshape(-1, 3).mean(axis=0).mean()
    got = [f for f in feats if f.image_id == "img00000000"][0].brightness
    assert got == pytest.approx(float(expected), abs=1e-6)


def test_video_compressed_formats_raise():
    # y4m is a real codec now (functions/video.py); compressed containers
    # still need ffmpeg/pyav and must fail loudly
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        sample_video_frames(b"xxxx", "mp4")


def test_ppm_encode_decode_roundtrip_sizes():
    for w, h in [(1, 1), (16, 24), (33, 7)]:
        img = np.arange(w * h * 3, dtype=np.uint64).astype(np.uint8).reshape(h, w, 3)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)


# ---------------------------------------------------------------------------
# Perceptual hash (aHash) + fingerprint near-dup pairs
# ---------------------------------------------------------------------------

def test_average_hash_invariances():
    from gchq_data_quality_spark.functions.images import average_hash

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    h = average_hash(img)
    assert -(1 << 63) <= h < (1 << 63)  # fits LongType
    # resize-invariant up to a few bits (same 8x8 cells sampled)
    from gchq_data_quality_spark.functions.images import resize_nearest

    small = resize_nearest(img, 32, 24)
    dh = bin((h ^ average_hash(small)) & ((1 << 64) - 1)).count("1")
    assert dh <= 8
    # a different image is far away
    other = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    dist = bin((h ^ average_hash(other)) & ((1 << 64) - 1)).count("1")
    assert dist > 16


def test_image_fingerprint_pairs_finds_planted_neardups(spark):
    from gchq_data_quality_spark.functions.dedup import fingerprint_pairs
    from gchq_data_quality_spark.functions.images import encode_ppm, with_image_ahash

    rows = []
    for i in range(30):
        rng = np.random.default_rng(100 + i)
        img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        rows.append((f"a{i:03d}", encode_ppm(img), "ppm"))
        if i < 3:  # planted noisy copies of the first three
            noisy = img.copy()
            noisy[0, 0, :] = 255 - noisy[0, 0, :]
            rows.append((f"b{i:03d}", encode_ppm(noisy), "ppm"))
    rows.append(("corrupt", b"not a ppm", "ppm"))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    hashed = with_image_ahash(df)
    assert hashed.filter(~hashed.decode_ok).count() == 1  # corrupt row flagged
    pairs = fingerprint_pairs(
        hashed.filter(hashed.decode_ok), "ahash", "image_id", max_hamming=6
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i in range(3):
        assert (f"a{i:03d}", f"b{i:03d}") in got
    # no pair between independent images
    assert all(a[1:] != b[1:] for a, b in got if a[0] == "a" and b[0] == "a")


def test_fingerprint_pairs_plan_has_no_join(spark):
    from gchq_data_quality_spark.functions.dedup import fingerprint_pairs

    df = spark.createDataFrame(
        [(i, i * 1234567) for i in range(10)], "id long, fp long"
    )
    plan = (
        fingerprint_pairs(df, "fp", "id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan


def test_assign_cells_rejects_empty_and_survives_nan(spark):
    import pytest as _pytest

    from gchq_data_quality_spark.functions.similarity import assign_cells

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    empty = spark.createDataFrame([], "cell long, centroid array<double>")
    with _pytest.raises(ValueError, match="empty"):
        assign_cells(df, empty)
    # a zero-norm centroid yields NaN cosine; it must never win the argmax
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0])], "cell long, centroid array<double>"
    )
    got = {r["vec_id"]: r["cell"] for r in assign_cells(df, cents).collect()}
    assert got[0] == 1  # matches the real centroid, not the NaN one


def test_with_image_ahash_honours_id_col_and_survives_corrupt_buffers(spark):
    """ADVICE r3 (low): the output id column must keep the caller's name and
    type, and a truncated PPM buffer (struct-level garbage, not just an
    unknown codec) must degrade to decode_ok=false — never a task failure."""
    import numpy as np

    from gchq_data_quality_spark.functions.images import encode_ppm, with_image_ahash

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    good = encode_ppm(img)
    rows = [
        (7, good, "ppm"),
        (8, good[:5], "ppm"),          # truncated header
        (9, b"P6\n8 8\n255\n\x00", "ppm"),  # truncated pixel payload
        (10, None if False else b"", "ppm"),  # empty buffer
    ]
    df = spark.createDataFrame(rows, "img long, bytes binary, fmt string")
    out = with_image_ahash(df, id_col="img")
    assert out.columns == ["img", "ahash", "decode_ok"]
    assert dict(out.dtypes)["img"] == "bigint"
    got = {r.img: r for r in out.collect()}
    assert got[7].decode_ok and got[7].ahash is not None
    for bad in (8, 9, 10):
        assert not got[bad].decode_ok and got[bad].ahash is None


def test_image_neardup_recall_is_pinned_to_rotation_count(spark):
    """VERDICT r3 Next #5: the driver query's planted-recall number must be
    explained, not magic. With 4 rotations recall is only GUARANTEED for
    hamming <= 3 (pigeonhole over the four disjoint 16-bit quadrants); the
    planted pair (112,113) sits at hamming 7 with differing bits in all
    four quadrants -> 16/17. With 8 rotations every 8-bit-aligned 16-bit
    window is probed and all 17 planted copies collide in at least one."""
    import __spark_entry__ as entry_mod
    from gchq_data_quality_spark.functions.dedup import fingerprint_pairs
    from gchq_data_quality_spark.functions.images import encode_ppm, with_image_ahash

    rows = []
    prev = None
    for i in range(120):
        rng = np.random.default_rng(i)
        if i % 7 == 1 and prev is not None:
            img = prev.copy()
            noise_at = rng.integers(0, img.shape[0], size=4)
            img[noise_at, 0, :] = 255 - img[noise_at, 0, :]
        else:
            img = rng.integers(0, 256, size=(24, 32, 3), dtype=np.uint8)
        prev = img
        rows.append((f"img{i:04d}", encode_ppm(img), "ppm"))
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    hashed = with_image_ahash(df).filter("decode_ok").localCheckpoint()

    def planted_found(n_rot: int) -> int:
        pairs = fingerprint_pairs(
            hashed, "ahash", "image_id", max_hamming=8, n_rot=n_rot
        )
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        return sum(
            1
            for i in range(120)
            if i % 7 == 1 and i > 0 and (f"img{i-1:04d}", f"img{i:04d}") in got
        )

    assert planted_found(4) == 16  # (112,113) straddles all 4 quadrants
    assert planted_found(8) == 17  # the driver query's configuration

    # and the driver query itself reports full recall
    row = entry_mod.queries()["image_neardup_pairs"](spark, SF).collect()[0]
    assert row["n_planted_found"] == 17
