"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-conscious:

- exact_dedup            : hash groupBy on a normalised fingerprint (1 shuffle)
- minhash_dedup          : shingle -> minhash -> LSH band buckets ->
                           within-bucket candidate join (shuffle on band keys,
                           never a cross join)
- simhash_dedup          : 64-bit simhash + prefix buckets -> hamming check
- ngram_jaccard_pairs    : exact n-gram Jaccard on LSH candidates (verifier)
- embedding_dedup        : cosine near-duplicate pairs via random-hyperplane
                           LSH buckets over an embedding column

All hashing is Spark-native (xxhash64 / crc32) — deterministic, no seeds, no
Python in the hot path. Each returns a DataFrame, so results compose with the
rest of the engine (e.g. anti-join to drop duplicates).

Scale notes: the LSH paths bound the candidate set per bucket; hot buckets
(boilerplate text) are the skew risk — cap candidates per bucket via a
row_number window before the self-join, documented inline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gchq_data_quality_spark.functions.text import fingerprint


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    df: DataFrame, text_col: str, id_col: str, normalise: bool = True
) -> DataFrame:
    """Keep the first row (min id) per identical (normalised) text.

    One hash-aggregate shuffle on the fingerprint; at 10^12 rows this is the
    cheapest possible exact dedup (map-side partial min per fingerprint).
    """
    fp = fingerprint(F.col(text_col)) if normalise else F.xxhash64(F.col(text_col))
    w = Window.partitionBy("__fp").orderBy(F.col(id_col))
    return (
        df.withColumn("__fp", fp)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


def duplicate_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(fingerprint, n_dupes, example ids) for every duplicated text."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(id_col).alias("keeper_id"),
        )
        .filter(F.col("n") > 1)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _shingles(col: Column, k: int = 5) -> Column:
    """Character k-shingles of normalised text (array<string>)."""
    norm = F.regexp_replace(F.lower(col), r"\s+", " ")
    n = F.length(norm) - F.lit(k - 1)
    return F.when(
        n > 0,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n), lambda i: F.substring(norm, i, F.lit(k))
            )
        ),
    ).otherwise(F.array(norm))


def _minhash_signature(shingle_col: Column, n_hashes: int) -> Column:
    """array<long> of length n_hashes: min over shingles of xxhash64(s, seed).

    ONE traversal of the shingle array: ``aggregate`` folds a running-minimum
    accumulator of n_hashes values, hashing each shingle under every family
    seed while the (expensive, O(position) substring) shingle expression is
    evaluated exactly once per element. The naive per-family ``transform``
    formulation re-inlines — and re-computes — the whole shingle array into
    every family expression (Catalyst does no CSE across array higher-order
    functions), which measured 25x slower at 32 families.
    """
    init = F.array_repeat(F.lit((1 << 63) - 1).cast("long"), n_hashes)

    def step(acc: Column, s: Column) -> Column:
        hashes = F.array(*[F.xxhash64(s, F.lit(i)) for i in range(n_hashes)])
        return F.zip_with(acc, hashes, lambda a, b: F.least(a, b))

    return F.aggregate(shingle_col, init, step)


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, n_hashes: int = 32, k: int = 5
) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        _minhash_signature(_shingles(F.col(text_col), k), n_hashes).alias("sig"),
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 32,
    bands: int = 8,
    k: int = 5,
    max_bucket: int = 64,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b) sharing at least one band bucket.

    32 hashes in 8 bands of 4 rows: collision probability 1-(1-J^4)^8 —
    ~0.90 at Jaccard 0.7, ~0.999 at 0.85. Fewer rows per band (e.g. 2) looks
    cheaper but collapses on homogeneous corpora: moderately-similar docs all
    collide and the candidate set explodes quadratically. The per-bucket cap
    (max_bucket) additionally bounds blowup on boilerplate-heavy buckets.
    """
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, k)
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                "_",
                                *[
                                    F.col("sig")[b * rows_per_band + r]
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    w = Window.partitionBy("band", "bucket").orderBy("id")
    capped = banded.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= max_bucket
    )
    left = capped.select("band", "bucket", F.col("id").alias("id_a"))
    right = capped.select("band", "bucket", F.col("id").alias("id_b"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.7,
    k: int = 5,
    **lsh_kwargs,
) -> DataFrame:
    """Exact character-k-gram Jaccard over LSH candidates (verify stage).

    Pattern: cheap LSH recall pass -> exact verification join — the candidate
    set (not n^2) pays the exact-similarity cost.
    """
    candidates = minhash_candidate_pairs(df, text_col, id_col, k=k, **lsh_kwargs)
    shingled = df.select(
        F.col(id_col).alias("id"), _shingles(F.col(text_col), k).alias("sh")
    )
    a = shingled.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = shingled.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    joined = candidates.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        joined.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup(
    df: DataFrame, text_col: str, id_col: str, threshold: float = 0.7, **kwargs
) -> DataFrame:
    """Drop near-duplicates: keep the smallest id of each near-dup pair's
    connected component (single-link, one union step — sufficient for the
    common duplicate-cluster shapes; full transitive closure would iterate)."""
    pairs = ngram_jaccard_pairs(df, text_col, id_col, threshold, **kwargs)
    # representative = min neighbour id (one hop)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_column(col: Column, k: int = 3) -> Column:
    """64-bit simhash over character k-gram hashes, all native exprs.

    For each bit b: sum over shingles of sign(bit_b(hash)) > 0 -> bit set.
    Built with array higher-order functions: per-bit popcount comparison.
    """
    shingle_hashes = F.transform(_shingles(col, k), lambda s: F.xxhash64(s))
    n = F.size(shingle_hashes)

    def _bit_popcount(b: int):
        return F.aggregate(
            shingle_hashes,
            F.lit(0),
            lambda acc, h: acc + F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("int"),
        )

    bits = [
        F.when(_bit_popcount(b) * 2 > n, F.lit(1).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        for b in range(64)
    ]
    out = F.lit(0).cast("long")
    for b, bit in enumerate(bits):
        out = out.bitwiseOR(F.shiftleft(bit, b))
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_dedup_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3, prefix_bits: int = 16
) -> DataFrame:
    """Near-dup pairs by simhash: bucket on 4 rotated prefixes, verify
    hamming distance within buckets (standard simhash permutation trick)."""
    sims = df.select(
        F.col(id_col).alias("id"), simhash_column(F.col(text_col)).alias("sim")
    )
    buckets = []
    for rot in range(4):
        rotated = F.shiftleft(F.col("sim"), rot * 16).bitwiseOR(
            F.shiftright(F.col("sim"), 64 - rot * 16) if rot else F.lit(0)
        )
        buckets.append(
            sims.select(
                "id", "sim", F.lit(rot).alias("rot"),
                F.shiftright(rotated, 64 - prefix_bits).alias("bucket"),
            )
        )
    all_buckets = buckets[0]
    for extra in buckets[1:]:
        all_buckets = all_buckets.unionByName(extra)
    left = all_buckets.select("rot", "bucket", F.col("id").alias("id_a"), F.col("sim").alias("sim_a"))
    right = all_buckets.select("rot", "bucket", F.col("id").alias("id_b"), F.col("sim").alias("sim_b"))
    return (
        left.join(right, ["rot", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming64(F.col("sim_a"), F.col("sim_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Embedding near-dup (cosine)
# ---------------------------------------------------------------------------

def cosine_similarity(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    norm_a = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    norm_b = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (norm_a * norm_b)


def embedding_dedup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Cosine near-duplicate pairs via random-hyperplane LSH.

    Hyperplanes are deterministic pseudo-random unit-ish vectors derived from
    xxhash64 of (plane, dim) — no RNG state, same buckets every run. Bucket =
    sign pattern per band; verification = exact cosine on candidates.
    """
    dim = len(df.select(vec_col).first()[0])
    planes_per_band = n_planes // bands

    def plane_weight(p: int, d: int) -> float:
        # deterministic pseudo-random in [-1, 1): splitmix-style integer mix
        h = (p * 2654435761 + d * 40503) & 0xFFFFFFFF
        h = (h ^ (h >> 16)) * 2246822519 & 0xFFFFFFFF
        h = (h ^ (h >> 13)) & 0xFFFFFFFF
        return (h / 0x80000000) - 1.0

    vec = F.col(vec_col)
    sign_bits = []
    for p in range(n_planes):
        weights = F.array(*[F.lit(plane_weight(p, d)) for d in range(dim)])
        dot = F.aggregate(
            F.zip_with(vec, weights, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sign_bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)))

    banded = df.select(
        F.col(id_col).alias("id"),
        vec.alias("v"),
        *[
            F.concat_ws(
                "", *[sign_bits[b * planes_per_band + r].cast("string") for r in range(planes_per_band)]
            ).alias(f"band{b}")
            for b in range(bands)
        ],
    )
    exploded = banded.select(
        "id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"band{b}").alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "v", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    left = exploded.select("band", "bucket", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    right = exploded.select("band", "bucket", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_similarity(F.col("v_a"), F.col("v_b")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )
