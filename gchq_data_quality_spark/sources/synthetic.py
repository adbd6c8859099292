"""Deterministic synthetic image+caption table (the graft input, F4 in FIXTURES.md).

Schema matches BASELINE.json input_hint exactly:
  (image_id string, bytes binary, w int, h int, fmt string, caption string,
   phash long)
plus generated per-row labels for verification:
  (expected_lang, expected_keep, expected_scrubbed, defect)

Everything derives from numpy's seeded PCG64 (seed=42 convention) — same
inputs, same bytes, every run. Defect classes exercise every rule of the
quality-filter pipeline; caption/pixel duplication follows a Zipf cluster
distribution to create the phash skew the salted repartition defends against.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gchq_data_quality_spark.functions.images import encode_ppm

# Distinct character signatures per language so a char-trigram model separates
# them cleanly (deterministic stand-in for real language corpora).
LANG_WORDS: dict[str, list[str]] = {
    "en": "the quick brown fox jumps over lazy dog with bright summer morning light "
          "children play near river while birds sing songs about distant mountains".split(),
    "fr": "le renard brun saute par dessus chien paresseux avec lumière été matin "
          "les enfants jouent près rivière pendant que oiseaux chantent chansons montagnes éloignées".split(),
    "de": "der schnelle braune fuchs springt über faulen hund mit hellem sommermorgenlicht "
          "kinder spielen nähe fluss während vögel lieder über ferne berge singen schöne grüße".split(),
    "es": "el zorro marrón rápido salta sobre perro perezoso con luz brillante mañana verano "
          "los niños juegan cerca río mientras pájaros cantan canciones sobre montañas lejanas".split(),
}
LANGUAGES = sorted(LANG_WORDS)

PII_EMAILS = ["john.doe@example.com", "alice99@mail.org", "contact@site.net"]
PII_PHONES = ["+1 555-123-4567", "555-987-6543", "(020) 7946-0958"]
TOXIC_TERMS = ["badword1", "badword2", "slur1", "curse1"]

DEFECT_WEIGHTS = [
    ("clean", 0.62),
    ("pii", 0.06),
    ("toxic", 0.04),
    ("null_caption", 0.04),
    ("empty", 0.02),
    ("too_short", 0.04),
    ("too_long", 0.02),
    ("charset", 0.06),
    ("repetition", 0.05),
    ("gibberish", 0.05),
]
# remaining 0.00 absorbed by clean


@dataclass
class GeneratedRow:
    image_id: str
    bytes: bytes
    w: int
    h: int
    fmt: str
    caption: str | None
    phash: int
    expected_lang: str | None
    expected_keep: bool
    expected_scrubbed: str | None
    defect: str


def _sentence(rng: np.random.Generator, lang: str, n_words: int | None = None) -> str:
    words = LANG_WORDS[lang]
    n = int(n_words or rng.integers(8, 16))
    picked = [words[int(i)] for i in rng.integers(0, len(words), n)]
    return " ".join(picked)


def _phash64(pixels: np.ndarray) -> int:
    """Deterministic 64-bit perceptual-ish hash: crc32 of the full pixels and
    of a 4x4 downsample, combined. Duplicated pixels -> identical phash."""
    raw = pixels.tobytes()
    small = pixels[:: max(pixels.shape[0] // 4, 1), :: max(pixels.shape[1] // 4, 1)].tobytes()
    value = (zlib.crc32(raw) << 32) | zlib.crc32(small)
    return value - (1 << 64) if value >= (1 << 63) else value


def generate_rows(
    n_rows: int,
    seed: int = 42,
    n_clusters: int | None = None,
    zipf_a: float = 1.5,
) -> list[GeneratedRow]:
    rng = np.random.default_rng(seed)
    n_clusters = n_clusters or max(n_rows // 4, 1)

    defects = [d for d, _ in DEFECT_WEIGHTS]
    probs = np.array([p for _, p in DEFECT_WEIGHTS])
    probs = probs / probs.sum()

    # Zipf-skewed cluster assignment: cluster 0 is hot (duplication skew).
    cluster_ids = (rng.zipf(zipf_a, n_rows) - 1) % n_clusters

    # Per-cluster deterministic content (captions + pixels shared by cluster).
    cluster_rng = np.random.default_rng(seed + 1)
    cluster_lang = [LANGUAGES[int(i)] for i in cluster_rng.integers(0, len(LANGUAGES), n_clusters)]
    cluster_caption = [_sentence(cluster_rng, cluster_lang[c]) for c in range(n_clusters)]
    cluster_dims = [(int(w), int(h)) for w, h in zip(
        cluster_rng.choice([16, 24, 32], n_clusters),
        cluster_rng.choice([16, 24, 32], n_clusters), strict=True)]
    cluster_pixels = [
        cluster_rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).copy()
        for (w, h) in cluster_dims
    ]

    rows: list[GeneratedRow] = []
    for i in range(n_rows):
        c = int(cluster_ids[i])
        lang = cluster_lang[c]
        defect = defects[int(rng.choice(len(defects), p=probs))]
        w, h = cluster_dims[c]
        pixels = cluster_pixels[c]

        caption: str | None
        expected_lang: str | None = lang
        keep = True
        scrubbed: str | None

        if defect == "clean":
            caption = cluster_caption[c] if rng.random() < 0.3 else _sentence(rng, lang)
            scrubbed = caption
        elif defect == "pii":
            base = _sentence(rng, lang)
            if rng.random() < 0.5:
                token, tag = PII_EMAILS[int(rng.integers(len(PII_EMAILS)))], "<EMAIL>"
            else:
                token, tag = PII_PHONES[int(rng.integers(len(PII_PHONES)))], "<PHONE>"
            caption = f"{base} {token}"
            scrubbed = f"{base} {tag}"
        elif defect == "toxic":
            base = _sentence(rng, lang)
            term = TOXIC_TERMS[int(rng.integers(len(TOXIC_TERMS)))]
            caption = f"{base} {term}"
            scrubbed = f"{base} <TOX>"
        elif defect == "null_caption":
            caption, expected_lang, keep, scrubbed = None, None, False, None
        elif defect == "empty":
            caption, expected_lang, keep, scrubbed = "", None, False, ""
        elif defect == "too_short":
            caption = LANG_WORDS[lang][int(rng.integers(len(LANG_WORDS[lang])))][:3]
            keep, scrubbed, expected_lang = False, caption, None
        elif defect == "too_long":
            caption = _sentence(rng, lang, 600)
            keep, scrubbed, expected_lang = False, caption, None
        elif defect == "charset":
            junk = "".join(str(d) for d in rng.integers(0, 10, 40))
            caption = f"$$$ {junk} @@@ %%% ### {junk}"
            keep, scrubbed, expected_lang = False, caption, None
        elif defect == "repetition":
            word = LANG_WORDS[lang][int(rng.integers(len(LANG_WORDS[lang])))]
            caption = " ".join([word, "now"] * 25)
            keep, scrubbed, expected_lang = False, caption, None
        else:  # gibberish
            chars = np.array(list("qwxzjkvf" + "qxzjvkbw".upper() + "zqxjkw"))
            caption = "".join(
                "".join(chars[rng.integers(0, len(chars), int(rng.integers(4, 9)))]) + " "
                for _ in range(12)
            ).strip()
            keep, scrubbed, expected_lang = False, caption, None

        rows.append(
            GeneratedRow(
                image_id=f"img{i:08d}",
                bytes=encode_ppm(pixels),
                w=w,
                h=h,
                fmt="ppm",
                caption=caption,
                phash=_phash64(pixels),
                expected_lang=expected_lang,
                expected_keep=keep,
                expected_scrubbed=scrubbed,
                defect=defect,
            )
        )
    return rows


IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), False),
        T.StructField("expected_lang", T.StringType(), True),
        T.StructField("expected_keep", T.BooleanType(), False),
        T.StructField("expected_scrubbed", T.StringType(), True),
        T.StructField("defect", T.StringType(), False),
    ]
)


def generate_images_df(
    spark: SparkSession, n_rows: int, seed: int = 42, n_partitions: int | None = None
) -> DataFrame:
    rows = generate_rows(n_rows, seed=seed)
    data = [
        (
            r.image_id, bytearray(r.bytes), r.w, r.h, r.fmt, r.caption, r.phash,
            r.expected_lang, r.expected_keep, r.expected_scrubbed, r.defect,
        )
        for r in rows
    ]
    df = spark.createDataFrame(data, IMAGES_SCHEMA)
    if n_partitions:
        df = df.repartition(n_partitions)
    return df


def training_corpus(seed: int = 7, per_lang: int = 300) -> tuple[list[str], list[str]]:
    """Deterministic (texts, labels) corpus for langid/perplexity training.

    Separate seed from the data generator so train and eval rows differ while
    sharing the same distribution. Includes PII-bearing sentences so scrubbed
    content doesn't inflate perplexity.
    """
    rng = np.random.default_rng(seed)
    texts, labels = [], []
    for lang in LANGUAGES:
        for i in range(per_lang):
            s = _sentence(rng, lang)
            if i % 10 == 0:
                s += " " + PII_EMAILS[i % len(PII_EMAILS)]
            if i % 13 == 0:
                s += " " + PII_PHONES[i % len(PII_PHONES)]
            texts.append(s)
            labels.append(lang)
    return texts, labels
