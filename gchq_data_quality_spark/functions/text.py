"""Text-analysis functions: all native Column expressions (JVM-side codegen).

These power the quality-filter heuristics of the north rule (length / charset
/ repetition / token statistics) and the standalone text-analysis queries.
No Python in the hot path — every function here returns a Catalyst Column
built from pyspark.sql.functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A compact stopword list for quality scoring (top English function words).
STOPWORDS = [
    "the", "of", "and", "a", "to", "in", "is", "it", "that", "was",
    "for", "on", "are", "as", "with", "his", "they", "at", "be", "this",
]


def char_count(col: Column) -> Column:
    return F.length(col)


def token_count(col: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token count: words, digits runs, and punctuation each
    count (a cheap regex proxy for BPE token counts used to budget training
    data)."""
    return F.when(col.isNull(), F.lit(None)).otherwise(
        F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]"), 0))
    )


def alpha_ratio(col: Column) -> Column:
    """Fraction of characters that are letters (unicode-aware classes)."""
    total = F.length(col)
    letters = F.length(F.regexp_replace(col, r"[^\p{L}]", ""))
    return F.when(total > 0, letters / total).otherwise(F.lit(0.0))


def non_ascii_ratio(col: Column) -> Column:
    total = F.length(col)
    ascii_only = F.length(F.regexp_replace(col, r"[^\x00-\x7F]", ""))
    return F.when(total > 0, (total - ascii_only) / total).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    total = F.length(col)
    punct = F.length(F.regexp_replace(col, r"[^\p{P}\p{S}]", ""))
    return F.when(total > 0, punct / total).otherwise(F.lit(0.0))


def digit_ratio(col: Column) -> Column:
    total = F.length(col)
    digits = F.length(F.regexp_replace(col, r"[^0-9]", ""))
    return F.when(total > 0, digits / total).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are stopwords — a classic
    gibberish detector (real prose has ~0.3-0.5, random words ~0)."""
    words = stopwords or STOPWORDS
    tokens = F.split(F.lower(F.trim(col)), r"\s+")
    hits = F.size(F.filter(tokens, lambda t: t.isin(words)))
    n = F.size(tokens)
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def max_word_length(col: Column) -> Column:
    tokens = F.split(F.trim(col), r"\s+")
    return F.coalesce(
        F.array_max(F.transform(tokens, F.length)), F.lit(0)
    )


def repetition_ratio(col: Column, n: int = 2) -> Column:
    """Repeated word-n-gram ratio: 1 - distinct_ngrams/total_ngrams.

    High values flag boilerplate/spam ("buy now buy now buy now").
    No UDF and strictly O(tokens): n-grams come from zip_with over shifted
    slices of the token array (an earlier transform-over-sequence version
    called slice per index — O(tokens²) — and dominated pipeline CPU on
    long captions). Each token is hashed to a LONG once and n-grams are
    combined with an overflow-free masked affine pairing, so the
    distinct-count runs over fixed-width longs instead of freshly
    concatenated strings — measured
    ~2.5x less time and far less allocation (page faults are the scaling
    bottleneck on string-heavy codegen, BASELINE.md). 64-bit collisions are
    negligible for the ratio.
    """
    tokens = F.transform(
        F.split(F.lower(F.trim(col)), r"\s+"), lambda s: F.xxhash64(s)
    )

    # Bind-once pattern (twice): expressions containing higher-order
    # functions get NO subexpression elimination, so every reference to
    # `tokens` / `grams` would re-evaluate the whole upstream pipeline.
    # Wrapping the value in a 1-element array and reading it back through a
    # transform lambda turns each reference into a cheap bound-variable read
    # — measured 2.8x (7.0 s -> 2.5 s on the 800k-row bench corpus).
    def _from_tokens(arr: Column) -> Column:
        n_tokens = F.size(arr)
        n_grams = n_tokens - F.lit(n - 1)
        grams = F.slice(arr, 1, F.greatest(n_grams, F.lit(0)))
        for k in range(1, n):
            shifted = F.slice(
                arr, k + 1, F.greatest(n_tokens - F.lit(k), F.lit(0))
            )
            # overflow-free pairing: (a & 2^32-1)*2^31 + (b & 2^31-1) tops out
            # at exactly long max — injective in the masked pair, and legal
            # under ANSI mode (a wrapping multiply would raise
            # ARITHMETIC_OVERFLOW on Spark 4's ANSI-default clusters)
            grams = F.zip_with(
                grams,
                shifted,
                lambda a, b: a.bitwiseAND(F.lit((1 << 32) - 1)) * F.lit(1 << 31)
                + b.bitwiseAND(F.lit((1 << 31) - 1)),
            )

        def _ratio(g: Column) -> Column:
            ng = F.size(g)  # == n_grams: the slices already trimmed to it
            return F.when(
                ng > 0, 1.0 - F.size(F.array_distinct(g)) / ng
            ).otherwise(F.lit(0.0))

        return F.transform(F.array(grams), _ratio)[0]

    return F.transform(F.array(tokens), _from_tokens)[0]


def char_repetition_ratio(col: Column, run_len: int = 4) -> Column:
    """Fraction of the string consumed by runs of >=run_len identical chars."""
    total = F.length(col)
    collapsed = F.length(
        F.regexp_replace(col, r"(.)\1{" + str(run_len - 1) + r",}", "$1")
    )
    return F.when(total > 0, (total - collapsed) / total).otherwise(F.lit(0.0))


def duplicate_line_fraction(col: Column) -> Column:
    """Fraction of newline-delimited lines that are repeats of another line
    (Gopher repetition filter family; Rae et al. 2021 §A1.1): 1 -
    distinct_lines / lines. Boilerplate-heavy pages (nav menus, cookie
    banners repeated per section) score high. Pure array ops, no shuffle."""
    lines = F.split(col, r"\n")

    def _from_lines(arr: Column) -> Column:
        n = F.size(arr)
        return F.when(
            n > 0, 1.0 - F.size(F.array_distinct(arr)) / n
        ).otherwise(F.lit(0.0))

    return F.transform(F.array(lines), _from_lines)[0]


def duplicate_line_char_fraction(col: Column) -> Column:
    """Fraction of characters sitting in repeat occurrences of a line:
    (total_line_chars - distinct_line_chars) / total_line_chars. The
    character-weighted companion of ``duplicate_line_fraction`` — a page
    whose one duplicated line is 90% of the text scores high even though
    only 1/N lines repeats. Empty docs (and all-empty lines) score 0."""
    lines = F.split(col, r"\n")
    zero = F.lit(0).cast("long")

    def _from_lines(arr: Column) -> Column:
        total = F.aggregate(arr, zero, lambda acc, x: acc + F.length(x))
        dist = F.aggregate(
            F.array_distinct(arr), zero, lambda acc, x: acc + F.length(x)
        )
        return F.when(total > 0, (total - dist) / total).otherwise(F.lit(0.0))

    return F.transform(F.array(lines), _from_lines)[0]


def _word_ngram_strings(col: Column, n: int) -> Column:
    """Space-joined lowercase word n-grams via zip_with over shifted slices
    (the O(tokens) construction from repetition_ratio, kept as STRINGS here
    because the char-fraction metrics need each gram's length)."""
    tokens = F.filter(F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != "")

    def _from_tokens(arr: Column) -> Column:
        n_tokens = F.size(arr)
        # Every slice is trimmed to the GRAM count, not the shift's natural
        # length: zip_with pads the shorter side with nulls, so a too-long
        # shifted slice on a doc with fewer than n tokens would fabricate
        # [null] grams (and null-skipping F.least turns null fractions
        # into 1.0 downstream).
        n_grams = F.greatest(n_tokens - F.lit(n - 1), F.lit(0))
        grams = F.slice(arr, 1, n_grams)
        for k in range(1, n):
            grams = F.zip_with(
                grams,
                F.slice(arr, k + 1, n_grams),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        return grams

    return F.transform(F.array(tokens), _from_tokens)[0]


def top_ngram_char_fraction(col: Column, n: int = 2) -> Column:
    """Fraction of the document's characters attributable to its single most
    frequent word n-gram: max over distinct grams of count*len(gram), over
    total chars (Gopher: docs whose top 2/3/4-gram covers >20/18/16% of
    characters are dropped). Clipped to 1.0 since overlapping occurrences
    can double-count characters.

    Per-row cost is O(distinct_grams * grams) inside one codegen'd
    expression — fine for captions and web pages (the quality-filter
    input); for book-length outliers pair with a length gate first. No
    shuffle, no UDF; the gram array is bound once (HOF subtrees get no
    subexpression elimination — see repetition_ratio)."""
    grams = _word_ngram_strings(col, n)
    total = F.length(col)

    def _from_grams(g: Column) -> Column:
        per_gram = F.transform(
            F.array_distinct(g),
            lambda d: F.size(F.filter(g, lambda x: x == d)) * F.length(d),
        )
        top = F.coalesce(F.array_max(per_gram), F.lit(0))
        return F.when(total > 0, F.least(top / total, F.lit(1.0))).otherwise(
            F.lit(0.0)
        )

    return F.transform(F.array(grams), _from_grams)[0]


def duplicate_ngram_char_fraction(col: Column, n: int = 5) -> Column:
    """Fraction of characters in repeat occurrences of any word n-gram:
    sum over duplicated grams of (count-1)*len(gram), over total chars
    (the RedPajama-quality-signal reading of Gopher's dup-n-gram filters,
    n = 5..10: all occurrences beyond the first count as duplicated).
    Clipped to 1.0 — overlapping grams can double-count characters.
    Same O(distinct_grams * grams) per-row bound and bind-once shape as
    ``top_ngram_char_fraction``."""
    grams = _word_ngram_strings(col, n)
    total = F.length(col)
    zero = F.lit(0).cast("long")

    def _from_grams(g: Column) -> Column:
        dup_chars = F.aggregate(
            F.transform(
                F.array_distinct(g),
                lambda d: (F.size(F.filter(g, lambda x: x == d)) - 1)
                * F.length(d),
            ),
            zero,
            lambda acc, x: acc + x,
        )
        return F.when(
            total > 0, F.least(dup_chars / total, F.lit(1.0))
        ).otherwise(F.lit(0.0))

    return F.transform(F.array(grams), _from_grams)[0]


def fingerprint(col: Column) -> Column:
    """Deterministic 64-bit document fingerprint over normalised text.

    Normalisation: lowercase, collapse whitespace, strip punctuation — so
    trivially-different duplicates collide. xxhash64 is Spark-native and
    stable across runs/partitions."""
    normalised = F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(col)), r"[\p{P}\p{S}]", ""), r"\s+", " "
    )
    return F.xxhash64(normalised)


def quality_score(col: Column) -> Column:
    """Composite heuristic quality score in [0, 1] (higher = better prose).

    A weighted blend of the individual heuristics; weights chosen so typical
    clean sentences score > 0.7 and obvious garbage scores < 0.3.
    """
    score = (
        F.lit(0.0)
        + F.when(char_count(col).between(20, 2000), 0.25).otherwise(0.0)
        + F.when(alpha_ratio(col) >= 0.6, 0.25).otherwise(0.0)
        + F.when(repetition_ratio(col) <= 0.2, 0.25).otherwise(0.0)
        + F.when(stopword_ratio(col) >= 0.1, 0.15).otherwise(0.0)
        + F.when(max_word_length(col) <= 25, 0.10).otherwise(0.0)
    )
    return F.when(col.isNull(), F.lit(None)).otherwise(score)


def chunk_spans(col: Column, max_tokens: int = 64, overlap: int = 16) -> Column:
    """array<struct<chunk_idx int, n_tokens int, chunk_text string>>: the
    document split into whitespace-token windows of ``max_tokens`` with
    ``overlap`` tokens of context carried between consecutive chunks — the
    standard long-document -> training-sample splitter.

    Chunk i starts at token i*(max_tokens-overlap); a trailing start whose
    window would be a pure suffix of the previous chunk (start+overlap >=
    n_tokens) is dropped, except start 0 so every non-null doc yields >= 1
    chunk. All native array ops, one pass; the token array is bound ONCE via
    the transform trick (HOF subtrees get no subexpression elimination — see
    repetition_ratio).
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap

    tokens = F.filter(
        F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != ""
    )

    def _from_tokens(ts: Column) -> Column:
        n = F.size(ts)
        starts = F.filter(
            F.sequence(
                F.lit(0), F.greatest(n - F.lit(1), F.lit(0)), F.lit(stride)
            ),
            lambda s: (s == 0) | (s + F.lit(overlap) < n),
        )
        return F.transform(
            starts,
            lambda s, i: F.struct(
                i.alias("chunk_idx"),
                F.least(F.lit(max_tokens), n - s).alias("n_tokens"),
                F.array_join(
                    F.slice(ts, s + F.lit(1), F.lit(max_tokens)), " "
                ).alias("chunk_text"),
            ),
        )

    return F.transform(F.array(tokens), _from_tokens)[0]


def chunk_documents(
    df, text_col: str, id_col: str, max_tokens: int = 64, overlap: int = 16
):
    """One row per chunk: (id, chunk_idx, n_tokens, chunk_text).

    Null-text rows produce no chunks (explode drops them); empty-but-present
    text yields one empty chunk, preserving the row for lineage. A narrow
    map + generate — no shuffle, safe at any scale.
    """
    spans = chunk_spans(F.col(text_col), max_tokens, overlap)
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.explode(spans).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.n_tokens").alias("n_tokens"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
    )


def coverage_counts(freq: DataFrame, n_col: str = "n") -> DataFrame:
    """Vocabulary coverage curve from a (token -> count) frequency table:
    one row ``(n_vocab, total_tokens, n_top50, n_top90, n_top99)`` — how
    many distinct tokens (taken most-frequent-first) cover 50/90/99% of
    total token mass. Tokenizer-budget statistics for corpus planning.

    Scale shape (no global window anywhere in the plan):

    1. The coverage counts are INVARIANT to ordering among equal-frequency
       tokens, so the vocabulary collapses to one row per DISTINCT
       frequency value ``(n, cnt)`` — O(sqrt(total_tokens)) rows by the
       standard distinct-frequency bound, vs 10^8-10^9 vocabulary rows
       for a 100 TB corpus.
    2. That tiny table is banded by the exact integer bit-length of ``n``
       (``length(bin(n))`` — no float log2 edge cases); the cumulative sum
       runs WITHIN bands (parallel window over <= 64 partitions) and the
       <= 64 per-band totals are prefix-offset driver-side.
    3. Within an equal-frequency run of ``cnt`` tokens starting at
       cumulative mass ``base``, the number of tokens satisfying
       ``C*cum < D*total`` is closed-form:
       ``clamp((D*total - C*base - 1) div (C*n), 0, cnt)`` —
       integer-exact, so the result matches the naive per-token
       cumulative window bit-for-bit (randomised differential test in
       tests/test_relational.py pins this against a Python reference).

    The distinct-frequency table is localCheckpoint-ed: the band-total
    collect and the final aggregate both read the materialised table
    instead of re-running the corpus-wide aggregation twice.
    """
    from pyspark.sql import Window

    by_n = (
        freq.groupBy(F.col(n_col).alias("n"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("band", F.length(F.bin("n")))
        .localCheckpoint()
    )
    band_rows = sorted(
        by_n.groupBy("band")
        .agg(
            F.sum(F.col("n") * F.col("cnt")).alias("mass"),
            F.sum("cnt").alias("toks"),
        )
        .collect(),
        key=lambda r: -r["band"],
    )
    mass_off: dict[int, int] = {}
    run_mass = 0
    n_vocab = 0
    for r in band_rows:
        mass_off[r["band"]] = run_mass
        run_mass += r["mass"]
        n_vocab += r["toks"]
    total = run_mass
    off_entries = [F.lit(x) for kv in mass_off.items() for x in kv]
    off_map = F.create_map(*off_entries) if off_entries else F.create_map()
    # mass accumulated BEFORE this n-run: band prefix + exclusive
    # within-band cumulation (n is unique per row after the groupBy, so
    # desc(n) alone is a total order within the band)
    w = (
        Window.partitionBy("band")
        .orderBy(F.desc("n"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cb = by_n.select(
        "n",
        "cnt",
        (
            off_map[F.col("band")].cast("long")
            + F.coalesce(
                F.sum(F.col("n") * F.col("cnt")).over(w), F.lit(0).cast("long")
            )
        ).alias("base"),
    )
    # tokens i in [1, cnt] with c*(base + i*n) < d*total, closed form:
    # clamp((d*total - c*base - 1) div (c*n), 0, cnt). Integer `div` keeps
    # the arithmetic exact past 2^53 (no double round-trip); trunc-vs-floor
    # only differ for negative numerators, where the clamp lands on the
    # true count 0 either way.
    thresholds = {"n_top50": (2, 1), "n_top90": (10, 9), "n_top99": (100, 99)}
    numdens = cb.select(
        "cnt",
        *[
            c
            for name, (cm, dm) in thresholds.items()
            for c in (
                (F.lit(dm * total) - F.lit(cm) * F.col("base") - 1).alias(
                    f"num_{name}"
                ),
                (F.lit(cm) * F.col("n")).alias(f"den_{name}"),
            )
        ],
    )
    clamped = numdens.select(
        *[
            F.greatest(
                F.lit(0).cast("long"),
                F.least(F.col("cnt"), F.expr(f"num_{name} div den_{name}")),
            ).alias(name)
            for name in thresholds
        ]
    )
    return clamped.agg(
        *[(F.sum(name) + 1).alias(name) for name in thresholds]
    ).select(
        F.lit(n_vocab).cast("long").alias("n_vocab"),
        F.lit(total).cast("long").alias("total_tokens"),
        "n_top50",
        "n_top90",
        "n_top99",
    )


# ---------------------------------------------------------------------------
# Normalization (pre-dedup canonicalization)
# ---------------------------------------------------------------------------

def normalize_whitespace(col: Column, lowercase: bool = False) -> Column:
    """Canonical whitespace/control form, fully native (no UDF): strip
    C0/C1 control characters (keeping \\n and \\t as spaces), collapse
    whitespace runs to one space, trim. The cheap 90% of text
    canonicalization before exact/fuzzy dedup — two regexp passes inside
    whole-stage codegen. ``lowercase=True`` folds case too (dedup keys
    want it; display text usually doesn't)."""
    out = F.regexp_replace(col, r"[\x00-\x08\x0b-\x1f\x7f-\x9f]", " ")
    out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return F.lower(out) if lowercase else out


def normalize_unicode(col: Column, form: str = "NFKC") -> Column:
    """Unicode normalization (NFC/NFKC/NFD/NFKD) — the one canonicalization
    step Spark has no built-in for, so it is an Arrow-vectorized pandas UDF
    (the repo's UDF discipline allows exactly this shape: no JVM-side
    expression exists, the work is a batched C-level pandas .str call, and
    nothing else rides the crossing). Composes with the native
    ``normalize_whitespace`` which should run AFTER (normalization can
    introduce compatibility spaces). NULLs pass through."""
    import unicodedata

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown unicode form {form!r}")

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s):  # type: ignore[no-untyped-def]
        return s.map(
            lambda v: unicodedata.normalize(form, v) if v is not None else None
        )

    return _norm(col)


def normalized_fingerprint(col: Column) -> Column:
    """64-bit fingerprint of the whitespace/case-normalized text — the
    exact-dedup key that survives trivial reformatting (case, runs of
    spaces, control chars). Native end-to-end; plug into
    ``dedup.exact_dedup_ids`` as the fingerprint column."""
    return F.xxhash64(normalize_whitespace(col, lowercase=True))
