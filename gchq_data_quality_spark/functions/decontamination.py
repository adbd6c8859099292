"""Train/test decontamination: flag documents that share a word n-gram with
a probe (benchmark/eval) corpus.

The standard LLM-training-data hygiene op (e.g. GPT-3's 13-gram overlap
rule): any document containing an n-gram that also appears in an evaluation
benchmark is "contaminated" and must be dropped or audited before training.
The reference engine has no such operator (SURVEY.md §2.5: no joins at all);
this extends the dedup family (functions/dedup.py) with the one genuinely
join-shaped text operator the pipeline needs.

Scale design (the probe side is the small side BY DEFINITION — benchmarks
are thousands-to-millions of grams, the corpus is 10^12 docs):

- probe grams are distinct-ed and BROADCAST — the corpus-side join is
  map-side, no shuffle of the big table;
- each document is scanned once: tokens hashed to longs, n-gram ids built
  by folding ``xxhash64(acc, next)`` over shifted slices (O(tokens) zip_with
  — the same shape as text.repetition_ratio, full 64-bit entropy per gram,
  no string concatenation, ANSI-overflow-free because xxhash64 is a hash,
  not arithmetic);
- the only shuffle is the final per-doc hit aggregation, whose input is
  already filtered to matching grams (tiny unless the corpus is heavily
  contaminated — which is exactly when you want to pay for the detail).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sliding_ngrams(col: Column, n: int, token_map, combine) -> Column:
    """Shared sliding-window builder behind word_ngram_ids / word_ngrams:
    one tokenisation rule (lowercase, trim, whitespace split, drop empties),
    one windowing invariant — combine n shifted slices, each SLICED TO
    n_grams EXACTLY because zip_with pads the SHORTER side with nulls, so a
    longer shifted slice would fabricate extra grams. The token array is
    bound once via the transform trick (no CSE across higher-order
    functions); ``token_map``/``combine`` pick the representation.
    """
    tokens = F.filter(
        F.split(F.lower(F.trim(col)), r"\s+"), lambda t: t != F.lit("")
    )
    if token_map is not None:
        tokens = F.transform(tokens, token_map)

    def _from_tokens(arr: Column) -> Column:
        n_grams = F.greatest(F.size(arr) - F.lit(n - 1), F.lit(0))
        grams = F.slice(arr, 1, n_grams)
        for k in range(1, n):
            shifted = F.slice(arr, k + 1, n_grams)
            grams = F.zip_with(grams, shifted, combine)
        return grams

    return F.transform(F.array(tokens), _from_tokens)[0]


def word_ngram_ids(col: Column, n: int = 8) -> Column:
    """array<long>: one 64-bit id per word n-gram window of the text.

    Tokens = whitespace-split of the lowercased trimmed text (empty texts
    and texts with < n tokens yield an empty array). Gram id = left-fold of
    ``xxhash64(acc, token_hash)`` — deterministic, identical construction on
    both the corpus and probe sides, collision odds ~grams²/2^64.
    """
    return _sliding_ngrams(
        col, n,
        token_map=lambda s: F.xxhash64(s),
        combine=lambda a, b: F.xxhash64(a, b),
    )


def word_ngrams(col: Column, n: int = 2) -> Column:
    """array<string>: the word n-gram windows themselves (space-joined).

    The string twin of ``word_ngram_ids`` — used where the grams must be
    human-readable / SQL-comparable (corpus statistics, boilerplate mining)
    rather than joined at scale. Same tokenisation.
    """
    return _sliding_ngrams(
        col, n,
        token_map=None,
        combine=lambda a, b: F.concat_ws(" ", a, b),
    )


def top_ngrams(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 2,
    top: int = 20,
) -> DataFrame:
    """(gram, doc_freq): the ``top`` word n-grams by DOCUMENT frequency —
    the boilerplate-mining sweep (grams appearing in many documents are
    candidates for the scrub/dedup lists). One explode of per-doc distinct
    grams, one partial+final hash aggregation, TakeOrdered top-k — no full
    sort at any scale. Deterministic tie-break on the gram string."""
    grams = docs.filter(F.col(text_col).isNotNull()).select(
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n))).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), "gram")
        .limit(top)
    )


def probe_gram_set(
    probes: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct n-gram ids of the probe corpus (the broadcast side)."""
    return (
        probes.select(F.explode(word_ngram_ids(F.col(text_col), n)).alias("g"))
        .distinct()
    )


def contamination_hits(
    docs: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """(id_col, n_hits): documents sharing >= 1 word n-gram with the probe
    corpus, with the count of DISTINCT shared grams. Documents with no
    overlap are absent (filter after an inner broadcast join)."""
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngram_ids(F.col(text_col), n))).alias("g"),
    )
    return (
        doc_grams.join(F.broadcast(probe_gram_set(probes, text_col, n)), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Drop every document with >= min_hits probe n-grams (broadcast
    anti-join on the hit set — the corpus is scanned once)."""
    hits = contamination_hits(docs, probes, text_col, id_col, n).filter(
        F.col("n_hits") >= min_hits
    )
    return docs.join(hits.select(id_col), id_col, "left_anti")
