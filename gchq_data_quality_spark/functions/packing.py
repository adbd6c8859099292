"""Sequence packing: concatenate documents into fixed-length training
sequences (the standard LLM pre-training data layout).

The concat-and-chunk contract: within each partition, documents are
concatenated in id order (each followed by a separator token) and the
token stream is cut into sequences of exactly ``seq_len`` tokens; one
trailing partial sequence per partition carries the remainder. Packing is
embarrassingly parallel — each partition packs independently, so the only
cost of distribution is at most ONE short sequence per partition boundary
(at 100 TB / 10k partitions that is 10k short sequences out of billions —
negligible padding waste, no shuffle beyond the optional deterministic
repartition). Token identity is the repo's whitespace convention
(functions/text.token_count); callers with a real tokenizer pack its
output text instead.

This is the one legitimately stateful-per-partition operator in the
library (a token stream crossing row boundaries cannot be expressed as a
row-local Column), so it uses mapInPandas: the per-partition BATCH
ITERATOR lets the carry buffer flow across Arrow batches without ever
materialising the partition, and emission re-batches output sequences.
"""

from __future__ import annotations

import re
from collections import deque

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The repo's token convention is Java \s+ (text.token_count) and the
# packed_tokens oracle replays it with RE2 \s — both ASCII-only. Python
# str.split() additionally splits on Unicode whitespace (U+00A0, U+0085,
# U+2028, \x1c-\x1f), which would diverge token counts on non-ASCII text,
# so packing splits on the explicit Java \s class instead.
_ASCII_WS = re.compile(r"[ \t\n\x0b\f\r]+")

PACKED_SCHEMA = (
    "part_id int, seq_idx long, n_tokens int, n_docs int, "
    "is_final boolean, doc_ids array<long>, text string"
)


def pack_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    seq_len: int = 512,
    sep_token: str = "<|endofdoc|>",
    num_partitions: int | None = None,
) -> DataFrame:
    """Pack documents into fixed-length whitespace-token sequences.

    Output rows: ``(part_id, seq_idx, n_tokens, n_docs, is_final,
    doc_ids, text)`` — every sequence except at most one ``is_final``
    per partition has exactly ``seq_len`` tokens; ``doc_ids`` lists the
    source documents overlapping the sequence (a document split across a
    boundary appears in both sequences). NULL/empty documents contribute
    nothing. Deterministic: rows are hash-repartitioned on ``id_col``
    (``num_partitions`` or the input's partition count) and sorted by id
    within partitions, so the packing is a pure function of the data.

    ``id_col`` must be integral (the doc_ids lineage array is long).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    sep = [sep_token] if sep_token else []

    src = df.select(
        F.col(id_col).cast("long").alias("__id"), F.col(text_col).alias("__text")
    )
    n_parts = num_partitions or src.rdd.getNumPartitions()
    src = (
        src.repartition(n_parts, "__id")
        .sortWithinPartitions("__id")
        .withColumn("__part", F.spark_partition_id())
    )

    def _pack(batches):
        tokens: deque[str] = deque()
        spans: deque[tuple[int, int]] = deque()  # (doc_id, n_tokens_left)
        part_id = 0
        seq_idx = 0
        out: list[tuple] = []

        def cut(final: bool) -> None:
            nonlocal seq_idx
            take = len(tokens) if final else seq_len
            if take == 0:
                return
            seq_tokens = [tokens.popleft() for _ in range(take)]
            doc_ids: list[int] = []
            left = take
            while left > 0:
                doc_id, n = spans[0]
                doc_ids.append(doc_id)
                if n > left:  # doc continues into the next sequence
                    spans[0] = (doc_id, n - left)
                    left = 0
                else:
                    spans.popleft()
                    left -= n
            out.append(
                (
                    part_id,
                    seq_idx,
                    take,
                    len(doc_ids),
                    final,
                    doc_ids,
                    " ".join(seq_tokens),
                )
            )
            seq_idx += 1

        def drain() -> pd.DataFrame:
            nonlocal out
            frame = pd.DataFrame(
                out,
                columns=[
                    "part_id",
                    "seq_idx",
                    "n_tokens",
                    "n_docs",
                    "is_final",
                    "doc_ids",
                    "text",
                ],
            )
            out = []
            return frame

        saw_rows = False
        for pdf in batches:
            if len(pdf) and not saw_rows:
                saw_rows = True
                part_id = int(pdf["__part"].iloc[0])
            for doc_id, text in zip(pdf["__id"], pdf["__text"]):
                if text is None:
                    continue
                toks = [t for t in _ASCII_WS.split(text) if t]
                if not toks:
                    continue
                toks = toks + sep
                tokens.extend(toks)
                spans.append((int(doc_id), len(toks)))
                while len(tokens) >= seq_len:
                    cut(final=False)
            if len(out) >= 512:
                yield drain()
        cut(final=True)
        if out:
            yield drain()

    return src.mapInPandas(_pack, PACKED_SCHEMA)
