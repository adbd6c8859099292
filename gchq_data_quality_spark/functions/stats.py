"""Sampling and group-wise statistical screens for corpus curation.

- ``portable_hash`` / ``stratified_sample_flag``: DETERMINISTIC sampling —
  a row is in the sample iff a pure-arithmetic hash of its id lands under
  the cut. Unlike ``df.sample()`` the decision is a property of the row, so
  it is reproducible across runs/engines (the DuckDB oracle evaluates the
  identical expression), stable under repartitioning, and consistent across
  tables keyed by the same id (the standard trick for sampling a document
  table and its sidecar features table in lockstep). Expressible in plain
  ANSI SQL on purpose.

- ``groupwise_outlier_counts``: per-group z-score outlier screen in TWO
  passes: a tiny per-group moments aggregate, broadcast back, then one
  conditional re-aggregation. The window-function formulation computes the
  same thing in "one" pass but materialises every group in a single task's
  sort buffer — with millions of rows per group the broadcast-join plan is
  the one that survives; the stats side is bounded by the group count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Lehmer/Park-Miller-style LCG over the Mersenne prime 2^31-1. The id is
# masked to 31 bits BEFORE the multiply: max intermediate (2^31)*1103515245
# ~ 2.4e18 < 2^63 — overflow-free under ANSI mode by construction (the
# driver's session defaults to ANSI; see CLAUDE.md invariants).
_LCG_MUL = 1103515245
_LCG_ADD = 12345
_MERSENNE = 2_147_483_647


def portable_hash(id_col: Column) -> Column:
    """31-bit deterministic hash of an integer id, expressible in ANSI SQL:
    ``((id & (2^31-1)) * 1103515245 + 12345) % (2^31-1)``."""
    masked = F.pmod(id_col.cast("long"), F.lit(1 << 31))
    return F.pmod(masked * F.lit(_LCG_MUL) + F.lit(_LCG_ADD), F.lit(_MERSENNE))


def stratified_sample_flag(
    id_col: Column, rate_permille: int
) -> Column:
    """Boolean sample membership at ``rate_permille``/1000, deterministic in
    the id. Applied per stratum it yields proportional stratified sampling
    (each stratum is cut by the same id-uniform hash)."""
    return F.pmod(portable_hash(id_col), F.lit(1000)) < F.lit(rate_permille)


def stratified_sample(
    df: DataFrame, id_col: str, rate_permille: int
) -> DataFrame:
    """Filter to the deterministic sample (see stratified_sample_flag)."""
    return df.filter(stratified_sample_flag(F.col(id_col), rate_permille))


def weighted_sample_flag(id_col: Column, rate_permille: Column) -> Column:
    """Membership at a PER-ROW rate (0-1000 permille) — the data-mixing
    primitive: give each source/quality tier its own keep rate and the
    id-uniform hash cuts every tier at exactly that rate, deterministically.
    """
    return F.pmod(portable_hash(id_col), F.lit(1000)) < rate_permille


def hash_split(
    id_col: Column,
    breaks_permille: Sequence[int] = (800, 900),
    labels: Sequence[str] = ("train", "val", "test"),
) -> Column:
    """Deterministic dataset split label from the id hash: permille buckets
    [0, b0) -> labels[0], [b0, b1) -> labels[1], ..., rest -> labels[-1].

    A property of the row, not the run: the same id lands in the same split
    on every engine/partitioning/rerun (no leakage when a table is re-split
    after appends), and sidecar tables keyed by the same id split
    consistently.
    """
    if len(labels) != len(breaks_permille) + 1:
        raise ValueError("need exactly one more label than break")
    h = F.pmod(portable_hash(id_col), F.lit(1000))
    expr = F.lit(labels[-1])
    for brk, label in zip(reversed(breaks_permille), reversed(labels[:-1])):
        expr = F.when(h < F.lit(brk), F.lit(label)).otherwise(expr)
    return expr


def groupwise_outlier_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    z: float = 3.0,
) -> DataFrame:
    """Per group: n, mean, stddev (sample), and how many rows sit more than
    ``z`` sample standard deviations from the group mean.

    Two-pass plan: per-group moments (tiny — one row per group), broadcast
    back onto the data, one conditional count. Both passes shuffle on the
    group key only; no windows, no per-group sort.
    """
    group_cols = list(group_cols)
    v = F.col(value_col)
    stats = df.groupBy(*group_cols).agg(
        F.count(v).alias("__n"),
        F.avg(v).alias("__mean"),
        F.stddev_samp(v).alias("__std"),
    )
    is_outlier = (
        F.col("__std").isNotNull()
        & (F.col("__std") > 0)
        & (F.abs(v - F.col("__mean")) > F.lit(z) * F.col("__std"))
    )
    return (
        df.join(F.broadcast(stats), group_cols)
        .groupBy(*group_cols)
        .agg(
            F.max("__n").alias("n"),
            F.round(F.max("__mean"), 4).alias("mean"),
            F.round(F.max("__std"), 4).alias("stddev"),
            F.sum(is_outlier.cast("long")).alias("n_outliers"),
        )
    )


def group_percentiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    quantiles: Sequence[float] = (0.5, 0.95, 0.99),
    approximate: bool = False,
    accuracy: int = 10_000,
    round_to: int = 4,
) -> DataFrame:
    """Per-group quantiles of ``value_col`` — the latency-dashboard shape.

    ``approximate=False`` (default): exact interpolated percentiles
    (``F.percentile``). Spark buffers every group's values in the
    aggregation state, so memory per task is O(largest group) — fine while
    groups fit an executor, the oracle baseline for tests.

    ``approximate=True``: the declared 100-TB path (mirror of
    UniquenessRule's ``approximate=True`` HLL mode). ``approx_percentile``
    aggregates a bounded Greenwald-Khanna-style sketch instead of the raw
    values: state is O(accuracy * log n) per group REGARDLESS of group
    size, and sketches merge associatively, so the partial/final
    hash-aggregate stays map-side-combining with no per-group sort or
    buffer. Error bound: the returned value's RANK is within
    ``1/accuracy`` of the requested quantile (accuracy=10000 -> rank error
    <= 0.01 percentile points); the VALUE error that implies depends on
    the local density of the distribution, which is what the sf0.01
    exact-vs-approx agreement test asserts in practice.
    """
    v = F.col(value_col)
    aggs = [F.count(v).alias("n")]
    for q in quantiles:
        name = f"p{str(q)[2:].ljust(2, '0')}" if q < 1 else "p100"
        if approximate:
            expr = F.approx_percentile(v, F.lit(q), F.lit(accuracy))
        else:
            expr = F.percentile(v, F.lit(q))
        aggs.append(F.round(expr, round_to).alias(name))
    return df.groupBy(*group_cols).agg(*aggs).orderBy(*group_cols)


def cap_per_key(
    df: DataFrame,
    key_cols: Sequence[str] | str,
    max_rows: int,
    order_col: str,
    descending: bool = False,
) -> DataFrame:
    """Keep at most ``max_rows`` rows per key — the per-domain/per-source
    cap every web-scale corpus applies so no single host dominates the
    training mix (e.g. <= 10k docs per registered domain).

    Deterministic: survivors are the first ``max_rows`` by ``order_col``
    (ascending by default — pass ``descending=True`` to keep e.g. the
    HIGHEST-quality-score rows). One shuffle on the key; the rank filter
    compiles to a WindowGroupLimit, so each map task pre-trims its
    partition to ``max_rows`` per key BEFORE the exchange — a skewed key
    with 10^9 rows ships max_rows * n_tasks rows, not 10^9. ``order_col``
    should be a total order (an id) for reproducible survivors; ties on a
    non-unique column leave the survivor choice to Spark.
    """
    if max_rows <= 0:
        raise ValueError("max_rows must be positive")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(*keys).orderBy(order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_rows)
        .drop("__rn")
    )


def filter_top_fraction(
    df: DataFrame,
    score_col: str,
    keep_fraction: float,
    group_cols: Sequence[str] | None = None,
    accuracy: int = 10_000,
    exact: bool = False,
) -> DataFrame:
    """Keep the top ``keep_fraction`` of rows by score, optionally per
    group — quantile-threshold curation ("keep the best 30% per language"),
    the dynamic companion to fixed-threshold rules.

    Two passes, never a global sort: (1) a bounded approx_percentile
    sketch per group finds the score cutoff (state O(accuracy*log n) per
    group regardless of group size, partials merge map-side); (2) the
    cutoffs broadcast back onto the frame and the filter is a plain
    map-side predicate. With grouping the join is broadcast (one row per
    group); ungrouped it is a literal-free cross of a 1-row frame, same
    shape as groupwise_outlier_counts. The kept share is approximate at
    the sketch's rank-error bound (1/accuracy), systematically >= the
    request when ties straddle the cutoff (>= comparison keeps them).
    NULL scores are never kept.

    ``exact=True`` swaps the sketch for the exact interpolating percentile
    (ANSI ``percentile_cont`` semantics — the cutoff either equals an order
    statistic bit-exactly or falls strictly between two adjacent distinct
    scores, so the kept set is engine-reproducible). Exact mode buffers
    each group's scores in the aggregation state — fine for bounded groups
    and oracle checks; the sketch stays the 100-TB default.
    """
    if not 0.0 < keep_fraction <= 1.0:
        raise ValueError("keep_fraction must be in (0, 1]")
    q = 1.0 - keep_fraction
    s = F.col(score_col)
    if exact:
        cutoff = F.percentile(s, F.lit(q)).alias("__cut")
    else:
        cutoff = F.approx_percentile(s, F.lit(q), F.lit(accuracy)).alias("__cut")
    if group_cols:
        keys = list(group_cols)
        cuts = df.groupBy(*keys).agg(cutoff)
        joined = df.join(F.broadcast(cuts), keys, "left")
    else:
        joined = df.crossJoin(F.broadcast(df.agg(cutoff)))
    return joined.filter(s.isNotNull() & (s >= F.col("__cut"))).drop("__cut")


def temperature_mix_rates(
    df: DataFrame,
    key_col: str,
    alpha: float = 0.7,
    target_rows: int | None = None,
) -> DataFrame:
    """Per-key keep rates (permille) for temperature-based mixture
    sampling — the mT5/XLM-R rebalancing move: sampling mass proportional
    to ``count**alpha`` flattens the source/language distribution
    (alpha=1 keeps proportions, alpha=0 aims for uniform), rescaled so the
    EXPECTED kept total is ``target_rows`` (default: the corpus size).

    Rates are waterfilled on the driver over the per-key count frame —
    one row per key, so ``key_col`` must be low-cardinality (sources,
    languages, quality tiers), which is what mixture sampling means; the
    collect is bounded by that cardinality. Keys whose fair share exceeds
    their row count cap at 1000 permille and the excess mass redistributes
    to the rest, so the expected total hits the target even under heavy
    flattening. Rows with NULL keys are not part of any source and get no
    rate.

    Returns (key_col, n_rows, rate_permille); compose with
    ``weighted_sample_flag`` (or use ``temperature_mix``) — permille
    granularity keeps the cut deterministic and engine-reproducible.
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    from pyspark.sql import types as T

    counts = {
        r[0]: r[1]
        for r in df.filter(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(counts.values())
    if target_rows is None:
        target_rows = total
    if target_rows > total:
        raise ValueError(f"target_rows {target_rows} exceeds corpus size {total}")
    rates: dict = {}
    pool = dict(counts)
    remaining = float(target_rows)
    while pool:
        wsum = sum(n**alpha for n in pool.values())
        newly_capped = [
            k for k, n in pool.items() if remaining * (n**alpha) / wsum >= n
        ]
        if not newly_capped:
            for k, n in pool.items():
                want = remaining * (n**alpha) / wsum
                rates[k] = min(1000, max(0, int(round(1000.0 * want / n))))
            break
        for k in newly_capped:
            rates[k] = 1000
            remaining -= pool.pop(k)
    schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType),
            T.StructField("n_rows", T.LongType()),
            T.StructField("rate_permille", T.IntegerType()),
        ]
    )
    rows = [(k, int(counts[k]), int(rates[k])) for k in counts]
    return df.sparkSession.createDataFrame(rows, schema)


def temperature_mix(
    df: DataFrame,
    key_col: str,
    id_col: str,
    alpha: float = 0.7,
    target_rows: int | None = None,
) -> DataFrame:
    """Apply temperature-based mixture sampling: join the (tiny) rates
    frame back broadcast and cut each key at its rate with the
    deterministic id-uniform hash. Same row in, same row out, on any
    engine/partitioning/rerun. NULL-key rows are dropped (they belong to
    no source)."""
    rates = temperature_mix_rates(df, key_col, alpha, target_rows)
    return (
        df.join(F.broadcast(rates.select(key_col, "rate_permille")), key_col)
        .filter(weighted_sample_flag(F.col(id_col), F.col("rate_permille")))
        .drop("rate_permille")
    )
