"""Approximate-nearest-neighbour search over an embedding column.

- brute_force_topk : exact cosine top-k per query (baseline/oracle) —
  broadcast the (small) query set, cross-evaluate with native array exprs,
  rank with a window. Cost O(n_rows * n_queries), fine for verification.
- ivf_topk         : the scale path — a coarse IVF index: k-means-ish
  centroids picked deterministically, every row assigned to its nearest
  centroid (one pass), queries probe only the nearest `n_probe` cells.
  At 10^12 rows this turns a full scan per query into a partition-pruned
  fraction (n_probe / n_cells) of the data.

Everything is Spark-native: dot products via zip_with + aggregate, ranking
via window functions; the centroid table is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gchq_data_quality_spark.functions.dedup import cosine_similarity


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank).

    ``queries``: (query_id, embedding). The query side is broadcast — the big
    table is scanned ONCE for all queries (never once per query).
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec")
    )
    joined = df.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(q))
    scored = joined.select(
        query_id_col,
        id_col,
        cosine_similarity(F.col(vec_col), F.col("__qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def assign_cells(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    sim_col: str | None = None,
) -> DataFrame:
    """Add a ``cell`` column = the centroid with the highest cosine to each
    row's vector (ties broken toward the larger cell id); optionally also
    the winning cosine as ``sim_col``.

    The centroid table — (cell, centroid array) — is collected (it is tiny
    by construction: n_cells rows) and inlined as literals, so the argmax is
    a greatest-of-structs expression that stays inside whole-stage codegen:
    no join, no shuffle, one map-side pass over the data.
    """
    cells = centroids.collect()
    if not cells:
        raise ValueError("assign_cells: centroid table is empty")
    best = None
    for row in cells:
        centroid = F.array(*[F.lit(float(x)) for x in row["centroid"]])
        raw = cosine_similarity(F.col(vec_col), centroid)
        # a degenerate (zero-norm) centroid or row yields NaN, and NaN sorts
        # GREATER than every double in Spark's struct comparison — it would
        # win every argmax; map it below the cosine range instead. The
        # bind-once transform keeps the cosine (a HOF tree, no CSE)
        # evaluated a single time despite the two references.
        sim = F.transform(
            F.array(raw),
            lambda v: F.when(F.isnan(v), F.lit(-2.0)).otherwise(v),
        )[0]
        candidate = F.struct(sim.alias("sim"), F.lit(row["cell"]).alias("cell"))
        best = candidate if best is None else F.greatest(best, candidate)
    out = df.withColumn("cell", best["cell"])
    if sim_col is not None:
        # second reference re-evaluates the HOF tree (no CSE on HOF subtrees
        # — see CLAUDE.md); accepted: the argmax is map-side and n_cells-small,
        # and the index-build path passes sim_col=None (single reference).
        out = out.withColumn(sim_col, best["sim"])
    return out


def build_ivf_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """(indexed_df, centroids): assign every row to its nearest centroid.

    Centroids are chosen deterministically: the rows whose xxhash64(id) is
    smallest (a seedless reservoir). One shuffle to write the cell column —
    at scale you'd persist the indexed table partitioned by cell so probes
    prune partitions.
    """
    centroids = (
        df.select(F.col(id_col), F.col(vec_col))
        .withColumn("__h", F.xxhash64(F.col(id_col).cast("string")))
        .orderBy("__h")
        .limit(n_cells)
        .withColumn("cell", F.monotonically_increasing_id())
        .select("cell", F.col(vec_col).alias("centroid"))
    )
    indexed = assign_cells(df, centroids, vec_col)
    return indexed, centroids


def semantic_dedup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_cells: int = 16,
    max_bucket: int = 64,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Cluster-then-dedup (the SemDeDup recipe): assign every row to its
    nearest centroid (map-side argmax, no shuffle), then verify exact
    cosine WITHIN each cell via the shared capped pair-expansion engine —
    one shuffle on the cell key, no self-join, per-cell fan-out bounded by
    ``max_bucket``.

    Complement to ``dedup.embedding_dedup_pairs`` (hyperplane LSH): cells
    are DATA-AWARE buckets, so near-duplicate clusters — which argmax to
    the same centroid when tight — land together with fewer buckets and no
    multi-band duplication. The trade is recall at cell boundaries: a pair
    split across two cells is never compared (SemDeDup's own documented
    property); use the hyperplane-LSH variant when boundary pairs matter.
    ``centroids``: reuse a pre-built (cell, centroid) table — e.g. from
    build_ivf_index — instead of deriving one from ``df``.
    """
    from gchq_data_quality_spark.functions.dedup import _expand_bucket_pairs

    if centroids is None:
        indexed, _ = build_ivf_index(df, vec_col, id_col, n_cells)
    else:
        indexed = assign_cells(df, centroids, vec_col)
    bucketed = indexed.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "cell"
    )
    return _expand_bucket_pairs(
        bucketed,
        keys=["cell"],
        member=F.struct(F.col("id"), F.col("v")),
        make_pair=lambda x, y: F.struct(
            x["id"].alias("id_a"),
            y["id"].alias("id_b"),
            cosine_similarity(x["v"], y["v"]).alias("cosine"),
        ),
        max_bucket=max_bucket,
        keep=lambda p: p["cosine"] >= threshold,
    ).select("p.id_a", "p.id_b", "p.cosine").distinct()


def write_ivf_index(indexed: DataFrame, path: str) -> DataFrame:
    """Persist the indexed table PARTITIONED BY cell and return the re-read.

    This is what makes IVF pruning real at scale: probes carry an explicit
    ``cell IN (...)`` predicate (see ivf_topk), which Catalyst turns into
    PartitionFilters on a cell-partitioned layout — the scan reads only the
    n_probe cell directories, not the whole table. Without the partitioned
    layout the same query is a full scan + filter.
    """
    indexed.write.mode("overwrite").partitionBy("cell").parquet(path)
    return indexed.sparkSession.read.parquet(path)


def ivf_topk(
    indexed: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """ANN top-k probing only the n_probe nearest cells per query.

    The union of probed cells is pushed as an explicit ``cell IN (...)``
    filter BEFORE the probe join: on an index written with
    ``write_ivf_index`` (parquet partitioned by cell) this becomes a
    partition-pruned scan reading only the probed cell directories
    (asserted in tests/test_plan_quality.py).
    """
    cents = centroids.collect()
    q_rows = queries.collect()
    probe_pairs = []
    for q in q_rows:
        sims = []
        for c in cents:
            qa, ca = q[vec_col], c["centroid"]
            dot = sum(x * y for x, y in zip(qa, ca, strict=True))
            norm = (sum(x * x for x in qa) ** 0.5) * (sum(y * y for y in ca) ** 0.5)
            sims.append((dot / norm if norm else 0.0, c["cell"]))
        sims.sort(reverse=True)
        for _, cell in sims[:n_probe]:
            probe_pairs.append((q[query_id_col], cell, list(q[vec_col])))
    spark = indexed.sparkSession
    probes = spark.createDataFrame(
        probe_pairs, f"{query_id_col} long, cell long, __qvec array<float>"
    )
    probed_cells = sorted({cell for _, cell, _ in probe_pairs})
    joined = indexed.filter(F.col("cell").isin(probed_cells)).join(
        F.broadcast(probes), "cell"
    )
    scored = joined.select(
        query_id_col,
        id_col,
        cosine_similarity(F.col(vec_col), F.col("__qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )
