"""Ordered / range relational operators the reference lacks and Spark has no
built-in for: as-of (merge-asof) join and bucketed range join.

Both are implemented as compositions of existing DataFrame ops (no UDFs), in
the shapes that survive 100 TB:

- ``asof_join``: the union + ordered-window formulation — ONE shuffle on the
  ``by`` keys, no join at all, no per-key fan-out. Equivalent semantics to
  pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` (direction='backward').
  A naive formulation (theta-join on ``l.ts >= r.ts`` + argmax) explodes to
  |L|x|R| per key before aggregating; this one is linear in |L|+|R| after
  one sort within each key partition.

- ``bucketed_range_join``: pairs (l, r) with equal ``by`` keys and
  ``r.point`` within ``[l.point + lower, l.point + upper]``. A raw
  inequality join is a per-key cross product; bucketing ``point`` to buckets
  of width ``upper - lower`` means every qualifying pair shares one of at
  most TWO consecutive buckets, so an equi-join on (by, bucket) with the
  left side exploded into its <=2 candidate buckets finds every pair, and
  the exact range predicate filters the rest. Shuffle is the equi-join's
  hash exchange on (by, bucket) — broadcastable / skew-salting-friendly
  like any equi-join, which an inequality join is not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_on: str,
    right_on: str,
    value_cols: Sequence[str],
    strict: bool = False,
    tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row of
    the same ``by`` key with ``right_on <= left_on`` (``<`` when ``strict``)
    — or, with ``direction='forward'``, the EARLIEST right row with
    ``right_on >= left_on`` (``>`` when ``strict``).

    Returns all left columns plus one ``value_col`` each (NULL when no right
    row qualifies) — semantics of pandas ``merge_asof(direction=...,
    allow_exact_matches=not strict)``.

    Plan shape: tag the two inputs, union, ONE window sorted by
    (ts, side, tiebreak) within each ``by`` partition — descending ts for
    the forward direction, so "the nearest qualifying right row" is always
    the most recent payload in sort order — carry it with
    last(ignorenulls), keep the left rows. The right payload rides in a
    struct so legitimately-NULL right values are still "seen" (the struct
    itself is non-null for right rows).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = list(by)
    value_cols = list(value_cols)
    # strict: right rows at ts == left ts must sort AFTER the left row so the
    # running last() hasn't seen them; non-strict: before.
    left_side, right_side = (0, 1) if strict else (1, 0)
    lcols = [c for c in left.columns]
    payload = F.struct(*[F.col(c) for c in value_cols]).alias("__rpayload")

    lpart = left.select(
        *by,
        F.col(left_on).alias("__ts"),
        F.lit(left_side).alias("__side"),
        F.lit(None).cast(
            right.select(payload).schema["__rpayload"].dataType
        ).alias("__rpayload"),
        F.struct(*[F.col(c) for c in lcols]).alias("__lrow"),
    )
    rpart = right.select(
        *by,
        F.col(right_on).alias("__ts"),
        F.lit(right_side).alias("__side"),
        payload,
        F.lit(None).cast(lpart.schema["__lrow"].dataType).alias("__lrow"),
    )
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    order = [ts_order, F.col("__side")]
    if tiebreak is not None:
        # deterministic order among LEFT rows sharing a timestamp
        order.append(F.col("__lrow").getField(tiebreak))
    # right rows sharing (by, ts): which payload wins is semantically
    # unspecified, but make the choice STABLE across runs/partitionings by
    # ordering on a hash of the payload itself (NULL for left rows, so the
    # left ordering above is untouched)
    order.append(F.xxhash64(F.col("__rpayload")))
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        lpart.unionByName(rpart)
        .withColumn("__match", F.last("__rpayload", ignorenulls=True).over(w))
        .filter(F.col("__side") == left_side)
    )
    out_cols = [F.col("__lrow").getField(c).alias(c) for c in lcols]
    out_cols += [F.col("__match").getField(c).alias(c) for c in value_cols]
    return merged.select(*out_cols)


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_point: str,
    right_point: str,
    lower: int,
    upper: int,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner range join: rows with equal ``by`` keys and
    ``left_point + lower <= right_point <= left_point + upper``.

    ``left_point`` / ``right_point`` must be integer-valued columns (cast
    timestamps to ``unix_micros`` first); ``lower``/``upper`` are integer
    offsets in the same unit, ``lower <= upper``.

    Output columns: the ``by`` keys, then every non-key column of each side
    under its prefix. Equi-join on (by, bucket) with bucket width
    ``upper - lower`` (so a left row has at most 2 candidate buckets),
    followed by the exact range filter.
    """
    if lower > upper:
        raise ValueError("lower must be <= upper")
    by = list(by)
    width = max(upper - lower, 1)

    def floor_div(x_sql: str) -> Column:
        # EXACT integer floor division via the SQL `div` operator. Any
        # formulation through `/` divides as DOUBLE: above 2^53 (epoch
        # micros ~1.7e18) the quotient carries ~1e-10 of rounding error, so
        # points near a bucket boundary can floor to the wrong bucket and
        # silently lose qualifying pairs. pmod(x, w) is non-negative, so
        # (x - pmod) is an exact multiple and truncating `div` == floor for
        # either sign of x.
        return F.expr(
            f"(({x_sql}) - pmod(({x_sql}), {width})) div {width}"
        )

    lo_b = floor_div(f"`{left_point}` + ({lower})")
    hi_b = floor_div(f"`{left_point}` + ({upper})")

    lkeep = [c for c in left.columns if c not in by]
    rkeep = [c for c in right.columns if c not in by]
    lx = left.select(
        *by,
        F.explode(F.array_distinct(F.array(lo_b, hi_b))).alias("__bucket"),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in lkeep],
    )
    rx = right.select(
        *by,
        floor_div(f"`{right_point}`").alias("__bucket"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in rkeep],
    )
    lp = F.col(f"{left_prefix}{left_point}")
    rp = F.col(f"{right_prefix}{right_point}")
    return (
        lx.join(rx, [*by, "__bucket"])
        .filter((rp >= lp + F.lit(lower)) & (rp <= lp + F.lit(upper)))
        .drop("__bucket")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
    strict: bool = True,
    method: str = "minid",
    small_graph_edges: int = 100_000,
) -> DataFrame:
    """Exact connected components of an undirected edge list: (id, label)
    with ``label`` = the smallest id in the node's component.

    Hybrid execution: the edge list is materialised once (every strategy
    needs that anyway) and COUNTED; at or below ``small_graph_edges`` the
    components are solved by a driver-side union-find over the collected
    edges — a bounded collect (the threshold caps driver memory at a few
    MB) that replaces 10-20 tiny shuffle rounds with one pass, the right
    call whenever the near-dup graph is orders of magnitude smaller than
    the corpus (the common case: 256 edges at sf0.1 cost 1.7 s of round
    overhead distributed, ~0.2 s collected). Above the threshold the
    distributed algorithms below run unchanged; pass
    ``small_graph_edges=0`` to force them (the regression tests do).

    ``method="minid"`` (default): min-id label propagation run to
    CONVERGENCE (unlike minhash_dedup's bounded variant): each round joins
    labels across edges and takes the min; stops when no label changed.
    Rounds needed = graph DIAMETER; each round shuffles only the edge list
    (the near-dup graph, orders of magnitude smaller than the corpus). The
    convergence probe is a 1-row count, and each round's result is
    localCheckpoint-ed so lineage (and recomputation) stays O(1) per round.
    The right default for near-dup clusters, which are shallow near-cliques
    (diameter 2-3).

    ``method="star"``: alternating large-star/small-star contractions
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    converges in O(log n) rounds regardless of diameter, the difference
    between 6 and 60 shuffles on a pathological chain at 100x scale. Same
    output contract; pick it when components may be long paths (temporal
    chains, linkage graphs).

    ``strict=True`` (default) raises RuntimeError if still converging
    after ``max_iters`` rounds — silently returning split components would
    corrupt every downstream dedup decision. Pass ``strict=False`` to
    accept bounded propagation (minhash_dedup-style; minid only).
    """
    if method not in ("minid", "star"):
        raise ValueError(f"unknown method {method!r}: use 'minid' or 'star'")
    # materialise the CANONICAL edge list ONCE: every strategy iterates
    # over it, and without the checkpoint each round would re-run the whole
    # upstream pipeline that produced the pairs (e.g. LSH + exact
    # verification — measured 3x the total query cost at sf0.1). The
    # count it yields is free (the data is local) and drives the
    # small-graph dispatch.
    canon = (
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("hi"),
            F.least(F.col(id_a), F.col(id_b)).alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint()
    )
    if canon.count() <= small_graph_edges:
        return _connected_components_driver(canon)
    if method == "star":
        return _connected_components_star(canon, max_iters, strict)
    edges = (
        canon.select(F.col("hi").alias("src"), F.col("lo").alias("dst"))
        .union(canon.select(F.col("lo").alias("src"), F.col("hi").alias("dst")))
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    n_changed = 0
    for _ in range(max_iters):
        neighbour_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nmin"))
        )
        updated = (
            labels.join(neighbour_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nmin", "label")
                ).alias("label"),
                (F.col("nmin") < F.col("label")).alias("__changed"),
            )
            .localCheckpoint()
        )
        n_changed = updated.filter(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if n_changed == 0:
            break
    if strict and n_changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(component diameter exceeds max_iters); raise max_iters or "
            "pass strict=False to accept bounded propagation"
        )
    return labels


def _connected_components_driver(canon: DataFrame) -> DataFrame:
    """Union-find over a collected canonical edge list — the small-graph
    fast path (caller enforces the bound). Path-halving find + min-root
    union keeps the label = component minimum directly."""
    rows = canon.collect()
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        a, b = r["hi"], r["lo"]
        ra, rb = find(a), find(b)
        if ra != rb:
            # attach the larger root under the smaller: roots stay minima
            lo_r, hi_r = (ra, rb) if ra < rb else (rb, ra)
            parent[hi_r] = lo_r
    nodes = {v for r in rows for v in (r["hi"], r["lo"])}
    out = [(v, find(v)) for v in sorted(nodes)]
    id_type = canon.schema["hi"].dataType
    schema = T.StructType(
        [T.StructField("id", id_type), T.StructField("label", id_type)]
    )
    # LocalRelation-backed (falls back to createDataFrame past the literal
    # bound): downstream aggregations over the label frame start one AQE
    # stage earlier and a plain collect is driver-local (sources/local.py)
    from gchq_data_quality_spark.sources.local import local_values_df

    return local_values_df(canon.sparkSession, out, schema)


def _star_checksum(edges: DataFrame) -> tuple[int, int]:
    """(count, order-independent xor of edge hashes) — the convergence
    probe. bit_xor never overflows, so the probe is ANSI-safe at any edge
    count; a checksum collision between DIFFERENT consecutive edge sets
    needs a 64-bit xor coincidence at equal cardinality."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("hi", "lo")), F.lit(0)).alias("x"),
    ).collect()[0]
    return int(row["n"]), int(row["x"])


def _connected_components_star(
    canon: DataFrame, max_iters: int, strict: bool
) -> DataFrame:
    """Alternating large-star / small-star contraction. Edges are kept
    CANONICAL (hi > lo) throughout — both operations preserve that
    orientation because every emitted edge points a node at a value no
    larger than its neighborhood minimum.

    large-star: for each node u, hook every LARGER neighbor v onto
    m = min(neighborhood(u) + {u}).
    small-star: orient edges larger->smaller; for each hub u, hook u and
    all its smaller neighbors onto their minimum.

    Both are join-based (per-node min via groupBy + one equi-join back),
    never a collect_list — a hot hub node costs a wide join fan-out, not
    an unbounded in-memory array. Each round localCheckpoints the edge
    set: O(1) lineage, and the convergence checksum reads the
    materialised set. Converges in O(log n) rounds (Kiveris et al.);
    at convergence the edge set IS the star forest (node -> component
    min), which is exactly the output contract. ``canon`` is the caller's
    already-checkpointed canonical (hi > lo, distinct) edge frame."""
    edges = canon
    checksum = _star_checksum(edges)
    converged = False
    for _ in range(max_iters):
        # ---- large-star ----
        bidir = edges.select(
            F.col("hi").alias("u"), F.col("lo").alias("v")
        ).union(edges.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
        mins = bidir.groupBy("u").agg(F.min("v").alias("mv")).select(
            "u", F.least(F.col("mv"), F.col("u")).alias("m")
        )
        edges = (
            bidir.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
        )
        # ---- small-star ----
        mins = edges.groupBy("hi").agg(F.min("lo").alias("m"))
        joined = edges.join(mins, "hi")
        edges = (
            joined.select(
                F.explode(
                    F.array(
                        F.struct(F.col("lo").alias("hi"), F.col("m").alias("lo")),
                        F.struct(F.col("hi").alias("hi"), F.col("m").alias("lo")),
                    )
                ).alias("e")
            )
            .select("e.hi", "e.lo")
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
            .localCheckpoint()
        )
        new_checksum = _star_checksum(edges)
        if new_checksum == checksum:
            converged = True
            break
        checksum = new_checksum
    if strict and not converged:
        raise RuntimeError(
            f"connected_components(method='star') did not converge in "
            f"{max_iters} rounds; raise max_iters"
        )
    return edges.select(F.col("hi").alias("id"), F.col("lo").alias("label")).union(
        edges.select(F.col("lo").alias("id"), F.col("lo").alias("label"))
    ).distinct()
