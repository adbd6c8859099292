"""cap_per_key (per-domain caps) and filter_top_fraction (quantile-
threshold curation): determinism, exact survivor sets vs Python
references, map-side WindowGroupLimit plan shape, null handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gchq_data_quality_spark.functions.stats import (
    cap_per_key,
    filter_top_fraction,
)


def _skewed(spark):
    # domain d0 has 40 rows, d1 has 10, d2 has 3 — id is a total order
    rows = (
        [(i, "d0", float(i % 17)) for i in range(40)]
        + [(100 + i, "d1", float(i)) for i in range(10)]
        + [(200 + i, "d2", float(i)) for i in range(3)]
    )
    return spark.createDataFrame(rows, "id long, domain string, score double")


def test_cap_per_key_counts_and_survivors(spark):
    df = _skewed(spark)
    capped = cap_per_key(df, "domain", 5, "id")
    got = capped.groupBy("domain").count().collect()
    assert {r.domain: r["count"] for r in got} == {"d0": 5, "d1": 5, "d2": 3}
    # ascending id order -> the 5 smallest ids survive per domain
    ids = sorted(r.id for r in capped.filter(F.col("domain") == "d0").collect())
    assert ids == [0, 1, 2, 3, 4]


def test_cap_per_key_descending_keeps_best(spark):
    df = _skewed(spark)
    top = cap_per_key(df, "domain", 2, "score", descending=True)
    d1 = sorted(r.score for r in top.filter(F.col("domain") == "d1").collect())
    assert d1 == [8.0, 9.0]
    with pytest.raises(ValueError):
        cap_per_key(df, "domain", 0, "id")


def test_cap_per_key_plan_is_group_limited(spark):
    """The rank<=k filter must compile to WindowGroupLimit (partial rank
    trimming BEFORE the exchange) — the property that makes a 10^9-row
    skewed key ship max_rows*n_tasks rows instead of 10^9."""
    df = _skewed(spark)
    plan = (
        cap_per_key(df, "domain", 5, "id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan


def test_filter_top_fraction_grouped(spark):
    df = _skewed(spark)
    kept = filter_top_fraction(df, "score", 0.3, group_cols=["domain"])
    rows = kept.collect()
    # every kept score >= every dropped score within its group
    kept_ids = {r.id for r in rows}
    by_domain: dict[str, list] = {}
    for r in df.collect():
        by_domain.setdefault(r.domain, []).append(r)
    for domain, drs in by_domain.items():
        kept_scores = [r.score for r in drs if r.id in kept_ids]
        dropped_scores = [r.score for r in drs if r.id not in kept_ids]
        assert kept_scores, domain
        assert min(kept_scores) >= max(dropped_scores), domain
        # kept share is ~the request (ties can push it over, never under
        # by more than one rank at this accuracy)
        frac = len(kept_scores) / len(drs)
        assert frac >= 0.25, (domain, frac)


def test_filter_top_fraction_ungrouped_and_nulls(spark):
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)] + [(100, None)],
        "id long, score double",
    )
    kept = filter_top_fraction(df, "score", 0.1)
    ids = sorted(r.id for r in kept.collect())
    assert 100 not in ids  # NULL score never kept
    # contract: the kept set is a contiguous TOP block (dominance) whose
    # size is the request give-or-take one rank — the inclusive >= keeps
    # the cutoff element itself, so 0.1 over 100 distinct scores keeps 10
    # or 11 rows depending on which side of the rank the sketch lands
    assert len(ids) in (10, 11)  # cutoff rank error headroom
    assert ids == list(range(100 - len(ids), 100))  # top block, no gaps
    with pytest.raises(ValueError):
        filter_top_fraction(df, "score", 0.0)


def test_filter_top_fraction_keep_all(spark):
    df = _skewed(spark)
    assert filter_top_fraction(df, "score", 1.0).count() == df.count()
