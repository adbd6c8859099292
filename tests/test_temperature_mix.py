"""Temperature-based mixture sampling (stats.temperature_mix_rates / _mix):
rates proportional to count**alpha with driver-side waterfilling, applied
through the deterministic permille hash cut."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gchq_data_quality_spark.functions.stats import (
    temperature_mix,
    temperature_mix_rates,
)


def _corpus(spark, sizes: dict):
    rows, i = [], 0
    for src, n in sizes.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_rates_alpha_one_is_proportional(spark):
    df = _corpus(spark, {"a": 900, "b": 100})
    rates = {
        r.source: r
        for r in temperature_mix_rates(df, "source", alpha=1.0, target_rows=500).collect()
    }
    # alpha=1 keeps proportions: every key gets the same rate = target/total
    assert rates["a"].rate_permille == rates["b"].rate_permille == 500
    assert rates["a"].n_rows == 900 and rates["b"].n_rows == 100


def test_rates_alpha_zero_waterfills_small_sources(spark):
    df = _corpus(spark, {"big": 900, "small": 100})
    rates = {
        r.source: r.rate_permille
        for r in temperature_mix_rates(df, "source", alpha=0.0, target_rows=500).collect()
    }
    # uniform target = 250 each; 'small' caps at its full 100 rows and the
    # unfilled 150 redistribute to 'big': 400/900 = 444 permille
    assert rates["small"] == 1000
    assert rates["big"] == 444


def test_rates_default_target_is_corpus_size(spark):
    df = _corpus(spark, {"a": 300, "b": 300})
    rates = {
        r.source: r.rate_permille
        for r in temperature_mix_rates(df, "source", alpha=0.5).collect()
    }
    assert rates == {"a": 1000, "b": 1000}  # equal sources, full target


def test_rates_validation(spark):
    df = _corpus(spark, {"a": 10})
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix_rates(df, "source", alpha=-1)
    with pytest.raises(ValueError, match="target_rows"):
        temperature_mix_rates(df, "source", target_rows=100)


def test_temperature_mix_cut_is_deterministic_and_on_target(spark):
    sizes = {"a": 2000, "b": 500, "c": 100}
    df = _corpus(spark, sizes)
    out = temperature_mix(df, "source", "doc_id", alpha=0.3, target_rows=1000)
    kept = out.groupBy("source").count().collect()
    got = {r.source: r["count"] for r in kept}
    rates = {
        r.source: r.rate_permille
        for r in temperature_mix_rates(df, "source", alpha=0.3, target_rows=1000).collect()
    }
    for src, n in sizes.items():
        expected = n * rates[src] / 1000.0
        assert abs(got.get(src, 0) - expected) <= max(40, 0.15 * expected), (
            src, got, rates,
        )
    # determinism: the same cut twice is row-identical
    again = temperature_mix(df, "source", "doc_id", alpha=0.3, target_rows=1000)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_temperature_mix_drops_null_keys(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, None)], "doc_id long, source string"
    )
    out = temperature_mix(df, "source", "doc_id", alpha=1.0)
    assert sorted(r.doc_id for r in out.collect()) == [1, 2, 3]
