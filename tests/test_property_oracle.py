"""Randomised differential testing: engine vs a literal pandas oracle.

The oracle implements the reference's evaluation algebra directly in pandas
(rules/base.py:164-212 — subset, coerce, na-replace, skip mask, passing mask,
fillna(False), conditional counts) and the engine must agree on pass_rate and
records_evaluated for every generated frame. Seeded numpy generation keeps
runs deterministic while covering nulls, NaN, sentinels, mixed types, and
boundary values the YAML corpus doesn't enumerate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gchq_data_quality_spark import (
    AccuracyRule,
    CompletenessRule,
    ConsistencyRule,
    UniquenessRule,
    ValidityNumericalRangeRule,
    ValidityRegexRule,
    evaluate_rules,
)

from .conftest import spark_df_from_dict


# ---------------------------------------------------------------------------
# pandas oracle (reference semantics, written against the spec in SURVEY §3.1)
# ---------------------------------------------------------------------------

def _replace_na(series: pd.Series, na_values) -> pd.Series:
    out = series.copy()
    mask = out.isna()
    if na_values is not None:
        values = na_values if isinstance(na_values, list) else [na_values]
        mask = mask | out.isin(values)
    out[mask] = None
    return out


def oracle(rule, data: dict[str, list]) -> tuple[int, float | None]:
    pdf = pd.DataFrame({k: pd.Series(v, dtype="object") for k, v in data.items()})

    if isinstance(rule, CompletenessRule):
        col = _replace_na(pdf[rule.field], rule.na_values)
        evaluated = len(col)
        passing = int(col.notna().sum())
    elif isinstance(rule, UniquenessRule):
        col = _replace_na(pdf[rule.field], rule.na_values).dropna()
        evaluated = len(col)
        passing = col.nunique()
    elif isinstance(rule, AccuracyRule):
        col = _replace_na(pdf[rule.field], rule.na_values).dropna()
        evaluated = len(col)
        hit = col.isin(rule.valid_values)
        passing = int((~hit if rule.inverse else hit).sum())
    elif isinstance(rule, ValidityNumericalRangeRule):
        col = pd.to_numeric(pdf[rule.field], errors="coerce")
        col = _replace_na(col, rule.na_values)
        col = pd.to_numeric(col, errors="coerce").dropna()
        evaluated = len(col)
        passing = int(((col >= rule.min_value) & (col <= rule.max_value)).sum())
    elif isinstance(rule, ValidityRegexRule):
        col = _replace_na(pdf[rule.field], rule.na_values).dropna().astype(str)
        evaluated = len(col)
        passing = int(col.str.match(rule.regex_pattern).sum())
    elif isinstance(rule, ConsistencyRule):
        # simple string expressions over two numeric columns, skip_if_null=all
        cols = rule.columns_used()
        sub = pdf[cols].apply(lambda s: pd.to_numeric(_replace_na(s, rule.na_values), errors="coerce"))
        skip = sub.isnull().all(axis=1) if rule.skip_if_null == "all" else (
            sub.isnull().any(axis=1) if rule.skip_if_null == "any" else pd.Series(False, index=sub.index)
        )
        evaluated_mask = ~skip
        passing_mask = sub.eval(rule.expression.replace("`", "")).fillna(False)
        evaluated = int(evaluated_mask.sum())
        passing = int((evaluated_mask & passing_mask).sum())
    else:  # pragma: no cover
        raise NotImplementedError
    rate = passing / evaluated if evaluated else None
    return evaluated, rate


# ---------------------------------------------------------------------------
# generators
# ---------------------------------------------------------------------------

def _numeric_column(rng, n):
    vals = []
    for _ in range(n):
        r = rng.random()
        if r < 0.15:
            vals.append(None)
        elif r < 0.25:
            vals.append(-999)  # sentinel
        elif r < 0.35:
            vals.append(int(rng.integers(-5, 5)))
        else:
            vals.append(round(float(rng.normal(50, 40)), 3))
    return vals

def _string_column(rng, n):
    pool = ["alpha", "Beta", "gamma42", "N/A", "", "dup", "dup", "zz top"]
    return [None if rng.random() < 0.2 else pool[int(rng.integers(len(pool)))] for _ in range(n)]


CASES = []
_rng = np.random.default_rng(1234)
for case_i in range(12):
    n = int(_rng.integers(1, 40))
    CASES.append((case_i, n))


@pytest.mark.parametrize("case_i,n", CASES)
def test_randomised_against_pandas_oracle(spark, case_i, n):
    rng = np.random.default_rng(9000 + case_i)
    data = {
        "num": _numeric_column(rng, n),
        "num2": _numeric_column(rng, n),
        "txt": _string_column(rng, n),
    }
    rules = [
        CompletenessRule(field="txt", na_values=["N/A", ""]),
        UniquenessRule(field="txt", na_values="N/A"),
        AccuracyRule(field="txt", valid_values=["alpha", "dup"], na_values=[""]),
        AccuracyRule(field="txt", valid_values=["Beta"], inverse=True),
        ValidityNumericalRangeRule(field="num", min_value=0, max_value=80, na_values=-999),
        ValidityNumericalRangeRule(field="num", max_value=0),
        ValidityRegexRule(field="txt", regex_pattern="[a-z]+", na_values=""),
        ConsistencyRule(field="num", expression="`num` < `num2`", na_values=-999),
        ConsistencyRule(field="num", expression="`num` < `num2`", skip_if_null="never", na_values=-999),
    ]
    df = spark_df_from_dict(spark, data)
    results = evaluate_rules(df, rules, collect_samples=False)
    for rule, result in zip(rules, results, strict=True):
        want_eval, want_rate = oracle(rule, data)
        assert result.records_evaluated == want_eval, (
            f"case {case_i} {rule.function} {getattr(rule, 'expression', rule.field)}: "
            f"evaluated {result.records_evaluated} != oracle {want_eval}"
        )
        if want_rate is None:
            assert result.pass_rate is None
        else:
            assert result.pass_rate == pytest.approx(want_rate, abs=1e-9), (
                f"case {case_i} {rule.function}: rate {result.pass_rate} != {want_rate}"
            )
