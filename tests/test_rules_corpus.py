"""Differential tests: the reference's YAML rule corpus vs this engine.

Every case builds the rule from the YAML ``inputs``, runs it through the
single-pass engine on a Spark DataFrame, and checks pass_rate /
records_evaluated / failed samples against the reference's expected labels.
"""

from __future__ import annotations

import pytest

from gchq_data_quality_spark import (
    AccuracyRule,
    CompletenessRule,
    ConsistencyRule,
    TimelinessRelativeRule,
    TimelinessStaticRule,
    UniquenessRule,
    ValidityNumericalRangeRule,
    ValidityRegexRule,
    evaluate_rules,
)

from .conftest import assert_result_matches, case_ids, load_cases, spark_df_from_dict

RULE_FILES = [
    (CompletenessRule, "completeness"),
    (UniquenessRule, "uniqueness"),
    (AccuracyRule, "accuracy"),
    (ValidityRegexRule, "validity_regex"),
    (ValidityNumericalRangeRule, "validity_numerical_range"),
    (ConsistencyRule, "consistency"),
    (TimelinessStaticRule, "timeliness_static"),
    (TimelinessRelativeRule, "timeliness_relative"),
]


def _params():
    params = []
    for rule_cls, name in RULE_FILES:
        cases = load_cases(name)
        ids = case_ids(cases)
        for case, cid in zip(cases, ids, strict=True):
            params.append(pytest.param(rule_cls, case, id=f"{name}-{cid}"))
    return params


@pytest.mark.parametrize("rule_cls,case", _params())
def test_rule_case(spark, rule_cls, case):
    inputs = dict(case["inputs"])
    data = inputs.pop("df")
    rule = rule_cls(**inputs)
    df = spark_df_from_dict(spark, data)
    [result] = evaluate_rules(df, [rule])
    assert_result_matches(result, case["expected"])
