"""Config surface: YAML round-trip, regex substitution, multi-file merge,
report round-trip, nested end-to-end execution.

Mirrors the reference's config tests (tests/config/) and the nested
execution test (tests/spark/test_execution_spark.py:22-42).
"""

from __future__ import annotations

import warnings

import pytest
import yaml

from gchq_data_quality_spark import (
    CompletenessRule,
    DataQualityConfig,
    UniquenessRule,
    ValidityRegexRule,
    annotate,
    evaluate_rules,
)


@pytest.fixture()
def config_yaml(tmp_path):
    cfg = {
        "dataset_name": "people",
        "measurement_sample": "all",
        "rules": [
            {"function": "completeness", "field": "name"},
            {"function": "uniqueness", "field": "id"},
            {"function": "validity_regex", "field": "email", "regex_pattern": "EMAIL_REGEX"},
            {"function": "accuracy", "field": "category", "valid_values": ["A", "B", "C"]},
            {"function": "validity_numerical_range", "field": "age", "min_value": 0, "max_value": 120},
            {"function": "consistency", "field": "score", "expression": "`score` >= 0"},
            {"function": "timeliness_static", "field": "date", "start_date": "2022-01-01"},
        ],
    }
    path = tmp_path / "cfg.yaml"
    path.write_text(yaml.safe_dump(cfg))
    regex_path = tmp_path / "regex.yaml"
    regex_path.write_text(yaml.safe_dump({"EMAIL_REGEX": r".*@.*\..*"}))
    return path, regex_path


@pytest.fixture()
def people_df(spark):
    # the reference's canonical fixture shape (tests/spark/conftest.py:215-238)
    rows = [
        (1, 1, "Alice", 30, "alice@x.com", "A", 10, "2023-05-01"),
        (2, 2, "Bob", 102, "bob@y.org", "B", 20, "2023-06-01"),
        (3, 3, None, -5, "charlie@z.net", "D", 30, "2021-01-01"),
        (4, 3, "Dawn", 40, "no-tld@nowhere", "C", 40, "2023-07-01"),
        (5, 4, "Eve", 25, "eve@q.io", "A", 39, "2023-08-01"),
    ]
    return spark.createDataFrame(
        rows,
        "row_number int, id int, name string, age int, email string, "
        "category string, score int, date string",
    )


def test_yaml_regex_substitution_and_execute(spark, config_yaml, people_df):
    path, regex_path = config_yaml
    config = DataQualityConfig.from_yaml(path, regex_yaml_path=regex_path)
    assert config.rules[2].regex_pattern == r".*@.*\..*"

    report = config.execute(people_df, row_id_col="row_number")
    by_rule = {
        (r.data_quality_dimension.value, r.field): r for r in report.results
    }
    assert by_rule[("Completeness", "name")].pass_rate == pytest.approx(0.8)
    assert by_rule[("Uniqueness", "id")].pass_rate == pytest.approx(0.8)
    assert by_rule[("Validity", "email")].pass_rate == pytest.approx(0.8)
    assert by_rule[("Accuracy", "category")].pass_rate == pytest.approx(0.8)
    assert by_rule[("Validity", "age")].pass_rate == pytest.approx(0.8)  # only -5 fails
    assert by_rule[("Consistency", "score")].pass_rate == pytest.approx(1.0)
    assert by_rule[("Timeliness", "date")].pass_rate == pytest.approx(0.8)
    # stable failed ids instead of positional indices
    assert by_rule[("Accuracy", "category")].records_failed_ids == [3]
    assert all(r.dataset_name == "people" for r in report.results)


def test_config_roundtrip_yaml(tmp_path, config_yaml):
    path, regex_path = config_yaml
    config = DataQualityConfig.from_yaml(path, regex_yaml_path=regex_path)
    out = tmp_path / "out.yaml"
    config.to_yaml(out)
    again = DataQualityConfig.from_yaml(out)
    assert again == config
    with pytest.raises(FileExistsError):
        config.to_yaml(out)


def test_config_from_report(spark, config_yaml, people_df):
    path, regex_path = config_yaml
    config = DataQualityConfig.from_yaml(path, regex_yaml_path=regex_path)
    report = config.execute(people_df)
    rebuilt = DataQualityConfig.from_report(report)
    assert rebuilt.rules == config.rules
    assert rebuilt.dataset_name == config.dataset_name
    assert rebuilt.measurement_sample == config.measurement_sample


def test_multi_file_merge(tmp_path):
    a = tmp_path / "a.yaml"
    b = tmp_path / "b.yaml"
    a.write_text(yaml.safe_dump({"dataset_name": "x", "rules": [{"function": "completeness", "field": "c1"}]}))
    b.write_text(yaml.safe_dump({"dataset_name": "y", "rules": [{"function": "uniqueness", "field": "c2"}]}))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        merged = DataQualityConfig.from_yaml([a, b])
    assert merged.dataset_name == "x"
    assert [r.function for r in merged.rules] == ["completeness", "uniqueness"]


def test_extra_keys_forbidden(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text(yaml.safe_dump({"datset_name": "typo", "rules": []}))
    with pytest.raises(Exception):
        DataQualityConfig.from_yaml(bad)


def test_nested_rules_end_to_end(spark):
    """Rules over nested paths share/route through flattened views
    (mirrors the reference's pet-shop execution test)."""
    df = spark.createDataFrame(
        [
            (1, ("John", [("Fido",), ("Whiskers",)])),
            (2, ("Jane", [("Rex",)])),
            (3, ("NoPet", [(None,)])),
        ],
        "id int, customers struct<name:string, pets:array<struct<name:string>>>",
    )
    rules = [
        CompletenessRule(field="customers.pets[*].name"),
        CompletenessRule(field="customers.name"),
        UniquenessRule(field="customers.pets[].name"),
    ]
    results = evaluate_rules(df, rules)
    # 4 exploded pet rows, one null name
    assert results[0].records_evaluated == 4
    assert results[0].pass_rate == pytest.approx(0.75)
    # un-exploded: 3 customers
    assert results[1].records_evaluated == 3
    assert results[1].pass_rate == pytest.approx(1.0)
    # first-pet names: Fido, Rex, None -> 2 non-null, both unique
    assert results[2].records_evaluated == 2
    assert results[2].pass_rate == pytest.approx(1.0)


def test_annotate_keep_drop(spark, people_df):
    rules = [
        CompletenessRule(field="name", rule_id="name_present"),
        UniquenessRule(field="id", rule_id="id_unique"),
        ValidityRegexRule(field="email", regex_pattern=r".*@.*\..*", rule_id="email_ok"),
    ]
    out = annotate(people_df, rules, order_by="row_number")
    rows = {r["row_number"]: r for r in out.collect()}
    assert rows[1]["dq_keep"] is True
    assert rows[3]["dq_keep"] is False  # null name fails completeness
    assert rows[4]["dq_keep"] is False  # duplicate id=3 (row 3 is first) + bad email
    assert rows[5]["dq_keep"] is True
