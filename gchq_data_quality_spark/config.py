"""DataQualityConfig: YAML-loadable rule-set config + execution entry point.

Parity: reference config.py:85-531 — same YAML surface (discriminated
``function`` key, ``extra='forbid'``, multi-file rule merge, regex-pattern
substitution YAML, report round-trip via ``rule_data`` JSON). The execution
path differs by design: instead of a sequential per-rule loop
(config.py:209-218), ``execute`` hands the whole rule list to the single-pass
engine (see engine.py).
"""

from __future__ import annotations

import json
import warnings
from pathlib import Path
from typing import Annotated, Any

import pandas as pd
import yaml
from pydantic import BaseModel, ConfigDict, Field, TypeAdapter, ValidationError
from pyspark.sql import DataFrame as SparkDataFrame
from pyspark.sql import SparkSession

from gchq_data_quality_spark.engine import evaluate_rules
from gchq_data_quality_spark.models import UTCDateTime
from gchq_data_quality_spark.operators.accuracy import AccuracyRule
from gchq_data_quality_spark.operators.completeness import CompletenessRule
from gchq_data_quality_spark.operators.consistency import ConsistencyRule
from gchq_data_quality_spark.operators.timeliness import (
    TimelinessRelativeRule,
    TimelinessStaticRule,
)
from gchq_data_quality_spark.operators.uniqueness import UniquenessRule
from gchq_data_quality_spark.operators.validity import (
    ValidityNumericalRangeRule,
    ValidityRegexRule,
)
from gchq_data_quality_spark.results import DataQualityReport, DataQualityResult

RuleType = Annotated[
    UniquenessRule
    | CompletenessRule
    | ValidityRegexRule
    | ValidityNumericalRangeRule
    | ConsistencyRule
    | AccuracyRule
    | TimelinessRelativeRule
    | TimelinessStaticRule,
    Field(discriminator="function"),
]

RuleAdapter: TypeAdapter = TypeAdapter(RuleType)


class DataQualityConfig(BaseModel):
    """Dataset metadata + a list of rules; loadable from YAML."""

    model_config = ConfigDict(extra="forbid")

    dataset_name: str | None = Field(default=None)
    dataset_id: str | int | float | None = Field(default=None)
    measurement_sample: str | None = Field(default=None)
    lifecycle_stage: str | None = Field(default=None)
    measurement_time: UTCDateTime | None = Field(default=None)
    rules: list[RuleType] = Field(default_factory=list)

    # ------------------------------------------------------------------
    def execute(
        self,
        data_source: SparkDataFrame | pd.DataFrame,
        collect_samples: bool = True,
        row_id_col: str | None = None,
    ) -> DataQualityReport:
        """Evaluate every rule against the data in one engine pass.

        Accepts a Spark DataFrame (the native path) or a pandas DataFrame
        (converted through the active SparkSession for API parity with the
        reference's dual backend).
        """
        if isinstance(data_source, pd.DataFrame):
            spark = SparkSession.active()
            data_source = spark.createDataFrame(data_source)
        results = evaluate_rules(
            data_source,
            list(self.rules),
            collect_samples=collect_samples,
            row_id_col=row_id_col,
        )
        results = [self._copy_metadata(r) for r in results]
        return DataQualityReport(results=results)

    def _copy_metadata(self, result: DataQualityResult) -> DataQualityResult:
        updated = result.model_copy()
        updated.dataset_name = self.dataset_name
        updated.dataset_id = self.dataset_id
        updated.measurement_sample = self.measurement_sample
        updated.lifecycle_stage = self.lifecycle_stage
        if self.measurement_time is not None:
            updated.measurement_time = self.measurement_time
        return updated

    # ------------------------------------------------------------------
    @classmethod
    def from_yaml(
        cls,
        file_paths: str | Path | list[str] | list[Path],
        regex_yaml_path: str | Path | None = None,
    ) -> "DataQualityConfig":
        """Load one or more YAML configs; rules merge, metadata from the first.

        ``regex_yaml_path`` maps named patterns (e.g. EMAIL_REGEX) onto
        ``validity_regex`` rules whose ``regex_pattern`` equals the key
        (parity: reference config.py:268-316,443-505).
        """
        paths = (
            [file_paths] if isinstance(file_paths, (str, Path)) else list(file_paths)
        )
        for p in paths:
            if not Path(p).exists():
                raise FileNotFoundError(f"Config file not found: {p}")

        regex_patterns = _load_regex_yaml(regex_yaml_path) if regex_yaml_path else {}

        configs = []
        for p in paths:
            with open(p) as f:
                raw = yaml.safe_load(f)
            cfg = cls(**raw)
            if regex_patterns:
                cfg = _replace_regex_values(cfg, regex_patterns)
            configs.append(cfg)

        if len(configs) == 1:
            return configs[0]
        warnings.warn(
            "Multiple configuration files loaded. Only 'rules' are merged; "
            f"metadata comes from the first file: {paths[0]}.",
            stacklevel=2,
        )
        combined = configs[0].model_copy()
        for cfg in configs[1:]:
            combined.rules.extend(cfg.rules)
        return combined

    def to_yaml(self, file_path: str | Path, overwrite: bool = False) -> None:
        file_path = Path(file_path)
        file_path.parent.mkdir(parents=True, exist_ok=True)
        if file_path.exists() and not overwrite:
            raise FileExistsError(f"File already exists: {file_path}")
        export = self.model_dump(mode="json")
        export["rules"] = [rule.to_dict() for rule in self.rules]
        with open(file_path, "w") as f:
            yaml.safe_dump(export, f, sort_keys=False)

    @classmethod
    def from_report(cls, report: DataQualityReport) -> "DataQualityConfig":
        """Rebuild a config from the rule JSON embedded in each result
        (parity: reference config.py:220-266)."""
        if not report.results:
            raise ValueError("DataQualityReport contains no records.")
        rules = []
        for entry in report.results:
            if not entry.rule_data:
                warnings.warn(
                    f"No rule_data found for record: {entry}, skipping.", stacklevel=2
                )
                continue
            try:
                rules.append(RuleAdapter.validate_python(json.loads(entry.rule_data)))
            except (ValidationError, json.JSONDecodeError):
                warnings.warn(
                    f"Unable to parse rule_data: {entry.rule_data}, skipping.",
                    stacklevel=2,
                )
        first = report.results[0]
        meta_keys = [k for k in cls.model_fields if k != "rules"]
        meta = {k: getattr(first, k) for k in meta_keys}
        for key in meta_keys:
            values = {getattr(e, key) for e in report.results}
            if len(values) > 1:
                warnings.warn(
                    f"Inconsistent values for '{key}' in report: {values}. "
                    f"Using '{meta[key]}' from the first entry.",
                    stacklevel=2,
                )
        return cls(rules=rules, **meta)


def _load_regex_yaml(file_path: str | Path) -> dict[str, str]:
    with open(file_path) as f:
        data = yaml.safe_load(f)
    if not isinstance(data, dict):
        raise ValueError(
            "Regex YAML file should contain a dictionary of key-value pairs, "
            f"got {type(data)}"
        )
    for key, value in data.items():
        if not isinstance(value, str):
            raise ValueError(f"Value for key '{key}' ({value!r}) is not a string.")
    return data


def _replace_regex_values(
    config: DataQualityConfig, regex_dict: dict[str, str]
) -> DataQualityConfig:
    updated = config.model_copy(deep=True)
    for rule in updated.rules:
        if isinstance(rule, ValidityRegexRule) and rule.regex_pattern in regex_dict:
            rule.regex_pattern = regex_dict[rule.regex_pattern]
    return updated
