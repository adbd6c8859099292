"""Rule operators — the engine's query language (SURVEY.md §2.1)."""

from gchq_data_quality_spark.operators.accuracy import AccuracyRule
from gchq_data_quality_spark.operators.base import BaseRule, CompiledRule
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

__all__ = [
    "AccuracyRule",
    "BaseRule",
    "CompiledRule",
    "CompletenessRule",
    "ConsistencyRule",
    "TimelinessRelativeRule",
    "TimelinessStaticRule",
    "UniquenessRule",
    "ValidityNumericalRangeRule",
    "ValidityRegexRule",
]
