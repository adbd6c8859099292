#!/usr/bin/env python
"""End-to-end tour of the engine's three usage modes.

    python examples/run_example.py [events_parquet_path]

1. Whole-config execution: YAML -> DataQualityConfig -> ONE aggregation job
   for every rule's metrics (the scale path).
2. Single-rule evaluation: rule.evaluate(df) — the reference's primary
   entry point, pandas or Spark input.
3. Per-row annotation: boolean pass/fail columns + a keep mask for
   filter-style pipelines.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gchq_data_quality_spark import (
    CompletenessRule,
    DataQualityConfig,
    annotate,
)
from gchq_data_quality_spark.sources.session import get_spark


def main() -> None:
    events_path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/events.parquet"
    here = Path(__file__).resolve().parent

    spark = get_spark(cores=4, app_name="dq-example")
    spark.sparkContext.setLogLevel("ERROR")
    events = spark.read.parquet(events_path)

    # 1. whole config, one metrics job
    config = DataQualityConfig.from_yaml(
        here / "rules.yaml", regex_yaml_path=here / "regex_patterns.yaml"
    )
    report = config.execute(events, row_id_col="event_id")
    print(report.to_dataframe(decimals=4)[
        ["rule_id", "records_evaluated", "pass_rate"]
    ].to_string(index=False))

    # 2. one rule, reference-style entry point
    result = CompletenessRule(field="user_id").evaluate(events)
    print(f"\nuser_id completeness: {result.pass_rate:.4f} "
          f"over {result.records_evaluated} rows")

    # 3. per-row keep/drop annotation
    flagged = annotate(events, list(config.rules), order_by="event_id")
    flagged.select("event_id", "dq_value_range", "dq_keep").show(5)
    kept = flagged.filter("dq_keep").count()
    print(f"rows passing every rule: {kept}/{events.count()}")

    spark.stop()


if __name__ == "__main__":
    main()
