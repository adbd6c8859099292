"""Single-pass rule execution engine.

Replaces the reference's execution lifecycle (config.py:209-218 — a Python
loop issuing one full mapInPandas scan PER RULE) with one Catalyst-planned
job per *explosion signature*:

1. Rules are grouped by the set of ``[*]`` array explosions their columns
   need (flat rules — the common case, and the only case for the graft's flat
   image+caption table — all share the base DataFrame: ONE group).
2. Each group's columns are flattened once, every rule compiles to
   ``(evaluated, passing)`` Column expressions, and ALL metrics are computed
   in a single ``df.agg(...)`` of conditional sums — map-side partial
   aggregation, whole-stage codegen, one shuffle of one tiny row.
   Uniqueness rules ride along as ``count``/``count_distinct`` aggregates in
   the same job.
3. Failing-record samples (≤10 rows, only for rules with 0 < pass_rate < 1,
   matching rules/base.py:370-388) are collected afterwards with
   filter+dropDuplicates+limit — Catalyst plans these as CollectLimit with an
   early stop.

At 100 TB this means: one scan of the table per run (not N), parquet column
pruning down to the union of rule columns, and no Python in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gchq_data_quality_spark.globals import SampleConfig
from gchq_data_quality_spark.operators.base import BaseRule, CompiledRule
from gchq_data_quality_spark.plans.flatten import explosion_signature, flatten, split_notation
from gchq_data_quality_spark.results import (
    DataQualityResult,
    calculate_pass_rate,
)


def ensure_columns_exist(df: DataFrame, columns: list[str]) -> None:
    """Raise ValueError if any top-level parent column is missing
    (parity: rules/utils/rules_utils.py:40-54)."""
    parents = {split_notation(c.split(".")[0])[0] for c in columns}
    missing = sorted(parents - set(df.columns))
    if missing:
        raise ValueError(
            f"Field(s) {missing} not found in DataFrame columns: {df.columns}"
        )


@dataclass
class RuleMetrics:
    rule: BaseRule
    records_evaluated: int
    records_passing: int
    pass_rate: float | None
    records_failed_sample: list[dict] | None = None
    records_failed_ids: list | None = None

    def to_result(self) -> DataQualityResult:
        result = DataQualityResult(
            field=self.rule.field,
            data_quality_dimension=self.rule.data_quality_dimension,
            records_evaluated=self.records_evaluated,
            pass_rate=self.pass_rate,
            rule_id=self.rule.rule_id,
            rule_description=self.rule.rule_description,
            rule_data=self.rule.to_json(),
            records_failed_ids=self.records_failed_ids,
        )
        result._set_records_failed_sample(self.records_failed_sample)
        return result


def _needs_sample(pass_rate: float | None) -> bool:
    """Samples only when something failed (parity: rules/base.py:370-388)."""
    return pass_rate is not None and pass_rate != 1.0


def _collect_sample(
    flat_df: DataFrame, compiled: CompiledRule, row_id_col: str | None
) -> tuple[list[dict], list | None]:
    limit = SampleConfig.RECORDS_FAILED_SAMPLE_SIZE
    rule = compiled.rule
    if compiled.is_global:
        # duplicate-value sample (parity: rules/uniqueness.py:151-162)
        col = compiled.prepared[rule.field]
        dupes = (
            flat_df.select(col.alias(rule.field))
            .filter(F.col(rule.field).isNotNull())
            .groupBy(rule.field)
            .count()
            .filter(F.col("count") > 1)
            .limit(limit)
            .collect()
        )
        return [{rule.field: row[rule.field]} for row in dupes], None

    failing = flat_df.filter(compiled.failing())
    sample_rows = (
        failing.select(
            *[compiled.prepared[c].alias(c) for c in compiled.columns_used]
        )
        .dropDuplicates()
        .limit(limit)
        .collect()
    )
    sample = [row.asDict(recursive=True) for row in sample_rows]
    ids = None
    if row_id_col and row_id_col in flat_df.columns:
        ids = [
            row[row_id_col]
            for row in failing.select(row_id_col).limit(limit).collect()
        ]
    return sample, ids


def compute_metrics(
    df: DataFrame,
    rules: list[BaseRule],
    collect_samples: bool = True,
    row_id_col: str | None = None,
) -> list[RuleMetrics]:
    """Evaluate all rules; one aggregation job per explosion signature.

    ``row_id_col``: optional stable id column — when given, failing-record ids
    are that column's values (the reference's positional indices are dropped
    as unreliable in Spark, spark/utils/results_utils.py:56; stable ids are
    the deterministic replacement).
    """
    for rule in rules:
        ensure_columns_exist(df, rule.columns_used())

    # group rule indices by the explosions their columns require
    groups: dict[frozenset, list[int]] = {}
    for i, rule in enumerate(rules):
        groups.setdefault(explosion_signature(rule.columns_used()), []).append(i)

    metrics: dict[int, RuleMetrics] = {}
    for indices in groups.values():
        group_rules = [rules[i] for i in indices]
        group_cols = sorted({c for r in group_rules for c in r.columns_used()})
        keep = [row_id_col] if row_id_col and row_id_col in df.columns else []
        flat_df, mapping = flatten(df, group_cols, keep_cols=keep)
        dtypes = {f.name: f.dataType for f in flat_df.schema.fields}

        def resolver(name: str, _m=mapping):
            return F.col(_m[name])

        def dtype_of(name: str, _m=mapping, _d=dtypes):
            return _d[_m[name]]

        compiled = [r.compile(resolver, dtype_of) for r in group_rules]

        agg_exprs = []
        for j, cr in enumerate(compiled):
            if cr.is_global:
                agg_exprs.append(cr.agg_evaluated.alias(f"e{j}"))
                agg_exprs.append(cr.agg_passing.alias(f"p{j}"))
            else:
                agg_exprs.append(
                    F.sum(cr.evaluated.cast("long")).alias(f"e{j}")
                )
                agg_exprs.append(
                    F.sum(cr.passing_filled().cast("long")).alias(f"p{j}")
                )
        row = flat_df.agg(*agg_exprs).collect()[0]

        for j, (i, cr) in enumerate(zip(indices, compiled, strict=True)):
            evaluated = int(row[f"e{j}"] or 0)
            passing = int(row[f"p{j}"] or 0)
            pass_rate = calculate_pass_rate(passing, evaluated)
            m = RuleMetrics(cr.rule, evaluated, passing, pass_rate)
            if collect_samples and _needs_sample(pass_rate):
                m.records_failed_sample, m.records_failed_ids = _collect_sample(
                    flat_df, cr, row_id_col
                )
            metrics[i] = m

    return [metrics[i] for i in range(len(rules))]


def evaluate_rules(
    df: DataFrame,
    rules: list[BaseRule],
    collect_samples: bool = True,
    row_id_col: str | None = None,
) -> list[DataQualityResult]:
    """compute_metrics + wrap each RuleMetrics as a DataQualityResult."""
    return [
        m.to_result()
        for m in compute_metrics(df, rules, collect_samples, row_id_col)
    ]


def annotate(
    df: DataFrame,
    rules: list[BaseRule],
    prefix: str = "dq_",
    order_by: str | None = None,
) -> DataFrame:
    """Add one boolean pass/fail column per rule, plus a ``{prefix}keep`` AND.

    Per-row semantics: a row "keeps" under a rule when it passes OR was not
    evaluated (skipped rows don't count against the record — same algebra the
    audit metrics use). Uniqueness rules need a window (first occurrence
    keeps); ``order_by`` names the stable tie-break column.

    This is the keep/drop combiner of the quality-filter pipeline; flat
    columns only (the graft table is flat — nested rules go through
    ``evaluate_rules``).
    """
    from gchq_data_quality_spark.operators.uniqueness import UniquenessRule

    dtypes = {f.name: f.dataType for f in df.schema.fields}
    resolver = F.col
    dtype_of = dtypes.__getitem__

    keep_cols = []
    out = df
    for i, rule in enumerate(rules):
        name = f"{prefix}{rule.rule_id or f'rule_{i}'}"
        if isinstance(rule, UniquenessRule):
            if order_by is None:
                raise ValueError(
                    "annotate() with a UniquenessRule requires order_by= for a "
                    "deterministic first-occurrence mask"
                )
            passing = rule.row_passing_column(resolver, dtype_of, order_by)
            # evaluated must come from the same *prepared* column the passing
            # mask uses (na_values sentinels -> NULL), or sentinel rows count
            # as evaluated-but-failing here while the metric path skips them.
            evaluated = rule.compile(resolver, dtype_of).evaluated
            col = passing | ~evaluated
        else:
            cr = rule.compile(resolver, dtype_of)
            col = cr.passing_filled() | ~cr.evaluated
        out = out.withColumn(name, col)
        keep_cols.append(name)

    keep = F.lit(True)
    for name in keep_cols:
        keep = keep & F.col(name)
    return out.withColumn(f"{prefix}keep", keep)
