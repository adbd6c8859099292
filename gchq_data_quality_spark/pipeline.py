"""QualityFilterPipeline: langid + perplexity + heuristic rules + PII scrub.

The north-rule pipeline over the image+caption table
(image_id, bytes, w, h, fmt, caption, phash):

1. **Derive** scoring columns in ONE projection: native text heuristics
   (length, alpha ratio, repetition — pure Column exprs) plus the two
   Arrow-batched pandas UDFs (langid, perplexity) with broadcast models.
2. **Rules** over the derived columns reuse the engine's own rule chassis
   (ValidityNumericalRangeRule / AccuracyRule / CompletenessRule /
   ConsistencyRule) — each compiles to (evaluated, passing) Columns.
3. **Annotate**: per-rule evaluated/passing boolean columns + the keep/drop
   combiner (keep = AND over (passing OR not-evaluated)) + caption_scrubbed
   via the compiled regexp chain. Image bytes pass through untouched.
4. **Audit**: ONE aggregation of conditional sums over the flag columns ->
   one DataQualityResult row per rule (same shape as the reference's
   DataQualityResult, results/models.py:52-144).

Scale design: the whole thing is a single stage until the audit's 1-row
reduce — no joins, no wide shuffle. Optional salted repartition on the phash
prefix defeats caption-duplication skew (hot phash clusters spread across
``salt`` buckets deterministically via xxhash64(image_id), no rand()).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gchq_data_quality_spark.functions import text as text_fns
from gchq_data_quality_spark.functions.images import metadata_consistent
from gchq_data_quality_spark.functions.langid import LangIdModel, langid_udf
from gchq_data_quality_spark.functions.perplexity import PerplexityModel, perplexity_udf
from gchq_data_quality_spark.functions.scrub import Scrubber
from gchq_data_quality_spark.operators.accuracy import AccuracyRule
from gchq_data_quality_spark.operators.base import BaseRule, CompiledRule
from gchq_data_quality_spark.operators.completeness import CompletenessRule
from gchq_data_quality_spark.operators.consistency import ConsistencyRule
from gchq_data_quality_spark.operators.validity import ValidityNumericalRangeRule
from gchq_data_quality_spark.results import (
    DataQualityReport,
    DataQualityResult,
    calculate_pass_rate,
)


@dataclass
class QualityFilterConfig:
    caption_col: str = "caption"
    id_col: str = "image_id"
    min_caption_len: int = 5
    max_caption_len: int = 2000
    alpha_ratio_min: float = 0.5
    repetition_max: float = 0.4
    allowed_langs: list[str] | None = None
    lang_confidence_min: float = 0.3
    ppl_max: float = 150.0
    check_image_metadata: bool = True
    scrubber: Scrubber = dc_field(default_factory=Scrubber)
    salt: int | None = None  # salt buckets for skew-safe repartition
    repartition_to: int | None = None


class QualityFilterPipeline:
    def __init__(
        self,
        config: QualityFilterConfig,
        langid_model: LangIdModel | None = None,
        ppl_model: PerplexityModel | None = None,
    ):
        self.config = config
        self.langid_model = langid_model
        self.ppl_model = ppl_model

    # ------------------------------------------------------------------
    def rules(self) -> list[BaseRule]:
        c = self.config
        rules: list[BaseRule] = [
            CompletenessRule(field=c.caption_col, rule_id="caption_present"),
            ValidityNumericalRangeRule(
                field="caption_len",
                min_value=c.min_caption_len,
                max_value=c.max_caption_len,
                rule_id="caption_length",
            ),
            ValidityNumericalRangeRule(
                field="alpha_ratio", min_value=c.alpha_ratio_min, rule_id="charset"
            ),
            ValidityNumericalRangeRule(
                field="repetition", max_value=c.repetition_max, rule_id="repetition"
            ),
        ]
        if self.langid_model is not None:
            if c.allowed_langs:
                rules.append(
                    AccuracyRule(
                        field="lang", valid_values=list(c.allowed_langs), rule_id="lang_allowed"
                    )
                )
            rules.append(
                ValidityNumericalRangeRule(
                    field="lang_confidence",
                    min_value=c.lang_confidence_min,
                    rule_id="lang_confident",
                )
            )
        if self.ppl_model is not None:
            rules.append(
                ValidityNumericalRangeRule(
                    field="ppl", max_value=c.ppl_max, rule_id="perplexity"
                )
            )
        if c.check_image_metadata:
            rules.append(
                ConsistencyRule(
                    field="meta_ok", expression="`meta_ok`", skip_if_null="never",
                    rule_id="image_metadata",
                )
            )
        return rules

    # ------------------------------------------------------------------
    def derive(self, df: DataFrame) -> DataFrame:
        """Add scoring columns (one projection; UDFs batched via Arrow)."""
        c = self.config
        caption = F.col(c.caption_col)

        if c.salt and c.repartition_to:
            # skew-safe shuffle: hot phash prefixes spread over `salt` buckets;
            # deterministic (hash of the row id, no rand()).
            salt_col = F.pmod(F.xxhash64(F.col(c.id_col)), F.lit(c.salt))
            prefix = F.substring(F.hex(F.col("phash")), 1, 4)
            df = df.repartition(c.repartition_to, F.concat_ws("_", prefix, salt_col))

        def null_guard(expr):
            return F.when(caption.isNull(), F.lit(None)).otherwise(expr)

        # one withColumns batch per projection step: every chained
        # withColumn call re-runs the analyzer over the growing plan —
        # measured ~1 s of the annotate() construction time at 20+ calls
        derived = {
            "caption_len": F.length(caption),
            "alpha_ratio": null_guard(text_fns.alpha_ratio(caption)),
            "repetition": null_guard(text_fns.repetition_ratio(caption)),
        }
        if c.check_image_metadata:
            derived["meta_ok"] = metadata_consistent(
                F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt")
            )
        df = df.withColumns(derived)
        if self.langid_model is not None and self.ppl_model is not None:
            # fused scorer: one Arrow round-trip for both models (scoring.py)
            from gchq_data_quality_spark.functions.scoring import scores_udf

            udf = scores_udf(df.sparkSession, self.langid_model, self.ppl_model)
            return (
                df.withColumn("__scores", udf(caption))
                .withColumns(
                    {
                        "lang": F.col("__scores.lang"),
                        "lang_confidence": F.col("__scores.confidence"),
                        "ppl": F.col("__scores.ppl"),
                    }
                )
                .drop("__scores")
            )
        if self.langid_model is not None:
            udf = langid_udf(df.sparkSession, self.langid_model)
            df = (
                df.withColumn("__lid", udf(caption))
                .withColumns(
                    {
                        "lang": F.col("__lid.lang"),
                        "lang_confidence": F.col("__lid.confidence"),
                    }
                )
                .drop("__lid")
            )
        if self.ppl_model is not None:
            udf = perplexity_udf(df.sparkSession, self.ppl_model)
            df = df.withColumn("ppl", udf(caption))
        return df

    def _compiled(self, df: DataFrame) -> list[CompiledRule]:
        dtypes = {f.name: f.dataType for f in df.schema.fields}
        return [r.compile(F.col, dtypes.__getitem__) for r in self.rules()]

    def annotate(self, df: DataFrame) -> DataFrame:
        """derive + per-rule flags + keep + caption_scrubbed (all lazy)."""
        c = self.config
        derived = self.derive(df)
        compiled = self._compiled(derived)

        # single withColumns batch (one analyzer pass instead of ~18).
        # `keep` references the flag EXPRESSIONS, not the added columns —
        # identical values, and the flags are cheap boolean exprs over
        # derived columns (never the scoring UDFs, which live behind plain
        # column refs after derive()), so the duplication is codegen-CSE'd.
        flags: dict = {}
        keep = F.lit(True)
        for cr in compiled:
            rid = cr.rule.rule_id
            evaluated = cr.evaluated
            passing = cr.passing_filled()
            flags[f"dq_{rid}_evaluated"] = evaluated
            flags[f"dq_{rid}_passing"] = passing
            keep = keep & (passing | ~evaluated)
        flags["keep"] = keep
        flags["caption_scrubbed"] = F.when(
            F.col(c.caption_col).isNull(), F.lit(None)
        ).otherwise(c.scrubber.apply(F.col(c.caption_col)))
        return derived.withColumns(flags)

    # ------------------------------------------------------------------
    def audit_agg_exprs(self) -> list:
        """The flag-only aggregation exprs (one pass, map-side combinable).

        Counts are plain sums, so callers running in batches (e.g. the
        checkpointed job) can aggregate each batch's flags and ADD the rows
        together — see ``report_from_counts``.
        """
        aggs = []
        for rule in self.rules():
            rid = rule.rule_id
            aggs.append(F.sum(F.col(f"dq_{rid}_evaluated").cast("long")).alias(f"e_{rid}"))
            aggs.append(
                F.sum(
                    (F.col(f"dq_{rid}_evaluated") & F.col(f"dq_{rid}_passing")).cast("long")
                ).alias(f"p_{rid}")
            )
        aggs.append(F.sum(F.col("keep").cast("long")).alias("__kept"))
        aggs.append(F.count(F.lit(1)).alias("__total"))
        return aggs

    def report_from_counts(self, counts) -> DataQualityReport:
        """Build the per-rule report from an e_/p_/__kept/__total mapping
        (one agg Row, or summed counts across checkpointed batches)."""
        results = []
        for rule in self.rules():
            evaluated = int(counts[f"e_{rule.rule_id}"] or 0)
            passing = int(counts[f"p_{rule.rule_id}"] or 0)
            results.append(
                DataQualityResult(
                    field=rule.field,
                    data_quality_dimension=rule.data_quality_dimension,
                    records_evaluated=evaluated,
                    pass_rate=calculate_pass_rate(passing, evaluated),
                    rule_id=rule.rule_id,
                    rule_data=rule.to_json(),
                    dataset_name="images",
                    measurement_sample=(
                        f"kept={int(counts['__kept'] or 0)}/total={int(counts['__total'] or 0)}"
                    ),
                )
            )
        return DataQualityReport(results=results)

    def audit(self, annotated: DataFrame) -> DataQualityReport:
        """One aggregation over the flag columns -> per-rule results.

        ``annotated`` can be the lazy annotate() output OR a re-read of the
        written output (the flags are plain columns) — the latter is the
        cheap path: a column-pruned boolean scan, no UDF re-execution.
        """
        row = annotated.agg(*self.audit_agg_exprs()).collect()[0]
        return self.report_from_counts(row)

    def report_to_df(self, spark, report: DataQualityReport) -> DataFrame:
        rows = [
            {
                "rule_id": r.rule_id,
                "field": r.field,
                "dimension": r.data_quality_dimension.value,
                "records_evaluated": r.records_evaluated,
                "pass_rate": r.pass_rate,
                "rule_data": r.rule_data,
                "measurement_time": r.measurement_time,
                "measurement_sample": r.measurement_sample,
            }
            for r in report.results
        ]
        return spark.createDataFrame(rows)

    def audit_df(self, annotated: DataFrame) -> DataFrame:
        """Audit report as a Spark DataFrame (for writing to an audit table)."""
        return self.report_to_df(annotated.sparkSession, self.audit(annotated))

    def run(
        self, df: DataFrame, output_path: str | None = None
    ) -> tuple[DataFrame, DataQualityReport]:
        """Annotate and audit WITHOUT running the scoring UDFs twice.

        With ``output_path``: write the annotated frame once, then audit the
        *written* flag columns (column-pruned boolean scan — the pattern
        jobs/quality_filter_job.py uses); returns the re-read output.
        Without: persist the annotated frame so the audit materialises it and
        the returned DataFrame serves reads from the cache (caller unpersists).
        """
        annotated = self.annotate(df)
        if output_path is not None:
            annotated.write.mode("overwrite").parquet(output_path)
            written = df.sparkSession.read.parquet(output_path)
            return written, self.audit(written)
        annotated = annotated.persist()
        return annotated, self.audit(annotated)
