"""Clinical-pipeline orchestration (SURVEY §3.1).

The reference's orchestration is an Azure Data Factory DAG
(``pipeline/Pipeline 1.json``, ``pipeline/mainPipeline.json``): Excel→CSV copy
→ per-cohort clean notebooks → quality notebooks → summaries → stats-prep →
R hypothesis testing + Azure ML. Here the same DAG is plain in-process
function composition with parquet/Delta stage products instead of CSV
round-trips (which lost types — SURVEY §4), and the documented wiring bugs
fixed (quality stage pointed at the wrong notebook, ``Pipeline 1.json:329``;
the R stage was never invoked from mainPipeline, ``mainPipeline.json:205,232``).

Everything is configuration over the generic operators: ``CleaningSpec``,
``quality_report``, ``categorized_summary``, division tables, the catalog.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from azure_medicine_data_engineering_spark.operators.cleaning import CleaningSpec
from azure_medicine_data_engineering_spark.operators.divisions import (
    division_table,
    get_columns_of_divisions,
)
from azure_medicine_data_engineering_spark.operators.quality import (
    RangeSpec,
    quality_report,
)
from azure_medicine_data_engineering_spark.operators.summarize import (
    categorized_summary,
)


@dataclass
class QualityConfig:
    """Quality stage inputs: null checks driven by division names (parity:
    ``stydyGrB.scala:33,64`` reads must-not-be-null sets from the division
    table), plus range and z-score specs."""

    null_divisions: list[str] = field(default_factory=list)
    ranges: list[RangeSpec] = field(default_factory=list)
    zscore_cols: list[str] = field(default_factory=list)


@dataclass
class SummaryTable:
    """One golden summary table (a ``createTableCategorized`` call site —
    e.g. StudyGroupSuv, ``dataSummaries1.scala:360-369``)."""

    name: str
    metrics: list[tuple[str, str]]
    aggs: list[str]
    categories: list[str]


@dataclass
class CohortConfig:
    name: str
    cleaning: CleaningSpec
    divisions: list[tuple[str, list[str]]] = field(default_factory=list)
    quality: QualityConfig = field(default_factory=QualityConfig)
    summaries: list[SummaryTable] = field(default_factory=list)


@dataclass
class PipelineResult:
    cleaned: dict[str, DataFrame]
    divisions: dict[str, DataFrame]
    reports: dict[str, DataFrame]
    summaries: dict[str, DataFrame]


def run_clinical_pipeline(
    spark: SparkSession,
    raw: dict[str, DataFrame],
    configs: list[CohortConfig],
) -> PipelineResult:
    """Clean → quality → summaries for every cohort, DAG-ordered like the
    reference but in-process. Stage products stay as DataFrames; callers
    persist via ``sources.catalog.create_table_with_meta``."""
    cleaned: dict[str, DataFrame] = {}
    divisions: dict[str, DataFrame] = {}
    reports: dict[str, DataFrame] = {}
    summaries: dict[str, DataFrame] = {}

    for cfg in configs:
        df = cfg.cleaning.apply(raw[cfg.name])
        cleaned[cfg.name] = df

        div = division_table(spark, cfg.divisions) if cfg.divisions else None
        if div is not None:
            divisions[cfg.name] = div

        null_cols: list[str] = []
        if div is not None and cfg.quality.null_divisions:
            null_cols = get_columns_of_divisions(div, cfg.quality.null_divisions)
        reports[cfg.name] = quality_report(
            df,
            null_cols=null_cols,
            ranges=cfg.quality.ranges,
            zscore_cols=cfg.quality.zscore_cols,
        )

        for st in cfg.summaries:
            summaries[f"{cfg.name}.{st.name}"] = categorized_summary(
                df, st.metrics, st.aggs, st.categories
            )

    return PipelineResult(cleaned, divisions, reports, summaries)


def harmonize_cohorts(
    frames: dict[str, DataFrame],
    column_map: dict[str, dict[str, str]],
    cohort_col: str = "cohort",
) -> DataFrame:
    """Cohort harmonization + union (parity: the imaging/numeric frames in
    ``HypothesisTestingPrediction.scala:50-122`` rename each cohort's columns
    to a shared schema and union — the reference's only cohort combinator).

    ``column_map``: cohort name → {source column: harmonized name}."""
    from pyspark.sql import functions as F

    pieces = []
    for name, df in frames.items():
        mapping = column_map[name]
        pieces.append(
            df.select(
                F.lit(name).alias(cohort_col),
                *[F.col(f"`{src}`").alias(dst) for src, dst in mapping.items()],
            )
        )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out
