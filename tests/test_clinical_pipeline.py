"""End-to-end clinical pipeline test: the reference's DAG (clean → quality →
summaries → harmonize → stats/mining) as engine configuration on
FIXTURES.md-style synthetic cohorts with planted defects."""

import pytest
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.functions import casting
from azure_medicine_data_engineering_spark.operators.cleaning import (
    CastRule,
    CleaningSpec,
)
from azure_medicine_data_engineering_spark.operators.quality import (
    DESC_NULLS,
    DESC_OUTLIER,
    DESC_RANGE,
    RangeSpec,
)
from azure_medicine_data_engineering_spark.plans.pipeline import (
    CohortConfig,
    QualityConfig,
    SummaryTable,
    harmonize_cohorts,
    run_clinical_pipeline,
)
from tests import fixtures_clinical as fx

STUDY_SPEC = CleaningSpec(
    renames={
        "Rok urodzenia": "birth_date",
        "Data badania": "exam_date",
        "Data operacji": "surgery_date",
        "SUV (max) w miejscu zapalenia": "suv_focus",
        "SUV (max) tła": "suv_background",
        "tumor to background ratio": "tbr",
    },
    positional_renames={13: "skala5Stopnie"},
    drops=["_c0"],
    not_null_gate=["Płeć"],
    casts=[
        CastRule(["suv_focus", "suv_background", "tbr"], "double", casting.comma_decimal),
        CastRule(["birth_date", "exam_date", "surgery_date"], None, casting.to_date),
        CastRule(["Gorączka"], None, casting.boolean_from_yes_no),
        CastRule(["cukrzyca"], None, lambda c: casting.boolean_from_string(c, "prawda")),
        CastRule(["tetniakPowodOper"], "boolean"),
    ],
    label_maps={
        "Rodzaj protezy": {"StentGraft": "stentgraft", "Proteza": "proteza"},
        "uproszczona klasyfikacja": {"ob. nacz. biodrowe": "Y", "aorty piersiowej": "B"},
    },
)

CONTROL_SPEC = CleaningSpec(
    renames={
        "data badania 1": "exam_date",
        "Rok z peselu": "birth_year",
        "SUV protezy": "suv_focus",
        "tło": "suv_background",
        "stentgraft czy proteza": "Rodzaj protezy",
    },
    drops=["_c25"],
    not_null_gate=["Płeć", "exam_date"],
    casts=[
        CastRule(["suv_focus", "suv_background"], "double", casting.comma_decimal),
        CastRule(["exam_date"], None, casting.to_date),
        CastRule(["cukrzyca"], "boolean"),
    ],
)

STUDY_CFG = CohortConfig(
    name="study",
    cleaning=STUDY_SPEC,
    divisions=[
        ("suv", ["suv_focus", "suv_background", "tbr"]),
        ("dates", ["exam_date", "surgery_date"]),
    ],
    quality=QualityConfig(
        null_divisions=["suv"],
        ranges=[RangeSpec("suv_focus", 0, 70), RangeSpec("tbr", 0, 1)],
        zscore_cols=["suv_focus"],
    ),
    summaries=[
        SummaryTable(
            name="StudyGroupSuv",
            metrics=[("suv_focus", "suvFocus"), ("suv_background", "suvBackground")],
            aggs=["median", "min", "max", "count"],
            categories=["Płeć", "Rodzaj protezy"],
        )
    ],
)

CONTROL_CFG = CohortConfig(
    name="control",
    cleaning=CONTROL_SPEC,
    quality=QualityConfig(ranges=[RangeSpec("suv_focus", 0, 70)]),
    summaries=[
        SummaryTable(
            name="BasicInControlGroup",
            metrics=[("suv_focus", "suvFocus")],
            aggs=["median", "count"],
            categories=["Rodzaj protezy"],
        )
    ],
)


@pytest.fixture(scope="module")
def result(spark):
    raw = {
        "study": spark.createDataFrame(fx.study_rows(), fx.STUDY_SCHEMA),
        "control": spark.createDataFrame(fx.control_rows(), fx.CONTROL_SCHEMA),
    }
    return run_clinical_pipeline(spark, raw, [STUDY_CFG, CONTROL_CFG]), raw


def test_clean_stage(result):
    res, _ = result
    study = res.cleaned["study"]
    assert study.count() == fx.STUDY_EXPECT["n_rows_after_gate"]
    assert dict(study.dtypes)["suv_focus"] == "double"
    assert dict(study.dtypes)["exam_date"] == "date"
    # label normalization applied
    kinds = {r[0] for r in study.select("Rodzaj protezy").distinct().collect()}
    assert kinds == {"stentgraft", "proteza"}


def test_quality_stage_planted_defects(result):
    res, _ = result
    rep = {(r.description, r.columnName): r.number for r in res.reports["study"].collect()}
    assert rep[(DESC_NULLS, "suv_focus")] == fx.STUDY_EXPECT["nulls_suv_focus"]
    # 95.5, -3.0 and 400.0 are all outside [0,70]
    assert rep[(DESC_RANGE, "suv_focus")] == 3
    assert rep[(DESC_OUTLIER, "suv_focus")] == fx.STUDY_EXPECT["outliers_suv_focus"]
    # tbr ∈ [0,1] holds for all cleaned rows → no report row
    assert (DESC_RANGE, "tbr") not in rep


def test_summary_stage(result):
    res, _ = result
    summ = res.summaries["study.StudyGroupSuv"]
    rows = {(r.Division, r.DivisionCategory, r.aggregation) for r in summ.collect()}
    assert ("All", "All", "median") in rows
    assert ("Płeć", "Kobieta", "count") in rows
    assert ("Rodzaj protezy", "stentgraft", "max") in rows


def test_harmonize_and_stats(result, spark):
    res, _ = result
    # stats run on quality-gated rows: range violations (incl. the planted
    # 400.0 outlier) are excluded, as the reference's pipeline ordering implies
    study_ok = res.cleaned["study"].where(F.col("suv_focus").between(0, 70))
    merged = harmonize_cohorts(
        {"study": study_ok, "control": res.cleaned["control"]},
        {
            "study": {"suv_focus": "suvFocus", "Płeć": "gender"},
            "control": {"suv_focus": "suvFocus", "Płeć": "gender"},
        },
    )
    assert merged.columns == ["cohort", "suvFocus", "gender"]
    assert merged.count() == 93  # (60 - 4 null - 3 range-violating) + 40
    # hypothesis test: SUV differs between cohorts (study has higher values)
    from azure_medicine_data_engineering_spark.functions.stats import (
        permutation_test_grouped,
    )

    tested = permutation_test_grouped(
        merged.withColumn("hyp", F.lit("suv_by_cohort")).withColumn(
            "is_study", F.col("cohort") == "study"
        ),
        "hyp",
        "suvFocus",
        "is_study",
        n_permutations=300,
        seed=3,
    ).collect()[0]
    assert tested.p_value < 0.05


def test_fpgrowth_on_image_signs(result, spark):
    res, _ = result
    study = res.cleaned["study"]
    signs = study.select(
        F.array_compact(
            F.array(
                F.when(F.col("Gorączka"), F.lit("fever")),
                F.when(F.col("cukrzyca"), F.lit("diabetes")),
                F.when(F.col("tetniakPowodOper"), F.lit("aneurysm")),
            )
        ).alias("items")
    ).where(F.size("items") > 0)
    from azure_medicine_data_engineering_spark.functions.mining import (
        frequent_itemsets,
    )

    items = frequent_itemsets(signs, min_support=0.1)
    assert items.count() > 0
