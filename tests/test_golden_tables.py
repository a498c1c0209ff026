"""Golden-table configs: every published table from the reference
instantiates over cleaned fixture cohorts (SURVEY §5's 21-table list)."""

import pytest
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.plans.golden_tables import (
    GOLDEN_TABLES,
    build_golden_tables,
)
from azure_medicine_data_engineering_spark.plans.pipeline import harmonize_cohorts
from tests import fixtures_clinical as fx
from tests.test_clinical_pipeline import CONTROL_SPEC, STUDY_SPEC


@pytest.fixture(scope="module")
def cohorts(spark):
    study = STUDY_SPEC.apply(spark.createDataFrame(fx.study_rows(), fx.STUDY_SCHEMA))
    control = CONTROL_SPEC.apply(
        spark.createDataFrame(fx.control_rows(), fx.CONTROL_SCHEMA)
    )
    # derived columns the golden tables reference (reference derivations:
    # months_between intervals, TBR ratio, indicator flags)
    study = study.withColumns(
        {
            "months_since_surgery": F.months_between("exam_date", "surgery_date"),
            "is_stentgraft": F.col("Rodzaj protezy") == "stentgraft",
            "crp": F.col("suv_background") * 2,           # fixture stand-ins
            "wbc": F.col("suv_background") * 3,
            "micro_blood_pos": F.col("tetniakPowodOper"),
            "cause_aneurysm": F.col("tetniakPowodOper"),
            "cause_unknown": ~F.col("tetniakPowodOper"),
            "diabetes": F.col("cukrzyca"),
            "fever": F.col("Gorączka"),
            "loc_abdominal_aorta": F.col("tetniakPowodOper"),
            "any_ct_finding": F.col("Gorączka") | F.col("cukrzyca"),
            "injected_activity": F.col("suv_focus") * 10,
            "glucose": F.col("suv_focus") * 20,
        }
    )
    control = control.withColumns(
        {
            "tbr": F.col("suv_focus") / F.col("suv_background"),
            "age_years": 2016 - F.col("birth_year"),
            "injected_activity": F.col("suv_focus") * 10,
            "glucose": F.col("suv_focus") * 20,
        }
    )
    # two-point cohort synthesized from study (paired exam columns)
    two_point = study.select(
        "Płeć",
        F.col("suv_focus").alias("suv_focus_e1"),
        (F.col("suv_focus") * 0.9).alias("suv_focus_e2"),
    )
    merged = harmonize_cohorts(
        {"study": study, "control": control},
        {
            "study": {
                "suv_focus": "suv_focus",
                "injected_activity": "injected_activity",
                "glucose": "glucose",
            },
            "control": {
                "suv_focus": "suv_focus",
                "injected_activity": "injected_activity",
                "glucose": "glucose",
            },
        },
    )
    return {"study": study, "control": control, "two_point": two_point, "merged": merged}


def test_all_golden_tables_instantiate(spark, cohorts):
    out = build_golden_tables(spark, cohorts)
    assert len(out) == len(GOLDEN_TABLES) == 21
    for name, df in out.items():
        cols = df.columns
        assert cols[:3] == ["Division", "DivisionCategory", "aggregation"], name
        assert df.count() > 0, name


def test_flagship_suv_values(spark, cohorts):
    out = build_golden_tables(spark, cohorts, only=["StudyGroupSuv"])
    rows = {
        (r.Division, r.DivisionCategory, r.aggregation): r.suvFocus
        for r in out["StudyGroupSuv"].collect()
    }
    # grand-total count matches the cleaned cohort size
    assert rows[("All", "All", "count")] == 56.0  # 60 rows - 4 NULL suv_focus


def test_cohort_comparison_table(spark, cohorts):
    out = build_golden_tables(spark, cohorts, only=["SuvStudyVsCrontrol"])
    rows = {
        (r.Division, r.DivisionCategory, r.aggregation)
        for r in out["SuvStudyVsCrontrol"].collect()
    }
    assert ("cohort", "study", "median") in rows
    assert ("cohort", "control", "median") in rows
