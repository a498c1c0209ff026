"""The reference's published summary tables as engine configuration.

SURVEY §5 lists the golden Delta tables the reference publishes (call sites
in ``dataSummaries1.scala`` / ``HypothesisTestingPrediction.scala``). Each is
a ``createTableCategorized`` invocation = one :class:`SummaryTable` config
here, expressed over the cleaned clinical column names (FIXTURES.md aliases;
the originals are the Polish headers the CleaningSpec renames).

A reference user migrates by running ``build_golden_tables`` over their
cleaned cohorts — every table they publish today exists by name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from azure_medicine_data_engineering_spark.plans.pipeline import SummaryTable

#: metrics/aggs/categories per golden table (reference site in the comment).
#: Cohort key: which cleaned frame the table reads.
GOLDEN_TABLES: list[tuple[str, str, SummaryTable]] = [
    # dataSummaries1.scala:96-107 — exam/surgery interval stats by gender
    ("study", "DatesSummary", SummaryTable(
        "DatesSummary", [("months_since_surgery", "monthsSinceSurgery")],
        ["median", "min", "max", "count"], ["Płeć"])),
    # :118-128 — surgery cause indicator sums
    ("study", "surgeryCouses", SummaryTable(
        "surgeryCouses", [("cause_aneurysm", "aneurysm"), ("cause_unknown", "unknown")],
        ["countTrue", "count"], ["Płeć"])),
    # :144-171 — prosthesis material/type counts per gender
    ("study", "MaterialEtcPerGender", SummaryTable(
        "MaterialEtcPerGender", [("is_stentgraft", "stentGraft")],
        ["countTrue", "count"], ["Płeć", "Rodzaj protezy"])),
    # :188-196 — risk-factor booleans
    ("study", "OtherRiskFactors", SummaryTable(
        "OtherRiskFactors", [("diabetes", "cukrzyca"), ("fever", "goraczka")],
        ["countTrue", "count"], ["Płeć"])),
    # :207-214 — CRP/WBC inflammation labs
    ("study", "LabolatoryInflammation", SummaryTable(
        "LabolatoryInflammation", [("crp", "crp"), ("wbc", "wbc")],
        ["median", "min", "max", "count"], ["Płeć"])),
    # :224-236 — microbiology indicator sums
    ("study", "MicrobiologicDataStudyGroup", SummaryTable(
        "MicrobiologicDataStudyGroup", [("micro_blood_pos", "krewPlus")],
        ["countTrue", "count"], ["Płeć"])),
    # :246-260 — two-point basic stats
    ("two_point", "BasicDataTwoPointStudy", SummaryTable(
        "BasicDataTwoPointStudy", [("suv_focus_e1", "suvE1"), ("suv_focus_e2", "suvE2")],
        ["median", "min", "max", "count"], ["Płeć"])),
    # :270-284 — control-group basics
    ("control", "BasicInControlGroup", SummaryTable(
        "BasicInControlGroup", [("suv_focus", "suvFocus"), ("suv_background", "suvBackground")],
        ["median", "min", "max", "count"], ["Rodzaj protezy"])),
    # :289-303 — control-group date intervals
    ("control", "ControlGroupDates", SummaryTable(
        "ControlGroupDates", [("age_years", "ageYears")],
        ["median", "min", "max", "count"], ["Rodzaj protezy"])),
    # :329-342 — uptake localisation indicators
    ("study", "StudyGroupLoc", SummaryTable(
        "StudyGroupLoc", [("loc_abdominal_aorta", "lokAortaBrzuszna")],
        ["countTrue", "count"], ["Płeć"])),
    # :360-369 — the flagship SUV stats table
    ("study", "StudyGroupSuv", SummaryTable(
        "StudyGroupSuv", [("suv_focus", "suvFocus"), ("suv_background", "suvBackground"), ("tbr", "tbr")],
        ["median", "min", "max", "count"], ["Płeć", "Rodzaj protezy"])),
    # :380-400 — image characteristic booleans
    ("study", "StudyGroupImageCharacteristic", SummaryTable(
        "StudyGroupImageCharacteristic", [("fever", "sign")],
        ["countTrue", "count"], ["Płeć"])),
    # :411-420 — SUV vs visual scales
    ("study", "SuvVsVisualScales", SummaryTable(
        "SuvVsVisualScales", [("suv_focus", "suvFocus"), ("tbr", "tbr")],
        ["median", "count"], ["skala5Stopnie"])),
    # :434-445 — SUV over the two exams
    ("two_point", "SuvTwoPointStudy", SummaryTable(
        "SuvTwoPointStudy", [("suv_focus_e1", "suvE1"), ("suv_focus_e2", "suvE2")],
        ["median", "count"], ["Płeć"])),
    # :458-469 — control-group SUV vs scales (incl. derived TBR)
    ("control", "SuvVsVisualScalesControlGroup", SummaryTable(
        "SuvVsVisualScalesControlGroup", [("suv_focus", "suvFocus"), ("tbr", "tbr")],
        ["median", "count"], ["Rodzaj protezy"])),
    # :478-491 — study vs control side-by-side (rebuilt as harmonized union,
    # not the reference's cartesian join — SURVEY §4)
    ("merged", "SuvStudyVsCrontrol", SummaryTable(
        "SuvStudyVsCrontrol", [("suv_focus", "suvFocus")],
        ["median", "min", "max", "count"], ["cohort"])),
    # :507-537 — any-CT-finding flag
    ("study", "CtDoneBefore", SummaryTable(
        "CtDoneBefore", [("any_ct_finding", "anyCtFinding")],
        ["countTrue", "count"], ["Płeć"])),
    # :547-558 — technical acquisition values across cohorts
    ("merged", "TechnicalDataInStudyAndControlGroup", SummaryTable(
        "TechnicalDataInStudyAndControlGroup", [("injected_activity", "activity"), ("glucose", "glucose")],
        ["median", "min", "max", "count"], ["cohort"])),
    # HypothesisTestingPrediction.scala:50-63 — imaging frame
    ("study", "imagingFrame", SummaryTable(
        "imagingFrame", [("fever", "sign")], ["countTrue"], ["Rodzaj protezy"])),
    # :78-122 — numeric frame across cohorts
    ("merged", "contrAndStudyNumbsFrame", SummaryTable(
        "contrAndStudyNumbsFrame", [("suv_focus", "suvFocus")],
        ["median", "count"], ["cohort"])),
    # :143-150 — visual-scale frame
    ("study", "aScale", SummaryTable(
        "aScale", [("suv_focus", "suvFocus")], ["median", "count"], ["skala5Stopnie"])),
]


def build_golden_tables(
    spark: SparkSession,
    cohorts: dict[str, DataFrame],
    only: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Instantiate every golden table whose cohort frame (and columns) are
    available. Missing metric/category columns in a cohort raise — callers
    pass cleaned frames with the FIXTURES.md aliases."""
    from azure_medicine_data_engineering_spark.operators.summarize import (
        categorized_summary,
    )

    out: dict[str, DataFrame] = {}
    for cohort, name, cfg in GOLDEN_TABLES:
        if only and name not in only:
            continue
        frame = cohorts.get(cohort)
        if frame is None:
            continue
        missing = [c for c, _ in cfg.metrics if c not in frame.columns]
        missing += [c for c in cfg.categories if c not in frame.columns]
        if missing:
            raise ValueError(f"{name}: cohort '{cohort}' lacks columns {missing}")
        out[name] = categorized_summary(frame, cfg.metrics, cfg.aggs, cfg.categories)
    return out
