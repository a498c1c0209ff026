"""Declarative constraint-suite operator (operators/validation.py)."""

import pytest

from azure_medicine_data_engineering_spark.operators import validation as V


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, None, -5.0), (4, "A", 40.0)],
        "id long, cat string, val double",
    )


def test_validate_report_shape_and_outcomes(spark, frame):
    rows = V.validate(
        frame,
        [
            V.Constraint("completeness(cat)", V.completeness("cat"), lo=1.0),
            V.Constraint("uniqueness(id)", V.uniqueness("id"), lo=1.0),
            V.Constraint("min(val)", V.min_of("val"), lo=0.0),
            V.Constraint("max(val)", V.max_of("val"), hi=100.0),
            V.Constraint("set(cat)", V.in_set_fraction("cat", ["A", "B"]), lo=1.0),
            V.Constraint("row_count", V.row_count(), lo=1.0),
        ],
    ).collect()
    by_rule = {r["rule"]: r for r in rows}
    assert [r["rule"] for r in rows] == sorted(by_rule)  # ordered report
    assert by_rule["completeness(cat)"]["metric"] == 0.75
    assert not by_rule["completeness(cat)"]["passed"]
    assert by_rule["uniqueness(id)"]["passed"]
    assert not by_rule["min(val)"]["passed"]  # -5 < 0
    assert by_rule["max(val)"]["passed"]
    # in-set fraction ignores nulls: 3/3 non-null are in {A,B}
    assert by_rule["set(cat)"]["metric"] == 1.0 and by_rule["set(cat)"]["passed"]
    assert by_rule["row_count"]["metric"] == 4.0


def test_validate_single_scan(spark, frame):
    plan = V.validate(
        frame,
        [
            V.Constraint("completeness(cat)", V.completeness("cat"), lo=1.0),
            V.Constraint("min(val)", V.min_of("val"), lo=0.0),
            V.Constraint("row_count", V.row_count(), lo=1.0),
        ],
    )._jdf.queryExecution().executedPlan().toString()
    # all metrics fuse into ONE aggregation over ONE scan of the input
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 1


def test_null_metric_fails_closed(spark):
    empty = spark.createDataFrame([], "x double")
    rows = V.validate(
        empty, [V.Constraint("min(x)", V.min_of("x"), lo=0.0)]
    ).collect()
    assert rows[0]["metric"] is None and rows[0]["passed"] is False


def test_validate_rejects_empty_constraints(spark):
    import pytest

    from azure_medicine_data_engineering_spark.operators.validation import validate

    with pytest.raises(ValueError, match="non-empty"):
        validate(spark.range(3), [])


def test_quarantine_split_first_reason_and_nulls(spark):
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.validation import (
        quarantine_split,
    )

    df = spark.createDataFrame(
        [
            (1, 10.0, "ok"),
            (2, -5.0, "ok"),       # fails rule 1 (and rule 2) -> reason 1
            (3, 10.0, "bad"),      # fails rule 3
            (4, None, "ok"),       # NULL predicate -> fails rule 1
        ],
        "id long, price double, status string",
    )
    rules = [
        ("price_positive", F.col("price") > 0),
        ("price_small", F.col("price") < 100),
        ("status_ok", F.col("status") == "ok"),
    ]
    good, bad = quarantine_split(df, rules)
    assert sorted(r["id"] for r in good.collect()) == [1]
    reasons = {r["id"]: r["reason"] for r in bad.collect()}
    assert reasons == {2: "price_positive", 3: "status_ok", 4: "price_positive"}
    # partition property: every row exactly once
    assert good.count() + bad.count() == df.count()
