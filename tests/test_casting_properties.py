"""Property-based checks for the casting spec (SURVEY §5 rebuild strategy:
comma-decimals, mixed boolean encodings, NULL propagation)."""

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.functions import casting

_SETTINGS = dict(
    max_examples=12,  # each example runs a Spark job — keep the budget sane
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _roundtrip(spark, values, prepare, cast_to=None):
    df = spark.createDataFrame([(v,) for v in values], "raw string")
    expr = prepare(F.col("raw"))
    if cast_to:
        expr = expr.cast(cast_to)
    return [r.v for r in df.select(expr.alias("v")).collect()]


@given(st.lists(st.decimals(
    min_value=-10**6, max_value=10**6, places=3, allow_nan=False, allow_infinity=False
), min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_comma_decimal_roundtrip(spark, decimals):
    raw = [str(d).replace(".", ",") for d in decimals]
    out = _roundtrip(spark, raw, casting.comma_decimal, "double")
    for d, v in zip(decimals, out):
        assert v is not None and math.isclose(v, float(d), rel_tol=1e-12)


@given(st.lists(st.sampled_from(
    ["Prawda", "prawda", "PRAWDA", "", "nie", "fałsz", "x", None]
), min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_boolean_from_string_properties(spark, raws):
    df = spark.createDataFrame([(v,) for v in raws], "raw string")
    out = [
        r.v
        for r in df.select(casting.boolean_from_string(F.col("raw")).alias("v")).collect()
    ]
    for raw, v in zip(raws, out):
        if raw is None:
            assert v is None           # NULL stays NULL (utils.scala:104-108)
        elif raw.lower() == "prawda":
            assert v is True           # case-insensitive match
        else:
            assert v is False          # anything else (incl. "") is false


@given(st.lists(st.one_of(st.integers(min_value=0, max_value=1), st.none()),
                min_size=1, max_size=10))
@settings(**_SETTINGS)
def test_boolean_from_int_properties(spark, raws):
    df = spark.createDataFrame([(v,) for v in raws], "raw int")
    out = [r.v for r in df.select(casting.boolean_from_int(F.col("raw")).alias("v")).collect()]
    for raw, v in zip(raws, out):
        assert v is (None if raw is None else bool(raw))


@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60))
@settings(**_SETTINGS)
def test_fingerprint_invariant_to_case_and_spacing(spark, s):
    from azure_medicine_data_engineering_spark.operators.text import fingerprint

    df = spark.createDataFrame([(s, s.upper() + "  ")], "a string, b string")
    row = df.select(
        fingerprint(F.col("a")).alias("fa"), fingerprint(F.col("b")).alias("fb")
    ).collect()[0]
    assert row.fa == row.fb
