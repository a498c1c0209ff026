"""Declarative data-quality constraint suite (deequ-style).

Extends the reference's ad-hoc quality checks (``DataQualityCheck.scala``'s
range/null predicates, re-expressed in ``operators/quality.py``) into the
declarative contract a 100 TB ingest pipeline actually runs: a list of named
constraints, ALL evaluated in ONE aggregation pass over the table (partial
aggregation map-side, one tiny final reduce), unpivoted into a
``(rule, metric, passed)`` report.

No counterpart file in the reference — this is a scale extension in the
spirit of its quality gates; the shape follows the public deequ/"data unit
tests" pattern.

Scale notes: every metric is an aggregate expression, so N constraints cost
one table scan regardless of N; the final exchange carries exactly one row.
No UDFs, no collects.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One named data-quality rule: an aggregate ``metric`` plus inclusive
    [lo, hi] bounds the metric must fall in for the constraint to pass."""

    name: str
    metric: Column
    lo: float | None = None
    hi: float | None = None


# -- metric builders (each returns ONE aggregate expression) -----------------


def completeness(col: str) -> Column:
    """Fraction of rows with a non-null value (1.0 = fully complete)."""
    return F.avg(F.col(col).isNotNull().cast("double"))


def uniqueness(col: str) -> Column:
    """Distinct values / rows (1.0 = the column is a key)."""
    return F.count_distinct(F.col(col)).cast("double") / F.count(F.lit(1))


def min_of(col: str) -> Column:
    return F.min(F.col(col)).cast("double")


def max_of(col: str) -> Column:
    return F.max(F.col(col)).cast("double")


def mean_of(col: str) -> Column:
    return F.avg(F.col(col)).cast("double")


def in_set_fraction(col: str, allowed: list[str]) -> Column:
    """Fraction of non-null values inside the allowed set."""
    ok = F.col(col).isin(allowed).cast("double")
    return F.avg(F.when(F.col(col).isNull(), None).otherwise(ok))


def pattern_fraction(col: str, pattern: str) -> Column:
    """Fraction of non-null values matching an (RE2-safe) regex."""
    ok = F.col(col).rlike(pattern).cast("double")
    return F.avg(F.when(F.col(col).isNull(), None).otherwise(ok))


def row_count() -> Column:
    return F.count(F.lit(1)).cast("double")


def validate(df: DataFrame, constraints: list[Constraint]) -> DataFrame:
    """Evaluate every constraint in one aggregation pass.

    Returns ``(rule string, metric double, passed boolean)`` — one row
    per constraint, ordered by rule name. Metrics are rounded to 4
    decimals AFTER the pass check (bounds compare the unrounded aggregate;
    the rounded value is only the report's display form, and 4 decimals is
    the repo-wide oracle convention)."""
    if not constraints:
        # df.agg() with zero expressions throws a confusing analysis error
        raise ValueError("validate: constraints must be non-empty")
    aggs = []
    for i, c in enumerate(constraints):
        aggs.append(c.metric.cast("double").alias(f"_m{i}"))
    row = df.agg(*aggs)

    # unpivot via stack: (name, metric, passed) per constraint
    parts = []
    for i, c in enumerate(constraints):
        m = F.col(f"_m{i}")
        passed = F.lit(True)
        if c.lo is not None:
            passed = passed & (m >= F.lit(float(c.lo)))
        if c.hi is not None:
            passed = passed & (m <= F.lit(float(c.hi)))
        passed = F.when(m.isNull(), F.lit(False)).otherwise(passed)
        parts.append(
            F.struct(
                F.lit(c.name).alias("rule"),
                F.round(m, 4).alias("metric"),
                passed.alias("passed"),
            )
        )
    exploded = row.select(F.explode(F.array(*parts)).alias("r"))
    return exploded.select("r.rule", "r.metric", "r.passed").orderBy("rule")


def quarantine_split(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """Dead-letter routing — the row-level counterpart of the
    table-level :func:`validate` suite (and the relational sibling of
    the JSONL PERMISSIVE quarantine): every row either passes ALL rules
    or lands in the quarantine frame tagged with its FIRST failing rule
    (deterministic: rules evaluate in list order, NULL predicate counts
    as a failure — a rule that cannot be evaluated must not silently
    pass). Returns ``(good, quarantined)`` where quarantined =
    input columns + ``reason``.

    One when-chain per row, two filtered projections of the same scan —
    map-only, no shuffle; at 100 TB the split is free next to the write."""
    if not rules:
        raise ValueError("quarantine_split: rules must be non-empty")
    reason = F.lit(None).cast("string")
    for name, pred in reversed(rules):
        reason = F.when(~F.coalesce(pred, F.lit(False)), F.lit(name)).otherwise(
            reason
        )
    tagged = df.withColumn("reason", reason)
    good = tagged.where(F.col("reason").isNull()).drop("reason")
    bad = tagged.where(F.col("reason").isNotNull())
    return good, bad
