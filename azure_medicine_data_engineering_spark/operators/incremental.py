"""Incremental aggregate state maintenance — the partial-agg pattern that
lets a 100 TB history table stay UNSCANNED when a new batch lands.

The state table holds mergeable partials per (day, event_type): count,
cents-grid value sum, min/max, plus the HLL user registers from
``functions/sketches.py``. Every one of these merges associatively
(sum/sum/min/max/register-MAX), so

    merge(state(history), state(batch)) == state(history UNION batch)

bit-for-bit — the claim the registered query's full-recompute oracle
checks. At scale the state table is days × types rows (thousands), the
register table is 256× that — both tiny next to the fact table, and a new
batch costs one scan OF THE BATCH plus a state-sized merge.

No counterpart in the reference (its notebooks recompute aggregates from
scratch per run; see SURVEY.md §2.4) — this is the scale extension that
makes those aggregates maintainable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.functions.sketches import (
    hll_estimate,
    hll_merge,
    hll_registers,
)

STATE_KEYS = ["d", "event_type"]


def _prepared(events: DataFrame) -> DataFrame:
    # cents grid, not raw doubles: day-level money sums at corpus scale sit
    # squarely in the running-sum drift regime (CLAUDE.md integer-grid rule)
    return events.select(
        F.date_format("ts", "yyyy-MM-dd").alias("d"),
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("_c"),
        "user_id",
    )


def day_type_state(events: DataFrame) -> DataFrame:
    """Scalar partial-agg state per (day, event_type)."""
    return _prepared(events).groupBy(*STATE_KEYS).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_c").cast("long").alias("v_cents"),
        F.min("_c").cast("long").alias("vmin_cents"),
        F.max("_c").cast("long").alias("vmax_cents"),
    )


def day_type_user_registers(events: DataFrame, b: int = 8) -> DataFrame:
    """HLL register state for distinct users per (day, event_type)."""
    return hll_registers(_prepared(events), STATE_KEYS, "user_id", b)


def merge_day_type_state(a: DataFrame, b: DataFrame) -> DataFrame:
    """Combine two disjoint-data state tables (keyed union-aggregate; the
    shuffle moves state-sized rows, never fact rows)."""
    return (
        a.unionByName(b)
        .groupBy(*STATE_KEYS)
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("v_cents").cast("long").alias("v_cents"),
            F.min("vmin_cents").cast("long").alias("vmin_cents"),
            F.max("vmax_cents").cast("long").alias("vmax_cents"),
        )
    )


def state_report(state: DataFrame, registers: DataFrame, b: int = 8) -> DataFrame:
    """Human-facing aggregate view of a (merged) state: the identical shape
    a from-scratch GROUP BY over the full fact table would produce."""
    est = hll_estimate(registers, STATE_KEYS, b)
    return state.join(est, STATE_KEYS).select(
        "d",
        "event_type",
        F.col("n").alias("n_events"),
        (F.col("v_cents") / 100.0).alias("sum_value"),
        (F.col("vmin_cents") / 100.0).alias("min_value"),
        (F.col("vmax_cents") / 100.0).alias("max_value"),
        F.col("hll_estimate").alias("approx_users"),
    )
