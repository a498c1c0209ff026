"""Sketch queries: deterministic HLL distinct-count estimates next to their
exact counterparts, oracle-checked bit-exactly (see functions/sketches.py for
why the estimate is engine-portable)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.functions import sketches
from azure_medicine_data_engineering_spark.queries.registry import register, table as _t


def _hll_with_exact_sql(table: str, group_col: str, value_col: str) -> str:
    hll = sketches.hll_oracle_sql(table, group_col, value_col, b=8)
    return f"""
    WITH hll AS ({hll}),
    exact AS (
      SELECT {group_col}, CAST(COUNT(DISTINCT {value_col}) AS BIGINT) AS n_exact
      FROM {table} GROUP BY {group_col}
    )
    SELECT hll.{group_col}, exact.n_exact, hll.hll_estimate
    FROM hll JOIN exact USING ({group_col})
    """


def _hll_with_exact(
    spark: SparkSession, sf_dir: str, table: str, group_col: str, value_col: str
) -> DataFrame:
    df = _t(spark, sf_dir, table)
    est = sketches.hll_distinct(df, [group_col], value_col, b=8)
    exact = df.groupBy(group_col).agg(
        F.count_distinct(F.col(value_col)).cast("long").alias("n_exact")
    )
    return est.join(exact, group_col).select(group_col, "n_exact", "hll_estimate")


@register(
    "hll_distinct_parts_by_flag",
    _hll_with_exact_sql("lineitem", "l_returnflag", "l_partkey"),
)
def q_hll_distinct_parts_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~2000 distinct parts per returnflag with m=256 registers → exercises
    the raw harmonic-mean branch (integer-exact sum; the only FP op is the
    final per-group division by the shared literal numerator)."""
    return _hll_with_exact(spark, sf_dir, "lineitem", "l_returnflag", "l_partkey")


@register(
    "hll_distinct_users_by_type",
    _hll_with_exact_sql("events", "event_type", "user_id"),
)
def q_hll_distinct_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~150 distinct users per event type with m=256 registers → exercises
    the linear-counting branch (m·ln(m/zeros) over integer-exact zeros)."""
    return _hll_with_exact(spark, sf_dir, "events", "event_type", "user_id")
