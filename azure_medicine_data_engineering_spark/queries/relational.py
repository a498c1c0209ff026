"""Relational query registry: each entry pairs a Spark DataFrame program with a
DuckDB-oracle SQL twin (SURVEY §2 coverage → driver correctness gate).

Conventions (driver hash-compare is order-insensitive but name/value exact):
- every computed column aliased identically on both sides;
- float aggregates rounded to 4 decimals on both sides (summation-order
  insensitivity); counts cast to BIGINT on both sides;
- session timezone pinned to UTC before timestamp arithmetic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators.summarize import (
    categorized_summary,
    categorized_summary_oracle_sql,
)
from azure_medicine_data_engineering_spark.session import ensure_utc

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_utc(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# A1 categorized summary (flagship — reference createTableCategorized,
# utils.scala:183-220; call-site shape: StudyGroupSuv dataSummaries1.scala:360)
# ---------------------------------------------------------------------------

_CS_METRICS = [("l_quantity", "qty"), ("l_extendedprice", "price"), ("l_discount", "disc")]
_CS_AGGS = ["sum", "min", "max", "count", "avg", "median"]
_CS_CATS = ["l_returnflag", "l_linestatus"]


@register(
    "categorized_summary",
    categorized_summary_oracle_sql("lineitem", _CS_METRICS, _CS_AGGS, _CS_CATS),
)
def q_categorized_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return categorized_summary(
        _t(spark, sf_dir, "lineitem"), _CS_METRICS, _CS_AGGS, _CS_CATS
    )


# ---------------------------------------------------------------------------
# TPC-H Q1-style pricing summary: groupBy + multi-agg (A3-A5, A12)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(CAST(SUM(l_quantity) AS DOUBLE), 4) AS sum_qty,
           ROUND(CAST(SUM(l_extendedprice) AS DOUBLE), 4) AS sum_base_price,
           ROUND(CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE), 4) AS sum_disc_price,
           ROUND(CAST(AVG(l_quantity) AS DOUBLE), 4) AS avg_qty,
           ROUND(CAST(AVG(l_extendedprice) AS DOUBLE), 4) AS avg_price,
           ROUND(CAST(AVG(l_discount) AS DOUBLE), 4) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity").cast("double"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice").cast("double"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double"), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity").cast("double"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice").cast("double"), 4).alias("avg_price"),
            F.round(F.avg("l_discount").cast("double"), 4).alias("avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )
