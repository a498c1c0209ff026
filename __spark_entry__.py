"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``azure_medicine_data_engineering_spark``; this module
only adapts it to the driver's calling convention. Float-valued aggregates are
rounded identically on both sides (Spark and oracle SQL) so the value hash is
not sensitive to summation order.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from azure_medicine_data_engineering_spark.queries import registry  # noqa: E402
from azure_medicine_data_engineering_spark.queries import (  # noqa: E402,F401
    events,
    quality,
    relational,
    relational2,
    sql_surface,
    stats_ml,
    text_dedup,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the categorized-summary
    operator (reference's ``createTableCategorized``) over lineitem."""
    return relational.q_categorized_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for
    non-SQL-expressible ops; the driver then records a rows-only check)."""
    return dict(registry.ORACLES)
