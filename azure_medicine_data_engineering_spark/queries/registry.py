"""Query registry shared by all query modules.

Each registered query pairs a Spark DataFrame program ``(spark, sf_dir) ->
DataFrame`` with an optional DuckDB-runnable ANSI-SQL oracle. Conventions
(the driver's hash-compare is order-insensitive but name/value exact):

- every computed column aliased identically on both sides;
- float aggregates rounded to 4 decimals on both sides so the value hash is
  insensitive to summation order; counts cast to BIGINT on both sides;
- deterministic tie-breakers on every top-k / window ordering;
- session timezone pinned to UTC before timestamp arithmetic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from azure_medicine_data_engineering_spark.session import ensure_utc

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator registering a query (and its oracle SQL twin, if any)."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_utc(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
