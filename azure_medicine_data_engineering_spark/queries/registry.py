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


def events_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table with its nanosecond-precision ``ts``.

    Spark 4 rejects parquet INT64 TIMESTAMP(NANOS) outright
    (PARQUET_TYPE_ILLEGAL); read it as raw nanos via the legacy conf and
    truncate to microseconds — exactly what DuckDB's µs-native timestamp does,
    so both engines see identical values.

    ``nanosAsLong`` is a session-wide policy declared in
    ``session.DEFAULT_CONF``; it is re-asserted here only for sessions built
    outside :func:`session.get_spark` (it changes how any nanos-typed parquet
    column is read for the whole session — see the comment there)."""
    ensure_utc(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
