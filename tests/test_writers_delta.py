"""Managed-table sink (S5) format selection and the Delta path.

The reference's sink is ``format("delta") + mergeSchema`` (utils.scala:170).
This runtime ships no delta-spark jar and has no network to fetch one, so the
real-Delta test is skip-gated on runtime availability (it runs, unmodified,
in any deployment that has Delta on the classpath); the always-on tests pin
the fallback contract the engine actually executes here.
"""

import pytest
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.sources import writers


def _cleanup(spark, name):
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_format_detection_matches_runtime(spark):
    df = spark.range(3)
    # honest probe: Class.forName, not attribute probing (py4j JavaPackage
    # never raises) — in this sandbox it must report unavailable
    assert writers._delta_available(df) is False


def test_save_table_parquet_fallback_roundtrip(spark):
    name = "t_writer_fallback"
    _cleanup(spark, name)
    try:
        df = spark.range(10).withColumn("v", F.col("id") * 2)
        writers.save_table(df, name)
        assert spark.table(name).count() == 10
        provider = {
            r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
        }.get("Provider")
        assert provider == "parquet"  # delta absent -> documented fallback
        # append mode accumulates (the catalog-append building block)
        writers.save_table(df, name, mode="append")
        assert spark.table(name).count() == 20
    finally:
        _cleanup(spark, name)


def test_save_table_partitioned_layout(spark):
    name = "t_writer_part"
    _cleanup(spark, name)
    try:
        df = spark.range(100).withColumn("bucket", (F.col("id") % 4).cast("int"))
        writers.save_table(df, name, partition_by=["bucket"])
        got = spark.table(name)
        assert got.count() == 100
        # partition pruning works against the declared layout
        assert got.where(F.col("bucket") == 1).count() == 25
    finally:
        _cleanup(spark, name)


def test_delta_real_path_when_available(spark):
    """Runs the reference-parity sink (delta + mergeSchema) for real on any
    runtime with Delta; skips (visibly) where the jar is absent."""
    if not writers._delta_available(spark.range(1)):
        pytest.skip("delta-spark not on classpath in this runtime")
    name = "t_writer_delta"
    _cleanup(spark, name)
    try:
        writers.save_table(spark.range(5), name)
        provider = {
            r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
        }.get("Provider")
        assert provider == "delta"
        # mergeSchema: append with an added column must widen the schema
        widened = spark.range(5).withColumn("extra", F.lit(1))
        writers.save_table(widened, name, mode="append")
        assert "extra" in spark.table(name).columns
        assert spark.table(name).count() == 10
    finally:
        _cleanup(spark, name)
