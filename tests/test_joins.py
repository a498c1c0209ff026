"""Join-helper tests: salted-join correctness, bucketed co-located joins."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.operators.joins import (
    broadcast_join,
    salted_join,
    write_bucketed,
)


def _plan(df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_matches_plain_join(spark):
    # skewed: 90% of rows share key 1
    left = spark.createDataFrame(
        [(1 if i < 90 else i, f"v{i}") for i in range(100)], "k int, v string"
    )
    right = spark.createDataFrame([(i, f"r{i}") for i in range(20)], "k int, r string")
    expected = left.join(right, "k").select("k", "v", "r")
    got = salted_join(left, right, "k", salt_factor=4, salt_source="v").select("k", "v", "r")
    assert expected.count() == got.count() == 90  # only the hot key matches
    assert expected.exceptAll(got).count() == 0
    assert got.exceptAll(expected).count() == 0


def test_salted_join_spreads_hot_key(spark):
    left = spark.createDataFrame([(1, f"v{i}") for i in range(1000)], "k int, v string")
    salted = left.withColumn("__salt", F.pmod(F.xxhash64(F.col("v")), F.lit(8)))
    n_salts = salted.select("__salt").distinct().count()
    assert n_salts == 8  # hot key now spreads over 8 reducers


def test_broadcast_join_hint(spark):
    big = spark.range(1000).withColumnRenamed("id", "k")
    small = spark.createDataFrame([(i, f"d{i}") for i in range(5)], "k long, d string")
    plan = _plan(broadcast_join(big, small, "k"))
    assert "BroadcastHashJoin" in plan


def test_bucketed_join_avoids_shuffle(spark):
    import shutil

    for t in ("bkt_a", "bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # an earlier session may have left the managed location behind — the
        # in-memory catalog forgets tables across sessions but keeps dirs
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    a = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("x"))
    b = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 3).alias("y"))
    write_bucketed(a, "bkt_a", "k", buckets=4)
    write_bucketed(b, "bkt_b", "k", buckets=4)
    # force a merge join (tiny tables would otherwise broadcast, which has
    # its own BroadcastExchange) to show the bucketing removes the shuffle
    joined = spark.table("bkt_a").hint("merge").join(spark.table("bkt_b"), "k")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
    assert joined.count() == 100
    for t in ("bkt_a", "bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
