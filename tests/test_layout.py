"""Bucketed-table joins and Z-order clustering: the write-side layout
optimizations that make 100 TB scans and fact-to-fact joins cheap."""

import glob

import pytest
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.functions.zorder import (
    cluster_by_zorder,
    zorder_key,
)
from azure_medicine_data_engineering_spark.sources.writers import (
    write_bucketed_table,
    write_compacted,
)
from tests.test_plans import plan_of


@pytest.fixture
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_eliminates_shuffle(spark, no_broadcast):
    a = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    b = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("w")
    )
    try:
        write_bucketed_table(a, "t_layout_a", ["k"], 8, sort_cols=["k"])
        write_bucketed_table(b, "t_layout_b", ["k"], 8, sort_cols=["k"])
        joined = spark.table("t_layout_a").join(spark.table("t_layout_b"), "k")
        plan = plan_of(joined)
        # sort-merge-bucket join: both sides pre-hashed into matching
        # buckets, so the plan has NO Exchange at all
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == 5000

        # control: the same join off plain parquet shuffles both sides
        plain = a.join(b, "k")
        assert "Exchange" in plan_of(plain)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_layout_a")
        spark.sql("DROP TABLE IF EXISTS t_layout_b")


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(5, 3)], "x long, y long")
    # x=0b101 at even bit positions, y=0b011 at odd positions:
    # z = 1*1 + 1*2 + 0*4 + 1*8 + 1*16 + 0*32 = 27
    row = df.select(zorder_key(["x", "y"], bits=3).alias("z")).head()
    assert row.z == 27


def test_zorder_key_is_jvm_side(spark):
    df = spark.range(10).select(
        F.col("id").alias("x"), (F.col("id") * 3).alias("y")
    )
    plan = plan_of(df.select(zorder_key(["x", "y"], bits=8)))
    assert "pythonUDF" not in plan.lower()  # pure expressions, codegen-able


def test_zorder_key_rejects_overflow():
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)  # 64 bits > signed long


def test_zorder_write_narrows_file_ranges(spark, tmp_path):
    # 4096 rows over a 64x64 grid; z-ordered into 16 files, every file's
    # min/max span on EACH dimension must be far below the full domain —
    # that span IS the parquet row-group stat a scan prunes on
    n_side, n_files = 64, 16
    grid = (
        spark.range(n_side * n_side)
        .select(
            (F.col("id") % n_side).alias("x"),
            (F.col("id") / n_side).cast("long").alias("y"),
        )
    )
    out = str(tmp_path / "zordered")
    write_compacted(
        cluster_by_zorder(grid, ["x", "y"], n_partitions=n_files, bits=6),
        out,
        order_cols=["z_key"],
        n_files=n_files,
    )
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == n_files
    import pyarrow.parquet as pq

    for f in files:
        t = pq.read_table(f, columns=["x", "y"])
        for col in ("x", "y"):
            vals = t.column(col).to_pylist()
            span = max(vals) - min(vals)
            # a random (unclustered) file would span ~the full 0..63 domain;
            # a 1/16 z-range of a 2-D grid spans ~1/4 per dimension
            assert span <= n_side // 2, (f, col, span)


def test_no_duplicate_toplevel_defs():
    """Round-10 guard: Python silently SHADOWS a re-defined module-level
    function (the registry's duplicate guard covers query NAMES only) —
    a round-10 draft redefined the round-5 ks_by_group and broke its
    query at build time. Fail fast on any duplicate top-level def/class
    in the package."""
    import ast
    import os

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "azure_medicine_data_engineering_spark",
    )
    offenders = []
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            tree = ast.parse(open(path).read())
            seen: dict[str, int] = {}
            for node in tree.body:
                if isinstance(
                    node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
                ):
                    if node.name in seen:
                        offenders.append(
                            f"{path}:{node.lineno} redefines {node.name} "
                            f"(first at :{seen[node.name]})"
                        )
                    else:
                        seen[node.name] = node.lineno
    assert not offenders, offenders
