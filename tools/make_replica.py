"""Materialize a key-offset-replicated copy of an SF dir so the ORACLE
COMPARISON itself (tools/check_correctness.py) can run at sf1-equivalent
rows — the sweep that catches numeric-tie bugs invisible at every
standard SF (money-sum drift, .00005 rounding ties; see SCALE.md
"10×-sf0.1 ORACLE sweep").

Each fact table gets n key-offset copies (tools/stress.py:replicate
semantics — key columns shift by copy_index · offset so keys stay
unique); dimension tables are copied verbatim. Every VALUE therefore
appears n× — exactly the tie amplification the sweep wants.

Usage: python tools/make_replica.py [out_dir] [n] [src_sf_dir]
Then:  SPARK_GRAFT_SF_DIR=<out_dir> SPARK_GRAFT_DRIVER_MEM=12g \
         python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402


def replicate(df, key_cols: dict[str, int], n: int):
    """n key-offset copies (tools/stress.py:replicate — inlined because
    stress.py parses sys.argv at import time)."""
    rep = df.crossJoin(F.broadcast(
        df.sparkSession.range(n).select(F.col("id").alias("__copy"))
    ))
    for col, offset in key_cols.items():
        rep = rep.withColumn(col, F.col(col) + F.col("__copy") * F.lit(offset))
    return rep.drop("__copy")

#: fact table -> key columns to offset per copy
FACT_KEYS = {
    "lineitem": {"l_orderkey": 10_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "events": {"event_id": 100_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 100_000_000},
}
DIMS = ["region", "nation", "supplier", "part"]


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/replica10"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    from azure_medicine_data_engineering_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "make-replica",
        master=f"local[{cpus}]",
        conf={
            "spark.sql.shuffle.partitions": cpus,
            "spark.ui.enabled": "false",
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
        },
    )
    os.makedirs(out_dir, exist_ok=True)
    for t, keys in FACT_KEYS.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        replicate(df, keys, n).repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
        print(f"replicated {t} x{n}")
    for t in DIMS:
        dst = f"{out_dir}/{t}.parquet"
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        elif os.path.exists(dst):
            os.remove(dst)
        shutil.copy(f"{src}/{t}.parquet", dst)
        print(f"copied {t}")
    print(f"replica ready: {out_dir}")


if __name__ == "__main__":
    main()
