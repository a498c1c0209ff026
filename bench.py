"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...}

Results sink is Spark's noop writer — full execution, no driver collect cost.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: Headline set: one per operator family (agg, grouping sets, join, top-k,
#: window, sessionization, events, text/dedup/similarity once implemented).
HEADLINE = [
    "categorized_summary",
    "pricing_summary",
    "join_star_revenue",
    "top_customers_by_spend",
    "window_customer_order_rank",
    "events_tumbling_hourly",
    "events_sessionization",
    "events_json_props",
    "quality_report_lineitem",
    "minhash_lsh_dedup",
    "embedding_knn_topk",
    "text_quality_scores",
    "forecast_revenue_filter",
    "shipping_priority_topk",
    "local_supplier_volume",
    "winnowing_fingerprints",
    "asof_join_purchase_to_click",
    "embedding_ivf_topk",
]


def main() -> None:
    import __spark_entry__ as entrymod
    from azure_medicine_data_engineering_spark.session import get_spark

    qs = entrymod.queries()
    spark = get_spark(
        "amde-bench",
        master=f"local[{CPUS}]",
        conf={
            "spark.sql.shuffle.partitions": CPUS,
            "spark.ui.enabled": "false",
            # local-bench split sizing: test files are tens of MB, so the
            # 128 MiB cluster default would scan on 1-3 cores; smaller splits
            # restore parallelism without changing cluster defaults.
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "1m",
        },
    )
    # JVM/codegen warm-up so the first timed query isn't charged for JIT
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).collect()
    sf_match = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(sf_match.group(1)) if sf_match else None

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query wall-clock (noop sink)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
