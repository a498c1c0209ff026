"""Scale-up stress run: replicates the sf0.1 tables in-memory (key-offset
copies — no writes to the read-only testdata) and runs the heavy operator
families, verifying they complete and reporting wall-clock scaling vs sf0.1.

This is the local stand-in for the 100 TB question: operators whose cost
grows linearly with rows (and whose shuffles stay key-partitioned) should
scale ~N× in work on 32 fixed cores; anything super-linear or state-unsafe
shows up immediately.

The pair-materializing dedup stages (MinHash candidate pairs → clusters) are
capped at 10× replication regardless of the requested factor: replication
copies IDENTICAL texts, so every copy of a document lands in the same LSH
bucket and the candidate-pair count grows QUADRATICALLY in the replication
factor — a property of the synthetic cloning, not of the operator (real 100 TB
corpora don't put 100 copies of every document in one bucket). The capped run
still proves bucket-locality; the other families run at the full factor.

Usage: python tools/stress.py [replication_factor]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"
REPL = int(sys.argv[1]) if len(sys.argv) > 1 else 10
DEDUP_REPL = min(REPL, 10)  # see module docstring


def replicate(df, key_cols: dict[str, int], n: int):
    """n key-offset copies: each copy shifts the listed key columns by
    copy_index * offset so keys stay unique/consistent across copies."""
    rep = df.crossJoin(F.broadcast(
        df.sparkSession.range(n).select(F.col("id").alias("__copy"))
    ))
    for col, offset in key_cols.items():
        rep = rep.withColumn(col, F.col(col) + F.col("__copy") * F.lit(offset))
    return rep.drop("__copy")


def main() -> None:
    from azure_medicine_data_engineering_spark.session import get_spark
    from azure_medicine_data_engineering_spark.operators.summarize import categorized_summary
    from azure_medicine_data_engineering_spark.operators.quality import RangeSpec, quality_report
    from azure_medicine_data_engineering_spark.operators import dedup

    spark = get_spark(
        "amde-stress",
        master="local[32]",
        conf={
            "spark.sql.shuffle.partitions": "64",
            "spark.ui.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "8m",
            # local mode defaults to a 1g driver JVM — marginal for 10x
            # in-memory replication + persisted pair frames (broadcast
            # builds OOM intermittently); the box has plenty
            "spark.driver.memory": "16g",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    li = replicate(
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet"),
        {"l_orderkey": 10_000_000}, REPL,
    )
    orders = replicate(
        spark.read.parquet(f"{SF_DIR}/orders.parquet"),
        {"o_orderkey": 10_000_000, "o_custkey": 1_000_000}, REPL,
    )
    customer = replicate(
        spark.read.parquet(f"{SF_DIR}/customer.parquet"),
        {"c_custkey": 1_000_000}, REPL,
    )
    # documents.parquet is one small file -> 1-2 input splits, and the
    # broadcast-range crossJoin replication adds NO shuffle, so without a
    # repartition every map-side tokenize (textrank/good_turing/bm25) runs
    # on ONE task regardless of the factor (observed: a 100x run pinned a
    # single core on interpreted regexp for 10+ min). A real Nx corpus is
    # N files wide; repartition models that.
    docs = replicate(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), {"doc_id": 1_000_000}, REPL
    ).repartition(64)

    timings: dict[str, float] = {}

    def run(name, df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 2)

    n_li = li.count()
    run(
        "categorized_summary",
        categorized_summary(
            li,
            [("l_quantity", "qty"), ("l_extendedprice", "price")],
            ["sum", "min", "max", "count", "avg_stable", "median"],
            ["l_returnflag", "l_linestatus"],
        ),
    )
    # the scale-default flagship: approx-median state is fixed-size per
    # group, so this line should stay near-flat relative to exact median
    # as the factor grows
    run(
        "categorized_summary_fast",
        categorized_summary(
            li,
            [("l_quantity", "qty"), ("l_extendedprice", "price")],
            ["sum", "min", "max", "count", "avg_stable", "approx_median"],
            ["l_returnflag", "l_linestatus"],
        ),
    )
    run(
        "join_agg",
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum("o_totalprice").alias("rev"), F.count(F.lit(1)).alias("n")),
    )
    t0 = time.time()
    rep = quality_report(
        li,
        null_cols=["l_quantity", "l_discount"],
        ranges=[RangeSpec("l_quantity", 1, 50), RangeSpec("l_discount", 0, 0.08)],
        zscore_cols=["l_extendedprice"],
    )
    rep.collect()
    timings["quality_report"] = round(time.time() - t0, 2)
    docs_pairs = (
        docs
        if DEDUP_REPL == REPL
        else replicate(
            spark.read.parquet(f"{SF_DIR}/documents.parquet"),
            {"doc_id": 1_000_000},
            DEDUP_REPL,
        ).repartition(64)
    )
    t0 = time.time()
    pairs = dedup.minhash_dedup_pairs(docs_pairs, k=8, bands=4).persist()
    n_pairs = pairs.count()
    timings["minhash_lsh_dedup"] = round(time.time() - t0, 2)

    from azure_medicine_data_engineering_spark.operators import clusters

    t0 = time.time()
    cc = clusters.dedup_clusters(docs_pairs.select("doc_id"), pairs, threshold=0.5)
    n_dropped = cc.where(~F.col("is_representative")).count()
    timings["dedup_clusters"] = round(time.time() - t0, 2)

    # sketches: state must stay fixed-size while input grows 10x — the HLL
    # register table is <= m rows per group and the estimate should move
    # with the true cardinality (10x keys -> ~10x estimate)
    from azure_medicine_data_engineering_spark.functions import sketches

    t0 = time.time()
    hll = sketches.hll_distinct(
        orders, ["o_orderstatus"], "o_custkey", b=12
    ).collect()
    timings["hll_distinct"] = round(time.time() - t0, 2)
    n_regs = (
        sketches.hll_registers(orders, ["o_orderstatus"], "o_custkey", b=12)
        .groupBy("o_orderstatus")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert n_regs <= 4096, n_regs

    # round-2 families at 10x: ordered-event analytics (one user
    # partitioning), text ranking (postings shuffle), Lloyd k-means
    # (per-round corpus pass), z-order keys (map-only expressions)
    from azure_medicine_data_engineering_spark.functions.zorder import zorder_key
    from azure_medicine_data_engineering_spark.operators.events_analytics import (
        funnel_counts,
        retention_cohorts,
    )
    from azure_medicine_data_engineering_spark.operators.similarity import kmeans_fit
    from azure_medicine_data_engineering_spark.operators.text_rank import bm25_scores
    from azure_medicine_data_engineering_spark.queries.registry import events_table

    ev = replicate(
        events_table(spark, SF_DIR),
        {"user_id": 1_000_000, "event_id": 100_000_000},
        REPL,
    ).persist()
    ev.count()
    run("funnel", funnel_counts(ev, ["view", "click", "purchase"]))
    run("retention_cohorts", retention_cohorts(ev))

    # statistics family at N× (round-5 verdict ask #5): the bucketed
    # rank-prefix-sum claim ("survives any row count — no global
    # Window.orderBy anywhere") gets a measured multi-10M-row data
    # point. mann_whitney ranks the full replicated event fact; the
    # stratified twin ranks it again WITHIN day-of-week strata (keyed
    # windows, zero single-partition); the Pareto deciles ride the same
    # ranked_value_counts over the replicated customer-spend frame.
    from azure_medicine_data_engineering_spark.functions.rankstats import (
        mann_whitney_by_group,
        mann_whitney_u,
        ranked_value_counts,
    )

    cv = ev.where(F.col("event_type").isin("click", "view"))
    t0 = time.time()
    mw = mann_whitney_u(cv, "value", "event_type", "click").collect()
    timings["mann_whitney"] = round(time.time() - t0, 2)
    assert mw[0]["n1"] + mw[0]["n2"] > 0

    t0 = time.time()
    strat = mann_whitney_by_group(
        cv.withColumn(
            "dow",
            F.pmod(
                F.datediff(F.col("ts").cast("date"), F.to_date(F.lit("1970-01-01"))),
                7,
            ).cast("long"),
        ),
        "dow",
        "value",
        "event_type",
        "click",
    ).collect()
    timings["mann_whitney_stratified_dow"] = round(time.time() - t0, 2)
    assert len(strat) == 7, len(strat)
    ev.unpersist()

    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    t0 = time.time()
    ranked = ranked_value_counts(spend, "cents")
    tot = ranked.agg(
        F.sum("c_all").cast("long").alias("n"),
        F.sum(F.col("c_all") * F.col("v")).cast("long").alias("t"),
    )
    spans = (
        ranked.alias("a")
        .crossJoin(F.broadcast(tot).alias("b"))
        .select(
            "a.v",
            (F.col("b.n") - F.col("a.cnt_less")).alias("hi"),
            (F.col("b.n") - F.col("a.cnt_less") - F.col("a.c_all")).alias("lo0"),
            "b.n",
            F.explode(F.sequence(F.lit(1), F.lit(10))).alias("decile"),
        )
    )
    b_hi = F.expr("decile * (n div 10) + least(decile, n % 10)")
    b_lo = F.expr("(decile - 1) * (n div 10) + least(decile - 1, n % 10)")
    overl = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("hi"), b_hi) - F.greatest(F.col("lo0"), b_lo),
    )
    deciles = (
        spans.select("decile", overl.alias("k"), "v")
        .where(F.col("k") > 0)
        .groupBy("decile")
        .agg(F.sum("k").cast("long").alias("n_customers"))
        .collect()
    )
    timings["revenue_pareto_deciles"] = round(time.time() - t0, 2)
    assert len(deciles) == 10 and sum(r["n_customers"] for r in deciles) > 0

    run("bm25", bm25_scores(docs, ["spark", "table", "query"]))

    # round-6 corpus operators at N× (round-6 verdict ask #7): TextRank's
    # PageRank state is vocab-sized (replication grows edge WEIGHTS, not
    # the vocabulary — per-round cost should stay near-flat) and
    # Good-Turing is one shingle-count shuffle folded to 4 integers.
    from azure_medicine_data_engineering_spark.operators.text import (
        good_turing_ngram_mass,
    )
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        textrank_keywords,
    )

    run("textrank_keywords", textrank_keywords(docs, "text", iterations=3))
    t0 = time.time()
    gt = good_turing_ngram_mass(docs, n=4, text_col="text").collect()
    timings["good_turing_4gram_mass"] = round(time.time() - t0, 2)
    assert gt[0]["n_grams"] > 0

    emb_base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_emb = emb_base.count()
    emb = replicate(emb_base, {"vec_id": 100_000_000}, REPL)
    t0 = time.time()
    cents, assigned = kmeans_fit(emb, k=8, iterations=2)
    n_assigned = assigned.count()
    assert cents.count() <= 8
    timings["kmeans_2rounds"] = round(time.time() - t0, 2)
    assert n_assigned == n_emb * REPL, n_assigned

    run(
        "zorder_keys",
        customer.select(
            zorder_key(["c_custkey", "c_nationkey"], bits=15).alias("z")
        ).agg(F.max("z"), F.min("z")),
    )

    # pathological skew: 80% of the fact rows share ONE join key. Three
    # strategies over the same data — AQE skew-join handles the plain path,
    # salting spreads the hot key explicitly, and the comparison shows
    # neither serializes on a single reducer.
    from azure_medicine_data_engineering_spark.operators.joins import salted_join

    hot = orders.withColumn(
        "o_custkey",
        F.when(F.rand(7) < 0.8, F.lit(1)).otherwise(F.col("o_custkey")),
    ).persist()
    hot.count()
    agg = lambda j: j.groupBy("c_mktsegment").agg(  # noqa: E731
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("rev")
    )
    cust_k = customer.withColumnRenamed("c_custkey", "o_custkey")
    run("skew_join_aqe", agg(hot.join(cust_k, "o_custkey")))
    run(
        "skew_join_salted",
        agg(salted_join(hot, cust_k, "o_custkey", salt_factor=16, how="inner")),
    )
    hot.unpersist()

    print(
        json.dumps(
            {
                "replication": REPL,
                "dedup_replication": DEDUP_REPL,
                "lineitem_rows": n_li,
                "minhash_candidate_pairs": n_pairs,
                "dedup_dropped_docs": n_dropped,
                "hll_estimates": {r[0]: r[1] for r in hll},
                "timings_sec": timings,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
