"""One-off round-16 phase profiler: decompose the expensive composite
queries (streaming twins, egress round trips) into labelled phases and
time each with the noop sink / forced action, so optimization targets the
measured phase instead of the whole black box (guide §1.1/§1.5).

Usage: python tools/phase_profile_r16.py <case> [...]
Cases: frontier_budget | wds_egress | arpa
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

_T0 = [time.time()]


def mark(label: str) -> None:
    now = time.time()
    print(f"PHASE {label}: {now - _T0[0]:.3f}s", flush=True)
    _T0[0] = now


def get_session():
    import __spark_entry__  # noqa: F401 — registry import order

    from azure_medicine_data_engineering_spark.session import get_spark

    spark = get_spark(
        "amde-phase",
        master=f"local[{CPUS}]",
        conf={
            "spark.sql.shuffle.partitions": CPUS,
            "spark.ui.enabled": "false",
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "65536",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    return spark


def case_frontier_budget(spark) -> None:
    """streaming_frontier_budget decomposition: stage write, stream
    machinery, and the per-trigger kernel phases (payload attach, robots
    gate+counts write, accumulate+waterfill+alloc write)."""
    import tempfile

    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.session import ensure_parallelism
    from azure_medicine_data_engineering_spark.streaming import windows as W

    docs = ensure_parallelism(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
    )
    mark("setup")
    stage = tempfile.mkdtemp(prefix="amde_phase_stage_")
    docs.repartition(4).write.mode("overwrite").parquet(stage)
    mark("stage_write")
    state_root = tempfile.mkdtemp(prefix="amde_phase_state_")
    # run the per-batch kernel DIRECTLY on each staged file — isolates the
    # kernel cost from the Structured Streaming trigger machinery
    files = sorted(
        os.path.join(stage, f)
        for f in os.listdir(stage)
        if f.endswith(".parquet")
    )
    for i, f in enumerate(files):
        bdf = spark.read.parquet(f)
        W.frontier_budget_process_batch(bdf, state_root, i)
        mark(f"kernel_batch_{i}")
    # now the full streaming query for comparison (fresh state root)
    import shutil

    state2 = tempfile.mkdtemp(prefix="amde_phase_state2_")
    stream = (
        spark.readStream.schema(spark.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.foreachBatch(
                lambda bdf, bid: W.frontier_budget_process_batch(
                    bdf, state2, bid
                )
            )
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination()
    mark("full_stream")
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(state_root, ignore_errors=True)
    shutil.rmtree(state2, ignore_errors=True)


def case_frontier_kernel(spark) -> None:
    """Sub-decompose ONE frontier batch kernel: payload attach vs robots
    gate vs counts write vs accumulate/waterfill/alloc."""
    import tempfile

    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.robots import (
        robots_gate_urls,
    )
    from azure_medicine_data_engineering_spark.operators.sampling import (
        waterfill_from_counts,
    )
    from azure_medicine_data_engineering_spark.session import ensure_parallelism
    from azure_medicine_data_engineering_spark.sources.sitemap import (
        attach_frontier_sitemap_payload,
        sitemap_ingest_urls,
    )

    docs = ensure_parallelism(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(1250)
    )
    docs.write.format("noop").mode("overwrite").save()
    mark("scan_only")
    media = attach_frontier_sitemap_payload(docs, "doc_id", "text")
    media.write.format("noop").mode("overwrite").save()
    mark("payload_attach")
    frontier = sitemap_ingest_urls(media).select(
        "media_id",
        "pos",
        F.regexp_extract("loc", r"^https://h(\d+)\.example\.com", 1)
        .cast("int")
        .alias("host_idx"),
        F.regexp_extract("loc", r"example\.com(/.*)$", 1).alias("path"),
    )
    frontier.write.format("noop").mode("overwrite").save()
    mark("sitemap_parse")
    counts = (
        robots_gate_urls(frontier)
        .where("allowed")
        .groupBy(F.col("host_idx").cast("string").alias("host"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"))
    )
    counts.write.format("noop").mode("overwrite").save()
    mark("robots_gate_counts")
    slot = tempfile.mkdtemp(prefix="amde_phase_slot_")
    counts.write.mode("overwrite").parquet(os.path.join(slot, "counts"))
    mark("counts_parquet_write")
    acc = (
        spark.read.parquet(os.path.join(slot, "counts"))
        .groupBy("host")
        .agg(F.sum("n_tokens").cast("long").alias("n_tokens"))
    )
    alloc = waterfill_from_counts(
        acc.select(F.col("host").alias("src"), "n_tokens"),
        group_col="host",
        budget_total_frac=(3, 5),
    )
    alloc.write.mode("overwrite").parquet(os.path.join(slot, "alloc"))
    mark("waterfill_alloc_write")


def case_wds_egress(spark) -> None:
    """wds_curated_shard_egress decomposition: funnel front half (Python
    encode + gates), stage write, streaming tar egress, manifest
    re-ingest + PNG decode."""
    import shutil

    from azure_medicine_data_engineering_spark.queries import (
        multimodal_funnel as MF,
    )
    from azure_medicine_data_engineering_spark.sources.webdataset import (
        curated_wds_manifest,
    )
    from azure_medicine_data_engineering_spark.streaming.sinks import (
        run_wds_curated_egress,
    )

    app = spark.sparkContext.applicationId
    stage = f"/tmp/amde_fixtures/phase_stage_{app}"
    root = f"/tmp/amde_fixtures/phase_root_{app}"
    shutil.rmtree(root, ignore_errors=True)
    samples = MF._funnel_survivor_samples(spark, SF_DIR)
    samples.write.format("noop").mode("overwrite").save()
    mark("funnel_front_noop")
    samples.repartition(4).write.mode("overwrite").parquet(stage)
    mark("stage_write")
    samples._media_cache.unpersist()
    stream = (
        spark.readStream.schema(spark.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    run_wds_curated_egress(
        stream, root, samples_per_shard=MF._EGRESS_SAMPLES_PER_SHARD
    )
    mark("stream_tar_egress")
    manifest = curated_wds_manifest(spark, root)
    manifest.write.format("noop").mode("overwrite").save()
    mark("manifest_reingest_decode")
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)


def case_arpa(spark) -> None:
    """kn_arpa_roundtrip decomposition: count pass, export (level build +
    section writes), parse, rescore."""
    import shutil

    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.arpa import (
        export_kn_pruned_arpa,
        kn_arpa_rescore,
        parse_arpa_pruned,
    )
    from azure_medicine_data_engineering_spark.operators.text_rank import (
        _kn5_group_counts,
    )
    from azure_medicine_data_engineering_spark.queries.corpus_pipeline import (
        _KN5_PRUNE_MIN_COUNT,
    )

    app = spark.sparkContext.applicationId
    root = f"/tmp/amde_fixtures/phase_arpa_{app}"
    shutil.rmtree(root, ignore_errors=True)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    gpg, ndocs = _kn5_group_counts(docs)
    gpg.write.format("noop").mode("overwrite").save()
    mark("gpg_counts")
    g5_counts = gpg.groupBy("pg").agg(
        F.sum("cgp").cast("long").alias("c5")
    )
    export_kn_pruned_arpa(
        docs, root, min_count=_KN5_PRUNE_MIN_COUNT, gram_counts=g5_counts
    )
    mark("export")
    levels, nalp = parse_arpa_pruned(spark, root)
    mark("parse")
    scored = kn_arpa_rescore(docs, levels, nalp, counts=(gpg, ndocs))
    scored.write.format("noop").mode("overwrite").save()
    mark("rescore")
    for c in getattr(scored, "_stage_caches", None) or []:
        c.unpersist()
    shutil.rmtree(root, ignore_errors=True)


CASES = {
    "frontier_budget": case_frontier_budget,
    "frontier_kernel": case_frontier_kernel,
    "wds_egress": case_wds_egress,
    "arpa": case_arpa,
}


def main() -> None:
    spark = get_session()
    mark("session")
    for name in sys.argv[1:]:
        fn = CASES.get(name)
        if fn is None:
            print(f"SKIP unknown case {name}")
            continue
        spark.sparkContext.setJobDescription(f"phase:{name}")
        print(f"== case {name} ==", flush=True)
        _T0[0] = time.time()
        fn(spark)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
