"""End-to-end MULTIMODAL curation funnel (round 13): the composed pipeline
a LAION-style image+caption pretraining set actually runs, as one funnel
with per-stage drop counts + sum-of-ids checksums — the `crawl_funnel`
discipline applied to the multimodal ingest chain:

    WDS image+caption shards -> tar parse + PNG decode + CLIP-shaped
    alignment gate (cosine over the shared integer grid, fingerprint
    recovered FROM THE DECODED PIXELS) -> caption quality gate (Gopher
    all-rules battery on the WIRE-EXTRACTED caption) -> exact image dedup
    (content fingerprint, min-id representative).

Every stage gates on values that crossed the real wire (tar members,
decoded pixels), so a container/codec regression anywhere breaks the
hash match. Re-expresses no single reference file — the scale-extension
composition class (`crawl_e2e_frontier_docs` sibling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from azure_medicine_data_engineering_spark.queries.registry import (
    register,
    table as _t,
)
from azure_medicine_data_engineering_spark.queries.stats_ml import (
    _ALIGN_COS,
    _ALIGN_THRESHOLD,
    _align_tower_sql,
)
from azure_medicine_data_engineering_spark.operators.text_clean import (
    GOPHER_STOP_WORDS,
)

_STOPS_SQL = " + ".join(
    f"CAST(list_contains(ws, '{sw}') AS INT)" for sw in GOPHER_STOP_WORDS
)

#: caption-gate thresholds — tuned to the synthetic corpus profile like the
#: crawl funnel's (operator defaults stay the Gopher-paper values)
_MIN_WORDS, _MIN_STOPS = 30, 1


@register(
    "multimodal_e2e_curation",
    f"""
    WITH m AS MATERIALIZED (
      SELECT doc_id, text, md5(text) AS fpi,
             CAST(('0x' || substr(md5(text), 5, 2)) AS INT) % 4 = 0 AS planted
      FROM documents
    ),
    c AS MATERIALIZED (
      SELECT doc_id, fpi,
             CASE WHEN planted THEN 'mismatch ' || text ELSE text END AS caption,
             CASE WHEN planted THEN md5('mismatch ' || text) ELSE fpi END AS fpt
      FROM m
    ),
    e AS (
      SELECT doc_id, fpi, caption,
             {_align_tower_sql('fpi', 'i')} AS ei,
             {_align_tower_sql('fpt', 't')} AS et
      FROM c
    ),
    sc AS MATERIALIZED (
      SELECT doc_id, fpi, caption,
             CAST(list_sum(list_transform(range(32), j -> ei[j+1] * et[j+1])) AS BIGINT) AS dot,
             CAST(list_sum(list_transform(ei, x -> x * x)) AS BIGINT) AS na,
             CAST(list_sum(list_transform(et, x -> x * x)) AS BIGINT) AS nb
      FROM e
    ),
    s1 AS MATERIALIZED (
      SELECT doc_id, fpi, caption FROM sc
      WHERE {_ALIGN_COS} >= {_ALIGN_THRESHOLD}
    ),
    gf AS (
      SELECT doc_id, fpi, caption,
             list_filter(string_split(caption, ' '), x -> x <> '') AS ws,
             length(caption) - length(replace(caption, '#', '')) AS n_hash,
             (length(caption) - length(replace(caption, '...', ''))) // 3 AS n_ell
      FROM s1
    ),
    s2 AS MATERIALIZED (
      SELECT doc_id, fpi FROM (
        SELECT doc_id, fpi, len(ws) AS nw,
               COALESCE(list_sum(list_transform(ws, x -> length(x))), 0) AS tc,
               len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]'))) AS na_,
               n_hash, n_ell, ({_STOPS_SQL}) AS stop_hits
        FROM gf
      )
      WHERE nw >= {_MIN_WORDS} AND nw <= 100000
        AND tc >= 3 * nw AND tc <= 10 * nw
        AND 10 * (n_hash + n_ell) <= nw
        AND 10 * na_ >= 8 * nw
        AND stop_hits >= {_MIN_STOPS}
    ),
    s3 AS MATERIALIZED (
      SELECT doc_id FROM (
        SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY fpi ORDER BY doc_id) AS rn
        FROM s2
      ) WHERE rn = 1
    ),
    funnel AS (
      SELECT 0 AS stage_id, 'wds_samples' AS stage,
             CAST(COUNT(*) AS BIGINT) AS n_out,
             CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) AS sum_ids FROM m
      UNION ALL
      SELECT 1, 'aligned', CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM s1
      UNION ALL
      SELECT 2, 'caption_quality', CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM s2
      UNION ALL
      SELECT 3, 'unique_images', CAST(COUNT(*) AS BIGINT),
             CAST(COALESCE(SUM(doc_id), 0) AS BIGINT) FROM s3
    )
    SELECT CAST(stage_id AS INT) AS stage_id, stage, n_out,
           CAST(COALESCE(LAG(n_out) OVER (ORDER BY stage_id) - n_out, 0) AS BIGINT)
             AS n_dropped,
           sum_ids
    FROM funnel
    """,
)
def q_multimodal_e2e_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal curation funnel: WDS shards -> alignment gate
    (decoded-pixel fingerprint vs caption embedding) -> Gopher caption
    quality -> exact image dedup; per-stage counts, drops, id checksums.
    Every gated value crossed the real wire (tar member bytes, PNG
    pixels). Map-only fan-out + keyed/global aggregations only."""
    from azure_medicine_data_engineering_spark.operators.text_clean import (
        gopher_ok_all,
    )
    from azure_medicine_data_engineering_spark.session import ensure_parallelism
    from azure_medicine_data_engineering_spark.sources.webdataset import (
        attach_wds_image_caption_payload,
        image_text_alignment_stats,
    )

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    media = attach_wds_image_caption_payload(docs, "doc_id", "text")
    stats = image_text_alignment_stats(media).persist()
    s1 = (
        stats.withColumn("cos", F.expr(_ALIGN_COS))
        .where(F.expr(f"cos >= {_ALIGN_THRESHOLD}"))
        .select("media_id", "fp_img", "caption")
        .persist()
    )
    s2 = s1.where(
        gopher_ok_all(
            F.col("caption"), min_words=_MIN_WORDS, min_stop_hits=_MIN_STOPS
        )
    ).persist()
    w_dup = Window.partitionBy("fp_img").orderBy("media_id")
    s3 = (
        s2.withColumn("rn", F.row_number().over(w_dup))
        .where(F.col("rn") == 1)
        .select("media_id")
    )

    def row(df: DataFrame, sid: int, name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_out"),
            F.coalesce(F.sum("media_id"), F.lit(0)).cast("long").alias("sum_ids"),
        ).select(
            F.lit(sid).cast("int").alias("stage_id"),
            F.lit(name).alias("stage"),
            "n_out",
            "sum_ids",
        )

    funnel = (
        row(stats, 0, "wds_samples")
        .unionByName(row(s1, 1, "aligned"))
        .unionByName(row(s2, 2, "caption_quality"))
        .unionByName(row(s3, 3, "unique_images"))
    )
    w = Window.orderBy("stage_id")
    out = funnel.select(
        "stage_id",
        "stage",
        "n_out",
        F.coalesce(F.lag("n_out").over(w) - F.col("n_out"), F.lit(0))
        .cast("long")
        .alias("n_dropped"),
        "sum_ids",
    )
    out._stage_caches = [stats, s1, s2]
    return out


# ---------------------------------------------------------------------------
# Round 14: curated-shard EGRESS — the funnel's missing last stage. The
# survivors are repackaged into WebDataset shard tars (N-sample, sparse
# `media_id div 8` keys) and REALLY written; the returned manifest is
# recomputed from the LANDED tar bytes (tar parse + PNG decode + caption
# md5), so the oracle proves the round trip: gate -> assemble -> land ->
# re-ingest. Streaming twin = the same bytes via the exactly-once
# `WdsCuratedEgress` (_HWM marker-last) under arbitrary micro-batching.
# ---------------------------------------------------------------------------

_EGRESS_SAMPLES_PER_SHARD = 8

#: survivors with the columns the manifest checksums need (doc_id, image
#: fingerprint = md5(text) by fixture construction, landed caption)
_SURVIVOR_CTE = f"""
    m AS MATERIALIZED (
      SELECT doc_id, text, md5(text) AS fpi,
             CAST(('0x' || substr(md5(text), 5, 2)) AS INT) % 4 = 0 AS planted
      FROM documents
    ),
    c AS MATERIALIZED (
      SELECT doc_id, fpi,
             CASE WHEN planted THEN 'mismatch ' || text ELSE text END AS caption,
             CASE WHEN planted THEN md5('mismatch ' || text) ELSE fpi END AS fpt
      FROM m
    ),
    e AS (
      SELECT doc_id, fpi, caption,
             {{tower_i}} AS ei,
             {{tower_t}} AS et
      FROM c
    ),
    sc AS MATERIALIZED (
      SELECT doc_id, fpi, caption,
             CAST(list_sum(list_transform(range(32), j -> ei[j+1] * et[j+1])) AS BIGINT) AS dot,
             CAST(list_sum(list_transform(ei, x -> x * x)) AS BIGINT) AS na,
             CAST(list_sum(list_transform(et, x -> x * x)) AS BIGINT) AS nb
      FROM e
    ),
    s1 AS MATERIALIZED (
      SELECT doc_id, fpi, caption FROM sc
      WHERE {{cos}} >= {{thr}}
    ),
    gf AS (
      SELECT doc_id, fpi, caption,
             list_filter(string_split(caption, ' '), x -> x <> '') AS ws,
             length(caption) - length(replace(caption, '#', '')) AS n_hash,
             (length(caption) - length(replace(caption, '...', ''))) // 3 AS n_ell
      FROM s1
    ),
    s2 AS MATERIALIZED (
      SELECT doc_id, fpi, caption FROM (
        SELECT doc_id, fpi, caption, len(ws) AS nw,
               COALESCE(list_sum(list_transform(ws, x -> length(x))), 0) AS tc,
               len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]'))) AS na_,
               n_hash, n_ell, ({_STOPS_SQL}) AS stop_hits
        FROM gf
      )
      WHERE nw >= {_MIN_WORDS} AND nw <= 100000
        AND tc >= 3 * nw AND tc <= 10 * nw
        AND 10 * (n_hash + n_ell) <= nw
        AND 10 * na_ >= 8 * nw
        AND stop_hits >= {_MIN_STOPS}
    ),
    s3 AS (
      SELECT doc_id, fpi, caption FROM (
        SELECT doc_id, fpi, caption,
               ROW_NUMBER() OVER (PARTITION BY fpi ORDER BY doc_id) AS rn
        FROM s2
      ) WHERE rn = 1
    )
""".format(
    tower_i=_align_tower_sql("fpi", "i"),
    tower_t=_align_tower_sql("fpt", "t"),
    cos=_ALIGN_COS,
    thr=_ALIGN_THRESHOLD,
)

_EGRESS_MANIFEST_SQL = f"""
    WITH {_SURVIVOR_CTE}
    SELECT CAST(doc_id // {_EGRESS_SAMPLES_PER_SHARD} AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
           CAST(SUM(strlen(caption)) AS BIGINT) AS caption_bytes,
           CAST(SUM(CAST(('0x' || substr(md5(caption), 1, 12)) AS BIGINT)) AS BIGINT)
             AS caption_ck,
           CAST(SUM(CAST(('0x' || substr(fpi, 1, 12)) AS BIGINT)) AS BIGINT)
             AS fp_ck
    FROM s3 GROUP BY 1
"""

_FIXTURE_ROOT = "/tmp/amde_fixtures"


def _funnel_survivor_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared curation front half: WDS fixture -> alignment gate -> caption
    quality -> exact image dedup -> member-byte extraction for the
    survivors. Returns (media_id, png, txt) with the BYTES that crossed
    the wire; `media` is persisted across its two consumers (alignment
    scan + survivor byte extraction) because its lineage is the expensive
    Python encode pass."""
    from azure_medicine_data_engineering_spark.operators.text_clean import (
        gopher_ok_all,
    )
    from azure_medicine_data_engineering_spark.session import ensure_parallelism
    from azure_medicine_data_engineering_spark.sources.webdataset import (
        attach_wds_image_caption_payload,
        extract_curated_samples,
        image_text_alignment_stats,
    )

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    media = attach_wds_image_caption_payload(docs, "doc_id", "text").persist()
    stats = image_text_alignment_stats(media)
    s1 = (
        stats.withColumn("cos", F.expr(_ALIGN_COS))
        .where(F.expr(f"cos >= {_ALIGN_THRESHOLD}"))
        .select("media_id", "fp_img", "caption")
    )
    s2 = s1.where(
        gopher_ok_all(
            F.col("caption"), min_words=_MIN_WORDS, min_stop_hits=_MIN_STOPS
        )
    )
    w_dup = Window.partitionBy("fp_img").orderBy("media_id")
    s3 = (
        s2.withColumn("rn", F.row_number().over(w_dup))
        .where(F.col("rn") == 1)
        .select("media_id")
    )
    samples = extract_curated_samples(media, s3)
    samples._media_cache = media  # keep the persist handle alive
    return samples


@register("wds_curated_shards", _EGRESS_MANIFEST_SQL)
def q_wds_curated_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated-shard egress, batch: funnel survivors -> WDS shard tars
    REALLY written under a fixture root (distributed per-shard writes,
    atomic rename) -> manifest recomputed from the LANDED bytes (tar
    parse, PNG decode, caption md5). The oracle replays the funnel and
    the checksums in SQL, so membership, caption bytes, AND the decoded
    pixel fingerprints of what landed must all be exact."""
    import os
    import shutil

    from azure_medicine_data_engineering_spark.sources.webdataset import (
        curated_wds_manifest,
        write_curated_wds_shards,
    )

    # Per-run unique root (Spark app id): two concurrent sessions on the
    # same sf dir (bench + checker) must not race rmtree against the
    # other's manifest binaryFile read. Same-session re-runs reuse and
    # reset the dir, so bench repeats don't accumulate tars.
    tag = os.path.basename(os.path.normpath(sf_dir))
    app = spark.sparkContext.applicationId
    root = os.path.join(_FIXTURE_ROOT, f"wds_curated_{tag}_{app}")
    shutil.rmtree(root, ignore_errors=True)
    samples = _funnel_survivor_samples(spark, sf_dir)
    report = write_curated_wds_shards(
        samples, root, samples_per_shard=_EGRESS_SAMPLES_PER_SHARD
    )
    report.count()  # force the distributed tar writes
    samples._media_cache.unpersist()
    manifest = curated_wds_manifest(spark, root).localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)  # manifest rows are landed
    return manifest


@register("wds_curated_shard_egress", _EGRESS_MANIFEST_SQL)
def q_wds_curated_shard_egress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated-shard egress, STREAMING twin: the survivor samples are
    staged as a 4-file parquet directory, streamed back one file per
    micro-batch, and every batch lands its shard tars through the
    exactly-once `WdsCuratedEgress` (per-batch dirs, _HWM marker-last).
    The manifest is recomputed from the LANDED tar bytes across all batch
    dirs with the same oracle as the batch twin — arbitrary
    micro-batching + the replay contract must produce exactly the
    one-shot shard set. Kill/replay semantics are pinned in
    tests/test_streaming_sinks.py."""
    import os
    import shutil

    from azure_medicine_data_engineering_spark.sources.webdataset import (
        curated_wds_manifest,
    )
    from azure_medicine_data_engineering_spark.streaming.sinks import (
        run_wds_curated_egress,
    )

    # Per-run unique roots (Spark app id) — see q_wds_curated_shards.
    tag = os.path.basename(os.path.normpath(sf_dir))
    app = spark.sparkContext.applicationId
    stage = os.path.join(_FIXTURE_ROOT, f"wds_curated_stage_{tag}_{app}")
    root = os.path.join(_FIXTURE_ROOT, f"wds_curated_egress_{tag}_{app}")
    shutil.rmtree(root, ignore_errors=True)
    samples = _funnel_survivor_samples(spark, sf_dir)
    samples.repartition(4).write.mode("overwrite").parquet(stage)
    samples._media_cache.unpersist()
    stream = (
        spark.readStream.schema(spark.read.parquet(stage).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    run_wds_curated_egress(
        stream, root, samples_per_shard=_EGRESS_SAMPLES_PER_SHARD
    )
    manifest = curated_wds_manifest(spark, root).localCheckpoint(eager=True)
    # Eager checkpoint landed the manifest rows, so both scratch trees can
    # go now instead of leaking one per app id.
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)
    return manifest


@register(
    "wds_shard_compaction",
    f"""
    WITH {_SURVIVOR_CTE},
    rk AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) AS rn FROM s3
    )
    SELECT CAST((rn - 1) // {_EGRESS_SAMPLES_PER_SHARD} AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(MIN(doc_id) AS BIGINT) AS min_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_id,
           CAST(SUM(doc_id) AS BIGINT) AS sum_ids
    FROM rk GROUP BY 1
    """,
)
def q_wds_shard_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-pack COMPACTION plan for the curated shards (round 14 — the
    batch step the sparse-keyed egress defers): survivors densely
    renumbered via the two-phase BUCKETED prefix sum (bucket = id div
    1024 -> per-bucket counts -> bucket-frame offset window -> in-bucket
    keyed row_number; never a global sort of the data), then packed into
    gap-free 8-sample shards. The oracle's flat ROW_NUMBER proves the
    distributed decomposition equals the global rank exactly. Output is
    the compaction plan (shard -> members/id-range/checksum) a rewriter
    executes."""
    from azure_medicine_data_engineering_spark.operators.text_clean import (
        gopher_ok_all,
    )
    from azure_medicine_data_engineering_spark.session import ensure_parallelism
    from azure_medicine_data_engineering_spark.sources.webdataset import (
        attach_wds_image_caption_payload,
        image_text_alignment_stats,
    )

    docs = ensure_parallelism(_t(spark, sf_dir, "documents"))
    media = attach_wds_image_caption_payload(docs, "doc_id", "text")
    stats = image_text_alignment_stats(media)
    s1 = (
        stats.withColumn("cos", F.expr(_ALIGN_COS))
        .where(F.expr(f"cos >= {_ALIGN_THRESHOLD}"))
        .select("media_id", "fp_img", "caption")
    )
    s2 = s1.where(
        gopher_ok_all(
            F.col("caption"), min_words=_MIN_WORDS, min_stop_hits=_MIN_STOPS
        )
    )
    w_dup = Window.partitionBy("fp_img").orderBy("media_id")
    ids = (
        s2.withColumn("rn", F.row_number().over(w_dup))
        .where(F.col("rn") == 1)
        .select("media_id")
    )
    # two-phase dense rank: keyed in-bucket row_number + bucket-frame
    # offset window (the rankstats bucketed-prefix-sum decomposition)
    bucketed = ids.withColumn("_b", F.expr("media_id div 1024"))
    per_b = bucketed.groupBy("_b").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    w_off = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = per_b.select(
        "_b", (F.sum("_n").over(w_off) - F.col("_n")).alias("_off")
    )
    w_in = Window.partitionBy("_b").orderBy("media_id")
    ranked = (
        bucketed.withColumn("_rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "_b")
        .select(
            "media_id",
            (F.col("_off") + F.col("_rn")).alias("rank"),
        )
    )
    return (
        ranked.groupBy(
            F.expr(f"(rank - 1) div {_EGRESS_SAMPLES_PER_SHARD}").alias(
                "shard_id"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_samples"),
            F.min("media_id").cast("long").alias("min_id"),
            F.max("media_id").cast("long").alias("max_id"),
            F.sum("media_id").cast("long").alias("sum_ids"),
        )
    )
