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
