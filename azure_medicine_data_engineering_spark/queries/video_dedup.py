"""Video perceptual-signature dedup queries (round 12 — the fifth and
final dedup modality; see ``operators/video_hash.py``).

Oracle strategy follows the image family: the pan clip's frames are
windows over the per-FAMILY 43x32 value-noise field (bump-free pixels
from ``image_dedup._family_px_ctes``), frame block sums are a flat
576-entry list per family, and the per-doc variant bump folds through as
``bump * patch-count`` (sums are linear — no floor crosses the bump), so
per-doc work is 64 majority votes over 8 frame bits each. The banded pair
tail and the pigeonhole exactness argument are shared with images/audio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from azure_medicine_data_engineering_spark.operators.image_hash import (
    FIXTURE_AMP,
    FIXTURE_PATCH,
)
from azure_medicine_data_engineering_spark.operators.video_hash import (
    FIELD_W,
    VID_FRAMES,
    VID_H,
    VID_W,
)
from azure_medicine_data_engineering_spark.queries.image_dedup import (
    _PAIRS_TAIL,
    _bits_to_halves,
    _family_px_ctes,
)
from azure_medicine_data_engineering_spark.queries.registry import (
    register,
    table as _t,
)


def _frame_patch_counts() -> list[int]:
    """Flat [frame*72 + block] patch-pixel counts: how many bump pixels
    (field r < PATCH, c < PATCH) land in frame f's dHash block (i, j)
    (frame f shows field columns [f, f+W))."""
    out = []
    for f in range(VID_FRAMES):
        for i in range(8):
            r0, r1 = i * 4, i * 4 + 4
            nr = max(0, min(r1, FIXTURE_PATCH) - r0)
            for j in range(9):
                c0, c1 = f + j * 4, f + j * 4 + 4  # field columns
                nc = max(0, min(c1, FIXTURE_PATCH) - c0)
                out.append(nr * nc)
    return out


def _sig_hv_ctes(id_expr: str = "d.doc_id", prefix: str = "") -> str:
    """``id_expr``/``prefix`` (round 15): re-key the video content id /
    rename the CTEs for the multimodal funnel (the px CTE is expected at
    ``{prefix}px``); defaults reproduce the round-12 SQL byte-identically."""
    p = prefix
    pbf = _frame_patch_counts()
    n_q = VID_FRAMES * 72
    bit = (
        "CASE WHEN 2 * list_sum(list_transform(range(8), f -> "
        "CASE WHEN fs[f * 72 + (@I@ // 8) * 9 + @I@ % 8 + 1]"
        " + bump * PBF[f * 72 + (@I@ // 8) * 9 + @I@ % 8 + 1]"
        " > fs[f * 72 + (@I@ // 8) * 9 + @I@ % 8 + 2]"
        " + bump * PBF[f * 72 + (@I@ // 8) * 9 + @I@ % 8 + 2]"
        f" THEN 1 ELSE 0 END)) > {VID_FRAMES} THEN 1 ELSE 0 END"
    )
    return f"""
    {p}fs AS MATERIALIZED (
      SELECT f, list_transform(range({n_q}), q ->
        list_sum(list_transform(range(16), t ->
          g[((q % 72) // 9 * 4 + t // 4) * {FIELD_W}
            + (q // 72) + (q % 72) % 9 * 4 + t % 4 + 1]))) AS fs
      FROM {p}px
    ),
    {p}pbf AS (SELECT {pbf} AS PBF),
    {p}dbs AS MATERIALIZED (
      SELECT d.doc_id, fs, ({id_expr} % 4) * {FIXTURE_AMP} AS bump
      FROM documents d, {p}fs WHERE {p}fs.f = {id_expr} // 4
    ),
    {p}hv AS MATERIALIZED (
      SELECT doc_id, {_bits_to_halves(bit)}
      FROM {p}dbs, {p}pbf
    )"""


@register(
    "video_signature_codes",
    f"""WITH {_family_px_ctes(FIELD_W, VID_H)},{_sig_hv_ctes()}
    SELECT doc_id AS media_id, printf('%08x%08x', hi, lo) AS sig_hex
    FROM hv
    """,
)
def q_video_signature_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip 64-bit majority-of-frame-dHash signatures through the
    full VID0 wire (container encode -> demux -> per-frame dHash ->
    strict-majority fold) — pins the exact bit patterns."""
    from azure_medicine_data_engineering_spark.operators.video_hash import (
        attach_family_vid_payload,
        video_signatures,
    )

    docs = _t(spark, sf_dir, "documents")
    return video_signatures(attach_family_vid_payload(docs, "doc_id")).select(
        "media_id", "sig_hex"
    )


@register(
    "video_signature_near_pairs",
    f"WITH {_family_px_ctes(FIELD_W, VID_H)},{_sig_hv_ctes()},{_PAIRS_TAIL}",
)
def q_video_signature_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-duplicate pairs at Hamming <= 3 over planted pan-clip
    families — the dedup family's VIDEO modality, completing all five
    (text / embeddings / images / audio / video) on the one shared banded
    exact-recall search (`image_hash.hamming_near_pairs`)."""
    from azure_medicine_data_engineering_spark.operators.image_hash import (
        hamming_near_pairs,
    )
    from azure_medicine_data_engineering_spark.operators.video_hash import (
        attach_family_vid_payload,
        video_signatures,
    )

    docs = _t(spark, sf_dir, "documents")
    sigs = video_signatures(attach_family_vid_payload(docs, "doc_id"))
    return hamming_near_pairs(sigs, "sig_hi", "sig_lo", "media_id", max_hamming=3)


def _pair_scope_sql(hv_chain: str) -> str:
    """One modality's (n_items, n_pairs, n_paired) in an ISOLATED WITH
    scope (the tokenizer_family_report discipline — the shared CTE names
    of the hash chains cannot collide across modalities)."""
    return f"""(
      WITH {hv_chain},
      bands AS MATERIALIZED (
        SELECT doc_id, hi, lo,
               unnest([hi // 65536, hi % 65536, lo // 65536, lo % 65536]) AS chunk,
               unnest([0, 1, 2, 3]) AS band
        FROM hv
      ),
      prs AS MATERIALIZED (
        SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
        FROM bands l JOIN bands r
          ON l.band = r.band AND l.chunk = r.chunk AND l.doc_id < r.doc_id
        WHERE bit_count(xor(l.hi, r.hi)) + bit_count(xor(l.lo, r.lo)) <= 3
      )
      SELECT CAST((SELECT COUNT(*) FROM hv) AS BIGINT) AS n_items,
             CAST((SELECT COUNT(*) FROM prs) AS BIGINT) AS n_pairs,
             CAST((SELECT COUNT(DISTINCT x) FROM
                    (SELECT a AS x FROM prs UNION SELECT b FROM prs)) AS BIGINT)
               AS n_paired
    )"""


def _dedup_card_oracle() -> str:
    from azure_medicine_data_engineering_spark.queries.audio_dedup import (
        _fp_hv_ctes,
    )
    from azure_medicine_data_engineering_spark.queries.image_dedup import (
        PH_H,
        PH_W,
        _phash_hv_ctes,
    )

    img = _family_px_ctes(PH_W, PH_H) + "," + _phash_hv_ctes(PH_W, PH_H)
    aud = _fp_hv_ctes()
    vid = _family_px_ctes(FIELD_W, VID_H) + "," + _sig_hv_ctes()
    return f"""
    SELECT 'text_exact' AS modality, n_items, n_pairs, n_paired FROM (
      WITH g AS (SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS k
                 FROM documents GROUP BY 1)
      SELECT CAST(SUM(k) AS BIGINT) AS n_items,
             CAST(SUM(k * (k - 1) // 2) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN k >= 2 THEN k ELSE 0 END) AS BIGINT) AS n_paired
      FROM g
    )
    UNION ALL
    SELECT 'image_phash', n_items, n_pairs, n_paired FROM {_pair_scope_sql(img)}
    UNION ALL
    SELECT 'audio_fp', n_items, n_pairs, n_paired FROM {_pair_scope_sql(aud)}
    UNION ALL
    SELECT 'video_sig', n_items, n_pairs, n_paired FROM {_pair_scope_sql(vid)}
    """


@register("multimodal_dedup_card", _dedup_card_oracle())
def q_multimodal_dedup_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cross-modality dedup DATASHEET — one row per modality (exact
    text, pHash images, H-K audio fingerprints, majority video
    signatures) with item count, near-dup pair count (Hamming <= 3 for
    the perceptual modalities) and how many items participate in any
    pair — the corpus_data_card discipline applied to duplication across
    modalities, all four members running their real wire chains."""
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.audio_hash import (
        attach_family_wav_payload,
        audio_fingerprints,
    )
    from azure_medicine_data_engineering_spark.operators.image_hash import (
        attach_family_png_payload,
        hamming_near_pairs,
        image_perceptual_hashes,
    )
    from azure_medicine_data_engineering_spark.operators.video_hash import (
        attach_family_vid_payload,
        video_signatures,
    )
    from azure_medicine_data_engineering_spark.queries.image_dedup import (
        PH_H,
        PH_W,
    )

    docs = _t(spark, sf_dir, "documents")
    caches = []

    def pair_row(name: str, pairs: DataFrame, n_items) -> DataFrame:
        caches.extend(getattr(pairs, "_stage_caches", []))
        # ONE pass over the pairs frame: the exploded endpoint list gives
        # n_pairs (= rows/2) and n_paired (= distinct ids) together —
        # three separate consumers replayed the banded self-join and the
        # unionByName attr-id rewrite defeated the persisted hash cache
        # on one branch (CLAUDE.md; round-12 wave-3 review)
        stats = pairs.select(
            F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("x")
        ).agg(
            F.expr("count(1) div 2").cast("long").alias("n_pairs"),
            F.count_distinct("x").cast("long").alias("n_paired"),
        )
        return stats.crossJoin(n_items).select(
            F.lit(name).alias("modality"), "n_items", "n_pairs", "n_paired"
        )

    # 1-row frame with THREE consumers: checkpoint, or each pair row
    # re-scans documents just to count it (CLAUDE.md 1-row-frame rule)
    n_items = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_items")
    ).localCheckpoint(eager=True)
    txt = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
        .agg(
            F.sum("k").cast("long").alias("n_items"),
            F.sum(F.expr("k * (k - 1) div 2")).cast("long").alias("n_pairs"),
            F.sum(F.expr("CASE WHEN k >= 2 THEN k ELSE 0 END"))
            .cast("long")
            .alias("n_paired"),
        )
        .select(
            F.lit("text_exact").alias("modality"), "n_items", "n_pairs", "n_paired"
        )
    )
    img_pairs = hamming_near_pairs(
        image_perceptual_hashes(
            attach_family_png_payload(docs, "doc_id", PH_W, PH_H)
        ),
        "phash_hi",
        "phash_lo",
        "media_id",
        3,
    )
    aud_pairs = hamming_near_pairs(
        audio_fingerprints(attach_family_wav_payload(docs, "doc_id")),
        "fp_hi",
        "fp_lo",
        "media_id",
        3,
    )
    vid_pairs = hamming_near_pairs(
        video_signatures(attach_family_vid_payload(docs, "doc_id")),
        "sig_hi",
        "sig_lo",
        "media_id",
        3,
    )
    out = (
        txt.unionByName(pair_row("image_phash", img_pairs, n_items))
        .unionByName(pair_row("audio_fp", aud_pairs, n_items))
        .unionByName(pair_row("video_sig", vid_pairs, n_items))
    )
    out._stage_caches = caches
    return out
