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


# ---------------------------------------------------------------------------
# Scene-cut detection (round 15): shot-boundary segmentation over planted
# mid-clip camera jumps — see `operators/media_av.py:scene_cut_report` and
# the fixture spec in `operators/video_hash.py:scene_video_frames`.
# Oracle strategy: the clip is two pans over the SAME family field, so every
# frame-pair delta is one of two FAMILY-grain closed forms — A[p] (adjacent
# pans p -> p+1) and B[p] (the jump pair p -> p+13) — and the per-doc row
# assembles 9 deltas from those lists by cut position c = 3 + doc_id % 5.
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.video_hash import (  # noqa: E402
    SC_FIELD_W,
    SC_FRAMES,
    SC_JUMP,
    SC_STEP,
)

_SC_AREA = VID_W * VID_H  # 1152
_SC_TAU_MILLI = 11000  # provable gap: adjacent <= 8000, cut pair >= 17000
_SC_PAIRS = SC_FRAMES - 1  # 9
_SC_CUT = f"ds[i] * 1000 > {_SC_TAU_MILLI} * {_SC_AREA}"


@register(
    "video_scene_cuts",
    f"""WITH {_family_px_ctes(SC_FIELD_W, VID_H)},
    hx AS MATERIALIZED (
      SELECT f, list_transform(g, x -> x // 2) AS h FROM px
    ),
    sca AS MATERIALIZED (
      SELECT f, list_transform(range({SC_FRAMES - 1 + SC_JUMP}), p ->
        list_sum(list_transform(range({_SC_AREA}), t ->
          abs(h[(t // {VID_W}) * {SC_FIELD_W} + p + t % {VID_W} + 2]
            - h[(t // {VID_W}) * {SC_FIELD_W} + p + t % {VID_W} + 1]))))
        AS a
      FROM hx
    ),
    scw AS (
      SELECT f, list_transform(range({SC_JUMP + 8}), p ->
        list_sum(list_transform(range({_SC_AREA}), t ->
          h[(t // {VID_W}) * {SC_FIELD_W} + p + t % {VID_W} + 1]))) AS s
      FROM hx
    ),
    -- the cut pair's delta is LINEAR: every pixel of the stepped scene-2
    -- frame exceeds the scene-1 frame (136 - 119 >= 17 > 0), so
    -- sum|.| = STEP*area + windowsum(p + JUMP + 1) - windowsum(p)
    scb AS MATERIALIZED (
      SELECT f, list_transform(range(7), p ->
        {SC_STEP} * {_SC_AREA} + s[p + {SC_JUMP + 2}] - s[p + 1]) AS b
      FROM scw
    ),
    dv AS (
      SELECT d.doc_id, 3 + d.doc_id % 5 AS c, a, b
      FROM documents d
      JOIN sca ON sca.f = d.doc_id // 4
      JOIN scb ON scb.f = d.doc_id // 4
    ),
    dd AS MATERIALIZED (
      SELECT doc_id,
        list_transform(range(1, {SC_FRAMES}), i ->
          CASE WHEN i = c THEN b[c]
               ELSE a[i + CASE WHEN i - 1 >= c THEN {SC_JUMP} ELSE 0 END]
          END) AS ds
      FROM dv
    )
    SELECT doc_id AS media_id,
      CAST({SC_FRAMES} AS INT) AS n_frames,
      CAST(len(list_filter(range(1, {SC_FRAMES}), i -> {_SC_CUT}))
           AS BIGINT) AS n_cuts,
      COALESCE(array_to_string(list_filter(range(1, {SC_FRAMES}),
                                           i -> {_SC_CUT}), ','),
               '') AS cut_idxs,
      CAST(list_max(list_transform(ds, x -> x * 1000 // {_SC_AREA}))
           AS BIGINT) AS max_diff_milli,
      CAST(list_sum(ds) * 1000 // ({_SC_PAIRS} * {_SC_AREA})
           AS BIGINT) AS mean_diff_milli
    FROM dd
    """,
)
def q_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection through the full VID0 wire (container
    encode -> demux -> exact per-pair pixel deltas -> fixed milli
    threshold): every planted mid-clip camera jump must be found at its
    exact frame index — and nothing else flagged — with the per-clip
    max/mean diff metrics on the integer milli grid. Pair deltas fan out
    of one Arrow pass; all detection logic is JVM column algebra
    (`media_av.scene_cut_report`)."""
    from azure_medicine_data_engineering_spark.operators.media_av import (
        scene_cut_report,
    )
    from azure_medicine_data_engineering_spark.operators.video_hash import (
        attach_scene_vid_payload,
    )

    docs = _t(spark, sf_dir, "documents")
    return scene_cut_report(
        attach_scene_vid_payload(docs, "doc_id"), tau_milli=_SC_TAU_MILLI
    )


# ---------------------------------------------------------------------------
# Shot keyframes + shot-level dedup (round 15): the scene-cut detector's
# output COMPOSES downstream — keyframe = frame 0 + first frame of each
# detected shot, pHashed and fed to the ONE shared banded pair search
# (pHash, not dHash: the smooth halved field makes dHash bits correlated
# and its 16-bit chunks mega-bucket at 100x — see
# `video_hash.shot_keyframe_hashes`). Oracle strategy: keyframes are
# windows over the halved family field, hashed EXACTLY as stored —
# shot-1 pans carry the +SC_STEP brightness, folded into the 32x32 block
# sums as the exact constant `SC_STEP * cell_width` (sums are linear in a
# constant shift; no approximation) — so per-family windowed pHash at the
# 6 reachable pans serves every doc; the per-doc keyframe is (pan 0,
# shot 0) and (pan 15 + doc_id % 5, shot 1).
# ---------------------------------------------------------------------------

from azure_medicine_data_engineering_spark.operators.image_hash import (  # noqa: E402
    _block_ranges,
)
from azure_medicine_data_engineering_spark.queries.image_dedup import (  # noqa: E402
    _CT_LITERAL,
)

_SC_HX = """
    hx AS MATERIALIZED (
      SELECT f, list_transform(g, x -> x // 2) AS h FROM px
    )"""

_SC_KF_BIT = "CASE WHEN 2 * c_arr[@I@ + 1] > s[32] + s[33] THEN 1 ELSE 0 END"

_SC_KF_PANS = "[0, 15, 16, 17, 18, 19]"


def _sc_kph_ctes() -> str:
    """Windowed fixed-point pHash per (family, pan): 32x32 block means of
    the halved-field window (+SC_STEP on shot-1 pans — hashed exactly as
    the stored frame bytes), separable Q15 DCT, sorted coefficients for
    the median threshold. Mirrors `image_dedup._phash_hv_ctes` with the
    window offset in the column slice and no bump."""
    cols = _block_ranges(VID_W, 32)
    co_off = [c0 for c0, _ in cols]
    cw = [c1 - c0 for c0, c1 in cols]
    return f"""{_SC_HX},
    vt AS (SELECT {co_off} AS CO, {cw} AS CW),
    ct AS (SELECT {_CT_LITERAL} AS CT),
    kvp AS MATERIALIZED (
      SELECT f, pan, list_transform(range(1024), p ->
        256 * (list_sum(h[(p // 32) * {SC_FIELD_W} + pan + CO[p % 32 + 1] + 1 :
                          (p // 32) * {SC_FIELD_W} + pan + CO[p % 32 + 1]
                            + CW[p % 32 + 1]])
               + CASE WHEN pan >= 15 THEN {SC_STEP} * CW[p % 32 + 1]
                      ELSE 0 END)
          // CW[p % 32 + 1]) AS v
      FROM hx, vt, (SELECT unnest({_SC_KF_PANS}) AS pan) pp
    ),
    ktt AS MATERIALIZED (
      SELECT f, pan, list_transform(range(256), q ->
        list_sum(list_transform(range(32), x ->
          v[x * 32 + q % 32 + 1] * CT[(q // 32) * 32 + x + 1]))) AS t
      FROM kvp, ct
    ),
    kco AS MATERIALIZED (
      SELECT f, pan, list_transform(range(64), uv ->
        list_sum(list_transform(range(32), y ->
          t[(uv // 8) * 32 + y + 1] * CT[(uv % 8) * 32 + y + 1]))) AS c_arr
      FROM ktt, ct
    ),
    kth AS MATERIALIZED (
      SELECT f, pan, c_arr, list_sort(c_arr) AS s FROM kco
    )"""


_SC_SCBS = _sc_kph_ctes()


def _sc_kf_doc_ctes(prefix: str = "", where: str = "") -> str:
    """Per-doc keyframe + hash CTEs over an optionally FILTERED documents
    slice (the incremental/streaming twins split new vs corpus); expects
    ``kth`` in scope."""
    p = prefix
    return f"""
    {p}kf AS (
      SELECT d.doc_id * 16 + sh.shot AS kf_id, d.doc_id,
             sh.shot AS shot_idx,
             CASE WHEN sh.shot = 0 THEN 0 ELSE 3 + d.doc_id % 5 END AS fidx,
             CASE WHEN sh.shot = 0 THEN 0 ELSE 15 + d.doc_id % 5 END AS pan
      FROM documents d
      CROSS JOIN (SELECT unnest([0, 1]) AS shot) sh
      {where}
    ),
    {p}kfh AS MATERIALIZED (
      SELECT kf_id, doc_id, shot_idx, fidx, {_bits_to_halves(_SC_KF_BIT)}
      FROM {p}kf kfx
      JOIN kth ON kth.f = kfx.doc_id // 4 AND kth.pan = kfx.pan
    )"""


_SC_KF_CTES = _SC_SCBS + "," + _sc_kf_doc_ctes()


@register(
    "video_shot_keyframes",
    f"""WITH {_family_px_ctes(SC_FIELD_W, VID_H)},{_SC_KF_CTES}
    SELECT kf_id, doc_id AS media_id,
           CAST(shot_idx AS BIGINT) AS shot_idx,
           CAST(fidx AS BIGINT) AS frame_idx,
           printf('%08x%08x', hi, lo) AS sig_hex
    FROM kfh
    """,
)
def q_video_shot_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shot keyframe pHashes through the composed wire: encode ->
    demux -> scene-cut detection -> keyframe extraction at the DETECTED
    indices -> fixed-point DCT pHash (balanced chunks — the measured
    dHash mega-bucket skew is documented on the operator). Pins the
    exact hash bits AND (via frame_idx) the detector's cut positions in
    one query (`video_hash.shot_keyframe_hashes`)."""
    from azure_medicine_data_engineering_spark.operators.media_av import (
        scene_cut_report,
    )
    from azure_medicine_data_engineering_spark.operators.video_hash import (
        attach_scene_vid_payload,
        shot_keyframe_hashes,
    )

    docs = _t(spark, sf_dir, "documents")
    media = attach_scene_vid_payload(docs, "doc_id").persist()
    cuts = scene_cut_report(media, tau_milli=_SC_TAU_MILLI)
    out = shot_keyframe_hashes(media, cuts).select(
        "kf_id", "media_id", "shot_idx", "frame_idx", "sig_hex"
    )
    out._stage_caches = [media]
    return out


@register(
    "video_shot_keyframe_pairs",
    f"""WITH {_family_px_ctes(SC_FIELD_W, VID_H)},{_SC_KF_CTES},
    hv AS MATERIALIZED (SELECT kf_id AS doc_id, hi, lo FROM kfh),
    {_PAIRS_TAIL}
    """,
)
def q_video_shot_keyframe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-level near-duplicate pairs at Hamming <= 3 over the composed
    keyframes: same-family scene-1 keyframes are planted EXACT duplicates
    (the halved field at pan 0, bump-free — Hamming 0 guaranteed), and
    same-family scene-2 keyframes (1-4 pan columns apart) contribute a
    measured tail (~7.5% of adjacent pans land <= 3 under pHash — the
    balanced hash trades that recall for a bucket distribution that
    survives 100x; see the operator docstring). One more consumer of the
    shared banded pigeonhole search (`image_hash.hamming_near_pairs`)."""
    from azure_medicine_data_engineering_spark.operators.image_hash import (
        hamming_near_pairs,
    )
    from azure_medicine_data_engineering_spark.operators.media_av import (
        scene_cut_report,
    )
    from azure_medicine_data_engineering_spark.operators.video_hash import (
        attach_scene_vid_payload,
        shot_keyframe_hashes,
    )

    docs = _t(spark, sf_dir, "documents")
    media = attach_scene_vid_payload(docs, "doc_id").persist()
    cuts = scene_cut_report(media, tau_milli=_SC_TAU_MILLI)
    kfs = shot_keyframe_hashes(media, cuts)
    out = hamming_near_pairs(kfs, "sig_hi", "sig_lo", "kf_id", 3)
    out._stage_caches = [media]
    return out


# ---------------------------------------------------------------------------
# Incremental + streaming shot-level dedup (round 15): a new slice's
# keyframes probe the existing corpus keyframe table — the ingestion-time
# shape (corpus never self-joins), batch and streaming sharing one oracle.
# ---------------------------------------------------------------------------

_SC_BANDS_TPL = """
    {p}bands AS MATERIALIZED (
      SELECT kf_id, hi, lo,
             unnest([hi // 65536, hi % 65536, lo // 65536, lo % 65536]) AS chunk,
             unnest([0, 1, 2, 3]) AS band
      FROM {p}kfh
    )"""

_INCR_SHOT_ORACLE = (
    f"""WITH {_family_px_ctes(SC_FIELD_W, VID_H)},{_SC_SCBS},
    {_sc_kf_doc_ctes("c", "WHERE d.doc_id % 10 <> 0")},
    {_sc_kf_doc_ctes("n", "WHERE d.doc_id % 10 = 0")},"""
    + _SC_BANDS_TPL.format(p="c")
    + ","
    + _SC_BANDS_TPL.format(p="n")
    + """,
    m AS (
      SELECT DISTINCT l.kf_id AS nid, r.kf_id AS cid,
             bit_count(xor(l.hi, r.hi)) + bit_count(xor(l.lo, r.lo)) AS hamming
      FROM nbands l JOIN cbands r
        ON l.band = r.band AND l.chunk = r.chunk
      WHERE bit_count(xor(l.hi, r.hi)) + bit_count(xor(l.lo, r.lo)) <= 3
    ),
    ag AS (
      SELECT nid, CAST(COUNT(*) AS BIGINT) AS nm,
             CAST(MIN(hamming) AS INT) AS mh
      FROM m GROUP BY nid
    )
    SELECT k.kf_id AS new_kf_id, k.doc_id AS media_id,
           CAST(k.shot_idx AS BIGINT) AS shot_idx,
           CAST(COALESCE(ag.nm, 0) AS BIGINT) AS n_corpus_matches,
           CAST(COALESCE(ag.mh, -1) AS INT) AS min_hamming,
           ag.nm IS NOT NULL AS is_near_dup
    FROM nkfh k LEFT JOIN ag ON k.kf_id = ag.nid
    """
)


@register("incremental_shot_dedup_batch", _INCR_SHOT_ORACLE)
def q_incremental_shot_dedup_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time SHOT dedup of a new clip slice (doc_id%10==0
    stands in for the arriving batch) against the existing corpus's
    keyframe table: both slices run the composed scene-cut -> keyframe
    chain, then keyframe bands are probed NEW x CORPUS only
    (`video_hash.shot_corpus_match_report`). Every new keyframe reports
    its corpus match count, closest Hamming distance (-1 = clean), and
    the near-dup flag — the per-shot verdict the WDS egress gates on at
    ingest."""
    from pyspark.sql import functions as F

    from azure_medicine_data_engineering_spark.operators.video_hash import (
        scene_shot_keyframes,
        shot_corpus_match_report,
    )

    docs = _t(spark, sf_dir, "documents")
    kf_corp, media_c = scene_shot_keyframes(
        docs.where(F.col("doc_id") % 10 != 0).select("doc_id")
    )
    kf_new, media_n = scene_shot_keyframes(
        docs.where(F.col("doc_id") % 10 == 0).select("doc_id")
    )
    out = shot_corpus_match_report(kf_new, kf_corp)
    out._stage_caches = [media_c, media_n]
    return out


@register("streaming_shot_dedup", _INCR_SHOT_ORACLE)
def q_streaming_shot_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `incremental_shot_dedup_batch`: the documents
    stream's new slice probes the eagerly-checkpointed corpus keyframe
    table per micro-batch via foreachBatch, writing idempotent
    batch-id-versioned outputs (kill/replay-safe — pinned in
    tests/test_streaming_sinks.py). Shares the batch oracle: a new
    keyframe's verdict depends only on the static corpus, so any
    micro-batch split unions to the batch report."""
    from azure_medicine_data_engineering_spark.streaming.windows import (
        streaming_shot_dedup_matches,
    )

    return streaming_shot_dedup_matches(spark, sf_dir)


# ---------------------------------------------------------------------------
# Deduped keyframe PNG shard egress (round 15): the curated-preview
# artifact of the video pipeline — unique shot keyframes (exact pHash
# collapse, deterministic kf_id representative) leave the engine as
# lossless PNGs in WDS shard tars, and the manifest is recomputed FROM
# THE LANDED BYTES (tar parse -> PNG decode -> position-weighted pixel
# fingerprint), certifying frame extraction, PNG encode, tar framing,
# atomic landing, and decode in one integer.
# ---------------------------------------------------------------------------


@register(
    "wds_keyframe_shard_egress",
    f"""WITH {_family_px_ctes(SC_FIELD_W, VID_H)},{_SC_KF_CTES},
    surv AS (
      SELECT kf_id, doc_id,
             CASE WHEN shot_idx = 0 THEN 0 ELSE 15 + doc_id % 5 END AS pan
      FROM (SELECT kfh.*, ROW_NUMBER() OVER (PARTITION BY hi, lo
                                             ORDER BY kf_id) AS r
            FROM kfh)
      WHERE r = 1
    ),
    kfp AS MATERIALIZED (
      SELECT f, pan, list_sum(list_transform(range({VID_W * VID_H}), t ->
        (h[(t // {VID_W}) * {SC_FIELD_W} + pan + t % {VID_W} + 1]
         + CASE WHEN pan >= 15 THEN {SC_STEP} ELSE 0 END) * (t + 1))) AS fpx
      FROM hx, (SELECT unnest({_SC_KF_PANS}) AS pan) pp
    )
    SELECT CAST(s.kf_id // 8 AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(SUM(s.kf_id) AS BIGINT) AS sum_kf_id,
           CAST(SUM(k.fpx) AS BIGINT) AS sum_px_fp
    FROM surv s JOIN kfp k ON k.f = s.doc_id // 4 AND k.pan = s.pan
    GROUP BY 1
    """,
)
def q_wds_keyframe_shard_egress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated keyframe egress through the full wire: scene-cut detection
    -> keyframe pHashes -> EXACT-dup collapse (rank-1 kf_id per hash, the
    deterministic representative) -> surviving frames losslessly
    PNG-encoded into shard tars (shared attempt-unique atomic landing) ->
    manifest recomputed from the LANDED bytes
    (`sources/webdataset.py:write_keyframe_png_shards` /
    `keyframe_shard_manifest`). The oracle computes each survivor's
    position-weighted pixel fingerprint from the halved-field closed form
    — encode/land/parse/decode must be lossless to match."""
    import os
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from azure_medicine_data_engineering_spark.operators.video_hash import (
        scene_shot_keyframes,
    )
    from azure_medicine_data_engineering_spark.sources.webdataset import (
        keyframe_shard_manifest,
        write_keyframe_png_shards,
    )

    docs = _t(spark, sf_dir, "documents")
    kfs, media = scene_shot_keyframes(docs.select("doc_id"))
    w = Window.partitionBy("sig_hi", "sig_lo").orderBy("kf_id")
    surv = (
        kfs.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select("kf_id", "media_id", "frame_idx")
    )
    joined = surv.join(media.select("media_id", "payload"), "media_id").select(
        "kf_id", "frame_idx", "payload"
    )
    tag = os.path.basename(os.path.normpath(sf_dir))
    app = spark.sparkContext.applicationId
    root = os.path.join("/tmp/amde_fixtures", f"kf_shards_{tag}_{app}")
    shutil.rmtree(root, ignore_errors=True)
    # force every shard write on every invocation (the report is NEVER
    # persisted — side-effecting lineage, round-15 pitfall); landing is
    # atomic + attempt-unique so re-execution is idempotent
    write_keyframe_png_shards(joined, root).collect()
    out = keyframe_shard_manifest(spark, root).localCheckpoint(eager=True)
    media.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    return out
