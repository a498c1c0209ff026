"""Audio perceptual-fingerprint dedup queries (round 12 — the last
modality in the dedup family; see ``operators/audio_hash.py``).

Same oracle discipline as the image family: the WAV fixture PCM is a
closed form of doc_id (md5 lattice -> 1-D integer value noise -> variant
bump), the fingerprint is all-integer (Q15 filter bank inlined as
literals, |coef| magnitudes, difference signs), so the oracle replays
PCM -> band magnitudes -> bits -> banded pair search bit-for-bit. The
per-doc bump crosses an ``abs()`` so it cannot fold through the algebra
like the image bump — the oracle simply computes per doc (≈9k integer
ops, cheap at every sweep scale).

Pair search and its pigeonhole-exactness argument are shared with the
image family (``image_hash.hamming_near_pairs``; band-join == brute-force
pinned in ``tests/test_image_hash.py`` on the generic operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from azure_medicine_data_engineering_spark.operators.audio_hash import (
    AUDIO_COS_Q15,
    FRAME,
    MIN_SAMPLES,
    N_BANDS,
    N_FRAMES,
)
from azure_medicine_data_engineering_spark.queries.image_dedup import (
    _PAIRS_TAIL,
    _bits_to_halves,
)
from azure_medicine_data_engineering_spark.queries.registry import (
    ORACLES,
    register,
    table as _t,
)

_ACT = str([v for row in AUDIO_COS_Q15 for v in row])
_N = MIN_SAMPLES
_SCALE = _N - 1  # lattice interpolation span


def _fp_hv_ctes(
    id_expr: str = "doc_id", scale_sql: str = "200", prefix: str = ""
) -> str:
    """CTEs ``lat``/``pcm``/``ee``/``hv``: per-doc PCM closed form, band
    magnitudes, H-K difference bits as (hi, lo). Parameterized (round 15,
    for the multimodal funnel): ``id_expr`` is the audio CONTENT id (pass
    it pre-parenthesized), ``scale_sql`` the per-doc amplitude expression
    mirroring ``family_audio_samples(scale=...)``, ``prefix`` renames the
    CTEs so audio/video chains compose in one WITH. Defaults reproduce
    the round-12 SQL byte-identically."""
    p = prefix
    fu = f"(k * {15 * 256} // {_SCALE})"
    s_expr = (
        f"(((256 - {fu} % 256) * B[{fu} // 256 + 1]"
        f" + ({fu} % 256) * B[LEAST({fu} // 256 + 1, 15) + 1]) // 256 - 128)"
        f" * {scale_sql} + CASE WHEN k < 8 THEN ({id_expr} % 4) * 50 ELSE 0 END"
    )
    bit = (
        f"CASE WHEN (ee[(@I@ // 8 + 1) * {N_BANDS} + @I@ % 8 + 1]"
        f" - ee[(@I@ // 8 + 1) * {N_BANDS} + @I@ % 8 + 2])"
        f" - (ee[(@I@ // 8) * {N_BANDS} + @I@ % 8 + 1]"
        f" - ee[(@I@ // 8) * {N_BANDS} + @I@ % 8 + 2]) > 0 THEN 1 ELSE 0 END"
    )
    return f"""
    {p}lat AS MATERIALIZED (
      SELECT doc_id, list_transform(range(16), j ->
               CAST(('0x' || substr(md5(CAST({id_expr} // 4 AS VARCHAR)),
                                    j * 2 + 1, 2)) AS INT)) AS B
      FROM documents
    ),
    {p}pcm AS MATERIALIZED (
      SELECT doc_id, list_transform(range({_N}), k -> {s_expr}) AS s
      FROM {p}lat
    ),
    {p}ct AS (SELECT {_ACT} AS CT),
    {p}ee AS MATERIALIZED (
      SELECT doc_id, list_transform(range({N_FRAMES * N_BANDS}), q ->
        abs(list_sum(list_transform(range({FRAME}), k ->
          s[(q // {N_BANDS}) * 16 + k + 1]
          * CT[(q % {N_BANDS}) * {FRAME} + k + 1])))) AS ee
      FROM {p}pcm, {p}ct
    ),
    {p}hv AS MATERIALIZED (
      SELECT doc_id, {_bits_to_halves(bit)}
      FROM {p}ee
    )"""


@register(
    "audio_fingerprint_codes",
    f"""WITH {_fp_hv_ctes()}
    SELECT doc_id AS media_id, printf('%08x%08x', hi, lo) AS fp_hex
    FROM hv
    """,
)
def q_audio_fingerprint_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip 64-bit Haitsma-Kalker-style fingerprints through the full
    WAV wire (RIFF encode -> chunk walk -> PCM -> Q15 filter bank ->
    difference signs) — pins the exact bit patterns."""
    from azure_medicine_data_engineering_spark.operators.audio_hash import (
        attach_family_wav_payload,
        audio_fingerprints,
    )

    docs = _t(spark, sf_dir, "documents")
    return audio_fingerprints(
        attach_family_wav_payload(docs, "doc_id")
    ).select("media_id", "fp_hex")


@register(
    "audio_fingerprint_near_pairs",
    f"WITH {_fp_hv_ctes()},{_PAIRS_TAIL}",
)
def q_audio_fingerprint_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs at Hamming <= 3 over planted family
    clips — the dedup family's AUDIO modality (after text, embeddings,
    and images), sharing the banded exact-recall search
    (`image_hash.hamming_near_pairs`). Fingerprint bits are difference
    signs, so level-shifted re-masters hash identically and lightly
    noised captures land within a few bits (pinned)."""
    from azure_medicine_data_engineering_spark.operators.audio_hash import (
        attach_family_wav_payload,
        audio_fingerprints,
    )
    from azure_medicine_data_engineering_spark.operators.image_hash import (
        hamming_near_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    fps = audio_fingerprints(attach_family_wav_payload(docs, "doc_id"))
    return hamming_near_pairs(fps, "fp_hi", "fp_lo", "media_id", max_hamming=3)


# ---------------------------------------------------------------------------
# Silence-run segmentation (round 15): VAD-style splitting before ASR /
# captioning — see `operators/media_av.py:silence_segments_report` and the
# speech-with-pauses fixture spec in `speech_wav_samples`. The oracle
# replays the per-window closed form (esum = 64*(a + w%7) outside planted
# gaps, 0 inside) and the SAME lag + running-sum run detection.
# ---------------------------------------------------------------------------

_SIL_GAP_HIT = (
    "list_sum(list_transform(range(1 + media_id % 3), g -> CASE WHEN "
    "win_idx >= 6 + 14 * g + media_id % 4 AND "
    "win_idx < 6 + 14 * g + media_id % 4 + 2 + (media_id + g) % 3 "
    "THEN 1 ELSE 0 END)) > 0"
)


@register(
    "audio_silence_segments",
    f"""
    WITH wins AS MATERIALIZED (
      SELECT d.doc_id AS media_id, t.w AS win_idx,
             100 + ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 2))::INT
               % 100 AS a
      FROM documents d, (SELECT unnest(range(48)) AS w) t(w)
    ),
    flg AS (
      SELECT media_id, win_idx,
             CASE WHEN {_SIL_GAP_HIT} THEN 0
                  ELSE 64 * (a + win_idx % 7) END AS esum,
             NOT ({_SIL_GAP_HIT}) AS a_flag
      FROM wins
    ),
    st AS (
      SELECT media_id, win_idx, esum, a_flag,
             CASE WHEN a_flag AND NOT COALESCE(
                    LAG(a_flag) OVER (PARTITION BY media_id ORDER BY win_idx),
                    FALSE)
                  THEN 1 ELSE 0 END AS s_flag
      FROM flg
    ),
    sg AS (
      SELECT media_id, win_idx, esum, a_flag,
             SUM(s_flag) OVER (PARTITION BY media_id ORDER BY win_idx) AS seg
      FROM st
      QUALIFY a_flag
    )
    SELECT media_id, CAST(seg AS INT) AS seg_idx,
           CAST(MIN(win_idx) AS INT) AS start_win,
           CAST(MAX(win_idx) AS INT) AS end_win,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(esum) * 1000 // (64 * COUNT(*)) AS BIGINT)
             AS mean_abs_milli
    FROM sg GROUP BY 1, 2
    """,
)
def q_audio_silence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence-run segmentation through the full WAV wire (RIFF encode ->
    chunk-walk decode -> exact per-window |amplitude| sums -> keyed
    lag/running-sum run detection): every planted pause must split the
    clip at its exact window boundaries, with per-segment integer milli
    amplitudes. The gap flag in the fixture is provable — silent windows
    are true zeros, active windows have mean amplitude >= 100 against the
    500-milli threshold."""
    from azure_medicine_data_engineering_spark.operators.media_av import (
        attach_speech_wav_payload,
        silence_segments_report,
    )

    docs = _t(spark, sf_dir, "documents")
    return silence_segments_report(attach_speech_wav_payload(docs, "doc_id"))


@register("streaming_silence_segments", ORACLES["audio_silence_segments"])
def q_streaming_silence_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of `audio_silence_segments`
    (`streaming/windows.py:streaming_silence_segments`): per-micro-batch
    identical segmentation into idempotent batch-id-versioned slots
    (kill/replay pinned in tests/test_streaming_sinks.py). The verdict is
    per-clip — any batch split unions to the batch report — so the batch
    oracle is shared verbatim."""
    from azure_medicine_data_engineering_spark.streaming.windows import (
        streaming_silence_segments,
    )

    return streaming_silence_segments(spark, sf_dir)
