"""Video perceptual signature and near-duplicate search (round 12).

The FIFTH dedup modality (after text, embeddings, images, audio): a
64-bit clip signature = per-frame dHash (``image_hash.dhash64``) folded
by STRICT BITWISE MAJORITY over the frames (bit = 1 iff more than half
the frames set it) — the frame-vote trick video-copy-detection systems
use so a clip survives frame drops, re-encodes, and boundary trims
without its signature drifting. Integer-exact end to end: frame hashes
are the integer dHash spec, the majority is a count compare.

Near-dup search reuses :func:`image_hash.hamming_near_pairs` — one
banded-pigeonhole implementation now serves images, audio, and video.

Fixture: the clip is a HORIZONTAL PAN over the image family's bilinear
value-noise field (field width = frame width + n_frames - 1; frame f =
columns [f, f+W)) — consecutive frames differ like real footage, the
variant bump rides the field's top-left patch so same-family clips land
within a couple of signature bits (measured: variants <= 2, cross-family
min 5 over 60 families), and the whole pixel chain stays a closed form
of doc_id for the SQL oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

VID_W, VID_H, VID_FRAMES = 36, 32, 8
FIELD_W = VID_W + VID_FRAMES - 1  # 43

# scene-cut fixture (round 15): a pan clip whose camera JUMPS mid-clip AND
# whose second scene carries a brightness step — two pans over the same
# family field, scene 1 at half intensity (g // 2, values 0..119), scene 2
# at half intensity + 136 (136..255). Separation is PROVABLE, not sampled
# (a 200-family probe of the step-free design looked safe at 1.6x margin,
# then sf0.1's family 300 landed a 10449-milli jump under the 11000
# threshold): the cut pair differs by >= 136 - 119 = 17 levels on EVERY
# pixel (>= 17000 milli), while within-scene adjacent pans are bounded by
# the halved field's column gradient — fv steps <= ceil(3*256/56) = 14
# sub-units per column, so |g(c+1) - g(c)| <= 15 and the halved field
# moves <= 8 levels/pixel (<= 8000 milli) — both sides clear 11000 for
# every family that can exist.
SC_FRAMES, SC_JUMP = 10, 12
SC_STEP = 136  # scene-2 brightness step; 119 + 136 = 255 stays in byte
SC_FIELD_W = VID_W + SC_FRAMES - 1 + SC_JUMP  # 57


def scene_cut_frame(doc_id: int) -> int:
    """The planted cut's frame index (the first frame AFTER the jump):
    interior positions 3..7 so pairs exist on both sides."""
    return 3 + doc_id % 5


def scene_video_frames(doc_id: int) -> list[bytes]:
    """The planted scene-cut clip: frame ``f`` shows the HALVED family
    field panned at column ``f`` before the cut; from the cut on it pans
    at ``f + SC_JUMP`` with the ``SC_STEP`` brightness step (spec above).
    The field is BUMP-FREE (``variant_mod=1``) — per-doc variety lives in
    the cut position, keeping per-frame diffs a pure family-grain closed
    form for the SQL oracle."""
    from azure_medicine_data_engineering_spark.operators.image_hash import (
        family_fixture_pixels,
    )

    field = family_fixture_pixels(doc_id, SC_FIELD_W, VID_H, variant_mod=1)
    cut = scene_cut_frame(doc_id)
    out = []
    for f in range(SC_FRAMES):
        pan = f if f < cut else f + SC_JUMP
        step = 0 if f < cut else SC_STEP
        fr = bytearray()
        for r in range(VID_H):
            fr += bytes(
                v // 2 + step
                for v in field[
                    r * SC_FIELD_W + pan : r * SC_FIELD_W + pan + VID_W
                ]
            )
        out.append(bytes(fr))
    return out


def attach_scene_vid_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Scene-cut clips as genuine VID0 containers — the detector decodes
    the full container, so an oracle match certifies encode -> demux ->
    per-pair delta -> threshold end to end."""
    from azure_medicine_data_engineering_spark.operators.media_av import (
        vid_encode_gray,
    )
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        attach_media_payload,
    )

    return attach_media_payload(
        df,
        id_col,
        "video",
        lambda i: vid_encode_gray(VID_W, VID_H, scene_video_frames(i)),
    )


def video_signature64(width: int, height: int, frames: list[bytes]) -> int:
    """Strict-majority fold of the per-frame dHashes (spec above)."""
    from azure_medicine_data_engineering_spark.operators.image_hash import dhash64

    if not frames:
        raise ValueError("signature needs at least one frame")
    hashes = [dhash64(width, height, fr) for fr in frames]
    n = len(hashes)
    sig = 0
    for i in range(64):
        cnt = sum((fp >> (63 - i)) & 1 for fp in hashes)
        sig = (sig << 1) | (1 if 2 * cnt > n else 0)
    return sig


def family_video_frames(doc_id: int) -> list[bytes]:
    """The planted-near-dup pan clip: 8 frames sliced from the 43x32
    value-noise field of ``image_hash.family_fixture_pixels``."""
    from azure_medicine_data_engineering_spark.operators.image_hash import (
        family_fixture_pixels,
    )

    field = family_fixture_pixels(doc_id, FIELD_W, VID_H)
    out = []
    for f in range(VID_FRAMES):
        fr = bytearray()
        for r in range(VID_H):
            fr += field[r * FIELD_W + f : r * FIELD_W + f + VID_W]
        out.append(bytes(fr))
    return out


def attach_family_vid_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Wrap the pan clips into genuine VID0 containers
    (``media_av.vid_encode_gray``); the signature kernel decodes the full
    container, so an oracle match certifies encode -> demux -> frames ->
    per-frame hash -> majority end to end. ensure_parallelism applied
    (Python-heavy kernel)."""
    from azure_medicine_data_engineering_spark.operators.media_av import (
        vid_encode_gray,
    )
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        attach_media_payload,
    )

    return attach_media_payload(
        df,
        id_col,
        "video",
        lambda i: vid_encode_gray(VID_W, VID_H, family_video_frames(i)),
    )


_SIG_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sig_hi", LongType()),
        StructField("sig_lo", LongType()),
        StructField("sig_hex", StringType()),
    ]
)


def video_signatures(media_df: DataFrame) -> DataFrame:
    """Decode each VID0 payload and emit the clip signature as
    ``(hi, lo)`` BIGINT halves plus display hex. Map-only Arrow pass."""
    from azure_medicine_data_engineering_spark.operators.media_av import (
        vid_decode_frames,
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {k.name: [] for k in _SIG_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, frames = vid_decode_frames(bytes(payload))
                sig = video_signature64(w, h, frames)
                out["media_id"].append(int(mid))
                out["sig_hi"].append(sig >> 32)
                out["sig_lo"].append(sig & 0xFFFFFFFF)
                out["sig_hex"].append(f"{sig:016x}")
            yield pd.DataFrame(out)

    return media_df.mapInPandas(run, _SIG_SCHEMA)


_KF_SCHEMA = StructType(
    [
        StructField("kf_id", LongType()),
        StructField("media_id", LongType()),
        StructField("shot_idx", LongType()),
        StructField("frame_idx", LongType()),
        StructField("sig_hi", LongType()),
        StructField("sig_lo", LongType()),
        StructField("sig_hex", StringType()),
    ]
)


def shot_keyframe_hashes(media_df: DataFrame, cuts_df: DataFrame) -> DataFrame:
    """Per-SHOT keyframe pHashes — the extraction stage of video copy
    detection, COMPOSED from the scene-cut detector's output rather than
    re-deriving boundaries: keyframes are frame 0 plus the first frame of
    every detected shot (``cuts_df.cut_idxs`` from
    ``media_av.scene_cut_report``), each hashed with the fixed-point DCT
    pHash spec (`image_hash.phash64`). ``kf_id = media_id * 16 +
    shot_idx`` (raises past 16 shots — widen the key before raising the
    cap) keys the keyframes into `image_hash.hamming_near_pairs`, so ONE
    banded search implementation now also serves shot-level dedup.

    Hash routing (the repo's banded-Hamming skew rule, measured before
    shipping): dHash on the smooth halved-field keyframes produces
    CORRELATED bits — the 0x0F0F/0xF0F0/0xFFFF chunk patterns held
    10-13% of ALL keyframes per band at the 100x probe (quadratic
    candidate mass; the pair search did not finish) — while pHash's
    median threshold forces exactly 32 ones and the same probe measured
    its largest chunk bucket at 0.9%. Balanced hash first; dHash stays
    the right tool for the exact-group collapse route.

    Shape: one keyed join lands each clip's cut list next to its payload,
    then a map-only Arrow pass decodes and hashes — no per-row Python, no
    driver involvement; downstream pair search is the shared banded
    pigeonhole."""
    from azure_medicine_data_engineering_spark.operators.image_hash import (
        phash64,
    )
    from azure_medicine_data_engineering_spark.operators.media_av import (
        vid_decode_frames,
    )

    joined = media_df.select("media_id", "payload").join(
        cuts_df.select("media_id", "cut_idxs"), "media_id"
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {f.name: [] for f in _KF_SCHEMA.fields}
            for mid, payload, idxs_s in zip(
                pdf["media_id"], pdf["payload"], pdf["cut_idxs"]
            ):
                w, h, frames = vid_decode_frames(bytes(payload))
                starts = [0] + (
                    [int(x) for x in idxs_s.split(",")] if idxs_s else []
                )
                if len(starts) > 16:
                    raise ValueError(
                        f"clip {mid}: {len(starts)} shots exceeds the "
                        "16-shot kf_id key space"
                    )
                for shot, fi in enumerate(starts):
                    sig = phash64(w, h, frames[fi])
                    out["kf_id"].append(int(mid) * 16 + shot)
                    out["media_id"].append(int(mid))
                    out["shot_idx"].append(shot)
                    out["frame_idx"].append(fi)
                    out["sig_hi"].append(sig >> 32)
                    out["sig_lo"].append(sig & 0xFFFFFFFF)
                    out["sig_hex"].append(f"{sig:016x}")
            yield pd.DataFrame(out)

    return joined.mapInPandas(run, _KF_SCHEMA)


def shot_corpus_match_report(kf_new: DataFrame, kf_corp: DataFrame) -> DataFrame:
    """Per-new-KEYFRAME corpus match report — ingestion-time shot dedup:
    a new clip's keyframes probe the existing corpus keyframe table via
    the banded cross match (`image_hash.hamming_cross_matches`; the
    corpus is NEVER self-joined), and every new keyframe reports
    ``(new_kf_id, media_id, shot_idx, n_corpus_matches, min_hamming,
    is_near_dup)`` with (0, -1, false) for clean shots. The new-side
    keyframe frame is eagerly localCheckpointed: it feeds both the probe
    and the report base, and its lineage carries the Python decode+hash
    kernels (the BPE-argmax rule — a persist would leave one consumer
    replaying the full chain under unionByName/attribute-rewrite hazards,
    a checkpoint cannot)."""
    from azure_medicine_data_engineering_spark.operators.image_hash import (
        hamming_cross_matches,
    )

    base = kf_new.localCheckpoint(eager=True)
    matches = hamming_cross_matches(
        base, kf_corp, "sig_hi", "sig_lo", "kf_id"
    )
    agg = matches.groupBy("id_l").agg(
        F.count(F.lit(1)).cast("long").alias("nm"),
        F.min("hamming").cast("int").alias("mh"),
    )
    return (
        base.select("kf_id", "media_id", "shot_idx")
        .join(agg, F.col("kf_id") == F.col("id_l"), "left")
        .select(
            F.col("kf_id").alias("new_kf_id"),
            "media_id",
            F.col("shot_idx").cast("long").alias("shot_idx"),
            F.coalesce(F.col("nm"), F.lit(0))
            .cast("long")
            .alias("n_corpus_matches"),
            F.coalesce(F.col("mh"), F.lit(-1)).cast("int").alias("min_hamming"),
            F.col("nm").isNotNull().alias("is_near_dup"),
        )
    )


def scene_shot_keyframes(docs_slice: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Attach scene clips, detect cuts, extract keyframe hashes — the
    shared slice->keyframes chain of the batch and streaming shot-dedup
    twins. Returns ``(keyframes, media)``; the caller unpersists
    ``media`` (it feeds both the detector and the extraction join)."""
    from azure_medicine_data_engineering_spark.operators.media_av import (
        scene_cut_report,
    )

    media = attach_scene_vid_payload(docs_slice, "doc_id").persist()
    cuts = scene_cut_report(media)
    return shot_keyframe_hashes(media, cuts), media
