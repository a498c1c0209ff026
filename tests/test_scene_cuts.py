"""Scene-cut detection — naive-Python reference on hand-built clips (the
mirror-oracle blind-spot rule) plus planted-jump recall/precision on the
fixture: every planted cut found at its exact index, nothing else."""

from __future__ import annotations

import pytest

from azure_medicine_data_engineering_spark.operators.media_av import (
    scene_cut_report,
    vid_encode_gray,
)
from azure_medicine_data_engineering_spark.operators.video_hash import (
    SC_FRAMES,
    VID_H,
    VID_W,
    attach_scene_vid_payload,
    scene_cut_frame,
    scene_video_frames,
)


def _clip(frames: list[list[int]], w: int, h: int) -> bytes:
    return vid_encode_gray(w, h, [bytes(f) for f in frames])


def test_hand_clips_match_naive_reference(spark):
    # 2x2 frames, tau = 11000 milli => cut iff d * 1000 > 11000 * 4,
    # i.e. d >= 45
    w = h = 2
    clips = {
        # no cut: deltas 4, 8 (sum |.| per pair)
        1: [[10, 10, 10, 10], [11, 11, 11, 11], [13, 13, 13, 13]],
        # one cut at pair 2: deltas 4, 200, 0
        2: [[0, 0, 0, 0], [1, 1, 1, 1], [51, 51, 51, 51], [51, 51, 51, 51]],
        # two cuts (pairs 1 and 3), mixed signs in the delta
        3: [[100, 0, 100, 0], [0, 100, 0, 100], [0, 100, 0, 100],
            [200, 0, 0, 100]],
    }
    df = spark.createDataFrame(
        [(mid, _clip(fr, w, h)) for mid, fr in clips.items()],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in scene_cut_report(df).collect()}

    def naive(frames):
        ds = [
            sum(abs(a - b) for a, b in zip(p, c))
            for p, c in zip(frames, frames[1:])
        ]
        cuts = [i + 1 for i, d in enumerate(ds) if d * 1000 > 11000 * (w * h)]
        import math

        return {
            "n_frames": len(frames),
            "n_cuts": len(cuts),
            "cut_idxs": ",".join(str(i) for i in cuts),
            "max_diff_milli": max(
                math.floor(d * 1000 / (w * h)) for d in ds
            ),
            "mean_diff_milli": math.floor(
                sum(ds) * 1000 / (len(ds) * (w * h))
            ),
        }

    for mid, frames in clips.items():
        exp = naive(frames)
        for k, v in exp.items():
            assert got[mid][k] == v, (mid, k, got[mid][k], v)
    assert got[1]["n_cuts"] == 0 and got[1]["cut_idxs"] == ""
    assert got[2]["cut_idxs"] == "2"
    assert got[3]["cut_idxs"] == "1,3"


def test_single_frame_clip_emits_nothing(spark):
    df = spark.createDataFrame(
        [(9, _clip([[5, 5, 5, 5]], 2, 2))], "media_id long, payload binary"
    )
    assert scene_cut_report(df).count() == 0


@pytest.mark.parametrize("doc_id", [0, 1, 7, 13, 42])
def test_fixture_plants_one_jump(doc_id):
    frames = scene_video_frames(doc_id)
    assert len(frames) == SC_FRAMES
    area = VID_W * VID_H
    ds = [
        sum(abs(a - b) for a, b in zip(p, c))
        for p, c in zip(frames, frames[1:])
    ]
    c = scene_cut_frame(doc_id)
    for i, d in enumerate(ds, start=1):
        milli = d * 1000 // area
        if i == c:
            assert milli > 11000, (doc_id, i, milli)
        else:
            assert milli <= 11000, (doc_id, i, milli)


def test_planted_recall_and_precision_end_to_end(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(40)], "doc_id long"
    )
    rows = scene_cut_report(
        attach_scene_vid_payload(docs, "doc_id")
    ).collect()
    assert len(rows) == 40
    for r in rows:
        assert r["n_cuts"] == 1, r
        assert r["cut_idxs"] == str(scene_cut_frame(r["media_id"])), r


def test_shot_keyframes_match_direct_hash(spark):
    # 32x32 frames (pHash minimum): shot 1 dark, shot 2 bright at frame 2
    from azure_medicine_data_engineering_spark.operators.image_hash import (
        phash64,
    )
    from azure_medicine_data_engineering_spark.operators.media_av import (
        scene_cut_report,
    )
    from azure_medicine_data_engineering_spark.operators.video_hash import (
        shot_keyframe_hashes,
    )

    w, h = 32, 32
    f_dark = [(r * 7 + c) % 30 for r in range(h) for c in range(w)]
    f_dark2 = [v + 1 for v in f_dark]
    f_bright = [v + 200 for v in f_dark]
    clip = _clip([f_dark, f_dark2, f_bright, f_bright], w, h)
    media = spark.createDataFrame(
        [(5, clip)], "media_id long, payload binary"
    )
    cuts = scene_cut_report(media)
    rows = {
        r["shot_idx"]: r
        for r in shot_keyframe_hashes(media, cuts).collect()
    }
    assert set(rows) == {0, 1}
    assert rows[0]["frame_idx"] == 0 and rows[1]["frame_idx"] == 2
    assert rows[0]["kf_id"] == 5 * 16 and rows[1]["kf_id"] == 5 * 16 + 1
    for shot, frame in [(0, f_dark), (1, f_bright)]:
        sig = phash64(w, h, bytes(frame))
        assert rows[shot]["sig_hi"] == sig >> 32
        assert rows[shot]["sig_lo"] == sig & 0xFFFFFFFF
        assert rows[shot]["sig_hex"] == f"{sig:016x}"


def test_shot_keyframe_planted_family_duplicates(spark):
    # same-family scene-1 keyframes are EXACT duplicates (bump-free pan 0)
    from azure_medicine_data_engineering_spark.operators.image_hash import (
        hamming_near_pairs,
    )
    from azure_medicine_data_engineering_spark.operators.media_av import (
        scene_cut_report,
    )
    from azure_medicine_data_engineering_spark.operators.video_hash import (
        shot_keyframe_hashes,
    )

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    media = attach_scene_vid_payload(docs, "doc_id")
    kfs = shot_keyframe_hashes(media, scene_cut_report(media)).collect()
    assert len(kfs) == 16  # 8 clips x 2 shots
    shot0 = {r["media_id"]: (r["sig_hi"], r["sig_lo"])
             for r in kfs if r["shot_idx"] == 0}
    assert shot0[0] == shot0[1] == shot0[2] == shot0[3]
    assert shot0[4] == shot0[5] == shot0[6] == shot0[7]
    assert shot0[0] != shot0[4]  # cross-family keyframes differ
    kf_df = spark.createDataFrame(
        [(r["kf_id"], r["sig_hi"], r["sig_lo"]) for r in kfs],
        "kf_id long, sig_hi long, sig_lo long",
    )
    pairs = hamming_near_pairs(kf_df, "sig_hi", "sig_lo", "kf_id", 3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # every within-family shot-0 pair present at hamming 0
    for base in (0, 4):
        for a in range(base, base + 4):
            for b in range(a + 1, base + 4):
                assert (a * 16, b * 16) in got


def test_keyframe_egress_collapses_family_dups(spark, tmp_path):
    # family 0's four clips share the scene-1 keyframe exactly: the
    # landed shards must carry ONE shot-0 member for the family, and
    # every landed PNG must decode back to the exact source frame
    import os

    from azure_medicine_data_engineering_spark.operators.media_av import (
        vid_decode_frames,
    )
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        png_decode_pixels,
    )
    from azure_medicine_data_engineering_spark.operators.video_hash import (
        scene_cut_frame,
        scene_video_frames,
    )
    from azure_medicine_data_engineering_spark.sources.webdataset import (
        tar_read_members,
        write_keyframe_png_shards,
    )
    from azure_medicine_data_engineering_spark.operators.video_hash import (
        scene_shot_keyframes,
    )
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    kfs, media = scene_shot_keyframes(docs)
    w = Window.partitionBy("sig_hi", "sig_lo").orderBy("kf_id")
    surv = (
        kfs.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select("kf_id", "media_id", "frame_idx")
    )
    joined = surv.join(media.select("media_id", "payload"), "media_id").select(
        "kf_id", "frame_idx", "payload"
    )
    root = str(tmp_path / "kfsh")
    write_keyframe_png_shards(joined, root).collect()
    media.unpersist()

    members = []
    for sh in sorted(os.listdir(root)):
        assert not sh.endswith(".tmp")
        for name, body in tar_read_members(
            open(os.path.join(root, sh), "rb").read()
        ):
            members.append((name, body))
    names = sorted(n for n, _ in members)
    # 4 clips x 2 shots = 8 keyframes; shot-0 collapses 4 -> 1
    assert len(names) == 5
    shot0 = [n for n in names if int(n.split(".")[0]) % 16 == 0]
    assert len(shot0) == 1 and shot0[0] == f"{0:012d}.png"
    # lossless: each landed PNG decodes to the exact source frame
    for name, body in members:
        kf_id = int(name.split(".")[0])
        doc, shot = kf_id // 16, kf_id % 16
        frames = scene_video_frames(doc)
        fi = 0 if shot == 0 else scene_cut_frame(doc)
        w_, h_, _, px = png_decode_pixels(body)
        assert (w_, h_) == (36, 32) and bytes(px) == frames[fi]
