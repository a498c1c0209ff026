"""Video signature pins: majority-fold reference, frame-drop robustness,
family structure, and the VID0 wire chain."""

import random

import pytest

from azure_medicine_data_engineering_spark.operators.image_hash import dhash64
from azure_medicine_data_engineering_spark.operators.media_av import (
    vid_decode_frames,
    vid_encode_gray,
)
from azure_medicine_data_engineering_spark.operators.video_hash import (
    VID_FRAMES,
    VID_H,
    VID_W,
    attach_family_vid_payload,
    family_video_frames,
    video_signature64,
    video_signatures,
)


def _ham(a, b):
    return bin(a ^ b).count("1")


def test_majority_fold_reference():
    rng = random.Random(2)
    frames = [
        bytes(rng.randrange(256) for _ in range(VID_W * VID_H))
        for _ in range(5)
    ]
    sig = video_signature64(VID_W, VID_H, frames)
    hs = [dhash64(VID_W, VID_H, fr) for fr in frames]
    for i in range(64):
        cnt = sum((h >> (63 - i)) & 1 for h in hs)
        assert ((sig >> (63 - i)) & 1) == (1 if 2 * cnt > 5 else 0)
    with pytest.raises(ValueError):
        video_signature64(VID_W, VID_H, [])


def test_frame_drop_robustness():
    """Dropping one frame of eight flips at most the bits whose vote was
    marginal — a trimmed re-encode stays inside the near-dup radius."""
    frames = family_video_frames(20)
    full = video_signature64(VID_W, VID_H, frames)
    for drop in (0, 3, 7):
        trimmed = [fr for k, fr in enumerate(frames) if k != drop]
        assert _ham(full, video_signature64(VID_W, VID_H, trimmed)) <= 3


def test_family_structure():
    sigs = [
        video_signature64(VID_W, VID_H, family_video_frames(4 * f))
        for f in range(30)
    ]
    cross = [_ham(sigs[i], sigs[j]) for i in range(30) for j in range(i + 1, 30)]
    assert min(cross) > 3
    for f in range(15):
        base = video_signature64(VID_W, VID_H, family_video_frames(4 * f))
        for v in range(1, 4):
            assert (
                _ham(
                    base,
                    video_signature64(VID_W, VID_H, family_video_frames(4 * f + v)),
                )
                <= 3
            )


def test_vid0_wire_and_spark_chain(spark):
    frames = family_video_frames(9)
    blob = vid_encode_gray(VID_W, VID_H, frames)
    w, h, dec = vid_decode_frames(blob)
    assert (w, h) == (VID_W, VID_H) and dec == frames and len(dec) == VID_FRAMES
    df = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    out = {
        r.media_id: r.sig_hex
        for r in video_signatures(
            attach_family_vid_payload(df, "doc_id")
        ).collect()
    }
    for i in range(12):
        want = video_signature64(VID_W, VID_H, family_video_frames(i))
        assert out[i] == f"{want:016x}"
