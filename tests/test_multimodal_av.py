"""Multimodal (image+caption+FLAC+VID0) funnel fixtures, gates, and
curated egress — naive-reference pins independent of the SQL oracle
(mirror-oracle blind-spot rule), plus the landed-bytes round trip."""

from __future__ import annotations

import glob
import hashlib

import pytest

from azure_medicine_data_engineering_spark.operators.audio_hash import (
    MIN_SAMPLES,
    audio_fingerprint64,
    family_audio_samples,
)
from azure_medicine_data_engineering_spark.operators.flac import (
    flac_decode_samples,
    flac_encode_pcm16,
)
from azure_medicine_data_engineering_spark.operators.image_hash import dhash64
from azure_medicine_data_engineering_spark.operators.video_hash import (
    VID_H,
    VID_W,
    family_video_frames,
    video_signature64,
)
from azure_medicine_data_engineering_spark.sources.webdataset import (
    MM_AUDIO_DIV,
    MM_AUDIO_MIN_ABS,
    MM_QUIET_SCALE,
    attach_wds_multimodal_payload,
    curated_mm_manifest,
    extract_curated_mm_samples,
    mm_doc_plants,
    multimodal_sample_stats,
    tar_read_members,
    wds_sample_key,
    write_curated_mm_shards,
)


def _first_id_where(pred, lo=0, hi=5000):
    for i in range(lo, hi):
        if pred(*mm_doc_plants(i)):
            return i
    raise AssertionError("no id with the requested plant in range")


def test_quiet_plant_always_below_energy_gate():
    """The quiet bound is a theorem: max |sample| = 128*scale (+bump on
    the first 8), so sum(|pcm|) < the gate for EVERY quiet doc."""
    bound = MIN_SAMPLES * 128 * MM_QUIET_SCALE + 8 * 150
    assert bound < MM_AUDIO_MIN_ABS
    i = _first_id_where(lambda q, s: q)
    pcm = family_audio_samples(
        (i // MM_AUDIO_DIV) * MM_AUDIO_DIV, scale=MM_QUIET_SCALE
    )
    assert sum(abs(s) for s in pcm) < MM_AUDIO_MIN_ABS


def test_audio_pair_plant_shares_exact_pcm():
    pcm_a = family_audio_samples(40)
    pcm_b = family_audio_samples((41 // MM_AUDIO_DIV) * MM_AUDIO_DIV)
    assert pcm_a == pcm_b
    assert audio_fingerprint64(pcm_a) == audio_fingerprint64(pcm_b)


def test_flac_roundtrip_of_fixture_pcm():
    pcm = family_audio_samples(7 // MM_AUDIO_DIV * MM_AUDIO_DIV)
    rate, back = flac_decode_samples(
        flac_encode_pcm16(8000, pcm, subframe="fixed2")
    )
    assert rate == 8000 and back == pcm


def test_static_plant_motion_zero_nonstatic_moves():
    frames = family_video_frames(0)
    static = [frames[0]] * len(frames)
    h0 = [dhash64(VID_W, VID_H, f) for f in static]
    assert all(h == h0[0] for h in h0)  # motion == 0
    hp = [dhash64(VID_W, VID_H, f) for f in frames]
    assert any(h != hp[0] for h in hp[1:])  # the pan clip moves
    # the signature kernel accepts both
    video_signature64(VID_W, VID_H, frames)


@pytest.fixture(scope="module")
def mm_media(spark):
    docs = spark.createDataFrame(
        [(i, f"document body number {i} with several words") for i in range(24)],
        ["doc_id", "text"],
    )
    return attach_wds_multimodal_payload(docs, "doc_id", "text").persist()


def test_attach_members_and_stats(spark, mm_media):
    rows = {r["media_id"]: r for r in mm_media.collect()}
    assert set(rows) == set(range(24))
    members = dict(
        (wds_sample_key(n)[1], c)
        for n, c in tar_read_members(bytes(rows[5]["payload"]))
    )
    assert set(members) == {"flac", "png", "txt", "vid"}

    st = {r["media_id"]: r for r in multimodal_sample_stats(mm_media).collect()}
    for i in (0, 5, 11):
        quiet, static = mm_doc_plants(i)
        aid = (i // MM_AUDIO_DIV) * MM_AUDIO_DIV
        pcm = family_audio_samples(
            aid, scale=MM_QUIET_SCALE if quiet else 200
        )
        assert st[i]["audio_abs"] == sum(abs(s) for s in pcm)
        afp = audio_fingerprint64(pcm)
        assert (st[i]["afp_hi"], st[i]["afp_lo"]) == (
            afp >> 32,
            afp & 0xFFFFFFFF,
        )
        frames = family_video_frames((i // 3) * 3)
        if static:
            assert st[i]["motion"] == 0
        else:
            hs = [dhash64(VID_W, VID_H, f) for f in frames]
            assert st[i]["motion"] == sum(1 for h in hs[1:] if h != hs[0])
        # caption is the wire-extracted member, fp_img the decoded pixels
        text = f"document body number {i} with several words"
        h = hashlib.md5(text.encode()).digest()
        planted = h[2] % 4 == 0
        assert st[i]["caption"] == (("mismatch " + text) if planted else text)
        assert st[i]["fp_img"] == h.hex()


def test_mm_egress_roundtrip_and_atomicity(spark, mm_media, tmp_path):
    out = str(tmp_path / "shards")
    ids = spark.createDataFrame([(i,) for i in range(0, 24, 2)], ["media_id"])
    samples = extract_curated_mm_samples(mm_media, ids)
    report = {
        r["shard_id"]: r
        for r in write_curated_mm_shards(samples, out, 8).collect()
    }
    assert sum(r["n_samples"] for r in report.values()) == 12
    assert not glob.glob(f"{out}/*.tmp")  # atomic landing, no turds
    mf = {r["shard_id"]: r for r in curated_mm_manifest(spark, out).collect()}
    assert set(mf) == set(report)
    for sid, r in mf.items():
        assert r["n_samples"] == report[sid]["n_samples"]
        kept = [i for i in range(0, 24, 2) if i // 8 == sid]
        assert r["sum_ids"] == sum(kept)
        afp_hi = afp_lo = 0
        for i in kept:
            quiet, _ = mm_doc_plants(i)
            pcm = family_audio_samples(
                (i // MM_AUDIO_DIV) * MM_AUDIO_DIV,
                scale=MM_QUIET_SCALE if quiet else 200,
            )
            afp = audio_fingerprint64(pcm)
            afp_hi += afp >> 32
            afp_lo += afp & 0xFFFFFFFF
        assert (r["afp_hi"], r["afp_lo"]) == (afp_hi, afp_lo)
