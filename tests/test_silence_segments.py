"""Silence-run segmentation — naive-Python reference on hand clips (the
mirror-oracle blind-spot rule), partial-window handling, and planted
pause recall on the speech fixture."""

from __future__ import annotations

import pytest

from azure_medicine_data_engineering_spark.operators.media_av import (
    SIL_WINDOWS,
    attach_speech_wav_payload,
    silence_segments_report,
    speech_gap_layout,
    speech_wav_samples,
    wav_encode_pcm16,
)


def _naive(samples, silence_milli=500, win=64):
    segs = []
    cur = None
    n_w = (len(samples) + win - 1) // win
    for wi in range(n_w):
        chunk = samples[wi * win : (wi + 1) * win]
        e = sum(abs(s) for s in chunk)
        act = e * 1000 >= silence_milli * len(chunk)
        if act:
            if cur is None:
                cur = [wi, wi, e, len(chunk)]
            else:
                cur[1] = wi
                cur[2] += e
                cur[3] += len(chunk)
        elif cur is not None:
            segs.append(cur)
            cur = None
    if cur is not None:
        segs.append(cur)
    return [
        (i + 1, s[0], s[1], s[1] - s[0] + 1, s[2] * 1000 // s[3])
        for i, s in enumerate(segs)
    ]


def test_hand_clips_match_naive(spark):
    win = 64
    clips = {
        # speech / pause / speech, plus a PARTIAL trailing active window
        1: [200] * (2 * win) + [0] * win + [150] * (win + 10),
        # all silent -> no rows
        2: [0] * (3 * win),
        # leading silence, single active run
        3: [0] * win + [-300] * (2 * win),
        # amplitude exactly at threshold boundary: mean 0.5 -> silent
        # (strict >= on 500 milli: e*1000 >= 500*n means mean >= 0.5)
        4: ([1] + [0] * 127) * 2,  # mean |amp| = 1/128 < 0.5 -> silent
    }
    df = spark.createDataFrame(
        [(mid, wav_encode_pcm16(8000, s)) for mid, s in clips.items()],
        "media_id long, payload binary",
    )
    got = {}
    for r in silence_segments_report(df).collect():
        got.setdefault(r["media_id"], []).append(
            (r["seg_idx"], r["start_win"], r["end_win"], r["n_windows"],
             r["mean_abs_milli"])
        )
    for mid in got:
        got[mid].sort()
    for mid, s in clips.items():
        assert got.get(mid, []) == _naive(s), mid
    assert 2 not in got and 4 not in got


def test_gap_layout_invariants():
    for doc_id in range(200):
        gaps = speech_gap_layout(doc_id)
        assert len(gaps) == 1 + doc_id % 3
        assert gaps[0][0] >= 6
        assert gaps[-1][1] <= SIL_WINDOWS - 5
        for (s0, e0), (s1, e1) in zip(gaps, gaps[1:]):
            assert s1 - e0 >= 7  # active run between pauses


@pytest.mark.parametrize("doc_id", [0, 1, 5, 11, 42])
def test_fixture_segments_exact(spark, doc_id):
    df = spark.createDataFrame([(doc_id,)], "doc_id long")
    rows = sorted(
        (r["seg_idx"], r["start_win"], r["end_win"])
        for r in silence_segments_report(
            attach_speech_wav_payload(df, "doc_id")
        ).collect()
    )
    gaps = speech_gap_layout(doc_id)
    bounds = [0]
    exp = []
    prev = 0
    for i, (gs, ge) in enumerate(gaps, start=1):
        exp.append((i, prev, gs - 1))
        prev = ge
    exp.append((len(gaps) + 1, prev, SIL_WINDOWS - 1))
    assert rows == exp
    # and the naive reference agrees wholesale
    naive = _naive(speech_wav_samples(doc_id))
    assert [(s, a, b) for s, a, b, _, _ in naive] == exp
