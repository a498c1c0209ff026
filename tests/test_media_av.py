"""Unit tests for the WAV codec and VID0 frame container (media_av)."""

import struct

import pytest

from azure_medicine_data_engineering_spark.operators.media_av import (
    attach_video_payload,
    attach_wav_payload,
    decode_audio,
    frame_sample,
    vid_decode_frames,
    vid_encode_gray,
    wav_decode,
    wav_encode_pcm16,
)


def test_wav_round_trip():
    samples = [0, 100, -100, 32767, -32768, 5]
    payload = wav_encode_pcm16(16000, samples)
    rate, n, mean_abs = wav_decode(payload)
    assert rate == 16000
    assert n == len(samples)
    assert mean_abs == sum(abs(s) for s in samples) / len(samples)
    # container size: 12-byte RIFF/WAVE + (8+16) fmt + 8 data header + 2n
    assert len(payload) == 44 + 2 * len(samples)


def test_wav_decode_ignores_chunk_order_and_extra_chunks():
    samples = [1, -2, 3]
    data = struct.pack("<3h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    # LIST chunk first, then data BEFORE fmt — spec-legal orderings
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    body = (
        b"WAVE"
        + extra
        + b"data" + struct.pack("<I", len(data)) + data
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    rate, n, mean_abs = wav_decode(payload)
    assert (rate, n) == (8000, 3)
    assert mean_abs == 2.0


def test_wav_decode_odd_sized_chunk_is_padded():
    # a 3-byte odd chunk must advance by 4 (2-byte alignment) or the
    # walker misreads every later chunk
    samples = [7]
    data = struct.pack("<h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + b"junk" + struct.pack("<I", 3) + b"abc\x00"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert wav_decode(payload) == (8000, 1, 7.0)


def test_wav_decode_rejects_garbage_and_stereo():
    with pytest.raises(ValueError):
        wav_decode(b"nope" * 4)
    stereo_fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + stereo_fmt
    with pytest.raises(ValueError):
        wav_decode(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_vid_round_trip():
    frames = [bytes([f * 10 + p for p in range(6)]) for f in range(4)]
    payload = vid_encode_gray(3, 2, frames)
    w, h, out = vid_decode_frames(payload)
    assert (w, h) == (3, 2)
    assert out == frames


def test_vid_rejects_bad_magic_and_truncation():
    with pytest.raises(ValueError):
        vid_decode_frames(b"XXXX" + struct.pack("<HHH", 1, 1, 1) + b"\x00")
    good = vid_encode_gray(2, 2, [bytes(4)])
    with pytest.raises(ValueError):
        vid_decode_frames(good[:-1])
    with pytest.raises(ValueError):
        vid_encode_gray(2, 2, [bytes(3)])


def test_spark_audio_video_pipeline(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    audio = decode_audio(attach_wav_payload(docs, "doc_id", "text")).collect()
    assert len(audio) == 20
    for r in audio:
        assert r.sample_rate == 8000
        assert 32 <= r.n_samples <= 128
        assert r.byte_len == 44 + 2 * r.n_samples
        assert r.duration_sec == r.n_samples / 8000
        assert 0.0 <= r.mean_abs_amplitude <= 29568.0

    frames = frame_sample(
        attach_video_payload(docs, "doc_id", "text"), every_k=2
    ).collect()
    assert {r.media_id for r in frames} == {r.media_id for r in audio}
    for r in frames:
        assert r.frame_idx % 2 == 0
        assert 2 <= r.width <= 8 and 2 <= r.height <= 6
        assert 0.0 <= r.frame_mean <= 1.0


def test_audio_quality_flags_planted(spark):
    from azure_medicine_data_engineering_spark.operators.media_av import (
        audio_quality_flags,
        wav_encode_pcm16,
    )

    silent = wav_encode_pcm16(8000, [0, 5, -5, 2] * 10)
    hot = wav_encode_pcm16(8000, [32767, -32768, 100, 29000] * 10)
    normal = wav_encode_pcm16(8000, [4000, -6000, 2500, -1500] * 10)
    df = spark.createDataFrame(
        [(1, bytearray(silent)), (2, bytearray(hot)), (3, bytearray(normal))],
        "media_id long, payload binary",
    )
    got = {r.media_id: r for r in audio_quality_flags(df).collect()}
    assert got[1].is_silent and got[1].n_clipped == 0
    assert not got[2].is_silent and got[2].n_clipped == 30  # 3 of 4 per rep
    assert abs(got[2].clip_frac - 0.75) < 1e-6
    assert not got[3].is_silent and got[3].n_clipped == 0


def test_video_motion_static_vs_moving(spark):
    from azure_medicine_data_engineering_spark.operators.media_av import (
        video_motion_report,
        vid_encode_gray,
    )

    static = vid_encode_gray(2, 2, [bytes([7, 7, 7, 7])] * 3)
    moving = vid_encode_gray(2, 2, [bytes([0] * 4), bytes([10] * 4), bytes([0] * 4)])
    df = spark.createDataFrame(
        [(1, bytearray(static)), (2, bytearray(moving))],
        "media_id long, payload binary",
    )
    got = {r.media_id: r for r in video_motion_report(df).collect()}
    assert got[1].is_static and got[1].motion_sum == 0
    # 2 transitions x 4 px x delta 10 = 80; mean = 80 / (2*4) = 10.0
    assert not got[2].is_static and got[2].motion_sum == 80
    assert abs(got[2].mean_motion - 10.0) < 1e-9
