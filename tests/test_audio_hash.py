"""Audio fingerprint pins: naive reference, H-K invariances (level shift,
light noise), planted-family recovery through the real WAV wire, and
discrimination."""

import random

import pytest

from azure_medicine_data_engineering_spark.operators.audio_hash import (
    AUDIO_COS_Q15,
    AudioHashError,
    FRAME,
    HOP,
    MIN_SAMPLES,
    N_BANDS,
    N_FRAMES,
    attach_family_wav_payload,
    audio_fingerprint64,
    audio_fingerprints,
    family_audio_samples,
)
from azure_medicine_data_engineering_spark.operators.media_av import (
    wav_decode_samples,
    wav_encode_pcm16,
)


def _ham(a, b):
    return bin(a ^ b).count("1")


def _naive_fp(samples):
    e = []
    for t in range(N_FRAMES):
        row = []
        for m in range(N_BANDS):
            acc = sum(
                samples[t * HOP + k] * AUDIO_COS_Q15[m][k] for k in range(FRAME)
            )
            row.append(abs(acc))
        e.append(row)
    bits = 0
    for t in range(1, N_FRAMES):
        for m in range(N_BANDS - 1):
            d = (e[t][m] - e[t][m + 1]) - (e[t - 1][m] - e[t - 1][m + 1])
            bits = (bits << 1) | (1 if d > 0 else 0)
    return bits


def test_matches_naive_reference():
    rng = random.Random(11)
    for _ in range(5):
        s = [rng.randrange(-30000, 30001) for _ in range(MIN_SAMPLES)]
        assert audio_fingerprint64(s) == _naive_fp(s)
    with pytest.raises(AudioHashError):
        audio_fingerprint64([0] * (MIN_SAMPLES - 1))


def test_hk_invariances():
    s = family_audio_samples(12)
    fp = audio_fingerprint64(s)
    # level shift: difference coding cancels any constant offset exactly
    assert audio_fingerprint64([x + 700 for x in s]) == fp
    # gain: positive scaling preserves every difference sign
    assert audio_fingerprint64([x * 3 for x in s]) == fp
    # light noise stays within the near-dup radius
    rng = random.Random(5)
    noised = [x + rng.randrange(-30, 31) for x in s]
    assert _ham(fp, audio_fingerprint64(noised)) <= 3


def test_family_structure_and_discrimination():
    fps = [audio_fingerprint64(family_audio_samples(4 * f)) for f in range(40)]
    cross = [
        _ham(fps[i], fps[j]) for i in range(40) for j in range(i + 1, 40)
    ]
    assert min(cross) > 3  # no false pairs at the search radius
    for f in range(20):
        base = audio_fingerprint64(family_audio_samples(4 * f))
        for v in range(1, 4):
            assert (
                _ham(base, audio_fingerprint64(family_audio_samples(4 * f + v)))
                <= 3
            )


def test_wav_wire_roundtrip_and_spark_chain(spark):
    s = family_audio_samples(7)
    blob = wav_encode_pcm16(8000, s)
    _sr, dec = wav_decode_samples(blob)
    assert dec == s
    df = spark.createDataFrame([(i,) for i in range(16)], "doc_id long")
    out = {
        r.media_id: (r.fp_hi, r.fp_lo, r.fp_hex)
        for r in audio_fingerprints(
            attach_family_wav_payload(df, "doc_id")
        ).collect()
    }
    for i in range(16):
        fp = audio_fingerprint64(family_audio_samples(i))
        assert out[i] == (fp >> 32, fp & 0xFFFFFFFF, f"{fp:016x}")
