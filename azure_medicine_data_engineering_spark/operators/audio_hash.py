"""Audio perceptual fingerprinting and near-duplicate search (round 12).

Closes the last modality in the dedup family: text (MinHash/SimHash),
embeddings (SemDeDup), images (dHash/pHash) — and now AUDIO, via a
Haitsma-Kalker-shaped fingerprint (Haitsma & Kalker 2002, "A Highly
Robust Audio Fingerprinting System"): band-energy DIFFERENCE SIGNS across
time and frequency. The classic system emits 32 bits per frame over
bark-scaled FFT energies; this engine's integer-exact twin emits ONE
64-bit fingerprint per clip from 9 analysis frames x 9 spectral bands:

* frames: 32 samples, hop 16 (9 frames = 160 samples analyzed);
* band m magnitude ``E(t, m) = |sum_k s[16t + k] * C[m][k]|`` with the
  Q15 fixed-point cosine bank ``C[m][k] = cos(pi*(2k+1)*(m+1)/64) * 2^15``
  snapped half-up — all-integer, so both engines replay it exactly
  (|coef| <= 32 * 32767 * 32768 ~ 3.4e13, comfortably BIGINT);
* bit ``(t, m)`` for t = 1..8, m = 0..7 (MSB-first, index (t-1)*8 + m):
  ``1 iff (E(t,m) - E(t,m+1)) - (E(t-1,m) - E(t-1,m+1)) > 0`` — the H-K
  time-frequency difference sign, robust to level shifts and mild noise.

Near-dup search reuses :func:`image_hash.hamming_near_pairs` verbatim —
the 4x16-bit pigeonhole band join with exact recall for Hamming <= 3.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


class AudioHashError(ValueError):
    """Typed error surface for undersized clips."""


FRAME = 32
HOP = 16
N_FRAMES = 9
N_BANDS = 9
MIN_SAMPLES = HOP * (N_FRAMES - 1) + FRAME  # 160

#: Q15 cosine filter bank (bands 1..N_BANDS — no DC row; a level shift
#: must not flip any bit, which the difference coding then doubles down on)
AUDIO_COS_Q15: list[list[int]] = [
    [
        math.floor(
            math.cos(math.pi * (2 * k + 1) * (m + 1) / (2 * FRAME)) * 32768 + 0.5
        )
        for k in range(FRAME)
    ]
    for m in range(N_BANDS)
]


def audio_fingerprint64(samples: list[int]) -> int:
    """64-bit H-K-style fingerprint of the clip's first MIN_SAMPLES PCM
    samples (spec in the module docstring)."""
    if len(samples) < MIN_SAMPLES:
        raise AudioHashError(
            f"fingerprint needs >= {MIN_SAMPLES} samples, got {len(samples)}"
        )
    e = [[0] * N_BANDS for _ in range(N_FRAMES)]
    for t in range(N_FRAMES):
        base = t * HOP
        for m in range(N_BANDS):
            cm = AUDIO_COS_Q15[m]
            acc = 0
            for k in range(FRAME):
                acc += samples[base + k] * cm[k]
            e[t][m] = acc if acc >= 0 else -acc
    h = 0
    for t in range(1, N_FRAMES):
        for m in range(N_BANDS - 1):
            d = (e[t][m] - e[t][m + 1]) - (e[t - 1][m] - e[t - 1][m + 1])
            h = (h << 1) | (1 if d > 0 else 0)
    return h


def family_audio_samples(
    doc_id: int,
    n_samples: int = MIN_SAMPLES,
    family_div: int = 4,
    variant_mod: int = 4,
    variant_amp: int = 50,
    scale: int = 200,
) -> list[int]:
    """Planted-near-dup PCM fixture (the audio twin of
    ``image_hash.family_fixture_pixels``): docs sharing
    ``id // family_div`` share a 16-point md5 lattice, 1-D integer
    bilinear value noise scaled to ~±25k PCM (``scale`` per lattice unit;
    the multimodal funnel's planted QUIET clips pass a small scale, bump
    unscaled), and the doc's variant adds ``variant * variant_amp`` to
    the first 8 samples (inside frame 0 only, so same-family fingerprints
    differ in a few transition bits). Constant family size -> planted-pair
    volume linear under replicas."""
    lat = hashlib.md5(str(doc_id // family_div).encode()).digest()
    bump = (doc_id % variant_mod) * variant_amp
    out = []
    for k in range(n_samples):
        fu = k * 15 * 256 // (n_samples - 1)
        u0, du = divmod(fu, 256)
        u1 = min(u0 + 1, 15)
        v = ((256 - du) * lat[u0] + du * lat[u1]) // 256
        s = (v - 128) * scale
        if k < 8:
            s += bump
        out.append(s)
    return out


def attach_family_wav_payload(
    df: DataFrame, id_col: str = "doc_id", n_samples: int = MIN_SAMPLES
) -> DataFrame:
    """Wrap :func:`family_audio_samples` into genuine 8 kHz PCM16 WAV
    files (``media_av.wav_encode_pcm16``) — the fingerprint kernel then
    decodes the full RIFF wire, so an oracle match certifies
    encode -> chunk walk -> PCM -> fingerprint end to end. Arrow-batched
    mapInPandas, ensure_parallelism applied (Python-heavy kernel)."""
    from azure_medicine_data_engineering_spark.operators.media_av import (
        wav_encode_pcm16,
    )
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        attach_media_payload,
    )

    return attach_media_payload(
        df,
        id_col,
        "audio",
        lambda i: wav_encode_pcm16(8000, family_audio_samples(i, n_samples)),
    )


_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("fp_hi", LongType()),
        StructField("fp_lo", LongType()),
        StructField("fp_hex", StringType()),
    ]
)


def audio_fingerprints(media_df: DataFrame) -> DataFrame:
    """Decode each WAV payload and emit the 64-bit fingerprint as
    ``(hi, lo)`` BIGINT halves plus display hex. Map-only Arrow pass."""
    from azure_medicine_data_engineering_spark.operators.media_av import (
        wav_decode_samples,
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = {k.name: [] for k in _FP_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _sr, samples = wav_decode_samples(bytes(payload))
                fp = audio_fingerprint64(samples)
                out["media_id"].append(int(mid))
                out["fp_hi"].append(fp >> 32)
                out["fp_lo"].append(fp & 0xFFFFFFFF)
                out["fp_hex"].append(f"{fp:016x}")
            yield pd.DataFrame(out)

    return media_df.mapInPandas(run, _FP_SCHEMA)
