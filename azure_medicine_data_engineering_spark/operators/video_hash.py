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
