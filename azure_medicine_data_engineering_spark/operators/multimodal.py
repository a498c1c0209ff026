"""Multimodal columns: opaque binary payloads + typed metadata
(BASELINE.json scale extension; no counterpart in the reference).

Pattern: image/audio/video payloads live in a ``binary`` column next to typed
metadata; decode / feature-extraction / resize / frame-sample run as
Arrow-batched ``mapInPandas`` — the Spark-side plumbing (schema, batch shape,
partitioning) is real and tested, while the actual codec is STUBBED: the
container has no image/audio libraries, so ``decode_fn`` defaults to a
deterministic fake derived from the payload bytes, and a real implementation
(PIL/ffmpeg) raises ``NotImplementedError`` until wired by the deployment.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("byte_len", IntegerType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_intensity", DoubleType()),
    ]
)


def real_decode(payload: bytes) -> tuple[int, int, float]:
    """The production decode hook — requires an image library.

    STUB: the runtime has no PIL/opencv; deployments replace this."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv; not available in this runtime — "
        "use fake_decode (deterministic) or wire a real codec here"
    )


def fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in decode: metadata derived directly from the
    payload bytes, so pipelines exercise the full Arrow path with stable,
    engine-reproducible results."""
    if not payload:
        return 0, 0, 0.0
    width = 16 + payload[0] % 64
    height = 16 + payload[1 % len(payload)] % 64
    mean_intensity = round(sum(payload) / (len(payload) * 255.0), 4)
    return width, height, mean_intensity


def attach_fake_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Manufacture a binary payload column from existing data (test fixture
    for repos without raw media): payload = md5 bytes of the text."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.unhex(F.md5(F.col(text_col))).alias("payload"),
    ).withColumn("byte_len", F.length("payload").cast("int"))


def decode_media(
    df: DataFrame,
    decode_fn: Callable[[bytes], tuple[int, int, float]] = fake_decode,
    batch_hint: int | None = None,
) -> DataFrame:
    """Decode payloads via Arrow-batched ``mapInPandas``.

    The UDF boundary transfers (media_id, media_type, payload, byte_len)
    batches and returns typed metadata — schema is declared, batches stay
    columnar, and partitioning is preserved (no shuffle)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            decoded = [decode_fn(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_intensity": [d[2] for d in decoded],
                }
            )
            yield out

    return df.mapInPandas(run, DECODED_SCHEMA)
