"""WebDataset-style tar shard ingest — the de-facto container for
multimodal TRAINING shards (a POSIX tar whose members group into samples
by basename: ``000123.jpg`` + ``000123.txt`` + ``000123.json`` is one
sample). The natural companion to the WARC ingest (`sources/warc.py`):
WARC is how raw crawl data arrives, tar shards are how curated training
samples ship.

Reader/writer are stdlib ``tarfile`` over in-memory payloads (the 512-byte
ustar block format; mtime/uid pinned so fixture bytes are deterministic);
the Spark stage explodes one shard payload into per-member rows and
derives the WebDataset sample key (basename before the first dot) and
extension — map-only Arrow batches, no shuffle. Production points the same
stage at ``binaryFile``-read ``.tar`` shards.

No counterpart in the reference (training-data scale extension, same
class as WARC/AVI)."""

from __future__ import annotations

import hashlib
import io
import tarfile
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def tar_write_members(members: list[tuple[str, bytes]]) -> bytes:
    """Serialize ``[(name, content), ...]`` into a POSIX tar (ustar),
    deterministic bytes: mtime 0, uid/gid 0, mode 0644."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, content in members:
            info = tarfile.TarInfo(name=name)
            info.size = len(content)
            info.mtime = 0
            info.uid = info.gid = 0
            info.mode = 0o644
            tf.addfile(info, io.BytesIO(content))
    return buf.getvalue()


def tar_read_members(payload: bytes) -> list[tuple[str, bytes]]:
    """Parse a tar payload into ``[(name, content), ...]`` (regular files
    only, archive order preserved). Raises ValueError on non-tar input."""
    try:
        with tarfile.open(fileobj=io.BytesIO(payload), mode="r:") as tf:
            out = []
            for info in tf:
                if not info.isreg():
                    continue
                fh = tf.extractfile(info)
                out.append((info.name, fh.read() if fh else b""))
            return out
    except tarfile.TarError as exc:
        raise ValueError(f"not a tar payload: {exc}") from exc


def wds_sample_key(name: str) -> tuple[str, str]:
    """WebDataset naming: ``dir/000123.seg.txt`` → key ``dir/000123``,
    extension ``seg.txt`` (everything after the FIRST dot of the
    basename — the WebDataset convention, so ``.seg.txt`` stays one
    extension)."""
    slash = name.rfind("/")
    base = name[slash + 1 :]
    dot = base.find(".")
    if dot < 0:
        return name, ""
    return name[: slash + 1] + base[:dot], base[dot + 1 :]


def attach_wds_shard_payload(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Deterministic WebDataset shard fixture: each document becomes a
    one-sample tar with two members — ``<key>.txt`` carrying the document
    text (UTF-8) and ``<key>.cls`` carrying a one-byte class label derived
    from md5(text) — where key = the zero-padded doc id. Deterministic
    tar bytes (pinned mtime/uid). Arrow-batched mapInPandas, no
    shuffle."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                text = str(t)
                h = hashlib.md5(text.encode("utf-8")).digest()
                key = f"{int(i):09d}"
                members = [
                    (f"{key}.txt", text.encode("utf-8")),
                    (f"{key}.cls", str(h[0] % 10).encode()),
                ]
                ids.append(i)
                payloads.append(tar_write_members(members))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": "wds", "payload": payloads}
            )

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    made = df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    ).mapInPandas(run, out_schema)
    return made.withColumn("byte_len", F.length("payload").cast("int"))


WDS_MEMBER_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("member_idx", IntegerType()),
        StructField("sample_key", StringType()),
        StructField("ext", StringType()),
        StructField("size", LongType()),
        StructField("content_md5", StringType()),
    ]
)


def wds_ingest_members(df: DataFrame) -> DataFrame:
    """Explode WebDataset tar shards into per-member rows ``(media_id,
    member_idx, sample_key, ext, size, content_md5)`` — the shard-reader
    fan-out a multimodal training loader runs (group by sample_key
    downstream to reassemble samples). One Arrow pass, map-only."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for k, (name, content) in enumerate(tar_read_members(bytes(p))):
                    key, ext = wds_sample_key(name)
                    rows.append(
                        (
                            mid,
                            k,
                            key,
                            ext,
                            len(content),
                            hashlib.md5(content).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "member_idx", "sample_key", "ext", "size",
                    "content_md5",
                ],
            )

    return df.mapInPandas(run, WDS_MEMBER_SCHEMA)
