"""WARC (Web ARChive, ISO 28500) reader/writer, pure stdlib — the container
Common Crawl ships, i.e. the FIRST format a web-scale training-data ingest
touches. Round 10 closes it the same way xlsx (`sources/excel.py`), JPEG
(`operators/jpeg.py`), and MJPEG-AVI (`operators/media_av.py`) were closed:
a spec-conforming writer for deterministic fixtures plus a robust reader,
wired into an Arrow `mapInPandas` fan-out stage with a DuckDB-recomputable
oracle.

Format essentials implemented (WARC/1.0):
* A record = version line `WARC/1.0`, CRLF-separated named headers
  (Content-Length is authoritative for the block size), blank line, the
  content block of exactly Content-Length octets, then CRLF CRLF.
* A file = concatenation of records.
* The `.warc.gz` convention: EACH record is its own gzip member and the
  members are concatenated — readers must decompress multi-member streams
  (Common Crawl relies on this for per-record random access).
  :func:`warc_parse` sniffs the 0x1F8B magic and handles both forms.

Scale note: the Spark-side stage (`warc_ingest_records`) is map-only Arrow
batches — one payload row fans out to per-record rows in place, no shuffle;
real deployments point the same stage at `binaryFile`-read .warc.gz blobs.

No counterpart in the reference (its closest surface is the binary-blob
passthrough, ``notebooks/PhdProject/utils.scala:120-140``); this is part of
the training-data scale extension (SURVEY §6 / BASELINE.json multimodal).
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
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

_CRLF = b"\r\n"


def warc_write_records(
    records: list[tuple[dict[str, str], bytes]], gzip_members: bool = False
) -> bytes:
    """Serialize ``[(headers, content), ...]`` into a WARC/1.0 file.
    Caller provides the named headers (WARC-Type, WARC-Record-ID, ...);
    Content-Length is computed here and overrides any passed value. With
    ``gzip_members=True``, each record becomes its own gzip member
    (mtime pinned to 0 so fixtures are byte-deterministic), concatenated —
    the `.warc.gz` convention."""
    out = bytearray()
    for headers, content in records:
        rec = bytearray()
        rec += b"WARC/1.0" + _CRLF
        for k, v in headers.items():
            if k.lower() == "content-length":
                continue
            rec += f"{k}: {v}".encode("utf-8") + _CRLF
        rec += f"Content-Length: {len(content)}".encode() + _CRLF
        rec += _CRLF
        rec += content
        rec += _CRLF + _CRLF
        if gzip_members:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(bytes(rec))
            out += buf.getvalue()
        else:
            out += rec
    return bytes(out)


def _gunzip_members(payload: bytes) -> bytes:
    """Decompress a concatenation of gzip members (multi-member stream)."""
    out = bytearray()
    pos = 0
    while pos < len(payload):
        d = zlib.decompressobj(wbits=31)  # gzip wrapper
        out += d.decompress(payload[pos:])
        out += d.flush()
        tail = d.unused_data
        if not tail:
            break
        pos = len(payload) - len(tail)
    return bytes(out)


def warc_parse(payload: bytes) -> list[tuple[dict[str, str], bytes]]:
    """Parse a WARC file (plain or member-gzipped — sniffed on the 0x1F8B
    magic) into ``[(headers, content), ...]``. Header names are returned
    LOWERCASED (the spec makes them case-insensitive); Content-Length is
    authoritative for the block size. Spec-permitted FOLDED header lines
    (continuations starting with space/tab) join onto the previous
    value. Raises ValueError on non-WARC, truncated, or gzip-corrupt
    payloads (zlib errors are wrapped — round-11 ADVICE: the docstring's
    error contract now holds for corrupt members too)."""
    if payload[:2] == b"\x1f\x8b":
        try:
            payload = _gunzip_members(payload)
        except zlib.error as exc:
            raise ValueError(f"corrupt gzip member: {exc}") from exc
    if not payload.startswith(b"WARC/"):
        raise ValueError("not a WARC payload (missing WARC/ version line)")
    records: list[tuple[dict[str, str], bytes]] = []
    pos = 0
    n = len(payload)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and payload[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        head_end = payload.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError("truncated WARC header block")
        head = payload[pos:head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"expected WARC version line at offset {pos}")
        headers: dict[str, str] = {}
        last_key: str | None = None
        for line in lines[1:]:
            if line[:1] in (" ", "\t") and last_key is not None:
                # folded continuation line: append to the previous value
                headers[last_key] += " " + line.strip()
                continue
            if ":" not in line:
                raise ValueError(f"malformed WARC header line: {line!r}")
            k, v = line.split(":", 1)
            last_key = k.strip().lower()
            headers[last_key] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("missing/invalid Content-Length")
        content_start = head_end + 4
        if content_start + clen > n:
            raise ValueError("truncated WARC content block")
        content = payload[content_start : content_start + clen]
        records.append((headers, content))
        pos = content_start + clen
    if not records:
        raise ValueError("empty WARC file")
    return records


def attach_warc_payload(
    df: DataFrame, id_col: str, text_col: str, gzip_members: bool = True
) -> DataFrame:
    """Deterministic REAL-WARC fixture: each row becomes a two-record
    `.warc.gz` file — a ``response`` record whose content block is the
    document text (UTF-8 octets) plus a ``metadata`` record carrying a
    fixed-form note — with the record id derived from md5(text) so every
    header is SQL-recomputable. Arrow-batched mapInPandas, no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                text = str(t)
                hexd = hashlib.md5(text.encode("utf-8")).hexdigest()
                rid = f"<urn:uuid:{hexd[:8]}-{hexd[8:12]}-{hexd[12:16]}-{hexd[16:20]}-{hexd[20:32]}>"
                content = text.encode("utf-8")
                meta = f"fetch-ms: {int(hexd[:4], 16)}".encode()
                recs = [
                    (
                        {
                            "WARC-Type": "response",
                            "WARC-Record-ID": rid,
                            "WARC-Date": "2026-01-01T00:00:00Z",
                            "WARC-Target-URI": f"https://example.org/doc/{i}",
                            "Content-Type": "text/plain",
                        },
                        content,
                    ),
                    (
                        {
                            "WARC-Type": "metadata",
                            "WARC-Record-ID": rid,
                            "WARC-Refers-To": rid,
                            "WARC-Date": "2026-01-01T00:00:00Z",
                        },
                        meta,
                    ),
                ]
                ids.append(i)
                payloads.append(warc_write_records(recs, gzip_members=gzip_members))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": "warc", "payload": payloads}
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


WARC_RECORD_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("rec_idx", IntegerType()),
        StructField("warc_type", StringType()),
        StructField("record_id", StringType()),
        StructField("target_uri", StringType()),
        StructField("content_length", LongType()),
        StructField("content_md5", StringType()),
    ]
)


def warc_ingest_records(df: DataFrame) -> DataFrame:
    """Explode WARC payloads into per-record rows ``(media_id, rec_idx,
    warc_type, record_id, target_uri, content_length, content_md5)`` —
    the ingest fan-out a Common-Crawl-scale pipeline runs first (then
    filters on warc_type = 'response' and feeds the text stages). One
    Arrow mapInPandas pass: decompress members, walk records by
    Content-Length, hash the content octets. Map-only — rows multiply in
    place, nothing shuffles."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                for k, (headers, content) in enumerate(warc_parse(bytes(p))):
                    rows.append(
                        (
                            mid,
                            k,
                            headers.get("warc-type"),
                            headers.get("warc-record-id"),
                            headers.get("warc-target-uri"),
                            len(content),
                            hashlib.md5(content).hexdigest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "rec_idx", "warc_type", "record_id",
                    "target_uri", "content_length", "content_md5",
                ],
            )

    return df.mapInPandas(run, WARC_RECORD_SCHEMA)
