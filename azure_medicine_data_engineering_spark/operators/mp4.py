"""MP4 (ISO base media file format, ISO/IEC 14496-12) container demux for
MJPEG sample tracks — the real-world-container companion to the MJPEG-AVI
path (`operators/media_av.py`), round 13.

Scope mirrors the deployment reality the repo documents at
`operators/multimodal.py:76,521`: the CONTAINER walk (ftyp/moov/trak/mdia/
minf/stbl sample tables → per-sample byte ranges out of mdat) is fully
implemented in stdlib `struct`, and the demuxed samples here are baseline
JPEGs decoded by `operators/jpeg.py`; an H.264 elementary stream inside the
same sample table remains the documented NotImplementedError boundary
(externally-licensed codec), exactly like DCT-in-PDF.

The demuxer is a SPEC walk, not a writer inverse: it resolves sample
offsets through the full stsc (sample-to-chunk) run-length mapping and
accepts both stco (32-bit) and co64 (64-bit) chunk-offset tables, any
top-level box order (moov-first "faststart" or moov-last), and unknown
boxes are skipped by size — pinned by hand-built layouts in
`tests/test_mp4.py` that the writer never produces.

No counterpart in the reference (training-data scale extension; same class
as WARC/WebDataset/AVI ingest).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)


class Mp4Error(ValueError):
    pass


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full_box(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def mp4_encode_mjpeg(
    frames_jpeg: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Minimal spec-conforming MP4 writer for one MJPEG video track:
    ``ftyp`` ('isom'), ``mdat`` (concatenated JPEG samples), ``moov``
    { mvhd, trak { tkhd, mdia { mdhd, hdlr('vide'), minf { vmhd, dinf,
    stbl { stsd('jpeg' VisualSampleEntry), stts, stsc, stsz, stco } } } } }.
    One sample per chunk, movie/media timescale = fps so every duration is
    an exact integer. moov is written LAST (classic non-faststart layout;
    the demuxer must not rely on it — see tests for the moov-first pin)."""
    n = len(frames_jpeg)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(frames_jpeg))
    first_off = len(ftyp) + 8
    offsets = []
    off = first_off
    for f in frames_jpeg:
        offsets.append(off)
        off += len(f)

    mvhd = _full_box(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, fps, n)
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)  # volume 1.0
        + b"\x00" * 10
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = _full_box(
        b"tkhd",
        0,
        7,  # enabled | in_movie | in_preview
        struct.pack(">IIII", 0, 0, 1, 0)  # creation, modification, track, rsvd
        + struct.pack(">I", n)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)  # layer, alt_group, volume, rsvd
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full_box(
        b"mdhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, fps, n) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full_box(
        b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00"
    )
    vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dinf = _box(
        b"dinf",
        _full_box(b"dref", 0, 0, struct.pack(">I", 1) + _full_box(b"url ", 0, 1, b"")),
    )
    sample_entry = _box(
        b"jpeg",
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame_count
        + b"\x04jpeg" + b"\x00" * 27  # compressorname (pascal, 32 bytes)
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full_box(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(f)) for f in frames_jpeg),
    )
    stco = _full_box(
        b"stco",
        0,
        0,
        struct.pack(">I", n) + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk_children(payload: bytes, pos: int, stop: int):
    """Yield (type, body_start, body_end) for each box in [pos, stop) —
    the ISO-BMFF size-prefixed walk; size 0 = to end of enclosing box,
    size 1 = 64-bit largesize follows the type."""
    while pos + 8 <= stop:
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        btype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > stop:
                raise Mp4Error("truncated largesize box")
            (size,) = struct.unpack(">Q", payload[body : body + 8])
            body += 8
            end = pos + size
        elif size == 0:
            end = stop
        else:
            end = pos + size
        if end < body or end > stop:
            raise Mp4Error(f"box {btype!r} overruns its container")
        yield btype, body, end
        pos = end


def _find_one(payload: bytes, pos: int, stop: int, btype: bytes):
    for t, b, e in _walk_children(payload, pos, stop):
        if t == btype:
            return b, e
    raise Mp4Error(f"missing {btype!r} box")


def mp4_demux_mjpeg(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Demux an MJPEG MP4 into (width, height, [JPEG sample payloads]) by
    the ISO-BMFF spec walk: top-level scan for moov (any position), then
    trak/mdia/minf/stbl; dimensions from the stsd VisualSampleEntry;
    sample byte ranges resolved through stsz + the FULL stsc run-length
    sample-to-chunk mapping + stco/co64 absolute chunk offsets. The video
    track is the one whose hdlr handler_type is 'vide'. Sample entry
    'avc1'/'avc3' (H.264) raises NotImplementedError — the documented
    externally-licensed-codec boundary; 'jpeg' samples return raw bytes.
    Raises Mp4Error on structural violations."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise Mp4Error("not an MP4 (no leading ftyp)")
    moov = None
    for t, b, e in _walk_children(payload, 0, len(payload)):
        if t == b"moov":
            moov = (b, e)
    if moov is None:
        raise Mp4Error("missing moov box")

    for t, b, e in _walk_children(payload, *moov):
        if t != b"trak":
            continue
        mdia = _find_one(payload, b, e, b"mdia")
        hb, he = _find_one(payload, *mdia, b"hdlr")
        handler = payload[hb + 8 : hb + 12]
        if handler != b"vide":
            continue
        minf = _find_one(payload, *mdia, b"minf")
        stbl = _find_one(payload, *minf, b"stbl")
        sb, se = _find_one(payload, *stbl, b"stsd")
        entry_type, ib, ie = next(_walk_children(payload, sb + 8, se))
        if entry_type in (b"avc1", b"avc3", b"hvc1", b"hev1"):
            raise NotImplementedError(
                f"{entry_type.decode()} sample entries (H.264/H.265) are an "
                "externally-licensed codec boundary — container demux only"
            )
        if entry_type != b"jpeg":
            raise Mp4Error(f"unsupported video sample entry {entry_type!r}")
        width, height = struct.unpack(">HH", payload[ib + 24 : ib + 28])

        zb, ze = _find_one(payload, *stbl, b"stsz")
        fixed, count = struct.unpack(">II", payload[zb + 4 : zb + 12])
        if fixed:
            sizes = [fixed] * count
        else:
            sizes = list(
                struct.unpack(f">{count}I", payload[zb + 12 : zb + 12 + 4 * count])
            )

        cb, ce = _find_one(payload, *stbl, b"stsc")
        (n_stsc,) = struct.unpack(">I", payload[cb + 4 : cb + 8])
        stsc = [
            struct.unpack(">III", payload[cb + 8 + 12 * i : cb + 20 + 12 * i])
            for i in range(n_stsc)
        ]

        try:
            ob, oe = _find_one(payload, *stbl, b"stco")
            (n_chunks,) = struct.unpack(">I", payload[ob + 4 : ob + 8])
            chunk_offs = list(
                struct.unpack(f">{n_chunks}I", payload[ob + 8 : ob + 8 + 4 * n_chunks])
            )
        except Mp4Error:
            ob, oe = _find_one(payload, *stbl, b"co64")
            (n_chunks,) = struct.unpack(">I", payload[ob + 4 : ob + 8])
            chunk_offs = list(
                struct.unpack(f">{n_chunks}Q", payload[ob + 8 : ob + 8 + 8 * n_chunks])
            )

        # stsc run-length expansion: entry (first_chunk, spc, _) applies to
        # chunks first_chunk..next_first_chunk-1 (1-based).
        samples: list[bytes] = []
        si = 0
        for k, (first_chunk, spc, _desc) in enumerate(stsc):
            last_chunk = (
                stsc[k + 1][0] - 1 if k + 1 < len(stsc) else n_chunks
            )
            for ch in range(first_chunk, last_chunk + 1):
                off = chunk_offs[ch - 1]
                for _ in range(spc):
                    if si >= count:
                        break
                    size = sizes[si]
                    if off + size > len(payload):
                        raise Mp4Error(f"sample {si} overruns payload")
                    samples.append(bytes(payload[off : off + size]))
                    off += size
                    si += 1
        if si != count:
            raise Mp4Error(f"sample table mismatch: {si} resolved of {count}")
        return width, height, samples
    raise Mp4Error("no video ('vide') track")


def attach_mp4_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic REAL-MP4 fixture: identical geometry/frame rules to
    `media_av.attach_avi_payload` (md5(text) drives blocks + frame count;
    flat-DC-block baseline JPEG frames decode BIT-EXACTLY), wrapped in a
    genuine ISO-BMFF container — so the AVI demux oracle applies verbatim
    to the MP4 path, and any standard player opens the fixture."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from azure_medicine_data_engineering_spark.operators.jpeg import jpeg_encode

        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                h = hashlib.md5(str(t).encode("utf-8")).digest()
                cols = 1 + h[0] % 3
                rows = 1 + h[1] % 2
                nf = 2 + h[2] % 4
                frames = []
                for f in range(nf):
                    bv = np.array(
                        [
                            h[(f + by * cols + bx) % 16]
                            for by in range(rows)
                            for bx in range(cols)
                        ],
                        dtype=np.uint8,
                    ).reshape(rows, cols)
                    y = np.repeat(np.repeat(bv, 8, axis=0), 8, axis=1)
                    frames.append(jpeg_encode(y))
                ids.append(i)
                payloads.append(mp4_encode_mjpeg(frames, cols * 8, rows * 8))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": "video", "payload": payloads}
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


def video_demux_mp4(df: DataFrame) -> DataFrame:
    """Demux MP4 payloads into per-frame luma-stat rows ``(media_id,
    frame_idx, width, height, frame_mean)`` — the ISO-BMFF twin of
    `media_av.video_demux_mjpeg` (same output schema, same map-only
    fan-out: rows multiply, never move)."""
    from azure_medicine_data_engineering_spark.operators.media_av import FRAME_SCHEMA

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from azure_medicine_data_engineering_spark.operators.jpeg import jpeg_decode

        for pdf in batches:
            ids, idxs, ws, hs, means = [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, frames = mp4_demux_mjpeg(bytes(p))
                for fi, jpg in enumerate(frames):
                    fw, fh, mean = jpeg_decode(jpg)
                    if (fw, fh) != (w, h):
                        raise Mp4Error(
                            f"frame {fi} dims {fw}x{fh} != sample entry {w}x{h}"
                        )
                    ids.append(mid)
                    idxs.append(fi)
                    ws.append(fw)
                    hs.append(fh)
                    means.append(mean)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "width": ws,
                    "height": hs,
                    "frame_mean": means,
                }
            )

    return df.mapInPandas(run, FRAME_SCHEMA)
