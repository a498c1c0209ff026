"""Audio and video media columns: real WAV (RIFF/PCM16) codec plus a
documented raw-frame video container, both pure stdlib.

Companion to :mod:`.multimodal` (PNG). Extends the multimodal scale
extension (BASELINE.json; no counterpart in the reference — the reference's
closest surface is its binary-blob passthrough, ``utils.scala:120-140``)
with the two remaining modalities a training-data pipeline carries:

* **Audio** — genuine WAV files: RIFF header, ``fmt `` chunk (PCM,
  mono, 16-bit LE), ``data`` chunk. :func:`wav_decode` walks the chunk
  list by size fields (it does not assume chunk order) and computes
  sample stats, so any standard player opens the fixtures and any
  spec-conforming WAV decodes here.
* **Video** — no container format is parseable without ffmpeg-class
  libraries, so the *container* is a documented toy (``VID0`` magic,
  width/height/frame-count header, raw 8-bit grayscale frames) while the
  *pipeline shape* is the real thing: frame-sampling explodes one binary
  payload row into per-frame rows inside Arrow-batched ``mapInPandas``,
  exactly how a production decode-and-sample stage fans out.

Both payload fixtures derive deterministically from md5(text) so DuckDB
oracles can recompute every decoded value from SQL alone.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

AUDIO_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_sec", DoubleType()),
        StructField("mean_abs_amplitude", DoubleType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("frame_mean", DoubleType()),
    ]
)


# --------------------------------------------------------------------------
# WAV codec (real format: RIFF / WAVE / fmt / data, PCM16 mono LE)
# --------------------------------------------------------------------------

def wav_encode_pcm16(sample_rate: int, samples: list[int]) -> bytes:
    """Minimal valid WAV writer: 16-bit signed PCM, mono, little-endian.

    Produces a spec-conforming RIFF file any audio tool can play — the
    fixture side of :func:`wav_decode` for datasets without raw audio."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[int, int, float]:
    """Parse a PCM16 WAV: walk RIFF chunks by their size fields (chunk
    order is NOT assumed — 'fmt ' and 'data' may appear anywhere, per
    spec), return (sample_rate, n_samples, mean_abs_amplitude).

    mean_abs accumulates SEQUENTIALLY over an exact integer sum, so the
    value is bit-identical to a SQL re-computation (CLAUDE.md oracle
    convention)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    sample_rate = None
    data = None
    while pos + 8 <= min(end, len(payload)):
        ctype = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        chunk = payload[pos + 8:pos + 8 + size]
        if ctype == b"fmt ":
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError("decoder supports PCM16 mono only")
        elif ctype == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    n = len(data) // 2
    samples = struct.unpack(f"<{n}h", data[: n * 2])
    total = 0
    for s in samples:  # sequential integer sum: exact, engine-portable
        total += s if s >= 0 else -s
    return sample_rate, n, total / n if n else 0.0


def attach_wav_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic REAL-WAV fixture: per row, md5(text) drives the sample
    count (n = 32 + b0 % 97) and the PCM samples (sample[i] =
    (b[i % 16] - 128) * 231, tiling the digest), at a fixed 8 kHz rate —
    wrapped into a genuine WAV via :func:`wav_encode_pcm16`. Arrow-batched
    mapInPandas, no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                h = hashlib.md5(str(t).encode("utf-8")).digest()
                n = 32 + h[0] % 97
                samples = [(h[k % 16] - 128) * 231 for k in range(n)]
                ids.append(i)
                payloads.append(wav_encode_pcm16(8000, samples))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": "audio", "payload": payloads}
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


def decode_audio(df: DataFrame) -> DataFrame:
    """Decode WAV payloads via Arrow-batched ``mapInPandas`` → typed audio
    metadata (rate, sample count, duration, mean |amplitude|). Partitioning
    preserved; no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rates, counts, durs, means = [], [], [], []
            for p in pdf["payload"]:
                rate, n, mean_abs = wav_decode(p)
                rates.append(rate)
                counts.append(n)
                # single IEEE division of exact integers: bit-identical to
                # any engine's n/rate — no rounding needed (or wanted: a
                # ROUND(...,4) here risks .00005 ties, CLAUDE.md)
                durs.append(n / rate)
                means.append(mean_abs)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "sample_rate": rates,
                    "n_samples": counts,
                    "duration_sec": durs,
                    "mean_abs_amplitude": means,
                }
            )

    return df.mapInPandas(run, AUDIO_DECODED_SCHEMA)


# --------------------------------------------------------------------------
# Video: documented raw-frame container + frame sampling
# --------------------------------------------------------------------------

_VID_MAGIC = b"VID0"


def vid_encode_gray(width: int, height: int, frames: list[bytes]) -> bytes:
    """Toy raw-video container: ``VID0`` magic + <HHH> (width, height,
    n_frames) + concatenated 8-bit grayscale frames. A real deployment
    swaps this for an ffmpeg demux; the pipeline shape is unchanged."""
    if any(len(f) != width * height for f in frames):
        raise ValueError("every frame must be width*height bytes")
    return (
        _VID_MAGIC
        + struct.pack("<HHH", width, height, len(frames))
        + b"".join(frames)
    )


def vid_decode_frames(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Parse the VID0 container back into (width, height, frames)."""
    if payload[:4] != _VID_MAGIC:
        raise ValueError("not a VID0 payload")
    w, h, n = struct.unpack("<HHH", payload[4:10])
    fsize = w * h
    frames = [payload[10 + k * fsize:10 + (k + 1) * fsize] for k in range(n)]
    if any(len(f) != fsize for f in frames):
        raise ValueError("truncated frame data")
    return w, h, frames


def attach_video_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic video fixture: md5(text) drives geometry (w = 2 +
    b0 % 7, h = 2 + b1 % 5) and frame count (4 + b2 % 9); frame f's pixel p
    is digest byte (f + p) % 16 — a sliding tile so consecutive frames
    differ like real footage. Arrow-batched mapInPandas, no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                h = hashlib.md5(str(t).encode("utf-8")).digest()
                w, ht = 2 + h[0] % 7, 2 + h[1] % 5
                n_frames = 4 + h[2] % 9
                frames = [
                    bytes(h[(f + p) % 16] for p in range(w * ht))
                    for f in range(n_frames)
                ]
                ids.append(i)
                payloads.append(vid_encode_gray(w, ht, frames))
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


def frame_sample(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Sample every k-th frame from video payloads, fanning one payload row
    out to per-frame stat rows (media_id, frame_idx, width, height,
    frame_mean) inside one Arrow batch pass — the decode-and-sample stage of
    a video training pipeline. Output rows stay in the input's partitions
    (no shuffle); downstream aggs shuffle on media_id only if they ask to."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, ws, hs, means = [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, frames = vid_decode_frames(p)
                area = w * h
                for f in range(0, len(frames), every_k):
                    total = 0
                    for b in frames[f]:  # sequential exact integer sum
                        total += b
                    ids.append(mid)
                    idxs.append(f)
                    ws.append(w)
                    hs.append(h)
                    # exact int sum / exact int denominator: one IEEE
                    # division, bit-identical cross-engine, no rounding
                    means.append(total / (area * 255.0))
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


def wav_decode_samples(payload: bytes) -> tuple[int, list[int]]:
    """(sample_rate, raw PCM16 samples) — the samples-level decode the
    quality gate builds on (same RIFF walk as :func:`wav_decode`)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    sample_rate = None
    data = None
    while pos + 8 <= min(end, len(payload)):
        ctype = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        chunk = payload[pos + 8:pos + 8 + size]
        if ctype == b"fmt ":
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError("decoder supports PCM16 mono only")
        elif ctype == b"data":
            data = chunk
        pos += 8 + size + (size & 1)
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    n = len(data) // 2
    return sample_rate, list(struct.unpack(f"<{n}h", data[: n * 2]))


def audio_quality_flags(
    df: DataFrame,
    silence_peak: int = 1000,
    clip_level: int = 29000,
    decode_samples=None,
) -> DataFrame:
    """Audio-quality gating for multimodal corpora: flag silent clips
    (peak |amplitude| below ``silence_peak``) and report hard-clipping
    exposure (samples at or beyond ``clip_level``) — the dead-mic /
    hot-mic filter a speech pipeline runs before transcription compute.

    All metrics are integer (peak, counts, micro-unit clip fraction), so
    the flag set is engine-exact. Emits ``(media_id, n_samples, peak,
    is_silent, n_clipped, clip_frac)``. Same Arrow map-only shape as
    :func:`decode_audio`. ``decode_samples`` (round 11): payload →
    ``(rate, [samples])`` decoder, default the WAV chunk walker — pass
    a FLAC adapter to gate FLAC corpora with the same metrics."""
    from collections.abc import Iterator

    import pandas as pd

    decoder = decode_samples or wav_decode_samples

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                _rate, samples = decoder(bytes(payload))
                n = len(samples)
                peak = max((s if s >= 0 else -s) for s in samples) if n else 0
                clipped = sum(
                    1 for s in samples if (s if s >= 0 else -s) >= clip_level
                )
                rows.append((mid, n, peak, clipped))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "peak", "n_clipped"]
            )

    decoded = df.select("media_id", "payload").mapInPandas(
        run, "media_id long, n_samples long, peak long, n_clipped long"
    )
    return decoded.select(
        "media_id",
        "n_samples",
        "peak",
        (F.col("peak") < silence_peak).alias("is_silent"),
        "n_clipped",
        (F.expr("n_clipped * 1000000 div n_samples") / 1e6).alias("clip_frac"),
    )


def video_motion_report(df: DataFrame, static_threshold_milli: int = 0) -> DataFrame:
    """Inter-frame motion report for video corpora: per clip, the exact
    integer sum of |pixel delta| between consecutive frames and the
    derived mean motion — the static-content / frozen-feed detector a
    video pipeline runs before sampling frames for captioning (a slideshow
    and a camera feed need different treatment).

    ``is_static`` flags clips whose mean per-pixel inter-frame delta is at
    or below ``static_threshold_milli`` (milli-levels; 0 = bit-identical
    frames only). Integer sums end-to-end; the mean is one micro-grid
    division. Emits ``(media_id, n_frames, width, height, motion_sum,
    mean_motion, is_static)``. Arrow map-only, same shape as the demux."""
    from collections.abc import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                w, h, frames = vid_decode_frames(bytes(payload))
                motion = 0
                for a, bb in zip(frames, frames[1:]):
                    motion += sum(
                        (x - y) if x >= y else (y - x) for x, y in zip(a, bb)
                    )
                rows.append((mid, len(frames), w, h, motion))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_frames", "width", "height",
                               "motion_sum"],
            )

    decoded = df.select("media_id", "payload").mapInPandas(
        run,
        "media_id long, n_frames int, width int, height int, motion_sum long",
    )
    denom = (F.col("n_frames") - 1) * F.col("width") * F.col("height")
    mean_motion_milli = F.expr(
        "motion_sum * 1000 div ((n_frames - 1) * width * height)"
    )
    return decoded.select(
        "media_id",
        "n_frames",
        "width",
        "height",
        "motion_sum",
        (mean_motion_milli / 1e3).alias("mean_motion"),
        (mean_motion_milli <= static_threshold_milli).alias("is_static"),
    )


def scene_cut_report(df: DataFrame, tau_milli: int = 11000) -> DataFrame:
    """Shot-boundary (scene-cut) detection for video corpora: a cut at
    frame ``i`` iff the exact integer sum of |pixel delta| against frame
    ``i - 1`` exceeds ``tau_milli`` per-pixel milli-levels — the
    fixed-threshold frame-difference detector (ffmpeg's ``scdet`` class)
    a video pipeline runs to segment clips before per-shot sampling,
    captioning, and dedup.

    Shape: the Arrow kernel fans each clip into per-PAIR rows (one per
    consecutive frame pair, carrying the exact integer delta sum), and
    ALL detection logic — threshold, cut list, milli metrics — is JVM
    column algebra over those rows, so the threshold is replayable by the
    SQL oracle and tunable without touching Python. One shuffle on
    media_id. Emits ``(media_id, n_frames, n_cuts, cut_idxs,
    max_diff_milli, mean_diff_milli)``; ``cut_idxs`` is the
    comma-joined sorted list of cut frame indices (the LATER frame of
    each cutting pair). Single-frame clips have no pairs and are not
    emitted (nothing to segment). Integer state end-to-end; the milli
    metrics are floor divisions on positive operands (`div` / `//`
    cross-engine identity)."""
    from collections.abc import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                w, h, frames = vid_decode_frames(bytes(payload))
                for i in range(1, len(frames)):
                    prev, cur = frames[i - 1], frames[i]
                    d = 0
                    for x, y in zip(prev, cur):  # sequential exact int sum
                        d += (x - y) if x >= y else (y - x)
                    rows.append((mid, i, len(frames), w * h, d))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "pair_idx", "n_frames", "area", "d"],
            )

    pairs = df.select("media_id", "payload").mapInPandas(
        run,
        "media_id long, pair_idx int, n_frames int, area int, d long",
    )
    is_cut = (F.col("d") * 1000) > (F.lit(tau_milli) * F.col("area"))
    return (
        pairs.groupBy("media_id")
        .agg(
            F.first("n_frames").alias("n_frames"),
            F.sum(is_cut.cast("long")).cast("long").alias("n_cuts"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(is_cut, F.col("pair_idx"))
                        )
                    ),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("cut_idxs"),
            F.max(F.expr("d * 1000 div area")).cast("long").alias(
                "max_diff_milli"
            ),
            F.expr("sum(d) * 1000 div (count(1) * first(area))")
            .cast("long")
            .alias("mean_diff_milli"),
        )
    )


# --------------------------------------------------------------------------
# Real video container (round 10): MJPEG-in-AVI demux. The RIFF chunk walk
# is the same machinery as the WAV reader above; the per-frame payloads are
# baseline JPEGs decoded by operators/jpeg.py — so the toy VID0 seam now has
# a REAL-container sibling (VID0 stays as the documented raw-frame fallback
# a deployment can swap for ffmpeg). Replaces the "no container format is
# parseable without ffmpeg" caveat for the MJPEG/AVI class.
# --------------------------------------------------------------------------


def avi_encode_mjpeg(
    frames_jpeg: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Minimal spec-conforming AVI writer for an MJPEG video stream:
    RIFF('AVI ') { LIST('hdrl'){ avih, LIST('strl'){ strh('vids'/'MJPG'),
    strf(BITMAPINFOHEADER) } }, LIST('movi'){ '00dc' JPEG ... }, idx1 }.
    Any standard player/demuxer opens these fixtures; any conforming
    MJPEG-AVI demuxes in :func:`avi_demux_mjpeg`."""
    n = len(frames_jpeg)
    max_size = max((len(f) for f in frames_jpeg), default=0)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_size * fps,    # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        n,                 # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        max_size,          # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,        # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIII",
            0,        # dwFlags
            0, 0,     # wPriority, wLanguage
            0,        # dwInitialFrames
            1,        # dwScale
            fps,      # dwRate (rate/scale = fps)
            0,        # dwStart
            n,        # dwLength (frames)
            max_size, # dwSuggestedBufferSize
            10_000,   # dwQuality
            0,        # dwSampleSize (0: variable-size samples)
            0,        # rcFrame left/top
        )
        + struct.pack("<HH", width, height)  # rcFrame right/bottom
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,                 # biSize
        width,
        height,
        1,                  # biPlanes
        24,                 # biBitCount
        b"MJPG",            # biCompression
        width * height * 3, # biSizeImage (nominal)
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_items = []
    offsets = []  # offsets relative to the start of 'movi' fourcc
    off = 4  # after the 'movi' fourcc
    for f in frames_jpeg:
        offsets.append(off)
        item = chunk(b"00dc", f)
        movi_items.append(item)
        off += len(item)
    movi = lst(b"movi", b"".join(movi_items))
    idx = b"".join(
        b"00dc" + struct.pack("<III", 0x10, o, len(f))  # AVIIF_KEYFRAME
        for o, f in zip(offsets, frames_jpeg)
    )
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_demux_mjpeg(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Demux an MJPEG AVI into (width, height, [JPEG frame payloads]) by
    the RIFF chunk walk (chunk order inside lists is NOT assumed beyond
    the spec's hdrl-before-movi): verifies RIFF/'AVI ' magic, reads
    width/height from avih, collects every '..dc'/'..db' chunk of the
    'movi' list. Raises ValueError on non-AVI or truncated payloads."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    end = min(len(payload), 8 + struct.unpack("<I", payload[4:8])[0])
    width = height = None
    frames: list[bytes] = []

    def walk(pos: int, stop: int) -> None:
        nonlocal width, height
        while pos + 8 <= stop:
            fourcc = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body_start = pos + 8
            if body_start + size > len(payload):
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                walk(body_start + 4, body_start + size)
            elif fourcc == b"avih":
                vals = struct.unpack("<14I", payload[body_start : body_start + 56])
                width, height = vals[8], vals[9]
            elif fourcc[2:4] in (b"dc", b"db"):
                frames.append(bytes(payload[body_start : body_start + size]))
            pos = body_start + size + (size & 1)

    walk(12, end)
    if width is None:
        raise ValueError("missing avih header")
    return width, height, frames


def attach_avi_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic REAL-AVI fixture with BIT-EXACT per-frame decode:
    md5(text) drives geometry (cols = 1 + b0 % 3, rows = 1 + b1 % 2 blocks
    of 8x8) and frame count (2 + b2 % 4); frame f's block (by, bx) is the
    CONSTANT digest byte (f + by·cols + bx) % 16 — the flat-block trick
    that makes the lossy JPEG round trip exact (operators/jpeg.py
    docstring), lifted to the frame axis so consecutive frames slide the
    tile like footage. Each frame is a genuine baseline JPEG; the
    container is a genuine MJPEG AVI. Arrow-batched mapInPandas, no
    shuffle."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from azure_medicine_data_engineering_spark.operators.jpeg import (
            jpeg_encode,
        )

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
                payloads.append(
                    avi_encode_mjpeg(frames, cols * 8, rows * 8)
                )
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


def video_demux_mjpeg(df: DataFrame) -> DataFrame:
    """Demux MJPEG-AVI payloads into per-frame luma-stat rows
    ``(media_id, frame_idx, width, height, frame_mean)`` — the REAL
    decode-and-fan-out stage (:func:`frame_sample` is its raw-container
    twin): one Arrow ``mapInPandas`` pass runs the RIFF demux and the
    baseline JPEG decoder per frame; output rows stay in the input's
    partitions (map-only, no shuffle — frame fan-out multiplies rows,
    never moves them). ``frame_mean`` is the JPEG decoder's half-away
    4-decimal luma mean, so flat-block fixtures are SQL-recomputable."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from azure_medicine_data_engineering_spark.operators.jpeg import (
            jpeg_decode,
        )

        for pdf in batches:
            ids, idxs, ws, hs, means = [], [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, frames = avi_demux_mjpeg(bytes(p))
                for fi, jpg in enumerate(frames):
                    fw, fh, mean = jpeg_decode(jpg)
                    if (fw, fh) != (w, h):
                        raise ValueError(
                            f"frame {fi} dims {fw}x{fh} != header {w}x{h}"
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


SIL_WIN = 64  # silence-analysis window, samples
SIL_WINDOWS = 48  # fixture clip length in windows (3072 samples @ 8 kHz)


def speech_gap_layout(doc_id: int) -> list[tuple[int, int]]:
    """The planted pause plan for one clip: ``1 + doc_id % 3`` gaps, gap
    ``g`` covering windows ``[6 + 14g + doc_id % 4, +2 + (doc_id+g) % 3)``
    — gaps provably separated by >= 7 active windows and bounded inside
    the 48-window clip, so a clip always splits into ``n_gaps + 1``
    speech segments."""
    n_gaps = 1 + doc_id % 3
    out = []
    for g in range(n_gaps):
        gs = 6 + 14 * g + doc_id % 4
        gl = 2 + (doc_id + g) % 3
        out.append((gs, gs + gl))
    return out


def speech_wav_samples(doc_id: int) -> list[int]:
    """Speech-with-pauses fixture samples: window ``w`` is silent (all
    zeros) inside a planted gap, else a square wave at amplitude
    ``a + w % 7`` with base ``a = 100 + md5(doc_id)[0] % 100`` — every
    window's |amplitude| sum is the exact integer
    ``SIL_WIN * (a + w % 7)``, the closed form the SQL oracle replays."""
    h = hashlib.md5(str(doc_id).encode()).digest()
    a = 100 + h[0] % 100
    gaps = speech_gap_layout(doc_id)
    samples: list[int] = []
    for w in range(SIL_WINDOWS):
        if any(gs <= w < ge for gs, ge in gaps):
            samples.extend([0] * SIL_WIN)
        else:
            amp = a + w % 7
            for j in range(SIL_WIN):
                i = w * SIL_WIN + j
                samples.append(amp if (i // 8) % 2 == 0 else -amp)
    return samples


def attach_speech_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Speech-with-pauses clips as genuine WAV containers — the
    segmentation kernel decodes the full RIFF, so an oracle match
    certifies encode -> decode -> window energies -> run detection end to
    end."""
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        attach_media_payload,
    )

    return attach_media_payload(
        df,
        id_col,
        "audio",
        lambda i: wav_encode_pcm16(8000, speech_wav_samples(i)),
    )


def silence_segments_report(
    df: DataFrame, silence_milli: int = 500, win: int = SIL_WIN
) -> DataFrame:
    """Silence-run segmentation for audio corpora — the VAD-style
    splitting an ASR/captioning pipeline runs before transcription: fixed
    ``win``-sample windows get exact integer |amplitude| sums out of one
    Arrow pass, a window is silent iff its mean |amplitude| in
    milli-units is below ``silence_milli``, and maximal ACTIVE runs
    become speech segments. All run detection is keyed window algebra
    (lag + running sum over ``(media_id, win_idx)``) — replayable by the
    SQL oracle, no Python state. Emits one row per segment:
    ``(media_id, seg_idx, start_win, end_win, n_windows,
    mean_abs_milli)``; all-silent clips emit nothing (nothing to
    transcribe). The trailing partial window is analyzed at its true
    sample count."""
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql.window import Window

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                _, samples = wav_decode_samples(bytes(payload))
                for wi in range(0, (len(samples) + win - 1) // win):
                    seg = samples[wi * win : (wi + 1) * win]
                    e = 0
                    for s in seg:  # sequential exact integer sum
                        e += s if s >= 0 else -s
                    rows.append((mid, wi, len(seg), e))
            yield pd.DataFrame(
                rows, columns=["media_id", "win_idx", "n_samples", "esum"]
            )

    wins = df.select("media_id", "payload").mapInPandas(
        run, "media_id long, win_idx int, n_samples int, esum long"
    )
    active = (F.col("esum") * 1000) >= (F.lit(silence_milli) * F.col("n_samples"))
    w = Window.partitionBy("media_id").orderBy("win_idx")
    flagged = wins.select(
        "media_id", "win_idx", "n_samples", "esum", active.alias("_a")
    ).withColumn(
        "_start",
        F.col("_a")
        & F.coalesce(~F.lag("_a").over(w), F.lit(True)),
    )
    segged = flagged.withColumn(
        "_seg", F.sum(F.col("_start").cast("long")).over(w)
    ).where(F.col("_a"))
    return (
        segged.groupBy("media_id", "_seg")
        .agg(
            F.min("win_idx").cast("int").alias("start_win"),
            F.max("win_idx").cast("int").alias("end_win"),
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.expr("sum(esum) * 1000 div sum(n_samples)")
            .cast("long")
            .alias("mean_abs_milli"),
        )
        .select(
            "media_id",
            F.col("_seg").cast("int").alias("seg_idx"),
            "start_win",
            "end_win",
            "n_windows",
            "mean_abs_milli",
        )
    )
