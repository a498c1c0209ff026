"""Multimodal columns: opaque binary payloads + typed metadata
(BASELINE.json scale extension; no counterpart in the reference).

Pattern: image/audio/video payloads live in a ``binary`` column next to typed
metadata; decode / feature-extraction / resize / frame-sample run as
Arrow-batched ``mapInPandas``. The Spark-side plumbing (schema, batch shape,
partitioning) is real and tested; for codecs, PNG decodes NATIVELY
(:func:`png_decode` — pure stdlib chunk walk, CRC verify, inflate, full
defilter; exercised end-to-end by the ``multimodal_decode_png`` oracle query),
while JPEG/audio/video formats need libraries this container lacks and raise
``NotImplementedError`` until a deployment wires PIL/ffmpeg into
``real_decode``. ``fake_decode`` remains as the library-free deterministic
stand-in for pipeline tests.
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
    """Production decode hook: dispatches on container format. PNG decodes
    natively (:func:`png_decode` — pure stdlib chunk walk, Adam7 included),
    JPEG decodes natively too (:mod:`.jpeg` — baseline AND progressive),
    and GIF decodes natively (:mod:`.gif` — full LZW, palettes, 4-pass
    interlace); remaining formats (video containers beyond MJPEG-AVI,
    audio beyond WAV) need codec libraries this runtime lacks."""
    if payload[:8] == _PNG_SIG:
        return png_decode(payload)
    if payload[:2] == b"\xff\xd8":
        from azure_medicine_data_engineering_spark.operators.jpeg import jpeg_decode

        return jpeg_decode(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from azure_medicine_data_engineering_spark.operators.gif import gif_decode

        w, h, _n_frames, mean = gif_decode(payload)
        return w, h, mean
    if payload[:2] == b"BM":
        from azure_medicine_data_engineering_spark.operators.bmp import bmp_decode

        return bmp_decode(payload)
    raise NotImplementedError(
        "only PNG, JPEG (baseline+progressive), GIF and BMP payloads "
        "decode natively; other codecs require PIL/opencv/ffmpeg"
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(payload: bytes) -> tuple[int, int, float]:
    """Real PNG decoder, pure stdlib: chunk walk with CRC verification,
    IHDR parse, zlib inflate, full scanline defilter (None/Sub/Up/Average/
    Paeth), then (width, height, mean_intensity over all samples).

    Supports 8-bit depth, any color type (grayscale/RGB/palette-index/
    alpha variants; palette indices are averaged as stored), and — round
    10 — Adam7 INTERLACED streams.
    """
    width, height, channels, samples = png_decode_pixels(payload)
    n_samples = len(samples)
    # half-away-from-zero to match SQL ROUND (Python round is half-even)
    mean = int(sum(samples) / (n_samples * 255.0) * 10**4 + 0.5) / 10**4
    return width, height, mean


#: Adam7 interlace pass geometry: (x0, y0, dx, dy) per pass (the spec's
#: starting col/row and col/row increments).
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_defilter(raw: bytes, i: int, width: int, height: int, channels: int):
    """Defilter ``height`` scanlines of ``width`` pixels starting at byte
    offset ``i`` of the inflated stream (one filter byte per line —
    None/Sub/Up/Average/Paeth). Filter continuity resets at the start (the
    per-pass contract Adam7 requires). Returns (pixels, next offset)."""
    stride = width * channels
    if len(raw) < i + height * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    out = bytearray()
    prev = bytearray(stride)
    for _ in range(height):
        ftype = raw[i]
        i += 1
        line = bytearray(raw[i:i + stride])
        i += stride
        if ftype == 1:  # Sub
            for x in range(channels, stride):
                line[x] = (line[x] + line[x - channels]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                line[x] = (line[x] + (a + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                c = prev[x - channels] if x >= channels else 0
                line[x] = (line[x] + _paeth(a, prev[x], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype}")
        out += line
        prev = line
    return bytes(out), i


def png_decode_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Full decode to raw samples: (width, height, channels, defiltered
    sample bytes row-major). The stats decoder and the resize operator both
    build on this. Round 10: Adam7 INTERLACED images decode too — the
    seven passes defilter independently (per-pass filter continuity) and
    scatter onto the full-resolution grid by the spec's offsets/strides."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = channels = None
    interlace = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack(">I4s", payload[pos:pos + 8])
        data = payload[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if interlace not in (0, 1):
                raise ValueError(f"unknown interlace method {interlace}")
            channels = _PNG_CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        if len(raw) != height * (width * channels + 1):
            raise ValueError("IDAT length does not match dimensions")
        out, _ = _png_defilter(raw, 0, width, height, channels)
        return width, height, channels, out
    # Adam7: defilter each non-empty pass, scatter into the full grid
    full = bytearray(width * height * channels)
    i = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        sub, i = _png_defilter(raw, i, pw, ph, channels)
        for r in range(ph):
            src_row = r * pw * channels
            y = y0 + r * dy
            for c_ in range(pw):
                dst = ((y * width) + (x0 + c_ * dx)) * channels
                src = src_row + c_ * channels
                full[dst:dst + channels] = sub[src:src + channels]
    if i != len(raw):
        raise ValueError("IDAT length does not match interlaced passes")
    return width, height, channels, bytes(full)


def png_resize_nearest(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a grayscale PNG, returning a new PNG:
    output pixel (i, j) samples source (i*h // out_h, j*w // out_w). Pure
    integer index math so any engine can replicate the sampled positions."""
    w, h, channels, px = png_decode_pixels(payload)
    if channels != 1:
        raise ValueError("resize implemented for grayscale PNGs")
    resized = bytearray(out_w * out_h)
    for i in range(out_h):
        src_r = i * h // out_h
        row_base = src_r * w
        for j in range(out_w):
            resized[i * out_w + j] = px[row_base + j * w // out_w]
    return png_encode_gray(out_w, out_h, bytes(resized))


def png_encode_gray(
    width: int, height: int, pixels: bytes, interlace: bool = False
) -> bytes:
    """Minimal 8-bit grayscale PNG writer (filter 0 rows, one IDAT) — the
    fixture side of :func:`png_decode` for datasets without raw media.
    ``interlace=True`` emits a spec-valid Adam7 stream (the seven passes
    serialized in order, one filter byte per pass scanline) — the PNG
    analogue of the progressive-JPEG fixtures."""
    import struct
    import zlib

    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 1 if interlace else 0)
    if not interlace:
        raw = b"".join(
            b"\x00" + pixels[r * width:(r + 1) * width] for r in range(height)
        )
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            for r in range(ph):
                y = y0 + r * dy
                parts.append(b"\x00")
                parts.append(
                    bytes(pixels[y * width + x0 + c * dx] for c in range(pw))
                )
        raw = b"".join(parts)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
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


def attach_png_payload(
    df: DataFrame, id_col: str, text_col: str, interlace: bool = False
) -> DataFrame:
    """Deterministic REAL-PNG fixture: per row, dimensions and grayscale
    pixels derive from md5(text) (w = 4 + b0 % 13, h = 4 + b1 % 11, pixels =
    digest bytes tiled to w·h), wrapped into a genuine PNG file via
    :func:`png_encode_gray` — any standard viewer decodes it. With
    ``interlace=True`` the same pixels serialize as a spec-valid Adam7
    stream (round 10 — the PNG analogue of the progressive-JPEG fixtures);
    the decode is lossless either way. Arrow-batched mapInPandas, no
    shuffle."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                h = hashlib.md5(str(t).encode("utf-8")).digest()
                w = 4 + h[0] % 13
                ht = 4 + h[1] % 11
                n = w * ht
                pixels = (h * (n // 16 + 1))[:n]
                ids.append(i)
                payloads.append(png_encode_gray(w, ht, pixels, interlace=interlace))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": "image",
                    "payload": payloads,
                }
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


def attach_jpeg_payload(
    df: DataFrame, id_col: str, text_col: str, progressive: bool = False
) -> DataFrame:
    """Deterministic REAL-JPEG fixture with a BIT-EXACT decode: per row,
    w = 8·(1 + b0 % 5) and h = 8·(1 + b1 % 4) from md5(text), and every
    8x8 block is CONSTANT — block (by, bx) carries digest byte
    ``(by·cols + bx) % 16``. Encoded with the flat quant table of 8s, the
    DCT of each flat block is DC-only and survives quantization exactly
    (see :mod:`.jpeg` module docstring), so the decoded luma mean is
    SQL-recomputable from the md5 hex — the lossy format's analogue of the
    lossless-PNG oracle trick. With ``progressive=True`` the same
    quantized coefficients are emitted as a progressive (SOF2) stream
    through the full libjpeg-style scan script (DC successive
    approximation + AC spectral bands), so the decode — now through the
    DC-first/DC-refine and AC EOB-run paths — stays bit-exact. Arrow-
    batched mapInPandas, no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from azure_medicine_data_engineering_spark.operators.jpeg import (
            jpeg_encode,
            jpeg_encode_progressive,
        )

        enc = jpeg_encode_progressive if progressive else jpeg_encode
        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                h = hashlib.md5(str(t).encode("utf-8")).digest()
                cols = 1 + h[0] % 5
                rows = 1 + h[1] % 4
                bv = np.array(
                    [h[(by * cols + bx) % 16] for by in range(rows) for bx in range(cols)],
                    dtype=np.uint8,
                ).reshape(rows, cols)
                y = np.repeat(np.repeat(bv, 8, axis=0), 8, axis=1)
                ids.append(i)
                payloads.append(enc(y))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "media_type": "image",
                    "payload": payloads,
                }
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


def attach_fake_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Manufacture a binary payload column from existing data (test fixture
    for repos without raw media): payload = md5 bytes of the text."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.unhex(F.md5(F.col(text_col))).alias("payload"),
    ).withColumn("byte_len", F.length("payload").cast("int"))


def resize_media(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize PNG payloads via Arrow-batched ``mapInPandas`` (decode →
    nearest-neighbor resample → re-encode); same schema in and out, so
    resize stages compose with decode/feature stages. No shuffle."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            resized = [png_resize_nearest(p, out_w, out_h) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": resized,
                    "byte_len": [len(p) for p in resized],
                }
            )

    return df.mapInPandas(run, MEDIA_SCHEMA)


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


def image_quality_flags(df: DataFrame, low_contrast_sigma: int = 8) -> DataFrame:
    """Image-quality gating for multimodal corpora: decode each PNG payload
    and flag degenerate images — ``is_blank`` (zero pixel variance: solid
    frames, dead captures) and ``is_low_contrast`` (population σ below
    ``low_contrast_sigma`` intensity levels) — the filter a vision-language
    data pipeline runs before spending embedding compute on empty frames.

    Both flags are INTEGER inequalities on per-image pixel sums
    (σ² < t ⟺ n·Σx² − (Σx)² < t²·n²), so the flag set is bit-identical
    across engines. Emits ``(media_id, width, height, px_min, px_max,
    dynamic_range, is_blank, is_low_contrast)``.

    Scale: decode runs in the same Arrow ``mapInPandas`` shape as
    :func:`decode_media` (map-only, no shuffle); the flags are plain
    column expressions on the decoded stats."""
    from collections.abc import Iterator

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def samples(payload: bytes):
            # container dispatch mirrors real_decode: PNG all-channel
            # samples, JPEG the full-resolution LUMA plane
            if payload[:8] == _PNG_SIG:
                w, h, _c, px = png_decode_pixels(payload)
                return w, h, np.frombuffer(px, dtype=np.uint8)
            if payload[:2] == b"\xff\xd8":
                from azure_medicine_data_engineering_spark.operators.jpeg import (
                    jpeg_decode_planes,
                )

                w, h, planes, _n = jpeg_decode_planes(payload)
                return w, h, planes[0].reshape(-1)
            if payload[:6] in (b"GIF87a", b"GIF89a"):
                from azure_medicine_data_engineering_spark.operators.gif import (
                    gif_decode_frames,
                )

                w, h, frames = gif_decode_frames(payload)
                # first frame's palette-resolved samples (all channels,
                # matching the PNG all-sample convention)
                return (
                    frames[0]["w"],
                    frames[0]["h"],
                    np.frombuffer(frames[0]["rgb"], dtype=np.uint8),
                )
            if payload[:2] == b"BM":
                from azure_medicine_data_engineering_spark.operators.bmp import (
                    bmp_decode_pixels,
                )

                w, h, _c, samples = bmp_decode_pixels(payload)
                return w, h, np.frombuffer(samples, dtype=np.uint8)
            raise NotImplementedError(
                "only PNG/JPEG/GIF/BMP quality gates are wired"
            )

        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                w, h, px = samples(bytes(payload))
                arr = px.astype(np.int64)
                n = int(arr.size)
                s = int(arr.sum())
                q = int((arr * arr).sum())
                rows.append((mid, w, h, n, s, q, int(arr.min()), int(arr.max())))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "_n", "_s", "_q",
                         "px_min", "px_max"],
            )

    decoded = df.select("media_id", "payload").mapInPandas(
        run,
        "media_id long, width int, height int, _n long, _s long, _q long, "
        "px_min int, px_max int",
    )
    var_scaled = F.col("_n") * F.col("_q") - F.col("_s") * F.col("_s")
    t = low_contrast_sigma
    return decoded.select(
        "media_id",
        "width",
        "height",
        "px_min",
        "px_max",
        (F.col("px_max") - F.col("px_min")).cast("int").alias("dynamic_range"),
        (var_scaled == 0).alias("is_blank"),
        (var_scaled < F.lit(t * t) * F.col("_n") * F.col("_n")).alias(
            "is_low_contrast"
        ),
    )


def attach_gif_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic REAL-GIF fixture (round 10): same md5-driven geometry
    and tiled digest pixels as the PNG fixture (w = 4 + b0 % 13, h = 4 +
    b1 % 11), encoded as a spec-valid GIF89a with a grayscale palette —
    and INTERLACED for half the corpus (b2 even), so the oracle exercises
    both row orders. GIF is lossless, so pixel means stay md5
    arithmetic. Arrow-batched mapInPandas, no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from azure_medicine_data_engineering_spark.operators.gif import (
            gif_encode_gray,
        )

        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                h = hashlib.md5(str(t).encode("utf-8")).digest()
                w = 4 + h[0] % 13
                ht = 4 + h[1] % 11
                n = w * ht
                pixels = (h * (n // 16 + 1))[:n]
                ids.append(i)
                payloads.append(
                    gif_encode_gray(w, ht, pixels, interlace=h[2] % 2 == 0)
                )
            yield pd.DataFrame(
                {"media_id": ids, "media_type": "image", "payload": payloads}
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


def attach_bmp_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic REAL-BMP fixture (round 10): the PNG fixture's
    md5-driven geometry and tiled digest pixels, encoded as an 8-bit
    grayscale-palette BMP (`operators/bmp.py`). Lossless, so pixel means
    stay md5 arithmetic. Arrow-batched mapInPandas, no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from azure_medicine_data_engineering_spark.operators.bmp import (
            bmp_encode_gray,
        )

        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                h = hashlib.md5(str(t).encode("utf-8")).digest()
                w = 4 + h[0] % 13
                ht = 4 + h[1] % 11
                n = w * ht
                pixels = (h * (n // 16 + 1))[:n]
                ids.append(i)
                payloads.append(bmp_encode_gray(w, ht, pixels))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": "image", "payload": payloads}
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


def attach_media_payload(
    df: DataFrame, id_col: str, media_type: str, make_payload
) -> DataFrame:
    """Shared id-keyed fixture-attach scaffolding (round 12): cast the id,
    ensure parallelism (Python-heavy encode kernels on single-file tables
    otherwise run on 1-2 cores), and emit ``(media_id, media_type,
    payload)`` via ``make_payload(doc_id) -> bytes`` in one Arrow
    mapInPandas pass — the ONE copy of the batching loop the image /
    audio / video family attaches previously triplicated."""
    from azure_medicine_data_engineering_spark.session import ensure_parallelism

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for i in pdf[id_col]:
                i = int(i)
                ids.append(i)
                payloads.append(make_payload(i))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": media_type, "payload": payloads}
            )

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("payload", BinaryType()),
        ]
    )
    return ensure_parallelism(
        df.select(F.col(id_col).cast("long").alias(id_col))
    ).mapInPandas(run, out_schema)
