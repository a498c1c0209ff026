"""FLAC codec, pure stdlib — the lossless audio container speech corpora
(LibriSpeech-class) actually ship, joining WAV (`operators/media_av.py`)
in the audio ingest path.

Decoder scope (a real bitstream walk, not a header sniff):
* ``fLaC`` magic + metadata blocks (STREAMINFO parsed: block sizes,
  sample rate, channels, bits per sample, total samples).
* Frame headers: 14-bit sync, blocking strategy, coded block-size /
  sample-rate / channel-assignment / sample-size fields, UTF-8-coded
  frame number, header CRC-8 (polynomial 0x07) VERIFIED.
* Subframes: CONSTANT, VERBATIM, FIXED orders 0–4 (spec predictors),
  LPC orders 1–32 (quantized coefficients, signed shift), wasted bits.
* Residuals: both Rice methods (4-bit and 5-bit parameters), partition
  orders 0–15, zigzag mapping, and the escape code (raw ``n``-bit
  verbatim residuals).
* Stereo decorrelation: left/side, right/side, mid/side.
* Frame footer CRC-16 (polynomial 0x8005) VERIFIED.

Writer (fixture side): spec-correct single-channel 16-bit streams with a
small fixed block size so multi-frame walks are exercised; the subframe
type rotates per document (verbatim / fixed 1 / fixed 2 / LPC order 2) so
every decode path stays covered by one oracled query.

Raises :class:`FlacError` for malformed payloads (CRC mismatch, bad sync,
unsupported filters) — the documented error surface, like JpegError /
GifError / BmpError.

No counterpart in the reference (training-data scale extension; same
class as the other native codecs)."""

from __future__ import annotations

import struct


class FlacError(ValueError):
    """Raised for structurally invalid FLAC payloads."""


# --------------------------------------------------------------------------
# CRCs (FLAC spec: CRC-8 poly 0x07 init 0, CRC-16 poly 0x8005 init 0)
# --------------------------------------------------------------------------

_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07 if _c & 0x80 else _c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

_CRC16_TABLE = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005 if _c & 0x8000 else _c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for byte in data:
        c = _CRC8_TABLE[c ^ byte]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for byte in data:
        c = _CRC16_TABLE[((c >> 8) ^ byte) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# --------------------------------------------------------------------------
# Bit IO
# --------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        for _ in range(n):
            if self.byte >= len(self.data):
                raise FlacError("bitstream truncated")
            out = (out << 1) | ((self.data[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


# fixed-predictor coefficients per order (FLAC spec)
_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _utf8_number(r: _BitReader) -> int:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    val = first & (mask - 1)
    for _ in range(nbytes - 1):
        cont = r.read(8)
        if cont >> 6 != 0b10:
            raise FlacError("bad UTF-8 coded number")
        val = (val << 6) | (cont & 0x3F)
    return val


_BLOCKSIZE_CODE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_RATE_CODE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZE_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_residual(r: _BitReader, blocksize: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise FlacError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = r.read(4)
    nparts = 1 << part_order
    if blocksize % nparts:
        raise FlacError("partition order does not divide block size")
    res: list[int] = []
    for p in range(nparts):
        count = blocksize // nparts - (order if p == 0 else 0)
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            for _ in range(count):
                res.append(r.read_signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = r.read_unary()
                u = (q << param) | (r.read(param) if param else 0)
                res.append((u >> 1) ^ -(u & 1))  # un-zigzag
    return res


def _read_subframe(r: _BitReader, blocksize: int, bps: int) -> list[int]:
    if r.read(1):
        raise FlacError("subframe padding bit set")
    sftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    eff = bps - wasted
    if sftype == 0:  # CONSTANT
        v = r.read_signed(eff)
        out = [v] * blocksize
    elif sftype == 1:  # VERBATIM
        out = [r.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= sftype <= 12:  # FIXED
        order = sftype & 7
        warm = [r.read_signed(eff) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        coef = _FIXED_COEF[order]
        out = list(warm)
        for e in res:
            pred = sum(c * out[-k - 1] for k, c in enumerate(coef))
            out.append(pred + e)
    elif sftype >= 32:  # LPC
        order = (sftype & 31) + 1
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4)
        if prec == 15:
            raise FlacError("invalid LPC precision code")
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coef = [r.read_signed(prec) for _ in range(order)]
        res = _read_residual(r, blocksize, order)
        out = list(warm)
        for e in res:
            pred = sum(c * out[-k - 1] for k, c in enumerate(coef)) >> shift
            out.append(pred + e)
    else:
        raise FlacError(f"reserved subframe type {sftype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def flac_decode(payload: bytes) -> tuple[int, int, int, list[list[int]]]:
    """Decode a FLAC payload → ``(sample_rate, channels, bps,
    channel_samples)`` with both frame CRCs verified."""
    if payload[:4] != b"fLaC":
        raise FlacError("missing fLaC magic")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise FlacError("truncated metadata block header")
        hdr = payload[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        (size,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        body = payload[pos + 4 : pos + 4 + size]
        if btype == 0:
            if size < 34:
                raise FlacError("short STREAMINFO")
            bits = int.from_bytes(body[10:18], "big")
            streaminfo = {
                "sample_rate": bits >> 44,
                "channels": ((bits >> 41) & 0x7) + 1,
                "bps": ((bits >> 36) & 0x1F) + 1,
                "total": bits & ((1 << 36) - 1),
            }
        pos += 4 + size
        if last:
            break
    if streaminfo is None:
        raise FlacError("missing STREAMINFO")
    si = streaminfo
    chans: list[list[int]] = [[] for _ in range(si["channels"])]
    got = 0
    while got < si["total"]:
        frame_start = pos
        r = _BitReader(payload, pos)
        if r.read(14) != 0x3FFE:
            raise FlacError("bad frame sync")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        ch_code = r.read(4)
        ss_code = r.read(3)
        r.read(1)  # reserved
        _utf8_number(r)
        if bs_code == 0:
            raise FlacError("reserved block size code")
        elif bs_code == 6:
            blocksize = r.read(8) + 1
        elif bs_code == 7:
            blocksize = r.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODE[bs_code]
        if sr_code == 12:
            r.read(8)
        elif sr_code in (13, 14):
            r.read(16)
        sample_rate = _SAMPLE_RATE_CODE.get(sr_code, si["sample_rate"])
        bps = _SAMPLE_SIZE_CODE.get(ss_code, si["bps"])
        r.align()
        header_bytes = payload[frame_start : r.byte]
        crc8 = r.read(8)
        if _crc8(header_bytes) != crc8:
            raise FlacError("frame header CRC-8 mismatch")
        if ch_code <= 7:
            nch = ch_code + 1
            subs = [_read_subframe(r, blocksize, bps) for _ in range(nch)]
        elif ch_code == 8:  # left/side
            left = _read_subframe(r, blocksize, bps)
            side = _read_subframe(r, blocksize, bps + 1)
            subs = [left, [a - b for a, b in zip(left, side)]]
        elif ch_code == 9:  # right/side
            side = _read_subframe(r, blocksize, bps + 1)
            right = _read_subframe(r, blocksize, bps)
            subs = [[a + b for a, b in zip(side, right)], right]
        elif ch_code == 10:  # mid/side
            mid = _read_subframe(r, blocksize, bps)
            side = _read_subframe(r, blocksize, bps + 1)
            subs = []
            left, right = [], []
            for m, s in zip(mid, side):
                m2 = (m << 1) | (s & 1)
                left.append((m2 + s) >> 1)
                right.append((m2 - s) >> 1)
            subs = [left, right]
        else:
            raise FlacError(f"reserved channel assignment {ch_code}")
        if len(subs) != si["channels"]:
            raise FlacError("channel count mismatch")
        r.align()
        frame_bytes = payload[frame_start : r.byte]
        crc16 = r.read(16)
        if _crc16(frame_bytes) != crc16:
            raise FlacError("frame footer CRC-16 mismatch")
        for c, s in zip(chans, subs):
            c.extend(s)
        got += blocksize
        pos = r.byte
        if sample_rate != si["sample_rate"]:
            raise FlacError("frame sample rate differs from STREAMINFO")
    return si["sample_rate"], si["channels"], si["bps"], chans


# --------------------------------------------------------------------------
# Writer (fixture side)
# --------------------------------------------------------------------------


def _write_utf8_number(w: _BitWriter, val: int) -> None:
    if val < 0x80:
        w.write(val, 8)
        return
    # 2-byte form covers frame numbers < 2048 — ample for fixtures
    w.write(0b110, 3)
    w.write(val >> 6, 5)
    w.write(0b10, 2)
    w.write(val & 0x3F, 6)


def _write_residual(w: _BitWriter, res: list[int]) -> None:
    """Single-partition Rice (method 0) with a simple parameter pick;
    escapes to raw ``n``-bit verbatim when residuals are too wide, with
    ``n`` sized from the actual residual range (fixed-2 / LPC residuals
    of valid 16-bit PCM reach ~±118k, i.e. past 17 bits)."""
    w.write(0, 2)  # method 0: 4-bit params
    w.write(0, 4)  # partition order 0
    zz = [(e << 1) if e >= 0 else ((-e) << 1) - 1 for e in res]
    best_k = 0
    if zz:
        mean = sum(zz) // len(zz) + 1
        while (1 << (best_k + 1)) < mean and best_k < 13:
            best_k += 1
        if max(zz) >> best_k > 60:  # pathological quotient: escape
            # two's-complement width that holds every residual exactly:
            # bit_length of the magnitude plus a sign bit (min 17 keeps
            # legacy fixtures byte-identical).
            raw = max(17, max(e.bit_length() + 1 for e in res))
            if raw > 31:
                raise FlacError("escape residual exceeds 31-bit raw width")
            w.write(0xF, 4)
            w.write(raw, 5)
            for e in res:
                w.write(e & ((1 << raw) - 1), raw)
            return
    w.write(best_k, 4)
    for u in zz:
        w.write_unary(u >> best_k)
        if best_k:
            w.write(u & ((1 << best_k) - 1), best_k)


def flac_encode_pcm16(
    sample_rate: int,
    samples: list[int],
    block_size: int = 64,
    subframe: str = "verbatim",
) -> bytes:
    """Encode mono 16-bit PCM into a spec-correct FLAC stream.

    ``subframe``: ``verbatim`` | ``fixed1`` | ``fixed2`` | ``lpc2`` —
    the writer computes exact residuals for the chosen predictor, so
    every payload decodes losslessly whatever the type."""
    if sample_rate != 8000:
        raise FlacError("fixture writer emits the 8 kHz rate code only")
    si_bits = (
        (sample_rate << 44)
        | (0 << 41)  # channels - 1
        | ((16 - 1) << 36)
        | len(samples)
    )
    streaminfo = (
        struct.pack(">HH", block_size, block_size)
        + b"\x00\x00\x00" * 2  # min/max frame size (0 = unknown)
        + si_bits.to_bytes(8, "big")
        + b"\x00" * 16  # md5 unset
    )
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    frame_no = 0
    for start in range(0, len(samples), block_size):
        blk = samples[start : start + block_size]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocking
        full = len(blk) == block_size
        w.write(0b0110 if not full else 0b0111, 4)  # 8/16-bit size at end
        # (always explicit size: code 6 = 8-bit when short, 7 = 16-bit)
        w.write(0b0100, 4)  # 8 kHz
        w.write(0, 4)  # 1 channel, independent
        w.write(0b100, 3)  # 16 bps
        w.write(0, 1)  # reserved
        _write_utf8_number(w, frame_no)
        if full:
            w.write(len(blk) - 1, 16)
        else:
            w.write(len(blk) - 1, 8)
        w.align()
        header = w.bytes()
        w2 = _BitWriter()
        w2.write(_crc8(header), 8)
        # subframe
        order = {"verbatim": 0, "fixed1": 1, "fixed2": 2, "lpc2": 2}[subframe]
        if subframe == "verbatim" or len(blk) <= order:
            w2.write(0, 1)
            w2.write(1, 6)  # VERBATIM
            w2.write(0, 1)
            for s in blk:
                w2.write(s & 0xFFFF, 16)
        elif subframe in ("fixed1", "fixed2"):
            w2.write(0, 1)
            w2.write(8 | order, 6)
            w2.write(0, 1)
            for s in blk[:order]:
                w2.write(s & 0xFFFF, 16)
            coef = _FIXED_COEF[order]
            res = [
                blk[i] - sum(c * blk[i - k - 1] for k, c in enumerate(coef))
                for i in range(order, len(blk))
            ]
            _write_residual(w2, res)
        else:  # lpc2: quantized (a1=3, a2=-1)/2 predictor, shift 1
            w2.write(0, 1)
            w2.write(32 | (order - 1), 6)
            w2.write(0, 1)
            for s in blk[:order]:
                w2.write(s & 0xFFFF, 16)
            prec, shift, coef = 4, 1, [3, -1]
            w2.write(prec - 1, 4)
            w2.write(shift, 5)
            for c in coef:
                w2.write(c & ((1 << prec) - 1), prec)
            res = []
            for i in range(order, len(blk)):
                pred = (
                    sum(c * blk[i - k - 1] for k, c in enumerate(coef)) >> shift
                )
                res.append(blk[i] - pred)
            _write_residual(w2, res)
        w2.align()
        frame_wo_crc = header + w2.bytes()
        out += frame_wo_crc + struct.pack(">H", _crc16(frame_wo_crc))
        frame_no += 1
    return bytes(out)


# --------------------------------------------------------------------------
# Spark plumbing (Arrow map-only passes, mirroring the WAV stage)
# --------------------------------------------------------------------------

import hashlib
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


def attach_flac_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic REAL-FLAC fixture: the same md5-derived PCM as the
    WAV fixture (n = 32 + b0 % 97 samples, sample[i] = (b[i%16]-128)*231,
    8 kHz) so the two codecs share one oracle family; the subframe type
    rotates by doc id % 4 (verbatim / fixed-1 / fixed-2 / LPC-2) and the
    64-sample block size forces multi-frame streams. Arrow mapInPandas,
    no shuffle."""
    kinds = ["verbatim", "fixed1", "fixed2", "lpc2"]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                did = int(i)
                h = hashlib.md5(str(t).encode("utf-8")).digest()
                n = 32 + h[0] % 97
                samples = [(h[k % 16] - 128) * 231 for k in range(n)]
                ids.append(did)
                payloads.append(
                    flac_encode_pcm16(
                        8000, samples, block_size=64, subframe=kinds[did % 4]
                    )
                )
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
    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    ).mapInPandas(run, out_schema)


FLAC_AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_sec", DoubleType()),
        StructField("mean_abs_amplitude", DoubleType()),
    ]
)


def decode_flac_audio(df: DataFrame) -> DataFrame:
    """Decode FLAC payloads via Arrow mapInPandas → typed audio metadata
    (rate, sample count, duration, mean |amplitude|). The mean is one
    IEEE division of a SEQUENTIALLY-accumulated exact integer sum (the
    WAV convention), so the SQL twin is bit-identical. Map-only."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                sr, _ch, _bps, chans = flac_decode(bytes(p))
                mono = chans[0]
                total = 0
                for s in mono:  # sequential exact integer sum
                    total += s if s >= 0 else -s
                n = len(mono)
                rows.append(
                    (
                        mid,
                        "audio",
                        sr,
                        n,
                        n / sr if sr else 0.0,
                        total / n if n else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "media_type",
                    "sample_rate",
                    "n_samples",
                    "duration_sec",
                    "mean_abs_amplitude",
                ],
            )

    return df.mapInPandas(run, FLAC_AUDIO_SCHEMA)


def flac_decode_samples(payload: bytes) -> tuple[int, list[int]]:
    """``(rate, mono samples)`` adapter matching the WAV decoder's
    signature so :func:`media_av.audio_quality_flags` gates FLAC corpora
    with the same integer metrics."""
    sr, _ch, _bps, chans = flac_decode(payload)
    return sr, chans[0]


def flac_encode_stereo_ms(
    sample_rate: int,
    left: list[int],
    right: list[int],
    block_size: int = 64,
) -> bytes:
    """Encode stereo 16-bit PCM as MID/SIDE-decorrelated FLAC (channel
    assignment 10): per block, mid = (l+r) >> 1 and side = l − r encode
    as VERBATIM subframes (mid at 16 bits, side at 17 per spec); the
    decoder's decorrelation must reconstruct both channels exactly.
    Fixture twin of :func:`flac_encode_pcm16` for the stereo paths."""
    if sample_rate != 8000:
        raise FlacError("fixture writer emits the 8 kHz rate code only")
    if len(left) != len(right):
        raise FlacError("channel length mismatch")
    n = len(left)
    si_bits = (
        (sample_rate << 44) | (1 << 41) | ((16 - 1) << 36) | n
    )
    streaminfo = (
        struct.pack(">HH", block_size, block_size)
        + b"\x00\x00\x00" * 2
        + si_bits.to_bytes(8, "big")
        + b"\x00" * 16
    )
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    frame_no = 0
    for start in range(0, n, block_size):
        lb = left[start : start + block_size]
        rb = right[start : start + block_size]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 2)
        full = len(lb) == block_size
        w.write(0b0111 if full else 0b0110, 4)
        w.write(0b0100, 4)  # 8 kHz
        w.write(10, 4)  # mid/side
        w.write(0b100, 3)  # 16 bps
        w.write(0, 1)
        _write_utf8_number(w, frame_no)
        w.write(len(lb) - 1, 16 if full else 8)
        w.align()
        header = w.bytes()
        w2 = _BitWriter()
        w2.write(_crc8(header), 8)
        # mid subframe: VERBATIM, 16 bits
        w2.write(0, 1)
        w2.write(1, 6)
        w2.write(0, 1)
        for l_, r_ in zip(lb, rb):
            w2.write(((l_ + r_) >> 1) & 0xFFFF, 16)
        # side subframe: VERBATIM, 17 bits
        w2.write(0, 1)
        w2.write(1, 6)
        w2.write(0, 1)
        for l_, r_ in zip(lb, rb):
            w2.write((l_ - r_) & 0x1FFFF, 17)
        w2.align()
        frame_wo_crc = header + w2.bytes()
        out += frame_wo_crc + struct.pack(">H", _crc16(frame_wo_crc))
        frame_no += 1
    return bytes(out)


def attach_flac_stereo_payload(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Deterministic STEREO mid/side FLAC fixture: left channel = the WAV
    fixture PCM, right = the digest-tiled sequence phase-shifted by 5
    (so side = l − r is genuinely nonzero and the decorrelation path is
    load-bearing). Arrow mapInPandas, no shuffle."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                did = int(i)
                h = hashlib.md5(str(t).encode("utf-8")).digest()
                n = 32 + h[0] % 97
                left = [(h[k % 16] - 128) * 231 for k in range(n)]
                right = [(h[(k + 5) % 16] - 128) * 197 for k in range(n)]
                ids.append(did)
                payloads.append(flac_encode_stereo_ms(8000, left, right))
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
    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    ).mapInPandas(run, out_schema)


FLAC_STEREO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("channels", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("mean_abs_left", DoubleType()),
        StructField("mean_abs_right", DoubleType()),
    ]
)


def decode_flac_stereo(df: DataFrame) -> DataFrame:
    """Decode stereo FLAC payloads → per-channel integer stats (the WAV
    convention: sequential exact integer sums, one IEEE division)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                _sr, ch, _bps, chans = flac_decode(bytes(p))
                sums = []
                for c in chans:
                    tot = 0
                    for s in c:
                        tot += s if s >= 0 else -s
                    sums.append(tot)
                n = len(chans[0])
                rows.append(
                    (
                        mid,
                        ch,
                        n,
                        sums[0] / n if n else 0.0,
                        sums[1] / n if n else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "channels", "n_samples",
                    "mean_abs_left", "mean_abs_right",
                ],
            )

    return df.mapInPandas(run, FLAC_STEREO_SCHEMA)
