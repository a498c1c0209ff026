"""Baseline JPEG codec, numpy + stdlib only (no PIL/libjpeg) — closes the
highest-frequency real-corpus image format behind the multimodal codec seam
(`multimodal.real_decode`), the same pragmatic move as the stdlib-xlsx
reader (`sources/excel.py`).

Decoder: full baseline sequential DCT (SOF0) — marker walk, DQT (8/16-bit),
DHT (canonical Huffman reconstruction), DRI/restart markers, byte
unstuffing, interleaved MCU scan with arbitrary per-component sampling
factors, dequantize + dezigzag, batched separable float IDCT (numpy
tensordot over all blocks of a component at once), nearest-neighbor chroma
upsample. Progressive (SOF2) and arithmetic coding are out of scope and
raise cleanly.

Encoder (fixtures + the oracled query's deterministic payloads): grayscale
or YCbCr with per-component sampling factors, box-average chroma subsample,
forward DCT, any quant table, per-file canonical Huffman tables built from
the actual symbol frequencies (self-describing DHT — no reliance on the
Annex-K default tables).

Exactness note the `jpeg_decode_blocks` oracle builds on: an image whose
8x8 blocks are each CONSTANT, encoded with a flat quant table of 8s, is
bit-exact through the round trip — the DCT of a flat block is DC-only
(DC = 8·(v−128), ACs cancel to ~1e-13 and quantize to 0), so decode
returns round(8·round(8(v−128)/8)/8) + 128 = v. Lossy behavior on real
content is covered by gradient-tolerance pytests instead.
"""

from __future__ import annotations

import struct
from io import BytesIO

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: separable DCT-II basis with JPEG normalization: B[u, x] =
#: C(u)/2 · cos((2x+1)uπ/16); forward F = B f Bᵀ, inverse f = Bᵀ F B.
_B = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _B[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class JpegError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Bit I/O with JPEG byte stuffing.
# ---------------------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data; 0xFF00 unstuffs to 0xFF;
    restart markers (FFD0-FFD7) terminate the current run and are consumed
    by the scan loop via align_to_marker()."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise JpegError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align_consume_rst(self) -> None:
        """Drop partial bits and consume one RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise JpegError("expected restart marker")


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, t: int) -> int:
    """JPEG sign extension: a t-bit magnitude v decodes to v if the top bit
    is set, else v − (2^t − 1)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class _Huff:
    """Canonical Huffman table from DHT counts+symbols; decode via
    (length, code) dict — fine at fixture scale, and the scan loop is the
    documented python-side cost on real corpora."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")


# ---------------------------------------------------------------------------
# Decoder.
# ---------------------------------------------------------------------------


def jpeg_decode_planes(payload: bytes):
    """Decode a baseline JPEG to per-component full-resolution planes.
    Returns (width, height, [plane uint8 arrays], n_components)."""
    if payload[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}  # (class, id)
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    data = payload
    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(
                        np.int64
                    )
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(
                        np.int64
                    )
                    p += 128
                qt[tq] = tbl  # zigzag order as stored
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1 : p + 17])
                nsym = sum(counts)
                symbols = seg[p + 17 : p + 17 + nsym]
                huff[(tc, th)] = _Huff(counts, symbols)
                p += 17 + nsym
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision = seg[0]
            if precision != 8:
                raise JpegError(f"unsupported precision {precision}")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"non-baseline SOF marker 0xFF{marker:02X} (progressive/"
                f"arithmetic JPEG unsupported — baseline DCT only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                for c in comps:
                    if c["id"] == cs:
                        c["td"], c["ta"] = tdta >> 4, tdta & 0xF
            scan_start = pos + seglen
            return _decode_scan(
                data, scan_start, width, height, comps, qt, huff, restart_interval
            )
        pos += seglen
    raise JpegError("no SOS marker found")


def _decode_scan(data, pos, width, height, comps, qt, huff, restart_interval):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks per row
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
        c["pred"] = 0
    br = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.byte_align_consume_rst()
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                dc_tbl = huff[(0, c["td"])]
                ac_tbl = huff[(1, c["ta"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        t = dc_tbl.decode(br)
                        diff = _extend(br.read_bits(t), t)
                        c["pred"] += diff
                        blk[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = ac_tbl.decode(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegError("AC run overflow")
                            blk[k] = _extend(br.read_bits(s), s)
                            k += 1
                        row = (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                        c["coef"][row] = blk
            mcu_count += 1
    planes = []
    for c in comps:
        q = qt[c["tq"]]
        deq = np.zeros((c["coef"].shape[0], 64), dtype=np.float64)
        deq[:, ZIGZAG] = c["coef"][:, np.arange(64)] * q[np.arange(64)]
        blocks = deq.reshape(-1, 8, 8)
        # batched inverse: f = Bᵀ F B for every block at once
        pix = np.einsum("ux,nuv,vy->nxy", _B, blocks, _B)
        pix = np.clip(np.round(pix + 128.0), 0, 255).astype(np.uint8)
        full = (
            pix.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full resolution then crop to (height, width)
        sy, sx = vmax // c["v"], hmax // c["h"]
        if sy > 1 or sx > 1:
            full = np.repeat(np.repeat(full, sy, axis=0), sx, axis=1)
        planes.append(full[:height, :width])
    return width, height, planes, len(comps)


def jpeg_decode(payload: bytes):
    """(width, height, mean_intensity) where mean_intensity is the mean of
    the full-resolution LUMA plane / 255, half-away-rounded to 4 decimals
    (the Y channel IS the quality-stat signal; chroma does not enter)."""
    width, height, planes, _n = jpeg_decode_planes(payload)
    y = planes[0]
    mean = int(float(np.sum(y, dtype=np.int64)) / (y.size * 255.0) * 1e4 + 0.5) / 1e4
    return width, height, mean


# ---------------------------------------------------------------------------
# Encoder (fixtures + deterministic oracle payloads).
# ---------------------------------------------------------------------------


def _build_huffman(freqs: dict[int, int]):
    """Length-limited (≤16) canonical Huffman from symbol frequencies —
    package-merge is overkill at 256 symbols; JPEG's classic two-smallest
    merge plus the spec's ≤16-bit adjustment. Returns (counts16, symbols,
    code dict symbol -> (code, length))."""
    # simple Huffman by merging; guarantee at least 2 symbols
    syms = sorted(freqs)
    if len(syms) == 1:
        syms.append((syms[0] + 1) % 256)
        freqs = {**freqs, syms[-1]: 0}
    nodes = [(max(freqs[s], 1), i, s, None, None) for i, s in enumerate(syms)]
    import heapq

    heap = list(nodes)
    heapq.heapify(heap)
    counter = len(nodes)
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        heapq.heappush(heap, (a[0] + b[0], counter, None, a, b))
        counter += 1
    depths: dict[int, int] = {}

    def walk(node, d):
        _w, _i, s, l, r = node
        if s is not None:
            depths[s] = max(d, 1)
            return
        walk(l, d + 1)
        walk(r, d + 1)

    walk(heap[0], 0)
    # enforce <= 16 bits (rare at our alphabet sizes): flatten overlong
    if max(depths.values()) > 16:
        for s in depths:
            depths[s] = min(depths[s], 16)
    # canonical assignment ordered by (length, symbol); ensure prefix-free
    # by recomputing lengths Kraft-consistently
    while sum(2.0 ** -d for d in depths.values()) > 1.0:
        deepest = max(depths, key=lambda s: (depths[s], s))
        depths[deepest] += 1
        if depths[deepest] > 16:
            raise JpegError("huffman length overflow")
    counts = [0] * 16
    for d in depths.values():
        counts[d - 1] += 1
    ordered = sorted(depths, key=lambda s: (depths[s], s))
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = depths[ordered[0]]
    for s in ordered:
        code <<= depths[s] - prev_len
        codes[s] = (code, depths[s])
        prev_len = depths[s]
        code += 1
    return counts, bytes(ordered), codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _mag_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _component_blocks(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Pad to 8-multiples (edge replicate), forward DCT, quantize, zigzag.
    Returns (n_blocks_y, n_blocks_x, 64) int array."""
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane.astype(np.float64), ((0, ph - h), (0, pw - w)), mode="edge")
    by, bx = ph // 8, pw // 8
    blocks = (
        padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8) - 128.0
    )
    coef = np.einsum("ux,nxy,vy->nuv", _B, blocks, _B).reshape(-1, 64)
    qnat_f = np.zeros(64, dtype=np.float64)
    qnat_f[ZIGZAG] = quant.astype(np.float64)  # quant stored zigzag -> natural
    quantized = np.round(coef / qnat_f).astype(np.int64)
    zig = quantized[:, ZIGZAG]
    return zig.reshape(by, bx, 64)


def jpeg_encode(
    y: np.ndarray,
    cb: np.ndarray | None = None,
    cr: np.ndarray | None = None,
    quant: np.ndarray | None = None,
    sampling: tuple[tuple[int, int], ...] | None = None,
) -> bytes:
    """Encode a baseline JPEG from uint8 planes. Grayscale when cb/cr are
    None; else YCbCr with per-component (h, v) ``sampling`` (default 4:4:4).
    Chroma planes are given at FULL resolution and box-subsampled here.
    ``quant`` is one zigzag-order table shared by all components (flat 8s
    by default — the bit-exact fixture table)."""
    h, w = y.shape
    if quant is None:
        quant = np.full(64, 8, dtype=np.int64)
    planes = [y]
    if cb is not None:
        planes += [cb, cr]
    ncomp = len(planes)
    if sampling is None:
        sampling = tuple((1, 1) for _ in planes)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)

    comp_blocks = []
    for plane, (sh, sv) in zip(planes, sampling):
        if (sh, sv) != (hmax, vmax):
            fy, fx = vmax // sv, hmax // sh
            ph = (plane.shape[0] + fy - 1) // fy * fy
            pw = (plane.shape[1] + fx - 1) // fx * fx
            p = np.pad(
                plane.astype(np.float64),
                ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                mode="edge",
            )
            sub = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
            plane = np.round(sub).astype(np.uint8)
        comp_blocks.append(_component_blocks(plane, quant))

    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # pad block grids to MCU multiples (replicate last block)
    grids = []
    for blocks, (sh, sv) in zip(comp_blocks, sampling):
        need_y, need_x = mcuy * sv, mcux * sh
        by, bx, _ = blocks.shape
        if by < need_y:
            blocks = np.concatenate(
                [blocks, np.repeat(blocks[-1:], need_y - by, axis=0)], axis=0
            )
        if bx < need_x:
            blocks = np.concatenate(
                [blocks, np.repeat(blocks[:, -1:], need_x - bx, axis=1)], axis=1
            )
        grids.append(blocks)

    # one scan pass to collect symbols, one to emit: symbol streams per class
    def scan(emit, dc_codes=None, ac_codes=None, bw=None):
        preds = [0] * ncomp
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (blocks, (sh, sv)) in enumerate(zip(grids, sampling)):
                    for by_ in range(sv):
                        for bx_ in range(sh):
                            blk = blocks[my * sv + by_, mx * sh + bx_]
                            dc = int(blk[0])
                            diff = dc - preds[ci]
                            preds[ci] = dc
                            t = _category(diff)
                            emit("dc", t, diff, dc_codes, bw)
                            run = 0
                            last_nz = 0
                            for k in range(1, 64):
                                if blk[k]:
                                    last_nz = k
                            for k in range(1, last_nz + 1):
                                v = int(blk[k])
                                if v == 0:
                                    run += 1
                                    continue
                                while run > 15:
                                    emit("ac", 0xF0, None, ac_codes, bw)
                                    run -= 16
                                s = _category(v)
                                emit("ac", (run << 4) | s, v, ac_codes, bw)
                                run = 0
                            if last_nz < 63:
                                emit("ac", 0x00, None, ac_codes, bw)

    dc_freq: dict[int, int] = {}
    ac_freq: dict[int, int] = {}

    def count(kind, sym, val, _codes, _bw):
        tgt = dc_freq if kind == "dc" else ac_freq
        tgt[sym] = tgt.get(sym, 0) + 1

    scan(count)
    dc_counts, dc_syms, dc_codes = _build_huffman(dc_freq)
    ac_counts, ac_syms, ac_codes = _build_huffman(ac_freq)

    bw_ = _BitWriter()

    def emit(kind, sym, val, codes, bwr):
        if kind == "dc":
            code, length = dc_codes[sym]
            bwr.write(code, length)
            if sym:
                bwr.write(_mag_bits(val, sym), sym)
        else:
            code, length = ac_codes[sym]
            bwr.write(code, length)
            s = sym & 0xF
            if s:
                bwr.write(_mag_bits(val, s), s)

    scan(emit, dc_codes, ac_codes, bw_)
    bw_.flush()

    out = BytesIO()
    out.write(b"\xff\xd8")  # SOI
    # DQT id 0
    out.write(b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00")
    out.write(bytes(int(v) for v in quant))
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i, (sh, sv) in enumerate(sampling):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out.write(b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof)
    # DHT: dc class 0 id 0, ac class 1 id 0
    for tc, counts, syms in ((0, dc_counts, dc_syms), (1, ac_counts, ac_syms)):
        body = bytes([tc << 4]) + bytes(counts) + syms
        out.write(b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body)
    # SOS
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out.write(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
    out.write(bytes(bw_.out))
    out.write(b"\xff\xd9")  # EOI
    return out.getvalue()
