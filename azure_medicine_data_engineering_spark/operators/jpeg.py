"""Baseline JPEG codec, numpy + stdlib only (no PIL/libjpeg) — closes the
highest-frequency real-corpus image format behind the multimodal codec seam
(`multimodal.real_decode`), the same pragmatic move as the stdlib-xlsx
reader (`sources/excel.py`).

Decoder: baseline sequential DCT (SOF0/1) AND progressive DCT (SOF2) —
marker walk, DQT (8/16-bit), DHT (canonical Huffman reconstruction),
DRI/restart markers, byte unstuffing, interleaved MCU scan with arbitrary
per-component sampling factors; progressive scans per T.81 Annex G (DC
first/refine, AC spectral-selection first with EOB runs, AC
successive-approximation refinement with carried correction bits);
dequantize + dezigzag, batched separable float IDCT (numpy tensordot over
all blocks of a component at once), nearest-neighbor chroma upsample.
Arithmetic coding, hierarchical, and lossless modes are out of scope and
raise cleanly; so do truncated streams, stray restart markers, and
non-interleaved multi-scan BASELINE files (every error path is JpegError).

Encoder (fixtures + the oracled query's deterministic payloads): grayscale
or YCbCr with per-component sampling factors, box-average chroma subsample,
forward DCT, any quant table, per-file canonical Huffman tables built from
the actual symbol frequencies (self-describing DHT — no reliance on the
Annex-K default tables), with the Annex-K dummy-symbol reservation so the
all-ones max-length codeword is never assigned (1-padding at flush can't
form a valid symbol). `jpeg_encode_progressive` emits the same quantized
coefficients through a configurable scan script (default: libjpeg-style
spectral selection + successive approximation for DC and AC), so
progressive and baseline encodings of one image decode IDENTICALLY.

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
        if self.pos >= len(self.data):
            raise JpegError("truncated entropy-coded data")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise JpegError("truncated entropy-coded data")
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
        if self.pos + 1 >= len(self.data):
            raise JpegError("truncated entropy-coded data at restart")
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
    """Decode a baseline-sequential (SOF0/1) or progressive (SOF2) JPEG to
    per-component full-resolution planes. Returns
    (width, height, [plane uint8 arrays], n_components)."""
    if payload[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _Huff] = {}  # (class, id)
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    progressive = False
    seen_sof = False
    any_scan = False
    data = payload
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(data):
            raise JpegError("truncated segment header")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        if pos + seglen > len(data):
            raise JpegError("truncated segment")
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise JpegError(f"unsupported precision {precision}")
            progressive = marker == 0xC2
            seen_sof = True
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            _alloc_coef(comps, width, height)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(
                f"unsupported SOF marker 0xFF{marker:02X} (baseline"
                f" sequential and progressive DCT only)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if not seen_sof:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                found = None
                for c in comps:
                    if c["id"] == cs:
                        found = c
                        c["td"], c["ta"] = tdta >> 4, tdta & 0xF
                if found is None:
                    raise JpegError(f"SOS references unknown component {cs}")
                scan_comps.append(found)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            scan_start = pos + seglen
            any_scan = True
            if not progressive:
                if ns != len(comps):
                    raise JpegError(
                        "non-interleaved baseline scans unsupported"
                        f" (scan has {ns} of {len(comps)} components)"
                    )
                _decode_baseline_scan(
                    data, scan_start, comps, qt, huff, restart_interval
                )
                # baseline: single scan carries everything
                return _reconstruct(comps, qt, width, height)
            pos = _decode_progressive_scan(
                data,
                scan_start,
                comps,
                scan_comps,
                huff,
                restart_interval,
                ss,
                se,
                ah,
                al,
            )
            continue
        pos += seglen
    if progressive and any_scan:
        return _reconstruct(comps, qt, width, height)
    raise JpegError("no SOS marker found")


def _alloc_coef(comps, width, height):
    """MCU-padded per-component coefficient stores (shared by baseline and
    every progressive scan)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks per row (MCU-padded)
        c["bh"] = mcuy * c["v"]
        # true (unpadded) block dims for non-interleaved scan traversal
        c["nbx"] = (-(-width * c["h"] // hmax) + 7) // 8
        c["nby"] = (-(-height * c["v"] // vmax) + 7) // 8
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
        c["pred"] = 0
        c["eobrun"] = 0
    comps[0]["_mcux"], comps[0]["_mcuy"] = mcux, mcuy
    comps[0]["_hmax"], comps[0]["_vmax"] = hmax, vmax


def _decode_baseline_scan(data, pos, comps, qt, huff, restart_interval):
    mcux, mcuy = comps[0]["_mcux"], comps[0]["_mcuy"]
    br = _BitReader(data, pos)
    mcu_count = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
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
                            row = (my * c["v"] + by) * c["bw"] + (
                                mx * c["h"] + bx
                            )
                            c["coef"][row] = blk
                mcu_count += 1
    except KeyError as exc:
        raise JpegError(f"scan references undefined Huffman table {exc}")
    except _RestartMarker:
        raise JpegError("unexpected restart marker inside entropy-coded data")


def _reconstruct(comps, qt, width, height):
    hmax = comps[0]["_hmax"]
    vmax = comps[0]["_vmax"]
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


# ---------------------------------------------------------------------------
# Progressive (SOF2) scan decoding — T.81 Annex G: DC first/refine, AC
# spectral-selection first with EOB runs, AC successive-approximation
# refinement with correction bits (the libjpeg decode_mcu_* control flow).
# ---------------------------------------------------------------------------


def _decode_progressive_scan(
    data, pos, comps, scan_comps, huff, restart_interval, ss, se, ah, al
):
    """Decode one progressive scan into the components' coefficient
    stores; returns the byte offset of the next marker."""
    if ss == 0 and se != 0:
        raise JpegError("progressive scan mixes DC and AC (Ss=0, Se>0)")
    if ss > 0 and len(scan_comps) != 1:
        raise JpegError("progressive AC scan must be single-component")
    br = _BitReader(data, pos)
    try:
        if ss == 0:
            _prog_dc_scan(br, comps, scan_comps, huff, restart_interval, ah, al)
        else:
            _prog_ac_scan(
                br, scan_comps[0], huff, restart_interval, ss, se, ah, al
            )
    except KeyError as exc:
        raise JpegError(f"scan references undefined Huffman table {exc}")
    except _RestartMarker:
        raise JpegError("unexpected restart marker inside entropy-coded data")
    # skip to the next marker (tolerates padding bits / unconsumed tail)
    p = br.pos
    while p + 1 < len(data):
        if (
            data[p] == 0xFF
            and data[p + 1] != 0x00
            and not (0xD0 <= data[p + 1] <= 0xD7)
        ):
            return p
        p += 1
    return len(data)


def _prog_dc_scan(br, comps, scan_comps, huff, restart_interval, ah, al):
    """DC scan, interleaved over the scan's components (first pass decodes
    Huffman diffs shifted left by Al; refinement appends one bit/block)."""
    mcux, mcuy = comps[0]["_mcux"], comps[0]["_mcuy"]
    interleaved = len(scan_comps) > 1
    mcu_count = 0
    if interleaved:
        spans = [(c, c["v"], c["h"]) for c in scan_comps]
        total = mcuy * mcux
    else:
        c = scan_comps[0]
        spans = [(c, 1, 1)]
        total = c["nby"] * c["nbx"]
    for idx in range(total):
        if restart_interval and idx and idx % restart_interval == 0:
            br.byte_align_consume_rst()
            for c in scan_comps:
                c["pred"] = 0
        for c, sv, sh in spans:
            for by in range(sv):
                for bx in range(sh):
                    if interleaved:
                        my, mx = idx // mcux, idx % mcux
                        row = (my * c["v"] + by) * c["bw"] + (
                            mx * c["h"] + bx
                        )
                    else:
                        row = (idx // c["nbx"]) * c["bw"] + idx % c["nbx"]
                    if ah == 0:
                        t = huff[(0, c["td"])].decode(br)
                        diff = _extend(br.read_bits(t), t)
                        c["pred"] += diff
                        c["coef"][row, 0] = c["pred"] << al
                    else:
                        if br.read_bit():
                            c["coef"][row, 0] |= 1 << al
        mcu_count += 1


def _prog_ac_scan(br, c, huff, restart_interval, ss, se, ah, al):
    """Non-interleaved AC scan over one component's true block grid."""
    c["eobrun"] = 0
    ac_tbl = huff[(1, c["ta"])]
    total = c["nby"] * c["nbx"]
    for idx in range(total):
        if restart_interval and idx and idx % restart_interval == 0:
            br.byte_align_consume_rst()
            c["eobrun"] = 0
        row = (idx // c["nbx"]) * c["bw"] + idx % c["nbx"]
        blk = c["coef"][row]
        if ah == 0:
            _prog_ac_first(br, ac_tbl, blk, c, ss, se, al)
        else:
            _prog_ac_refine(br, ac_tbl, blk, c, ss, se, al)


def _prog_ac_first(br, ac_tbl, blk, c, ss, se, al):
    if c["eobrun"] > 0:
        c["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = ac_tbl.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:
                c["eobrun"] = (1 << r) - 1
                if r:
                    c["eobrun"] += br.read_bits(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise JpegError("AC run past spectral band")
        blk[k] = _extend(br.read_bits(s), s) << al
        k += 1


def _prog_ac_refine(br, ac_tbl, blk, c, ss, se, al):
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if c["eobrun"] == 0:
        while k <= se:
            rs = ac_tbl.decode(br)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    c["eobrun"] = 1 << r
                    if r:
                        c["eobrun"] += br.read_bits(r)
                    break  # tail handled by the EOB-run branch below
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise JpegError("invalid refinement magnitude")
                val = p1 if br.read_bit() else m1
            while k <= se:
                if blk[k] != 0:
                    if br.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if c["eobrun"] > 0:
        while k <= se:
            if blk[k] != 0:
                if br.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        c["eobrun"] -= 1


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
    merge plus the spec's ≤16-bit adjustment, INCLUDING the Annex-K
    dummy-symbol reservation: an impossible 257th symbol with minimum
    weight is folded into the tree, canonically receives the last
    (all-ones) max-length codeword, and is then dropped — so 1-padding at
    flush can never form a valid extra symbol for strict third-party
    decoders. Returns (counts16, symbols, code dict symbol ->
    (code, length))."""
    # simple Huffman by merging; guarantee at least 2 symbols
    syms = sorted(freqs)
    if len(syms) == 1:
        syms.append((syms[0] + 1) % 256)
        freqs = {**freqs, syms[-1]: 0}
    sentinel = 256  # outside the byte alphabet, sorts after every symbol
    nodes = [(max(freqs[s], 1), i, s, None, None) for i, s in enumerate(syms)]
    # index -1 pops first among weight-1 ties → merged earliest → deepest
    nodes.append((1, -1, sentinel, None, None))
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
    # guarantee the sentinel sits at max depth (it sorts last there, so it
    # owns the numerically largest — all-ones — codeword of a complete code)
    maxd = max(depths.values())
    if depths[sentinel] != maxd:
        other = max(s for s in depths if s != sentinel and depths[s] == maxd)
        depths[sentinel], depths[other] = maxd, depths[sentinel]
    ordered = sorted(depths, key=lambda s: (depths[s], s))
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = depths[ordered[0]]
    for s in ordered:
        code <<= depths[s] - prev_len
        codes[s] = (code, depths[s])
        prev_len = depths[s]
        code += 1
    # drop the reserved sentinel: its (max-length, all-ones) slot stays
    # unassigned in the emitted table
    del codes[sentinel]
    counts = [0] * 16
    for s, d in depths.items():
        if s != sentinel:
            counts[d - 1] += 1
    ordered = [s for s in ordered if s != sentinel]
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


def _prep_grids(y, cb, cr, quant, sampling):
    """Shared encoder front half: subsample chroma, forward DCT + quantize
    every component, pad block grids to MCU multiples. Returns
    (grids, sampling, quant, hmax, vmax, mcux, mcuy, h, w)."""
    h, w = y.shape
    if quant is None:
        quant = np.full(64, 8, dtype=np.int64)
    planes = [y]
    if cb is not None:
        planes += [cb, cr]
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
    return grids, sampling, quant, hmax, vmax, mcux, mcuy, h, w


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
    grids, sampling, quant, hmax, vmax, mcux, mcuy, h, w = _prep_grids(
        y, cb, cr, quant, sampling
    )
    ncomp = len(grids)

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


# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder — T.81 Annex G: spectral selection +
# successive approximation for DC and AC, EOB runs with carried correction
# bits (the libjpeg encode_mcu_* control flow). Used for round-10 fixtures:
# a progressive stream of the SAME quantized coefficients must decode to
# EXACTLY the same planes as the baseline stream.
# ---------------------------------------------------------------------------

#: libjpeg's default progressive scan script (per-component entries are
#: indices into the plane list): DC first at Al=1 → luma AC bands at Al=2
#: → chroma AC at Al=1 → AC refinements → DC refinement.
def _default_scan_script(ncomp: int):
    if ncomp == 1:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    return [
        (list(range(ncomp)), 0, 0, 0, 1),
        ([0], 1, 5, 0, 2),
        ([1], 1, 63, 0, 1),
        ([2], 1, 63, 0, 1),
        ([0], 6, 63, 0, 2),
        ([0], 1, 63, 2, 1),
        (list(range(ncomp)), 0, 0, 1, 0),
        ([0], 1, 63, 1, 0),
        ([1], 1, 63, 1, 0),
        ([2], 1, 63, 1, 0),
    ]


def jpeg_encode_progressive(
    y: np.ndarray,
    cb: np.ndarray | None = None,
    cr: np.ndarray | None = None,
    quant: np.ndarray | None = None,
    sampling: tuple[tuple[int, int], ...] | None = None,
    scans: list[tuple[list[int], int, int, int, int]] | None = None,
) -> bytes:
    """Encode a progressive (SOF2) JPEG from uint8 planes. Same plane /
    quant / sampling contract as :func:`jpeg_encode`; ``scans`` is a scan
    script of ``(component_indices, Ss, Se, Ah, Al)`` tuples (default:
    the libjpeg-style full script with DC and AC successive
    approximation). The quantized coefficients are identical to the
    baseline encoder's, so a progressive re-encode decodes to exactly the
    same pixels — the round-trip test the fixtures build on."""
    grids, sampling, quant, hmax, vmax, mcux, mcuy, h, w = _prep_grids(
        y, cb, cr, quant, sampling
    )
    ncomp = len(grids)
    if scans is None:
        scans = _default_scan_script(ncomp)
    # true (non-interleaved) block dims per component
    dims = []
    for sh, sv in sampling:
        nbx = (-(-w * sh // hmax) + 7) // 8
        nby = (-(-h * sv // vmax) + 7) // 8
        dims.append((nbx, nby))

    def block_at(ci: int, row_idx: int) -> np.ndarray:
        nbx, _nby = dims[ci]
        return grids[ci][row_idx // nbx, row_idx % nbx]

    def make_dc_first_walker(comp_ids, al):
        def walk(emit_sym, emit_bits):
            preds = {ci: 0 for ci in comp_ids}
            if len(comp_ids) > 1:
                seq = []
                for my in range(mcuy):
                    for mx in range(mcux):
                        for ci in comp_ids:
                            sh, sv = sampling[ci]
                            for by in range(sv):
                                for bx in range(sh):
                                    seq.append(
                                        (ci, grids[ci][my * sv + by, mx * sh + bx])
                                    )
            else:
                ci = comp_ids[0]
                nbx, nby = dims[ci]
                seq = [(ci, block_at(ci, i)) for i in range(nbx * nby)]
            for ci, blk in seq:
                dc = int(blk[0]) >> al  # arithmetic point transform
                diff = dc - preds[ci]
                preds[ci] = dc
                t = _category(diff)
                emit_sym(t)
                if t:
                    emit_bits(_mag_bits(diff, t), t)

        return walk

    def make_dc_refine_walker(comp_ids, al):
        def walk(emit_sym, emit_bits):
            if len(comp_ids) > 1:
                for my in range(mcuy):
                    for mx in range(mcux):
                        for ci in comp_ids:
                            sh, sv = sampling[ci]
                            for by in range(sv):
                                for bx in range(sh):
                                    blk = grids[ci][my * sv + by, mx * sh + bx]
                                    emit_bits((int(blk[0]) >> al) & 1, 1)
            else:
                ci = comp_ids[0]
                nbx, nby = dims[ci]
                for i in range(nbx * nby):
                    emit_bits((int(block_at(ci, i)[0]) >> al) & 1, 1)

        return walk

    def make_ac_first_walker(ci, ss, se, al):
        def walk(emit_sym, emit_bits):
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    r = eobrun.bit_length() - 1
                    emit_sym(r << 4)
                    if r:
                        emit_bits(eobrun & ((1 << r) - 1), r)
                    eobrun = 0

            nbx, nby = dims[ci]
            for i in range(nbx * nby):
                blk = block_at(ci, i)
                run = 0
                for k in range(ss, se + 1):
                    coefv = int(blk[k])
                    v = abs(coefv) >> al
                    if coefv < 0:
                        v = -v
                    if v == 0:
                        run += 1
                        continue
                    flush_eob()
                    while run > 15:
                        emit_sym(0xF0)
                        run -= 16
                    s = _category(v)
                    emit_sym((run << 4) | s)
                    emit_bits(_mag_bits(v, s), s)
                    run = 0
                if run > 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
            flush_eob()

        return walk

    def make_ac_refine_walker(ci, ss, se, al):
        def walk(emit_sym, emit_bits):
            eobrun = 0
            be: list[int] = []  # correction bits carried across EOB blocks

            def flush_eob():
                nonlocal eobrun, be
                if eobrun:
                    r = eobrun.bit_length() - 1
                    emit_sym(r << 4)
                    if r:
                        emit_bits(eobrun & ((1 << r) - 1), r)
                    for bit in be:
                        emit_bits(bit, 1)
                    be = []
                    eobrun = 0

            nbx, nby = dims[ci]
            for i in range(nbx * nby):
                blk = block_at(ci, i)
                absv = {k: abs(int(blk[k])) >> al for k in range(ss, se + 1)}
                eob_pos = ss - 1
                for k in range(ss, se + 1):
                    if absv[k] == 1:
                        eob_pos = k
                r = 0
                br_bits: list[int] = []
                for k in range(ss, se + 1):
                    temp = absv[k]
                    if temp == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob_pos:
                        flush_eob()
                        emit_sym(0xF0)
                        for bit in br_bits:
                            emit_bits(bit, 1)
                        br_bits = []
                        r -= 16
                    if temp > 1:
                        # history coefficient: next magnitude bit only
                        br_bits.append(temp & 1)
                        continue
                    # newly nonzero at this precision
                    flush_eob()
                    emit_sym((r << 4) | 1)
                    emit_bits(1 if int(blk[k]) >= 0 else 0, 1)
                    for bit in br_bits:
                        emit_bits(bit, 1)
                    br_bits = []
                    r = 0
                if r > 0 or br_bits:
                    eobrun += 1
                    be.extend(br_bits)
                    if eobrun == 0x7FFF or len(be) > 900:
                        flush_eob()
            flush_eob()

        return walk

    out = BytesIO()
    out.write(b"\xff\xd8")  # SOI
    out.write(b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00")
    out.write(bytes(int(v) for v in quant))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i, (sh, sv) in enumerate(sampling):
        sof += bytes([i + 1, (sh << 4) | sv, 0])
    out.write(b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof)  # SOF2

    for comp_ids, ss, se, ah, al in scans:
        if ss == 0 and se != 0:
            raise JpegError("scan script mixes DC and AC")
        if ss > 0 and len(comp_ids) != 1:
            raise JpegError("AC scans must be single-component")
        if ss == 0 and ah == 0:
            walker = make_dc_first_walker(comp_ids, al)
        elif ss == 0:
            walker = make_dc_refine_walker(comp_ids, al)
        elif ah == 0:
            walker = make_ac_first_walker(comp_ids[0], ss, se, al)
        else:
            walker = make_ac_refine_walker(comp_ids[0], ss, se, al)

        codes: dict[int, tuple[int, int]] = {}
        needs_huff = not (ss == 0 and ah > 0)
        if needs_huff:
            freq: dict[int, int] = {}
            walker(
                lambda sym: freq.__setitem__(sym, freq.get(sym, 0) + 1),
                lambda v, n: None,
            )
            counts, symsb, codes = _build_huffman(freq)
            tc = 0 if ss == 0 else 1
            body = bytes([tc << 4]) + bytes(counts) + symsb
            out.write(b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body)

        bw = _BitWriter()

        def emit_sym(sym, _codes=codes, _bw=bw):
            code, length = _codes[sym]
            _bw.write(code, length)

        def emit_bits(v, n, _bw=bw):
            _bw.write(v, n)

        walker(emit_sym, emit_bits)
        bw.flush()

        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out.write(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
        out.write(bytes(bw.out))

    out.write(b"\xff\xd9")  # EOI
    return out.getvalue()
