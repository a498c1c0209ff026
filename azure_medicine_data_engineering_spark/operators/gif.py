"""GIF codec (GIF87a/89a), pure stdlib — the third real web-image format
closed behind the multimodal seam (PNG round 4, JPEG rounds 9-10): header +
logical-screen parse, global/local color tables, extension-block skipping,
full LZW decompression (variable code width, dictionary growth, CLEAR/EOI),
per-frame decode including GIF's own 4-pass row interlace, multi-frame
(animation) support.

Encoder (fixtures): the classic "uncompressed GIF" LZW trick — literal
codes at the minimum width with a CLEAR injected before the dictionary
would force a width increase — produces spec-valid files any viewer opens,
and keeps fixtures deterministic and md5-recomputable (grayscale palette
index i → (i,i,i), so pixel means are pure digest arithmetic like the
PNG/JPEG oracles).

No counterpart in the reference (training-data scale extension, same class
as PNG/JPEG/AVI/WARC).
"""

from __future__ import annotations

import struct


class GifError(ValueError):
    pass


#: GIF interlace row order: 4 passes (start, step).
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


class _LsbBitReader:
    """LSB-first bit reader over the concatenated data sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise GifError("truncated LZW stream")
            self.acc |= self.data[self.pos] << self.nbits
            self.nbits += 8
            self.pos += 1
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """GIF-variant LZW: code width starts min+1, grows as the dictionary
    fills (cap 12 bits), CLEAR resets, EOI ends."""
    clear = 1 << min_code_size
    eoi = clear + 1
    br = _LsbBitReader(data)
    out = bytearray()

    def reset():
        return (
            {i: bytes([i]) for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = br.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]
        else:
            raise GifError(f"invalid LZW code {code}")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            # the decoder's table lags the encoder's by ONE code, so the
            # width bump fires a slot early (the classic GIF "early
            # change": encoder switches at next_code == 2^w, decoder at
            # 2^w − 1) — high-entropy streams crossing 512/1024/2048
            # desync under the naive == 2^w rule
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise GifError("LZW stream ended before frame completed")
    return bytes(out[:n_pixels])


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise GifError("truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos : pos + n]
        if len(data) < pos + n:
            raise GifError("truncated sub-block")
        pos += n


def gif_decode_frames(payload: bytes):
    """Decode a GIF into (width, height, [frame dicts]) where each frame
    carries ``left/top/w/h``, ``indices`` (LZW-decoded palette indices in
    raster order, de-interlaced if the frame was interlaced) and ``rgb``
    (the frame's palette-resolved bytes, 3 per pixel)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF (bad signature)")
    width, height, packed, _bg, _aspect = struct.unpack(
        "<HHBBB", payload[6:13]
    )
    pos = 13
    global_table = b""
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        global_table = payload[pos : pos + n]
        pos += n
    frames = []
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos += 1
            _, pos = _read_subblocks(payload, pos)
            continue
        if b != 0x2C:
            raise GifError(f"unexpected block 0x{b:02X}")
        left, top, fw, fh, fpacked = struct.unpack(
            "<HHHHB", payload[pos : pos + 9]
        )
        pos += 9
        table = global_table
        if fpacked & 0x80:
            n = 3 * (2 << (fpacked & 0x07))
            table = payload[pos : pos + n]
            pos += n
        if not table:
            raise GifError("frame has no color table")
        min_code = payload[pos]
        pos += 1
        lzw, pos = _read_subblocks(payload, pos)
        idx = _lzw_decode(min_code, lzw, fw * fh)
        if fpacked & 0x40:  # interlaced: rows arrive in 4-pass order
            rows = [idx[r * fw : (r + 1) * fw] for r in range(fh)]
            ordered: list[bytes | None] = [None] * fh
            k = 0
            for start, step in _GIF_INTERLACE:
                for y in range(start, fh, step):
                    ordered[y] = rows[k]
                    k += 1
            idx = b"".join(ordered)  # type: ignore[arg-type]
        n_colors = len(table) // 3
        if not idx:
            # a 0-pixel frame would otherwise raise ValueError from
            # max() — keep the documented GifError surface (round-11
            # ADVICE)
            raise GifError("zero-pixel frame")
        if max(idx) >= n_colors:
            raise GifError("palette index out of range")
        rgb = b"".join(table[3 * i : 3 * i + 3] for i in idx)
        frames.append(
            {"left": left, "top": top, "w": fw, "h": fh,
             "indices": idx, "rgb": rgb}
        )
    if not frames:
        raise GifError("no image data in GIF")
    return width, height, frames


def gif_decode(payload: bytes):
    """(width, height, n_frames, mean_intensity) — mean over the FIRST
    frame's rgb samples / 255, half-away-rounded to 4 decimals (the same
    stat contract as png_decode/jpeg_decode)."""
    w, h, frames = gif_decode_frames(payload)
    rgb = frames[0]["rgb"]
    mean = int(sum(rgb) / (len(rgb) * 255.0) * 1e4 + 0.5) / 1e4
    return w, h, len(frames), mean


class _LsbBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_encode_uncompressed(min_code_size: int, indices: bytes) -> bytes:
    """Spec-valid 'uncompressed' LZW: literals at width min+1 with a CLEAR
    injected before the dictionary (which a decoder still grows) would
    widen the codes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # after a CLEAR the decoder's next_code = eoi+1; each literal grows it
    # by one; inject CLEAR before next_code reaches 2^width
    budget = (1 << width) - (eoi + 1) - 1
    bw = _LsbBitWriter()
    bw.write(clear, width)
    left = budget
    for i in indices:
        if left == 0:
            bw.write(clear, width)
            left = budget
        bw.write(i, width)
        left -= 1
    bw.write(eoi, width)
    return bw.flush()


def gif_encode_gray(
    width: int, height: int, pixels: bytes, interlace: bool = False
) -> bytes:
    """Encode a single-frame GIF89a with a 256-entry grayscale palette
    (index i → (i, i, i)), uncompressed-LZW data, optional interlace —
    the fixture side of :func:`gif_decode`: palette-resolved means equal
    the mean of the pixel bytes, so oracles recompute them from md5
    arithmetic exactly like the PNG fixtures."""
    if len(pixels) != width * height:
        raise GifError("pixels must be width*height bytes")
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0x80 | 0x07, 0, 0)
    out += bytes(v for i in range(256) for v in (i, i, i))  # global table
    packed = 0x40 if interlace else 0x00
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, packed)
    if interlace:
        rows = [pixels[r * width : (r + 1) * width] for r in range(height)]
        seq = b"".join(
            rows[y]
            for start, step in _GIF_INTERLACE
            for y in range(start, height, step)
        )
    else:
        seq = pixels
    out += bytes([8])  # LZW minimum code size
    lzw = _lzw_encode_uncompressed(8, seq)
    for i in range(0, len(lzw), 255):
        blk = lzw[i : i + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3b"
    return bytes(out)
