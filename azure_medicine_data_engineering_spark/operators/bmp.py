"""BMP codec (Windows DIB), pure stdlib — the uncompressed image container
rounding out the native image set (PNG+Adam7, JPEG baseline+progressive,
GIF). Decoder: BITMAPFILEHEADER + BITMAPINFOHEADER, 8-bit paletted and
24-bit BGR, bottom-up AND top-down (negative height) row order, 4-byte row
padding, BI_RGB only (compressed BMP variants raise cleanly). Encoder
(fixtures): 8-bit grayscale-palette BMP any viewer opens.

No counterpart in the reference (training-data scale extension)."""

from __future__ import annotations

import struct


class BmpError(ValueError):
    pass


def bmp_decode_pixels(payload: bytes):
    """Decode to (width, height, channels, samples bytes row-major
    top-down) — 8-bit palette resolves to 3 channels (BGR order preserved
    as RGB-agnostic samples), 24-bit returns its 3 channels."""
    if payload[:2] != b"BM":
        raise BmpError("not a BMP (missing BM magic)")
    if len(payload) < 54:
        raise BmpError("truncated BMP header")
    (_size, _r1, _r2, data_off) = struct.unpack("<IHHI", payload[2:14])
    (
        hdr_size, width, height, planes, bpp, compression,
        _img_size, _xppm, _yppm, clr_used, _clr_imp,
    ) = struct.unpack("<IiiHHIIiiII", payload[14:54])
    if hdr_size < 40:
        raise BmpError(f"unsupported DIB header size {hdr_size}")
    if planes != 1:
        raise BmpError(f"bad plane count {planes}")
    if compression != 0:
        raise BmpError(f"compressed BMP unsupported (method {compression})")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        # zero-area (or negative-width) images would otherwise escape the
        # documented error surface as ZeroDivisionError in bmp_decode's
        # mean (round-11 ADVICE)
        raise BmpError(f"zero-area image {width}x{height}")
    if bpp == 8:
        n_colors = clr_used or 256
        pal_off = 14 + hdr_size
        palette = payload[pal_off : pal_off + 4 * n_colors]
        if len(palette) < 4 * n_colors:
            raise BmpError("truncated palette")
        row_bytes = (width + 3) & ~3
        out = bytearray()
        for r in range(height):
            src_r = r if top_down else height - 1 - r
            base = data_off + src_r * row_bytes
            row = payload[base : base + width]
            if len(row) < width:
                raise BmpError("truncated pixel data")
            for idx in row:
                if idx >= n_colors:
                    raise BmpError("palette index out of range")
                out += palette[4 * idx : 4 * idx + 3]  # B, G, R
        return width, height, 3, bytes(out)
    if bpp == 24:
        row_bytes = (width * 3 + 3) & ~3
        out = bytearray()
        for r in range(height):
            src_r = r if top_down else height - 1 - r
            base = data_off + src_r * row_bytes
            row = payload[base : base + width * 3]
            if len(row) < width * 3:
                raise BmpError("truncated pixel data")
            out += row
        return width, height, 3, bytes(out)
    raise BmpError(f"unsupported bit depth {bpp}")


def bmp_decode(payload: bytes):
    """(width, height, mean_intensity) over all samples / 255, half-away
    4-decimal — the shared codec stat contract."""
    w, h, _c, samples = bmp_decode_pixels(payload)
    mean = int(sum(samples) / (len(samples) * 255.0) * 1e4 + 0.5) / 1e4
    return w, h, mean


def bmp_encode_gray(width: int, height: int, pixels: bytes) -> bytes:
    """8-bit grayscale-palette BMP (bottom-up, BI_RGB): palette index
    i → (i, i, i), so sample means equal pixel-byte means — the same
    md5-arithmetic oracle property as the PNG/GIF fixtures."""
    if len(pixels) != width * height:
        raise BmpError("pixels must be width*height bytes")
    row_bytes = (width + 3) & ~3
    pad = b"\x00" * (row_bytes - width)
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    data = b"".join(
        pixels[r * width : (r + 1) * width] + pad
        for r in range(height - 1, -1, -1)  # bottom-up
    )
    data_off = 14 + 40 + len(palette)
    file_size = data_off + len(data)
    out = b"BM" + struct.pack("<IHHI", file_size, 0, 0, data_off)
    out += struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 8, 0, len(data), 2835, 2835,
        256, 0,
    )
    return out + palette + data
