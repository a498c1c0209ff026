"""Pure-stdlib PNG codec (operators.multimodal.png_decode / png_encode_gray)."""

import struct
import zlib

import pytest

from azure_medicine_data_engineering_spark.operators.multimodal import (
    _PNG_SIG,
    png_decode,
    png_encode_gray,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _expected_mean(pixels: bytes) -> float:
    x = sum(pixels) / (len(pixels) * 255.0)
    return int(x * 10**4 + 0.5) / 10**4


def test_roundtrip_gray():
    pixels = bytes(range(200)) + bytes(56)  # 16x16
    payload = png_encode_gray(16, 16, pixels)
    w, h, mean = png_decode(payload)
    assert (w, h) == (16, 16)
    assert mean == _expected_mean(pixels)


def test_decode_all_filter_types():
    # 5x4 grayscale, one row per filter type (None, Sub, Up, Average, Paeth)
    rows = [
        bytes([10, 20, 30, 40, 50]),
        bytes([5, 15, 25, 35, 45]),
        bytes([100, 110, 120, 130, 140]),
        bytes([7, 14, 21, 28, 35]),
    ]
    width, height = 5, 4

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    raw = bytearray()
    prev = bytes(width)
    for r, (ftype, line) in enumerate(zip([0, 1, 2, 3], rows)):
        enc = bytearray(line)
        if ftype == 1:
            for x in range(width - 1, 0, -1):
                enc[x] = (enc[x] - line[x - 1]) & 0xFF
        elif ftype == 2:
            for x in range(width):
                enc[x] = (enc[x] - prev[x]) & 0xFF
        elif ftype == 3:
            for x in range(width):
                a = line[x - 1] if x else 0
                enc[x] = (enc[x] - (a + prev[x]) // 2) & 0xFF
        raw += bytes([ftype]) + enc
        prev = line
    # last row: Paeth
    line = bytes([90, 80, 70, 60, 50])
    enc = bytearray(line)
    for x in range(width):
        a = line[x - 1] if x else 0
        c = prev[x - 1] if x else 0
        enc[x] = (enc[x] - paeth(a, prev[x], c)) & 0xFF
    raw += bytes([4]) + enc
    height += 1

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    payload = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    w, h, mean = png_decode(payload)
    all_pixels = b"".join(rows) + line
    assert (w, h) == (width, height)
    assert mean == _expected_mean(all_pixels)


def test_decode_rgb():
    # 2x2 RGB, filter 0
    pix = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 128, 128, 128])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    raw = b"\x00" + pix[:6] + b"\x00" + pix[6:]
    payload = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    w, h, mean = png_decode(payload)
    assert (w, h) == (2, 2)
    assert mean == _expected_mean(pix)


def test_crc_corruption_detected():
    payload = bytearray(png_encode_gray(4, 4, bytes(16)))
    payload[20] ^= 0xFF  # flip a byte inside IHDR data
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(payload))


def test_bad_signature_rejected():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"GIF89a" + bytes(32))


def test_real_decode_dispatches_png():
    from azure_medicine_data_engineering_spark.operators.multimodal import real_decode

    payload = png_encode_gray(3, 3, bytes([9] * 9))
    assert real_decode(payload) == (3, 3, _expected_mean(bytes([9] * 9)))
    # JPEG dispatches to the round-9 baseline decoder now (a truncated
    # stream is a JpegError, not a codec gap); only genuinely unwired
    # formats raise NotImplementedError
    from azure_medicine_data_engineering_spark.operators.jpeg import JpegError

    with pytest.raises(JpegError):
        real_decode(b"\xff\xd8\xff\xe0 jpeg-ish but truncated")
    with pytest.raises(NotImplementedError):
        real_decode(b"RIFF....WAVEfmt ")


def test_resize_nearest_identity_and_geometry():
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        png_decode_pixels,
        png_resize_nearest,
    )

    pixels = bytes(range(48))  # 8x6
    payload = png_encode_gray(8, 6, pixels)
    # 1:1 resize is the identity
    same = png_resize_nearest(payload, 8, 6)
    assert png_decode_pixels(same)[3] == pixels
    # 2x downscale samples even rows/cols (nearest with floor indexing)
    half = png_resize_nearest(payload, 4, 3)
    w, h, ch, px = png_decode_pixels(half)
    assert (w, h, ch) == (4, 3, 1)
    expected = bytes(
        pixels[(i * 6 // 3) * 8 + (j * 8 // 4)] for i in range(3) for j in range(4)
    )
    assert px == expected
    # upscale replicates pixels, never interpolates new values
    big = png_decode_pixels(png_resize_nearest(payload, 16, 12))[3]
    assert set(big) <= set(pixels)


def test_image_quality_flags_planted(spark):
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        image_quality_flags,
        png_encode_gray,
    )

    blank = png_encode_gray(4, 4, bytes([128] * 16))
    lowc = png_encode_gray(4, 4, bytes([100, 101] * 8))      # sigma ~0.5
    sharp = png_encode_gray(4, 4, bytes([0, 255] * 8))       # sigma ~127
    df = spark.createDataFrame(
        [(1, bytearray(blank)), (2, bytearray(lowc)), (3, bytearray(sharp))],
        "media_id long, payload binary",
    )
    got = {r.media_id: r for r in image_quality_flags(df).collect()}
    assert got[1].is_blank and got[1].is_low_contrast and got[1].dynamic_range == 0
    assert not got[2].is_blank and got[2].is_low_contrast
    assert not got[3].is_blank and not got[3].is_low_contrast
    assert got[3].dynamic_range == 255


def test_adam7_interlace_roundtrip_exact():
    """Round 10: Adam7 streams decode to EXACTLY the same pixels as their
    non-interlaced twins — random sizes incl. 1x1 and sub-8x8 images
    where several passes are EMPTY."""
    import random

    from azure_medicine_data_engineering_spark.operators.multimodal import (
        png_decode_pixels,
        png_encode_gray,
    )

    rng = random.Random(7)
    sizes = [(1, 1), (1, 9), (9, 1), (2, 2), (7, 3), (8, 8)] + [
        (rng.randint(1, 40), rng.randint(1, 40)) for _ in range(20)
    ]
    for w, h in sizes:
        px = bytes(rng.randrange(256) for _ in range(w * h))
        plain = png_decode_pixels(png_encode_gray(w, h, px))
        inter = png_decode_pixels(png_encode_gray(w, h, px, interlace=True))
        assert plain == inter == (w, h, 1, px), (w, h)


def test_adam7_pass_geometry_matches_spec_diagram():
    """Pin the pass table against the spec's 8x8 diagram (independent of
    the encoder/decoder pair): which pass owns each pixel."""
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        _ADAM7,
    )

    spec = [
        "16462646",
        "77777777",
        "56565656",
        "77777777",
        "36463646",
        "77777777",
        "56565656",
        "77777777",
    ]
    owner = [[0] * 8 for _ in range(8)]
    for p, (x0, y0, dx, dy) in enumerate(_ADAM7, start=1):
        for y in range(y0, 8, dy):
            for x in range(x0, 8, dx):
                assert owner[y][x] == 0, "overlapping passes"
        for y in range(y0, 8, dy):
            for x in range(x0, 8, dx):
                owner[y][x] = p
    for y in range(8):
        for x in range(8):
            assert owner[y][x] == int(spec[y][x]), (y, x)


def test_interlaced_truncated_raises():
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        png_decode_pixels,
        png_encode_gray,
    )
    import struct
    import zlib

    import pytest

    good = png_encode_gray(10, 10, bytes(range(100)), interlace=True)
    # corrupt: shrink the inflated stream by re-wrapping fewer bytes
    pos = 8
    parts = {b"IHDR": None, b"IDAT": None}
    while pos + 8 <= len(good):
        length, ctype = struct.unpack(">I4s", good[pos : pos + 8])
        parts[ctype] = good[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(parts[b"IDAT"])
    bad_idat = zlib.compress(raw[:-7])

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    sig = good[:8]
    bad = sig + chunk(b"IHDR", parts[b"IHDR"]) + chunk(b"IDAT", bad_idat) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IDAT length"):
        png_decode_pixels(bad)
