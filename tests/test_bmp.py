"""BMP codec tests (round 10). The hand-built 24-bit top-down stream pins
the decoder against the wire format independently of the 8-bit encoder
(different bit depth, row order, and palette path)."""

import random
import struct

import pytest

from azure_medicine_data_engineering_spark.operators.bmp import (
    BmpError,
    bmp_decode,
    bmp_decode_pixels,
    bmp_encode_gray,
)


def test_roundtrip_with_row_padding():
    rng = random.Random(9)
    sizes = [(1, 1), (3, 5), (4, 4), (5, 3)] + [
        (rng.randint(1, 40), rng.randint(1, 40)) for _ in range(15)
    ]
    for w, h in sizes:
        px = bytes(rng.randrange(256) for _ in range(w * h))
        gw, gh, c, samples = bmp_decode_pixels(bmp_encode_gray(w, h, px))
        assert (gw, gh, c) == (w, h, 3)
        assert samples == b"".join(bytes([p] * 3) for p in px), (w, h)


def test_hand_built_24bit_top_down():
    """Byte-by-byte 24-bit BGR stream with NEGATIVE height (top-down):
    no shared code with the encoder."""
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + 16, 0, 0, 54)
    hdr += struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, 16, 0, 0, 0, 0)
    rows = bytes([1, 2, 3, 4, 5, 6, 0, 0]) + bytes(
        [7, 8, 9, 10, 11, 12, 0, 0]
    )
    w, h, c, s = bmp_decode_pixels(hdr + rows)
    assert (w, h, c) == (2, 2, 3)
    assert s == bytes(range(1, 13))


def test_decode_stats_contract():
    w, h, mean = bmp_decode(bmp_encode_gray(4, 4, bytes([100] * 16)))
    assert (w, h) == (4, 4)
    assert mean == int(100 / 255.0 * 1e4 + 0.5) / 1e4


def test_error_paths():
    with pytest.raises(BmpError, match="not a BMP"):
        bmp_decode(b"GIF89a whatever")
    good = bmp_encode_gray(8, 8, bytes(range(64)))
    with pytest.raises(BmpError):
        bmp_decode(good[: len(good) - 40])
    # compressed (BI_RLE8) rejected cleanly
    bad = bytearray(good)
    struct.pack_into("<I", bad, 14 + 16, 1)
    with pytest.raises(BmpError, match="compressed"):
        bmp_decode(bytes(bad))


def test_real_decode_and_quality_gates_dispatch(spark):
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        image_quality_flags,
        real_decode,
    )

    w, h, mean = real_decode(bmp_encode_gray(5, 3, bytes([50] * 15)))
    assert (w, h) == (5, 3) and mean == int(50 / 255.0 * 1e4 + 0.5) / 1e4
    blank = bmp_encode_gray(6, 6, bytes([9] * 36))
    df = spark.createDataFrame(
        [(1, bytearray(blank))], "media_id long, payload binary"
    )
    r = image_quality_flags(df).collect()[0]
    assert r["is_blank"] and r["width"] == 6


def test_zero_area_raises_bmperror():
    import struct

    import pytest

    from azure_medicine_data_engineering_spark.operators.bmp import (
        BmpError,
        bmp_decode,
        bmp_encode_gray,
    )

    good = bmp_encode_gray(2, 2, bytes([1, 2, 3, 4]))
    for field_off, val in ((18, 0), (22, 0), (18, -2)):
        bad = bytearray(good)
        struct.pack_into("<i", bad, field_off, val)
        with pytest.raises(BmpError):  # never ZeroDivisionError
            bmp_decode(bytes(bad))
