"""Baseline JPEG codec tests. The hand-built-bitstream test is the
mirror-independence anchor: it pins the DECODER against a byte sequence
constructed in this file from the JPEG spec's wire format alone (no shared
code with the encoder), so an encoder/decoder round trip cannot hide a
convention defect shared by both."""

import struct

import numpy as np
import pytest

from azure_medicine_data_engineering_spark.operators.jpeg import (
    ZIGZAG,
    JpegError,
    jpeg_decode,
    jpeg_decode_planes,
    jpeg_encode,
)


def _flat_image(rng, block_rows, block_cols):
    bv = rng.randint(0, 256, size=(block_rows, block_cols))
    return np.repeat(np.repeat(bv, 8, axis=0), 8, axis=1).astype(np.uint8)


def test_flat_blocks_bit_exact_roundtrip():
    rng = np.random.RandomState(7)
    y = _flat_image(rng, 3, 4)
    w, h, planes, n = jpeg_decode_planes(jpeg_encode(y))
    assert (w, h, n) == (32, 24, 1)
    assert np.array_equal(planes[0], y)


def test_decode_mean_is_half_away_4dec():
    y = np.full((8, 8), 200, dtype=np.uint8)
    w, h, mean = jpeg_decode(jpeg_encode(y))
    # 200/255 = 0.784313... -> 0.7843 (half-away on the 1e-4 grid)
    assert (w, h) == (8, 8)
    assert mean == 0.7843


def test_hand_built_bitstream_decodes():
    """Minimal single-block JPEG assembled byte-by-byte from the spec:
    quant all-8s, one DC Huffman code '0'→category 6, one AC code '0'→EOB.
    DC value 36 (= 164 − 128) encodes as '0' + '100100' + EOB '0' =
    01001000 = 0x48. Decoded: every pixel 164, mean 164/255 → 0.6431."""
    out = bytearray()
    out += b"\xff\xd8"                                        # SOI
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([8] * 64)
    out += b"\xff\xc0" + struct.pack(">H", 11)                # SOF0
    out += struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dc_counts = bytes([1] + [0] * 15)
    out += b"\xff\xc4" + struct.pack(">H", 20) + b"\x00" + dc_counts + bytes([6])
    out += b"\xff\xc4" + struct.pack(">H", 20) + b"\x10" + dc_counts + bytes([0])
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 0x3F, 0])
    out += bytes([0x48])                                      # entropy data
    out += b"\xff\xd9"                                        # EOI
    w, h, mean = jpeg_decode(bytes(out))
    assert (w, h) == (8, 8)
    assert mean == 0.6431
    _, _, planes, _ = jpeg_decode_planes(bytes(out))
    assert np.all(planes[0] == 164)


def test_gradient_lossy_tolerance():
    q_lum = np.array(
        [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
         14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
         18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
         49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99]
    )[ZIGZAG]
    g = np.add.outer(np.arange(40) * 3, np.arange(48) * 2).astype(np.uint8)
    w, h, planes, _ = jpeg_decode_planes(jpeg_encode(g, quant=q_lum))
    assert (w, h) == (48, 40)
    err = np.abs(planes[0].astype(int) - g.astype(int))
    assert err.max() <= 8 and err.mean() <= 2.0


def test_odd_dimensions_crop():
    rng = np.random.RandomState(3)
    o = rng.randint(0, 256, size=(13, 21)).astype(np.uint8)
    w, h, planes, _ = jpeg_decode_planes(jpeg_encode(o))
    assert (w, h) == (21, 13)
    assert planes[0].shape == (13, 21)
    # flat-8 quant keeps padded-edge blocks near-exact; interior exact-ish
    assert np.abs(planes[0].astype(int) - o.astype(int)).max() <= 8


def test_color_444_and_420():
    rng = np.random.RandomState(11)
    y = _flat_image(rng, 3, 4)
    cb = np.full_like(y, 120)
    cr = np.full_like(y, 136)
    for sampling in (None, ((2, 2), (1, 1), (1, 1))):
        w, h, planes, n = jpeg_decode_planes(
            jpeg_encode(y, cb, cr, sampling=sampling)
        )
        assert (w, h, n) == (32, 24, 3)
        assert np.array_equal(planes[0], y)  # luma exact (DC-only blocks)
        assert np.all(planes[1] == 120) and np.all(planes[2] == 136)
        assert planes[1].shape == (24, 32)  # upsampled to full resolution


def test_unsupported_sof_rejected():
    """SOF3 (lossless) and SOF9 (arithmetic) raise cleanly; SOF2 is now
    SUPPORTED (round 10) — a baseline stream relabeled SOF2 instead dies
    on the illegal Ss=0/Se=63 scan header, still as JpegError."""
    y = np.full((8, 8), 100, dtype=np.uint8)
    for bad in (0xC3, 0xC9):
        data = bytearray(jpeg_encode(y))
        i = data.find(b"\xff\xc0")
        data[i + 1] = bad
        with pytest.raises(JpegError, match="unsupported SOF"):
            jpeg_decode_planes(bytes(data))
    data = bytearray(jpeg_encode(y))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(JpegError, match="mixes DC and AC"):
        jpeg_decode_planes(bytes(data))


def test_not_a_jpeg_rejected():
    with pytest.raises(JpegError):
        jpeg_decode(b"\x89PNG\r\n\x1a\nnot a jpeg")


def test_real_decode_dispatches_jpeg():
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        real_decode,
    )

    y = np.full((16, 8), 50, dtype=np.uint8)
    w, h, mean = real_decode(jpeg_encode(y))
    assert (w, h) == (8, 16)
    assert mean == round(int(50 / 255.0 * 1e4 + 0.5) / 1e4, 4)
