"""FLAC codec tests (`operators/flac.py`).

The wire pins assemble frames BYTE BY BYTE with the test's own CRC
implementations — independent of the module's writer, per the repo's
codec discipline (a shared writer/reader bug cannot fake these green)."""

from __future__ import annotations

import hashlib

import pytest

from azure_medicine_data_engineering_spark.operators.flac import (
    FlacError,
    flac_decode,
    flac_encode_pcm16,
)


def _crc8_ref(data: bytes) -> int:
    c = 0
    for byte in data:
        c ^= byte
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16_ref(data: bytes) -> int:
    c = 0
    for byte in data:
        c ^= byte << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _streaminfo(block: int, total: int) -> bytes:
    bits = (8000 << 44) | (0 << 41) | (15 << 36) | total
    body = (
        block.to_bytes(2, "big") * 2
        + b"\x00" * 6
        + bits.to_bytes(8, "big")
        + b"\x00" * 16
    )
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def test_handmade_constant_subframe():
    # header: sync(14) res(1) blocking(1) -> FF F8; bs=6(8-bit@end) sr=4
    # -> 0x64; ch=0 ss=4(16bps) res -> 0x08; frame#=0; bs-1=7
    header = bytes([0xFF, 0xF8, 0x64, 0x08, 0x00, 0x07])
    sub = bytes([0x00]) + (-5 & 0xFFFF).to_bytes(2, "big")  # CONSTANT -5
    frame = header + bytes([_crc8_ref(header)]) + sub
    frame += _crc16_ref(frame).to_bytes(2, "big")
    sr, ch, bps, chans = flac_decode(_streaminfo(8, 8) + frame)
    assert (sr, ch, bps) == (8000, 1, 16)
    assert chans[0] == [-5] * 8


def test_handmade_verbatim_subframe():
    header = bytes([0xFF, 0xF8, 0x64, 0x08, 0x00, 0x03])  # bs-1 = 3
    samples = [1, -2, 3, -4]
    sub = bytes([0x02]) + b"".join(
        (s & 0xFFFF).to_bytes(2, "big") for s in samples
    )
    frame = header + bytes([_crc8_ref(header)]) + sub
    frame += _crc16_ref(frame).to_bytes(2, "big")
    sr, _ch, _bps, chans = flac_decode(_streaminfo(4, 4) + frame)
    assert chans[0] == samples


def test_handmade_fixed2_rice_residual():
    # fixed order 2 over samples 10,20,30,40: warmup 10,20; residuals 0,0
    # rice k=0: each zero residual is zigzag 0 -> unary '1' bit
    header = bytes([0xFF, 0xF8, 0x64, 0x08, 0x00, 0x03])
    bits = ""
    bits += "0" + format(8 | 2, "06b") + "0"  # subframe hdr: FIXED order 2
    bits += format(10 & 0xFFFF, "016b") + format(20 & 0xFFFF, "016b")
    bits += "00" + "0000" + "0000"  # method 0, part order 0, rice k=0
    bits += "1" * 2  # two zero residuals
    bits += "0" * (-len(bits) % 8)
    sub = int(bits, 2).to_bytes(len(bits) // 8, "big")
    frame = header + bytes([_crc8_ref(header)]) + sub
    frame += _crc16_ref(frame).to_bytes(2, "big")
    _sr, _ch, _bps, chans = flac_decode(_streaminfo(4, 4) + frame)
    assert chans[0] == [10, 20, 30, 40]


def test_handmade_left_side_stereo():
    # ch_code 8 (left/side): left 16-bit verbatim, side 17-bit verbatim
    # left = [100, 200], side = left - right = [30, -50]
    header = bytes([0xFF, 0xF8, 0x64, 0x88, 0x00, 0x01])  # ch=8, bs-1=1
    bits = ""
    bits += "0" + "000001" + "0"  # left: VERBATIM
    bits += format(100 & 0xFFFF, "016b") + format(200 & 0xFFFF, "016b")
    bits += "0" + "000001" + "0"  # side: VERBATIM (bps+1 = 17)
    bits += format(30 & 0x1FFFF, "017b") + format(-50 & 0x1FFFF, "017b")
    bits += "0" * (-len(bits) % 8)
    sub = int(bits, 2).to_bytes(len(bits) // 8, "big")
    frame = header + bytes([_crc8_ref(header)]) + sub
    frame += _crc16_ref(frame).to_bytes(2, "big")
    si_bits = (8000 << 44) | (1 << 41) | (15 << 36) | 2  # 2 channels
    body = (
        (2).to_bytes(2, "big") * 2
        + b"\x00" * 6
        + si_bits.to_bytes(8, "big")
        + b"\x00" * 16
    )
    data = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + body + frame
    _sr, ch, _bps, chans = flac_decode(data)
    assert ch == 2
    assert chans[0] == [100, 200]
    assert chans[1] == [70, 250]  # right = left - side


@pytest.mark.parametrize("kind", ["verbatim", "fixed1", "fixed2", "lpc2"])
def test_roundtrip_all_subframe_kinds(kind):
    h = hashlib.md5(kind.encode()).digest()
    samples = [(h[k % 16] - 128) * 231 for k in range(113)]
    data = flac_encode_pcm16(8000, samples, block_size=64, subframe=kind)
    sr, ch, bps, chans = flac_decode(data)
    assert (sr, ch, bps) == (8000, 1, 16)
    assert chans[0] == samples  # lossless across multi-frame walk


@pytest.mark.parametrize("kind", ["fixed1", "fixed2", "lpc2"])
def test_escape_path_spiky_pcm_lossless(kind):
    # fixed-2/LPC residuals of valid 16-bit PCM reach ~±118k (> 2^16):
    # the Rice escape must size its raw width from the residuals, not a
    # hardcoded 17 bits (ADVICE r11 — wrapped to -101072 before the fix).
    samples = [0] * 62 + [-18000, 30000]
    data = flac_encode_pcm16(8000, samples, block_size=64, subframe=kind)
    _sr, _ch, _bps, chans = flac_decode(data)
    assert chans[0] == samples
    # full-range alternation: worst-case fixed-2 residual magnitude
    wild = [32767, -32768] * 40
    data = flac_encode_pcm16(8000, wild, block_size=64, subframe=kind)
    _sr, _ch, _bps, chans = flac_decode(data)
    assert chans[0] == wild


def test_error_surface():
    with pytest.raises(FlacError):
        flac_decode(b"RIFF not flac")
    good = flac_encode_pcm16(8000, [100, -100] * 40, subframe="fixed2")
    # corrupt the frame footer CRC
    bad = bytearray(good)
    bad[-1] ^= 0xFF
    with pytest.raises(FlacError):
        flac_decode(bytes(bad))
    # corrupt the header CRC region (flip a header byte)
    bad2 = bytearray(good)
    at = good.index(b"\xff\xf8") + 2
    bad2[at] ^= 0x10
    with pytest.raises(FlacError):
        flac_decode(bytes(bad2))
    # truncated payload
    with pytest.raises(FlacError):
        flac_decode(good[: len(good) - 6])


def test_stereo_ms_writer_roundtrip_and_negative_sides():
    from azure_medicine_data_engineering_spark.operators.flac import (
        flac_encode_stereo_ms,
    )

    left = [30000, -30000, 7, 0, -1, 1] * 30
    right = [-30000, 30000, -7, 1, 0, -1] * 30  # extreme sides (±60000)
    data = flac_encode_stereo_ms(8000, left, right, block_size=64)
    _sr, ch, _bps, chans = flac_decode(data)
    assert ch == 2
    assert chans[0] == left and chans[1] == right
