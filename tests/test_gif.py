"""GIF codec tests (round 10). The load-bearing pin: an INDEPENDENT real
LZW compressor (standard dictionary-building encoder, written here from the
algorithm — no code shared with the decoder) round-trips through the
decoder across the 512/1024/2048 width boundaries and the 4096-entry cap;
the uncompressed fixture encoder cannot reach those paths, so without this
the early-change boundary rule would go untested (it WAS wrong on the
first draft and only this pin caught it)."""

import random
import struct

import pytest

from azure_medicine_data_engineering_spark.operators.gif import (
    GifError,
    _LsbBitWriter,
    _lzw_decode,
    gif_decode,
    gif_decode_frames,
    gif_encode_gray,
)


def _lzw_encode_real(min_code: int, data: bytes) -> bytes:
    """Reference dictionary-building LZW encoder (GIF early-change rule:
    width bumps when next_code reaches 2^width; stops adding at 4096)."""
    clear = 1 << min_code
    eoi = clear + 1
    out = []
    width = min_code + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    out.append((clear, width))
    w_ = b""
    for ch in data:
        wc = w_ + bytes([ch])
        if wc in table:
            w_ = wc
        else:
            out.append((table[w_], width))
            if next_code < 4096:
                table[wc] = next_code
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            w_ = bytes([ch])
    if w_:
        out.append((table[w_], width))
    out.append((eoi, width))
    bw = _LsbBitWriter()
    for c, wd in out:
        bw.write(c, wd)
    return bw.flush()


def test_lzw_width_boundaries_and_cap():
    rng = random.Random(3)
    for size in (500, 5000, 20000, 60000):  # crosses 512/1024/2048 + cap
        data = bytes(rng.randrange(256) for _ in range(size))
        assert _lzw_decode(8, _lzw_encode_real(8, data), len(data)) == data


def test_lzw_self_referential_code():
    """The cScSc pattern emits code == next_code (the not-yet-defined
    entry) — the special case entry = prev + prev[0]."""
    rep = b"abcabcab" * 4000
    assert _lzw_decode(8, _lzw_encode_real(8, rep), len(rep)) == rep


def test_roundtrip_plain_and_interlaced():
    rng = random.Random(5)
    sizes = [(1, 1), (1, 9), (9, 1), (7, 3)] + [
        (rng.randint(1, 40), rng.randint(1, 40)) for _ in range(15)
    ]
    for w, h in sizes:
        px = bytes(rng.randrange(256) for _ in range(w * h))
        for il in (False, True):
            gw, gh, frames = gif_decode_frames(
                gif_encode_gray(w, h, px, interlace=il)
            )
            assert (gw, gh) == (w, h)
            assert frames[0]["indices"] == px, (w, h, il)
            assert frames[0]["rgb"] == b"".join(bytes([p] * 3) for p in px)


def test_decode_stats_contract():
    w, h, nf, mean = gif_decode(gif_encode_gray(4, 4, bytes([100] * 16)))
    assert (w, h, nf) == (4, 4, 1)
    assert mean == int(100 / 255.0 * 1e4 + 0.5) / 1e4


def test_multi_frame_and_extensions():
    """Two image descriptors + a graphic-control extension: the block walk
    must skip extensions by sub-block chains and return both frames."""
    a = gif_encode_gray(4, 2, bytes(range(8)))
    b = gif_encode_gray(4, 2, bytes(range(8, 16)))
    # splice: header+LSD+palette from a, GCE, frame a, frame b, trailer
    head_end = 13 + 3 * 256
    frame_a = a[head_end:-1]  # image descriptor .. terminator (drop 0x3B)
    frame_b = b[head_end:-1]
    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"  # ext + 4-byte block + term
    spliced = a[:head_end] + gce + frame_a + gce + frame_b + b"\x3b"
    w, h, frames = gif_decode_frames(spliced)
    assert (w, h) == (4, 2) and len(frames) == 2
    assert frames[0]["indices"] == bytes(range(8))
    assert frames[1]["indices"] == bytes(range(8, 16))


def test_error_paths():
    with pytest.raises(GifError, match="not a GIF"):
        gif_decode(b"\x89PNG\r\n\x1a\n")
    good = gif_encode_gray(8, 8, bytes(range(64)))
    with pytest.raises(GifError):
        gif_decode(good[:40])
    # corrupt LZW: flip a byte mid-stream
    bad = bytearray(good)
    bad[13 + 3 * 256 + 15] ^= 0xFF
    with pytest.raises(GifError):
        gif_decode_frames(bytes(bad))


def test_real_decode_dispatches_gif():
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        real_decode,
    )

    w, h, mean = real_decode(gif_encode_gray(5, 3, bytes([50] * 15)))
    assert (w, h) == (5, 3)
    assert mean == int(50 / 255.0 * 1e4 + 0.5) / 1e4


def test_header_geometry():
    g = gif_encode_gray(300, 7, bytes([1]) * 2100)
    w, h, _ = struct.unpack("<HHB", g[6:11])
    assert (w, h) == (300, 7)
    gw, gh, frames = gif_decode_frames(g)
    assert (gw, gh) == (300, 7) and len(frames[0]["indices"]) == 2100


def test_image_quality_flags_gif(spark):
    """The quality-gating operator dispatches GIF beside PNG/JPEG: a solid
    frame flags blank, a full-range frame does not."""
    from azure_medicine_data_engineering_spark.operators.multimodal import (
        image_quality_flags,
    )

    blank = gif_encode_gray(6, 6, bytes([77] * 36))
    ramp = gif_encode_gray(6, 6, bytes(range(0, 252, 7)))
    df = spark.createDataFrame(
        [(1, bytearray(blank)), (2, bytearray(ramp))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in image_quality_flags(df).collect()}
    assert rows[1]["is_blank"] and rows[1]["dynamic_range"] == 0
    assert not rows[2]["is_blank"] and rows[2]["px_max"] == 245


def test_zero_pixel_frame_raises_giferror():
    import struct

    import pytest

    from azure_medicine_data_engineering_spark.operators.gif import (
        GifError,
        gif_decode_frames,
        gif_encode_gray,
    )

    g = gif_encode_gray(2, 2, bytes([0, 1, 2, 3]))
    width, height, packed, _bg, _aspect = struct.unpack("<HHBBB", g[6:13])
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    while g[pos] == 0x21:  # skip extensions to the image descriptor
        pos += 2
        while g[pos] != 0:
            pos += 1 + g[pos]
        pos += 1
    assert g[pos] == 0x2C
    bad = bytearray(g)
    struct.pack_into("<H", bad, pos + 5, 0)
    struct.pack_into("<H", bad, pos + 7, 0)
    with pytest.raises(GifError):  # never ValueError from max()
        gif_decode_frames(bytes(bad))
