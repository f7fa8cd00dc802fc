"""Stdlib-zlib + numpy PNG codec (functions/png.py): lossless round
trips over every filter, a hand-built spec-literal payload, palette
support, CRC rejection, dispatch through the multimodal surface."""

import struct
import zlib

import numpy as np
import pytest

from linkgraph.functions.png import (
    _paeth,
    decode_png_pixels,
    encode_png,
    png_decode,
)


def _pattern(h, w, ch=3):
    yy, xx = np.mgrid[0:h, 0:w]
    planes = [(xx * 4) % 256, (yy * 5) % 256, ((xx + yy) * 3) % 256,
              ((xx * yy) + 9) % 256][:ch]
    return np.stack(planes, axis=2).astype(np.uint8)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + ctype + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def test_paeth_spec_tiebreaks():
    # spec 9.4: ties break a (left), then b (up); the worked ordering
    a = np.array([85], np.uint8)
    b = np.array([88], np.uint8)
    c = np.array([87], np.uint8)
    assert _paeth(a, b, c)[0] == 85  # pa=1 pb=2 pc=1 -> left on a/c tie
    # pb strictly smallest -> up: a=100 b=50 c=90 -> p=60, pa=40 pb=10 pc=30
    assert _paeth(
        np.array([100], np.uint8), np.array([50], np.uint8),
        np.array([90], np.uint8),
    )[0] == 50
    # a=0 b=20 c=10 -> p=10: pa=10, pb=10, pc=0 -> c chosen
    assert _paeth(
        np.array([0], np.uint8), np.array([20], np.uint8),
        np.array([10], np.uint8),
    )[0] == 10


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(6, 9, 3), (5, 4, 1), (7, 3, 4)])
def test_lossless_round_trip(filter_type, shape):
    h, w, ch = shape
    rng = np.random.default_rng(h * 100 + w * 10 + ch)
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    want = px[:, :, 0] if ch == 1 else px
    got = decode_png_pixels(encode_png(want, filter_type=filter_type))
    assert got.shape == want.shape
    assert (got == want).all()


def test_hand_built_spec_literal():
    # a 2x2 RGB image assembled chunk-by-chunk from the spec, NOT via
    # encode_png — independent of the encoder: filter 1 (Sub) row then
    # filter 2 (Up) row, values chosen so unfiltering must wrap mod 256
    row0 = bytes([1, 250, 0, 0, 10, 0, 0])    # Sub: (250,0,0) (4,0,0)
    row1 = bytes([2, 10, 0, 0, 252, 0, 0])    # Up:  (4,0,0)  (0,0,0)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(row0 + row1))
        + _chunk(b"IEND", b"")
    )
    px = decode_png_pixels(payload)
    assert px.tolist() == [
        [[250, 0, 0], [4, 0, 0]],
        [[4, 0, 0], [0, 0, 0]],
    ]


def test_palette_image():
    # color type 3 via hand-built chunks (encoder never emits palettes)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    # two scanlines, filter 0 each: indexes (0,1,2,0) and (2,1,0,1)
    scan = bytes([0, 0, 1, 2, 0]) + bytes([0, 2, 1, 0, 1])
    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte)
        + _chunk(b"IDAT", zlib.compress(scan))
        + _chunk(b"IEND", b"")
    )
    px = decode_png_pixels(payload)
    assert px.shape == (2, 4, 3)
    assert px[0, 0].tolist() == [255, 0, 0]
    assert px[0, 1].tolist() == [0, 255, 0]
    assert px[1, 0].tolist() == [0, 0, 255]


def test_rejects_out_of_scope_and_corruption():
    px = _pattern(5, 5)
    good = encode_png(px)
    bad = bytearray(good)
    bad[41] ^= 0x5A  # flip a byte inside IDAT -> CRC mismatch
    with pytest.raises(ValueError):
        decode_png_pixels(bytes(bad))
    # interlaced header whose IDAT was serialized NON-interlaced: the
    # Adam7 pass sizes don't add up -> size mismatch, still rejected
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    interlaced = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 7 * 2))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png_pixels(interlaced)
    # illegal depth/color-type combination (4-bit RGB, spec table 11.1)
    ihdr4 = struct.pack(">IIBBBBB", 2, 2, 4, 2, 0, 0, 0)
    bad_depth = (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr4)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 8))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png_pixels(bad_depth)


def test_auto_decode_dispatch_and_fallback():
    from linkgraph.functions.multimodal import auto_decode, fake_decode

    px = _pattern(32, 48)
    data = encode_png(px, filter_type=4)
    feats = auto_decode(data)
    assert (feats["width"], feats["height"]) == (48, 32)
    assert feats["embedding"] != fake_decode(data)["embedding"]
    assert abs(feats["embedding"][0] - px[..., 0].mean() / 255.0) < 1e-9
    # malformed PNG (interlace flag flipped on a linear-serialized
    # IDAT -> pass-size mismatch) falls back to the stub, not a crash
    broken = bytearray(data)
    # IHDR interlace byte is at offset 8(sig)+8(hdr)+12(ihdr data)=28
    broken[28] = 1
    # fix the IHDR CRC so only the interlace flag is "wrong"
    ihdr = bytes(broken[16:29])
    broken[29:33] = struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    assert auto_decode(bytes(broken)) == fake_decode(bytes(broken))
    # REAL interlaced PNG decodes for real now — identical features to
    # the linear encoding of the same pixels
    inter = encode_png(px, filter_type=2, interlace=True)
    assert auto_decode(inter)["embedding"] == feats["embedding"]


def test_dhash_png_matches_ppm():
    from linkgraph.functions.multimodal import encode_ppm, ppm_dhash

    yy, xx = np.mgrid[0:64, 0:64]
    px = np.repeat(
        (((xx // 8 + yy // 8) % 2) * 255).astype(np.uint8)[..., None], 3, axis=2
    )
    # PNG is lossless, so the dHash must match bit-for-bit
    assert ppm_dhash(encode_png(px, filter_type=3)) == ppm_dhash(encode_ppm(px))


def test_image_features_on_png_through_spark(spark):
    import pandas as pd

    from linkgraph.functions.multimodal import MEDIA_SCHEMA, image_features

    rows = []
    for i in range(5):
        px = _pattern(24 + i, 30 + i)
        rows.append(
            (i, "image", bytearray(encode_png(px, filter_type=i)),
             {"uri": f"img/{i}.png"})
        )
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"]),
        MEDIA_SCHEMA,
    )
    feats = {r["media_id"]: r for r in image_features(media).collect()}
    assert len(feats) == 5
    for i in range(5):
        assert feats[i]["width"] == 30 + i and feats[i]["height"] == 24 + i


def test_synthetic_media_mixed_png(spark):
    from linkgraph.functions.multimodal import image_features, synthetic_media

    media = synthetic_media(spark, n=18, partitions=2, png_every=2)
    feats = image_features(media).collect()
    # images are ids 0,3,6,... — real decode regardless of container
    assert len(feats) == 6
    for r in feats:
        assert r["width"] >= 8 and r["channels"] == 3


def test_png_decode_contract():
    d = png_decode(encode_png(_pattern(20, 20)))
    assert set(d) == {"width", "height", "channels", "sha256", "embedding"}
    assert len(d["embedding"]) == 16
    # rgba: stats over color channels only
    d4 = png_decode(encode_png(_pattern(8, 8, ch=4)))
    assert d4["channels"] == 3


# --------------------------------------- Adam7 / 16-bit / sub-byte
def test_adam7_roundtrip_all_filters_and_channels():
    """Adam7 interlacing: each reduced pass is filtered independently
    at its own geometry; scatter-reassembly must reproduce the input
    exactly for every filter type and channel count, including tiny
    images where several passes are empty."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (21, 33, 3), dtype=np.uint8)
    g = img[..., 0]
    rgba = np.dstack([img, rng.integers(0, 256, (21, 33), dtype=np.uint8)])
    for ft in range(5):
        for arr in (g, img, rgba):
            got = decode_png_pixels(encode_png(arr, filter_type=ft, interlace=True))
            assert np.array_equal(got, arr), (ft, arr.shape)
    for h, w in ((1, 1), (2, 3), (5, 1), (1, 9), (7, 7)):
        a = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(
            decode_png_pixels(encode_png(a, 4, interlace=True)), a
        ), (h, w)


def test_16bit_samples_decode_high_byte():
    """16-bit PNGs decode for real; output keeps the high byte (the
    downstream feature contract is 8-bit — documented reduction)."""
    from linkgraph.functions.png import encode_png16

    rng = np.random.default_rng(5)
    px16 = rng.integers(0, 65536, (13, 17, 3), dtype=np.uint16)
    for ft in range(5):
        got = decode_png_pixels(encode_png16(px16, filter_type=ft))
        assert np.array_equal(got, (px16 >> 8).astype(np.uint8)), ft
    g16 = px16[..., 0]
    assert np.array_equal(
        decode_png_pixels(encode_png16(g16, 4)), (g16 >> 8).astype(np.uint8)
    )


def test_sub_byte_gray_and_palette():
    """1/2/4-bit images: MSB-first bit unpacking; gray scales to the
    full 8-bit range (255 // (2^d - 1)), palette indexes look up
    PLTE."""
    from linkgraph.functions.png import _SIG, _png_chunk

    # 2-bit gray 4x6
    vals = np.array(
        [[0, 1, 2, 3, 0, 1], [3, 2, 1, 0, 3, 2],
         [1, 1, 2, 2, 3, 3], [0, 0, 0, 3, 3, 3]], dtype=np.uint8
    )
    w, h, depth = 6, 4, 2
    rows = bytearray()
    for y in range(h):
        rows.append(0)
        bits = "".join(format(v, "02b") for v in vals[y])
        bits = bits.ljust(((w * depth + 7) // 8) * 8, "0")
        rows.extend(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
    data = (_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(rows)))
            + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png_pixels(data), vals * 85)
    # 1-bit palette 3x5
    pal = np.array([[255, 0, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 0, 1, 1], [1, 0, 0, 0, 1], [0, 0, 1, 1, 0]],
                   dtype=np.uint8)
    w, h, depth = 5, 3, 1
    rows = bytearray()
    for y in range(h):
        rows.append(0)
        bits = "".join(str(v) for v in idx[y]).ljust(8, "0")
        rows.extend(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    data = (_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"PLTE", pal.tobytes())
            + _png_chunk(b"IDAT", zlib.compress(bytes(rows)))
            + _png_chunk(b"IEND", b""))
    assert np.array_equal(decode_png_pixels(data), pal[idx])
