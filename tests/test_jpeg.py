"""Pure-numpy baseline JPEG codec (functions/jpeg.py): round trips,
spec-structure checks, dispatch through the multimodal surface."""

import numpy as np
import pytest

from linkgraph.functions.jpeg import (
    ZIGZAG_SPEC,
    _dct_matrix,
    _zigzag_walk,
    decode_jpeg_pixels,
    encode_jpeg,
    jpeg_decode,
)


def _pattern(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 4) % 256, (yy * 5) % 256, ((xx + yy) * 3) % 256], axis=2
    ).astype(np.uint8)


def _psnr(a, b):
    err = a.astype(float) - b.astype(float)
    return 10 * np.log10(255**2 / (err**2).mean())


def test_zigzag_derivations_agree():
    # encoder uses the spec's hard-coded table, decoder a diagonal
    # walk — agreement is the cross-derivation guard
    assert _zigzag_walk() == ZIGZAG_SPEC


def test_dct_matrix_orthonormal():
    C = _dct_matrix()
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-12)


@pytest.mark.parametrize("sub,ri,min_psnr", [
    ("444", 0, 35.0), ("444", 4, 35.0), ("420", 0, 27.0), ("420", 4, 27.0),
])
def test_round_trip_color(sub, ri, min_psnr):
    px = _pattern(50, 70)  # non-multiples of 16: crop paths
    data = encode_jpeg(px, quality=90, subsampling=sub, restart_interval=ri)
    out = decode_jpeg_pixels(data)
    assert out.shape == px.shape
    assert _psnr(out, px) > min_psnr


def test_round_trip_grayscale_and_flat():
    g = ((np.arange(40)[:, None] * 3 + np.arange(56)[None, :] * 2) % 256).astype(
        np.uint8
    )
    out = decode_jpeg_pixels(encode_jpeg(g, quality=90))
    assert out.shape == g.shape and _psnr(out, g) > 40.0
    flat = np.full((24, 24, 3), 77, np.uint8)
    out = decode_jpeg_pixels(encode_jpeg(flat, quality=85))
    assert np.abs(out.astype(int) - 77).max() <= 1


def test_stream_structure():
    data = encode_jpeg(_pattern(16, 16), quality=85, restart_interval=2)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4",
                   b"\xff\xda", b"\xff\xdd"):
        assert marker in data, marker
    # every 0xFF inside the entropy segment is stuffed or a marker
    sos = data.index(b"\xff\xda")
    scan_start = sos + 2 + int.from_bytes(data[sos + 2 : sos + 4], "big")
    i = scan_start
    while i < len(data) - 1:
        if data[i] == 0xFF:
            nxt = data[i + 1]
            assert nxt == 0x00 or 0xD0 <= nxt <= 0xD9, (i, hex(nxt))
            i += 2
        else:
            i += 1


def test_rejects_non_baseline():
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"\x89PNG\r\n")
    # a baseline stream MISLABELED progressive (SOF0 byte flipped to
    # SOF2) is malformed — its single interleaved scan has Se=63,
    # illegal for a progressive DC-first scan — and must still reject
    data = bytearray(encode_jpeg(_pattern(16, 16)))
    data[data.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg_pixels(bytes(data))
    # genuinely unsupported frame type (lossless sequential, SOF3)
    data = bytearray(encode_jpeg(_pattern(16, 16)))
    data[data.index(b"\xff\xc0") + 1] = 0xC3
    with pytest.raises(ValueError):
        decode_jpeg_pixels(bytes(data))


def test_auto_decode_dispatch_and_fallback():
    from linkgraph.functions.multimodal import auto_decode, fake_decode

    px = _pattern(32, 48)
    data = encode_jpeg(px, quality=90)
    feats = auto_decode(data)
    assert (feats["width"], feats["height"]) == (48, 32)
    # real pixel embedding, not the sha-derived stub
    assert feats["embedding"] != fake_decode(data)["embedding"]
    assert abs(feats["embedding"][0] - px[..., 0].mean() / 255.0) < 0.02
    # progressive falls back to the stub instead of dying
    broken = bytearray(data)
    broken[broken.index(b"\xff\xc0") + 1] = 0xC2
    assert auto_decode(bytes(broken)) == fake_decode(bytes(broken))


def test_dhash_jpeg_matches_ppm():
    from linkgraph.functions.multimodal import encode_ppm, ppm_dhash

    # high-contrast checkers: every 9x8 gradient is decisive, so the
    # lossy round trip cannot flip dHash bits
    yy, xx = np.mgrid[0:64, 0:64]
    px = np.repeat(
        (((xx // 8 + yy // 8) % 2) * 255).astype(np.uint8)[..., None], 3, axis=2
    )
    assert ppm_dhash(encode_jpeg(px, quality=90)) == ppm_dhash(encode_ppm(px))


def test_image_features_on_jpeg_through_spark(spark):
    import pandas as pd

    from linkgraph.functions.multimodal import MEDIA_SCHEMA, image_features

    rows = []
    for i in range(6):
        px = _pattern(24 + i, 30 + i)
        rows.append((i, "image", bytearray(encode_jpeg(px)), {"uri": f"img/{i}.jpg"}))
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"]),
        MEDIA_SCHEMA,
    )
    feats = {r["media_id"]: r for r in image_features(media).collect()}
    assert len(feats) == 6
    for i in range(6):
        assert feats[i]["width"] == 30 + i and feats[i]["height"] == 24 + i
        assert 0.0 < feats[i]["embedding"][0] < 1.0


def test_jpeg_decode_contract():
    d = jpeg_decode(encode_jpeg(_pattern(20, 20)))
    assert set(d) == {"width", "height", "channels", "sha256", "embedding"}
    assert len(d["embedding"]) == 16


# ------------------------------------------------- progressive (SOF2)
def test_progressive_decode_bit_exact_vs_baseline():
    """The progressive encoder/decoder share only the quantized
    coefficients with the baseline pair — the scan machinery (spectral
    selection, successive approximation, EOBRUN, buffered correction
    bits) is fully independent. Decoding both encodings of the same
    image must give IDENTICAL pixels, bit for bit, across subsampling,
    quality, odd dims, grayscale, noise (dense coefficients) and
    near-flat images (multi-block EOB runs)."""
    from linkgraph.functions.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(11)
    cases = []
    for (h, w) in ((8, 8), (45, 61), (17, 9)):
        x = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
        y = np.linspace(0, 255, h)[:, None] * np.ones((1, w))
        img = np.stack([x, y, (x + y) / 2], axis=2)
        img = np.clip(img + rng.normal(0, 12, img.shape), 0, 255).astype(np.uint8)
        cases.append(img)
    cases.append(rng.integers(0, 256, (40, 56, 3), dtype=np.uint8))  # noise
    flat = np.full((128, 128, 3), 77, np.uint8)
    flat[5, 5] = 250
    cases.append(flat)  # long EOB runs
    for img in cases:
        for ss in ("444", "420"):
            for q in (30, 90):
                pb = decode_jpeg_pixels(encode_jpeg(img, quality=q, subsampling=ss))
                pp = decode_jpeg_pixels(
                    encode_jpeg_progressive(img, quality=q, subsampling=ss)
                )
                assert np.array_equal(pb, pp), (img.shape, ss, q)
        g = img[..., 0]
        assert np.array_equal(
            decode_jpeg_pixels(encode_jpeg(g, quality=85)),
            decode_jpeg_pixels(encode_jpeg_progressive(g, quality=85)),
        )


def test_progressive_stream_structure():
    """SOF2 marker, one DHT carrying the EOBRUN-capable AC table, and
    the full successive-approximation scan script: DC first, AC first
    per component, DC refine, AC refine per component = 2 + 2*nc SOS
    segments."""
    from linkgraph.functions.jpeg import encode_jpeg_progressive

    data = encode_jpeg_progressive(_pattern(24, 40), quality=85)
    assert data.startswith(b"\xff\xd8") and data.endswith(b"\xff\xd9")
    assert data.find(b"\xff\xc2") > 0 and data.find(b"\xff\xc0") < 0
    n_sos = data.count(b"\xff\xda")
    assert n_sos == 2 + 2 * 3
    # quality knob still monotone on the progressive path
    small = encode_jpeg_progressive(_pattern(24, 40), quality=30)
    assert len(small) < len(data)


def test_auto_decode_progressive_real_pixels():
    """auto_decode now decodes progressive payloads for real — same
    features as the baseline encoding of the same image, never the
    sha-derived stub."""
    from linkgraph.functions.jpeg import encode_jpeg_progressive
    from linkgraph.functions.multimodal import auto_decode, fake_decode

    px = _pattern(32, 48)
    prog = encode_jpeg_progressive(px, quality=90)
    base = encode_jpeg(px, quality=90)
    fp = auto_decode(prog)
    fb = auto_decode(base)
    assert fp["embedding"] == fb["embedding"]
    assert (fp["width"], fp["height"]) == (48, 32)
    assert fp["embedding"] != fake_decode(prog)["embedding"]
