"""Multimodal binary-column pipeline: schema, mapInPandas batch shape,
REAL PPM decode/resize on actual pixels, deterministic stub for
codec-bound formats, 1->N frame explosion."""

import hashlib

import numpy as np
import pytest

from linkgraph.functions import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    df = mm.synthetic_media(spark, n=48, partitions=4).persist()
    df.count()
    yield df
    df.unpersist()


def test_media_schema(media):
    assert media.schema == mm.MEDIA_SCHEMA
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_ppm_roundtrip():
    px = (np.arange(5 * 4 * 3).reshape(4, 5, 3) % 256).astype("uint8")
    enc = mm.encode_ppm(px)
    assert enc.startswith(b"P6\n5 4\n255\n")
    assert (mm.decode_ppm_pixels(enc) == px).all()
    # comments in the header survive
    commented = b"P6\n# a comment\n5 4\n255\n" + enc.split(b"255\n", 1)[1]
    assert (mm.decode_ppm_pixels(commented) == px).all()
    with pytest.raises(ValueError):
        mm.decode_ppm_pixels(b"\x89PNG....")


def test_image_features_real_ppm(media):
    feats = mm.image_features(media)
    assert feats.schema == mm.IMAGE_FEATURE_SCHEMA
    rows = {r["media_id"]: r for r in feats.collect()}
    n_images = media.where("kind = 'image'").count()
    assert len(rows) == n_images
    # fixture images are REAL P6 payloads: header dims must match
    payload = bytes(media.where("media_id = 0").collect()[0]["payload"])
    px = mm.decode_ppm_pixels(payload)
    got = rows[0]
    assert (got["width"], got["height"], got["channels"]) == (
        px.shape[1], px.shape[0], 3)
    assert got["sha256"] == hashlib.sha256(payload).hexdigest()
    assert got["n_bytes"] == len(payload)
    # embedding = real pixel statistics: channel means in [0,1],
    # histogram sums to 1
    emb = got["embedding"]
    assert len(emb) == 16
    assert emb[0] == pytest.approx(px[:, :, 0].mean() / 255.0, abs=1e-6)
    assert sum(emb[6:]) == pytest.approx(1.0, abs=1e-6)
    # second run identical (pure function of bytes)
    again = {r["media_id"]: r["sha256"] for r in mm.image_features(media).collect()}
    assert again == {k: v["sha256"] for k, v in rows.items()}


def test_auto_decode_stub_for_unknown_formats():
    d = mm.auto_decode(b"\x89PNG not a ppm")
    assert d == mm.fake_decode(b"\x89PNG not a ppm")
    # P6-prefixed garbage falls back rather than dying
    assert mm.auto_decode(b"P6 garbage") == mm.fake_decode(b"P6 garbage")


def test_resize_real_ppm(media):
    out = mm.resize_images(media, 6, 3)
    rows = out.collect()
    assert rows
    for r in rows:
        p = bytes(r["payload"])
        assert p.startswith(b"P6")  # image fixtures are all PPM
        px = mm.decode_ppm_pixels(p)
        assert px.shape == (3, 6, 3)
        assert r["meta"]["resized_w"] == "6" and r["meta"]["resized_h"] == "3"
        assert r["meta"]["source"].startswith("synth/")
    # nearest-neighbor correctness on one payload
    src = bytes(media.where("media_id = 0").collect()[0]["payload"])
    spx = mm.decode_ppm_pixels(src)
    rpx = mm.decode_ppm_pixels(mm.ppm_resize(src, 6, 3))
    h, w = spx.shape[:2]
    for y in range(3):
        for x in range(6):
            assert (rpx[y, x] == spx[(y * h) // 3, (x * w) // 6]).all()


def test_resize_stub_for_non_ppm(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    rows = [(0, "image", b"\x89PNG not ppm", {"source": "x"})]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.resize_images(df, 32, 8).collect()
    assert len(out) == 1 and len(out[0]["payload"]) == 32 * 8


def test_frame_sampling_explodes_by_duration(media):
    frames = mm.sample_frames(media, every_ms=500)
    per = {r["media_id"]: r["n"] for r in
           frames.groupBy("media_id").count().withColumnRenamed("count", "n").collect()}
    vids = {r["media_id"]: int(r["meta"]["duration_ms"]) for r in
            media.where("kind = 'video'").collect()}
    assert per.keys() == vids.keys()
    for mid, dur in vids.items():
        assert per[mid] == max(1, dur // 500)
    one = frames.where("media_id = 2 and frame_idx = 1").collect()
    if one:
        payload = None
        for r in media.where("media_id = 2").collect():
            payload = bytes(r["payload"])
        want = hashlib.sha256(payload + (1).to_bytes(4, "big")).hexdigest()
        assert one[0]["frame_sha256"] == want


def test_real_decoder_is_marked_stub():
    with pytest.raises(NotImplementedError):
        mm.real_decode(b"\x89PNG")


def test_wav_roundtrip():
    x = np.sin(np.linspace(0, 20, 800))
    enc = mm.encode_wav(x, sample_rate=8000)
    dec, rate = mm.decode_wav_samples(enc)
    assert rate == 8000 and len(dec) == 800
    assert np.abs(dec - x).max() < 1e-4  # 16-bit quantization error
    with pytest.raises(ValueError):
        mm.decode_wav_samples(b"OggS not a wav")


def test_audio_features_real_wav(media):
    feats = {r["media_id"]: r for r in mm.audio_features(media).collect()}
    auds = {r["media_id"]: bytes(r["payload"])
            for r in media.where("kind = 'audio'").collect()}
    assert feats.keys() == auds.keys()
    for mid, p in auds.items():
        want = mm.wav_features(p)
        got = feats[mid]
        assert got["sample_rate"] == want["sample_rate"] == 8000
        assert got["n_samples"] == want["n_samples"]
        assert got["duration_ms"] == want["duration_ms"]
        assert got["rms"] == pytest.approx(want["rms"], abs=1e-9)
        # a pure two-tone signal: spectrum is concentrated, rms ~ known
        assert 0.3 < got["rms"] < 0.6
        assert sum(got["spectrum"]) == pytest.approx(1.0, abs=1e-5)


def test_audio_features_stub_for_unknown(spark):
    rows = [(0, "audio", b"OggS whatever", {"source": "x"})]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.audio_features(df).collect()
    assert len(out) == 1 and len(out[0]["spectrum"]) == 8


def test_y4m_roundtrip():
    frames = [
        (np.arange(4 * 6 * 3).reshape(4, 6, 3) % 256).astype("uint8"),
        ((np.arange(4 * 6 * 3) * 7).reshape(4, 6, 3) % 256).astype("uint8"),
    ]
    enc = mm.encode_y4m(frames, fps=25)
    assert enc.startswith(b"YUV4MPEG2 W6 H4 F25:1")
    dec, fps = mm.decode_y4m_frames(enc)
    assert fps == 25 and len(dec) == 2
    assert all((a == b).all() for a, b in zip(dec, frames))
    with pytest.raises(ValueError):
        mm.decode_y4m_frames(b"\x00\x00\x01\xba mpeg")


def test_sample_video_frames_real_y4m(media):
    out = mm.sample_video_frames(media, every_n=2)
    rows = out.collect()
    vids = {r["media_id"]: bytes(r["payload"])
            for r in media.where("kind = 'video'").collect()}
    got = {}
    for r in rows:
        got.setdefault(r["media_id"], []).append(r)
    assert got.keys() == vids.keys()
    for mid, p in vids.items():
        frames, fps = mm.decode_y4m_frames(p)
        sampled = sorted(got[mid], key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in sampled] == list(range(0, len(frames), 2))
        for r in sampled:
            f = frames[r["frame_idx"]]
            assert r["frame_sha256"] == hashlib.sha256(f.tobytes()).hexdigest()
            assert r["mean_luma"] == pytest.approx(float(f[:, :, 0].mean()), abs=1e-9)
            assert r["ts_ms"] == r["frame_idx"] * 1000 // fps


def test_sample_video_frames_stub_fallback(spark):
    rows = [(0, "video", b"\x00mpegish", {"duration_ms": "3000"})]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.sample_video_frames(df).collect()
    assert len(out) == 3 and all(r["mean_luma"] == -1.0 for r in out)


def test_ppm_dhash_perceptual(media):
    from linkgraph.functions.dedup import hash64_near_pairs

    # a near-identical image (tiny brightness shift) hashes close;
    # an unrelated gradient hashes far
    base = (np.arange(8 * 9 * 3).reshape(8, 9, 3) % 200).astype("uint8")
    near = np.clip(base.astype("int16") + 2, 0, 255).astype("uint8")
    far = ((np.arange(8 * 9 * 3)[::-1]).reshape(8, 9, 3) % 251).astype("uint8")
    h0 = mm.ppm_dhash(mm.encode_ppm(base))
    h1 = mm.ppm_dhash(mm.encode_ppm(near))
    h2 = mm.ppm_dhash(mm.encode_ppm(far))
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(h0, h1) <= 3 < ham(h0, h2)

    # through Spark: table + quadrant-blocked near pairs
    spark = media.sparkSession
    rows = [
        (0, "image", mm.encode_ppm(base), {}),
        (1, "image", mm.encode_ppm(near), {}),
        (2, "image", mm.encode_ppm(far), {}),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    ht = mm.image_dhash_table(df)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in hash64_near_pairs(
            ht, max_hamming=3, id_col="media_id", hash_col="dhash"
        ).collect()
    }
    assert pairs == {(0, 1)}
