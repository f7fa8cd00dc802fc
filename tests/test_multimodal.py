"""Multimodal binary-column pipeline: schema, mapInPandas batch shape,
determinism of the stubbed decode, 1->N frame explosion."""

import hashlib

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


def test_image_features_deterministic(media):
    feats = mm.image_features(media)
    assert feats.schema == mm.IMAGE_FEATURE_SCHEMA
    rows = {r["media_id"]: r for r in feats.collect()}
    n_images = media.where("kind = 'image'").count()
    assert len(rows) == n_images
    # independently recompute one row from the fixture payload
    payload = media.where("media_id = 0").collect()[0]["payload"]
    want = mm.fake_decode(bytes(payload))
    got = rows[0]
    assert got["sha256"] == want["sha256"]
    assert (got["width"], got["height"], got["channels"]) == (
        want["width"], want["height"], want["channels"])
    assert got["n_bytes"] == len(payload)
    assert len(got["embedding"]) == 16
    # second run identical (pure function of bytes)
    again = {r["media_id"]: r["sha256"] for r in mm.image_features(media).collect()}
    assert again == {k: v["sha256"] for k, v in rows.items()}


def test_resize_updates_meta_and_payload(media):
    out = mm.resize_images(media, 32, 8)
    rows = out.collect()
    assert rows and all(len(r["payload"]) == 32 * 8 for r in rows)
    assert all(r["meta"]["resized_w"] == "32" for r in rows)
    assert all(r["meta"]["resized_h"] == "8" for r in rows)
    # original meta preserved
    assert all(r["meta"]["source"].startswith("synth/") for r in rows)


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
