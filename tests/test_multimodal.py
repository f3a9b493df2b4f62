"""Multimodal plumbing: binary columns, Arrow batch shape, fail-open decode."""

import pytest

from marie_icr_spark.operators.multimodal import (
    ASSET_SCHEMA,
    decode_media,
    encode_fake_media,
    media_features,
    sample_frames,
)


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        ("img-1", "image", encode_fake_media("I", 640, 480, 1, b"x" * 100), {"src": "a"}),
        ("img-2", "image", encode_fake_media("I", 100, 200, 1, b"y" * 10), {}),
        ("vid-1", "video", encode_fake_media("V", 1920, 1080, 10, b"f" * 100), {}),
        ("aud-1", "audio", encode_fake_media("A", 0, 0, 5, b"s" * 50), {}),
        ("bad-1", "image", b"\x89PNG\r\n\x1a\nnotreally", {}),  # real codec → stub
        ("bad-2", "image", b"xx", {}),  # truncated
        ("bad-3", "image", None, {}),
    ]
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)


def test_decode_dimensions_and_fail_open(spark, assets):
    out = {r["asset_id"]: r for r in decode_media(assets).collect()}
    assert out["img-1"]["width"] == 640 and out["img-1"]["height"] == 480
    assert out["img-1"]["payload_bytes"] == 100 and out["img-1"]["ok"]
    assert out["vid-1"]["n_frames"] == 10
    # real codec bytes hit the NotImplementedError stub → fail-open row
    assert not out["bad-1"]["ok"] and "not available" in out["bad-1"]["error"]
    assert not out["bad-2"]["ok"] and out["bad-2"]["error"] == "truncated"
    assert not out["bad-3"]["ok"]


def test_decode_fail_closed_raises(spark, assets):
    import py4j.protocol

    with pytest.raises(Exception):
        decode_media(assets, fail_open=False).collect()


def test_sample_frames(spark, assets):
    frames = sample_frames(assets, every_nth=3).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["asset_id"], []).append(r)
    # vid-1: 10 frames sampled every 3rd → 0,3,6,9
    assert [r["frame_idx"] for r in sorted(by_id["vid-1"], key=lambda r: r["frame_idx"])] == [0, 3, 6, 9]
    vframes = by_id["vid-1"]
    assert all(len(bytes(r["frame_bytes"])) == 10 for r in vframes)  # 100B / 10
    # zero-dimension audio asset still samples by frame count
    assert len(by_id["aud-1"]) == 2  # frames 0, 3 of 5
    assert "bad-1" not in by_id


def test_media_features_jvm_side(spark, assets):
    feats = media_features(decode_media(assets))
    plan = feats._jdf.queryExecution().executedPlan().toString()
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert rows["img-1"]["pixels"] == 640 * 480
    assert abs(rows["vid-1"]["aspect_ratio"] - 1920 / 1080) < 1e-9
    assert rows["aud-1"]["aspect_ratio"] == 0.0
