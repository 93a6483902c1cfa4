from __future__ import annotations

import numpy as np
import pytest

from vietnamese_ocr_spark.functions.imaging import png_decode, png_encode
from vietnamese_ocr_spark.operators.multimodal import (
    ASSETS_DDL,
    audio_features,
    image_features,
    image_resize,
    video_frame_sample,
)


@pytest.fixture(scope="module")
def assets(spark):
    rng = np.random.default_rng(5)
    rows = []
    for i in range(6):
        img = rng.integers(0, 256, (40 + i * 8, 100), dtype=np.uint8)
        rows.append(
            (f"img-{i}", "image", "image/png", bytearray(png_encode(img)),
             100, img.shape[0], None, None, None)
        )
    for i in range(4):
        rows.append(
            (f"aud-{i}", "audio", "audio/pcm-stub", bytearray(f"pcm{i}".encode()),
             None, None, 16000, 1000 + 250 * i, None)
        )
    for i in range(3):
        rows.append(
            (f"vid-{i}", "video", "video/frames-stub", bytearray(f"vid{i}".encode()),
             320, 240, None, None, 95)
        )
    from vietnamese_ocr_spark.functions.jpeg import jpeg_encode

    jimg = (np.add.outer(np.arange(40) * 3, np.arange(100)) % 256).astype(np.uint8)
    rows.append(
        ("jpg-0", "image", "image/jpeg", bytearray(jpeg_encode(jimg, 90)),
         100, 40, None, None, None)
    )
    rows.append(("bad-0", "image", "image/tiff", bytearray(b"II*\x00"), 1, 1, None, None, None))
    return spark.createDataFrame(rows, ASSETS_DDL)


def test_image_features_real_decode(assets):
    good = assets.filter("mime = 'image/png'")
    out = {r["asset_id"]: r for r in image_features(good).collect()}
    assert len(out) == 6
    assert out["img-0"]["height"] == 40 and out["img-0"]["width"] == 100
    assert 100 < out["img-0"]["mean_lum"] < 155  # uniform noise ~127.5


def test_image_resize_roundtrips(assets):
    good = assets.filter("mime = 'image/png'")
    rows = image_resize(good, 64, 256).collect()
    for r in rows:
        img = png_decode(bytes(r["payload"]))
        assert img.shape == (64, 256)


def test_jpeg_assets_decode(assets):
    out = {r["asset_id"]: r for r in image_features(assets.filter("asset_id = 'jpg-0'")).collect()}
    assert out["jpg-0"]["height"] == 40 and out["jpg-0"]["width"] == 100


def test_unsupported_mime_raises(assets):
    bad = assets.filter("asset_id = 'bad-0'")
    with pytest.raises(Exception, match="NotImplementedError|image/tiff"):
        image_features(bad).collect()


def test_audio_features_shape_and_determinism(assets, spark):
    out = {r["asset_id"]: r for r in audio_features(assets).collect()}
    assert len(out) == 4
    for r in out.values():
        assert len(r["features"]) == 16
        assert r["n_samples"] >= 16000
    again = {r["asset_id"]: r for r in audio_features(assets).collect()}
    assert all(out[k]["features"] == again[k]["features"] for k in out)


def test_video_frame_sampling_fanout(assets):
    rows = video_frame_sample(assets, every_nth=10).collect()
    per_asset = {}
    for r in rows:
        per_asset.setdefault(r["asset_id"], []).append(r)
    assert set(per_asset) == {"vid-0", "vid-1", "vid-2"}
    for frames in per_asset.values():
        assert len(frames) == 10  # ceil(95/10)
        idxs = sorted(f["frame_idx"] for f in frames)
        assert idxs == list(range(0, 95, 10))
        assert len({f["phash"] for f in frames}) == len(frames)
