"""P6 training-augmentation suite: deterministic keyed equivalents of
the reference's transform.py chain (GridDistortion, Defocus,
PixelDropout, GaussNoise, BrightnessContrast, SafeRotate, Curve,
random pad), plus the distributed mapInPandas stage."""

from __future__ import annotations

import numpy as np
import pytest

from vietnamese_ocr_spark.functions.augment import (
    augment_train,
    brightness_contrast,
    curve,
    defocus,
    gauss_noise,
    grid_distortion,
    pixel_dropout,
    rng_for,
    safe_rotate,
)


def _img(seed=0, h=64, w=256):
    return np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)


def test_keyed_rng_deterministic_and_distinct():
    a = rng_for("img-1").uniform(size=4)
    b = rng_for("img-1").uniform(size=4)
    c = rng_for("img-2").uniform(size=4)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


@pytest.mark.parametrize(
    "op",
    [grid_distortion, defocus, pixel_dropout, gauss_noise,
     brightness_contrast, safe_rotate, curve],
)
def test_ops_preserve_shape_dtype_and_are_deterministic(op):
    img = _img()
    out1 = op(img.copy(), rng_for("k"))
    out2 = op(img.copy(), rng_for("k"))
    assert out1.shape == img.shape and out1.dtype == np.uint8
    assert np.array_equal(out1, out2)


def test_pixel_dropout_fraction():
    img = np.zeros((200, 200), dtype=np.uint8)
    out = pixel_dropout(img, rng_for("k"), dropout_prob=0.01, drop_value=255)
    frac = (out == 255).mean()
    assert 0.005 < frac < 0.02  # ~1% of pixels dropped to white


def test_defocus_smooths():
    img = _img()
    out = defocus(img, rng_for("k"))
    assert out.astype(float).var() < img.astype(float).var()


def test_safe_rotate_keeps_content_inside():
    """'Safe': nothing rotates out of frame. Rotating a 4:1 strip by
    ~23 deg forces a shrink to scale ~0.4 so the rotated bbox fits the
    canvas (that IS SafeRotate's contract) — ink survives scaled by
    ~scale^2, and borders stay the constant 0."""
    img = np.zeros((64, 256), dtype=np.uint8)
    img[24:40, 100:156] = 255
    angle = rng_for("k").uniform(-30, 30)  # same first draw the op makes
    rad = abs(np.deg2rad(angle))
    scale = min(
        256 / (256 * np.cos(rad) + 64 * np.sin(rad)),
        64 / (256 * np.sin(rad) + 64 * np.cos(rad)),
    )
    out = safe_rotate(img, rng_for("k"), limit=30)
    ink_ratio = (out > 128).sum() / (img > 128).sum()
    assert 0.5 * scale**2 < ink_ratio < 1.5 * scale**2
    assert out[0, 0] == 0 and out[-1, -1] == 0


def test_safe_rotate_zero_limit_is_identity():
    img = _img()
    assert np.array_equal(safe_rotate(img, rng_for("k"), limit=0.0), img)


def test_brightness_contrast_is_affine():
    img = _img()
    rng = rng_for("k")
    b = rng.uniform(-0.1, 0.1)
    c = rng.uniform(-0.2, 0.2)
    want = np.clip((img.astype(float) - 127.5) * (1 + c) + 127.5 + 255 * b + 0.5,
                   0, 255).astype(np.uint8)
    got = brightness_contrast(img, rng_for("k"))
    assert np.array_equal(got, want)


def test_augment_train_deterministic_and_canvas_shaped():
    img = _img(h=48, w=120)
    out1, ops1 = augment_train(img.copy(), key="img-7")
    out2, ops2 = augment_train(img.copy(), key="img-7")
    assert np.array_equal(out1, out2) and ops1 == ops2
    assert out1.shape == (64, 256)
    # the chain always ends with exactly one geometry op and one layout op
    assert sum(o in ("curve", "safe_rotate") for o in ops1) == 1
    assert sum(o in ("pad_random", "resize") for o in ops1) == 1


def test_augment_train_keys_differ():
    img = _img(h=48, w=120)
    outs = {augment_train(img.copy(), key=f"img-{i}")[0].tobytes() for i in range(8)}
    assert len(outs) > 1  # different keys -> different augmentations


def test_augment_stage_distributed_matches_local_and_partitioning(spark, corpus):
    """The Spark stage equals the local function per key, and the result
    is independent of partition layout (the keyed-determinism contract
    every training-data op in this engine honors)."""
    from vietnamese_ocr_spark.functions.augment import augment_train
    from vietnamese_ocr_spark.functions.imaging import png_decode
    from vietnamese_ocr_spark.operators.augment_stage import augment_media

    media = spark.read.parquet(corpus["media"]).limit(40)
    got = {
        r["media_ref"]: (bytes(r["png"]), r["ops"])
        for r in augment_media(media, seed=42).collect()
    }
    assert len(got) == 40
    # spot-check 5 against the single-process function
    local_media = {r["media_ref"]: bytes(r["png"]) for r in media.collect()}
    for ref in sorted(got)[:5]:
        img = png_decode(local_media[ref])
        out, applied = augment_train(img, key=ref, seed=42)
        from vietnamese_ocr_spark.functions.imaging import png_encode

        assert got[ref] == (png_encode(out), ",".join(applied)), ref
    # partition-layout invariance
    got8 = {
        r["media_ref"]: (bytes(r["png"]), r["ops"])
        for r in augment_media(media.repartition(8), seed=42).collect()
    }
    assert got8 == got
