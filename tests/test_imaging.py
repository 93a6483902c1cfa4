import numpy as np
import pytest

from vietnamese_ocr_spark.functions.imaging import (
    TARGET_H,
    TARGET_W,
    autocontrast,
    center_pad,
    grayscale,
    invert,
    invert_rescale,
    png_decode,
    png_encode,
    preprocess,
    resize_bilinear,
)


def test_png_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 91), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png")


def test_autocontrast_stretches_and_is_idempotent_on_full_range():
    img = np.array([[50, 100], [150, 200]], dtype=np.uint8)
    out = autocontrast(img)
    assert out.min() == 0 and out.max() == 255
    full = np.array([[0, 255]], dtype=np.uint8)
    assert np.array_equal(autocontrast(full), full)


def test_autocontrast_constant_image_identity():
    img = np.full((4, 4), 128, dtype=np.uint8)
    assert np.array_equal(autocontrast(img), img)


def test_invert():
    img = np.array([[0, 255, 10]], dtype=np.uint8)
    assert np.array_equal(invert(img), [[255, 0, 245]])


def test_invert_rescale_width_clamp():
    # width min(256, round(64/H*W)) — transform.py:68 clamp semantics
    wide = np.zeros((64, 1000), dtype=np.uint8)
    assert invert_rescale(wide).shape == (64, 256)
    narrow = np.zeros((32, 50), dtype=np.uint8)
    assert invert_rescale(narrow).shape == (64, 100)  # round(64/32*50)


def test_center_pad_positions():
    img = np.full((64, 100), 7, dtype=np.uint8)
    out = center_pad(img)
    assert out.shape == (TARGET_H, TARGET_W)
    left = (TARGET_W - 100) // 2
    assert (out[:, left : left + 100] == 7).all()
    assert (out[:, :left] == 0).all()


def test_resize_identity():
    img = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64) % 251
    assert np.array_equal(resize_bilinear(img, 64, 64), img)


def test_resize_exact_halving_of_doubled_rows():
    base = np.random.default_rng(1).integers(0, 256, (32, 32), dtype=np.uint8)
    doubled = np.kron(base, np.ones((2, 2), dtype=np.uint8))
    # bilinear downscale by exactly 2 with half-pixel centers averages each
    # 2x2 block of identical values -> exact recovery
    assert np.array_equal(resize_bilinear(doubled, 32, 32), base)


def test_grayscale_bt601():
    rgb = np.zeros((1, 1, 3), dtype=np.uint8)
    rgb[0, 0] = [255, 0, 0]
    assert grayscale(rgb)[0, 0] == 76  # 255*0.299 truncated-ish via clip


def test_preprocess_shape_and_range():
    img = np.random.default_rng(2).integers(0, 256, (48, 120), dtype=np.uint8)
    out = preprocess(img)
    assert out.shape == (TARGET_H, TARGET_W)
    assert out.dtype == np.uint8
