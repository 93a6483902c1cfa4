"""Baseline JPEG codec (functions/jpeg.py): round-trips, spec details,
determinism. Closes the round-3 'ImageCompression is an identity stub'
partial — the reference's PIL/cv2 ingestion (src/utils/inference.py:125,
src/utils/dataloader.py:44) accepts JPEG, and A.ImageCompression(95) is a
real JPEG round-trip."""

from __future__ import annotations

import numpy as np
import pytest

from vietnamese_ocr_spark.functions.jpeg import jpeg_decode, jpeg_encode


def _gradient(h: int = 48, w: int = 80) -> np.ndarray:
    return (np.add.outer(np.arange(h) * 2, np.arange(w)) % 256).astype(np.uint8)


def _mae(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.abs(a.astype(np.int64) - b.astype(np.int64)).mean())


def test_gray_q100_is_near_lossless():
    """quality=100 -> all quant steps 1 -> only DCT coefficient rounding
    remains: at most +/-1 per pixel, exact on smooth content."""
    g = _gradient()
    assert np.array_equal(jpeg_decode(jpeg_encode(g, 100)), g)
    noise = np.random.default_rng(9).integers(0, 256, (40, 56), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(noise, 100))
    assert np.abs(out.astype(int) - noise.astype(int)).max() <= 1


def test_gray_q90_is_close():
    g = _gradient()
    out = jpeg_decode(jpeg_encode(g, 90))
    assert out.shape == g.shape and out.dtype == np.uint8
    assert _mae(out, g) < 1.0


def test_text_like_image_survives_q95():
    """Binary ink-on-paper content (the OCR case): ringing stays small
    enough that thresholded content is preserved."""
    t = np.zeros((64, 200), np.uint8)
    t[20:40, 30:180] = 255
    out = jpeg_decode(jpeg_encode(t, 95))
    assert _mae(out, t) < 4.0
    assert ((out > 128) == (t > 128)).mean() > 0.995


def test_rgb_444_and_420_roundtrip():
    g = _gradient()
    c = np.stack([g, np.roll(g, 7, axis=1), 255 - g], axis=-1)
    d444 = jpeg_decode(jpeg_encode(c, 90, subsample="444"))
    d420 = jpeg_decode(jpeg_encode(c, 90, subsample="420"))
    assert d444.shape == c.shape and d420.shape == c.shape
    assert _mae(d444, c) < 4.0
    assert _mae(d420, c) < 8.0  # subsampled chroma loses more, by design


def test_odd_dimensions_crop_back():
    """Non-multiple-of-8 (and of-16 for 4:2:0) frames pad internally but
    decode to the exact original dimensions."""
    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (7, 9), (17, 33), (64, 100)]:
        g = (rng.integers(0, 256, (h, w)) // 16 * 16).astype(np.uint8)
        assert jpeg_decode(jpeg_encode(g, 95)).shape == (h, w)
        c = np.repeat(g[:, :, None], 3, axis=2)
        assert jpeg_decode(jpeg_encode(c, 95, subsample="420")).shape == (h, w, 3)


def test_restart_markers_roundtrip():
    """DRI + RSTn path: encoder emits restarts, decoder resyncs and
    resets DC predictors — the parallel-encoder interop shape."""
    g = _gradient(64, 128)
    enc = jpeg_encode(g, 90, restart_interval=3)
    assert b"\xff\xdd" in enc  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in enc for i in range(8))
    plain = jpeg_decode(jpeg_encode(g, 90))
    assert np.array_equal(jpeg_decode(enc), plain)


def test_deterministic_bytes():
    g = _gradient()
    assert jpeg_encode(g, 80) == jpeg_encode(g, 80)
    c = np.stack([g, g, g], axis=-1)
    assert jpeg_encode(c, 80, subsample="420") == jpeg_encode(c, 80, subsample="420")


def test_quality_monotone_size():
    g = (np.random.default_rng(1).integers(0, 256, (64, 64))).astype(np.uint8)
    sizes = [len(jpeg_encode(g, q)) for q in (10, 50, 90, 100)]
    assert sizes == sorted(sizes)


def test_rejects_malformed_and_garbage():
    with pytest.raises(ValueError):
        jpeg_decode(b"\x89PNG\r\n\x1a\n")
    # splicing SOF2 over a BASELINE stream makes the full-spectral scan
    # illegal as a progressive DC scan — must be rejected, not mis-decoded
    enc = bytearray(jpeg_encode(_gradient(), 80))
    enc[enc.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        jpeg_decode(bytes(enc))
    # lossless (SOF3) and arithmetic (SOF9) remain unsupported
    enc2 = bytearray(jpeg_encode(_gradient(), 80))
    enc2[enc2.index(b"\xff\xc0") + 1] = 0xC3
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode(bytes(enc2))
    with pytest.raises(ValueError):
        jpeg_decode(jpeg_encode(_gradient(), 80)[:40])  # truncated


# -- progressive (SOF2): spectral selection + successive approximation -------

def test_progressive_equals_baseline_exactly():
    """The progressive scan script delivers the SAME quantized
    coefficients as the baseline stream, so decode must be pixel-
    identical — over dims (incl. non-multiples of 8/16), qualities,
    subsampling, and content classes."""
    rng = np.random.default_rng(3)
    for h, w in [(48, 80), (17, 33), (7, 9), (1, 1), (31, 257)]:
        g = rng.integers(0, 256, (h, w), dtype=np.uint8)
        for q in (30, 85, 100):
            assert np.array_equal(
                jpeg_decode(jpeg_encode(g, q)),
                jpeg_decode(jpeg_encode(g, q, progressive=True)),
            ), (h, w, q)
        c = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for sub in ("444", "420"):
            assert np.array_equal(
                jpeg_decode(jpeg_encode(c, 70, subsample=sub)),
                jpeg_decode(jpeg_encode(c, 70, subsample=sub, progressive=True)),
            ), (h, w, sub)
    t = np.zeros((64, 200), np.uint8)
    t[20:40, 30:180] = 255
    assert np.array_equal(
        jpeg_decode(jpeg_encode(t, 95)),
        jpeg_decode(jpeg_encode(t, 95, progressive=True)),
    )


def test_progressive_stream_structure():
    g = _gradient()
    enc = jpeg_encode(g, 85, progressive=True)
    assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc  # SOF2, no SOF0
    assert enc.count(b"\xff\xda") == 6  # gray scan script: 6 scans
    c = np.stack([g, g, g], axis=-1)
    enc3 = jpeg_encode(c, 85, subsample="420", progressive=True)
    assert enc3.count(b"\xff\xda") == 10  # color scan script: 10 scans
    assert jpeg_encode(g, 85, progressive=True) == jpeg_encode(g, 85, progressive=True)


def test_progressive_through_decode_image_seam():
    from vietnamese_ocr_spark.functions.imaging import decode_image

    g = _gradient()
    out = decode_image(jpeg_encode(g, 100, progressive=True))
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 1


def test_progressive_rejects_restart_interval():
    with pytest.raises(ValueError, match="restart"):
        jpeg_encode(_gradient(), 80, restart_interval=4, progressive=True)
