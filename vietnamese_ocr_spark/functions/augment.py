"""Deterministic training-augmentation suite (reference
src/utils/transform.py:10-43 Transform(training=True) chain and
:91-124 Curve): GridDistortion, Defocus, PixelDropout, GaussNoise,
BrightnessContrast, SafeRotate, Curve, random-position pad — the ops
the round-2 verdict listed as the remaining P6 scope cut.

The reference draws every parameter from process-global RNG state
(np.random.uniform), which is irreproducible across workers, retries,
and cluster sizes. Here every draw comes from a per-image
`default_rng(md5(seed:key))` stream, so a given (seed, media_ref)
always produces the identical augmented image on any executor — the
same keyed-determinism contract as operators/reshuffle.py and
operators/sampling.py. Pure NumPy on gray8 arrays (cv2/albumentations
are not in the runtime); geometry ops use one shared bilinear remap.

ImageCompression(95) is a REAL JPEG round-trip through the pure-NumPy
baseline codec (functions/jpeg.py) — encode at the drawn quality, decode,
keep the lossy result, exactly what albumentations does via cv2.
"""

from __future__ import annotations

import hashlib

import numpy as np


def rng_for(key: str, seed: int = 42) -> np.random.Generator:
    """Keyed RNG stream: identical draws for (seed, key) everywhere."""
    digest = hashlib.md5(f"{seed}:{key}".encode("utf-8")).hexdigest()[:16]
    return np.random.default_rng(int(digest, 16))


def bilinear_remap(img: np.ndarray, xmap: np.ndarray, ymap: np.ndarray) -> np.ndarray:
    """Sample img at float coords (xmap, ymap); outside -> 0 (the
    reference's BORDER_CONSTANT value=0). Vectorized gather, no loops."""
    h, w = img.shape
    x0 = np.floor(xmap).astype(np.int64)
    y0 = np.floor(ymap).astype(np.int64)
    fx = xmap - x0
    fy = ymap - y0

    def _at(yy, xx):
        inside = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        vals = img[np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)].astype(np.float64)
        return np.where(inside, vals, 0.0)

    top = _at(y0, x0) * (1 - fx) + _at(y0, x0 + 1) * fx
    bot = _at(y0 + 1, x0) * (1 - fx) + _at(y0 + 1, x0 + 1) * fx
    return np.clip(top * (1 - fy) + bot * fy + 0.5, 0, 255).astype(np.uint8)


def grid_distortion(img: np.ndarray, rng: np.random.Generator,
                    num_steps: int = 5, distort_limit: float = 0.1) -> np.ndarray:
    """A.GridDistortion(distort_limit=0.1): each grid cell's width/height
    is scaled by 1+U(-limit, limit); the stretched axes are renormalized
    to the full span and sampled back bilinearly."""
    h, w = img.shape

    def _axis(n: int) -> np.ndarray:
        steps = 1.0 + rng.uniform(-distort_limit, distort_limit, num_steps)
        # cumulative cell edges, renormalized to [0, n-1]
        edges = np.concatenate([[0.0], np.cumsum(steps)])
        edges = edges / edges[-1] * (n - 1)
        # map output coordinate -> input coordinate piecewise-linearly
        out_edges = np.linspace(0, n - 1, num_steps + 1)
        return np.interp(np.arange(n), out_edges, edges)

    xs = _axis(w)
    ys = _axis(h)
    xmap, ymap = np.meshgrid(xs, ys)
    return bilinear_remap(img, xmap, ymap)


def _disc_kernel(radius: int) -> np.ndarray:
    r = int(radius)
    y, x = np.mgrid[-r : r + 1, -r : r + 1]
    k = ((x * x + y * y) <= r * r).astype(np.float64)
    return k / k.sum()


def defocus(img: np.ndarray, rng: np.random.Generator,
            radius: tuple[int, int] = (1, 3)) -> np.ndarray:
    """A.Defocus(radius=(1,3)): disc-kernel mean blur. FFT convolution —
    exact, loop-free, and cheap at 64x256."""
    r = int(rng.integers(radius[0], radius[1] + 1))
    k = _disc_kernel(r)
    h, w = img.shape
    kh, kw = k.shape
    fh, fw = h + kh - 1, w + kw - 1
    spec = np.fft.rfft2(img.astype(np.float64), (fh, fw)) * np.fft.rfft2(k, (fh, fw))
    full = np.fft.irfft2(spec, (fh, fw))
    out = full[kh // 2 : kh // 2 + h, kw // 2 : kw // 2 + w]
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def pixel_dropout(img: np.ndarray, rng: np.random.Generator,
                  dropout_prob: float = 0.01, drop_value: int = 255) -> np.ndarray:
    """A.PixelDropout(dropout_prob=0.01, drop_value=255)."""
    mask = rng.random(img.shape) < dropout_prob
    out = img.copy()
    out[mask] = drop_value
    return out


def gauss_noise(img: np.ndarray, rng: np.random.Generator,
                var_limit: float = 10.0) -> np.ndarray:
    """A.GaussNoise(10): additive gaussian noise, variance U(0, 10)."""
    sigma = float(np.sqrt(rng.uniform(0, var_limit)))
    noise = rng.normal(0.0, sigma, img.shape)
    return np.clip(img.astype(np.float64) + noise + 0.5, 0, 255).astype(np.uint8)


def brightness_contrast(img: np.ndarray, rng: np.random.Generator,
                        brightness_limit: float = 0.1,
                        contrast_limit: float = 0.2) -> np.ndarray:
    """A.RandomBrightnessContrast(.1, .2): out = (img - 127.5)*(1+c)
    + 127.5 + 255*b with b ~ U(-.1,.1), c ~ U(-.2,.2)."""
    b = rng.uniform(-brightness_limit, brightness_limit)
    c = rng.uniform(-contrast_limit, contrast_limit)
    out = (img.astype(np.float64) - 127.5) * (1.0 + c) + 127.5 + 255.0 * b
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def jpeg_compression(img: np.ndarray, rng: np.random.Generator,
                     quality: int = 95) -> np.ndarray:
    """A.ImageCompression(95): real lossy JPEG round-trip via the
    pure-NumPy baseline codec (functions/jpeg.py). albumentations draws
    the quality from U(quality_lower, 100); we keep the same single rng
    draw (stream-position compatible with the round-3 stub) and map it
    to an integer quality in [quality, 100]."""
    from .jpeg import jpeg_decode, jpeg_encode

    q = quality + int(rng.uniform() * (100 - quality + 1))
    return jpeg_decode(jpeg_encode(img, quality=min(q, 100)))


def safe_rotate(img: np.ndarray, rng: np.random.Generator,
                limit: float = 30.0) -> np.ndarray:
    """A.SafeRotate(limit=30, border constant 0): rotate by U(-30, 30)
    degrees about the center, scaled down so the rotated frame stays
    fully inside the canvas (that's the 'safe' part)."""
    angle = float(rng.uniform(-limit, limit))
    h, w = img.shape
    rad = np.deg2rad(angle)
    cos, sin = abs(np.cos(rad)), abs(np.sin(rad))
    # scale so the rotated bounding box fits the original canvas
    scale = min(w / (w * cos + h * sin), h / (w * sin + h * cos))
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    # inverse map: output pixel -> input pixel (rotate by -angle, unscale)
    dx, dy = xx - cx, yy - cy
    c, s = np.cos(rad), np.sin(rad)
    xmap = (dx * c + dy * s) / scale + cx
    ymap = (-dx * s + dy * c) / scale + cy
    return bilinear_remap(img, xmap, ymap)


def curve(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """The reference's Curve warp (transform.py:91-124): normalized
    coords get x += sin(2y)*(+/-0.1), y += cos(2x)*(+/-U(0.2, 0.4)),
    signs each drawn with p=0.5, then bilinear remap."""
    h, w = img.shape
    xx, yy = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    xn = (xx - w / 2) / (w / 2)
    yn = (yy - h / 2) / (h / 2)
    sx = 0.1 if rng.uniform() > 0.5 else -0.1
    xn = xn + np.sin(yn * 2) * sx
    amp = rng.uniform(0.2, 0.4)
    sy = -amp if rng.uniform() > 0.5 else amp
    yn = yn + np.cos(xn * 2) * sy
    return bilinear_remap(img, xn * (w / 2) + w / 2, yn * (h / 2) + h / 2)


def random_pad(img: np.ndarray, rng: np.random.Generator,
               out_h: int = 64, out_w: int = 256) -> np.ndarray:
    """A.PadIfNeeded(position=RANDOM, border constant 0): place the
    image at a keyed-random offset inside the canvas (vs the inference
    path's deterministic center pad)."""
    h, w = img.shape
    if h >= out_h and w >= out_w:
        return img[:out_h, :out_w]
    canvas = np.zeros((max(out_h, h), max(out_w, w)), dtype=np.uint8)
    top = int(rng.integers(0, canvas.shape[0] - h + 1))
    left = int(rng.integers(0, canvas.shape[1] - w + 1))
    canvas[top : top + h, left : left + w] = img
    return canvas[:out_h, :out_w]


def augment_train(img: np.ndarray, key: str, seed: int = 42,
                  out_h: int = 64, out_w: int = 256) -> tuple[np.ndarray, list[str]]:
    """The full training chain in the reference's order, every p=0.5
    gate and parameter drawn from the keyed stream; returns the
    augmented canvas and the list of ops that fired (the audit trail a
    reproducible data pipeline keeps). Mirrors transform.py:22-43:
    GridDistortion -> Defocus -> PixelDropout -> GaussNoise ->
    BrightnessContrast -> ImageCompression -> OneOf(Curve | SafeRotate)
    and OneOf(pad-random | resize) in either order."""
    rng = rng_for(key, seed)
    applied: list[str] = []

    def _maybe(name, fn, p=0.5):
        nonlocal img
        if rng.uniform() < p:
            img = fn(img, rng)
            applied.append(name)

    _maybe("grid_distortion", grid_distortion)
    _maybe("defocus", defocus)
    _maybe("pixel_dropout", pixel_dropout)
    _maybe("gauss_noise", gauss_noise)
    _maybe("brightness_contrast", brightness_contrast)
    _maybe("jpeg_compression", jpeg_compression)

    def _curve_or_rotate():
        nonlocal img
        if rng.uniform() > 0.5:
            img = curve(img, rng)
            applied.append("curve")
        else:
            img = safe_rotate(img, rng)
            applied.append("safe_rotate")

    def _pad_or_resize():
        nonlocal img
        if rng.uniform() > 0.5:
            img = random_pad(img, rng, out_h, out_w)
            applied.append("pad_random")
        else:
            from .imaging import resize_bilinear

            img = resize_bilinear(img, out_h, out_w)
            applied.append("resize")

    if rng.uniform() > 0.5:
        _curve_or_rotate()
        _pad_or_resize()
    else:
        _pad_or_resize()
        _curve_or_rotate()
    # guarantee the canvas shape regardless of branch order
    if img.shape != (out_h, out_w):
        canvas = np.zeros((out_h, out_w), dtype=np.uint8)
        canvas[: min(out_h, img.shape[0]), : min(out_w, img.shape[1])] = img[
            :out_h, :out_w
        ]
        img = canvas
    return img, applied
