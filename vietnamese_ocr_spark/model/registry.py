"""String-keyed encoder-variant registry (reference API-surface parity).

The reference dispatches over 7 CNN/Swin backbones x 2 embedding types by
config string (reference src/model/model.py:80-114 `get_model` and :56-65
embed selection). With no obtainable checkpoint the variants carry no
distinguishable semantics (SURVEY §2.5: "one encoder suffices"), but the
EXTENSION POINT is real API surface: config names an encoder, the OCR
stage resolves it from the broadcast weights, and a new variant is one
`register_encoder` call — no pipeline edits.

Every builder returns the full weight dict (tensors + a `variant` tag);
the tag rides the .npz broadcast so an executor can assert it hydrated
the variant the driver configured.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

from .vocab import Vocabulary

_ENCODERS: dict[str, Callable[[Vocabulary | None], dict[str, np.ndarray]]] = {}

DEFAULT_ENCODER = "template_cosine"


def register_encoder(
    name: str,
) -> Callable[[Callable[[Vocabulary | None], dict[str, np.ndarray]]], Callable]:
    """Decorator: `@register_encoder("my_variant")` over a weight builder
    `(vocab | None) -> {tensor name: ndarray}`."""

    def deco(builder: Callable[[Vocabulary | None], dict[str, np.ndarray]]):
        _ENCODERS[name] = builder
        return builder

    return deco


def encoder_names() -> list[str]:
    return sorted(_ENCODERS)


def build_weights_variant(
    name: str = DEFAULT_ENCODER, vocab: Vocabulary | None = None
) -> dict[str, np.ndarray]:
    """Resolve a registered encoder by name and build its weights —
    the engine-side analog of the reference's get_model(config) dispatch.
    Unknown names list the registry (same UX as the reference's KeyError)."""
    try:
        builder = _ENCODERS[name]
    except KeyError:
        raise KeyError(
            f"unknown encoder variant {name!r}; registered: {encoder_names()}"
        ) from None
    weights = builder(vocab)
    weights["variant"] = np.array(name)
    return weights


@register_encoder("template_cosine")
def _template_cosine(vocab: Vocabulary | None = None) -> dict[str, np.ndarray]:
    """The round-1..3 default: glyph-template matched filters, cosine
    scoring (model/recognizer.py build_weights)."""
    from .recognizer import build_weights

    return build_weights(vocab)


@register_encoder("template_blur")
def _template_blur(vocab: Vocabulary | None = None) -> dict[str, np.ndarray]:
    """A second seeded variant proving the seam: the same matched-filter
    templates smoothed with a width-3 horizontal box blur (a cheap stand-
    in for a different backbone's receptive field). Deterministic; still
    recognizes clean renders exactly (test_registry asserts span equality
    against a single-process rerun under the SAME variant)."""
    from .recognizer import FEAT_DIM, _EPS, build_weights
    from ..functions.imaging import TARGET_H

    base = build_weights(vocab)
    w = base["w_out"].reshape(base["w_out"].shape[0], TARGET_H, -1).astype(np.float64)
    blurred = w.copy()
    blurred[:, :, 1:] += w[:, :, :-1]
    blurred[:, :, :-1] += w[:, :, 1:]
    blurred /= 3.0
    flat = blurred.reshape(-1, FEAT_DIM)
    norms = np.linalg.norm(flat, axis=1, keepdims=True) + _EPS
    base["w_out"] = (flat / norms).astype(np.float32)
    return base
