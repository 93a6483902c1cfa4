"""Property/randomized tests (SURVEY §5.4) — pure Python, Hypothesis-driven."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vietnamese_ocr_spark.functions.imaging import png_decode, png_encode, preprocess
from vietnamese_ocr_spark.functions.text import normalize_py
from vietnamese_ocr_spark.model.detector import detect_line_bands
from vietnamese_ocr_spark.model.glyphs import build_atlas, render_line, render_multiline
from vietnamese_ocr_spark.model.recognizer import Recognizer, build_weights
from vietnamese_ocr_spark.model.vocab import Vocabulary

_V = Vocabulary()
_ATLAS = build_atlas(_V)
_REC = Recognizer(build_weights(_V))

letters = st.sampled_from(_V.letters)
texts = st.text(alphabet=letters, min_size=0, max_size=32)
words = st.text(alphabet=st.sampled_from("abcdefgh"), min_size=1, max_size=8)


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 120), st.integers(1, 300), st.integers(0, 2**31 - 1))
def test_png_roundtrip_property(h, w, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


@settings(max_examples=60, deadline=None)
@given(texts)
def test_vocab_roundtrip_property(t):
    assert _V.decode(_V.encode(t)) == t


@settings(max_examples=60, deadline=None)
@given(st.lists(words, min_size=1, max_size=10), st.integers(0, 3))
def test_normalize_strips_boilerplate_property(ws, kind):
    content = " ".join(ws)
    wrappers = [
        f"<nav>menu</nav>\n{content}",
        f"<header>h</header> {content} <footer>f</footer>",
        f"<p>{content}</p>",
        f"<script>var x=1;</script>\n\n{content}\n",
    ]
    out = normalize_py(wrappers[kind])
    assert out == content
    # idempotence
    assert normalize_py(out) == out


@settings(max_examples=30, deadline=None)
@given(texts.filter(lambda t: len(t) > 0), st.sampled_from([32, 64, 96, 128]))
def test_recognizer_reads_any_vocab_string(t, h):
    img = preprocess(render_line(t, h, _ATLAS))
    got, _ = _REC.recognize(img[None])
    assert got[0] == t


@settings(max_examples=30, deadline=None)
@given(st.lists(texts.filter(lambda t: 1 <= len(t) <= 16), min_size=1, max_size=5))
def test_detector_band_count_equals_lines(lines):
    img = render_multiline(lines, 64, _ATLAS)
    assert len(detect_line_bands(img)) == len(lines)
