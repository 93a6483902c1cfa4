import numpy as np

from vietnamese_ocr_spark.functions.imaging import preprocess
from vietnamese_ocr_spark.model.glyphs import build_atlas, render_line
from vietnamese_ocr_spark.model.recognizer import (
    MAX_TOKENS,
    Recognizer,
    build_weights,
    weights_from_bytes,
    weights_to_bytes,
)
from vietnamese_ocr_spark.model.vocab import EOS, PAD, SOS, Vocabulary


def test_vocab_contract():
    # src/utils/vocab.py semantics: specials 0/1/2, chars from 3, sorted
    v = Vocabulary("cba")
    assert (SOS, EOS, PAD) == (0, 1, 2)
    assert v.letter_to_idx == {"a": 3, "b": 4, "c": 5}
    assert v.size == 6
    assert v.encode("ab") == [0, 3, 4, 1]
    assert v.decode([0, 3, 4, 2, 1]) == "ab"


def test_vocab_sorted_by_codepoint():
    v = Vocabulary()
    assert v.letters == sorted(v.letters)
    assert v.letters[0] == "0"  # digits sort before letters


def test_weights_roundtrip():
    w = build_weights()
    w2 = weights_from_bytes(weights_to_bytes(w))
    assert np.array_equal(w["w_out"], w2["w_out"])
    assert list(w["letters"]) == list(w2["letters"])


def _recognize_strings(texts, heights):
    vocab = Vocabulary()
    atlas = build_atlas(vocab)
    rec = Recognizer(build_weights(vocab))
    imgs = np.stack(
        [preprocess(render_line(t, h, atlas)) for t, h in zip(texts, heights)]
    )
    return rec.recognize(imgs)


def test_exact_recognition_all_heights():
    texts = ["xin", "chào", "việtnam123", "ỹỵự", "a" * 32]
    for h in (32, 64, 96, 128):
        got, _ = _recognize_strings(texts, [h] * len(texts))
        assert got == texts, f"height {h}"


def test_every_vocab_char_recognized():
    v = Vocabulary()
    # batch all chars as 1-char lines
    texts = list(v.letters)
    got, _ = _recognize_strings(texts, [64] * len(texts))
    assert got == texts


def test_blank_image_immediate_eos():
    got, hist = _recognize_strings([""], [64])
    assert got == [""]  # 'a' fallback is a pipeline projection, not model
    assert hist.sum() == 0


def test_decode_cap_flush_at_32():
    # >32 chars: the canvas clamps at 256px AND the decode caps at 32
    # (src/model/model.py:209,228-232 flush semantics)
    long = "b" * 40
    got, _ = _recognize_strings([long], [64])
    assert len(got[0]) == MAX_TOKENS


def test_batch_shape_independence():
    """Row results must not depend on batch composition (hard-point b)."""
    texts = ["một", "hai", "balốn", ""]
    solo = [_recognize_strings([t], [64])[0][0] for t in texts]
    batched, _ = _recognize_strings(texts, [64] * 4)
    assert solo == batched


def test_batch_shape_independence_bitwise_at_scale():
    """Texts AND histograms identical between batch=1 and odd batch splits.

    Guards the einsum(optimize=False) choice: BLAS gemm blocking varies
    with row count and was measured to produce ulp-divergent logits."""
    import numpy as np

    from vietnamese_ocr_spark.functions.imaging import preprocess
    from vietnamese_ocr_spark.model.glyphs import build_atlas, render_line
    from vietnamese_ocr_spark.model.recognizer import Recognizer, build_weights
    from vietnamese_ocr_spark.model.vocab import Vocabulary

    vocab = Vocabulary()
    atlas = build_atlas(vocab)
    rng = np.random.default_rng(9)
    letters = vocab.letters
    texts = [
        "".join(letters[i] for i in rng.integers(0, len(letters), rng.integers(0, 40)))
        for _ in range(120)
    ]
    heights = [int(h) for h in rng.choice([32, 64, 96, 128], size=len(texts))]
    imgs = np.stack(
        [preprocess(render_line(t, h, atlas)) for t, h in zip(texts, heights)]
    )
    rec = Recognizer(build_weights(vocab))
    full_t, full_h = rec.recognize(imgs)
    for size in (1, 7, 31):
        got_t, got_h = [], []
        for lo in range(0, len(imgs), size):
            t, h = rec.recognize(imgs[lo : lo + size])
            got_t.extend(t)
            got_h.append(h)
        assert got_t == full_t, f"texts diverge at batch size {size}"
        assert np.array_equal(np.concatenate(got_h), full_h), f"hist at {size}"


def test_early_exit_keeps_later_rows_decoding():
    # one blank row (exits at step 0) + one long row (runs all 32 steps)
    got, _ = _recognize_strings(["", "c" * 32], [64, 64])
    assert got[0] == ""
    assert got[1] == "c" * 32


def test_confidence_histogram_counts_tokens():
    got, hist = _recognize_strings(["xyv"], [64])
    assert hist.shape == (1, 10)
    assert hist.sum() == 3  # one confident bucket entry per emitted char
