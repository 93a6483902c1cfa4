"""Distributed BPE tokenizer training (operators/bpe.py) vs the classic
single-process implementation — merges and final vocabulary must match
exactly (deterministic tie-break: count desc, pair lexicographic)."""

from __future__ import annotations

from vietnamese_ocr_spark.operators.bpe import (
    bpe_train,
    bpe_train_py,
    bpe_vocab,
    word_frequencies,
)

TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wider wide wide wider widest",
    "low new wide lower newer",
]


def _docs(spark):
    return spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(TEXTS)], "doc_id string, text string"
    )


def test_merges_match_single_process(spark):
    want_merges, want_vocab = bpe_train_py(TEXTS, num_merges=12)
    got_merges, table = bpe_train(_docs(spark), num_merges=12)
    try:
        assert got_merges == want_merges
        got_vocab = {r["token"]: r["freq"] for r in bpe_vocab(table).collect()}
        assert got_vocab == want_vocab
    finally:
        table.unpersist()


def test_merges_learn_real_subwords(spark):
    merges, table = bpe_train(_docs(spark), num_merges=12)
    try:
        joined = {a + b for a, b in merges}
        # high-frequency stems/suffixes emerge
        assert any(tok.startswith("lo") for tok in joined)
        assert any("er" in tok for tok in joined)
    finally:
        table.unpersist()


def test_early_stop_on_min_frequency(spark):
    docs = spark.createDataFrame([("d0", "ab cd ef")], "doc_id string, text string")
    merges, table = bpe_train(docs, num_merges=50, min_pair_freq=2)
    try:
        want, _ = bpe_train_py(["ab cd ef"], num_merges=50, min_pair_freq=2)
        assert merges == want  # every pair unique -> stops immediately
        assert merges == []
    finally:
        table.unpersist()


def test_word_frequencies(spark):
    wf = {r["word"]: r["freq"] for r in word_frequencies(_docs(spark)).collect()}
    assert wf["low"] == 4 and wf["newer"] == 3 and wf["widest"] == 1


def test_segment_applies_merges_by_rank(spark):
    merges, table = bpe_train(_docs(spark), num_merges=12)
    table.unpersist()
    from vietnamese_ocr_spark.operators.bpe import bpe_segment, bpe_segment_word

    docs = _docs(spark)
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
           for r in bpe_segment(docs, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    for i, text in enumerate(TEXTS):
        want = [t for w in text.split(" ") if w for t in bpe_segment_word(w, ranks)]
        assert got[f"d{i}"] == (want, len(want)), f"d{i}"
    # round-trip: concatenating tokens (modulo the marker) restores text
    for i, text in enumerate(TEXTS):
        joined = "".join(got[f"d{i}"][0]).replace("</w>", " ").strip()
        assert joined == text


def test_segment_with_no_merges_is_characters(spark):
    from vietnamese_ocr_spark.operators.bpe import bpe_segment

    docs = spark.createDataFrame([("d0", "ab c")], "doc_id string, text string")
    (row,) = bpe_segment(docs, []).collect()
    assert list(row["tokens"]) == ["a", "b", "</w>", "c", "</w>"]
