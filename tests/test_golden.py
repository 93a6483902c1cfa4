"""Golden-file regression (SURVEY §5.5): committed fixture + expected
extraction, regenerated ONLY by the oracle. Pins the model semantics
(glyphs, preprocessing, decode rules) across rounds — a silent semantic
change would still pass oracle==Spark equality, but not this."""

from __future__ import annotations

import json
import os

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def test_oracle_reproduces_committed_golden():
    from vietnamese_ocr_spark.oracle import extract

    golden = extract(
        os.path.join(GOLDEN_DIR, "corpus", "documents.parquet"),
        os.path.join(GOLDEN_DIR, "corpus", "media.parquet"),
    )
    with open(os.path.join(GOLDEN_DIR, "extracted_golden.json"), encoding="utf-8") as f:
        want = json.load(f)
    got = {k: [list(s) for s in v] for k, v in golden.items()}
    assert got == want


def test_generator_reproduces_committed_corpus(tmp_path):
    """Same seed -> byte-identical documents/media parquet."""
    from vietnamese_ocr_spark.sources.fixtures import generate_corpus

    paths = generate_corpus(30, str(tmp_path / "re"), seed=42)
    for name in ("documents.parquet", "media.parquet", "labels.parquet"):
        a = os.path.join(GOLDEN_DIR, "corpus", name)
        with open(paths[name.split(".")[0]], "rb") as f1, open(a, "rb") as f2:
            assert f1.read() == f2.read(), name
