"""The --py-files zip must be importable WITHOUT the repo on sys.path —
exactly what executors see under spark-submit --py-files."""

from __future__ import annotations

import subprocess
import sys

from vietnamese_ocr_spark.packaging import build_pyfiles_zip

PROBE = """
import sys
sys.path = [p for p in sys.path if 'repo' not in p]  # drop the repo checkout
sys.path.insert(0, sys.argv[1])                      # the zip, like --py-files
import vietnamese_ocr_spark
from vietnamese_ocr_spark.functions.text import normalize_py
from vietnamese_ocr_spark.model.recognizer import build_weights
from vietnamese_ocr_spark.operators import dedup, sampling, similarity, textstats
assert normalize_py("<p>a  b</p>") == "a b"
assert build_weights()["w_out"].shape[0] > 3
print("ZIP_IMPORT_OK")
"""


def test_pyfiles_zip_imports_standalone(tmp_path):
    zip_path = build_pyfiles_zip(str(tmp_path / "pkg.zip"))
    out = subprocess.run(
        [sys.executable, "-c", PROBE, zip_path],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo root
        check=True,
    )
    assert "ZIP_IMPORT_OK" in out.stdout
