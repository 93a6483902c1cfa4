"""Thin smoke tests for the round-3 CLI surfaces (explain, maintain,
augment are API-tested elsewhere; these pin the argparse wiring)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_explain_cli_prints_physical_plan():
    out = subprocess.run(
        [sys.executable, "-m", "vietnamese_ocr_spark", "explain",
         "--query", "dedup_exact", "--sf", "/root/testdata/sf0.001",
         "--master", "local[2]"],
        capture_output=True, text=True, cwd=REPO, timeout=180,
    )
    assert out.returncode == 0, out.stderr[-800:]
    assert "Physical Plan" in out.stdout
    assert "HashAggregate" in out.stdout  # the dedup digest agg


def test_explain_cli_rejects_unknown_query():
    out = subprocess.run(
        [sys.executable, "-m", "vietnamese_ocr_spark", "explain",
         "--query", "definitely_not_a_query"],
        capture_output=True, text=True, cwd=REPO, timeout=60,
    )
    assert out.returncode == 1
    assert "unknown query" in out.stderr
