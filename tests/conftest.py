from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vietnamese_ocr_spark.sources.fixtures import generate_corpus  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    from vietnamese_ocr_spark.config import get_spark

    s = get_spark("pytest", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus(tmp_path_factory):
    """Deterministic 200-doc corpus (FIXTURES.md unit-test size)."""
    out = tmp_path_factory.mktemp("corpus")
    return generate_corpus(200, str(out))


@pytest.fixture(scope="session")
def golden(corpus):
    from vietnamese_ocr_spark.oracle import extract

    return extract(corpus["documents"], corpus["media"])
