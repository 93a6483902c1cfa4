"""Densitometric main-content extraction (functions/text.py):
Spark Column chain == Python mirror, and the heuristic actually
separates content from boilerplate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vietnamese_ocr_spark.functions.text import (
    extract_main_content,
    extract_main_content_py,
)

PAGES = [
    # nav/footer chrome dropped by tag, link-farm block dropped by density,
    # short cruft dropped by length, long link-sparse paragraphs kept
    (
        "<nav>home about contact</nav>"
        "<div>The quick brown fox jumps over the lazy dog near the river bank.</div>"
        '<div><a href="/a">one</a> <a href="/b">two</a> <a href="/c">three</a></div>'
        "<p>ok</p>"
        "<p>A second long paragraph with plenty of plain prose and "
        'one inline <a href="/x">link</a> inside it somewhere.</p>'
        "<footer>copyright 2024</footer>"
    ),
    "<p>no markup at all but a perfectly long plain sentence here</p>",
    "<div>short</div>",
    "",
    # anchor spanning most of a long block -> dropped by link density
    '<p><a href="/l">' + "click me " * 10 + "</a> tail</p>",
]


def test_main_content_matches_python_mirror(spark):
    df = spark.createDataFrame([(i, p) for i, p in enumerate(PAGES)], "i int, html string")
    got = {
        r["i"]: r["main"]
        for r in df.select("i", extract_main_content(F.col("html")).alias("main")).collect()
    }
    for i, p in enumerate(PAGES):
        assert got[i] == extract_main_content_py(p), f"page {i}"


def test_main_content_classification():
    out = extract_main_content_py(PAGES[0])
    assert "quick brown fox" in out
    assert "second long paragraph" in out
    assert "link" in out  # inline anchor text inside content survives
    assert "home about contact" not in out  # nav chrome
    assert "two" not in out.split() and "three" not in out.split()  # link farm
    assert "ok" not in out.split()  # too short
    assert "copyright" not in out  # footer
    assert extract_main_content_py(PAGES[4]) == ""  # link-dense block


@pytest.mark.parametrize("html", PAGES)
def test_main_content_idempotent(html):
    once = extract_main_content_py(html)
    assert extract_main_content_py(f"<p>{once}</p>") == (
        once if len(once) >= 20 else ""
    )
