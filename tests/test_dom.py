"""DOM-tree main-content extraction (functions/dom.py) — the tree-aware
complement to the flat densitometric extractor, for the north_rule's
"DOM heuristics" leg."""

from __future__ import annotations

from vietnamese_ocr_spark.functions.dom import dom_main_content, parse_html
from vietnamese_ocr_spark.functions.text import extract_main_content_py

ARTICLE = """
<html><body>
<nav>home about contact login and lots of nav text here</nav>
<div class="content">
  <nav>breadcrumb nested inside content div should vanish entirely</nav>
  <p>This is the real article body with plenty of meaningful text.</p>
  <p>Second paragraph also long enough to keep around for sure.</p>
  <div class="links"><a href="x">link one</a> <a href="y">link two</a> <a>three</a></div>
</div>
<footer>copyright 2026 example corp footer text</footer>
</body></html>"""


def test_keeps_content_drops_chrome_and_link_lists():
    got = dom_main_content(ARTICLE)
    assert "real article body" in got and "Second paragraph" in got
    assert "home about" not in got and "copyright" not in got
    assert "link one" not in got  # link-dense block dropped by density


def test_tree_advantage_over_flat_extractor():
    """Two structural blind spots of the flat regex extractor, both
    handled by the tree: (a) chrome marked by ATTRIBUTE
    (role=navigation) rather than tag name; (b) nested same-name tags,
    where the non-greedy <nav>.*?</nav> drop stops at the INNER closer
    and leaks the outer nav's tail. This differential is the reason the
    DOM variant exists."""
    html_attr = ('<div role="navigation">menu menu menu menu menu menu</div>'
                 '<p>actual body text that is long enough to keep</p>')
    tree = dom_main_content(html_attr)
    flat = extract_main_content_py(html_attr)
    assert "menu" not in tree and "actual body text" in tree
    assert "menu" in flat  # attribute-blind

    html_nested = ('<nav>outer menu chrome text <nav>inner</nav>'
                   ' trailing chrome that leaks from the outer nav element</nav>'
                   '<p>actual body text that is long enough to keep</p>')
    tree2 = dom_main_content(html_nested)
    flat2 = extract_main_content_py(html_nested)
    assert "trailing chrome" not in tree2 and "actual body text" in tree2
    assert "trailing chrome" in flat2  # non-greedy drop leaks the tail


def test_role_navigation_attribute_dropped():
    html = ('<div role="navigation">menu items everywhere in this long div</div>'
            '<p>actual content of reasonable length here</p>')
    got = dom_main_content(html)
    assert got == "actual content of reasonable length here"


def test_tolerates_tag_soup():
    html = ("<p>unclosed paragraph with enough text to pass the gate"
            "<div>another block of sufficient length here</p></div></span><b>")
    got = dom_main_content(html)
    assert "unclosed paragraph" in got and "another block" in got


def test_containers_never_duplicate_text():
    got = dom_main_content(ARTICLE)
    assert got.count("real article body") == 1


def test_parse_html_shape():
    root = parse_html("<div><p>x</p><br><img src='y'></div>")
    (div,) = root.children
    assert [c.tag for c in div.children] == ["p", "br", "img"]


def test_spark_stage_matches_single_process(spark):
    from vietnamese_ocr_spark.operators.textstats import dom_main_content_stage

    rows = [
        ("d0", ARTICLE),
        ("d1", "<p>plain sufficiently long paragraph of text</p>"),
        ("d2", "no markup at all but still long enough to keep"),
        ("d3", "<nav>only nav</nav>"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r["main_text"] for r in dom_main_content_stage(docs).collect()}
    assert got == {d: dom_main_content(t) for d, t in rows}
