import pyarrow.parquet as pq

from vietnamese_ocr_spark.functions.text import normalize_py
from vietnamese_ocr_spark.oracle import recognize_media


def test_normalize_strips_boilerplate():
    raw = "<nav>home about</nav>\n<p>xin chào</p>\n<footer>copyright</footer>"
    assert normalize_py(raw) == "xin chào"


def test_normalize_unwraps_plain_tags_and_collapses_ws():
    assert normalize_py("<p>a   b</p>\n\n c") == "a b c"


def test_normalize_empty_after_strip():
    assert normalize_py("<nav>only boilerplate</nav>") == ""


def test_golden_edge_docs(corpus, golden):
    assert golden["doc-00000000"] == []  # empty doc survives
    # empty recognition -> literal 'a' (src/utils/inference.py:108-110)
    assert golden["doc-00000001"] == [("media", "a", "img-00000000", 4)]
    # decode cap: 40-char truth -> exactly 32 recognized chars
    assert len(golden["doc-00000002"][0][1]) == 32


def test_duplicate_media_ref_same_text(golden):
    # doc 3 reuses doc 2's media_ref -> identical recognized text
    d2 = {s[2]: s[1] for s in golden["doc-00000002"]}
    d3 = {s[2]: s[1] for s in golden["doc-00000003"] if s[0] == "media"}
    for ref, text in d3.items():
        assert d2[ref] == text


def test_oracle_matches_truth_for_short_lines(corpus, golden):
    """The seeded model genuinely reads the synthetic font: every truth
    string that fits the canvas (<=32 chars) must round-trip exactly."""
    media = pq.read_table(corpus["media"]).to_pylist()
    rec = recognize_media([(m["media_ref"], m["png"]) for m in media])
    checked = 0
    for m in media:
        if len(m["truth"]) <= 32:
            want = m["truth"] if m["truth"] else "a"
            assert rec[m["media_ref"]] == want, m["media_ref"]
            checked += 1
    assert checked > 100


def test_offsets_sorted(golden):
    for spans in golden.values():
        offs = [s[3] for s in spans]
        assert offs == sorted(offs)
