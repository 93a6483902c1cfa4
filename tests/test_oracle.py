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
    """The seeded model genuinely reads the synthetic font: every
    single-line truth that fits the canvas (<=32 chars) round-trips
    exactly. (Multi-line media go through the detection stage whose band
    margins rescale the crop — deterministic but not template-exact;
    their contract is oracle==Spark + line-count preservation.)"""
    media = pq.read_table(corpus["media"]).to_pylist()
    rec = recognize_media([(m["media_ref"], m["png"]) for m in media])
    checked = 0
    for m in media:
        if len(m["truth"]) <= 32 and "\n" not in m["truth"]:
            want = m["truth"] if m["truth"] else "a"
            assert rec[m["media_ref"]] == want, m["media_ref"]
            checked += 1
    assert checked > 100


def test_multiline_media_line_count_preserved(corpus):
    """Detection must split a stacked payload into exactly its lines."""
    media = pq.read_table(corpus["media"]).to_pylist()
    multi = [m for m in media if "\n" in m["truth"]]
    assert multi, "corpus must contain multi-line media"
    rec = recognize_media([(m["media_ref"], m["png"]) for m in multi])
    for m in multi:
        got = rec[m["media_ref"]]
        assert got.count("\n") == m["truth"].count("\n"), m["media_ref"]
        for line in got.split("\n"):
            assert len(line) > 0


def test_dangling_media_ref_dropped(golden):
    """doc 7 references a payload absent from the media table: the media
    span is dropped (KeyError-drop, J1 semantics); the text span stays."""
    spans = golden["doc-00000007"]
    assert [s[0] for s in spans] == ["text"]
    assert all(s[2] != "img-dangling-ref" for s in spans)


def test_offsets_sorted(golden):
    for spans in golden.values():
        offs = [s[3] for s in spans]
        assert offs == sorted(offs)
