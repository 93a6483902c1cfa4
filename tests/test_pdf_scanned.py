"""Scanned-PDF OCR (round-5): image XObjects route through the SAME
recognition stage as any other media span — a scanned PDF extracts via
OCR, a text PDF via layout parse, through one pipeline."""

from __future__ import annotations

import os

import numpy as np

from vietnamese_ocr_spark.functions.imaging import decode_image
from vietnamese_ocr_spark.functions.pdf import (
    pdf_encode,
    pdf_encode_scanned,
    pdf_page_images,
)
from vietnamese_ocr_spark.model.glyphs import build_atlas, render_line
from vietnamese_ocr_spark.model.vocab import Vocabulary


def _atlas():
    return build_atlas(Vocabulary())


def test_page_images_dct_and_flate_roundtrip():
    img = render_line("xinchao", 64, _atlas())
    # DCTDecode: the payload IS a JPEG container; q90 is near the source
    got = pdf_page_images(pdf_encode_scanned([img, 255 - img]))
    assert [(r["page"], r["name"]) for r in got] == [(0, "/Im1"), (1, "/Im1")]
    dec = decode_image(got[0]["payload"])
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 12
    # Flate raw bitmap: exact, re-wrapped as PNG
    got = pdf_page_images(pdf_encode_scanned([img], raw_flate=True))
    assert np.array_equal(decode_image(got[0]["payload"]), img)


def test_text_pdf_has_no_images():
    data = pdf_encode([[(72.0, 700.0, 11.0, "plain text page")]])
    assert pdf_page_images(data) == []


def test_pdf_doc_interleaves_text_and_media_spans():
    from vietnamese_ocr_spark.sources.pdf_folder import _pdf_doc

    img = render_line("xin", 64, _atlas())
    spans, media = _pdf_doc("scan.pdf", pdf_encode_scanned([img], raw_flate=True))
    assert [s["kind"] for s in spans] == ["media"]
    assert spans[0]["media_ref"] == "scan.pdf#p0/Im1"
    assert len(media) == 1 and media[0]["media_ref"] == "scan.pdf#p0/Im1"

    tspans, tmedia = _pdf_doc(
        "text.pdf", pdf_encode([[(72.0, 700.0, 11.0, "hello layout")]])
    )
    assert [s["kind"] for s in tspans] == ["text"] and tmedia == []

    # corrupt: quarantined as spans=[]
    assert _pdf_doc("bad.pdf", b"%PDF-1.4 garbage") == ([], [])


def test_scanned_pdf_folder_ocrs_end_to_end(spark, tmp_path):
    """Directory with a scanned PDF, a text PDF, and a mixed two-page
    scan -> extract_df: scanned pages recognize to their exact rendered
    strings, text pages layout-parse, in one run."""
    from vietnamese_ocr_spark.plans.extract import broadcast_weights, extract_df
    from vietnamese_ocr_spark.sources.pdf_folder import (
        read_pdf_folder,
        read_pdf_media,
    )

    atlas = _atlas()
    root = str(tmp_path)
    with open(os.path.join(root, "scan1.pdf"), "wb") as f:
        f.write(
            pdf_encode_scanned(
                [render_line("quên", 64, atlas), render_line("đêm", 64, atlas)],
                quality=95,
            )
        )
    with open(os.path.join(root, "text1.pdf"), "wb") as f:
        f.write(pdf_encode([[(72.0, 700.0, 11.0, "van ban thuong")]]))

    docs = read_pdf_folder(spark, root)
    media = read_pdf_media(spark, root)
    extracted, _ = extract_df(spark, docs, media, broadcast_weights(spark))
    got = {r["doc_id"]: r["spans"] for r in extracted.collect()}
    assert set(got) == {"scan1.pdf", "text1.pdf"}

    scan = got["scan1.pdf"]
    assert [s["kind"] for s in scan] == ["media", "media"]
    assert [s["text"] for s in scan] == ["quên", "đêm"]  # OCR'd exactly
    assert [s["media_ref"] for s in scan] == [
        "scan1.pdf#p0/Im1", "scan1.pdf#p1/Im1",
    ]

    text = got["text1.pdf"]
    assert [s["kind"] for s in text] == ["text"]
    assert text[0]["text"] == "van ban thuong"


def test_scanned_ocr_hydrates_via_flagship_singleton(spark, monkeypatch):
    """Round-6 (verdict item 2): the scanned stage must reuse the
    module singleton — Recognizer is constructed at most once per
    worker process, not per task/batch."""
    import vietnamese_ocr_spark.operators.ocr_stage as ocr_stage

    calls = {"n": 0}
    real = ocr_stage.weights_from_bytes

    def counting(raw):
        calls["n"] += 1
        return real(raw)

    monkeypatch.setattr(ocr_stage, "weights_from_bytes", counting)
    monkeypatch.setattr(ocr_stage, "_RECOGNIZER", None)
    from vietnamese_ocr_spark.plans.extract import broadcast_weights

    bc = broadcast_weights(spark)
    r1 = ocr_stage._hydrate(bc)
    r2 = ocr_stage._hydrate(bc)
    assert r1 is r2 and calls["n"] == 1

    # distributed: after two runs over a multi-partition df, each worker
    # process holds ONE stable recognizer instance (same id across runs)
    from vietnamese_ocr_spark.functions.pdf import pdf_encode_scanned
    from vietnamese_ocr_spark.model.glyphs import build_atlas, render_line
    from vietnamese_ocr_spark.model.vocab import Vocabulary
    from vietnamese_ocr_spark.operators.pdfops import pdf_scanned_ocr

    atlas = build_atlas(Vocabulary())
    pdf = pdf_encode_scanned([render_line("xin", 64, atlas)])
    assets = spark.createDataFrame(
        [(f"s{i}", bytearray(pdf)) for i in range(8)],
        "asset_id string, payload binary",
    ).repartition(8)

    def probe():
        import os

        def gen(batches):
            import pandas as pd

            import vietnamese_ocr_spark.operators.ocr_stage as st

            for b in batches:
                yield pd.DataFrame(
                    {"pid": [os.getpid()] * len(b),
                     "rid": [id(st._RECOGNIZER) if st._RECOGNIZER else 0] * len(b)}
                )

        return {
            r["pid"]: r["rid"]
            for r in assets.mapInPandas(gen, "pid long, rid long").collect()
        }

    pdf_scanned_ocr(assets, bc).count()
    first = probe()
    pdf_scanned_ocr(assets, bc).count()
    second = probe()
    assert first, "probe saw no workers"
    assert all(rid != 0 for rid in first.values())
    shared = set(first) & set(second)
    assert shared, "no worker reuse observed; cannot assert stability"
    for pid in shared:
        assert first[pid] == second[pid], "recognizer rebuilt in a worker"
