"""binaryFile raw-folder source: a directory of PNGs — the reference's
primary input mode (src/utils/inference.py:45) — feeds the full pipeline."""

from __future__ import annotations

import os

from vietnamese_ocr_spark.functions.imaging import png_encode
from vietnamese_ocr_spark.model.glyphs import build_atlas, render_line
from vietnamese_ocr_spark.model.vocab import Vocabulary
from vietnamese_ocr_spark.sources.image_folder import folder_documents, read_image_folder


def _write_pngs(root: str) -> dict[str, str]:
    vocab = Vocabulary()
    atlas = build_atlas(vocab)
    truths = {"a1.png": "xin", "b2.png": "quên", "sub/c3.png": "đêm",
              "d4.jpg": "chào", "e5.bmp": "em", "f6.gif": "nhớ",
              "g7.tif": "mai", "h8.webp": "nhà", "i9.pgm": "sông",
              "j10.ico": "núi"}
    for rel, truth in truths.items():
        path = os.path.join(root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        img = render_line(truth, 64, atlas)
        with open(path, "wb") as f:
            if rel.endswith(".jpg"):
                from vietnamese_ocr_spark.functions.jpeg import jpeg_encode

                f.write(jpeg_encode(img, quality=100))
            elif rel.endswith(".bmp"):
                from vietnamese_ocr_spark.functions.gifbmp import bmp_encode

                f.write(bmp_encode(img))
            elif rel.endswith(".gif"):
                from vietnamese_ocr_spark.functions.gifbmp import gif_encode

                f.write(gif_encode(img, interlace=True))
            elif rel.endswith(".tif"):
                from vietnamese_ocr_spark.functions.tiff import tiff_encode

                f.write(tiff_encode(img, compression="lzw"))
            elif rel.endswith(".webp"):
                from vietnamese_ocr_spark.functions.webp import webp_encode

                f.write(webp_encode(img, subtract_green=True))
            elif rel.endswith(".pgm"):
                from vietnamese_ocr_spark.functions.pnmico import pnm_encode

                f.write(pnm_encode(img))
            elif rel.endswith(".ico"):
                from vietnamese_ocr_spark.functions.pnmico import ico_encode

                f.write(ico_encode(img[:256, :256], as_png=True))
            else:
                f.write(png_encode(img))
    # a decoy that must NOT match the glob
    with open(os.path.join(root, "notes.txt"), "w") as f:
        f.write("not an image")
    return {os.path.basename(k): v for k, v in truths.items()}


def test_read_image_folder_schema_and_glob(spark, tmp_path):
    truths = _write_pngs(str(tmp_path))
    media = read_image_folder(spark, str(tmp_path))
    rows = media.collect()
    assert sorted(r["media_ref"] for r in rows) == sorted(truths)
    assert media.columns == ["media_ref", "png", "size_b"]
    for r in rows:
        assert r["size_b"] == len(r["png"]) > 0


def test_folder_feeds_full_extraction(spark, tmp_path):
    """Directory of PNGs -> extract_df -> recognized spans, end to end."""
    from vietnamese_ocr_spark.plans.extract import broadcast_weights, extract_df

    truths = _write_pngs(str(tmp_path))
    media = read_image_folder(spark, str(tmp_path))
    documents = folder_documents(media)
    extracted, _ = extract_df(spark, documents, media, broadcast_weights(spark))
    got = {r["doc_id"]: r["spans"] for r in extracted.collect()}
    assert set(got) == set(truths)

    # recognition on clean renders is exact (glyph templates)
    for ref, truth in truths.items():
        spans = got[ref]
        assert len(spans) == 1
        assert spans[0]["kind"] == "media"
        assert spans[0]["media_ref"] == ref
        assert spans[0]["text"] == truth
