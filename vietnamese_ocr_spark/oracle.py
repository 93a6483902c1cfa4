"""Single-process NumPy oracle: golden `extracted` for a synthetic corpus.

Implements the full extraction semantics in one process with zero Spark —
the analog of the reference's single-node pipeline (src/utils/inference.py
predict_batch: scan -> batch -> model -> decode -> sink). The Spark job's
output must equal this per doc_id on (kind, text, media_ref, order), spans
ordered by offset (SURVEY.md §5.1, the north_rule contract).

Shared code paths (identical modules, not re-implementations):
  preprocessing   functions/imaging.preprocess       (P1..P5)
  normalization   functions/text.normalize_py        (text-span path)
  recognition     model/recognizer.Recognizer        (M5..M12, greedy M11)
  'a' fallback    applied here and as a Spark projection
                  (src/utils/inference.py:108-110)
"""

from __future__ import annotations

import pyarrow.parquet as pq

from .functions.text import normalize_py
from .model.pipeline import recognize_png_batch
from .model.recognizer import Recognizer, build_weights

BATCH_SIZE = 32  # reference default, src/utils/inference.py:44


def recognize_media(media_rows: list[tuple[str, bytes]], recognizer: Recognizer | None = None,
                    batch_size: int = BATCH_SIZE) -> dict[str, str]:
    """media_ref -> recognized text (with 'a' fallback), batched like the
    reference's fixed-size slicing loop (src/utils/inference.py:73-79);
    decode/detect/recognize via the shared pipeline (model/pipeline.py)."""
    recognizer = recognizer or Recognizer(build_weights())
    out: dict[str, str] = {}
    for lo in range(0, len(media_rows), batch_size):
        chunk = media_rows[lo : lo + batch_size]
        texts, _, _ = recognize_png_batch([png for _, png in chunk], recognizer)
        for (ref, _), text in zip(chunk, texts):
            out[ref] = text if text else "a"
    return out


def extract(documents_path: str, media_path: str) -> dict[str, list[tuple]]:
    """Golden extraction: doc_id -> [(kind, text, media_ref, offset), ...]
    sorted by offset. Media spans carry recognized text; text spans carry
    normalized text; duplicate media_refs are recognized once (same text
    everywhere, mirroring the Spark distinct-ref optimization)."""
    media_tbl = pq.read_table(media_path, columns=["media_ref", "png"])
    media_rows = list(zip(media_tbl["media_ref"].to_pylist(), media_tbl["png"].to_pylist()))
    rec = recognize_media(media_rows)

    docs_tbl = pq.read_table(documents_path)
    golden: dict[str, list[tuple]] = {}
    for doc_id, spans in zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["spans"].to_pylist()):
        out_spans = []
        for s in spans or []:
            if s["kind"] == "media":
                if s["media_ref"] not in rec:
                    # dangling media_ref: payload missing from the media
                    # table -> span dropped, mirroring the reference's
                    # KeyError-as-inner-join-drop lookup semantics
                    # (src/utils/dataloader.py:48; SURVEY §2.3 J1) and the
                    # Spark inner join on media_ref
                    continue
                text = rec[s["media_ref"]]
            elif s["kind"] == "text":
                text = normalize_py(s["text"])
            else:
                # unknown span kind: dropped from the span sequence but the
                # doc itself survives (Spark routes these to the NULL-kind
                # marker path, extract.py); matches the engine exactly
                continue
            out_spans.append((s["kind"], text, s["media_ref"], s["offset"]))
        # composite key matching Spark's array_sort over
        # struct(offset, kind, text, media_ref): offset ties break
        # deterministically and identically on both sides
        out_spans.sort(key=lambda t: (t[3], t[0], t[1], t[2]))
        golden[doc_id] = out_spans
    return golden
