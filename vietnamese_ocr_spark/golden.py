"""Single-process golden parquet for the non-SQL-expressible queries.

The driver's correctness gate compares each Spark query against a DuckDB
oracle SQL string. Recognition and codec work cannot be expressed in SQL —
but it IS deterministic, so we can precompute the answer once in a single
process (the reference's execution model: one thread, no Spark) and let
the oracle SQL be `SELECT ... FROM read_parquet('<golden file>')`. That
upgrades ocr_extract / ocr_recognize / multimodal_* from rows-only checks
to full value-hash checks: the distributed pipeline must reproduce the
single-process answer row for row.

All semantics are imported from the same modules the Spark stages use
(sf_adapter._derive, model.pipeline.recognize_png_batch, multimodal
helpers) — this file adds zero logic of its own beyond sequencing, so a
drift between the engine and this generator is impossible by construction.

The cache is keyed on (sf_dir, documents fingerprint, GOLDEN_VERSION);
bump GOLDEN_VERSION whenever recognition/derivation semantics change.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq

from .functions.imaging import png_encode
from .functions.text import normalize_py
from .model.glyphs import render_line
from .model.pipeline import recognize_png_batch
from .model.recognizer import Recognizer, build_weights
from .operators.multimodal import (
    _fake_frame_digest,
    audio_feature_row,
    decode_stats_row,
    image_stats,
)
from .sources.sf_adapter import (
    _atlas,
    _derive,
    mixed_asset,
    pdf_asset,
    scanned_pdf_asset,
)

GOLDEN_VERSION = "r6-3"
BATCH = 32  # reference inference batch, src/utils/inference.py:44

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE_ROOT = os.environ.get(
    "SPARK_GRAFT_GOLDEN_DIR", os.path.join(_REPO_ROOT, ".golden_cache")
)

GOLDEN_NAMES = (
    "ocr_recognize",
    "ocr_extract",
    "multimodal_image_stats",
    "multimodal_audio_features",
    "multimodal_frame_sample",
    "image_decode_stats",
    "pdf_extract_lines",
    "pdf_scanned_ocr",
    "bpe_segment",
)


def _fingerprint(sf_dir: str) -> str:
    """Cheap content key: path + size/mtime of every documents part file."""
    doc_path = os.path.join(sf_dir, "documents.parquet")
    parts = []
    if os.path.isdir(doc_path):
        for name in sorted(os.listdir(doc_path)):
            st = os.stat(os.path.join(doc_path, name))
            parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
    else:
        st = os.stat(doc_path)
        parts.append(f"{st.st_size}:{st.st_mtime_ns}")
    key = "|".join([os.path.abspath(sf_dir), GOLDEN_VERSION, *parts])
    return hashlib.md5(key.encode("utf-8")).hexdigest()[:16]


def golden_paths(sf_dir: str) -> dict[str, str]:
    d = os.path.join(CACHE_ROOT, _fingerprint(sf_dir))
    return {name: os.path.join(d, f"{name}.parquet") for name in GOLDEN_NAMES}


def _read_documents(sf_dir: str) -> pa.Table:
    return pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "n_chars"]
    )


def ensure_sf_golden(sf_dir: str) -> dict[str, str]:
    """Compute (or reuse) the golden parquet files for `sf_dir`; returns
    {query_name: absolute parquet path}. Single-process, driver-side."""
    paths = golden_paths(sf_dir)
    if all(os.path.exists(p) for p in paths.values()):
        return paths
    os.makedirs(os.path.dirname(next(iter(paths.values()))), exist_ok=True)

    docs = _read_documents(sf_dir)
    atlas, _ = _atlas()

    # -- derive the interleaved corpus exactly like sf_adapter's executors
    doc_rows: list[tuple[str, list[dict]]] = []
    media: list[tuple[str, bytes, object]] = []  # (ref, png, img)
    img_stats_rows = []
    for doc_id, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        spans = _derive(int(doc_id), text)
        doc_rows.append((f"sfdoc-{int(doc_id):08d}", spans))
        for s in spans:
            if s["kind"] != "media":
                continue
            img = render_line(s["_truth"], s["_height"], atlas)
            png = png_encode(img)
            media.append((s["media_ref"], png, img))
            img_stats_rows.append({"asset_id": s["media_ref"], **image_stats(img)})

    # -- recognition (shared pipeline, reference batch slicing)
    recognizer = Recognizer(build_weights())
    rec_text: dict[str, str] = {}
    rec_tokens: dict[str, int] = {}
    for lo in range(0, len(media), BATCH):
        chunk = media[lo : lo + BATCH]
        texts, hist, _ = recognize_png_batch([png for _, png, _ in chunk], recognizer)
        for (ref, _, _), text, h in zip(chunk, texts, hist):
            rec_text[ref] = text
            rec_tokens[ref] = int(h.sum())

    pq.write_table(
        pa.table(
            {
                "media_ref": [r for r, _, _ in media],
                "rec_text": [rec_text[r] for r, _, _ in media],
                "n_tokens": [rec_tokens[r] for r, _, _ in media],
            }
        ),
        paths["ocr_recognize"],
    )

    # -- flat extracted spans (composite sort key = Spark's array_sort)
    flat = {"doc_id": [], "seq": [], "kind": [], "text": [], "media_ref": [], "offset": []}
    for doc_id, spans in doc_rows:
        out = []
        for s in spans:
            if s["kind"] == "media":
                text = rec_text[s["media_ref"]] or "a"
            else:
                text = normalize_py(s["text"])
            out.append((s["offset"], s["kind"], text, s["media_ref"]))
        out.sort()
        if not out:
            flat["doc_id"].append(doc_id)
            for k in ("seq", "kind", "text", "media_ref", "offset"):
                flat[k].append(None)
            continue
        for seq, (offset, kind, text, media_ref) in enumerate(out):
            flat["doc_id"].append(doc_id)
            flat["seq"].append(seq)
            flat["kind"].append(kind)
            flat["text"].append(text)
            flat["media_ref"].append(media_ref)
            flat["offset"].append(offset)
    pq.write_table(
        pa.table(
            flat,
            schema=pa.schema(
                [
                    ("doc_id", pa.string()),
                    ("seq", pa.int32()),
                    ("kind", pa.string()),
                    ("text", pa.string()),
                    ("media_ref", pa.string()),
                    ("offset", pa.int32()),
                ]
            ),
        ),
        paths["ocr_extract"],
    )

    pq.write_table(
        pa.Table.from_pylist(
            img_stats_rows,
            schema=pa.schema(
                [
                    ("asset_id", pa.string()),
                    ("width", pa.int32()),
                    ("height", pa.int32()),
                    ("mean_lum", pa.float64()),
                    ("ink_ratio", pa.float64()),
                ]
            ),
        ),
        paths["multimodal_image_stats"],
    )

    # -- mixed-format decode coverage (sf_adapter.mixed_asset derivation)
    decode_rows = [
        decode_stats_row(a["asset_id"], a["fmt"], a["payload"])
        for doc_id, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
        if (a := mixed_asset(int(doc_id), text)) is not None
    ]
    pq.write_table(
        pa.Table.from_pylist(
            decode_rows,
            schema=pa.schema(
                [
                    ("asset_id", pa.string()),
                    ("fmt", pa.string()),
                    ("decode_ok", pa.bool_()),
                    ("width", pa.int32()),
                    ("height", pa.int32()),
                    ("mean_lum", pa.float64()),
                    ("ink_ratio", pa.float64()),
                ]
            ),
        ),
        paths["image_decode_stats"],
    )

    # -- scanned-PDF OCR (sf_adapter.scanned_pdf_asset derivation);
    # reuses the recognizer built above — same weights, same pipeline
    from .operators.pdfops import scanned_ocr_rows

    scan_rows = [
        row
        for doc_id, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
        if (a := scanned_pdf_asset(int(doc_id), text)) is not None
        for row in scanned_ocr_rows(a["asset_id"], a["payload"], recognizer)
    ]
    pq.write_table(
        pa.Table.from_pylist(
            scan_rows,
            schema=pa.schema(
                [
                    ("asset_id", pa.string()),
                    ("page", pa.int32()),
                    ("name", pa.string()),
                    ("rec_text", pa.string()),
                    ("n_tokens", pa.int32()),
                ]
            ),
        ),
        paths["pdf_scanned_ocr"],
    )

    # -- PDF layout parse (sf_adapter.pdf_asset derivation)
    from .operators.pdfops import pdf_line_rows

    pdf_rows = [
        row
        for doc_id, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
        if (a := pdf_asset(int(doc_id), text)) is not None
        for row in pdf_line_rows(a["asset_id"], a["payload"])
    ]
    pq.write_table(
        pa.Table.from_pylist(
            pdf_rows,
            schema=pa.schema(
                [
                    ("asset_id", pa.string()),
                    ("decode_ok", pa.bool_()),
                    ("page", pa.int32()),
                    ("line_no", pa.int32()),
                    ("y", pa.float64()),
                    ("text", pa.string()),
                ]
            ),
        ),
        paths["pdf_extract_lines"],
    )

    # -- audio / video stub assets (mirrors plans/queries.py derivations)
    audio_rows, frame_rows = [], []
    for doc_id, text, n_chars in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist(), docs["n_chars"].to_pylist()
    ):
        payload = bytes.fromhex(hashlib.md5(text.encode("utf-8")).hexdigest())
        row = audio_feature_row(payload, 16000, int(n_chars) % 2000 + 500)
        audio_rows.append(
            {
                "asset_id": f"aud-{doc_id}",
                "n_samples": row["n_samples"],
                "features_md5": row["features_md5"],
            }
        )
        n_frames = int(n_chars) % 80 + 20
        for idx in range(0, n_frames, 10):
            frame_rows.append(
                {
                    "asset_id": f"vid-{doc_id}",
                    "frame_idx": idx,
                    "phash": _fake_frame_digest(payload, idx),
                }
            )
    pq.write_table(
        pa.Table.from_pylist(
            audio_rows,
            schema=pa.schema(
                [
                    ("asset_id", pa.string()),
                    ("n_samples", pa.int64()),
                    ("features_md5", pa.string()),
                ]
            ),
        ),
        paths["multimodal_audio_features"],
    )
    pq.write_table(
        pa.Table.from_pylist(
            frame_rows,
            schema=pa.schema(
                [
                    ("asset_id", pa.string()),
                    ("frame_idx", pa.int32()),
                    ("phash", pa.string()),
                ]
            ),
        ),
        paths["multimodal_frame_sample"],
    )

    # -- BPE segmentation (round-6: the §2.11 driver row). Single-process
    # mirror of q_bpe_segment: same (word,freq) collapse semantics as
    # operators/bpe.word_frequencies (split on " ", drop empties), the
    # same top-20k (freq desc, word asc) cap, and the SAME shared merge
    # function (_train_from_word_freqs) — golden checks the distributed
    # pipeline against a one-thread rerun of identical semantics.
    import hashlib as _hl

    from .operators.bpe import _train_from_word_freqs, bpe_segment_word

    freqs: dict[str, int] = {}
    texts_by_doc: list[tuple[str, str]] = []
    for doc_id, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        texts_by_doc.append((str(int(doc_id)), text))
        for w in text.split(" "):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    capped = dict(
        sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:20000]
    )
    merges, _words = _train_from_word_freqs(capped, 200, 2)
    ranks = {pair: i for i, pair in enumerate(merges)}
    cache: dict[str, list[str]] = {}
    bpe_rows = []
    for doc_id, text in texts_by_doc:
        toks: list[str] = []
        for w in text.split(" "):
            if not w:
                continue
            got = cache.get(w)
            if got is None:
                got = cache[w] = bpe_segment_word(w, ranks)
            toks.extend(got)
        bpe_rows.append(
            {
                "doc_id": doc_id,
                "n_tokens": len(toks),
                "tokens_md5": _hl.md5(" ".join(toks).encode("utf-8")).hexdigest(),
            }
        )
    pq.write_table(
        pa.Table.from_pylist(
            bpe_rows,
            schema=pa.schema(
                [
                    ("doc_id", pa.string()),
                    ("n_tokens", pa.int32()),
                    ("tokens_md5", pa.string()),
                ]
            ),
        ),
        paths["bpe_segment"],
    )
    return paths
