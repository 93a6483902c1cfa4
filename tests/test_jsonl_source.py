"""JSONL sources feed the pipeline with span equality intact."""

from __future__ import annotations

import base64
import json

import duckdb

from vietnamese_ocr_spark.plans.extract import extract_df
from vietnamese_ocr_spark.sources.jsonl import read_documents_jsonl, read_media_jsonl


def _to_jsonl(corpus, tmp_path):
    docs_path = str(tmp_path / "docs.jsonl")
    media_path = str(tmp_path / "media.jsonl")
    con = duckdb.connect()
    with open(docs_path, "w") as f:
        for doc_id, spans in con.execute(
            f"select doc_id, spans from '{corpus['documents']}'"
        ).fetchall():
            f.write(json.dumps({"doc_id": doc_id, "spans": spans}) + "\n")
    with open(media_path, "w") as f:
        for ref, png, size_b in con.execute(
            f"select media_ref, png, size_b from '{corpus['media']}'"
        ).fetchall():
            f.write(json.dumps({
                "media_ref": ref,
                "png_b64": base64.b64encode(png).decode(),
                "size_b": size_b,
            }) + "\n")
    return docs_path, media_path


def test_jsonl_corpus_matches_oracle(spark, corpus, golden, tmp_path):
    docs_path, media_path = _to_jsonl(corpus, tmp_path)
    documents = read_documents_jsonl(spark, docs_path)
    media = read_media_jsonl(spark, media_path)
    extracted, _ = extract_df(spark, documents, media)
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in extracted.collect()
    }
    assert got == golden


def test_jsonl_malformed_line_becomes_nulls_not_crash(spark, tmp_path):
    p = str(tmp_path / "bad.jsonl")
    with open(p, "w") as f:
        f.write('{"doc_id": "ok", "spans": []}\n')
        f.write("not json at all\n")
    df = read_documents_jsonl(spark, p)
    rows = df.collect()
    assert len(rows) == 2  # PERMISSIVE: bad line -> NULL row, job survives
    assert {r["doc_id"] for r in rows} == {"ok", None}
