"""JSON-lines corpus source.

Web-scale corpora frequently arrive as JSONL (one document object per
line) before anyone converts them to parquet. Spark's JSON source scans
line-split files in parallel, but schema INFERENCE costs a full extra
pass over the data and silently widens/mistypes columns — at 100 TB
both are unacceptable. These readers pin the engine's exact schemas
(input_hint for documents, media table for payloads), so the scan is
single-pass, mis-shaped rows become NULLs in PERMISSIVE mode (routed to
quarantine downstream), and the frames drop into the same extraction
pipeline as parquet/Iceberg tables.

Media payloads in JSONL carry the PNG bytes base64-encoded (JSON has no
binary type); `read_media_jsonl` decodes them JVM-side (unbase64), never
in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_DDL = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)
MEDIA_JSONL_DDL = "media_ref string, png_b64 string, size_b bigint"


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL documents -> the input_hint frame (doc_id, spans)."""
    return spark.read.schema(DOCUMENTS_DDL).json(path)


def read_media_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL media (base64 png) -> media(media_ref, png, size_b)."""
    raw = spark.read.schema(MEDIA_JSONL_DDL).json(path)
    return raw.select(
        "media_ref",
        F.unbase64("png_b64").alias("png"),
        "size_b",
    )
