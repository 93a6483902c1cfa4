"""Raw PDF-directory source: point the extraction pipeline at PDFs.

The binaryFile data source scans the directory tree in parallel (glob
pushed to the listing, one task per file split); a mapInPandas stage
parses each PDF with the pure-stdlib parser (functions/pdf.py), rebuilds
reading order from layout, and emits one document per file in the
input_hint shape — each reconstructed line becomes a text span with its
line index as the offset. The normalize/stitch legs of the flagship
pipeline then apply unchanged (north_rule: "HTML boilerplate strip,
PDF/layout parse, DOM heuristics" under one extraction roof).

Undecodable PDFs (encrypted, xref-stream, corrupt) survive as documents
with spans=[] — quarantine, not failure, same contract as image decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCUMENTS_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def read_pdf_folder(spark: SparkSession, directory: str, glob: str = "*.pdf") -> DataFrame:
    """Directory of PDFs -> documents(doc_id, spans) in input_hint shape.

    doc_id = file base name (the per-file keying the reference uses for
    its inputs, src/utils/inference.py:105-111)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(directory)
        .select(
            F.element_at(F.split(F.col("path"), "/"), -1).alias("doc_id"),
            F.col("content"),
        )
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.pdf import pdf_lines

        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    lines = pdf_lines(bytes(content))
                except Exception:
                    lines = []  # quarantined: doc survives with spans=[]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "spans": [
                            {
                                "kind": "text",
                                "text": ln["text"],
                                "media_ref": "",
                                "offset": i,
                            }
                            for i, ln in enumerate(lines)
                        ],
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return raw.mapInPandas(parse, DOCUMENTS_SCHEMA)
