"""Raw image-directory source: the reference's primary input mode.

The reference walks a folder of image files with `os.listdir` and feeds
each file to the recognizer (src/utils/inference.py:45); the Spark-native
equivalent is the built-in `binaryFile` data source, which scans a
directory tree in parallel (one task per file split), pushes the glob
filter down to the listing, and yields (path, modificationTime, length,
content) rows — no driver-side listing, no per-file Python.

`read_image_folder` adapts that to the engine's media schema
(media_ref, png, size_b), so a directory of PNGs feeds the exact same
extraction pipeline as a parquet/Iceberg media table. `folder_documents`
fabricates the matching single-span documents table (one media span per
file), which is precisely the reference's semantics: every image is its
own document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_image_folder(
    spark: SparkSession, directory: str, glob: str = "*.{png,jpg,jpeg,bmp,gif,tif,tiff,webp,ico,pbm,pgm,ppm,pnm}"
) -> DataFrame:
    """Directory of image files -> media(media_ref, png, size_b).

    media_ref = the file's base name (matching the reference, which keys
    its predictions by file name — src/utils/inference.py:105-111).
    Recursive so nested date=.../shard=... layouts work unchanged. The
    default glob admits PNG, JPEG, BMP, GIF, TIFF, WebP, ICO and the
    Netpbm family — all decode through the
    functions/imaging.decode_image seam (the reference accepts anything
    PIL opens, src/utils/inference.py:125); the `png` column name is the
    media-schema contract, the bytes may be any of those containers.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(directory)
    )
    return raw.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("media_ref"),
        F.col("content").alias("png"),
        F.col("length").alias("size_b"),
    )


def folder_documents(media: DataFrame) -> DataFrame:
    """One single-media-span document per file (the reference's implicit
    data model: each image stands alone). Output has the input_hint shape
    (doc_id, spans array<struct<kind,text,media_ref,offset>>)."""
    return media.select(
        F.col("media_ref").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("media").alias("kind"),
                F.lit("").alias("text"),
                F.col("media_ref").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )
