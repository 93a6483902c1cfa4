"""Iceberg-style table IO shim: parquet + JSON manifest.

The sandbox has no network and no iceberg-spark-runtime jar, so this module
provides the same *interface* an Iceberg catalog would (SURVEY.md §7
resolved decisions): append-only writes, a monotonically increasing
snapshot id, committed-work tracking for resume, and an append-only metrics
(lineage) table. If the Iceberg runtime is ever on the classpath,
`iceberg_available()` flips and `write_table`/`read_table` can be pointed
at `format("iceberg")` without touching the pipeline code.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.source.SparkTable"
        )
        return True
    except Exception:
        return False


class ExtractTable:
    """An output 'table' rooted at a directory: extracted/ lineage/ manifest.json."""

    def __init__(self, root: str):
        self.root = root
        self.extracted_dir = os.path.join(root, "extracted")
        self.lineage_dir = os.path.join(root, "lineage")
        self.manifest_path = os.path.join(root, "manifest.json")

    # -- manifest ----------------------------------------------------------
    def manifest(self) -> dict:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"snapshots": []}

    def new_run_id(self) -> str:
        return uuid.uuid4().hex[:12]

    def commit(self, run_id: str, stats: dict) -> int:
        """Append a snapshot entry; returns the new snapshot id."""
        m = self.manifest()
        snap_id = len(m["snapshots"]) + 1
        m["snapshots"].append(
            {
                "snapshot_id": snap_id,
                "run_id": run_id,
                "committed_at_unix": time.time(),
                **stats,
            }
        )
        os.makedirs(self.root, exist_ok=True)
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=2)
        os.replace(tmp, self.manifest_path)
        return snap_id

    def current_snapshot(self) -> int:
        snaps = self.manifest()["snapshots"]
        return snaps[-1]["snapshot_id"] if snaps else 0

    # -- data --------------------------------------------------------------
    def _data_files(self) -> set[str]:
        if not os.path.isdir(self.extracted_dir):
            return set()
        return {f for f in os.listdir(self.extracted_dir) if f.endswith(".parquet")}

    def has_data(self) -> bool:
        return bool(self._data_files())

    def committed_doc_ids(self, spark: SparkSession) -> DataFrame | None:
        """doc_ids already COMMITTED — reads only files recorded in the
        manifest (an orphaned write from a crashed run is invisible, like
        Iceberg's uncommitted data files), and only the doc_id column
        (pruned scan), feeding the resume anti-join (north_rule)."""
        files = [
            os.path.join(self.extracted_dir, f)
            for s in self.manifest()["snapshots"]
            for f in s.get("data_files", [])
        ]
        if not files:
            return None
        return spark.read.parquet(*files).select("doc_id")

    def append_extracted(self, df: DataFrame) -> list[str]:
        """Append; returns the NEW data files (for the snapshot manifest)."""
        before = self._data_files()
        df.write.mode("append").parquet(self.extracted_dir)
        return sorted(self._data_files() - before)

    def read_snapshot(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        """Time travel: read the table as of `snapshot_id` (default: head) —
        the union of data files committed by snapshots <= id.

        `merge_schema=True` reconciles files written under different
        schema versions (Iceberg-style additive evolution: a later run
        appends files with an extra column; old files surface it as
        NULL). Off by default — the merged-footer scan reads every file's
        footer, which a fixed-schema read shouldn't pay."""
        snaps = self.manifest()["snapshots"]
        if snapshot_id is not None:
            snaps = [s for s in snaps if s["snapshot_id"] <= snapshot_id]
        files = [
            os.path.join(self.extracted_dir, f)
            for s in snaps
            for f in s.get("data_files", [])
        ]
        if not files:
            raise ValueError(f"no committed data at snapshot {snapshot_id}")
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*files)

    def append_lineage(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.lineage_dir)
