"""Mirror of the driver's verification: every queries() entry runs, and
every oracle_sql() pair matches DuckDB value-for-value at sf0.01."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.compare_harness import compare_one, duck_connection  # noqa: E402
from vietnamese_ocr_spark.plans.queries import (  # noqa: E402
    EXTRA_QUERIES,
    ORACLE_SQL,
    QUERIES,
)

SF_DIR = "/root/testdata/sf0.01"
ORACLED = sorted(entrymod.oracle_sql())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


def test_oracle_keys_subset_of_queries():
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


def test_primary_registry_fits_driver_window():
    """The driver records correctness rows for the FIRST 50 queries()
    entries only (round-2 verdict #1): the registry must stay <= 50 with
    the flagship pair leading, so every registered query gets a row."""
    q = list(entrymod.queries())
    assert len(q) <= 50, f"{len(q)} entries — tail would get no driver row"
    assert q[:2] == ["ocr_extract", "ocr_recognize"]


@pytest.mark.parametrize("name", sorted(EXTRA_QUERIES))
def test_extra_query_matches_oracle(name, spark, duck):
    """The secondary registry (outside the driver window) stays
    value-verified through the identical comparison."""
    ok, msg = compare_one(
        name, spark, duck, SF_DIR, {**QUERIES, **EXTRA_QUERIES}, ORACLE_SQL
    )
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["doc_id", "spans"]
    # at least one media span got recognized text
    assert any(
        s["kind"] == "media" and s["text"] for r in rows for s in r["spans"]
    )


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, spark, duck):
    ok, msg = compare_one(
        name, spark, duck, SF_DIR, entrymod.queries(), entrymod.oracle_sql()
    )
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark):
    df = entrymod.queries()[name](spark, "/root/testdata/sf0.001")
    assert df.count() > 0


def test_driver_surface_schemas_stable(spark):
    """Pin the driver-facing schemas of the golden-checked queries so they
    cannot drift silently between rounds. All columns are SCALAR — the
    driver's canonicalizer crashes on array/struct columns (round-1 red
    rows), so an array column reappearing here is a regression."""
    q = entrymod.queries()
    want = {
        "ocr_extract": "doc_id:string|seq:int|kind:string|text:string|media_ref:string|offset:int",
        "ocr_recognize": "media_ref:string|rec_text:string|n_tokens:bigint",
        "multimodal_image_stats": "asset_id:string|width:int|height:int|mean_lum:double|ink_ratio:double",
        "multimodal_audio_features": "asset_id:string|n_samples:bigint|features_md5:string",
        "multimodal_frame_sample": "asset_id:string|frame_idx:int|phash:string",
    }
    for name, expected in want.items():
        df = q[name](spark, "/root/testdata/sf0.001")
        got = "|".join(f"{f.name}:{f.dataType.simpleString()}" for f in df.schema.fields)
        assert got == expected, f"{name}: {got}"
        for f in df.schema.fields:
            assert "array" not in f.dataType.simpleString(), f"{name}.{f.name}"
