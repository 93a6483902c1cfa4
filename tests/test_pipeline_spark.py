"""The north_rule contract: Spark pipeline output == oracle, span for span."""

from __future__ import annotations

import pytest

from vietnamese_ocr_spark.plans.extract import broadcast_weights, extract_df, run_extract


def _collect_extracted(df):
    out = {}
    for row in df.collect():
        out[row["doc_id"]] = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]
        ]
    return out


@pytest.fixture(scope="module")
def spark_extracted(spark, corpus):
    documents = spark.read.parquet(corpus["documents"])
    media = spark.read.parquet(corpus["media"])
    extracted, rec = extract_df(spark, documents, media)
    return _collect_extracted(extracted)


def test_span_equality_vs_oracle(spark_extracted, golden):
    """(kind, text, media_ref, order) per doc — the BASELINE.json invariant."""
    assert set(spark_extracted) == set(golden)
    for doc_id, want in golden.items():
        assert spark_extracted[doc_id] == want, doc_id


def test_empty_doc_survives(spark_extracted):
    assert spark_extracted["doc-00000000"] == []


def test_unknown_kind_doc_survives_with_empty_spans(spark_extracted):
    """doc 9 has ONLY an unknown-kind span: the span is dropped but the
    doc must not vanish (unknown kinds route to the NULL-kind marker)."""
    assert spark_extracted["doc-00000009"] == []


def test_duplicate_offset_tie_is_deterministic(spark_extracted, golden):
    """doc 8 carries three spans at offset 2 — composite key order."""
    spans = spark_extracted["doc-00000008"]
    assert [s[3] for s in spans] == [2, 2, 2]
    assert spans == golden["doc-00000008"]


def test_documents_scanned_once(spark, corpus):
    """The exploded span projection is persisted, so the three consumers
    (text branch, media branch, distinct-ref) share ONE documents scan —
    at 10^12 rows the difference is two full passes of the fattest table."""
    documents = spark.read.parquet(corpus["documents"])
    media = spark.read.parquet(corpus["media"])
    extracted, _ = extract_df(spark, documents, media)
    plan = extracted._jdf.queryExecution().executedPlan().toString()
    # the plan string reprints the cached child under every
    # InMemoryTableScan, so "one real scan" shows up as: every documents
    # FileScan occurrence paired 1:1 with an InMemoryTableScan node (the
    # FileScan executes once, when the cache first materializes). Without
    # the persist this is 3 uncached scans vs 0 InMemoryTableScans.
    n_doc_scans = plan.count("documents.parquet")
    n_cached_reads = plan.count("InMemoryTableScan")
    assert n_doc_scans > 0 and n_doc_scans == n_cached_reads, (
        f"documents FileScans={n_doc_scans}, InMemoryTableScans="
        f"{n_cached_reads}:\n{plan[:2000]}"
    )


def test_run_extract_commits_and_resumes(spark, corpus, tmp_path, golden):
    out = str(tmp_path / "table")
    r1 = run_extract(spark, corpus["documents"], corpus["media"], out)
    assert r1["total_docs"] == len(golden)
    assert r1["snapshot_id"] == 1
    # resume over a complete table: nothing new to do, docs stay constant
    r2 = run_extract(spark, corpus["documents"], corpus["media"], out)
    assert r2["total_docs"] == len(golden)
    assert r2["snapshot_id"] == 2
    final = spark.read.option("recursiveFileLookup", "true").parquet(out + "/extracted")
    assert final.count() == len(golden)


def test_resume_after_partial_run_equals_full_run(spark, corpus, tmp_path, golden):
    """Kill-and-resume: extract half the docs, then resume; the union must
    equal a single full run (north_rule 'resumable from checkpoint')."""
    out = str(tmp_path / "partial")
    docs = spark.read.parquet(corpus["documents"])
    half = docs.filter("doc_id < 'doc-00000100'")
    from vietnamese_ocr_spark.sources.tableio import ExtractTable

    table = ExtractTable(out)
    weights_bc = broadcast_weights(spark)
    media = spark.read.parquet(corpus["media"])
    extracted, _ = extract_df(spark, half, media, weights_bc)
    files = table.append_extracted(extracted)
    table.commit("partial", {"data_files": files})

    run_extract(spark, corpus["documents"], corpus["media"], out, weights_bc=weights_bc)
    final = table.read_snapshot(spark)
    assert final.count() == len(golden)  # no duplicates across the resume
    got = _collect_extracted(final)
    assert got == {k: v for k, v in golden.items()}


def test_snapshot_time_travel(spark, corpus, tmp_path, golden):
    """read_snapshot(id) sees exactly the docs committed up to that id;
    uncommitted (orphaned) files are invisible — Iceberg-shim semantics."""
    from vietnamese_ocr_spark.sources.tableio import ExtractTable

    out = str(tmp_path / "tt")
    table = ExtractTable(out)
    docs = spark.read.parquet(corpus["documents"])
    media = spark.read.parquet(corpus["media"])
    weights_bc = broadcast_weights(spark)

    first, _ = extract_df(spark, docs.filter("doc_id < 'doc-00000050'"), media, weights_bc)
    f1 = table.append_extracted(first)
    s1 = table.commit("r1", {"data_files": f1})
    second, _ = extract_df(
        spark, docs.filter("doc_id >= 'doc-00000050' and doc_id < 'doc-00000100'"),
        media, weights_bc,
    )
    f2 = table.append_extracted(second)
    s2 = table.commit("r2", {"data_files": f2})
    # an orphaned write with NO commit (simulated crash)
    orphan, _ = extract_df(spark, docs.filter("doc_id >= 'doc-00000100'"), media, weights_bc)
    table.append_extracted(orphan)

    assert table.read_snapshot(spark, s1).count() == 50
    assert table.read_snapshot(spark, s2).count() == 100
    assert table.read_snapshot(spark).count() == 100  # orphan invisible
    done = table.committed_doc_ids(spark)
    assert done.count() == 100


def test_snapshot_schema_evolution_merge(spark, tmp_path):
    """Additive schema evolution across snapshots: a later run appends
    files with an extra column; merge_schema=True reads old + new
    together (old rows NULL in the new column), exactly the Iceberg
    additive-evolution contract."""
    from pyspark.sql import functions as F

    from vietnamese_ocr_spark.sources.tableio import ExtractTable

    out = str(tmp_path / "evo")
    table = ExtractTable(out)
    v1 = spark.createDataFrame([("a", 1)], "doc_id string, n int")
    s1 = table.commit("r1", {"data_files": table.append_extracted(v1)})
    v2 = spark.createDataFrame([("b", 2, 0.9)], "doc_id string, n int, quality double")
    s2 = table.commit("r2", {"data_files": table.append_extracted(v2)})

    merged = table.read_snapshot(spark, s2, merge_schema=True)
    assert set(merged.columns) == {"doc_id", "n", "quality"}
    rows = {r["doc_id"]: r["quality"] for r in merged.collect()}
    assert rows == {"a": None, "b": 0.9}
    # time travel to s1 still sees only the v1 schema's data
    assert table.read_snapshot(spark, s1).count() == 1
    # and a filter on the evolved column prunes NULLs correctly
    assert merged.filter(F.col("quality") > 0.5).count() == 1


def test_span_equality_generalizes_to_other_seed(spark, tmp_path):
    """Not tuned to seed 42: a fresh corpus from a different seed must
    also match the oracle span-for-span."""
    from vietnamese_ocr_spark.oracle import extract as oracle_extract
    from vietnamese_ocr_spark.sources.fixtures import generate_corpus

    paths = generate_corpus(60, str(tmp_path / "seed7"), seed=7)
    want = oracle_extract(paths["documents"], paths["media"])
    extracted, _ = extract_df(
        spark,
        spark.read.parquet(paths["documents"]),
        spark.read.parquet(paths["media"]),
    )
    assert _collect_extracted(extracted) == want


def test_hot_media_ref_skew_stays_correct(spark, tmp_path):
    """Pathological skew: ONE media_ref referenced by 300 of 301 docs.
    distinct-ref means the whale payload is recognized once; the join
    back fans the single recognition out to every referencing doc (the
    hot-key path AQE skew-join handles at scale). Output must stay
    span-exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vietnamese_ocr_spark.functions.imaging import png_encode
    from vietnamese_ocr_spark.model.glyphs import build_atlas, render_line
    from vietnamese_ocr_spark.model.vocab import Vocabulary
    from vietnamese_ocr_spark.oracle import extract as oracle_extract

    vocab = Vocabulary()
    atlas = build_atlas(vocab)
    word_a, word_b = "".join(vocab.letters[:5]), "".join(vocab.letters[5:9])
    whale_png = png_encode(render_line(word_a, 64, atlas))
    rare_png = png_encode(render_line(word_b, 64, atlas))
    docs = [
        {"doc_id": f"d{i:04d}",
         "spans": [{"kind": "media", "text": None,
                    "media_ref": "whale.png", "offset": 0}]}
        for i in range(300)
    ] + [{"doc_id": "d9999",
          "spans": [{"kind": "media", "text": None,
                     "media_ref": "rare.png", "offset": 0}]}]
    span_t = pa.list_(pa.struct([("kind", pa.string()), ("text", pa.string()),
                                 ("media_ref", pa.string()), ("offset", pa.int32())]))
    docs_p = str(tmp_path / "docs.parquet")
    media_p = str(tmp_path / "media.parquet")
    pq.write_table(pa.table({
        "doc_id": [d["doc_id"] for d in docs],
        "spans": pa.array([d["spans"] for d in docs], span_t),
    }), docs_p)
    pq.write_table(pa.table({
        "media_ref": ["whale.png", "rare.png"],
        "png": [whale_png, rare_png],
        "size_b": [len(whale_png), len(rare_png)],
    }), media_p)

    want = oracle_extract(docs_p, media_p)
    extracted, rec = extract_df(
        spark, spark.read.parquet(docs_p), spark.read.parquet(media_p)
    )
    assert _collect_extracted(extracted) == want
    # the whale was recognized exactly once despite 300 references
    assert rec.count() == 2


def test_lineage_table_written(spark, corpus, tmp_path):
    out = str(tmp_path / "lin")
    run_extract(spark, corpus["documents"], corpus["media"], out)
    lin = spark.read.parquet(out + "/lineage")
    rows = lin.collect()
    assert len(rows) >= 1
    total_media = sum(r["media_count"] for r in rows)
    n_media = spark.read.parquet(corpus["media"]).count()
    assert total_media == n_media  # every distinct payload recognized once
    for r in rows:
        assert len(r["conf_histogram"]) == 10
        assert r["snapshot_id"] == 1 and r["run_id"]
