"""Table maintenance: small-file compaction (replace snapshots) and
snapshot expiry — the Iceberg rewrite_data_files / expire_snapshots
equivalents. At 10^12 docs incremental appends become millions of small
parquet files; these are the passes that keep scans amortized and
storage reclaimable, without ever changing query answers."""

from __future__ import annotations

import pytest

from vietnamese_ocr_spark.sources.tableio import ExtractTable


def _table_with_two_appends(spark, tmp_path):
    table = ExtractTable(str(tmp_path / "tbl"))
    a = spark.createDataFrame(
        [(f"doc-{i:04d}", i) for i in range(50)], "doc_id string, n int"
    ).repartition(8)
    b = spark.createDataFrame(
        [(f"doc-{i:04d}", i) for i in range(50, 90)], "doc_id string, n int"
    ).repartition(8)
    table.commit("run-a", {"data_files": table.append_extracted(a)})
    table.commit("run-b", {"data_files": table.append_extracted(b)})
    return table


def _rows(df):
    return sorted((r["doc_id"], r["n"]) for r in df.collect())


def test_compact_preserves_rows_and_shrinks_files(spark, tmp_path):
    table = _table_with_two_appends(spark, tmp_path)
    before_rows = _rows(table.read_snapshot(spark))
    n_files_before = len(table._files_as_of())
    assert n_files_before >= 16  # two 8-way appends

    result = table.compact(spark, target_file_mb=128)
    assert result["files_after"] < result["files_before"] == n_files_before
    # head reads the compacted state, value-identical
    assert _rows(table.read_snapshot(spark)) == before_rows
    # time travel to the pre-compaction snapshots still works
    assert len(_rows(table.read_snapshot(spark, snapshot_id=1))) == 50
    assert _rows(table.read_snapshot(spark, snapshot_id=2)) == before_rows


def test_resume_sees_all_docs_after_compaction(spark, tmp_path):
    table = _table_with_two_appends(spark, tmp_path)
    table.compact(spark, target_file_mb=128)
    done = {r["doc_id"] for r in table.committed_doc_ids(spark).collect()}
    assert len(done) == 90  # the resume anti-join loses nothing


def test_append_after_compaction_accumulates(spark, tmp_path):
    table = _table_with_two_appends(spark, tmp_path)
    table.compact(spark, target_file_mb=128)
    c = spark.createDataFrame(
        [(f"doc-{i:04d}", i) for i in range(90, 100)], "doc_id string, n int"
    )
    table.commit("run-c", {"data_files": table.append_extracted(c)})
    assert len(_rows(table.read_snapshot(spark))) == 100


def test_expire_reclaims_files_and_cuts_time_travel(spark, tmp_path):
    table = _table_with_two_appends(spark, tmp_path)
    before_rows = _rows(table.read_snapshot(spark))
    table.compact(spark, target_file_mb=128)
    on_disk_before = len(table._data_files())

    result = table.expire_snapshots(keep_last=1)
    assert result["expired"] == 2
    assert result["deleted_files"] > 0
    assert len(table._data_files()) < on_disk_before
    # head state is untouched
    assert _rows(table.read_snapshot(spark)) == before_rows
    # the horizon snapshot is self-contained (rewritten as replace)
    assert table.manifest()["snapshots"][0]["operation"] == "replace"
    # time travel before the horizon is gone — that's the contract
    with pytest.raises(ValueError):
        table.read_snapshot(spark, snapshot_id=1)


def test_expire_keeps_append_chain_above_horizon(spark, tmp_path):
    """If the horizon snapshot was a plain append, expiry rewrites it to
    carry its full state — retained reads lose nothing."""
    table = _table_with_two_appends(spark, tmp_path)
    c = spark.createDataFrame(
        [(f"doc-{i:04d}", i) for i in range(90, 100)], "doc_id string, n int"
    )
    table.commit("run-c", {"data_files": table.append_extracted(c)})
    # keep snapshots 2 and 3 (both appends); snapshot 1's files must survive
    # because snapshot 2's state includes them
    table.expire_snapshots(keep_last=2)
    assert len(_rows(table.read_snapshot(spark))) == 100
    assert len(_rows(table.read_snapshot(spark, snapshot_id=2))) == 90


def test_compact_empty_table_raises(spark, tmp_path):
    with pytest.raises(ValueError):
        ExtractTable(str(tmp_path / "empty")).compact(spark)


def test_compact_preserves_evolved_schema(spark, tmp_path):
    """Additive schema evolution + compaction: the rewritten files must
    carry the union schema (old rows surface the new column as NULL) —
    a plain non-mergeSchema rewrite would silently drop it."""
    table = ExtractTable(str(tmp_path / "tbl"))
    a = spark.createDataFrame(
        [(f"doc-{i:04d}", i) for i in range(30)], "doc_id string, n int"
    )
    b = spark.createDataFrame(
        [(f"doc-{i:04d}", i, f"v{i}") for i in range(30, 50)],
        "doc_id string, n int, extra string",
    )
    table.commit("run-a", {"data_files": table.append_extracted(a)})
    table.commit("run-b", {"data_files": table.append_extracted(b)})
    table.compact(spark, target_file_mb=128)
    head = table.read_snapshot(spark)
    assert "extra" in head.columns
    rows = {r["doc_id"]: r["extra"] for r in head.collect()}
    assert len(rows) == 50
    assert rows["doc-0000"] is None and rows["doc-0049"] == "v49"


def test_read_changes_incremental(spark, tmp_path):
    table = _table_with_two_appends(spark, tmp_path)
    delta = table.read_changes(spark, since_snapshot=1)
    ids = {r["doc_id"] for r in delta.collect()}
    assert ids == {f"doc-{i:04d}" for i in range(50, 90)}  # run-b only
    assert table.read_changes(spark, since_snapshot=2).count() == 0


def test_read_changes_refuses_to_cross_compaction(spark, tmp_path):
    table = _table_with_two_appends(spark, tmp_path)
    table.compact(spark, target_file_mb=128)
    with pytest.raises(ValueError):
        table.read_changes(spark, since_snapshot=1)
    # but reading since the replace snapshot works (appends after it)
    c = spark.createDataFrame([("doc-0099", 99)], "doc_id string, n int")
    table.commit("run-c", {"data_files": table.append_extracted(c)})
    ids = {r["doc_id"] for r in table.read_changes(spark, since_snapshot=3).collect()}
    assert ids == {"doc-0099"}


def test_optimistic_concurrency_rejects_stale_commit(spark, tmp_path):
    """Iceberg-style commit model: a writer that based its work on an
    older head must NOT commit; its already-written files stay orphaned
    and invisible, and a resume re-run completes the remainder."""
    from vietnamese_ocr_spark.sources.tableio import ConcurrentCommitError

    root = str(tmp_path / "tbl")
    writer_a, writer_b = ExtractTable(root), ExtractTable(root)
    base = writer_a.current_snapshot()

    df_b = spark.createDataFrame([("doc-b", 1)], "doc_id string, n int")
    writer_b.commit("run-b", {"data_files": writer_b.append_extracted(df_b)},
                    expect_snapshot=base)

    df_a = spark.createDataFrame([("doc-a", 2)], "doc_id string, n int")
    files_a = writer_a.append_extracted(df_a)
    with pytest.raises(ConcurrentCommitError):
        writer_a.commit("run-a", {"data_files": files_a}, expect_snapshot=base)

    # the loser's files are orphaned-invisible: reads see only run-b
    ids = {r["doc_id"] for r in writer_a.read_snapshot(spark).collect()}
    assert ids == {"doc-b"}
    assert {r["doc_id"] for r in writer_a.committed_doc_ids(spark).collect()} == {"doc-b"}
    # retry against the new head succeeds
    writer_a.commit("run-a2", {"data_files": files_a},
                    expect_snapshot=writer_a.current_snapshot())
    ids = {r["doc_id"] for r in writer_a.read_snapshot(spark).collect()}
    assert ids == {"doc-a", "doc-b"}


def test_snapshot_ids_stay_monotone_after_expiry(spark, tmp_path):
    """Expiry trims manifest ENTRIES, never the id sequence: the next
    commit after expiring must advance past the old head, or time
    travel and resume ordering break."""
    table = _table_with_two_appends(spark, tmp_path)  # snapshots 1, 2
    table.compact(spark, target_file_mb=128)          # snapshot 3
    table.expire_snapshots(keep_last=1)               # keeps only id 3
    c = spark.createDataFrame([("doc-0099", 99)], "doc_id string, n int")
    new_id = table.commit("run-c", {"data_files": table.append_extracted(c)})
    assert new_id == 4
    assert len(_rows(table.read_snapshot(spark))) == 91
    assert len(_rows(table.read_snapshot(spark, snapshot_id=3))) == 90


def test_full_lifecycle_extract_compact_expire_resume(spark, corpus, tmp_path):
    """The whole table lifecycle the CLI chains: extract -> compact ->
    expire -> re-extract resumes as a no-op with monotone snapshot ids
    and the identical document set."""
    from vietnamese_ocr_spark.plans.extract import run_extract_frames

    docs = spark.read.parquet(corpus["documents"]).filter(
        "doc_id < 'doc-00000040'"
    )
    media = spark.read.parquet(corpus["media"])
    out = str(tmp_path / "tbl")
    r1 = run_extract_frames(spark, docs, media, out)
    table = ExtractTable(out)
    table.compact(spark, target_file_mb=64)
    table.expire_snapshots(keep_last=1)
    r2 = run_extract_frames(spark, docs, media, out)  # resume: no new docs
    assert r2["total_docs"] == r1["total_docs"]
    assert r2["snapshot_id"] > r1["snapshot_id"]
    ids = {r["doc_id"] for r in table.read_snapshot(spark).select("doc_id").collect()}
    assert len(ids) == r1["total_docs"]


# -- multi-writer contract (round-4: the 100-TB story needs these) ----------

SPANS_DDL = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def test_compact_loses_to_concurrent_append_losslessly(spark, tmp_path, monkeypatch):
    """Interleave: compact() reads the head, then an append commits, then
    compact tries its replace commit. The replace MUST fail (it would
    silently swallow the append's rows), the table must stay lossless,
    and a retry must compact everything including the concurrent row."""
    table = _table_with_two_appends(spark, tmp_path)
    other = ExtractTable(table.root)
    orig_commit = ExtractTable.commit
    state = {"armed": True}

    def inject(self, run_id, stats, expect_snapshot=None):
        if state["armed"] and stats.get("operation") == "replace":
            state["armed"] = False  # the injected append commits normally
            c = spark.createDataFrame([("doc-conc", 999)], "doc_id string, n int")
            other.commit("run-conc", {"data_files": other.append_extracted(c)})
        return orig_commit(self, run_id, stats, expect_snapshot=expect_snapshot)

    monkeypatch.setattr(ExtractTable, "commit", inject)
    from vietnamese_ocr_spark.sources.tableio import ConcurrentCommitError

    with pytest.raises(ConcurrentCommitError):
        table.compact(spark, target_file_mb=128)
    # lossless: both original appends AND the concurrent append are visible
    rows = _rows(table.read_snapshot(spark))
    assert len(rows) == 91 and ("doc-conc", 999) in rows
    # retry against the new head succeeds and preserves every row
    result = table.compact(spark, target_file_mb=128)
    assert result["files_after"] < result["files_before"]
    assert _rows(table.read_snapshot(spark)) == rows


def test_commit_cas_exactly_one_winner_under_contention(tmp_path):
    """N writers race commits against the same expected head: exactly one
    wins, the rest get ConcurrentCommitError, and the manifest gains
    exactly one snapshot (the old read-check-replace could silently
    discard a committed snapshot under this interleaving)."""
    import threading

    from vietnamese_ocr_spark.sources.tableio import ConcurrentCommitError

    table = ExtractTable(str(tmp_path / "tbl"))
    base = table.current_snapshot()
    outcomes: list[str] = []
    lock = threading.Lock()

    def writer(i: int) -> None:
        try:
            ExtractTable(table.root).commit(
                f"run-{i}", {"data_files": []}, expect_snapshot=base
            )
            with lock:
                outcomes.append("win")
        except ConcurrentCommitError:
            with lock:
                outcomes.append("lose")

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert outcomes.count("win") == 1 and outcomes.count("lose") == 7
    assert len(table.manifest()["snapshots"]) == 1


def test_expire_leaves_unknown_orphans_for_retry(spark, tmp_path):
    """expire_snapshots reclaims only files its OWN expired snapshots
    reference. The orphans of an OCC-losing writer (whose retry path
    re-commits those very files) must survive an expiry that runs in
    between — the round-3 behavior deleted them out from under the
    pending retry."""
    table = _table_with_two_appends(spark, tmp_path)
    # a writer loses the race: files written, commit never landed
    orphan_df = spark.createDataFrame([("doc-orphan", 7)], "doc_id string, n int")
    orphan_files = table.append_extracted(orphan_df)

    table.compact(spark, target_file_mb=128)
    table.expire_snapshots(keep_last=1)

    for f in orphan_files:
        assert __import__("os").path.exists(
            __import__("os").path.join(table.extracted_dir, f)
        ), "expiry deleted a pending writer's orphan"
    # the documented retry path still works: re-commit the same files
    table.commit("run-retry", {"data_files": orphan_files},
                 expect_snapshot=table.current_snapshot())
    ids = {r["doc_id"] for r in table.read_snapshot(spark).collect()}
    assert "doc-orphan" in ids and len(ids) == 91


def test_remove_orphans_is_age_gated(spark, tmp_path):
    """Orphan cleanup is a separate, age-gated pass: young orphans (a
    possibly in-flight writer) survive; old ones are reclaimed."""
    import os as _os

    table = _table_with_two_appends(spark, tmp_path)
    orphan_df = spark.createDataFrame([("doc-orphan", 7)], "doc_id string, n int")
    orphan_files = table.append_extracted(orphan_df)
    paths = [_os.path.join(table.extracted_dir, f) for f in orphan_files]

    assert table.remove_orphans()["deleted_files"] == 0  # too young
    for p in paths:
        assert _os.path.exists(p)

    old = __import__("time").time() - 10 * 86400
    for p in paths:
        _os.utime(p, (old, old))
    assert table.remove_orphans()["deleted_files"] == len(paths)
    for p in paths:
        assert not _os.path.exists(p)
    # committed data is never touched regardless of age
    assert len(_rows(table.read_snapshot(spark))) == 90


def test_occ_loser_leaves_no_lineage(spark, corpus, tmp_path, monkeypatch):
    """A run that loses the commit race must leave ZERO lineage rows —
    the winner reuses the snapshot id the loser had planned on, so loser
    lineage would corrupt lineage-to-snapshot attribution. The resumed
    retry then commits, and every lineage row maps to a manifest entry
    with the matching run_id."""
    import os as _os

    from vietnamese_ocr_spark.plans.extract import run_extract_frames
    from vietnamese_ocr_spark.sources.tableio import ConcurrentCommitError

    docs = spark.read.parquet(corpus["documents"]).filter("doc_id < 'doc-00000020'")
    media = spark.read.parquet(corpus["media"])
    out = str(tmp_path / "tbl")

    orig_append = ExtractTable.append_extracted
    state = {"armed": True}

    def sabotage(self, df):
        files = orig_append(self, df)
        if state["armed"]:
            state["armed"] = False
            intruder = spark.createDataFrame([("doc-zzz-intruder", [])], SPANS_DDL)
            t2 = ExtractTable(self.root)
            t2.commit("run-intruder", {"data_files": orig_append(t2, intruder)})
        return files

    monkeypatch.setattr(ExtractTable, "append_extracted", sabotage)
    with pytest.raises(ConcurrentCommitError):
        run_extract_frames(spark, docs, media, out)
    monkeypatch.undo()

    table = ExtractTable(out)
    assert not _os.path.isdir(table.lineage_dir), "OCC loser wrote lineage"

    r2 = run_extract_frames(spark, docs, media, out)  # retry resumes
    lin = spark.read.parquet(out + "/lineage")
    by_id = {s["snapshot_id"]: s for s in table.manifest()["snapshots"]}
    for row in lin.select("snapshot_id", "run_id").distinct().collect():
        assert by_id[row["snapshot_id"]]["run_id"] == row["run_id"]
    assert r2["total_docs"] == 21  # 20 victims + the intruder doc


def test_rollback_reproduces_past_state_and_resume_refills(spark, tmp_path):
    """Round-6: Iceberg-style rollback_to_snapshot — a new replace
    snapshot reproduces the old state non-destructively; the resume
    anti-join sees the rolled-back doc set; expiry after rollback keeps
    exactly the rolled-back files."""
    import pytest

    from vietnamese_ocr_spark.sources.tableio import ExtractTable

    root = str(tmp_path / "tbl")
    table = ExtractTable(root)
    df1 = spark.createDataFrame(
        [("d1", 1)], "doc_id string, v int"
    )
    files1 = table.append_extracted(df1)
    s1 = table.commit("r1", {"data_files": files1})
    df2 = spark.createDataFrame([("d2", 2)], "doc_id string, v int")
    files2 = table.append_extracted(df2)
    s2 = table.commit("r2", {"data_files": files2})
    assert (s1, s2) == (1, 2)

    out = table.rollback(s1)
    assert out["rolled_back_to"] == s1 and out["snapshot_id"] == 3
    # head state == snapshot-1 state; snapshot 2 still time-travels
    head_docs = {r["doc_id"] for r in table.read_snapshot(spark).collect()}
    assert head_docs == {"d1"}
    s2_docs = {r["doc_id"]
               for r in table.read_snapshot(spark, snapshot_id=s2).collect()}
    assert s2_docs == {"d1", "d2"}
    committed = table.committed_doc_ids(spark)
    assert {r["doc_id"] for r in committed.collect()} == {"d1"}

    # rollback to head is a no-op; unknown snapshot raises
    assert table.rollback(3).get("noop") is True
    with pytest.raises(ValueError, match="not in table history"):
        table.rollback(99)

    # expiry keeps the rolled-back state and reclaims d2's file
    res = table.expire_snapshots(keep_last=1)
    assert res["expired"] == 2 and res["deleted_files"] == len(files2)
    assert {r["doc_id"] for r in table.read_snapshot(spark).collect()} == {"d1"}
