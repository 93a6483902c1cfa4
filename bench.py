"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "extra": {...}}

Methodology (changed in round 2 — see BASELINE.md):
  * The flagship `ocr_extract` is timed over a PRE-MATERIALIZED parquet
    corpus (documents + media tables) — the north_rule input shape ("an
    Iceberg table of interleaved text+media documents"). Corpus synthesis
    is test scaffolding, not pipeline; its one-off cost is reported in
    extra.corpus_prep_sec. Round 1 timed synthesis + extraction together
    and rode a payload cache, which overstated steady-state throughput.
  * spark.catalog.clearCache() runs before every timed attempt, so min-of-2
    filters machine noise without letting any run ride another's cache.
  * Every query is forced end-to-end with the noop sink (full compute,
    no collect-to-driver cost).
  * Round 5: alongside the in-suite numbers, the watched expensive
    queries are re-timed ISOLATED — each in its own fresh subprocess /
    SparkSession, min-of-3 — and recorded under extra.isolated. In-suite
    numbers ride whatever JVM/GC state the preceding queries left
    behind; the isolated series makes regressions attributable to code
    vs session state vs host drift without a judge rerun (the round-4
    ivf_* "regression" burned a round on exactly that ambiguity).
    `python bench.py --isolate <query>` runs one such measurement;
    SPARK_GRAFT_NO_ISOLATE=1 skips the series (fast iteration).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "ocr_extract",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "window_running_sum",
    "sessionize",
    "asof_last_click",
    "cer_corpus",
    "vocab_build",
    "dedup_exact",
    "dedup_minhash_sig",
    "dedup_minhash_bands",
    "dedup_minhash_pipeline",
    "dedup_simhash",
    "dedup_jaccard",
    "similarity_topk",
    "similarity_topk_zip",
    "similarity_ivf_topk",
    "similarity_ivf_recall",
    "similarity_ivf_kmeans",
    "similarity_knn_join",
    "lang_id",
    "quality_score",
    "pivot_event_counts",
    "windowed_event_counts",
    "neardup_batch_mode",
    "multimodal_image_stats",
    "image_decode_stats",
    "pdf_extract_lines",
    "pdf_scanned_ocr",
]


# re-timed isolated (fresh subprocess + session, min-of-3) in the
# default run: the expensive rows whose in-suite numbers have shown
# suite/host sensitivity across rounds
ISOLATED = [
    "ocr_extract",
    "cer_corpus",
    "dedup_minhash_pipeline",
    "dedup_jaccard",
    "similarity_ivf_recall",
    "similarity_ivf_kmeans",
    "image_decode_stats",
    "pdf_extract_lines",
    # round-6 (verdict item 5): the two rows whose r5 in-suite numbers
    # needed a judge rerun to adjudicate
    "multimodal_image_stats",
    "pdf_scanned_ocr",
]


def force(df) -> int:
    df.write.mode("overwrite").format("noop").save()
    return 0


def prep_corpus(spark, sf_dir: str) -> str:
    """Materialize the derived interleaved corpus as parquet tables once
    (distributed, in-executors); reused across bench runs of the same sf.
    Cache keyed on a CONTENT fingerprint of the source documents table
    (golden.py's size+mtime recipe), not the path basename — regenerated
    testdata or two dirs sharing a basename can never serve a stale or
    foreign corpus."""
    from vietnamese_ocr_spark.golden import _fingerprint
    from vietnamese_ocr_spark.sources.sf_adapter import derive_documents, derive_media

    out = f"/tmp/vos_bench_corpus/{_fingerprint(sf_dir)}"
    docs_p, media_p = f"{out}/documents.parquet", f"{out}/media.parquet"
    marker = f"{out}/_READY"
    if not os.path.exists(marker):
        derive_documents(spark, sf_dir).write.mode("overwrite").parquet(docs_p)
        derive_media(spark, sf_dir).write.mode("overwrite").parquet(media_p)
        with open(marker, "w") as f:
            f.write("ok")
    return out


def main(isolate: str | None = None) -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from vietnamese_ocr_spark.config import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    entrymod._ship_package(spark)
    from vietnamese_ocr_spark.plans.queries import EXTRA_QUERIES

    qs = {**entrymod.queries(), **EXTRA_QUERIES}

    # session warmup (JVM/codegen), not counted
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    # warm the Python workers (pandas/numpy import + weight hydration is a
    # per-worker one-off that amortizes to zero on a long-running cluster;
    # same rationale and size as bench_scaling.py)
    def warm_workers():
        from vietnamese_ocr_spark.plans.extract import extract_df

        docs = spark.read.parquet(f"{corpus_dir}/documents.parquet").limit(512)
        media = spark.read.parquet(f"{corpus_dir}/media.parquet")
        warm, _ = extract_df(spark, docs, media)
        force(warm)

    t0 = time.perf_counter()
    corpus_dir = prep_corpus(spark, sf_dir)
    prep_sec = round(time.perf_counter() - t0, 3)
    warm_workers()

    def run_flagship():
        from vietnamese_ocr_spark.plans.extract import extract_df

        documents = spark.read.parquet(f"{corpus_dir}/documents.parquet")
        media = spark.read.parquet(f"{corpus_dir}/media.parquet")
        extracted, _ = extract_df(spark, documents, media)
        force(extracted)

    from vietnamese_ocr_spark.operators.dedup import release_persisted

    def timed_attempts(name: str, n: int) -> list[float]:
        """n cache-cold end-to-end walls for one query."""
        walls = []
        for _ in range(n):
            release_persisted()  # scoped release of operator caches
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            if name == "ocr_extract":
                run_flagship()
            else:
                force(qs[name](spark, sf_dir))
            walls.append(time.perf_counter() - t0)
        return walls

    if isolate is not None:
        # one query, fresh session (this process IS the isolation), min-of-3
        walls = timed_attempts(isolate, 3)
        spark.stop()
        print(json.dumps({"query": isolate, "isolated_sec": round(min(walls), 3),
                          "attempts": [round(w, 3) for w in walls]}))
        return 0

    # min of two runs per query: this VM shows multi-second noise spikes,
    # and min-wall is the standard filter for them; each attempt starts
    # cache-cold so the min is a real end-to-end time
    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(min(timed_attempts(name, 2)), 3)

    # flagship throughput: docs/sec through the extraction pipeline
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    docs_per_sec = round(n_docs / timings["ocr_extract"], 2)
    spark.stop()

    # isolated series: one subprocess per watched query so each gets a
    # fresh JVM/session — session-state-free numbers next to the in-suite
    # ones (see module docstring)
    isolated: dict[str, float] = {}
    if not os.environ.get("SPARK_GRAFT_NO_ISOLATE"):
        import subprocess

        for name in ISOLATED:
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--isolate", name],
                    capture_output=True, text=True, timeout=600,
                    env={**os.environ, "SPARK_GRAFT_NO_ISOLATE": "1"},
                )
                rec = json.loads(out.stdout.strip().splitlines()[-1])
                isolated[name] = rec["isolated_sec"]
            except Exception as ex:  # never fail the suite over the extra series
                isolated[name] = -1.0
                print(f"# isolate {name} failed: {ex}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (flagship ocr_extract + relational/dedup/similarity)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "extra": {
                    "ocr_docs_per_sec": docs_per_sec,
                    "cpus": cpus,
                    "corpus_prep_sec": prep_sec,
                    "isolated_min_of_3": isolated,
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--isolate":
        sys.exit(main(isolate=sys.argv[2]))
    sys.exit(main())
