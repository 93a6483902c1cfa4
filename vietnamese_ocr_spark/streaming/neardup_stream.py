"""Streaming NEAR-duplicate detection: MinHash bands over keyed state.

The streaming complement of the batch MinHash-LSH pipeline
(operators/dedup.py): each arriving document computes its k MinHash
values JVM-side (the same md5(perm:shingle) permutations as the batch
operator), is routed to its band bucket, and the bucket's keyed state
remembers the signatures it has admitted. A new doc whose estimated
Jaccard (matching minhash fraction) against any remembered doc clears
the threshold is emitted as a match (new_doc, matched_doc, est_jaccard);
otherwise the doc is admitted to state.

State is bounded: each bucket keeps at most `cap` signatures,
FIFO-evicted — the same fixed-memory discipline as the Bloom dedup
stream (dedup_stream.py). Band bucketing means a doc only compares
against its bucket's residents, never the stream — the LSH candidate
cut, incrementally.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import minhash_signatures

OUTPUT_DDL = "doc_id string, matched_doc string, est_jaccard double"
STATE_DDL = "doc_ids array<string>, sigs array<string>"

SIG_K = 4
BAND_CHARS = 2
DEFAULT_CAP = 1024


def _neardup_fn(cap: int, threshold: float):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            doc_ids, sigs = (list(v) for v in state.get)
        else:
            doc_ids, sigs = [], []
        out: list[dict] = []
        for pdf in pdfs:
            for doc_id, sig in zip(pdf["doc_id"], pdf["sig"]):
                parts = sig.split("|")
                best, best_doc = 0.0, None
                for other_id, other_sig in zip(doc_ids, sigs):
                    o = other_sig.split("|")
                    est = sum(a == b for a, b in zip(parts, o)) / len(parts)
                    if est > best:
                        best, best_doc = est, other_id
                if best_doc is not None and best >= threshold:
                    out.append(
                        {"doc_id": doc_id, "matched_doc": best_doc,
                         "est_jaccard": round(best, 6)}
                    )
                else:
                    doc_ids.append(doc_id)
                    sigs.append(sig)
                    if len(doc_ids) > cap:  # FIFO eviction -> bounded state
                        doc_ids.pop(0)
                        sigs.pop(0)
        state.update((doc_ids, sigs))
        yield pd.DataFrame(out, columns=["doc_id", "matched_doc", "est_jaccard"])

    return fn


def neardup_projection(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, sig, bucket): the signature + state-
    shard routing every arrival gets before the keyed-state compare.
    Batch/stream agnostic (pure projection), so the batch-mode driver
    query (plans/queries.py q_neardup_batch_mode) value-checks exactly
    the projection the stream runs."""
    sig_cols = [F.col(f"mh{j}") for j in range(SIG_K)]
    return minhash_signatures(docs).select(
        "doc_id",
        F.concat_ws("|", *sig_cols).alias("sig"),
        # band bucket: truncated first-hash prefix routes state shards
        F.substring("mh0", 1, BAND_CHARS).alias("bucket"),
    )


def neardup_stream(
    docs_stream: DataFrame,
    threshold: float = 0.75,
    cap: int = DEFAULT_CAP,
) -> DataFrame:
    """docs_stream(doc_id, text) -> stream of (doc_id, matched_doc,
    est_jaccard) for arrivals near-duplicating an earlier doc."""
    signed = neardup_projection(docs_stream)
    return signed.groupBy("bucket").applyInPandasWithState(
        _neardup_fn(cap, threshold),
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
