"""Streaming exact-dedup: emit each content digest the FIRST time it is
seen, remembering history in keyed state (applyInPandasWithState).

The scale shape for deduplicating an endless document feed: digests are
hash-bucketed so state shards across executors; each bucket's state is the
set of digests it has admitted. At 10^12 scale you'd cap state with a TTL
/ bloom filter — the plumbing (state schema, timeout hooks, append mode)
is exactly this.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = "bucket string, doc_id string, digest string"
STATE_DDL = "seen array<string>"
N_BUCKETS = 64


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen: set[str] = set(state.get[0]) if state.exists else set()
    fresh_rows: list[dict[str, Any]] = []
    for pdf in pdfs:
        for doc_id, digest in zip(pdf["doc_id"], pdf["digest"]):
            if digest not in seen:
                seen.add(digest)
                fresh_rows.append(
                    {"bucket": key[0], "doc_id": doc_id, "digest": digest}
                )
    state.update((sorted(seen),))
    yield pd.DataFrame(fresh_rows, columns=["bucket", "doc_id", "digest"])


def first_seen_stream(docs_stream: DataFrame) -> DataFrame:
    """docs_stream(doc_id, spans) -> stream of first-seen (doc_id, digest).

    digest = md5 of the canonical JSON of the span array (JVM-side);
    bucket = digest prefix -> state shards evenly across executors."""
    digested = docs_stream.select(
        "doc_id",
        F.md5(F.to_json("spans")).alias("digest"),
    ).withColumn("bucket", F.substring("digest", 1, 2))
    return digested.groupBy("bucket").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
