"""Streaming exact-dedup: emit each content digest the FIRST time it is
seen, remembering history in keyed state (applyInPandasWithState).

The scale shape for deduplicating an endless document feed: digests are
hash-bucketed so state shards across executors; each bucket's state is a
FIXED-SIZE Bloom filter over the digests it has admitted, so state size is
bounded by construction — it never grows with stream length, and updating
it is O(k) bit-sets per digest (no sort, no re-serialization of a growing
set). The price is the standard Bloom trade: a false positive drops a
genuinely-new document as a duplicate with probability
~(1 - e^(-k*n/m))^k — at the defaults (m = 2^20 bits = 128 KiB/bucket,
k = 4) that is < 1e-4 after 10^5 admitted digests per bucket, and the
bucket fan-out (256 buckets via the 2-hex-char prefix) divides n further.
An exact-history variant would swap this for a TTL/RocksDB state store;
the plumbing (state schema, append mode, bucketed keys) is identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = "bucket string, doc_id string, digest string"
STATE_DDL = "bloom binary, n_seen bigint"

BLOOM_BITS = 1 << 20  # 128 KiB per bucket — FIXED, never grows
BLOOM_K = 4


def _bit_positions(digest: str) -> list[int]:
    """k deterministic bit positions from the md5 of the digest string."""
    h = hashlib.md5(digest.encode("utf-8")).digest()
    return [
        int.from_bytes(h[4 * i : 4 * i + 4], "big") % BLOOM_BITS
        for i in range(BLOOM_K)
    ]


def bloom_contains_and_add(bloom: np.ndarray, digest: str) -> bool:
    """Test-and-set: returns True if the digest was (probably) already
    present; always leaves all k bits set afterwards. `bloom` is a uint8
    array of BLOOM_BITS // 8 bytes, mutated in place."""
    seen = True
    for pos in _bit_positions(digest):
        byte, bit = pos >> 3, pos & 7
        if not (bloom[byte] >> bit) & 1:
            seen = False
            bloom[byte] = bloom[byte] | (1 << bit)
    return seen


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        bloom_bytes, n_seen = state.get
        bloom = np.frombuffer(bloom_bytes, dtype=np.uint8).copy()
    else:
        bloom = np.zeros(BLOOM_BITS // 8, dtype=np.uint8)
        n_seen = 0
    fresh_rows: list[dict] = []
    for pdf in pdfs:
        for doc_id, digest in zip(pdf["doc_id"], pdf["digest"]):
            if not bloom_contains_and_add(bloom, digest):
                n_seen += 1
                fresh_rows.append(
                    {"bucket": key[0], "doc_id": doc_id, "digest": digest}
                )
    state.update((bloom.tobytes(), int(n_seen)))
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
