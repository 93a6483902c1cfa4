"""Seeded epoch reshuffle (S2/O4): the reference's DataLoader(shuffle=True)
with a fixed torch seed (src/utils/dataloader.py:18-19,36).

Two modes:

* `epoch_reshuffle(df, seed, key_col)` — KEYED: order by
  md5(seed:epoch:key). A seeded pseudo-random permutation that is
  reproducible across engines AND cluster sizes: the sort key is a pure
  function of the row, so 8 executors and 800 produce the identical
  epoch order. This is the scale-correct distributed analog of a seeded
  sampler — `orderBy(rand(seed))` cannot give that guarantee, because
  Spark's rand(seed) streams per (partition, row-index) and therefore
  reorders whenever partitioning changes.

* `epoch_reshuffle_rand(df, seed)` — the literal orderBy(rand(seed))
  form: deterministic within a fixed session/partitioning (covered by a
  determinism test), engine-internal by design.

Epochs: vary `epoch` to get a fresh permutation per epoch from one seed,
exactly like the reference's per-epoch reshuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shuffle_key(key_col: str, seed: int, epoch: int = 0):
    return F.md5(F.concat_ws(":", F.lit(str(seed)), F.lit(str(epoch)), F.col(key_col)))


def epoch_reshuffle(
    df: DataFrame, seed: int, key_col: str, epoch: int = 0
) -> DataFrame:
    """Keyed seeded permutation; ties (identical keys, astronomically
    unlikely with md5) break on the key column itself."""
    return df.orderBy(shuffle_key(key_col, seed, epoch), F.col(key_col))


def epoch_reshuffle_rand(df: DataFrame, seed: int) -> DataFrame:
    """Literal orderBy(rand(seed)) — the reference's exact idiom."""
    return df.orderBy(F.rand(seed))
