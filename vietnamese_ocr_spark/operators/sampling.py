"""Deterministic hash sampling: reproducible corpus subsetting.

Training-data pipelines need samples that are (a) reproducible across
runs AND cluster sizes — rand(seed) is neither, its draw depends on
partition layout — and (b) cheap: no shuffle, no sort, one codegen'd
filter over the scan. Keying the decision on md5(seed:key) gives both:
a row's fate depends only on its key, so resampling at 1000x scale or
on a different partitioning selects the same rows.

The acceptance test `md5_hex < threshold` compares lowercase hex strings
lexicographically, which equals numeric order on the first 8 hex digits —
and both Spark's and DuckDB's md5() emit lowercase hex, so the oracle is
bit-exact (same trick as operators/reshuffle.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_threshold(frac: float) -> str:
    """fraction in [0,1] -> 8-hex-digit cutoff ('0.25' -> '40000000').

    frac >= 1.0 returns 'g0000000', which sorts above every hex string,
    so keep-all really keeps all (a 'ffffffff' cutoff would drop hashes
    with that exact prefix)."""
    if frac >= 1.0:
        return "g0000000"
    return format(int(frac * (1 << 32)), "08x")


def _accept(key: Column, frac: float, seed: int) -> Column:
    return F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), key)), 1, 8) < _hex_threshold(frac)


def hash_sample(df: DataFrame, key: str, frac: float, seed: int = 42) -> DataFrame:
    """Keep ~frac of rows, decided per-key by md5(seed:key)."""
    return df.filter(_accept(F.col(key), frac, seed))


def stratified_hash_sample(
    df: DataFrame, key: str, strata_col: str, fracs: dict[str, float], seed: int = 42
) -> DataFrame:
    """Per-stratum fractions (e.g. downsample dominant languages, keep
    all of the rare ones). Strata absent from `fracs` are dropped —
    make the default explicit with fracs={..., other: 1.0} patterns
    upstream if pass-through is wanted."""
    acc = F.lit(False)
    for stratum, frac in sorted(fracs.items()):
        acc = F.when(
            F.col(strata_col) == stratum, _accept(F.col(key), frac, seed)
        ).otherwise(acc)
    return df.filter(acc)
