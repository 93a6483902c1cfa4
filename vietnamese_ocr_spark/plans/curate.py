"""Corpus-curation job: the standard pre-training data pass, composed
from the engine's operator families.

    quality gate -> repetition gate -> near-dup canonical dedup
                 -> deterministic hash sample -> curated parquet

Every stage is one of the individually-oracled operators
(operators/textstats.py, dedup.py, components.py, sampling.py); this
plan just composes them and reports per-stage survivor counts — the
numbers a data-curation run is judged by. Gates join back on doc_id
(broadcast-eligible id sets), so document text crosses the wire exactly
once, at the final write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.components import canonical_docs
from ..operators.dedup import jaccard_candidates
from ..operators.sampling import hash_sample
from ..operators.textstats import quality_stats, repetition_stats


def curate_df(
    docs: DataFrame,
    jaccard_threshold: float = 0.5,
    sample_frac: float = 1.0,
    seed: int = 42,
    with_quality: bool = True,
    with_repetition: bool = True,
    with_dedup: bool = True,
) -> tuple[DataFrame, dict]:
    """docs(doc_id, text, ...) -> (curated docs, per-stage counts).

    Stage counts run as separate count() actions — acceptable for a
    batch curation job where the counts ARE a deliverable; pass the
    result straight to .write otherwise.
    """
    stats = {"input": docs.count()}
    kept = docs
    if with_quality:
        ok = quality_stats(kept).filter(F.col("quality_keep") == 1).select("doc_id")
        kept = kept.join(ok, "doc_id")
        stats["after_quality"] = kept.count()
    if with_repetition:
        ok = repetition_stats(kept).filter(F.col("repetition_keep") == 1).select("doc_id")
        kept = kept.join(ok, "doc_id")
        stats["after_repetition"] = kept.count()
    if with_dedup:
        pairs = jaccard_candidates(kept, threshold=jaccard_threshold)
        kept = canonical_docs(pairs, kept)
        stats["after_dedup"] = kept.count()
    if sample_frac < 1.0:
        kept = hash_sample(kept, "doc_id", sample_frac, seed)
        stats["after_sample"] = kept.count()
    return kept, stats
