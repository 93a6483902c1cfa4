"""Text-span normalization: boilerplate strip + whitespace canonicalization.

north_rule: "HTML boilerplate strip ... DOM heuristics". The Spark side is a
pure-Column regexp chain (JVM-side, whole-stage-codegen friendly — no UDF);
`normalize_py` is the byte-identical Python mirror used by the oracle.
Patterns are restricted to the regex subset where Java and Python agree.

Reference analog: the text path of the rebuild (SURVEY.md §3 E1 Spark
lifecycle); the reference itself only strips special tokens
(src/utils/inference.py:97-103) — boilerplate stripping is the
extraction-engine generalization required by BASELINE.json north_rule.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# boilerplate containers whose *content* is dropped
_DROP_TAGS = ("nav", "script", "style", "header", "footer", "aside")
_DROP_PATTERNS = [rf"(?s)<{t}\b[^>]*>.*?</{t}>" for t in _DROP_TAGS]
# any remaining markup tags are unwrapped (content kept)
_TAG_PATTERN = r"<[^>]+>"
# explicit ASCII class, NOT \s: Python re \s matches unicode whitespace
# (NBSP, U+2028, ...) while Java's default \s is ASCII-only, so \s would
# silently fork the Spark and oracle normalizations on non-ASCII whitespace
_WS_PATTERN = r"[ \t\r\n\f\x0B]+"


def normalize_text(col: Column) -> Column:
    """Boilerplate-strip + normalize as a Catalyst expression chain."""
    out = col
    for pat in _DROP_PATTERNS:
        out = F.regexp_replace(out, pat, " ")
    out = F.regexp_replace(out, _TAG_PATTERN, " ")
    out = F.regexp_replace(out, _WS_PATTERN, " ")
    return F.trim(out)


_DROP_RES = [re.compile(p) for p in _DROP_PATTERNS]
_TAG_RE = re.compile(_TAG_PATTERN)
_WS_RE = re.compile(_WS_PATTERN)


def normalize_py(text: str) -> str:
    """Python mirror of :func:`normalize_text` (oracle side)."""
    out = text
    for pat in _DROP_RES:
        out = pat.sub(" ", out)
    out = _TAG_RE.sub(" ", out)
    out = _WS_RE.sub(" ", out)
    return out.strip()


# block-level boundaries for densitometric main-content classification
_BLOCK_SEP = r"</?(?:p|div|h[1-6]|li|ul|ol|table|tr|br)\b[^>]*/?>"
_ANCHOR_PATTERN = r"(?s)<a\b[^>]*>(.*?)</a>"


def extract_main_content(
    col: Column, min_block_len: int = 20, max_link_density: float = 0.4
) -> Column:
    """Densitometric main-content extraction (the north_rule's "DOM
    heuristics"): split on block-level tags, score each block by text
    length and link density, keep content-like blocks, restitch.

    The classifier is the public Boilerpipe heuristic (Kohlschuetter et
    al., "Boilerplate Detection using Shallow Text Features", WSDM'10):
    boilerplate blocks are short and/or link-dense, content blocks are
    long and link-sparse. Everything is a Catalyst expression chain —
    split + higher-order array functions, zero Python in the hot path —
    so it whole-stage-codegens over a 100-TB text column.
    """
    pre = col
    for pat in _DROP_PATTERNS:
        pre = F.regexp_replace(pre, pat, " ")
    blocks = F.split(pre, _BLOCK_SEP)
    scored = F.transform(
        blocks,
        lambda b: F.struct(
            F.trim(
                F.regexp_replace(F.regexp_replace(b, _TAG_PATTERN, " "), _WS_PATTERN, " ")
            ).alias("txt"),
            F.aggregate(
                F.regexp_extract_all(b, F.lit(_ANCHOR_PATTERN), 1),
                F.lit(0),
                lambda acc, x: acc + F.length(x),
            ).alias("link_len"),
        ),
    )
    kept = F.filter(
        scored,
        lambda s: (F.length(s["txt"]) >= min_block_len)
        & (s["link_len"] <= max_link_density * F.length(s["txt"])),
    )
    return F.array_join(F.transform(kept, lambda s: s["txt"]), " ")


_BLOCK_RE = re.compile(_BLOCK_SEP)
_ANCHOR_RE = re.compile(_ANCHOR_PATTERN)


def extract_main_content_py(
    text: str, min_block_len: int = 20, max_link_density: float = 0.4
) -> str:
    """Python mirror of :func:`extract_main_content` (test oracle)."""
    pre = text
    for pat in _DROP_RES:
        pre = pat.sub(" ", pre)
    out = []
    for b in _BLOCK_RE.split(pre):
        txt = _WS_RE.sub(" ", _TAG_RE.sub(" ", b)).strip()
        link_len = sum(len(m) for m in _ANCHOR_RE.findall(b))
        if len(txt) >= min_block_len and link_len <= max_link_density * len(txt):
            out.append(txt)
    return " ".join(out)


def with_empty_fallback(col: Column, fallback: str = "a") -> Column:
    """Empty prediction -> literal 'a' (src/utils/inference.py:108-110)."""
    return F.when(F.length(col) == 0, F.lit(fallback)).otherwise(col)
