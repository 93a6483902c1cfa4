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


def with_empty_fallback(col: Column, fallback: str = "a") -> Column:
    """Empty prediction -> literal 'a' (src/utils/inference.py:108-110)."""
    return F.when(F.length(col) == 0, F.lit(fallback)).otherwise(col)
