"""Character vocabulary with the reference's indexing contract.

Reference semantics (src/utils/vocab.py):
  - vocab = sorted distinct characters across the label corpus (:10-15)
  - specials: <sos>=0, <eos>=1, <pad>=2 (:33-39); real chars indexed from 3
  - vocab_size = len(vocab) + 3 (:23)
  - encode = [<sos>, c1..cn, <eos>] (:25-27)
  - decode = drop specials, join chars (:28-31)
"""

from __future__ import annotations

SOS, EOS, PAD = 0, 1, 2
N_SPECIALS = 3

# The engine's fixed character domain: Vietnamese lowercase alphabet with
# full diacritics plus digits. Labels/truths are drawn from this set; the
# per-corpus vocab *build* (operator A1) still exists as a query, but the
# recognizer ships with the full domain so weights don't depend on data.
VIETNAMESE_CHARS = (
    "0123456789"
    "aàáảãạăằắẳẵặâầấẩẫậ"
    "bcd"
    "đ"
    "eèéẻẽẹêềếểễệ"
    "ghiìíỉĩịklmn"
    "oòóỏõọôồốổỗộơờớởỡợ"
    "pqrst"
    "uùúủũụưừứửữự"
    "vxyỳýỷỹỵ"
)


class Vocabulary:
    """letter<->index maps; chars sorted by codepoint, ids from 3."""

    def __init__(self, chars: str = VIETNAMESE_CHARS):
        uniq = sorted(set(chars))  # codepoint order = Spark binary collation (O1)
        self.letters = uniq
        self.letter_to_idx = {c: i + N_SPECIALS for i, c in enumerate(uniq)}
        self.idx_to_letter = {i + N_SPECIALS: c for i, c in enumerate(uniq)}
        self.size = len(uniq) + N_SPECIALS

    def encode(self, text: str) -> list[int]:
        return [SOS] + [self.letter_to_idx[c] for c in text] + [EOS]

    def decode(self, ids: list[int]) -> str:
        return "".join(self.idx_to_letter[i] for i in ids if i >= N_SPECIALS)
