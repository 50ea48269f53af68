"""Shared text tokenizer for the lexical operators (BM25, n-gram
LMs, contamination shingles).

Two conventions, selected per call:

- ``token_pattern=None`` (default): split on whitespace. This is the
  historical convention shared by `bm25.py`, `lm.py`, and
  `contamination.py` — deliberately identical across the three so a
  decontamination probe and the LM that scores the same corpus agree
  on what a "word" is. It keeps punctuation attached ("word." ≠
  "word"), which depresses recall on punctuated benchmark text.
- ``token_pattern=WORD_PATTERN`` (or any Java regex): extract all
  matches instead of splitting. ``WORD_PATTERN`` keeps letter runs
  and digit runs (``\\p{L}+|\\p{N}+``), so "word." tokenizes to
  "word" and recall on punctuated text recovers. Opt-in so the
  whitespace default — and every pinned oracle — stays byte-stable.

Both shapes stay whole-stage-codegen JVM expressions (`split` /
`regexp_extract_all`); no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["WORD_PATTERN", "words"]

#: punctuation-aware option: unicode letter runs | digit runs
WORD_PATTERN = r"[\p{L}\p{M}]+|\p{N}+"


def words(
    c: Column | str, lowercase: bool = True, token_pattern: str | None = None
) -> Column:
    """Array-of-tokens expression for a text column. NULL/blank →
    empty array (never a 1-element ``[""]``)."""
    s = F.trim((F.col(c) if isinstance(c, str) else c).cast("string"))
    if lowercase:
        s = F.lower(s)
    if token_pattern is None:
        toks = F.split(s, r"\s+")
    else:
        toks = F.regexp_extract_all(s, F.lit(token_pattern), 0)
    return F.when(s.isNull() | (s == ""), F.array().cast("array<string>")).otherwise(
        toks
    )
