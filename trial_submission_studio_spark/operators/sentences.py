"""Sentence segmentation + sentence-boundary chunking.

Token-window chunking (`chunking.py`) cuts mid-sentence; encoder
inputs and RAG corpora usually want chunks that END on sentence
boundaries. Two layers:

- :func:`split_sentences` — an ALL-JVM codegen expression: common
  abbreviations (configurable) are dot-protected with a sentinel,
  the text splits on terminal punctuation followed by whitespace
  and an upper-case/digit/quote opener, and sentinels restore.
  Deliberately rule-based: deterministic, language-configurable,
  zero Python in the row path (the pragmatic pipeline default; a
  model-based segmenter is a drop-in at the same column contract).
- :func:`chunk_documents_sentences` — greedy packing of consecutive
  sentences into ≤ ``chunk_tokens`` whitespace-token chunks via one
  ``applyInPandas`` per document (bounded per-doc work, one shuffle
  on the id key — the same shape as sequence packing). A single
  over-long sentence becomes its own over-budget chunk rather than
  being split mid-sentence (flagged in ``n_tokens``).

Reference parity note: the reference engine
(rubentalstra/Trial-Submission-Studio) has no corpus surface; this
extends the text family (SURVEY.md §2.13) beside `chunking.py`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["split_sentences", "chunk_documents_sentences", "DEFAULT_ABBREVIATIONS"]

#: dot-terminated tokens that do NOT end a sentence
DEFAULT_ABBREVIATIONS = (
    "Mr", "Mrs", "Ms", "Dr", "Prof", "Sr", "Jr", "St", "No", "vs",
    "etc", "e.g", "i.e", "cf", "al", "Inc", "Ltd", "Co", "Corp",
    "U.S", "U.K", "Fig", "Eq", "approx",
)

_SENTINEL = "\ue000"  # private-use char: survives the split untouched


def split_sentences(
    c: Column | str,
    abbreviations: tuple = DEFAULT_ABBREVIATIONS,
) -> Column:
    """→ ``array<string>`` of sentences. All-JVM: N codegen
    regexp_replace passes (N = abbreviation count) + one split, then
    two interpreted array lambdas (restore + blank-filter) over the
    BOUNDED per-document sentence array — no Python anywhere."""
    col = F.col(c) if isinstance(c, str) else c
    t = F.trim(col.cast("string"))
    for abbr in abbreviations:
        # protect "<abbr>." when followed by space+word (mid-sentence)
        pat = r"(?i)\b" + abbr.replace(".", r"\.") + r"\.(?=\s)"
        t = F.regexp_replace(t, pat, abbr.replace(".", _SENTINEL) + _SENTINEL)
    # bounded variable-length lookbehind: terminal punctuation,
    # optionally followed by a closing quote/bracket
    parts = F.split(t, r"""(?<=[.!?]["')\]]?)\s+(?=["'(\[]?[A-Z0-9])""")
    restored = F.transform(
        parts, lambda s: F.regexp_replace(s, _SENTINEL, ".")
    )
    return F.filter(restored, lambda s: F.trim(s) != "")


def chunk_documents_sentences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    abbreviations: tuple = DEFAULT_ABBREVIATIONS,
) -> DataFrame:
    """Greedy sentence packing → ``(id, chunk_id, n_chunks, chunk,
    n_tokens, n_sentences)``: consecutive sentences accumulate until
    adding the next would exceed ``chunk_tokens``. Chunks reproduce
    the sentence text joined by single spaces; every sentence lands
    in exactly one chunk, in order."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    sent_df = df.select(
        F.col(id_col),
        split_sentences(text_col, abbreviations).alias("__sents"),
    ).filter(F.size("__sents") > 0)

    def pack(pdf):
        import pandas as pd

        out = {
            id_col: [], "chunk_id": [], "n_chunks": [], "chunk": [],
            "n_tokens": [], "n_sentences": [],
        }
        for _, row in pdf.iterrows():
            chunks: list[tuple[list, int, int]] = []
            cur: list[str] = []
            cur_tok = 0
            for s in row["__sents"]:
                n = len(s.split())
                if cur and cur_tok + n > chunk_tokens:
                    chunks.append((cur, cur_tok, len(cur)))
                    cur, cur_tok = [], 0
                cur.append(s)
                cur_tok += n
            if cur:
                chunks.append((cur, cur_tok, len(cur)))
            for ci, (sents, toks, ns) in enumerate(chunks):
                out[id_col].append(row[id_col])
                out["chunk_id"].append(ci)
                out["n_chunks"].append(len(chunks))
                out["chunk"].append(" ".join(sents))
                out["n_tokens"].append(toks)
                out["n_sentences"].append(ns)
        return pd.DataFrame(out)

    # id column keeps its INPUT type (string/int/long all work) —
    # hardcoding `long` here would fail at runtime for string ids
    id_type = df.schema[id_col].dataType.simpleString()
    return sent_df.groupBy(id_col).applyInPandas(
        pack,
        f"{id_col} {id_type}, chunk_id int, n_chunks int, chunk string, "
        "n_tokens int, n_sentences int",
    )
