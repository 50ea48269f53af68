"""Corpus-repeated substring removal (ExactSubstr-style).

"Deduplicating Training Data Makes Language Models Better" (Lee et
al., 2022) removes text runs that recur verbatim across a corpus —
license headers, templated intros — which survive document- and
paragraph-level dedup because the *documents* differ. The paper
builds a corpus suffix array; that is a single-machine construction
that does not distribute. This module implements the standard
scalable approximation: fixed-width token *windows* (w tokens, unit
stride), window-hash document frequency, and per-document excision of
every token covered by a repeated window.

Guarantees relative to the suffix-array formulation: any repeated run
of >= w tokens is fully detected (every w-window inside it repeats);
runs shorter than w are never flagged. The boundary over-approximates
by < w tokens on each side of a repeated run only when stride > 1 is
chosen for cost reasons.

Scale shape:

- Window hashing stays inside one expression per document (a
  higher-order ``transform`` over the token array), so the token
  array is never duplicated per window; exploded rows carry only
  (id, start, 8-byte hash).
- Document frequency is a map-side-combined count on the 8-byte
  window hash; the join back is the same 8-byte key. Paragraph-dedup
  economics (see :mod:`.paragraphs`), finer granularity.
- Excision is pure array logic per document: token i survives unless
  some flagged start s covers it (s <= i < s + w).

Output text is whitespace-normalized (tokens rejoined with single
spaces) — the same canonicalization every downstream tokenizer
applies anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _window_rows(
    df: DataFrame, id_col: str, text_col: str, w: int, stride: int
) -> DataFrame:
    """(id, start, whash) for every w-token window; empty for docs
    shorter than w tokens (NULL text = zero windows).

    Formulated as posexplode + ``lead`` chains rather than a
    higher-order ``transform`` lambda: Spark *interprets* HOF lambdas
    (~10× slower than codegen — the same reason minhash shingles use
    explode+substr), while the w-1 ``lead`` calls compile into one
    whole-stage-codegen window pass. The per-doc window shuffle is
    the only shuffle, and it doubles as the widen step for narrow
    inputs.
    """
    from pyspark.sql import Window as W

    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    tok_rows = df.select(
        F.col(id_col), F.posexplode(toks).alias("start", "__t0")
    )
    win = W.partitionBy(id_col).orderBy("start")
    parts = [F.col("__t0")] + [
        F.lead("__t0", i).over(win) for i in range(1, w)
    ]
    full = (
        F.lead("__t0", w - 1).over(win).isNotNull() if w > 1 else F.lit(True)
    )
    out = tok_rows.select(
        id_col,
        "start",
        F.when(full, F.xxhash64(F.concat_ws(" ", *parts))).alias("whash"),
    ).filter(F.col("whash").isNotNull())
    if stride > 1:
        out = out.filter(F.col("start") % stride == 0)
    return out


def repeated_window_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 50,
    min_doc_freq: int = 2,
    stride: int = 1,
) -> DataFrame:
    """Flagged window starts: (id, start) for every w-token window
    whose hash occurs in >= ``min_doc_freq`` distinct documents."""
    wins = _window_rows(df, id_col, text_col, w, stride)
    freq = wins.groupBy("whash").agg(
        F.countDistinct(id_col).alias("__df")
    )
    return (
        wins.join(freq.filter(F.col("__df") >= min_doc_freq), "whash")
        .select(id_col, "start")
    )


def remove_repeated_substrings(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 50,
    min_doc_freq: int = 2,
    stride: int = 1,
) -> DataFrame:
    """Excise every corpus-repeated w-token run from every document.

    Removal applies to ALL occurrences (mirroring the paper's
    default); documents with nothing flagged pass through with
    whitespace-normalized text. Returns one row per input document:
    (id, text, n_tokens, n_removed).
    """
    if w < 1 or min_doc_freq < 2 or stride < 1:
        raise ValueError("need w >= 1, min_doc_freq >= 2, stride >= 1")
    spans = (
        repeated_window_spans(df, id_col, text_col, w, min_doc_freq, stride)
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("start")).alias("__starts"))
    )
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    starts = F.coalesce(F.col("__starts"), F.array().cast("array<int>"))
    covered = lambda i: F.exists(  # noqa: E731 — bound per-token predicate
        starts, lambda s: (i >= s) & (i < s + w)
    )
    kept = F.filter(toks, lambda x, i: ~covered(i))
    return (
        df.join(spans, id_col, "left")
        .select(
            F.col(id_col),
            F.concat_ws(" ", kept).alias(text_col),
            F.size(toks).cast("long").alias("n_tokens"),
            (F.size(toks) - F.size(kept)).cast("long").alias("n_removed"),
        )
    )
