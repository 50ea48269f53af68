"""Document chunking: fixed token-budget windows with overlap — the
standard preprocessing step in front of embedding pipelines (context-
window-bounded encoders) and long-document pretraining (strided
splits so no span is lost at a hard boundary).

Spark-first shape — every expression is native (split / slice /
sequence / explode / array_join inside whole-stage codegen; no
higher-order lambdas, no Python in the row path):

- tokenize once per document (whitespace tokens, matching
  `textstats.tokens`), compute the chunk-start sequence
  ``0, stride, 2*stride, …`` with ``F.sequence``, ``explode`` it
  (one output row per chunk — the same explode-don't-loop shape as
  the MinHash shingler), then ``slice`` + ``array_join`` to
  re-materialize each chunk's text.
- one narrow shuffle-free stage: chunking is row-local; the output
  carries (doc_id, chunk_id, n_chunks, chunk text, token count), so
  downstream grouping (e.g. mean-pooling chunk embeddings back to
  document vectors) shuffles only the 8-byte doc key.
- at 100 TB the fan-out is bounded and predictable:
  ``ceil(max(n_tokens - overlap, 1) / stride)`` rows per document;
  pair with `partitioning.widen_if_narrow` upstream when feeding a
  CPU-heavy encoder so the exploded rows spread across the cluster.

The reference engine has no text-chunking surface (clinical rows are
schema-bounded); this belongs to the training-data extension family
(SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trial_submission_studio_spark.operators.textstats import tokens

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    overlap_tokens: int = 0,
    drop_empty: bool = True,
) -> DataFrame:
    """Split each document into whitespace-token windows of
    ``chunk_tokens`` tokens advancing by ``chunk_tokens -
    overlap_tokens`` (so consecutive chunks share ``overlap_tokens``
    tokens). Returns one row per chunk:

    ``(id, chunk_id, n_chunks, chunk, n_tokens)``

    - ``chunk_id`` is 0-based and dense per document;
    - the final chunk may be short (the tail is never dropped, and a
      window that would only repeat the previous chunk's overlap is
      not emitted);
    - ``drop_empty`` skips documents with no tokens (NULL/blank
      text) entirely; pass False to keep a single empty chunk row
      for provenance-complete accounting.

    Chunking is deterministic and row-local (zero shuffles — the
    plan is scan → project → explode → project), so it composes with
    any upstream partitioning.
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("overlap_tokens must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap_tokens
    toks = tokens(text_col)
    n = F.size(toks)
    # last start: the largest multiple of stride still opening a
    # window with novel tokens — ceil(max(n - overlap, 1)/stride) - 1
    last_start = (
        F.floor(
            (F.greatest(n - F.lit(overlap_tokens), F.lit(1)) - 1)
            / F.lit(stride)
        )
        * stride
    ).cast("int")
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
        last_start.alias("__last"),
    )
    if drop_empty:
        base = base.filter(F.col("__n") > 0)
    else:
        base = base.withColumn("__last", F.greatest(F.col("__last"), F.lit(0)))
    out = base.select(
        id_col,
        "__toks",
        "__n",
        (F.col("__last") / F.lit(stride)).cast("int").alias("__nc"),
        F.explode(
            F.sequence(F.lit(0), F.col("__last"), F.lit(stride))
        ).alias("__start"),
    )
    return out.select(
        F.col(id_col),
        (F.col("__start") / F.lit(stride)).cast("int").alias("chunk_id"),
        (F.col("__nc") + 1).alias("n_chunks"),
        F.array_join(
            # slice() is 1-indexed
            F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens),
            " ",
        ).alias("chunk"),
        F.least(
            F.col("__n") - F.col("__start"), F.lit(chunk_tokens)
        ).cast("int").alias("n_tokens"),
    )
