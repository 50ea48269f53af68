"""Corpus-wide paragraph-frequency dedup (boilerplate removal).

Web-crawl training corpora carry boilerplate paragraphs — cookie
banners, nav text, "subscribe" footers — repeated across thousands of
pages. The CCNet / RefinedWeb recipe drops any paragraph whose
*document frequency* (number of distinct documents containing it)
exceeds a cutoff, then reassembles each document from its surviving
paragraphs in original order.

Distinct from :mod:`.textstats`'s ``dup_paragraph_fraction_e4``:
that scores repetition *within* one document (a Gopher quality
signal); this module dedups *across* the corpus.

Scale shape (the 100 TB story):

- Documents explode to (doc_id, pos, paragraph) — row count grows by
  the mean paragraph count, but each row is one paragraph, not one
  document, so partition sizes stay bounded.
- Document frequency aggregates on ``xxhash64`` of the normalized
  paragraph, NOT the paragraph text: the shuffle moves 8-byte keys
  plus partial counts (map-side combine), never paragraph bodies.
  (Collision odds at 2^64 are ~n²/2⁶⁵ — immaterial below ~10¹⁸
  distinct paragraphs.)
- The frequency join shuffles both sides on the same 8-byte key.
- Reassembly groups by doc_id; ``collect_list`` here is bounded by a
  single document's own paragraph count — never corpus-cardinality.

Three shuffles total (freq agg, freq join, reassembly), all on keys
the semantics force.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm_para(c: Column, normalize: bool) -> Column:
    return F.lower(F.trim(c)) if normalize else c


def split_paragraphs(
    df: DataFrame, id_col: str, text_col: str, sep: str = "\n"
) -> DataFrame:
    """Explode documents into (id, pos, para) rows.

    ``sep`` is a literal separator (regex-escaped before hitting
    Spark's regex-based ``split``); the limit of -1 preserves trailing
    empty paragraphs so reassembly is lossless. NULL text coalesces
    to one empty paragraph — posexplode of a NULL array would
    otherwise silently DROP the document from the output.
    """
    parts = F.split(F.coalesce(F.col(text_col), F.lit("")), re.escape(sep), -1)
    return df.select(F.col(id_col), F.posexplode(parts).alias("pos", "para"))


def paragraph_doc_freq(
    exploded: DataFrame,
    id_col: str,
    para_col: str = "para",
    normalize: bool = True,
) -> DataFrame:
    """Document frequency per (normalized) paragraph: (pkey, doc_freq).

    ``pkey`` is ``xxhash64`` of the normalized paragraph — join back
    on it, not on paragraph text (see module note on shuffle width).
    """
    key = F.xxhash64(_norm_para(F.col(para_col), normalize))
    return exploded.groupBy(key.alias("pkey")).agg(
        F.countDistinct(id_col).cast("long").alias("doc_freq")
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    max_docs: int = 1,
    normalize: bool = True,
) -> DataFrame:
    """Remove paragraphs shared by more than ``max_docs`` documents.

    Returns one row per input document: ``(id_col, text_col, n_kept,
    n_dropped)`` with ``text_col`` rebuilt from surviving paragraphs
    in original order (empty string when everything was boilerplate).

    ``max_docs=1`` keeps only paragraphs unique to one document;
    production crawls typically run 2-5. ``normalize`` folds
    case/whitespace before counting (the emitted text is always the
    *original* paragraph).
    """
    if max_docs < 1:
        raise ValueError("max_docs must be >= 1")
    from .dedup import _widen_if_narrow

    # hashing every paragraph happens pre-shuffle; spread narrow
    # (single-row-group) inputs first — no-op at real scale
    df = _widen_if_narrow(df, id_col)
    exploded = split_paragraphs(df, id_col, text_col, sep)
    freq = paragraph_doc_freq(exploded, id_col, normalize=normalize)
    flagged = (
        exploded.withColumn(
            "pkey", F.xxhash64(_norm_para(F.col("para"), normalize))
        )
        .join(freq, "pkey")
        .withColumn("keep", F.col("doc_freq") <= max_docs)
    )
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col("pos"), F.col("keep"), F.col("para")))
    )
    kept = F.filter(ordered, lambda x: x["keep"])
    return flagged.groupBy(id_col).agg(
        F.concat_ws(sep, F.transform(kept, lambda x: x["para"])).alias(text_col),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
        F.sum((~F.col("keep")).cast("long")).cast("long").alias("n_dropped"),
    )
