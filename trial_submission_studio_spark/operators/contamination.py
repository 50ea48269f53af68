"""Benchmark decontamination: long word-n-gram overlap detection.

A training corpus must not contain the evaluation benchmarks it will
be scored against — test-set leakage silently inflates benchmark
results. The standard defence is n-gram decontamination: any document
sharing enough long word n-grams (13-grams in GPT-3's methodology;
configurable here) with a benchmark document is flagged and dropped.

Spark-first shape (all codegen, no Python in the hot path):

- shingling is ``split`` + ``transform(sequence(...))`` over the
  token array — one projection, no UDF;
- the benchmark side (eval sets are megabytes, not terabytes)
  collapses to a DISTINCT shingle set and **broadcasts**, so the
  corpus side never shuffles for the join;
- per-document overlap counting is a map-side-combinable
  ``groupBy(id)`` — the only shuffle, carrying (id, two longs),
  never document text.

At 100 TB the corpus streams through scan → explode → broadcast-join
→ partial agg; peak state per executor is the broadcast shingle set
(bounded by benchmark size). The default ``broadcast_benchmark=
"auto"`` probes the DISTINCT benchmark gram set with an
early-stopping ``limit(n+1).count()`` (same discipline as
``lm._resolve_broadcast_model`` / ``similarity.
AUTO_DISTRIBUTE_QUERIES``) and falls back to the shuffle join when
the set exceeds :data:`AUTO_BROADCAST_BENCH_GRAMS` — a corpus-scale
"benchmark" can never OOM an executor through the default path, and
it's still never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


#: auto-switch bound for the benchmark-side broadcast: up to this
#: many DISTINCT n-grams broadcast (10⁶ 13-word grams ≈ tens of MB
#: serialized — comfortably executor-resident); a bigger set takes
#: the shuffle join automatically.
AUTO_BROADCAST_BENCH_GRAMS = 1_000_000


def word_ngrams(
    c: Column | str,
    n: int = 13,
    lowercase: bool = True,
    token_pattern: str | None = None,
) -> Column:
    """Array of space-joined word ``n``-grams of a text column
    (whitespace tokenizer; NULL/blank → empty array). Deterministic
    and engine-portable: an external SQL oracle can reproduce it with
    regexp_split + windowed slices. ``token_pattern`` (see
    `tokenize.words`) switches to regex token extraction so "word."
    shingles as "word" — corpus and benchmark must use the SAME
    pattern."""
    if n < 1:
        raise ValueError("n must be >= 1")
    from .tokenize import words as _tok_words

    toks = _tok_words(_col(c).cast("string"), lowercase, token_pattern)
    n_out = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), n_out),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    # sequence(1, 0) would count DOWN — gate the empty/short case
    return F.when(n_out >= 1, grams).otherwise(
        F.array().cast("array<string>")
    )


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    threshold: float = 0.5,
    broadcast_benchmark: bool | str = "auto",
    token_pattern: str | None = None,
) -> DataFrame:
    """Per-document benchmark-overlap report →
    ``(id, n_shingles, n_overlap, contaminated)``.

    ``n_shingles`` counts DISTINCT n-grams per document (duplicated
    phrases inside one doc must not double-count toward its own
    contamination), ``n_overlap`` how many of those appear anywhere
    in the benchmark, and ``contaminated`` is 1 when
    ``n_overlap >= threshold * n_shingles`` (and the doc has at least
    one shingle). Documents shorter than ``n`` words emit
    (0, 0, 0) rather than vanishing — a decontamination pass must
    account for every input row.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    bench = (
        benchmark.select(
            F.explode(word_ngrams(text_col, n, token_pattern=token_pattern)).alias("__gram")
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast_benchmark == "auto" or broadcast_benchmark is None:
        bound = AUTO_BROADCAST_BENCH_GRAMS
        broadcast_benchmark = bench.limit(bound + 1).count() <= bound
    elif broadcast_benchmark not in (True, False):
        raise ValueError(
            "broadcast_benchmark must be True, False, or 'auto'; got "
            f"{broadcast_benchmark!r}"
        )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    from trial_submission_studio_spark.operators.dedup import _widen_if_narrow

    corpus = _widen_if_narrow(corpus, id_col)
    grams = corpus.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(word_ngrams(text_col, n, token_pattern=token_pattern))
        ).alias(
            "__gram"
        ),
    )
    marked = grams.join(bench, "__gram", "left")
    n_sh = F.count("__gram")
    n_ov = F.count("__hit")
    return marked.groupBy(id_col).agg(
        n_sh.cast("long").alias("n_shingles"),
        n_ov.cast("long").alias("n_overlap"),
        (
            (n_sh > 0) & (n_ov >= F.lit(threshold) * n_sh)
        )
        .cast("long")
        .alias("contaminated"),
    )
