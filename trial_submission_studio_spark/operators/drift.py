"""Corpus drift audit — distribution divergence between two corpus
versions (the "what changed since last month's snapshot?" answer at
the content level, complementing `io/versioned.py:diff_versions`'
file-level audit).

Two granularities:

- :func:`token_drift`: exact per-token relative-frequency comparison
  → per-token Jensen–Shannon contributions + the top drifted tokens.
  Vocabulary-sized shuffle (token keys), corpus-sublinear.
- :func:`bucket_drift`: JS divergence over DSIR's hashed n-gram
  buckets (`dsir.py`) — fixed B-sized state regardless of
  vocabulary, so two 100 TB snapshots compare through two KB-scale
  vectors. The right default for scheduled drift monitoring; fall
  back to token_drift to EXPLAIN a drift alarm.

JS divergence (natural log) is symmetric, bounded by ln 2, and
well-defined when supports differ — the standard corpus-shift
metric. Both functions smooth with add-k so empty intersections
stay finite.

Reference parity note: the reference engine
(rubentalstra/Trial-Submission-Studio) has no corpus surface; this
extends the governance family (SURVEY.md §2.13) beside the
mergeable sketches (`sketches.py` — cardinality/quantile drift) and
snapshots (`io/versioned.py`).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["token_drift", "bucket_drift"]


def _token_freqs(df: DataFrame, text_col: str) -> DataFrame:
    toks = df.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("token")
    ).filter(F.col("token") != "")
    return toks.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("n"))


def token_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str,
    top_n: int = 50,
    smoothing: float = 0.5,
    min_count: int = 1,
) -> tuple[DataFrame, float]:
    """→ (top drifted tokens, total JS divergence in nats).

    The table has ``(token, p_a, p_b, js_contrib)`` ordered by
    contribution descending (ties on token) and limited to
    ``top_n``; the scalar is the FULL sum over the joined
    vocabulary, not just the returned rows.

    Plan: two token-count aggregations → full outer join on token →
    one pass of arithmetic → (a) a 1-row sum and (b) a top-n
    ordering. The join is vocabulary-sized — at web scale pass
    ``min_count > 1`` to prune each side's hapax tail BEFORE the
    join (Zipf: most of the vocabulary, almost none of the mass; a
    token below the floor on one side scores as absent there, so the
    total shifts slightly — fine for EXPLAINING an alarm raised by
    :func:`bucket_drift`, which stays the exact scheduled monitor)."""
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    fa = _token_freqs(df_a, text_col)
    fb = _token_freqs(df_b, text_col)
    if min_count > 1:
        fa = fa.filter(F.col("n") >= min_count)
        fb = fb.filter(F.col("n") >= min_count)
    joined = fa.withColumnRenamed("n", "n_a").join(
        fb.withColumnRenamed("n", "n_b"), "token", "full_outer"
    )
    joined = joined.fillna(0, subset=["n_a", "n_b"]).persist()
    try:
        tot = joined.agg(
            F.sum("n_a").alias("ta"),
            F.sum("n_b").alias("tb"),
            F.count(F.lit(1)).alias("v"),
        ).collect()[0]
        ta = float(tot["ta"]) + smoothing * tot["v"]
        tb = float(tot["tb"]) + smoothing * tot["v"]
        p = (F.col("n_a") + smoothing) / ta
        q = (F.col("n_b") + smoothing) / tb
        m = (p + q) / 2
        contrib = 0.5 * (
            p * F.log(p / m) + q * F.log(q / m)
        )
        scored = joined.select(
            "token",
            p.alias("p_a"),
            q.alias("p_b"),
            contrib.alias("js_contrib"),
        )
        total = float(
            scored.agg(F.sum("js_contrib")).collect()[0][0] or 0.0
        )
        top = (
            scored.orderBy(F.desc("js_contrib"), F.asc("token")).limit(top_n)
        )
        return top, total
    finally:
        joined.unpersist()


def bucket_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str,
    buckets: int = 8192,
    smoothing: float = 0.5,
) -> float:
    """JS divergence (nats) between the hashed-n-gram bucket
    distributions of two corpora — fixed B-sized comparison via
    DSIR's feature space, driver math on two KB vectors."""
    from trial_submission_studio_spark.operators.dsir import (
        fit_bucket_distribution,
        hashed_ngram_counts,
    )

    ids_a = df_a.select(
        F.monotonically_increasing_id().alias("__id"), F.col(text_col)
    )
    ids_b = df_b.select(
        F.monotonically_increasing_id().alias("__id"), F.col(text_col)
    )
    log_p = fit_bucket_distribution(
        hashed_ngram_counts(ids_a, "__id", text_col, buckets),
        buckets,
        smoothing,
    )
    log_q = fit_bucket_distribution(
        hashed_ngram_counts(ids_b, "__id", text_col, buckets),
        buckets,
        smoothing,
    )
    js = 0.0
    for lp, lq in zip(log_p, log_q):
        p, q = math.exp(lp), math.exp(lq)
        m = (p + q) / 2
        if p > 0:
            js += 0.5 * p * math.log(p / m)
        if q > 0:
            js += 0.5 * q * math.log(q / m)
    return js
