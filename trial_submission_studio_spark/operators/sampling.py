"""Deterministic sampling for training-mix construction.

A 100 TB corpus feeding a training pipeline needs samples that are

- **reproducible**: the same corpus + seed always selects the same
  rows, independent of partitioning, task retries, or cluster size
  (``df.sample`` is seed-stable only for a fixed partition layout);
- **key-consistent**: selection is a pure function of a row KEY, so
  re-runs over an updated corpus keep previously-selected keys
  (critical for train/eval splits that must not drift);
- **stratified**: per-stratum rates (language, source, quality band)
  to shape the training mixture.

Selection hashes the key into ``BUCKETS`` equal slices and keeps the
first ``fraction * BUCKETS`` — a pure JVM expression (xxhash64), no
shuffle, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash-space granularity: fractions resolve to 1e-6
BUCKETS = 1_000_000


def sample_bucket(key: Column | str, seed: int = 0, hash_expr: Column | None = None) -> Column:
    """The row's bucket in [0, BUCKETS): ``xxhash64(key, seed)`` by
    default; ``hash_expr`` substitutes any deterministic int
    expression (e.g. a multiplicative hash both Spark and an external
    SQL oracle can evaluate identically)."""
    col = F.col(key) if isinstance(key, str) else key
    h = hash_expr if hash_expr is not None else F.xxhash64(col, F.lit(seed))
    return F.pmod(h, F.lit(BUCKETS)).cast("long")


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: int = 0,
    hash_expr: Column | None = None,
) -> DataFrame:
    """Keep ~``fraction`` of rows, selected purely by key hash."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(
        sample_bucket(key_col, seed, hash_expr) < int(fraction * BUCKETS)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    seed: int = 0,
    hash_expr: Column | None = None,
) -> DataFrame:
    """Per-stratum deterministic sampling: rows of stratum ``s`` keep
    rate ``fractions.get(s, default_fraction)``.

    The per-stratum threshold is a small ``when`` chain (strata counts
    are config-sized), so the whole selection stays one codegen'd
    filter over the scan — no shuffle, no join, and Parquet can still
    prune on any pushed predicates.
    """
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0, 1]")
    threshold: Column = F.lit(int(default_fraction * BUCKETS))
    for s, f in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == s, F.lit(int(f * BUCKETS))
        ).otherwise(threshold)
    return df.filter(sample_bucket(key_col, seed, hash_expr) < threshold)
