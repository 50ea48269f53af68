"""Skew-handling utilities for hot keys at scale.

AQE's skew-join handling covers sort-merge joins, but two shapes
still need explicit salting on a 1000-executor cluster:

- **Skewed aggregation**: one giant group (e.g. one USUBJID holding
  10% of all events) serializes into one task. ``salted_agg``
  two-phases it: partial aggregate on (key, salt) — map-side combine
  spreads the hot key over N tasks — then final aggregate on key.
- **Skewed broadcast-probe**: handled natively (broadcast joins
  don't shuffle the probe side), so no helper is needed.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(salt_buckets: int) -> Column:
    """Row-spreading salt independent of upstream partitioning.

    ``spark_partition_id() % n`` fails exactly when salting matters
    most: a hot key concentrated in one upstream partition (common
    right after a shuffle on that key) gives every row of the hot
    group the *same* salt, so the skew survives. Hashing the
    per-row ``monotonically_increasing_id`` spreads consecutive rows
    of one partition across all buckets regardless of layout. The
    salt is deterministic for a fixed partition layout and, because
    it only routes rows between decomposable partial aggregates,
    never affects the final aggregated values even if a task retry
    re-derives different ids.
    """
    return F.pmod(
        F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)
    ).cast("int")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: Callable[[str], list[Column]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over salted keys.

    ``partial_aggs``: aggregates computed per (keys, salt) — must be
    decomposable (sum/count/min/max). ``final_aggs``: given the
    partial column prefix, the re-aggregation expressions.

    Example — skew-proof count+sum per user:

        salted_agg(events, ["user_id"],
                   [F.count(F.lit(1)).alias("c"), F.sum("value").alias("s")],
                   lambda p: [F.sum("c").cast("long").alias("n"),
                              F.round(F.sum("s"), 2).alias("total")])
    """
    salted = df.withColumn("__salt", salt_column(salt_buckets))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs("")).drop("__salt")


def detect_hot_keys(
    df: DataFrame,
    keys: list[str],
    min_share: float = 0.01,
    sample_fraction: float | None = None,
    seed: int = 0,
) -> DataFrame:
    """Keys holding at least ``min_share`` of all rows — the inputs
    that justify routing an aggregation through :func:`salted_agg`
    (or a join through a salted replicate).

    Two modes:

    - **Exact** (default): group-count on the keys (one shuffle of
      the narrow key columns only). The grouped frame is
      ``localCheckpoint``-ed so the total and the filter read it
      once; at persistent scale the counts would live in a table
      instead (same note as the MinHash signature frame,
      dedup.py).
    - **Sampled** (``sample_fraction=``): row-level Bernoulli sample
      first — a key with a 1 % share still lands thousands of rows in
      a 0.1 % sample of a large table, so the estimate is tight while
      the group-count touches a fraction of the data. Shares are
      computed against the sampled total, so they remain unbiased
      estimates of the true share.

    Returns (keys..., n, share) sorted by share descending.
    """
    if not keys:
        raise ValueError("need at least one key column")
    if not 0.0 < min_share <= 1.0:
        raise ValueError(f"min_share must be in (0, 1], got {min_share}")
    src = df
    if sample_fraction is not None:
        src = df.sample(fraction=sample_fraction, seed=seed)
    counts = (
        src.groupBy(*keys)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()
    )
    total = counts.agg(F.sum("n")).collect()[0][0] or 0
    if total == 0:
        return counts.withColumn("share", F.lit(0.0)).limit(0)
    return (
        counts.withColumn("share", F.col("n") / F.lit(float(total)))
        .filter(F.col("share") >= min_share)
        .orderBy(F.col("share").desc(), *keys)
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign session ids: a gap > ``gap_minutes`` since the user's
    previous event starts a new session (lag + running sum — the
    batch formulation of ``session_window``; Structured Streaming
    uses the native session_window with the same semantics).

    Output: input columns + ``session_id`` (1-based per user).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col))
    prev = F.lag(F.col(ts_col)).over(w)
    # interval subtraction works for TIMESTAMP and TIMESTAMP_NTZ alike
    # (a long cast would be illegal on NTZ and TZ-dependent on LTZ)
    gap_over = (F.col(ts_col) - prev) > F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")
    new_session = F.when(prev.isNull() | gap_over, 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
