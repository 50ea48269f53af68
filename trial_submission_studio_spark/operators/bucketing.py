"""Bucketed tables — pre-shuffled storage for co-located, exchange-free
joins and aggregations.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Spark
bucketing pays that shuffle ONCE at write time: rows are hash-
partitioned into a fixed number of buckets on the join key
(``bucketBy``), optionally sorted within each bucket (``sortBy``),
and the layout is recorded in the catalog. Every later join or
aggregation on the bucket key then satisfies its distribution
requirement straight from the scan — no Exchange. With sorted
one-file-per-bucket layout (which :func:`write_bucketed` produces)
the SortMergeJoin's Sorts drop too, but only under
``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` —
SPARK-28632 disabled ordering propagation by default in 3.0 to
avoid its planning-time file checks; the sorted layout still helps
regardless (better compression, sorted-run merges). That is the persistent sibling of a per-query
``repartition``: the same co-location, amortized over every query
that touches the table.

Complements the engine's other layout tools: Z-order
(`operators/layout.py`) optimizes SKIPPING for range predicates;
bucketing optimizes JOIN/AGG distribution; the bm25 index
(`operators/bm25.py`) rolls its own metastore-free hash-dir layout
because its readers assemble explicit file lists — bucketing is the
catalog-backed variant for general tables.

Usage contract (Spark semantics worth knowing, encoded in tests):

- Both sides of a join must be bucketed INTO THE SAME NUMBER OF
  BUCKETS on the join keys for the exchange-free plan (a mismatch
  re-shuffles one side; Spark can also coalesce bucket counts when
  one divides the other — ``spark.sql.bucketing.coalesceBucketsInJoin``).
- A grouped aggregation on a prefix of the bucket keys also skips
  its Exchange.
- The catalog entry is what carries the layout: tables are written
  with ``saveAsTable`` (an EXTERNAL table when ``path`` is given).
  With the default in-memory catalog the entry lives for the
  session; production deployments point the same API at a
  persistent metastore.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed", "is_exchange_free_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted)
    catalog table. ``path`` makes it external (data survives
    ``DROP TABLE``). ``n_buckets`` is the ONE layout decision that
    matters: pick so a bucket of the biggest future join fits an
    executor core's memory (total size / n_buckets ≈ 100–500 MB),
    and reuse the same number across tables that join together."""
    cols = list(bucket_cols)
    if not cols:
        raise ValueError("need at least one bucket column")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if sort_cols:
        # ONE FILE PER BUCKET: Spark only trusts (and exploits) the
        # within-bucket sort when each bucket is a single file —
        # multiple writer tasks per bucket leave per-file sorted
        # runs and readers re-Sort. repartition on the bucket key
        # uses the same Murmur3 hash as bucketBy, so partition i
        # holds exactly bucket i and its task writes that one file.
        df = df.repartition(n_buckets, *cols)
    w = df.write.format(format).mode(mode).bucketBy(n_buckets, *cols)
    if sort_cols:
        w = w.sortBy(*list(sort_cols))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table THROUGH THE CATALOG — ``spark.table``;
    a direct ``spark.read.parquet(path)`` on the same files loses
    the bucket metadata and with it the exchange-free plans."""
    return spark.table(table)


def is_exchange_free_join(joined: DataFrame) -> bool:
    """True when the physical plan of ``joined`` contains no SHUFFLE
    exchange — the property bucketing buys. A BroadcastExchange does
    not count: broadcasting is not a shuffle, and on a small side
    the planner rightly prefers it (it then reports the scan as
    ``Bucketed: false (disabled by query planner)``). Health-check
    the big-table regime by disabling auto-broadcast first, as the
    tests do. (Inspects the initial physical plan, where shuffle
    requirements are decided.)"""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return not any(
        line.lstrip(" :+-").startswith("Exchange ")
        for line in plan.splitlines()
    )
