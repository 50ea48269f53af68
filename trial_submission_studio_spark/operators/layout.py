"""Data-layout clustering (Z-order) and min-max pruning audit.

At 100 TB the scan is the query: a table laid out so that parquet
row-group min/max statistics are TIGHT on the columns queries filter
on gets most of its bytes skipped before a single row is read. A
plain sort clusters one column; interleaving the bits of several
bucketized columns (a Z-order / Morton curve — the recipe behind
Delta Lake ``OPTIMIZE ZORDER BY`` and Databricks' liquid clustering
ancestor) keeps EVERY clustered column's value range narrow within
each file, so conjunctive range predicates on any subset of them
prune.

Spark-first shape — nothing here is a UDF:

- :func:`bucketize` / :func:`zorder_key` are pure JVM bit-arithmetic
  expression builders (``floor``/``shiftright``/``bitwiseAND``/
  ``shiftleft`` chains, whole-stage codegen).
- :func:`zorder_layout` is exactly one range shuffle
  (``repartitionByRange`` on the key — Spark samples range
  boundaries, so partitions are balanced even when the key
  distribution is lumpy) followed by a partition-local sort. No
  global sort, no driver collection.
- :func:`minmax_prune_fraction` audits the result: it reads ONLY
  parquet footers (row-group statistics, metadata-scale — a few KB
  per file regardless of data size) and reports what fraction of
  row groups a range predicate could skip. This is the measurable
  "did the layout work" number; tests assert it improves vs the
  unclustered layout.

Bucket bounds are caller-pinned constants, NOT data-derived: that
keeps the key stable across incremental writes (new data never
reshuffles old buckets) and makes the computation oracle-checkable
as plain SQL arithmetic. Out-of-range values clamp to the edge
buckets; NULL maps to bucket 0 (documented, mirrored in the oracle).

Reference parity note: the reference engine
(rubentalstra/Trial-Submission-Studio) has no storage layout layer —
it holds everything in RAM (crates/tss-ingest/src/csv/reader.rs:15
caps files at 500 MB). This module belongs to the engine's
at-scale extension surface (SURVEY.md §2.13).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bucketize",
    "zorder_key",
    "zorder_layout",
    "minmax_prune_fraction",
]


def bucketize(c: Column | str, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into integer buckets ``[0, 2**bits)`` by
    linear scaling over the pinned ``[lo, hi)`` range.

    ``floor((x - lo) / (hi - lo) * 2**bits)`` clamped to the valid
    bucket range; NULL → bucket 0. All-double IEEE arithmetic written
    in the same order as the oracle SQL, so both engines produce
    bit-identical buckets.
    """
    if hi <= lo:
        raise ValueError(f"need lo < hi, got [{lo}, {hi})")
    if not 1 <= bits <= 32:
        raise ValueError(f"bits must be in [1, 32], got {bits}")
    n = 1 << bits
    x = F.col(c).cast("double") if isinstance(c, str) else c.cast("double")
    raw = F.floor((x - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(float(n)))
    clamped = F.least(F.lit(n - 1), F.greatest(F.lit(0), raw)).cast("long")
    return F.coalesce(clamped, F.lit(0).cast("long"))


def zorder_key(buckets: list[Column], bits: int) -> Column:
    """Interleave the bits of pre-bucketized columns into one Morton
    key (bit ``i`` of column ``j`` lands at position ``i*k + j``, so
    the most significant bits of every column occupy the top of the
    key — the property that makes the curve locality-preserving).

    ``len(buckets) * bits`` must fit a signed 64-bit long. The
    expression is ``k*bits`` shift/mask terms OR-folded together —
    all JVM-side, inside whole-stage codegen.
    """
    k = len(buckets)
    if k == 0:
        raise ValueError("need at least one bucket column")
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits = {k * bits} > 63 key bits")
    terms = [
        F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * k + j)
        for i in range(bits)
        for j, b in enumerate(buckets)
    ]
    return reduce(lambda a, t: a.bitwiseOR(t), terms)


def zorder_layout(
    df: DataFrame,
    cols: dict[str, tuple[float, float]],
    bits: int = 8,
    num_partitions: int | None = None,
    key_col: str = "_zkey",
) -> DataFrame:
    """Cluster ``df`` on the Z-order key of ``cols`` (a mapping of
    column name → pinned ``(lo, hi)`` bucket bounds).

    One ``repartitionByRange`` shuffle on the key, then a
    partition-local sort — writing the result gives parquet files
    whose row-group min/max stats are tight on every clustered
    column. The key column is kept (callers may drop it after
    writing; dropping is a projection and preserves the sort).

    At scale: range boundaries come from Spark's reservoir sample of
    the key (no skew collapse even on lumpy distributions), the sort
    is spillable, and incremental appends reuse the same pinned
    bounds so new files cluster into the same key space without
    touching old ones.
    """
    buckets = [bucketize(name, lo, hi, bits) for name, (lo, hi) in cols.items()]
    keyed = df.withColumn(key_col, zorder_key(buckets, bits))
    if num_partitions is None:
        num_partitions = keyed.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(num_partitions, key_col).sortWithinPartitions(
        key_col
    )


def minmax_prune_fraction(
    path: str, column: str, lo, hi
) -> dict[str, int | float]:
    """Fraction of parquet row groups a ``column BETWEEN lo AND hi``
    predicate can skip from footer statistics alone — the number a
    layout optimization exists to move.

    Reads ONLY file footers via pyarrow (metadata-scale; at 100 TB
    this is the same work the Spark scan's own row-group filter
    does). A row group is prunable when its ``[min, max]`` stat range
    does not intersect ``[lo, hi]``; groups without stats count as
    not prunable (the scan must read them).
    """
    import glob
    import os

    import pyarrow.parquet as pq

    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    total = 0
    prunable = 0
    for f in files:
        pf = pq.ParquetFile(f)
        names = pf.schema_arrow.names
        if column not in names:
            raise KeyError(f"column {column!r} not in {f}")
        ci = names.index(column)
        for rg in range(pf.metadata.num_row_groups):
            total += 1
            st = pf.metadata.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                continue
            if st.min > hi or st.max < lo:
                prunable += 1
    return {
        "row_groups": total,
        "prunable": prunable,
        "fraction": (prunable / total) if total else 0.0,
    }
