"""Partition-layout guards shared by the CPU-heavy operators.

One scan task per parquet row group is correct for IO-bound reads,
but a *small* file (one row group) starves a wide cluster when the
next stage does real per-row CPU work — shingle explosion + hashing,
regex ladders, Arrow kernel UDFs. These helpers widen such inputs
conditionally, so the guard is a no-op wherever the data already
arrives with enough splits (any real deployment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _effective_file_parallelism(df: DataFrame, slots: int) -> int | None:
    """Best-effort TRUE scan parallelism for a file-backed frame.

    Byte-range splits overstate parallelism: a parquet row group is
    atomic, so a 32-split scan of a single-row-group file still runs
    one real task (everything else is an empty split). When the frame
    reads few local parquet files, count row groups — that is the
    real upper bound on scan parallelism. Returns None when the
    answer is unknowable cheaply (non-parquet, remote FS, many files
    — all cases where the split count is trustworthy or the probe
    would not be O(1)).
    """
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files or len(files) >= slots:
        return None
    if not all(f.split("?")[0].endswith(".parquet") for f in files):
        return None
    try:
        import pyarrow.parquet as pq

        total = 0
        for uri in files:
            if uri.startswith("file:"):
                path = uri[5:]
                while path.startswith("//"):
                    path = path[1:]
            elif "://" in uri:
                return None  # remote FS: don't probe from the driver
            else:
                path = uri
            total += pq.ParquetFile(path).metadata.num_row_groups
            if total >= slots:
                return total
        return total
    except Exception:
        return None


def widen_if_narrow(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition by key to the cluster's slot count ONLY when the
    input has fewer *effective* partitions than slots.

    The repartition shuffles the NARROW pre-explode rows once; at
    real scale (inputs with thousands of splits) the condition is
    false and no shuffle is added. ``getNumPartitions`` plans but
    does not execute. For few-file local parquet the split count is
    cross-checked against the row-group count (byte splits beyond
    the row-group grain are empty tasks, not parallelism).
    """
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    n = df.rdd.getNumPartitions()
    if n >= p:
        eff = _effective_file_parallelism(df, p)
        if eff is None or eff >= p:
            return df
    return df.repartition(p, F.col(key_col))
