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


def widen_if_narrow(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition by key to the cluster's slot count ONLY when the
    input has fewer partitions than slots.

    The repartition shuffles the NARROW pre-explode rows once; at
    real scale (inputs with thousands of splits) the condition is
    false and no shuffle is added. ``getNumPartitions`` plans but
    does not execute.
    """
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p, F.col(key_col))
    return df
