"""--SEQ derivation (SURVEY.md T3) and duplicate detection (A5/V5).

Reference semantics (tss-submit/src/normalize/executor.rs:177-214):
{DOMAIN}SEQ is a running 1..n count per USUBJID in *file row order*;
with no grouping column it's a global 1..N.

Spark-first: ``row_number()`` over an explicit, deterministic order
column (the ingest-attached ``_row_id`` or a natural key). The
reference's implicit file order is not reproducible under
parallelism, so the order column is a required argument here — the
determinism discipline from SURVEY.md §4.2.

Scale: the window shuffles once on the partition key; that shuffle is
shared by any later groupBy on the same key (co-partitioning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def add_sequence_number(
    df: DataFrame,
    target: str,
    order_by: list[str | Column],
    partition_by: list[str | Column] | None = None,
) -> DataFrame:
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
    else:
        # Global 1..N — single-partition window; only valid for
        # schema-sized frames (the reference's no-USUBJID fallback).
        w = Window.orderBy(*order_by)
    return df.withColumn(target, F.row_number().over(w).cast("long"))


def duplicate_sequence_counts(
    df: DataFrame, subject_col: str = "USUBJID", seq_col: str | None = None
) -> DataFrame:
    """(subject, seq) pairs occurring more than once → one summary row
    (dup_groups, extra_rows). Reference: validate/checks/sequence.rs:15-58."""
    seq_col = seq_col or [c for c in df.columns if c.endswith("SEQ")][0]
    groups = (
        df.groupBy(subject_col, seq_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    return groups.agg(
        F.count(F.lit(1)).cast("long").alias("dup_groups"),
        F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("long").alias("extra_rows"),
    )
