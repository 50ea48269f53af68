"""Sharded training-corpus sink.

Training jobs consume a corpus as N equal-ish shards with a manifest
(shard → rows/tokens) for loader scheduling and resumable epochs.
Shard assignment hashes the document KEY — deterministic across runs
and partitionings, so re-exports after incremental appends keep every
existing document in the same shard (loaders can cache shards by
content hash).

Scale shape: one shuffle (repartition on the shard id) so each shard
writes as one parquet directory partition in parallel; the manifest
is a single map-side-combined aggregation. No driver-side data
movement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_shard(key_col: str, n_shards: int) -> "F.Column":
    """Deterministic shard id in [0, n_shards)."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).cast("int")


def write_corpus_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str,
    n_shards: int,
    token_col: str | None = None,
    mode: str = "overwrite",
    shuffle_seed: int | None = None,
) -> DataFrame:
    """Write ``df`` as ``out_dir/shard=K/`` parquet partitions and
    return the manifest (shard, n_rows[, n_tokens]) as a DataFrame.

    ``token_col`` (an integer column, e.g. from
    ``textstats.token_count``) adds per-shard token totals so loaders
    can weight shards by work, not just row count.

    ``shuffle_seed`` additionally writes each shard in deterministic
    pseudo-random order (training-order shuffle) via
    sortWithinPartitions on ``xxhash64(id, seed)`` — shard-local, so
    it rides the one repartition shuffle for free; a different seed
    re-exports a fresh epoch order with identical shard membership.
    """
    sharded = df.withColumn("shard", assign_shard(id_col, n_shards)).repartition(
        n_shards, "shard"
    )
    if shuffle_seed is not None:
        # lead with the shard column: partitionBy writing requires a
        # sort on the partition columns, and Catalyst ELIMINATES an
        # inner sort shadowed by that one — with shard as the prefix,
        # the writer's requirement is already satisfied and the epoch
        # order survives to disk
        sharded = sharded.sortWithinPartitions(
            F.col("shard").asc(),
            F.xxhash64(F.col(id_col), F.lit(int(shuffle_seed))).asc(),
            F.col(id_col).asc(),
        )
    sharded.write.mode(mode).partitionBy("shard").parquet(out_dir)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    if token_col is not None:
        aggs.append(F.sum(token_col).cast("long").alias("n_tokens"))
    # aggregate the WRITTEN files, not the input lineage: re-running
    # the upstream pipeline would double a potentially huge job, and
    # the manifest must describe what is on disk even if an upstream
    # stage were nondeterministic across runs
    written = df.sparkSession.read.parquet(out_dir)
    return written.groupBy("shard").agg(*aggs).orderBy("shard")
