"""Streaming CDC apply: a Structured Streaming sink that MERGEs each
micro-batch into a versioned snapshot (`io/merge.py`) — the
change-data-capture landing pattern (Kafka upsert topic / Debezium
feed -> queryable, time-travelable table).

Shape: ``foreachBatch`` + :func:`apply_cdc_batch`. Spark guarantees
foreachBatch sees each batch_id at least once, NOT exactly once — so
the apply is fenced: every commit records the batch id it applied
(``metadata.cdc.last_batch_id``), and a replayed batch (id <= the
recorded watermark) is skipped whole. Batch ids from one checkpoint
are strictly monotonic, so the single watermark is a complete fence
— and unlike blind re-merging (which IS value-idempotent but would
publish a duplicate version per replay), the fence keeps history
1:1 with effective batches.

Within a batch, CDC feeds routinely carry several changes for one
key; ``order_col`` (the source's sequence/LSN column) picks the
final image per key BEFORE the merge — without it, duplicate keys
are refused loudly (`merge_version`'s rule).

At scale this inherits merge's copy-on-write: each micro-batch
rewrites only the files its keys touch; a busy stream compacts later
with `versioned.compact_version` like any other writer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..io import versioned
from ..io.merge import merge_version

__all__ = ["apply_cdc_batch", "start_merge_sink"]


def _last_applied(root: str) -> int:
    """The newest version's recorded CDC batch id (walking back past
    non-CDC commits like compaction/optimize), or -1."""
    try:
        versions = versioned.list_versions(root)
    except FileNotFoundError:  # pragma: no cover
        return -1
    for v in sorted(versions, reverse=True):
        cdc = versioned.read_manifest(root, v)["metadata"].get("cdc")
        if cdc is not None and "last_batch_id" in cdc:
            # pending_batch_id-only commits (dv-mode phase 1) are NOT
            # applied batches — the delete phase still has to run
            return cdc["last_batch_id"]
    return -1


def apply_cdc_batch(
    batch_df: DataFrame,
    batch_id: int,
    root: str,
    key_cols: str | list[str],
    *,
    delete_col: str | None = None,
    order_col: str | None = None,
    broadcast_keys: bool | str = "auto",
    verify: bool = True,
    rollups: list[dict] | None = None,
    delete_mode: str = "cow",
) -> dict | None:
    """Apply one micro-batch; returns the published manifest, or None
    when the batch was empty or already applied (replay). Usable
    directly for deterministic replay tests and backfills.

    ``rollups`` keeps materialized aggregates (`io/rollup.py`) fresh
    PER MICRO-BATCH: each spec ``{"root", "dims", "measures"}`` gets
    a ``refresh_rollup`` after the merge commit, which scans only the
    batch's file delta (the incremental contract). The refresh runs
    even when the batch itself is a skipped replay — refresh has its
    own base-version fence (idempotent no-op when current), and
    running it on replay is what HEALS a crash that landed between
    the merge commit and the refresh.

    ``delete_mode="dv"`` applies the batch's delete rows as
    merge-on-read tombstones (`io/deletion_vectors.py`) instead of
    copy-on-write rewrites — the right steady-state for streams that
    carry scattered erasures (GDPR feeds), where CoW would rewrite
    the touched files EVERY micro-batch. A mixed batch becomes two
    commits (upserts merge, then deletes tombstone) under a
    two-phase fence: the upsert commit marks the batch id PENDING,
    only the delete commit marks it applied, and a replay of a batch
    whose pending marker is newest resumes at the delete step
    (idempotent — tombstoning already-dead rows is a no-op)."""
    if delete_mode not in ("cow", "dv"):
        raise ValueError("delete_mode must be 'cow' or 'dv'")
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    out = _apply_batch(
        batch_df, batch_id, root, key_cols,
        delete_col=delete_col, order_col=order_col,
        broadcast_keys=broadcast_keys, verify=verify,
        delete_mode=delete_mode,
    )
    if rollups and versioned.current_version(root) is not None:
        from ..io.rollup import refresh_rollup

        for spec in rollups:
            refresh_rollup(
                batch_df.sparkSession, root, spec["root"],
                spec["dims"], spec["measures"],
            )
    return out


def _pending_batch(root: str) -> int:
    """The pending CDC batch id of a dv-mode upsert commit that
    crashed before its delete commit, or -1. Walks back past
    NON-CDC commits (a compaction landing between the crash and the
    replay must not hide the marker — same discipline as
    `_last_applied`); the first commit WITH a cdc key decides: a
    ``last_batch_id`` means the delete phase completed."""
    for v in sorted(versioned.list_versions(root), reverse=True):
        cdc = versioned.read_manifest(root, v)["metadata"].get("cdc")
        if cdc is not None:
            return cdc.get("pending_batch_id", -1)
    return -1


def _apply_batch(
    batch_df: DataFrame,
    batch_id: int,
    root: str,
    key_cols: list[str],
    *,
    delete_col: str | None,
    order_col: str | None,
    broadcast_keys: bool | str,
    verify: bool,
    delete_mode: str = "cow",
) -> dict | None:
    if batch_id <= _last_applied(root):
        return None  # replayed batch: all effects already committed
    resume_deletes = delete_mode == "dv" and _pending_batch(root) == batch_id
    if order_col is not None:
        w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
        batch_df = (
            batch_df.withColumn("__cdc_rn", F.row_number().over(w))
            .filter(F.col("__cdc_rn") == 1)
            .drop("__cdc_rn", order_col)
        )
    if batch_df.limit(1).count() == 0:
        return None
    meta = {"cdc": {"last_batch_id": batch_id}}
    if versioned.current_version(root) is None:
        # bootstrap: first effective batch creates the table
        data_cols = [c for c in batch_df.columns if c != delete_col]
        rows = batch_df
        if delete_col is not None:
            rows = rows.filter(
                ~F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
            )
        rows = rows.select(*data_cols)
        if rows.limit(1).count() == 0:
            return None  # a delete-only first batch has no table to touch
        os.makedirs(root, exist_ok=True)
        run_dir = versioned.new_data_dir(root)
        rows.write.mode("overwrite").parquet(run_dir)
        return versioned.publish_version(root, run_dir, metadata=meta)
    if delete_mode == "dv" and delete_col is not None:
        from ..io.deletion_vectors import delete_matching_dv

        spark = batch_df.sparkSession
        is_del = F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
        data_cols = [c for c in batch_df.columns if c != delete_col]
        upserts = batch_df.filter(~is_del).select(*data_cols)
        del_keys = batch_df.filter(is_del).select(*key_cols)
        has_dels = del_keys.limit(1).count() > 0
        out = None
        if not resume_deletes and upserts.limit(1).count() > 0:
            # phase 1: the upsert merge marks the batch PENDING when
            # a delete phase follows — a crash between the commits
            # replays into the delete step, never re-merges
            phase_meta = (
                {"cdc": {"pending_batch_id": batch_id}} if has_dels else meta
            )
            out = merge_version(
                spark, root, upserts, key_cols,
                broadcast_keys=broadcast_keys, verify=verify,
                metadata=phase_meta,
            )
        if has_dels:
            # phase 2: scattered erasures tombstone in O(k) — and
            # carry the batch fence; re-tombstoning dead rows on a
            # resume is a no-op, so this phase is idempotent. A
            # no-op delete (all keys already gone) must still fence
            # the batch, hence the explicit empty commit fallback.
            out2 = delete_matching_dv(
                spark, root, del_keys, key_cols,
                broadcast_keys=broadcast_keys, verify=verify,
                metadata=meta,
            )
            if out2["metadata"].get("cdc", {}).get("last_batch_id") != batch_id:
                m = versioned.read_manifest(root)
                out2 = versioned.commit_files(
                    root, base_version=m["version"], kind="append",
                    metadata=meta,
                )
            out = out2
        return out
    return merge_version(
        batch_df.sparkSession,
        root,
        batch_df,
        key_cols,
        delete_col=delete_col,
        broadcast_keys=broadcast_keys,
        verify=verify,
        metadata=meta,
    )


def start_merge_sink(
    stream_df: DataFrame,
    root: str,
    key_cols: str | list[str],
    checkpoint_dir: str,
    *,
    delete_col: str | None = None,
    order_col: str | None = None,
    trigger_available_now: bool = True,
    broadcast_keys: bool | str = "auto",
    verify: bool = True,
    rollups: list[dict] | None = None,
    delete_mode: str = "cow",
):
    """Start the CDC-apply query; returns the StreamingQuery.
    ``trigger_available_now`` drains what exists and stops (the
    scheduled-incremental deployment mode); False runs continuously.
    ``rollups`` and ``delete_mode`` as in :func:`apply_cdc_batch` —
    materialized aggregates ride the same micro-batch loop, and
    erasure-heavy streams can tombstone instead of rewrite."""
    if not stream_df.isStreaming:
        raise ValueError("stream_df must be a streaming DataFrame")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        apply_cdc_batch(
            batch_df,
            batch_id,
            root,
            key_cols,
            delete_col=delete_col,
            order_col=order_col,
            broadcast_keys=broadcast_keys,
            verify=verify,
            rollups=rollups,
            delete_mode=delete_mode,
        )

    writer = stream_df.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
