"""Streaming CDC merge sink (streaming/cdc.py): bootstrap, upserts,
deletes, final-image-per-key within a batch, replay fencing."""

import os

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.io.versioned import (
    current_version,
    read_manifest,
    read_version,
)
from trial_submission_studio_spark.streaming.cdc import (
    apply_cdc_batch,
    start_merge_sink,
)

SCHEMA = "k bigint, v string, seq bigint, is_del boolean"


def _rows(spark, root):
    return {(r.k, r.v) for r in read_version(spark, root).collect()}


def _write_batch(spark, src, rows, n=1):
    spark.createDataFrame(rows, SCHEMA).repartition(n).write.mode(
        "append"
    ).parquet(src)


def test_end_to_end_two_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    root = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(
        spark,
        src,
        [(1, "a", 1, False), (2, "b", 1, False), (3, "c", 1, False)],
    )
    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", "1000"
    ).parquet(src)
    q = start_merge_sink(
        stream, root, "k", ckpt, delete_col="is_del", order_col="seq"
    )
    q.awaitTermination(120)
    assert _rows(spark, root) == {(1, "a"), (2, "b"), (3, "c")}
    v1 = current_version(root)
    assert read_manifest(root, v1)["metadata"]["cdc"]["last_batch_id"] == 0

    # batch 2: update k=1, delete k=2, insert k=4; two changes for
    # k=4 -> the higher seq wins
    _write_batch(
        spark,
        src,
        [
            (1, "a2", 2, False),
            (2, None, 2, True),
            (4, "WRONG", 2, False),
            (4, "d", 3, False),
        ],
    )
    q = start_merge_sink(
        spark.readStream.schema(SCHEMA).parquet(src),
        root, "k", ckpt, delete_col="is_del", order_col="seq",
    )
    q.awaitTermination(120)
    assert _rows(spark, root) == {(1, "a2"), (3, "c"), (4, "d")}
    v2 = current_version(root)
    assert v2 > v1
    # v1 still time-travels to the pre-CDC state
    assert {(r.k, r.v) for r in read_version(spark, root, v1).collect()} == {
        (1, "a"), (2, "b"), (3, "c")
    }


def test_replay_is_fenced(spark, tmp_path):
    root = str(tmp_path / "table")
    b0 = spark.createDataFrame(
        [(1, "a", 1, False), (2, "b", 1, False)], SCHEMA
    )
    m0 = apply_cdc_batch(b0, 0, root, "k", delete_col="is_del", order_col="seq")
    b1 = spark.createDataFrame([(1, "a2", 2, False)], SCHEMA)
    m1 = apply_cdc_batch(b1, 1, root, "k", delete_col="is_del", order_col="seq")
    assert m1["version"] > m0["version"]
    # replay batch 0 AND batch 1: both skipped, nothing published
    assert apply_cdc_batch(b0, 0, root, "k", delete_col="is_del",
                           order_col="seq") is None
    assert apply_cdc_batch(b1, 1, root, "k", delete_col="is_del",
                           order_col="seq") is None
    assert current_version(root) == m1["version"]
    assert _rows(spark, root) == {(1, "a2"), (2, "b")}


def test_fence_survives_interleaved_compaction(spark, tmp_path):
    """A non-CDC commit (compaction) between batches must not reset
    the watermark: _last_applied walks back to the newest CDC
    commit."""
    from trial_submission_studio_spark.io.versioned import compact_version

    root = str(tmp_path / "table")
    for i in range(3):
        apply_cdc_batch(
            spark.createDataFrame([(i, f"v{i}", 1, False)], SCHEMA),
            i, root, "k", delete_col="is_del",
        )
    compact_version(spark, root, target_bytes=1 << 20)
    assert "cdc" not in read_manifest(root)["metadata"]
    # replaying an old batch after compaction: still fenced
    assert apply_cdc_batch(
        spark.createDataFrame([(0, "STALE", 9, False)], SCHEMA),
        2, root, "k", delete_col="is_del",
    ) is None
    # a NEW batch applies fine
    m = apply_cdc_batch(
        spark.createDataFrame([(0, "fresh", 9, False)], SCHEMA),
        3, root, "k", delete_col="is_del",
    )
    assert m is not None
    assert _rows(spark, root) == {(0, "fresh"), (1, "v1"), (2, "v2")}


def test_delete_only_first_batch_is_noop(spark, tmp_path):
    root = str(tmp_path / "table")
    b = spark.createDataFrame([(1, None, 1, True)], SCHEMA)
    assert apply_cdc_batch(b, 0, root, "k", delete_col="is_del") is None
    assert current_version(root) is None


def test_empty_batch_skipped(spark, tmp_path):
    root = str(tmp_path / "table")
    b = spark.createDataFrame([], SCHEMA)
    assert apply_cdc_batch(b, 0, root, "k", delete_col="is_del") is None


def test_duplicate_keys_without_order_col_refused(spark, tmp_path):
    root = str(tmp_path / "table")
    apply_cdc_batch(
        spark.createDataFrame([(1, "a", 1, False)], SCHEMA), 0, root, "k",
        delete_col="is_del",
    )
    dup = spark.createDataFrame(
        [(1, "x", 2, False), (1, "y", 3, False)], SCHEMA
    )
    with pytest.raises(ValueError, match="duplicate-key"):
        apply_cdc_batch(dup, 1, root, "k", delete_col="is_del")


def test_requires_streaming_frame(spark, tmp_path):
    with pytest.raises(ValueError, match="must be a streaming"):
        start_merge_sink(
            spark.range(3), str(tmp_path / "t"), "id", str(tmp_path / "c")
        )


def test_rollup_rides_the_cdc_micro_batches(spark, tmp_path):
    """Streaming rollup refresh (r13): materialized aggregates stay
    fresh PER MICRO-BATCH under the same fences — after every
    effective batch read_rollup ≡ a direct groupBy of the snapshot,
    the refresh scans only the batch's file delta, a replayed batch
    neither re-merges nor double-refreshes, and a crash between the
    merge commit and the refresh heals on replay."""
    from trial_submission_studio_spark.io.rollup import read_rollup

    root = str(tmp_path / "table")
    rroot = str(tmp_path / "rollup")
    dims, measures = ["v"], {"n": ("count", None), "hi": ("max", "seq")}
    rollups = [{"root": rroot, "dims": dims, "measures": measures}]

    def direct():
        return {
            (r.v, r.n, r.hi)
            for r in read_version(spark, root)
            .groupBy("v")
            .agg(
                F.count(F.lit(1)).alias("n"), F.max("seq").alias("hi")
            )
            .collect()
        }

    def rolled():
        return {
            (r.v, r.n, r.hi) for r in read_rollup(spark, rroot).collect()
        }

    b0 = spark.createDataFrame(
        [(1, "a", 1, False), (2, "a", 2, False), (3, "b", 3, False)], SCHEMA
    )
    assert apply_cdc_batch(
        b0, 0, root, "k", delete_col="is_del", rollups=rollups
    )
    assert rolled() == direct() == {("a", 2, 2), ("b", 1, 3)}

    # update + delete + insert: groups shrink AND grow
    b1 = spark.createDataFrame(
        [(1, "b", 4, False), (2, None, 5, True), (4, "b", 6, False)], SCHEMA
    )
    assert apply_cdc_batch(
        b1, 1, root, "k", delete_col="is_del", rollups=rollups
    )
    assert rolled() == direct() == {("b", 3, 6)}
    # scan audit: the refresh saw only the batch's file delta, never
    # a full table rescan
    rmeta = read_manifest(rroot)["metadata"]["rollup"]
    assert rmeta["files_added"] <= 2 and rmeta["base_version"] == 2
    r_version = current_version(rroot)

    # replayed batch: merge fenced out AND no double-refresh commit
    assert apply_cdc_batch(
        b1, 1, root, "k", delete_col="is_del", rollups=rollups
    ) is None
    assert current_version(rroot) == r_version
    assert rolled() == direct()

    # crash between merge commit and refresh: batch 2 lands without
    # the rollup hook (the crash), its replay runs the hook — the
    # merge is fenced but the refresh catches the rollup up
    b2 = spark.createDataFrame([(9, "c", 7, False)], SCHEMA)
    assert apply_cdc_batch(b2, 2, root, "k", delete_col="is_del")
    assert rolled() != direct()  # stale: the crash window
    assert apply_cdc_batch(
        b2, 2, root, "k", delete_col="is_del", rollups=rollups
    ) is None
    assert rolled() == direct() == {("b", 3, 6), ("c", 1, 7)}


def test_rollup_in_real_stream(spark, tmp_path):
    """The same wiring through an actual Structured Streaming query
    (start_merge_sink(rollups=...))."""
    from trial_submission_studio_spark.io.rollup import read_rollup

    src = str(tmp_path / "src")
    root = str(tmp_path / "table")
    rroot = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(
        spark, src,
        [(1, "a", 1, False), (2, "b", 2, False), (3, "b", 3, False)],
    )
    q = start_merge_sink(
        spark.readStream.schema(SCHEMA).parquet(src),
        root, "k", ckpt, delete_col="is_del", order_col="seq",
        rollups=[{"root": rroot, "dims": ["v"],
                  "measures": {"n": ("count", None)}}],
    )
    q.awaitTermination(120)
    got = {(r.v, r.n) for r in read_rollup(spark, rroot).collect()}
    assert got == {("a", 1), ("b", 2)}


def test_dv_delete_mode_tombstones_and_two_phase_fence(spark, tmp_path):
    """delete_mode='dv' (r13): stream-borne erasures tombstone in
    O(k) instead of rewriting files each micro-batch. A mixed batch
    is two commits under a two-phase fence — the upsert merge marks
    the batch PENDING, the tombstone commit applies it — so a crash
    between the phases resumes at the delete step on replay without
    re-merging, and rollups stay exact over the dv commits."""
    from trial_submission_studio_spark.io.deletion_vectors import dv_map
    from trial_submission_studio_spark.io.merge import merge_version
    from trial_submission_studio_spark.io.rollup import read_rollup
    from trial_submission_studio_spark.streaming.cdc import _last_applied

    root = str(tmp_path / "table")
    rroot = str(tmp_path / "rollup")
    rollups = [{"root": rroot, "dims": [],
                "measures": {"n": ("count", None)}}]
    b0 = spark.createDataFrame(
        [(k, f"v{k}", 1, False) for k in range(1, 5)], SCHEMA
    )
    apply_cdc_batch(b0, 0, root, "k", delete_col="is_del",
                    delete_mode="dv", rollups=rollups)

    # mixed batch: update k=1, delete k=2 and k=3, insert k=5
    b1 = spark.createDataFrame(
        [(1, "a2", 2, False), (2, None, 2, True), (3, None, 2, True),
         (5, "e", 2, False)], SCHEMA
    )
    m = apply_cdc_batch(b1, 1, root, "k", delete_col="is_del",
                        delete_mode="dv", rollups=rollups)
    assert _rows(spark, root) == {(1, "a2"), (4, "v4"), (5, "e")}
    assert m["metadata"]["cdc"]["last_batch_id"] == 1
    assert m["metadata"]["merge"]["op"] == "delete_dv"
    assert m["metadata"]["merge"]["files_rewritten"] == 0  # tombstones
    assert dv_map(m)
    # the intermediate upsert commit is marked pending, not applied
    assert read_manifest(root, m["version"] - 1)["metadata"]["cdc"] == {
        "pending_batch_id": 1
    }
    assert _last_applied(root) == 1
    # rollup exact over the two-phase commits
    assert read_rollup(spark, rroot).collect()[0]["n"] == 3

    # replay: fenced whole, no new versions
    v = current_version(root)
    assert apply_cdc_batch(b1, 1, root, "k", delete_col="is_del",
                           delete_mode="dv", rollups=rollups) is None
    assert current_version(root) == v

    # crash between the phases: phase 1 landed (pending marker),
    # phase 2 never ran — emulate by committing the upsert merge by
    # hand, then replaying the full batch
    b2 = spark.createDataFrame(
        [(4, "v4b", 3, False), (5, None, 3, True)], SCHEMA
    )
    merge_version(
        spark, root,
        b2.filter(~F.col("is_del")).drop("is_del"),
        "k", metadata={"cdc": {"pending_batch_id": 2}},
    )
    assert _last_applied(root) == 1  # pending != applied
    v_pending = current_version(root)
    m2 = apply_cdc_batch(b2, 2, root, "k", delete_col="is_del",
                         delete_mode="dv", rollups=rollups)
    # resume: exactly ONE more commit (the tombstone phase) — the
    # upserts were not re-merged
    assert m2["version"] == v_pending + 1
    assert _last_applied(root) == 2
    assert _rows(spark, root) == {(1, "a2"), (4, "v4b")}
    assert read_rollup(spark, rroot).collect()[0]["n"] == 2

    # delete-only batch whose keys are already gone: still fenced
    b3 = spark.createDataFrame([(5, None, 4, True)], SCHEMA)
    m3 = apply_cdc_batch(b3, 3, root, "k", delete_col="is_del",
                         delete_mode="dv")
    assert m3["metadata"]["cdc"]["last_batch_id"] == 3
    assert _last_applied(root) == 3
    assert _rows(spark, root) == {(1, "a2"), (4, "v4b")}


def test_dv_pending_marker_survives_interleaved_maintenance(spark, tmp_path):
    """A compaction landing between a dv-mode phase-1 crash and the
    replay must not hide the pending marker: the replay still resumes
    at the delete step instead of re-merging."""
    from trial_submission_studio_spark.io.merge import merge_version
    from trial_submission_studio_spark.io.versioned import compact_version
    from trial_submission_studio_spark.streaming.cdc import (
        _last_applied,
        _pending_batch,
    )

    root = str(tmp_path / "table")
    b0 = spark.createDataFrame(
        [(k, f"v{k}", 1, False) for k in range(1, 9)], SCHEMA
    )
    apply_cdc_batch(b0, 0, root, "k", delete_col="is_del", delete_mode="dv")

    # phase 1 of batch 1 lands, then the "crash"; a maintenance
    # compaction commits before the stream restarts
    b1 = spark.createDataFrame(
        [(1, "a2", 2, False), (2, None, 2, True)], SCHEMA
    )
    merge_version(
        spark, root, b1.filter(~F.col("is_del")).drop("is_del"),
        "k", metadata={"cdc": {"pending_batch_id": 1}},
    )
    compact_version(spark, root, target_bytes=1 << 26)
    assert _pending_batch(root) == 1 and _last_applied(root) == 0

    v = current_version(root)
    m = apply_cdc_batch(b1, 1, root, "k", delete_col="is_del",
                        delete_mode="dv")
    assert m["version"] == v + 1  # ONE commit: the delete phase only
    assert _last_applied(root) == 1
    assert _rows(spark, root) == {(1, "a2")} | {
        (k, f"v{k}") for k in range(3, 9)
    }
