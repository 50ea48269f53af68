"""Shallow clones (`io/versioned.py:shallow_clone`): zero-copy dev
branches of a versioned table — the clone's first manifest references
the source's files (and dv sidecars) by absolute path, later commits
localize copy-on-write under the clone root, and the source is never
touched."""

import os

from pyspark.sql import functions as F

from trial_submission_studio_spark.io.deletion_vectors import (
    delete_matching_dv,
    dv_map,
)
from trial_submission_studio_spark.io.merge import merge_version
from trial_submission_studio_spark.io.versioned import (
    compact_version,
    current_version,
    new_data_dir,
    read_manifest,
    read_version,
    shallow_clone,
    vacuum,
)
from trial_submission_studio_spark.io.zonemap import (
    publish_with_stats,
    read_pruned,
)


def _kv(spark, pairs):
    return spark.createDataFrame(list(pairs), "k long, v long")


def _snap(spark, root, version=None):
    return {(r.k, r.v) for r in read_version(spark, root, version).collect()}


def _local_files(root, ns):
    out = []
    for cur, _d, names in os.walk(os.path.join(root, ns)):
        out += [n for n in names if n.endswith(".parquet")]
    return out


def test_clone_is_zero_copy_and_localizes_cow(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    d = new_data_dir(src)
    _kv(spark, [(k, k * 10) for k in range(60)]).repartition(3).write.parquet(
        d, mode="append"
    )
    publish_with_stats(src, d, ["k"])
    # tombstones on the SOURCE travel with the clone
    delete_matching_dv(spark, src, _kv(spark, [(5, 0)]).select("k"), "k")
    src_v = current_version(src)
    src_rows = _snap(spark, src)

    dst = str(tmp_path / "dst")
    m = shallow_clone(src, dst, spark=spark)
    assert m["metadata"]["shallow_clone_of"]["version"] == src_v
    # zero DATA bytes moved; the only local file is the O(k) re-keyed
    # tombstone sidecar
    assert _local_files(dst, "data") == []
    assert len(_local_files(dst, "dv")) == 1
    assert all(f.startswith("/") for f in m["files"])  # absolute refs
    assert _snap(spark, dst) == src_rows

    # zone maps traveled: pruned read on the clone stays correct
    got = {
        (r.k, r.v)
        for r in read_pruned(spark, dst, [("k", "<=", 10)]).collect()
    }
    assert got == {(k, k * 10) for k in range(11) if k != 5}

    # branch diverges: merge + dv-delete land under DST only
    merge_version(spark, dst, _kv(spark, [(7, 777), (100, 1)]), "k")
    delete_matching_dv(spark, dst, _kv(spark, [(9, 0)]).select("k"), "k")
    want = (src_rows - {(7, 70), (9, 90)}) | {(7, 777), (100, 1)}
    assert _snap(spark, dst) == want
    assert _local_files(dst, "data")  # the branch's own files exist now
    assert _snap(spark, src) == src_rows  # source untouched
    assert current_version(src) == src_v
    # the clone's vacuum never reaches into the source
    assert vacuum(dst, dry_run=True, min_age_seconds=0) == []

    # compaction localizes the branch completely: every entry becomes
    # clone-local, after which the source can be vacuumed freely
    m2 = compact_version(spark, dst, include_dv_files=True)
    assert not dv_map(m2)
    assert all(not f.startswith("/") for f in m2["files"])
    assert _snap(spark, dst) == want


def test_clone_refusals(spark, tmp_path):
    import pytest

    src = str(tmp_path / "src")
    os.makedirs(src)
    d = new_data_dir(src)
    _kv(spark, [(1, 1)]).write.parquet(d, mode="append")
    from trial_submission_studio_spark.io.versioned import publish_version

    publish_version(src, d)
    with pytest.raises(ValueError, match="source root"):
        shallow_clone(src, src)
    dst = str(tmp_path / "dst")
    shallow_clone(src, dst)
    with pytest.raises(ValueError, match="already has"):
        shallow_clone(src, dst)


def test_clone_of_bucketed_table_keeps_pruning(spark, tmp_path):
    from trial_submission_studio_spark.io.bucketed_table import (
        bucket_spec,
        publish_bucketed,
        read_key_pruned,
    )

    src = str(tmp_path / "bsrc")
    publish_bucketed(
        spark, _kv(spark, [(k, k) for k in range(40)]), src, "k", 8
    )
    dst = str(tmp_path / "bdst")
    shallow_clone(src, dst)
    assert bucket_spec(dst) == {"key_cols": ["k"], "n_buckets": 8}
    got = {
        (r.k, r.v)
        for r in read_key_pruned(
            spark, dst, spark.createDataFrame([(3,), (17,)], "k long")
        ).collect()
    }
    assert got == {(3, 3), (17, 17)}
    # bucket-pruned merge planning still fires on the absolute entries
    m = merge_version(spark, dst, _kv(spark, [(3, 333)]), "k")
    assert m["metadata"]["merge"]["buckets_probed"] >= 1
    assert _snap(spark, dst) == {(k, k) for k in range(40) if k != 3} | {
        (3, 333)
    }
    assert _snap(spark, src) == {(k, k) for k in range(40)}


def test_chained_clone_and_history(spark, tmp_path):
    """Clone-of-a-clone: absolute entries pass through unchanged, dv
    state re-keys again, and table_history labels the lineage."""
    from trial_submission_studio_spark.io.deletion_vectors import (
        delete_matching_dv,
    )
    from trial_submission_studio_spark.io.versioned import table_history

    src = str(tmp_path / "src")
    os.makedirs(src)
    d = new_data_dir(src)
    _kv(spark, [(k, k) for k in range(30)]).repartition(2).write.parquet(
        d, mode="append"
    )
    from trial_submission_studio_spark.io.versioned import publish_version

    publish_version(src, d)
    c1 = str(tmp_path / "c1")
    shallow_clone(src, c1)
    delete_matching_dv(spark, c1, _kv(spark, [(3, 0)]).select("k"), "k")
    c2 = str(tmp_path / "c2")
    shallow_clone(c1, c2, spark=spark)
    assert {(r.k, r.v) for r in read_version(spark, c2).collect()} == {
        (k, k) for k in range(30) if k != 3
    }
    # c2's manifest references the ORIGINAL data files (abs passthrough)
    m2 = read_manifest(c2)
    assert all(f.startswith("/") and "/src/" in f for f in m2["files"])
    h = table_history(c2)
    assert h[0]["op"] == "clone" and h[0]["dv_rows"] == 1


def test_delete_where_on_clone_drops_absolute_entries(spark, tmp_path):
    """Retention delete composes with clones: zone-map file drops
    remove ABSOLUTE (source-referenced) entries from the clone's
    manifest while the source keeps every file and row."""
    from trial_submission_studio_spark.io.deletion_vectors import (
        delete_where,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    d = new_data_dir(src)
    _kv(spark, [(k, k) for k in range(100)]).repartitionByRange(
        4, "k"
    ).sortWithinPartitions("k").write.parquet(d, mode="append")
    publish_with_stats(src, d, ["k"])
    dst = str(tmp_path / "dst")
    shallow_clone(src, dst)

    m = delete_where(spark, dst, [("k", "<", 30)])
    au = m["metadata"]["merge"]
    assert au["files_dropped"] >= 1  # whole source-referenced files gone
    assert au["rows_dropped"] + au["rows_tombstoned"] == 30
    assert _snap(spark, dst) == {(k, k) for k in range(30, 100)}
    # the source is untouched: all files present, all rows live
    assert _snap(spark, src) == {(k, k) for k in range(100)}
    assert len(read_manifest(src)["files"]) == 4
    # and the clone's vacuum still has nothing of the source to sweep
    assert vacuum(dst, dry_run=True, min_age_seconds=0) == []
