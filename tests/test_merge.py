"""File-grain MERGE / upsert / delete on versioned snapshots
(io/merge.py): copy-on-write rewrite set, Delta MERGE semantics,
atomic publish, time travel preserved."""

import os

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.io.merge import delete_matching, merge_version
from trial_submission_studio_spark.io.versioned import (
    new_data_dir,
    publish_version,
    read_manifest,
    read_version,
)


def _docs(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS doc_id", "concat('text-', id) AS text"
    )


def _table(spark, root, ranges=((0, 100), (100, 200))):
    """One single-file run dir per key range -> deterministic
    key->file placement for the rewrite-set assertions."""
    os.makedirs(root, exist_ok=True)
    dirs = []
    for lo, hi in ranges:
        d = new_data_dir(root)
        _docs(spark, lo, hi).repartition(1).write.parquet(d, mode="append")
        dirs.append(d)
    return publish_version(root, dirs)


def _rows(spark, root, version=None):
    return {
        (r.doc_id, r.text)
        for r in read_version(spark, root, version).collect()
    }


def test_upsert_updates_and_inserts(spark, tmp_path):
    root = str(tmp_path / "t")
    _table(spark, root)
    src = spark.createDataFrame(
        [(5, "UPDATED-5"), (150, "UPDATED-150"), (999, "NEW-999")],
        "doc_id long, text string",
    )
    m = merge_version(spark, root, src, "doc_id")
    assert m["version"] == 2
    got = _rows(spark, root)
    assert (5, "UPDATED-5") in got and (150, "UPDATED-150") in got
    assert (999, "NEW-999") in got
    assert (5, "text-5") not in got
    assert len(got) == 201  # 200 + 1 insert
    st = m["metadata"]["merge"]
    assert st["rows_updated"] == 2
    assert st["rows_inserted"] == 1
    assert st["rows_deleted"] == 0
    assert st["base_version"] == 1
    # time travel: v1 unchanged
    assert (5, "text-5") in _rows(spark, root, version=1)


def test_only_affected_files_rewritten(spark, tmp_path):
    root = str(tmp_path / "t")
    m1 = _table(spark, root)  # file A = keys 0-99, file B = keys 100-199
    src = spark.createDataFrame([(150, "X")], "doc_id long, text string")
    m2 = merge_version(spark, root, src, "doc_id")
    st = m2["metadata"]["merge"]
    assert st["files_rewritten"] == 1 and st["files_kept"] == 1
    # the untouched file is carried over by PATH, not rewritten
    kept = set(m1["files"]) & set(m2["files"])
    assert len(kept) == 1
    # and the carried file is the one holding keys 0-99
    carried = spark.read.parquet(os.path.join(root, next(iter(kept))))
    assert carried.agg(F.max("doc_id")).first()[0] == 99
    assert len(_rows(spark, root)) == 200


def test_merge_with_deletes(spark, tmp_path):
    root = str(tmp_path / "t")
    _table(spark, root)
    src = spark.createDataFrame(
        [
            (7, "UPDATED-7", False),
            (8, None, True),        # matched delete
            (5000, None, True),     # unmatched delete -> no-op
            (300, "NEW-300", False),
        ],
        "doc_id long, text string, is_del boolean",
    )
    m = merge_version(spark, root, src, "doc_id", delete_col="is_del")
    got = _rows(spark, root)
    assert (7, "UPDATED-7") in got and (300, "NEW-300") in got
    assert not any(k == 8 for k, _ in got)
    assert len(got) == 200  # -1 delete +1 insert
    st = m["metadata"]["merge"]
    assert st["rows_deleted"] == 1
    assert st["rows_updated"] == 1
    assert st["rows_inserted"] == 1


def test_delete_matching_erasure_list(spark, tmp_path):
    root = str(tmp_path / "t")
    _table(spark, root)
    doomed = spark.createDataFrame(
        [(3,), (4,), (150,), (9999,)], "doc_id long"
    )
    m = delete_matching(spark, root, doomed, "doc_id")
    got = _rows(spark, root)
    assert len(got) == 197
    assert not {k for k, _ in got} & {3, 4, 150}
    assert m["metadata"]["merge"]["rows_deleted"] == 3
    assert m["metadata"]["merge"]["op"] == "delete"
    # both original files contained doomed keys -> both rewritten
    assert m["metadata"]["merge"]["files_rewritten"] == 2


def test_duplicate_source_keys_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    _table(spark, root)
    src = spark.createDataFrame(
        [(5, "a"), (5, "b")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="duplicate-key"):
        merge_version(spark, root, src, "doc_id")


def test_schema_mismatch_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    _table(spark, root)
    src = spark.createDataFrame([(5, 1.0)], "doc_id long, score double")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_version(spark, root, src, "doc_id")


def test_delete_everything_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    _table(spark, root, ranges=((0, 10),))
    doomed = spark.range(0, 10).selectExpr("id AS doc_id")
    with pytest.raises(ValueError, match="empty table"):
        delete_matching(spark, root, doomed, "doc_id")


def test_shuffle_join_regime_equivalent(spark, tmp_path):
    """broadcast_keys=False (the web-scale CDC regime) produces the
    identical snapshot."""
    root_a = str(tmp_path / "a")
    root_b = str(tmp_path / "b")
    _table(spark, root_a)
    _table(spark, root_b)
    src = spark.createDataFrame(
        [(5, "U"), (999, "N")], "doc_id long, text string"
    )
    merge_version(spark, root_a, src, "doc_id", broadcast_keys=True)
    merge_version(spark, root_b, src, "doc_id", broadcast_keys=False)
    assert _rows(spark, root_a) == _rows(spark, root_b)


def test_insert_only_merge_keeps_all_files(spark, tmp_path):
    root = str(tmp_path / "t")
    m1 = _table(spark, root)
    src = spark.createDataFrame(
        [(1000, "NEW")], "doc_id long, text string"
    )
    m2 = merge_version(spark, root, src, "doc_id")
    st = m2["metadata"]["merge"]
    assert st["files_rewritten"] == 0 and st["files_kept"] == 2
    assert set(m1["files"]) <= set(m2["files"])
    assert len(_rows(spark, root)) == 201


def test_merge_then_read_via_manifest_only(spark, tmp_path):
    """The published file list is self-consistent: reading the
    explicit manifest list (what read_version does) agrees with the
    merge's own accounting across two chained merges."""
    root = str(tmp_path / "t")
    _table(spark, root)
    src1 = spark.createDataFrame([(5, "U1")], "doc_id long, text string")
    src2 = spark.createDataFrame(
        [(5, "U2"), (6, "U6", )], "doc_id long, text string"
    )
    merge_version(spark, root, src1, "doc_id")
    m3 = merge_version(spark, root, src2, "doc_id")
    got = _rows(spark, root)
    assert (5, "U2") in got and (6, "U6") in got and len(got) == 200
    n_manifest = sum(
        spark.read.parquet(os.path.join(root, f)).count()
        for f in read_manifest(root, m3["version"])["files"]
    )
    assert n_manifest == 200
