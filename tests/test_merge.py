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


def test_update_where_rewrites_only_matching_files(spark, tmp_path):
    """UPDATE ... WHERE (r13): zone maps prune the candidate scan,
    only files containing matches rewrite, tombstoned rows never
    update, set expressions cast back to the column's type, and CHECK
    constraints gate the rewritten files."""
    import pytest

    from trial_submission_studio_spark.io.deletion_vectors import (
        delete_matching_dv,
    )
    from trial_submission_studio_spark.io.merge import update_where
    from trial_submission_studio_spark.io.versioned import (
        ConstraintViolationError,
        current_version,
        new_data_dir,
        read_version,
        set_table_constraints,
    )
    from trial_submission_studio_spark.io.zonemap import publish_with_stats

    root = str(tmp_path / "t")
    os.makedirs(root)
    d = new_data_dir(root)
    # k-clustered: 4 files covering ranges of 25
    spark.createDataFrame(
        [(k, float(k)) for k in range(100)], "k long, v double"
    ).repartitionByRange(4, "k").sortWithinPartitions("k").write.parquet(
        d, mode="append"
    )
    publish_with_stats(root, d, ["k"])
    # a tombstoned row inside the update range must stay deleted
    delete_matching_dv(
        spark, root, spark.createDataFrame([(12,)], "k long"), "k"
    )

    m = update_where(
        spark, root, [("k", "between", (10, 20))], {"v": "v + 1000"}
    )
    au = m["metadata"]["merge"]
    assert au["op"] == "update" and au["rows_updated"] == 10  # 12 is dead
    assert au["files_rewritten"] == 1  # only the [0,25) file
    assert au["files_pruned"] >= 2  # upper files never opened
    got = {(r.k, r.v) for r in read_version(spark, root).collect()}
    want = {
        (k, float(k) + (1000 if 10 <= k <= 20 else 0))
        for k in range(100)
        if k != 12
    }
    assert got == want
    # the rewritten file folded its tombstone; others carry nothing
    assert not m.get("dv")

    # type stability: the set expression casts back to the column type
    m2 = update_where(spark, root, [("k", "=", 5)], {"v": "CAST(7 AS INT)"})
    f = {x.name: x.dataType.simpleString()
         for x in read_version(spark, root).schema.fields}
    assert f["v"] == "double" and m2["metadata"]["merge"]["rows_updated"] == 1

    # no-match: no-op commit
    v = current_version(root)
    assert update_where(
        spark, root, [("k", ">=", 10_000)], {"v": "0.0"}
    )["version"] == v

    # constraints gate the rewrite
    set_table_constraints(spark, root, {"v_nonneg": "v >= 0"})
    with pytest.raises(ConstraintViolationError):
        update_where(spark, root, [("k", "=", 30)], {"v": "-1.0"})
    assert current_version(root) == v + 1  # only the contract commit


def test_update_where_preserves_bucket_layout(spark, tmp_path):
    from trial_submission_studio_spark.io.bucketed_table import (
        publish_bucketed,
        read_key_pruned,
    )
    from trial_submission_studio_spark.io.merge import update_where

    root = str(tmp_path / "b")
    publish_bucketed(
        spark,
        spark.createDataFrame(
            [(k, float(k)) for k in range(40)], "k long, v double"
        ),
        root, "k", 4,
    )
    m = update_where(spark, root, [("k", "<", 5)], {"v": "v * 2"})
    assert m["metadata"]["bucket_spec"]
    got = {
        (r.k, r.v)
        for r in read_key_pruned(
            spark, root, spark.createDataFrame([(2,), (30,)], "k long")
        ).collect()
    }
    assert got == {(2, 4.0), (30, 30.0)}
