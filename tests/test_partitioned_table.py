"""Hive-style partition spec (`io/partitioned_table.py`): directory
pruning with zero footer reads on stats-less tables, directory-grain
retention deletes, layout-preserving rewrites, partition+bucket
nesting, and the loud spec-conflict refusals."""

import os

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.io.deletion_vectors import (
    delete_matching_dv,
    delete_where,
)
from trial_submission_studio_spark.io.merge import merge_version
from trial_submission_studio_spark.io.partitioned_table import (
    append_partitioned,
    partition_pseudo_stats,
    partition_spec,
    partition_values,
    publish_partitioned,
)
from trial_submission_studio_spark.io.versioned import (
    compact_version,
    current_version,
    read_manifest,
    read_version,
)
from trial_submission_studio_spark.io.zonemap import (
    optimize_version,
    pruning_audit,
    read_pruned,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "k long, day string, v long")


def _rows(spark, root, version=None):
    return {
        (r.k, r.day, r.v)
        for r in read_version(spark, root, version).collect()
    }


def _mk(spark, tmp_path, name="p", days=("2024-01-01", "2024-01-02",
                                          "2024-01-03"), per_day=10):
    root = str(tmp_path / name)
    rows = [
        (d_i * 100 + i, d, (d_i * 100 + i) * 10)
        for d_i, d in enumerate(days)
        for i in range(per_day)
    ]
    publish_partitioned(spark, _docs(spark, rows), root, "day")
    return root, rows


def test_partition_roundtrip_and_zero_footer_pruning(spark, tmp_path):
    root, rows = _mk(spark, tmp_path)
    assert partition_spec(root) == {"cols": ["day"]}
    assert _rows(spark, root) == set(rows)
    m = read_manifest(root)
    # the layout is visible in the manifest entries and parseable
    assert all("__p_day=" in f for f in m["files"])
    assert partition_values(m["files"][0], {"cols": ["day"]})["day"]
    # NO stats were collected, yet the predicate prunes by path alone
    assert not m.get("stats")
    audit = pruning_audit(root, [("day", "=", "2024-01-02")])
    assert audit["files_skipped"] >= 2
    got = {
        r.k
        for r in read_pruned(
            spark, root, [("day", "=", "2024-01-02")]
        ).collect()
    }
    assert got == {100 + i for i in range(10)}


def test_retention_delete_is_directory_grain(spark, tmp_path):
    root, rows = _mk(spark, tmp_path)
    m = delete_where(spark, root, [("day", "<", "2024-01-03")])
    au = m["metadata"]["merge"]
    # whole directories dropped, nothing scanned: zero bytes read
    assert au["files_dropped"] >= 2
    assert au["files_scanned"] == 0 and au["rows_tombstoned"] == 0
    assert _rows(spark, root) == {
        (k, d, v) for k, d, v in rows if d >= "2024-01-03"
    }
    # the layout contract rode the commit automatically
    assert partition_spec(root) == {"cols": ["day"]}


def test_rewrites_preserve_the_directory_layout(spark, tmp_path):
    root, rows = _mk(spark, tmp_path)
    append_partitioned(
        spark, _docs(spark, [(900, "2024-01-04", 1)]), root
    )
    merge_version(
        spark, root,
        _docs(spark, [(0, "2024-01-01", 999), (901, "2024-01-04", 2)]),
        "k",
    )
    delete_matching_dv(
        spark, root, spark.createDataFrame([(1,)], "k long"), "k"
    )
    compact_version(
        spark, root, small_threshold=10**9, include_dv_files=True
    )
    want = {(k, d, v) for k, d, v in rows if k not in (0, 1)} | {
        (0, "2024-01-01", 999),
        (900, "2024-01-04", 1),
        (901, "2024-01-04", 2),
    }
    assert _rows(spark, root) == want
    # every rewritten file went back under a partition dir, so the
    # whole CURRENT snapshot still carries pseudo-stats and a day
    # predicate still prunes everything it should
    m = read_manifest(root)
    assert all("__p_day=" in f for f in m["files"])
    audit = pruning_audit(root, [("day", "=", "2024-01-04")])
    assert audit["files_kept"] < audit["files_total"]
    got = {
        r.k
        for r in read_pruned(
            spark, root, [("day", "=", "2024-01-04")]
        ).collect()
    }
    assert got == {900, 901}


def test_partition_bucket_nesting_composes(spark, tmp_path):
    from trial_submission_studio_spark.io.bucketed_table import (
        read_key_pruned,
    )

    root = str(tmp_path / "pb")
    rows = [
        (k, f"2024-01-0{1 + k % 3}", k * 10) for k in range(60)
    ]
    publish_partitioned(
        spark, _docs(spark, rows), root, "day", bucket_key="k", n_buckets=4
    )
    m = read_manifest(root)
    # Hive layout proper: bucket dirs nested INSIDE partition dirs
    assert all("__p_day=" in f and "__kb=" in f for f in m["files"])
    got = {
        (r.k, r.v)
        for r in read_key_pruned(
            spark, root, spark.createDataFrame([(7,), (41,)], "k long")
        ).collect()
    }
    assert got == {(7, 70), (41, 410)}
    # and both path prunes compose on one predicate + probe
    audit = pruning_audit(root, [("day", "=", "2024-01-02")])
    assert audit["files_skipped"] > 0


def test_null_and_encoded_partition_values(spark, tmp_path):
    root = str(tmp_path / "pn")
    rows = [(1, "a b/c", 10), (2, None, 20), (3, "z", 30)]
    publish_partitioned(spark, _docs(spark, rows), root, "day")
    assert _rows(spark, root) == set(rows)
    # equality prune on the URL-encoded value still finds the row
    got = {
        r.k
        for r in read_pruned(spark, root, [("day", "=", "a b/c")]).collect()
    }
    assert got == {1}
    # the null-partition dir claims no stats: a range delete must
    # leave it untouched (NULL satisfies no comparison)
    delete_where(spark, root, [("day", "<", "z")])
    assert _rows(spark, root) == {(2, None, 20), (3, "z", 30)}


def test_typed_partition_values_prune_ranges(spark, tmp_path):
    root = str(tmp_path / "pt")
    df = spark.createDataFrame(
        [(k, k % 5, k) for k in range(50)], "k long, shard int, v long"
    )
    publish_partitioned(spark, df, root, "shard")
    ps = partition_pseudo_stats(read_manifest(root))
    assert all(
        e["columns"]["shard"]["t"] == "int" for e in ps.values()
    )
    audit = pruning_audit(root, [("shard", ">=", 3)])
    assert audit["files_skipped"] >= 3
    got = {
        r.k
        for r in read_pruned(spark, root, [("shard", ">=", 3)]).collect()
    }
    assert got == {k for k in range(50) if k % 5 >= 3}


def test_metadata_tables(spark, tmp_path):
    """DESCRIBE DETAIL + files/partitions metadata tables: manifest-
    only answers with the layout contracts visible."""
    from trial_submission_studio_spark.io.partitioned_table import (
        table_partitions,
    )
    from trial_submission_studio_spark.io.versioned import (
        table_detail,
        table_files,
    )

    root, rows = _mk(spark, tmp_path, name="pm")
    delete_matching_dv(
        spark, root, spark.createDataFrame([(0,)], "k long"), "k"
    )
    d = table_detail(root)
    assert d["partition_spec"] == {"cols": ["day"]}
    assert d["n_files"] >= 3 and d["dv_rows"] == 1
    tf = table_files(spark, root)
    assert tf.count() == d["n_files"]
    got = {r.partition for r in tf.collect()}
    assert '{"day": "2024-01-01"}' in got
    tp = {r.partition: r.n_files for r in table_partitions(spark, root).collect()}
    assert len(tp) == 3 and all(n >= 1 for n in tp.values())
    dvp = {
        r.partition: r.dv_rows
        for r in table_partitions(spark, root).collect()
    }
    assert dvp['{"day": "2024-01-01"}'] == 1


def test_spec_conflicts_refused_loudly(spark, tmp_path):
    root, _rows_ = _mk(spark, tmp_path, name="pc")
    with pytest.raises(ValueError, match="partition-spec"):
        optimize_version(spark, root, {"k": (0.0, 1000.0)})
    from trial_submission_studio_spark.io.bucketed_table import (
        publish_bucketed,
    )

    with pytest.raises(ValueError, match="partition-spec"):
        publish_bucketed(
            spark, _docs(spark, [(1, "x", 1)]), root, "k", 4
        )
    from trial_submission_studio_spark.io.table_schema import (
        rename_column,
    )

    with pytest.raises(ValueError, match="partition-spec column"):
        rename_column(spark, root, "day", "dt")
    with pytest.raises(ValueError, match="both partition and bucket"):
        publish_partitioned(
            spark, _docs(spark, [(1, "x", 1)]), str(tmp_path / "px"),
            "day", bucket_key="day", n_buckets=4,
        )
    # changing the spec on an existing root refuses
    with pytest.raises(ValueError, match="partition spec changed"):
        publish_partitioned(spark, _docs(spark, [(1, "x", 1)]), root, "v")
