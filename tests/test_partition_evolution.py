"""Partition-spec evolution (`io/partitioned_table.py:
repartition_spec`): one metadata-only commit switches the layout of
FUTURE writes while old-generation files keep serving — and keep
directory-pruning — through their own ``__p_`` path segments. Pruning
must equal filtering on both generations, delete_where must drop
whole directories of either spec with zero reads, the spec history
must ride every later commit, and evolving to unpartitioned must not
lose the old generation's pruning."""

import os

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.io.deletion_vectors import delete_where
from trial_submission_studio_spark.io.partitioned_table import (
    append_partitioned,
    merged_partition_spec,
    partition_spec,
    publish_partitioned,
    repartition_spec,
    table_partitions,
)
from trial_submission_studio_spark.io.versioned import (
    commit_files,
    current_version,
    read_manifest,
    read_version,
    retire_versions,
    vacuum,
)
from trial_submission_studio_spark.io.zonemap import (
    prune_files,
    split_files_for_delete,
)


def _snap(df):
    return {tuple(r) for r in df.collect()}


@pytest.fixture
def evolved(spark, tmp_path):
    """A two-generation table: gen-1 partitioned by day (30 rows,
    3 days), then evolved to region and gen-2 appended (30 rows,
    3 regions)."""
    root = str(tmp_path / "t")
    gen1 = spark.createDataFrame(
        [(k, f"d{k % 3}", "rX", k) for k in range(30)],
        "k long, day string, region string, v long",
    )
    publish_partitioned(spark, gen1, root, "day")
    repartition_spec(spark, root, "region")
    gen2 = spark.createDataFrame(
        [(k, "dX", f"r{k % 3}", k) for k in range(100, 130)],
        "k long, day string, region string, v long",
    )
    append_partitioned(spark, gen2, root)
    return root


def test_mixed_layout_prune_equals_filter(spark, evolved):
    root = evolved
    m = read_manifest(root)
    assert partition_spec(root) == {"cols": ["region"]}
    assert m["metadata"]["partition_spec_history"] == [{"cols": ["day"]}]
    assert merged_partition_spec(m) == {"cols": ["region", "day"]}

    full = read_version(spark, root)
    for pred, sql in [
        ([("day", "=", "d1")], "day = 'd1'"),
        ([("region", "=", "r2")], "region = 'r2'"),
        ([("day", "=", "d0"), ("region", "=", "rX")],
         "day = 'd0' and region = 'rX'"),
    ]:
        pr = prune_files(m, pred)
        # both generations prune on their own layout
        assert pr["skipped"], pred
        kept = spark.read.parquet(
            *[os.path.join(root, f) for f in pr["kept"]]
        )
        assert _snap(kept.filter(sql).select(*full.columns)) == _snap(
            full.filter(sql)
        ), pred


def test_delete_where_drops_dirs_of_both_specs(spark, evolved):
    root = evolved
    m = read_manifest(root)
    # old-generation predicate: whole __p_day dirs drop, zero scans
    sp = split_files_for_delete(m, [("day", "=", "d0")])
    assert sp["drop"] and all("__p_day=d0" in f for f in sp["drop"])
    assert not any("__p_day=d0" in f for f in sp["scan"])
    delete_where(spark, root, [("day", "=", "d0")])
    # new-generation predicate likewise
    sp2 = split_files_for_delete(
        read_manifest(root), [("region", "=", "r1")]
    )
    assert sp2["drop"] and all("__p_region=r1" in f for f in sp2["drop"])
    delete_where(spark, root, [("region", "=", "r1")])
    got = _snap(read_version(spark, root).select("k"))
    want = {(k,) for k in range(30) if k % 3 != 0} | {
        (k,) for k in range(100, 130) if k % 3 != 1
    }
    assert got == want
    # retention: vacuum removes the dropped directories' bytes
    retire_versions(root, keep_latest=1)
    vacuum(root, min_age_seconds=0)
    left = {
        seg
        for f in read_manifest(root)["files"]
        for seg in f.split(os.sep)
        if seg.startswith("__p_")
    }
    assert "__p_day=d0" not in left and "__p_region=r1" not in left


def test_history_rides_every_commit_and_format_route(spark, evolved):
    from trial_submission_studio_spark.io.datasource import (
        plan_files,
        register,
    )

    register(spark)
    root = evolved
    # an unrelated commit (append through the loop) must carry history
    m = read_manifest(root)
    extra = str(os.path.join(root, "data", "x"))
    os.makedirs(extra, exist_ok=True)
    spark.createDataFrame(
        [(999, "dX", "rX", 0)], "k long, day string, region string, v long"
    ).coalesce(1).write.parquet(extra, mode="overwrite")
    from trial_submission_studio_spark.io.versioned import data_files

    commit_files(
        root,
        base_version=m["version"],
        kind="append",
        add_files=[os.path.relpath(p, root) for p in data_files(extra)],
    )
    m2 = read_manifest(root)
    assert m2["metadata"]["partition_spec_history"] == [
        {"cols": ["day"]}
    ]
    # the DS plan prunes on BOTH generations' layouts
    plan = plan_files(root, None, [("day", "=", "d1")])
    assert plan["files_skipped"] > 0
    got = _snap(
        spark.read.format("tss").option("root", root).load()
        .filter("day = 'd1'").select("k")
    )
    assert got == _snap(
        read_version(spark, root).filter("day = 'd1'").select("k")
    )
    # partitions metadata view names both generations
    parts = {r.partition for r in table_partitions(spark, root).collect()}
    assert any("day" in p and "d1" in p for p in parts)
    assert any("region" in p for p in parts)


def test_evolve_to_unpartitioned_keeps_old_pruning(spark, tmp_path):
    root = str(tmp_path / "u")
    publish_partitioned(
        spark,
        spark.createDataFrame(
            [(k, f"d{k % 3}") for k in range(30)], "k long, day string"
        ),
        root,
        "day",
    )
    repartition_spec(spark, root, None)
    assert partition_spec(root) is None
    m = read_manifest(root)
    pr = prune_files(m, [("day", "=", "d2")])
    assert pr["skipped"]
    # appends need no layout anymore (plain commit loop works) and
    # the refusal-to-append_partitioned is loud
    with pytest.raises(ValueError, match="no partition_spec"):
        append_partitioned(
            spark,
            spark.createDataFrame([(1, "d9")], "k long, day string"),
            root,
        )


def test_respec_guards(spark, tmp_path):
    root = str(tmp_path / "g")
    publish_partitioned(
        spark,
        spark.createDataFrame(
            [(k, f"d{k % 2}", k) for k in range(8)],
            "k long, day string, v long",
        ),
        root,
        "day",
        stats_columns=["k"],
    )
    with pytest.raises(ValueError, match="unchanged"):
        repartition_spec(spark, root, "day")
    # schema contract known (stats commit records it? publish records
    # schema only via publish_checked; here schema may be absent ->
    # unknown cols can't be validated, so use a mapped table instead)
    from trial_submission_studio_spark.io.table_schema import rename_column

    rename_column(spark, root, "v", "val")
    with pytest.raises(ValueError, match="not in the table schema"):
        repartition_spec(spark, root, "nope")
    # renaming the CURRENT spec column still refuses
    with pytest.raises(ValueError, match="partition-spec column"):
        rename_column(spark, root, "day", "dd")
    # evolve, then the superseded column becomes renamable — and its
    # directory pruning survives the rename (physical names frozen)
    repartition_spec(spark, root, "val")
    rename_column(spark, root, "day", "dd")
    m = read_manifest(root)
    pr = prune_files(m, [("dd", "=", "d1")])
    assert pr["skipped"]
    got = _snap(read_version(spark, root).filter("dd = 'd1'").select("k"))
    assert got == {(k,) for k in range(8) if k % 2 == 1}
