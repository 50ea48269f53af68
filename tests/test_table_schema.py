"""Commit-time schema enforcement (io/table_schema.py): footer
capture, recorded contract in the manifest, incompatible appends
refused loudly, explicit evolution."""

import os

import pytest

from trial_submission_studio_spark.io.table_schema import (
    file_schema,
    publish_checked,
    schema_violations,
    snapshot_schema,
)
from trial_submission_studio_spark.io.versioned import (
    new_data_dir,
    read_manifest,
    read_version,
)


def _write(spark, root, expr_list, lo=0, hi=100):
    d = new_data_dir(root)
    spark.range(lo, hi).selectExpr(*expr_list).repartition(1).write.parquet(
        d, mode="append"
    )
    return d


BASE = ["id", "concat('t', id) AS text", "CAST(id AS DOUBLE) AS score"]


def test_capture_and_record(spark, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    d = _write(spark, root, BASE)
    m = publish_checked(root, d)
    names = {f["name"]: f["type"] for f in m["schema"]}
    assert names == {"id": "int64", "text": "string", "score": "double"}
    # and the manifest on disk carries it
    assert read_manifest(root, m["version"])["schema"] == m["schema"]


def test_compatible_append_ok(spark, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    m1 = publish_checked(root, _write(spark, root, BASE))
    m2 = publish_checked(
        root, _write(spark, root, BASE, 100, 150), base_version=m1["version"]
    )
    assert read_version(spark, root).count() == 150
    assert m2["schema"] == m1["schema"]


def test_type_drift_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    m1 = publish_checked(root, _write(spark, root, BASE))
    drifted = _write(
        spark, root,
        ["id", "concat('t', id) AS text", "CAST(id AS STRING) AS score"],
        100, 150,
    )
    with pytest.raises(ValueError, match="type changed: score"):
        publish_checked(root, drifted, base_version=m1["version"])
    # the refused commit published nothing
    assert read_manifest(root)["version"] == m1["version"]


def test_dropped_column_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    m1 = publish_checked(root, _write(spark, root, BASE))
    narrow = _write(spark, root, ["id", "concat('t', id) AS text"], 100, 150)
    with pytest.raises(ValueError, match="column dropped: score"):
        publish_checked(root, narrow, base_version=m1["version"])


def test_new_column_needs_explicit_evolution(spark, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    m1 = publish_checked(root, _write(spark, root, BASE))
    wide = _write(
        spark, root, BASE + ["CAST(id % 2 AS BOOLEAN) AS flag"], 100, 150
    )
    with pytest.raises(ValueError, match="new column: flag"):
        publish_checked(root, wide, base_version=m1["version"])
    m2 = publish_checked(
        root, wide, base_version=m1["version"], allow_new_columns=True
    )
    assert any(f["name"] == "flag" for f in m2["schema"])
    # old files read the evolved column as NULL (by-name resolution)
    df = spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(root, f) for f in m2["files"]]
    )
    assert df.count() == 150
    assert df.filter("flag IS NULL").count() == 100


def test_mixed_schema_within_one_publish_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    d1 = _write(spark, root, BASE)
    d2 = _write(spark, root, ["id", "concat('t', id) AS text"], 100, 150)
    with pytest.raises(ValueError, match="inconsistent schemas"):
        publish_checked(root, [d1, d2])


def test_pre_guard_table_checks_against_footers(spark, tmp_path):
    """Appending onto a table published WITHOUT the guard still
    validates — against the base files' actual footers."""
    from trial_submission_studio_spark.io.versioned import publish_version

    root = str(tmp_path / "t")
    os.makedirs(root)
    m1 = publish_version(root, _write(spark, root, BASE))
    assert "schema" not in m1
    bad = _write(spark, root, ["id", "concat('t', id) AS text"], 100, 150)
    with pytest.raises(ValueError, match="column dropped"):
        publish_checked(root, bad, base_version=m1["version"])
    good = publish_checked(
        root, _write(spark, root, BASE, 100, 150), base_version=m1["version"]
    )
    assert "schema" in good  # the guard upgrades the table going forward


def test_schema_and_stats_one_commit(spark, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    m = publish_checked(root, _write(spark, root, BASE), stats_columns=["id"])
    assert "schema" in m and len(m["stats"]) == 1
    entry = next(iter(m["stats"].values()))
    assert set(entry["columns"]) == {"id"}


def test_violation_listing_is_complete():
    base = [
        {"name": "a", "type": "int64", "nullable": True},
        {"name": "b", "type": "string", "nullable": False},
    ]
    new = [
        {"name": "a", "type": "double", "nullable": True},
        {"name": "b", "type": "string", "nullable": True},
        {"name": "c", "type": "int64", "nullable": True},
    ]
    v = schema_violations(base, new)
    assert any("type changed: a" in x for x in v)
    assert any("nullability changed: b" in x for x in v)
    assert any("new column: c" in x for x in v)
    assert schema_violations(base, base) == []
