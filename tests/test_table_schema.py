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


def test_check_constraints_enforced_at_commit(spark, tmp_path):
    """CHECK constraints (r13): recorded once as a manifest contract,
    enforced at the commit loop's choke point on every row-ADDING
    commit's fresh files — merge upserts and appends refuse with
    per-constraint counts; row-preserving maintenance skips the
    re-check; the contract travels through rollback and clones."""
    import os

    import pytest

    from trial_submission_studio_spark.io.merge import merge_version
    from trial_submission_studio_spark.io.versioned import (
        ConstraintViolationError,
        compact_version,
        current_version,
        new_data_dir,
        publish_version,
        read_version,
        set_table_constraints,
        shallow_clone,
        table_constraints,
    )

    root = str(tmp_path / "t")
    os.makedirs(root)
    d = new_data_dir(root)
    spark.createDataFrame(
        [(k, float(k)) for k in range(1, 20)], "k long, v double"
    ).repartition(2).write.parquet(d, mode="append")
    publish_version(root, d)

    cons = {"v_positive": "v > 0", "k_not_null": "k IS NOT NULL"}
    set_table_constraints(spark, root, cons)
    assert table_constraints(root) == cons

    # violating merge refused with counts; nothing published
    v = current_version(root)
    with pytest.raises(ConstraintViolationError) as ei:
        merge_version(
            spark, root,
            spark.createDataFrame([(1, -5.0), (99, 1.0)], "k long, v double"),
            "k",
        )
    assert ei.value.counts == {"v_positive": 1}
    assert current_version(root) == v

    # clean merge passes; contract carried forward
    merge_version(
        spark, root,
        spark.createDataFrame([(1, 11.0)], "k long, v double"), "k",
    )
    assert table_constraints(root) == cons

    # violating APPEND refused too (fresh files validated)
    d = new_data_dir(root)
    spark.createDataFrame([(50, 0.0)], "k long, v double").write.parquet(
        d, mode="append"
    )
    with pytest.raises(ConstraintViolationError):
        publish_version(
            root, d, base_version=current_version(root), spark=spark
        )
    # NULL check result counts as a violation (strict gate)
    d2 = new_data_dir(root)
    spark.createDataFrame([(51, None)], "k long, v double").write.parquet(
        d2, mode="append"
    )
    with pytest.raises(ConstraintViolationError):
        publish_version(
            root, d2, base_version=current_version(root), spark=spark
        )

    # maintenance skips the re-check but carries the contract
    m = compact_version(spark, root, target_bytes=1 << 26)
    assert m.get("constraints") == cons

    # recording a constraint the CURRENT rows already violate refuses
    with pytest.raises(ConstraintViolationError):
        set_table_constraints(spark, root, {"impossible": "v > 1000"})

    # the contract travels with a shallow clone and keeps enforcing
    dst = str(tmp_path / "c")
    shallow_clone(root, dst)
    assert table_constraints(dst) == cons
    with pytest.raises(ConstraintViolationError):
        merge_version(
            spark, dst,
            spark.createDataFrame([(2, -1.0)], "k long, v double"), "k",
        )

    # dropping constraints re-opens the gate
    set_table_constraints(spark, root, {})
    merge_version(
        spark, root,
        spark.createDataFrame([(60, -1.0)], "k long, v double"), "k",
    )
    assert (60, -1.0) in {
        (r.k, r.v) for r in read_version(spark, root).collect()
    }


def test_constraint_change_conflicts_with_inflight_adds(spark, tmp_path):
    """A commit whose rows were validated against the OLD contract
    must not land after set_table_constraints changed it mid-flight."""
    import os

    import pytest

    from trial_submission_studio_spark.io.versioned import (
        TableConflictError,
        commit_files,
        current_version,
        data_files,
        new_data_dir,
        publish_version,
        set_table_constraints,
    )

    root = str(tmp_path / "t")
    os.makedirs(root)
    d = new_data_dir(root)
    spark.createDataFrame([(1, 2.0)], "k long, v double").write.parquet(
        d, mode="append"
    )
    publish_version(root, d)
    v0 = current_version(root)
    d2 = new_data_dir(root)
    spark.createDataFrame([(2, 3.0)], "k long, v double").write.parquet(
        d2, mode="append"
    )
    rels = [os.path.relpath(p, root) for p in data_files(d2)]
    set_table_constraints(spark, root, {"v_pos": "v > 0"})
    with pytest.raises(TableConflictError, match="constraints changed"):
        commit_files(
            root, base_version=v0, kind="append", add_files=rels,
            spark=spark,
        )
