"""The r14 lifecycle composition re-run on an ALWAYS-SEGMENTED store
(threshold 1): partitioned publish → directory-grain retention →
column rename → shallow-clone branch → dv delete on the branch →
publish-back → compaction → rollup-style maintenance reads. Every
operator consumes resolved manifests, so this is the proof the
segmentation layer is invisible to the whole machine, not just to the
micro-ops the model test replays."""


import pytest

from trial_submission_studio_spark.io import versioned
from trial_submission_studio_spark.io.clones import publish_clone
from trial_submission_studio_spark.io.deletion_vectors import (
    delete_matching_dv,
    delete_where,
)
from trial_submission_studio_spark.io.partitioned_table import (
    publish_partitioned,
    repartition_spec,
)
from trial_submission_studio_spark.io.table_schema import rename_column
from trial_submission_studio_spark.io.versioned import (
    compact_version,
    current_version,
    read_version,
    retire_versions,
    shallow_clone,
    table_history,
    vacuum,
)


@pytest.fixture
def seg_small(monkeypatch):
    from trial_submission_studio_spark.io import datasource as ds

    monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 1)
    monkeypatch.setattr(versioned, "SEGMENT_TARGET_ENTRIES", 4)
    monkeypatch.setattr(ds, "_DS_SEGMENT_MIN_FILES", 1)
    monkeypatch.setattr(ds, "_DS_SEGMENT_TARGET_ENTRIES", 4)


def _snap(df):
    return {tuple(r) for r in df.collect()}


def test_full_lifecycle_on_segmented_store(spark, tmp_path, seg_small):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(k, f"d{k % 4}", float(k)) for k in range(80)],
        "event_id long, day string, value double",
    )
    publish_partitioned(spark, df, root, "day")
    assert versioned._read_manifest_raw(root, 1).get("segments")

    # directory-grain retention on the segmented manifest
    delete_where(spark, root, [("day", "=", "d0")])
    live = {k for k in range(80) if k % 4 != 0}
    assert _snap(read_version(spark, root).select("event_id")) == {
        (k,) for k in live
    }

    # metadata-only rename rides a segmented commit
    rename_column(spark, root, "value", "val")

    # branch: clone (absolute entries + re-keyed dv), dv-delete on
    # the branch, publish back through the rebase loop
    branch = root + "-b"
    shallow_clone(root, branch, spark=spark)
    delete_matching_dv(
        spark,
        branch,
        spark.createDataFrame(
            [(k,) for k in range(80) if k % 10 == 1], "event_id long"
        ),
        "event_id",
        verify=False,
    )
    publish_clone(spark, branch)
    live -= {k for k in range(80) if k % 10 == 1}
    got = read_version(spark, root)
    # column ORDER under a lazily-initialized mapping is the
    # name-sorted identity map's, pinned by test_column_mapping —
    # here the segmented read only needs the right column SET
    assert set(got.columns) == {"event_id", "day", "val"}
    assert _snap(got.select("event_id")) == {(k,) for k in live}

    # spec evolution mid-lifecycle, then compaction (rewrites into
    # unpartitioned files; dv folds in), then retention + vacuum
    repartition_spec(spark, root, None)
    compact_version(spark, root, target_bytes=1 << 20)
    assert _snap(read_version(spark, root).select("event_id")) == {
        (k,) for k in live
    }
    retire_versions(root, keep_latest=1)
    removed = vacuum(root, min_age_seconds=0)
    assert removed  # old generations + orphaned segments actually go
    assert _snap(read_version(spark, root).select("event_id")) == {
        (k,) for k in live
    }
    # history walk stays metadata-only green on segmented manifests
    hist = table_history(root)
    assert hist[0]["version"] == current_version(root)
    # the whole surviving store is segmented
    raw = versioned._read_manifest_raw(root, current_version(root))
    assert raw.get("segments") and "files" not in raw
