"""r16 code-review findings, each pinned: (1) schema() must never
claim non-nullable for a column the reader can null-fill (optimizer
folds IS NULL on non-nullable attributes -> silently wrong results);
(2) remove+re-add of one path behaves identically on plain and
segmented stores; (3) a dv entry for a removed file is refused
loudly on both; (4) out-of-range dv ordinals are tolerated, not an
IndexError; (5) a summary missing n_files falls back instead of
KeyError; (6) a lost remove race reports the concurrent-rewrite
conflict, not 'not in the base snapshot'."""

import os

import pytest

from trial_submission_studio_spark.io import datasource as ds
from trial_submission_studio_spark.io import versioned
from trial_submission_studio_spark.io.versioned import (
    TableConflictError,
    commit_files,
    current_version,
    publish_files,
    read_manifest,
)


@pytest.fixture
def seg_small(monkeypatch):
    monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 1)
    monkeypatch.setattr(versioned, "SEGMENT_TARGET_ENTRIES", 4)
    monkeypatch.setattr(ds, "_DS_SEGMENT_MIN_FILES", 1)
    monkeypatch.setattr(ds, "_DS_SEGMENT_TARGET_ENTRIES", 4)


def _mk_file(root, rel, payload=b"x"):
    full = os.path.join(root, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "wb") as f:
        f.write(payload)
    return rel


def _seed(root, n=8):
    files = [_mk_file(root, f"data/r/f{i}.parquet") for i in range(n)]
    publish_files(root, files, stats={f: {"num_rows": 1} for f in files})
    return files


def test_evolved_column_stays_nullable_and_is_null_works(
    spark, tmp_path
):
    """The wrong-results repro from the review: old file lacks
    ``extra``; schema() claiming non-nullable would let Catalyst fold
    ``extra IS NULL`` to false and drop the old rows."""
    from trial_submission_studio_spark.io.datasource import register
    from trial_submission_studio_spark.io.table_schema import (
        publish_checked,
    )
    from trial_submission_studio_spark.io.versioned import new_data_dir

    register(spark)
    root = str(tmp_path / "t")
    os.makedirs(root)
    d1 = new_data_dir(root)
    spark.createDataFrame(
        [(k, k * 10) for k in range(5)], "k long, v long"
    ).coalesce(1).write.parquet(d1, mode="append")
    publish_checked(root, d1)
    d2 = new_data_dir(root)
    spark.createDataFrame(
        [(k, k * 10, f"e{k}") for k in range(5, 10)],
        "k long, v long, extra string",
    ).coalesce(1).write.parquet(d2, mode="append")
    publish_checked(root, d2, base_version=1, allow_new_columns=True)

    df = spark.read.format("tss").option("root", root).load()
    nullables = {f.name: f.nullable for f in df.schema.fields}
    assert nullables["extra"] is True
    # the old generation's rows survive an IS NULL filter
    assert df.filter("extra IS NULL").count() == 5
    assert df.filter("extra IS NOT NULL").count() == 5


@pytest.mark.parametrize("segmented", [False, True])
def test_remove_and_readd_same_path(tmp_path, monkeypatch, segmented):
    if segmented:
        monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 1)
        monkeypatch.setattr(versioned, "SEGMENT_TARGET_ENTRIES", 4)
    root = str(tmp_path / "t")
    os.makedirs(root)
    files = _seed(root)
    assert ("segments" in versioned._read_manifest_raw(root, 1)) is (
        segmented
    )
    # in-place rewrite: same path removed and re-added in one commit
    commit_files(
        root, base_version=1, kind="maintenance",
        add_files=[files[0]], remove_files=[files[0]],
        add_stats={files[0]: {"num_rows": 2}},
    )
    m = read_manifest(root)
    assert sorted(m["files"]) == sorted(files)
    assert m["stats"][files[0]] == {"num_rows": 2}


@pytest.mark.parametrize("segmented", [False, True])
def test_dv_entry_for_removed_file_refused(
    tmp_path, monkeypatch, segmented
):
    if segmented:
        monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 1)
        monkeypatch.setattr(versioned, "SEGMENT_TARGET_ENTRIES", 4)
    root = str(tmp_path / "t")
    os.makedirs(root)
    files = _seed(root)
    sc0 = _mk_file(root, "dv/r/sc0.parquet")
    # ensure the table already carries dv so the segmented raw path
    # (not the first-dv fallback) handles the bad commit
    commit_files(
        root, base_version=1, kind="keyed",
        dv_updates={files[1]: {"sidecars": [sc0], "rows": 1}},
    )
    sc = _mk_file(root, "dv/r/sc1.parquet")
    with pytest.raises(ValueError, match="tombstone"):
        commit_files(
            root, base_version=current_version(root), kind="keyed",
            remove_files=[files[0]],
            dv_updates={files[0]: {"sidecars": [sc], "rows": 1}},
        )
    # nothing was published
    assert read_manifest(root)["version"] == 2


def test_out_of_range_dv_ordinal_tolerated(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "data"))
    os.makedirs(os.path.join(root, "dv"))
    data = os.path.join(root, "data", "f.parquet")
    pq.write_table(pa.table({"k": pa.array([1, 2], pa.int64())}), data)
    sidecar = os.path.join(root, "dv", "sc.parquet")
    pq.write_table(
        pa.table({
            "__tss_file": pa.array(["data/f.parquet"] * 2),
            "__tss_pos": pa.array([1, 5], pa.int64()),  # 5 is bogus
        }),
        sidecar,
    )
    t = ds._read_file_arrow(
        data, ["k"], (sidecar,), "data/f.parquet"
    )
    # ordinal 1 masked, bogus ordinal 5 ignored — no IndexError
    assert t.column("k").to_pylist() == [1]


def test_summary_missing_n_files_falls_back(tmp_path, seg_small):
    import json

    root = str(tmp_path / "t")
    os.makedirs(root)
    files = _seed(root)
    path = versioned._manifest_path(root, 1)
    doc = json.loads(open(path).read())
    for summ in doc["segment_stats"].values():
        summ.pop("n_files", None)
    os.chmod(path, 0o644)
    with open(path, "w") as fh:
        fh.write(json.dumps(doc))
    versioned._SEG_CACHE.clear()
    extra = _mk_file(root, "data/r/zz.parquet")
    m = commit_files(
        root, base_version=1, kind="append", add_files=[extra]
    )
    assert read_manifest(root)["n_files"] == 9

    # and the sink path likewise
    ds._DS_SEG_CACHE.clear()
    path2 = versioned._manifest_path(root, m["version"])
    doc2 = json.loads(open(path2).read())
    for summ in doc2["segment_stats"].values():
        summ.pop("n_files", None)
    os.chmod(path2, 0o644)
    with open(path2, "w") as fh:
        fh.write(json.dumps(doc2))
    sink = _mk_file(root, "data/stream-x/p.parquet")
    ds._ds_append_commit(root, [sink], {"writer": "sink"})
    assert read_manifest(root)["n_files"] == 10


def test_lost_remove_race_reports_concurrent_conflict(
    tmp_path, seg_small
):
    root = str(tmp_path / "t")
    os.makedirs(root)
    files = _seed(root)
    # a concurrent keyed commit removes files[0] after our base read
    commit_files(
        root, base_version=1, kind="keyed", remove_files=[files[0]]
    )
    with pytest.raises(TableConflictError, match="concurrent commit"):
        commit_files(
            root, base_version=1, kind="maintenance",
            add_files=[_mk_file(root, "data/r/repl.parquet")],
            remove_files=[files[0]],
        )
