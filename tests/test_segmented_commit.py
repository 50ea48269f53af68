"""The r16 raw-segment commit path (`versioned._commit_files_segmented`):
commit_files against a SEGMENTED target validates rebases and builds
the new manifest from segment refs alone — a pure append on a
10^4-file table loads ZERO prior segments end-to-end; deletes and dv
updates load only covering segments; every classic-path refusal
(missing removes, duplicate adds, orphan dv, unsafe rebases, dv
growth) still fires; racing writers still serialize through the
exclusive manifest create."""

import os
import threading

import pytest

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


def _mk_file(root, rel):
    full = os.path.join(root, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "wb") as f:
        f.write(b"x")
    return rel


def _seed(root, n=12, stats=True):
    files = [_mk_file(root, f"data/r/f{i:04d}.parquet") for i in range(n)]
    publish_files(
        root, files,
        stats=(
            {f: {"num_rows": 2, "columns": {
                "k": {"t": "int", "min": i, "max": i, "nulls": 0}}}
             for i, f in enumerate(files)}
            if stats else None
        ),
    )
    return files


def _counting(monkeypatch):
    loads = {"n": 0}
    real = versioned._load_segment

    def counting(r, sid):
        loads["n"] += 1
        return real(r, sid)

    monkeypatch.setattr(versioned, "_load_segment", counting)
    versioned._SEG_CACHE.clear()
    return loads


def test_pure_append_on_10k_file_table_loads_zero_segments(
    tmp_path, monkeypatch
):
    monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 256)
    monkeypatch.setattr(versioned, "SEGMENT_TARGET_ENTRIES", 1024)
    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "data", "r"))
    files = []
    for i in range(10_000):
        rel = f"data/r/f{i:06d}.parquet"
        open(os.path.join(root, rel), "wb").write(b"x")
        files.append(rel)
    publish_files(
        root, files, stats={f: {"num_rows": 1} for f in files}
    )
    assert len(versioned._read_manifest_raw(root, 1)["segments"]) >= 9
    loads = _counting(monkeypatch)
    fresh = [_mk_file(root, "data/r/zzz.parquet")]
    m = commit_files(
        root, base_version=1, kind="append", add_files=fresh,
        add_stats={fresh[0]: {"num_rows": 1}},
    )
    assert loads["n"] == 0  # zero prior segments, end-to-end
    assert m["n_files"] == 10_001 and "files" not in m
    # the resolved view agrees
    assert len(read_manifest(root)["files"]) == 10_001


def test_raw_path_refusals_match_classic(tmp_path, seg_small):
    root = str(tmp_path / "t")
    os.makedirs(root)
    files = _seed(root)
    # missing remove
    with pytest.raises(TableConflictError, match="not in the base"):
        commit_files(
            root, base_version=1, kind="keyed",
            remove_files=["data/r/ghost.parquet"],
        )
    # duplicate add
    with pytest.raises(ValueError, match="duplicate files"):
        commit_files(
            root, base_version=1, kind="append", add_files=[files[0]]
        )
    # orphan dv
    with pytest.raises(ValueError, match="dropped\ntombstone|tombstone"):
        commit_files(
            root, base_version=1, kind="keyed",
            dv_updates={"data/r/ghost.parquet":
                        {"sidecars": ["dv/x.parquet"], "rows": 1}},
        )
    # empty result
    with pytest.raises(ValueError, match="empty file list"):
        commit_files(
            root, base_version=1, kind="keyed", remove_files=files
        )


def test_raw_path_rebase_matrix(tmp_path, seg_small):
    root = str(tmp_path / "t")
    os.makedirs(root)
    files = _seed(root)
    # intervening append lands after our base
    other = _mk_file(root, "data/r/other.parquet")
    commit_files(root, base_version=1, kind="append", add_files=[other])

    # append over append: rebases fine, keeps both
    mine = _mk_file(root, "data/r/mine.parquet")
    commit_files(root, base_version=1, kind="append", add_files=[mine])
    got = set(read_manifest(root)["files"])
    assert {other, mine} <= got and len(got) == 14

    # keyed over append: refused (WriteSerializable)
    with pytest.raises(TableConflictError, match="non-maintenance"):
        commit_files(
            root, base_version=1, kind="keyed", remove_files=[files[0]]
        )

    # maintenance whose inputs survived: allowed
    repl = _mk_file(root, "data/r/repl.parquet")
    commit_files(
        root, base_version=1, kind="maintenance",
        add_files=[repl], remove_files=[files[1]],
    )
    got = set(read_manifest(root)["files"])
    assert repl in got and files[1] not in got


def test_raw_path_dv_growth_conflict(tmp_path, seg_small):
    root = str(tmp_path / "t")
    os.makedirs(root)
    files = _seed(root)
    sc0 = _mk_file(root, "dv/r/sc0.parquet")
    # table already carries dv (so the raw path handles dv commits)
    commit_files(
        root, base_version=1, kind="keyed",
        dv_updates={files[0]: {"sidecars": [sc0], "rows": 1}},
    )
    base_v = current_version(root)
    # intervening writer tombstones files[3]
    sc1 = _mk_file(root, "dv/r/sc1.parquet")
    commit_files(
        root, base_version=base_v, kind="keyed",
        dv_updates={files[3]: {"sidecars": [sc1], "rows": 2}},
    )
    # my maintenance rewrite of files[3], computed before those
    # tombstones: must conflict, not resurrect the deleted rows
    repl = _mk_file(root, "data/r/repl.parquet")
    with pytest.raises(TableConflictError, match="tombstones"):
        commit_files(
            root, base_version=base_v, kind="maintenance",
            add_files=[repl], remove_files=[files[3]],
        )
    # dv accounting survived intact
    assert versioned._read_manifest_raw(
        root, current_version(root)
    )["dv_rows"] == 3


def test_first_dv_falls_back_to_classic_and_works(
    tmp_path, seg_small
):
    root = str(tmp_path / "t")
    os.makedirs(root)
    files = _seed(root)
    sc = _mk_file(root, "dv/r/sc.parquet")
    m = commit_files(
        root, base_version=1, kind="keyed",
        dv_updates={files[2]: {"sidecars": [sc], "rows": 4}},
    )
    got = read_manifest(root)
    assert got["dv"] == {files[2]: {"sidecars": [sc], "rows": 4}}
    raw = versioned._read_manifest_raw(root, m["version"])
    assert raw["dv_rows"] == 4


def _poison_n_files(root, version):
    import json

    path = versioned._manifest_path(root, version)
    doc = json.loads(open(path).read())
    for summ in doc["segment_stats"].values():
        summ["n_files"] += 1
    os.chmod(path, 0o644)
    with open(path, "w") as fh:
        fh.write(json.dumps(doc))


def test_stale_summary_books_fall_back_to_classic(
    tmp_path, seg_small
):
    """A corrupted summary n_files makes the raw path's books not
    balance: both the batch commit and the sink append must fall back
    to the fully-resolved path and still publish correct state."""
    from trial_submission_studio_spark.io import datasource as ds

    root = str(tmp_path / "t")
    os.makedirs(root)
    files = _seed(root)
    _poison_n_files(root, 1)
    extra = _mk_file(root, "data/r/zz.parquet")
    m = commit_files(
        root, base_version=1, kind="append", add_files=[extra]
    )
    got = read_manifest(root)
    assert sorted(got["files"]) == sorted(files + [extra])
    assert got["n_files"] == 13

    _poison_n_files(root, current_version(root))
    ds._DS_SEG_CACHE.clear()
    sink = _mk_file(root, "data/stream-x/p0.parquet")
    m2 = ds._ds_append_commit(root, [sink], {"writer": "sink"})
    got2 = read_manifest(root)
    assert sorted(got2["files"]) == sorted(files + [extra, sink])
    assert got2["n_files"] == m2["n_files"] == 14


def test_racing_segmented_appends_all_land(tmp_path, seg_small):
    root = str(tmp_path / "t")
    os.makedirs(root)
    _seed(root, 8)
    errs: list = []

    def worker(i):
        try:
            f = _mk_file(root, f"data/w{i}/x.parquet")
            commit_files(
                root, base_version=1, kind="append", add_files=[f],
                max_retries=50,
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    m = read_manifest(root)
    assert len(m["files"]) == 16
    assert current_version(root) == 9


def test_raw_commit_carries_contracts_and_layout(tmp_path, seg_small):
    root = str(tmp_path / "t")
    os.makedirs(root)
    files = [
        _mk_file(root, f"data/r/__p_day=d{i // 4}/f{i}.parquet")
        for i in range(8)
    ]
    publish_files(
        root, files,
        schema=[{"name": "k", "type": "int64", "nullable": True}],
        metadata={"partition_spec": {"cols": ["day"]}},
        column_mapping={"k": "k"},
    )
    extra = _mk_file(root, "data/r/__p_day=d9/z.parquet")
    m = commit_files(
        root, base_version=1, kind="append", add_files=[extra]
    )
    assert m["schema"] == [
        {"name": "k", "type": "int64", "nullable": True}
    ]
    assert m["column_mapping"] == {"k": "k"}
    assert m["metadata"]["partition_spec"] == {"cols": ["day"]}
    # the fresh segment's summary folds the partition pseudo-stats
    summ = m["segment_stats"]
    fresh_sids = [
        s for s in m["segments"]
        if summ[s].get("file_min", "").find("__p_day=d9") >= 0
        or extra >= summ[s].get("file_min", "\xff")
    ]
    assert any(
        "day" in (summ[s].get("columns") or {}) for s in m["segments"]
    )
