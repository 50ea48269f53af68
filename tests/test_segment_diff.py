"""Segment-aware version diffing (r16): `diff_versions`, the change
feed's `partitions()` planner, and `changefeed._slices` must load
ONLY the segments the two versions do not share — shared segment ids
are content-addressed, hence byte-identical, and contribute nothing.
The audit counters here pin the O(delta) claim; the equality tests
pin that the cheap path computes the same answer as full resolution.
"""

import os

import pytest
from pyspark.sql.types import StringType, StructField, StructType

from trial_submission_studio_spark.io import versioned
from trial_submission_studio_spark.io import datasource as ds
from trial_submission_studio_spark.io.versioned import (
    commit_files,
    current_version,
    diff_versions,
    publish_files,
    read_manifest,
)


@pytest.fixture
def seg_small(monkeypatch):
    monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 1)
    monkeypatch.setattr(versioned, "SEGMENT_TARGET_ENTRIES", 4)
    monkeypatch.setattr(ds, "_DS_SEGMENT_MIN_FILES", 1)
    monkeypatch.setattr(ds, "_DS_SEGMENT_TARGET_ENTRIES", 4)


def _mk_file(root, rel):
    full = os.path.join(root, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "wb") as f:
        f.write(b"x")
    return rel


def _seed(root, n=16):
    files = [_mk_file(root, f"data/r/f{i:02d}.parquet") for i in range(n)]
    publish_files(
        root, files, stats={f: {"num_rows": 2} for f in files}
    )
    return files


def _count(monkeypatch, module, attr, cache):
    loads = {"n": 0}
    real = getattr(module, attr)

    def counting(r, sid):
        loads["n"] += 1
        return real(r, sid)

    monkeypatch.setattr(module, attr, counting)
    cache.clear()
    return loads


def test_diff_versions_loads_only_unshared_segments(
    tmp_path, seg_small, monkeypatch
):
    root = str(tmp_path / "t")
    os.makedirs(root)
    files = _seed(root)
    extra = _mk_file(root, "data/r/zz.parquet")
    commit_files(root, base_version=1, kind="append", add_files=[extra])
    ra = versioned._read_manifest_raw(root, 1)
    rb = versioned._read_manifest_raw(root, 2)
    shared = set(ra["segments"]) & set(rb["segments"])
    unshared = (len(ra["segments"]) - len(shared)) + (
        len(rb["segments"]) - len(shared)
    )
    loads = _count(
        monkeypatch, versioned, "_load_segment", versioned._SEG_CACHE
    )
    d = diff_versions(root, 1, 2)
    assert loads["n"] <= unshared
    assert loads["n"] < len(ra["segments"])  # strictly cheaper
    assert d["added"] == [extra] and d["removed"] == []
    assert d["n_delta"] == 1 and d["dv_changed"] == []

    # dv delta: only the covering segment pair loads
    target = files[5]
    sc = _mk_file(root, "dv/r/sc.parquet")
    commit_files(
        root, base_version=2, kind="keyed",
        dv_updates={target: {"sidecars": [sc], "rows": 3}},
    )
    loads["n"] = 0
    versioned._SEG_CACHE.clear()
    d2 = diff_versions(root, 2, 3)
    r3 = versioned._read_manifest_raw(root, 3)
    sh = set(rb["segments"]) & set(r3["segments"])
    assert loads["n"] <= (len(rb["segments"]) - len(sh)) + (
        len(r3["segments"]) - len(sh)
    )
    assert d2["dv_changed"] == [target]
    assert d2["n_dv_rows_delta"] == 3

    # equality with the resolved-manifest answer
    ma, mb = read_manifest(root, 2), read_manifest(root, 3)
    fa, fb = set(ma["files"]), set(mb["files"])
    assert d2["added"] == sorted(fb - fa)
    assert d2["removed"] == sorted(fa - fb)


def test_diff_across_threshold_transition(tmp_path, monkeypatch):
    """Plain v1 -> segmented v2 (table crosses SEGMENT_MIN_FILES):
    the mixed-generation diff falls back to inline maps on the plain
    side and stays correct."""
    monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 8)
    monkeypatch.setattr(versioned, "SEGMENT_TARGET_ENTRIES", 4)
    root = str(tmp_path / "t")
    os.makedirs(root)
    small = [_mk_file(root, f"data/r/f{i}.parquet") for i in range(5)]
    publish_files(root, small)
    grow = [_mk_file(root, f"data/r/g{i}.parquet") for i in range(6)]
    commit_files(root, base_version=1, kind="append", add_files=grow)
    assert "segments" in versioned._read_manifest_raw(root, 2)
    d = diff_versions(root, 1, 2)
    assert d["added"] == sorted(grow) and d["removed"] == []
    assert d["n_delta"] == 6


def _feed_reader(root):
    schema = StructType([
        StructField("k", StringType(), True),
        StructField("_change", StringType(), False),
    ])
    return ds._TssFeedReader({"root": root}, schema)


def _norm_parts(root, parts):
    return sorted(
        (
            p.change,
            p.kind,
            os.path.relpath(p.path, root),
            tuple(os.path.relpath(s, root) for s in p.sidecars),
            tuple(os.path.relpath(s, root) for s in p.exclude_sidecars),
            p.dv_key,
            p.phys,
        )
        for p in parts
    )


def test_feed_partitions_load_only_unshared_segments(
    tmp_path, seg_small, monkeypatch
):
    root = str(tmp_path / "t")
    os.makedirs(root)
    files = _seed(root, 20)
    extra = _mk_file(root, "data/r/zz.parquet")
    commit_files(root, base_version=1, kind="append", add_files=[extra])
    ra = versioned._read_manifest_raw(root, 1)
    rb = versioned._read_manifest_raw(root, 2)
    shared = set(ra["segments"]) & set(rb["segments"])
    unshared = (len(ra["segments"]) - len(shared)) + (
        len(rb["segments"]) - len(shared)
    )
    loads = _count(
        monkeypatch, ds, "_ds_load_segment", ds._DS_SEG_CACHE
    )
    parts = _feed_reader(root).partitions(
        {"version": 1}, {"version": 2}
    )
    assert loads["n"] <= unshared
    assert loads["n"] < len(ra["segments"])
    assert _norm_parts(root, parts) == [
        ("insert", "live", extra, (), (), extra, ("k",))
    ]

    # a dv commit's trigger: delete partition for the delta sidecar
    target = files[3]
    sc = _mk_file(root, "dv/r/sc.parquet")
    commit_files(
        root, base_version=2, kind="keyed",
        dv_updates={target: {"sidecars": [sc], "rows": 1}},
    )
    loads["n"] = 0
    ds._DS_SEG_CACHE.clear()
    parts2 = _feed_reader(root).partitions(
        {"version": 2}, {"version": 3}
    )
    r3 = versioned._read_manifest_raw(root, 3)
    sh = set(rb["segments"]) & set(r3["segments"])
    assert loads["n"] <= (len(rb["segments"]) - len(sh)) + (
        len(r3["segments"]) - len(sh)
    )
    assert _norm_parts(root, parts2) == [
        ("delete", "dv_delta", target, (sc,), (), target, ("k",))
    ]


def test_feed_partitions_equal_segmented_vs_plain(
    tmp_path, monkeypatch
):
    """The same commit history on a plain and a segmented store must
    plan IDENTICAL feed partitions for every adjacent version pair —
    the raw-diff fast path may change cost, never the batch."""
    from test_manifest_segments import OPS, _replay

    plain = str(tmp_path / "plain")
    seg = str(tmp_path / "seg")
    os.makedirs(plain)
    os.makedirs(seg)
    monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 10**9)
    _replay(plain, OPS)
    monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 1)
    monkeypatch.setattr(versioned, "SEGMENT_TARGET_ENTRIES", 3)
    _replay(seg, OPS)

    vs_p = versioned.list_versions(plain)
    vs_s = versioned.list_versions(seg)
    assert vs_p == vs_s
    rp, rs = _feed_reader(plain), _feed_reader(seg)
    for a, b in zip(vs_p, vs_p[1:]):
        got_p = _norm_parts(plain, rp.partitions(
            {"version": a}, {"version": b}
        ))
        got_s = _norm_parts(seg, rs.partitions(
            {"version": a}, {"version": b}
        ))
        assert got_p == got_s, f"feed diverged on ({a}, {b}]"
        # and diff_versions agrees between the two stores
        assert diff_versions(plain, a, b) == diff_versions(seg, a, b)


def test_feed_missing_segment_maps_to_store_damage(
    tmp_path, seg_small
):
    root = str(tmp_path / "t")
    os.makedirs(root)
    files = _seed(root, 8)
    # a remove rewrites the covering segment: v1 keeps an UNSHARED
    # segment the diff must load
    commit_files(
        root, base_version=1, kind="keyed", remove_files=[files[0]]
    )
    # destroy that segment — the feed reports store damage, not a
    # retention error
    ra = versioned._read_manifest_raw(root, 1)
    rb = versioned._read_manifest_raw(root, 2)
    unshared_a = [s for s in ra["segments"] if s not in rb["segments"]]
    assert unshared_a
    os.remove(versioned._segment_path(root, unshared_a[0]))
    ds._DS_SEG_CACHE.clear()
    with pytest.raises(RuntimeError, match="segment store is damaged"):
        _feed_reader(root).partitions({"version": 1}, {"version": 2})
