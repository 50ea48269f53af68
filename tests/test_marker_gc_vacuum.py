"""r16 retention hygiene: (a) vacuum builds its live set from the
UNION of unique segment ids across surviving manifests — each unique
segment parses exactly once, not once per version; (b) consumer
markers (feed low-water marks, sink replay fences) idle past a TTL
are dropped by `gc_consumer_markers` / the `maintain_table` policy,
while live (young) markers always survive."""

import os

import pytest

from trial_submission_studio_spark.io import versioned
from trial_submission_studio_spark.io.versioned import (
    commit_files,
    current_version,
    gc_consumer_markers,
    maintain_table,
    publish_files,
    read_manifest,
    retire_versions,
    vacuum,
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


def test_vacuum_parses_each_unique_segment_once(
    tmp_path, seg_small, monkeypatch
):
    root = str(tmp_path / "t")
    os.makedirs(root)
    files = [_mk_file(root, f"data/r/f{i:02d}.parquet") for i in range(16)]
    publish_files(root, files, stats={f: {"num_rows": 1} for f in files})
    # ten 1-file appends: consecutive versions share almost all
    # segments; the old full-resolve walk would re-parse them per
    # version
    for i in range(10):
        commit_files(
            root, base_version=current_version(root), kind="append",
            add_files=[_mk_file(root, f"data/r/z{i:02d}.parquet")],
        )
    unique = set()
    for v in versioned.list_versions(root):
        unique.update(
            versioned._read_manifest_raw(root, v).get("segments", ())
        )

    loads = {"n": 0}
    real = versioned._load_segment

    def counting(r, sid):
        loads["n"] += 1
        return real(r, sid)

    monkeypatch.setattr(versioned, "_load_segment", counting)
    versioned._SEG_CACHE.clear()
    got = vacuum(root, dry_run=True, min_age_seconds=0)
    assert loads["n"] == len(unique)
    assert got == []  # nothing unreferenced yet

    # correctness unchanged: retire + vacuum still GCs data files and
    # orphan segments, never live ones
    commit_files(
        root, base_version=current_version(root), kind="keyed",
        remove_files=[files[0]],
    )
    retire_versions(root, keep_latest=1)
    deleted = vacuum(root, min_age_seconds=0)
    assert files[0] in deleted
    assert len(read_manifest(root)["files"]) == 25


def test_gc_consumer_markers_ttl(tmp_path, seg_small):
    root = str(tmp_path / "t")
    os.makedirs(root)
    publish_files(root, [_mk_file(root, "data/r/a.parquet")])
    vd = versioned._versions_dir(root)
    old_feed = os.path.join(vd, "feed-dead")
    young_feed = os.path.join(vd, "feed-live")
    old_sink = os.path.join(vd, "sink-deadrun")
    young_sink = os.path.join(vd, "sink-liverun")
    for p, payload in [
        (old_feed, "1"), (young_feed, "1"),
        (old_sink, "3 1"), (young_sink, "4 1"),
    ]:
        with open(p, "w") as f:
            f.write(payload)
    for p in (old_feed, old_sink):
        os.utime(p, (1, 1))

    # dry run previews without deleting
    preview = gc_consumer_markers(
        root, max_idle_seconds=3600, dry_run=True
    )
    assert preview == ["feed-dead", "sink-deadrun"]
    assert os.path.exists(old_feed)
    dropped = gc_consumer_markers(root, max_idle_seconds=3600)
    assert dropped == ["feed-dead", "sink-deadrun"]
    assert not os.path.exists(old_feed) and not os.path.exists(old_sink)
    # live markers untouched — the retention pin still works
    assert os.path.exists(young_feed) and os.path.exists(young_sink)
    assert versioned._feed_low_water(root) == {"live": 1}

    with pytest.raises(ValueError, match="max_idle_seconds"):
        gc_consumer_markers(root, max_idle_seconds=0)

    # family filters
    os.utime(young_feed, (1, 1))
    assert gc_consumer_markers(
        root, max_idle_seconds=3600, feeds=False
    ) == []
    assert gc_consumer_markers(root, max_idle_seconds=3600) == [
        "feed-live"
    ]


def test_maintain_table_marker_policy(spark, tmp_path):
    from trial_submission_studio_spark.io.versioned import new_data_dir

    root = str(tmp_path / "t")
    os.makedirs(root)
    d = new_data_dir(root)
    spark.createDataFrame([(1, 2)], "k long, v long").coalesce(
        1
    ).write.parquet(d, mode="append")
    versioned.publish_version(root, d)
    vd = versioned._versions_dir(root)
    dead = os.path.join(vd, "feed-zombie")
    with open(dead, "w") as f:
        f.write("1")
    os.utime(dead, (1, 1))
    out = maintain_table(spark, root, marker_ttl_seconds=3600)
    assert out["markers_dropped"] == ["feed-zombie"]
    assert not os.path.exists(dead)
    # default policy (None) leaves markers alone
    with open(dead, "w") as f:
        f.write("1")
    os.utime(dead, (1, 1))
    out2 = maintain_table(spark, root)
    assert out2["markers_dropped"] == []
    assert os.path.exists(dead)
