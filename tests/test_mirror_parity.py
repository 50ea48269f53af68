"""Pin the stdlib DataSource mirrors to their package originals —
the sink runner carries no pyFiles, so `io/datasource.py` mirrors the
segment protocol (`_ds_maybe_segment`), its constants, and the schema
gate (`_ds_schema_violations`). Nothing else stops silent drift
between the two implementations: these tests feed IDENTICAL inputs
through both and require identical segment ids, ref order, summary
ranges, and violation messages."""

import os

import pytest

from trial_submission_studio_spark.io import datasource as ds
from trial_submission_studio_spark.io import versioned
from trial_submission_studio_spark.io.versioned import publish_files


def _mk_file(root, rel):
    full = os.path.join(root, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "wb") as f:
        f.write(b"x")
    return rel


def test_segment_constants_equal():
    assert ds._DS_SEGMENT_MIN_FILES == versioned.SEGMENT_MIN_FILES
    assert (
        ds._DS_SEGMENT_TARGET_ENTRIES == versioned.SEGMENT_TARGET_ENTRIES
    )


def _twin_roots(tmp_path, n=11):
    """Two stores with IDENTICAL relative state (segment ids are
    content-addressed over relative entries, so they match across
    roots)."""
    roots = []
    files = None
    stats = None
    for name in ("a", "b"):
        root = str(tmp_path / name)
        os.makedirs(root)
        files = [
            _mk_file(root, f"data/r/f{i:02d}.parquet") for i in range(n)
        ]
        stats = {
            f: {"num_rows": 3, "columns": {
                "k": {"t": "int", "min": i, "max": i, "nulls": 0}}}
            for i, f in enumerate(files)
        }
        publish_files(root, files, stats=stats)
        roots.append(root)
    return roots, files, stats


@pytest.mark.parametrize("poison", [False, True])
def test_maybe_segment_mirror_parity(tmp_path, monkeypatch, poison):
    """Same (manifest, prev_raw, delta) through both implementations
    -> same segment ids in the same order, same summary ranges, same
    dv_rows. ``poison=True`` additionally breaks the fast-path books
    (wrong n_files) so BOTH must take their full-scan fallback and
    still agree."""
    monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 1)
    monkeypatch.setattr(versioned, "SEGMENT_TARGET_ENTRIES", 4)
    monkeypatch.setattr(ds, "_DS_SEGMENT_MIN_FILES", 1)
    monkeypatch.setattr(ds, "_DS_SEGMENT_TARGET_ENTRIES", 4)
    (ra, rb), files, stats = _twin_roots(tmp_path)
    prev_a = versioned._read_manifest_raw(ra, 1)
    prev_b = ds._ds_read_manifest_raw(rb, 1)
    assert prev_a["segments"] == prev_b["segments"]  # twin stores
    if poison:
        import json

        # poison must land ON DISK: versioned._maybe_segment re-reads
        # its predecessor manifest there
        for root, prev in ((ra, prev_a), (rb, prev_b)):
            for summ in prev["segment_stats"].values():
                summ["n_files"] += 1
            path = versioned._manifest_path(root, 1)
            os.chmod(path, 0o644)
            with open(path, "w") as fh:
                fh.write(json.dumps(prev))

    added = ["data/r/zz0.parquet", "data/r/zz1.parquet"]
    for r in (ra, rb):
        for f in added:
            _mk_file(r, f)
    all_files = sorted(files + added)
    new_stats = dict(stats)
    for f in added:
        new_stats[f] = {"num_rows": 1}
    manifest = {
        "version": 2,
        "created_utc": "2026-01-01T00:00:00Z",
        "files": all_files,
        "n_files": len(all_files),
        "metadata": {"commit_kind": "append"},
        "stats": new_stats,
    }
    versioned._SEG_CACHE.clear()
    ds._DS_SEG_CACHE.clear()
    out_v = versioned._maybe_segment(
        ra, dict(manifest), delta={"touched": set(), "added": added}
    )
    out_d = ds._ds_maybe_segment(rb, dict(manifest), prev_b, added=added)
    assert out_v["segments"] == out_d["segments"]
    assert out_v["dv_rows"] == out_d["dv_rows"] == 0
    sv, sd = out_v["segment_stats"], out_d["segment_stats"]
    assert set(sv) == set(sd) == set(out_v["segments"])
    for sid in out_v["segments"]:
        # summaries agree modulo the column part (the sink cannot
        # compute column summaries; the batch side can)
        for k in ("n_files", "file_min", "file_max"):
            assert sv[sid][k] == sd[sid].get(k, sv[sid][k]), (
                sid, k, sv[sid], sd[sid],
            )
    # both stores resolve to the same world
    m_a = versioned.read_manifest(ra, 1)
    resolved_v = {
        e["file"]: e
        for sid in out_v["segments"]
        for e in versioned._load_segment(ra, sid)
    }
    resolved_d = {
        e["file"]: e
        for sid in out_d["segments"]
        for e in ds._ds_load_segment(rb, sid)
    }
    assert resolved_v == resolved_d
    assert sorted(resolved_v) == all_files


def test_sink_raw_append_parity_and_zero_loads(tmp_path, monkeypatch):
    """r16: the sink's segmented append (`_ds_append_segmented`)
    assembles the next raw manifest without resolving the table —
    zero segment loads for a pure append — and lands on the SAME
    segment ids as `commit_files`'s raw append given twin state."""
    monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 1)
    monkeypatch.setattr(versioned, "SEGMENT_TARGET_ENTRIES", 4)
    monkeypatch.setattr(ds, "_DS_SEGMENT_MIN_FILES", 1)
    monkeypatch.setattr(ds, "_DS_SEGMENT_TARGET_ENTRIES", 4)
    (ra, rb), files, _stats = _twin_roots(tmp_path)

    loads = {"n": 0}
    real = ds._ds_load_segment

    def counting(r, sid):
        loads["n"] += 1
        return real(r, sid)

    monkeypatch.setattr(ds, "_ds_load_segment", counting)
    ds._DS_SEG_CACHE.clear()

    added = ["data/stream-r1/p0.parquet", "data/stream-r1/p1.parquet"]
    for r in (ra, rb):
        for f in added:
            _mk_file(r, f)
    m_sink = ds._ds_append_commit(rb, list(added), {"writer": "sink"})
    # the fresh batch prefix sorts OUTSIDE every prior range: the
    # whole append (incl. the duplicate check) loaded zero segments
    assert loads["n"] == 0
    assert m_sink["n_files"] == 13 and "files" not in m_sink

    versioned.commit_files(
        ra, base_version=1, kind="append", add_files=list(added)
    )
    raw_a = versioned._read_manifest_raw(ra, 2)
    raw_b = ds._ds_read_manifest_raw(rb, 2)
    assert raw_a["segments"] == raw_b["segments"]
    assert raw_a["n_files"] == raw_b["n_files"]
    assert versioned.read_manifest(ra, 2)["files"] == sorted(
        [e["file"] for sid in raw_b["segments"]
         for e in ds._ds_load_segment(rb, sid)]
    )

    # a duplicate append is still refused (range hit -> load -> catch)
    with pytest.raises(ValueError, match="duplicate"):
        ds._ds_append_commit(rb, [added[0]], {"writer": "sink"})


def test_schema_violations_mirror_parity():
    from trial_submission_studio_spark.io.table_schema import (
        schema_violations,
    )

    base = [
        {"name": "a", "type": "int64", "nullable": True},
        {"name": "b", "type": "string", "nullable": False},
        {"name": "gone", "type": "double", "nullable": True},
    ]
    new = [
        {"name": "a", "type": "int32", "nullable": True},
        {"name": "b", "type": "string", "nullable": True},
        {"name": "fresh", "type": "bool", "nullable": True},
    ]
    def norm(v):
        # the package message appends an evolution HINT to new-column
        # findings ("(pass allow_new_columns=True ...)"); the sink
        # mirror is intentionally strict — parity is the finding
        # itself, not the advice suffix
        return [x.split(" (")[0] for x in v]

    assert norm(ds._ds_schema_violations(base, new)) == norm(
        schema_violations(base, new)
    )
    assert ds._ds_schema_violations(base, base) == schema_violations(
        base, base
    ) == []
