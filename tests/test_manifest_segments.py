"""Manifest segmentation (`io/versioned.py`): above SEGMENT_MIN_FILES
the per-file entries live in immutable content-addressed segment
files and the manifest holds only segment refs — the Iceberg
manifest-list shape. The segmented store must be OBSERVABLY IDENTICAL
to the plain store (model test: same random op sequence, resolved
manifests equal at every version), commits must write O(delta)
metadata bytes while the plain format grows O(files), vacuum must GC
orphaned segments but never live or clone-pinned ones, and the whole
read stack (read_version, format route, feed, clones, publish-back)
must work unchanged on a segmented table."""

import json
import os
import random

import pytest

from trial_submission_studio_spark.io import versioned
from trial_submission_studio_spark.io.versioned import (
    commit_files,
    current_version,
    diff_versions,
    list_versions,
    new_data_dir,
    publish_files,
    read_manifest,
    read_version,
    retire_versions,
    rollback,
    shallow_clone,
    table_history,
    vacuum,
)


@pytest.fixture
def seg_small(monkeypatch):
    """Force segmentation on tiny tables (threshold 1, 4-entry
    segments) for both the package and the stdlib datasource mirror."""
    from trial_submission_studio_spark.io import datasource as ds

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


def _replay(root, ops):
    """Apply one op list (metadata-only — data files are 1-byte
    stand-ins; nothing ever reads their bytes)."""
    counter = [0]

    def fresh(n):
        out = []
        for _ in range(n):
            counter[0] += 1
            out.append(
                _mk_file(root, f"data/run{counter[0] % 7}/f{counter[0]:04d}.parquet")
            )
        return out

    for op in ops:
        kind = op[0]
        if kind == "seed":
            files = fresh(op[1])
            publish_files(
                root, files,
                stats={f: {"num_rows": 10, "cols": {"k": [0, 9]}}
                       for f in files},
                schema=[{"name": "k", "type": "int64", "nullable": True}],
            )
        elif kind == "append":
            files = fresh(op[1])
            commit_files(
                root, base_version=current_version(root), kind="append",
                add_files=files,
                add_stats={f: {"num_rows": 5, "cols": {"k": [5, 9]}}
                           for f in files},
            )
        elif kind == "remove":
            m = read_manifest(root)
            rng = random.Random(op[1])
            # clamp like "rewrite" and always leave one file (the
            # engine loudly refuses to publish an empty table):
            # rollbacks make the op-generator's live-count estimate
            # approximate at longer histories
            k = min(op[2], len(m["files"]) - 1)
            if k <= 0:
                continue
            doomed = rng.sample(sorted(m["files"]), k)
            commit_files(
                root, base_version=m["version"], kind="keyed",
                remove_files=doomed,
            )
        elif kind == "dv":
            m = read_manifest(root)
            rng = random.Random(op[1])
            target = rng.choice(sorted(m["files"]))
            sc = _mk_file(root, f"dv/run{op[1]}/sc.parquet")
            commit_files(
                root, base_version=m["version"], kind="keyed",
                dv_updates={target: {"sidecars": [sc], "rows": op[2]}},
            )
        elif kind == "rewrite":  # compaction-shaped maintenance
            m = read_manifest(root)
            rng = random.Random(op[1])
            undv = sorted(set(m["files"]) - set(m.get("dv") or ()))
            doomed = rng.sample(undv, min(op[2], len(undv)))
            commit_files(
                root, base_version=m["version"], kind="maintenance",
                add_files=fresh(1), remove_files=doomed,
            )
        elif kind == "respec":
            from trial_submission_studio_spark.io.partitioned_table import (
                repartition_spec,
            )

            try:
                repartition_spec(None, root, op[1])
            except ValueError:
                # a rollback may have restored this spec already —
                # deterministic, so both stores skip identically
                pass
        elif kind == "rollback":
            vs = list_versions(root)
            rollback(root, vs[max(0, len(vs) - op[1])])
        elif kind == "retire":
            try:
                retire_versions(root, keep_latest=op[1])
            except versioned.FeedPinnedError:
                # a live feed marker pins an older manifest — the
                # refusal is deterministic, so both stores skip
                pass
        elif kind == "vacuum":
            try:
                vacuum(root, min_age_seconds=0)
            except versioned.ClonePinnedError:
                # a live clone pins orphaned files: the typed refusal
                # IS the liveness protection — deterministic, so both
                # stores skip identically
                pass
        elif kind == "clone":
            try:
                shallow_clone(root, f"{root}_c{op[1]}")
            except ValueError:
                # dv-carrying snapshot needs spark= to re-key the
                # tombstones — skipped identically by both stores
                pass
        elif kind == "feed_marker":
            vd = versioned._versions_dir(root)
            os.makedirs(vd, exist_ok=True)
            with open(os.path.join(vd, f"feed-{op[1]}"), "w") as f:
                f.write(str(current_version(root)))
        elif kind == "marker_gc":
            # age every marker past the TTL first (GC soundly refuses
            # a non-positive TTL; idleness is mtime-based)
            vd = versioned._versions_dir(root)
            if os.path.isdir(vd):
                import time as _time

                old = _time.time() - 1000
                for n in os.listdir(vd):
                    if n.startswith(("feed-", "sink-")):
                        os.utime(os.path.join(vd, n), (old, old))
            versioned.gc_consumer_markers(root, max_idle_seconds=500)


def _feed_plan(root, v_from, v_to):
    """Normalized change-feed partition plan between two versions —
    driver-side, via the stream reader's segment-aware raw diff."""
    from pyspark.sql.types import StringType, StructField, StructType

    from trial_submission_studio_spark.io.datasource import (
        _TssFeedReader,
    )

    reader = _TssFeedReader(
        {"root": root},
        StructType([
            StructField("k", StringType(), True),
            StructField("_change", StringType(), False),
        ]),
    )
    return sorted(
        (
            p.change, p.kind, os.path.relpath(p.path, root),
            tuple(os.path.relpath(s, root) for s in p.sidecars),
            tuple(os.path.relpath(s, root) for s in p.exclude_sidecars),
            p.dv_key, p.phys,
        )
        for p in reader.partitions(
            {"version": v_from}, {"version": v_to}
        )
    )


def _observe(root):
    """Everything a reader can see, normalized (timestamps dropped)."""
    out = {}
    for v in list_versions(root):
        m = read_manifest(root, v)
        out[v] = {
            "files": m["files"],
            "stats": m.get("stats"),
            "dv": m.get("dv"),
            "schema": m.get("schema"),
            "n_files": m["n_files"],
            "kind": m["metadata"].get("commit_kind"),
            "pspec": m["metadata"].get("partition_spec"),
            "phist": m["metadata"].get("partition_spec_history"),
        }
    out["history"] = [
        {k: h[k] for k in ("version", "kind", "op", "n_files", "dv_rows")}
        for h in table_history(root)
    ]
    vs = list_versions(root)
    if len(vs) >= 2:
        out["diff"] = diff_versions(root, vs[0], vs[-1])
        # the change feed's planned batches, every adjacent pair —
        # the segment-aware raw diff must plan identical batches on
        # segmented and plain stores
        out["feed"] = [
            _feed_plan(root, a, b) for a, b in zip(vs, vs[1:])
        ]
    out["disk"] = sorted(
        os.path.relpath(os.path.join(cur, n), root)
        for ns in ("data", "dv")
        for cur, _d, names in os.walk(os.path.join(root, ns))
        for n in names
    )
    return out


OPS = [
    ("seed", 9),
    ("append", 3), ("dv", 1, 2), ("append", 2), ("remove", 2, 3),
    ("respec", ["k"]), ("rewrite", 3, 2), ("dv", 4, 1), ("append", 4),
    ("rollback", 3), ("remove", 5, 2), ("append", 1), ("retire", 6),
    ("vacuum",), ("append", 2), ("respec", None), ("dv", 6, 3),
    ("rewrite", 7, 3), ("vacuum",),
]


def test_segmented_store_model_equals_plain(tmp_path, monkeypatch):
    """The model test: one op sequence, two stores — plain (threshold
    huge) and segmented (threshold 1) — every observable equal."""
    plain = str(tmp_path / "plain")
    seg = str(tmp_path / "seg")
    os.makedirs(plain)
    os.makedirs(seg)

    monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 10**9)
    _replay(plain, OPS)
    obs_plain = _observe(plain)

    monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 1)
    monkeypatch.setattr(versioned, "SEGMENT_TARGET_ENTRIES", 4)
    _replay(seg, OPS)
    obs_seg = _observe(seg)

    assert obs_plain == obs_seg
    # and the segmented store really is segmented
    raw = versioned._read_manifest_raw(seg, current_version(seg))
    assert raw["segments"] and "files" not in raw


def _random_ops(seed: int, n: int = 14) -> list:
    """A seeded random op sequence over the full commit vocabulary —
    every draw routes through commit_files, i.e. through the
    delta-aware segment-reuse fast path."""
    rng = random.Random(seed)
    ops: list = [("seed", rng.randint(6, 12))]
    n_live = ops[0][1]
    spec = None
    for i in range(n):
        k = rng.choice(
            ["append", "append", "dv", "remove", "rewrite",
             "rollback", "respec", "retire_vacuum"]
        )
        if k == "append":
            c = rng.randint(1, 4)
            ops.append(("append", c))
            n_live += c
        elif k == "dv":
            ops.append(("dv", seed * 100 + i, rng.randint(1, 4)))
        elif k == "remove" and n_live > 4:
            c = rng.randint(1, 3)
            ops.append(("remove", seed * 100 + i, c))
            n_live -= c
        elif k == "rewrite":
            ops.append(("rewrite", seed * 100 + i, rng.randint(1, 3)))
        elif k == "rollback":
            ops.append(("rollback", rng.randint(1, 3)))
        elif k == "respec":
            spec = None if spec else ["k"]  # flip, never a no-op
            ops.append(("respec", spec))
        elif k == "retire_vacuum":
            ops.append(("retire", rng.randint(2, 5)))
            ops.append(("vacuum",))
    return ops


@pytest.mark.parametrize("seed", [11, 23, 47])
def test_random_sequences_segmented_equals_plain(
    tmp_path, monkeypatch, seed
):
    """Seeded RANDOM op interleavings (not just the fixed OPS list):
    the delta-reuse fast path, tail folds, summary carries, retires
    and vacuums must leave the segmented store observably identical
    to the plain one under arbitrary histories."""
    ops = _random_ops(seed)
    plain = str(tmp_path / "plain")
    seg = str(tmp_path / "seg")
    os.makedirs(plain)
    os.makedirs(seg)

    monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 10**9)
    _replay(plain, ops)
    obs_plain = _observe(plain)

    monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 1)
    monkeypatch.setattr(versioned, "SEGMENT_TARGET_ENTRIES", 3)
    _replay(seg, ops)
    obs_seg = _observe(seg)

    assert obs_plain == obs_seg, f"seed {seed} diverged"


def _assert_live(root):
    """Absolute liveness invariant: every artifact any SURVIVING
    manifest can reach exists on disk. The plain-vs-segmented
    equality check cannot catch a vacuum/GC over-deletion that hits
    both stores identically — this can."""
    for v in list_versions(root):
        raw = versioned._read_manifest_raw(root, v)
        for sid in raw.get("segments") or ():
            assert os.path.exists(versioned._segment_path(root, sid)), (
                root, v, "segment", sid,
            )
        m = read_manifest(root, v)
        for f in m["files"]:
            p = f if os.path.isabs(f) else os.path.join(root, f)
            assert os.path.exists(p), (root, v, "file", f)
        for f, dv in (m.get("dv") or {}).items():
            for sc in dv.get("sidecars") or ():
                p = sc if os.path.isabs(sc) else os.path.join(root, sc)
                assert os.path.exists(p), (root, v, "sidecar", sc)


def _random_ops_with_pins(seed: int, n: int = 16) -> list:
    """The `_random_ops` vocabulary plus the retention-adjacent ops
    (r16): shallow clones (vacuum pins), durable feed low-water
    markers (retire pins), and TTL marker GC — interleaved with the
    commit vocabulary so liveness holds under arbitrary histories,
    not just the dedicated-scenario tests."""
    rng = random.Random(seed)
    ops: list = [("seed", rng.randint(6, 12))]
    n_live = ops[0][1]
    spec = None
    for i in range(n):
        k = rng.choice(
            ["append", "append", "dv", "remove", "rewrite",
             "rollback", "respec", "retire_vacuum",
             "clone", "feed_marker", "marker_gc"]
        )
        if k == "append":
            c = rng.randint(1, 4)
            ops.append(("append", c))
            n_live += c
        elif k == "dv":
            ops.append(("dv", seed * 100 + i, rng.randint(1, 4)))
        elif k == "remove" and n_live > 4:
            c = rng.randint(1, 3)
            ops.append(("remove", seed * 100 + i, c))
            n_live -= c
        elif k == "rewrite":
            ops.append(("rewrite", seed * 100 + i, rng.randint(1, 3)))
        elif k == "rollback":
            ops.append(("rollback", rng.randint(1, 3)))
        elif k == "respec":
            spec = None if spec else ["k"]
            ops.append(("respec", spec))
        elif k == "retire_vacuum":
            ops.append(("retire", rng.randint(2, 5)))
            ops.append(("vacuum",))
        elif k == "clone":
            ops.append(("clone", i))
        elif k == "feed_marker":
            ops.append(("feed_marker", f"c{rng.randint(0, 2)}"))
        elif k == "marker_gc":
            ops.append(("marker_gc",))
    # always finish with the full retention gauntlet so every run
    # exercises liveness under pins at least once
    ops += [("retire", 2), ("vacuum",), ("marker_gc",),
            ("retire", 2), ("vacuum",)]
    return ops


@pytest.mark.parametrize("seed", [5, 17, 83])
def test_random_pins_markers_liveness(tmp_path, monkeypatch, seed):
    """Seeded random interleavings of commits with clones, feed
    markers, marker GC, retires and vacuums: the segmented store
    stays observably identical to the plain one, AND every surviving
    manifest (source and clones, both stores) still reaches all of
    its files/sidecars/segments on disk afterwards."""
    ops = _random_ops_with_pins(seed)
    plain = str(tmp_path / "plain")
    seg = str(tmp_path / "seg")
    os.makedirs(plain)
    os.makedirs(seg)

    monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 10**9)
    _replay(plain, ops)
    obs_plain = _observe(plain)

    monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 1)
    monkeypatch.setattr(versioned, "SEGMENT_TARGET_ENTRIES", 3)
    _replay(seg, ops)
    obs_seg = _observe(seg)

    assert obs_plain == obs_seg, f"seed {seed} diverged"
    for root in (plain, seg):
        _assert_live(root)
        for entry in sorted(os.listdir(os.path.dirname(root))):
            full = os.path.join(os.path.dirname(root), entry)
            if entry.startswith(os.path.basename(root) + "_c"):
                _assert_live(full)


def test_commit_metadata_bytes_are_o_delta(tmp_path, monkeypatch):
    """The 100 TB claim, measured: after segmentation the bytes a
    1-file append WRITES (manifest + fresh segments) stay ~flat as
    the table grows, while the plain manifest grows O(files)."""
    monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 1)
    monkeypatch.setattr(versioned, "SEGMENT_TARGET_ENTRIES", 64)
    root = str(tmp_path / "t")
    os.makedirs(root)

    def commit_bytes(n_before, n_after):
        segdir = versioned._segments_dir(root)
        before = set(os.listdir(segdir)) if os.path.isdir(segdir) else set()
        f = _mk_file(root, f"data/r/f{n_after:05d}.parquet")
        commit_files(
            root, base_version=current_version(root), kind="append",
            add_files=[f],
            add_stats={f: {"num_rows": 3, "cols": {"k": [0, 1]}}},
        )
        new_segs = set(os.listdir(segdir)) - before
        mbytes = os.path.getsize(
            versioned._manifest_path(root, current_version(root))
        )
        return mbytes + sum(
            os.path.getsize(os.path.join(segdir, s)) for s in new_segs
        )

    seed = [_mk_file(root, "data/r/f00000.parquet")]
    publish_files(root, seed, stats={seed[0]: {"num_rows": 3}})
    tail_bytes = []
    for i in range(1, 650):
        tail_bytes.append(commit_bytes(i, i + 1))
    m = read_manifest(root)
    assert len(m["files"]) == 650 and len(m["stats"]) == 650
    # what the PLAIN format would have written for the last commit:
    # the full inline manifest
    plain_cost = len(
        json.dumps({k: v for k, v in m.items() if k != "segments"})
    )
    # every late commit writes a small fraction of the plain cost
    # (bounded by ~half a target segment + the ref list), and the
    # segment count stays O(files/target), not O(commits)
    assert max(tail_bytes[-50:]) < plain_cost / 4
    raw = versioned._read_manifest_raw(root, current_version(root))
    assert len(raw["segments"]) <= 650 // (64 // 2) + 2


def test_segment_gc_and_clone_pins(tmp_path, seg_small):
    """vacuum GCs segments no surviving manifest references, keeps
    segments a clone marker pins, and _clone_pinned_files resolves
    through segment refs (marker carries no copied file list)."""
    root = str(tmp_path / "t")
    os.makedirs(root)
    files = [_mk_file(root, f"data/r/f{i}.parquet") for i in range(10)]
    publish_files(root, files)
    for i in range(3):
        commit_files(
            root, base_version=current_version(root), kind="keyed",
            remove_files=[files[i]],
        )
    segdir = versioned._segments_dir(root)
    n_before = len(os.listdir(segdir))
    retire_versions(root, keep_latest=1)
    vacuum(root, min_age_seconds=0)
    n_after = len(
        [n for n in os.listdir(segdir) if n.startswith("seg-")]
    )
    assert n_after < n_before
    # surviving manifest fully readable after GC
    assert len(read_manifest(root)["files"]) == 7

    # clone pins: marker stores segment refs, vacuum refuses
    clone = str(tmp_path / "c")
    shallow_clone(root, clone)
    marker = versioned.list_clones(root)[0]
    assert marker.get("segments") and "files" not in marker
    commit_files(
        root, base_version=current_version(root), kind="keyed",
        remove_files=[files[5]],
    )
    retire_versions(root, keep_latest=1)
    with pytest.raises(versioned.ClonePinnedError):
        vacuum(root, min_age_seconds=0)
    # pinned file survives; deregistering releases it
    assert os.path.exists(os.path.join(root, files[5]))
    versioned.deregister_clone(root, clone)
    assert files[5] in vacuum(root, min_age_seconds=0)


def test_two_level_pruning_skips_unloaded_segments(
    tmp_path, seg_small, monkeypatch
):
    """Segment summaries (the Iceberg manifest-list shape): a
    selective predicate must skip whole segments WITHOUT loading
    them, agree exactly with full-resolution pruning on what it
    keeps, and fold partition pseudo-stats into the summaries so a
    stats-less partitioned table still prunes at segment grain."""
    from trial_submission_studio_spark.io.zonemap import (
        prune_files,
        prune_manifest,
    )

    root = str(tmp_path / "t")
    os.makedirs(root)
    # 16 files, k-ranges clustered per file -> 4-entry segments hold
    # contiguous k ranges (residual fills sorted)
    files = []
    stats = {}
    for i in range(16):
        rel = _mk_file(root, f"data/r/f{i:02d}.parquet")
        files.append(rel)
        stats[rel] = {
            "num_rows": 10,
            "columns": {"k": {"t": "int", "min": i * 10,
                              "max": i * 10 + 9, "nulls": 0}},
        }
    publish_files(root, files, stats=stats)
    raw = versioned._read_manifest_raw(root, 1)
    assert raw["segments"] and set(raw["segment_stats"]) == set(
        raw["segments"]
    )

    loads = {"n": 0}
    real_load = versioned._load_segment

    def counting_load(r, sid):
        loads["n"] += 1
        return real_load(r, sid)

    monkeypatch.setattr(versioned, "_load_segment", counting_load)
    versioned._SEG_CACHE.clear()

    pred = [("k", "<", 25)]
    pr = prune_manifest(root, 1, pred)
    # only the first segment(s) load; the rest skip on summaries
    assert loads["n"] < len(raw["segments"])
    assert pr["segments_skipped"] >= 2
    assert pr["rows_skipped_bound"] >= 100
    # exact agreement with full-resolution pruning
    full = prune_files(read_manifest(root, 1), pred)
    assert pr["kept"] == sorted(full["kept"])
    assert pr["files_skipped"] == len(full["skipped"])

    # dv refs of kept files travel on the plan
    commit_files(
        root, base_version=1, kind="keyed",
        dv_updates={files[0]: {"sidecars": ["dv/a.parquet"], "rows": 1}},
    )
    pr2 = prune_manifest(root, 2, pred)
    assert pr2["dv"] == {
        files[0]: {"sidecars": ["dv/a.parquet"], "rows": 1}
    }

    # partitioned, ZERO footer stats: summaries come from the
    # path-derived pseudo-stats alone
    proot = str(tmp_path / "p")
    os.makedirs(proot)
    pfiles = [
        _mk_file(proot, f"data/r/__p_day=d{i // 4}/f{i:02d}.parquet")
        for i in range(16)
    ]
    publish_files(
        proot, pfiles,
        metadata={"partition_spec": {"cols": ["day"]}},
    )
    prp = prune_manifest(proot, 1, [("day", "=", "d0")])
    assert prp["segments_skipped"] >= 2
    assert prp["kept"] == sorted(pfiles[:4])

    # plain manifests fall through with the same shape
    monkeypatch.setattr(versioned, "SEGMENT_MIN_FILES", 10**9)
    sroot = str(tmp_path / "s")
    os.makedirs(sroot)
    sfiles = [_mk_file(sroot, f"data/r/g{i}.parquet") for i in range(4)]
    publish_files(sroot, sfiles, stats={
        f: {"num_rows": 5, "columns": {"k": {"t": "int", "min": i,
                                             "max": i, "nulls": 0}}}
        for i, f in enumerate(sfiles)
    })
    prs = prune_manifest(sroot, 1, [("k", "=", 2)])
    assert prs["segments_total"] == 0 and len(prs["kept"]) == 1


def test_delta_reuse_appends_with_zero_loads(
    tmp_path, seg_small, monkeypatch
):
    """commit_files passes its exact footprint to the segmenter: a
    pure append proves every prior segment untouched via the summary
    file-name ranges and reuses it with ZERO segment loads (a
    delete loads only the segments whose range covers the doomed
    path); a poisoned summary falls back to the full scan and stays
    byte-correct."""
    import json as _json

    root = str(tmp_path / "t")
    os.makedirs(root)
    files = []
    stats = {}
    for i in range(16):
        rel = _mk_file(root, f"data/r/f{i:02d}.parquet")
        files.append(rel)
        stats[rel] = {"num_rows": 3}
    publish_files(root, files, stats=stats)

    loads = {"n": 0}
    real_load = versioned._load_segment

    def counting_load(r, sid):
        loads["n"] += 1
        return real_load(r, sid)

    monkeypatch.setattr(versioned, "_load_segment", counting_load)
    versioned._SEG_CACHE.clear()

    extra = _mk_file(root, "data/r/zz.parquet")
    commit_files(
        root, base_version=1, kind="append", add_files=[extra],
        add_stats={extra: {"num_rows": 3}},
    )
    # r16 raw commit path: a pure append reads ZERO prior segments
    # end-to-end — no base resolve, no reuse re-verify, no tail load
    # (the tail segment here is full enough not to fold)
    assert loads["n"] == 0
    m = read_manifest(root)
    assert len(m["files"]) == 17 and extra in m["stats"]

    # a targeted delete loads ONLY the covering segment (plus at most
    # one undersized-tail fold) — never a resolve walk
    loads["n"] = 0
    versioned._SEG_CACHE.clear()
    commit_files(
        root, base_version=2, kind="keyed", remove_files=[files[0]]
    )
    assert loads["n"] <= 2
    assert files[0] not in read_manifest(root)["files"]

    # poisoned summary (file_min stripped): books still balance via
    # the full-scan fallback and the result is identical
    vpath = versioned._manifest_path(root, versioned.current_version(root))
    doc = _json.loads(open(vpath).read())
    for summ in doc["segment_stats"].values():
        summ.pop("file_min", None)
        summ.pop("file_max", None)
    os.chmod(vpath, 0o644)
    with open(vpath, "w") as fh:
        fh.write(_json.dumps(doc))
    loads["n"] = 0
    versioned._SEG_CACHE.clear()
    extra2 = _mk_file(root, "data/r/zz2.parquet")
    commit_files(
        root,
        base_version=versioned.current_version(root),
        kind="append",
        add_files=[extra2],
    )
    assert loads["n"] > 0  # fell back to loading
    got = read_manifest(root)
    assert extra2 in got["files"] and files[0] not in got["files"]
    assert len(got["files"]) == 17


def test_incomplete_stats_entries_survive_segmentation(
    tmp_path, seg_small
):
    """r15 review fix: caller-composed stats entries missing fields
    the read path tolerates (no 'nulls', no 'min') must not crash a
    segmented commit — the column is omitted from the summary (the
    matcher keeps) and resolution returns the entries verbatim."""
    from trial_submission_studio_spark.io.zonemap import prune_manifest

    root = str(tmp_path / "t")
    os.makedirs(root)
    files = [_mk_file(root, f"data/r/f{i}.parquet") for i in range(6)]
    stats = {
        f: {"columns": {"k": {"t": "int", "min": i, "max": i}}}
        for i, f in enumerate(files)  # no 'nulls', no num_rows
    }
    m = publish_files(root, files, stats=stats)
    assert versioned._read_manifest_raw(root, 1).get("segments")
    assert read_manifest(root)["stats"] == stats  # verbatim roundtrip
    # summaries omit the incomplete column -> nothing skips, no crash
    pr = prune_manifest(root, 1, [("k", "isnull")])
    assert pr["kept"] == sorted(files)
    commit_files(
        root, base_version=m["version"], kind="append",
        add_files=[_mk_file(root, "data/r/z.parquet")],
    )
    assert len(read_manifest(root)["files"]) == 7


def test_vacuum_reports_segment_gc_and_resurrect_refreshes_mtime(
    tmp_path, seg_small
):
    """r15 review fixes: (a) vacuum's segment GC appears in the
    returned list and dry_run previews it without deleting; (b)
    reusing an existing content-addressed segment refreshes its mtime
    so a racing vacuum's age guard protects a resurrected orphan."""
    root = str(tmp_path / "t")
    os.makedirs(root)
    files = [_mk_file(root, f"data/r/f{i}.parquet") for i in range(6)]
    publish_files(root, files)
    commit_files(
        root, base_version=1, kind="keyed", remove_files=[files[0]]
    )
    retire_versions(root, keep_latest=1)
    preview = vacuum(root, dry_run=True, min_age_seconds=0)
    assert any("segments/seg-" in d for d in preview)
    segdir = versioned._segments_dir(root)
    n_before = len(os.listdir(segdir))
    real = vacuum(root, min_age_seconds=0)
    assert set(real) == set(preview)
    assert len(
        [n for n in os.listdir(segdir) if n.startswith("seg-")]
    ) < n_before

    # (b) mtime refresh on reuse
    entries = [{"file": "data/r/x.parquet"}]
    sid = versioned._write_segment(root, entries)
    p = versioned._segment_path(root, sid)
    os.utime(p, (1, 1))
    assert versioned._write_segment(root, entries) == sid
    assert os.path.getmtime(p) > 1


def test_segmented_table_through_spark_stack(spark, tmp_path, seg_small):
    """End-to-end on real data: a segmented table reads identically
    through read_version, zonemap-pruned reads, dv deletes, the
    format('tss') route, and the streaming sink's stdlib mirror."""
    from trial_submission_studio_spark.io.datasource import (
        _ds_append_commit,
        register,
    )
    from trial_submission_studio_spark.io.deletion_vectors import (
        delete_matching_dv,
    )
    from trial_submission_studio_spark.io.zonemap import (
        prune_files,
        publish_with_stats,
    )

    register(spark)
    root = str(tmp_path / "t")
    os.makedirs(root)
    d = new_data_dir(root)
    spark.createDataFrame(
        [(k, k * 2) for k in range(40)], "k long, v long"
    ).repartitionByRange(8, "k").write.parquet(d, mode="append")
    publish_with_stats(root, d, ["k"])
    raw = versioned._read_manifest_raw(root, 1)
    assert raw.get("segments")

    delete_matching_dv(
        spark, root, spark.createDataFrame([(7,)], "k long"), "k"
    )
    got = {tuple(r) for r in read_version(spark, root).collect()}
    assert got == {(k, k * 2) for k in range(40) if k != 7}

    # zonemap pruning runs on the resolved stats
    m = read_manifest(root)
    pr = prune_files(m, [("k", "<", 10)])
    assert pr["skipped"] and len(pr["kept"]) < len(m["files"])

    # format route (planner + executor resolution of segments)
    df = spark.read.format("tss").option("root", root).load()
    assert {tuple(r) for r in df.filter("k < 10").collect()} == {
        (k, k * 2) for k in range(10) if k != 7
    }

    # the stdlib sink mirror appends O(delta): all prior segments
    # reused, exactly one fresh segment for the batch
    segdir = versioned._segments_dir(root)
    before = set(os.listdir(segdir))
    extra = _mk_file(root, "data/sink/s1.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"k": pa.array([99], pa.int64()),
                  "v": pa.array([198], pa.int64())}),
        os.path.join(root, extra),
    )
    m2 = _ds_append_commit(root, [extra], {"w": 1})
    raw2 = versioned._read_manifest_raw(root, m2["version"])
    assert raw2.get("segments")
    assert len(set(os.listdir(segdir)) - before) == 1
    assert (99, 198) in {
        tuple(r) for r in read_version(spark, root).collect()
    }
