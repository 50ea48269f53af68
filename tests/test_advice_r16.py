"""Round-16 ADVICE fixes, each pinned: (1) sink-written degraded
segment summaries (file range only, no columns) are upgraded exactly
once on the next batch-side load-verify pass and then regain the
zero-load reuse fast path; (2) the partitions views still answer
after the partition spec is dropped, from the spec history; (3)
read_manifest returns mutation-safe deep copies, never the shared
segment-cache objects; (4) the delta fast path's range probe is a
bisect, equivalent at the boundaries; (5) format('tss') schema()
carries footer/contract nullability instead of hard-coding True.
"""

import json
import os

import pytest

from trial_submission_studio_spark.io import versioned
from trial_submission_studio_spark.io.versioned import (
    commit_files,
    current_version,
    publish_files,
    read_manifest,
)


@pytest.fixture
def seg_small(monkeypatch):
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


def _count_loads(monkeypatch):
    loads = {"n": 0}
    real = versioned._load_segment

    def counting(r, sid):
        loads["n"] += 1
        return real(r, sid)

    monkeypatch.setattr(versioned, "_load_segment", counting)
    versioned._SEG_CACHE.clear()
    return loads


def _degrade_summaries(root, version):
    """Rewrite a manifest's segment summaries to the streaming sink's
    degraded file-range-only form (n_files/file_min/file_max)."""
    path = versioned._manifest_path(root, version)
    doc = json.loads(open(path).read())
    for summ in doc["segment_stats"].values():
        for k in list(summ):
            if k not in ("n_files", "file_min", "file_max"):
                summ.pop(k)
    os.chmod(path, 0o644)
    with open(path, "w") as fh:
        fh.write(json.dumps(doc))


def test_degraded_summary_upgraded_once_then_zero_loads(
    tmp_path, seg_small, monkeypatch
):
    root = str(tmp_path / "t")
    os.makedirs(root)
    files, stats = [], {}
    for i in range(12):
        rel = _mk_file(root, f"data/r/f{i:02d}.parquet")
        files.append(rel)
        stats[rel] = {
            "num_rows": 10,
            "columns": {"k": {"t": "int", "min": i * 10,
                              "max": i * 10 + 9, "nulls": 0}},
        }
    publish_files(root, files, stats=stats)
    _degrade_summaries(root, 1)

    # commit 1: the load-verify pass must RECOMPUTE the degraded
    # summaries (columns restored), not carry them forever
    extra = _mk_file(root, "data/r/zz0.parquet")
    commit_files(
        root, base_version=1, kind="append", add_files=[extra],
        add_stats={extra: {"num_rows": 1, "columns": {
            "k": {"t": "int", "min": 120, "max": 120, "nulls": 0}}}},
    )
    raw2 = versioned._read_manifest_raw(root, 2)
    upgraded = [
        s for s in raw2["segment_stats"].values()
        if "columns" in s or s.get("nocols")
    ]
    assert len(upgraded) == len(raw2["segment_stats"])
    # segment-level pruning works again off the upgraded summaries
    from trial_submission_studio_spark.io.zonemap import prune_manifest

    pr = prune_manifest(root, 2, [("k", "<", 15)])
    assert pr["segments_skipped"] >= 1

    # commit 2: upgraded summaries are back on the zero-load fast path
    loads = _count_loads(monkeypatch)
    extra2 = _mk_file(root, "data/r/zz1.parquet")
    commit_files(
        root, base_version=2, kind="append", add_files=[extra2],
    )
    n_segs = len(raw2["segments"])
    # base resolve accounts for every load; the segmenter adds at most
    # an undersized-tail fold — never a second re-verify walk
    assert loads["n"] <= n_segs + 1


def test_stats_less_segments_marked_nocols_not_rescanned(
    tmp_path, seg_small, monkeypatch
):
    """A table with no stats at all: summaries carry the explicit
    'no summarizable columns' marker so commits don't reload them
    every time looking for an upgrade."""
    root = str(tmp_path / "t")
    os.makedirs(root)
    files = [_mk_file(root, f"data/r/f{i}.parquet") for i in range(8)]
    publish_files(root, files)
    raw = versioned._read_manifest_raw(root, 1)
    assert all(
        s.get("nocols") and "columns" not in s
        for s in raw["segment_stats"].values()
    )
    loads = _count_loads(monkeypatch)
    extra = _mk_file(root, "data/r/z.parquet")
    commit_files(root, base_version=1, kind="append", add_files=[extra])
    assert loads["n"] <= len(raw["segments"]) + 1


def test_partitions_views_survive_spec_drop(spark, tmp_path):
    from trial_submission_studio_spark.io.partitioned_table import (
        repartition_spec,
        table_partitions,
    )

    root = str(tmp_path / "p")
    os.makedirs(root)
    files = [
        _mk_file(root, f"data/r/__p_day=d{i // 2}/f{i}.parquet")
        for i in range(4)
    ]
    publish_files(
        root, files, metadata={"partition_spec": {"cols": ["day"]}}
    )
    repartition_spec(spark, root, None)
    m = read_manifest(root)
    assert m["metadata"].get("partition_spec") is None
    got = {
        r["partition"]: r["n_files"]
        for r in table_partitions(spark, root).collect()
    }
    assert got == {'{"day": "d0"}': 2, '{"day": "d1"}': 2}

    # the DS metadata view takes the same gate
    from trial_submission_studio_spark.io.datasource import register

    register(spark)
    ds_got = {
        r["partition"]: r["n_files"]
        for r in spark.read.format("tss")
        .option("root", root)
        .option("metadata", "partitions")
        .load()
        .collect()
    }
    assert ds_got == got


def test_read_manifest_copies_do_not_poison_cache(tmp_path, seg_small):
    root = str(tmp_path / "t")
    os.makedirs(root)
    files = [_mk_file(root, f"data/r/f{i}.parquet") for i in range(6)]
    stats = {
        f: {"num_rows": 5, "columns": {"k": {"t": "int", "min": i,
                                             "max": i, "nulls": 0}}}
        for i, f in enumerate(files)
    }
    sc = _mk_file(root, "dv/r/sc.parquet")
    publish_files(
        root, files, stats=stats,
        dv={files[0]: {"sidecars": [sc], "rows": 2}},
    )
    m = read_manifest(root)
    # caller mutates its resolved view in place
    m["stats"][files[1]]["num_rows"] = 999
    m["stats"][files[1]]["columns"]["k"]["max"] = 10**9
    m["dv"][files[0]]["rows"] = 777
    # a fresh read is untouched (the cache was not poisoned)
    m2 = read_manifest(root)
    assert m2["stats"][files[1]]["num_rows"] == 5
    assert m2["stats"][files[1]]["columns"]["k"]["max"] == 1
    assert m2["dv"][files[0]]["rows"] == 2
    # and a follow-up commit's entry-equality reuse still holds:
    # every prior segment is reused (no spurious rewrite from the
    # mutated copy)
    before = set(versioned._read_manifest_raw(root, 1)["segments"])
    extra = _mk_file(root, "data/r/z.parquet")
    commit_files(root, base_version=1, kind="append", add_files=[extra])
    after = versioned._read_manifest_raw(root, 2)["segments"]
    assert before <= set(after) or len(set(after) & before) >= len(before) - 1


def test_delta_range_probe_bisect_boundaries(
    tmp_path, seg_small, monkeypatch
):
    """Bisect edges: a touched path below every range, above every
    range, and exactly equal to a file_min/file_max must behave like
    the linear scan did (miss, miss, hit, hit)."""
    root = str(tmp_path / "t")
    os.makedirs(root)
    files = [_mk_file(root, f"data/m/f{i:02d}.parquet") for i in range(8)]
    publish_files(root, files, stats={f: {"num_rows": 1} for f in files})

    # touched path sorts BEFORE every segment range: all segments
    # reuse with zero loads beyond the base resolve
    loads = _count_loads(monkeypatch)
    lo = _mk_file(root, "data/a/a.parquet")
    commit_files(root, base_version=1, kind="append", add_files=[lo])
    raw = versioned._read_manifest_raw(root, 1)
    assert loads["n"] <= len(raw["segments"]) + 1

    # touched path AFTER every range: same
    loads["n"] = 0
    versioned._SEG_CACHE.clear()
    hi = _mk_file(root, "data/z/z.parquet")
    commit_files(
        root, base_version=current_version(root), kind="append",
        add_files=[hi],
    )
    assert loads["n"] <= len(
        versioned._read_manifest_raw(root, current_version(root) - 1)[
            "segments"
        ]
    ) + 1

    # exact file_min hit: the covering segment must NOT fast-path
    m = read_manifest(root)
    raw = versioned._read_manifest_raw(root, m["version"])
    summ = next(
        s for s in raw["segment_stats"].values() if s["n_files"] > 1
    )
    target = summ["file_min"]
    commit_files(
        root, base_version=m["version"], kind="keyed",
        remove_files=[target],
    )
    assert target not in read_manifest(root)["files"]


def test_ds_schema_carries_nullability(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from trial_submission_studio_spark.io.datasource import TssDataSource

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "data", "r"))
    rel = "data/r/f0.parquet"
    pq.write_table(
        pa.table(
            {"k": pa.array([1, 2], pa.int64()),
             "v": pa.array(["a", None], pa.string())},
            schema=pa.schema([
                pa.field("k", pa.int64(), nullable=False),
                pa.field("v", pa.string(), nullable=True),
            ]),
        ),
        os.path.join(root, rel),
    )
    publish_files(root, [rel])
    sch = TssDataSource(options={"root": root}).schema()
    by_name = {f.name: f.nullable for f in sch.fields}
    assert by_name == {"k": False, "v": True}

    # a second file sharing the schema keeps the sound non-null claim
    # (ALL footers scanned and agree)
    rel2 = "data/r/f1.parquet"
    pq.write_table(
        pa.table(
            {"k": pa.array([3], pa.int64()),
             "v": pa.array(["b"], pa.string())},
            schema=pa.schema([
                pa.field("k", pa.int64(), nullable=False),
                pa.field("v", pa.string(), nullable=True),
            ]),
        ),
        os.path.join(root, rel2),
    )
    commit_files(root, base_version=1, kind="append", add_files=[rel2])
    sch1b = TssDataSource(options={"root": root}).schema()
    assert {f.name: f.nullable for f in sch1b.fields} == by_name

    # a CONTRACT table presents nullable=True even for a footer-
    # required column: the contract cannot prove the column exists in
    # every file (add-column evolution null-fills it), and a false
    # non-null claim lets the optimizer fold IS NULL to false —
    # wrong results, not just wrong metadata (r16 review finding)
    from trial_submission_studio_spark.io.table_schema import file_schema

    contract = file_schema(os.path.join(root, rel))
    assert {f["name"]: f["nullable"] for f in contract} == {
        "k": False, "v": True
    }
    commit_files(
        root,
        base_version=versioned.current_version(root),
        kind="maintenance",
        schema=contract,
    )
    sch2 = TssDataSource(options={"root": root}).schema()
    assert {f.name: f.nullable for f in sch2.fields} == {
        "k": True, "v": True
    }
