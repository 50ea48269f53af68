"""Round-15 hardening of the DataSource layer (the five r14 ADVICE
findings + the self-found fence/race edges): pushed arrow filters
must skip columns a file predates, schema() must honor the manifest's
recorded contract (not one sampled footer), the streaming sink must
validate drifted input against the carried schema contract, the
sink's replay fence must survive retention AND >200 interleaved
commits, register()'s package zip must be uid-scoped, the stdlib
append commit must absorb an NFS self-race, and a behind feed
consumer must die typed (or be protected by its low-water marker)."""

import json
import os

import pytest

from trial_submission_studio_spark.io import versioned
from trial_submission_studio_spark.io.datasource import (
    FeedRetentionError,
    _ds_append_commit,
    _ds_last_sink_batch,
    _ds_list_versions,
    _ds_write_sink_fence,
    register,
)
from trial_submission_studio_spark.io.table_schema import publish_checked
from trial_submission_studio_spark.io.versioned import (
    FeedPinnedError,
    current_version,
    new_data_dir,
    read_manifest,
    read_version,
    retire_versions,
)


@pytest.fixture(scope="module")
def tss(spark):
    register(spark)
    return spark


def _snap(df):
    return {tuple(r) for r in df.collect()}


def _publish_evolved(spark, tmp_path, name="evo"):
    """Two-generation table: gen-1 files lack column ``extra`` (added
    later with allow_new_columns) — the add-column-evolution shape
    both footer-dependent bugs hit."""
    root = str(tmp_path / name)
    os.makedirs(root)
    d1 = new_data_dir(root)
    spark.createDataFrame(
        [(k, k * 10) for k in range(10)], "k long, v long"
    ).coalesce(1).write.parquet(d1, mode="append")
    publish_checked(root, d1)
    d2 = new_data_dir(root)
    spark.createDataFrame(
        [(k, k * 10, f"e{k}") for k in range(10, 20)],
        "k long, v long, extra string",
    ).coalesce(1).write.parquet(d2, mode="append")
    publish_checked(root, d2, base_version=1, allow_new_columns=True)
    return root


def test_pushed_filter_on_evolved_column_reads_old_files(tss, tmp_path):
    """ADVICE r15 #1: a filter on a column absent from a file's footer
    must not crash the arrow read (ArrowInvalid 'No match for
    FieldRef.Name') — it is simply not pushed for that file; Spark
    re-applies it."""
    spark = tss
    root = _publish_evolved(spark, tmp_path, "evo1")
    df = spark.read.format("tss").option("root", root).load()
    got = _snap(df.filter("extra = 'e12'"))
    assert got == {(12, 120, "e12")}
    # and a filter that keeps old-generation rows still reads them
    assert _snap(df.filter("extra is null")) == {
        (k, k * 10, None) for k in range(10)
    }


def test_format_schema_honors_contract_not_one_footer(tss, tmp_path):
    """ADVICE r15 #2: schema() must present the evolved column no
    matter which file the manifest lists first — the recorded schema
    contract is the authority, matching read_version's mergeSchema."""
    spark = tss
    root = _publish_evolved(spark, tmp_path, "evo2")
    df = spark.read.format("tss").option("root", root).load()
    assert set(df.columns) == {"k", "v", "extra"}
    assert _snap(df) == _snap(
        read_version(spark, root).select(*df.columns)
    )
    # under column mapping too: rename the evolved column, re-read
    from trial_submission_studio_spark.io.table_schema import rename_column

    rename_column(spark, root, "extra", "note")
    df2 = spark.read.format("tss").option("root", root).load()
    assert set(df2.columns) == {"k", "v", "note"}
    assert (12, 120, "e12") in _snap(df2.select("k", "v", "note"))


def test_stream_sink_refuses_contract_violating_batch(tmp_path):
    """ADVICE r15 #3: a micro-batch whose parquet schema violates the
    table's recorded contract must refuse loudly at the sink commit,
    not append silently."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "drift")
    os.makedirs(os.path.join(root, "data"))

    def _file(name, drifted):
        p = os.path.join(root, "data", name)
        if drifted:
            t = pa.table({"k": pa.array([1], pa.int64()),
                          "v": pa.array(["x"], pa.string())})
        else:
            t = pa.table({"k": pa.array([1], pa.int64()),
                          "v": pa.array([2], pa.int64())})
        pq.write_table(t, p)
        return f"data/{name}"

    f0 = _file("a.parquet", drifted=False)
    versioned.publish_files(
        root, [f0],
        schema=[{"name": "k", "type": "int64", "nullable": True},
                {"name": "v", "type": "int64", "nullable": True}],
    )
    ok = _ds_append_commit(root, [_file("b.parquet", False)], {})
    assert ok["version"] == 2
    with pytest.raises(ValueError, match="schema contract"):
        _ds_append_commit(root, [_file("c.parquet", True)], {})
    # nothing published by the refused commit
    assert current_version(root) == 2


def test_sink_fence_survives_retention_and_interleaves(tmp_path):
    """ADVICE r15 #4 + VERDICT #2: the replay fence must survive (a)
    retire_versions past the fence manifest and (b) >200 interleaved
    commits — both escapes of the old 200-manifest scan."""
    root = str(tmp_path / "fence")
    os.makedirs(os.path.join(root, "data"))

    def mk(i):
        p = f"data/f{i}.parquet"
        with open(os.path.join(root, p), "wb") as fh:
            fh.write(b"x")
        return p

    m = _ds_append_commit(
        root, [mk(0)],
        {"stream_sink": {"run_id": "r1", "batch_id": 7}},
    )
    _ds_write_sink_fence(root, "r1", 7, m["version"])
    # (a) retention deletes the fence-carrying manifest
    for i in range(1, 4):
        _ds_append_commit(root, [mk(i)], {"w": i})
    retire_versions(root, keep_latest=1)
    assert _ds_last_sink_batch(root, "r1") == 7
    # (b) 250 interleaved commits — far past the old lookback cap
    for i in range(4, 254):
        _ds_append_commit(root, [mk(i)], {"w": i})
    assert _ds_last_sink_batch(root, "r1") == 7
    # crash window: a commit whose marker write never happened is
    # still found by the scan (newest-first, first-hit)
    _ds_append_commit(
        root, [mk(999)],
        {"stream_sink": {"run_id": "r1", "batch_id": 8}},
    )
    assert _ds_last_sink_batch(root, "r1") == 8


def test_register_zip_is_uid_scoped(tss):
    """ADVICE r15 #5: the shipped package zip carries the uid so two
    OS users on one host cannot collide on a world-shared path."""
    import tempfile

    uid = getattr(os, "getuid", lambda: "u")()
    assert os.path.exists(
        os.path.join(
            tempfile.gettempdir(), f"tss_pkg_datasource_{uid}.zip"
        )
    )


def test_ds_append_commit_absorbs_self_race(tmp_path, monkeypatch):
    """VERDICT #3: a retransmit-EEXIST after the commit's OWN
    successful link must absorb (identical payload), not die on the
    duplicate-files guard; a REAL lost race still re-reads the world."""
    import trial_submission_studio_spark.io.datasource as ds

    root = str(tmp_path / "race")
    os.makedirs(os.path.join(root, "data"))
    p = "data/a.parquet"
    with open(os.path.join(root, p), "wb") as fh:
        fh.write(b"x")

    real_link = os.link
    calls = {"n": 0}

    def flaky_link(src, dst):
        real_link(src, dst)
        calls["n"] += 1
        raise FileExistsError(dst)  # NFS retransmit: link DID land

    monkeypatch.setattr(ds.os, "link", flaky_link)
    m = _ds_append_commit(root, [p], {"w": 1})
    assert m is not None and m["version"] == 1 and calls["n"] == 1
    assert read_manifest(root, 1)["files"] == [p]


def test_feed_retention_conflict_is_typed(tss, tmp_path):
    """VERDICT #7: a behind consumer whose start manifest was retired
    gets FeedRetentionError (not FileNotFoundError); a consumer that
    registered a feedId makes retire_versions refuse up front."""
    from trial_submission_studio_spark.io.datasource import _TssFeedReader

    spark = tss
    root = str(tmp_path / "feedr")
    os.makedirs(root)
    for i in range(4):
        d = new_data_dir(root)
        spark.createDataFrame([(i, i)], "k long, v long").coalesce(
            1
        ).write.parquet(d, mode="append")
        versioned.publish_version(
            root, d, base_version=current_version(root)
        )
    schema = spark.read.parquet(
        os.path.join(root, read_manifest(root)["files"][0])
    ).schema

    # markerless consumer: manifests 1..2 retired under it -> typed
    r = _TssFeedReader({"root": root}, schema)
    retire_versions(root, keep_latest=2)
    with pytest.raises(FeedRetentionError, match="retired"):
        r.partitions({"version": 1}, {"version": 4})

    # registered consumer: its committed offset's manifest is pinned
    r2 = _TssFeedReader({"root": root, "feedId": "c1"}, schema)
    r2.commit({"version": 3})
    with pytest.raises(FeedPinnedError, match="c1"):
        retire_versions(root, keep_latest=1)
    # catch up -> retention proceeds
    r2.commit({"version": 4})
    assert retire_versions(root, keep_latest=1) == [3]
