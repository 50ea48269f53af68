"""Bucket-spec'd versioned tables (io/bucketed_table.py + the
merge/delete integration in io/merge.py): manifest contract,
key-pruned reads, bucket-pruned merge planning, layout preservation
across rewrites, and the documented exchange-free-join boundary."""

import os

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.io.bucketed_table import (
    BUCKET_COL,
    bucket_files,
    bucket_id,
    bucket_spec,
    probe_bucket_ids,
    publish_bucketed,
    read_bucketed_version,
    read_key_pruned,
)
from trial_submission_studio_spark.io.merge import delete_matching, merge_version
from trial_submission_studio_spark.io.versioned import read_manifest

N_BUCKETS = 8


def _rows(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id % 7 AS DOUBLE) AS v", "'x' || id AS payload"
    )


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def _assert_layout_consistent(spark, root):
    """Every file's rows hash to the bucket named by its __kb dir —
    the invariant key-pruned reads rely on."""
    m = read_manifest(root)
    spec = m["metadata"]["bucket_spec"]
    for f in m["files"]:
        assert f"{BUCKET_COL}=" in f, f
        b = int(f.split(f"{BUCKET_COL}=")[1].split("/")[0])
        got = (
            spark.read.parquet(os.path.join(root, f))
            .select(bucket_id(spec["key_cols"], spec["n_buckets"]).alias("b"))
            .distinct()
            .collect()
        )
        assert [r.b for r in got] == [b], (f, got)


def test_publish_read_roundtrip_and_spec(spark, tmp_path):
    root = str(tmp_path / "t")
    df = _rows(spark, 0, 500)
    m = publish_bucketed(spark, df, root, "k", N_BUCKETS)
    assert m["metadata"]["bucket_spec"] == {
        "key_cols": ["k"], "n_buckets": N_BUCKETS,
    }
    assert bucket_spec(root) == m["metadata"]["bucket_spec"]
    got = read_bucketed_version(spark, root)
    assert sorted(got.columns) == ["k", "payload", "v"]
    assert _as_set(got) == _as_set(df)
    _assert_layout_consistent(spark, root)


def test_key_pruned_read_scans_only_probed_buckets(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_bucketed(spark, _rows(spark, 0, 1000), root, "k", N_BUCKETS)
    keys = spark.createDataFrame([(5,), (123,), (999,)], "k long")
    spec = bucket_spec(root)
    probed = probe_bucket_ids(keys, spec)
    assert 1 <= len(probed) <= 3
    m = read_manifest(root)
    mine = bucket_files(m, probed)
    assert 0 < len(mine) < len(m["files"])  # a real prune
    got = read_key_pruned(spark, root, keys)
    want = read_bucketed_version(spark, root).join(
        keys, "k", "left_semi"
    )
    assert _as_set(got) == _as_set(want)
    assert got.count() == 3
    # empty probe set: no matching buckets -> empty frame, same schema
    none = read_key_pruned(
        spark, root, spark.createDataFrame([], "k long")
    )
    assert none.count() == 0
    assert sorted(none.columns) == sorted(got.columns)


def test_merge_preserves_layout_and_prunes_planning(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_bucketed(spark, _rows(spark, 0, 1000), root, "k", N_BUCKETS)
    # scattered updates + inserts (the hash-bucket workload shape)
    src = spark.createDataFrame(
        [(5, 100.0, "upd5"), (123, 100.0, "upd123"), (2000, 1.0, "new")],
        "k long, v double, payload string",
    )
    m = merge_version(spark, root, src, "k")
    au = m["metadata"]["merge"]
    assert m["metadata"]["bucket_spec"] == bucket_spec(root)
    # planning probed only the source keys' buckets, not all 8
    assert 1 <= au["buckets_probed"] <= 3
    assert au["rows_updated"] == 2 and au["rows_inserted"] == 1
    _assert_layout_consistent(spark, root)
    # answers: merged values visible, key-pruned read agrees
    got = {
        r.k: (r.v, r.payload)
        for r in read_key_pruned(
            spark, root, spark.createDataFrame([(5,), (2000,)], "k long")
        ).collect()
    }
    assert got == {5: (100.0, "upd5"), 2000: (1.0, "new")}
    assert read_bucketed_version(spark, root).count() == 1001


def test_delete_preserves_layout(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_bucketed(spark, _rows(spark, 0, 400), root, "k", N_BUCKETS)
    doomed = spark.createDataFrame([(i,) for i in range(0, 40)], "k long")
    m = delete_matching(spark, root, doomed, "k")
    assert m["metadata"]["bucket_spec"] == bucket_spec(root)
    assert m["metadata"]["merge"]["rows_deleted"] == 40
    assert "buckets_probed" in m["metadata"]["merge"]
    _assert_layout_consistent(spark, root)
    assert read_bucketed_version(spark, root).count() == 360
    assert read_key_pruned(
        spark, root, spark.createDataFrame([(3,), (100,)], "k long")
    ).count() == 1  # 3 deleted, 100 alive


def test_spec_change_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    publish_bucketed(spark, _rows(spark, 0, 50), root, "k", 4)
    with pytest.raises(ValueError, match="bucket spec changed"):
        publish_bucketed(spark, _rows(spark, 50, 60), root, "k", 8)


def test_exchange_free_join_needs_catalog_or_dsv2(spark, tmp_path):
    """The documented boundary (module docstring): path-based reads
    of the bucketed file list DO plan an Exchange on a bucket-key
    join — Catalyst only elides it when the scan reports hash
    clustering, which needs the catalog bucketed-table route
    (operators/bucketing.py, pinned exchange-free by
    tests/test_bucketing.py) or a JVM DSv2 source. This test is the
    'measured reason' of record: if a future Spark version starts
    propagating it, this fails and the docstring gets to improve."""
    from trial_submission_studio_spark.operators.bucketing import (
        is_exchange_free_join,
    )

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    publish_bucketed(spark, _rows(spark, 0, 300), a, "k", N_BUCKETS)
    publish_bucketed(spark, _rows(spark, 0, 300), b, "k", N_BUCKETS)
    # big-table regime: disable auto-broadcast so the planner must
    # satisfy the join's distribution requirement from the scans
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed_version(spark, a).join(
            read_bucketed_version(spark, b).withColumnRenamed("v", "v2")
            .withColumnRenamed("payload", "p2"),
            "k",
        )
        assert joined.count() == 300  # co-located files, correct join
        assert not is_exchange_free_join(joined)  # the boundary, measured
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_catalog_bridge_delivers_exchange_free_join(spark, tmp_path):
    """The bridge across the measured boundary above:
    sync_catalog_bucketed materializes published snapshots as catalog
    bucketed tables; a bucket-key join between them plans with ZERO
    shuffle Exchange, the sync is an idempotent no-op while the
    snapshot is unchanged, and it survives merge + dv-delete commits
    (re-sync refreshes the materialization)."""
    import uuid

    from trial_submission_studio_spark.io.bucketed_table import (
        sync_catalog_bucketed,
    )
    from trial_submission_studio_spark.io.deletion_vectors import (
        delete_matching_dv,
    )
    from trial_submission_studio_spark.operators.bucketing import (
        is_exchange_free_join,
    )

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    publish_bucketed(spark, _rows(spark, 0, 300), a, "k", N_BUCKETS)
    publish_bucketed(spark, _rows(spark, 0, 300), b, "k", N_BUCKETS)
    ta, tb = (f"snap_{uuid.uuid4().hex[:8]}" for _ in range(2))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        r1 = sync_catalog_bucketed(
            spark, a, ta, path=str(tmp_path / "cat_a")
        )
        sync_catalog_bucketed(spark, b, tb, path=str(tmp_path / "cat_b"))
        assert r1["refreshed"]

        def joined():
            return spark.table(ta).join(
                spark.table(tb)
                .withColumnRenamed("v", "v2")
                .withColumnRenamed("payload", "p2"),
                "k",
            )

        j = joined()
        assert is_exchange_free_join(j)  # the payoff, measured
        assert j.count() == 300

        # unchanged snapshot -> metadata no-op
        assert not sync_catalog_bucketed(
            spark, a, ta, path=str(tmp_path / "cat_a")
        )["refreshed"]

        # survives a merge commit and a dv delete: re-sync refreshes
        merge_version(
            spark, a,
            spark.createDataFrame(
                [(500, 1.0, "new")], "k long, v double, payload string"
            ),
            "k",
        )
        delete_matching_dv(
            spark, a, spark.createDataFrame([(3,)], "k long"), "k"
        )
        r = sync_catalog_bucketed(spark, a, ta, path=str(tmp_path / "cat_a"))
        assert r["refreshed"]
        j = joined()
        assert is_exchange_free_join(j)
        ks = {row.k for row in j.select("k").collect()}
        assert 3 not in ks and len(ks) == 299  # 500 has no b match
        assert {row.k for row in spark.table(ta).collect()} == (
            set(range(300)) | {500}
        ) - {3}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t in (ta, tb):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_compaction_preserves_bucket_layout(spark, tmp_path):
    """compact_version on a bucket-spec'd root consolidates small
    files WITHIN buckets (never emitting files outside __kb dirs)
    and carries the spec — key-pruned reads keep answering after an
    OPTIMIZE, with fewer files per bucket."""
    from trial_submission_studio_spark.io.versioned import compact_version

    root = str(tmp_path / "t")
    publish_bucketed(spark, _rows(spark, 0, 400), root, "k", 4)
    # scattered inserts pile extra small files into the bucket dirs
    for lo in (1000, 2000, 3000):
        src = spark.createDataFrame(
            [(lo + i, 1.0, "ins") for i in range(8)],
            "k long, v double, payload string",
        )
        merge_version(spark, root, src, "k")
    m0 = read_manifest(root)
    assert len(m0["files"]) > 4  # multiple runs per bucket now

    m1 = compact_version(spark, root, target_bytes=1 << 26)
    assert m1["metadata"]["bucket_spec"] == bucket_spec(root)
    assert m1["metadata"]["compaction_of"] == m0["version"]
    assert len(m1["files"]) == 4  # one file per bucket
    _assert_layout_consistent(spark, root)
    assert read_bucketed_version(spark, root).count() == 424
    keys = spark.createDataFrame([(5,), (1003,), (3007,)], "k long")
    got = read_key_pruned(spark, root, keys)
    assert got.count() == 3


def test_zorder_optimize_refuses_bucketed_root(spark, tmp_path):
    """The two layouts compete for file placement: optimize_version
    refuses a bucket-spec'd snapshot loudly instead of silently
    scattering buckets across Z-ordered files."""
    from trial_submission_studio_spark.io.zonemap import optimize_version

    root = str(tmp_path / "t")
    publish_bucketed(spark, _rows(spark, 0, 100), root, "k", 4)
    with pytest.raises(ValueError, match="bucket-spec'd.*Z-order"):
        optimize_version(spark, root, {"k": (0.0, 100.0)})


@pytest.mark.parametrize("seed", [5, 31])
def test_random_sequences_match_dict_model(spark, tmp_path, seed):
    """Model-based: a seeded random sequence of merge / delete /
    compact commits against a bucket-spec'd root must equal a plain
    dict model after every commit — snapshot rows, key-pruned
    probes, AND the per-file hash-layout invariant. Hunts the worst
    table-format bug class (an op interleaving that silently loses,
    duplicates, or mis-buckets rows)."""
    import random

    from trial_submission_studio_spark.io.versioned import compact_version

    rng = random.Random(seed)
    root = str(tmp_path / "t")
    model = {k: float(k % 7) for k in range(120)}
    publish_bucketed(
        spark,
        spark.createDataFrame(
            [(k, v, f"x{k}") for k, v in model.items()],
            "k long, v double, payload string",
        ),
        root, "k", 4,
    )
    model = {k: (v, f"x{k}") for k, v in model.items()}

    def check():
        got = {
            r.k: (r.v, r.payload)
            for r in read_bucketed_version(spark, root).collect()
        }
        assert got == model
        probe_keys = rng.sample(sorted(set(range(400)) | set(model)), 5)
        probe = spark.createDataFrame([(k,) for k in probe_keys], "k long")
        pruned = {
            r.k: (r.v, r.payload)
            for r in read_key_pruned(spark, root, probe).collect()
        }
        assert pruned == {k: model[k] for k in probe_keys if k in model}

    for step in range(6):
        op = rng.choice(["merge", "delete", "compact"])
        if op == "merge" and model:
            ks = rng.sample(sorted(model), min(7, len(model)))
            ks += [rng.randrange(200, 400) for _ in range(3)]  # inserts
            src = spark.createDataFrame(
                [(k, float(step), f"s{step}-{k}") for k in set(ks)],
                "k long, v double, payload string",
            )
            merge_version(spark, root, src, "k")
            for k in set(ks):
                model[k] = (float(step), f"s{step}-{k}")
        elif op == "delete" and len(model) > 10:
            ks = rng.sample(sorted(model), 5)
            delete_matching(
                spark, root,
                spark.createDataFrame([(k,) for k in ks], "k long"), "k",
            )
            for k in ks:
                del model[k]
        else:
            compact_version(spark, root, target_bytes=1 << 26)
        check()
        _assert_layout_consistent(spark, root)


class TestKeyDtypeAlignment:
    """ADVICE r12 (high): F.hash is dtype-sensitive — hash(5 INT) !=
    hash(5 BIGINT) — so a probe/source whose key column differs in
    numeric width used to hash to the WRONG bucket: merge silently
    inserted a duplicate instead of updating, delete/read_key_pruned
    silently dropped rows. Now safe widenings are cast to the target
    dtype and unsafe mismatches are refused loudly."""

    def _table(self, spark, tmp_path):
        root = str(tmp_path / "dt")
        publish_bucketed(spark, _rows(spark, 0, 200), root, "k", N_BUCKETS)
        return root  # k is BIGINT

    def test_int_keyed_merge_updates_not_duplicates(self, spark, tmp_path):
        root = self._table(spark, tmp_path)
        src = spark.createDataFrame(
            [(5, 99.0, "UPDATED")], "k int, v double, payload string"
        )
        merge_version(spark, root, src, "k")
        got = (
            read_bucketed_version(spark, root)
            .filter(F.col("k") == 5)
            .collect()
        )
        assert len(got) == 1, got
        assert got[0].payload == "UPDATED"
        _assert_layout_consistent(spark, root)

    def test_int_keyed_delete_hits(self, spark, tmp_path):
        root = self._table(spark, tmp_path)
        delete_matching(
            spark, root, spark.createDataFrame([(7,)], "k int"), "k"
        )
        assert (
            read_bucketed_version(spark, root).filter(F.col("k") == 7).count()
            == 0
        )

    def test_int_keyed_read_key_pruned_hits(self, spark, tmp_path):
        root = self._table(spark, tmp_path)
        got = read_key_pruned(
            spark, root, spark.createDataFrame([(11,), (13,)], "k int")
        )
        assert sorted(r.k for r in got.collect()) == [11, 13]

    def test_unsafe_key_dtype_refused(self, spark, tmp_path):
        root = self._table(spark, tmp_path)
        bad = spark.createDataFrame([("5",)], "k string")
        with pytest.raises(ValueError, match="dtype mismatch"):
            read_key_pruned(spark, root, bad)
        with pytest.raises(ValueError, match="dtype mismatch"):
            delete_matching(spark, root, bad, "k")

    def test_narrowing_value_dtype_refused(self, spark, tmp_path):
        root = self._table(spark, tmp_path)
        src = spark.createDataFrame(
            [(5, float("1e40"), "x")], "k long, v double, payload string"
        ).select("k", F.col("v").cast("double").alias("v"), "payload")
        # v double -> double is fine; force a double source against a
        # float target instead via a fresh narrow table
        root2 = str(tmp_path / "narrow")
        publish_bucketed(
            spark,
            _rows(spark, 0, 50).select(
                "k", F.col("v").cast("float").alias("v"), "payload"
            ),
            root2, "k", N_BUCKETS,
        )
        with pytest.raises(ValueError, match="dtype mismatch"):
            merge_version(spark, root2, src, "k")


def test_sorted_bucket_spec_composes_zone_maps(spark, tmp_path):
    """r13 composed layout: a sort-spec'd bucketed table prunes a
    point lookup TWICE — to the probed bucket's files by hash
    arithmetic, then to the matching sorted run by zone maps — with
    the IN-filter pushed to parquet for row-group skipping below
    that. Merge and dv-delete preserve both properties; compaction
    folds runs into one zone-tight file per bucket."""
    from trial_submission_studio_spark.io.bucketed_table import (
        append_bucketed,
        point_lookup_audit,
        read_point_lookup,
    )
    from trial_submission_studio_spark.io.deletion_vectors import (
        delete_matching_dv,
    )
    from trial_submission_studio_spark.io.versioned import compact_version

    root = str(tmp_path / "t")
    publish_bucketed(spark, _rows(spark, 0, 100), root, "k", 4,
                     sort_cols="k")
    append_bucketed(spark, _rows(spark, 100, 200), root)
    append_bucketed(spark, _rows(spark, 200, 300), root)
    m = read_manifest(root)
    assert len(m["files"]) == 12  # 4 buckets x 3 runs
    assert set(m["stats"]) == set(m["files"])  # zone maps on every file

    audit = point_lookup_audit(spark, root, [150])
    assert audit["files_total"] == 12
    assert audit["files_after_bucket_prune"] == 3  # one bucket's runs
    assert audit["files_read"] == 1  # zone maps pick the 100-199 run
    assert audit["total_prune_fraction"] > 0.9

    df = read_point_lookup(spark, root, [150])
    assert {tuple(r) for r in df.collect()} == {
        tuple(r) for r in _rows(spark, 150, 151).collect()
    }
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and (
        "In(k" in plan or "EqualTo(k" in plan
    )

    # merge preserves layout, sort, and zone-map continuity
    src = spark.createDataFrame(
        [(150, 9.9, "upd")], "k long, v double, payload string"
    )
    merge_version(spark, root, src, "k")
    audit = point_lookup_audit(spark, root, [150])
    assert audit["files_read"] <= 2  # fresh rewrite file got stats too
    got = {tuple(r) for r in read_point_lookup(spark, root, [150]).collect()}
    assert got == {(150, 9.9, "upd")}

    # dv-delete composes: tombstoned row vanishes from the lookup
    delete_matching_dv(
        spark, root, spark.createDataFrame([(250,)], "k long"), "k"
    )
    assert read_point_lookup(spark, root, [250]).count() == 0

    # compaction folds runs into one zone-tight file per bucket and
    # keeps both prunes working
    compact_version(spark, root, include_dv_files=True)
    m = read_manifest(root)
    assert len(m["files"]) == 4 and set(m["stats"]) == set(m["files"])
    audit = point_lookup_audit(spark, root, [42])
    assert audit["files_after_bucket_prune"] == 1
    assert audit["files_read"] == 1
    assert {tuple(r) for r in read_point_lookup(spark, root, [42]).collect()} \
        == {tuple(r) for r in _rows(spark, 42, 43).collect()}
    _assert_layout_consistent(spark, root)
