"""Incremental rollup maintenance (io/rollup.py): partials refresh
from file-list deltas only; final aggregates ≡ direct groupBy at
every base version; spec guard; audit counts."""

import os

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.io.merge import delete_matching, merge_version
from trial_submission_studio_spark.io.rollup import (
    read_rollup,
    refresh_rollup,
    rollup_status,
)
from trial_submission_studio_spark.io.versioned import (
    compact_version,
    new_data_dir,
    publish_version,
    read_version,
)

DIMS = ["lang"]
MEASURES = {
    "n": ("count", None),
    "chars": ("sum", "length"),
    "longest": ("max", "length"),
    "shortest": ("min", "length"),
    "mean_len": ("avg", "length"),
}


def _docs(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 3 = 0 THEN 'en' WHEN id % 3 = 1 THEN 'de' "
        "ELSE NULL END AS lang",
        # some NULL lengths exercise count/sum/avg null semantics
        "CASE WHEN id % 11 = 0 THEN NULL ELSE CAST(id % 97 AS LONG) END"
        " AS length",
    )


def _append(spark, root, lo, hi, base=None):
    d = new_data_dir(root)
    _docs(spark, lo, hi).repartition(2).write.parquet(d, mode="append")
    return publish_version(root, d, base_version=base)


def _direct(spark, root):
    df = (
        read_version(spark, root)
        .groupBy(*DIMS)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("length").alias("chars"),
            F.max("length").alias("longest"),
            F.min("length").alias("shortest"),
            F.avg("length").alias("mean_len"),
        )
    )
    return {tuple(r[d] for d in DIMS): r.asDict() for r in df.collect()}


def _materialized(spark, rroot):
    return {
        tuple(r[d] for d in DIMS): r.asDict()
        for r in read_rollup(spark, rroot).collect()
    }


def _assert_equal(spark, root, rroot):
    direct, mat = _direct(spark, root), _materialized(spark, rroot)
    assert set(direct) == set(mat)
    for k in direct:
        for m in ("n", "chars", "longest", "shortest"):
            assert direct[k][m] == mat[k][m], (k, m, direct[k], mat[k])
        if direct[k]["mean_len"] is None:
            assert mat[k]["mean_len"] is None
        else:
            assert abs(direct[k]["mean_len"] - mat[k]["mean_len"]) < 1e-9


def test_initial_build_and_append_refresh(spark, tmp_path):
    root, rroot = str(tmp_path / "base"), str(tmp_path / "roll")
    os.makedirs(root)
    m1 = _append(spark, root, 0, 300)
    r1 = refresh_rollup(spark, root, rroot, DIMS, MEASURES)
    assert r1["metadata"]["rollup"]["files_added"] == len(m1["files"])
    _assert_equal(spark, root, rroot)

    m2 = _append(spark, root, 300, 500, base=m1["version"])
    r2 = refresh_rollup(spark, root, rroot, DIMS, MEASURES)
    au = r2["metadata"]["rollup"]
    # ONLY the new files were scanned
    assert au["files_added"] == len(m2["files"]) - len(m1["files"])
    assert au["files_removed"] == 0
    assert au["base_version"] == m2["version"]
    _assert_equal(spark, root, rroot)


def test_refresh_is_idempotent(spark, tmp_path):
    root, rroot = str(tmp_path / "base"), str(tmp_path / "roll")
    os.makedirs(root)
    _append(spark, root, 0, 100)
    r1 = refresh_rollup(spark, root, rroot, DIMS, MEASURES)
    r2 = refresh_rollup(spark, root, rroot, DIMS, MEASURES)
    assert r2["version"] == r1["version"]  # no new commit


def test_refresh_after_merge_and_delete(spark, tmp_path):
    root, rroot = str(tmp_path / "base"), str(tmp_path / "roll")
    os.makedirs(root)
    _append(spark, root, 0, 400)
    refresh_rollup(spark, root, rroot, DIMS, MEASURES)

    src = spark.createDataFrame(
        [(5, "en", 9000), (401, "de", 7000)],
        "doc_id long, lang string, length long",
    )
    merge_version(spark, root, src, "doc_id")
    refresh_rollup(spark, root, rroot, DIMS, MEASURES)
    _assert_equal(spark, root, rroot)
    assert _materialized(spark, rroot)[("en",)]["longest"] == 9000

    doomed = spark.createDataFrame([(i,) for i in range(0, 100)],
                                   "doc_id long")
    delete_matching(spark, root, doomed, "doc_id")
    r = refresh_rollup(spark, root, rroot, DIMS, MEASURES)
    assert r["metadata"]["rollup"]["files_removed"] > 0
    _assert_equal(spark, root, rroot)


def test_refresh_after_full_rewrite_compaction(spark, tmp_path):
    """Compaction replaces every small file: removed = all old,
    added = all new — the additions-first ordering keeps the partial
    store non-empty throughout."""
    root, rroot = str(tmp_path / "base"), str(tmp_path / "roll")
    os.makedirs(root)
    m = _append(spark, root, 0, 100)
    _append(spark, root, 100, 200, base=m["version"])
    refresh_rollup(spark, root, rroot, DIMS, MEASURES)
    c = compact_version(spark, root, target_bytes=1 << 26)
    assert c["metadata"].get("compaction_of")  # it really compacted
    r = refresh_rollup(spark, root, rroot, DIMS, MEASURES)
    au = r["metadata"]["rollup"]
    assert au["files_removed"] > 0 and au["files_added"] > 0
    _assert_equal(spark, root, rroot)


def test_spec_drift_refused(spark, tmp_path):
    root, rroot = str(tmp_path / "base"), str(tmp_path / "roll")
    os.makedirs(root)
    _append(spark, root, 0, 50)
    refresh_rollup(spark, root, rroot, DIMS, MEASURES)
    with pytest.raises(ValueError, match="spec changed"):
        refresh_rollup(
            spark, root, rroot, DIMS, {"n": ("count", None)}
        )


def test_non_decomposable_measure_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="not decomposable"):
        refresh_rollup(
            spark, str(tmp_path), str(tmp_path / "r"), DIMS,
            {"d": ("count_distinct", "doc_id")},
        )


def test_rollup_status_and_time_travel(spark, tmp_path):
    root, rroot = str(tmp_path / "base"), str(tmp_path / "roll")
    os.makedirs(root)
    m1 = _append(spark, root, 0, 100)
    assert rollup_status(rroot) is None
    refresh_rollup(spark, root, rroot, DIMS, MEASURES)
    st = rollup_status(rroot)
    assert st["base_version"] == m1["version"]
    _append(spark, root, 100, 150, base=m1["version"])
    refresh_rollup(spark, root, rroot, DIMS, MEASURES)
    # the ROLLUP's own v1 still answers for base v1
    v1_total = sum(
        r.n for r in read_rollup(spark, rroot, version=1).collect()
    )
    assert v1_total == 100
    total = sum(r.n for r in read_rollup(spark, rroot).collect())
    assert total == 150


def test_approx_distinct_measure(spark, tmp_path):
    """HLL partials union across refreshes: the estimate over the
    incrementally-maintained store matches the estimate of a direct
    one-shot sketch (identical registers by associativity), and is
    within 2% of exact distinct."""
    root, rroot = str(tmp_path / "base"), str(tmp_path / "roll")
    os.makedirs(root)
    spec = {"users": ("approx_distinct", "doc_id"), "n": ("count", None)}
    m1 = _append(spark, root, 0, 400)
    refresh_rollup(spark, root, rroot, DIMS, spec)
    _append(spark, root, 400, 600, base=m1["version"])
    refresh_rollup(spark, root, rroot, DIMS, spec)
    got = {r.lang: r.users for r in read_rollup(spark, rroot).collect()}
    direct = {
        r.lang: r.users
        for r in read_version(spark, root)
        .groupBy("lang")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("doc_id")
            ).cast("long").alias("users")
        )
        .collect()
    }
    assert got == direct  # same registers -> identical estimate
    exact = {
        r.lang: r.d
        for r in read_version(spark, root)
        .groupBy("lang")
        .agg(F.countDistinct("doc_id").alias("d"))
        .collect()
    }
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(2, 0.02 * exact[k]), (k, est, exact[k])


def test_crash_between_append_and_retire_commits(spark, tmp_path, monkeypatch):
    """Kill the refresh between its two commits (fresh partials
    appended, removed files' partials NOT yet retired — the
    pending_removed state). The manifest must record the pending
    delete, read_rollup must still answer correctly (anti-filtering
    the stale partials), and the next refresh must heal the store so
    it matches a from-scratch rebuild."""
    import trial_submission_studio_spark.io.rollup as rollup_mod

    root, rroot = str(tmp_path / "base"), str(tmp_path / "roll")
    os.makedirs(root)
    m = _append(spark, root, 0, 200)
    _append(spark, root, 200, 300, base=m["version"])
    refresh_rollup(spark, root, rroot, DIMS, MEASURES)
    healthy_versions = rollup_status(rroot)

    # a compaction rewrites every file: the next refresh has both
    # adds and removes, i.e. exactly the two-commit shape
    compact_version(spark, root, target_bytes=1 << 26)

    real_retire = rollup_mod._retire_partials
    calls = {"n": 0}

    def _dying_retire(*a, **k):
        calls["n"] += 1
        raise RuntimeError("injected crash before the retire commit")

    monkeypatch.setattr(rollup_mod, "_retire_partials", _dying_retire)
    with pytest.raises(RuntimeError, match="injected crash"):
        refresh_rollup(spark, root, rroot, DIMS, MEASURES)
    assert calls["n"] == 1  # it died at the FINAL commit, not recovery

    # crashed state: pending recorded, base_version already advanced
    st = rollup_status(rroot)
    assert st["pending_removed"], "crash state must record pending delete"
    assert st["base_version"] > healthy_versions["base_version"]

    # reads of the crashed state are already correct: the stale
    # partials are anti-filtered by the manifest's pending list
    _assert_equal(spark, root, rroot)

    # the idempotency fence must NOT treat the pending state as done:
    # a recovered refresh retires the stale partials first
    monkeypatch.setattr(rollup_mod, "_retire_partials", real_retire)
    healed = refresh_rollup(spark, root, rroot, DIMS, MEASURES)
    assert "pending_removed" not in healed["metadata"]["rollup"]
    assert rollup_status(rroot)["pending_removed"] == []
    _assert_equal(spark, root, rroot)

    # healed store ≡ from-scratch rebuild, row for row
    rroot2 = str(tmp_path / "roll2")
    refresh_rollup(spark, root, rroot2, DIMS, MEASURES)
    assert _materialized(spark, rroot) == _materialized(spark, rroot2)

    # recovery is idempotent: another refresh is a pure no-op
    again = refresh_rollup(spark, root, rroot, DIMS, MEASURES)
    assert again["version"] == healed["version"]


def test_crash_recovery_survives_second_crash(spark, tmp_path, monkeypatch):
    """A crash DURING recovery (the retire raises again on the next
    refresh) leaves the store still-pending and still-readable; a
    third attempt heals it."""
    import trial_submission_studio_spark.io.rollup as rollup_mod

    root, rroot = str(tmp_path / "base"), str(tmp_path / "roll")
    os.makedirs(root)
    _append(spark, root, 0, 150)
    refresh_rollup(spark, root, rroot, DIMS, MEASURES)
    compact_version(spark, root, target_bytes=1 << 26)

    real_retire = rollup_mod._retire_partials

    def _dying_retire(*a, **k):
        raise RuntimeError("injected crash")

    monkeypatch.setattr(rollup_mod, "_retire_partials", _dying_retire)
    for _ in range(2):  # first refresh crashes; so does its recovery
        with pytest.raises(RuntimeError, match="injected crash"):
            refresh_rollup(spark, root, rroot, DIMS, MEASURES)
        assert rollup_status(rroot)["pending_removed"]
        _assert_equal(spark, root, rroot)  # reads stay correct

    monkeypatch.setattr(rollup_mod, "_retire_partials", real_retire)
    refresh_rollup(spark, root, rroot, DIMS, MEASURES)
    assert rollup_status(rroot)["pending_removed"] == []
    _assert_equal(spark, root, rroot)
