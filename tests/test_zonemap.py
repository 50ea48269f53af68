"""Zone-map data skipping (io/zonemap.py): footer-stats harvest,
manifest pruning soundness (pruned read ≡ filtered full read, always),
skip effectiveness on clustered layouts, unknown-stats safety."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.io.versioned import (
    new_data_dir,
    read_manifest,
    read_version,
)
from trial_submission_studio_spark.io.zonemap import (
    collect_file_stats,
    predicate_to_column,
    prune_files,
    pruning_audit,
    publish_with_stats,
    read_pruned,
)


def _publish_ranges(spark, root, n_files=8, rows_per=100, columns=None):
    """n_files single-file runs, file i holding ids [i*rows, (i+1)*rows)
    -> tight zone maps on id and everything derived from it.

    Timestamps are written as TIMESTAMP_MICROS: Spark's default INT96
    carries no parquet statistics at all (zonemap then correctly
    never skips on that column — but here we want it stats'd)."""
    spark.conf.set(
        "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
    )
    os.makedirs(root, exist_ok=True)
    dirs = []
    for i in range(n_files):
        d = new_data_dir(root)
        (
            spark.range(i * rows_per, (i + 1) * rows_per)
            .selectExpr(
                "id",
                "CAST(id AS DOUBLE) / 10 AS score",
                "concat('doc-', lpad(CAST(id AS STRING), 6, '0')) AS name",
                "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id*3600) AS ts",
                "CASE WHEN id % 7 = 0 THEN NULL ELSE concat('t', id) END AS text",
            )
            .repartition(1)
            .write.parquet(d, mode="append")
        )
        dirs.append(d)
    return publish_with_stats(root, dirs, columns, spark=None)


PREDICATES = [
    [("id", ">=", 550)],
    [("id", "<", 120)],
    [("id", "between", (250, 260))],
    [("id", "=", 333)],
    [("score", ">", 69.9)],
    [("name", ">=", "doc-000700")],
    [("name", "=", "doc-000042")],
    [("ts", ">=", dt.datetime(2024, 1, 26))],
    [("id", "in", [5, 705])],
    [("text", "isnull"), ("id", "<", 100)],
    [("text", "isnotnull")],
    [("id", ">=", 100), ("id", "<", 200), ("score", "<", 15.0)],
    [("id", ">", 100000)],  # nothing matches; every file skippable
]


def test_stats_harvest_shape(spark, tmp_path):
    root = str(tmp_path / "t")
    m = _publish_ranges(spark, root, n_files=2)
    assert len(m["stats"]) == 2
    entry = m["stats"][sorted(m["stats"])[0]]
    assert entry["num_rows"] == 100
    c = entry["columns"]
    assert c["id"]["min"] in (0, 100) and c["id"]["t"] == "int"
    assert c["score"]["t"] == "float"
    assert c["name"]["t"] == "str"
    assert c["ts"]["t"] == "timestamp"
    assert c["text"]["nulls"] > 0


@pytest.mark.parametrize("pred", PREDICATES)
def test_pruned_read_equals_filtered_full_read(spark, tmp_path, pred):
    root = str(tmp_path / "t")
    _publish_ranges(spark, root)
    full = read_version(spark, root).filter(predicate_to_column(pred))
    pruned = read_pruned(spark, root, pred)
    assert sorted(r.id for r in pruned.select("id").collect()) == sorted(
        r.id for r in full.select("id").collect()
    )


def test_skipping_is_effective_on_clustered_layout(spark, tmp_path):
    root = str(tmp_path / "t")
    _publish_ranges(spark, root, n_files=8)
    a = pruning_audit(root, [("id", "between", (250, 260))])
    assert a["files_total"] == 8
    assert a["files_kept"] == 1  # ids 250-260 live in file 2 only
    assert a["files_skipped"] == 7
    assert a["rows_skipped_bound"] == 700
    # and the pruned plan really scans one file
    df = read_pruned(spark, root, [("id", "between", (250, 260))])
    assert df.count() == 11


def test_unknown_stats_never_skip(spark, tmp_path):
    """A snapshot published WITHOUT stats prunes nothing but still
    answers correctly."""
    from trial_submission_studio_spark.io.versioned import publish_version

    root = str(tmp_path / "t")
    os.makedirs(root)
    d = new_data_dir(root)
    spark.range(0, 50).selectExpr("id").repartition(1).write.parquet(
        d, mode="append"
    )
    publish_version(root, d)
    pred = [("id", "<", 5)]
    pruned = prune_files(read_manifest(root), pred)
    assert pruned["skipped"] == [] and len(pruned["kept"]) == 1
    assert read_pruned(spark, root, pred).count() == 5


def test_long_strings_drop_stat_for_safety(spark, tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    d = new_data_dir(root)
    (
        spark.range(0, 10)
        .selectExpr("id", "repeat('x', 200) AS blob")
        .repartition(1)
        .write.parquet(d, mode="append")
    )
    m = publish_with_stats(root, d)
    entry = next(iter(m["stats"].values()))
    assert "blob" not in entry["columns"]  # > MAX_STRING_STAT -> unknown
    assert "id" in entry["columns"]
    # and a predicate on the dropped column keeps the file
    assert prune_files(m, [("blob", "=", "zzz")])["skipped"] == []


def test_incremental_publish_carries_base_stats(spark, tmp_path):
    root = str(tmp_path / "t")
    m1 = _publish_ranges(spark, root, n_files=2)
    d = new_data_dir(root)
    spark.range(200, 300).selectExpr(
        "id",
        "CAST(id AS DOUBLE) / 10 AS score",
        "concat('doc-', lpad(CAST(id AS STRING), 6, '0')) AS name",
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id*3600) AS ts",
        "CASE WHEN id % 7 = 0 THEN NULL ELSE concat('t', id) END AS text",
    ).repartition(1).write.parquet(d, mode="append")
    m2 = publish_with_stats(root, d, base_version=m1["version"])
    assert len(m2["stats"]) == 3  # 2 carried + 1 fresh
    assert set(m1["stats"]) < set(m2["stats"])
    a = pruning_audit(root, [("id", ">=", 250)])
    assert a["files_kept"] == 1 and a["files_skipped"] == 2


def test_distributed_stats_identical(spark, tmp_path):
    root = str(tmp_path / "t")
    m = _publish_ranges(spark, root, n_files=4)
    files = m["files"]
    local = collect_file_stats(root, files)
    dist = collect_file_stats(
        root, files, spark=spark, distribute_threshold=0
    )
    assert local == dist


def test_column_subset_limits_manifest(spark, tmp_path):
    root = str(tmp_path / "t")
    m = _publish_ranges(spark, root, n_files=2, columns=["id"])
    entry = next(iter(m["stats"].values()))
    assert set(entry["columns"]) == {"id"}
    # un-stats'd column -> no skip; stats'd column -> skips
    assert prune_files(m, [("score", ">", 1e9)])["skipped"] == []
    assert len(prune_files(m, [("id", ">", 10**9)])["skipped"]) == 2


def test_merge_preserves_zone_maps(spark, tmp_path):
    """MERGE composition: kept files keep their stats entries
    verbatim, rewrite files get fresh ones on the same columns, and
    pruning still answers correctly on the merged snapshot."""
    from trial_submission_studio_spark.io.merge import merge_version

    root = str(tmp_path / "t")
    m1 = _publish_ranges(spark, root, n_files=4, columns=["id", "score"])
    src = spark.range(150, 160).selectExpr(
        "id",
        "CAST(-1 AS DOUBLE) AS score",
        "concat('doc-', lpad(CAST(id AS STRING), 6, '0')) AS name",
        "timestamp'2030-01-01 00:00:00' AS ts",
        "CAST(NULL AS STRING) AS text",
    )
    m2 = merge_version(spark, root, src, "id")
    assert m2["metadata"]["merge"]["files_rewritten"] == 1
    assert len(m2["stats"]) == len(m2["files"])
    carried = set(m1["files"]) & set(m2["files"])
    for f in carried:
        assert m2["stats"][f] == m1["stats"][f]
    fresh = set(m2["files"]) - set(m1["files"])
    for f in fresh:
        assert set(m2["stats"][f]["columns"]) <= {"id", "score"}
    # pruning on the merged snapshot: updated score=-1 rows must be
    # found, and files that can't hold score<0 must be skipped
    pred = [("score", "<", 0.0)]
    got = sorted(r.id for r in read_pruned(spark, root, pred).collect())
    assert got == list(range(150, 160))
    a = pruning_audit(root, pred)
    assert a["files_skipped"] >= 3


def test_optimize_zorder_tightens_zone_maps(spark, tmp_path):
    """OPTIMIZE ZORDER: a randomly-laid-out table prunes ~nothing;
    after optimize_version both clustered columns prune files. Rows
    identical, old version still time-travels."""
    from trial_submission_studio_spark.io.zonemap import optimize_version

    root = str(tmp_path / "t")
    os.makedirs(root)
    d = new_data_dir(root)
    # hash-scatter ids so every file spans the whole x/y range
    (
        spark.range(0, 4000)
        .selectExpr(
            "id",
            "CAST(xxhash64(id) % 1000 AS DOUBLE) AS x",
            "CAST(xxhash64(id + 7) % 1000 AS DOUBLE) AS y",
        )
        .repartition(8)
        .write.parquet(d, mode="append")
    )
    m1 = publish_with_stats(root, d, ["x", "y"])
    pred = [("x", "between", (-100.0, 0.0)), ("y", "between", (-100.0, 0.0))]
    before = pruning_audit(root, pred)
    assert before["files_skipped"] == 0  # scattered: no file excludable

    m2 = optimize_version(
        spark, root, {"x": (-1000.0, 1000.0), "y": (-1000.0, 1000.0)},
        num_partitions=8,
    )
    assert m2["metadata"]["optimize"]["zorder_by"] == ["x", "y"]
    after = pruning_audit(root, pred)
    assert after["files_skipped"] > 0
    assert after["files_total"] >= 8
    # correctness: same rows, pruned or not, and v1 still readable
    got = sorted(r.id for r in read_pruned(spark, root, pred).collect())
    want = sorted(
        r.id
        for r in read_version(spark, root, m1["version"])
        .filter(predicate_to_column(pred))
        .collect()
    )
    assert got == want and len(got) > 0
    assert read_version(spark, root, m1["version"]).count() == 4000
    assert read_version(spark, root).count() == 4000


# --- property test (hypothesis) -----------------------------------------


def test_pruning_soundness_over_random_stats_and_predicates():
    """THE zone-map invariant, fuzzed: whenever _file_might_match
    says False, NO row in the file satisfies the conjunct. (The
    reverse — keeping a file with no matching rows — is allowed and
    only costs speed.) Pure driver-side: stats entries are derived
    from explicit row sets exactly as the footer harvest would."""
    from hypothesis import given, settings, strategies as st

    from trial_submission_studio_spark.io.zonemap import _file_might_match

    values = st.one_of(
        st.none(),
        st.integers(-50, 50),
        st.floats(-50, 50, allow_nan=False, allow_infinity=False),
    )
    rows = st.lists(values, min_size=1, max_size=12)
    ops = st.sampled_from(["=", "<", "<=", ">", ">=", "in", "between",
                           "isnull", "isnotnull"])
    lits = st.one_of(
        st.integers(-60, 60),
        st.floats(-60, 60, allow_nan=False, allow_infinity=False),
    )

    def entry_for(vals):
        nn = [v for v in vals if v is not None]
        cols = {}
        if nn and all(isinstance(v, int) for v in nn):
            cols["x"] = {"t": "int", "min": min(nn), "max": max(nn),
                         "nulls": len(vals) - len(nn)}
        elif nn and all(isinstance(v, float) for v in nn):
            cols["x"] = {"t": "float", "min": min(nn), "max": max(nn),
                         "nulls": len(vals) - len(nn)}
        # mixed types or all-null -> unknown stats (harvest poisons)
        return {"num_rows": len(vals), "columns": cols}

    def row_matches(v, conj):
        op = conj[1]
        if op == "isnull":
            return v is None
        if op == "isnotnull":
            return v is not None
        if v is None:
            return False  # SQL comparison semantics
        if op == "in":
            return any(v == x for x in conj[2])
        if op == "between":
            return conj[2][0] <= v <= conj[2][1]
        return {
            "=": v == conj[2],
            "<": v < conj[2],
            "<=": v <= conj[2],
            ">": v > conj[2],
            ">=": v >= conj[2],
        }[op]

    @settings(max_examples=400, deadline=None)
    @given(rows, ops, lits, st.lists(lits, min_size=1, max_size=4),
           st.tuples(lits, lits))
    def run(vals, op, lit, inlist, between):
        if op == "in":
            conj = ("x", "in", inlist)
        elif op == "between":
            lo, hi = sorted(between)
            conj = ("x", "between", (lo, hi))
        elif op in ("isnull", "isnotnull"):
            conj = ("x", op)
        else:
            conj = ("x", op, lit)
        entry = entry_for(vals)
        if not _file_might_match(entry, conj):
            assert not any(row_matches(v, conj) for v in vals), (
                vals, conj, entry
            )

    run()


def test_all_match_soundness_over_random_stats_and_predicates():
    """The dual invariant for retention deletes, fuzzed: whenever
    _file_all_match says True, EVERY row in the file satisfies the
    conjunct (NULLs never satisfy anything but isnull). The reverse —
    failing to prove a fully-matching file — only costs a row-level
    pass, never rows."""
    from hypothesis import given, settings, strategies as st

    from trial_submission_studio_spark.io.zonemap import _file_all_match

    values = st.one_of(
        st.none(),
        st.integers(-50, 50),
        st.floats(-50, 50, allow_nan=False, allow_infinity=False),
    )
    rows = st.lists(values, min_size=1, max_size=12)
    ops = st.sampled_from(["=", "<", "<=", ">", ">=", "in", "between",
                           "isnull", "isnotnull"])
    lits = st.one_of(
        st.integers(-60, 60),
        st.floats(-60, 60, allow_nan=False, allow_infinity=False),
    )

    def entry_for(vals):
        nn = [v for v in vals if v is not None]
        cols = {}
        if nn and all(isinstance(v, int) for v in nn):
            cols["x"] = {"t": "int", "min": min(nn), "max": max(nn),
                         "nulls": len(vals) - len(nn)}
        elif nn and all(isinstance(v, float) for v in nn):
            cols["x"] = {"t": "float", "min": min(nn), "max": max(nn),
                         "nulls": len(vals) - len(nn)}
        return {"num_rows": len(vals), "columns": cols}

    def row_matches(v, conj):
        op = conj[1]
        if op == "isnull":
            return v is None
        if op == "isnotnull":
            return v is not None
        if v is None:
            return False
        if op == "in":
            return any(v == x for x in conj[2])
        if op == "between":
            return conj[2][0] <= v <= conj[2][1]
        return {
            "=": v == conj[2],
            "<": v < conj[2],
            "<=": v <= conj[2],
            ">": v > conj[2],
            ">=": v >= conj[2],
        }[op]

    @settings(max_examples=400, deadline=None)
    @given(rows, ops, lits, st.lists(lits, min_size=1, max_size=4),
           st.tuples(lits, lits))
    def check(vals, op, lit, inlist, pair):
        if op == "in":
            conj = ("x", "in", inlist)
        elif op == "between":
            a, b = sorted(pair)
            conj = ("x", "between", (a, b))
        elif op in ("isnull", "isnotnull"):
            conj = ("x", op)
        else:
            conj = ("x", op, lit)
        entry = entry_for(vals)
        if _file_all_match(entry, conj):
            assert all(row_matches(v, conj) for v in vals), (vals, conj)

    check()
