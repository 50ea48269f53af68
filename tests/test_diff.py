"""Row-level snapshot diff (operators/diff.py)."""

import pytest

from trial_submission_studio_spark.operators.diff import (
    column_change_counts,
    row_digest,
    snapshot_diff,
    snapshot_diff_summary,
)

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def frames(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "b", 20),
            (3, "c", 30),
            (4, None, 40),
            (5, "e", None),
        ],
        "id long, s string, v int",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),       # unchanged
            (2, "B", 20),       # changed (s)
            (4, None, 41),      # changed (v)
            (5, "e", None),     # unchanged (NULL == NULL)
            (6, "f", 60),       # added
        ],                       # 3 removed
        "id long, s string, v int",
    )
    return old, new


@pytest.mark.parametrize("digest", ["xxhash64", "md5"])
def test_snapshot_diff_classification(frames, digest):
    old, new = frames
    got = {
        r.id: r.change_type
        for r in snapshot_diff(old, new, ["id"], digest=digest).collect()
    }
    assert got == {2: "changed", 3: "removed", 4: "changed", 6: "added"}


def test_include_unchanged(frames):
    old, new = frames
    got = {
        r.id: r.change_type
        for r in snapshot_diff(
            old, new, ["id"], include_unchanged=True
        ).collect()
    }
    assert got[1] == "unchanged" and got[5] == "unchanged" and len(got) == 6


def test_compare_subset_ignores_other_columns(frames):
    old, new = frames
    got = {
        r.id: r.change_type
        for r in snapshot_diff(old, new, ["id"], compare_cols=["v"]).collect()
    }
    # s-only change on id=2 is invisible when only v is compared
    assert got == {3: "removed", 4: "changed", 6: "added"}


def test_include_values(frames):
    old, new = frames
    rows = {
        r.id: r
        for r in snapshot_diff(
            old, new, ["id"], include_values=True
        ).collect()
    }
    assert rows[6].s == "f" and rows[6].v == 60          # added: new values
    assert rows[2].s == "B"                              # changed: new values
    assert rows[3].s_old == "c" and rows[3].v_old == 30  # removed: old values
    assert rows[3].s is None
    assert rows[2].s_old is None                         # _old only on removed


def test_summary_counts(frames):
    old, new = frames
    r = snapshot_diff_summary(old, new, ["id"]).collect()[0]
    assert tuple(r) == (1, 1, 2, 2, 5, 5)


def test_summary_empty_sides(spark):
    e = spark.createDataFrame([], "id long, v int")
    f = spark.createDataFrame([(1, 1)], "id long, v int")
    r = snapshot_diff_summary(e, f, ["id"]).collect()[0]
    assert (r.n_added, r.n_removed, r.n_old, r.n_new) == (1, 0, 0, 1)


def test_column_change_counts(frames):
    old, new = frames
    r = column_change_counts(old, new, ["id"]).collect()[0]
    assert (r.chg_s, r.chg_v) == (1, 1)


def test_md5_digest_null_tagging(spark):
    # (NULL, "") must not collide with ("", NULL)
    a = spark.createDataFrame([(1, None, "")], "id long, x string, y string")
    b = spark.createDataFrame([(1, "", None)], "id long, x string, y string")
    got = snapshot_diff(a, b, ["id"], digest="md5").collect()
    assert [r.change_type for r in got] == ["changed"]


def test_validation(frames):
    old, new = frames
    with pytest.raises(ValueError):
        snapshot_diff(old, new, [])
    with pytest.raises(ValueError):
        snapshot_diff(old, new, ["id"], compare_cols=[])
    with pytest.raises(ValueError):
        snapshot_diff(old, new, ["id"], compare_cols=["id", "v"])
    with pytest.raises(ValueError):
        snapshot_diff(old, new, ["id"], digest="sha1")
    with pytest.raises(ValueError):
        row_digest([])


def test_plan_digest_before_join(frames):
    """The full-outer join must carry digests, not wide rows: both
    join children project to key + one hash column."""
    old, new = frames
    plan = (
        snapshot_diff(old, new, ["id"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "xxhash64" in plan
    assert "CartesianProduct" not in plan
    # neither compared column survives below the join
    import re

    join_part = plan.split("Join", 1)[1]
    assert re.search(r"\bs#\d+ ASC", join_part) is None


def test_versioned_roundtrip_integration(spark, tmp_path):
    """End-to-end with io/versioned time travel: publish v1, publish
    v2 with edits, diff the two read_version loads."""
    from trial_submission_studio_spark.io.versioned import (
        new_data_dir,
        publish_version,
        read_version,
    )

    root = str(tmp_path / "tbl")
    v1 = spark.range(0, 10).withColumn("val", F.col("id") * 2)
    d1 = new_data_dir(root)
    v1.coalesce(1).write.mode("overwrite").parquet(d1)
    publish_version(root, d1)
    v2 = (
        spark.range(2, 12)
        .withColumn("val", F.when(F.col("id") == 5, 99).otherwise(F.col("id") * 2))
    )
    d2 = new_data_dir(root)
    v2.coalesce(1).write.mode("overwrite").parquet(d2)
    publish_version(root, d2)
    old = read_version(spark, root, 1)
    new = read_version(spark, root, 2)
    s = snapshot_diff_summary(old, new, ["id"]).collect()[0]
    assert (s.n_added, s.n_removed, s.n_changed, s.n_unchanged) == (2, 2, 1, 7)


def test_property_diff_recovers_planted_mutations(spark):
    """Property: for ANY base table and disjoint removed/changed/
    added key sets, snapshot_diff classifies exactly those keys."""
    from hypothesis import given, settings, strategies as st

    ids = st.lists(st.integers(0, 40), min_size=1, max_size=25, unique=True)

    @settings(max_examples=8, deadline=None)
    @given(
        ids,
        st.sets(st.integers(0, 40), max_size=8),      # removed ∩ base
        st.sets(st.integers(0, 40), max_size=8),      # changed ∩ base
        st.sets(st.integers(41, 60), max_size=5),     # added (disjoint)
    )
    def run(base_ids, rm, chg, add):
        rm = rm & set(base_ids)
        chg = (chg & set(base_ids)) - rm
        old_rows = [(i, f"v{i}") for i in base_ids]
        new_rows = (
            [(i, f"v{i}") for i in base_ids if i not in rm and i not in chg]
            + [(i, f"CHANGED{i}") for i in sorted(chg)]
            + [(i, f"v{i}") for i in sorted(add)]
        )
        old = spark.createDataFrame(old_rows, "id long, s string")
        new = spark.createDataFrame(new_rows, "id long, s string")
        got = {
            r.id: r.change_type
            for r in snapshot_diff(old, new, ["id"]).collect()
        }
        want = (
            {i: "removed" for i in rm}
            | {i: "changed" for i in chg}
            | {i: "added" for i in add}
        )
        assert got == want

    run()
