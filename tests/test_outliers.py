"""Group-wise outlier screens (operators/outliers.py)."""

import pytest

from trial_submission_studio_spark.operators.outliers import (
    flag_outliers,
    outlier_bounds,
    remove_outliers,
)

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def vals(spark):
    # group a: tight cluster + one spike; group b: wider spread
    rows = [("a", float(v)) for v in (10, 11, 12, 13, 100)] + [
        ("b", float(v)) for v in (0, 50, 100, 150, 200)
    ] + [("a", None)]
    return spark.createDataFrame(rows, "g string, v double")


def test_iqr_bounds_are_dataset_values(vals):
    b = {r.g: (r.lo, r.hi) for r in outlier_bounds(vals, "v", ["g"]).collect()}
    # group a sorted: 10 11 12 13 100 -> q1=11 (disc), q3=13, iqr=2
    assert b["a"] == (11 - 3.0, 13 + 3.0)
    # group b: q1=50, q3=150, iqr=100
    assert b["b"] == (50 - 150.0, 150 + 150.0)


def test_flag_and_remove_iqr(vals):
    flagged = {
        (r.g, r.v): r.is_outlier
        for r in flag_outliers(vals, "v", ["g"]).collect()
    }
    assert flagged[("a", 100.0)] is True
    assert flagged[("a", 10.0)] is False
    assert flagged[("a", None)] is False  # NULL never an outlier
    assert all(not flagged[("b", float(v))] for v in (0, 50, 100, 150, 200))
    kept = remove_outliers(vals, "v", ["g"])
    assert kept.count() == 10  # only the spike dropped; NULL kept
    assert kept.columns == vals.columns


def test_global_no_groups(spark):
    df = spark.createDataFrame([(float(v),) for v in range(100)] + [(1e6,)], "v double")
    assert remove_outliers(df, "v").count() == 100


def test_zscore_method(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in (0, 1, 0, -1, 0, 1, -1, 50)], "g string, v double"
    )
    flagged = {
        r.v: r.is_outlier for r in flag_outliers(df, "v", ["g"], method="zscore", k=2).collect()
    }
    assert flagged[50.0] is True and flagged[1.0] is False


def test_zscore_degenerate_single_row_flags_nothing(spark):
    df = spark.createDataFrame([("a", 5.0)], "g string, v double")
    assert flag_outliers(df, "v", ["g"], method="zscore").collect()[0].is_outlier is False


def test_null_group_rows_survive_and_get_fences(spark):
    rows = [(None, float(v)) for v in (10, 11, 12, 13, 100)] + [("a", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    flagged = flag_outliers(df, "v", ["g"])
    assert flagged.count() == 6
    got = {(r.g, r.v): r.is_outlier for r in flagged.collect()}
    assert got[(None, 100.0)] is True and got[(None, 12.0)] is False


def test_validation(vals):
    with pytest.raises(ValueError):
        outlier_bounds(vals, "v", method="mad")
    with pytest.raises(ValueError):
        outlier_bounds(vals, "v", k=0)


def test_plan_broadcast_join_no_window(vals):
    plan = (
        flag_outliers(vals, "v", ["g"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Window" not in plan and "CartesianProduct" not in plan
