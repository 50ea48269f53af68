"""Funnel + cohort retention (operators/funnel.py)."""

import datetime as dt

import pytest

from trial_submission_studio_spark.operators.funnel import (
    cohort_retention,
    funnel_counts,
    funnel_users,
)

from pyspark.sql import functions as F


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


@pytest.fixture(scope="module")
def events(spark):
    # u1: full view->click->buy; u2: click BEFORE view (must not count);
    # u3: view only; u4: converts but click is outside the 1h window
    data = [
        (1, _ts(1, 9, 0), "view"),
        (1, _ts(1, 9, 10), "click"),
        (1, _ts(1, 9, 20), "buy"),
        (2, _ts(1, 8, 0), "click"),
        (2, _ts(1, 9, 0), "view"),
        (3, _ts(1, 9, 0), "view"),
        (4, _ts(1, 9, 0), "view"),
        (4, _ts(1, 11, 0), "click"),
        (4, _ts(1, 11, 30), "buy"),
    ]
    return spark.createDataFrame(data, "user_id long, ts timestamp, ev string")


def STEPS():
    return [
        ("view", F.col("ev") == "view"),
        ("click", F.col("ev") == "click"),
        ("buy", F.col("ev") == "buy"),
    ]


def test_funnel_users_sequential_order(events):
    got = {
        r.user_id: (r.t_view, r.t_click, r.t_buy)
        for r in funnel_users(events, "user_id", "ts", STEPS()).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    assert got[1] == (_ts(1, 9, 0), _ts(1, 9, 10), _ts(1, 9, 20))
    # u2's click precedes the view -> step 2 not reached
    assert got[2] == (_ts(1, 9, 0), None, None)
    assert got[3] == (_ts(1, 9, 0), None, None)
    assert got[4] == (_ts(1, 9, 0), _ts(1, 11, 0), _ts(1, 11, 30))


def test_funnel_counts_monotone(events):
    rows = {
        r.step: r
        for r in funnel_counts(events, "user_id", "ts", STEPS()).collect()
    }
    assert [rows[s].n_users for s in ("view", "click", "buy")] == [4, 2, 2]
    assert rows["view"].step_idx == 1 and rows["buy"].step_idx == 3
    assert rows["view"].ts_us_sum == sum(
        int(_ts(1, 9, 0).replace(tzinfo=dt.timezone.utc).timestamp() * 1e6)
        for _ in range(4)
    )


def test_funnel_within_window(events):
    rows = {
        r.step: r.n_users
        for r in funnel_counts(
            events, "user_id", "ts", STEPS(), within_seconds=3600
        ).collect()
    }
    # u4's click at +2h falls outside the 1h window anchored at view
    assert rows == {"view": 4, "click": 1, "buy": 1}


def test_funnel_earliest_event_is_kept(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(1, 9), "a"),
            (1, _ts(1, 10), "b"),
            (1, _ts(2, 10), "b"),
        ],
        "user_id long, ts timestamp, ev string",
    )
    r = funnel_users(
        df,
        "user_id",
        "ts",
        [("a", F.col("ev") == "a"), ("b", F.col("ev") == "b")],
    ).collect()[0]
    assert r.t_b == _ts(1, 10)


def test_funnel_validation(events):
    with pytest.raises(ValueError):
        funnel_users(events, "user_id", "ts", [("only", F.col("ev") == "x")])
    with pytest.raises(ValueError):
        funnel_users(events, "user_id", "ts", STEPS()[:2] + [STEPS()[0]])
    with pytest.raises(ValueError):
        funnel_counts(events, "user_id", "ts", STEPS(), within_seconds=0)


def test_cohort_retention_day(spark):
    data = [
        (1, _ts(1)), (1, _ts(2)), (1, _ts(4)),
        (2, _ts(1)), (2, _ts(4)),
        (3, _ts(2)), (3, _ts(3)),
    ]
    df = spark.createDataFrame(data, "user_id long, ts timestamp")
    got = {
        (str(r.cohort), r.period_offset): (r.n_active, r.user_id_sum)
        for r in cohort_retention(df, "user_id", "ts", period="day").collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 3),   # users 1, 2
        ("2024-01-01", 1): (1, 1),
        ("2024-01-01", 3): (2, 3),
        ("2024-01-02", 0): (1, 3),   # user 3
        ("2024-01-02", 1): (1, 3),
    }


def test_cohort_retention_week_offsets(spark):
    # Mon 2024-01-01 cohort; activity next week -> offset 1
    df = spark.createDataFrame(
        [(1, _ts(3)), (1, _ts(10)), (1, _ts(17))],
        "user_id long, ts timestamp",
    )
    got = sorted(
        (str(r.cohort), r.period_offset, r.n_active)
        for r in cohort_retention(df, "user_id", "ts", period="week").collect()
    )
    assert got == [
        ("2024-01-01", 0, 1),
        ("2024-01-01", 1, 1),
        ("2024-01-01", 2, 1),
    ]


def test_cohort_retention_month(spark):
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 5)), (1, dt.datetime(2024, 3, 2))],
        "user_id long, ts timestamp",
    )
    got = sorted(
        (str(r.cohort), r.period_offset)
        for r in cohort_retention(df, "user_id", "ts", period="month").collect()
    )
    assert got == [("2024-01-01", 0), ("2024-01-01", 2)]
    with pytest.raises(ValueError):
        cohort_retention(df, "user_id", "ts", period="quarter")


def test_plans_are_join_agg_only(events):
    for q in (
        funnel_counts(events, "user_id", "ts", STEPS()),
        cohort_retention(events, "user_id", "ts", period="day"),
    ):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
