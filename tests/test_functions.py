"""Scalar transform semantics — the reference's inline-test corpus
(FIXTURES.md F8) ported as the seed cases."""

import math

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.functions import (
    normalize_iso_datetime,
    parse_numeric,
    render_numeric,
    usubjid_prefix,
    bool_yn,
    qnam_autogen,
)
from trial_submission_studio_spark.functions.duration import normalize_duration_str
from trial_submission_studio_spark.functions.studyday import study_day


def _one(spark, expr, **cols):
    df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    return df.select(expr.alias("out")).first()["out"]


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("2024-01", "2024-01"),  # partial preserved (datetime.rs:322-326)
        ("2024", "2024"),
        ("2024-01-15", "2024-01-15"),
        ("01/15/2024", "2024-01-15"),  # US (datetime.rs:329-338)
        ("15/01/2024", "2024-01-15"),  # EU day-first fallback
        ("15-Jan-2024", "2024-01-15"),
        ("20240115", "2024-01-15"),
        ("15.01.2024", "2024-01-15"),
        ("Jan 2024", "2024-01"),
        ("2024-01-15 10:30", "2024-01-15T10:30"),
        ("2024-01-15T10:30", "2024-01-15T10:30"),
        ("01/15/2024 10:30:45", "2024-01-15T10:30:45"),
        ("invalid date", "invalid date"),  # verbatim (datetime.rs:341-345)
        ("2023-10-NK", "2023-10-NK"),
        ("2024-13-45", "2024-13-45"),  # out-of-range = not ISO = preserved
    ],
)
def test_iso_datetime(spark, raw, expected):
    assert _one(spark, normalize_iso_datetime(F.col("v")), v=raw) == expected


def test_iso_datetime_ambiguity_us_first(spark):
    # 05/03/1995 is ambiguous; the ladder resolves US month-first
    assert _one(spark, normalize_iso_datetime(F.col("v")), v="05/03/1995") == "1995-05-03"


def test_iso_ladder_bound_columns_not_cross_cached(spark):
    """Plan-bound Columns from different DataFrames stringify
    identically (Column<'x'>); a str-keyed cache would hand df1's
    attribute to df2 (AnalysisException MISSING_ATTRIBUTES). Column
    inputs must bypass the memo entirely."""
    df1 = spark.createDataFrame([("2024-01-15",)], "x string")
    df2 = spark.createDataFrame([("01/15/2024",), ("1999",)], "x string")
    out1 = [r[0] for r in df1.select(normalize_iso_datetime(df1["x"])).collect()]
    out2 = [r[0] for r in df2.select(normalize_iso_datetime(df2["x"])).collect()]
    assert out1 == ["2024-01-15"]
    assert sorted(out2) == ["1999", "2024-01-15"]


def test_iso_ladder_string_memo_reusable_across_frames_and_sessions(spark):
    """String-name inputs hit the memo; the unbound F.col tree must
    resolve correctly against any DataFrame with that column — and
    still compile in a sibling session of the same SparkContext."""
    from trial_submission_studio_spark.functions import datetime_iso as mod

    mod._LADDER_CACHE.clear()
    a = normalize_iso_datetime("v")
    b = normalize_iso_datetime("v")
    assert a is b  # memo hit
    df1 = spark.createDataFrame([("15/01/2024 10:30",)], "v string")
    df2 = spark.createDataFrame([("20240115",)], "v string")
    assert df1.select(a.alias("o")).collect()[0]["o"] == "2024-01-15T10:30"
    assert df2.select(a.alias("o")).collect()[0]["o"] == "2024-01-15"
    sib = spark.newSession()
    df3 = sib.createDataFrame([("Jan 2024",)], "v string")
    c = normalize_iso_datetime("v")
    assert c is a  # same SparkContext -> cache survives newSession
    assert df3.select(c.alias("o")).collect()[0]["o"] == "2024-01"


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("5", "P5D"),
        ("1.5", "P1DT12H"),
        ("0.5", "PT12H"),
        ("2 hours 30 minutes", "PT2H30M"),
        ("2 weeks", "P2W"),
        ("30min", "PT30M"),
        ("5d", "P5D"),
        ("2h", "PT2H"),
        ("P3Y6M4DT12H30M5S", "P3Y6M4DT12H30M5S"),
        ("p2w", "P2W"),  # ISO passthrough is upcased
        ("not a duration", "not a duration"),
        ("", ""),
    ],
)
def test_duration(raw, expected):
    assert normalize_duration_str(raw) == expected


def test_duration_none():
    assert normalize_duration_str(None) is None


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("1,234,567", 1234567.0),
        ("1.23e5", 123000.0),
        (" 123 ", 123.0),
        ("abc", None),
        ("", None),
    ],
)
def test_parse_numeric(spark, raw, expected):
    got = _one(spark, parse_numeric(F.col("v")), v=raw)
    assert got == expected


def test_parse_numeric_specials(spark):
    assert _one(spark, parse_numeric(F.col("v")), v="inf") == math.inf
    assert math.isnan(_one(spark, parse_numeric(F.col("v")), v="nan"))


@pytest.mark.parametrize(
    "value,expected",
    [(40.0, "40"), (1.5, "1.5"), (0.25, "0.25"), (-3.0, "-3"), (1234567.0, "1234567")],
)
def test_render_numeric(spark, value, expected):
    assert _one(spark, render_numeric(F.lit(value)), v="x") == expected


def test_usubjid_blank(spark):
    # empty SUBJID -> empty USUBJID, not 'STUDY-' (executor.rs:151-160)
    assert _one(spark, usubjid_prefix(F.col("v"), "STUDY"), v="  ") == ""
    assert _one(spark, usubjid_prefix(F.col("v"), "STUDY"), v=" S1 ") == "STUDY-S1"


def test_bool_yn(spark):
    df = spark.createDataFrame([(True,), (False,), (None,)], "v boolean")
    got = [r["out"] for r in df.select(bool_yn("v").alias("out")).collect()]
    assert got == ["Y", "N", None]


def test_qnam(spark):
    assert _one(spark, qnam_autogen(F.col("v")), v="ae_acns_other_long") == "AEACNSOT"


@pytest.mark.parametrize(
    "evt,ref,expected",
    [
        ("2024-01-10", "2024-01-10", 1),  # same day = day 1 (no day 0)
        ("2024-01-11", "2024-01-10", 2),
        ("2024-01-09", "2024-01-10", -1),  # day before = -1
        ("2024-01", "2024-01-10", None),  # partial event -> null
        ("2024-01-10", "2024-01", None),  # partial ref -> null
        ("garbage", "2024-01-10", None),
        ("2024-01-15T10:30", "2024-01-10", 6),  # time stripped
    ],
)
def test_study_day(spark, evt, ref, expected):
    df = spark.createDataFrame([(evt, ref)], "e string, r string")
    assert df.select(study_day("e", "r").alias("dy")).first()["dy"] == expected


# --- property tests (hypothesis) ----------------------------------------


def test_iso_ladder_properties(spark):
    """Properties over generated inputs: already-ISO partial-precision
    strings pass through UNCHANGED; garbage is preserved verbatim
    (never nulled, never mangled); every normalized output is either
    the trimmed input or a valid ISO partial-precision string."""
    import datetime
    import re

    from hypothesis import given, settings, strategies as st

    from trial_submission_studio_spark.functions.datetime_iso import (
        ISO_PARTIAL_RE,
        normalize_iso_datetime,
    )
    from trial_submission_studio_spark.sources.local import values_df

    iso_full = st.dates(
        min_value=datetime.date(1900, 1, 1), max_value=datetime.date(2099, 12, 31)
    ).map(lambda d: d.isoformat())
    iso_month = st.tuples(
        st.integers(1900, 2099), st.integers(1, 12)
    ).map(lambda t: f"{t[0]:04d}-{t[1]:02d}")
    iso_year = st.integers(1900, 2099).map(lambda y: f"{y:04d}")
    garbage = st.text(
        alphabet="XYZ@#?abc -", min_size=1, max_size=12
    ).filter(lambda s: s.strip() != "")
    cases = st.lists(
        st.one_of(iso_full, iso_month, iso_year, garbage), min_size=1, max_size=30
    )

    @settings(max_examples=15, deadline=None)
    @given(cases)
    def run(vals):
        df = values_df(spark, [(v,) for v in vals], "raw string")
        out = [
            r["o"]
            for r in df.select(
                normalize_iso_datetime(F.col("raw")).alias("o")
            ).collect()
        ]
        for inp, got in zip(vals, out):
            t = inp.strip()
            if re.fullmatch(ISO_PARTIAL_RE.strip("^$"), t):
                assert got == t, (inp, got)  # already-ISO passthrough
            else:
                assert got is not None
                # verbatim preservation OR a valid ISO normalization
                assert got == t or re.fullmatch(
                    ISO_PARTIAL_RE.strip("^$"), got
                ), (inp, got)

    run()


def test_parse_numeric_properties(spark):
    """Round-trip: any float rendered with thousands separators and
    whitespace parses back exactly; non-numeric text yields NULL."""
    from hypothesis import given, settings, strategies as st

    from trial_submission_studio_spark.functions.numeric import parse_numeric
    from trial_submission_studio_spark.sources.local import values_df

    nums = st.floats(
        allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
    )

    @settings(max_examples=15, deadline=None)
    @given(st.lists(nums, min_size=1, max_size=25), st.booleans())
    def run(vals, grouped):
        raws = []
        for v in vals:
            txt = repr(v)
            if grouped and "e" not in txt and "." in txt and len(txt) > 7:
                # insert a thousands separator into the integer part
                ip, fp = txt.split(".", 1)
                if len(ip.lstrip("-")) > 3:
                    ip = ip[:-3] + "," + ip[-3:]
                txt = f" {ip}.{fp} "
            raws.append(txt)
        df = values_df(
            spark, [(r, v) for r, v in zip(raws, vals)], "raw string, want double"
        )
        got = df.select(
            (parse_numeric(F.col("raw")) == F.col("want")).alias("ok")
        ).collect()
        assert all(r["ok"] for r in got), list(zip(raws, vals))[:3]

    run()
