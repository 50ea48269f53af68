"""Declarative expectations engine (operators/expectations.py)."""

import pytest

from trial_submission_studio_spark.operators.expectations import (
    expect,
    violations,
)


@pytest.fixture(scope="module")
def table(spark):
    data = [
        (1, "A", 10, "x-1", 100),
        (2, "B", -5, "x-2", 100),     # in_range low
        (3, None, 20, "x-3", 200),    # not_null s
        (4, "Z", 30, "bad", 300),     # accepted_values + regex
        (5, "A", None, "x-5", 999),   # fk orphan (999)
        (5, "A", 50, "x-6", 100),     # duplicate id 5
    ]
    return spark.createDataFrame(data, "id long, s string, v int, code string, fk long")


@pytest.fixture(scope="module")
def ref(spark):
    return spark.createDataFrame([(100,), (200,), (300,)], "rid long")


def SPEC(ref):
    return [
        {"check": "not_null", "col": "s"},
        {"check": "accepted_values", "col": "s", "values": ["A", "B"]},
        {"check": "in_range", "col": "v", "min": 0, "max": 100},
        {"check": "matches_regex", "col": "code", "pattern": "^x-[0-9]+$"},
        {"check": "expression", "name": "v_lt_fk", "expr": "v < fk"},
        {"check": "unique", "cols": ["id"]},
        {"check": "foreign_key", "col": "fk", "ref": ref, "ref_col": "rid"},
    ]


def test_summary_counts(table, ref):
    got = {
        r.check: (r.check_idx, r.n_violations, r.n_rows)
        for r in expect(table, SPEC(ref)).collect()
    }
    assert got == {
        "not_null(s)": (1, 1, 6),
        "accepted_values(s)": (2, 1, 6),
        "in_range(v)": (3, 1, 6),
        "matches_regex(code)": (4, 1, 6),
        # NULL predicate (v NULL) counts as a violation: rows 5a
        "v_lt_fk": (5, 1, 6),
        "unique(id)": (6, 2, 6),
        "foreign_key(fk)": (7, 1, 6),
    }


def test_green_table_all_zero_rows_present(spark, ref):
    clean = spark.createDataFrame([(1, "A", 5, "x-9", 100)],
                                  "id long, s string, v int, code string, fk long")
    rows = expect(clean, SPEC(ref)).collect()
    assert len(rows) == 7 and all(r.n_violations == 0 for r in rows)


def test_violations_rows(table, ref):
    assert [r.id for r in violations(table, {"check": "not_null", "col": "s"}).collect()] == [3]
    assert sorted(
        r.code for r in violations(table, {"check": "unique", "cols": ["id"]}).collect()
    ) == ["x-5", "x-6"]
    assert [
        r.fk
        for r in violations(
            table, {"check": "foreign_key", "col": "fk", "ref": ref, "ref_col": "rid"}
        ).collect()
    ] == [999]
    assert violations(table, {"check": "in_range", "col": "v", "min": 0}).count() == 1


def test_null_semantics(spark):
    df = spark.createDataFrame([(None,)], "v int")
    assert expect(df, [{"check": "accepted_values", "col": "v", "values": [1]}]).collect()[0].n_violations == 0
    assert expect(df, [{"check": "in_range", "col": "v", "min": 0}]).collect()[0].n_violations == 0
    assert expect(df, [{"check": "matches_regex", "col": "v", "pattern": "x"}]).collect()[0].n_violations == 0


def test_unique_composite_and_null_keys(spark):
    df = spark.createDataFrame(
        [(1, None), (1, None), (1, 2), (2, 2)], "a long, b long"
    )
    r = expect(df, [{"check": "unique", "cols": ["a", "b"]}]).collect()[0]
    assert r.n_violations == 2  # the two (1, NULL) rows group together


def test_row_local_checks_are_one_aggregation(table, ref):
    """All five row-local checks fold into ONE pass: exactly one
    aggregate over the base table (plus the n_rows count)."""
    spec = [e for e in SPEC(ref) if e["check"] not in ("unique", "foreign_key")]
    plan = expect(table, spec)._jdf.queryExecution().optimizedPlan().toString()
    import re

    assert len(re.findall(r"Aggregate", plan)) <= 2  # one-pass + n_rows


def test_validation_errors(table, ref):
    with pytest.raises(ValueError):
        expect(table, [])
    with pytest.raises(ValueError):
        expect(table, [{"check": "sorted", "col": "v"}])
    with pytest.raises(ValueError):
        expect(table, [{"check": "in_range", "col": "v"}])
    with pytest.raises(ValueError):
        expect(
            table,
            [{"check": "not_null", "col": "s"}, {"check": "not_null", "col": "s"}],
        )
