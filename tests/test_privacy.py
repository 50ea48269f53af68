"""k-anonymity / l-diversity audit (operators/privacy.py)."""

import pytest

from tests.conftest import rows
from trial_submission_studio_spark.operators.privacy import (
    equivalence_class_sizes,
    generalize_band,
    k_anonymity_report,
    suppress_below_k,
)

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def release(spark):
    # (zip, age_band, sex, diagnosis): classes of size 3 / 2 / 1 / 1,
    # one class sensitive-homogeneous, one NULL-keyed class
    data = [
        ("02139", 30, "F", "flu"),
        ("02139", 30, "F", "cold"),
        ("02139", 30, "F", "flu"),
        ("02139", 40, "M", "flu"),
        ("02139", 40, "M", "flu"),
        ("94110", 30, "F", "cold"),
        (None, 40, "M", "flu"),
    ]
    return spark.createDataFrame(data, "zip string, age int, sex string, dx string")


def test_equivalence_class_sizes(release):
    got = [
        tuple(r)
        for r in equivalence_class_sizes(release, ["zip", "age", "sex"]).collect()
    ]
    assert sorted(got, key=str) == sorted(
        [
            ("02139", 30, "F", 3),
            ("02139", 40, "M", 2),
            ("94110", 30, "F", 1),
            (None, 40, "M", 1),
        ],
        key=str,
    )


def test_report_counts(release):
    r = k_anonymity_report(
        release, ["zip", "age", "sex"], k=2, sensitive_col="dx"
    ).collect()[0]
    assert r.n_rows == 7
    assert r.n_classes == 4
    assert r.k_anonymity == 1
    assert r.n_classes_below_k == 2
    assert r.n_rows_below_k == 2
    assert r.n_unique_rows == 2
    # class (02139,40,M) holds {flu} only; the two singletons too
    assert r.l_diversity == 1
    assert r.n_homogeneous_classes == 3


def test_report_without_sensitive(release):
    r = k_anonymity_report(release, ["zip"], k=3)
    assert "l_diversity" not in r.columns
    row = r.collect()[0]
    # zip classes: 02139 x5, 94110 x1, NULL x1
    assert (row.n_classes, row.k_anonymity, row.n_rows_below_k) == (3, 1, 2)


def test_suppress_below_k_reaches_k(release):
    kept = suppress_below_k(release, ["zip", "age", "sex"], k=2)
    assert kept.count() == 5
    after = k_anonymity_report(kept, ["zip", "age", "sex"], k=2).collect()[0]
    assert after.k_anonymity >= 2
    assert after.n_rows_below_k == 0
    assert kept.columns == release.columns


def test_suppress_k1_is_identity(release):
    assert suppress_below_k(release, ["zip"], k=1).count() == release.count()


def test_generalize_band(spark):
    df = spark.createDataFrame(
        [(34,), (30,), (29,), (None,)], "age int"
    ).select(generalize_band("age", 5).alias("b"))
    assert sorted((r.b for r in df.collect()), key=str) == [25, 30, 30, None]
    banded = spark.createDataFrame([(34,), (36,), (31,)], "age int")
    r = k_anonymity_report(
        banded.select(generalize_band("age", 10).alias("age_band")),
        ["age_band"],
    ).collect()[0]
    assert (r.n_classes, r.k_anonymity) == (1, 3)


def test_validation_errors(release):
    with pytest.raises(ValueError):
        k_anonymity_report(release, [])
    with pytest.raises(ValueError):
        k_anonymity_report(release, ["zip"], k=0)
    with pytest.raises(ValueError):
        suppress_below_k(release, ["zip"], k=0)
    with pytest.raises(ValueError):
        generalize_band("age", 0)


def test_report_plan_shape(release):
    """No joins/cartesians anywhere; the sensitive-free report is two
    agg levels over ONE shuffle of the input, and countDistinct adds
    at most one more (the (quasi, sensitive)-grain pre-aggregation)."""
    base = k_anonymity_report(
        release, ["zip", "age", "sex"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in base and "Join" not in base
    assert base.count("Exchange hashpartitioning") <= 1
    sens = k_anonymity_report(
        release, ["zip", "age", "sex"], sensitive_col="dx"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in sens and "Join" not in sens
    assert sens.count("Exchange hashpartitioning") <= 2
