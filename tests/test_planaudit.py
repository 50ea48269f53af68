"""Physical-plan audit API (operators/planaudit.py)."""

import pytest

from trial_submission_studio_spark.operators.planaudit import (
    assert_plan,
    plan_facts,
)

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    return (
        spark.read.parquet(f"{SF}/orders.parquet"),
        spark.read.parquet(f"{SF}/nation.parquet"),
    )


def test_facts_on_filtered_aggregate(spark, tables):
    orders, _ = tables
    q = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
    )
    f = plan_facts(q)
    assert f["shuffle_exchanges"] <= 1
    assert f["python_evals"] == 0 and not f["has_cartesian"]
    assert len(f["scans"]) == 1
    assert "o_orderstatus" in f["scans"][0]["pushed_filters"]
    # column pruning: only the three referenced columns reach the scan
    rs = f["scans"][0]["read_schema"]
    assert "o_totalprice" in rs and "o_orderdate" not in rs


def test_broadcast_join_counted(spark, tables):
    orders, nation = tables
    j = orders.join(
        F.broadcast(nation), orders["o_custkey"] % 25 == nation["n_nationkey"]
    )
    f = plan_facts(j)
    assert f["joins"].get("BroadcastHashJoin", 0) == 1
    assert f["broadcast_exchanges"] == 1
    assert_plan(j, require_broadcast_joins=1, max_shuffles=0)


def test_cartesian_detected_and_rejected(spark, tables):
    orders, nation = tables
    cj = orders.crossJoin(nation.hint("shuffle_replicate_nl"))
    f = plan_facts(cj)
    assert f["has_cartesian"]
    with pytest.raises(AssertionError, match="CartesianProduct"):
        assert_plan(cj)
    assert_plan(cj, forbid_cartesian=False)


def test_shuffle_bound_violation(spark, tables):
    orders, _ = tables
    q = orders.groupBy("o_custkey").count().orderBy("count")
    with pytest.raises(AssertionError, match="shuffle exchanges"):
        assert_plan(q, max_shuffles=0)
    assert_plan(q, max_shuffles=3)


def test_python_eval_bound(spark, tables):
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def plus_one(s: pd.Series) -> pd.Series:
        return s + 1.0

    orders, _ = tables
    q = orders.select(plus_one("o_totalprice").alias("p"))
    with pytest.raises(AssertionError, match="Python eval"):
        assert_plan(q)
    f = assert_plan(q, max_python_evals=1)
    assert f["python_evals"] == 1


def test_require_pushed_filters_catches_bare_scan(spark, tables):
    orders, _ = tables
    with pytest.raises(AssertionError, match="without pushed filters"):
        assert_plan(orders.select("o_orderkey"), require_pushed_filters=True)
    assert_plan(
        orders.filter(F.col("o_orderkey") > 100).select("o_orderkey"),
        require_pushed_filters=True,
    )
