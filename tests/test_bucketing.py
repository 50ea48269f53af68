"""Bucketed co-located joins (operators/bucketing.py)."""

import uuid

import pytest

from trial_submission_studio_spark.operators.bucketing import (
    is_exchange_free_join,
    read_bucketed,
    write_bucketed,
)

from pyspark.sql import functions as F


@pytest.fixture()
def no_broadcast(spark):
    """Force the big-table join regime (SMJ): at real scale neither
    side broadcasts, which is exactly when bucketing pays."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.fixture()
def tables(spark, tmp_path):
    """Two bucketed tables sharing key + bucket count; dropped after."""
    names = [f"t_{uuid.uuid4().hex[:8]}" for _ in range(2)]
    a = spark.range(0, 1000).withColumn("va", F.col("id") * 2)
    b = spark.range(0, 1000).withColumn("vb", F.col("id") % 7)
    write_bucketed(a, names[0], ["id"], 4, sort_cols=["id"], path=str(tmp_path / "a"))
    write_bucketed(b, names[1], ["id"], 4, sort_cols=["id"], path=str(tmp_path / "b"))
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_has_no_exchange(spark, tables, no_broadcast):
    a, b = (read_bucketed(spark, n) for n in tables)
    j = a.join(b, "id")
    assert is_exchange_free_join(j)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "Bucketed: true" in plan
    assert j.count() == 1000
    assert j.filter(F.col("id") == 10).collect()[0].va == 20


def test_unbucketed_same_join_shuffles(spark, tmp_path, no_broadcast):
    a = spark.range(0, 1000).withColumn("va", F.col("id") * 2)
    b = spark.range(0, 1000).withColumn("vb", F.col("id") % 7)
    pa, pb = str(tmp_path / "ua"), str(tmp_path / "ub")
    a.write.parquet(pa)
    b.write.parquet(pb)
    j = spark.read.parquet(pa).join(spark.read.parquet(pb), "id")
    assert not is_exchange_free_join(j)


def test_sorted_buckets_drop_the_sort_under_legacy_flag(spark, tables, no_broadcast):
    """sortBy pays off fully only with
    spark.sql.legacy.bucketedTableScan.outputOrdering=true (off by
    default since Spark 3.0 — SPARK-28632 traded the ordering for
    cheaper planning); with it, the one-file-per-bucket sorted
    layout written by write_bucketed removes the SMJ's Sorts too."""
    key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    spark.conf.set(key, "true")
    try:
        a, b = (read_bucketed(spark, n) for n in tables)
        plan = (
            a.join(b, "id")._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" in plan
        assert not any(
            line.lstrip(" :+-").startswith("Sort ")
            for line in plan.splitlines()
        )
    finally:
        spark.conf.set(key, "false")


def test_bucketed_groupby_skips_exchange(spark, tables):
    a = read_bucketed(spark, tables[0])
    agg = a.groupBy("id").agg(F.sum("va").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bucket_count_mismatch_reshuffles_one_side(spark, tmp_path, tables, no_broadcast):
    c = f"t_{uuid.uuid4().hex[:8]}"
    write_bucketed(
        spark.range(0, 1000).withColumn("vc", F.lit(1)),
        c,
        ["id"],
        3,  # != 4 and does not divide it
        path=str(tmp_path / "c"),
    )
    try:
        j = read_bucketed(spark, tables[0]).join(read_bucketed(spark, c), "id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert not is_exchange_free_join(j)  # one side re-shuffles
        assert j.count() == 1000
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {c}")


def test_direct_path_read_loses_bucketing(spark, tables, tmp_path, no_broadcast):
    # reading the same files without the catalog -> exchange returns
    a = spark.read.parquet(str(tmp_path / "a"))
    b = spark.read.parquet(str(tmp_path / "b"))
    assert not is_exchange_free_join(a.join(b, "id"))


def test_validation(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        write_bucketed(df, "x", [], 4)
    with pytest.raises(ValueError):
        write_bucketed(df, "x", ["id"], 0)
