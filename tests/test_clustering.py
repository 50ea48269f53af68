"""Topic clustering + cluster-balanced sampling tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.operators.clustering import (
    assign_clusters,
    cluster_balanced_sample,
    cluster_corpus,
    cluster_summary,
)

TOPIC_A = "quantum physics relativity measurement theory experiment"
TOPIC_B = "recipe butter flour sugar oven baking dessert"


def _corpus(spark, n_a=80, n_b=20):
    rows = [(i, f"{TOPIC_A} alpha{i % 7}") for i in range(n_a)] + [
        (1000 + i, f"{TOPIC_B} beta{i % 5}") for i in range(n_b)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def fitted(spark):
    docs = _corpus(spark)
    return docs, cluster_corpus(docs, "text", k=2, num_features=1 << 12)


def test_clusters_separate_planted_topics(spark, fitted):
    docs, model = fitted
    assigned = assign_clusters(docs, model, "text")
    by_topic = (
        assigned.withColumn("topic", (F.col("doc_id") < 1000).cast("int"))
        .groupBy("topic", "cluster")
        .count()
        .collect()
    )
    # each topic maps (almost) entirely to one cluster, and the two
    # topics get different clusters
    dominant = {}
    for r in by_topic:
        cur = dominant.get(r["topic"], (None, 0))
        if r["count"] > cur[1]:
            dominant[r["topic"]] = (r["cluster"], r["count"])
    assert dominant[0][0] != dominant[1][0]
    assert dominant[0][1] >= 18 and dominant[1][1] >= 72


def test_assignment_is_deterministic_and_shuffle_free(spark, fitted):
    docs, model = fitted
    a = assign_clusters(docs.repartition(3), model, "text")
    b = assign_clusters(docs.repartition(11), model, "text")
    assert sorted((r["doc_id"], r["cluster"]) for r in a.collect()) == sorted(
        (r["doc_id"], r["cluster"]) for r in b.collect()
    )
    # the assignment adds no hash shuffle of its own: the only
    # Exchange in the plan is the explicit round-robin repartition
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan


def test_cluster_balanced_sample_caps_majority(spark, fitted):
    docs, model = fitted
    capped = cluster_balanced_sample(
        docs, model, "text", "doc_id", cap_per_cluster=15
    )
    counts = capped.groupBy("cluster").count().collect()
    assert all(r["count"] <= 15 for r in counts)
    assert capped.count() <= 30
    # priority override: keep highest doc_id per cluster
    best = cluster_balanced_sample(
        docs, model, "text", "doc_id", cap_per_cluster=1,
        priority=-F.col("doc_id"),
    )
    ids = sorted(r["doc_id"] for r in best.collect())
    assert 79 in ids or 1019 in ids  # a maximal id from one topic


def test_cluster_summary_shares(spark, fitted):
    docs, model = fitted
    s = {r["cluster"]: r for r in cluster_summary(docs, model, "text").collect()}
    assert sum(r["n_docs"] for r in s.values()) == 100
    assert abs(sum(r["share"] for r in s.values()) - 1.0) < 1e-9


def test_k_validation(spark, fitted):
    docs, _ = fitted
    with pytest.raises(ValueError):
        cluster_corpus(docs, "text", k=1)
