"""Corpus topic clustering + cluster-balanced sampling — the
"diversify the mix" curation stage.

Web crawls are topically lopsided (a few boilerplate-heavy genres
dominate); quality filters don't fix that — they keep good documents
of whatever topic is over-represented. The standard remedy is to
cluster the corpus in a cheap text-feature space and rebalance the
MIX across clusters (cluster-based balancing appears in the
SemDeDup/SSL-curation line of work and in production data recipes).

Pipeline shape, all JVM-side:

- features: hashed TF-IDF over word tokens
  (``pyspark.ml.feature.HashingTF`` + ``IDF`` — sparse vectors, no
  Python in the row path), L2-normalized so k-means' Euclidean
  objective matches cosine geometry;
- clustering: ``pyspark.ml.clustering.KMeans`` (Lloyd's in Scala,
  initMode k-means||), seeded for determinism;
- balancing: per-cluster quota via the existing
  ``sampling.cap_per_key`` (one shuffle, deterministic priority), or
  proportional target shares via ``rebalance_to_target``.

The model artifact is (k, num_features, centers) — KBs, persistable
with MLlib's own save/load.

Reference parity note: the reference engine
(rubentalstra/Trial-Submission-Studio) has no corpus surface; this
extends the sampling/curation family (SURVEY.md §2.13) beside DSIR
(`dsir.py` — match a target distribution; clustering balances
WITHIN a corpus without needing one).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "TopicClusters",
    "cluster_corpus",
    "assign_clusters",
    "cluster_balanced_sample",
    "cluster_summary",
]


@dataclass
class TopicClusters:
    """Fitted artifacts: hashed-TF-IDF config + the KMeans model."""

    num_features: int
    k: int
    idf_model: object  # pyspark.ml.feature.IDFModel
    kmeans_model: object  # pyspark.ml.clustering.KMeansModel


def _tf(df: DataFrame, text_col: str, num_features: int) -> DataFrame:
    from pyspark.ml.feature import HashingTF

    toks = df.withColumn(
        "__c_toks",
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
    )
    tf = HashingTF(
        inputCol="__c_toks", outputCol="__c_tf", numFeatures=int(num_features)
    )
    return tf.transform(toks).drop("__c_toks")


def cluster_corpus(
    df: DataFrame,
    text_col: str,
    k: int = 16,
    num_features: int = 1 << 16,
    seed: int = 7,
    max_iter: int = 20,
) -> TopicClusters:
    """Fit TF-IDF + k-means on the corpus (or a deterministic sample
    of it — pass the sample; centroid quality needs far fewer rows
    than assignment). Iterative by nature: ~max_iter passes over the
    cached feature frame, all JVM."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import IDF, Normalizer
    from pyspark.storagelevel import StorageLevel

    if k < 2:
        raise ValueError("k must be >= 2")
    tf = _tf(df, text_col, num_features)
    idf = IDF(inputCol="__c_tf", outputCol="__c_tfidf").fit(tf)
    feats = (
        Normalizer(inputCol="__c_tfidf", outputCol="__c_vec", p=2.0)
        .transform(idf.transform(tf))
        .select("__c_vec")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        km = KMeans(
            featuresCol="__c_vec",
            k=int(k),
            seed=int(seed),
            maxIter=int(max_iter),
        ).fit(feats)
    finally:
        feats.unpersist()
    return TopicClusters(
        num_features=int(num_features), k=int(k), idf_model=idf, kmeans_model=km
    )


def assign_clusters(
    df: DataFrame,
    model: TopicClusters,
    text_col: str,
    out_col: str = "cluster",
) -> DataFrame:
    """Adds the integer cluster id — a shuffle-free map-side
    transform (hash, idf scale, normalize, nearest centroid)."""
    from pyspark.ml.feature import Normalizer

    if out_col in df.columns:
        raise ValueError(
            f"column {out_col!r} already exists — the frame looks "
            "already assigned (pass out_col= to rename)"
        )

    tf = _tf(df, text_col, model.num_features)
    scaled = model.idf_model.transform(tf)
    vec = Normalizer(inputCol="__c_tfidf", outputCol="__c_vec", p=2.0).transform(
        scaled
    )
    km = model.kmeans_model.copy().setPredictionCol(out_col)
    return km.transform(vec).drop("__c_tf", "__c_tfidf", "__c_vec")


def cluster_balanced_sample(
    df: DataFrame,
    model: TopicClusters,
    text_col: str,
    id_col: str,
    cap_per_cluster: int,
    priority=None,
) -> DataFrame:
    """At most ``cap_per_cluster`` documents per topic cluster,
    deterministic priority (default: uniform hash draw; pass a
    quality-score column to keep the best of each topic). One
    shuffle — the same quota machinery as per-domain governance
    (``sampling.cap_per_key``)."""
    from trial_submission_studio_spark.operators.sampling import cap_per_key

    assigned = assign_clusters(df, model, text_col)
    return cap_per_key(
        assigned, "cluster", cap_per_cluster, id_col, priority=priority
    )


def cluster_summary(
    df: DataFrame, model: TopicClusters, text_col: str
) -> DataFrame:
    """Per-cluster ``(cluster, n_docs, share)`` — the mix-audit
    table (k rows; the share window is over a k-row aggregate, not
    the corpus)."""
    from pyspark.sql import Window

    assigned = assign_clusters(df, model, text_col)
    totals = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    return totals.withColumn(
        "share", F.col("n_docs") / F.sum("n_docs").over(Window.partitionBy())
    )
