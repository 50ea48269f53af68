"""Trainable quality classifier: weak-label bootstrap, train/score
separation, filter semantics."""

import pyspark.sql.functions as F
import pytest

from trial_submission_studio_spark.operators.qualitymodel import (
    quality_model_filter,
    quality_ngram_tokens,
    score_quality_model,
    train_quality_model,
    weak_quality_labels,
)

WORDS = (
    "the quick brown fox jumps over a lazy dog while many people walk "
    "through the old town square and talk about the weather in spring "
    "children play games near the river bank as boats drift slowly past "
    "the market where traders sell fresh bread fruit and warm coffee"
).split()

JUNK = ["@#$%&*!!", "zzzz", "###", "$$$$$", "%%^^&&", "!!!", "0101010101"]


def _good_doc(i: int) -> str:
    ws = [WORDS[(i * 7 + j) % len(WORDS)] for j in range(40)]
    return " ".join(ws) + "."


def _bad_doc(i: int) -> str:
    kind = i % 3
    if kind == 0:  # symbol soup
        return " ".join(JUNK[(i + j) % len(JUNK)] for j in range(12))
    if kind == 1:  # heavy line repetition
        line = f"buy now {JUNK[i % len(JUNK)]} click here"
        return "\n".join([line] * 10)
    return "ok"  # too short to carry any quality signal


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, _good_doc(i)) for i in range(40)] + [
        (100 + i, _bad_doc(i)) for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_weak_labels_confident_and_abstaining(spark, corpus):
    labels = {
        r["doc_id"]: r["label"]
        for r in weak_quality_labels(corpus, "doc_id", "text").collect()
    }
    good_ids = [i for i in range(40)]
    bad_ids = [100 + i for i in range(40)]
    assert sum(labels.get(i) == 1.0 for i in good_ids) >= 35
    assert sum(labels.get(i) == 0.0 for i in bad_ids) >= 35
    # nothing confidently mislabeled
    assert not any(labels.get(i) == 0.0 for i in good_ids)
    assert not any(labels.get(i) == 1.0 for i in bad_ids)


def test_train_on_weak_labels_generalizes_to_holdout(spark, corpus):
    labels = weak_quality_labels(corpus, "doc_id", "text")
    train = corpus.join(labels, "doc_id")
    model = train_quality_model(train, "text", num_features=1 << 12, max_iter=30)
    holdout = spark.createDataFrame(
        [(1000 + i, _good_doc(500 + i)) for i in range(10)]
        + [(2000 + i, _bad_doc(500 + i)) for i in range(10)],
        "doc_id long, text string",
    )
    scored = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality_model(holdout, model, "text").collect()
    }
    assert all(0.0 <= p <= 1.0 for p in scored.values())
    good_right = sum(scored[1000 + i] > 0.5 for i in range(10))
    bad_right = sum(scored[2000 + i] < 0.5 for i in range(10))
    assert good_right >= 9, scored
    assert bad_right >= 9, scored


def test_filter_keeps_schema_and_drops_bad(spark, corpus):
    labels = weak_quality_labels(corpus, "doc_id", "text")
    model = train_quality_model(
        corpus.join(labels, "doc_id"), "text", num_features=1 << 12, max_iter=30
    )
    kept = quality_model_filter(corpus, model, "text", min_prob=0.5)
    assert kept.columns == corpus.columns
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert sum(1 for i in ids if i < 100) >= 35
    assert sum(1 for i in ids if i >= 100) <= 5


def test_quality_ngram_tokens_unigrams_and_bigrams(spark):
    df = spark.createDataFrame([("The quick Fox",), ("solo",), ("",)], "text string")
    out = [r["t"] for r in df.select(
        quality_ngram_tokens("text").alias("t")).collect()]
    assert out[0] == ["the", "quick", "fox", "the_quick", "quick_fox"]
    assert out[1] == ["solo"]
    assert out[2] == []


def test_explicit_labels_path(spark):
    rows = [(i, _good_doc(i), 1.0) for i in range(20)] + [
        (100 + i, _bad_doc(i), 0.0) for i in range(20)
    ]
    labeled = spark.createDataFrame(rows, "doc_id long, text string, label double")
    model = train_quality_model(labeled, "text", num_features=1 << 12, max_iter=30)
    scored = score_quality_model(labeled, model, "text")
    agree = scored.filter(
        ((F.col("label") == 1.0) & (F.col("quality_prob") > 0.5))
        | ((F.col("label") == 0.0) & (F.col("quality_prob") < 0.5))
    ).count()
    assert agree >= 38
