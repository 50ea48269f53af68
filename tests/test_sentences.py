"""Sentence segmentation + sentence-boundary chunking tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.operators.sentences import (
    chunk_documents_sentences,
    split_sentences,
)


def _sents(spark, text):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(split_sentences("text").alias("s"))
        .collect()[0]["s"]
    )


def test_basic_terminal_punctuation(spark):
    got = _sents(spark, "First one. Second one! Third one? Fourth.")
    assert got == ["First one.", "Second one!", "Third one?", "Fourth."]


def test_abbreviations_do_not_split(spark):
    got = _sents(
        spark,
        "Dr. Smith met Mr. Jones at St. Mary. They talked. See e.g. the U.S. report.",
    )
    assert got == [
        "Dr. Smith met Mr. Jones at St. Mary.",
        "They talked.",
        "See e.g. the U.S. report.",
    ]


def test_quotes_and_numbers_open_sentences(spark):
    got = _sents(spark, 'He said stop. "Go away." 42 was the answer.')
    assert got == ["He said stop.", '"Go away."', "42 was the answer."]


def test_no_split_before_lowercase(spark):
    # ellipsis-like mid-sentence period before lowercase stays joined
    got = _sents(spark, "It was v. strange and went on. then again, Caps start.")
    assert len(got) == 1 or got[0].startswith("It was")


def test_empty_and_null(spark):
    df = spark.createDataFrame([(None,), ("",), ("   ",)], "text string")
    rows = df.select(F.size(split_sentences("text")).alias("n")).collect()
    assert all(r["n"] in (0, -1, None) for r in rows)  # NULL stays NULL


def test_chunking_matches_greedy_reference(spark):
    text = (
        "One two three. Four five. Six seven eight nine. Ten. "
        "Eleven twelve thirteen fourteen fifteen sixteen. Short."
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents_sentences(df, "doc_id", "text", chunk_tokens=6).collect(),
        key=lambda r: r["chunk_id"],
    )
    # greedy reference
    sents = _sents(spark, text)
    chunks, cur, tok = [], [], 0
    for s in sents:
        n = len(s.split())
        if cur and tok + n > 6:
            chunks.append((" ".join(cur), tok))
            cur, tok = [], 0
        cur.append(s)
        tok += n
    chunks.append((" ".join(cur), tok))
    assert [(r["chunk"], r["n_tokens"]) for r in rows] == chunks
    assert all(r["n_chunks"] == len(chunks) for r in rows)
    # every chunk except possibly overflow singles respects the budget
    assert all(r["n_tokens"] <= 6 or r["n_sentences"] == 1 for r in rows)


def test_overlong_sentence_becomes_own_chunk(spark):
    df = spark.createDataFrame(
        [(1, "tiny one. " + " ".join(f"w{i}" for i in range(20)) + ". tail two.")],
        "doc_id long, text string",
    )
    rows = chunk_documents_sentences(df, "doc_id", "text", chunk_tokens=5).collect()
    big = [r for r in rows if r["n_tokens"] > 5]
    assert len(big) == 1 and big[0]["n_sentences"] == 1
    with pytest.raises(ValueError):
        chunk_documents_sentences(df, "doc_id", "text", chunk_tokens=0)


def test_partition_independent(spark):
    rows = [(i, f"Alpha beta. Gamma delta epsilon. Zeta {i}.") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = chunk_documents_sentences(df.repartition(2), "doc_id", "text", 4)
    b = chunk_documents_sentences(df.repartition(9), "doc_id", "text", 4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
