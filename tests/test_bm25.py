"""BM25 retrieval tests: exact score parity with a pure-Python
reference implementation, ranking semantics, and the
decontamination-by-retrieval use case."""

from __future__ import annotations

import math

import pytest

from trial_submission_studio_spark.operators.bm25 import (
    bm25_topk,
    build_bm25_index,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown cat sat on the mat"),
    (3, "foxes and dogs are common animals"),
    (4, "completely unrelated text about quantum physics"),
    (5, "the the the the the"),  # stop-wordy, long on 'the'
]


def _ref_bm25(docs, query, k1=1.2, b=0.75):
    """Pure-Python Okapi BM25 (idf = ln(1+(N-df+.5)/(df+.5)))."""
    toks = {d: t.lower().split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for term in set(query.lower().split()):
            tf = t.count(term)
            if tf == 0 or term not in df:
                continue
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        if s > 0:
            scores[d] = s
    return scores


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return build_bm25_index(docs, "doc_id", "text")


def test_index_stats(index):
    assert index["n_docs"] == 5
    total = sum(len(t.split()) for _, t in DOCS)
    assert index["avgdl"] == pytest.approx(total / 5)
    dfs = {r["term"]: r["df"] for r in index["term_dfs"].collect()}
    assert dfs["the"] == 3 and dfs["quick"] == 2 and dfs["quantum"] == 1


def test_scores_match_reference(spark, index):
    queries = spark.createDataFrame(
        [(10, "quick fox"), (11, "quantum physics"), (12, "the dog")],
        "qid long, qtext string",
    )
    got = {}
    for r in bm25_topk(index, queries, "qid", "qtext", k=10).collect():
        got.setdefault(r["qid"], {})[r["doc_id"]] = r["score"]
    for qid, qtext in [(10, "quick fox"), (11, "quantum physics"), (12, "the dog")]:
        expect = _ref_bm25(DOCS, qtext)
        assert set(got.get(qid, {})) == set(expect)
        for d, s in expect.items():
            assert got[qid][d] == pytest.approx(s, rel=1e-9)


def test_repeated_query_terms_count_once(spark, index):
    q1 = spark.createDataFrame([(1, "fox fox fox")], "qid long, qtext string")
    q2 = spark.createDataFrame([(1, "fox")], "qid long, qtext string")
    s1 = {r["doc_id"]: r["score"] for r in bm25_topk(index, q1, "qid", "qtext").collect()}
    s2 = {r["doc_id"]: r["score"] for r in bm25_topk(index, q2, "qid", "qtext").collect()}
    assert s1 == s2


def test_topk_rank_and_tiebreak(spark, index):
    queries = spark.createDataFrame([(1, "quick brown")], "qid long, qtext string")
    rows = bm25_topk(index, queries, "qid", "qtext", k=1).collect()
    assert len(rows) == 1 and rows[0]["rank"] == 1
    # doc 2 is shorter → higher score than doc 1 for shared terms
    assert rows[0]["doc_id"] == 2
    with pytest.raises(ValueError):
        bm25_topk(index, queries, "qid", "qtext", k=0)


def test_oov_query_returns_nothing(spark, index):
    queries = spark.createDataFrame(
        [(9, "zzz qqq www")], "qid long, qtext string"
    )
    assert bm25_topk(index, queries, "qid", "qtext").count() == 0


def test_decontamination_by_retrieval(spark):
    """A benchmark item whose wording only PARTIALLY overlaps a
    corpus document is still retrieved as the top hit — the recall
    case exact shingle overlap can miss."""
    corpus = spark.createDataFrame(
        [(i, f"filler document number {i} about miscellaneous topics") for i in range(50)]
        + [(99, "what is the capital city of france paris answer")],
        "doc_id long, text string",
    )
    idx = build_bm25_index(corpus, "doc_id", "text")
    bench = spark.createDataFrame(
        [(1, "capital of france")], "qid long, qtext string"
    )
    top = bm25_topk(idx, bench, "qid", "qtext", k=3).collect()
    assert top[0]["doc_id"] == 99


def test_plan_broadcasts_query_terms(spark, index):
    queries = spark.createDataFrame([(1, "quick fox")], "qid long, qtext string")
    plan = (
        bm25_topk(index, queries, "qid", "qtext")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "CartesianProduct" not in plan
