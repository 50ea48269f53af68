"""Bigram LM perplexity scoring vs a pure-Python reference."""

import math

from trial_submission_studio_spark.operators.lm import (
    bigram_logprob_scores,
    perplexity_filter,
    train_bigram_lm,
)

REF = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the rug"),
    (3, "a cat and a dog"),
]


def _py_model(texts):
    uni, bi = {}, {}
    for t in texts:
        toks = t.lower().split()
        for a, b in zip(toks, toks[1:]):
            uni[a] = uni.get(a, 0) + 1
            bi[(a, b)] = bi.get((a, b), 0) + 1
    return uni, bi


def _py_score(text, uni, bi, v, k=1.0):
    toks = text.lower().split()
    lps = [
        math.floor(
            math.log(
                (bi.get((a, b), 0) + k) / (uni.get(a, 0) + k * v)
            )
            * 1e6
            + 0.5
        )
        for a, b in zip(toks, toks[1:])
    ]
    return len(lps), sum(lps)


def test_bigram_scores_match_python_reference(spark):
    df = spark.createDataFrame(REF, "doc_id long, text string")
    unigrams, bigrams = train_bigram_lm(df, "doc_id", "text")
    v = unigrams.count()
    uni, bi = _py_model([t for _, t in REF])
    assert v == len(uni)

    queries = REF + [(4, "the cat sat on the mat"), (5, "zebra quux unseen")]
    q = spark.createDataFrame(queries, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["sum_logprob_e6"])
        for r in bigram_logprob_scores(
            q, unigrams, bigrams, "doc_id", "text"
        ).collect()
    }
    for doc_id, text in queries:
        assert got[doc_id] == _py_score(text, uni, bi, v), doc_id


def test_short_docs_score_null_and_filter_drops_them(spark):
    df = spark.createDataFrame(REF, "doc_id long, text string")
    unigrams, bigrams = train_bigram_lm(df, "doc_id", "text")
    q = spark.createDataFrame(
        REF + [(9, "solo"), (10, "")], "doc_id long, text string"
    )
    scores = {r["doc_id"]: r for r in bigram_logprob_scores(
        q, unigrams, bigrams, "doc_id", "text"
    ).collect()}
    assert scores[9]["n_bigrams"] == 0 and scores[9]["ppl"] is None
    assert scores[10]["n_bigrams"] == 0

    # in-domain docs have lower ppl than an unseen-vocab doc
    q2 = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (5, "zebra quux unseen vocab")],
        "doc_id long, text string",
    )
    s2 = {r["doc_id"]: r["ppl"] for r in bigram_logprob_scores(
        q2, unigrams, bigrams, "doc_id", "text"
    ).collect()}
    assert s2[1] < s2[5]
    kept = perplexity_filter(
        q2, unigrams, bigrams, "doc_id", "text", max_ppl=(s2[1] + s2[5]) / 2
    )
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_scores_partition_invariant(spark):
    df = spark.createDataFrame(REF, "doc_id long, text string")
    unigrams, bigrams = train_bigram_lm(df, "doc_id", "text")
    a = sorted(
        tuple(r)
        for r in bigram_logprob_scores(
            df, unigrams, bigrams, "doc_id", "text"
        ).select("doc_id", "n_bigrams", "sum_logprob_e6").collect()
    )
    b = sorted(
        tuple(r)
        for r in bigram_logprob_scores(
            df.repartition(7), unigrams, bigrams, "doc_id", "text", broadcast_model=False
        ).select("doc_id", "n_bigrams", "sum_logprob_e6").collect()
    )
    assert a == b
