"""Phrase-mining tests: PMI/NPMI parity with a pure-Python
reference, min_count pruning, determinism, and tf-idf keyword
extraction semantics."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from trial_submission_studio_spark.operators.phrases import (
    collocations,
    tfidf_keywords,
)

DOCS = [
    (1, "new york is a big city and new york never sleeps"),
    (2, "san francisco and new york are american cities"),
    (3, "the city of san francisco has fog"),
    (4, "big data systems process big data all day"),
    (5, "a lone word"),
]


def _ref_collocations(docs, min_count):
    toks = [t.lower().split() for _, t in docs]
    uni = Counter(t for doc in toks for t in doc)
    total = sum(uni.values())
    bi = Counter()
    for doc in toks:
        for a, b in zip(doc, doc[1:]):
            bi[(a, b)] += 1
    out = {}
    for (a, b), nab in bi.items():
        if nab < min_count:
            continue
        pmi = math.log(nab * total / (uni[a] * uni[b]))
        npmi = pmi / (-math.log(nab / total))
        out[(a, b)] = (nab, uni[a], uni[b], pmi, npmi)
    return out


def _ref_tfidf(docs, k):
    toks = {d: t.lower().split() for d, t in docs}
    n = len(docs)
    dfc = Counter(term for t in toks.values() for term in set(t))
    out = {}
    for d, t in toks.items():
        tf = Counter(t)
        scored = sorted(
            (
                (-tf[term] * (math.log((1 + n) / (1 + dfc[term])) + 1), term)
                for term in tf
            ),
        )[:k]
        out[d] = [(term, -s) for s, term in scored]
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_collocations_match_reference(spark, docs_df):
    got = {
        (r["tok_a"], r["tok_b"]): (
            r["n_ab"], r["n_a"], r["n_b"], r["pmi"], r["npmi"]
        )
        for r in collocations(docs_df, "text", min_count=2).collect()
    }
    want = _ref_collocations(DOCS, 2)
    assert set(got) == set(want)
    for key, (nab, na, nb, pmi, npmi) in want.items():
        g = got[key]
        assert g[:3] == (nab, na, nb)
        assert g[3] == pytest.approx(pmi, rel=1e-12)
        assert g[4] == pytest.approx(npmi, rel=1e-12)
    # "new york" is the strongest true collocation in the corpus
    assert ("new", "york") in got
    assert got[("new", "york")][4] > 0.5


def test_collocations_min_count_prunes(spark, docs_df):
    all_rows = collocations(docs_df, "text", min_count=1)
    some = collocations(docs_df, "text", min_count=3)
    assert all_rows.count() > some.count()
    assert all(r["n_ab"] >= 3 for r in some.collect())
    with pytest.raises(ValueError):
        collocations(docs_df, "text", min_count=0)


def test_collocations_npmi_bounds(spark, docs_df):
    for r in collocations(docs_df, "text", min_count=1).collect():
        assert -1.0 <= r["npmi"] <= 1.0 + 1e-12


def test_tfidf_keywords_match_reference(spark, docs_df):
    got = {}
    for r in tfidf_keywords(docs_df, "doc_id", "text", k=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tfidf"])
        )
    want = _ref_tfidf(DOCS, 3)
    for d, terms in want.items():
        rows = sorted(got[d])
        assert [t for _, t, _ in rows] == [t for t, _ in terms]
        for (_, _, score), (_, ref) in zip(rows, terms):
            assert score == pytest.approx(ref, rel=1e-12)


def test_tfidf_rank_is_dense_per_doc(spark, docs_df):
    rows = tfidf_keywords(docs_df, "doc_id", "text", k=100).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["rank"])
    for d, ranks in by_doc.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), d
    with pytest.raises(ValueError):
        tfidf_keywords(docs_df, "doc_id", "text", k=0)


def test_token_pattern_strips_punctuation(spark):
    df = spark.createDataFrame(
        [(1, "big data. big data. big data.")], "doc_id long, text string"
    )
    from trial_submission_studio_spark.operators.tokenize import WORD_PATTERN

    ws = {
        (r["tok_a"], r["tok_b"])
        for r in collocations(df, "text", min_count=1).collect()
    }
    assert ("big", "data.") in ws
    re_ = {
        (r["tok_a"], r["tok_b"])
        for r in collocations(
            df, "text", min_count=1, token_pattern=WORD_PATTERN
        ).collect()
    }
    assert ("big", "data") in re_ and ("data", "big") in re_


def test_collocations_is_fully_lazy(spark, docs_df):
    """Building the collocations plan must launch NO Spark job: the
    total token count rides in-plan as a 1-row broadcast (Σ n over
    the unigram table), not a separate corpus-explode ``count()``."""
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    q = collocations(docs_df, "text", min_count=2)
    after = set(tracker.getJobIdsForGroup(None))
    assert before == after, "collocations() launched a job before any action"
    # and the in-plan total matches a direct count
    rows = q.collect()
    want = _ref_collocations(DOCS, 2)
    assert {(r["tok_a"], r["tok_b"]) for r in rows} == set(want)
    for r in rows:
        assert r["pmi"] == pytest.approx(want[(r["tok_a"], r["tok_b"])][3], rel=1e-12)


def test_no_cartesian_or_row_udfs(spark, docs_df):
    for q in (
        collocations(docs_df, "text", min_count=1),
        tfidf_keywords(docs_df, "doc_id", "text", k=2),
    ):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan


def test_encoding_stats_tokenizer_report(spark):
    """Tokenizer-evaluation aggregates: fertility, sequence length,
    vocab utilization — exact values vs hand computation, per-stratum
    and global, over any array-typed encode output."""
    from pyspark.sql import functions as F

    from trial_submission_studio_spark.operators.tokenize import (
        encoding_stats,
        words,
    )

    rows = [
        (1, "en", "the cat sat"),
        (2, "en", "the dog"),
        (3, "de", "der hund bellt laut"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    enc = df.withColumn("toks", words("text"))

    got = {
        r["lang"]: r
        for r in encoding_stats(
            enc, "toks", "text", strata_col="lang", vocab_size=10
        ).collect()
    }
    en = got["en"]
    assert (en["n_docs"], en["n_tokens"], en["n_chars"]) == (2, 5, 18)
    assert en["chars_per_token"] == pytest.approx(18 / 5)
    assert en["tokens_per_doc"] == pytest.approx(2.5)
    assert en["distinct_tokens"] == 4  # the, cat, sat, dog
    assert en["vocab_utilization"] == pytest.approx(0.4)
    de = got["de"]
    assert de["n_tokens"] == 4 and de["distinct_tokens"] == 4

    # global (no strata): one row over the whole sample
    g = encoding_stats(enc, "toks", "text").collect()
    assert len(g) == 1 and g[0]["n_docs"] == 3 and g[0]["n_tokens"] == 9
    assert g[0]["distinct_tokens"] == 8

    # composes with id-typed encodes too (array<long>)
    ids = enc.withColumn(
        "tok_ids", F.expr("transform(toks, t -> xxhash64(t))")
    )
    gi = encoding_stats(ids, "tok_ids", "text").collect()[0]
    assert gi["n_tokens"] == 9 and gi["distinct_tokens"] == 8

    with pytest.raises(ValueError, match="vocab_size"):
        encoding_stats(enc, "toks", "text", vocab_size=0)
