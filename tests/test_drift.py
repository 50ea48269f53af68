"""Corpus drift tests: JS math against a numpy reference, the
zero/ln2 bounds, and drifted-token attribution."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.operators.drift import (
    bucket_drift,
    token_drift,
)


def _df(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_identical_corpora_near_zero(spark):
    docs = _df(spark, [f"common words here {i % 3}" for i in range(30)])
    top, total = token_drift(docs, docs, "text")
    assert total == pytest.approx(0.0, abs=1e-9)
    assert bucket_drift(docs, docs, "text", buckets=256) == pytest.approx(
        0.0, abs=1e-9
    )


def test_disjoint_corpora_near_ln2(spark):
    a = _df(spark, ["alpha beta gamma"] * 20)
    b = _df(spark, ["delta epsilon zeta"] * 20, start=100)
    _, total = token_drift(a, b, "text", smoothing=1e-6)
    assert total == pytest.approx(math.log(2), rel=0.01)
    js = bucket_drift(a, b, "text", buckets=512, smoothing=1e-6)
    assert js == pytest.approx(math.log(2), rel=0.05)


def test_token_drift_matches_numpy_reference(spark):
    a_texts = ["the cat sat"] * 10 + ["dogs bark loud"] * 5
    b_texts = ["the cat sat"] * 5 + ["birds sing songs"] * 10
    a, b = _df(spark, a_texts), _df(spark, b_texts, start=100)
    smoothing = 0.5
    top, total = token_drift(a, b, "text", top_n=100, smoothing=smoothing)

    def freqs(texts):
        out = {}
        for t in texts:
            for tok in t.split():
                out[tok] = out.get(tok, 0) + 1
        return out

    fa, fb = freqs(a_texts), freqs(b_texts)
    vocab = sorted(set(fa) | set(fb))
    ta = sum(fa.values()) + smoothing * len(vocab)
    tb = sum(fb.values()) + smoothing * len(vocab)
    expect = 0.0
    per_tok = {}
    for tok in vocab:
        p = (fa.get(tok, 0) + smoothing) / ta
        q = (fb.get(tok, 0) + smoothing) / tb
        m = (p + q) / 2
        c = 0.5 * (p * math.log(p / m) + q * math.log(q / m))
        per_tok[tok] = c
        expect += c
    assert total == pytest.approx(expect, rel=1e-9)
    got = {r["token"]: r["js_contrib"] for r in top.collect()}
    assert set(got) == set(vocab)
    for tok in vocab:
        assert got[tok] == pytest.approx(per_tok[tok], rel=1e-9)
    # the drifted vocab dominates the attribution
    ranked = [r["token"] for r in top.collect()]
    assert set(ranked[:6]) >= {"birds", "sing", "songs"}


def test_planted_drift_raises_bucket_score(spark):
    base = [f"stable vocabulary item {i % 4}" for i in range(40)]
    a = _df(spark, base)
    b_small = _df(spark, base[:30] + ["novel injected tokens"] * 10, start=100)
    drift_small = bucket_drift(a, b_small, "text", buckets=1024)
    b_big = _df(spark, ["totally different content now"] * 40, start=200)
    drift_big = bucket_drift(a, b_big, "text", buckets=1024)
    assert 0 < drift_small < drift_big


def test_token_drift_min_count_prunes_tail(spark):
    a = _df(spark, ["common words here"] * 20 + ["raretoken onlyonce"])
    b = _df(spark, ["common words here"] * 20, start=100)
    top_all, total_all = token_drift(a, b, "text")
    top_cut, total_cut = token_drift(a, b, "text", min_count=2)
    toks_cut = {r["token"] for r in top_cut.collect()}
    assert "raretoken" not in toks_cut and "onlyonce" not in toks_cut
    assert {r["token"] for r in top_all.collect()} >= toks_cut
    # totals stay finite and close (tail carries little mass)
    assert 0 <= total_cut and abs(total_cut - total_all) < 0.05
    import pytest as _pytest

    with _pytest.raises(ValueError):
        token_drift(a, b, "text", min_count=0)
