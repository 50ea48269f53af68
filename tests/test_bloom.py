"""Distributed Bloom filter tests: build/probe/merge/persist, and
the load-bearing property — Bloom-pruned incremental dedup is
EXACTLY the plain anti-join, including under forced false
positives (tiny filters)."""

from __future__ import annotations

import pytest

from trial_submission_studio_spark.operators.bloom import (
    BloomFilter,
    bloom_incremental_dedup,
    bloom_maybe_seen,
    bloom_params,
    build_bloom,
    load_bloom,
    merge_blooms,
    save_bloom,
)


def _docs(spark, ids):
    return spark.createDataFrame(
        [(i, f"document body {i}") for i in ids], "doc_id long, text string"
    )


def test_bloom_params_textbook():
    m, k = bloom_params(1000, 0.01)
    assert 9000 < m < 10100 and k in (6, 7)  # ~9.6 bits/key, k≈7
    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def test_no_false_negatives_and_low_fpp(spark):
    corpus = _docs(spark, range(500))
    bf = build_bloom(corpus, "text", capacity=500, fpp=0.01)
    assert bf.n_added == 500
    # every inserted key must probe True
    hits = bloom_maybe_seen(corpus, "text", bf).where("NOT maybe_seen").count()
    assert hits == 0
    # unseen keys mostly probe False
    unseen = _docs(spark, range(10_000, 11_000))
    fp = bloom_maybe_seen(unseen, "text", bf).where("maybe_seen").count()
    assert fp < 50  # 1% target; generous margin
    assert bf.fpp_estimate() < 0.05


def test_incremental_dedup_equals_plain_anti_join(spark):
    corpus = _docs(spark, range(300))
    seen = corpus.select("text")
    bf = build_bloom(corpus, "text", capacity=300, fpp=0.01)
    # increment: 100 dups + 150 new
    inc = _docs(spark, list(range(200, 300)) + list(range(1000, 1150)))
    novel = bloom_incremental_dedup(inc, seen, bf, "text")
    expected = inc.join(seen, "text", "left_anti")
    assert sorted(r["doc_id"] for r in novel.collect()) == sorted(
        r["doc_id"] for r in expected.collect()
    ) == list(range(1000, 1150))


def test_equivalence_under_forced_false_positives(spark):
    """A deliberately undersized filter (high fpp) must still give
    the exact anti-join result — the Bloom only prunes."""
    corpus = _docs(spark, range(400))
    seen = corpus.select("text")
    bf = build_bloom(corpus, "text", capacity=20, fpp=0.5)  # saturated
    inc = _docs(spark, list(range(350, 450)))
    # confirm the filter actually fires false positives here
    fps = (
        bloom_maybe_seen(_docs(spark, range(5000, 6000)), "text", bf)
        .where("maybe_seen")
        .count()
    )
    assert fps > 100
    novel = sorted(
        r["doc_id"] for r in bloom_incremental_dedup(inc, seen, bf, "text").collect()
    )
    assert novel == list(range(400, 450))


def test_cold_start_passes_everything(spark):
    inc = _docs(spark, range(50))
    bf = BloomFilter(8192, 3, bytes(1024), 0)
    assert bloom_incremental_dedup(inc, None, bf, "text").count() == 50


def test_merge_is_union(spark):
    a = build_bloom(_docs(spark, range(0, 100)), "text", 200, 0.01)
    b = build_bloom(_docs(spark, range(100, 200)), "text", 200, 0.01)
    merged = merge_blooms([a, b])
    assert merged.n_added == 200
    both = _docs(spark, range(200))
    assert (
        bloom_maybe_seen(both, "text", merged).where("NOT maybe_seen").count()
        == 0
    )
    with pytest.raises(ValueError):
        merge_blooms([a, BloomFilter(16, 2, bytes(2))])
    with pytest.raises(ValueError):
        merge_blooms([])


def test_save_load_roundtrip(tmp_path, spark):
    bf = build_bloom(_docs(spark, range(64)), "text", 100, 0.05)
    path = str(tmp_path / "corpus_bloom")
    save_bloom(bf, path)
    loaded = load_bloom(path)
    assert (loaded.m_bits, loaded.k, loaded.n_added) == (bf.m_bits, bf.k, 64)
    assert loaded.bitmap == bf.bitmap
    with pytest.raises(ValueError):
        import json

        json.dump(
            {"m_bits": 999, "k": 2, "n_added": 1}, open(path + ".json", "w")
        )
        load_bloom(path)


def test_pruning_plan_shape(spark):
    """The definitely-new branch must reach the union with NO join:
    exactly one Join appears in the whole pruned-dedup plan (the
    maybe-branch verification)."""
    corpus = _docs(spark, range(100))
    seen = corpus.select("text")
    bf = build_bloom(corpus, "text", 100, 0.01)
    inc = _docs(spark, range(50, 150))
    plan = (
        bloom_incremental_dedup(inc, seen, bf, "text")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("Join") == 1
