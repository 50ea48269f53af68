"""Unigram-LM tokenizer tests: E-step parity against an exhaustive
segmentation-enumeration reference, Viterbi semantics + tie-breaks,
end-to-end training behavior, partition independence, and encoding."""

from __future__ import annotations

import math

import pytest

from trial_submission_studio_spark.operators.unigram import (
    UNK_LOGPROB,
    _e_step,
    _forward_backward,
    _viterbi,
    train_unigram_lm,
    unigram_encode,
    unigram_vocab_df,
)


def _segmentations(word, logp, max_len):
    """All (pieces, logprob) of word under the model incl. the UNK
    single-char fallback — exponential; test words are short."""
    if word == "":
        return [([], 0.0)]
    out = []
    for ln in range(1, min(max_len, len(word)) + 1):
        piece = word[:ln]
        lp = logp.get(piece)
        if lp is None:
            if ln == 1:
                lp = UNK_LOGPROB
            else:
                continue
        for rest, rlp in _segmentations(word[ln:], logp, max_len):
            out.append(([piece] + rest, lp + rlp))
    return out


def _ref_expected(word, logp, max_len):
    segs = _segmentations(word, logp, max_len)
    m = max(lp for _, lp in segs)
    z = m + math.log(sum(math.exp(lp - m) for _, lp in segs))
    exp: dict[str, float] = {}
    for pieces, lp in segs:
        w = math.exp(lp - z)
        for p in pieces:
            exp[p] = exp.get(p, 0.0) + w
    return exp, z


MODEL = {
    "a": math.log(0.3),
    "b": math.log(0.2),
    "ab": math.log(0.25),
    "ba": math.log(0.05),
    "abab": math.log(0.2),
}


def test_forward_backward_matches_enumeration():
    for word in ["abab", "ababab", "ba", "aabb", "abba"]:
        got, gz = _forward_backward(word, MODEL, 4)
        want, wz = _ref_expected(word, MODEL, 4)
        assert gz == pytest.approx(wz, abs=1e-9), word
        assert set(got) == set(want), word
        for p in want:
            assert got[p] == pytest.approx(want[p], abs=1e-9), (word, p)


def test_forward_backward_unk_fallback():
    got, z = _forward_backward("axb", MODEL, 4)
    want, wz = _ref_expected("axb", MODEL, 4)
    assert z == pytest.approx(wz, abs=1e-6)
    assert got["x"] == pytest.approx(want["x"], abs=1e-9)


def test_viterbi_best_and_tiebreak():
    assert _viterbi("abab", MODEL, 4) == ["abab"]  # 0.2 > 0.25*0.25
    # "b"+"a" = 0.06 beats the explicit "ba" piece at 0.05
    assert _viterbi("ba", MODEL, 4) == ["b", "a"]
    # exact tie: two pieces with equal product vs one longer piece of
    # the same logprob -> longest-first preferred
    m = {"a": math.log(0.5), "aa": math.log(0.25)}
    assert _viterbi("aa", m, 4) == ["aa"]
    # unknown char falls back to UNK single char
    assert _viterbi("qa", MODEL, 4) == ["q", "a"]


def test_e_step_matches_enumeration(spark):
    words = spark.createDataFrame(
        [("abab", 3), ("ba", 2), ("aabb", 1)], "word string, count long"
    )
    got, ll = _e_step(words, MODEL, 4)
    want_total: dict[str, float] = {}
    want_ll = 0.0
    for w, c in [("abab", 3), ("ba", 2), ("aabb", 1)]:
        e, z = _ref_expected(w, MODEL, 4)
        want_ll += z * c
        for p, v in e.items():
            want_total[p] = want_total.get(p, 0.0) + v * c
    assert ll == pytest.approx(want_ll, abs=1e-9)
    assert set(got) == set(want_total)
    for p in want_total:
        assert got[p] == pytest.approx(want_total[p], abs=1e-9), p


def test_e_step_partition_independent(spark):
    rows = [(f"w{i}ab" * 2, i + 1) for i in range(20)]
    a = spark.createDataFrame(rows, "word string, count long").repartition(1)
    b = spark.createDataFrame(rows, "word string, count long").repartition(7)
    ca, la = _e_step(a, MODEL, 4)
    cb, lb = _e_step(b, MODEL, 4)
    assert la == pytest.approx(lb, rel=1e-12)
    assert set(ca) == set(cb)
    for p in ca:
        assert ca[p] == pytest.approx(cb[p], rel=1e-12), p


def test_train_learns_frequent_pieces(spark):
    docs = spark.createDataFrame(
        [(i, "lowlow lowlow highhigh low high " * 3) for i in range(8)],
        "doc_id long, text string",
    )
    model = train_unigram_lm(
        docs, "text", vocab_size=24, seed_size=200, max_piece_len=8,
        em_iters=2,
    )
    logp = model["logp"]
    assert model["stats"]["vocab_size"] == len(logp) <= 24
    # probabilities form a distribution
    total = sum(math.exp(v) for v in logp.values())
    assert total == pytest.approx(1.0, abs=1e-9)
    # the repeated morphemes survive pruning as whole pieces
    assert "low" in logp and "high" in logp
    # all single chars retained
    for ch in set("lowhig"):
        assert ch in logp, ch


def test_train_validations(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    with pytest.raises(ValueError):
        train_unigram_lm(docs, "text", vocab_size=5)
    with pytest.raises(ValueError):
        train_unigram_lm(docs, "text", shrink_factor=1.5)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError):
        train_unigram_lm(empty, "text")


def test_encode_matches_driver_viterbi(spark):
    docs = spark.createDataFrame(
        [(1, "abab ba"), (2, "abba"), (3, None)],
        "doc_id long, text string",
    )
    model = {"logp": MODEL, "max_piece_len": 4, "lowercase": False}
    rows = {
        r["doc_id"]: r["pieces"]
        for r in unigram_encode(docs, "text", model).collect()
    }
    assert rows[1] == _viterbi("abab", MODEL, 4) + _viterbi("ba", MODEL, 4)
    assert rows[2] == _viterbi("abba", MODEL, 4)
    assert rows[3] == []


def test_vocab_df_deterministic_ids(spark):
    model = {"logp": MODEL, "max_piece_len": 4}
    v1 = unigram_vocab_df(spark, model).collect()
    v2 = unigram_vocab_df(spark, model).collect()
    assert v1 == v2
    by_rank = [r["piece"] for r in sorted(v1, key=lambda r: r["piece_id"])]
    assert by_rank[0] == "a"  # highest prob first
    assert len(set(r["piece_id"] for r in v1)) == len(MODEL)


def test_train_then_encode_roundtrip_consistency(spark):
    docs = spark.createDataFrame(
        [(i, "tokenize tokens token tokenized ") for i in range(6)],
        "doc_id long, text string",
    )
    model = train_unigram_lm(
        docs, "text", vocab_size=30, seed_size=300, max_piece_len=10,
        em_iters=2,
    )
    from pyspark.sql import functions as F

    enc = unigram_encode(docs, "text", model)
    row = enc.filter(F.col("doc_id") == 0).collect()[0]
    # concatenation restores the pre-token stream
    assert "".join(row["pieces"]) == "tokenizetokenstokentokenized"


def test_encode_ids_match_vocab_df(spark):
    from trial_submission_studio_spark.operators.unigram import (
        unigram_encode_ids,
        unigram_ids,
    )

    model = {"logp": MODEL, "max_piece_len": 4, "lowercase": False}
    ids = unigram_ids(model)
    vdf = {r["piece"]: r["piece_id"] for r in unigram_vocab_df(spark, model).collect()}
    assert ids == vdf  # in-memory ids == persisted table ids
    docs = spark.createDataFrame(
        [(1, "abab ba"), (2, "qa")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r["piece_ids"]
        for r in unigram_encode_ids(docs, "text", model).collect()
    }
    assert rows[1] == [ids["abab"], ids["b"], ids["a"]]
    # unknown char "q" -> unk_id -1, then known "a"
    assert rows[2] == [-1, ids["a"]]
