"""Tests for the round-7 training-pipeline operators: benchmark
decontamination, C4-style line filtering, weighted epoch mixing, and
embedding normalize/quantize."""

import math

import pytest

from pyspark.sql import functions as F

from tests.conftest import rows
from trial_submission_studio_spark.operators.contamination import (
    contamination_overlap,
    word_ngrams,
)
from trial_submission_studio_spark.operators.embeddings import (
    dequantize_int8,
    l2_norm,
    l2_normalize,
    quantize_int8,
)
from trial_submission_studio_spark.operators.qualityfilter import (
    line_quality_filter,
)
from trial_submission_studio_spark.operators.sampling import mix_epochs


# ---------------------------------------------------------------- contamination

def test_word_ngrams_shapes(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("",), (None,)], ["t"]
    ).select(word_ngrams("t", n=3).alias("g"))
    got = [r["g"] for r in df.collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []  # shorter than n
    assert got[2] == []
    assert got[3] == []


def test_contamination_flags_benchmark_members_and_borrowers(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            # shares the benchmark's 5-gram run verbatim -> contaminated
            (1, "intro words the quick brown fox jumps over closing"),
            # no 5-gram overlap
            (2, "completely different text with no shared runs at all"),
            # too short for 5-grams
            (3, "tiny doc"),
        ],
        ["doc_id", "text"],
    )
    bench = docs.filter(F.col("doc_id") == 0)
    out = rows(
        contamination_overlap(docs, bench, "doc_id", "text", n=5, threshold=0.5)
    )
    by_id = {r[0]: r[1:] for r in out}
    # benchmark member: all 5 shingles overlap
    assert by_id[0] == (5, 5, 1)
    # borrower: 5 shingles, 3 overlap ("the quick brown fox jumps",
    # "quick brown fox jumps over" inside; count exactly)
    n_sh, n_ov, flag = by_id[1]
    assert n_sh == 5 and n_ov >= 2 and flag == (1 if n_ov >= 2.5 else 0)
    assert by_id[2] == (5, 0, 0)
    assert by_id[3] == (0, 0, 0)  # short docs report, never vanish


def test_contamination_broadcast_regimes_equivalent(spark):
    """The broadcast and shuffle join regimes are answer-identical,
    and the default 'auto' probe picks broadcast for a small set /
    shuffle past AUTO_BROADCAST_BENCH_GRAMS (monkeypatched to 1 so
    the test exercises the real switch, not a giant fixture)."""
    import trial_submission_studio_spark.operators.contamination as contam

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "intro words the quick brown fox jumps over closing"),
            (2, "completely different text with no shared runs at all"),
        ],
        ["doc_id", "text"],
    )
    bench = docs.filter(F.col("doc_id") == 0)

    def run(mode):
        return sorted(
            rows(
                contamination_overlap(
                    docs, bench, "doc_id", "text", n=5,
                    threshold=0.5, broadcast_benchmark=mode,
                )
            )
        )

    expect = run(True)
    assert run(False) == expect
    assert run("auto") == expect  # small set -> broadcasts
    old = contam.AUTO_BROADCAST_BENCH_GRAMS
    try:
        contam.AUTO_BROADCAST_BENCH_GRAMS = 1  # force the shuffle leg
        assert run("auto") == expect
    finally:
        contam.AUTO_BROADCAST_BENCH_GRAMS = old
    with pytest.raises(ValueError, match="broadcast_benchmark"):
        contamination_overlap(
            docs, bench, "doc_id", "text", broadcast_benchmark="yes"
        )


def test_contamination_distinct_shingles_no_self_double_count(spark):
    # a doc repeating one phrase 3x has ONE distinct shingle
    docs = spark.createDataFrame(
        [(0, "a b a b a b")], ["doc_id", "text"]
    )
    bench = spark.createDataFrame([(9, "a b a b")], ["doc_id", "text"])
    out = rows(
        contamination_overlap(docs, bench, "doc_id", "text", n=2, threshold=0.5)
    )
    # distinct 2-grams of doc 0: "a b", "b a" -> both in benchmark's set
    assert out == [(0, 2, 2, 1)]


# ---------------------------------------------------------------- quality filter

def test_line_quality_filter_rules(spark):
    text = "\n".join(
        [
            "This line is long enough.",   # kept
            "Too short.",                  # dropped: 2 words
            "no terminal punctuation here",  # dropped
            "This has the BADWORD marker.",  # dropped: blocklist (ci)
            "  ",                          # blank: not counted as a line
            "Another fine sentence here!",  # kept
        ]
    )
    out = line_quality_filter(
        spark.createDataFrame([(1, text)], ["id", "text"]),
        "id",
        "text",
        min_words=3,
        blocklist=("badword",),
    ).collect()[0]
    assert out["n_lines"] == 5  # blank line excluded
    assert out["n_kept"] == 2
    assert out["kept_text"] == (
        "This line is long enough.\nAnother fine sentence here!"
    )
    assert out["kept_chars"] == len("This line is long enough.") + len(
        "Another fine sentence here!"
    )


def test_line_quality_filter_optional_rules_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "one two\nthree four five"), (2, None)], ["id", "text"]
    )
    out = {
        r["id"]: r
        for r in line_quality_filter(
            df, "id", "text", min_words=2, require_terminal_punct=False
        ).collect()
    }
    assert out[1]["n_kept"] == 2  # no punctuation requirement
    assert out[2]["n_lines"] == 0 and out[2]["n_kept"] == 0
    assert out[2]["kept_chars"] == 0 and out[2]["kept_text"] == ""


# ---------------------------------------------------------------- epoch mixing

def test_mix_epochs_full_and_fractional_passes(spark):
    df = spark.createDataFrame(
        [(i, "hq" if i < 100 else "web") for i in range(200)],
        ["doc_id", "source"],
    )
    mixed = mix_epochs(
        df, "source", {"hq": 2.5, "web": 1.0}, key_col="doc_id"
    )
    per_epoch = {
        (r["source"], r["epoch"]): r["n"]
        for r in mixed.groupBy("source", "epoch")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # hq: two full passes + a ~50% keyed third pass
    assert per_epoch[("hq", 0)] == 100 and per_epoch[("hq", 1)] == 100
    assert 25 <= per_epoch.get(("hq", 2), 0) <= 75
    # web: exactly one pass, no extras
    assert per_epoch[("web", 0)] == 100
    assert ("web", 1) not in per_epoch


def test_mix_epochs_partition_independent_and_zero_weight(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(100)],
        ["doc_id", "source"],
    )
    m1 = rows(mix_epochs(df, "source", {"b": 0.0}, key_col="doc_id"))
    m2 = rows(
        mix_epochs(df.repartition(7), "source", {"b": 0.0}, key_col="doc_id")
    )
    assert m1 == m2
    assert all(r[1] == "a" for r in m1)  # weight 0 drops stratum b


# ---------------------------------------------------------------- embeddings

def test_l2_normalize_and_quantize_roundtrip(spark):
    df = spark.createDataFrame(
        [
            (0, [3.0, 4.0]),
            (1, [-1.5, 2.5, 0.0]),
            (2, [0.0, 0.0]),  # zero vector must not NULL-poison
        ],
        ["id", "v"],
    )
    out = df.select(
        "id",
        l2_norm(l2_normalize("v")).alias("nrm"),
        quantize_int8("v").alias("qs"),
        F.col("v"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert abs(by_id[0]["nrm"] - 1.0) < 1e-12
    assert abs(by_id[1]["nrm"] - 1.0) < 1e-12
    assert by_id[2]["nrm"] == 0.0
    assert by_id[2]["qs"]["q"] == [0, 0] and by_id[2]["qs"]["scale"] == 0.0
    # codes bounded, max-magnitude element hits ±127
    assert by_id[0]["qs"]["q"][1] == 127
    # dequantize error bounded by scale/2 per element
    deq = df.select(
        "id",
        F.col("v"),
        quantize_int8("v").alias("qs"),
    ).select(
        "id", "v", dequantize_int8(F.col("qs")["q"], F.col("qs")["scale"]).alias("d"),
        F.col("qs")["scale"].alias("scale"),
    ).collect()
    for r in deq:
        for orig, rec in zip(r["v"], r["d"]):
            assert abs(orig - rec) <= r["scale"] / 2 + 1e-12


def test_quantize_codes_match_scalar_reference(spark):
    vec = [0.9, -0.3, 0.05, -0.9]
    out = (
        spark.createDataFrame([(0, vec)], ["id", "v"])
        .select(quantize_int8("v").alias("qs"))
        .collect()[0]["qs"]
    )
    scale = 0.9 / 127.0
    expect = [math.floor(x / scale + 0.5) for x in vec]
    assert out["q"] == expect
    assert abs(out["scale"] - scale) < 1e-15
