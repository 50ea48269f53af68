"""Unicode normalization / confusable-skeleton tests: NFKC folding,
invisible-codepoint stripping, homoglyph spoof detection, and the
spoof-resistant dedup key end to end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.operators.unicode_norm import (
    CONFUSABLE_MAP,
    confusable_skeleton,
    normalize_unicode,
    skeleton_fingerprint,
    strip_default_ignorable,
)


def _one(spark, expr, s):
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(expr.alias("v")).collect()[0]["v"]


def test_nfkc_folds_compatibility_forms(spark):
    import unicodedata

    cases = ["ﬁsh", "ＨＥＬＬＯ ｗｏｒｌｄ", "x² + ½", "①②③", None]
    df = spark.createDataFrame([(c,) for c in cases], "t string")
    got = [
        r["v"]
        for r in df.select(normalize_unicode("t").alias("v")).collect()
    ]
    want = [
        unicodedata.normalize("NFKC", c) if c is not None else None
        for c in cases
    ]
    assert got == want
    assert got[0] == "fish"
    assert got[1] == "HELLO world"
    with pytest.raises(ValueError, match="normalization form"):
        normalize_unicode("t", form="NFX")


def test_invisible_injection_is_stripped(spark):
    spoofed = "f​re­e ⁠mon﻿ey"
    got = _one(spark, strip_default_ignorable(F.col("t")), spoofed)
    assert got == "free money"


def test_homoglyph_spoof_skeletons_equal(spark):
    """Cyrillic/Greek lookalike swaps, fullwidth forms, zero-width
    injections, fancy dashes/quotes — all skeleton to the honest
    text; genuinely different text does not."""
    honest = "cheap meds - best price"
    spoofs = [
        "сheар meds - best price",          # Cyrillic с, а, р
        "cheap​ meds – best price",  # zero-width + en dash
        "ＣＨＥＡＰ MEDS - BEST PRICE",       # fullwidth + case
        "сhеар mеds — bеst priсе",     # heavy Cyrillic + em dash
    ]
    want = _one(spark, confusable_skeleton(F.col("t")), honest)
    for s in spoofs:
        assert _one(spark, confusable_skeleton(F.col("t")), s) == want, s
    other = _one(spark, confusable_skeleton(F.col("t")), "different text")
    assert other != want


def test_skeleton_fingerprint_is_spoof_resistant_dedup_key(spark):
    from trial_submission_studio_spark.operators.dedup import (
        exact_duplicates,
        fingerprint,
    )

    rows = [
        (1, "the quick brown fox"),
        (2, "the quiсk brоwn fоx"),   # Cyrillic с/о — same skeleton
        (3, "totally different document"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # plain fingerprint is blind to the spoof...
    plain = df.select(fingerprint("text").alias("fp")).distinct().count()
    assert plain == 3
    # ...the skeleton key catches it
    keyed = df.select("doc_id", skeleton_fingerprint("text").alias("text"))
    groups = exact_duplicates(keyed, "doc_id", "text").collect()
    assert len(groups) == 1
    assert groups[0]["keep_id"] == 1 and groups[0]["dup_count"] == 2


def test_confusable_map_is_translate_safe():
    """translate() maps codepoint→codepoint: every key and value must
    be exactly one char, keys unique, and no key maps to itself."""
    for k, v in CONFUSABLE_MAP.items():
        assert len(k) == 1 and len(v) == 1, (k, v)
        assert k != v


def test_skeleton_plan_is_single_python_stage(spark):
    """Everything except NFKC is codegen: the plan holds exactly one
    ArrowEvalPython (the unicodedata step) and no row-at-a-time
    BatchEvalPython."""
    df = spark.createDataFrame([("x",)], "t string")
    plan = (
        df.select(skeleton_fingerprint("t"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    s=st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
    )
)
def test_skeleton_is_idempotent(spark, s):
    """skeleton(skeleton(x)) == skeleton(x): the canonical form is a
    fixed point, so re-running the scrub (pipeline restarts,
    incremental batches) never changes keys."""
    df = spark.createDataFrame([(s,)], "t string")
    once = df.select(confusable_skeleton(F.col("t")).alias("v")).collect()[0]["v"]
    df2 = spark.createDataFrame([(once,)], "t string")
    twice = df2.select(confusable_skeleton(F.col("t")).alias("v")).collect()[0]["v"]
    assert twice == once


def test_script_counts_and_dominant(spark):
    from trial_submission_studio_spark.operators.unicode_norm import (
        dominant_script,
        script_count,
    )

    df = spark.createDataFrame(
        [
            (1, "Hello world entirely latin text"),
            (2, "Привет мир это кириллица"),
            (3, "日本語のテキストです"),        # Han + Hiragana + Katakana mix
            (4, "Hi Πας Да"),                   # 2/3/2 letters -> mixed
            (5, "12345 !!!"),                   # no letters
            (6, "한국어 텍스트 문서"),            # Hangul
        ],
        "i long, t string",
    )
    got = {
        r.i: (r.d, r.lat, r.cyr)
        for r in df.select(
            "i",
            dominant_script("t").alias("d"),
            script_count("t", "Latin").alias("lat"),
            script_count("t", "Cyrillic").alias("cyr"),
        ).collect()
    }
    assert got[1] == ("Latin", 27, 0)
    assert got[2][0] == "Cyrillic" and got[2][2] > 0
    assert got[3][0] == "mixed"  # no single Japanese script >= 50%
    assert got[4][0] == "mixed"
    assert got[5][0] == "none"
    assert got[6][0] == "Hangul"


def test_dominant_script_threshold_and_plan(spark):
    from trial_submission_studio_spark.operators.planaudit import plan_facts
    from trial_submission_studio_spark.operators.unicode_norm import (
        dominant_script,
    )

    df = spark.createDataFrame([(1, "日本語のテキストです")], "i long, t string")
    # lowering the bar makes the plurality script win
    r = df.select(
        dominant_script("t", min_fraction=0.3).alias("d")
    ).first()
    assert r.d in ("Hiragana", "Han", "Katakana")
    f = plan_facts(df.select(dominant_script("t").alias("d")))
    assert f["python_evals"] == 0 and f["shuffle_exchanges"] == 0
