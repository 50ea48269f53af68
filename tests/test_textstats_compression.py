"""zlib compression-ratio quality signal (textstats.compression_ratio):
Arrow-batched, matches a local zlib reference bit-exactly, and the
band filter drops repetitive + high-entropy extremes."""

from __future__ import annotations

import zlib

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.operators.textstats import (
    compression_filter,
    compression_ratio,
)


def test_compression_ratio_matches_zlib_reference(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 5),
        (2, "spam spam spam spam " * 50),
        (3, "q8Zp!x2Lw9@rT4#mK7$vB1%nH6^jD3&gF5*sA0"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["cr"]
        for r in df.select(
            "doc_id", compression_ratio("text").alias("cr")
        ).collect()
    }
    for doc_id, text in rows:
        if not text:
            assert got[doc_id] is None, doc_id
        else:
            raw = text.encode("utf-8")
            assert got[doc_id] == pytest.approx(
                len(zlib.compress(raw, 6)) / len(raw)
            ), doc_id
    # ordering sanity: repetitive spam compresses below prose, junk above
    assert got[2] < got[1] < got[3]


def test_compression_filter_band(spark):
    rows = [
        (1, "a sensible paragraph of natural language text with "
            "varied words and ordinary sentence structure in it."),
        (2, "buy now " * 400),
        (3, "q8Zp!x2Lw9@rT4#mK7$vB1%nH6^jD3&gF5*sA0zYe"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r["doc_id"]
        for r in compression_filter(
            df, "text", min_ratio=0.25, max_ratio=0.95
        ).collect()
    )
    assert kept == [1]


def test_compression_ratio_validations(spark):
    with pytest.raises(ValueError):
        compression_ratio("text", level=0)


def test_gopher_formatting_metrics(spark):
    """Bullet/ellipsis/symbol/alpha heuristics match a direct Python
    reference on crafted multi-line docs."""
    import re

    from trial_submission_studio_spark.operators.textstats import (
        alpha_word_fraction_e4,
        bullet_line_fraction_e4,
        ellipsis_line_fraction_e4,
        symbol_word_ratio_e4,
    )

    docs = [
        (1, "• first point\n- second point\nplain line\nmore text..."),
        (2, "just a ## line with # symbols and a trailing …\nnormal"),
        (3, "1234 5678 !!!\nwords only here"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["b"], r["e"], r["sy"], r["a"])
        for r in df.select(
            "doc_id",
            bullet_line_fraction_e4("text").alias("b"),
            ellipsis_line_fraction_e4("text").alias("e"),
            symbol_word_ratio_e4("text").alias("sy"),
            alpha_word_fraction_e4("text").alias("a"),
        ).collect()
    }

    def ref(text):
        if not text or not text.strip():
            return (0, 0, 0, 0)
        s = text.strip()
        lines = [ln.strip() for ln in s.split("\n") if ln.strip()]
        toks = re.split(r"\s+", s)
        nb = sum(1 for ln in lines if re.search(r"^[•‣▪◦*-] ", ln))
        ne = sum(1 for ln in lines if re.search(r"(\.\.\.|…)$", ln))
        nsym = len(re.findall(r"#|…|\.\.\.", s))
        na = sum(1 for t in toks if re.search(r"[A-Za-z]", t))
        e4 = lambda num, den: int(num * 10000.0 // den) if den else 0  # noqa: E731
        return (
            e4(nb, len(lines)), e4(ne, len(lines)),
            e4(nsym, len(toks)), e4(na, len(toks)),
        )

    for doc_id, text in docs:
        assert got[doc_id] == ref(text), (doc_id, got[doc_id], ref(text))
