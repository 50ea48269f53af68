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
