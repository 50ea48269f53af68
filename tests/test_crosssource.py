"""Cross-source duplication audit: hand-checked overlap matrix,
asymmetry, normalization-aware identity, near-dup instantiation via
duplicate_groups, partition independence, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.operators.crosssource import (
    cross_source_duplication,
    cross_source_near_duplication,
    source_overlap_matrix,
)
from trial_submission_studio_spark.sources.local import values_df

SCHEMA = "doc_id long, text string, source string"

# crawl: 4 docs; curated: 3 docs (2 of which are in crawl); books: 1
ROWS = [
    (1, "alpha beta", "crawl"),
    (2, "gamma delta", "crawl"),
    (3, "unique crawl text", "crawl"),
    (4, "alpha beta", "crawl"),  # in-source duplicate of 1
    (10, "alpha beta", "curated"),
    (11, "gamma delta", "curated"),
    (12, "curated only", "curated"),
    (20, "books only", "books"),
]


def _m(df):
    return {
        (r["source_a"], r["source_b"]): (
            r["shared_keys"],
            r["docs_a_shared"],
            r["total_docs_a"],
            r["frac_a_shared"],
        )
        for r in df.collect()
    }


def test_exact_overlap_matrix_hand_checked(spark):
    docs = values_df(spark, ROWS, SCHEMA)
    got = _m(cross_source_duplication(docs, "doc_id", "text", "source"))
    # curated→crawl: both shared keys, 2 of 3 curated docs covered
    assert got[("curated", "crawl")] == (2, 2, 3, pytest.approx(2 / 3))
    # crawl→curated: same 2 keys but THREE crawl docs carry them
    # (doc 4 duplicates doc 1 in-source) out of 4 total
    assert got[("crawl", "curated")] == (2, 3, 4, pytest.approx(3 / 4))
    # books overlaps nothing → no row in either orientation
    assert ("books", "crawl") not in got
    assert ("crawl", "books") not in got
    assert set(got) == {("curated", "crawl"), ("crawl", "curated")}


def test_exact_identity_is_normalized(spark):
    # fingerprint() normalizes case/whitespace — a shouting copy
    # still counts as the same document
    docs = values_df(
        spark,
        [(1, "Alpha  Beta", "a"), (2, "alpha beta", "b")],
        SCHEMA,
    )
    got = _m(cross_source_duplication(docs, "doc_id", "text", "source"))
    assert got[("a", "b")][0] == 1


def test_overlap_matrix_partition_independent(spark):
    docs = values_df(spark, ROWS, SCHEMA)
    one = _m(
        cross_source_duplication(
            docs.repartition(1), "doc_id", "text", "source"
        )
    )
    many = _m(
        cross_source_duplication(
            docs.repartition(13), "doc_id", "text", "source"
        )
    )
    assert one == many


def test_generic_kernel_with_external_totals(spark):
    keyed = values_df(
        spark,
        [("k1", "a"), ("k1", "b"), ("k2", "a")],
        "k string, src string",
    )
    totals = values_df(spark, [("a", 10), ("b", 5)], "src string, n long")
    got = _m(source_overlap_matrix(keyed, "k", "src", totals=totals))
    assert got[("a", "b")] == (1, 1, 10, pytest.approx(0.1))
    assert got[("b", "a")] == (1, 1, 5, pytest.approx(0.2))


def test_near_duplication_via_duplicate_groups(spark):
    from trial_submission_studio_spark.operators.dedup import (
        duplicate_groups,
        ngram_jaccard_pairs,
    )

    base = (
        "the quick brown fox jumps over the lazy dog again and again "
        "while the rain keeps falling on the quiet grey town all day"
    )
    near = base.replace("quiet", "silent")
    rows = [
        (1, base, "crawl"),
        (2, near, "curated"),  # near-dup of 1, different source
        (3, "completely different text about spark plans", "crawl"),
        (4, "another unrelated curated document entirely", "curated"),
    ]
    docs = values_df(spark, rows, SCHEMA)
    cands = values_df(
        spark, [(1, 2), (1, 3), (2, 4)], "id_a long, id_b long"
    )
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", cands, k=5, threshold=0.5
    ).select("id_a", "id_b")
    groups = duplicate_groups(pairs).withColumnRenamed("id", "doc_id")
    got = _m(
        cross_source_near_duplication(
            groups, docs, "doc_id", "source"
        )
    )
    # one shared group; half of each source's 2 docs participate
    assert got[("crawl", "curated")] == (1, 1, 2, pytest.approx(0.5))
    assert got[("curated", "crawl")] == (1, 1, 2, pytest.approx(0.5))


def test_plan_no_cartesian_and_text_never_shuffles(spark):
    docs = values_df(spark, ROWS, SCHEMA)
    df = cross_source_duplication(docs, "doc_id", "text", "source")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the key self-join shuffles fingerprints, never document text
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert exchanges and all("text" not in ln for ln in exchanges)
