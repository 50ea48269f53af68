"""Incremental dedup (batch vs persisted corpus) and corpus-repeated
substring removal."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows
from trial_submission_studio_spark.operators.dedup import (
    incremental_exact_dedup,
    incremental_minhash_dedup,
)
from trial_submission_studio_spark.operators.substrings import (
    remove_repeated_substrings,
    repeated_window_spans,
)


def test_incremental_exact_dedup_cold_then_warm(spark):
    batch1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "ALPHA   beta"), (3, "gamma")],
        "doc_id long, text string",
    )
    novel1, fps1 = incremental_exact_dedup(batch1, None, "doc_id", "text")
    # 2 is a normalized dup of 1 inside the batch -> min-id survivor
    assert sorted(r["doc_id"] for r in novel1.collect()) == [1, 3]
    assert fps1.count() == 2

    batch2 = spark.createDataFrame(
        [(10, "gamma"), (11, "delta"), (12, "delta")],
        "doc_id long, text string",
    )
    novel2, fps2 = incremental_exact_dedup(batch2, fps1, "doc_id", "text")
    # 10 collides with the seen corpus; 12 with 11 intra-batch
    assert sorted(r["doc_id"] for r in novel2.collect()) == [11]
    assert fps2.count() == 3


def test_incremental_minhash_dedup_drops_near_dups_vs_corpus(spark):
    long_a = " ".join(f"tok{i}" for i in range(40))
    long_b = " ".join(f"other{i}" for i in range(40))
    batch1 = spark.createDataFrame(
        [(1, long_a), (2, long_b)], "doc_id long, text string"
    )
    novel1, buckets, _ = incremental_minhash_dedup(batch1, None, "doc_id", "text")
    assert sorted(r["doc_id"] for r in novel1.collect()) == [1, 2]

    batch2 = spark.createDataFrame(
        [(10, long_a + " zq"), (11, "completely unrelated fresh content here")],
        "doc_id long, text string",
    )
    novel2, buckets2, _ = incremental_minhash_dedup(batch2, buckets, "doc_id", "text")
    got = sorted(r["doc_id"] for r in novel2.collect())
    assert 10 not in got  # near-dup of seen doc 1 -> dropped
    assert 11 in got
    assert buckets2.count() > buckets.count()  # novel doc's buckets appended


def test_incremental_minhash_intra_batch_min_id_survives(spark):
    long_a = " ".join(f"tok{i}" for i in range(40))
    batch = spark.createDataFrame(
        [(5, long_a), (6, long_a + " zq")], "doc_id long, text string"
    )
    novel, _, _ = incremental_minhash_dedup(batch, None, "doc_id", "text")
    assert sorted(r["doc_id"] for r in novel.collect()) == [5]


REPEAT = " ".join(f"boiler{i}" for i in range(8))  # an 8-token repeated run


def test_remove_repeated_substrings_excises_shared_run(spark):
    df = spark.createDataFrame(
        [
            (1, f"unique one two {REPEAT} tail1"),
            (2, f"{REPEAT} start of doc two"),
            (3, "nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    out = remove_repeated_substrings(df, "doc_id", "text", w=8, min_doc_freq=2)
    got = {r["doc_id"]: (r["text"], r["n_removed"]) for r in out.collect()}
    assert got[1] == ("unique one two tail1", 8)
    assert got[2] == ("start of doc two", 8)
    assert got[3] == ("nothing shared here at all", 0)


def test_repeated_run_longer_than_w_fully_covered(spark):
    run = " ".join(f"r{i}" for i in range(12))  # 12-token run, w=8
    df = spark.createDataFrame(
        [(1, f"head {run}"), (2, f"{run} tail")], "doc_id long, text string"
    )
    out = remove_repeated_substrings(df, "doc_id", "text", w=8, min_doc_freq=2)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got[1] == "head" and got[2] == "tail"


def test_short_docs_and_sub_w_repeats_untouched(spark):
    df = spark.createDataFrame(
        [(1, "same short snippet"), (2, "same short snippet")],
        "doc_id long, text string",
    )
    # 3-token docs, w=8: no windows exist, nothing flagged
    assert repeated_window_spans(df, "doc_id", "text", w=8).count() == 0
    out = remove_repeated_substrings(df, "doc_id", "text", w=8)
    assert {r["text"] for r in out.collect()} == {"same short snippet"}
    with pytest.raises(ValueError):
        remove_repeated_substrings(df, "doc_id", "text", w=8, min_doc_freq=1)


def test_remove_repeated_substrings_null_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "a b c"), (3, "a b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: (r["text"], r["n_removed"]) for r in
           remove_repeated_substrings(df, "doc_id", "text", w=2).collect()}
    assert out[1] == ("", 0)
    assert out[2][0] == "" and out[2][1] == 3  # fully repeated run excised


def test_incremental_minhash_signature_verification_rescues_fp(spark):
    """A chance single-band bucket collision with a DISSIMILAR corpus
    doc must not drop a novel document when signature verification is
    on — and a true near-dup must still be dropped."""
    long_a = " ".join(f"tok{i}" for i in range(40))
    batch1 = spark.createDataFrame([(1, long_a)], "doc_id long, text string")
    novel1, buckets, sigs = incremental_minhash_dedup(
        batch1, None, "doc_id", "text", track_ids=True
    )
    assert "doc_id" in buckets.columns and sigs is not None

    fresh = "entirely different subject matter with new vocabulary here"
    batch2 = spark.createDataFrame(
        [(10, long_a + " zq"), (11, fresh)], "doc_id long, text string"
    )
    # forge a bucket collision for doc 11: take ONE of its band rows
    # and plant it in the seen table attributed to corpus doc 1
    from trial_submission_studio_spark.operators.dedup import (
        band_bucket_rows,
        minhash_signatures,
    )
    from pyspark.sql import functions as F

    sig11 = minhash_signatures(
        batch2.filter("doc_id = 11"), "doc_id", "text"
    )
    one_band = (
        band_bucket_rows(sig11, "doc_id", 8, 4)
        .limit(1)
        .select("band", "bucket", F.lit(1).cast("long").alias("doc_id"))
    )
    poisoned = buckets.unionByName(one_band)

    # WITHOUT verification: the forged collision kills doc 11
    unverified, _, _ = incremental_minhash_dedup(
        batch2, poisoned.select("band", "bucket"), "doc_id", "text"
    )
    assert sorted(r["doc_id"] for r in unverified.collect()) == []

    # WITH verification: doc 11's est-Jaccard vs doc 1 is ~0 -> kept;
    # doc 10 (true near-dup of doc 1) stays dropped
    verified, vb, vs = incremental_minhash_dedup(
        batch2, poisoned, "doc_id", "text", seen_sigs=sigs
    )
    assert sorted(r["doc_id"] for r in verified.collect()) == [11]
    assert vs.count() == sigs.count() + 1  # doc 11's signature appended
