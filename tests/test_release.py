"""Audited corpus releases (release.py): gate-before-publish,
vs-previous diff + schema drift, atomic visibility, time travel."""

import os

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.corpus import CorpusConfig
from trial_submission_studio_spark.io.versioned import (
    current_version,
    read_version,
    vacuum,
)
from trial_submission_studio_spark.release import release_corpus

CFG = CorpusConfig(
    min_line_words=None,
    min_doc_tokens=2,
    paragraph_max_docs=None,
    substring_w=None,
    exact_dedup=True,
    near_dedup=False,
    contamination_threshold=None,
)

EXPECT = [
    {"check": "not_null", "col": "doc_id"},
    {"check": "unique", "cols": ["doc_id"]},
    {"check": "not_null", "col": "text"},
]


def _docs(spark, n=60, dup_text=False):
    return spark.range(0, n).selectExpr(
        "id AS doc_id",
        (
            "concat('document body number ', CAST(id % 7 AS STRING))"
            if dup_text
            else "concat('document body number ', CAST(id AS STRING))"
        )
        + " AS text",
        "CASE WHEN id % 2 = 0 THEN 'web' ELSE 'books' END AS source",
    )


def test_first_release_publishes_schema_and_stats(spark, tmp_path):
    root = str(tmp_path / "rel")
    out = release_corpus(
        spark, _docs(spark), "doc_id", "text", root,
        config=CFG, expectations=EXPECT, stats_columns=["doc_id"],
    )
    m = out["manifest"]
    assert m["version"] == 1
    assert {f["name"] for f in m["schema"]} == {"doc_id", "text", "source"}
    assert m["stats"]  # zone maps present
    assert out["diff"] is None
    assert all(r["n_violations"] == 0 for r in out["expectations"])
    assert read_version(spark, root).count() == 60


def test_release_diff_vs_previous(spark, tmp_path):
    root = str(tmp_path / "rel")
    release_corpus(spark, _docs(spark, 60), "doc_id", "text", root, config=CFG)
    # second release: 10 docs dropped, 5 new, text changed on %9
    docs2 = (
        _docs(spark, 65)
        .filter(F.col("doc_id") >= 10)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 9 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text")),
        )
    )
    out = release_corpus(spark, docs2, "doc_id", "text", root, config=CFG)
    d = out["diff"]
    assert d["n_removed"] == 10 and d["n_added"] == 5
    assert d["n_changed"] == sum(
        1 for i in range(10, 60) if i % 9 == 0
    )
    # recorded in the manifest too
    assert out["manifest"]["metadata"]["release"]["diff"] == d
    # previous release still time-travels complete
    assert read_version(spark, root, version=1).count() == 60


def test_failed_gate_publishes_nothing(spark, tmp_path):
    root = str(tmp_path / "rel")
    release_corpus(spark, _docs(spark), "doc_id", "text", root, config=CFG)
    bad = _docs(spark, 40).withColumn(
        "text", F.when(F.col("doc_id") == 7, None).otherwise(F.col("text"))
    )
    # exact_dedup would drop the NULL-text row via its fingerprint
    # path before staging; disable stages so the bad row ships to the
    # gate
    cfg = CorpusConfig(
        min_line_words=None, min_doc_tokens=None, paragraph_max_docs=None,
        substring_w=None, exact_dedup=False, near_dedup=False,
        contamination_threshold=None,
    )
    with pytest.raises(RuntimeError, match="release gate failed"):
        release_corpus(
            spark, bad, "doc_id", "text", root, config=cfg,
            expectations=EXPECT,
        )
    assert current_version(root) == 1  # still the first release
    assert read_version(spark, root).count() == 60
    # the staged-but-unpublished bytes are vacuum-able garbage
    doomed = vacuum(root, dry_run=True, min_age_seconds=0)
    assert doomed


def test_schema_drift_between_releases_refused(spark, tmp_path):
    root = str(tmp_path / "rel")
    release_corpus(spark, _docs(spark), "doc_id", "text", root, config=CFG)
    drifted = _docs(spark).withColumn(
        "source", F.col("source").cast("binary")
    )
    with pytest.raises(ValueError, match="type changed: source"):
        release_corpus(spark, drifted, "doc_id", "text", root, config=CFG)
    new_col = _docs(spark).withColumn("lang", F.lit("en"))
    with pytest.raises(ValueError, match="schema drift"):
        release_corpus(spark, new_col, "doc_id", "text", root, config=CFG)
    out = release_corpus(
        spark, new_col, "doc_id", "text", root, config=CFG,
        allow_new_columns=True,
    )
    assert any(f["name"] == "lang" for f in out["manifest"]["schema"])


def test_pipeline_stages_actually_run(spark, tmp_path):
    """exact dedup inside the release: planted duplicate texts
    collapse to min-id survivors before publish."""
    root = str(tmp_path / "rel")
    out = release_corpus(
        spark, _docs(spark, 60, dup_text=True), "doc_id", "text", root,
        config=CFG,
    )
    assert out["manifest"]["n_files"] >= 1
    assert read_version(spark, root).count() == 7  # 7 distinct texts
    ids = {r.doc_id for r in read_version(spark, root).collect()}
    assert ids == set(range(7))  # min-id survivor per text
