"""Row-level change feed between versions (io/changefeed.py):
equivalence with a FULL-table diff while scanning only the file
delta; layout-only commits feed nothing."""

import os

from pyspark.sql import functions as F

from trial_submission_studio_spark.io.changefeed import (
    change_feed,
    change_feed_summary,
)
from trial_submission_studio_spark.io.merge import delete_matching, merge_version
from trial_submission_studio_spark.io.versioned import (
    compact_version,
    new_data_dir,
    publish_version,
    read_version,
)
from trial_submission_studio_spark.operators.diff import snapshot_diff


def _docs(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS doc_id", "concat('t-', id) AS text"
    )


def _table(spark, root, n_runs=3, per=100):
    os.makedirs(root, exist_ok=True)
    base = None
    for i in range(n_runs):
        d = new_data_dir(root)
        _docs(spark, i * per, (i + 1) * per).repartition(2).write.parquet(
            d, mode="append"
        )
        base = publish_version(root, d, base_version=base)["version"]
    return base


def _feed(spark, root, v_from, v_to):
    return {
        (r.doc_id, r._change)
        for r in change_feed(spark, root, v_from, v_to, "doc_id").collect()
    }


def _full_diff(spark, root, v_from, v_to):
    """Ground truth: diff the COMPLETE snapshots."""
    d = snapshot_diff(
        read_version(spark, root, v_from),
        read_version(spark, root, v_to),
        ["doc_id"],
    )
    name = {"added": "insert", "removed": "delete", "changed": "update"}
    return {(r.doc_id, name[r.change_type]) for r in d.collect()}


def test_feed_matches_full_diff_across_merge(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = _table(spark, root)
    src = spark.createDataFrame(
        [(5, "UPDATED"), (150, "UPDATED"), (999, "NEW")],
        "doc_id long, text string",
    )
    v2 = merge_version(spark, root, src, "doc_id")["version"]
    assert _feed(spark, root, v1, v2) == _full_diff(spark, root, v1, v2) == {
        (5, "update"), (150, "update"), (999, "insert")
    }
    s = change_feed_summary(spark, root, v1, v2, "doc_id")
    assert (s["n_insert"], s["n_update"], s["n_delete"]) == (1, 2, 0)
    # only the delta files were involved
    assert s["files_untouched"] > 0


def test_feed_across_delete_and_append(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = _table(spark, root)
    doomed = spark.createDataFrame([(3,), (250,)], "doc_id long")
    v2 = delete_matching(spark, root, doomed, "doc_id")["version"]
    d = new_data_dir(root)
    _docs(spark, 300, 320).repartition(1).write.parquet(d, mode="append")
    v3 = publish_version(root, d, base_version=v2)["version"]
    assert _feed(spark, root, v1, v3) == _full_diff(spark, root, v1, v3)
    assert _feed(spark, root, v1, v3) == {(3, "delete"), (250, "delete")} | {
        (i, "insert") for i in range(300, 320)
    }


def test_compaction_feeds_nothing(spark, tmp_path):
    """A pure-layout commit moves rows between files without logical
    change: every moved row digests equal -> empty feed."""
    root = str(tmp_path / "t")
    v1 = _table(spark, root)
    v2 = compact_version(spark, root, target_bytes=1 << 26)["version"]
    assert v2 != v1
    assert _feed(spark, root, v1, v2) == set()
    s = change_feed_summary(spark, root, v1, v2, "doc_id")
    assert s["n_insert"] == s["n_update"] == s["n_delete"] == 0
    assert s["files_removed"] > 0  # it DID rewrite layout


def test_insert_only_and_reverse_direction(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = _table(spark, root, n_runs=1)
    d = new_data_dir(root)
    _docs(spark, 100, 130).repartition(1).write.parquet(d, mode="append")
    v2 = publish_version(root, d, base_version=v1)["version"]
    assert _feed(spark, root, v1, v2) == {
        (i, "insert") for i in range(100, 130)
    }
    # reading the feed BACKWARDS inverts it
    assert _feed(spark, root, v2, v1) == {
        (i, "delete") for i in range(100, 130)
    }
