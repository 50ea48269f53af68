"""Mergeable sketch tables (operators/sketches.py): HLL / Theta
distinct counts and KLL quantiles, per-shard persist + union rollup.

Gates assert ERROR BOUNDS, not exact values — DataSketches estimates
are stable for a given input but not part of the contract across
library versions (module docstring)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trial_submission_studio_spark.operators.sketches import (
    distinct_sketch_table,
    estimate_distinct,
    estimate_theta_distinct,
    incremental_distinct_rollup,
    merge_distinct_sketch_tables,
    merge_quantile_sketch_tables,
    quantile_sketch_table,
    sketch_quantiles,
    theta_sketch_table,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "text", "n_chars"
    )


def _exact_by_lang(docs, col):
    return {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang")
        .agg(F.countDistinct(col).alias("n"))
        .collect()
    }


def test_hll_estimate_within_error(spark, docs):
    exact = _exact_by_lang(docs, "text")
    est = {
        r["lang"]: r["distinct_est"]
        for r in estimate_distinct(
            distinct_sketch_table(docs, ["lang"], "text")
        ).collect()
    }
    assert est.keys() == exact.keys()
    for lang, n in exact.items():
        assert abs(est[lang] - n) <= max(0.05 * n, 2), (lang, est[lang], n)


def test_hll_shard_merge_matches_full(spark, docs):
    """Sketch three disjoint shards, union the sketch tables — the
    rollup must agree with sketching the full corpus in one pass
    (registers union by max, so the estimates coincide) and with the
    exact count within error."""
    shards = [
        distinct_sketch_table(
            docs.filter(F.col("doc_id") % 3 == i), ["lang"], "text"
        )
        for i in range(3)
    ]
    merged = estimate_distinct(
        merge_distinct_sketch_tables(shards, ["lang"])
    )
    full = estimate_distinct(distinct_sketch_table(docs, ["lang"], "text"))
    m = {r["lang"]: r["distinct_est"] for r in merged.collect()}
    f = {r["lang"]: r["distinct_est"] for r in full.collect()}
    exact = _exact_by_lang(docs, "text")
    assert m.keys() == f.keys() == exact.keys()
    for lang in f:
        assert abs(m[lang] - f[lang]) <= max(0.01 * f[lang], 1), lang
        assert abs(m[lang] - exact[lang]) <= max(0.05 * exact[lang], 2)


def test_incremental_distinct_rollup(spark, docs):
    """Cold start on day-1 slice, roll day-2 in; final estimate must
    track the union's exact distinct, and the state stays one row per
    group."""
    day1 = docs.filter(F.col("doc_id") % 2 == 0)
    day2 = docs.filter(F.col("doc_id") % 2 == 1)
    state = incremental_distinct_rollup(day1, None, ["lang"], "text")
    state = incremental_distinct_rollup(day2, state, ["lang"], "text")
    est = {
        r["lang"]: r["distinct_est"]
        for r in estimate_distinct(state).collect()
    }
    exact = _exact_by_lang(docs, "text")
    assert est.keys() == exact.keys()
    n_groups = state.count()
    assert n_groups == len(exact)
    for lang, n in exact.items():
        assert abs(est[lang] - n) <= max(0.05 * n, 2), lang


def test_theta_estimate_within_error(spark, docs):
    exact = _exact_by_lang(docs, "text")
    est = {
        r["lang"]: r["distinct_est"]
        for r in estimate_theta_distinct(
            theta_sketch_table(docs, ["lang"], "text")
        ).collect()
    }
    for lang, n in exact.items():
        assert abs(est[lang] - n) <= max(0.05 * n, 2), (lang, est[lang], n)


def _rank_of(docs, lang, value):
    n, le = (
        docs.filter(F.col("lang") == lang)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("n_chars").cast("double") <= value, 1).otherwise(0)
            ).alias("le"),
        )
        .first()
    )
    return le / n


def test_kll_quantiles_within_rank_error(spark, docs):
    qt = sketch_quantiles(
        quantile_sketch_table(docs, ["lang"], "n_chars"), [0.5, 0.9]
    )
    for r in qt.collect():
        p50, p90 = r["quantiles"]
        assert 0.40 <= _rank_of(docs, r["lang"], p50) <= 0.60, r["lang"]
        assert 0.80 <= _rank_of(docs, r["lang"], p90) <= 1.0, r["lang"]


def test_kll_shard_merge_matches_full(spark, docs):
    shards = [
        quantile_sketch_table(
            docs.filter(F.col("doc_id") % 3 == i), ["lang"], "n_chars"
        )
        for i in range(3)
    ]
    merged = sketch_quantiles(
        merge_quantile_sketch_tables(shards, ["lang"]), [0.5]
    )
    for r in merged.collect():
        assert 0.40 <= _rank_of(docs, r["lang"], r["quantiles"][0]) <= 0.60, (
            r["lang"]
        )


def test_merge_validations():
    with pytest.raises(ValueError):
        merge_distinct_sketch_tables([], ["lang"])
    with pytest.raises(ValueError):
        merge_quantile_sketch_tables([], ["lang"])


def test_heavy_hitters_exact_under_capacity(spark):
    from trial_submission_studio_spark.operators.sketches import heavy_hitters

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "lang", "source"
    )
    got = heavy_hitters(d, ["lang"], "source", k=3).collect()
    exact = {
        (r.lang, r.source): r.cnt
        for r in d.groupBy("lang", "source").agg(F.count("*").alias("cnt")).collect()
    }
    by_lang = {}
    for r in got:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rows in by_lang.items():
        rows = sorted(rows, key=lambda r: r.rank)
        assert len(rows) <= 3
        # under capacity the sketch is exact: counts match groupBy
        for r in rows:
            assert exact[(lang, r.item)] == r["count"]
        # ranked by true frequency, descending
        counts = [r["count"] for r in rows]
        assert counts == sorted(counts, reverse=True)
        # rank-1 really is the mode of that language
        lang_counts = {s: c for (lg, s), c in exact.items() if lg == lang}
        assert lang_counts[rows[0].item] == max(lang_counts.values())


def test_heavy_hitters_shard_merge_matches_full_pass(spark):
    from trial_submission_studio_spark.operators.sketches import (
        heavy_hitters,
        heavy_hitters_sketch_table,
        merge_heavy_hitters,
    )

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    shards = [d.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    tables = [
        heavy_hitters_sketch_table(s, ["lang"], "source") for s in shards
    ]
    merged = merge_heavy_hitters(tables, ["lang"], k=3).collect()
    full = heavy_hitters(d, ["lang"], "source", k=3).collect()
    # rank order among TIED counts is sketch-internal — compare the
    # count sequences (tie-agnostic) and verify counts are exact
    def count_seq(rows):
        out = {}
        for r in sorted(rows, key=lambda r: (r.lang, r.rank)):
            out.setdefault(r.lang, []).append(r["count"])
        return out

    assert count_seq(merged) == count_seq(full)
    exact = {
        (r.lang, r.source): r.cnt
        for r in d.groupBy("lang", "source").agg(F.count("*").alias("cnt")).collect()
    }
    for r in merged:
        assert exact[(r.lang, r.item)] == r["count"]
