"""Audited corpus releases: one call that runs the preparation
pipeline, GATES the result (declarative expectations BEFORE anything
becomes visible), and publishes it as an atomic versioned snapshot
with schema contract + zone maps + a release audit — the integration
of the engine's pipeline layer (`corpus.py`) with its table-format
layer (`io/versioned.py`, `io/table_schema.py`, `io/zonemap.py`,
`operators/diff.py`, `operators/expectations.py`).

The release discipline, in order:

1. **prepare** — `corpus.prepare_corpus` with the caller's config.
2. **stage** — write to an immutable, UNPUBLISHED run dir. Nothing
   is visible yet; a crash from here on leaves only vacuum-able
   garbage, never a half-release.
3. **gate** — run the expectation spec against the staged parquet
   (the bytes that would ship, not the logical plan). ANY violation
   aborts the release with the per-check counts in the error; the
   staged dir stays unpublished.
4. **audit** — row-level diff vs the previous release (added /
   removed / changed — `snapshot_diff_summary`), recorded in the
   commit metadata, plus a schema-drift check against the previous
   release's recorded contract (type changes refused; new columns
   only with ``allow_new_columns``).
5. **publish** — one atomic manifest swap carrying the file list,
   the schema contract, and zone-map stats. Readers see the previous
   release or this one, never anything between; every earlier
   release stays time-travelable.

A release REPLACES the corpus (full file list = this run's files) —
the append/CDC shapes live in `streaming/ingest.py` /
`streaming/cdc.py`; release is the periodic "cut a training corpus"
shape where each version is a complete, reproducible artifact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .corpus import CorpusConfig, prepare_corpus
from .io import versioned
from .io.table_schema import schema_violations, snapshot_schema

__all__ = ["release_corpus"]


def release_corpus(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    release_root: str,
    *,
    config: CorpusConfig | None = None,
    expectations: list | None = None,
    stats_columns: list[str] | None = None,
    diff_compare_cols: list[str] | None = None,
    allow_new_columns: bool = False,
    metadata: dict | None = None,
    **prepare_kwargs,
) -> dict:
    """Run, gate, audit, publish. Returns
    ``{"manifest", "expectations", "diff"}`` (``expectations`` the
    per-check counts, ``diff`` the vs-previous summary or None for a
    first release). Raises ``RuntimeError`` with the violating checks
    if the gate fails — nothing is published. ``prepare_kwargs`` pass
    through to `prepare_corpus` (benchmark=, lang_profiles=,
    lm_model=, quality_model=)."""
    corpus = prepare_corpus(
        docs, id_col, text_col, config, **prepare_kwargs
    )

    os.makedirs(release_root, exist_ok=True)
    run_dir = versioned.new_data_dir(release_root)
    corpus.write.mode("overwrite").parquet(run_dir)
    staged = spark.read.parquet(run_dir)

    exp_rows = None
    if expectations:
        from .operators.expectations import expect

        exp_rows = [r.asDict() for r in expect(staged, expectations).collect()]
        bad = [r for r in exp_rows if r["n_violations"] > 0]
        if bad:
            raise RuntimeError(
                "release gate failed; nothing published. Violations: "
                + "; ".join(
                    f"{r['check']}={r['n_violations']}" for r in bad
                )
            )

    fresh = [
        os.path.relpath(p, release_root) for p in versioned.data_files(run_dir)
    ]
    new_schema = snapshot_schema(release_root, fresh)
    prev_version = versioned.current_version(release_root)
    diff = None
    if prev_version is not None:
        prev_m = versioned.read_manifest(release_root, prev_version)
        prev_schema = prev_m.get("schema") or snapshot_schema(
            release_root, prev_m["files"]
        )
        drift = schema_violations(
            prev_schema, new_schema, allow_new_columns=allow_new_columns
        )
        if drift:
            raise ValueError(
                "release schema drift refused:\n  " + "\n  ".join(drift)
            )
        from .operators.diff import snapshot_diff_summary

        prev_df = versioned.read_version(spark, release_root, prev_version)
        compare = diff_compare_cols
        if compare is None:
            compare = [c for c in staged.columns if c != id_col and c in prev_df.columns]
        diff = (
            snapshot_diff_summary(prev_df, staged, [id_col], compare, "md5")
            .first()
            .asDict()
        )

    stats = None
    if stats_columns:
        from .io.zonemap import collect_file_stats

        stats = collect_file_stats(
            release_root, fresh, stats_columns, spark=spark
        )
    meta = {
        "release": {
            "previous_version": prev_version,
            **({"diff": diff} if diff is not None else {}),
            **(
                {"expectations": exp_rows}
                if exp_rows is not None
                else {}
            ),
        },
        **(metadata or {}),
    }
    manifest = versioned.publish_files(
        release_root, fresh, metadata=meta, stats=stats, schema=new_schema
    )
    return {"manifest": manifest, "expectations": exp_rows, "diff": diff}
