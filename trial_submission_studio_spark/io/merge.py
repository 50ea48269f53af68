"""MERGE / upsert / delete on versioned snapshots — copy-on-write at
FILE grain, the Delta-Lake ``MERGE INTO`` shape over the
`io/versioned.py` manifest protocol.

Why file-grain matters at 100 TB: a CDC batch of a few million
changed keys touches a tiny fraction of a corpus's data files. A
naive upsert (full outer join + full rewrite) shuffles and rewrites
ALL 100 TB for a 0.01% change. The table-format answer — Delta,
Iceberg, Hudi copy-on-write — is:

1. find the data files that CONTAIN a matched key (one key-projection
   semi join, with the CDC key set broadcast when small; untouched
   files are never opened beyond their key column),
2. rewrite ONLY those files (anti-join out the matched rows, union
   the new row versions),
3. commit = carry every untouched file forward in the manifest +
   add the fresh files — one atomic pointer swap
   (`versioned.publish_files`), so readers see the old or the new
   snapshot, never a half-merge, and time travel keeps working.

Work scales with |affected data| + |source|, not |table|. The only
driver-side collect is the affected FILE LIST (bounded by the
manifest's file count, metadata-scale).

Reference parity note: the reference's persistence layer
(`/root/reference/crates/tss-persistence`) saves whole projects
atomically but has no record-level merge; this module is part of the
LLM-pipeline extension layer (corpus lifecycle at scale).

Semantics (Delta ``MERGE INTO`` defaults):

- matched target row + source row        -> UPDATE (source replaces)
- source row with no matched target row  -> INSERT
- matched + source ``delete_col`` true   -> DELETE
- source delete row with no match        -> no-op
- two source rows with the same key      -> REFUSED loudly (a
  nondeterministic merge is a corrupted corpus; same as Delta's
  multiple-source-rows-matched error)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import versioned
from .deletion_vectors import FILE_COL, read_with_dv

__all__ = ["merge_version", "delete_matching", "update_where"]


def _parquet_paths(root: str, manifest: dict) -> list[str]:
    files = manifest["files"]
    bad = [f for f in files if not f.endswith(".parquet")]
    if bad:
        raise ValueError(
            f"merge requires an all-parquet snapshot; found {bad[:3]}"
        )
    return [os.path.join(root, f) for f in files]


def _affected_files(
    target_keyed: DataFrame,
    source_keys: DataFrame,
    key_cols: list[str],
    broadcast_keys: bool,
) -> list[str]:
    """Distinct root-relative source files of LIVE target rows whose
    key appears in the source — the copy-on-write rewrite set. The
    target side is a key-column lineage projection (parquet reads
    only the key columns + footer metadata, deletion vectors already
    applied); collect size is bounded by the snapshot's file count."""
    sk = F.broadcast(source_keys) if broadcast_keys else source_keys
    hit = (
        target_keyed.join(sk, key_cols, "left_semi")
        .select(FILE_COL)
        .distinct()
        .collect()
    )
    return sorted(r[FILE_COL] for r in hit)




def merge_version(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    key_cols: str | list[str],
    *,
    version: int | None = None,
    delete_col: str | None = None,
    broadcast_keys: bool | str = "auto",
    verify: bool = True,
    metadata: dict | None = None,
) -> dict:
    """Upsert (and optionally delete) ``source`` rows into the
    CURRENT (or ``version``) snapshot under ``root`` and publish the
    result as a NEW version. Returns the new manifest; its
    ``metadata.merge`` block carries the audit counts
    (``files_rewritten`` / ``files_kept`` / ``rows_updated`` /
    ``rows_inserted`` / ``rows_deleted``).

    ``source`` must carry exactly the target's columns (any order),
    plus ``delete_col`` (boolean; true rows are deletions) if given.
    ``broadcast_keys="auto"`` probes the source key count with an
    early-stopping ``limit(n+1).count()`` (the
    `similarity._resolve_distributed_queries` discipline) and
    broadcasts below 1M keys; pass True/False to force.

    ``verify=True`` additionally checks (a) the source has at most
    one row per key — refused loudly otherwise, because "which update
    wins" would be nondeterministic — and (b) the published row count
    equals the predicted ``old - deleted + inserted`` (counts run
    over the affected slice + source only, never the whole table).
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    m = versioned.read_manifest(root, version)
    all_paths = _parquet_paths(root, m)
    target = spark.read.parquet(*all_paths)
    # bucket-spec'd snapshot (io/bucketed_table.py): the layout is a
    # manifest contract — planning prunes with it below, and the
    # rewrite preserves it
    bspec = m["metadata"].get("bucket_spec")

    # the user-facing schema is the LOGICAL one (column mapping,
    # io/table_schema.py); reads below come back logical and writes
    # translate back to the frozen physical names
    from .table_schema import (
        align_column_types,
        logical_struct,
        to_physical,
    )

    logical_schema = logical_struct(target.schema, m)
    logical_cols = [f.name for f in logical_schema.fields]

    data_cols = [c for c in source.columns if c != delete_col]
    if sorted(data_cols) != sorted(logical_cols):
        raise ValueError(
            "source/target schema mismatch: "
            f"source={sorted(data_cols)} target={sorted(logical_cols)}"
        )
    missing = [k for k in key_cols if k not in data_cols]
    if missing:
        raise ValueError(f"key columns missing from source: {missing}")
    # dtype gate: F.hash (bucket probe) and the rewrite union are
    # both dtype-sensitive — align source columns to the target's
    # exact types (safe widenings cast, anything else refused)
    source = align_column_types(source, logical_schema, context="merge_version")

    if delete_col is not None:
        is_del = F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
        deletes = source.filter(is_del).select(*data_cols)
        upserts = source.filter(~is_del).select(*data_cols)
    else:
        deletes = source.limit(0).select(*[c for c in source.columns if c != delete_col])
        upserts = source

    source_keys = source.select(*key_cols).distinct()
    if broadcast_keys == "auto":
        probe = 1_000_000
        broadcast_keys = source_keys.limit(probe + 1).count() <= probe

    if verify:
        n_src = source.count()
        n_src_keys = source.select(*key_cols).distinct().count()
        if n_src != n_src_keys:
            raise ValueError(
                f"source has {n_src - n_src_keys} duplicate-key rows; "
                "a multi-match merge is nondeterministic — dedupe first"
            )

    # bucket-pruned affected-file probe: when the merge key IS the
    # bucket key, only the buckets the source keys hash to can hold
    # matches — the key-column candidate scan shrinks from O(table)
    # to O(matching buckets), by hash arithmetic alone
    probe_rel = m["files"]
    buckets_probed = None
    if bspec and bspec["key_cols"] == key_cols:
        from .bucketed_table import bucket_files, probe_bucket_ids

        probed = probe_bucket_ids(source_keys, bspec)
        buckets_probed = len(probed)
        probe_rel = bucket_files(m, probed)
    if probe_rel:
        target_keyed = read_with_dv(
            spark, root, m, probe_rel, with_lineage=True
        ).select(*key_cols, FILE_COL)
        affected = _affected_files(
            target_keyed, source_keys, key_cols, bool(broadcast_keys)
        )
    else:
        affected = []
    affected_rel = set(affected)
    kept_rel = [f for f in m["files"] if f not in affected_rel]

    # rows of the affected files that do NOT match a source key are
    # carried into the rewrite verbatim; matched rows are dropped
    # (replaced by the upsert version, or deleted). The rewrite reads
    # LIVE rows — a rewritten file's deletion vectors are folded in
    # here and its dv entries dropped from the new manifest below.
    sk = F.broadcast(source_keys) if broadcast_keys else source_keys
    affected_df = (
        read_with_dv(spark, root, m, affected) if affected else None
    )
    if affected_df is not None:
        survivors = affected_df.join(sk, key_cols, "left_anti")
        out = survivors.unionByName(upserts.select(*logical_cols))
    else:
        out = upserts.select(*logical_cols)

    stats = {"files_rewritten": len(affected_rel), "files_kept": len(kept_rel)}
    if buckets_probed is not None:
        stats["buckets_probed"] = buckets_probed
    if verify:
        if affected_df is not None:
            n_matched = (
                affected_df.select(*key_cols)
                .join(sk, key_cols, "left_semi")
                .count()
            )
        else:
            n_matched = 0
        n_del_src = deletes.count()
        n_del_matched = (
            affected_df.select(*key_cols)
            .join(F.broadcast(deletes.select(*key_cols).distinct())
                  if broadcast_keys else deletes.select(*key_cols).distinct(),
                  key_cols, "left_semi")
            .count()
            if affected_df is not None and n_del_src
            else 0
        )
        n_upserts = n_src - n_del_src
        stats.update(
            rows_deleted=n_del_matched,
            rows_updated=n_matched - n_del_matched,
            rows_inserted=n_upserts - (n_matched - n_del_matched),
        )

    n_out_probe = out.limit(1).count()
    if n_out_probe == 0 and not kept_rel:
        raise ValueError(
            "merge would publish an empty table (all rows deleted); "
            "refusing — retire the table explicitly instead"
        )

    fresh_rel: list[str] = []
    pspec = m["metadata"].get("partition_spec")
    if n_out_probe:
        out = to_physical(
            out.select(*logical_cols), m, context="merge_version"
        )
        if pspec:
            # Hive-partitioned snapshot: rewritten + inserted rows go
            # back under partition (and nested bucket) dirs so the
            # directory pruning contract survives the rewrite
            from .partitioned_table import _write_partitioned_run

            fresh_rel = _write_partitioned_run(out, root, pspec, bspec)
        elif bspec:
            # layout preservation: rewritten + inserted rows go back
            # into __kb=N dirs under the recorded spec (one file per
            # touched bucket), so the table never silently degrades
            # to unbucketed and key-pruned reads stay correct
            from .bucketed_table import _write_bucketed_run

            fresh_rel = _write_bucketed_run(out, root, bspec)
        else:
            run_dir = versioned.new_data_dir(root)
            # keep file granularity comparable to the input: the
            # natural write parallelism is the session's
            # shuffle-partition count, which shatters a few affected
            # files into dozens of tiny outputs — each later
            # merge/scan then pays that fan-out (the in-merge
            # small-files problem)
            out = out.repartition(max(1, len(affected_rel)))
            out.write.mode("overwrite").parquet(run_dir)
            fresh_rel = [
                os.path.relpath(p, root)
                for p in versioned.data_files(run_dir)
            ]
        if verify:
            n_written = spark.read.parquet(
                *[os.path.join(root, f) for f in fresh_rel]
            ).count()
            expected = (
                affected_df.count() if affected_df is not None else 0
            ) - stats["rows_updated"] - stats["rows_deleted"] + (
                stats["rows_updated"] + stats["rows_inserted"]
            )
            if n_written != expected:
                raise RuntimeError(
                    f"merge row-count mismatch: wrote {n_written}, "
                    f"expected {expected}"
                )

    meta = {"merge": {**stats, "base_version": m["version"]},
            **(metadata or {})}
    if bspec:
        meta["bucket_spec"] = bspec
    from .zonemap import stats_like

    # key-dependent commit: auto-rebases over row-preserving
    # maintenance only; a concurrent append/merge may hold rows this
    # merge's key probe never saw -> typed conflict, re-plan + retry
    return versioned.commit_files(
        root,
        base_version=m["version"],
        kind="keyed",
        add_files=fresh_rel,
        remove_files=affected_rel,
        add_stats=stats_like(root, m, fresh_rel, spark=spark),
        metadata=meta,
        spark=spark,
    )


def delete_matching(
    spark: SparkSession,
    root: str,
    keys: DataFrame,
    key_cols: str | list[str],
    *,
    version: int | None = None,
    broadcast_keys: bool | str = "auto",
    verify: bool = True,
    metadata: dict | None = None,
) -> dict:
    """Delete every row whose key appears in ``keys`` (a key-columns
    DataFrame — e.g. a GDPR erasure list or a recalled-source id set)
    and publish the result as a new version. Same copy-on-write
    shape as :func:`merge_version`: only files that contain a doomed
    key are rewritten; the rest ride the manifest."""
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    m = versioned.read_manifest(root, version)
    all_paths = _parquet_paths(root, m)
    target = spark.read.parquet(*all_paths)

    bspec = m["metadata"].get("bucket_spec")
    from .table_schema import (
        align_column_types,
        logical_struct,
        to_physical,
    )

    logical_schema = logical_struct(target.schema, m)
    logical_cols = [f.name for f in logical_schema.fields]
    keys = align_column_types(
        keys, logical_schema, cols=key_cols, context="delete_matching"
    )
    dkeys = keys.select(*key_cols).distinct()
    if broadcast_keys == "auto":
        probe = 1_000_000
        broadcast_keys = dkeys.limit(probe + 1).count() <= probe
    dk = F.broadcast(dkeys) if broadcast_keys else dkeys

    # bucket-pruned probe + layout-preserving rewrite, exactly as in
    # merge_version (the spec is a manifest contract)
    probe_rel = m["files"]
    buckets_probed = None
    if bspec and bspec["key_cols"] == key_cols:
        from .bucketed_table import bucket_files, probe_bucket_ids

        probed = probe_bucket_ids(dkeys, bspec)
        buckets_probed = len(probed)
        probe_rel = bucket_files(m, probed)
    if probe_rel:
        target_keyed = read_with_dv(
            spark, root, m, probe_rel, with_lineage=True
        ).select(*key_cols, FILE_COL)
        affected = _affected_files(
            target_keyed, dkeys, key_cols, bool(broadcast_keys)
        )
    else:
        affected = []
    affected_rel = set(affected)
    kept_rel = [f for f in m["files"] if f not in affected_rel]

    stats = {"files_rewritten": len(affected_rel), "files_kept": len(kept_rel)}
    if buckets_probed is not None:
        stats["buckets_probed"] = buckets_probed
    fresh_rel: list[str] = []
    if affected:
        affected_df = read_with_dv(spark, root, m, affected)
        survivors = affected_df.join(dk, key_cols, "left_anti")
        if verify:
            n_aff = affected_df.count()
            n_doomed = (
                affected_df.select(*key_cols).join(dk, key_cols, "left_semi").count()
            )
            stats["rows_deleted"] = n_doomed
        if survivors.limit(1).count():
            survivors = to_physical(
                survivors.select(*logical_cols), m,
                context="delete_matching",
            )
            pspec = m["metadata"].get("partition_spec")
            if pspec:
                from .partitioned_table import _write_partitioned_run

                fresh_rel = _write_partitioned_run(
                    survivors, root, pspec, bspec
                )
            elif bspec:
                from .bucketed_table import _write_bucketed_run

                fresh_rel = _write_bucketed_run(survivors, root, bspec)
            else:
                run_dir = versioned.new_data_dir(root)
                survivors = survivors.repartition(max(1, len(affected_rel)))
                survivors.write.mode("overwrite").parquet(run_dir)
                fresh_rel = [
                    os.path.relpath(p, root)
                    for p in versioned.data_files(run_dir)
                ]
            if verify:
                n_written = spark.read.parquet(
                    *[os.path.join(root, f) for f in fresh_rel]
                ).count()
                if n_written != n_aff - n_doomed:
                    raise RuntimeError(
                        f"delete row-count mismatch: wrote {n_written}, "
                        f"expected {n_aff - n_doomed}"
                    )
    if not kept_rel and not fresh_rel:
        raise ValueError(
            "delete would publish an empty table; refusing — retire the "
            "table explicitly instead"
        )
    meta = {"merge": {**stats, "base_version": m["version"], "op": "delete"},
            **(metadata or {})}
    if bspec:
        meta["bucket_spec"] = bspec
    from .zonemap import stats_like

    return versioned.commit_files(
        root,
        base_version=m["version"],
        kind="keyed",
        add_files=fresh_rel,
        remove_files=affected_rel,
        add_stats=stats_like(root, m, fresh_rel, spark=spark),
        metadata=meta,
        spark=spark,
    )


def update_where(
    spark: SparkSession,
    root: str,
    predicate: list[tuple],
    set_exprs: dict[str, str],
    *,
    version: int | None = None,
    verify: bool = True,
    metadata: dict | None = None,
) -> dict:
    """``UPDATE ... SET ... WHERE`` at file grain — the third DML
    shape beside :func:`merge_version` and :func:`delete_matching`:

    1. zone maps prune the candidate scan to files that MIGHT hold a
       matching row (`io/zonemap.py` — on a clustered table the vast
       majority of files are never opened),
    2. a lineage probe finds the files that actually contain matches
       (one key-free projection scan of the candidates, deletion
       vectors applied — tombstoned rows never update),
    3. ONLY those files rewrite: matching rows get each ``set_exprs``
       column replaced by its SQL expression (evaluated per row, cast
       back to the column's exact type so the schema contract cannot
       drift), non-matching rows carry verbatim,
    4. one keyed commit through the multi-writer loop (CHECK
       constraints validate the rewritten files; bucket-spec'd
       layouts are preserved; kept files keep stats + tombstones).

    ``predicate`` uses the zonemap conjunct shape. Returns the new
    manifest (``metadata.merge``: ``rows_updated`` /
    ``files_rewritten`` / ``files_pruned``); updating zero rows is a
    no-op returning the current manifest."""
    from .deletion_vectors import POS_COL
    from .zonemap import predicate_to_column, prune_files, stats_like

    from .table_schema import logical_struct, to_physical

    m = versioned.read_manifest(root, version)
    _parquet_paths(root, m)  # all-parquet gate
    target = spark.read.parquet(*[os.path.join(root, f) for f in m["files"]])
    logical_schema = logical_struct(target.schema, m)
    logical_cols = [f.name for f in logical_schema.fields]
    missing = [c for c in set_exprs if c not in logical_cols]
    if missing:
        raise ValueError(f"set columns not in table: {missing}")
    types = {f.name: f.dataType for f in logical_schema.fields}

    pruned = prune_files(m, predicate)
    candidates = pruned["kept"]
    cond = predicate_to_column(predicate)
    if candidates:
        probe = (
            read_with_dv(spark, root, m, candidates, with_lineage=True)
            .filter(cond)
            .select(FILE_COL)
            .distinct()
            .collect()
        )
        affected = sorted(r[FILE_COL] for r in probe)
    else:
        affected = []
    if not affected:
        return m  # nothing matched: no empty commit

    affected_df = read_with_dv(spark, root, m, affected)
    n_updated = affected_df.filter(cond).count()
    out = affected_df
    for col, expr in set_exprs.items():
        out = out.withColumn(
            col,
            F.when(cond, F.expr(expr).cast(types[col])).otherwise(
                F.col(col)
            ),
        )
    out = to_physical(
        out.select(*logical_cols), m, context="update_where"
    )

    bspec = m["metadata"].get("bucket_spec")
    pspec = m["metadata"].get("partition_spec")
    if pspec:
        from .partitioned_table import _write_partitioned_run

        fresh_rel = _write_partitioned_run(out, root, pspec, bspec)
    elif bspec:
        from .bucketed_table import _write_bucketed_run

        fresh_rel = _write_bucketed_run(out, root, bspec)
    else:
        run_dir = versioned.new_data_dir(root)
        out.repartition(max(1, len(affected))).write.mode(
            "overwrite"
        ).parquet(run_dir)
        fresh_rel = [
            os.path.relpath(p, root) for p in versioned.data_files(run_dir)
        ]
    if verify:
        n_aff = affected_df.count()
        n_written = spark.read.parquet(
            *[os.path.join(root, f) for f in fresh_rel]
        ).count()
        if n_written != n_aff:
            raise RuntimeError(
                f"update row-count mismatch: {n_aff} in, {n_written} out"
            )

    meta = {
        "merge": {
            "op": "update",
            "rows_updated": n_updated,
            "files_rewritten": len(affected),
            "files_pruned": len(pruned["skipped"]),
            "files_kept": len(m["files"]) - len(affected),
            "base_version": m["version"],
        },
        **(metadata or {}),
    }
    if bspec:
        meta["bucket_spec"] = bspec
    return versioned.commit_files(
        root,
        base_version=m["version"],
        kind="keyed",
        add_files=fresh_rel,
        remove_files=affected,
        add_stats=stats_like(root, m, fresh_rel, spark=spark),
        metadata=meta,
        spark=spark,
    )
