"""Hive-style partition directories as the THIRD layout tool of the
table format — beside hash buckets (`io/bucketed_table.py`) and
Z-order clustering (`io/zonemap.py:optimize_version`), recorded as
the same kind of manifest contract (``partition_spec``).

What directory partitioning buys at 100 TB (and the other two
don't): the partition VALUE is readable from the file PATH alone, so

- **reads prune with zero footer harvesting** — even a table that
  never ran ``collect_file_stats`` skips whole ``day=`` directories
  by string-parsing its manifest entries (the pseudo-stats below);
- **retention deletes become pure directory-grain metadata** —
  ``delete_where([("day", "<", cutoff)])`` drops every provably-
  matching file without opening one, because a partition dir is an
  EXACT zone (min == max == the dir value, zero nulls), not an
  approximate one.

Layout choice, stated plainly: the partition column is DUPLICATED
into the directory name under an aux key (``__p_day=<v>/``) while the
real column stays IN the file bytes. Spark's ``partitionBy`` strips
the partition column from file contents, which would make every
rewrite path (merge, compaction, clone publish) partition-aware and
turn a plain file-list read into a basePath-coupled one; writing the
aux copy instead costs ~nothing (an RLE constant column compresses
to bytes) and keeps EVERY existing reader and rewriter correct with
no changes — a rewritten file merely loses its directory pruning and
falls back to ordinary zone maps, never loses data.

The pruning mechanism is zone-map reuse, not a parallel engine:
:func:`partition_pseudo_stats` turns each file's ``__p_<col>=<val>``
path segments into exact per-file column stats, and
`io/zonemap.py:prune_files` / ``split_files_for_delete`` merge them
with any real footer stats — so partition pruning, bucket pruning
(``__kb=N`` dirs compose inside partition dirs) and zone maps all
shrink the same explicit file list before Spark plans a scan.

Value typing is inference-with-a-safe-direction: dir strings parse
as int, ISO date, ISO timestamp, or str; a predicate literal whose
domain disagrees with the inferred tag makes the comparison raise
inside the zone-map machinery, which treats it as "unknown —
cannot prune / cannot drop". A mis-typed partition value can cost
speed, never rows.
"""

from __future__ import annotations

import datetime as _dt
import os
import urllib.parse
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import versioned as _ver

__all__ = [
    "PART_PREFIX",
    "partition_spec",
    "publish_partitioned",
    "append_partitioned",
    "repartition_spec",
    "merged_partition_spec",
    "partition_values",
    "partition_pseudo_stats",
]

#: aux directory-key prefix — keeps the dir name space disjoint from
#: real column names so partition discovery can never collide with a
#: data column on a plain read
PART_PREFIX = "__p_"

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _canon_spec(cols) -> dict:
    cols = [cols] if isinstance(cols, str) else list(cols)
    if not cols:
        raise ValueError("need at least one partition column")
    return {"cols": cols}


def partition_spec(root: str, version: int | None = None) -> dict | None:
    """The recorded spec, or None for an unpartitioned table."""
    if _ver.current_version(root) is None:
        return None
    return _ver.read_manifest(root, version)["metadata"].get(
        "partition_spec"
    )


def _write_partitioned_run(
    df: DataFrame, root: str, spec: dict, bucket_spec: dict | None = None
) -> list[str]:
    """One run of ``__p_c=v/.../part-*.parquet`` files under a fresh
    data dir; the real columns (including the partition columns) stay
    in the file bytes — only the AUX copies feed ``partitionBy``.
    With ``bucket_spec`` the hash-bucket dirs nest INSIDE the
    partition dirs (the Hive partition/bucket layout proper), so both
    path prunes compose on the same manifest entries."""
    cols = spec["cols"]
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"partition columns not in frame: {missing}")
    aux = [F.col(c).alias(PART_PREFIX + c) for c in cols]
    part_keys = [PART_PREFIX + c for c in cols]
    out = df.select("*", *aux)
    order: list[str] = []
    if bucket_spec is not None:
        from .bucketed_table import BUCKET_COL, bucket_id

        out = out.withColumn(
            BUCKET_COL,
            bucket_id(bucket_spec["key_cols"], bucket_spec["n_buckets"]),
        )
        part_keys = part_keys + [BUCKET_COL]
        # within-bucket sort order travels with the bucket spec, so
        # per-file min/max stay tight inside composed layouts too
        order = list(
            bucket_spec.get("sort_cols") or bucket_spec["key_cols"]
        )
    run_dir = _ver.new_data_dir(root)
    (
        out.repartition(*[F.col(k) for k in part_keys])
        .sortWithinPartitions(*part_keys, *order)
        .write.partitionBy(*part_keys)
        .mode("overwrite")
        .parquet(run_dir)
    )
    return sorted(
        os.path.relpath(p, root) for p in _ver.data_files(run_dir)
    )


def publish_partitioned(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    cols: str | Sequence[str],
    *,
    bucket_key: str | Sequence[str] | None = None,
    n_buckets: int | None = None,
    stats_columns: list[str] | None = None,
    metadata: dict | None = None,
) -> dict:
    """Write ``df`` under Hive-style partition directories on
    ``cols`` and commit a version recording the ``partition_spec``
    contract. ``bucket_key``/``n_buckets`` additionally hash-bucket
    WITHIN each partition (both specs recorded; point lookups prune
    by partition dir, then bucket dir, then zone map). Re-publishing
    over an existing root with a different spec is refused."""
    spec = _canon_spec(cols)
    bspec = None
    if bucket_key is not None:
        if n_buckets is None:
            raise ValueError("bucket_key needs n_buckets")
        from .bucketed_table import _canon_spec as _canon_bucket

        bspec = _canon_bucket(bucket_key, n_buckets)
        overlap = set(bspec["key_cols"]) & set(spec["cols"])
        if overlap:
            raise ValueError(
                f"columns cannot be both partition and bucket key: "
                f"{sorted(overlap)} (a partition dir holds ONE value — "
                "bucketing it is a no-op that just fragments files)"
            )
    prev = partition_spec(root) if _ver.current_version(root) else None
    if prev is not None and prev != spec:
        raise ValueError(
            f"partition spec changed (recorded {prev}, got {spec}); "
            "repartition under a fresh root"
        )
    if _ver.current_version(root) is not None:
        prev_b = _ver.read_manifest(root)["metadata"].get("bucket_spec")
        if prev_b != bspec:
            # the mirror of publish_bucketed's guard: silently
            # stripping or swapping the nested bucket contract would
            # degrade key-pruned reads without an error
            raise ValueError(
                f"bucket spec changed (recorded {prev_b}, got {bspec}); "
                "rebucket under a fresh root"
            )
    os.makedirs(root, exist_ok=True)
    files = _write_partitioned_run(df, root, spec, bspec)
    meta = {**(metadata or {}), "partition_spec": spec}
    if bspec:
        meta["bucket_spec"] = bspec
    stats = None
    if stats_columns:
        from .zonemap import collect_file_stats

        stats = collect_file_stats(root, files, stats_columns, spark=spark)
    return _ver.publish_files(root, files, metadata=meta, stats=stats)


def append_partitioned(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    *,
    metadata: dict | None = None,
) -> dict:
    """Append a new run under the RECORDED partition (and bucket)
    spec through the multi-writer commit loop."""
    spec = partition_spec(root)
    if spec is None:
        raise ValueError(f"{root} carries no partition_spec")
    m = _ver.read_manifest(root)
    bspec = m["metadata"].get("bucket_spec")
    base_v = m["version"]
    files = _write_partitioned_run(df, root, spec, bspec)
    meta = {**(metadata or {}), "partition_spec": spec}
    if bspec:
        meta["bucket_spec"] = bspec
    stats = None
    base_stats = m.get("stats")
    if base_stats:
        from .zonemap import stats_like

        stats = stats_like(root, m, files, spark=spark)
    return _ver.commit_files(
        root,
        base_version=base_v,
        kind="append",
        add_files=files,
        add_stats=stats,
        metadata=meta,
        spark=spark,
    )


def repartition_spec(
    spark: SparkSession,
    root: str,
    cols: str | Sequence[str] | None,
    *,
    metadata: dict | None = None,
) -> dict:
    """Iceberg-style PARTITION SPEC EVOLUTION on a live table: one
    metadata-only maintenance commit switches the recorded spec (or
    drops it with ``cols=None``). Not a rewrite — existing files keep
    their old ``__p_`` directory layout and keep pruning through it
    (pseudo-stats are parsed from each file's OWN path segments, not
    the current spec), while :func:`append_partitioned` writes new
    runs under the new layout. ``delete_where`` therefore still drops
    whole directories of BOTH generations, and point lookups prune
    each file by whichever layout it actually has; a file matching
    neither simply falls back to its footer zone maps — pruning can
    lose opportunity across an evolution, never rows.

    The superseded spec is appended to ``partition_spec_history``
    (carried by every later commit), so audits and the ``partitions``
    metadata view can still name old-generation values."""
    new = _canon_spec(cols) if cols is not None else None
    m = _ver.read_manifest(root)
    old = m["metadata"].get("partition_spec")
    if old == new:
        raise ValueError(f"partition spec unchanged: {new}")
    bspec = m["metadata"].get("bucket_spec")
    if new and bspec:
        overlap = set(bspec["key_cols"]) & set(new["cols"])
        if overlap:
            raise ValueError(
                "columns cannot be both partition and bucket key: "
                f"{sorted(overlap)}"
            )
    cm = m.get("column_mapping")
    known = (
        set(cm)
        if cm
        else (
            {f["name"] for f in m["schema"]} if m.get("schema") else None
        )
    )
    if new and known is not None:
        missing = [c for c in new["cols"] if c not in known]
        if missing:
            raise ValueError(
                f"partition columns not in the table schema: {missing}"
            )
    history = list(m["metadata"].get("partition_spec_history") or [])
    if old is not None and old not in history:
        history.append(old)
    meta = {
        **(metadata or {}),
        "repartition_spec": {"from": old, "to": new},
        # explicit None DROPS the contract: commit_files's layout
        # carry skips keys already present in the commit's metadata
        "partition_spec": new,
    }
    if history:
        meta["partition_spec_history"] = history
    if bspec:
        meta["bucket_spec"] = bspec
    return _ver.commit_files(
        root,
        base_version=m["version"],
        kind="maintenance",
        metadata=meta,
        spark=spark,
    )


def merged_partition_spec(manifest: dict) -> dict | None:
    """The union of the current spec and every superseded one (spec
    evolution) — what path-derived views parse with, so files of any
    generation resolve their own layout. None when the table never
    had a spec."""
    md = manifest["metadata"]
    cur = md.get("partition_spec")
    cols = list(cur["cols"]) if cur else []
    for h in md.get("partition_spec_history") or ():
        for c in h["cols"]:
            if c not in cols:
                cols.append(c)
    return {"cols": cols} if cols else None


def partition_values(rel_path: str, spec: dict) -> dict:
    """{col: raw string value (URL-decoded) | None} parsed from one
    manifest entry's ``__p_<col>=<val>`` path segments; cols whose
    segment is absent (e.g. a rewritten file that lost its layout)
    are omitted entirely."""
    out: dict = {}
    want = {PART_PREFIX + c: c for c in spec["cols"]}
    for seg in rel_path.split("/"):
        if "=" not in seg:
            continue
        k, _, v = seg.partition("=")
        col = want.get(k)
        if col is None:
            continue
        v = urllib.parse.unquote(v)
        out[col] = None if v == _HIVE_NULL else v
    return out


def _typed(v: str) -> tuple[str, object] | None:
    """(zone-map type tag, typed value) inferred from a partition dir
    string — the same tag/coercion domain `io/zonemap.py` compares
    in. None = don't claim stats for this value (safe: scan)."""
    try:
        return ("int", int(v))
    except ValueError:
        pass
    try:
        return ("date", _dt.date.fromisoformat(v).isoformat())
    except ValueError:
        pass
    try:
        return (
            "timestamp",
            _dt.datetime.fromisoformat(v.replace(" ", "T")).isoformat(),
        )
    except ValueError:
        pass
    if len(v) <= 64:  # MAX_STRING_STAT discipline
        return ("str", v)
    return None


def table_partitions(
    spark: SparkSession, root: str, version: int | None = None
) -> "DataFrame":
    """Iceberg's ``partitions`` metadata table: one row per distinct
    partition value tuple — file count, known row count (NULL when no
    stats), and tombstoned rows. Manifest-only; the operational
    answer to "which days are how big" with zero data reads."""
    import json as _json

    m = _ver.read_manifest(root, version)
    # merged spec: under evolution, old-generation files group by
    # their own (superseded) layout instead of collapsing into "{}" —
    # and a table whose CURRENT spec was dropped (repartition_spec(
    # root, None)) still answers from its spec history, as the
    # docstring promises
    spec = merged_partition_spec(m)
    if spec is None:
        raise ValueError(f"{root} carries no partition_spec")
    stats = m.get("stats") or {}
    dv = m.get("dv") or {}
    agg: dict = {}
    for f in m["files"]:
        key = _json.dumps(partition_values(f, spec), sort_keys=True)
        e = agg.setdefault(key, [0, 0, 0, True])
        e[0] += 1
        nr = (stats.get(f) or {}).get("num_rows")
        if nr is None:
            e[3] = False
        else:
            e[1] += nr
        e[2] += dv.get(f, {}).get("rows", 0)
    rows = [
        (k, e[0], e[1] if e[3] else None, e[2])
        for k, e in sorted(agg.items())
    ]
    from trial_submission_studio_spark.sources.local import values_df

    return values_df(
        spark,
        rows,
        "partition string, n_files long, num_rows long, dv_rows long",
    )


def partition_pseudo_stats(manifest: dict) -> dict:
    """Per-file EXACT zone-map entries derived from partition dir
    names alone (min == max == the dir value, zero nulls) — the
    bridge that lets `io/zonemap.py` prune and `delete_where` drop
    whole partitions with no footer ever read. Each file is parsed
    against its OWN ``__p_`` segments (the prefix reserves the name
    space), so under spec evolution old-generation files keep pruning
    on their old layout while new files prune on the new one. Files
    without any layout (rewritten by a non-partition-aware commit)
    contribute nothing and fall back to their real stats."""
    spec = merged_partition_spec(manifest)
    if not spec:
        return {}
    out: dict = {}
    for f in manifest["files"]:
        vals = partition_values(f, spec)
        cols = {}
        for c, raw in vals.items():
            if raw is None:
                continue  # all-null dir: claim nothing (isnull keeps)
            t = _typed(raw)
            if t is not None:
                cols[c] = {"t": t[0], "min": t[1], "max": t[1], "nulls": 0}
        if cols:
            out[f] = {"columns": cols}
    return out
