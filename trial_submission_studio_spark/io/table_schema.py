"""Schema capture and commit-time enforcement for versioned
snapshots — the third leg of the table-format discipline
(`io/versioned.py` gives ACID commits, `io/zonemap.py` gives data
skipping; this gives Delta-style schema enforcement).

Why commit-time, not read-time: an append whose files drifted
(a column renamed upstream, an int widened to string by a CSV hiccup)
is cheap to reject at PUBLISH — one footer read per new file — and
catastrophically expensive to discover at READ, where Spark's parquet
schema merge either throws mid-query hours later or silently NULLs
the column that changed name. The contract: a snapshot's schema is
recorded in its manifest; every subsequent append must match it
exactly, or declare evolution explicitly (`allow_new_columns` — the
only always-safe evolution: old files read the new column as NULL).

All schema reads are parquet FOOTERS via pyarrow — metadata-scale,
no Spark job, distributable through the same zonemap fan-out if ever
needed.
"""

from __future__ import annotations

import os

from . import versioned

__all__ = [
    "file_schema",
    "snapshot_schema",
    "schema_violations",
    "publish_checked",
    "align_column_types",
]

#: Safe numeric widenings (value-preserving casts). Anything not
#: listed must match the target type EXACTLY or the cast is refused.
_WIDENS = {
    "tinyint": {"smallint", "int", "bigint"},
    "smallint": {"int", "bigint"},
    "int": {"bigint"},
    "float": {"double"},
}


def align_column_types(df, target_schema, *, cols=None, context="merge"):
    """Cast ``df``'s columns to the target snapshot's EXACT Spark
    dtypes, refusing anything but a value-preserving numeric widening.

    Why this is a correctness gate, not a convenience: bucket pruning
    hashes probe keys with ``F.hash``, which is dtype-sensitive —
    ``hash(5 INT) != hash(5 BIGINT)`` — so an int-keyed source probing
    a bigint-keyed table would scan the WRONG buckets and silently
    miss its matches (merge inserts a duplicate instead of updating;
    delete/read_key_pruned drop rows). And on the write side, a
    source column narrower than the table's would drift the parquet
    schema across files. Exact-match columns pass through untouched;
    ``_WIDENS`` pairs are cast; everything else raises naming the
    offending columns.

    ``cols`` limits the check to a subset (e.g. just the key columns
    of a probe frame); default is every ``df`` column present in the
    target schema. Non-target columns (e.g. a merge ``delete_col``)
    pass through untouched.
    """
    from pyspark.sql import functions as F

    tmap = {f.name: f.dataType for f in target_schema.fields}
    smap = {f.name: f.dataType for f in df.schema.fields}
    check = [c for c in (cols if cols is not None else df.columns) if c in tmap]
    bad, casts = [], {}
    for c in check:
        src, dst = smap[c], tmap[c]
        if src == dst:
            continue
        s, d = src.simpleString(), dst.simpleString()
        if d in _WIDENS.get(s, ()):
            casts[c] = dst
        else:
            bad.append(f"{c}: source {s} vs target {d}")
    if bad:
        raise ValueError(
            f"{context}: column dtype mismatch with the target snapshot "
            "(a coerced key would hash to the wrong bucket; a narrowed "
            "write would drift the table schema) — cast explicitly or "
            "fix the source:\n  " + "\n  ".join(bad)
        )
    if casts:
        df = df.select(
            *[
                F.col(c).cast(casts[c]).alias(c) if c in casts else F.col(c)
                for c in df.columns
            ]
        )
    return df


def file_schema(path: str) -> list[dict]:
    """One parquet file's logical schema from its footer:
    ``[{"name", "type", "nullable"}, ...]`` in file order. Types are
    Arrow type strings (``int64``, ``string``, ``timestamp[us]``,
    ``list<item: float>``...) — stable, comparable text."""
    import pyarrow.parquet as pq

    sch = pq.ParquetFile(path).schema_arrow
    return [
        {"name": f.name, "type": str(f.type), "nullable": f.nullable}
        for f in sch
    ]


def snapshot_schema(root: str, files: list[str]) -> list[dict]:
    """The single schema shared by every file in the list; raises
    ``ValueError`` naming the first divergent file if they disagree
    (column ORDER is allowed to differ across files — parquet readers
    resolve by name; name/type/nullability are not)."""
    if not files:
        raise ValueError("no files")
    ref = None
    ref_file = None
    for rel in files:
        s = sorted(file_schema(os.path.join(root, rel)), key=lambda f: f["name"])
        if ref is None:
            ref, ref_file = s, rel
        elif s != ref:
            raise ValueError(
                f"inconsistent schemas within snapshot: {rel} differs "
                f"from {ref_file}"
            )
    return ref


def schema_violations(
    base: list[dict], new: list[dict], *, allow_new_columns: bool = False
) -> list[str]:
    """Why ``new`` may not be appended to a table whose recorded
    schema is ``base`` — empty list means compatible. Checks, per
    column name: presence both ways, exact type text, and nullability
    (a nullable base column may NOT become non-nullable silently —
    that's fine data-wise but means the writer changed; surfacing it
    is the point — while a non-nullable base column becoming nullable
    is a real read hazard and always flagged)."""
    b = {f["name"]: f for f in base}
    n = {f["name"]: f for f in new}
    out = []
    for name in sorted(set(b) - set(n)):
        out.append(f"column dropped: {name}")
    for name in sorted(set(n) - set(b)):
        if not allow_new_columns:
            out.append(
                f"new column: {name} (pass allow_new_columns=True to "
                "evolve — old files will read it as NULL)"
            )
    for name in sorted(set(b) & set(n)):
        if b[name]["type"] != n[name]["type"]:
            out.append(
                f"type changed: {name} {b[name]['type']} -> "
                f"{n[name]['type']}"
            )
        elif b[name]["nullable"] != n[name]["nullable"]:
            out.append(
                f"nullability changed: {name} "
                f"{b[name]['nullable']} -> {n[name]['nullable']}"
            )
    return out


def publish_checked(
    root: str,
    run_dirs: str | list[str],
    *,
    base_version: int | None = None,
    allow_new_columns: bool = False,
    metadata: dict | None = None,
    stats_columns: list[str] | None = None,
    spark=None,
) -> dict:
    """`versioned.publish_version` with the schema gate in front:

    - the new run dirs' files must agree with EACH OTHER,
    - and (when appending onto ``base_version``) with the base
      snapshot's recorded schema — or, for pre-guard tables without
      one, with the base files' actual footers.

    The published manifest records the snapshot schema under a
    top-level ``"schema"`` key, so later appends check against the
    recorded contract without touching old files. When
    ``stats_columns`` is given, zone maps ride the same commit
    (`io/zonemap.py`)."""
    if isinstance(run_dirs, str):
        run_dirs = [run_dirs]
    fresh: list[str] = []
    for rd in run_dirs:
        rel = [os.path.relpath(p, root) for p in versioned.data_files(rd)]
        if not rel:
            raise ValueError(f"no data files under {rd}")
        fresh.extend(rel)
    new_schema = snapshot_schema(root, fresh)

    schema = new_schema
    if base_version is not None:
        base = versioned.read_manifest(root, base_version)
        base_schema = base.get("schema") or snapshot_schema(
            root, base["files"]
        )
        bad = schema_violations(
            base_schema, new_schema, allow_new_columns=allow_new_columns
        )
        if bad:
            raise ValueError(
                "schema-incompatible append refused:\n  " + "\n  ".join(bad)
            )
        if allow_new_columns:
            merged = {f["name"]: f for f in base_schema}
            merged.update({f["name"]: f for f in new_schema})
            schema = sorted(merged.values(), key=lambda f: f["name"])
        else:
            schema = base_schema
    fresh_stats = None
    if stats_columns is not None:
        from .zonemap import collect_file_stats

        fresh_stats = collect_file_stats(root, fresh, stats_columns, spark=spark)
    if base_version is not None:
        # the multi-writer commit loop: carried files keep the
        # CURRENT manifest's stats + deletion vectors; the append
        # auto-rebases over concurrent commits
        return versioned.commit_files(
            root,
            base_version=base_version,
            kind="append",
            add_files=fresh,
            add_stats=fresh_stats,
            metadata=metadata,
            schema=schema,
            spark=spark,
        )
    return versioned.publish_files(
        root,
        fresh,
        metadata=metadata,
        stats=fresh_stats or None,
        schema=schema,
    )
