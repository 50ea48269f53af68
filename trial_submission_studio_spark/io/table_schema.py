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
    "column_mapping",
    "to_logical",
    "to_physical",
    "logical_struct",
    "rename_column",
    "drop_column",
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


def column_mapping(manifest: dict) -> dict | None:
    """The manifest's logical->physical column map (Delta
    column-mapping shape), or None for an unmapped table. Physical
    names are frozen at first write; :func:`rename_column` /
    :func:`drop_column` edit only this map — zero data rewrites.
    Dict order IS the logical column order readers present."""
    return manifest.get("column_mapping") or None


def to_logical(df, manifest: dict, *, keep: tuple = ()):
    """Project a PHYSICAL frame (raw parquet read) to the table's
    LOGICAL schema per the manifest's column mapping — identity for
    unmapped tables. A live physical column absent from ``df``
    (a column added by evolution after some files were written)
    null-fills. ``keep`` passes lineage columns (``__tss_file`` /
    ``__tss_pos``) through unmapped."""
    cm = column_mapping(manifest)
    if not cm:
        return df
    from pyspark.sql import functions as F

    cols = [
        (F.col(ph) if ph in df.columns else F.lit(None)).alias(lg)
        for lg, ph in cm.items()
    ]
    cols += [F.col(c) for c in keep if c in df.columns]
    return df.select(*cols)


def to_physical(df, manifest: dict, *, context: str = "write"):
    """Rename a LOGICAL frame's columns back to their frozen PHYSICAL
    names for writing data files — the discipline that keeps every
    file on disk in one (physical) name space regardless of renames.
    Identity for unmapped tables; refuses columns the mapping does
    not know (a silent passthrough would fork the name space)."""
    cm = column_mapping(manifest)
    if not cm:
        return df
    from pyspark.sql import functions as F

    unknown = [c for c in df.columns if c not in cm]
    if unknown:
        raise ValueError(
            f"{context}: columns not in the table's column mapping "
            f"(logical names are {sorted(cm)}): {unknown}"
        )
    return df.select(
        *[F.col(lg).alias(ph) for lg, ph in cm.items() if lg in df.columns]
    )


def logical_struct(physical_schema, manifest: dict):
    """The LOGICAL Spark StructType corresponding to a physical file
    schema under the manifest's mapping (identity when unmapped) —
    what dtype gates compare user frames against."""
    cm = column_mapping(manifest)
    if not cm:
        return physical_schema
    from pyspark.sql.types import StructField, StructType

    fields = {f.name: f for f in physical_schema.fields}
    out = []
    for lg, ph in cm.items():
        if ph in fields:
            f = fields[ph]
            out.append(StructField(lg, f.dataType, f.nullable))
    return StructType(out)


def _live_mapping(root: str, manifest: dict) -> dict:
    """The table's current mapping, initializing the identity map
    from the recorded (or footer) schema for a pre-mapping table."""
    cm = column_mapping(manifest)
    if cm:
        return dict(cm)
    sch = manifest.get("schema") or snapshot_schema(
        root, manifest["files"]
    )
    return {f["name"]: f["name"] for f in sch}


def _guard_layout_and_constraints(
    manifest: dict, col: str, op: str
) -> None:
    """Refuse renaming/dropping a column the table's OTHER contracts
    lean on: bucket-spec key/sort columns (the hash layout and its
    pruning arithmetic are keyed by physical=logical name today) and
    CHECK constraint expressions (rewriting SQL text is not a
    metadata operation — drop and re-add the constraint instead)."""
    import re

    bspec = manifest["metadata"].get("bucket_spec") or {}
    if col in bspec.get("key_cols", ()) or col in bspec.get(
        "sort_cols", ()
    ):
        raise ValueError(
            f"cannot {op} {col!r}: it is a bucket-spec key/sort column "
            "(the layout contract is keyed by this name); rebucket "
            "under a fresh root instead"
        )
    pspec = manifest["metadata"].get("partition_spec") or {}
    if col in pspec.get("cols", ()):
        raise ValueError(
            f"cannot {op} {col!r}: it is a partition-spec column (the "
            "directory layout is keyed by this name); repartition "
            "under a fresh root instead"
        )
    pat = re.compile(rf"\b{re.escape(col)}\b")
    hit = sorted(
        n for n, e in (manifest.get("constraints") or {}).items()
        if pat.search(e)
    )
    if hit:
        raise ValueError(
            f"cannot {op} {col!r}: CHECK constraints reference it "
            f"({hit}); drop those constraints first and re-add them "
            "against the new name"
        )


def rename_column(spark, root: str, old: str, new: str) -> dict:
    """Rename a LOGICAL column without touching a byte of data
    (Delta ``RENAME COLUMN`` under column mapping): one maintenance
    commit updating the manifest's logical->physical map. Old
    versions keep their own map, so time travel reads the old name
    at old versions; zone maps, deletion vectors and bucket layouts
    are keyed by physical names and are untouched."""
    m = versioned.read_manifest(root)
    cm = _live_mapping(root, m)
    if old not in cm:
        raise ValueError(
            f"no such column: {old!r} (logical columns: {sorted(cm)})"
        )
    if new in cm:
        raise ValueError(f"column {new!r} already exists")
    if not new or not isinstance(new, str):
        raise ValueError(f"bad column name: {new!r}")
    _guard_layout_and_constraints(m, old, "rename")
    cm2 = {(new if k == old else k): v for k, v in cm.items()}
    meta = {"rename_column": {"from": old, "to": new}}
    if m["metadata"].get("bucket_spec"):
        meta["bucket_spec"] = m["metadata"]["bucket_spec"]
    return versioned.commit_files(
        root,
        base_version=m["version"],
        kind="maintenance",
        metadata=meta,
        column_mapping=cm2,
        spark=spark,
    )


def drop_column(spark, root: str, name: str) -> dict:
    """Drop a LOGICAL column without rewriting files: remove it from
    the mapping (readers stop projecting it) and from the recorded
    schema contract (appends stop requiring it). The physical column
    stays in existing files — invisible, reclaimed file-by-file as
    rewrites happen — and time travel still reads it at old
    versions. One maintenance commit."""
    m = versioned.read_manifest(root)
    cm = _live_mapping(root, m)
    if name not in cm:
        raise ValueError(
            f"no such column: {name!r} (logical columns: {sorted(cm)})"
        )
    if len(cm) == 1:
        raise ValueError("cannot drop the table's last column")
    _guard_layout_and_constraints(m, name, "drop")
    phys = cm[name]
    cm2 = {k: v for k, v in cm.items() if k != name}
    schema = m.get("schema")
    if schema:
        schema = [f for f in schema if f["name"] != phys]
    meta = {"drop_column": {"name": name, "physical": phys}}
    if m["metadata"].get("bucket_spec"):
        meta["bucket_spec"] = m["metadata"]["bucket_spec"]
    return versioned.commit_files(
        root,
        base_version=m["version"],
        kind="maintenance",
        metadata=meta,
        column_mapping=cm2,
        schema=schema,
        spark=spark,
    )


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
