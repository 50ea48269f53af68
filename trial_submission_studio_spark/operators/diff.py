"""Row-level snapshot diff — what changed between two corpus
releases, at record grain.

`io/versioned.py` answers the FILE-level question from manifests
alone (`diff_versions`); this module answers the ROW-level one:
which keys were added, removed, or changed between two frames (e.g.
two `read_version` loads of the same versioned table), and which
columns drove the changes — the audit a data-release process runs
before publishing, and the input to incremental downstream refresh
(recompute only `added ∪ changed`).

Scale shape (100 TB): change detection never compares wide rows —
each side is first projected to ``(key, digest)`` where the digest
is a row hash of the compared columns, so the full-outer equi-join
on the key shuffles ~24 bytes/row regardless of row width, and
column pruning keeps the scan narrow when ``compare_cols`` is a
subset. Wide values are only rejoined when explicitly requested
(``include_values=True`` on the changed/added/removed slices, which
are usually a small fraction of the table). ``column_change_counts``
is one join + one row-local inequality sum per column.

Digest modes: ``xxhash64`` (default — JVM, cheapest) or ``md5`` over
an explicit null-tagged canonical string (engine-portable: the
DuckDB contract twin reproduces it byte-for-byte; use this when an
external system must agree on the digests themselves).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "row_digest",
    "snapshot_diff",
    "snapshot_diff_summary",
    "column_change_counts",
]

#: ASCII unit separator — cannot appear in the cast of any normal
#: value, so the canonical string is unambiguous; NULL gets its own
#: tag so (NULL, "") never collides with ("", NULL).
_SEP = "\x1f"
_NULL_TAG = "\x00␀"


def row_digest(cols: Sequence[str], mode: str = "xxhash64") -> Column:
    """Deterministic digest of ``cols``. ``xxhash64`` hashes typed
    values directly (fastest, Spark-specific); ``md5`` hashes the
    explicit null-tagged canonical string (portable across engines:
    ``md5(concat(coalesce(cast(c as string), tag), sep, ...))``)."""
    names = list(cols)
    if not names:
        raise ValueError("need at least one column to digest")
    if mode == "xxhash64":
        return F.xxhash64(*[F.col(c) for c in names])
    if mode == "md5":
        parts = []
        for c in names:
            if parts:
                parts.append(F.lit(_SEP))
            parts.append(
                F.coalesce(F.col(c).cast("string"), F.lit(_NULL_TAG))
            )
        return F.md5(F.concat(*parts))
    raise ValueError("mode must be xxhash64 or md5")


def _split(df: DataFrame, key_cols, compare_cols):
    keys = list(key_cols)
    if not keys:
        raise ValueError("need at least one key column")
    cmps = (
        [c for c in df.columns if c not in keys]
        if compare_cols is None
        else list(compare_cols)
    )
    if not cmps:
        raise ValueError("no compare columns (key-only frames have no 'changed')")
    overlap = set(keys) & set(cmps)
    if overlap:
        raise ValueError(f"columns are both key and compared: {sorted(overlap)}")
    return keys, cmps


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    digest: str = "xxhash64",
    include_unchanged: bool = False,
    include_values: bool = False,
) -> DataFrame:
    """Per-key change classification: ``(key..., change_type)`` with
    ``change_type ∈ {added, removed, changed[, unchanged]}`` — a
    full outer join of the two ``(key, digest)`` projections.
    ``compare_cols`` defaults to every non-key column of ``old``
    (which must then exist in ``new``). Duplicate keys within a
    side compare positionally-unordered and should be deduplicated
    upstream — diff grain is the key.

    ``include_values=True`` re-attaches the NEW side's compared
    columns for added/changed rows and the OLD side's for removed
    (suffixed ``_old``) — two extra equi-joins against the (small)
    changed slice only."""
    keys, cmps = _split(old, key_cols, compare_cols)
    o = old.select(*keys, row_digest(cmps, digest).alias("__d_old"))
    n = new.select(*keys, row_digest(cmps, digest).alias("__d_new"))
    joined = o.join(n, keys, "full_outer")
    out = joined.select(
        *keys,
        F.when(F.col("__d_old").isNull(), F.lit("added"))
        .when(F.col("__d_new").isNull(), F.lit("removed"))
        .when(F.col("__d_old") != F.col("__d_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    if include_values:
        out = (
            out.join(
                new.select(*keys, *cmps),
                keys,
                "left",
            )
            .join(
                old.select(
                    *keys, *[F.col(c).alias(f"{c}_old") for c in cmps]
                ).join(
                    out.filter(F.col("change_type") == "removed").select(*keys),
                    keys,
                    "left_semi",
                ),
                keys,
                "left",
            )
        )
    return out


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    digest: str = "xxhash64",
) -> DataFrame:
    """ONE-row release audit: ``n_added / n_removed / n_changed /
    n_unchanged`` plus both table sizes (all longs)."""
    d = snapshot_diff(
        old, new, key_cols, compare_cols, digest, include_unchanged=True
    )
    cnt = lambda t: F.coalesce(  # noqa: E731
        F.sum((F.col("change_type") == t).cast("long")), F.lit(0)
    ).cast("long")
    return d.agg(
        cnt("added").alias("n_added"),
        cnt("removed").alias("n_removed"),
        cnt("changed").alias("n_changed"),
        cnt("unchanged").alias("n_unchanged"),
        (cnt("removed") + cnt("changed") + cnt("unchanged"))
        .cast("long")
        .alias("n_old"),
        (cnt("added") + cnt("changed") + cnt("unchanged"))
        .cast("long")
        .alias("n_new"),
    )


def column_change_counts(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """ONE-row per-column drill-down over keys present on BOTH
    sides: ``chg_<col>`` = rows where that column differs
    (null-safe: NULL→value and value→NULL count; NULL→NULL doesn't).
    Explains a `snapshot_diff` ``changed`` count one level deeper."""
    keys, cmps = _split(old, key_cols, compare_cols)
    o = old.select(*keys, *[F.col(c).alias(f"__o_{c}") for c in cmps])
    n = new.select(*keys, *[F.col(c).alias(f"__n_{c}") for c in cmps])
    j = o.join(n, keys)
    return j.agg(
        *[
            F.coalesce(
                F.sum(
                    (
                        ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
                    ).cast("long")
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(f"chg_{c}")
            for c in cmps
        ]
    )
