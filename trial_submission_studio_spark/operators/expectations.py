"""Declarative data-quality expectations — table-agnostic checks
compiled into as few Spark jobs as the check types allow.

The generic sibling of the CDISC validation family
(`operators/validation.py` implements SURVEY.md §2's V1–V13 against
SDTM semantics; reference: `crates/tss-submit/src/validation/`): the
same "declare checks, get a violations summary" contract, but over
ANY frame — the dbt-test / Great-Expectations shape a pipeline runs
on every intermediate table, not just the export.

Check vocabulary (a spec is a list of dicts):

- ``{"check": "not_null", "col": c}``
- ``{"check": "accepted_values", "col": c, "values": [...]}``
  (NULL is not a violation — compose with not_null to forbid it)
- ``{"check": "in_range", "col": c, "min": lo, "max": hi}``
  (inclusive; either bound optional; NULL passes)
- ``{"check": "matches_regex", "col": c, "pattern": p}``
  (full-match via ``rlike`` anchoring left to the pattern; NULL passes)
- ``{"check": "expression", "name": n, "expr": sql_predicate}``
  (violation when the predicate is NOT satisfied — NULL predicate
  counts as a violation, matching SQL CHECK-constraint caution)
- ``{"check": "unique", "cols": [...]}`` (rows in key groups of
  size > 1; NULL keys group like GROUP BY)
- ``{"check": "foreign_key", "col": c, "ref": DataFrame,
  "ref_col": r}`` (non-NULL orphans, counted via left anti join)

Scale shape (100 TB): every ROW-LOCAL check (not_null /
accepted_values / in_range / matches_regex / expression) folds into
ONE aggregation pass over one scan — adding a tenth check costs one
more codegen column, not another job. Each ``unique`` adds one
two-level count-grain aggregation; each ``foreign_key`` one anti-join
(broadcast when the ref side is small). The summary is
checks-cardinality-sized; violating-row inspection
(:func:`violations`) is an explicit per-check call so wide rows are
only materialized when asked for.
"""

from __future__ import annotations

from functools import reduce
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["expect", "violations"]

_ROW_LOCAL = {
    "not_null",
    "accepted_values",
    "in_range",
    "matches_regex",
    "expression",
}


def _label(e: dict[str, Any]) -> str:
    kind = e["check"]
    if kind == "unique":
        return f"unique({','.join(e['cols'])})"
    if kind == "expression":
        return str(e["name"])
    return f"{kind}({e['col']})"


def _row_violation(e: dict[str, Any]) -> Column:
    """Boolean column: this row violates the (row-local) check."""
    kind = e["check"]
    if kind == "not_null":
        return F.col(e["col"]).isNull()
    if kind == "accepted_values":
        c = F.col(e["col"])
        return c.isNotNull() & ~c.isin(list(e["values"]))
    if kind == "in_range":
        c = F.col(e["col"])
        conds = []
        if "min" in e:
            conds.append(c < F.lit(e["min"]))
        if "max" in e:
            conds.append(c > F.lit(e["max"]))
        if not conds:
            raise ValueError("in_range needs min and/or max")
        bad = reduce(lambda a, b: a | b, conds)
        return c.isNotNull() & bad
    if kind == "matches_regex":
        c = F.col(e["col"])
        return c.isNotNull() & ~c.rlike(e["pattern"])
    if kind == "expression":
        ok = F.expr(e["expr"])
        return ~F.coalesce(ok, F.lit(False))
    raise ValueError(f"unknown check: {kind!r}")


def _validate(spec: Sequence[dict[str, Any]]) -> list[dict[str, Any]]:
    out = list(spec)
    if not out:
        raise ValueError("empty expectation spec")
    labels = [_label(e) for e in out]
    dupes = {x for x in labels if labels.count(x) > 1}
    if dupes:
        raise ValueError(f"duplicate expectations: {sorted(dupes)}")
    for e in out:
        if e["check"] not in _ROW_LOCAL | {"unique", "foreign_key"}:
            raise ValueError(f"unknown check: {e['check']!r}")
    return out


def expect(df: DataFrame, spec: Sequence[dict[str, Any]]) -> DataFrame:
    """Violation summary: one row per declared expectation —
    ``(check_idx, check, n_violations, n_rows)`` with ``check_idx``
    preserving spec order and ``n_rows`` the audited table size.
    Row count equals ``len(spec)`` by construction (a green table
    yields all-zero counts, never an empty frame)."""
    entries = _validate(spec)
    total = df.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))

    row_local = [(i, e) for i, e in enumerate(entries) if e["check"] in _ROW_LOCAL]
    frames: list[DataFrame] = []
    if row_local:
        # ONE aggregation, then explode the 1-row result into summary
        # rows — selecting the wide agg per check and unioning would
        # let Catalyst split it back into one scan per check.
        one_pass = df.agg(
            *[
                F.coalesce(F.sum(_row_violation(e).cast("long")), F.lit(0))
                .cast("long")
                .alias(f"__v{i}")
                for i, e in row_local
            ]
        )
        melted = one_pass.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i + 1).cast("long").alias("check_idx"),
                            F.lit(_label(e)).alias("check"),
                            F.col(f"__v{i}").alias("n_violations"),
                        )
                        for i, e in row_local
                    ]
                )
            ).alias("__e")
        ).select("__e.*")
        frames.append(melted)
    for i, e in enumerate(entries):
        if e["check"] == "unique":
            grp = df.groupBy(*e["cols"]).agg(F.count("*").alias("__n"))
            frames.append(
                grp.agg(
                    F.coalesce(
                        F.sum(F.when(F.col("__n") > 1, F.col("__n")).otherwise(0)),
                        F.lit(0),
                    )
                    .cast("long")
                    .alias("n_violations")
                ).select(
                    F.lit(i + 1).cast("long").alias("check_idx"),
                    F.lit(_label(e)).alias("check"),
                    "n_violations",
                )
            )
        elif e["check"] == "foreign_key":
            ref = e["ref"].select(F.col(e["ref_col"]).alias(e["col"])).distinct()
            orphans = (
                df.filter(F.col(e["col"]).isNotNull())
                .join(ref, e["col"], "left_anti")
            )
            frames.append(
                orphans.agg(
                    F.count(F.lit(1)).cast("long").alias("n_violations")
                ).select(
                    F.lit(i + 1).cast("long").alias("check_idx"),
                    F.lit(_label(e)).alias("check"),
                    "n_violations",
                )
            )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.crossJoin(F.broadcast(total))


def violations(df: DataFrame, entry: dict[str, Any]) -> DataFrame:
    """The violating ROWS for one expectation — schema of ``df``
    (wide rows materialize only here, never in :func:`expect`)."""
    e = _validate([entry])[0]
    kind = e["check"]
    if kind in _ROW_LOCAL:
        return df.filter(_row_violation(e))
    if kind == "unique":
        dupes = (
            df.groupBy(*e["cols"])
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > 1)
            .drop("__n")
        )
        return df.join(dupes, e["cols"], "left_semi")
    # foreign_key
    ref = e["ref"].select(F.col(e["ref_col"]).alias(e["col"])).distinct()
    return df.filter(F.col(e["col"]).isNotNull()).join(ref, e["col"], "left_anti")
