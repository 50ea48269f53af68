"""Funnel and cohort-retention analytics over event streams — the
two classic product-analytics queries, engine-idiomatic.

A FUNNEL asks: of the users who did step 1, how many went on to do
step 2 *afterwards*, then step 3, optionally all within a window
anchored at step 1? The sequential dependency (step k's earliest
valid time depends on step k-1's) makes this a chain, not a single
aggregation: each step is one filtered user-grain min-timestamp
aggregation equi-joined to the previous frontier. K steps = K
filtered passes, all JVM codegen, each shuffle carrying only that
step's matching events at user grain — no window over the raw event
stream, no per-user array materialization, no Python.

COHORT RETENTION asks: of the users whose first activity fell in
period P, how many were active again in period P+k? One min-ts
aggregation to cohort users, one equi-join back, one distinct-count
aggregation on (cohort, offset) — cohort cardinality is user-grain,
the matrix is periods², tiny.

Reference parity note: the reference engine
(rubentalstra/Trial-Submission-Studio) has no event-funnel surface;
this extends the events family (SURVEY.md §2.13: tumbling windows,
sessionization) with the sequenced queries a clinical-operations or
product team runs on the same stream (screening → enrollment →
completion funnels are the CDISC-adjacent case).

Scale shape (100 TB of events): every stage is a hash aggregation or
equi-join keyed on the user — co-partitioned after the first
shuffle; step filters push to the scan (codegen predicates on
event_type/value); user-grain frontiers are orders of magnitude
smaller than the event stream. Determinism: min timestamps are
exact; all outputs are integers (counts + epoch-microsecond sums),
so the DuckDB oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "funnel_users",
    "funnel_counts",
    "cohort_retention",
]


def _us(c: Column) -> Column:
    """Epoch microseconds; NTZ-safe (parquet event times load as
    TIMESTAMP_NTZ, which ``unix_micros`` rejects — the cast is an
    identity wall-clock reinterpretation under the engine's UTC
    session timezone)."""
    return F.unix_micros(c.cast("timestamp"))


def _steps(steps) -> list[tuple[str, Column]]:
    out = list(steps)
    if len(out) < 2:
        raise ValueError("a funnel needs at least two steps")
    names = [n for n, _ in out]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate step names: {names}")
    return out


def funnel_users(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    steps: Sequence[tuple[str, Column]],
    within_seconds: float | None = None,
) -> DataFrame:
    """Per-user step-completion times: ``(user, t_<step1>, ...,
    t_<stepK>)`` where ``t_<step>`` is the EARLIEST event satisfying
    that step's predicate strictly after the previous step's time
    (and, with ``within_seconds``, no later than step 1's time plus
    the window). NULL = never reached; reaching step k requires all
    earlier steps. Only users who completed step 1 appear.

    ``steps`` is an ordered ``[(name, predicate_column), ...]``."""
    seq = _steps(steps)
    if within_seconds is not None and within_seconds <= 0:
        raise ValueError("within_seconds must be > 0")
    u, ts = F.col(user_col), F.col(ts_col)

    name0, pred0 = seq[0]
    frontier = (
        df.filter(pred0)
        .groupBy(u.alias(user_col))
        .agg(F.min(ts).alias(f"t_{name0}"))
    )
    t1 = f"t_{name0}"
    prev = t1
    for name, pred in seq[1:]:
        cond = ts > F.col("__prev")
        if within_seconds is not None:
            cond = cond & (
                _us(ts) <= _us(F.col("__t1")) + int(within_seconds * 1e6)
            )
        nxt = (
            df.join(
                frontier.select(
                    F.col(user_col).alias("__u"),
                    F.col(prev).alias("__prev"),
                    F.col(t1).alias("__t1"),
                ),
                u == F.col("__u"),
            )
            .filter(pred & cond)
            .groupBy(u.alias("__uu"))
            .agg(F.min(ts).alias(f"t_{name}"))
        )
        frontier = frontier.join(
            nxt, frontier[user_col] == nxt["__uu"], "left"
        ).drop("__uu")
        prev = f"t_{name}"
    return frontier


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    steps: Sequence[tuple[str, Column]],
    within_seconds: float | None = None,
) -> DataFrame:
    """The funnel summary: one row per step with ``step_idx`` (1-
    based), ``step``, ``n_users`` who reached it, and
    ``ts_us_sum`` — the sum of the step's epoch-microsecond
    completion times (an exact-integer pin of every per-user
    timestamp, not just the count), accumulated as DECIMAL(38,0):
    epoch-µs values are ~1.7e15, so a LONG sum overflows past ~5400
    users under ANSI mode — caught by the sf1 bench sweep. Built by
    unpivoting :func:`funnel_users`."""
    seq = _steps(steps)
    users = funnel_users(df, user_col, ts_col, steps, within_seconds)
    rows = [
        users.agg(
            F.count(F.col(f"t_{name}")).cast("long").alias("n_users"),
            F.coalesce(
                F.sum(_us(F.col(f"t_{name}")).cast("decimal(38,0)")),
                F.lit(0),
            )
            .cast("decimal(38,0)")
            .alias("ts_us_sum"),
        ).select(
            F.lit(i + 1).cast("long").alias("step_idx"),
            F.lit(name).alias("step"),
            "n_users",
            "ts_us_sum",
        )
        for i, (name, _) in enumerate(seq)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort-retention matrix: users are cohorted by the
    ``period``-truncated date of their FIRST event in ``df`` (filter
    ``df`` to the activity definition first — e.g. purchases only);
    each row is ``(cohort, period_offset, n_active, user_id_sum)``
    — distinct active users of that cohort at that offset, plus the
    exact sum of their distinct ids (a set pin counts alone can't
    give; DECIMAL(38,0) so huge id spaces cannot overflow the sum).
    Offset 0 is the cohort size by construction.

    ``period``: ``day`` / ``week`` / ``month`` (``date_trunc``
    units; week is ISO Monday-start in both Spark and DuckDB).
    Offsets count whole periods between truncated dates; month uses
    calendar months."""
    if period not in ("day", "week", "month"):
        raise ValueError("period must be day, week or month")
    u, ts = F.col(user_col), F.col(ts_col)
    bucket = F.date_trunc(period, ts).cast("date")
    firsts = df.groupBy(u.alias(user_col)).agg(
        F.min(bucket).alias("cohort")
    )
    activity = df.select(u.alias("__u"), bucket.alias("__p")).distinct()
    joined = firsts.join(activity, F.col(user_col) == F.col("__u"))
    if period == "month":
        offset = (
            (F.year("__p") - F.year("cohort")) * 12
            + (F.month("__p") - F.month("cohort"))
        ).cast("long")
    elif period == "week":
        offset = F.floor(F.datediff(F.col("__p"), F.col("cohort")) / 7).cast(
            "long"
        )
    else:
        offset = F.datediff(F.col("__p"), F.col("cohort")).cast("long")
    return (
        joined.select("cohort", offset.alias("period_offset"), "__u")
        .groupBy("cohort", "period_offset")
        .agg(
            F.countDistinct("__u").cast("long").alias("n_active"),
            F.sum_distinct(F.col("__u").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("user_id_sum"),
        )
    )
