"""Temporal joins and time-window operators.

The reference is batch-only (SURVEY.md §1.3), but a timeseries/event
surface is a first-class extension of this engine (SURVEY.md §2.13):
as-of joins, keyed interval (range) joins, last-observation-carried-
forward, and rolling time-window aggregates.

Scale design notes (100 TB / 1000 executors):

- ``asof_join`` is NOT implemented as a join at all. The classic
  sort-merge-with-inequality plan degenerates into a range join
  (O(n·m) per key on skew). Instead both sides are unioned and a
  single window pass per key carries the most recent right-side
  payload onto each left row — exactly one shuffle on the key
  columns, no broadcast requirement on either side, no row
  explosion. This is the standard scale-out as-of formulation
  (union + last-ignore-nulls) used by large event stores.
- ``range_interval_join`` equi-joins on coarse time buckets, so an
  interval only meets the points inside its covering buckets —
  never a cartesian. Bucket width is the tuning knob: it bounds
  interval fan-out to ``ceil(len/width)+1`` rows.
- ``locf_fill`` / ``rolling_agg`` are single-window-pass
  formulations (one shuffle on the partition key each; rolling uses
  a RANGE frame on the epoch so sparse/dense timelines cost the
  same).
- Hot-key ceiling: every window formulation here partitions by the
  join/group key, so ONE pathological key (a power-law user with
  billions of rows) serializes onto a single task — standard for
  window plans, fine for keys up to ~10M rows each, and AQE cannot
  split a window partition. For power-law keys use
  ``asof_join_sliced``: it pre-splits the timeline into coarse
  slices, runs the as-of per (key, slice), and stitches slice
  boundaries by carrying each slice's last right-side row forward
  via a tiny per-key×slice tail pass — equivalence with the
  single-pass operator is pinned by test. ``rolling_agg_sliced``
  applies the same recipe to trailing-window aggregates (slice-local
  RANGE frame + a bounded previous-slice carry array, restricted to
  mergeable aggs). The same recipe applies to LOCF if ever needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "asof_join_sliced",
    "locf_fill",
    "range_interval_join",
    "rolling_agg",
    "rolling_agg_sliced",
]


def _epoch_micros(df: DataFrame, col: str) -> Column:
    """Exact epoch microseconds (long) for numeric/date/timestamp/
    timestamp_ntz columns. TIMESTAMP_NTZ has no numeric cast and a
    cast through LTZ would be session-TZ-dependent (and non-linear
    across DST); ``timestamp_diff`` against the NTZ epoch literal is
    exact and TZ-independent. TIMESTAMP (LTZ) uses ``unix_micros``
    (exact, instant-based). DATE goes through ``unix_date`` (days
    since epoch) — a ``date -> timestamp`` cast would resolve
    midnight in the session TZ. Numeric columns are taken as seconds;
    ``floor`` (not a long cast) keeps sub-second negatives ordered."""
    dt = df.schema[col].dataType.simpleString()
    c = F.col(col)
    if dt.startswith("timestamp_ntz"):
        return F.timestamp_diff(
            "MICROSECOND",
            F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
            c,
        )
    if dt.startswith("timestamp"):
        return F.unix_micros(c)
    if dt == "date":
        return F.unix_date(c).cast("long") * F.lit(86_400_000_000).cast("long")
    return F.floor(c.cast("double") * F.lit(1e6)).cast("long")


def _epoch_seconds(df: DataFrame, col: str) -> Column:
    """Epoch seconds (double, micro-exact) — see ``_epoch_micros``."""
    return _epoch_micros(df, col).cast("double") / F.lit(1e6)


def _epoch_bucket(epoch: Column, width_seconds: int) -> Column:
    """Coarse time bucket id: ``floor(epoch / width)``. ``floor`` (not
    a long cast, which truncates toward zero) so pre-1970 negative
    epochs land in their correct bucket instead of the one above."""
    return F.floor(epoch / F.lit(float(width_seconds))).cast("long")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    tolerance_seconds: int | None = None,
    strict: bool = False,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join: each left row picks up the most recent
    right row per key with ``right.ts <= left.ts`` (``<`` when
    ``strict``), or NULLs when none qualifies.

    Implementation: tag + union + one window pass. Right rows carry
    their payload packed into ONE struct column (so all payload
    columns are taken from the *same* matched row — per-column
    ``last`` could mix rows when payload values are NULL); left rows
    carry NULL. ``last(payload, ignorenulls=True)`` over
    (key ORDER BY ts, side) pulls the latest right payload onto each
    left row. Ties at equal ts: right sorts before left (side 0 < 1)
    so an equal-timestamp right row IS visible unless ``strict``.

    ``tolerance_seconds`` nulls out matches older than the window
    (pandas ``merge_asof(tolerance=...)`` semantics).

    Output: all left columns + each value column as
    ``<name><suffix>`` + ``<right_ts><suffix>`` (the matched ts).

    Ties among right rows at the same (key, ts): the payload struct
    itself is the final window sort key, so the MAX payload (field-
    wise struct comparison) wins deterministically — partition order
    can never pick the match.

    One shuffle (on ``keys``); no join node in the plan at all.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*keys, right_ts)]
    # __t is exact epoch micros on BOTH sides: TZ/dtype-independent
    # ordering, and the union stays valid when left/right timestamp
    # dtypes differ (e.g. TIMESTAMP left, TIMESTAMP_NTZ right).
    payload = F.struct(
        F.col(right_ts).alias("__ts"),
        _epoch_micros(right, right_ts).alias("__tus"),
        *[F.col(c) for c in value_cols],
    )
    rhs = right.select(
        *[F.col(k) for k in keys],
        _epoch_micros(right, right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns
          if c not in keys],
    )
    lhs = left.select(
        *[F.col(k) for k in keys],
        _epoch_micros(left, left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rhs.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c) for c in left.columns if c not in keys],
    )
    unioned = lhs.unionByName(rhs)

    # strict (<) ordering: right rows at the SAME instant must not be
    # visible, so left sorts before right at equal ts
    side_order = F.asc("__side") if not strict else F.desc("__side")
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), side_order, F.asc_nulls_first("__payload"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last("__payload", ignorenulls=True).over(w)
    matched = unioned.withColumn("__m", carried).filter(F.col("__side") == 1)

    if tolerance_seconds is not None:
        in_tol = (
            F.col("__t") - F.col("__m.__tus")
        ) <= F.lit(int(tolerance_seconds) * 1_000_000)
        matched = matched.withColumn(
            "__m", F.when(in_tol, F.col("__m"))
        )

    out_cols: list[Column] = [F.col(k) for k in keys]
    out_cols += [F.col(c) for c in left.columns if c not in keys]
    out_cols.append(F.col("__m.__ts").alias(f"{right_ts}{suffix}"))
    out_cols += [F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in value_cols]
    return matched.select(*out_cols)


def asof_join_sliced(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] | None = None,
    slice_seconds: int = 86400,
    tolerance_seconds: int | None = None,
    strict: bool = False,
    suffix: str = "_right",
) -> DataFrame:
    """Two-phase as-of join for power-law keys — same semantics and
    output columns as :func:`asof_join`, different parallelism shape.

    :func:`asof_join` partitions its window by ``keys``, so one
    pathological hot key (billions of rows) serializes onto a single
    task. This variant adds the time slice ``floor(epoch /
    slice_seconds)`` to the partition key, so a hot key's timeline
    splits across ``#slices`` tasks:

    - **Phase 1 (slice-local)**: the standard union+window as-of with
      ``(keys, slice)`` as the partition key. Every left row whose
      match lives in its own slice is resolved here.
    - **Phase 2 (boundary stitch)**: per ``(key, slice)`` the single
      max-struct right-side tail row is aggregated (map-side combine;
      one tiny row per key×slice), a running ``last`` over slice
      order carries each tail forward past empty slices, and
      phase-1-unmatched left rows take the carried payload for their
      slice. A left row unmatched in-slice has no in-slice right row
      before it, so the carried tail — the latest right row of any
      earlier slice — is exactly the global as-of match.

    Costs vs :func:`asof_join`: a second (tiny) shuffle of the
    key×slice tails and a hash join of carried tails back onto the
    phase-1 output — so it is opt-in for skewed keys, not the
    default. Tie-break matches the single-pass operator (field-wise
    max payload struct). ``slice_seconds`` tunes the skew/overhead
    trade: pick it so a hot key's densest slice fits one task.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*keys, right_ts)]
    keys = list(keys)
    value_cols = list(value_cols)
    rts_out = f"{right_ts}{suffix}"
    vouts = [f"{c}{suffix}" for c in value_cols]

    l2 = left.withColumn(
        "__slice", _epoch_bucket(_epoch_seconds(left, left_ts), slice_seconds)
    )
    r2 = right.withColumn(
        "__slice", _epoch_bucket(_epoch_seconds(right, right_ts), slice_seconds)
    )
    # tolerance is applied once, globally, after the stitch — a
    # slice-local tolerance would wrongly null carried matches
    local = asof_join(
        l2, r2, [*keys, "__slice"], left_ts, right_ts, value_cols,
        tolerance_seconds=None, strict=strict, suffix=suffix,
    )

    tail_struct = F.struct(
        _epoch_micros(r2, right_ts).alias("__tus"),
        F.col(right_ts).alias("__ts"),
        *[F.col(c) for c in value_cols],
    )
    tails = r2.groupBy(*keys, "__slice").agg(F.max(tail_struct).alias("__tail"))

    probes = (
        local.filter(F.col(rts_out).isNull())
        .select(*keys, "__slice")
        .distinct()
        .withColumn("__tail", F.lit(None).cast(tails.schema["__tail"].dataType))
    )
    # probes sort before their own slice's tail (nulls first), so the
    # strictly-preceding frame sees ONLY earlier-slice tails
    wsl = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__slice").asc(), F.asc_nulls_first("__tail"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = (
        tails.unionByName(probes)
        .withColumn("__carried", F.last("__tail", ignorenulls=True).over(wsl))
        .filter(F.col("__tail").isNull())
        .select(*keys, "__slice", "__carried")
    )

    # materialize the stitch flag BEFORE any fill: the fills overwrite
    # rts_out, and an unresolved `rts_out IS NULL` condition would
    # re-resolve against the already-filled column in later fills
    res = local.join(carried, [*keys, "__slice"], "left").withColumn(
        "__stitch", F.col(rts_out).isNull() & F.col("__carried").isNotNull()
    )
    res = res.withColumn(
        rts_out,
        F.when(F.col("__stitch"), F.col("__carried.__ts")).otherwise(F.col(rts_out)),
    )
    for vc, vout in zip(value_cols, vouts):
        res = res.withColumn(
            vout,
            F.when(F.col("__stitch"), F.col(f"__carried.{vc}")).otherwise(F.col(vout)),
        )
    res = res.drop("__slice", "__carried", "__stitch")

    if tolerance_seconds is not None:
        in_tol = (
            _epoch_micros(res, left_ts) - _epoch_micros(res, rts_out)
        ) <= F.lit(int(tolerance_seconds) * 1_000_000)
        for c in (rts_out, *vouts):
            res = res.withColumn(c, F.when(in_tol, F.col(c)))

    out_cols = [*keys, *[c for c in left.columns if c not in keys], rts_out, *vouts]
    return res.select(*out_cols)


def locf_fill(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    cols: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Last-observation-carried-forward: NULLs in ``cols`` take the
    most recent preceding non-null value within the key group
    (ordered by ``order_col``). The clinical-data staple; also the
    sensor-gap fill. One window pass, one shuffle on ``keys``.

    Rows tied on (keys, order_col) make the ROWS frame — and thus the
    fill value — partition-order-dependent. Pass ``tiebreak`` (a
    unique-per-key column, e.g. an event id) to pin a deterministic
    total order; without it, ``order_col`` must be unique per key for
    deterministic output."""
    order = [F.col(order_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def range_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: Sequence[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 3600,
    inclusive: str = "both",
) -> DataFrame:
    """Keyed interval join: every (point, interval) pair on the same
    key with ``start <= point <= end`` (bounds per ``inclusive``:
    ``both|left|right|neither``).

    Plan shape: intervals explode into the coarse time buckets they
    cover (``sequence(floor(start/w), floor(end/w))`` — bounded
    fan-out, codegen), points compute their single bucket, and the
    two sides EQUI-join on (keys, bucket) before the exact range
    refine. Catalyst turns the naive formulation into
    BroadcastNestedLoopJoin/cartesian the moment the equi-keys are
    skewed or absent; bucketing keeps it a plain shuffled hash join
    whose cost is data ∝ bucket occupancy, never |points|×|intervals|.

    Columns: all point columns + all interval columns (caller aliases
    collisions away beforehand).
    """
    w = int(bucket_seconds)
    lo_ok = {"both": ">=", "left": ">=", "right": ">", "neither": ">"}[inclusive]
    hi_ok = {"both": "<=", "left": "<", "right": "<=", "neither": "<"}[inclusive]

    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                _epoch_bucket(_epoch_seconds(intervals, start_ts), w),
                _epoch_bucket(_epoch_seconds(intervals, end_ts), w),
            )
        ),
    )
    pt = points.withColumn(
        "__bucket", _epoch_bucket(_epoch_seconds(points, point_ts), w)
    )
    # exact refine on epoch micros — dtype/TZ-independent and safe
    # when point/interval columns are different temporal dtypes
    p = _epoch_micros(points, point_ts)
    s = _epoch_micros(intervals, start_ts)
    e = _epoch_micros(intervals, end_ts)
    lo = p >= s if lo_ok == ">=" else p > s
    hi = p <= e if hi_ok == "<=" else p < e
    return (
        pt.join(iv, [*keys, "__bucket"])
        .filter(lo & hi)
        .drop("__bucket")
    )


def rolling_agg(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    aggs: dict[str, Column],
    window_seconds: int,
) -> DataFrame:
    """Trailing time-window aggregates: for each row, aggregate over
    the key's rows in ``(ts - window, ts]``. RANGE frame over the
    epoch-seconds ordering — O(1) frame maintenance per row in
    Spark's window exec, one shuffle on ``keys``.

    ``aggs`` maps output name -> aggregate Column built over input
    columns, e.g. ``{"sum_7d": F.sum("value"), "n_7d": F.count(F.lit(1))}``.

    The frame is exact to the microsecond: ordering is epoch MICROS
    (long), frame ``[-(w·1e6 - 1), 0]`` — i.e. ``(ts - w, ts]``, the
    open-closed trailing window. A seconds-truncated ordering would
    silently bucket sub-second timestamps together.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(_epoch_micros(df, ts_col))
        .rangeBetween(-(int(window_seconds) * 1_000_000 - 1), 0)
    )
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out


def rolling_agg_sliced(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    aggs: dict[str, tuple[str, str]],
    window_seconds: int,
    slice_seconds: int | None = None,
) -> DataFrame:
    """Two-phase trailing-window aggregate for power-law keys — same
    semantics as :func:`rolling_agg`, hot-key-parallel shape (the
    rolling counterpart of :func:`asof_join_sliced`).

    :func:`rolling_agg` partitions by ``keys`` alone, so one hot key
    serializes onto one task. Here the window partitions by
    ``(keys, slice)`` with ``slice_seconds >= window_seconds``, and a
    boundary pass merges in the previous slice's tail:

    - **Phase 1 (slice-local)**: the exact µs RANGE frame within each
      (key, slice) — complete for every row whose full trailing
      window lies inside its own slice.
    - **Phase 2 (carry)**: per (key, slice), the rows that can still
      matter to the NEXT slice (the last ``window`` of the slice) are
      collected into one array and joined to the next slice's rows;
      each row merges the carried entries inside its own frame
      ``(ts - window, ts]``. Because ``slice >= window``, no frame
      ever spans more than one boundary, so one carry join is exact.

    The carried array is bounded by the per-window row count — the
    same bound the window frame itself has — so phase 2 never exceeds
    the cost profile the semantics already imply.

    Mergeability constrains the agg surface: ``aggs`` maps output
    name → ``(source_col, fn)`` with fn ∈ {"sum", "count", "min",
    "max"} (derive avg as sum/count). ``sum`` accumulates as double.
    """
    fns = {f for _, f in aggs.values()}
    bad = fns - {"sum", "count", "min", "max"}
    if bad:
        raise ValueError(f"unsupported agg fns: {sorted(bad)}")
    w_us = int(window_seconds) * 1_000_000
    s_sec = int(slice_seconds) if slice_seconds is not None else int(window_seconds)
    if s_sec < int(window_seconds):
        raise ValueError("slice_seconds must be >= window_seconds")
    s_us = s_sec * 1_000_000
    keys = list(keys)

    us = _epoch_micros(df, ts_col)
    # exact long floor-div (float division would wobble at µs scale)
    slice_id = ((us - F.pmod(us, F.lit(s_us))) / F.lit(s_us)).cast("long")
    d = df.withColumn("__us", us).withColumn("__slice", slice_id)

    w1 = (
        Window.partitionBy(*keys, "__slice")
        .orderBy("__us")
        .rangeBetween(-(w_us - 1), 0)
    )
    part = d
    src_cols = sorted({c for c, _ in aggs.values()})
    for name, (col, fn) in aggs.items():
        expr = {
            "sum": F.sum(F.col(col).cast("double")),
            "count": F.count(F.lit(1)),
            "min": F.min(col),
            "max": F.max(col),
        }[fn]
        part = part.withColumn(f"__p_{name}", expr.over(w1))

    carry_struct = F.struct(
        F.col("__us").alias("__cus"), *[F.col(c) for c in src_cols]
    )
    tails = (
        d.filter(F.col("__us") >= (F.col("__slice") + 1) * s_us - w_us + 1)
        .groupBy(*keys, (F.col("__slice") + 1).alias("__slice"))
        .agg(F.collect_list(carry_struct).alias("__carry"))
    )
    j = part.join(tails, [*keys, "__slice"], "left").withColumn(
        "__in_frame",
        F.filter(
            F.coalesce(
                F.col("__carry"),
                F.array().cast(tails.schema["__carry"].dataType),
            ),
            lambda e: e["__cus"] >= F.col("__us") - (w_us - 1),
        ),
    )
    out = j
    for name, (col, fn) in aggs.items():
        vals = F.transform(F.col("__in_frame"), lambda e: e[col])
        # F.sum / F.min / F.max skip NULL inputs and return NULL only
        # for an all-NULL frame — the carry merge must match exactly:
        # fold over NON-NULL carried values only (one poisoning NULL
        # must not zero the carry), keep the carry-sum NULL when no
        # non-null value was carried, and merge with two-sided
        # null-awareness so partial-NULL + carry-value adds correctly.
        nn = F.filter(vals, lambda x: x.isNotNull())
        carry_sum = F.when(
            F.size(nn) > 0,
            F.aggregate(nn, F.lit(0.0), lambda acc, x: acc + x.cast("double")),
        )
        part = F.col(f"__p_{name}")
        merged = {
            "sum": F.when(
                part.isNull() & carry_sum.isNull(), F.lit(None).cast("double")
            ).otherwise(
                F.coalesce(part, F.lit(0.0)) + F.coalesce(carry_sum, F.lit(0.0))
            ),
            "count": part + F.size("__in_frame"),
            "min": F.least(part, F.array_min(vals)),
            "max": F.greatest(part, F.array_max(vals)),
        }[fn]
        out = out.withColumn(name, merged).drop(f"__p_{name}")
    return out.drop("__us", "__slice", "__carry", "__in_frame")
