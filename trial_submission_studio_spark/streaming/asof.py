"""Streaming as-of join — the stream twin of
:func:`trial_submission_studio_spark.operators.temporal.asof_join`
(north-star extension; the reference is batch-only, SURVEY.md §2.13).

Formulation: both sides union into one keyed stream (right rows
tagged 0, left rows tagged 1), and ``applyInPandasWithState`` keeps
exactly ONE state row per key — the most recent right-side
observation. Each micro-batch runs a vectorized ``pd.merge_asof``
(backward) of the batch's left rows against the batch's right rows
prepended with the carried state row, then advances the state to the
newest right row. This is the classic "enrich trades with the latest
quote" stream shape: state is O(keys), never O(events).

Semantics and caveats (documented, not hidden):

- Matches ``right_ts <= left_ts`` (backward as-of, tie inclusive) —
  identical to the batch operator without tolerance.
- Correct under per-key in-order arrival ACROSS micro-batches: a
  right row that arrives after a later left row was already emitted
  cannot retro-correct it (streams emit once). Within a micro-batch,
  order does not matter — rows are sorted by event time first.
- Equal right timestamps within a key: the last row in batch order
  wins; give right rows unique timestamps per key (or pre-dedup) for
  fully deterministic output, mirroring the batch operator's
  documented tie-break requirement.

Scale: one shuffle of both streams on the key columns; state is a
single tiny row per key (bounded memory, no watermark required for
correctness — add one upstream to bound the union's late-data
buffer). Hot-key note: like all keyed stateful operators, one
pathological key serializes onto one task.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from trial_submission_studio_spark.operators.temporal import _epoch_micros

__all__ = ["streaming_asof_join"]


def _make_asof_update_fn(
    keys: list[str], left_payload: list[str], vcols_out: list[str], rts_out: str,
    tolerance_us: int | None = None, strict: bool = False,
):
    """Closure factory (cloudpickle by-value — executors cannot import
    this package; capture only plain lists/strings/ints)."""
    import pandas as pd

    def update(key, pdfs, state):
        rows = pd.concat(list(pdfs), ignore_index=True)
        rights = rows[rows["__side"] == 0]
        lefts = rows[rows["__side"] == 1]

        r = rights[["__ts_us"] + vcols_out]
        if state.exists:
            st = state.get
            carried = pd.DataFrame(
                {
                    "__ts_us": [st[0]],
                    **{c: [st[i + 1]] for i, c in enumerate(vcols_out)},
                }
            )
            r = pd.concat([carried, r], ignore_index=True)
        r = r.sort_values("__ts_us", kind="mergesort", ignore_index=True)
        if len(r):
            tail = r.iloc[-1]
            state.update(
                (int(tail["__ts_us"]), *[tail[c] for c in vcols_out])
            )
        if len(lefts):
            lf = lefts[keys + left_payload + ["__ts_us"]].sort_values(
                "__ts_us", kind="mergesort", ignore_index=True
            )
            rr = r.rename(columns={"__ts_us": "__rts_us"})
            merged = pd.merge_asof(
                lf, rr, left_on="__ts_us", right_on="__rts_us",
                direction="backward",
                tolerance=tolerance_us,
                allow_exact_matches=not strict,
            )
            out = merged[keys + left_payload].copy()
            # tz-aware UTC: a naive datetime would be re-localized in
            # the SESSION timezone by Arrow, shifting rts by the UTC
            # offset whenever the session is not UTC
            out[rts_out] = pd.to_datetime(merged["__rts_us"], unit="us", utc=True)
            for c in vcols_out:
                out[c] = merged[c]
            yield out

    return update


def streaming_asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = ("value",),
    suffix: str = "_r",
    tolerance_seconds: int | None = None,
    strict: bool = False,
) -> DataFrame:
    """Enrich a left event stream with the most recent right-side
    observation per key (``right_ts <= left_ts``; ``<`` when
    ``strict``, and matches older than ``tolerance_seconds`` are
    NULLed — the same knobs as the batch operator). Output columns
    match the batch operator: all left columns, then
    ``{right_ts}{suffix}`` (matched right timestamp, NULL when no
    match yet) and each value column as ``{col}{suffix}``.

    Both inputs must be streaming DataFrames sharing the key columns;
    see the module docstring for ordering semantics.

    Dtype note: the matched-timestamp output column is always
    ``timestamp`` (tz-correct via UTC epoch micros). The batch
    operator instead carries the right side's ORIGINAL column dtype —
    for temporal dtypes the values agree; for a numeric right_ts
    column prefer the batch operator or cast afterward.
    """
    keys = list(keys)
    value_cols = list(value_cols)
    left_payload = [c for c in left.columns if c not in keys]
    vcols_out = [f"{c}{suffix}" for c in value_cols]
    rts_out = f"{right_ts}{suffix}"

    lhs = left.select(
        *keys,
        F.lit(1).alias("__side"),
        _epoch_micros(left, left_ts).alias("__ts_us"),
        *[F.col(c) for c in left_payload],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    rhs = right.select(
        *keys,
        F.lit(0).alias("__side"),
        _epoch_micros(right, right_ts).alias("__ts_us"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_payload
        ],
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    union = lhs.unionByName(rhs)

    def ddl(df: DataFrame, col: str, alias: str | None = None) -> str:
        return f"{alias or col} {df.schema[col].dataType.simpleString()}"

    out_schema = ", ".join(
        [ddl(left, k) for k in keys]
        + [ddl(left, c) for c in left_payload]
        + [f"{rts_out} timestamp"]
        + [ddl(right, c, f"{c}{suffix}") for c in value_cols]
    )
    state_schema = ", ".join(
        ["__ts_us long"] + [ddl(right, c, f"{c}{suffix}") for c in value_cols]
    )

    return union.groupBy(*keys).applyInPandasWithState(
        _make_asof_update_fn(
            keys, left_payload, vcols_out, rts_out,
            tolerance_us=(
                int(tolerance_seconds) * 1_000_000
                if tolerance_seconds is not None
                else None
            ),
            strict=strict,
        ),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
