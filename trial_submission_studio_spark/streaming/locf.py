"""Streaming LOCF fill — the stream twin of
:func:`trial_submission_studio_spark.operators.temporal.locf_fill`
(north-star extension; the reference is batch-only, SURVEY.md §2.13).

Formulation: one keyed stream through ``applyInPandasWithState``
with ONE state row per key holding the last non-null observation of
each fill column. Each micro-batch sorts its rows by event time,
forward-fills with the carried state prepended, emits the filled
rows, and advances the state — the sensor-gap-fill shape ("carry the
last reading across silent periods") running continuously.

Semantics and caveats (mirroring ``streaming_asof_join``):

- Fill source is the most recent PRECEDING non-null value within the
  key, ties included — identical to the batch operator's ROWS frame.
- Correct under per-key in-order arrival ACROSS micro-batches
  (streams emit once; a late observation cannot retro-fill already-
  emitted rows). Within a micro-batch, arrival order is irrelevant —
  rows sort by event time first.
- Rows tied on (key, ts) within a batch fill in batch order; give
  rows unique timestamps per key (or pre-dedup) for fully
  deterministic output, the batch operator's documented tie-break
  requirement.

Scale: one shuffle on the key columns; state is one tiny row per key
(bounded memory). Hot-key note: one pathological key serializes onto
one task, like every keyed stateful operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from trial_submission_studio_spark.operators.temporal import _epoch_micros

__all__ = ["streaming_locf_fill"]


def _make_locf_update_fn(out_cols: list[str], fill_cols: list[str]):
    """Closure factory (cloudpickle by-value — executors cannot
    import this package; capture only plain lists)."""
    import pandas as pd

    def update(key, pdfs, state):
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("__ts_us", kind="mergesort", ignore_index=True)
        carried = (
            dict(zip(fill_cols, state.get)) if state.exists else
            {c: None for c in fill_cols}
        )
        for c in fill_cols:
            s = rows[c]
            if carried[c] is not None:
                # prepend the carried value as a virtual row-(-1),
                # ffill, then drop it — vectorized, no Python loop
                s = pd.concat(
                    [pd.Series([carried[c]]), s], ignore_index=True
                ).ffill()[1:].reset_index(drop=True)
            else:
                s = s.ffill()
            rows[c] = s
            non_null = rows[c].dropna()
            if len(non_null):
                carried[c] = non_null.iloc[-1]
        state.update(tuple(carried[c] for c in fill_cols))
        yield rows[out_cols]

    return update


def streaming_locf_fill(
    stream: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    cols: Sequence[str],
) -> DataFrame:
    """Continuously fill NULLs in ``cols`` with each key's most recent
    non-null observation (state-store carried across micro-batches).
    Output columns match the input exactly; see the module docstring
    for ordering semantics."""
    keys = list(keys)
    cols = list(cols)
    payload = [c for c in stream.columns if c not in keys]
    tagged = stream.select(
        *keys,
        _epoch_micros(stream, ts_col).alias("__ts_us"),
        *[F.col(c) for c in payload],
    )

    def ddl(col: str) -> str:
        return f"{col} {stream.schema[col].dataType.simpleString()}"

    out_cols = keys + payload
    out_schema = ", ".join(ddl(c) for c in out_cols)
    state_schema = ", ".join(ddl(c) for c in cols)

    return tagged.groupBy(*keys).applyInPandasWithState(
        _make_locf_update_fn(out_cols, cols),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
