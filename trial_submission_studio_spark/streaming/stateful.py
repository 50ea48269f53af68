"""Custom stateful streaming operator (north-star extension;
SURVEY.md §2.12 — the reference has no streaming surface at all).

``running_user_totals`` keeps per-user running aggregates (event
count, value sum, last-seen timestamp) across micro-batches with
``applyInPandasWithState`` — the Structured Streaming escape hatch
for operators the built-in windowed aggregations can't express.

State shape is one tiny row per key; the update function is built by
a closure factory (cloudpickle by-value — executors cannot import
this package).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, last_ts timestamp"
STATE_SCHEMA = "n bigint, total double, last_ts timestamp"


def _make_update_fn():
    import pandas as pd

    def update(key, pdfs, state):
        # GroupState.get is a PROPERTY returning the state tuple (it
        # raises when no state exists — hence the exists guard)
        n, total, last = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            if last is None or batch_max > last:
                last = batch_max
        state.update((n, total, last))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "last_ts": [last],
            }
        )

    return update


def running_user_totals(events: DataFrame) -> DataFrame:
    """events(user_id, ts, value) → continuously-updated per-user
    totals. Works on a streaming DataFrame; each micro-batch emits
    the refreshed rows for the users it touched."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _make_totals_processor():
    """StatefulProcessor factory (cloudpickle by-value, same worker
    import constraint as the applyInPandasWithState path)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class RunningTotals(StatefulProcessor):
        def init(self, handle):
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, total, last = (
                self._state.get() if self._state.exists() else (0, 0.0, None)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                batch_max = pdf["ts"].max()
                if last is None or batch_max > last:
                    last = batch_max
            self._state.update((n, total, last))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "last_ts": [last],
                }
            )

        def close(self):
            pass

    return RunningTotals()


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """The same running-totals operator on the ``transformWithState``
    API (Spark 4.x): typed per-key ValueState handles instead of one
    opaque state tuple, timers/TTL available, RocksDB state-store
    backed. Output contract is identical to
    :func:`running_user_totals` — the parity test pins both paths
    batch-for-batch."""
    return events.groupBy("user_id").transformWithStateInPandas(
        _make_totals_processor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
