"""Structured Streaming ingest (north-star extension; the reference is
batch-only — SURVEY.md §2.12).

The same transformation applies to a batch DataFrame and a streaming
one (Structured Streaming's core contract), so
:func:`tumbling_window_counts` is the single definition used by both
the oracle-checked batch query and the streaming smoke test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_window_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Per (tumbling window, event_type): count + value sum.

    Batch and streaming share this plan; in streaming mode the
    watermark bounds state for late data.
    """
    src = events
    if watermark and events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window_duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Per (user, session) stats via the native ``session_window``:
    event count + value sum with the session's start/end bounds. The
    streaming twin of ``operators.skew.sessionize`` (which assigns
    per-EVENT session ids batch-side); one definition serves batch
    and stream, like :func:`tumbling_window_counts`.

    Boundary note: ``session_window`` sessions are ``[start, last_ts
    + gap)`` — an event at EXACTLY the gap boundary opens a new
    session, where ``sessionize``'s strict ``> gap`` test keeps it.
    Sub-gap-resolution data (the normal case) is identical.

    In streaming mode the watermark is REQUIRED for append output
    (session state must close); pass e.g. ``"2 hours"``.
    """
    src = events
    if watermark and events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(
            F.session_window(ts_col, f"{int(gap_minutes)} minutes").alias("sw"),
            user_col,
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.col("sw.end"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            user_col,
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    id_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once event delivery over an at-least-once stream:
    drop duplicate ``id_cols`` arrivals, keeping state only inside
    the watermark horizon.

    Streaming mode uses ``dropDuplicatesWithinWatermark`` so the
    dedup state is GC'd as the watermark advances — an unbounded
    ``dropDuplicates`` would grow state forever on an infinite
    stream. The same call on a batch frame degrades to a plain
    ``dropDuplicates`` over the id columns (batch ≡ bounded stream),
    so one definition serves both, like
    :func:`tumbling_window_counts`.
    """
    keys = id_cols or ["event_id"]
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def stream_events(
    spark: SparkSession,
    path: str,
    schema: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
) -> DataFrame:
    """readStream over the events parquet directory (smoke path; a
    production deployment points this at Kafka/files with the same
    downstream plan)."""
    return spark.readStream.schema(schema).parquet(path)
