"""Streaming twin of the declarative expectations engine — per-row
violation flags and watermarked windowed violation counts over a
live stream.

Batch `operators/expectations.expect` SUMMARIZES (one row per check);
a stream cannot run an unbounded global aggregate, so the streaming
shape is different and arguably more useful in flight:

- :func:`streaming_expect_flags` appends one boolean column per
  check plus a violation total — row-local, legal in any stateless
  plan, so sinks can ROUTE (quarantine violating rows, alert on
  ``viol_total > 0``) as data arrives. ``foreign_key`` is allowed
  too: a stream-static left join against the (static, broadcastable)
  reference table is supported by Structured Streaming and stays a
  per-row flag.
- :func:`windowed_violation_counts` turns the flags into the
  streaming analog of the batch summary: per event-time window,
  per-check violation sums under a watermark — bounded state, late
  data handled by the engine.

``unique`` is structurally cross-row over the WHOLE corpus and
RAISES here (the corpus-prep loud-failure discipline: silently
skipping a uniqueness check is how duplicate keys reach storage).
Run it downstream on the accumulated table, or as exactly-once key
dedup via `streaming/ingest.py`.

Both functions are plain transformations: the same call on a batch
frame produces the same plan, which is how the tests pin
batch ≡ stream equivalence.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.expectations import _ROW_LOCAL, _label, _row_violation, _validate

__all__ = ["streaming_expect_flags", "windowed_violation_counts"]


def _flag_name(e: dict[str, Any], prefix: str) -> str:
    return prefix + (
        _label(e)
        .replace("(", "_")
        .rstrip(")")
        .replace(",", "_")
    )


def streaming_expect_flags(
    df: DataFrame,
    spec: Sequence[dict[str, Any]],
    prefix: str = "viol_",
) -> DataFrame:
    """``df`` plus one boolean ``<prefix><check>`` column per
    expectation and a ``<prefix>total`` count — schema-stable,
    stateless (stream-static join for ``foreign_key``), append-mode
    safe. ``unique`` raises: it needs corpus-wide state."""
    entries = _validate(spec)
    for e in entries:
        if e["check"] == "unique":
            raise ValueError(
                "unique() is corpus-wide and cannot run statelessly on a "
                "stream; run it on the accumulated table (operators."
                "expectations.expect) or dedup keys exactly-once via "
                "streaming/ingest"
            )
    orig = list(df.columns)
    out = df
    flags: list[str] = []
    for e in entries:
        name = _flag_name(e, prefix)
        if e["check"] in _ROW_LOCAL:
            out = out.withColumn(name, _row_violation(e))
        else:  # foreign_key: stream-static left join, per-row flag
            ref = (
                e["ref"]
                .select(F.col(e["ref_col"]).alias(e["col"]))
                .distinct()
                .withColumn("__fk_hit", F.lit(True))
            )
            out = out.join(F.broadcast(ref), e["col"], "left").withColumn(
                name,
                F.col(e["col"]).isNotNull() & F.col("__fk_hit").isNull(),
            ).drop("__fk_hit")
        flags.append(name)
    total = None
    for name in flags:
        c = F.col(name).cast("int")
        total = c if total is None else total + c
    # schema-stable: original columns first (a USING join would have
    # moved the key to the front), then flags in spec order
    return out.withColumn(f"{prefix}total", total.cast("long")).select(
        *orig, *flags, f"{prefix}total"
    )


def windowed_violation_counts(
    flagged: DataFrame,
    spec: Sequence[dict[str, Any]],
    ts_col: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    prefix: str = "viol_",
) -> DataFrame:
    """The streaming summary: per event-time tumbling ``window``,
    ``n_rows`` plus one violation-sum column per check — a
    watermarked aggregation (bounded state; append/update sinks).
    Feed it the output of :func:`streaming_expect_flags` built from
    the SAME ``spec``/``prefix``."""
    entries = _validate(spec)
    names = [_flag_name(e, prefix) for e in entries if e["check"] != "unique"]
    src = flagged
    if src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return src.groupBy(F.window(F.col(ts_col), window).alias("window")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[
            F.sum(F.col(n).cast("long")).cast("long").alias(f"{n}_n")
            for n in names
        ],
    )
