"""Numeric parse/render transforms (SURVEY.md §2.3 T9, T13).

Reference parity (semantics only):

- ``parse_numeric`` ≙ NormalizationType::NumericConversion
  (tss-submit/src/normalize/executor.rs:399-438 +
  normalization/numeric.rs:15-38): strip thousands separators,
  plain/NBSP spaces; accept scientific notation and nan/inf tokens;
  unparseable → NULL.
- ``render_numeric`` ≙ format_numeric (tss-standards/src/
  polars.rs:77-91): float → string without trailing zeros
  (40.0 → "40", 1.50 → "1.5").

Implementation is pure JVM expressions (regexp + try_cast), ANSI-safe.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


#: thousands separators and space variants the reference strips
_STRIP_RE = "[,\\s  ]"


def parse_numeric(c: Column | str) -> Column:
    """String → DoubleType; unparseable → NULL (never an error)."""
    s = F.regexp_replace(F.trim(_col(c).cast("string")), _STRIP_RE, "")
    low = F.lower(s)
    return (
        F.when(low.isin("nan"), F.lit(float("nan")))
        .when(low.isin("inf", "+inf", "infinity", "+infinity"), F.lit(float("inf")))
        .when(low.isin("-inf", "-infinity"), F.lit(float("-inf")))
        .otherwise(s.try_cast("double"))
    )


def render_numeric(c: Column | str, max_integral_digits: int = 15) -> Column:
    """Double → string with no trailing zeros and no trailing dot.

    Integral values render with no decimal point ("40", not "40.0").
    Values too large for exact integer render fall back to Spark's
    default double formatting.
    """
    c = _col(c).cast("double")
    integral = (c == F.floor(c)) & (F.abs(c) < F.lit(float(10**max_integral_digits)))
    stripped = F.regexp_replace(
        F.regexp_replace(c.cast("string"), "(\\.\\d*?)0+$", "$1"), "\\.$", ""
    )
    return (
        F.when(c.isNull(), F.lit(None).cast("string"))
        .when(integral, c.cast("decimal(20,0)").cast("string"))
        .otherwise(stripped)
    )
