"""ISO-8601 partial-precision datetime normalization (SURVEY.md T4/T5).

The reference's hardest semantic (tss-submit/src/normalize/
normalization/datetime.rs:69-302): values arrive in ~27 source
formats, get reformatted to ISO 8601, *partial precision is
preserved* ("2024-01" stays "2024-01"), and unparseable values pass
through verbatim (never nulled, never errored).

Spark-first design: a single Column expression —

1. already-valid ISO partial-precision → passthrough (short-circuit);
2. ISO with a space separator → 'T' substitution;
3. datetime-format ladder (``try_to_timestamp`` coalesce) → render
   ``yyyy-MM-ddTHH:mm[:ss]``;
4. date-format ladder → render ``yyyy-MM-dd``;
5. year-month ladder → render ``yyyy-MM``;
6. otherwise the original trimmed string.

All branches are JVM expressions inside one whole-stage-codegen span;
``try_to_timestamp`` makes the ladder ANSI-safe (failed parse = NULL,
try next rung).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MM = "(0[1-9]|1[0-2])"
_DD = "(0[1-9]|[12][0-9]|3[01])"
_HH = "([01][0-9]|2[0-3])"
_MI = "[0-5][0-9]"
_SS = "([0-5][0-9]|60)"

#: Valid ISO-8601 partial-precision value: YYYY[-MM[-DD[THH:MM[:SS[.fff]]]]]
#: (reference validity grammar: normalization/datetime.rs:100-182,
#: validate/checks/dates.rs:18-25)
ISO_PARTIAL_RE = (
    f"^\\d{{4}}(-{_MM}(-{_DD}(T{_HH}:{_MI}(:{_SS}(\\.\\d{{1,6}})?)?)?)?)?$"
)

#: Same but with a space separator between date and time.
ISO_SPACE_RE = f"^\\d{{4}}-{_MM}-{_DD} {_HH}:{_MI}(:{_SS}(\\.\\d{{1,6}})?)?$"

#: Full-precision date prefix (what study-day needs).
ISO_FULL_DATE_RE = f"^\\d{{4}}-{_MM}-{_DD}"

# Parse ladders. Order matters for ambiguous values: the reference
# tries US month-first before EU day-first (datetime.rs:213-238).
DATETIME_FORMATS = (
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm",
    "MM/dd/yyyy HH:mm:ss",
    "MM/dd/yyyy HH:mm",
    "dd/MM/yyyy HH:mm:ss",
    "dd/MM/yyyy HH:mm",
    "dd-MMM-yyyy HH:mm:ss",
    "dd-MMM-yyyy HH:mm",
    "yyyy/MM/dd HH:mm:ss",
    "yyyy/MM/dd HH:mm",
    "yyyyMMdd HH:mm:ss",
)

DATE_FORMATS = (
    "MM/dd/yyyy",
    "dd/MM/yyyy",
    "dd-MMM-yyyy",
    "ddMMMyyyy",
    "yyyy/MM/dd",
    "dd.MM.yyyy",
    "yyyyMMdd",
    "MMM dd, yyyy",
    "dd MMM yyyy",
)

YEAR_MONTH_FORMATS = (
    "MMM yyyy",
    "MMM-yyyy",
    "MM/yyyy",
    "yyyy/MM",
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _ladder(s: Column, formats: tuple[str, ...]) -> Column:
    return F.coalesce(*[F.try_to_timestamp(s, F.lit(fmt)) for fmt in formats])


def is_iso_partial(c: Column | str) -> Column:
    """BooleanColumn: value is valid ISO-8601 partial precision."""
    return F.trim(_col(c).cast("string")).rlike(ISO_PARTIAL_RE)


def normalize_iso_datetime(c: Column | str) -> Column:
    """T4 Iso8601DateTime: reformat to ISO, preserve partial precision,
    pass unparseable values through verbatim."""
    s = F.trim(_col(c).cast("string"))
    dt = _ladder(s, DATETIME_FORMATS)
    d = _ladder(s, DATE_FORMATS)
    ym = _ladder(s, YEAR_MONTH_FORMATS)
    render_dt = F.when(
        F.second(dt) == 0, F.date_format(dt, "yyyy-MM-dd'T'HH:mm")
    ).otherwise(F.date_format(dt, "yyyy-MM-dd'T'HH:mm:ss"))
    return (
        F.when(s.isNull() | (s == ""), F.lit(None).cast("string"))
        .when(s.rlike(ISO_PARTIAL_RE), s)
        .when(s.rlike(ISO_SPACE_RE), F.regexp_replace(s, " ", "T"))
        .when(dt.isNotNull(), render_dt)
        .when(d.isNotNull(), F.date_format(d, "yyyy-MM-dd"))
        .when(ym.isNotNull(), F.date_format(ym, "yyyy-MM"))
        .otherwise(s)
    )


def normalize_iso_date(c: Column | str) -> Column:
    """T5 Iso8601Date — delegates to T4 (the reference does the same:
    executor.rs:249-257; time components are not truncated)."""
    return normalize_iso_datetime(c)
