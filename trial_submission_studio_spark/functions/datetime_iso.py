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

import weakref

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


def _render_date(ts: Column) -> Column:
    return F.date_format(ts, "yyyy-MM-dd")


def _render_datetime(ts: Column) -> Column:
    return F.when(F.second(ts) == 0, F.date_format(ts, "yyyy-MM-dd'T'HH:mm")).otherwise(
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
    )


#: Built-ladder memo: the ladder is ~60 Column constructions = ~60
#: py4j round-trips (~0.8 s of driver time per call). The cache holds
#: ONLY ladders built from *string column names* (unbound
#: ``F.col(name)`` trees resolve by name against whichever DataFrame
#: they're used in, so reuse is always safe). Column inputs bypass the
#: cache entirely: a plan-bound Column (``df["x"]``) stringifies
#: identically to another DataFrame's ``df2["x"]``, so a str(col) key
#: would hand plan A's attribute to plan B (AnalysisException
#: MISSING_ATTRIBUTES, or a silently wrong binding in lineage-shared
#: plans). Entries are invalidated wholesale when the active
#: SparkContext changes (weakref identity check) so a gateway/JVM
#: restart can never serve a dead py4j reference.
_LADDER_CACHE: dict[str, Column] = {}
_LADDER_CACHE_MAX = 256
_LADDER_CACHE_CTX: "weakref.ref | None" = None


def _ladder_cache_context():
    from pyspark import SparkContext

    return SparkContext._active_spark_context


def normalize_iso_datetime(c: Column | str) -> Column:
    """T4 Iso8601DateTime: reformat to ISO, preserve partial precision,
    pass unparseable values through verbatim.

    Performance shape: the format ladder is *gated by cheap shape
    regexes*, so a value tries at most ~3 ``try_to_timestamp`` parses
    instead of the full 24-rung ladder — on a 100 TB scan the common
    case (already ISO) costs exactly one regex match. Ladder order
    within the slash branch preserves the documented US-before-EU
    ambiguity resolution.

    Pass a *string column name* on hot compile paths: string inputs
    hit the built-ladder memo; Column inputs are built fresh every
    call (see the cache note above for why they must be).
    """
    global _LADDER_CACHE_CTX
    if not isinstance(c, str):
        return _build_iso_ladder(c)
    sc = _ladder_cache_context()
    if sc is None:
        return _build_iso_ladder(F.col(c))
    if _LADDER_CACHE_CTX is None or _LADDER_CACHE_CTX() is not sc:
        _LADDER_CACHE.clear()
        _LADDER_CACHE_CTX = weakref.ref(sc)
    cached = _LADDER_CACHE.get(c)
    if cached is not None:
        return cached
    out = _build_iso_ladder(F.col(c))
    if len(_LADDER_CACHE) >= _LADDER_CACHE_MAX:
        _LADDER_CACHE.clear()
    _LADDER_CACHE[c] = out
    return out


def _build_iso_ladder(col: Column) -> Column:
    s = F.trim(col.cast("string"))

    slash_date = _ladder(s, ("MM/dd/yyyy", "dd/MM/yyyy"))
    slash_dt = _ladder(
        s,
        ("MM/dd/yyyy HH:mm:ss", "MM/dd/yyyy HH:mm", "dd/MM/yyyy HH:mm:ss", "dd/MM/yyyy HH:mm"),
    )
    ymd_slash = _ladder(s, ("yyyy/MM/dd", "yyyy/MM"))
    ymd_slash_dt = _ladder(s, ("yyyy/MM/dd HH:mm:ss", "yyyy/MM/dd HH:mm"))
    alpha_date = _ladder(s, ("dd-MMM-yyyy", "ddMMMyyyy", "MMM dd, yyyy", "dd MMM yyyy"))
    alpha_dt = _ladder(s, ("dd-MMM-yyyy HH:mm:ss", "dd-MMM-yyyy HH:mm"))
    alpha_ym = _ladder(s, ("MMM yyyy", "MMM-yyyy"))
    compact = _ladder(s, ("yyyyMMdd",))
    compact_dt = _ladder(s, ("yyyyMMdd HH:mm:ss",))
    dotted = _ladder(s, ("dd.MM.yyyy",))
    month_slash = _ladder(s, ("MM/yyyy",))
    iso_dt = _ladder(s, ("yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm"))

    def d(ts: Column) -> Column:
        return _render_date(ts)

    def dt(ts: Column) -> Column:
        return _render_datetime(ts)

    return (
        F.when(s.isNull() | (s == ""), F.lit(None).cast("string"))
        .when(s.rlike(ISO_PARTIAL_RE), s)
        .when(s.rlike(ISO_SPACE_RE), F.regexp_replace(s, " ", "T"))
        .when(s.rlike(r"^\d{1,2}/\d{1,2}/\d{4}$"), F.coalesce(d(slash_date), s))
        .when(s.rlike(r"^\d{1,2}/\d{1,2}/\d{4} \d"), F.coalesce(dt(slash_dt), s))
        .when(s.rlike(r"^\d{4}/\d{1,2}(/\d{1,2})?$"), F.coalesce(
            d(_ladder(s, ("yyyy/MM/dd",))),
            F.date_format(ymd_slash, "yyyy-MM"),
            s,
        ))
        .when(s.rlike(r"^\d{4}/\d{1,2}/\d{1,2} \d"), F.coalesce(dt(ymd_slash_dt), s))
        .when(s.rlike(r"^\d{1,2}/\d{4}$"), F.coalesce(F.date_format(month_slash, "yyyy-MM"), s))
        .when(s.rlike(r"^\d{8}$"), F.coalesce(d(compact), s))
        .when(s.rlike(r"^\d{8} \d"), F.coalesce(dt(compact_dt), s))
        .when(s.rlike(r"^\d{1,2}\.\d{1,2}\.\d{4}$"), F.coalesce(d(dotted), s))
        .when(s.rlike(r"^\d{4}-\d{2}-\d{2} \d"), F.coalesce(dt(iso_dt), s))
        .when(
            s.rlike(r"[A-Za-z]") & s.rlike(r"\d{4}"),
            F.coalesce(
                dt(alpha_dt),
                d(alpha_date),
                F.date_format(alpha_ym, "yyyy-MM"),
                s,
            ),
        )
        .otherwise(s)
    )


def normalize_iso_date(c: Column | str) -> Column:
    """T5 Iso8601Date — delegates to T4 (the reference does the same:
    executor.rs:249-257; time components are not truncated)."""
    return normalize_iso_datetime(c)
