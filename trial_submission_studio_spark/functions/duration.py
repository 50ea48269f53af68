"""ISO-8601 duration normalization (SURVEY.md T6).

Reference semantics (tss-submit/src/normalize/normalization/
duration.rs:20-283):

- valid ISO-8601 duration → passthrough (uppercased);
- bare numeric value = days: 5 → "P5D", 1.5 → "P1DT12H",
  0.5 → "PT12H";
- free-text grammar: "2 hours 30 minutes" → "PT2H30M",
  "2 weeks" → "P2W", "30min" → "PT30M", "5d" → "P5D";
- unparseable / blank → passthrough verbatim.

The grammar is too irregular for a clean expression chain, so this is
the engine's one designated Pandas-UDF hot path: Arrow-batched,
vectorized per ~10k-row batch — not per-row Python (SURVEY.md §4.2).

Implementation note: the scalar normalizer is built by a factory and
exported as a *closure* so cloudpickle serializes it by value — the
UDF then runs on executors that cannot import this package (the
hosting application controls PYTHONPATH, not us).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def _build_normalizer():
    """Factory returning the scalar duration normalizer.

    Everything the closure needs is local, so cloudpickle ships the
    whole thing by value to Python workers.
    """
    import re

    iso_re = re.compile(
        r"^-?P(?=\d|T\d)(\d+(\.\d+)?Y)?(\d+(\.\d+)?M)?(\d+(\.\d+)?W)?(\d+(\.\d+)?D)?"
        r"(T(\d+(\.\d+)?H)?(\d+(\.\d+)?M)?(\d+(\.\d+)?S)?)?$"
    )
    numeric_re = re.compile(r"^[+-]?\d+(\.\d+)?$")
    # (value, unit) token; longest unit spellings first so "mo" isn't
    # eaten by minutes' bare "m".
    token_re = re.compile(
        r"(\d+(?:\.\d+)?)\s*"
        r"(years?|yrs?|y|months?|mons?|mo|weeks?|wks?|w|days?|d|"
        r"hours?|hrs?|h|minutes?|mins?|min|seconds?|secs?|sec|s|m)\b",
        re.IGNORECASE,
    )
    leftover_re = re.compile(r"[\s,;]+|and", re.IGNORECASE)
    unit_map = {
        "y": "Y", "yr": "Y", "yrs": "Y", "year": "Y", "years": "Y",
        "mo": "MO", "mon": "MO", "mons": "MO", "month": "MO", "months": "MO",
        "w": "W", "wk": "W", "wks": "W", "week": "W", "weeks": "W",
        "d": "D", "day": "D", "days": "D",
        "h": "H", "hr": "H", "hrs": "H", "hour": "H", "hours": "H",
        "m": "MI", "min": "MI", "mins": "MI", "minute": "MI", "minutes": "MI",
        "s": "S", "sec": "S", "secs": "S", "second": "S", "seconds": "S",
    }

    def fmt_num(v: float) -> str:
        return str(int(v)) if float(v).is_integer() else repr(float(v))

    def days_to_iso(days: float):
        if days < 0:
            return None
        d = int(days)
        rem_hours = round((days - d) * 24, 9)
        h = int(rem_hours)
        m = int(round((rem_hours - h) * 60))
        if m == 60:
            h, m = h + 1, 0
        if h == 24:
            d, h = d + 1, 0
        date_part = f"{d}D" if d else ""
        time_part = (f"{h}H" if h else "") + (f"{m}M" if m else "")
        if not date_part and not time_part:
            return "P0D"
        return "P" + date_part + (("T" + time_part) if time_part else "")

    def text_to_iso(text: str):
        tokens = token_re.findall(text)
        if not tokens:
            return None
        # Reject strings with non-token leftovers (arbitrary prose).
        if leftover_re.sub("", token_re.sub("", text)):
            return None
        comp: dict[str, float] = {}
        for value, unit in tokens:
            key = unit_map[unit.lower()]
            comp[key] = comp.get(key, 0.0) + float(value)
        if set(comp) == {"W"}:
            return f"P{fmt_num(comp['W'])}W"
        if "W" in comp:  # mixed weeks → days
            comp["D"] = comp.get("D", 0.0) + comp.pop("W") * 7
        date_part = "".join(
            f"{fmt_num(comp[k])}{'M' if k == 'MO' else k}"
            for k in ("Y", "MO", "D")
            if k in comp
        )
        time_part = "".join(
            f"{fmt_num(comp[k])}{u}"
            for k, u in (("H", "H"), ("MI", "M"), ("S", "S"))
            if k in comp
        )
        if not date_part and not time_part:
            return None
        return "P" + date_part + (("T" + time_part) if time_part else "")

    def normalize(value):
        if value is None:
            return None
        s = value.strip()
        if not s:
            return value
        if iso_re.match(s.upper()):
            return s.upper()
        if numeric_re.match(s):
            iso = days_to_iso(float(s))
            return iso if iso is not None else value
        iso = text_to_iso(s)
        return iso if iso is not None else value

    return normalize


#: scalar semantics, shared by the UDF and unit tests
normalize_duration_str = _build_normalizer()


@F.pandas_udf(StringType())
def _duration_udf(s: pd.Series) -> pd.Series:
    return s.map(normalize_duration_str)


def normalize_iso_duration(c: Column | str) -> Column:
    """T6 Iso8601Duration as a vectorized (Arrow) column transform."""
    col = F.col(c) if isinstance(c, str) else c
    return _duration_udf(col.cast("string"))
