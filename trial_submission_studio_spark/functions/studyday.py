"""Study-day derivation (SURVEY.md T7).

Reference semantics (tss-submit/src/normalize/normalization/
studyday.rs:38-84): --DY = datediff(event, reference) with +1 when
the event is on/after the reference (there is no day 0); NULL when
either date is partial-precision or unparseable.

The reference captures ONE global reference date (first non-null
RFSTDTC in DM — normalize/preview.rs:174-190). At scale the correct
form is per-subject: broadcast-join DM(USUBJID, RFSTDTC) into the
event domain and call :func:`study_day` on the joined column. Both
modes use this same expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from trial_submission_studio_spark.functions.datetime_iso import ISO_FULL_DATE_RE


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _full_date(c: Column) -> Column:
    """First 10 chars as a date, only if the value has full-date precision."""
    s = F.trim(c.cast("string"))
    d = F.try_to_timestamp(F.substring(s, 1, 10), F.lit("yyyy-MM-dd")).cast("date")
    return F.when(s.rlike(ISO_FULL_DATE_RE), d)


def study_day(event_dtc: Column | str, ref_dtc: Column | str) -> Column:
    """--DY as IntegerType; NULL unless both dates are full precision."""
    evt = _full_date(_col(event_dtc))
    ref = _full_date(_col(ref_dtc))
    d = F.datediff(evt, ref)
    return F.when(d >= 0, d + 1).otherwise(d).cast("int")
