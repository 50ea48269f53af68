"""String scalar transforms (SURVEY.md §2.3 T2, T12, T14; §2.9).

Reference parity notes (semantics only; implementation is Spark
expressions, not a port):

- ``usubjid_prefix`` ≙ NormalizationType::UsubjidPrefix
  (tss-submit/src/normalize/executor.rs:124-174): USUBJID =
  "{study_id}-{trim(SUBJID)}", with the edge case that a blank
  SUBJID yields a blank USUBJID, not "{study_id}-".
- ``bool_yn`` ≙ any_to_string's Bool arm (tss-standards/src/
  polars.rs:38): true→"Y", false→"N".
- ``qnam_autogen`` ≙ SUPP qualifier-name generation
  (tss-persistence/src/types/supp.rs:28-48): keep alphanumerics,
  uppercase, truncate to 8.
- ``upcase`` ≙ export-time case normalization (tss-submit/src/
  export/common.rs:132-135).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def blank_as_null(c: Column | str) -> Column:
    """'' / whitespace-only → NULL (the engine-wide null discipline)."""
    c = _col(c)
    return F.when(F.trim(c) == "", F.lit(None)).otherwise(c)


def usubjid_prefix(subjid: Column | str, study_id: str) -> Column:
    """USUBJID = '{study_id}-{trim(subjid)}'; blank subjid → blank."""
    s = F.trim(_col(subjid).cast("string"))
    return (
        F.when(s.isNull() | (s == ""), F.lit(""))
        .otherwise(F.concat_ws("-", F.lit(study_id), s))
    )


def bool_yn(c: Column | str) -> Column:
    c = _col(c)
    return F.when(c.isNull(), F.lit(None)).when(c, F.lit("Y")).otherwise(F.lit("N"))


def upcase(c: Column | str) -> Column:
    return F.upper(_col(c))


def qnam_autogen(c: Column | str) -> Column:
    """Source column name → SUPP QNAM: alnum-only, upper, ≤8 chars."""
    c = _col(c).cast("string")
    return F.upper(F.substring(F.regexp_replace(c, "[^A-Za-z0-9]", ""), 1, 8))
