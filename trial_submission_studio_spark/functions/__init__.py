"""Scalar transform expression library (SURVEY.md §2.3 T1–T14).

Every function here returns a :class:`pyspark.sql.Column` built only
from JVM-side expressions (whole-stage codegen eligible) except the
duration grammar, which is a vectorized Pandas UDF. All parse paths
use ``try_*`` variants so behavior is identical under ANSI and
non-ANSI sessions.
"""

from trial_submission_studio_spark.functions.strings import (  # noqa: F401
    blank_as_null,
    bool_yn,
    usubjid_prefix,
    qnam_autogen,
    upcase,
)
from trial_submission_studio_spark.functions.numeric import (  # noqa: F401
    parse_numeric,
    render_numeric,
)
from trial_submission_studio_spark.functions.datetime_iso import (  # noqa: F401
    ISO_PARTIAL_RE,
    ISO_FULL_DATE_RE,
    is_iso_partial,
    normalize_iso_datetime,
    normalize_iso_date,
)
from trial_submission_studio_spark.functions.studyday import study_day  # noqa: F401
from trial_submission_studio_spark.functions.duration import normalize_iso_duration  # noqa: F401
