"""Re-identification risk audit — k-anonymity / l-diversity over
quasi-identifier columns, plus the two mechanical mitigations
(row suppression, numeric generalization banding).

Closes the privacy family begun by :mod:`.pii` (detect / redact /
pseudonymize): after direct identifiers are scrubbed, the remaining
risk is LINKAGE through quasi-identifiers — combinations like
(zip, birth-year, sex) that single out individuals (Sweeney 2002,
"k-anonymity: a model for protecting privacy"; Machanavajjhala 2007,
"l-diversity"). A release is k-anonymous when every quasi-identifier
equivalence class holds >= k rows, and l-diverse when every class
carries >= l distinct sensitive values (k alone permits homogeneity
attacks: a class of 50 rows all sharing one diagnosis re-identifies
the attribute, not the row).

Reference parity note: the reference engine
(rubentalstra/Trial-Submission-Studio) pseudonymizes by construction
(USUBJID, `crates/tss-submit/src/pipeline/transforms.rs` UsubjidPrefix)
but has no release-risk audit; this extends the governance family
(SURVEY.md SS2.13) for both the clinical and LLM-pipeline tracks.

Scale shape (100 TB): everything is ONE hash aggregation on the
quasi-identifier tuple. The report is a two-level agg (class grain ->
1 row, the second level is class-count-sized); suppression is a
window count over the same partitioning (no join, AQE handles skew);
banding is a row-local expression. Class keys are whatever the quasi
columns are — cardinality is bounded by the released population, so
the aggregate state is rows-distinct-sized, never corpus-sized.

NULL quasi-values form their own equivalence class in both Spark's
``groupBy`` and ANSI ``GROUP BY`` — the DuckDB oracle matches for
free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "equivalence_class_sizes",
    "k_anonymity_report",
    "suppress_below_k",
    "generalize_band",
]


def _quasi(quasi_cols: Sequence[str]) -> list[str]:
    cols = list(quasi_cols)
    if not cols:
        raise ValueError("need at least one quasi-identifier column")
    return cols


def equivalence_class_sizes(
    df: DataFrame, quasi_cols: Sequence[str]
) -> DataFrame:
    """Per equivalence class (one row per distinct quasi-identifier
    tuple): ``class_size``. The base frame for both the report and
    ad-hoc inspection of the riskiest classes
    (``.orderBy("class_size")``)."""
    cols = _quasi(quasi_cols)
    return df.groupBy(*cols).agg(F.count("*").cast("long").alias("class_size"))


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 2,
    sensitive_col: str | None = None,
) -> DataFrame:
    """ONE-row release-risk summary, all-integer so it hashes
    identically across engines:

    - ``n_rows`` / ``n_classes`` — population and distinct
      quasi-tuples (their ratio is the average prosecutor
      re-identification risk; kept as two exact ints rather than a
      rounded float).
    - ``k_anonymity`` — min class size: the release is
      k_anonymity-anonymous and no better.
    - ``n_classes_below_k`` / ``n_rows_below_k`` — what suppression
      at ``k`` would remove (:func:`suppress_below_k`).
    - ``n_unique_rows`` — size-1 classes: rows singled out exactly.
    - with ``sensitive_col``: ``l_diversity`` — min distinct
      sensitive values over classes — and ``n_homogeneous_classes``
      (exactly one sensitive value: attribute disclosure even when
      k holds).

    Plan: one hash agg to class grain, one tiny agg to a single row.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    cols = _quasi(quasi_cols)
    aggs = [F.count("*").cast("long").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).cast("long").alias("n_sens")
        )
    classes = df.groupBy(*cols).agg(*aggs)
    out = [
        F.sum("class_size").cast("long").alias("n_rows"),
        F.count("*").cast("long").alias("n_classes"),
        F.min("class_size").cast("long").alias("k_anonymity"),
        F.sum((F.col("class_size") < k).cast("long"))
        .cast("long")
        .alias("n_classes_below_k"),
        F.sum(F.when(F.col("class_size") < k, F.col("class_size")).otherwise(0))
        .cast("long")
        .alias("n_rows_below_k"),
        F.sum((F.col("class_size") == 1).cast("long"))
        .cast("long")
        .alias("n_unique_rows"),
    ]
    if sensitive_col is not None:
        out.append(F.min("n_sens").cast("long").alias("l_diversity"))
        out.append(
            F.sum((F.col("n_sens") == 1).cast("long"))
            .cast("long")
            .alias("n_homogeneous_classes")
        )
    return classes.agg(*out)


def suppress_below_k(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 2
) -> DataFrame:
    """Drop every row whose equivalence class holds fewer than ``k``
    rows — the suppression mitigation. After this,
    :func:`k_anonymity_report` on the result reports
    ``k_anonymity >= k`` (or an empty release).

    One window count over the class partitioning — same single
    shuffle as the report, no self-join, schema unchanged."""
    if k < 1:
        raise ValueError("k must be >= 1")
    cols = _quasi(quasi_cols)
    w = Window.partitionBy(*[F.col(c) for c in cols])
    return (
        df.withColumn("__cls_n", F.count("*").over(w))
        .filter(F.col("__cls_n") >= k)
        .drop("__cls_n")
    )


def generalize_band(c: Column | str, width: int | float) -> Column:
    """Numeric generalization: map a value to the inclusive lower
    bound of its ``width``-sized band (``floor(v / width) * width``)
    — e.g. ages 34 -> 30 at width 5 prior to re-running the report.
    Deterministic, row-local, NULL-safe (NULL stays NULL)."""
    if width <= 0:
        raise ValueError("width must be > 0")
    col = F.col(c) if isinstance(c, str) else c
    return F.floor(col / F.lit(width)) * F.lit(width)
