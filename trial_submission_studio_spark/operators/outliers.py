"""Group-wise numeric outlier detection — the Tukey-fence (IQR) and
z-score screens a pipeline runs on numeric columns before training
or submission (value-shift bugs, sensor glitches, fat-finger rows).

Two methods, chosen for different guarantees:

- ``iqr`` (default): Tukey fences ``[q1 - k*iqr, q3 + k*iqr]`` with
  quartiles taken as ``percentile_disc`` — an ACTUAL DATASET VALUE,
  not an interpolation, so the bounds (and therefore every flag) are
  exactly reproducible across engines and library versions. Robust
  to the very outliers being hunted.
- ``zscore``: mean ± k·stddev_samp. Cheaper (no sort-based
  percentile) but the moments are float accumulations (engine
  reduction order varies in the last ulp) and both moments move
  with the outliers themselves; use for monitoring, not contracts.

Scale shape (100 TB): one aggregation to group grain (percentile_disc
is a within-group sort — bounded by group size; moments are one-pass),
then the group-bounds table (group-cardinality-sized) broadcast-joins
back and flagging is row-local. No global sort, no window over the
raw table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["outlier_bounds", "flag_outliers", "remove_outliers"]


def outlier_bounds(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    method: str = "iqr",
    k: float = 1.5,
) -> DataFrame:
    """Per-group ``(lo, hi)`` fences (one row per group; one global
    row when ``group_cols`` is empty). NULL values are ignored by
    both quantiles and moments. ``k``: 1.5 = Tukey's inner fences
    (``iqr``) / standard deviations (``zscore``)."""
    if k <= 0:
        raise ValueError("k must be > 0")
    v = F.col(value_col)
    if method == "iqr":
        # percentile_disc: the smallest value whose cumulative rank
        # reaches the fraction — exact dataset values in any engine
        q1 = F.expr(f"percentile_disc(0.25) WITHIN GROUP (ORDER BY {value_col})")
        q3 = F.expr(f"percentile_disc(0.75) WITHIN GROUP (ORDER BY {value_col})")
        aggs = [
            (q1 - (q3 - q1) * F.lit(float(k))).alias("lo"),
            (q3 + (q3 - q1) * F.lit(float(k))).alias("hi"),
        ]
    elif method == "zscore":
        m, s = F.avg(v), F.stddev_samp(v)
        aggs = [
            (m - s * F.lit(float(k))).alias("lo"),
            (m + s * F.lit(float(k))).alias("hi"),
        ]
    else:
        raise ValueError("method must be iqr or zscore")
    g = list(group_cols)
    return df.groupBy(*g).agg(*aggs) if g else df.agg(*aggs)


def flag_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    method: str = "iqr",
    k: float = 1.5,
    flag_col: str = "is_outlier",
) -> DataFrame:
    """``df`` plus a boolean ``flag_col``: value outside its group's
    fences. NULL values are never outliers (NULL flag=false). Groups
    absent from the bounds table cannot occur (bounds come from the
    same frame); a group whose fences are NULL (all-NULL or, for
    zscore, single-row groups) flags nothing."""
    g = list(group_cols)
    bounds = outlier_bounds(df, value_col, g, method, k)
    if g:
        # null-safe group equality: a NULL group key is a real group
        # (it got its own fences from the groupBy) and its rows must
        # not vanish through a plain equi-join
        b = bounds.select(
            *[F.col(c).alias(f"__b_{c}") for c in g], "lo", "hi"
        )
        cond = None
        for c in g:
            eq = F.col(c).eqNullSafe(F.col(f"__b_{c}"))
            cond = eq if cond is None else cond & eq
        joined = df.join(F.broadcast(b), cond).drop(*[f"__b_{c}" for c in g])
    else:
        joined = df.crossJoin(F.broadcast(bounds))
    v = F.col(value_col)
    return joined.withColumn(
        flag_col,
        F.coalesce(
            v.isNotNull() & ((v < F.col("lo")) | (v > F.col("hi"))),
            F.lit(False),
        ),
    ).drop("lo", "hi")


def remove_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    method: str = "iqr",
    k: float = 1.5,
) -> DataFrame:
    """Rows whose value is inside its group's fences (NULL values
    kept — filter those with an expectations ``not_null`` check if
    unwanted). Schema unchanged."""
    flagged = flag_outliers(df, value_col, group_cols, method, k, "__out")
    return flagged.filter(~F.col("__out")).drop("__out")
