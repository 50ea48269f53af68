"""Wide→long findings reshape for Findings-class domains (VS/LB).

EDC exports ship findings wide — one column group per measurement
(FIXTURES.md F3: ``ORRES_HEIGHT, ORRESU_HEIGHT, ORRES_WEIGHT, …``) —
while SDTM wants one row per measurement with ``--TESTCD/--ORRES/
--ORRESU``. This operator melts the measure groups with one
``stack``-shaped unpivot per attribute (a narrow map, no shuffle) and
zips them by measure.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class MeasureGroup:
    testcd: str  # e.g. "HEIGHT"
    test: str = ""  # e.g. "Height"
    orres_col: str | None = None
    orresu_col: str | None = None
    extra: dict[str, str] = field(default_factory=dict)  # out col -> src col


def melt_findings(
    df: DataFrame,
    groups: list[MeasureGroup],
    id_cols: list[str],
    testcd_col: str = "TESTCD",
    test_col: str = "TEST",
    orres_col: str = "ORRES",
    orresu_col: str = "ORRESU",
    drop_empty: bool = True,
) -> DataFrame:
    """One output row per (input row × measure group).

    Implemented as an array-of-structs explode: each input row builds
    one struct per measure, then ``explode`` + unpack — all JVM
    expressions in a single narrow stage.
    """
    extra_keys = sorted({k for g in groups for k in g.extra})
    structs = []
    for g in groups:
        fields = [
            F.lit(g.testcd).alias("__testcd"),
            F.lit(g.test or g.testcd).alias("__test"),
            (
                F.col(g.orres_col).cast("string")
                if g.orres_col
                else F.lit(None).cast("string")
            ).alias("__orres"),
            (
                F.col(g.orresu_col).cast("string")
                if g.orresu_col
                else F.lit(None).cast("string")
            ).alias("__orresu"),
        ]
        for k in extra_keys:
            src = g.extra.get(k)
            fields.append(
                (F.col(src).cast("string") if src else F.lit(None).cast("string")).alias(
                    f"__x_{k}"
                )
            )
        structs.append(F.struct(*fields))
    out = df.select(*id_cols, F.explode(F.array(*structs)).alias("__m")).select(
        *id_cols,
        F.col("__m.__testcd").alias(testcd_col),
        F.col("__m.__test").alias(test_col),
        F.col("__m.__orres").alias(orres_col),
        F.col("__m.__orresu").alias(orresu_col),
        *[F.col(f"__m.__x_{k}").alias(k) for k in extra_keys],
    )
    if drop_empty:
        out = out.filter(
            F.col(orres_col).isNotNull() & (F.trim(orres_col) != "")
        )
    return out
