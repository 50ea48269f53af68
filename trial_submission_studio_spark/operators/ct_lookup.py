"""CT normalization as a broadcast join (SURVEY.md T8, J7).

Reference semantics (tss-submit/src/normalize/normalization/ct.rs:
78-133): case-insensitive lookup of the raw value (or any synonym)
against a codelist → canonical CDISC submission value; not found →
original value preserved; blank → passthrough; no codelist bound →
copy.

Spark-first: one broadcast left join per CT-coded column against the
(codelist_code, lookup_key → submission_value) lookup table, then
``coalesce(mapped, original)``. The lookup side is ≪ 10 MB so the
join never shuffles the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_ct_normalization(
    df: DataFrame,
    src_col: str,
    out_col: str,
    lookup_df: DataFrame,
    codelist_code: str,
) -> DataFrame:
    lk = (
        lookup_df.filter(F.col("codelist_code") == codelist_code)
        .select(
            # normalize the build side too — the documented
            # case/whitespace-insensitive semantics must not depend on
            # the caller having pre-uppercased the lookup table
            F.upper(F.trim(F.col("lookup_key"))).alias("__ct_key"),
            F.col("submission_value").alias("__ct_value"),
        )
        .dropDuplicates(["__ct_key"])
    )
    joined = df.join(
        F.broadcast(lk),
        F.upper(F.trim(F.col(src_col).cast("string"))) == F.col("__ct_key"),
        "left",
    )
    out = joined.withColumn(
        out_col,
        F.coalesce(F.col("__ct_value"), F.col(src_col).cast("string")),
    ).drop("__ct_key", "__ct_value")
    return out


def ct_violations(
    df: DataFrame,
    col: str,
    lookup_df: DataFrame,
    codelist_code: str,
    sample_n: int = 5,
) -> DataFrame:
    """V8 CtViolation: values that resolve to no term/synonym.

    One summary row: (violation_count, distinct_violations, samples).
    Anti-join shape (J7 inverted) + bounded distinct-sample aggregation
    (the reference caps samples at 5: validate/checks/ct.rs:15).
    """
    lk = lookup_df.filter(F.col("codelist_code") == codelist_code).select(
        F.upper(F.trim(F.col("lookup_key"))).alias("__ct_key")
    )
    probe = df.select(F.upper(F.trim(F.col(col).cast("string"))).alias("__val")).filter(
        F.col("__val").isNotNull() & (F.col("__val") != "")
    )
    misses = probe.join(
        F.broadcast(lk), probe["__val"] == F.col("__ct_key"), "left_anti"
    )
    return misses.agg(
        F.count(F.lit(1)).cast("long").alias("violation_count"),
        F.countDistinct("__val").cast("long").alias("distinct_violations"),
        F.concat_ws(
            "|", F.slice(F.sort_array(F.collect_set("__val")), 1, sample_n)
        ).alias("samples"),
    )
