"""Study-codelist decode + derive/fill (SURVEY.md T11).

Reference semantics (tss-ingest/src/metadata/application.rs:38-151):
a coded column ``XCD`` decodes through the study codelist to a text
column named without the ``CD`` suffix (SEXCD→SEX); if the decoded
target column already exists, only its *empty* cells are filled.
Lookup is 3-tier: exact > uppercase > numeric-normalized ("1.0" ≡ "1"
— metadata/types.rs:160-178).

Spark-first: broadcast join on a normalized key + ``coalesce`` fill.
The numeric tier is implemented by normalizing both sides with
``try_cast(double)`` → render, so "1.0", "1", and " 1 " share a key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _norm_key(c: Column) -> Column:
    """Uppercased trim, with numeric values canonicalized (1.0 ≡ 1)."""
    s = F.upper(F.trim(c.cast("string")))
    num = s.try_cast("double")
    canon_num = F.when(
        num.isNotNull() & (num == F.floor(num)) & (F.abs(num) < 1e15),
        num.cast("decimal(20,0)").cast("string"),
    ).otherwise(num.cast("string"))
    return F.coalesce(F.when(num.isNotNull(), canon_num), s)


def apply_codelist_decode(
    df: DataFrame,
    coded_col: str,
    codelist_df: DataFrame,
    target_col: str | None = None,
) -> DataFrame:
    """Decode ``coded_col`` through (code_value → code_text).

    ``codelist_df`` must have columns ``code_value``, ``code_text``.
    Target defaults to the reference's naming rule: strip a trailing
    'CD', else append '_DECODED'. Existing targets are fill-only.
    """
    if target_col is None:
        target_col = (
            coded_col[:-2] if coded_col.upper().endswith("CD") else coded_col + "_DECODED"
        )
    lk = codelist_df.select(
        _norm_key(F.col("code_value")).alias("__cl_key"),
        F.col("code_text").alias("__cl_text"),
    ).dropDuplicates(["__cl_key"])
    joined = df.join(
        F.broadcast(lk), _norm_key(F.col(coded_col)) == F.col("__cl_key"), "left"
    )
    if target_col in df.columns:
        # fill-only: keep non-empty existing values
        existing = F.when(
            F.trim(F.col(target_col).cast("string")) == "", F.lit(None)
        ).otherwise(F.col(target_col).cast("string"))
        out_expr = F.coalesce(existing, F.col("__cl_text"))
    else:
        out_expr = F.col("__cl_text")
    return joined.withColumn(target_col, out_expr).drop("__cl_key", "__cl_text")
