"""Items.csv / CodeLists.csv study-metadata ingest — S5 (SURVEY.md
§2.1) with statistical column-role detection (tss-ingest/src/
metadata/detection.rs:142-294).

The reference detects which physical column plays which role (ID,
Label, DataType, Mandatory, FormatName, ContentLength) from value
statistics, NOT from header names. Here the statistics come from one
distributed profiling pass (:func:`column_hints`); the role scoring
itself is driver-side Python over the schema-sized profile.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from trial_submission_studio_spark.operators.profiling import column_hints
from trial_submission_studio_spark.sources.csv_reader import SourceTable, read_source_csv


@dataclass
class SourceColumnMeta:
    id: str
    label: str = ""
    data_type: str = "text"
    mandatory: bool = False
    format_name: str = ""
    content_length: int | None = None


@dataclass
class StudyMetadata:
    items: dict[str, SourceColumnMeta] = field(default_factory=dict)
    codelists: dict[str, dict[str, str]] = field(default_factory=dict)


def detect_roles(table: SourceTable) -> dict[str, str]:
    """column-name → role, scored from value statistics.

    Heuristics mirror the reference's (detection.rs): the ID column is
    unique, non-empty, short; Label has the longest average length;
    DataType has 2-8 short distinct values; Mandatory 2-3 very short;
    FormatName is >20% empty; ContentLength is numeric and short.
    """
    prof = {
        r["column"]: r.asDict()
        for r in column_hints(table.df, table.columns, exact=True).collect()
    }
    roles: dict[str, str] = {}

    def pick(role: str, scorer) -> None:
        best, best_score = None, 0.0
        for c, p in prof.items():
            if c in roles.values():
                continue
            s = scorer(p)
            if s > best_score:
                best, best_score = c, s
        if best is not None and best_score > 0:
            roles[role] = best

    pick(
        "id",
        # unique, never empty, textual (a numeric unique column is a
        # length/sequence, not an item id), short-ish
        lambda p: (p["unique_ratio"] >= 0.999)
        * (p["null_ratio"] == 0)
        * (p["numeric_ratio"] < 0.5)
        * (1.0 / (1 + (p["avg_len"] or 99))),
    )
    pick("label", lambda p: (p["avg_len"] or 0.0))
    pick(
        "data_type",
        lambda p: (2 <= p["distinct"] <= 8)
        * (p["unique_ratio"] < 0.9)
        * ((p["avg_len"] or 99) <= 10)
        * 1.0,
    )
    pick(
        "mandatory",
        lambda p: (2 <= p["distinct"] <= 3)
        * (p["unique_ratio"] < 0.9)
        * ((p["avg_len"] or 99) <= 5)
        * 1.0,
    )
    pick("format_name", lambda p: (p["null_ratio"] > 0.2) * (1 - p["null_ratio"]))
    pick(
        "content_length",
        lambda p: (p["numeric_ratio"] >= 0.99) * ((p["avg_len"] or 99) <= 4) * 1.0,
    )
    return {v: k for k, v in roles.items()}  # column -> role


def load_items_metadata(
    spark: SparkSession,
    items_path: str,
    codelists_path: str | None = None,
    header_rows: int = 2,
) -> StudyMetadata:
    table = read_source_csv(spark, items_path, header_rows=header_rows)
    col_roles = detect_roles(table)
    by_role = {role: col for col, role in col_roles.items()}
    meta = StudyMetadata()
    id_col = by_role.get("id")
    if id_col is None:
        raise ValueError(f"could not detect the ID column in {items_path}")
    rows = table.df.collect()  # Items.csv is schema-sized
    truthy = {"true", "yes", "y", "1"}
    for r in rows:
        rid = r[id_col]
        if rid is None:
            continue
        cl = r[by_role["content_length"]] if "content_length" in by_role else None
        meta.items[rid] = SourceColumnMeta(
            id=rid,
            label=(r[by_role["label"]] if "label" in by_role else "") or "",
            data_type=((r[by_role["data_type"]] if "data_type" in by_role else "") or "text").lower(),
            mandatory=str(
                (r[by_role["mandatory"]] if "mandatory" in by_role else "") or ""
            ).strip().lower()
            in truthy,
            format_name=(r[by_role["format_name"]] if "format_name" in by_role else "") or "",
            content_length=int(cl) if cl and str(cl).strip().isdigit() else None,
        )
    if codelists_path:
        cl_table = read_source_csv(spark, codelists_path, header_rows=header_rows)
        for r in cl_table.df.collect():
            d = r.asDict()
            fmt = d.get("FormatName")
            if not fmt:
                continue
            meta.codelists.setdefault(fmt, {})[str(d.get("CodeValue"))] = (
                d.get("CodeText") or ""
            )
    return meta
