"""Validation rule engine (SURVEY.md §2.11 V1–V8 + §2.5 J1–J6).

The reference runs 8 per-domain checks plus cross-domain referential
checks, producing an issue report (tss-submit/src/validate/). Every
check here is a DataFrame query producing rows of one shared issue
schema, unioned into a single report:

    (domain, variable, category, severity, count, samples)

categories ≙ validate/issue.rs taxonomy: Presence, Format,
Consistency, Limit, Terminology, CrossReference.

Scale shape: per-domain checks are one aggregation pass per domain
(all per-column predicates in a single ``agg``); cross-domain checks
are anti joins, broadcast where the build side is a key set.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from trial_submission_studio_spark.functions.datetime_iso import ISO_PARTIAL_RE

ISSUE_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType()),
        T.StructField("variable", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("severity", T.StringType()),
        T.StructField("count", T.LongType()),
        T.StructField("samples", T.ArrayType(T.StringType())),
    ]
)


def _issue_frame(spark, rows):
    """Driver-local issue frame, built WITHOUT any Python-worker task.

    r16 put the rows on ONE parallelize slice (one Python hop instead
    of 32). r17 removes the hop entirely: on this class of host a
    single Python-worker task costs ~150-300 ms of protocol latency
    even with a warm reused worker (measured: 1-task pickle job 0.3 s,
    JVM 1-row job 0.02 s), and an issue frame is collected once per
    validation call. Issue rows are driver-known literals, so the
    frame compiles to ``inline(array(struct(...)))`` over a 1-split
    range — a pure-JVM LocalTableScan-shaped plan, zero Python tasks.
    Content and column set are identical (pinned by the validate
    tests and the v_domain_check_gates oracle). Very large row lists
    (not a validation shape — reports are per-variable summaries)
    fall back to the r16 path to keep plan size bounded.
    """
    rows = rows or []
    if len(rows) > 200:
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), ISSUE_SCHEMA
        )

    # The whole frame is ONE parsed SQL expression (a single py4j
    # round trip): the Column-API formulation cost ~100 ms of driver
    # chatter per frame (~6 F.lit + casts + struct per row).
    def _s(v) -> str:
        if v is None:
            return "CAST(NULL AS STRING)"
        # Spark SQL string literals process backslash escapes, so
        # escape the backslash itself first, then the quote
        return "'" + str(v).replace("\\", "\\\\").replace("'", "\\'") + "'"

    if not rows:
        return spark.range(0, 0, 1, 1).selectExpr(
            "CAST(NULL AS STRING) AS domain",
            "CAST(NULL AS STRING) AS variable",
            "CAST(NULL AS STRING) AS category",
            "CAST(NULL AS STRING) AS severity",
            "CAST(NULL AS BIGINT) AS count",
            "CAST(NULL AS ARRAY<STRING>) AS samples",
        )
    structs = []
    for r in rows:
        cnt = "CAST(NULL AS BIGINT)" if r[4] is None else f"CAST({int(r[4])} AS BIGINT)"
        if r[5] is None:
            samples = "CAST(NULL AS ARRAY<STRING>)"
        elif len(r[5]) == 0:
            samples = "CAST(ARRAY() AS ARRAY<STRING>)"
        else:
            samples = "ARRAY(" + ",".join(_s(str(x)) for x in r[5]) + ")"
        structs.append(
            "named_struct("
            f"'domain',{_s(r[0])},'variable',{_s(r[1])},"
            f"'category',{_s(r[2])},'severity',{_s(r[3])},"
            f"'count',{cnt},'samples',{samples})"
        )
    return spark.range(0, 1, 1, 1).select(
        F.expr("inline(array(" + ",".join(structs) + "))")
    )

#: variable-name suffixes that must hold ISO-8601 partial-precision
#: values (reference: validate/checks/dates.rs:28)
DATE_SUFFIXES = ("DTC", "DTM", "DT", "TM", "STDTC", "ENDTC", "STDT", "ENDT")


@dataclass
class VariableSpec:
    name: str
    core: str = "Perm"  # Req | Exp | Perm
    data_type: str = "Char"  # Char | Num
    length: int | None = None
    role: str = ""
    codelist_code: str | None = None


def _blank(c: Column) -> Column:
    return c.isNull() | (F.trim(c.cast("string")) == "")


def _sample_agg(value: Column, pred: Column, n: int = 5) -> Column:
    return F.slice(
        F.sort_array(F.collect_set(F.when(pred, F.trim(value.cast("string"))))), 1, n
    )


def validate_domain(
    df: DataFrame,
    domain: str,
    variables: list[VariableSpec],
    not_collected: set[str] | None = None,
) -> DataFrame:
    """V1–V7 in one scan + driver-side assembly of the issue frame."""
    not_collected = not_collected or set()
    spark = df.sparkSession
    present = {c.upper(): c for c in df.columns}

    # Aggregates are built as SQL STRINGS and parsed in one expr each:
    # the Column-DSL formulation made ~8 py4j round trips per
    # aggregate (~200 for a full domain), putting driver-side plan
    # construction above the actual 150K-row execution time. Same
    # predicates, same names — pinned by the v_domain_check_gates
    # oracle and the validate tests.
    def blank(col_sql: str) -> str:
        return f"({col_sql} IS NULL OR trim(CAST({col_sql} AS STRING)) = '')"

    def samples(col_sql: str, pred: str, n: int = 3) -> str:
        return (
            "slice(sort_array(collect_set(CASE WHEN "
            f"{pred} THEN trim(CAST({col_sql} AS STRING)) END)), 1, {n})"
        )

    # Spark's SQL parser processes backslash escapes inside string
    # literals, so regex backslashes must double when embedded
    iso_sql = ISO_PARTIAL_RE.replace("\\", "\\\\")
    sqls: list[str] = ["count(1) AS `__n`"]
    for v in variables:
        c = present.get(v.name.upper())
        if c is None:
            continue
        col = f"`{c}`"
        sqls.append(
            f"sum(CASE WHEN {blank(col)} THEN 1 ELSE 0 END) AS `{v.name}__nulls`"
        )
        if v.data_type.lower() in ("num", "numeric"):
            bad = (
                f"(NOT {blank(col)} AND try_cast(regexp_replace("
                f"trim(CAST({col} AS STRING)), '[,\\\\s]', '') AS DOUBLE) IS NULL)"
            )
            sqls.append(f"sum(CASE WHEN {bad} THEN 1 ELSE 0 END) AS `{v.name}__badnum`")
            sqls.append(f"{samples(col, bad)} AS `{v.name}__badnum_samples`")
        if v.name.upper().endswith(DATE_SUFFIXES):
            bad = (
                f"(NOT {blank(col)} AND NOT "
                f"trim(CAST({col} AS STRING)) RLIKE '{iso_sql}')"
            )
            sqls.append(f"sum(CASE WHEN {bad} THEN 1 ELSE 0 END) AS `{v.name}__baddate`")
            sqls.append(f"{samples(col, bad)} AS `{v.name}__baddate_samples`")
        if v.length and v.data_type.lower() == "char":
            ln = f"length(rtrim(CAST({col} AS STRING)))"
            sqls.append(
                f"sum(CASE WHEN {ln} > {int(v.length)} THEN 1 ELSE 0 END)"
                f" AS `{v.name}__toolong`"
            )
            sqls.append(f"max({ln}) AS `{v.name}__maxlen`")

    row = df.agg(*[F.expr(s) for s in sqls]).collect()[0].asDict()
    n = row["__n"]

    issues: list[tuple] = []

    def add(variable: str, category: str, severity: str, count: int, samples=None):
        issues.append((domain, variable, category, severity, int(count), samples or []))

    for v in variables:
        c = present.get(v.name.upper())
        core = v.core.lower()
        if c is None:
            if core == "req":
                add(v.name, "Presence", "Error", 1)  # RequiredMissing
            elif core == "exp" and v.name.upper() not in not_collected:
                add(v.name, "Presence", "Warning", 1)  # ExpectedMissing
            continue
        nulls = row.get(f"{v.name}__nulls", 0) or 0
        if core == "req":
            if n > 0 and nulls == n:
                add(v.name, "Presence", "Error", n)  # all-null ≙ missing
            elif nulls > 0:
                add(v.name, "Presence", "Error", nulls)  # RequiredEmpty
        elif core == "exp" and n > 0 and nulls == n and v.name.upper() not in not_collected:
            add(v.name, "Presence", "Warning", n)
        if v.role.lower() == "identifier" and nulls > 0:
            add(v.name, "Presence", "Error", nulls)  # V7 IdentifierNull
        badnum = row.get(f"{v.name}__badnum", 0) or 0
        if badnum:
            add(v.name, "Format", "Error", badnum, row.get(f"{v.name}__badnum_samples"))
        baddate = row.get(f"{v.name}__baddate", 0) or 0
        if baddate:
            add(v.name, "Format", "Error", baddate, row.get(f"{v.name}__baddate_samples"))
        toolong = row.get(f"{v.name}__toolong", 0) or 0
        if toolong:
            add(v.name, "Limit", "Warning", toolong)

    return _issue_frame(spark, issues)


def duplicate_sequence_issues(df: DataFrame, domain: str, subject_col: str = "USUBJID") -> DataFrame:
    """V5 DuplicateSequence as an issue frame (A5 under the hood)."""
    spark = df.sparkSession
    seq_cols = [c for c in df.columns if c.upper() == f"{domain.upper()}SEQ"]
    if not seq_cols or subject_col not in df.columns:
        return _issue_frame(spark, [])
    seq = seq_cols[0]
    dups = (
        df.groupBy(subject_col, seq)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .agg(
            F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("extra"),
            _sample_agg(F.concat_ws("/", subject_col, seq), F.lit(True)).alias("samples"),
        )
        .collect()[0]
    )
    if not dups["extra"]:
        return _issue_frame(spark, [])
    return _issue_frame(spark, [(domain, seq, "Consistency", "Error", int(dups["extra"]), dups["samples"])])


# --- cross-domain checks (J1-J6) -------------------------------------------


def usubjid_not_in_dm(dom_df: DataFrame, dm_df: DataFrame, domain: str) -> DataFrame:
    """J1/V9: USUBJID values absent from DM — left anti join + agg."""
    dm_keys = dm_df.select(F.col("USUBJID")).filter(~_blank(F.col("USUBJID"))).distinct()
    missing = (
        dom_df.select("USUBJID")
        .filter(~_blank(F.col("USUBJID")))
        .join(dm_keys, "USUBJID", "left_anti")
    )
    agg = missing.agg(
        F.count(F.lit(1)).alias("cnt"),
        _sample_agg(F.col("USUBJID"), F.lit(True)).alias("samples"),
    ).collect()[0]
    spark = dom_df.sparkSession
    if not agg["cnt"]:
        return _issue_frame(spark, [])
    return _issue_frame(spark, [(domain, "USUBJID", "CrossReference", "Error", int(agg["cnt"]), agg["samples"])])


def rdomain_invalid(df: DataFrame, domain: str, submitted_domains: list[str]) -> DataFrame:
    """J2/V10: RDOMAIN must be a submitted domain code."""
    spark = df.sparkSession
    if "RDOMAIN" not in df.columns:
        return _issue_frame(spark, [])
    bad = df.filter(
        ~_blank(F.col("RDOMAIN"))
        & ~F.upper(F.trim("RDOMAIN")).isin([d.upper() for d in submitted_domains])
    )
    agg = bad.agg(
        F.count(F.lit(1)).alias("cnt"),
        _sample_agg(F.col("RDOMAIN"), F.lit(True)).alias("samples"),
    ).collect()[0]
    if not agg["cnt"]:
        return _issue_frame(spark, [])
    return _issue_frame(spark, [(domain, "RDOMAIN", "CrossReference", "Error", int(agg["cnt"]), agg["samples"])])


def rsubjid_not_in_dm(rel: DataFrame, dm_df: DataFrame, domain: str = "RELSUB") -> DataFrame:
    """J3/V11: RELSUB RSUBJID values absent from DM (SDTM-IG 8.7;
    reference checks/cross_domain.rs:149-175) — same anti-join shape
    as J1 but probing RSUBJID."""
    spark = rel.sparkSession
    if "RSUBJID" not in rel.columns:
        return _issue_frame(spark, [])
    dm_keys = dm_df.select(
        F.trim(F.col("USUBJID").cast("string")).alias("__dm_key")
    ).filter(F.col("__dm_key") != "").distinct()
    probes = rel.select(
        F.trim(F.col("RSUBJID").cast("string")).alias("__rsubj")
    ).filter(F.col("__rsubj") != "")
    missing = probes.join(
        F.broadcast(dm_keys), probes["__rsubj"] == F.col("__dm_key"), "left_anti"
    )
    agg = missing.agg(
        F.count(F.lit(1)).alias("cnt"),
        _sample_agg(F.col("__rsubj"), F.lit(True)).alias("samples"),
    ).collect()[0]
    if not agg["cnt"]:
        return _issue_frame(spark, [])
    return _issue_frame(spark, [(domain, "RSUBJID", "CrossReference", "Error", int(agg["cnt"]), agg["samples"])])


def relspec_invalid_parents(relspec: DataFrame, domain: str = "RELSPEC") -> DataFrame:
    """J5/V14: non-blank PARENT must reference a REFID of the same
    subject (reference checks/cross_domain.rs check_relspec)."""
    spark = relspec.sparkSession
    if not {"USUBJID", "REFID", "PARENT"} <= set(relspec.columns):
        return _issue_frame(spark, [])
    probes = relspec.select(
        F.trim(F.col("USUBJID").cast("string")).alias("__usubj"),
        F.trim(F.col("PARENT").cast("string")).alias("__parent"),
    ).filter(F.col("__parent") != "")
    keys = relspec.select(
        F.trim(F.col("USUBJID").cast("string")).alias("__usubj"),
        F.trim(F.col("REFID").cast("string")).alias("__parent"),
    ).distinct()
    missing = probes.join(keys, ["__usubj", "__parent"], "left_anti")
    agg = missing.agg(
        F.count(F.lit(1)).alias("cnt"),
        _sample_agg(F.concat_ws("/", "__usubj", "__parent"), F.lit(True)).alias("samples"),
    ).collect()[0]
    if not agg["cnt"]:
        return _issue_frame(spark, [])
    return _issue_frame(spark, [(domain, "PARENT", "CrossReference", "Error", int(agg["cnt"]), agg["samples"])])


def relsub_not_bidirectional(rel: DataFrame, domain: str = "RELSUB") -> DataFrame:
    """J4/V12: (U,R) pairs lacking the reverse (R,U) — self anti join."""
    spark = rel.sparkSession
    a, b = rel.alias("a"), rel.alias("b")
    missing = a.join(
        b,
        (F.col("a.USUBJID") == F.col("b.RSUBJID"))
        & (F.col("a.RSUBJID") == F.col("b.USUBJID")),
        "left_anti",
    )
    agg = missing.agg(
        F.count(F.lit(1)).alias("cnt"),
        _sample_agg(F.concat_ws("->", "USUBJID", "RSUBJID"), F.lit(True)).alias("samples"),
    ).collect()[0]
    if not agg["cnt"]:
        return _issue_frame(spark, [])
    return _issue_frame(spark, [(domain, "RSUBJID", "CrossReference", "Warning", int(agg["cnt"]), agg["samples"])])


def relrec_invalid_references(
    relrec: DataFrame, domain_keys: DataFrame, domain: str = "RELREC"
) -> DataFrame:
    """J6/V13: (RDOMAIN, IDVAR, IDVARVAL) probes against the melted
    per-domain key universe; invalids grouped by RDOMAIN.

    ``domain_keys``: long frame (rdomain, idvar, idvarval) built by
    unpivoting each domain's --SEQ/--GRPID/--REFID/--LNKID key columns.
    """
    probes = relrec.filter(~_blank(F.col("IDVARVAL")) & ~_blank(F.col("IDVAR")))
    missing = probes.join(
        domain_keys,
        (F.upper(F.trim(probes["RDOMAIN"])) == F.upper(domain_keys["rdomain"]))
        & (F.upper(F.trim(probes["IDVAR"])) == F.upper(domain_keys["idvar"]))
        & (F.trim(probes["IDVARVAL"].cast("string")) == domain_keys["idvarval"].cast("string")),
        "left_anti",
    )
    grouped = missing.groupBy(F.upper(F.trim("RDOMAIN")).alias("rd")).agg(
        F.count(F.lit(1)).alias("cnt"),
        _sample_agg(F.concat_ws("=", "IDVAR", "IDVARVAL"), F.lit(True)).alias("samples"),
    )
    rows = [
        (domain, f"RDOMAIN={r['rd']}", "CrossReference", "Error", int(r["cnt"]), r["samples"])
        for r in grouped.collect()
    ]
    return _issue_frame(relrec.sparkSession, rows)


def melt_domain_keys(frames: dict[str, DataFrame]) -> DataFrame:
    """Build the J6 key universe: unpivot each domain's record-key
    columns to (rdomain, idvar, idvarval) and union."""
    parts = []
    for code, df in frames.items():
        key_cols = [
            c
            for c in df.columns
            if c.upper().endswith(("SEQ", "GRPID", "REFID", "LNKID"))
            or c.upper() == "VISITNUM"
        ]
        if not key_cols:
            continue
        long = df.select(
            [F.col(c).cast("string").alias(c) for c in key_cols]
        ).unpivot([], key_cols, "idvar", "idvarval")
        parts.append(
            long.filter(~_blank(F.col("idvarval"))).select(
                F.lit(code.upper()).alias("rdomain"),
                F.upper("idvar").alias("idvar"),
                F.trim("idvarval").alias("idvarval"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()
