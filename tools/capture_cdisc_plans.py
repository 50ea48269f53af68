"""Capture .explain("formatted") for the cdisc bench stages (import
frame, built frame) into plans/<tag>/cdisc_{import,build}_<suffix>.txt
— the stages are bench callables, not queries(), so capture_plans.py
cannot reach them.

Usage: python tools/capture_cdisc_plans.py before|after
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from trial_submission_studio_spark import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("SPARK_GRAFT_PLANS_TAG", "r17")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_cdisc_plans")

    from trial_submission_studio_spark.operators.normalize import (
        NormalizationContext,
        compile_pipeline,
        infer_rules,
    )
    from trial_submission_studio_spark.sources.csv_reader import read_source_csv
    from trial_submission_studio_spark.standards.ct_catalog import builtin_lookup_df
    from trial_submission_studio_spark.standards.sdtm_domains import DOMAINS

    work = tempfile.mkdtemp(prefix="spark_graft_plans_")
    csv_path = os.path.join(work, "ae.csv")
    bench._prepare_cdisc_fixture(spark, sf_dir, csv_path)
    src = read_source_csv(spark, csv_path, header_rows=2)
    mappings = {
        "SUBJID": "SubjectId",
        "AETERM": "AETERM",
        "AESEV": "AESEV",
        "AESTDTC": "AESTDAT",
        "AEENDTC": "AEENDAT",
    }
    ctx = NormalizationContext(
        study_id="BENCH",
        domain_code="AE",
        order_col="_row_id",
        subject_col="SubjectId",
        ct_lookup=builtin_lookup_df(spark),
        global_ref_date="1995-01-01",
    )
    built = compile_pipeline(
        src.df, infer_rules(DOMAINS["AE"]["variables"], mappings, ctx), ctx
    )

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name, df in (("cdisc_import", src.df), ("cdisc_build", built)):
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
