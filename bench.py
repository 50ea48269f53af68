"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line.

Execution is measured with the noop sink (full plan executes on the
cluster; nothing is collected to the driver), which is what a 100 TB
deployment measures too.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from trial_submission_studio_spark import get_spark  # noqa: E402

#: headline subset: the scan/agg, join, window, regex-ladder, UDF,
#: compiler-e2e, streaming-shaped, and extension paths
BENCH_QUERIES = (
    "q1_pricing_summary",
    "q3_order_revenue",
    "t3_sequence_number",
    "t4_iso8601_normalize",
    "t7_study_day",
    "t9_numeric_parse",
    "e2e_cdisc_pipeline",
    "events_tumbling_window",
    "text_token_stats",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")
    qs = entrymod.queries()

    # warm the JVM (codegen, parquet footers, broadcast machinery) by
    # running every benchmark query once at the smallest scale factor,
    # so the timed pass measures steady-state execution
    warm_dir = "/root/testdata/sf0.001"
    for name in BENCH_QUERIES:
        try:
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
