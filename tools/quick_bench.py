"""Headline-only quick bench for optimization iteration: the 12
headline queries (median-of-5, noop sink, sf0.001 warmup + benched-SF
warmup — bench.py's exact discipline) plus the 4 cdisc stages
(median-of-3). No extras, no sf1 sweep. Prints one JSON line.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
import bench  # noqa: E402
from trial_submission_studio_spark import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = sys.argv[1:] or None
    spark = get_spark(app_name="quick_bench")
    qs = dict(entrymod.queries())
    names = [n for n in bench.BENCH_QUERIES if only is None or n in only]
    for name in names:
        if name not in qs:
            qs[name] = getattr(entrymod, name)
    warm = "/root/testdata/sf0.001"
    for name in names:
        try:
            qs[name](spark, warm).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    control = bench._host_control(spark)
    timings: dict[str, float] = {}
    spread: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        runs = []
        for _ in range(5):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[name] = round(statistics.median(runs), 3)
        spread[name] = {"min": round(min(runs), 3), "max": round(max(runs), 3)}
        gc.collect()
    total = round(sum(timings.values()), 3)
    cdisc: dict[str, float] = {}
    if only is None or "cdisc" in (only or []):
        spark.catalog.clearCache()
        try:
            bench._cdisc_stages(spark, "/root/testdata/sf0.001", {})
            bench._cdisc_stages(spark, sf_dir, {})
        except Exception:
            pass
        runs3: list[dict] = []
        for _ in range(3):
            t: dict[str, float] = {}
            bench._cdisc_stages(spark, sf_dir, t)
            runs3.append(t)
        for key in runs3[0]:
            cdisc[key] = round(statistics.median([r[key] for r in runs3]), 3)
    print(
        json.dumps(
            {
                "headline_total": total,
                "queries": timings,
                "spread": spread,
                "cdisc": cdisc,
                "control": control["median"],
            }
        )
    )


if __name__ == "__main__":
    main()
