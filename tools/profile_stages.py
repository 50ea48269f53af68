"""Per-stage empirical profiling (guide §1.1/§7.1): run one query with
the Spark UI enabled and dump each stage's task count, executorRunTime,
input/shuffle bytes from the REST API, so optimization targets the
stage the time actually goes to.

Usage:
    python tools/profile_stages.py <query> [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from trial_submission_studio_spark import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name=f"profile_{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    qs = dict(entrymod.queries())
    fn = qs.get(name) or getattr(entrymod, name)

    # warmup at smoke SF then once at the profiled SF
    try:
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception:
        pass
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"
    before = {
        s["stageId"]
        for s in json.load(urllib.request.urlopen(f"{base}/stages"))
    }

    spark.sparkContext.setJobDescription(f"profile:{name}")
    times = []
    for _ in range(repeats):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    spark.sparkContext.setJobDescription(None)

    stages = json.load(urllib.request.urlopen(f"{base}/stages"))
    rows = []
    for s in stages:
        if s["stageId"] in before or s["status"] == "PENDING":
            continue
        rows.append(
            (
                s["stageId"],
                s["numCompleteTasks"],
                s.get("executorRunTime", 0),
                s.get("executorCpuTime", 0) // 1_000_000,
                s.get("inputBytes", 0),
                s.get("shuffleReadBytes", 0),
                s.get("shuffleWriteBytes", 0),
                (s.get("name") or "")[:60],
            )
        )
    rows.sort(key=lambda r: -r[2])
    print(f"\n=== {name}: wall per run {['%.3f' % t for t in times]} ===")
    print(
        f"{'stage':>5} {'tasks':>5} {'runMs':>8} {'cpuMs':>8} "
        f"{'inMB':>7} {'shRdMB':>7} {'shWrMB':>7}  name"
    )
    for r in rows[:25]:
        print(
            f"{r[0]:>5} {r[1]:>5} {r[2]:>8} {r[3]:>8} "
            f"{r[4]/1e6:>7.1f} {r[5]/1e6:>7.1f} {r[6]/1e6:>7.1f}  {r[7]}"
        )
    total_run = sum(r[2] for r in rows)
    print(f"total executorRunTime across {len(rows)} stages: {total_run} ms")


if __name__ == "__main__":
    main()
