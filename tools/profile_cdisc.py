"""Per-stage + per-job profiling of the four cdisc bench stages
(guide §1.1/§7.1): run bench._cdisc_stages with the UI enabled and
dump each job's duration and each stage's task count / runtime /
bytes, so the import/build/validate/export cost decomposes into the
actual jobs Spark ran.

Usage:
    python tools/profile_cdisc.py [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from trial_submission_studio_spark import get_spark  # noqa: E402


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="profile_cdisc",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    # warmup (codegen) at smoke SF, then once at the profiled SF
    bench._cdisc_stages(spark, "/root/testdata/sf0.001", {})
    bench._cdisc_stages(spark, sf_dir, {})

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"

    def jobs():
        return json.load(urllib.request.urlopen(f"{base}/jobs"))

    def stages():
        return json.load(urllib.request.urlopen(f"{base}/stages"))

    before_jobs = {j["jobId"] for j in jobs()}
    before_stages = {s["stageId"] for s in stages()}

    t = {}
    for _ in range(repeats):
        bench._cdisc_stages(spark, sf_dir, t)
    print(json.dumps(t))

    rows = []
    for s in stages():
        if s["stageId"] in before_stages or s["status"] == "PENDING":
            continue
        rows.append(
            (
                s["stageId"],
                s["numCompleteTasks"],
                s.get("executorRunTime", 0),
                s.get("executorCpuTime", 0) // 1_000_000,
                s.get("inputBytes", 0),
                s.get("shuffleReadBytes", 0),
                (s.get("name") or "")[:70],
            )
        )
    rows.sort(key=lambda r: r[0])
    print(
        f"{'stage':>5} {'tasks':>5} {'runMs':>8} {'cpuMs':>8} "
        f"{'inMB':>7} {'shRdMB':>7}  name"
    )
    for r in rows:
        print(
            f"{r[0]:>5} {r[1]:>5} {r[2]:>8} {r[3]:>8} "
            f"{r[4]/1e6:>7.1f} {r[5]/1e6:>7.1f}  {r[6]}"
        )
    print("\njobs (id, durMs, stages, description):")
    for j in sorted(jobs(), key=lambda j: j["jobId"]):
        if j["jobId"] in before_jobs:
            continue
        t0 = j.get("submissionTime", "")
        t1 = j.get("completionTime", "")

        def ms(s):
            from datetime import datetime

            return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

        dur = int((ms(t1) - ms(t0)) * 1000) if t0 and t1 else -1
        print(
            f"{j['jobId']:>4} {dur:>7} {j.get('stageIds', [])}"
            f" {(j.get('name') or '')[:80]}"
        )


if __name__ == "__main__":
    main()
