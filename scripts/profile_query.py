#!/usr/bin/env python
"""Profile one registry query: per-stage wall / shuffle / task breakdown.

Usage: python scripts/profile_query.py <query> [sf_dir] [reps]

Runs the query through the noop sink (guide §1.4) on a UI-enabled session
and prints every job and stage with submission-to-completion wall,
executor run time, shuffle read/write bytes and task counts, pulled from
the Spark status REST API. Profiling tool only — not part of the bench
contract.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from global_market_index_etl_spark.plans import REGISTRY  # noqa: E402
from global_market_index_etl_spark.session import get_spark  # noqa: E402


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    spark = get_spark(
        app_name=f"profile-{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    qd = REGISTRY[name]
    # warm-up rep (JIT, codegen, Python workers, shared caches)
    qd.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()

    api = "http://localhost:4050/api/v1/applications"
    app_id = _get(api)[0]["id"]

    jobs_before = {j["jobId"] for j in _get(f"{api}/{app_id}/jobs")}
    walls = []
    for _ in range(reps):
        t0 = time.monotonic()
        qd.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(time.monotonic() - t0)
    print(f"== {name} @ {sf_dir}: walls={['%.2f' % w for w in walls]}")

    jobs = [
        j
        for j in _get(f"{api}/{app_id}/jobs")
        if j["jobId"] not in jobs_before
    ]
    jobs.sort(key=lambda j: j["jobId"])
    stages = {s["stageId"]: s for s in _get(f"{api}/{app_id}/stages")}
    total = 0.0
    for j in jobs:
        sub = j.get("submissionTime", "")
        comp = j.get("completionTime", "")
        for sid in sorted(j.get("stageIds", [])):
            s = stages.get(sid)
            if not s or s.get("status") == "SKIPPED":
                continue
            dur_ms = s.get("executorRunTime", 0)
            first = s.get("firstTaskLaunchedTime")
            done = s.get("completionTime")
            wall = ""
            try:
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                w = (
                    datetime.strptime(done, fmt)
                    - datetime.strptime(first, fmt)
                ).total_seconds()
                wall = f"{w:7.2f}s"
                total += w
            except Exception:
                pass
            print(
                f"job {j['jobId']:4d} stage {sid:5d} {s['status']:9s} "
                f"wall={wall} exec={dur_ms/1000:8.2f}s "
                f"tasks={s.get('numCompleteTasks',0):4d} "
                f"shW={s.get('shuffleWriteBytes',0)/1e6:8.1f}MB "
                f"shR={s.get('shuffleReadBytes',0)/1e6:8.1f}MB "
                f"in={s.get('inputBytes',0)/1e6:8.1f}MB  "
                f"{(s.get('description') or s.get('name',''))[:70]}"
            )
    print(f"== stage-wall sum over {reps} reps: {total:.2f}s; "
          f"jobs={len(jobs)}")


if __name__ == "__main__":
    main()
