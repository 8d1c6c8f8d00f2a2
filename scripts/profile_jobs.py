#!/usr/bin/env python
"""Per-query job/stage profile via the Spark UI REST API (guide §1/§7.1).

Runs each named query ITERS times in one warmed session with the UI on,
then reports, per query: wall seconds (min over iters), number of Spark
jobs submitted in one iteration, and the sum of stage executor time vs
wall — the job-count-bound diagnostic (VERDICT r17 #4). Profiling only;
the bench itself keeps the UI off.

Usage: python scripts/profile_jobs.py QUERY [QUERY ...]
Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
       PROFILE_ITERS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ITERS = int(os.environ.get("PROFILE_ITERS", "3"))


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[1:]
    from iceberg_explorer_spark.operators import QUERIES
    from iceberg_explorer_spark.session import build_session

    spark = build_session(
        app_name="profile_jobs",
        cpus=CPUS,
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.retainedJobs": "5000",
            "spark.ui.retainedStages": "5000",
        },
    )
    sc = spark.sparkContext
    base = sc.uiWebUrl
    warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    out = {}
    try:
        app_id = sc.applicationId
        for name in names:
            builder = QUERIES[name].builder
            # warm: codegen + shared caches
            builder(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            builder(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            best = None
            for it in range(ITERS):
                jobs_before = {
                    j["jobId"] for j in _api(base, f"applications/{app_id}/jobs")
                }
                sc.setJobGroup(f"prof:{name}:{it}", name)
                t0 = time.perf_counter()
                builder(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                wall = time.perf_counter() - t0
                sc.setJobGroup(None, None)
                jobs = [
                    j
                    for j in _api(base, f"applications/{app_id}/jobs")
                    if j["jobId"] not in jobs_before
                ]
                stage_ids = {
                    s for j in jobs for s in j.get("stageIds", [])
                }
                stages = [
                    s
                    for s in _api(base, f"applications/{app_id}/stages")
                    if s["stageId"] in stage_ids
                    and s["status"] == "COMPLETE"
                ]
                stage_sum = sum(
                    s.get("executorRunTime", 0) for s in stages
                ) / 1000.0
                rec = {
                    "wall": round(wall, 3),
                    "n_jobs": len(jobs),
                    "n_stages": len(stages),
                    "stage_executor_sec_sum": round(stage_sum, 3),
                    "slowest_stages": sorted(
                        (
                            {
                                "id": s["stageId"],
                                "name": s["name"][:60],
                                "run_ms": s.get("executorRunTime", 0),
                                "tasks": s.get("numCompleteTasks"),
                                "shuffle_read": s.get("shuffleReadBytes", 0),
                                "shuffle_write": s.get(
                                    "shuffleWriteBytes", 0
                                ),
                            }
                            for s in stages
                        ),
                        key=lambda d: -d["run_ms"],
                    )[:8],
                }
                if best is None or rec["wall"] < best["wall"]:
                    best = rec
            out[name] = best
            print(f"== {name}: wall={best['wall']} jobs={best['n_jobs']} "
                  f"stages={best['n_stages']} "
                  f"stage_exec_sum={best['stage_executor_sec_sum']}")
            for s in best["slowest_stages"]:
                print(f"   stage {s['id']:>5} {s['run_ms']:>6}ms "
                      f"t={s['tasks']} sr={s['shuffle_read']} "
                      f"sw={s['shuffle_write']} {s['name']}")
    finally:
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
