#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/<round>/ files.

Usage: python scripts/dump_plans.py OUTDIR SUFFIX QUERY [QUERY ...]
Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 8).

Writes OUTDIR/<query>_<SUFFIX>.txt — the judge-facing evidence files
(plans/rNN/<query>_{before,after}.txt). Run once from a worktree at the
round's base commit for the before set and once at HEAD for the after
set.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    from iceberg_explorer_spark.operators import QUERIES
    from iceberg_explorer_spark.session import build_session

    spark = build_session(app_name="dump_plans", cpus=CPUS)
    try:
        for name in names:
            df = QUERIES[name].builder(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(path, len(plan.splitlines()), "lines")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
