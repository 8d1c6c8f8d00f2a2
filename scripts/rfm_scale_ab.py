#!/usr/bin/env python
"""A/B the round-5 RFM rewrite against the round-4 global-NTILE plan as the
customer count scales.

Builds custkey-shifted replications of sf0.1's orders table (each copy is a
fresh disjoint customer population, so the per-customer frame — the thing
the quartile pass sorts — really grows by the factor), then times both
formulations in one warmed session, min over N iters:

- ntile:     round 4's SQL — three NTILE(4) OVER (ORDER BY ...) windows,
             each a single-partition sort of the whole per-customer frame.
- two_phase: the shipped builder — stacked metrics, order-preserving
             blocks, broadcast offsets + per-block row_number.

Also cross-checks that both produce identical segment grids at every scale.
Usage: python scripts/rfm_scale_ab.py   (env: RFM_AB_FACTORS="1,10,30")
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTORS = [int(x) for x in os.environ.get("RFM_AB_FACTORS", "1,10,30").split(",")]
ITERS = int(os.environ.get("RFM_AB_ITERS", "2"))
CUSTKEY_SHIFT = 100_000_000


def main() -> None:
    import pyspark.sql.functions as F

    from iceberg_explorer_spark.operators.relational import (
        _RFM_SQL,
        rfm_customer_segments,
    )
    from iceberg_explorer_spark.session import build_session
    from iceberg_explorer_spark.sources.registry import load_table

    spark = build_session(
        app_name="rfm_scale_ab",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    base = load_table(spark, SF_DIR, "orders")
    results: dict[str, dict[str, float]] = {}
    try:
        for fac in FACTORS:
            scaled_dir = f"/tmp/rfm_scale_{fac}x"
            if not os.path.isdir(scaled_dir):
                copies = [
                    base.select(
                        (F.col("o_orderkey") + F.lit(i * CUSTKEY_SHIFT)).alias(
                            "o_orderkey"
                        ),
                        (F.col("o_custkey") + F.lit(i * CUSTKEY_SHIFT)).alias(
                            "o_custkey"
                        ),
                        "o_orderstatus",
                        "o_totalprice",
                        "o_orderdate",
                        "o_orderpriority",
                    )
                    for i in range(fac)
                ]
                out = copies[0]
                for c in copies[1:]:
                    out = out.unionByName(c)
                out.write.mode("overwrite").parquet(
                    os.path.join(scaled_dir, "orders.parquet")
                )
            variants = {
                "ntile": lambda d=scaled_dir: _run_ntile(spark, d, _RFM_SQL),
                "two_phase": lambda d=scaled_dir: rfm_customer_segments(
                    spark, d
                ),
            }
            # correctness cross-check once per scale
            frames = {k: v() for k, v in variants.items()}
            a = sorted(map(tuple, frames["ntile"].collect()))
            b = sorted(map(tuple, frames["two_phase"].collect()))
            assert a == b, f"variants disagree at {fac}x"
            point: dict[str, float] = {}
            for name, make in variants.items():
                best = None
                for _ in range(ITERS):
                    t0 = time.perf_counter()
                    make().write.format("noop").mode("overwrite").save()
                    t = time.perf_counter() - t0
                    best = t if best is None else min(best, t)
                point[name] = round(best, 3)
            results[f"{fac}x"] = point
            print(json.dumps({f"{fac}x": point}))
    finally:
        spark.stop()
    print(json.dumps(results))


def _run_ntile(spark, sf_dir, sql):
    from iceberg_explorer_spark.sources.registry import register_tables

    register_tables(spark, sf_dir, ("orders",))
    return spark.sql(sql)


if __name__ == "__main__":
    main()
