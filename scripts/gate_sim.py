#!/usr/bin/env python
"""Pre-round driver-gate simulation (the correctness insurance routine).

Replays what the round driver does: take the FIRST 50 entries of the query
registry, run each builder on Spark at sf0.01 AND its DuckDB oracle SQL over
the same parquet tables, then compare row count, column-name set, and a
value hash (columns sorted by name, every cell stringified, rows sorted).
This predicted round 4's 50/50 green before the driver ran.

Usage: python scripts/gate_sim.py [--default-session] [--all]
Prints one line per query and a final summary; exit code 1 on any mismatch.

``--default-session`` replays the worst-case driver session (bare conf:
ANSI on, machine timezone) to prove the load_table choke-point pins.
``--all`` widens the sweep from the driver's 50-slot window to EVERY
registered query — the regression net for operators the rotating window
won't reach this round (a changed out-of-window operator is otherwise
only caught one round later, when its slot comes up).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(arrow_tbl):
    """Driver-model canonical form: sorted columns, stringified sorted rows."""
    cols = sorted(arrow_tbl.column_names)
    pdf = arrow_tbl.select(cols).to_pandas()
    rows = sorted(map(tuple, pdf.astype(str).values.tolist()))
    return cols, rows


def main() -> int:
    import duckdb

    from iceberg_explorer_spark.operators import QUERIES
    from iceberg_explorer_spark.session import build_session

    import __spark_entry__ as entry_mod

    oracles = entry_mod.oracle_sql()
    if "--default-session" in sys.argv:
        # Simulate the worst-case driver session: bare default conf (ANSI
        # ON in PySpark 4, machine timezone). The load_table choke-point
        # pins must make results identical to the tuned session — this
        # mode proves it for the whole window.
        from pyspark.sql import SparkSession

        cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
        spark = (
            SparkSession.builder.master(f"local[{cpus}]")
            .appName("gate_sim_default")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    else:
        spark = build_session(
            app_name="gate_sim",
            cpus=os.environ.get("SPARK_GRAFT_CPUS", "16"),
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    window = list(QUERIES) if "--all" in sys.argv else list(QUERIES)[:50]
    bad: list[str] = []
    t_start = time.perf_counter()
    for name in window:
        t0 = time.perf_counter()
        try:
            got = QUERIES[name].builder(spark, SF_DIR).toArrow()
        except Exception as exc:  # noqa: BLE001 — report as the driver would
            print(f"ERR  {name}: spark {type(exc).__name__}: {exc}")
            bad.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle (rows-only: {got.num_rows})")
            continue
        try:
            want = con.execute(sql).arrow()
        except Exception as exc:  # noqa: BLE001
            print(f"ERR  {name}: oracle {type(exc).__name__}: {exc}")
            bad.append(name)
            continue
        g_cols, g_rows = _canon(got)
        w_cols, w_rows = _canon(want)
        rows_ok = got.num_rows == want.num_rows
        schema_ok = g_cols == w_cols
        hash_ok = g_rows == w_rows
        dt = time.perf_counter() - t0
        if rows_ok and schema_ok and hash_ok:
            print(f"OK   {name}  rows={got.num_rows}  {dt:.2f}s")
        else:
            print(
                f"FAIL {name}  rows={got.num_rows}/{want.num_rows} "
                f"schema={'ok' if schema_ok else f'{g_cols} vs {w_cols}'} "
                f"values={'ok' if hash_ok else 'MISMATCH'}"
            )
            bad.append(name)
    total = time.perf_counter() - t_start
    print(
        f"\n{len(window) - len(bad)}/{len(window)} green in {total:.0f}s"
        + (f"  BAD: {bad}" if bad else "")
    )
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
