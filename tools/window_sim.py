#!/usr/bin/env python
"""Driver-window simulation: run the first N entries of
``__spark_entry__.queries()`` exactly as the verification driver does —
plain SparkSession, sf0.01, DuckDB hash comparison for every entry with
oracle SQL, rows-only for the rest — plus any extra entry names passed
on the command line (e.g. ops added past the window boundary this
round).

Run: python tools/window_sim.py [N] [extra-entry ...]
Defaults: N=50 (the driver's window size); fixture dir from
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01 — run once per SF:
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python tools/window_sim.py).

Exit code 0 = all green; 1 = at least one FAIL (printed).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    extra = sys.argv[2:]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("window-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entry
    from tests.oracle import compare, duck_con

    qs, osql = entry.queries(), entry.oracle_sql()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    con = duck_con(sf_dir)
    targets = list(qs)[:n] + [e for e in extra if e not in list(qs)[:n]]
    fails: list[tuple[str, object]] = []
    t0 = time.time()
    for name in targets:
        try:
            df = qs[name](spark, sf_dir)
            if name in osql:
                r = compare(df, con, osql[name])
                if not r["match"]:
                    fails.append((name, r))
            else:
                df.count()  # rows-only check, like the driver
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            fails.append((name, repr(e)[:300]))
        spark.catalog.clearCache()
    print(
        f"TOTAL {time.time() - t0:.0f}s over {len(targets)} entries, "
        f"fails={len(fails)}"
    )
    for f in fails:
        print("FAIL:", f)
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
