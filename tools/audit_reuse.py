#!/usr/bin/env python
"""Registry-wide recompute audit: execute every batch registry query at a
small SF and flag plans that scan a fact table many times with no
ReusedExchange / InMemoryTableScan — the signature of a multi-referenced
subtree Catalyst re-inlines and recomputes per reference (the Q-TPCH-15
finding; see SCALE.md "Multi-referenced views").

AQE prints the final plan alongside the initial one, so raw counts are
~2x; the flag threshold accounts for that. Heuristic output for human
review — a self-join legitimately scans its input twice.

Usage: python tools/audit_reuse.py [sf_dir] (default sf0.001)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_FACTS = r"Scan parquet[^\n]*(events|lineitem|documents|embeddings|orders)"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from dask_xgboost_spark.registry import load_all
    from dask_xgboost_spark.session import get_spark

    spark = get_spark(app_name="audit-reuse", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    flagged, errs = [], []
    for name, spec in sorted(specs.items()):
        if getattr(spec, "mode", "hash") == "stream" or name.startswith(("S-", "M-TRAIN", "G-GEN")):
            continue  # streaming/training run their own harnesses
        try:
            df = spec.fn(spark, sf_dir)
            # collect the df ITSELF: .limit(1) would build a DIFFERENT
            # QueryExecution and leave this one's AQE plan un-finalized
            # (isFinalPlan=false prints the initial plan — no
            # ReusedExchange, no final/initial doubling, so the >=4
            # threshold could never fire)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
            # count per TABLE: joining two different facts scans each
            # once (legit); the recompute signature is ONE table scanned
            # >=2 real times (>=4 raw with AQE's final+initial doubling)
            per_table = {}
            for m in re.finditer(_FACTS, plan):
                t = m.group(1)
                per_table[t] = per_table.get(t, 0) + 1
            worst = max(per_table.values(), default=0)
            reused = plan.count("ReusedExchange")
            inmem = plan.count("InMemoryTableScan")
            if worst >= 4 and reused == 0 and inmem == 0:
                flagged.append((name, worst))
        except Exception as e:  # noqa: BLE001 — audit must survive any query
            errs.append((name, str(e)[:120]))
    print("FLAGGED (one table scanned >=4 raw times, no reuse):")
    for name, scans in flagged:
        print(f"  {name}: {scans} raw scans of one fact table")
    if errs:
        print("ERRORS:")
        for name, e in errs:
            print(f"  {name}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()
