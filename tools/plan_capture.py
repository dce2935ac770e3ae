#!/usr/bin/env python
"""Dump ``explain("formatted")`` for registry queries to files.

Optimization-round instrument (guide §1/§7.2): capture the physical
plan of every batch operator so plan claims ("2 Exchange → 1",
"SortMergeJoin → BroadcastHashJoin", "PushedFilters includes …") can be
checked against committed text instead of trusted. Streaming specs are
skipped (no one-shot explain of a micro-batch plan); ML train/predict
goldens are skipped (MLlib-internal plans, minutes to build).

Run: python tools/plan_capture.py OUTDIR [sf_dir] [op ...]
Default ops: every batch spec in the registry.
Writes OUTDIR/<q_name>.txt (q_name = lowercase, dashes → underscores).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from dask_xgboost_spark.registry import load_all
from dask_xgboost_spark.session import get_spark


def main() -> None:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    n_ok = n_fail = 0
    t_start = time.time()
    for name, spec in specs.items():
        if only and name not in only:
            continue
        if spec.mode == "stream" or name.startswith(("M-TRAIN", "M-PRED")):
            continue
        key = name.lower().replace("-", "_")
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(outdir, f"{key}.txt"), "w") as fh:
                fh.write(plan)
            n_ok += 1
        except Exception as e:  # noqa: BLE001 — sweep must finish
            n_fail += 1
            print(f"FAIL {name}: {e!r}", file=sys.stderr)
    print(f"captured {n_ok} plans, {n_fail} failures, "
          f"{time.time() - t_start:.0f}s -> {outdir}")
    spark.stop()


if __name__ == "__main__":
    main()
