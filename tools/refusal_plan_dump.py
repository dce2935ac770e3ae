#!/usr/bin/env python
"""Dump 10x refusal-regime plans for the gate-refusing fact joins.

Evidence instrument for the r15 `_gate_build_or_pin_shuffle` fix: at
10x under the bench's 64 MB autoBroadcastJoinThreshold the footer gates
on Q-TPCH-05 / Q-TPCH-08 / Q-JOIN-02 refuse (1.5M orders x 48 B = 72 MB
> 64 MB), and before the fix Catalyst — comparing the omap's
OVERSHOOTING join-output estimate against the lineitem scan — picked
the FACT table as the broadcast build side. This dumps the formatted
plan of each registry operator in that exact regime so the claim is
checkable text: before-plans (run from a HEAD worktree) must show a
BroadcastExchange over the lineitem scan; after-plans must show a
SortMergeJoin streaming lineitem.

Run: python tools/refusal_plan_dump.py OUTDIR SUFFIX [scaled_dir]
If scaled_dir is omitted a fresh 10x replica of sf0.1 is built and its
path printed (caller reuses it for the other tree, then removes it).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from dask_xgboost_spark.registry import load_all
from dask_xgboost_spark.session import get_spark

OPS = ["Q-TPCH-05", "Q-TPCH-08", "Q-JOIN-02"]


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    scaled = sys.argv[3] if len(sys.argv) > 3 else None
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(
        app_name="refusal-plan-dump",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.autoBroadcastJoinThreshold": "64m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    if scaled is None:
        import importlib.util as _ilu

        spec = _ilu.spec_from_file_location(
            "suite_scale",
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "suite_scale.py"
            ),
        )
        ss = _ilu.module_from_spec(spec)
        spec.loader.exec_module(ss)
        scaled = ss.build_scaled_dir(spark, "/root/testdata/sf0.1", 10)
        print(f"SCALED_DIR={scaled}")
    specs = load_all()
    for name in OPS:
        df = specs[name].fn(spark, scaled)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        key = name.lower().replace("-", "_")
        path = os.path.join(outdir, f"{key}_10x64m_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
