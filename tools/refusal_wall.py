#!/usr/bin/env python
"""Time the gate-refusal regime (10x, 64 MB threshold) for the three
fact joins whose refusal path `_gate_build_or_pin_shuffle` pins to a
shuffled merge join. Run from the fixed tree and from a HEAD worktree
against the SAME scaled dir to get the before/after walls.

Run: python tools/refusal_wall.py SCALED_DIR
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import _timed_full
from dask_xgboost_spark.registry import load_all
from dask_xgboost_spark.session import get_spark

OPS = ["Q-TPCH-05", "Q-TPCH-08", "Q-JOIN-02"]


def main() -> None:
    scaled = sys.argv[1]
    spark = get_spark(
        app_name="refusal-wall",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.autoBroadcastJoinThreshold": "64m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    for name in OPS:
        df = specs[name].fn(spark, scaled)
        df.toPandas()  # warm
        print(f"{name}: {_timed_full(df, runs=3):.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
