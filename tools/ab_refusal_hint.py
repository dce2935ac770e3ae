#!/usr/bin/env python
"""A/B the refusal-path join strategy for `_gate_build_or_pin_shuffle`:
`merge` (SMJ: sorts both sides, spill-safe, AQE skew-splittable) vs
`shuffle_hash` (SHJ: builds a per-partition hash on the narrow omap
side, no fact sort — guide §3.2's candidate when the build side is
bounded per partition). Measured in the exact defect regime: 10x
replica, 64 MB autoBroadcastJoinThreshold, where the footer gate
refuses on all three call sites.

Run: python tools/ab_refusal_hint.py [scaled_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import _shuffle_metrics, _timed_full
from dask_xgboost_spark.operators import composite as comp
from dask_xgboost_spark.registry import load_all
from dask_xgboost_spark.session import get_spark

OPS = ["Q-TPCH-05", "Q-TPCH-08", "Q-JOIN-02"]


def main() -> None:
    scaled = sys.argv[1]
    spark = get_spark(
        app_name="ab-refusal-hint",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.autoBroadcastJoinThreshold": "64m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    def gate_with(hint):
        def g(spark_, table_path, row_bytes, build):
            if comp._footer_rows_fit_broadcast(spark_, table_path, row_bytes):
                from pyspark.sql import functions as F

                return F.broadcast(build)
            return build.hint(hint)

        return g

    orig = comp._gate_build_or_pin_shuffle
    try:
        for rounds in range(2):  # interleave to split warm-cache bias
            for hint in ("merge", "shuffle_hash"):
                comp._gate_build_or_pin_shuffle = gate_with(hint)
                for name in OPS:
                    df = specs[name].fn(spark, scaled)
                    df.toPandas()  # warm + materialize
                    t = _timed_full(df, runs=3)
                    sm = _shuffle_metrics(spark, df, f"rh_{hint}_{name}")
                    print(
                        f"round{rounds} {name} {hint}: {t:.3f}s "
                        f"/ {sm['rows']} shuf rows"
                    )
    finally:
        comp._gate_build_or_pin_shuffle = orig
    spark.stop()


if __name__ == "__main__":
    main()
