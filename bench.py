#!/usr/bin/env python
"""Benchmark harness — times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Methodology (BASELINE.md §3): warm the session + JIT with one untimed run
per query, then report the median of 3 timed runs, full query each time
(parquet scan → collect). Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "Q-AGG-01",   # TPC-H Q1-shape scan-agg
    "Q-JOIN-02",  # 4-table join, revenue by nation
    "Q-WIN-01",   # window top-3 per customer
    "Q-SORT-02",  # top-k by extendedprice
    "Q-DATE-02",  # hourly events rollup
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from dask_xgboost_spark.registry import load_all
    from dask_xgboost_spark.session import get_spark

    spark = get_spark(
        app_name="dxs-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=16,
        extra_conf={
            # the sf0.1 tables are single ~15 MB parquet files: split them
            # well below the 128m default so scans parallelize across cores
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "128k",
            # small-result benchmark: let AQE coalesce shuffle stages hard
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.autoBroadcastJoinThreshold": "64m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    results: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = specs[name].fn
        fn(spark, sf_dir).collect()  # warm: JIT, codegen, file listing
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times.append(time.perf_counter() - t0)
        results[name.lower().replace("-", "_")] = round(statistics.median(times), 4)

    total = round(sum(results.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "sum of median wall-clock of headline queries",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
