#!/usr/bin/env python
"""A/B: distributed ORDER BY vs single-partition sort for bounded-grain
presentation sorts (optimization guide §2.4 — "an orderBy used only to
make output deterministic" is a removable exchange).

Most registry queries end with a global ``orderBy`` over an aggregate
whose output grain is small and bounded (TPC-H Q1: 6 rows; the hourly
rollup: #hours in the data's time span). Under AQE that sort costs a
range Exchange — a whole extra query stage (materialize the child,
sample it for range bounds, shuffle, sort). For a provably-bounded
output the scale-correct plan is the same at sf0.1 and 100 TB: collapse
to one partition with a NARROW coalesce(1) and sort within it —
identical rows, identical presentation order, one fewer shuffle and no
sampling pass.

The A/B builds both forms of the same aggregate body (Q1-shape on
lineitem; hourly rollup on events), asserts the pandas outputs are
IDENTICAL (ordered, row-by-row), and times both with the bench's
``_timed_full`` (full re-execution, median of N) in one fresh session.

Run: python tools/ab_sort_tail.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from bench import _timed_full
from dask_xgboost_spark.session import get_spark
from dask_xgboost_spark.sources import load


def hourly_body(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(
        app_name="ab-sort-tail",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
            "spark.sql.autoBroadcastJoinThreshold": "64m",
            "spark.sql.execution.arrow.pyspark.enabled": "true",
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = load(spark, sf_dir, "lineitem")
    # base = body.orderBy(k); var = body.coalesce(1).sortWithinPartitions(k)
    q1_body = (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sq"),
            F.sum("l_extendedprice").alias("sp"),
            F.avg("l_discount").alias("ad"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    hb = hourly_body(spark, sf_dir)
    cases = {
        "q1_shape": (
            q1_body.orderBy("l_returnflag", "l_linestatus"),
            q1_body.coalesce(1).sortWithinPartitions(
                "l_returnflag", "l_linestatus"
            ),
        ),
        "hourly": (
            hb.orderBy("hour"),
            hb.coalesce(1).sortWithinPartitions("hour"),
        ),
    }

    print(f"{'case':10s} {'orderBy':>9s} {'coalesce1':>9s} {'delta%':>7s}")
    for name, (base, var) in cases.items():
        base.toPandas()
        var.toPandas()
        a = base.toPandas()
        b = var.toPandas()
        assert a.equals(b), f"{name}: outputs differ!"
        t_base = _timed_full(base, runs=runs)
        t_var = _timed_full(var, runs=runs)
        d = (t_var - t_base) / t_base * 100
        print(f"{name:10s} {t_base:9.4f} {t_var:9.4f} {d:+6.1f}%  rows={len(a)}")
    spark.stop()


if __name__ == "__main__":
    main()
