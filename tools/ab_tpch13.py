#!/usr/bin/env python
"""A/B: Q-TPCH-13's customer LEFT JOIN orders (row-level) vs pushing the
count aggregate BELOW the join (optimization guide §2.3 "aggregate
before you shuffle").

The r14 plan joins customer to RAW orders rows and counts after the
join. Under the bench's 64 MB threshold the LeftOuter build side is
ORDERS — a fact-sized HashedRelation rebuilt every execution (the Q4
disease, invisible to the shuffle-rows metric); above the threshold the
join shuffles every wide orders row.

The rewrite is an EXACT algebraic push-down (no FK assumption):

    customer LEFT JOIN orders ON c=o AND pri<>'1-URGENT'
    GROUP BY c_custkey → COUNT(o_orderkey)
  ≡ customer LEFT JOIN (orders WHERE pri<>'1-URGENT'
                        GROUP BY o_custkey → COUNT(*) AS cnt)
    → c_count = COALESCE(cnt, 0)

because o_custkey is unique in the aggregate (each customer matches ≤ 1
row, no multiplication), COUNT(o_orderkey) over matched rows equals the
group count (o_orderkey is never NULL in orders), unmatched customers
get COALESCE → 0 exactly as COUNT over zero matched rows, and orders
rows whose custkey has no customer row are dropped by the join in both
forms. The aggregate is map-side combinable, so only ~one narrow
(custkey, cnt) row per distinct custkey per map task ever shuffles, and
the join build side drops from |orders| wide rows to ≤ |custkeys|
16-byte rows.

Run: python tools/ab_tpch13.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from bench import _shuffle_metrics, _timed_full
from dask_xgboost_spark.session import get_spark
from dask_xgboost_spark.sources import load


def old_form(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .coalesce(1)
        .sortWithinPartitions(F.desc("custdist"), F.desc("c_count"))
    )


def pushed_form(spark, sf_dir):
    """The SHIPPED r15 operator (aggregate pushed below the left join) —
    measured straight from the registry so the A/B can never drift from
    the committed code."""
    from dask_xgboost_spark.registry import load_all

    return load_all()["Q-TPCH-13"].fn(spark, sf_dir)


def run_point(spark, sf_dir, tag):
    a = old_form(spark, sf_dir)
    b = pushed_form(spark, sf_dir)
    pa, pb = a.toPandas(), b.toPandas()
    assert pa.equals(pb), f"{tag}: outputs differ!\n{pa}\n{pb}"
    res = {}
    for name, df in (("old", a), ("pushed", b)):
        df.toPandas()
        res[name] = round(_timed_full(df, runs=5), 4)
    sm_a = _shuffle_metrics(spark, a, f"ab13_a_{tag}")
    sm_b = _shuffle_metrics(spark, b, f"ab13_b_{tag}")
    print(
        f"{tag}: old {res['old']}s / {sm_a['rows']} shuf rows"
        f"  vs  pushed {res['pushed']}s / {sm_b['rows']} shuf rows"
        f"  (rows={len(pa)}, identical)"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="ab-tpch13",
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
    run_point(spark, sf_dir, "1x")

    import importlib.util as _ilu

    _ss_spec = _ilu.spec_from_file_location(
        "suite_scale",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "suite_scale.py"),
    )
    _ss = _ilu.module_from_spec(_ss_spec)
    _ss_spec.loader.exec_module(_ss)
    scaled = _ss.build_scaled_dir(spark, sf_dir, 10)
    try:
        run_point(spark, scaled, "10x")
    finally:
        shutil.rmtree(scaled, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
