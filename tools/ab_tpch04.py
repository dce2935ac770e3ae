#!/usr/bin/env python
"""A/B: Q-TPCH-04's correlated EXISTS semi join vs a max-shipdate
aggregate join (optimization guide §2.3 "aggregate before you shuffle").

The declared form:

    orders WHERE EXISTS (SELECT 1 FROM lineitem
                         WHERE l_orderkey = o_orderkey
                           AND l_shipdate > o_orderdate + 60 DAYS)

Because ``o_orderdate`` is constant per order, the EXISTS is exactly
equivalent to comparing the per-order MAX ship date:

    EXISTS(...)  ⟺  max_l_shipdate(o_orderkey) > o_orderdate + 60 DAYS

(an order with no lineitem rows has no aggregate row → inner join
drops it → EXISTS false, identical). The aggregate form replaces the
fact-fact semi join — which at bench SFs broadcasts a 600k-row
lineitem build every execution, and above the broadcast threshold
shuffles all 60M+ lineitem rows — with a map-side-combinable
MAX aggregate whose shuffle is one row per distinct orderkey
(~4× fewer rows, and narrower), followed by an equi join + residual
filter.

Measures both forms at sf0.1 and on a 10×-replicated fact set
(fresh session, interleaved, bench _timed_full methodology), asserts
outputs identical, and records shuffle rows for each.

Run: python tools/ab_tpch04.py [sf_dir]
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


def exists_form(spark, sf_dir):
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00' "
        "AND o_orderdate < TIMESTAMP '1999-07-01 00:00:00' "
        "AND EXISTS (SELECT 1 FROM lineitem "
        "WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY) "
        "GROUP BY o_orderpriority"
    ).coalesce(1).sortWithinPartitions("o_orderpriority")


def maxagg_form(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-07-01 00:00:00").cast("timestamp"))
    )
    li_max = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_ship"))
    )
    return (
        orders.join(li_max, orders.o_orderkey == li_max.l_orderkey)
        .filter(F.col("max_ship") > F.expr("o_orderdate + INTERVAL 60 DAY"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .coalesce(1)
        .sortWithinPartitions("o_orderpriority")
    )


def run_point(spark, sf_dir, tag):
    a = exists_form(spark, sf_dir)
    b = maxagg_form(spark, sf_dir)
    pa, pb = a.toPandas(), b.toPandas()
    assert pa.equals(pb), f"{tag}: outputs differ!\n{pa}\n{pb}"
    res = {}
    for name, df in (("exists", a), ("maxagg", b)):
        df.toPandas()
        res[name] = round(_timed_full(df, runs=5), 4)
    sm_a = _shuffle_metrics(spark, a, f"ab04_a_{tag}")
    sm_b = _shuffle_metrics(spark, b, f"ab04_b_{tag}")
    print(
        f"{tag}: exists {res['exists']}s / {sm_a['rows']} shuf rows"
        f"  vs  maxagg {res['maxagg']}s / {sm_b['rows']} shuf rows"
        f"  (rows={len(pa)}, identical)"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="ab-tpch04",
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

    # 10× replicated facts (same id-shifted build as the bench tripwire)
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
