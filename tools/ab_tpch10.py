#!/usr/bin/env python
"""A/B: Q-TPCH-10's aggregate-after-the-customer-join vs pushing the
revenue aggregate BELOW it (optimization guide §2.3 "aggregate before
you shuffle" — the Q13 discipline applied to Q10).

The r1–r15 plan joined customer⋈orders first and aggregated after the
lineitem join, so under any admitting threshold the R-filtered LINEITEM
itself became the broadcast build side — a fact-sized HashedRelation
rebuilt every execution (the Q4 disease; plans/r15/q_tpch_10_before.txt
node 11) — and above the threshold the customer-wide intermediate
(c_name strings) shuffled through the fact join and the aggregation.

The rewrite aggregates rev per o_custkey FIRST over lineitem(R) joined
to a narrow (o_orderkey, o_custkey) order map (footer-gated broadcast
at 48 B/row), then attaches customer/nation display attributes at
customer grain. Exactness rests on c_custkey unique in customer (TPC-H
PK): grouping by o_custkey then attaching (c_name, n_name) equals
grouping by (c_custkey, c_name, n_name); orphan orders drop at the
customer join in both forms.

Run: python tools/ab_tpch10.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from bench import _shuffle_metrics, _timed_full
from dask_xgboost_spark.functions import cents
from dask_xgboost_spark.session import get_spark
from dask_xgboost_spark.sources import load


def old_form(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(load(spark, sf_dir, "nation"))
    rev = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(rev) / 1e4).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def pushed_form(spark, sf_dir):
    """The SHIPPED operator, straight from the registry so the A/B can
    never drift from the committed code."""
    from dask_xgboost_spark.registry import load_all

    return load_all()["Q-TPCH-10"].fn(spark, sf_dir)


def run_point(spark, sf_dir, tag):
    a = old_form(spark, sf_dir)
    b = pushed_form(spark, sf_dir)
    pa, pb = a.toPandas(), b.toPandas()
    assert pa.equals(pb), f"{tag}: outputs differ!\n{pa}\n{pb}"
    res = {}
    for name, df in (("old", a), ("pushed", b)):
        df.toPandas()
        res[name] = round(_timed_full(df, runs=5), 4)
    sm_a = _shuffle_metrics(spark, a, f"ab10_a_{tag}")
    sm_b = _shuffle_metrics(spark, b, f"ab10_b_{tag}")
    print(
        f"{tag}: old {res['old']}s / {sm_a['rows']} shuf rows"
        f"  vs  pushed {res['pushed']}s / {sm_b['rows']} shuf rows"
        f"  (rows={len(pa)}, identical)"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="ab-tpch10",
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
