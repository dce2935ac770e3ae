#!/usr/bin/env python
"""A/B: Q-JOIN-02/08's fact-first join order (li ⋈ orders ⋈ customer ⋈
nation) vs the dims-first order-grain map (the Q5/Q8 discipline,
optimization guide §2.3/§3.1).

The fact-first order makes the order-grain ORDERS scan a broadcast
build at bench SFs (linear growth) and, above any admitting threshold,
re-shuffles the fact-wide joined intermediate — revenue columns and
all — on custkey. The dims-first body resolves orders(2 cols) ⋈
customer(2 cols) into a narrow fixed-width (o_orderkey, c_nationkey)
map first (footer-gated broadcast at 48 B/row), then streams
lineitem(3 cols) through ONE join on orderkey and the 25-row nation
lookup below the aggregate — above the gate the fact table shuffles
exactly once, on orderkey, in 24 B rows.

Run: python tools/ab_join02.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from bench import _shuffle_metrics, _timed_full
from dask_xgboost_spark.functions import cents
from dask_xgboost_spark.plans.scale import bounded_sort
from dask_xgboost_spark.session import get_spark
from dask_xgboost_spark.sources import load


def old_form(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    rev = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg((F.sum(rev) / 1e4).alias("revenue"))
        .transform(bounded_sort, "n_name")
    )


def dims_first_form(spark, sf_dir):
    """The SHIPPED operator, straight from the registry so the A/B can
    never drift from the committed code."""
    from dask_xgboost_spark.registry import load_all

    return load_all()["Q-JOIN-02"].fn(spark, sf_dir)


def run_point(spark, sf_dir, tag):
    a = old_form(spark, sf_dir)
    b = dims_first_form(spark, sf_dir)
    pa, pb = a.toPandas(), b.toPandas()
    assert pa.equals(pb), f"{tag}: outputs differ!\n{pa}\n{pb}"
    res = {}
    for name, df in (("old", a), ("dims_first", b)):
        df.toPandas()
        res[name] = round(_timed_full(df, runs=5), 4)
    sm_a = _shuffle_metrics(spark, a, f"abj02_a_{tag}")
    sm_b = _shuffle_metrics(spark, b, f"abj02_b_{tag}")
    print(
        f"{tag}: old {res['old']}s / {sm_a['rows']} shuf rows"
        f"  vs  dims_first {res['dims_first']}s / {sm_b['rows']} shuf rows"
        f"  (rows={len(pa)}, identical)"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="ab-join02",
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
