#!/usr/bin/env python
"""A/B: Q-TPCH-05's customer-streaming join order vs a dims-first
order-grain map with lineitem as the streaming side (optimization guide
§2.3/§3.1 — never build a hash relation over the fact table).

The r14 plan keeps the r5 keyset prune (ASIA nations broadcast into
customer and supplier) but the DECLARED join order makes CUSTOMER the
streaming side:

    cust_a ⋈ orders ⋈ lineitem ⋈ supp_a

Under the bench's 64 MB threshold Catalyst therefore broadcasts every
other input — including the FULL LINEITEM (600 k rows at sf0.1): a
fact-sized HashedRelation rebuilt on every execution, the exact disease
the r14 Q4 rewrite removed (broadcast build cost grows linearly,
invisible to the shuffle-rows metric). Above the threshold the same
order shuffles the wide customer⋈orders intermediate AND wide lineitem
rows through SMJ.

The rewrite is the Q8 dims-first discipline: resolve
orders(year-filter) ⋈ customer(ASIA-semi) into a NARROW fixed-width
order-grain map (o_orderkey, c_nationkey) FIRST, then stream LINEITEM
through one join on orderkey + the supplier nation-cycle join + a
25-row nation-name lookup — lineitem is never a build side, and the
only fact movement is lineitem's own narrow projection, once. The omap
broadcast is footer-gated on orders' row count (join output → no scan
stats, the Q7/Q8 gate, 48 B/row — fires under the DEFAULT 10 MB
threshold at bench SFs); above the gate the li⋈omap join shuffles
narrow rows — the scale-correct plan.

Inner joins commute/associate, so output equality is structural;
asserted pandas-identical at 1× and 10× anyway.

Run: python tools/ab_tpch05.py [sf_dir]
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


def _rev():
    return cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))


def _asian(spark, sf_dir):
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")


def old_form(spark, sf_dir):
    """r14 shape: customer-streaming, everything else broadcast/ SMJ."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    asian = _asian(spark, sf_dir)
    cust_a = cust.join(F.broadcast(asian), cust.c_nationkey == asian.n_nationkey)
    supp_a = supp.join(
        F.broadcast(asian.select("n_nationkey")),
        supp.s_nationkey == F.col("n_nationkey"),
        "left_semi",
    )
    return (
        cust_a.join(orders, F.col("c_custkey") == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            supp_a,
            (li.l_suppkey == supp_a.s_suppkey)
            & (F.col("c_nationkey") == supp_a.s_nationkey),
        )
        .groupBy("n_name")
        .agg((F.sum(_rev()) / 1e4).alias("revenue"))
        .coalesce(1)
        .sortWithinPartitions(F.desc("revenue"), "n_name")
    )


def dims_first_form(spark, sf_dir):
    """The SHIPPED r15 operator (fixed-width omap, lineitem streaming) —
    measured straight from the registry so the A/B can never drift from
    the committed code."""
    from dask_xgboost_spark.registry import load_all

    return load_all()["Q-TPCH-05"].fn(spark, sf_dir)


def run_point(spark, sf_dir, tag):
    a = old_form(spark, sf_dir)
    b = dims_first_form(spark, sf_dir)
    pa, pb = a.toPandas(), b.toPandas()
    assert pa.equals(pb), f"{tag}: outputs differ!\n{pa}\n{pb}"
    res = {}
    for name, df in (("old", a), ("dims_first", b)):
        df.toPandas()
        res[name] = round(_timed_full(df, runs=5), 4)
    sm_a = _shuffle_metrics(spark, a, f"ab05_a_{tag}")
    sm_b = _shuffle_metrics(spark, b, f"ab05_b_{tag}")
    print(
        f"{tag}: old {res['old']}s / {sm_a['rows']} shuf rows"
        f"  vs  dims_first {res['dims_first']}s / {sm_b['rows']} shuf rows"
        f"  (rows={len(pa)}, identical)"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="ab-tpch05",
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
