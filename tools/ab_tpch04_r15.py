#!/usr/bin/env python
"""A/B (r15): Q-TPCH-04's above-the-gate fallback at scale.

The r14 rewrite's fallback branch computes per-orderkey MAX(l_shipdate)
over the ENTIRE lineitem — at 100× that is a 60M-row aggregate whose
partial (map-side) phase reduces almost nothing on the replica's
shuffled layout (~4 rows per orderkey scattered across 32 map tasks →
nearly every partial row is distinct), so ~the whole fact shuffles.
Driver-run evidence: q_tpch_04 11.2 s, the worst 100× absolute in the
r15 run-1 pin.

Two levers, measured here:

1. DERIVED CONSTANT BOUND (guide §6 predicate pushdown): qualifying
   rows need l_shipdate > o_orderdate + 60 DAY with
   o_orderdate >= 1999-01-01, hence l_shipdate > 1999-03-02 — a
   compile-time constant, pushable to the parquet scan. Keeps 39% of
   lineitem at sf0.1. Sound for BOTH branches: a row with
   l_shipdate <= 1999-03-02 can never satisfy the join-level filter.

2. BRANCH SHAPE: (a) filtered max-agg-then-join (current fallback +
   bound) vs (b) join-first + COUNT(DISTINCT o_orderkey) — the SAME
   body as the gated branch, just without the broadcast hint, letting
   Catalyst/AQE pick SMJ/SHJ and (when thresholds allow) inject a
   runtime bloom filter from the 5.7%-selective orders slice into the
   lineitem scan. If (b) wins, the operator collapses to ONE body
   where the footer gate toggles only the broadcast hint — also
   closing the r14 advisor's two-branch divergence note for good.

Run: python tools/ab_tpch04_r15.py [sf_dir] [reps] [runs]
Defaults: /root/testdata/sf0.1, reps=100, runs=3. Outputs asserted
pandas-identical across all forms before timing.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bench import _shuffle_metrics, _timed_full
from dask_xgboost_spark.session import get_spark
from dask_xgboost_spark.sources import load

BOUND = "1999-03-02 00:00:00"


def _orders_slice(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-07-01 00:00:00").cast("timestamp"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )


def _li(spark, sf_dir, bound: bool):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    if bound:
        li = li.filter(F.col("l_shipdate") > F.lit(BOUND).cast("timestamp"))
    return li


def form_fallback(spark, sf_dir, bound: bool):
    orders = _orders_slice(spark, sf_dir)
    li_max = (
        _li(spark, sf_dir, bound)
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_ship"))
    )
    return (
        orders.join(li_max, orders.o_orderkey == li_max.l_orderkey)
        .filter(F.col("max_ship") > F.expr("o_orderdate + INTERVAL 60 DAY"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def form_join_distinct(spark, sf_dir, bound: bool):
    orders = _orders_slice(spark, sf_dir)
    li = _li(spark, sf_dir, bound)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY"))
        .groupBy("o_orderpriority")
        .agg(F.count_distinct("o_orderkey").alias("order_count"))
        .orderBy("o_orderpriority")
    )


FORMS = {
    "fallback_nobound": lambda s, d: form_fallback(s, d, False),
    "fallback_bound": lambda s, d: form_fallback(s, d, True),
    "join_distinct_bound": lambda s, d: form_join_distinct(s, d, True),
}


def run_point(spark, sf_dir, tag, runs):
    ref = None
    for name, fn in FORMS.items():
        pdf = fn(spark, sf_dir).toPandas()
        if ref is None:
            ref = pdf
        else:
            assert pdf.equals(ref), f"{name} output differs at {tag}!"
    out = {}
    for name, fn in FORMS.items():
        df = fn(spark, sf_dir)
        df.toPandas()  # warm
        out[name] = round(_timed_full(df, runs=runs), 3)
        sm = _shuffle_metrics(spark, fn(spark, sf_dir), f"{tag}:{name}")
        out[name + "_shufrows"] = sm["rows"]
    print(f"{tag}: " + "  ".join(f"{k}={v}" for k, v in out.items()), flush=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(
        app_name="ab-tpch04-r15",
        extra_conf={
            # the bench posture: a 64m threshold ADMITS the sf0.1
            # orders slice broadcast in join_distinct — to A/B the
            # ABOVE-the-gate fallback shapes we disable auto-broadcast
            # entirely at the replica point, as a 100 TB planner would
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
        driver_mem_default="32g",
    )
    spark.sparkContext.setLogLevel("ERROR")
    run_point(spark, sf_dir, "1x(noBHJ)", runs)

    import importlib.util as _ilu

    _ss_spec = _ilu.spec_from_file_location(
        "suite_scale",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "suite_scale.py"),
    )
    _ss = _ilu.module_from_spec(_ss_spec)
    _ss_spec.loader.exec_module(_ss)
    scaled = _ss.build_scaled_dir(spark, sf_dir, reps)
    try:
        run_point(spark, scaled, f"{reps}x(noBHJ)", runs)
    finally:
        shutil.rmtree(scaled, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
