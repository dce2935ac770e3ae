#!/usr/bin/env python
"""A/B: Q-TPCH-16's trailing global ORDER BY vs bounded_sort
(optimization guide §2.4 — "an orderBy used only to make output
deterministic" is a removable exchange).

The r14 bounded_sort screen rejected Q16 as "distinct-pair volume
scales with suppliers" — but that volume flows through the
dedup/count exchanges BELOW the coalesce point and stays fully
parallel. The coalesced segment contains only the FINAL count
aggregate, whose post-exchange input is ≤ output-grain × #map-tasks
partial rows, and the output grain is the part ATTRIBUTE DOMAIN
(|brands| × |types| × |sizes| — generator-fixed vocabularies, 25 × 6 ×
50 at every fixture SF, invariant in fact volume; 893 groups observed
at sf0.1 after the filter). That satisfies plans/scale.bounded_sort's
eligibility condition exactly as Q9's nations × years does.

Both forms are built, outputs asserted pandas-IDENTICAL (the sort key
ends in the full group key (brand, type, size), so the order is total
and an ordered compare is valid), and timed with the bench's
_timed_full at 1x and on the suite_scale 10x replica.

Run: python tools/ab_tpch16.py [sf_dir]
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
    """The r1-r15 shape: trailing global orderBy (range Exchange)."""
    part = F.broadcast(
        load(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
    )
    li = load(spark, sf_dir, "lineitem")
    flagged = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(F.broadcast(flagged), li.l_suppkey == flagged.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def new_form(spark, sf_dir):
    """The SHIPPED operator (bounded_sort tail) — measured straight from
    the registry so the A/B can never drift from the committed code."""
    from dask_xgboost_spark.registry import load_all

    return load_all()["Q-TPCH-16"].fn(spark, sf_dir)


def run_point(spark, sf_dir, tag):
    a = old_form(spark, sf_dir)
    b = new_form(spark, sf_dir)
    pa, pb = a.toPandas(), b.toPandas()
    assert pa.equals(pb), f"{tag}: outputs differ!\n{pa}\n{pb}"
    res = {}
    for name, df in (("orderBy", a), ("bounded", b)):
        df.toPandas()
        res[name] = round(_timed_full(df, runs=5), 4)
    sm_a = _shuffle_metrics(spark, a, f"ab16_a_{tag}")
    sm_b = _shuffle_metrics(spark, b, f"ab16_b_{tag}")
    print(
        f"{tag}: orderBy {res['orderBy']}s / {sm_a['rows']} shuf rows"
        f"  vs  bounded {res['bounded']}s / {sm_b['rows']} shuf rows"
        f"  (rows={len(pa)}, identical)"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="ab-tpch16",
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
