#!/usr/bin/env python
"""A/B: Q-TPCH-02's twice-referenced offer list (two full lineitem
scans per execution — Catalyst's exchange reuse does not fire across
the differently-pruned MIN and probe branches) vs ONE fact pass over a
persisted (part, supplier)-grain min rollup (guide §2.3/§5, the
Q11/Q15 multi-reference discipline).

Key algebra: with pairs = min offer price per (part, supplier) over the
pruned offers, the per-part min is min-over-pair-mins (= min over
offers), and a pair qualifies iff its own min EQUALS the part min
(pair min ≥ part min always; equality iff some offer sits at the part
min). Display attributes re-attach above the pair grain via the same
dim broadcasts. The trailing DISTINCT keeps the exact SQL contract.

Run: python tools/ab_tpch02.py [sf_dir]
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
    pk = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "PROMO"))
        .select("p_partkey", "p_type")
    )
    eur = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    offers = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(F.broadcast(pk), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eur), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    minp = offers.groupBy(F.col("l_partkey").alias("mk")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        offers.join(
            F.broadcast(minp),
            (F.col("l_partkey") == F.col("mk"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("l_extendedprice").alias("price"),
        )
        .distinct()
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def one_pass_form(spark, sf_dir):
    """The SHIPPED operator, straight from the registry so the A/B can
    never drift from the committed code."""
    from dask_xgboost_spark.registry import load_all

    return load_all()["Q-TPCH-02"].fn(spark, sf_dir)


def run_point(spark, sf_dir, tag):
    a = old_form(spark, sf_dir)
    b = one_pass_form(spark, sf_dir)
    pa, pb = a.toPandas(), b.toPandas()
    assert pa.equals(pb), f"{tag}: outputs differ!\n{pa}\n{pb}"
    res = {}
    for name, df in (("old", a), ("one_pass", b)):
        df.toPandas()
        res[name] = round(_timed_full(df, runs=5), 4)
    sm_a = _shuffle_metrics(spark, a, f"ab02_a_{tag}")
    sm_b = _shuffle_metrics(spark, b, f"ab02_b_{tag}")
    print(
        f"{tag}: old {res['old']}s / {sm_a['rows']} shuf rows"
        f"  vs  one_pass {res['one_pass']}s / {sm_b['rows']} shuf rows"
        f"  (rows={len(pa)}, identical)"
    )
    spark.catalog.clearCache()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="ab-tpch02",
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
