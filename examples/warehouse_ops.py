#!/usr/bin/env python
"""Warehouse-operations tour: the round-4 operational surface on real
fixtures — time-series gap filling, incremental materialized-view
maintenance, snapshot reconciliation, and blocked fuzzy matching.

Run: python examples/warehouse_ops.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from dask_xgboost_spark import get_spark
from dask_xgboost_spark.operators.timeseries import gapfill
from dask_xgboost_spark.registry import load_all
from dask_xgboost_spark.sources import load


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="warehouse-ops")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    # 1. gap-fill a sparse hourly series (the public API; Q-TS-01/02 are
    #    the registered, oracle-checked instances)
    obs = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)))
            .cast("bigint")
            .alias("cents")
        )
        .filter(F.hour("h") % 3 == 0)  # leave holes to fill
    )
    locf = gapfill(obs, ["event_type"], "h", "cents", how="locf")
    interp = gapfill(obs, ["event_type"], "h", "cents", how="interp")
    print(
        "gapfill: spine rows",
        locf.count(),
        "| observed",
        locf.agg(F.sum("observed")).first()[0],
        "| interp non-null",
        interp.filter(F.col("cents_interp").isNotNull()).count(),
    )

    # 2. incremental MV maintenance: fold a delta into stored partials
    #    and confirm against the full recompute (G-MV-01's contract)
    folded = specs["G-MV-01"].fn(spark, sf_dir)
    print("mv fold: groups", folded.count())

    # 3. snapshot reconciliation: classify row-level drift between two
    #    table versions in one full-outer join (Q-DIFF-01)
    print("diff witness:", specs["Q-DIFF-01"].fn(spark, sf_dir).first().asDict())

    # 4. blocked fuzzy matching: near-identical part names without the
    #    all-pairs cross join (Q-JOIN-12)
    fuzzy = specs["Q-JOIN-12"].fn(spark, sf_dir)
    print("fuzzy pairs:", fuzzy.count(), "| sample:", fuzzy.limit(3).collect())
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
