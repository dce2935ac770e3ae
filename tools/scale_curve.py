#!/usr/bin/env python
"""Reproduce the BASELINE.md §4 scale-growth curve (1× / 10× / 100×).

Replicates lineitem with key-shifted copies (so join keys stay
consistent), writes multi-file layouts, and measures the Q1-shape
aggregate under FULL re-execution in Spark and DuckDB over the same
files. The query shape, oracle SQL, and full-re-execution timer are
imported from bench.py (same objects the per-round bench uses — see
BASELINE.md §3 for why repeated actions on one DataFrame must NOT be
timed), so the one-off curve and the per-round 1×/10× points cannot
drift apart methodologically.

Run: python tools/scale_curve.py [sf_dir] [reps ...]
Defaults: sf_dir=/root/testdata/sf0.1, reps = 1 10 100 (100× writes
~1.3 GB to /tmp and takes several minutes).
"""

from __future__ import annotations

import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, ".")

import duckdb
from pyspark.sql import functions as F

from bench import Q1_SQL, _timed_full, q1_shape
from dask_xgboost_spark.session import get_spark
from dask_xgboost_spark.sources import load


def med_duck(con, path, runs=3):
    q = Q1_SQL.format(path=path)
    con.execute(q).df()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        con.execute(q).df()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main(sf_dir: str = "/root/testdata/sf0.1", *reps: str) -> None:
    rep_list = [int(r) for r in reps] or [1, 10, 100]
    spark = get_spark(
        app_name="scale-curve",
        extra_conf={
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    li = load(spark, sf_dir, "lineitem")
    base_rows = li.count()

    for rep in rep_list:
        if rep == 1:
            s = _timed_full(q1_shape(li), runs=3)
            d = med_duck(con, f"{sf_dir}/lineitem.parquet")
            path = None
        else:
            path = tempfile.mkdtemp(prefix=f"dxs_curve_{rep}x_")
            # repartition BEFORE the crossJoin: the replica multiplier is
            # a broadcast range, so the expansion is map-side and each of
            # the N writer tasks streams its slice xrep straight to
            # parquet. The old order (expand, THEN repartition) shuffled
            # rep x the fixture through the fixture's ~3 scan tasks —
            # ~60 GB of uncompressed shuffle at 1000x, hours of skewed
            # map work for zero measurement benefit (the write path is
            # not what this tool times).
            (
                li.repartition(min(64, 32 * max(1, rep // 10)))
                .crossJoin(spark.range(rep).select(F.col("id").alias("r")))
                .withColumn("l_orderkey", F.col("l_orderkey") + F.col("r") * 10_000_000)
                .drop("r")
                .write.mode("overwrite")
                .parquet(path)
            )
            s = _timed_full(q1_shape(spark.read.parquet(path)), runs=3)
            d = med_duck(con, f"{path}/*.parquet")
        n = base_rows * rep
        print(
            f"{rep:>4}x  rows={n:>9}  spark={s:.3f}s  duckdb={d:.3f}s  "
            f"ratio={s / d:.2f}x  spark_throughput={n / s / 1e6:.1f}M rows/s"
        )
        if path:
            shutil.rmtree(path, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
