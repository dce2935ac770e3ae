#!/usr/bin/env python
"""A/B + decomposition for Q-WIN-01 (VERDICT r14 item 4) — the measured
REFUSAL record.

The plan is already §2.3-minimal: the scan reads exactly the window's 3
input columns (ReadSchema pinned), a PARTIAL WindowGroupLimit prunes
each map task to its local top-3 per customer before the hash exchange
(89,906 of 150,000 rows shuffle at sf0.1), and the trailing range
exchange is the DECLARED presentation order over an unbounded
per-customer grain (3×|customers| rows at scale — bounded_sort is
ineligible, the stage guard would rightly reject it).

Decomposition (this tool, noop sink, fresh session, sf0.1): scan-only
0.13 s → + window machinery 0.37 s → + declared final sort 0.74 s. The
residue is the range sort's extra stage + sampling job on top of the
~0.1 s per-job floor.

The one candidate §2.4 lever — share ONE range exchange between the
window (RangePartitioning satisfies its clustering requirement) and the
presentation order (rows leave the window already (custkey, rn)-sorted
within range partitions) — was measured and REFUSED:

  uniform 1×:        0.708 → 0.514 s  (−27%)
  uniform 10×:       0.977 → 0.671 s  (−31%), shuffle rows 1.14M → 1.50M
  30%-hot-key 10×:   0.793 → 1.308 s  (+65% — LOSES)

The single-exchange form drops the partial WindowGroupLimit (the
optimizer only plants it under the window's OWN exchange), so a hot
key's reduce input goes from ≤ 3 × map_tasks rows (bounded) to the key's
full row count (unbounded) — the exact funnel the r13 Q-WIN-14 A/B
measured this shape to avoid. A 27-31% win on uniform sub-second walls
does not buy back an unbounded straggler at 100 TB; the declared plan
stands.

Run: python tools/ab_win01.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window
from pyspark.sql import functions as F

from bench import _timed_full
from dask_xgboost_spark.session import get_spark
from dask_xgboost_spark.sources import load

W = Window.partitionBy("o_custkey").orderBy(
    F.desc("o_totalprice"), F.asc("o_orderkey")
)


def current(spark, sf):
    return (
        load(spark, sf, "orders")
        .select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(W).alias("rn"),
            F.rank().over(W).alias("rk"),
            F.dense_rank().over(W).alias("drk"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


def one_exchange(spark, sf):
    return (
        load(spark, sf, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .repartitionByRange("o_custkey")
        .select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(W).alias("rn"),
            F.rank().over(W).alias("rk"),
            F.dense_rank().over(W).alias("drk"),
        )
        .filter(F.col("rn") <= 3)
        .sortWithinPartitions("o_custkey", "rn")
    )


def run_point(spark, sf, tag):
    a = current(spark, sf).toPandas()
    b = one_exchange(spark, sf).toPandas()
    assert a.equals(b), f"{tag}: outputs differ (ordered compare)"
    for name, fn in [("current", current), ("one_exchange", one_exchange)]:
        df = fn(spark, sf)
        df.toPandas()
        print(f"{tag} {name}: {round(_timed_full(df, runs=5), 3)}s", flush=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="ab-win01",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m"},
        driver_mem_default="32g",
    )
    spark.sparkContext.setLogLevel("ERROR")
    run_point(spark, sf_dir, "1x")

    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "suite_scale",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "suite_scale.py"),
    )
    ss = _ilu.module_from_spec(spec)
    spec.loader.exec_module(ss)
    scaled = ss.build_scaled_dir(spark, sf_dir, 10)
    skew_dir = tempfile.mkdtemp(prefix="win01skew_")
    try:
        run_point(spark, scaled, "10x")
        # 30% of rows onto one hot customer (deterministic key mod)
        o = load(spark, scaled, "orders")
        o.withColumn(
            "o_custkey",
            F.when(F.pmod(F.col("o_orderkey"), F.lit(10)) < 3, F.lit(7)).otherwise(
                F.col("o_custkey")
            ),
        ).write.mode("overwrite").parquet(f"{skew_dir}/orders.parquet")
        run_point(spark, skew_dir, "10x(30%hot)")
    finally:
        shutil.rmtree(scaled, ignore_errors=True)
        shutil.rmtree(skew_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
