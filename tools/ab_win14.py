#!/usr/bin/env python
"""Physical-plan A/B for Q-WIN-14: salted two-stage top-k per group vs
the plain single-window top-k, measured fresh-session on shared 100×
orders replicas — UNIFORM (fixture key distribution) and SKEWED (one
hot customer holding a configurable share of all rows). The r12 Q21
experiment's methodology applied to the window tier.

The question the A/B answers: the declared Q-WIN-14 plan pays a second
shuffle + window pass to bound the worst task at salt_count-th of a hot
key — what does that insurance cost on uniform data, and what does it
buy under real skew? (A single window PARTITION BY funnels every hot
key's rows through ONE task; AQE cannot split a window partition the
way it splits a join.)

Usage:
  python tools/ab_win14.py build [sf_dir] [rep] [hot_pct]
      Build the two replicas; prints UNIFORM=<dir> SKEWED=<dir>.
      hot_pct = % of orders rows reassigned to customer 1 (default 30).
  python tools/ab_win14.py run <orders_dir> <salted|plain> [runs]
      Median fresh-plan wall over `runs` full re-executions (default 3)
      plus shuffle rows/bytes — run each (dir, plan) in its OWN process
      for the fresh-JVM pin methodology (BASELINE.md §5, r10/r11).
  python tools/ab_win14.py check <orders_dir>
      Assert both plans produce IDENTICAL output rows on that replica.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dask_xgboost_spark.functions import cents  # noqa: E402
from dask_xgboost_spark.session import get_spark  # noqa: E402
from dask_xgboost_spark.sources import load  # noqa: E402

KEY_SHIFT = 10_000_000  # same id-shift discipline as tools/suite_scale.py
SALT = 8  # the declared operator's salt count (operators/windows.py)
TOPK = 3


def _orders(spark, path: str):
    o = spark.read.parquet(os.path.join(path, "orders.parquet"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        cents("o_totalprice").cast("bigint").alias("price_c"),
    )


def plan_salted(o):
    """Mirror of the declared Q-WIN-14 plan (operators/windows.py)."""
    o = o.withColumn("salt", F.col("o_orderkey") % SALT)
    w1 = Window.partitionBy("o_custkey", "salt").orderBy(
        F.col("price_c").desc(), F.col("o_orderkey")
    )
    stage1 = o.withColumn("lrk", F.row_number().over(w1)).filter(
        F.col("lrk") <= TOPK
    )
    w2 = Window.partitionBy("o_custkey").orderBy(
        F.col("price_c").desc(), F.col("o_orderkey")
    )
    return (
        stage1.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= TOPK)
        .select("o_custkey", "o_orderkey", "price_c", "rk")
        .orderBy("o_custkey", "rk")
    )


def plan_plain(o):
    """The oracle's shape: one window partitioned by the raw key."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("price_c").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOPK)
        .select("o_custkey", "o_orderkey", "price_c", "rk")
        .orderBy("o_custkey", "rk")
    )


PLANS = {"salted": plan_salted, "plain": plan_plain}


def build(sf_dir: str, rep: int, hot_pct: int) -> None:
    spark = get_spark(app_name="ab-win14-build", driver_mem_default="32g")
    base = tempfile.mkdtemp(prefix=f"dxs_ab_win14_{rep}x_")
    reps = spark.range(rep).select(F.col("id").alias("r"))
    orders = (
        load(spark, sf_dir, "orders")
        .crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("r") * KEY_SHIFT)
        .drop("r")
    )
    uni = os.path.join(base, "uniform")
    skw = os.path.join(base, "skewed")
    os.makedirs(uni)
    os.makedirs(skw)
    orders.repartition(32).write.parquet(os.path.join(uni, "orders.parquet"))
    # deterministic hot key: hot_pct% of rows (by orderkey residue)
    # reassigned to customer 1 — the "one viral user / default tenant"
    # shape that makes a single window partition the whole job's tail
    skewed = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 100 < hot_pct, F.lit(1)).otherwise(
            F.col("o_custkey")
        ),
    )
    skewed.repartition(32).write.parquet(os.path.join(skw, "orders.parquet"))
    print(f"UNIFORM={uni}")
    print(f"SKEWED={skw}")


def run(orders_dir: str, plan_name: str, runs: int) -> None:
    spark = get_spark(app_name="ab-win14-run", driver_mem_default="32g")
    import bench  # repo-root module; _timed_full/_shuffle_metrics helpers

    df = PLANS[plan_name](_orders(spark, orders_dir))
    n = df.count()
    wall = bench._timed_full(df, runs=runs)
    sh = bench._shuffle_metrics(spark, df, f"ab_win14_{plan_name}")
    print(
        f"AB_WIN14 plan={plan_name} dir={orders_dir} rows={n} "
        f"median_wall={wall:.3f}s shuffle_rows={sh['rows']} "
        f"shuffle_bytes={sh['bytes']}"
    )


def check(orders_dir: str) -> None:
    spark = get_spark(app_name="ab-win14-check", driver_mem_default="32g")
    o = _orders(spark, orders_dir)
    # bounded: top-3 per customer — |customers| × 3 rows (≤ ~45k at 100×)
    a = [tuple(r) for r in plan_salted(o).collect()]
    b = [tuple(r) for r in plan_plain(o).collect()]
    assert a == b, f"plan outputs differ: {len(a)} vs {len(b)} rows"
    print(f"IDENTICAL rows={len(a)}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    if mode == "build":
        build(
            sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1",
            int(sys.argv[3]) if len(sys.argv) > 3 else 100,
            int(sys.argv[4]) if len(sys.argv) > 4 else 30,
        )
    elif mode == "run" and len(sys.argv) > 3 and sys.argv[3] in PLANS:
        run(sys.argv[2], sys.argv[3], int(sys.argv[4]) if len(sys.argv) > 4 else 3)
    elif mode == "check" and len(sys.argv) > 2:
        check(sys.argv[2])
    else:
        raise SystemExit(__doc__)
