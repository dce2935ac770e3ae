#!/usr/bin/env python
"""Join-heavy suite scale curve (BASELINE.md §5): run the full 22-query
TPC-H suite over an N×-replicated dataset in Spark and DuckDB.

The Q1-shape curve (tools/scale_curve.py) answers "does a scan-bound
aggregate amortize the platform constants?" (yes: ratio falls with
scale). This tool answers the harder question the round-4 bench left
open: the join/shuffle-heavy suite ratio WORSENED from 4.6× (1×) to
7.8× (10×) because shuffle serialization is per-byte — does it plateau
at 100× as the fixed per-job floor amortizes, or keep growing?

Replication keeps joins consistent: lineitem and orders are replicated
with the SAME orderkey shift per replica (l_orderkey/o_orderkey +
r*10M) so every lineitem still matches exactly one order; dimension
tables (customer/supplier/part/nation/region) are shared unreplicated,
as they would be at a real 100 TB (facts grow, dims don't). DuckDB
reads the identical parquet files.

Run: python tools/suite_scale.py [sf_dir] [reps ...]
Defaults: sf_dir=/root/testdata/sf0.1, reps = 10 100. The 100× point
writes ~60M lineitem rows (~1.5 GB) to scratch and takes ~15 min.

100× needs heap headroom: the single local JVM carries all 32 executor
threads plus broadcast blocks, and the session's 8g default can OOM
mid-suite (observed r11) — so this tool DEFAULTS the heap to 32g
(r12; an explicit SPARK_GRAFT_DRIVER_MEM still wins). Pin runs use a
FRESH session per suite (wall variance at this scale is session-age
noise — BASELINE.md §5).
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, ".")

import duckdb
from pyspark.sql import functions as F

from bench import _timed_full
from dask_xgboost_spark.registry import load_all
from dask_xgboost_spark.session import get_spark
from dask_xgboost_spark.sources import load

TPCH = ["Q-AGG-01"] + [f"Q-TPCH-{i:02d}" for i in range(2, 23)]
KEY_SHIFT = 10_000_000
# facts replicate with id-shifted keys so every FK still matches exactly
# one parent; dimensions are shared unreplicated, as at a real 100 TB.
# events joined the replicated set in r9: the bench's 10× shuffle
# tripwire runs the events-based headline query (q_date_02) against the
# scaled dir, and a symlinked events table made its "10×" number silently
# equal the 1× number. event_id shifts like the order keys; user_id stays
# (events.user_id → customer, and customer does not replicate). The
# TPC-H suite itself never reads events, so the pinned §5 suite numbers
# are unaffected.
REPLICATED = {"lineitem", "orders", "events"}
_REP_KEYS = {"lineitem": "l_orderkey", "orders": "o_orderkey",
             "events": "event_id"}
SHARED = ["region", "nation", "customer", "supplier", "part",
          "documents", "embeddings"]


def build_scaled_dir(spark, sf_dir: str, rep: int) -> str:
    # clean up on ANY failure: a partial replica dir left behind by a
    # mid-write error (e.g. scratch disk full) would worsen the exact
    # pressure that caused it and accumulate across runs
    out = tempfile.mkdtemp(prefix=f"dxs_suite_{rep}x_")
    try:
        for t in SHARED:
            src = f"{sf_dir}/{t}.parquet"
            if os.path.exists(src):
                os.symlink(src, f"{out}/{t}.parquet")
        reps = spark.range(rep).select(F.col("id").alias("r"))
        for t, key in _REP_KEYS.items():
            if not os.path.exists(f"{sf_dir}/{t}.parquet"):
                continue
            df = load(spark, sf_dir, t)
            (
                df.crossJoin(reps)
                .withColumn(key, F.col(key) + F.col("r") * KEY_SHIFT)
                .drop("r")
                .repartition(32)
                .write.mode("overwrite")
                .parquet(f"{out}/{t}.parquet")
            )
        return out
    except BaseException:
        shutil.rmtree(out, ignore_errors=True)
        raise


def duck_con_for(path: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in SHARED + sorted(REPLICATED):
        p = f"{path}/{t}.parquet"
        if not os.path.exists(p):
            continue
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


def run_suite(spark, con, specs, sf_dir: str, runs: int) -> tuple[float, float, dict]:
    per = {}
    s_total = d_total = 0.0
    for name in TPCH:
        key = name.lower().replace("-", "_")
        df = specs[name].fn(spark, sf_dir)
        df.toPandas()  # warm: plan, codegen, file listing
        s = round(_timed_full(df, runs=runs), 3)
        sql = specs[name].sql
        con.execute(sql).df()  # warm
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(sql).df()
            ts.append(time.perf_counter() - t0)
        d = round(statistics.median(ts), 3)
        per[key] = {"spark": s, "duckdb": d}
        s_total += s
        d_total += d
        spark.catalog.clearCache()
    return round(s_total, 2), round(d_total, 2), per


def main(sf_dir: str = "/root/testdata/sf0.1", *reps: str) -> None:
    rep_list = [int(r) for r in reps] or [10, 100]
    # 100× on the 8g session default OOMs mid-suite (observed r11;
    # VERDICT r11 item 6): default THIS tool to the documented 32g pin
    # heap. An explicit SPARK_GRAFT_DRIVER_MEM still wins.
    spark = get_spark(app_name="suite-scale", driver_mem_default="32g")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    for rep in rep_list:
        runs = 3 if rep <= 10 else 2
        if rep == 1:
            scaled, cleanup = sf_dir, None
        else:
            scaled = build_scaled_dir(spark, sf_dir, rep)
            cleanup = scaled
        con = duck_con_for(scaled)
        s, d, per = run_suite(spark, con, specs, scaled, runs)
        worst = sorted(per.items(), key=lambda kv: -(kv[1]["spark"] / max(kv[1]["duckdb"], 1e-4)))[:4]
        print(
            f"{rep:>4}x suite  spark={s}s  duckdb={d}s  ratio={s / d:.2f}x  "
            "worst: " + ", ".join(f"{k} {v['spark']}/{v['duckdb']}s" for k, v in worst)
        )
        con.close()
        if cleanup:
            shutil.rmtree(cleanup, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
