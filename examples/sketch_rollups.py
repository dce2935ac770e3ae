#!/usr/bin/env python
"""Mergeable-sketch rollups: the 100 TB distinct-count / frequency /
quantile architecture that Q-AGG-27/28/29 pin per-query, demonstrated
as the WORKFLOW it exists for — per-increment sketch tables that are
persisted once and merged forever after, so the fact data is never
rescanned:

  1. build      — each ingest increment (here: two halves of orders)
                  reduces to a tiny sketch table: HLL registers at
                  (group, bucket) grain, CMS counters at (row, bucket)
                  grain — both via the audited functions.hex_nibbles
                  uniform hash, both one map-combined aggregate
  2. persist    — sketch tables land in parquet (|groups|·64 and
                  d·w = 128 rows per increment, regardless of scale)
  3. merge      — HLL registers merge by MAX, CMS counters and
                  histogram buckets by SUM — all associative, so
                  merging N increments equals
                  the one-pass build over the union EXACTLY (asserted
                  integer identity, not a tolerance): the property
                  that lets sketches roll up across days, partitions,
                  or clusters without touching the facts again
  4. estimate   — distinct customers per priority from merged
                  registers; point frequencies for a bounded key set
                  from merged counters (one-sided: never under);
                  per-group medians from the merged histogram
                  (deterministic ≤1-bucket-width bound)

The per-query oracle proofs live in the registry (Q-AGG-27/28/29,
hash-checked vs DuckDB); this example proves the MERGE is lossless —
the step a warehouse runs nightly at 100 TB where "rebuild from raw"
stopped being an option.

Run: python examples/sketch_rollups.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from dask_xgboost_spark import get_spark
from dask_xgboost_spark.functions import hex_nibbles
from dask_xgboost_spark.sources import load

M = 64  # HLL registers
W = 56  # HLL rank-domain bits (14 hex nibbles)
D, CW = 4, 32  # CMS rows × counters
BUCKET = f"({hex_nibbles('hx', 1, 2)} % {M})"
WBITS = hex_nibbles("hx", 3, 14)
RANK = f"CASE WHEN w = 0 THEN {W + 1} ELSE {W + 1} - LENGTH(BIN(w)) END"
CMS_BUCKET = f"({hex_nibbles('hx2', 1, 8)} % {CW})"


def hll_registers(df):
    """Orders frame → (o_orderpriority, bucket, reg) register table."""
    return (
        df.withColumn("hx", F.md5(F.col("o_custkey").cast("string")))
        .select(
            "o_orderpriority",
            F.expr(BUCKET).alias("bucket"),
            F.expr(WBITS).alias("w"),
        )
        .groupBy("o_orderpriority", "bucket")
        .agg(F.max(F.expr(RANK)).cast("bigint").alias("reg"))
    )


HW = 2_097_152  # histogram bucket width in cents (Q-AGG-29's width)


def histogram(df):
    """Orders frame → (g, b, cnt) equi-width price histogram."""
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    return (
        df.select(F.col("o_orderpriority").alias("g"), cents.alias("cents"))
        .withColumn("b", F.expr(f"cents DIV {HW}"))
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_counters(df):
    """Orders frame → (r, bucket, c) count-min counter table."""
    kc = df.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    return (
        kc.select(
            "k",
            "cnt",
            F.explode(F.array([F.lit(i) for i in range(D)])).alias("r"),
        )
        .withColumn(
            "hx2",
            F.md5(
                F.concat(
                    F.col("k").cast("string"),
                    F.lit("#"),
                    F.col("r").cast("string"),
                )
            ),
        )
        .select("r", F.expr(CMS_BUCKET).alias("bucket"), "cnt")
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("c"))
    )


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="sketch-rollups", master="local[8]")
    orders = load(spark, sf_dir, "orders")
    base = tempfile.mkdtemp(prefix="dxs_sketch_")

    # 1+2. per-increment build → persist: two ingest increments
    # (even/odd orderkeys stand in for day partitions)
    incs = {
        "inc_a": orders.filter(F.col("o_orderkey") % 2 == 0),
        "inc_b": orders.filter(F.col("o_orderkey") % 2 == 1),
    }
    for name, inc in incs.items():
        hll_registers(inc).write.mode("overwrite").parquet(
            os.path.join(base, f"hll_{name}")
        )
        cms_counters(inc).write.mode("overwrite").parquet(
            os.path.join(base, f"cms_{name}")
        )
        histogram(inc).write.mode("overwrite").parquet(
            os.path.join(base, f"hist_{name}")
        )
    n_reg_rows = spark.read.parquet(os.path.join(base, "hll_inc_a")).count()
    print(f"persisted per-increment sketches: {n_reg_rows} register rows, "
          f"{D * CW} counter cells max — constant-size state per increment")

    # 3. merge WITHOUT touching orders again — and prove losslessness:
    # MAX-merged registers ≡ one-pass registers over the union (exact)
    merged_hll = (
        spark.read.parquet(
            os.path.join(base, "hll_inc_a"), os.path.join(base, "hll_inc_b")
        )
        .groupBy("o_orderpriority", "bucket")
        .agg(F.max("reg").alias("reg"))
    )
    one_pass_hll = hll_registers(orders)
    hll_exact = (
        merged_hll.exceptAll(one_pass_hll).count() == 0
        and one_pass_hll.exceptAll(merged_hll).count() == 0
    )
    print(f"HLL register merge exact: {hll_exact}")
    assert hll_exact

    merged_cms = (
        spark.read.parquet(
            os.path.join(base, "cms_inc_a"), os.path.join(base, "cms_inc_b")
        )
        .groupBy("r", "bucket")
        .agg(F.sum("c").cast("bigint").alias("c"))
    )
    one_pass_cms = cms_counters(orders)
    cms_exact = (
        merged_cms.exceptAll(one_pass_cms).count() == 0
        and one_pass_cms.exceptAll(merged_cms).count() == 0
    )
    print(f"CMS counter merge exact: {cms_exact}")
    assert cms_exact

    merged_hist = (
        spark.read.parquet(
            os.path.join(base, "hist_inc_a"), os.path.join(base, "hist_inc_b")
        )
        .groupBy("g", "b")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    one_pass_hist = histogram(orders)
    hist_exact = (
        merged_hist.exceptAll(one_pass_hist).count() == 0
        and one_pass_hist.exceptAll(merged_hist).count() == 0
    )
    print(f"histogram merge exact: {hist_exact}")
    assert hist_exact

    # median estimate from the MERGED histogram only, vs the exact
    # per-group median from the raw data (error bound: 1 bucket width
    # for the discrete median — Q-AGG-29's deterministic guarantee)
    hist = {}
    for row in merged_hist.collect():
        hist.setdefault(row["g"], {})[row["b"]] = row["cnt"]
    exact_med = {
        r["g"]: r["med"]
        for r in orders.groupBy(F.col("o_orderpriority").alias("g"))
        .agg(
            F.expr(
                "percentile(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
                ", 0.5)"
            ).alias("med")
        )
        .collect()
    }
    for g in sorted(exact_med):
        buckets = hist[g]
        n = sum(buckets.values())
        need, cum = (n + 1) // 2, 0
        for b in sorted(buckets):
            if cum + buckets[b] >= need:
                est = b * HW + (need - cum) * HW // buckets[b]
                break
            cum += buckets[b]
        err = abs(est - exact_med[g])
        print(f"  {g}: merged-histogram median ${est / 100:,.0f} vs exact "
              f"${exact_med[g] / 100:,.0f} (err {err / HW:.2f} buckets)")
        assert err <= 1.5 * HW, (g, est, exact_med[g])

    # 4a. estimate distincts per group from the MERGED registers only
    alpha = 0.7213 / (1 + 1.079 / M)
    regs = {}
    for row in merged_hll.collect():
        regs.setdefault(row["o_orderpriority"], {})[row["bucket"]] = row["reg"]
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    worst = 0.0
    for prio in sorted(exact):
        table = regs.get(prio, {})
        inv = sum(2.0 ** -table.get(b, 0) for b in range(M))
        est = alpha * M * M / inv
        zeros = M - len(table)
        if est <= 2.5 * M and zeros > 0:
            est = M * math.log(M / zeros)
        rel = abs(est - exact[prio]) / exact[prio]
        worst = max(worst, rel)
        print(f"  {prio}: merged-HLL estimate {est:.0f} vs exact "
              f"{exact[prio]} (rel err {rel:.1%})")
    assert worst <= 0.35, worst

    # 4b. point frequencies from MERGED counters (one-sided property)
    counters = {
        (r["r"], r["bucket"]): r["c"] for r in merged_cms.collect()
    }
    kc = {
        r["k"]: r["cnt"]
        for r in orders.groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("k") < 8)
        .collect()
    }
    import hashlib

    one_sided = True
    for k in range(8):
        est = min(
            counters.get(
                (r, int(hashlib.md5(f"{k}#{r}".encode()).hexdigest()[:8], 16) % CW),
                0,
            )
            for r in range(D)
        )
        true = kc.get(k, 0)
        one_sided = one_sided and est >= true
        print(f"  key {k}: merged-CMS estimate {est} >= exact {true}")
    print(f"CMS one-sided after merge: {one_sided}")
    assert one_sided

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
