#!/usr/bin/env python
"""Product-analytics tour: the behavioral-analytics surface added in
round 6 — journey transition matrices, clean-path funnels, multi-touch
attribution, growth accounting, RFM segmentation, and activity streaks
— composed on one events/orders fixture, with each operator's
SELF-AUDITING identity checked (the identities follow from the
definitions, so a violation means the implementation — not the data —
is wrong).

Run: python examples/product_analytics.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from dask_xgboost_spark import get_spark
from dask_xgboost_spark.functions import cents
from dask_xgboost_spark.registry import load_all
from dask_xgboost_spark.sources import load


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="product-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    # 1. Journey transition matrix: each source's outgoing transitions
    #    must sum to its n_src (the rows are a partition of the bigrams).
    paths = specs["Q-PATH-01"].fn(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in paths:
        by_src.setdefault(r.src, []).append(r)
    for src, rows in by_src.items():
        assert sum(r.n for r in rows) == rows[0].n_src, src
    top = max(paths, key=lambda r: r.n)
    print(f"transitions: {len(paths)} cells; hottest {top.src}->{top.dst} ({top.n})")

    # 2. Clean-path funnel: monotone by construction.
    for r in specs["Q-FUNNEL-02"].fn(spark, sf_dir).collect():
        assert r.n_signups >= r.n_conv_7d >= r.n_conv_clean >= 0, r
    print("funnel: weekly cohorts monotone (signups >= conv_7d >= clean)")

    # 3. Attribution: every converting-with-touches user has exactly one
    #    first and one last touch, so the two models allocate the same
    #    total; linear micro-credits can only round DOWN from 1e6/user.
    attr = specs["Q-ATTR-01"].fn(spark, sf_dir).collect()
    ft, lt = sum(r.first_touch for r in attr), sum(r.last_touch for r in attr)
    assert ft == lt, (ft, lt)
    assert sum(r.linear_micro for r in attr) <= 1_000_000 * ft
    print(f"attribution: {ft} conversions allocated identically by FT/LT")

    # 4. Growth accounting identities: active(w) = new + retained +
    #    resurrected, and churned(w) = active(w-7) - retained(w).
    ga = {r.wk: r for r in specs["Q-COHORT-02"].fn(spark, sf_dir).collect()}
    active = {
        r.wk: r.n
        for r in (
            load(spark, sf_dir, "events")
            .select("user_id", F.date_trunc("week", "ts").cast("date").alias("wk"))
            .distinct()
            .groupBy("wk")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    for wk, r in ga.items():
        assert active[wk] == r.n_new + r.n_retained + r.n_resurrected, wk
        prev = [p for p in active if (wk - p).days == 7]
        if prev:
            assert r.n_churned == active[prev[0]] - r.n_retained, wk
    print(f"growth accounting: {len(ga)} weeks, both identities hold")

    # 5. RFM: segments partition the customer base and conserve revenue.
    rfm = specs["Q-RFM-01"].fn(spark, sf_dir).collect()
    orders = load(spark, sf_dir, "orders")
    n_cust = orders.select("o_custkey").distinct().count()
    rev = orders.agg(F.sum(cents("o_totalprice")).alias("c")).collect()[0].c
    assert sum(r.n_customers for r in rfm) == n_cust
    assert sum(r.sum_mon_c for r in rfm) == rev
    print(f"rfm: {len(rfm)} segments partition {n_cust} customers, revenue conserved")

    # 6. Streaks: hot-day totals must equal the per-streak lengths' sum.
    for r in specs["Q-WIN-19"].fn(spark, sf_dir).collect():
        assert r.longest <= r.n_hot_days and r.n_streaks >= 1, r
    print("streaks: per-type longest <= total hot days")

    spark.stop()
    print("product-analytics tour: OK")


if __name__ == "__main__":
    main(*sys.argv[1:])
