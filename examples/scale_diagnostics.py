#!/usr/bin/env python
"""Scale-diagnostics tour: the measure-then-decide loop that keeps a
100 TB shuffle safe. Salting every join "just in case" doubles its
cost; salting none melts a reducer on the first power-law key. The
engine's answer is a cheap PROFILE of the key before the shuffle, a
remedy applied only where the profile says so, and a proof that the
remedy changed the plan, not the answer:

  1. key-skew profile       — top-k heavy hitters + a simulated
                              hash-partition histogram, one key-grain
                              aggregate (Q-PROF-02 / profile_key_skew)
  2. the salting decision   — the same profiler on a pathological key
                              (event_type: 5 values own everything) and
                              a healthy one (user_id), and the
                              threshold that separates them
  3. output invariance      — the salted join (Q-JOIN-15) returns the
                              identical aggregate to the unsalted form;
                              the transform is pure plan, zero answer
  4. banded interval join   — Q-JOIN-17 turns a point-in-range join
                              into an equi-join on (key, day-bucket)
                              with bounded fan-out; measured here
                              against the per-key pairing the naive
                              inequality form would materialize

Run: python examples/scale_diagnostics.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from dask_xgboost_spark import get_spark
from dask_xgboost_spark.operators.analytics import profile_key_skew
from dask_xgboost_spark.registry import load_all
from dask_xgboost_spark.sources import load

# a single key hashing cannot split owns one reducer entirely; once it
# carries > 3x a reducer's even share (1000/32 permille here) that
# reducer is the stage's critical path — salt (or let AQE split) it.
# Keyed on the heaviest-KEY share, not the bucket histogram: the
# histogram needs key cardinality >> bucket count to mean anything
# (at toy SF a 15-user fixture leaves most of 32 buckets empty), while
# the share rule reads the same at every scale.
REDUCERS = 32
SKEW_SHARE_PM = 3 * 1000 // REDUCERS


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="scale-diagnostics")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    ev = load(spark, sf_dir, "events")

    # 1-2. profile both candidate join keys with the SAME cheap pass
    #      (one key-grain aggregate each — nothing bigger than the key
    #      cardinality ever shuffles)
    verdicts = {}
    for key in ("event_type", "user_id"):
        prof = profile_key_skew(ev, key, num_buckets=REDUCERS).collect()
        top = prof[0]
        verdicts[key] = top["share_pm"] > SKEW_SHARE_PM
        print(
            f"profile[{key}]: {len(prof)} top keys, heaviest "
            f"{top[key]!r} owns {top['share_pm']} permille of rows "
            f"(critical-path line: {SKEW_SHARE_PM}); fullest of "
            f"{REDUCERS} simulated buckets runs {top['bucket_skew_pm']} "
            "permille of even share -> "
            + ("SALT (or AQE-split) before joining" if verdicts[key]
               else "plain hash shuffle is safe")
        )
    # event_type concentrates everything on 5 keys — pathological by
    # construction; user_id is the healthy high-cardinality key
    assert verdicts["event_type"] and not verdicts["user_id"], verdicts

    # 3. the remedy, and its proof of output invariance: Q-JOIN-15
    #    spreads each hot key across 8 salted reducers; the unsalted
    #    aggregate computed directly must match row-for-row
    salted = sorted(
        (r["event_type"], r["n"], r["weighted_c"])
        for r in specs["Q-JOIN-15"].fn(spark, sf_dir).collect()
    )
    plain = sorted(
        (r["event_type"], r["n"], r["weighted_c"])
        for r in (
            ev.select(
                "event_type",
                F.floor(F.col("value") * 100 + F.lit(0.5))
                .cast("long")
                .alias("v_c"),
            )
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.col("v_c") * F.length("event_type"))
                .cast("bigint")
                .alias("weighted_c"),
            )
            .collect()
        )
    )
    assert salted == plain, "salting must never change the answer"
    print(
        f"salted join: {len(salted)} groups identical to the unsalted "
        "form — the transform is pure plan"
    )

    # 4. the OTHER shuffle pathology: an inequality join has no hash
    #    key at all, so engines fall back to per-key pairing. Q-JOIN-17
    #    bands the 7-day interval into day buckets and equi-joins on
    #    (user_id, day). Measure what each side would materialize:
    s = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    banded_probe_rows = s.withColumn(
        "day",
        F.explode(
            F.sequence(
                F.to_date("ts"),
                F.to_date(F.col("ts") + F.expr("INTERVAL 7 DAY")),
            )
        ),
    ).count()
    pairing_rows = s.join(p, "user_id").count()
    print(
        f"banded interval join: {banded_probe_rows} probe rows "
        f"(signups x <=8 day buckets) vs {pairing_rows} per-user "
        "pairings the naive inequality form materializes"
    )

    # correctness of the banding: identical to the textbook inequality
    # join computed directly on the fixture
    banded = sorted(
        (r["event_id"], r["n_purch"], r["val_sum_c"])
        for r in specs["Q-JOIN-17"].fn(spark, sf_dir).collect()
    )
    p_val = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("pts"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("val_c"),
    )
    naive = sorted(
        (r["event_id"], r["n_purch"], r["val_sum_c"])
        for r in (
            s.join(
                p_val,
                (s["user_id"] == p_val["user_id"])
                & (F.col("pts") >= F.col("ts"))
                & (F.col("pts") < F.col("ts") + F.expr("INTERVAL 7 DAY")),
                "left",
            )
            .groupBy("event_id")
            .agg(
                F.count("pts").cast("long").alias("n_purch"),
                F.coalesce(F.sum("val_c"), F.lit(0))
                .cast("long")
                .alias("val_sum_c"),
            )
            .collect()
        )
    )
    assert banded == naive, "banding must never change the answer"
    print(
        f"banded interval join: {len(banded)} signup windows identical "
        "to the inequality form — bounded fan-out, same rows"
    )

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
