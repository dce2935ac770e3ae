#!/usr/bin/env python
"""Physical-plan A/B for M-PREP-09's giant-class claim: stratified
k-fold assignment via an UNFILTERED full rank (plain window) vs the
manually pre-salted two-stage rank, measured fresh-session on shared
100× events replicas — UNIFORM (the fixture's ~5-label distribution,
where every class is already giant) and SKEWED (one label holding a
configurable share of all rows). The r13 Q-WIN-14 experiment's
methodology applied to the one remaining asserted-not-measured salting
claim (VERDICT r13 item 5).

The claim under test (ml/queries.py::m_prep_09 docstring): Q-WIN-14's
salting was refuted because Spark ≥ 3.5 plants WindowGroupLimit(Partial)
below the exchange for rank-FILTERED windows — but a stratified fold
assignment consumes EVERY row's rank (fold = (rank-1) % k, no filter),
so no group-limit pushdown exists, the giant class serializes through
one task, and manual salting should still apply. Two parts:

  plan fact — neither plan's executed plan may contain WindowGroupLimit
  (asserted in `check`; if Spark ever grows an unfiltered-rank
  optimization this A/B is the tripwire that re-opens the question);

  wall/shuffle — does pre-salting (k_salt× more, smaller window
  partitions; same shuffle volume, one extra narrow column) actually
  beat the plain plan on a multi-core box, and what does the ±salts
  per-cell imbalance buy?

Semantics note (unlike the Q-WIN-14 A/B, the two plans here are NOT
output-identical by design): plain deals each label's rows round-robin
by global-in-label rank → per-(label, fold) cell sizes within max−min
≤ 1; salted deals within each (label, salt) independently → cells
within ≤ 2·SALT of each other (each salt contributes ⌈n_s/k⌉ or
⌊n_s/k⌋). `check` asserts BOTH invariants plus identical per-label
totals — the documented trade the docstring sells.

Usage:
  python tools/ab_mprep09.py build [sf_dir] [rep] [hot_pct]
      Build the two replicas; prints UNIFORM=<dir> SKEWED=<dir>.
      hot_pct = % of events rows relabeled to 'view' (default 90).
  python tools/ab_mprep09.py run <events_dir> <salted|plain> [runs]
      Median fresh-plan wall over `runs` full re-executions (default 3)
      plus shuffle rows/bytes — run each (dir, plan) in its OWN process
      for the fresh-JVM pin methodology (BASELINE.md §5, r10/r11).
  python tools/ab_mprep09.py check <events_dir>
      Assert balance invariants, per-label totals, and the no-pushdown
      plan fact on that replica.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time  # noqa: F401 — kept for parity with sibling A/B tools

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dask_xgboost_spark.session import get_spark  # noqa: E402
from dask_xgboost_spark.sources import load  # noqa: E402

KEY_SHIFT = 10_000_000  # same id-shift discipline as tools/suite_scale.py
SALT = 8  # mirror of Q-WIN-14's declared salt count for comparability
K = 5  # folds, as registered


def _events(spark, path: str):
    ev = spark.read.parquet(os.path.join(path, "events.parquet"))
    return ev.select("event_type", "event_id")


def plan_plain(ev):
    """The registered M-PREP-09 shape: one unfiltered full rank per
    label — exact round-robin, max−min ≤ 1 per (label, fold) cell, and
    the whole giant class through ONE window task."""
    w = Window.partitionBy("event_type").orderBy("event_id")
    f = ev.select(
        "event_type", ((F.row_number().over(w) - 1) % K).alias("fold")
    )
    return (
        f.groupBy("event_type", "fold")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("event_type", "fold")
    )


def plan_salted(ev):
    """The docstring's prescribed giant-class variant: pre-salt the
    partition key so each label fans out over SALT window tasks; each
    (label, salt) deals round-robin independently — cells balanced
    within ≤ 2·SALT instead of ≤ 1."""
    s = ev.withColumn("salt", F.col("event_id") % SALT)
    w = Window.partitionBy("event_type", "salt").orderBy("event_id")
    f = s.select(
        "event_type", ((F.row_number().over(w) - 1) % K).alias("fold")
    )
    return (
        f.groupBy("event_type", "fold")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("event_type", "fold")
    )


PLANS = {"salted": plan_salted, "plain": plan_plain}


def build(sf_dir: str, rep: int, hot_pct: int) -> None:
    spark = get_spark(app_name="ab-mprep09-build", driver_mem_default="32g")
    base = tempfile.mkdtemp(prefix=f"dxs_ab_mprep09_{rep}x_")
    reps = spark.range(rep).select(F.col("id").alias("r"))
    events = (
        load(spark, sf_dir, "events")
        .select("event_type", "event_id")
        .crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("r") * KEY_SHIFT)
        .drop("r")
    )
    uni = os.path.join(base, "uniform")
    skw = os.path.join(base, "skewed")
    os.makedirs(uni)
    os.makedirs(skw)
    events.repartition(32).write.parquet(os.path.join(uni, "events.parquet"))
    # deterministic giant class: hot_pct% of rows (by event_id residue)
    # relabeled 'view' — the "one dominant label" shape that makes a
    # single unfiltered-rank window partition the whole job's tail
    skewed = events.withColumn(
        "event_type",
        F.when(
            F.col("event_id") % 100 < hot_pct, F.lit("view")
        ).otherwise(F.col("event_type")),
    )
    skewed.repartition(32).write.parquet(os.path.join(skw, "events.parquet"))
    print(f"UNIFORM={uni}")
    print(f"SKEWED={skw}")


def run(events_dir: str, plan_name: str, runs: int) -> None:
    spark = get_spark(app_name="ab-mprep09-run", driver_mem_default="32g")
    import bench  # repo-root module; _timed_full/_shuffle_metrics helpers

    df = PLANS[plan_name](_events(spark, events_dir))
    n = df.count()
    wall = bench._timed_full(df, runs=runs)
    sh = bench._shuffle_metrics(spark, df, f"ab_mprep09_{plan_name}")
    print(
        f"AB_MPREP09 plan={plan_name} dir={events_dir} rows={n} "
        f"median_wall={wall:.3f}s shuffle_rows={sh['rows']} "
        f"shuffle_bytes={sh['bytes']}"
    )


def check(events_dir: str) -> None:
    spark = get_spark(app_name="ab-mprep09-check", driver_mem_default="32g")
    ev = _events(spark, events_dir)
    # plan fact: NEITHER form has a rank filter, so neither may get the
    # WindowGroupLimit pushdown that refuted Q-WIN-14's salting — this
    # is the docstring's premise, pinned against engine upgrades
    for name, fn in PLANS.items():
        df = fn(ev)
        df.collect()  # AQE: final plan exists only after execution
        p = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" not in p, (name, p)
    # bounded: balance tables are |labels| × K rows
    plain = {
        (r["event_type"], r["fold"]): r["n"] for r in plan_plain(ev).collect()
    }
    salted = {
        (r["event_type"], r["fold"]): r["n"]
        for r in plan_salted(ev).collect()
    }
    assert set(plain) == set(salted)
    labels = sorted({k[0] for k in plain})
    for lab in labels:
        pc = [plain[(lab, f)] for f in range(K)]
        sc = [salted[(lab, f)] for f in range(K)]
        assert sum(pc) == sum(sc), (lab, sum(pc), sum(sc))
        assert max(pc) - min(pc) <= 1, (lab, pc)
        assert max(sc) - min(sc) <= 2 * SALT, (lab, sc)
    print(
        f"OK labels={len(labels)} plan_fact=no-WindowGroupLimit "
        f"plain_dev<=1 salted_dev<=2*SALT totals_equal"
    )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    if mode == "build":
        build(
            sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1",
            int(sys.argv[3]) if len(sys.argv) > 3 else 100,
            int(sys.argv[4]) if len(sys.argv) > 4 else 90,
        )
    elif mode == "run" and len(sys.argv) > 3 and sys.argv[3] in PLANS:
        run(sys.argv[2], sys.argv[3], int(sys.argv[4]) if len(sys.argv) > 4 else 3)
    elif mode == "check" and len(sys.argv) > 2:
        check(sys.argv[2])
    else:
        raise SystemExit(__doc__)
