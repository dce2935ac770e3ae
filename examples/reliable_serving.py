#!/usr/bin/env python
"""Reliable-serving tour: the round-6 ingest-to-publish reliability
surface — what keeps a continuously-maintained serving table CORRECT,
not just fast, each step a registered oracle-checked operator:

  1. exactly-once ingest    — foreachBatch + per-batch commit markers;
                              a replayed batch no-ops       (S-SINK-05)
  2. partitioned layout     — streaming sink writes hive day=
                              partitions, readers prune     (S-SINK-06)
  3. drop accounting        — numRowsDroppedByWatermark vs the
                              batch-derived late-window set (S-WM-02)
  4. batch reconciliation   — dropped-late rows drive a recompute of
                              exactly the touched windows (G-BACKFILL-02)
  5. audited publish        — the corrected rollup passes Write-Audit-
                              Publish before going live     (G-AUDIT-01)
  6. session hygiene        — the long-lived session serves a rollup-
                              backed leaderboard, then releases the
                              package's persisted rollups (Q-TPCH-15 +
                              dask_xgboost_spark.release_rollups)

Steps 3→4 are one contract: the watermark makes streaming drops SILENT
by design, the metric makes them OBSERVABLE, and the backfill makes
them CORRECTED — the full loop a 100 TB pipeline runs daily. Step 6 is
the storage half of "long-lived": operators that materialize a
multi-referenced rollup (caching.persist_rollup) cannot unpersist it
themselves — the returned plan still reads the cache — so a serving
session that never releases them accumulates executor memory it no
longer needs. The tracked ledger makes the release exact: only the
package's entries drop, never the consumer's own cached data.

Run: python examples/reliable_serving.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from dask_xgboost_spark import get_spark, release_rollups
from dask_xgboost_spark.registry import load_all


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="reliable-serving")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    # 1. exactly-once ingest: replayed final batch must not inflate
    x = specs["S-SINK-05"].fn(spark, sf_dir).first().asDict()
    print(
        "exactly-once:", x["n_rows"], "rows,", x["n_distinct"], "distinct",
        "(replay absorbed)" if x["n_rows"] == x["n_distinct"] else "(DUPLICATED!)",
    )

    # 2. partitioned streaming sink: day= layout maintained continuously
    sink = specs["S-SINK-06"].fn(spark, sf_dir)
    print("partitioned sink:", sink.count(), "rows across",
          sink.select("day").distinct().count(), "day partitions")

    # 3. watermark drop accounting: silent drops become a metric
    wm = specs["S-WM-02"].fn(spark, sf_dir).first().asDict()
    print("drop accounting:", wm["dropped_updates"],
          "late window-partials dropped,", wm["n_windows"], "windows served")

    # 4. reconciliation: recompute exactly the late-touched windows
    corr = specs["G-BACKFILL-02"].fn(spark, sf_dir).collect()
    print("reconciliation:", len(corr), "windows corrected, total delta",
          sum(r["delta"] for r in corr), "rows restored")

    # 5. audited publish: the bad build must never go live
    log = specs["G-AUDIT-01"].fn(spark, sf_dir).collect()
    for r in log:
        print(
            f"WAP attempt {r['attempt']}: {r['n_rows']} rows, "
            f"{r['n_violations']} violations -> "
            + ("published" if r["published"] else "REJECTED")
            + f" ({r['published_rows_after']} rows live)"
        )

    # 6. session hygiene: the session keeps serving — here a top-
    #    supplier leaderboard whose operator materializes its revenue
    #    view via caching.persist_rollup (the Q-TPCH-15 discipline) —
    #    and after collection releases exactly the package's tracked
    #    cache entries. A user's own persisted frames would survive;
    #    nothing else in this script caches, so the JVM cache manager
    #    must read empty afterwards.
    top = specs["Q-TPCH-15"].fn(spark, sf_dir).collect()
    released = release_rollups()
    cache_empty = bool(
        spark._jsparkSession.sharedState().cacheManager().isEmpty()
    )
    print(
        f"session hygiene: served {len(top)} leaderboard rows, "
        f"{released} rollups released, cache empty: {cache_empty}"
    )
    assert released >= 1, "Q-TPCH-15 should have registered a rollup"
    assert cache_empty, "package rollups must not outlive release_rollups()"

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
