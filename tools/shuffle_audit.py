#!/usr/bin/env python
"""Registry-wide shuffle-volume audit: run every batch operator once
under a job group and record shuffle-WRITE rows/bytes + output rows +
wall — the same noise-immune plan metric the bench carries for the
headline/TPC-H tiers, swept across the whole registry.

The reading this tool exists for: an operator whose shuffled rows
greatly exceed its OUTPUT grain is aggregating (or joining) at a grain
its own filters contradict — exactly how the bench metric exposed the
r7 TPC-H Q2/Q11/Q17 keyset-prune wins (49.7k→2.0k, 40.4k→20.4k,
20.0k→0.1k). Output-grain shuffles (Q18's orderkey rollup) are the
query; pre-filter-grain shuffles are a plan bug.

Excluded: streaming specs (micro-batch checkpoints, no comparable
one-shot read) and golden ML trains (minutes-long, shuffle is MLlib
internal). Caches are cleared per entry so persist()-backed operators
charge the shuffle that FEEDS the cache (bench discipline).

Run: python tools/shuffle_audit.py [sf_dir] [top_n]
Prints entries descending by shuffled rows; `-` rows failed (printed
last with the error).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from bench import _shuffle_metrics
from dask_xgboost_spark.registry import load_all
from dask_xgboost_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    spark = get_spark(app_name="shuffle-audit")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    rows: list[tuple[str, int, int, int, float]] = []
    errors: list[tuple[str, str]] = []
    for name, spec in specs.items():
        if spec.mode in ("stream",) or name.startswith(("M-TRAIN", "M-PRED")):
            continue
        try:
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            out_rows = df.count()
            spark.catalog.clearCache()  # charge cache-feeding shuffles
            m = _shuffle_metrics(spark, df, f"audit_{name}")
            rows.append(
                (name, m["rows"], m["bytes"], out_rows, time.time() - t0)
            )
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            errors.append((name, repr(e)[:160]))
        finally:
            spark.catalog.clearCache()
    rows.sort(key=lambda r: -r[1])
    print(f"\n== shuffle audit @ {sf_dir} — top {top_n} by shuffled rows ==")
    print(f"{'entry':18} {'shuf_rows':>10} {'shuf_MB':>8} {'out_rows':>9} {'ratio':>7} {'wall_s':>7}")
    for name, sr, sb, outr, wall in rows[:top_n]:
        ratio = f"{sr / outr:.1f}" if outr else "inf"
        print(f"{name:18} {sr:>10} {sb / 1e6:>8.2f} {outr:>9} {ratio:>7} {wall:>7.1f}")
    zero = sum(1 for r in rows if r[1] == 0)
    print(f"\n{len(rows)} audited, {zero} shuffle-free (map-only), {len(errors)} errors")
    for name, err in errors:
        print("ERR:", name, err)
    spark.stop()


if __name__ == "__main__":
    main()
