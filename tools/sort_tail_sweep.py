#!/usr/bin/env python
"""Mechanical sweep of range-sort tails over a captured plan corpus
(VERDICT r14 item 7): find any query where an ORDER BY + LIMIT shape
failed to plan as TakeOrderedAndProject (i.e. pays a full range
Exchange for a top-K), and census the remaining rangepartitioning
tails by shape.

A query is FLAGGED when its plan contains BOTH a
``rangepartitioning`` Exchange AND a global limit node
(GlobalLimit/CollectLimit) — the limit proves a top-K is the declared
result, so §2.4's TakeOrderedAndProject (per-partition heaps, no range
exchange, no sampling pass) is the strictly better plan. Queries with
``TakeOrderedAndProject`` and no rangepartitioning are already optimal;
queries with rangepartitioning and NO limit sort an unbounded grain —
the declared query, not convertible without changing results.

Run: python tools/sort_tail_sweep.py PLAN_DIR
(PLAN_DIR = output of tools/plan_capture.py over the registry.)
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    plan_dir = sys.argv[1]
    flagged, takeordered, range_nolimit, nosort = [], [], [], []
    for fn in sorted(os.listdir(plan_dir)):
        if not fn.endswith(".txt"):
            continue
        name = fn[:-4]
        with open(os.path.join(plan_dir, fn)) as f:
            p = f.read()
        has_range = "rangepartitioning" in p
        has_limit = ("GlobalLimit" in p) or ("CollectLimit" in p)
        has_top = "TakeOrderedAndProject" in p
        if has_range and has_limit:
            flagged.append(name)
        elif has_top:
            takeordered.append(name)
        elif has_range:
            range_nolimit.append(name)
        else:
            nosort.append(name)
    print(f"plans scanned: {len(flagged)+len(takeordered)+len(range_nolimit)+len(nosort)}")
    print(f"FLAGGED (range exchange + limit — TakeOrdered candidates): {len(flagged)}")
    for n in flagged:
        print(f"  {n}")
    print(f"TakeOrderedAndProject already (no range exchange): {len(takeordered)}")
    print(f"range sort, no limit (unbounded grain, declared): {len(range_nolimit)}")
    print(f"no global sort at all: {len(nosort)}")


if __name__ == "__main__":
    main()
