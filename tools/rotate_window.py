#!/usr/bin/env python
"""Compute the recommended next driver window (evidence-freshness
rotation, VERDICT r8 item 1, institutionalized r9).

The correctness driver hash-checks the first 50 entries of
``__spark_entry__.queries()`` each round. This tool reads every
``CORRECTNESS_r*.json``, computes each entry's latest driver witness,
and emits a 50-slot window that (a) re-proves the STALEST evidence
first, where a NEVER-witnessed entry ranks just after the single
stalest witnessed cohort (lifetime coverage outranks bulk staleness;
intake capped by the non-hash budget since all never-witnessed are
golden/tol), (b) satisfies the family-coverage invariant
(tests/test_driver_window.py: all 14 top-level families must appear),
and (c) keeps >= 40 hash-mode entries (same test file). The spillover
(everything else, never-witnessed-first then oldest-first) follows so
a deeper-than-50 driver check still drains staleness.

Output is the python-literal list body to paste into
``__spark_entry__._DRIVER_PRIORITY`` plus a constraint report.
Run: python tools/rotate_window.py [window_size]
"""

from __future__ import annotations

import glob
import json
import os
import sys

# anchor to the repo root (parent of tools/), NOT the cwd: run from
# anywhere else, a cwd-relative glob silently finds zero witness files
# and emits a plausible-looking but staleness-meaningless window
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

REQUIRED_FAMILIES = (
    "Q-SCAN", "Q-AGG", "Q-WIN", "Q-TS", "Q-TPCH",
    "L-DEDUP", "L-MIX", "L-TEXT", "L-SIM", "L-PIPE",
    "S", "M", "G", "U",
)
MIN_HASH_MODE = 40


def family(name: str) -> str:
    parts = name.split("-")
    if name.startswith(("S-", "M-", "U-", "G-")):
        return parts[0]
    return "-".join(parts[:2])


def latest_witness() -> dict[str, int]:
    latest: dict[str, int] = {}
    files = sorted(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")))
    if not files:
        raise SystemExit(
            f"no CORRECTNESS_r*.json found under {_REPO_ROOT} — "
            "staleness cannot be computed; refusing to emit a window"
        )
    for f in files:
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        for k in json.load(open(f)):
            latest[k] = max(latest.get(k, 0), rnd)
    return latest


def propose(window_size: int = 50) -> tuple[list[str], list[str], dict]:
    from dask_xgboost_spark.registry import load_all

    specs = load_all()
    latest = latest_witness()
    never = [n for n in specs if n not in latest]
    min_round = min(latest.values())

    def is_hash(n: str) -> bool:
        return specs[n].sql is not None

    # Lifetime coverage outranks bulk staleness: a never-witnessed
    # entry (no driver row EVER) ranks just AFTER the single stalest
    # witnessed cohort — that cohort is the previous rotation's
    # unfinished promise — and ahead of everything else. Non-hash
    # (golden/tol) never-witnessed intake is capped by the hash-mode
    # quota's non-hash budget (window_size - MIN_HASH_MODE), enforced
    # in the fill below rather than repaired after the fact; a
    # HASH-mode entry that is merely new (added after the last driver
    # round, e.g. Q-AGG-27/28 in r10) enters freely — it strengthens
    # the quota rather than spending it.
    def rank(n: str) -> float:
        return latest.get(n, min_round + 0.5)

    pool = sorted(specs, key=lambda n: (rank(n), n))
    non_hash_budget = window_size - MIN_HASH_MODE

    window: list[str] = []
    covered: set[str] = set()
    non_hash_used = 0

    def room() -> int:
        # slots that MUST stay free for still-uncovered families
        return window_size - len(window) - sum(
            1 for f in REQUIRED_FAMILIES if f not in covered
        )

    # pass 1: global staleness order (never-witnessed = stalest-cohort
    # + 0.5), leaving room for family fillers and skipping non-hash
    # entries once the quota's non-hash budget is spent
    for n in pool:
        if len(window) >= window_size:
            break
        if not is_hash(n) and non_hash_used >= non_hash_budget:
            continue
        f = family(n)
        if (f in REQUIRED_FAMILIES and f not in covered) or room() > 0:
            window.append(n)
            covered.add(f)
            if not is_hash(n):
                non_hash_used += 1
    # pass 2: uncovered families — prefer a NEVER-witnessed entry that
    # carries the family (converts backlog), else the family's stalest;
    # budget-respecting candidates first, any candidate as a last
    # resort (family coverage is the harder invariant)
    for f in REQUIRED_FAMILIES:
        if f in covered or len(window) >= window_size:
            continue
        fam_pool = sorted(
            (n for n in never if family(n) == f and n not in window)
        ) + [n for n in pool
             if n in latest and family(n) == f and n not in window]
        cand = [n for n in fam_pool
                if is_hash(n) or non_hash_used < non_hash_budget] or fam_pool
        if cand:
            window.append(cand[0])
            covered.add(f)
            if not is_hash(cand[0]):
                non_hash_used += 1
    # pass 3: leftover slots -> next in global staleness order
    for n in pool:
        if len(window) >= window_size:
            break
        if n not in window and (is_hash(n)
                                or non_hash_used < non_hash_budget):
            window.append(n)
            if not is_hash(n):
                non_hash_used += 1

    # hash-mode quota backstop: the budgeted fill above keeps the quota
    # by construction except when pass 2's last-resort family carrier
    # overspends — swap golden/tol non-family-carriers for the
    # next-stalest hash entries until >= MIN_HASH_MODE
    n_hash = sum(1 for n in window if is_hash(n))
    if n_hash < MIN_HASH_MODE:
        spare_hash = [n for n in pool if n not in window and is_hash(n)]
        for i in range(len(window) - 1, -1, -1):
            if n_hash >= MIN_HASH_MODE or not spare_hash:
                break
            n = window[i]
            fam_needed = sum(1 for m in window if family(m) == family(n)) == 1
            if not is_hash(n) and not fam_needed:
                window[i] = spare_hash.pop(0)
                n_hash += 1

    spill_never = [n for n in sorted(never) if n not in window]
    spill_stale = [n for n in pool if n in latest and n not in window]
    spillover = spill_never + spill_stale
    report = {
        "window": len(window),
        "hash_mode": sum(1 for n in window if is_hash(n)),
        "families": sorted({family(n) for n in window
                            if family(n) in REQUIRED_FAMILIES}),
        "never_witnessed_in_window":
            [n for n in window if n not in latest],
        "oldest_round_in_window":
            min((latest[n] for n in window if n in latest), default=None),
        "stalest_left_out":
            [(n, latest[n]) for n in spill_stale[:5]],
    }
    return window, spillover, report


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    window, spillover, report = propose(size)
    missing = [f for f in REQUIRED_FAMILIES
               if f not in report["families"]]
    print(json.dumps(report, indent=2))
    if missing:
        print(f"FAMILIES UNSATISFIABLE: {missing}", file=sys.stderr)
        sys.exit(1)
    if report["hash_mode"] < MIN_HASH_MODE:
        print(f"HASH QUOTA UNMET: {report['hash_mode']}", file=sys.stderr)
        sys.exit(1)

    def fmt(names, per=4):
        return "\n".join(
            "    " + " ".join(f'"{n}",' for n in names[i:i + per])
            for i in range(0, len(names), per)
        )

    print("\n# ---- window ----")
    print(fmt(window))
    print("    # ---- %d-window boundary ----" % size)
    print(fmt(spillover))


if __name__ == "__main__":
    main()
