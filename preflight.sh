#!/usr/bin/env bash
# Pre-hand-in gate (VERDICT.md r3 §next-round #3): run this immediately
# before each round ends so environment drift — regenerated fixtures,
# schema changes, dependency bumps — can never ship silently again.
#
#   ./preflight.sh          # full: pytest sweep + bench smoke (~7 min)
#   ./preflight.sh quick    # bench smoke only (~1 min)
#
# Exits non-zero on the first failure. The r3 incident this guards
# against: fixtures regenerated mid-round flipped events.ts from
# TIMESTAMP(NANOS) to timestamp[us], and nothing re-ran before hand-in.
set -euo pipefail
cd "$(dirname "$0")"

if [[ "${1:-}" != "quick" ]]; then
    echo "== preflight: pytest sweep =="
    python -m pytest tests/ -x -q
fi

echo "== preflight: bench smoke (headline queries + entry) =="
SPARK_GRAFT_BENCH_SMOKE=1 python bench.py

echo "== preflight: OK $(date -u +%Y-%m-%dT%H:%M:%SZ) =="
