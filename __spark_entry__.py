"""Driver contract for the spark-graft builder (PySpark target).

Everything is delegated to the ``dask_xgboost_spark`` package: the
registry (dask_xgboost_spark/registry.py) enumerates every declared
operator from SURVEY.md §2 as a (Spark fn, DuckDB oracle SQL) pair.

``queries()`` emits a curated order: the verification harness checks a
prefix window of the registry, so the first 50 entries are one
representative of EVERY operator family (relational scan→window→subquery,
UDF surface, dedup/similarity/text pipeline ops, streaming, ML prep)
rather than the registry's module order, which front-loaded ~50
relational entries and left the other families unwitnessed. The full
registry (320+ entries) follows after the window; repo-local tests
sweep all of it regardless (tests/test_oracle_parity.py for hash-mode,
tests/test_golden_smoke.py rows-only for the rest, and
tests/test_driver_window.py pins this file's window invariants).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dask_xgboost_spark.registry import load_all  # noqa: E402

# Window rotation, round 8, per VERDICT.md r7 §next-round items 1-2:
# the window CLOSES the oracle-backed never-witnessed backlog — all 37
# remaining entries are here (plus L-TEXT-04, the last never-witnessed
# L-TEXT row; golden-mode, so the driver records rows-only for it), plus
# the re-proof of Q-AGG-26 (r7's one red row, now string-projected), the
# driver re-proof of the r7 Q-TPCH-11/17 keyset-prune rewrites, Q-TS-01/
# L-MIX-01 family-coverage re-checks, a rows-only witness for the
# tol-mode persisted-IVF entry (L-SIM-05 — its recall gate runs in the
# local suite), and the six round-8 additions (M-PREP-16 blocked
# negative sampling — M-PREP-14's production path — M-EVAL-11 ranking
# metrics, L-DEDUP-15 first-occurrence segment dedup, L-SIM-13
# embedding decontamination, L-PIPE-06 shard-shuffle writer, and
# L-SIM-14 hash-mode IVF, which takes the slot a rows-only L-SIM-07
# witness would have burned; L-SIM-07 is the first spillover entry).
# 48/50 are hash-mode. Everything is green in the local sweep
# (tests/test_oracle_parity.py) at BOTH sf0.01 and sf0.001.
_DRIVER_PRIORITY = [
    "Q-SCAN-17", "Q-JOIN-17", "Q-SORT-03", "Q-WIN-12",
    "Q-WIN-19", "Q-JSON-05", "Q-JSON-06", "Q-SQL-02",
    "Q-COHORT-02", "Q-PROF-02", "Q-AGG-26", "G-COMPACT-01",
    "G-STATS-02", "G-TTL-01", "G-TXN-01", "L-DEDUP-14",
    "L-SIM-12", "L-PIPE-03", "L-PIPE-04", "L-TEXT-12",
    "L-TEXT-13", "L-TEXT-14", "L-TEXT-15", "L-TEXT-16",
    "L-TEXT-21", "L-TEXT-04", "M-EVAL-07", "M-EVAL-08",
    "M-EVAL-09", "M-EVAL-10", "M-PREP-04", "M-PREP-05",
    "M-PREP-06", "M-PREP-07", "M-PREP-14", "M-PREP-15",
    "S-JOIN-06", "S-STATE-03", "U-SCALAR-04", "Q-TPCH-11",
    "Q-TPCH-17", "Q-TS-01", "L-MIX-01", "L-SIM-05",
    "M-PREP-16", "M-EVAL-11", "L-DEDUP-15",
    "L-SIM-13", "L-PIPE-06", "L-SIM-14",
    # ---- 50-window boundary ----
    # past-the-window spillover in case the driver checks deeper: the
    # remaining never-witnessed golden/tol entries first, then the
    # prior-round re-check pools in their r7 value order.
    "L-SIM-07", "Q-AGG-17", "Q-AGG-19", "U-GAPPLY-02", "L-DEDUP-02",
    "Q-SAMPLE-01", "Q-WIN-16", "Q-GRAPH-03", "Q-TS-06",
    "M-EVAL-05", "M-PREP-11", "G-AUDIT-01", "G-BACKFILL-02",
    "Q-JOIN-15", "L-TEXT-20", "L-MIX-05", "U-TABLE-03",
    "S-SINK-06", "Q-CTE-03", "Q-ARR-08", "Q-SCAN-15",
    "M-PREP-12", "S-JOIN-05", "M-EVAL-06", "L-SIM-11",
    "L-DEDUP-13", "Q-WIN-17", "G-STATS-01", "U-SCALAR-03",
    "Q-SCAN-16", "G-ROLLBACK-01", "Q-QUAL-04", "S-STATE-05",
    "Q-TREND-02", "G-CRYPT-01", "Q-PATH-01", "Q-ATTR-01",
    "Q-RFM-01", "Q-TS-07", "Q-WIN-18", "Q-FUNNEL-02",
    "G-SCHEMA-01", "Q-SUBQ-08", "Q-DATE-09", "M-PREP-13",
    "S-SINK-07", "L-MM-07", "L-MM-08", "Q-SCAN-18",
    "S-STATE-06", "Q-JOIN-16", "U-GAPPLY-04", "Q-QUAL-05",
    "L-PIPE-05", "G-LAKE-01", "Q-JOIN-13", "M-EVAL-03",
    "L-DEDUP-12", "G-MASK-01", "Q-QUAL-03", "M-PREP-09",
    "G-DELETE-02", "S-QUAL-01", "L-SIM-10", "M-EVAL-04",
    "Q-GEO-05", "Q-AGG-24", "Q-WIN-15", "Q-DATE-08",
    "G-SNAP-02", "Q-JOIN-14", "Q-GEO-06", "Q-TS-05",
    "L-MM-06", "M-PREP-10", "Q-AGG-25", "S-WIN-05",
    "Q-SUBQ-07", "G-CLONE-01", "S-SINK-05", "S-WM-01",
    "S-WM-02", "Q-TPCH-05", "Q-TPCH-07", "G-BACKFILL-01",
    "L-MM-04", "G-OBS-01", "Q-SCAN-12", "U-GAPPLY-03",
    "G-SNAP-01", "Q-WIN-13", "L-TEXT-17", "L-TEXT-18",
    "Q-SCAN-13", "U-TABLE-02", "L-SIM-08", "L-SIM-09",
    "S-JOIN-04", "S-SINK-03", "L-DEDUP-09", "L-DEDUP-10",
    "L-SIM-06", "L-MIX-02", "L-MIX-03", "L-MM-02",
    "Q-WIN-08", "Q-SCAN-08", "Q-SCAN-09", "Q-SQL-01",
    "Q-GEO-01", "Q-GEO-02", "Q-GEO-03", "Q-GEO-04",
    "Q-SCD-02", "L-TEXT-19", "Q-PIVOT-03", "Q-TS-03",
    "Q-TS-04", "M-PREP-08", "L-MM-05", "Q-WIN-14",
    "L-DEDUP-11", "G-DELETE-01", "G-CDF-01", "L-MIX-04",
    "Q-JSON-04", "M-EVAL-01", "M-EVAL-02", "Q-SCAN-14",
    "Q-SUBQ-06", "Q-AGG-23", "Q-QUAL-02", "Q-DIFF-01",
    "Q-AGG-22", "Q-JOIN-12", "Q-TPCH-16", "Q-TPCH-18",
    "Q-TPCH-19", "Q-TPCH-20", "Q-TPCH-22", "Q-STR-06",
    "Q-STR-07", "Q-STR-08", "Q-DATE-07", "Q-ARR-07",
    "Q-MATH-02", "Q-SAMPLE-02", "Q-SUBQ-05", "Q-MERGE-02",
    "U-WIN-01", "U-MAP-02", "S-WIN-04", "S-SINK-04",
    "S-GEN-02", "Q-SCAN-05", "Q-JOIN-11", "Q-DATE-05",
    "Q-DATE-06", "Q-JSON-02", "Q-WIN-09", "Q-SCAN-06",
    "Q-SCAN-07", "Q-SCAN-10", "Q-AGG-18", "Q-AGG-20",
    "Q-AGG-21", "Q-TPCH-08", "Q-TPCH-09", "Q-TPCH-15",
    "Q-SCD-01", "Q-FUNNEL-01", "Q-COHORT-01", "Q-BASKET-01",
    "Q-PROF-01", "Q-QUAL-01", "Q-TREND-01", "Q-GRAPH-01",
    "Q-WIN-10", "Q-WIN-11", "Q-SUBQ-04", "Q-CTE-02",
    "L-DEDUP-08", "L-TEXT-11", "Q-TS-02", "Q-GRAPH-02",
    "G-MV-01", "Q-SCAN-11", "Q-JSON-03", "M-PRED-04",
    "M-PREP-03", "S-WIN-02", "S-WIN-03", "S-STATE-02",
    "S-JOIN-01", "S-JOIN-02", "S-SINK-01", "S-GEN-01",
    "S-STATE-04", "S-JOIN-03", "G-GEN-01", "M-PREP-01",
    "M-TRAIN-02", "M-TRAIN-03", "M-TRAIN-04", "M-TRAIN-05",
    "M-TRAIN-06", "M-TRAIN-07", "M-PRED-02", "M-PRED-03",
]


def _ordered_specs():
    specs = load_all()
    missing = [n for n in _DRIVER_PRIORITY if n not in specs]
    assert not missing, f"priority entries not in registry: {missing}"
    ordered = {n: specs[n] for n in _DRIVER_PRIORITY}
    ordered.update((n, s) for n, s in specs.items() if n not in ordered)
    return ordered


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    specs = load_all()
    return specs["Q-AGG-01"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in _ordered_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every hash-checkable query."""
    return {
        name: spec.sql
        for name, spec in _ordered_specs().items()
        if spec.sql is not None
    }
