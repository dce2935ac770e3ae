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

# Window rotation, round 15 (the optimization round's evidence
# discipline: a driver hash row through every plan that actually ships
# now). Slots 1-11: the round's deep rewrites — Q-TPCH-02 (one fact
# pass), Q-TPCH-04 (one body + derived scan bound), Q-TPCH-05/08
# (dims-first + refusal pin), Q-TPCH-07 (96 B gate bound), Q-TPCH-10/13
# (aggregate below the join), Q-TPCH-12 (narrow bool), Q-TPCH-16
# (bounded_sort on the attribute domain), Q-JOIN-02/08 (dims-first
# shared body). Slots 12-20: bounded_sort conversion representatives
# covering each touched family (stalest witness first). Slots 21-24:
# family fillers L-DEDUP-13 / L-SIM-11 / S-JOIN-05 / U-GAPPLY-04
# (stalest hash-mode entries of the four families the touched set
# cannot carry). Remaining slots: the stalest of the other 54
# bounded_sort conversions (r7-witnessed first). 49/50 hash-mode
# (Q-AGG-08 is tol — within the non-hash budget); all 14 families
# present. Spillover: the 19 touched-but-evicted conversions first
# (a deeper-than-50 driver check still re-proves every touched plan),
# then the prior order oldest-first.
_DRIVER_PRIORITY = [
    "Q-TPCH-02", "Q-TPCH-04", "Q-TPCH-05", "Q-TPCH-07",
    "Q-TPCH-08", "Q-TPCH-10", "Q-TPCH-12", "Q-TPCH-13",
    "Q-TPCH-16", "Q-JOIN-02", "Q-JOIN-08", "Q-SCAN-05",
    "Q-AGG-02", "Q-WIN-17", "Q-TS-04", "L-MIX-03",
    "L-TEXT-14", "L-PIPE-01", "M-PREP-12", "G-DELETE-01",
    "L-DEDUP-13", "L-SIM-11", "S-JOIN-05", "U-GAPPLY-04",
    "M-PREP-13", "Q-ATTR-01", "Q-CTE-03", "Q-DATE-09",
    "Q-FUNNEL-02", "Q-GRAPH-03", "Q-JOIN-15", "Q-RFM-01",
    "L-TEXT-16", "M-EVAL-09", "M-EVAL-11", "Q-SQL-02",
    "Q-AGG-04", "Q-AGG-06", "Q-AGG-07", "Q-AGG-08",
    "Q-AGG-09", "Q-AGG-10", "Q-FIL-02", "Q-SET-02",
    "Q-SET-03", "Q-SET-04", "M-PREP-02", "Q-AGG-05",
    "Q-JSON-01", "Q-SET-01",
    # ---- 50-window boundary ----
    "Q-AGG-16", "Q-AGG-20", "Q-AGG-21", "Q-SCAN-07",
    "Q-SCAN-08", "Q-SCAN-09", "Q-JOIN-11", "Q-JOIN-13",
    "Q-JOIN-14", "Q-SAMPLE-02", "Q-SQL-01", "Q-STR-08",
    "Q-COHORT-01", "G-BACKFILL-01", "G-MASK-01", "G-OBS-01",
    "L-TEXT-03", "L-MIX-01", "M-EVAL-04", "Q-GEO-04",
    "G-CLONE-01", "G-DELETE-02", "G-SNAP-01", "G-SNAP-02",
    "L-DEDUP-09", "L-DEDUP-10", "L-DEDUP-12", "L-MM-02",
    "L-MM-04", "L-MM-06", "L-SIM-08", "L-SIM-09",
    "L-SIM-10", "L-TEXT-17", "L-TEXT-18", "M-EVAL-03",
    "M-PREP-09", "M-PREP-10", "Q-AGG-24", "Q-AGG-25",
    "Q-DATE-08", "Q-GEO-05", "Q-GEO-06", "Q-QUAL-03",
    "Q-SCAN-12", "Q-SCAN-13", "Q-SUBQ-07", "Q-WIN-13",
    "Q-WIN-14", "S-JOIN-04", "S-QUAL-01", "S-SINK-03",
    "S-SINK-05", "S-WIN-05", "S-WM-01", "S-WM-02",
    "U-GAPPLY-03", "U-TABLE-02", "G-AUDIT-01", "Q-TS-07",
    "L-PIPE-06", "L-MIX-04", "Q-WIN-15", "G-BACKFILL-02",
    "G-CRYPT-01", "G-LAKE-01", "G-ROLLBACK-01", "G-SCHEMA-01",
    "G-STATS-01", "L-MM-07", "L-MM-08", "L-TEXT-20",
    "M-EVAL-05", "M-EVAL-06", "M-PREP-11", "Q-ARR-08",
    "Q-JOIN-16", "Q-PATH-01", "Q-QUAL-04", "Q-QUAL-05",
    "Q-SCAN-15", "Q-SCAN-16", "Q-SCAN-18", "Q-SUBQ-08",
    "Q-TREND-02", "Q-WIN-16", "Q-WIN-18", "S-SINK-06",
    "S-SINK-07", "S-STATE-05", "S-STATE-06", "U-SCALAR-03",
    "U-TABLE-03", "G-COMPACT-01", "G-STATS-02", "G-TTL-01",
    "G-TXN-01", "L-DEDUP-14", "L-DEDUP-15", "L-SIM-05",
    "L-SIM-12", "L-SIM-13", "L-SIM-14", "L-TEXT-12",
    "L-TEXT-13", "L-TEXT-15", "L-TEXT-21", "M-EVAL-07",
    "M-EVAL-08", "M-EVAL-10", "M-PREP-04", "M-PREP-05",
    "M-PREP-06", "M-PREP-07", "M-PREP-14", "M-PREP-15",
    "M-PREP-16", "Q-AGG-26", "Q-COHORT-02", "Q-JOIN-17",
    "Q-JSON-05", "Q-JSON-06", "Q-PROF-02", "Q-SCAN-17",
    "Q-SORT-03", "Q-TPCH-11", "Q-TPCH-17", "Q-TS-01",
    "Q-WIN-12", "Q-WIN-19", "S-JOIN-06", "S-STATE-03",
    "U-SCALAR-04", "G-GEN-01", "L-DEDUP-01", "L-SIM-07",
    "L-TEXT-01", "Q-AGG-03", "Q-AGG-11", "Q-DATE-01",
    "Q-DATE-02", "Q-FIL-03", "Q-FIL-04", "Q-JOIN-01",
    "Q-JOIN-03", "Q-JOIN-04", "Q-JOIN-05", "Q-JOIN-06",
    "Q-JOIN-07", "Q-JOIN-09", "Q-PROJ-01", "Q-SCAN-01",
    "Q-SCAN-03", "Q-SCAN-04", "Q-SORT-01", "Q-STR-01",
    "Q-STR-02", "Q-STR-03", "Q-STR-04", "Q-TPCH-06",
    "Q-TPCH-21", "Q-TS-02", "Q-WIN-01", "S-WIN-01",
    "G-MV-01", "L-DEDUP-03", "L-MIX-02", "L-MM-01",
    "L-PIPE-02", "L-SIM-01", "L-TEXT-02", "M-PRED-02",
    "M-PRED-03", "M-TRAIN-02", "M-TRAIN-03", "M-TRAIN-04",
    "M-TRAIN-05", "M-TRAIN-06", "M-TRAIN-07", "Q-AGG-01",
    "Q-AGG-12", "Q-AGG-17", "Q-AGG-27", "Q-AGG-28",
    "Q-AGG-29", "Q-ARR-01", "Q-ARR-02", "Q-ARR-03",
    "Q-ARR-04", "Q-ARR-05", "Q-CAST-01", "Q-COND-01",
    "Q-CTE-01", "Q-DATE-03", "Q-DATE-04", "Q-FIL-01",
    "Q-JOIN-10", "Q-MAP-01", "Q-MATH-01", "Q-PIVOT-01",
    "Q-PROJ-02", "Q-SCAN-02", "Q-SORT-02", "Q-STR-05",
    "Q-TS-03", "Q-WIN-02", "S-SINK-02", "U-AGG-01",
    "G-CDF-01", "L-DEDUP-02", "L-DEDUP-06", "L-DEDUP-07",
    "L-MM-03", "L-PIPE-05", "L-SIM-04", "L-TEXT-04",
    "L-TEXT-05", "L-TEXT-06", "L-TEXT-07", "L-TEXT-08",
    "L-TEXT-09", "L-TEXT-10", "M-PRED-01", "M-PREP-01",
    "M-TRAIN-01", "Q-AGG-13", "Q-AGG-14", "Q-AGG-15",
    "Q-AGG-19", "Q-ARR-06", "Q-MAP-02", "Q-MERGE-01",
    "Q-PIVOT-02", "Q-SET-05", "Q-SUBQ-01", "Q-SUBQ-02",
    "Q-SUBQ-03", "Q-TPCH-03", "Q-WIN-03", "Q-WIN-04",
    "Q-WIN-05", "Q-WIN-06", "Q-WIN-07", "S-STATE-01",
    "U-GAPPLY-01", "U-GAPPLY-02", "U-MAP-01", "U-SCALAR-01",
    "U-TABLE-01", "L-DEDUP-04", "L-DEDUP-08", "L-MIX-05",
    "L-PIPE-03", "L-SIM-02", "L-SIM-03", "L-TEXT-11",
    "M-PRED-04", "M-PREP-03", "Q-AGG-18", "Q-BASKET-01",
    "Q-CTE-02", "Q-DATE-05", "Q-DATE-06", "Q-FUNNEL-01",
    "Q-GRAPH-01", "Q-GRAPH-02", "Q-JSON-02", "Q-JSON-03",
    "Q-PROF-01", "Q-QUAL-01", "Q-SAMPLE-01", "Q-SCAN-06",
    "Q-SCAN-10", "Q-SCAN-11", "Q-SCD-01", "Q-SUBQ-04",
    "Q-TPCH-09", "Q-TPCH-14", "Q-TPCH-15", "Q-TREND-01",
    "Q-TS-05", "Q-WIN-09", "Q-WIN-11", "S-GEN-01",
    "S-JOIN-01", "S-JOIN-02", "S-JOIN-03", "S-SINK-01",
    "S-STATE-02", "S-STATE-04", "S-WIN-02", "S-WIN-03",
    "U-SCALAR-02", "L-DEDUP-05", "L-DEDUP-11", "L-MM-05",
    "L-PIPE-04", "L-SIM-06", "L-TEXT-19", "M-EVAL-01",
    "M-EVAL-02", "M-PREP-08", "Q-AGG-22", "Q-AGG-23",
    "Q-ARR-07", "Q-DATE-07", "Q-DIFF-01", "Q-GEO-01",
    "Q-GEO-02", "Q-GEO-03", "Q-JOIN-12", "Q-JSON-04",
    "Q-MATH-02", "Q-MERGE-02", "Q-PIVOT-03", "Q-QUAL-02",
    "Q-SCAN-14", "Q-SCD-02", "Q-STR-06", "Q-STR-07",
    "Q-SUBQ-05", "Q-SUBQ-06", "Q-TPCH-18", "Q-TPCH-19",
    "Q-TPCH-20", "Q-TPCH-22", "Q-TS-06", "Q-WIN-08",
    "Q-WIN-10", "S-GEN-02", "S-SINK-04", "S-WIN-04",
    "U-MAP-02", "U-WIN-01",
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
