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

# Window rotation, round 7, per VERDICT.md r6 §next-round item 1:
# the ENTIRE 50-slot window goes to never-driver-witnessed oracle-backed
# entries — the r6 round added 64 operators against a 50-slot window, so
# the evidence backlog GREW to 79; this window drains 50 of it (the r6
# wave in its value order, then the continuation ops, then the late adds
# the verdict named explicitly: L-MM-07/08 complete the codec-trio
# witness, U-GAPPLY-04 and Q-RFM-01 carry this round's plan fixes).
# Golden-mode (no-oracle) entries stay OUT of the 50-window — each one
# burns a hash-verifiable slot (S-WM-02 cost one in r4).
# Everything here is green in the local sweep (tests/test_oracle_parity.py
# at the same sf0.01 the driver uses) at BOTH sf0.01 and sf0.001.
_DRIVER_PRIORITY = [
    # round-6 main wave — never driver-checked (29)
    "Q-WIN-16", "Q-GRAPH-03", "Q-TS-06", "M-EVAL-05", "M-PREP-11",
    "G-AUDIT-01", "G-BACKFILL-02", "Q-JOIN-15", "L-TEXT-20", "L-MIX-05",
    "U-TABLE-03", "S-SINK-06",
    "Q-CTE-03", "Q-ARR-08", "Q-SCAN-15", "M-PREP-12", "S-JOIN-05",
    "M-EVAL-06", "L-SIM-11", "L-DEDUP-13", "Q-WIN-17", "G-STATS-01",
    "U-SCALAR-03", "Q-SCAN-16",
    "G-ROLLBACK-01", "Q-QUAL-04", "S-STATE-05", "Q-TREND-02", "G-CRYPT-01",
    # round-6 continuation ops — never driver-checked (12); Q-RFM-01
    # carries the r7 _dist_ntile rewrite (no single-task windows)
    "Q-PATH-01", "Q-ATTR-01", "Q-RFM-01", "Q-TS-07",
    "Q-WIN-18", "Q-FUNNEL-02", "Q-AGG-26", "G-SCHEMA-01",
    "Q-SUBQ-08", "Q-DATE-09", "M-PREP-13", "S-SINK-07",
    # round-6 late adds, named in VERDICT r6 #1/#5 — never driver-checked
    # (9); L-MM-07 (WAV) + L-MM-08 (Y4M) complete the modality-trio
    # driver witness; U-GAPPLY-04 carries the r7 coarse-segment re-key
    "L-MM-07", "L-MM-08", "Q-SCAN-18", "S-STATE-06", "Q-JOIN-16",
    "U-GAPPLY-04", "Q-QUAL-05", "L-PIPE-05", "G-LAKE-01",
    # ---- 50-window boundary ----
    # past-the-window spillover, in value order, in case the driver
    # checks deeper: the remaining never-witnessed hash entries first
    # (these are the r8 window's first candidates), then goldens last.
    "Q-SCAN-17", "Q-JSON-05", "M-EVAL-07", "Q-WIN-19", "L-SIM-12",
    "G-TTL-01", "Q-COHORT-02", "M-PREP-14", "G-TXN-01",
    "Q-SQL-02", "U-SCALAR-04", "G-STATS-02", "M-EVAL-08", "S-JOIN-06",
    "L-TEXT-12", "L-TEXT-13", "L-TEXT-14", "L-TEXT-15", "L-TEXT-16",
    "L-PIPE-03", "L-PIPE-04",
    "M-PREP-04", "M-PREP-05", "M-PREP-06", "M-PREP-07",
    "Q-AGG-17", "Q-AGG-19", "U-GAPPLY-02", "L-SIM-05", "L-SIM-07",
    "L-TEXT-04", "G-COMPACT-01",
    # round-7 additions (hash-green locally at both SFs, never checked)
    "Q-JOIN-17", "L-DEDUP-14", "Q-JSON-06", "M-EVAL-09", "M-PREP-15",
    "Q-PROF-02", "M-EVAL-10", "L-TEXT-21",
    # r6-window re-check pool (all green r6)
    "Q-JOIN-13", "M-EVAL-03", "L-DEDUP-12", "G-MASK-01", "Q-QUAL-03",
    "M-PREP-09", "G-DELETE-02", "S-QUAL-01", "L-SIM-10", "M-EVAL-04",
    "Q-GEO-05", "Q-AGG-24", "Q-WIN-15", "Q-DATE-08", "G-SNAP-02",
    "Q-JOIN-14", "Q-GEO-06", "Q-TS-05", "L-MM-06", "M-PREP-10",
    "Q-AGG-25", "S-WIN-05", "Q-SUBQ-07", "G-CLONE-01", "S-SINK-05",
    "S-WM-01", "S-WM-02", "Q-TPCH-05", "Q-TPCH-07",
    "G-BACKFILL-01", "L-MM-04", "G-OBS-01", "Q-SCAN-12",
    "U-GAPPLY-03", "G-SNAP-01", "Q-WIN-13", "L-TEXT-17", "L-TEXT-18",
    "Q-SCAN-13", "U-TABLE-02", "L-SIM-08", "L-SIM-09",
    "S-JOIN-04", "S-SINK-03",
    "L-DEDUP-09", "L-DEDUP-10", "L-SIM-06", "L-MIX-02", "L-MIX-03",
    "L-MM-02",
    # r5-window re-check pool (all green r5)
    "Q-WIN-08", "Q-SCAN-08", "Q-SCAN-09", "Q-SQL-01",
    "Q-GEO-01", "Q-GEO-02", "Q-GEO-03", "Q-GEO-04",
    "Q-SCD-02", "L-TEXT-19", "Q-PIVOT-03", "Q-TS-03", "Q-TS-04",
    "M-PREP-08", "L-MM-05", "Q-WIN-14", "L-DEDUP-11",
    "G-DELETE-01", "G-CDF-01", "L-MIX-04", "Q-JSON-04",
    "M-EVAL-01", "M-EVAL-02", "Q-SCAN-14", "Q-SUBQ-06", "Q-AGG-23",
    "Q-QUAL-02", "Q-DIFF-01", "Q-AGG-22", "Q-JOIN-12",
    "Q-TPCH-16", "Q-TPCH-17", "Q-TPCH-18", "Q-TPCH-19", "Q-TPCH-20",
    "Q-TPCH-22",
    "Q-STR-06", "Q-STR-07", "Q-STR-08", "Q-DATE-07", "Q-ARR-07",
    "Q-MATH-02", "Q-SAMPLE-02", "Q-SUBQ-05", "Q-MERGE-02",
    "U-WIN-01", "U-MAP-02",
    "S-WIN-04", "S-SINK-04", "S-GEN-02",
    # previously driver-green re-check pool (r1-r4 rows), cheapest first
    "Q-WIN-12", "Q-SORT-03", "S-STATE-03",
    "Q-SCAN-05", "Q-JOIN-11", "Q-DATE-05", "Q-DATE-06", "Q-JSON-02",
    "Q-WIN-09", "Q-SCAN-06", "Q-SCAN-07", "Q-SCAN-10",
    "Q-AGG-18", "Q-AGG-20", "Q-AGG-21",
    "Q-TPCH-08", "Q-TPCH-09", "Q-TPCH-11", "Q-TPCH-15",
    "Q-SCD-01", "Q-FUNNEL-01", "Q-COHORT-01", "Q-BASKET-01",
    "Q-PROF-01", "Q-QUAL-01", "Q-TREND-01", "Q-GRAPH-01",
    "Q-WIN-10", "Q-WIN-11", "Q-SUBQ-04", "Q-CTE-02",
    "L-DEDUP-08", "L-MIX-01", "L-TEXT-11",
    "Q-TS-01", "Q-TS-02", "Q-GRAPH-02", "G-MV-01",
    "Q-SCAN-11", "Q-JSON-03", "M-PRED-04", "M-PREP-03",
    "S-WIN-02", "S-WIN-03", "S-STATE-02", "S-JOIN-01", "S-JOIN-02",
    "S-SINK-01", "S-GEN-01", "S-STATE-04", "S-JOIN-03",
    # goldens last (no oracle — driver records rows-only)
    "G-GEN-01", "M-PREP-01",
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
