"""Partition-count invariance: a distributed engine's results must not
depend on how the data happens to be split. Every hash-mode registry
entry is *designed* deterministic (exact integer carriers, total
ordering, tie-breaks); this suite actually varies the execution layout —
shuffle partition count AND a pre-shuffled input — for a representative
sample across operator families, and requires bit-identical results.

This is the local stand-in for "same answer on 32 cores and on 1000
executors": aggregation merge order, window partition placement, and
join side ordering all change with the layout; only a query with a
genuinely order-independent formulation survives the comparison.
"""

from __future__ import annotations

import pytest

from dask_xgboost_spark.registry import load_all

SPECS = load_all()

# one (fast) representative per family: agg, join, window, sort, set,
# scalar, date, pivot, subquery, analytics, graph, geo, timeseries,
# dedup, text, mixture, ml-prep
SAMPLE = [
    "Q-AGG-01", "Q-JOIN-02", "Q-WIN-01", "Q-WIN-14", "Q-SORT-02",
    "Q-SET-01", "Q-DATE-02", "Q-PIVOT-03", "Q-SUBQ-01", "Q-SCD-02",
    "Q-GRAPH-01", "Q-GEO-01", "Q-TS-04", "L-DEDUP-01", "L-TEXT-19",
    "L-MIX-01", "M-PREP-08", "Q-QUAL-02",
    # round-5 additions: bloom join, AUC buckets, ledger dedup,
    # k-anonymity window, expectation suite, stratified folds,
    # pruned GDPR rewrite, rerank, calibration, kNN
    "Q-JOIN-13", "M-EVAL-03", "L-DEDUP-12", "G-MASK-01", "Q-QUAL-03",
    "M-PREP-09", "G-DELETE-02", "L-SIM-10", "M-EVAL-04", "Q-GEO-05",
    "Q-AGG-24", "Q-WIN-15", "Q-DATE-08", "G-SNAP-02", "Q-JOIN-14",
    "Q-GEO-06", "Q-TS-05", "L-MM-06", "M-PREP-10", "Q-AGG-25",
    # round-6 additions: running distinct, BFS, EWMA, ranking eval,
    # feature hashing, late-data reconciliation, salted join, PMI
    # collocations, epoch schedule, partitioned UDTF
    "Q-WIN-16", "Q-GRAPH-03", "Q-TS-06", "M-EVAL-05", "M-PREP-11",
    "G-BACKFILL-02", "Q-JOIN-15", "L-TEXT-20", "L-MIX-05", "U-TABLE-03",
    "Q-CTE-03", "Q-ARR-08", "M-PREP-12", "M-EVAL-06", "L-SIM-11", "L-DEDUP-13",
    "Q-WIN-17", "U-SCALAR-03", "Q-QUAL-04", "Q-TREND-02", "G-CRYPT-01",
    # round-6 continuation: path matrix, attribution, RFM, interval merge
    "Q-PATH-01", "Q-ATTR-01", "Q-RFM-01", "Q-TS-07",
    "Q-WIN-18", "Q-FUNNEL-02", "Q-SCAN-17", "G-SCHEMA-01",
    "Q-SUBQ-08", "Q-DATE-09", "M-PREP-13",
    "Q-JSON-05", "M-EVAL-07", "Q-WIN-19", "L-SIM-12",
    "G-TTL-01", "Q-COHORT-02", "M-PREP-14", "Q-AGG-26", "G-TXN-01",
    "Q-SQL-02", "U-SCALAR-04", "G-STATS-02", "L-MM-07", "M-EVAL-08",
    "L-MM-08", "Q-SCAN-18", "Q-JOIN-16", "U-GAPPLY-04",
    "Q-QUAL-05", "L-PIPE-05", "G-LAKE-01",
    # round-7 additions: banded interval join, hash-mode MinHash LSH,
    # VARIANT extraction, calibration bins, exact stratified split
    "Q-JOIN-17", "L-DEDUP-14", "Q-JSON-06", "M-EVAL-09", "M-PREP-15",
    # round-7 second wave: skew profiler, confusion matrix, repetition gate
    "Q-PROF-02", "M-EVAL-10", "L-TEXT-21",
    # round-8 additions: blocked negative sampling, ranking metrics,
    # keep-first segment dedup, embedding decontamination (L-PIPE-06 is
    # eager-write and covered by the oracle sweep + examples instead)
    "M-PREP-16", "M-EVAL-11", "L-DEDUP-15", "L-SIM-13", "L-SIM-14",
    # round-10 additions: the sketch-tier hash twins — register MAX-merge
    # (HLL), counter MIN-over-rows (CMS), and the histogram cumsum
    # (quantile) are exactly the aggregation shapes whose merge order
    # varies with layout
    "Q-AGG-27", "Q-AGG-28", "Q-AGG-29",
    # round-11: L-TEXT-04's hash rewrite — two chained aggregations at
    # different grains (doc,term → term) plus a vocabulary join whose
    # build order varies with layout; U-GAPPLY-02's hash rewrite —
    # exact int64 moment sums inside applyInPandas, whose Arrow batch
    # assembly order varies with layout
    "L-TEXT-04", "U-GAPPLY-02",
]


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect())


@pytest.mark.parametrize("name", SAMPLE)
def test_partition_invariance(name, spark, sf_dir):
    # NB: ops that materialize an intermediate (Q-TPCH-15 persist;
    # Q-GRAPH-01/03 localCheckpoint) compute it under the first layout —
    # their DOWNSTREAM stages still execute under both layouts, which is
    # what this asserts.
    spec = SPECS[name]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = _rows(spec.fn(spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = _rows(spec.fn(spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b, f"{name}: result depends on shuffle partition count"
