"""Barrier-mode distributed training runner (SURVEY.md §4.2 custom piece 4).

This is the literal Spark re-expression of the reference's architecture
for engines that bring their OWN allreduce (xgboost/rabit): dask-xgboost
gang-schedules one task per worker (core.py:242-253), boots a rendezvous
tracker on the scheduler (start_tracker, core.py:39-59, tracker.py), and
runs rank-0-returns-the-model (core.py:126-131). On Spark all three are
built-ins of barrier execution:

- gang scheduling      → ``rdd.barrier().mapPartitions`` (all tasks start
                         together or none do)
- rendezvous/tracker   → ``BarrierTaskContext.allGather`` (no socket
                         protocol, no port scanning, no vendored tracker)
- rank assignment      → ``BarrierTaskContext.partitionId``
- result deduplication → every rank returns the identical averaged model;
                         rank 0's copy is taken on the driver

The default engine path is MLlib (ml/core.py) — this runner exists for
external native learners. The demo payload is a closed-form linear
regression (per-partition sufficient statistics XᵀX, Xᵀy, allGather-
summed — mathematically an exact allreduce), standing in for
``xgb.rabit``'s gradient sync; an installed ``xgboost`` would drop into
``_train_partition`` unchanged.
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame


def barrier_train_linear(
    df: DataFrame,
    feature_col: str = "features",
    label_col: str = "label",
    num_partitions: int = 4,
    l2: float = 1e-6,
) -> np.ndarray:
    """Exact distributed ridge regression via barrier allreduce.

    Returns the weight vector (d+1, incl. intercept). Deterministic: the
    allGather sum is over per-partition exact statistics, and every rank
    computes the same solve.
    """
    cols = df.select(feature_col, label_col)
    rdd = cols.repartition(num_partitions).rdd

    def train_partition(context, it):
        xs, ys = [], []
        for row in it:
            xs.append(list(row[0]) + [1.0])  # intercept term
            ys.append(float(row[1]))
        if xs:
            x = np.asarray(xs, dtype=np.float64)
            y = np.asarray(ys, dtype=np.float64)
            xtx, xty = x.T @ x, x.T @ y
            d = x.shape[1]
        else:  # empty partition still participates in the barrier
            xtx = xty = None
            d = 0
        # rendezvous: every rank contributes its stats, receives all
        payload = json.dumps(
            {
                "d": d,
                "xtx": xtx.tolist() if xtx is not None else None,
                "xty": xty.tolist() if xty is not None else None,
            }
        )
        gathered = context.allGather(payload)
        parts = [json.loads(g) for g in gathered]
        dim = max(p["d"] for p in parts)
        sum_xtx = np.zeros((dim, dim))
        sum_xty = np.zeros(dim)
        for p in parts:
            if p["xtx"] is not None:
                sum_xtx += np.asarray(p["xtx"])
                sum_xty += np.asarray(p["xty"])
        w = np.linalg.solve(sum_xtx + l2 * np.eye(dim), sum_xty)
        # reference returns the model only from rank 0 (core.py:126-131);
        # here every rank holds the identical solution — emit rank 0's
        if context.partitionId() == 0:
            yield w.tolist()

    def run(it):
        from pyspark import BarrierTaskContext

        context = BarrierTaskContext.get()
        yield from train_partition(context, it)

    # bounded: one model blob per barrier task, not data rows
    results = rdd.barrier().mapPartitions(run).collect()
    return np.asarray(results[0])
