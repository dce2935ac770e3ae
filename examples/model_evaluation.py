#!/usr/bin/env python
"""Model-evaluation tour: the offline-eval board every scored dataset
passes before a model (or a retrieval index, or an experiment) ships —
each leg a registered, oracle-checked operator, each output small
enough to read in a review meeting:

  1. threshold sweep       — precision/recall at every score cut
                                                           (M-EVAL-01)
  2. sliced eval           — the same gate per segment, because
                             averages hide subgroup failures (M-EVAL-02)
  3. discrimination        — exact distributed ROC-AUC via rank-sum
                                                           (M-EVAL-03)
  4. calibration           — reliability table + ECE from the
                             10-bin exact-integer readout (M-EVAL-04/09)
  5. confusion matrix      — per-class P/R/F1 plus micro/macro
                             averages derived in-driver     (M-EVAL-10)
  6. retrieval ranking     — MRR / hit@k for the index path (M-EVAL-05)
  7. regression + drift    — exact-moment forecast errors and the
                             train/serve drift gate    (M-EVAL-06 / -07)
  8. experiment readout    — two-proportion z² A/B verdict  (M-EVAL-08)

The identities asserted here (micro-P == micro-R == accuracy for
single-label multiclass; confusion-matrix support sums to the event
count; ECE is a weighted mean of per-bin gaps) are exactly the checks a
reviewer runs on a real eval board — if they fail, the board is wrong,
not the model.

Run: python examples/model_evaluation.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from dask_xgboost_spark import get_spark
from dask_xgboost_spark.registry import load_all


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="model-evaluation")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    # 1. threshold sweep: pick the operating point from the curve
    curve = specs["M-EVAL-01"].fn(spark, sf_dir).collect()
    best = max(curve, key=lambda r: (r["precision_"] or 0.0) * r["recall_"])
    print(
        f"threshold sweep: {len(curve)} cuts; best P*R at score "
        f">= {best['score']}: P={best['precision_']:.3f} R={best['recall_']:.3f}"
    )

    # 2. sliced eval: the threshold that works on average can fail a slice
    slices = specs["M-EVAL-02"].fn(spark, sf_dir).collect()
    # a slice with no positives has undefined recall — exclude from "worst"
    worst_slice = min(
        (r for r in slices if r["recall_"] is not None),
        key=lambda r: r["recall_"],
    )
    print(
        f"slices: {len(slices)}; worst recall on slice "
        f"{worst_slice['slice']!r}: {worst_slice['recall_']:.3f}"
    )

    # 3. discrimination: exact AUC (rank-sum over score buckets)
    auc = specs["M-EVAL-03"].fn(spark, sf_dir).first().asDict()
    print(f"AUC: {auc['auc']:.4f} ({auc['n_pos']} pos / {auc['n_neg']} neg)")

    # 4. calibration: ECE from the exact-integer bin table — the
    #    per-bin |observed - predicted| gap, weighted by bin mass
    bins = specs["M-EVAL-09"].fn(spark, sf_dir).collect()
    n_total = sum(r["n"] for r in bins)
    assert n_total > 0
    ece = sum(
        abs(r["n_pos"] / r["n"] - r["sum_score_pm"] / (1000 * r["n"])) * r["n"]
        for r in bins
        if r["n"]
    ) / n_total
    print(f"calibration: {len(bins)} bins, ECE={ece:.4f}")

    # 5. confusion matrix: per-class board + micro/macro derived in-driver
    cm = specs["M-EVAL-10"].fn(spark, sf_dir).collect()
    tp = sum(r["tp"] for r in cm)
    fp = sum(r["fp"] for r in cm)
    fn = sum(r["fn"] for r in cm)
    support = sum(r["support"] for r in cm)
    # single-label multiclass: every FP is some other class's FN, so
    # micro-precision == micro-recall == accuracy
    assert fp == fn, (fp, fn)
    micro = tp / (tp + fp)
    macro_f1 = sum(r["f1_pm"] for r in cm) / (1000 * len(cm))
    worst_cls = min(cm, key=lambda r: r["f1_pm"])
    print(
        f"confusion: {len(cm)} classes over {support} rows; "
        f"accuracy={micro:.3f} macro-F1={macro_f1:.3f}; "
        f"worst class {worst_cls['cls']!r} F1={worst_cls['f1_pm'] / 1000:.3f}"
    )

    # 6. retrieval ranking: MRR / hit@k for the index-serving path
    rk = specs["M-EVAL-05"].fn(spark, sf_dir).collect()
    mrr = sum(1.0 / r["first_rel_rank"] for r in rk if r["first_rel_rank"]) / len(rk)
    hit5 = sum(r["hit5"] for r in rk) / len(rk)
    print(f"retrieval: {len(rk)} queries, MRR={mrr:.3f} hit@5={hit5:.3f}")

    # 7. regression errors (exact integer moments) + the drift gate
    reg = specs["M-EVAL-06"].fn(spark, sf_dir).collect()
    worst_mae = max(reg, key=lambda r: r["mae"])
    drift = specs["M-EVAL-07"].fn(spark, sf_dir).collect()
    n_drifted = sum(1 for r in drift if r["drifted"])
    print(
        f"regression: worst MAE {worst_mae['mae']:.2f} on "
        f"{worst_mae['event_type']!r}; drift gate: {n_drifted}/{len(drift)} "
        "buckets flagged"
    )

    # 8. A/B readout: ship/hold verdict from the two-proportion z²
    ab = specs["M-EVAL-08"].fn(spark, sf_dir).first().asDict()
    print(
        f"A/B: control {ab['c0']}/{ab['n0']} vs treatment "
        f"{ab['c1']}/{ab['n1']} -> "
        f"{'significant' if ab['significant'] else 'not significant'}"
    )
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
