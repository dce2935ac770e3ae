#!/usr/bin/env python
"""Governance-gates tour: the round-5 release-discipline surface — the
checks a dataset passes between "the pipeline produced it" and "it may
leave the governed boundary", each backed by a registered,
oracle-checked operator:

  1. expectation suite     — declarative NOT NULL / UNIQUE / accepted
                             values / range / referential rules into one
                             pass/fail report              (Q-QUAL-03)
  2. incremental admission — new batch deduped against the persisted
                             fingerprint ledger, then within itself
                                                           (L-DEDUP-12)
  3. pseudonymize + k-anon — keyed-hash subject ids, sub-k
                             quasi-identifier groups folded (G-MASK-01)
  4. pruned erasure        — deletion batch rewrites ONLY the files
                             whose footer stats can contain a deleted
                             subject                       (G-DELETE-02)
  5. model release gates   — exact distributed AUC + calibration table
                             on the scored output     (M-EVAL-03 / -04)

Run: python examples/governance_gates.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from dask_xgboost_spark import get_spark
from dask_xgboost_spark.registry import load_all


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="governance-gates")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    # 1. expectation suite: gate the release on rule outcomes
    report = specs["Q-QUAL-03"].fn(spark, sf_dir).collect()
    failed = [r for r in report if not r["pass"]]
    print("expectations:", len(report), "rules,", len(failed), "failing")
    for r in failed:
        print(f"  FAIL {r['rule']}: {r['n_failed']}/{r['n_checked']} rows")

    # 2. incremental admission: only hashes unseen by the ledger and
    #    first-submitted within the batch get in
    adm = specs["L-DEDUP-12"].fn(spark, sf_dir).first().asDict()
    print(
        "admission:", adm["n_admitted"], "of", adm["n_batch"],
        f"(ledger dups {adm['n_dup_vs_ledger']}, in-batch dups {adm['n_dup_in_batch']})",
    )

    # 3. pseudonymization + k-anonymity: released groups hold >= k
    #    subjects; the rest fold into a residual bucket per type
    anon = specs["G-MASK-01"].fn(spark, sf_dir)
    released = anon.filter(anon.day_bucket.isNotNull()).count()
    folded = anon.filter(anon.day_bucket.isNull()).count()
    print("k-anonymity: released groups", released, "| residual buckets", folded)

    # 4. pruned right-to-be-forgotten rewrite: erasure cost tracks the
    #    deletion batch, not the table (footer-stats file pruning)
    erased = specs["G-DELETE-02"].fn(spark, sf_dir).first().asDict()
    print("erasure: removed", erased["n_erased"], "rows from storage")

    # 5. model gates on the scored output: discrimination + calibration
    auc = specs["M-EVAL-03"].fn(spark, sf_dir).first().asDict()
    cal = specs["M-EVAL-04"].fn(spark, sf_dir).collect()
    worst = max(cal, key=lambda r: abs(r["frac_pos"] - r["mean_score"]))
    print(
        f"model gates: AUC {auc['auc']:.4f} "
        f"({auc['n_pos']} pos / {auc['n_neg']} neg) | worst calibration "
        f"decile {worst['decile']}: observed {worst['frac_pos']:.3f} "
        f"vs predicted {worst['mean_score']:.3f}"
    )
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
