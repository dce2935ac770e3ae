#!/usr/bin/env python
"""Retrieval-model training data, end to end: the round-8 operator wave
as one workflow — prepare contrastive training pairs for a retriever /
reranker and read out its ranking quality, every stage a registered,
oracle-checked operator.

  1. semantic decontamination — corpus vectors within cosine 0.9 of ANY
                                held-out eval vector are dropped before
                                training (L-SIM-13: bipartite sign-bucket
                                blocking + one-flip multi-probe, integer-
                                exact cosine — never an all-pairs scan)
  2. segment-level dedup      — the RefinedWeb exact line-dedup rule:
                                globally-first occurrence of each 8-word
                                segment survives, documents are rebuilt
                                from surviving segments (L-DEDUP-15)
  3. negative sampling        — k hard-random negatives per user for the
                                contrastive loss, drawn the BLOCKED way
                                (M-PREP-16) and compared live against the
                                demo cross (M-PREP-14): same output, the
                                shuffle-row meter shows the difference a
                                100 TB run would feel
  4. shard-shuffled export    — md5 shard + within-shard sort key break
                                source order before training; the
                                manifest proves the permutation property
                                (L-PIPE-06)
  5. ranking-metric readout   — MRR / hit-rate@5 of a baseline ranker in
                                floor-ppm exact integers (M-EVAL-11)

Run: python examples/retrieval_training_data.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from bench import _shuffle_metrics
from dask_xgboost_spark import get_spark
from dask_xgboost_spark.registry import load_all


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="retrieval-training-data")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    # 1. semantic decontamination: every flagged corpus vector names the
    # eval vector it collides with — drop these doc ids before training
    # so the benchmark never leaks into the training set.
    contaminated = specs["L-SIM-13"].fn(spark, sf_dir).collect()
    print(
        f"decontamination: {len(contaminated)} corpus vectors within "
        "cosine 0.9 of an eval vector (dropped)"
    )

    # 2. segment-level dedup + reconstruction: the corpus after the
    # keep-first rule, with how much each doc lost.
    rebuilt = specs["L-DEDUP-15"].fn(spark, sf_dir)
    from pyspark.sql import functions as F

    stats = rebuilt.agg(
        F.sum("n_segs").alias("segs"),
        F.sum("n_kept").alias("kept"),
        F.sum(F.when(F.col("n_kept") == 0, 1).otherwise(0)).alias("empty"),
    ).first()
    print(
        f"segment dedup: {stats['kept']}/{stats['segs']} segments kept, "
        f"{stats['empty']} docs fully deduplicated away"
    )

    # 3. negative sampling, demo cross vs blocked production path: the
    # answers are drawn with the SAME md5 key (the blocked draw is the
    # demo's draw restricted to the probed buckets), but the shuffle
    # meter shows what each plan would move at scale.
    demo_df = specs["M-PREP-14"].fn(spark, sf_dir)
    demo_m = _shuffle_metrics(spark, demo_df, "ex_negsample_demo")
    # persist BEFORE the metered run: the cache fills during the
    # metered execution (so the shuffle numbers are the real plan's),
    # and the count afterwards reads the cache instead of re-running
    # the whole pipeline
    blocked_df = specs["M-PREP-16"].fn(spark, sf_dir).persist()
    blocked_m = _shuffle_metrics(spark, blocked_df, "ex_negsample_blocked")
    n_pairs = blocked_df.count()
    blocked_df.unpersist()
    print(
        f"negative sampling: {n_pairs} (user, negative) pairs; "
        f"demo cross shuffled {demo_m['rows']} rows, "
        f"blocked path {blocked_m['rows']} rows — the gap grows with "
        "the item vocabulary (111x at sf0.1, tools/shuffle_audit.py)"
    )

    # 4. shard-shuffled export: the manifest is the training-side
    # contract — shard sizes, token budgets, and checksums to diff
    # against the next corpus release.
    manifest = specs["L-PIPE-06"].fn(spark, sf_dir)
    m = manifest.agg(
        F.count(F.lit(1)).alias("shards"),
        F.sum("n_docs").alias("docs"),
        F.sum("n_toks").alias("toks"),
    ).first()
    print(
        f"shard shuffle: {m['docs']} docs / {m['toks']} tokens across "
        f"{m['shards']} md5 shards (deterministic, source order broken)"
    )

    # 5. ranking readout of the baseline ranker: exact integers per
    # segment; MRR and hit-rate@5 are the reader's two divisions.
    rows = specs["M-EVAL-11"].fn(spark, sf_dir).collect()
    for r in rows:
        mrr = r["rr_ppm_sum"] / r["n_queries"] / 1e6
        hit5 = r["n_hit_at_k"] / r["n_queries"]
        any_rel = r["n_hit"] / r["n_queries"]
        print(
            f"ranking[{r['segment']}]: n={r['n_queries']} "
            f"MRR={mrr:.4f} hit-rate@5={hit5:.3f} "
            f"any-relevant-rate={any_rel:.3f} hits@5={r['hits_at_k']}"
        )
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
