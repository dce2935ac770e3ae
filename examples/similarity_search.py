#!/usr/bin/env python
"""Embedding similarity search on this engine, end to end: the serving
path a vector corpus uses at 100 TB, demonstrated on the fixture
embeddings.

  1. exact baseline      — brute-force cosine top-k for a broadcast
                           query set                       (L-SIM-01 shape)
  2. persistable index   — IVF cells written as partitioned parquet
                                                           (L-SIM-05 shape)
  3. pruned ANN search   — probe nprobe cells; the scan reads ONLY the
                           matching cell partitions
  4. recall report       — ANN vs exact top-k overlap
  5. int8 quantization   — the 4x storage-reduction codes (L-SIM-06 shape)

Run: python examples/similarity_search.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from dask_xgboost_spark import get_spark
from dask_xgboost_spark.operators.similarity import (
    build_ivf_index,
    cosine_col,
    search_ivf,
)
from dask_xgboost_spark.sources import load

K = 10
N_QUERIES = 5


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="similarity-search")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )

    # 1. exact top-k (broadcast queries; corpus never shuffles)
    from pyspark.sql import Window

    cand = emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"))
    scored = (
        F.broadcast(queries)
        .join(cand, F.col("qid") != F.col("cid"))
        .withColumn("cosine", cosine_col("qe", "ce"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), "cid")
    exact = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= K)
        .select("qid", "cid", "rnk")
    )
    exact_sets = {
        r["qid"]: set()
        for r in exact.select("qid").distinct().collect()
    }
    for r in exact.collect():
        exact_sets[r["qid"]].add(r["cid"])

    # 2-3. IVF index on disk + partition-pruned probe search
    idx = os.path.join(tempfile.mkdtemp(prefix="dxs_ivf_"), "index")
    build_ivf_index(emb, idx, n_cells=16)
    ann = search_ivf(spark, idx, queries, nprobe=10, k=K)
    ann_sets: dict[int, set] = {}
    for r in ann.collect():
        ann_sets.setdefault(r["qid"], set()).add(r["cid"])

    # 4. recall
    hits = sum(len(ann_sets.get(q, set()) & s) for q, s in exact_sets.items())
    total = sum(len(s) for s in exact_sets.values())
    recall = hits / total if total else 0.0

    # 5. quantization storage report
    dim = len(emb.select("embedding").first()["embedding"])
    n = emb.count()
    fp32 = n * dim * 4
    int8 = n * (dim + 8)  # codes + per-vector scale
    pq_bytes = n * 8  # L-SIM-07: 16 nibble codes/vector
    print(
        f"queries={N_QUERIES} k={K}: ANN recall vs exact = {recall:.2f} "
        f"(index at {idx}); int8 quantization: {fp32 / 1e3:.0f} KB fp32 → "
        f"{int8 / 1e3:.0f} KB ({fp32 / int8:.1f}x smaller); "
        f"PQ codes: {pq_bytes / 1e3:.0f} KB ({fp32 / pq_bytes:.0f}x smaller)"
    )
    assert recall >= 0.8, "ANN recall degraded"

    # 6. product quantization serving path (L-SIM-07): distributed-KMeans-trained
    # codebook, Arrow-batched encode, ADC candidates, exact re-score
    from dask_xgboost_spark.registry import load_all

    pq_top = load_all()["L-SIM-07"].fn(spark, sf_dir)
    pq_sets: dict[int, set] = {}
    for r in pq_top.collect():
        pq_sets.setdefault(r["qid"], set()).add(r["cid"])
    pq_hits = sum(len(pq_sets.get(q, set()) & s) for q, s in exact_sets.items())
    pq_recall = pq_hits / total if total else 0.0
    print(f"PQ(ADC) recall vs exact = {pq_recall:.2f}")
    assert pq_recall >= 0.8, "PQ recall degraded"
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
