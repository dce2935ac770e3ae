#!/usr/bin/env python
"""End-to-end training-data curation on this engine: the workflow an LLM
data team runs at 100 TB, demonstrated on the fixture corpus.

Stages (each backed by a registered, oracle-checked operator):
  1. exact dedup          — SHA-256 hash groups          (L-DEDUP-01 shape)
  2. near-dup grouping    — Jaccard pairs → connected
                            components → keep one doc
                            per group                    (L-DEDUP-03/07)
  3. quality gating       — lang/length/stopword gates   (L-PIPE-01 shape)
  4. sharded JSONL export — lang-partitioned, size-
                            bounded shards               (L-PIPE-02 shape)

Run: python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from dask_xgboost_spark import get_spark
from dask_xgboost_spark.operators.dedup import connected_components, jaccard_pairs
from dask_xgboost_spark.sources import load


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="curation-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1. exact dedup: one keeper per content hash
    hashed = docs.withColumn("h", F.sha2("text", 256))
    keep_exact = hashed.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    docs = hashed.join(keep_exact, ["h", "doc_id"]).drop("h")
    n1 = docs.count()

    # 2. near-dup grouping: pair graph → components → keep the component
    #    min (production corpora: jaccard_pairs(..., max_token_df=...))
    pairs = jaccard_pairs(docs, threshold=0.95)
    groups = connected_components(
        pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
    )
    drop = groups.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    docs = docs.join(drop, "doc_id", "left_anti")
    n2 = docs.count()

    # 3. quality gate: language + length band
    curated = docs.filter(
        F.col("lang").isin("en", "de", "es") & F.col("n_chars").between(50, 450)
    )
    n3 = curated.count()

    # 4. sharded JSONL export
    out = os.path.join(tempfile.mkdtemp(prefix="dxs_curated_"), "corpus")
    (
        curated.select("doc_id", "lang", "text")
        .repartition("lang")
        .write.partitionBy("lang")
        .option("maxRecordsPerFile", 500)
        .mode("overwrite")
        .json(out)
    )
    n4 = spark.read.schema("doc_id bigint, text string, lang string").json(out).count()

    print(
        f"input {n0} → exact-dedup {n1} → near-dup-grouped {n2} "
        f"→ quality-gated {n3} → exported {n4} docs at {out}"
    )
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
