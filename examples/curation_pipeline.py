#!/usr/bin/env python
"""End-to-end training-data curation on this engine: the workflow an LLM
data team runs at 100 TB, demonstrated on the fixture corpus.

Stages (each backed by a registered, oracle-checked operator):
  1. exact dedup          — SHA-256 hash groups          (L-DEDUP-01 shape)
  2. near-dup grouping    — Jaccard pairs → connected
                            components → keep one doc
                            per group                    (L-DEDUP-03/07)
  3. decontamination      — drop docs sharing word
                            5-grams with the benchmark
                            set                          (L-DEDUP-08 shape)
  4. PII redaction        — emails/phones → typed
                            placeholders                 (L-TEXT-11 shape)
  5. repetition squeeze   — collapse consecutive
                            duplicate tokens             (L-TEXT-12 shape)
  6. quality gating       — lang/length/stopword gates   (L-PIPE-01 shape)
  6b. language balancing  — every lang keeps min(lang
                            count) docs, md5-hash order  (L-MIX-02 shape)
  7. train/test split     — md5-hash keyed, stable
                            under retries/repartition    (M-PREP-07 shape)
  8. sharded JSONL export — lang-partitioned, size-
                            bounded shards               (L-PIPE-02 shape)

A corpus-health profile (duplicate-8-gram fraction + vocabulary TTR,
L-TEXT-15/16 shapes) prints before and after, showing what the pipeline
actually removed. Run: python examples/curation_pipeline.py [sf_dir]
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

    def dup_gram_rate(frame):
        # corpus-health metric: share of 8-gram instances seen >1 time
        w = frame.select("doc_id", F.split("text", " ").alias("w"))
        grams = w.filter(F.size("w") >= 8).select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 7),"
                    " i -> array_join(slice(w, i, 8), ' '))"
                )
            ).alias("g")
        )
        counts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
        row = counts.agg(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup"),
            F.sum("c").alias("tot"),
        ).first()
        return (row.dup or 0) / max(row.tot or 1, 1)

    health_before = dup_gram_rate(docs)

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

    # 3. decontamination: drop any doc sharing a word 5-gram with the
    #    benchmark set (stand-in: doc_id % 97 == 0); benchmark grams are
    #    tiny → broadcast, the corpus is never pairwise-compared
    t5 = F.expr(
        "case when size(split(text, ' ')) >= 5 then "
        "transform(sequence(1, size(split(text, ' ')) - 4), "
        "i -> concat_ws(' ', slice(split(text, ' '), i, 5))) "
        "else array() end"
    )
    grams = docs.select("doc_id", F.explode(t5).alias("gram"))
    bench_grams = (
        grams.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    )
    contaminated = (
        grams.join(F.broadcast(bench_grams), "gram").select("doc_id").distinct()
    )
    docs = docs.join(contaminated, "doc_id", "left_anti")
    n3 = docs.count()

    # 4. PII redaction + 5. repetition squeeze (both map-only)
    toks = F.split(F.col("text"), " ")
    squeezed = F.filter(toks, lambda x, i: (i == 0) | (x != F.element_at(toks, i)))
    docs = docs.withColumn(
        "text",
        F.regexp_replace(
            F.regexp_replace("text", r"[a-z0-9.+_-]+@[a-z0-9-]+\.[a-z]+", "<EMAIL>"),
            r"\b555-[0-9]{4}\b",
            "<PHONE>",
        ),
    ).withColumn("text", F.concat_ws(" ", squeezed))

    # 6. quality gate: language + length band
    curated = docs.filter(
        F.col("lang").isin("en", "de", "es") & F.col("n_chars").between(50, 450)
    )
    n6 = curated.count()

    # 6b. mixture: balance languages to the smallest lang's size,
    # selecting survivors in md5-hash order (L-MIX-02 shape) — the
    # sample is a pure function of doc ids, stable under re-runs
    from pyspark.sql import Window

    key = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(key, "doc_id")
    target = (
        curated.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.min("cnt").alias("target"))
    )
    curated = (
        curated.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(target))
        .filter(F.col("rn") <= F.col("target"))
        .drop("rn", "target")
    )
    n6b = curated.count()

    # 7. deterministic train/test split (stable under retries and
    # repartitioning — never randomSplit; M-PREP-07 shape)
    curated = curated.withColumn(
        "split",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4) < "c000",
            "train",
        ).otherwise("test"),
    )
    n_train = curated.filter(F.col("split") == "train").count()

    # 7b. tokenizer train/apply (L-TEXT-19 shape): vocabulary is built on
    # the TRAIN split only — building it on all docs would leak test-set
    # tokens into the artifact — then both splits are encoded against it;
    # the test-split OOV rate is the coverage metric that decides K.
    from pyspark.sql import Window

    toks = curated.select(
        "doc_id", "split", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    topk = (
        toks.filter(F.col("split") == "train")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("tok"))
        .limit(1000)
    )
    vocab = topk.select(
        "tok",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), F.col("tok")))
        .alias("tok_id"),
    )
    enc = toks.join(F.broadcast(vocab), "tok", "left")
    oov = (
        enc.groupBy("split")
        .agg(
            (F.sum(F.when(F.col("tok_id").isNull(), 1).otherwise(0)) / F.count(F.lit(1)))
            .alias("oov_rate")
        )
        .collect()
    )
    oov_by_split = {r["split"]: r["oov_rate"] for r in oov}

    # 8. sharded JSONL export
    out = os.path.join(tempfile.mkdtemp(prefix="dxs_curated_"), "corpus")
    (
        curated.select("doc_id", "lang", "text", "split")
        .repartition("lang")
        .write.partitionBy("lang")
        .option("maxRecordsPerFile", 500)
        .mode("overwrite")
        .json(out)
    )
    n4 = spark.read.schema("doc_id bigint, text string, lang string").json(out).count()
    health_after = dup_gram_rate(curated)

    print(
        f"input {n0} → exact-dedup {n1} → near-dup-grouped {n2} "
        f"→ decontaminated {n3} → quality-gated {n6} "
        f"→ lang-balanced {n6b} → split {n_train} train / "
        f"{n6b - n_train} test → exported {n4} docs at {out}"
    )
    print(
        f"dup-8-gram rate: {health_before:.4f} before → {health_after:.4f} after"
    )
    print(
        "tokenizer (train-split vocab, K=1000) OOV rate: "
        + ", ".join(f"{s}={r:.4f}" for s, r in sorted(oov_by_split.items()))
    )
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
