#!/usr/bin/env python
"""Scale probe for extension operators: replicate the documents and
events fixtures N× (id-shifted so key cardinalities grow with the data,
not just row multiplicity) and time registry operators at 1× and N×.

Complements tools/suite_scale.py (TPC-H joins): this answers "do the
LLM-pipeline and window/eval additions scale linearly in rows?" for ops
whose inputs are documents/events rather than the TPC-H facts.

Run: python tools/ops_scale_probe.py [sf_dir] [rep] [op ...]
Defaults: sf0.1, rep=10, a representative round-6 op set.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bench import _timed_full
from dask_xgboost_spark.registry import load_all
from dask_xgboost_spark.session import get_spark
from dask_xgboost_spark.sources import load

DEFAULT_OPS = [
    "M-PREP-11",   # feature hashing (documents)
    "L-TEXT-20",   # PMI collocations (documents)
    "M-EVAL-05",   # ranking eval (documents)
    "Q-WIN-16",    # running distinct (events)
    "Q-WIN-17",    # rolling 7-day distinct (events)
    "Q-TS-06",     # exact EWMA (events)
    "M-EVAL-06",   # forecast eval (events)
]

ID_SHIFT = 10_000_000


def build_scaled(spark, sf_dir: str, rep: int) -> str:
    out = tempfile.mkdtemp(prefix=f"dxs_ops_{rep}x_")
    for t in ("region", "nation", "supplier", "part"):
        src = f"{sf_dir}/{t}.parquet"
        if os.path.exists(src):
            os.symlink(src, f"{out}/{t}.parquet")
    reps = spark.range(rep).select(F.col("id").alias("r"))
    # documents: doc_id shifted per replica (distinct docs, same text
    # distribution — vocabulary stays fixed, the realistic corpus shape)
    (
        load(spark, sf_dir, "documents")
        .crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("r") * ID_SHIFT)
        .drop("r")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/documents.parquet")
    )
    # events: event_id AND user_id shifted (distinct users per replica,
    # so distinct-count work grows with the data)
    (
        load(spark, sf_dir, "events")
        .crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("r") * ID_SHIFT)
        .withColumn("user_id", F.col("user_id") + F.col("r") * ID_SHIFT)
        .drop("r")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/events.parquet")
    )
    # orders: orderkey AND custkey shifted (distinct customers per
    # replica — per-customer windows/rollups grow in keys, not just rows)
    (
        load(spark, sf_dir, "orders")
        .crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("r") * ID_SHIFT)
        .withColumn("o_custkey", F.col("o_custkey") + F.col("r") * ID_SHIFT)
        .drop("r")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/orders.parquet")
    )
    # lineitem: l_orderkey shifted THE SAME WAY as orders.o_orderkey so
    # the orders⋈lineitem join keeps referential integrity across
    # replicas; l_partkey deliberately UNSHIFTED — the item vocabulary
    # stays fixed while interactions/users grow, the realistic corpus
    # shape (r8 review finding: with lineitem merely symlinked, the
    # shifted orderkeys matched zero lineitem rows at r>=1 and the
    # M-PREP-16 probe measured only the orders scan)
    (
        load(spark, sf_dir, "lineitem")
        .crossJoin(reps)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("r") * ID_SHIFT)
        .drop("r")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/lineitem.parquet")
    )
    # customer: custkey shifted THE SAME WAY as orders.o_custkey, so
    # fact→dimension joins keep referential integrity across replicas
    # (r8: M-EVAL-11's segment rollup would otherwise drop 9/10 of the
    # scaled fact rows at the dimension join and fake sublinearity)
    (
        load(spark, sf_dir, "customer")
        .crossJoin(reps)
        .withColumn("c_custkey", F.col("c_custkey") + F.col("r") * ID_SHIFT)
        .drop("r")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/customer.parquet")
    )
    # embeddings: vec_id shifted (distinct vectors per replica; the
    # in-query plant offsets are < ID_SHIFT so replica ids never collide)
    (
        load(spark, sf_dir, "embeddings")
        .crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("r") * ID_SHIFT)
        .drop("r")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{out}/embeddings.parquet")
    )
    return out


def main(sf_dir: str = "/root/testdata/sf0.1", rep: str = "10", *ops: str) -> None:
    rep_n = int(rep)
    op_list = list(ops) or DEFAULT_OPS
    spark = get_spark(app_name="ops-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    scaled = build_scaled(spark, sf_dir, rep_n)
    try:
        for name in op_list:
            fn = specs[name].fn
            t1 = tN = None
            for label, d in (("1x", sf_dir), (f"{rep_n}x", scaled)):
                df = fn(spark, d)
                df.toPandas()  # warm: plan, codegen, listing
                t = round(_timed_full(df, runs=2), 3)
                if label == "1x":
                    t1 = t
                else:
                    tN = t
                spark.catalog.clearCache()
            print(
                f"{name}: 1x={t1}s {rep_n}x={tN}s "
                f"growth={tN / t1:.2f}x (linear would be ~{rep_n}x)"
            )
    finally:
        shutil.rmtree(scaled, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
