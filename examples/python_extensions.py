#!/usr/bin/env python
"""Python-extension tour: the engine's escape hatches when built-in
operators and formats aren't enough — each one the FASTEST correct way
to cross the Python boundary for its job.

  1. custom batch source     — read a format Spark lacks, partition-
                               parallel, via the Python Data Source API
                               (Q-SCAN-11 shape)
  2. custom streaming source — deterministic micro-batches with
                               Kafka-style offset replay (S-GEN-02)
  3. VARIANT extraction      — parse JSON once, extract many fields
                               from the binary tree (Q-JSON-03)
  4. mapInArrow              — per-partition logic in pyarrow.compute
                               kernels, zero pandas (U-MAP-02 shape)
  5. broadcast-model scoring — ship ANY Python model to executors once,
                               score Arrow-batched (M-PRED-04 shape)
  6. observe metrics         — pipeline health on the query's own scan,
                               no second pass (G-OBS-01 shape)

Run: python examples/python_extensions.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from dask_xgboost_spark import get_spark
from dask_xgboost_spark.registry import load_all
from dask_xgboost_spark.sources.pydatasource import register_python_sources


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="python-extensions")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    register_python_sources(spark)

    # 1. custom batch source: write a JSONL corpus, read it back through
    #    the pure-Python "pyjsonl" source — one executor task per file
    base = tempfile.mkdtemp(prefix="pyx_jsonl_")
    for i in range(3):
        with open(os.path.join(base, f"part-{i:05d}.json"), "w") as fh:
            fh.write(json.dumps({"doc_id": i, "lang": "en", "text": f"doc {i}"}) + "\n")
    docs = (
        spark.read.format("pyjsonl")
        .schema("doc_id bigint, lang string, text string")
        .option("path", base)
        .load()
    )
    print("custom source:", docs.count(), "rows in", docs.rdd.getNumPartitions(), "partitions")

    # 2. custom streaming source: 10 deterministic micro-batches through
    #    the offset-replay contract, final state ≡ batch (S-GEN-02)
    print("streaming source rollup:", specs["S-GEN-02"].fn(spark, sf_dir).count(), "groups")

    # 3. VARIANT: parse events.props once, extract typed fields
    print(
        "variant:",
        specs["Q-JSON-03"].fn(spark, sf_dir).agg(F.sum("k_var")).first()[0],
        "= sum of $.k over events",
    )

    # 4 + 5. Arrow-tier hooks: mapInArrow filter and broadcast-model scoring
    print("mapInArrow rows:", specs["U-MAP-02"].fn(spark, sf_dir).count())
    scored = specs["M-PRED-04"].fn(spark, sf_dir)
    print("scored rows:", scored.count(), "| sample:", scored.limit(2).collect())

    # 6. observe: gate metrics computed on the same scan as the result
    from dask_xgboost_spark.operators.analytics import observed_balance_gate

    out, obs = observed_balance_gate(spark, sf_dir)
    out.count()
    print("observed metrics:", obs.get)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
