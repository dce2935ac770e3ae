#!/usr/bin/env python
"""The reference's documented end-to-end workflow (dask-xgboost
README.rst:31-48), step for step, on this engine.

Reference:                              This engine:
  df = dd.read_csv('...')                 df = spark.read.csv/parquet(...)
  labels = df['outcome']                  label lives as a column — no
  del df['outcome']                       separate collection to align
  bst = dxgb.train(client, params,        model = train(params, df,
                   df, labels)                          label_col='outcome')
  preds = dxgb.predict(client, bst, X)    preds = predict(model, X)

Run: python examples/reference_workflow.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from dask_xgboost_spark import get_spark
from dask_xgboost_spark.ml.core import XGBClassifier, assemble_features, predict, train
from dask_xgboost_spark.sources import load


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="reference-workflow")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. load partitioned data (reference: dd.read_csv → dask dataframe)
    emb = load(spark, sf_dir, "embeddings")

    # 2. preprocess with dataframe ops (reference: "use dask.dataframe to
    #    load and preprocess data", README.rst:37-39)
    df = (
        assemble_features(emb)  # array<float> → MLlib vector column
        .withColumn("outcome", (F.col("label") < 5).cast("double"))
        .filter(F.col("vec_id") >= 0)
    )
    train_df = df.filter(F.col("vec_id") % 10 != 0)
    test_df = df.filter(F.col("vec_id") % 10 == 0)

    # 3. distributed training (reference: dxgb.train(client, params, df,
    #    labels) → Booster). No client argument: the active SparkSession
    #    is ambient, like default_client() in the reference (core.py:451).
    params = {
        "objective": "binary:logistic",
        "max_depth": 4,
        "eta": 0.3,
        "n_estimators": 20,
    }
    model = train(params, train_df, label_col="outcome")

    # 4. distributed prediction (reference: dxgb.predict → lazy collection)
    # NOTE: the fixture labels are synthetic noise (1-NN accuracy = chance),
    # so held-out accuracy is ~0.5 by construction; train-set fit shows the
    # training machinery works end-to-end.
    preds = predict(model, train_df)
    acc = preds.filter(F.col("prediction") == F.col("outcome")).count() / preds.count()
    print(f"train-set accuracy: {acc:.3f} over {preds.count()} rows")
    print(f"held-out rows predicted: {predict(model, test_df).count()}")

    # 5. sklearn-style estimator facade (reference core.py:487-631)
    clf = XGBClassifier(n_estimators=20, max_depth=4).fit(train_df, label_col="outcome")
    proba = clf.predict_proba(test_df).select("vec_id", "proba")
    print("proba sample:", proba.limit(2).collect())

    # 6. feature importances (reference test_core.py:57 asserts the attr)
    imp = clf.feature_importances_
    print(f"feature_importances_: dim={len(imp)}, top={imp.max():.3f}")

    # 7. local-data predict (reference core.py:378-382: non-distributed
    #    input → local result)
    local_rows = [r["embedding"] for r in test_df.select("embedding").limit(5).collect()]
    print("local predict:", clf.predict(local_rows))

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
