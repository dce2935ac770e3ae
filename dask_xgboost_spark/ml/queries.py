"""ML registry entries (SURVEY.md §2F) — rows-only for the driver
(training is not SQL-expressible; the strong checks live in
tests/test_ml.py, mirroring the reference's parity-test strategy §5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_xgboost_spark.ml.core import XGBClassifier, XGBRegressor, assemble_features
from dask_xgboost_spark.registry import register
from dask_xgboost_spark.sources import load

FAST_PARAMS = dict(n_estimators=5, max_depth=3, learning_rate=0.5, random_state=42)


def _binary_frame(spark, sf):
    emb = load(spark, sf, "embeddings")
    return assemble_features(emb).withColumn(
        "y", (F.col("label") < 5).cast("double")
    )


@register("M-TRAIN-01", sql=None, mode="golden")
def m_train_01(spark, sf):
    """Distributed GBT regression fit+predict (reference train/XGBRegressor,
    core.py:268,388). Target: first embedding coordinate (continuous)."""
    emb = load(spark, sf, "embeddings")
    df = assemble_features(emb).withColumn(
        "target", F.element_at("embedding", 1).cast("double")
    )
    model = XGBRegressor(**FAST_PARAMS).fit(df, label_col="target")
    return (
        model.predict(df)
        .select("vec_id", F.round("prediction", 6).alias("prediction"))
        .orderBy("vec_id")
    )


@register("M-TRAIN-02", sql=None, mode="golden")
def m_train_02(spark, sf):
    """Distributed GBT binary classification (reference XGBClassifier.fit,
    core.py:488): labels + probabilities."""
    df = _binary_frame(spark, sf)
    clf = XGBClassifier(**FAST_PARAMS).fit(df, label_col="y")
    proba = clf.predict_proba(df)
    return (
        proba.select(
            "vec_id",
            F.round(F.element_at("proba", 2), 6).alias("p1"),
        )
        .join(
            clf.predict(df).select("vec_id", "prediction"),
            "vec_id",
        )
        .orderBy("vec_id")
    )


@register("M-TRAIN-03", sql=None, mode="golden")
def m_train_03(spark, sf):
    """Multi-class classification via the objective switch
    (core.py:580-586): 10-class OneVsRest(GBT) fit+predict."""
    emb = load(spark, sf, "embeddings")
    df = assemble_features(emb).withColumn("y", F.col("label").cast("double"))
    clf = XGBClassifier(n_estimators=3, max_depth=2, learning_rate=0.5).fit(
        df, label_col="y"
    )
    return clf.predict(df).select("vec_id", "prediction").orderBy("vec_id")
