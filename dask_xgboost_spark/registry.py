"""Declared-query registry — the checkable contract of SURVEY.md §2.

Every operator the engine claims is registered here as a ``QuerySpec``:
a Spark implementation ``fn(spark, sf_dir) -> DataFrame`` plus (for
hash-mode specs) the equivalent ANSI SQL the DuckDB oracle runs on the
same parquet tables. ``__spark_entry__.py`` and the pytest oracle harness
both enumerate this registry mechanically.

Check modes (SURVEY.md §2C):
- ``hash``   exact DuckDB parity (row count + schema + value hash)
- ``tol``    numeric tolerance / statistical check (own tests; no oracle)
- ``golden`` seeded deterministic check (own tests; no oracle)
- ``stream`` streaming query checked by batch-equivalence (oracle = batch SQL)
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB oracle SQL; None → driver does rows-only check
    mode: str = "hash"
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}

# Modules that register specs on import. Order = SURVEY §2 section order.
_OPERATOR_MODULES = [
    "dask_xgboost_spark.operators.relational",
    "dask_xgboost_spark.operators.composite",
    "dask_xgboost_spark.operators.tpch_full",
    "dask_xgboost_spark.operators.analytics",
    "dask_xgboost_spark.operators.geo",
    "dask_xgboost_spark.operators.scalar",
    "dask_xgboost_spark.operators.windows",
    "dask_xgboost_spark.operators.timeseries",
    "dask_xgboost_spark.operators.advanced",
    "dask_xgboost_spark.operators.udf",
    "dask_xgboost_spark.operators.dedup",
    "dask_xgboost_spark.operators.similarity",
    "dask_xgboost_spark.operators.text",
    "dask_xgboost_spark.operators.multimodal",
    "dask_xgboost_spark.operators.mixture",
    "dask_xgboost_spark.operators.merge",
    "dask_xgboost_spark.streaming.queries",
    "dask_xgboost_spark.ml.queries",
]


def register(name: str, sql: str | None, mode: str = "hash", doc: str = "", tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query spec {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, mode=mode, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return REGISTRY
