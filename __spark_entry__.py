"""Driver contract for the spark-graft builder (PySpark target).

Everything is delegated to the ``dask_xgboost_spark`` package: the
registry (dask_xgboost_spark/registry.py) enumerates every declared
operator from SURVEY.md §2 as a (Spark fn, DuckDB oracle SQL) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dask_xgboost_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    specs = load_all()
    return specs["Q-AGG-01"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every hash-checkable query."""
    return {name: spec.sql for name, spec in load_all().items() if spec.sql is not None}
