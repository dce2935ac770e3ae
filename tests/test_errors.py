"""Fail-fast error propagation (reference P9: test_errors,
test_core.py:464-475 — an exception inside a partition surfaces on the
driver with its message intact)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_partition_error_surfaces_with_message(spark, sf_dir):
    from dask_xgboost_spark.sources import load

    def boom(batches):
        for pdf in batches:
            raise ValueError("Data must be 2 dimensional")  # reference msg style

    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    with pytest.raises(Exception, match="Data must be 2 dimensional"):
        li.mapInPandas(boom, "l_orderkey bigint").collect()


def test_analysis_error_is_eager_and_clean(spark, sf_dir):
    from dask_xgboost_spark.sources import load

    li = load(spark, sf_dir, "lineitem")
    with pytest.raises(Exception, match="no_such_column|UNRESOLVED_COLUMN"):
        li.select("no_such_column")


def test_missing_path_raises_path_not_found(spark):
    from dask_xgboost_spark.sources import load

    with pytest.raises(Exception, match="PATH_NOT_FOUND|does not exist"):
        load(spark, "/root/testdata/sf_nope", "lineitem").collect()
