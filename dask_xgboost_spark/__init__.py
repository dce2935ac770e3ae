"""dask_xgboost_spark — a PySpark-native analytics + distributed-ML engine.

Re-expresses the capabilities of the reference library ``dask/dask-xgboost``
(distributed gradient-boosted-tree train/predict over partitioned dataframes,
see ``/root/reference/dask_xgboost/core.py``) on top of Apache Spark, and
extends the data-processing surface to a full relational/streaming/LLM-pipeline
engine designed for 100 TB scale (SURVEY.md §2).

Design stance: compose Spark, don't reimplement it. The logical plan is always
declared through the DataFrame/SQL API so Catalyst + AQE pick the physical
strategy; Python appears only at well-defined extension points (Pandas UDFs,
``applyInPandas``/``mapInPandas``) and never in the per-row hot path.
"""

__version__ = "0.1.0"

from dask_xgboost_spark.caching import release_rollups  # noqa: F401
from dask_xgboost_spark.session import get_spark  # noqa: F401
