from dask_xgboost_spark.sources.tables import (  # noqa: F401
    TABLES,
    load,
    register_views,
    read_csv,
    read_parquet,
    write_parquet,
)
