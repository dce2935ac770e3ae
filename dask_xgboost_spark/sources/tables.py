"""Source layer: parquet/CSV scans over the fixture star schema.

Covers the reference's scan surface (``dd.read_csv`` — README.rst:37,
core.py:301,352) with Spark's native readers so predicate pushdown and
column pruning reach the scan (verified by plan asserts in tests/).

``events.ts`` has shipped in two physical encodings across fixture
generations: parquet TIMESTAMP(NANOS) (Spark reads it as int64 under
``nanosAsLong``; we convert with integer division to µs — an exact floor
that the DuckDB oracle mirrors) and TIMESTAMP(MICROS) (Spark reads it
natively as TIMESTAMP_NTZ; no conversion needed). ``normalize_events_ts``
dispatches on the *read* schema so either generation works.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from dask_xgboost_spark.session import ensure_session_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    ensure_session_confs(spark)
    return spark.read.parquet(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Hive-style partitioned parquet layout (partition pruning: filters on
    partition columns skip whole directories at planning time — the
    dominant scan reducer for date-organized data at 100 TB)."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


_PLAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Canonicalize ``events.ts`` to TIMESTAMP (LTZ) regardless of the
    fixture generation's physical encoding:

    - int64 nanos (``nanosAsLong`` legacy read of TIMESTAMP(NANOS)):
      integer-divide to µs — an exact floor the DuckDB oracle mirrors.
    - TIMESTAMP_NTZ (native read of parquet timestamp[us],
      isAdjustedToUTC=false): cast to LTZ. The session timezone is pinned
      UTC (session.py:48), so the cast is value-identical; it restores the
      LTZ type every downstream consumer was built against (e.g. epoch
      casts in plans/scale.py, window binning), which TIMESTAMP_NTZ alone
      would break — NTZ cannot cast to numeric.
    """
    field = next((f for f in df.schema.fields if f.name == "ts"), None)
    if field is not None and isinstance(field.dataType, LongType):
        # Magnitude dispatch, evaluated lazily per row (no driver
        # action). The two int64 encodings overlap, so NO single
        # threshold is windowless; 4e17 is chosen to make the ambiguous
        # bands maximally implausible: micros stay below 4e17 through
        # year 14644 — including the common 9999-12-31 far-future
        # sentinel (2.53e17 µs) — while nanos exceed it from Sep 1982
        # on. Misclassified: ns-encoded instants before 1982-09 (ns
        # encodings are modern; pre-1983 event data in nanos is not a
        # realistic fixture) and µs-encoded instants past year 14644.
        df = df.withColumn(
            "ts",
            F.when(
                F.abs(F.col("ts")) > F.lit(400_000_000_000_000_000),
                F.timestamp_micros(F.expr("ts div 1000")),
            ).otherwise(F.timestamp_micros(F.col("ts"))),
        )
    elif field is not None and isinstance(field.dataType, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; normalizes events.ts ns→µs (exact floor).

    Caches the analyzed *plan* (not data) per session so repeated loads
    skip file listing + footer reads; DataFrames are immutable so sharing
    is safe. Keyed by applicationId (stable per session — ``id()`` could
    be recycled after a stopped session is collected).
    """
    key = (spark.sparkContext.applicationId, sf_dir, name)
    if key in _PLAN_CACHE:
        return _PLAN_CACHE[key]
    df = read_parquet(spark, f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    _PLAN_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views (for spark.sql queries)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
