"""Writeback operators: MERGE (upsert) and small-file compaction.

A training-data pipeline is not read-only — corpora get corrected,
re-scored, and appended. Without a table format (Delta/Iceberg are not
in this environment) the portable primitive is partition-granularity
rewrite:

- ``merge_into``: SQL MERGE semantics (update matched, insert new) as a
  full-outer join + coalesce — one shuffle, no row explosion, any scale.
- ``compact``: rewrite a parquet directory into N right-sized files —
  the small-files problem is the dominant metadata killer at 100 TB
  (driver-side listing + per-file open cost).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """MERGE semantics: rows in ``updates`` replace matching target rows
    (by key) and new keys are inserted; unmatched target rows pass
    through. Both frames must share a schema. Returns the merged frame
    (caller writes it back atomically via write_parquet to a new path /
    partition).
    """
    if target.columns != updates.columns:
        raise ValueError(
            f"schema mismatch: {target.columns} vs {updates.columns}"
        )
    value_cols = [c for c in target.columns if c not in key_cols]
    t = target.alias("t")
    u = updates.alias("u")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"u.{k}")) for k in key_cols]
    joined = t.join(u, cond, "full_outer")
    merged = joined.select(
        *[
            F.coalesce(F.col(f"u.{k}"), F.col(f"t.{k}")).alias(k)
            for k in key_cols
        ],
        *[
            F.when(F.col(f"u.{key_cols[0]}").isNotNull(), F.col(f"u.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in value_cols
        ],
    )
    return merged


from dask_xgboost_spark.registry import register
from dask_xgboost_spark.sources import load

_ORDER_COLS = (
    "o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
)

_MERGE_SQL = (
    "WITH upd AS ("
    "  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2 AS o_totalprice, "
    "         o_orderdate, o_orderpriority FROM orders WHERE o_custkey < 50"
    "  UNION ALL"
    "  SELECT o_orderkey + 10000000, o_custkey, 'N', 1.0, o_orderdate, 'NEW' "
    "  FROM orders WHERE o_orderkey < 100"
    ") "
    f"SELECT {_ORDER_COLS} FROM upd "
    "UNION ALL "
    f"SELECT {_ORDER_COLS} FROM orders o "
    "WHERE NOT EXISTS (SELECT 1 FROM upd WHERE upd.o_orderkey = o.o_orderkey) "
    "ORDER BY o_orderkey"
)


@register("Q-MERGE-01", sql=_MERGE_SQL)
def q_merge_01(spark, sf):
    """MERGE/upsert: price-corrected rows replace their targets by key and
    new keys are appended, existing rows pass through — the oracle states
    the same final table via update ∪ anti-join."""
    orders = load(spark, sf, "orders")
    corrections = orders.filter(F.col("o_custkey") < 50).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    inserts = (
        orders.filter(F.col("o_orderkey") < 100)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10000000)
        .withColumn("o_orderstatus", F.lit("N"))
        .withColumn("o_totalprice", F.lit(1.0))
        .withColumn("o_orderpriority", F.lit("NEW"))
    )
    updates = corrections.unionByName(inserts)
    return merge_into(orders, updates, ["o_orderkey"]).orderBy("o_orderkey")


@register("G-COMPACT-01", sql=None, mode="golden")
def g_compact_01(spark, sf):
    """Small-file compaction: a 32-file copy of events is rewritten into 4
    sorted files; returns (files_before, files_after, rows) for the golden
    check."""
    import os
    import tempfile

    src = tempfile.mkdtemp(prefix="dxs_frag_")
    dst = tempfile.mkdtemp(prefix="dxs_compact_")
    ev = load(spark, sf, "events")
    ev.repartition(32).write.mode("overwrite").parquet(src)
    n_before = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    rows = compact(spark, src, dst, target_files=4, sort_cols=["ts"])
    n_after = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    return spark.createDataFrame(
        [(n_before, n_after, rows)], "files_before int, files_after int, rows bigint"
    )


def compact(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_files: int,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ``target_files`` files (optionally
    sorted within partitions for row-group min/max skipping). Returns the
    row count written."""
    df = spark.read.parquet(src_dir)
    out = df.repartition(target_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").parquet(dst_dir)
    return spark.read.parquet(dst_dir).count()
