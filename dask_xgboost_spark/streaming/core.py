"""Structured Streaming runtime helpers (SURVEY.md §2D).

The reference has no streaming surface (nearest artifact: a timeseries
test fixture, test_core.py:469); this extension declares one on Spark
Structured Streaming. Queries replay ``events.parquet`` through a file
source and run to completion with ``trigger(availableNow=True)`` into a
memory sink, so every streaming query yields a concrete DataFrame whose
final state is checkable against the batch oracle (batch-equivalence).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_xgboost_spark.scratch import scratch_mkdtemp
from dask_xgboost_spark.session import ensure_session_confs
from dask_xgboost_spark.sources.tables import normalize_events_ts


def events_stream(
    spark: SparkSession,
    sf_dir: str,
    n_files: int = 1,
    duplicate: bool = False,
    max_files_per_trigger: int | None = None,
    late_rows: int = 0,
    future_sentinels: list[str] | None = None,
) -> DataFrame:
    """events.parquet replayed as a file-source stream.

    n_files > 1 splits the table into time-ordered files (distinct mtimes)
    so watermark semantics are observable across micro-batches;
    duplicate=True appends a copy of every row (dedup fixtures);
    late_rows > 0 carves the N earliest rows out of the first file and
    delivers them LAST — genuinely late data, far below the watermark by
    the time it arrives (S-WM-02's dropped-row accounting fixture);
    future_sentinels adds one far-future row (ts = max + 3 days) per
    listed event_type, with event_id/user_id = -1, -2, ... — they push
    the final watermark past every real row's eviction horizon so OUTER
    stream-stream joins flush their unmatched state before availableNow
    terminates (filter ids < 0 out of the result).
    """
    ensure_session_confs(spark)
    src = f"{sf_dir}/events.parquet"
    if n_files == 1 and not duplicate and not late_rows and not future_sentinels:
        # file-stream sources require a directory
        stream_dir = scratch_mkdtemp("dxs_stream_")
        if os.path.isdir(src):
            # a Spark-WRITTEN events.parquet is itself a directory of
            # part files (the ×N replicas tools build, vs the driver's
            # single-file fixtures). Symlinking the directory whole
            # would silently yield an EMPTY stream — the file source
            # lists only plain files and does not descend into
            # subdirectories (r13 measured footgun: 0 rows, 0 batches,
            # no error). Link each part file instead.
            import glob as _glob

            parts = sorted(_glob.glob(os.path.join(src, "*.parquet")))
            if not parts:
                raise FileNotFoundError(f"no parquet part files under {src}")
            # mirror composite._parquet_num_rows_ok's partial-write
            # discipline (advisor, r13): a Spark-written layout (part-*
            # names) without its _SUCCESS committer marker may be a
            # partial task-commit set — symlinking it would stream an
            # UNDERCOUNTED row set with no error. Non-Spark layouts
            # (e.g. pyarrow-written dirs) have no marker to wait for.
            spark_layout = any(
                os.path.basename(p).startswith("part-") for p in parts
            )
            if spark_layout and not os.path.exists(
                os.path.join(src, "_SUCCESS")
            ):
                raise FileNotFoundError(
                    f"no _SUCCESS marker under {src} (write in progress?)"
                )
            for i, p in enumerate(parts):
                os.symlink(p, os.path.join(stream_dir, f"part-{i:04d}.parquet"))
        else:
            os.symlink(src, os.path.join(stream_dir, "events.parquet"))
        schema = spark.read.parquet(src).schema
    else:
        stream_dir = scratch_mkdtemp("dxs_stream_")
        batch = spark.read.parquet(src).orderBy("ts")
        pdf = batch.toPandas()  # bounded: fixture scaffolding synthesizing micro-batch files
        late = None
        if late_rows:
            late = pdf.iloc[:late_rows]
            pdf = pdf.iloc[late_rows:]
        total = len(pdf)
        per = (total + n_files - 1) // n_files
        for i in range(n_files):
            part = pdf.iloc[i * per : (i + 1) * per]
            if duplicate:
                import pandas as pd

                part = pd.concat([part, part])
            path = os.path.join(stream_dir, f"part-{i:04d}.parquet")
            part.to_parquet(path, index=False)
            os.utime(path, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        if late is not None:
            path = os.path.join(stream_dir, "part-9999-late.parquet")
            late.to_parquet(path, index=False)
            t = 1_700_000_000 + n_files * 60
            os.utime(path, (t, t))
        if future_sentinels:
            rows = []
            for i, etype in enumerate(future_sentinels):
                r = pdf.iloc[-1].copy()
                r["event_id"] = -(i + 1)
                r["user_id"] = -(i + 1)
                r["event_type"] = etype
                rows.append(r)
            import pandas as pd

            offset = (
                pd.Timedelta(days=3)
                if pd.api.types.is_datetime64_any_dtype(pdf["ts"])
                else 3 * 86400 * 1_000_000_000  # ns when ts is raw int64 nanos
            )
            for r in rows:
                r["ts"] = r["ts"] + offset

            sent = pd.DataFrame(rows).astype(pdf.dtypes.to_dict())
            path = os.path.join(stream_dir, "part-9999-sentinel.parquet")
            sent.to_parquet(path, index=False)
            t = 1_700_000_000 + (n_files + 1) * 60
            os.utime(path, (t, t))
        schema = spark.read.parquet(stream_dir).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(stream_dir)
    return normalize_events_ts(df)


def run_to_memory(df: DataFrame, output_mode: str) -> DataFrame:
    """Run a streaming frame to completion (availableNow) into a memory
    sink; returns the final in-memory table."""
    name = "dxs_" + uuid.uuid4().hex[:12]
    ckpt = scratch_mkdtemp("dxs_ckpt_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = df.sparkSession
    out = spark.table(name)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out


def run_to_memory_progress(df: DataFrame, output_mode: str):
    """Like :func:`run_to_memory`, but also returns the per-micro-batch
    ``StreamingQueryProgress`` dicts — the production observability
    surface (state rows, watermark position, numRowsDroppedByWatermark).
    A pipeline that silently drops late data without a metric alert is
    a correctness incident waiting to be noticed; S-WM-02 pins the
    accounting down."""
    name = "dxs_" + uuid.uuid4().hex[:12]
    ckpt = scratch_mkdtemp("dxs_ckpt_")
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progresses = [p for p in q.recentProgress]
    spark = df.sparkSession
    out = spark.table(name)
    shutil.rmtree(ckpt, ignore_errors=True)
    return out, progresses


def run_foreach_batch(df: DataFrame, fn, output_mode: str = "update") -> None:
    """Run a streaming frame to completion through a foreachBatch sink —
    the escape hatch for sinks Spark has no native writer for (JDBC
    upserts, MERGE INTO transactional tables, dedup-on-write). ``fn``
    receives (batch_df, batch_id) per micro-batch; Spark guarantees
    at-least-once invocation with a stable batch_id, so idempotent or
    versioned writes give exactly-once end to end."""
    ckpt = scratch_mkdtemp("dxs_ckpt_")
    q = (
        df.writeStream.foreachBatch(fn)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)


def run_to_parquet(df: DataFrame, output_mode: str = "append") -> str:
    """Run a streaming frame to a parquet file sink; returns the sink dir."""
    out_dir = scratch_mkdtemp("dxs_sink_")
    ckpt = scratch_mkdtemp("dxs_ckpt_")
    q = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    return out_dir
