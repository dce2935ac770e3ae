"""Streaming operator specs (SURVEY.md §2D), checked by batch-equivalence.

Every query runs the stream to completion (availableNow) and returns the
final state as a DataFrame; hash-mode entries are compared against the
batch SQL oracle — the strongest form of stream/batch equivalence the
driver can check. Watermarks bound state at scale: windows/older state
are evicted once the event-time watermark passes, so state size tracks
the watermark horizon, not the stream length.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from dask_xgboost_spark.functions import EVENTS_US
from dask_xgboost_spark.functions import cents as _cents
from dask_xgboost_spark.operators.timeseries import TS04_OHLC_SQL as _OHLC_SQL
from dask_xgboost_spark.registry import register
from dask_xgboost_spark.scratch import scratch_dir, scratch_mkdtemp
from dask_xgboost_spark.streaming.core import (
    events_stream,
    run_foreach_batch,
    run_to_memory,
    run_to_parquet,
)


@register(
    "S-WIN-01",
    sql="SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n, "
    "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 1e2 AS sv "
    f"FROM {EVENTS_US} e GROUP BY h ORDER BY h",
    mode="stream",
)
def s_win_01(spark, sf):
    """Tumbling 1h window count/sum ≡ batch date_trunc rollup. The value
    sum is exact int64 cents emitted as the derived double (same carrier
    as the batch twin Q-DATE-02; no DECIMAL output columns)."""
    ev = events_stream(spark, sf)
    agg = ev.groupBy(F.window("ts", "1 hour")).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))) / 1e2).alias("sv"),
    )
    out = run_to_memory(agg, "complete")
    return out.select(F.col("window.start").alias("h"), "n", "sv").orderBy("h")


@register(
    "S-WIN-02",
    sql="SELECT ws, COUNT(*) AS n FROM ("
    "SELECT time_bucket(INTERVAL '15 minutes', ts) - k * (INTERVAL 15 MINUTE) AS ws "
    f"FROM {EVENTS_US} e, (SELECT unnest([0, 1, 2, 3]) AS k) ks) t "
    "GROUP BY ws ORDER BY ws",
    mode="stream",
)
def s_win_02(spark, sf):
    """Sliding window (1h / 15min) ≡ batch expansion: each event belongs
    to exactly 4 slide-aligned windows."""
    ev = events_stream(spark, sf)
    agg = ev.groupBy(F.window("ts", "1 hour", "15 minutes")).agg(
        F.count(F.lit(1)).alias("n")
    )
    out = run_to_memory(agg, "complete")
    return out.select(F.col("window.start").alias("ws"), "n").orderBy("ws")


@register(
    "S-WIN-03",
    sql="WITH l AS (SELECT user_id, ts, CASE WHEN LAG(ts) OVER w IS NULL "
    "OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk "
    f"FROM {EVENTS_US} e WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
    "s AS (SELECT user_id, ts, SUM(brk) OVER ("
    "PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM l) "
    "SELECT user_id, MIN(ts) AS s_start, COUNT(*) AS n FROM s "
    "GROUP BY user_id, sid ORDER BY user_id, s_start",
    mode="stream",
)
def s_win_03(spark, sf):
    """Session window (30-min gap) ≡ batch gaps-and-islands SQL.

    The oracle's windows order by ts alone, but unlike Q-WIN-08 no
    event_id tie-break is needed HERE: tied timestamps always get
    brk = 0 (their lag gap is 0 ≤ 30 min, and a tied partition head
    makes exactly one of them the brk=1 row), so every permutation of
    tied rows yields the same running-sum sid, and the grouped
    MIN(ts)/COUNT output is order-independent."""
    ev = events_stream(spark, sf)
    agg = ev.groupBy("user_id", F.session_window("ts", "30 minutes")).agg(
        F.count(F.lit(1)).alias("n")
    )
    out = run_to_memory(agg, "complete")
    return out.select(
        "user_id", F.col("session_window.start").alias("s_start"), "n"
    ).orderBy("user_id", "s_start")


@register("S-WIN-04", sql=_OHLC_SQL, mode="stream")
def s_win_04(spark, sf):
    """Streaming OHLC bars — the continuous twin of Q-TS-04: per hourly
    tumbling window, open/close as min/max over a (ts, event_id, value)
    struct, high/low/count alongside. The struct trick matters MORE in
    streaming than in batch: open/close become ordinary mergeable
    aggregate state (one struct per window in the state store, merged
    across micro-batches in any arrival order), where a window+rn=1
    formulation is not expressible over an unbounded stream at all.
    Oracle: the same row_number SQL as the batch twin Q-TS-04 — final
    streaming state must hash-match the batch result."""
    ev = events_stream(spark, sf)
    tick = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    agg = ev.groupBy(F.window("ts", "1 hour")).agg(
        _cents(F.min(tick)["value"]).alias("open_c"),
        _cents(F.max("value")).alias("high_c"),
        _cents(F.min("value")).alias("low_c"),
        _cents(F.max(tick)["value"]).alias("close_c"),
        F.count(F.lit(1)).alias("n_ticks"),
    )
    out = run_to_memory(agg, "complete")
    return out.select(
        F.col("window.start").alias("bucket"),
        "open_c", "high_c", "low_c", "close_c", "n_ticks",
    ).orderBy("bucket")


@register(
    "S-WM-01",
    sql="WITH e AS (SELECT date_trunc('microseconds', ts) AS ts FROM events), "
    "wm AS (SELECT epoch_us(max(ts)) // 1000 - 3600000 AS wm_ms FROM e) "
    "SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n "
    "FROM e, wm GROUP BY h, wm_ms "
    "HAVING epoch_us(date_trunc('hour', ts) + INTERVAL 1 HOUR) // 1000 <= wm_ms "
    "ORDER BY h",
    mode="stream",
)
def s_wm_01(spark, sf):
    """Watermark + late-data drop, observable across micro-batches: the
    stream is split into 8 time-ordered files consumed one per trigger
    (maxFilesPerTrigger=1), with a 1-hour watermark on a tumbling window
    in append mode — only finalized (below-watermark) windows are
    emitted. The oracle derives the emitted set in batch SQL: Spark
    tracks event-time stats in WHOLE MILLISECONDS, so the final
    watermark is epoch_ms(max ts) − 3_600_000 and a window is emitted
    iff epoch_ms(window end) ≤ that watermark (verified boundary-exact
    at sf0.001 and sf0.01; tests/test_golden.py keeps the strict-prefix
    assert vs the full batch rollup)."""
    ev = events_stream(spark, sf, n_files=8, max_files_per_trigger=1)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = run_to_memory(agg, "append")
    return out.select(F.col("window.start").alias("h"), "n").orderBy("h")


@register(
    "S-STATE-01",
    sql=f"SELECT DISTINCT event_id FROM events ORDER BY event_id",
    mode="stream",
)
def s_state_01(spark, sf):
    """Stateful streaming dedup: every input row is duplicated in the
    replay, dropDuplicates('event_id') + watermark restores exactly the
    distinct set ≡ batch DISTINCT. The watermark bounds dedup state."""
    ev = events_stream(spark, sf, n_files=4, duplicate=True, max_files_per_trigger=1)
    deduped = ev.withWatermark("ts", "2 hours").dropDuplicates(["event_id"])
    out = run_to_memory(deduped.select("event_id"), "append")
    return out.select("event_id").orderBy("event_id")


@register(
    "S-STATE-02",
    sql="SELECT user_id, COUNT(*) AS n_events, "
    "CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS total_scaled, "
    "CAST(SUM(CAST(FLOOR(value * 10000 + 0.5) AS BIGINT)) AS BIGINT) / 1e4 AS total_value "
    "FROM events GROUP BY user_id ORDER BY user_id",
    mode="stream",
)
def s_state_02(spark, sf):
    """Arbitrary stateful op (applyInPandasWithState): running per-user
    counters; final state ≡ batch aggregate. The decimal total is carried
    as an int64 of 1e4-scaled units inside the state (exact)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    ev = events_stream(spark, sf).select("user_id", "value")

    out_schema = "user_id bigint, n_events bigint, total_scaled bigint"
    state_schema = StructType(
        [StructField("n", LongType()), StructField("tot", LongType())]
    )

    def counter(key, pdfs, state: GroupState):
        n, tot = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            # exact: value has 2 decimals; per-row FLOOR(x*1e4+0.5) → int64
            # (same anchor expression as the batch oracle — numpy .round()
            # is half-even, the oracle's FLOOR(+0.5) is half-up; fixture
            # doubles never land on exact ties but keep them identical)
            tot += int(np.floor(pdf["value"] * 10000 + 0.5).astype("int64").sum())
        state.update((n, tot))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_scaled": [tot]})

    counted = ev.groupBy("user_id").applyInPandasWithState(
        counter, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
    out = run_to_memory(counted, "update")
    # One emission per (user, micro-batch); the final state per user is the
    # max n_events row (counters are monotone).
    final = out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("total_scaled").alias("total_scaled")
    )
    return final.select(
        "user_id",
        "n_events",
        "total_scaled",
        (F.col("total_scaled") / 1e4).alias("total_value"),
    ).orderBy("user_id")


@register(
    "S-JOIN-01",
    sql="SELECT c.event_id AS click_id, p.event_id AS purchase_id "
    f"FROM {EVENTS_US} c JOIN {EVENTS_US} p "
    "ON c.user_id = p.user_id AND c.event_type = 'click' "
    "AND p.event_type = 'purchase' "
    "AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE "
    "ORDER BY click_id, purchase_id",
    mode="stream",
)
def s_join_01(spark, sf):
    """Stream-stream inner join with watermarks on both sides: purchases
    attributed to a prior click of the same user within 30 minutes.
    Two-sided watermarks + the time-range join condition let Spark bound
    both join states (old rows are evicted once the other side's
    watermark passes) — the only state-safe shape at unbounded scale.
    Final output ≡ the batch range join (oracle)."""
    clicks = (
        events_stream(spark, sf)
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        events_stream(spark, sf)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTE")),
        "inner",
    )
    out = run_to_memory(joined.select("click_id", "purchase_id"), "append")
    return out.orderBy("click_id", "purchase_id")


@register(
    "S-SINK-01",
    sql="SELECT event_id, event_type FROM events ORDER BY event_id",
    mode="stream",
)
def s_sink_01(spark, sf):
    """writeStream → parquet file sink (append) → re-read: the sink holds
    exactly the input projection."""
    ev = events_stream(spark, sf).select("event_id", "event_type")
    sink_dir = run_to_parquet(ev, "append")
    return spark.read.parquet(sink_dir).orderBy("event_id")


@register(
    "S-SINK-02",
    sql="SELECT user_id, COUNT(*) AS n_events, "
    "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 1e2 AS sv "
    "FROM events GROUP BY user_id ORDER BY user_id",
    mode="stream",
)
def s_sink_02(spark, sf):
    """foreachBatch sink: incremental per-user upsert across micro-batches
    (4 time-ordered files, one per trigger). Each batch computes partial
    (count, int64-cents sum) aggregates and MERGEs them into a versioned
    parquet target (read current version → union → re-aggregate → write
    next version — the dependency-free stand-in for MERGE INTO a
    transactional table). Versions are keyed by ``batch_id`` — batch k
    reads v{k} and overwrites v{k+1} — so a retried micro-batch
    idempotently rewrites its own version instead of double-counting;
    that is what upgrades foreachBatch's at-least-once delivery to
    exactly-once target state. Final target state
    ≡ the batch per-user aggregate (oracle)."""
    import os
    import shutil

    base = scratch_dir("stream_fb")
    state = {"last": 0}
    ev = events_stream(spark, sf, n_files=4, max_files_per_trigger=1)

    def upsert(batch_df, batch_id):
        part = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))).alias("sv_c"),
        )
        if batch_id > 0:
            cur = batch_df.sparkSession.read.parquet(os.path.join(base, f"v{batch_id}"))
            part = (
                cur.unionByName(part)
                .groupBy("user_id")
                .agg(F.sum("n_events").alias("n_events"), F.sum("sv_c").alias("sv_c"))
            )
        part.write.mode("overwrite").parquet(os.path.join(base, f"v{batch_id + 1}"))
        state["last"] = max(state["last"], batch_id + 1)

    run_foreach_batch(ev.select("user_id", "value"), upsert)
    out = (
        spark.read.parquet(os.path.join(base, f"v{state['last']}"))
        .select("user_id", "n_events", (F.col("sv_c") / 1e2).alias("sv"))
        .orderBy("user_id")
    )
    out = out.localCheckpoint()  # materialize before the temp dir is removed
    shutil.rmtree(base, ignore_errors=True)
    return out


@register(
    "S-JOIN-02",
    sql="SELECT c_mktsegment, COUNT(*) AS n, "
    "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 1e2 AS sv "
    f"FROM {EVENTS_US} e JOIN customer ON user_id = c_custkey "
    "GROUP BY c_mktsegment ORDER BY c_mktsegment",
    mode="stream",
)
def s_join_02(spark, sf):
    """Stream-static enrichment join — the most common streaming shape:
    events enriched against a (broadcastable) dimension table, then
    aggregated by a dim attribute. The static side re-plans per
    micro-batch (picking up dim updates); no watermark is needed because
    static rows never expire. Final state ≡ the batch join+rollup."""
    from dask_xgboost_spark.sources import load

    ev = events_stream(spark, sf).select("user_id", "value")
    cust = F.broadcast(load(spark, sf, "customer").select("c_custkey", "c_mktsegment"))
    agg = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))) / 1e2).alias("sv"),
        )
    )
    out = run_to_memory(agg, "complete")
    return out.orderBy("c_mktsegment")


@register(
    "S-GEN-01",
    sql="SELECT CAST(range % 10 AS BIGINT) AS k, COUNT(*) AS n, "
    "CAST(SUM(range) AS BIGINT) AS sv FROM range(1000) GROUP BY k ORDER BY k",
    mode="stream",
)
def s_gen_01(spark, sf):
    """Rate-source generation demo: the ``rate-micro-batch`` source emits
    a DETERMINISTIC value sequence per batch (unlike plain ``rate``,
    which is wall-clock-paced), so one triggered batch of 1000 rows is
    exactly values 0..999 — generated load that is still hash-checkable.
    This is the streaming twin of G-GEN-01 (synthetic sources): derived
    key + grouped count/sum over generated rows."""
    import shutil
    import uuid

    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 1000)
        .option("numPartitions", 4)
        .option("startTimestamp", 0)
        .load()
    )
    agg = (
        src.withColumn("k", F.col("value") % 10)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    )
    name = "dxs_gen_" + uuid.uuid4().hex[:12]
    ckpt = scratch_mkdtemp("ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(once=True)  # rate-micro-batch has no end → exactly one batch
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name).orderBy("k")


@register(
    "S-GEN-02",
    sql="SELECT CAST(range % 10 AS BIGINT) AS k, COUNT(*) AS n, "
    "CAST(SUM(range) AS BIGINT) AS sv FROM range(1000) GROUP BY k ORDER BY k",
    mode="stream",
)
def s_gen_02(spark, sf):
    """Custom STREAMING Python Data Source (sources/pydatasource.py
    ``pyrangestream``): the micro-batch twin of Q-SCAN-11. The source's
    ``latestOffset`` advances a deterministic integer watermark one
    batch at a time (10 batches × 100 rows, capped at 1000);
    ``partitions(start, end)`` slices each batch across 4 executor-side
    readers; offsets are JSON dicts Spark checkpoints, so restart-resume
    follows the same offset-replay contract as a Kafka source. Drained
    with ``processAllAvailable`` (the cap makes the stream idle), final
    grouped state ≡ the batch oracle over range(1000)."""
    import shutil
    import uuid

    from dask_xgboost_spark.sources.pydatasource import register_python_sources

    register_python_sources(spark)
    src = (
        spark.readStream.format("pyrangestream")
        .option("rowsPerBatch", 100)
        .option("maxRows", 1000)
        .option("numPartitions", 4)
        .load()
    )
    agg = (
        src.withColumn("k", F.col("value") % 10)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    )
    name = "dxs_pygen_" + uuid.uuid4().hex[:12]
    ckpt = scratch_mkdtemp("ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        # The watermark caps at maxRows, so "all available" is finite.
        q.processAllAvailable()
    finally:
        q.stop()
    shutil.rmtree(ckpt, ignore_errors=True)
    return spark.table(name).orderBy("k")


@register(
    "S-STATE-03",
    sql="SELECT user_id, COUNT(*) AS n_events, "
    "MIN(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS mn_c, "
    "MAX(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS mx_c, "
    "MIN(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) / 1e2 AS mn_value, "
    "MAX(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) / 1e2 AS mx_value "
    "FROM events GROUP BY user_id ORDER BY user_id",
    mode="stream",
)
def s_state_03(spark, sf):
    """transformWithState (Spark 4 StatefulProcessor) custom operator:
    per-user running (count, min¢, max¢) across 4 time-ordered
    micro-batches; final state ≡ batch aggregate (oracle).

    Routed by streaming/state_v2.py: the TWS path when the runtime has
    protobuf (real clusters), the applyInPandasWithState twin here —
    both fold through the same _fold_batch, so this entry checks the
    operator's semantics in either environment and state_v2's unit
    tests pin the processor class itself.
    """
    from dask_xgboost_spark.streaming.state_v2 import (
        finalize_emissions,
        per_key_min_max_count,
    )

    ev = events_stream(spark, sf, n_files=4, max_files_per_trigger=1)
    out = run_to_memory(per_key_min_max_count(ev), "update")
    return finalize_emissions(out)


@register(
    "S-STATE-04",
    sql="SELECT DISTINCT event_id FROM events ORDER BY event_id",
    mode="stream",
)
def s_state_04(spark, sf):
    """Bounded-state streaming dedup via dropDuplicatesWithinWatermark:
    unlike plain dropDuplicates (S-STATE-01), whose key state lives
    forever unless an event-time column is part of the key, this operator
    evicts a key's state once the watermark passes its event time — the
    state size is bounded by the watermark window, not the key
    cardinality. That is the only viable dedup contract for an unbounded
    100 TB/day stream where exact duplicates arrive close together
    (retries, at-least-once sources). The replay duplicates every row
    within the same micro-batch, well inside the 2h window, so the final
    output ≡ batch DISTINCT."""
    ev = events_stream(spark, sf, n_files=4, duplicate=True, max_files_per_trigger=1)
    deduped = ev.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out = run_to_memory(deduped.select("event_id"), "append")
    return out.select("event_id").orderBy("event_id")


@register(
    "S-WM-02",
    sql="WITH e AS (SELECT date_trunc('microseconds', ts) AS ts FROM events), "
    "wm AS (SELECT epoch_us(max(ts)) // 1000 - 3600000 AS wm_ms FROM e), "
    "ordered AS (SELECT ts, row_number() OVER (ORDER BY ts) AS rn FROM e), "
    "late AS (SELECT COUNT(DISTINCT date_trunc('hour', ts)) AS d "
    "FROM ordered WHERE rn <= 64), "
    "kept AS (SELECT COUNT(*) AS nw FROM ("
    "SELECT date_trunc('hour', ts) AS h FROM ordered WHERE rn > 64 GROUP BY h"
    ") t, wm WHERE epoch_us(h + INTERVAL 1 HOUR) // 1000 <= wm_ms) "
    "SELECT CAST(kept.nw AS BIGINT) AS n_windows, "
    "CAST(late.d AS BIGINT) AS dropped_updates FROM kept, late",
    mode="stream",
)
def s_wm_02(spark, sf):
    """Late-data DROP ACCOUNTING: the stream replays with its 64 earliest
    rows delivered in the final file — by then the watermark (1 hour
    behind the 30-day max event time) is weeks past their windows, so the
    state operator drops them and reports ``numRowsDroppedByWatermark``.
    The metric counts dropped STATE-INPUT rows, i.e. post-map-side-combine
    window partials, not raw events (the 64 planted rows collapse to
    their 35 distinct hour-windows before reaching the state store —
    verified empirically, and asserted against a batch computation of
    the same distinct-window count in tests/test_golden.py). Returns a
    one-row witness (emitted windows, dropped state updates).

    At 100 TB this metric IS the data-loss audit: watermark drops are
    silent by design, and the only correct operational posture is
    alerting on this counter and routing late data to a reconciliation
    path (e.g. a daily batch backfill over the same parquet).

    Hash-mode oracle: both witness numbers are batch-derivable — the
    drop count is the distinct hour-windows of the 64 earliest rows
    (map-side combine collapses events to window partials before the
    state store), and the emitted-window count follows S-WM-01's
    millisecond watermark rule over the remaining rows. Ties at the
    64-row boundary share a timestamp, hence an hour window, so both
    counts are tie-robust."""
    from dask_xgboost_spark.streaming.core import run_to_memory_progress

    ev = events_stream(spark, sf, n_files=6, max_files_per_trigger=1, late_rows=64)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out, progresses = run_to_memory_progress(agg, "append")
    dropped = sum(
        int(so.get("numRowsDroppedByWatermark", 0))
        for p in progresses
        for so in (p.get("stateOperators") or [])
    )
    return spark.createDataFrame(
        [(out.count(), dropped)], "n_windows long, dropped_updates long"
    )


@register(
    "S-JOIN-03",
    sql="SELECT c.event_id AS click_id, p.event_id AS purchase_id "
    f"FROM {EVENTS_US} c LEFT JOIN {EVENTS_US} p "
    "ON c.user_id = p.user_id AND p.event_type = 'purchase' "
    "AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE "
    "WHERE c.event_type = 'click' "
    "ORDER BY click_id, purchase_id",
    mode="stream",
)
def s_join_03(spark, sf):
    """LEFT OUTER stream-stream join — the hard corner of streaming
    joins: an unmatched left row can only emit its null-padded result
    once the watermark proves no future match can arrive (c_ts + 30 min
    + the join delay), so outer results trail the inner ones by the
    eviction horizon. The replay appends far-future sentinel rows (one
    per side, ids < 0, filtered from the result) that push the final
    watermark past every real row's horizon — otherwise availableNow
    would end with unmatched state still unflushed and the result would
    be silently missing rows. Final output ≡ the batch LEFT JOIN oracle,
    nulls included.

    At scale the same rules as S-JOIN-01 apply (two-sided watermarks
    bound both states); the extra cost of OUTER is keeping unmatched
    left rows in state until eviction — the watermark delay directly
    sizes that state."""
    clicks = (
        events_stream(spark, sf, future_sentinels=["click", "purchase"])
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        events_stream(spark, sf, future_sentinels=["click", "purchase"])
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTE")),
        "left_outer",
    )
    out = run_to_memory(joined.select("click_id", "purchase_id"), "append")
    return out.filter(F.col("click_id") >= 0).orderBy("click_id", "purchase_id")


@register(
    "S-JOIN-04",
    sql="SELECT c.click_id AS click_id, p.purchase_id AS purchase_id FROM "
    "(SELECT event_id AS click_id, user_id, ts FROM "
    f"{EVENTS_US} e WHERE event_type = 'click') c "
    "FULL OUTER JOIN "
    "(SELECT event_id AS purchase_id, user_id AS p_user, ts AS p_ts FROM "
    f"{EVENTS_US} e2 WHERE event_type = 'purchase') p "
    "ON c.user_id = p.p_user AND p.p_ts > c.ts "
    "AND p.p_ts <= c.ts + INTERVAL 30 MINUTE "
    "ORDER BY click_id NULLS FIRST, purchase_id NULLS FIRST",
    mode="stream",
)
def s_join_04(spark, sf):
    """FULL OUTER stream-stream join — completes the join-mode matrix
    (S-JOIN-01 inner, -02 stream-static, -03 left outer): BOTH sides'
    unmatched rows must surface null-padded, each only after the
    watermark proves no counterpart can arrive, so state on both sides
    is held to its eviction horizon and flushed by the same far-future
    sentinel mechanism as S-JOIN-03. Final output ≡ the batch FULL JOIN
    oracle (nulls on either side included; NULLS FIRST ordering stated
    explicitly because the engines' defaults disagree).

    At scale: the symmetric worst case of outer streaming joins — state
    = both sides' unmatched rows within the lateness window; the
    watermark delay is the direct knob on state size, and a missing
    time-range predicate on either side would make state unbounded
    (Spark rejects it)."""
    clicks = (
        events_stream(spark, sf, future_sentinels=["click", "purchase"])
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        events_stream(spark, sf, future_sentinels=["click", "purchase"])
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTE")),
        "full_outer",
    )
    out = run_to_memory(joined.select("click_id", "purchase_id"), "append")
    return (
        out.filter(
            (F.coalesce("click_id", F.lit(0)) >= 0)
            & (F.coalesce("purchase_id", F.lit(0)) >= 0)
        )
        .orderBy(
            F.col("click_id").asc_nulls_first(),
            F.col("purchase_id").asc_nulls_first(),
        )
    )


@register(
    "S-SINK-03",
    sql="SELECT event_type, COUNT(*) AS n, "
    "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sv_c "
    "FROM events GROUP BY event_type ORDER BY event_type",
    mode="stream",
)
def s_sink_03(spark, sf):
    """Streaming → JDBC serving table: the dashboard-refresh pattern
    where a micro-batch aggregate lands in an operational database
    (embedded Derby here — the same JDBC writer path as any external
    DB). Complete-mode output means every trigger rewrites the FULL
    (tiny, key-cardinality-sized) aggregate, so the JDBC overwrite is
    naturally idempotent — a retried batch rewrites the same rows and
    exactly-once state falls out without a staging table; contrast
    S-SINK-02, whose APPEND-side partials need batch-id versioning to
    get the same guarantee. Final table contents ≡ the batch rollup
    oracle.

    At scale: the serving table holds one row per group (bounded by key
    cardinality, not stream length); writes are one short transaction
    per trigger. Never point this pattern at per-EVENT output — that is
    what the parquet/file sinks are for."""
    url = "jdbc:derby:memory:dxs_sink3;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    ev = events_stream(spark, sf, n_files=4, max_files_per_trigger=1)
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)))
        .cast("long")
        .alias("sv_c"),
    )

    def refresh(batch_df, batch_id):
        (
            batch_df.write.format("jdbc")
            .option("url", url)
            .option("dbtable", "serving_rollup")
            .option("driver", driver)
            .mode("overwrite")
            .save()
        )

    run_foreach_batch(agg, refresh, output_mode="complete")
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "serving_rollup")
        .option("driver", driver)
        .load()
        .select("event_type", F.col("n").cast("long").alias("n"), "sv_c")
        .orderBy("event_type")
    )


@register(
    "S-SINK-04",
    # ground truth = the planting rule (event_id % 13 lines malformed)
    sql="SELECT CAST(COUNT(*) FILTER (WHERE event_id % 13 <> 0) AS BIGINT) AS n_good, "
    " CAST(COUNT(*) FILTER (WHERE event_id % 13 = 0) AS BIGINT) AS n_dlq, "
    " CAST(SUM(CASE WHEN event_id % 13 <> 0 THEN user_id END) AS BIGINT) AS user_sum "
    "FROM events",
    mode="stream",
)
def s_sink_04(spark, sf):
    """Streaming dead-letter queue — the quarantine pattern
    (Q-SCAN-14's batch twin) running continuously: a raw JSON-lines
    stream is parsed with ``columnNameOfCorruptRecord``, and each
    micro-batch SPLITS — parsed rows append to the serving sink,
    malformed rows to the DLQ sink with their raw payload preserved for
    replay. One foreachBatch, two appends; nothing is dropped. Final
    accounting (good counts + a value witness from the parsed rows,
    DLQ row count) must equal the planting rule.

    Scale shape: the corrupt column is populated during the ordinary
    parallel parse (no second pass); the split is two filtered
    projections of the same batch DataFrame. DLQ rows keep the raw
    line, so a fixed parser replays the DLQ directory through the same
    pipeline."""
    import os

    base = scratch_dir("stream_dlq")
    raw_dir, good_dir, dlq_dir = (os.path.join(base, d) for d in ("raw", "good", "dlq"))

    from dask_xgboost_spark.sources import load as _load

    ev = _load(spark, sf, "events").select("event_id", "user_id")
    line = F.when(
        F.col("event_id") % 13 == 0,
        F.concat(F.lit('{"event_id": '), F.col("event_id").cast("string"), F.lit(", ")),
    ).otherwise(F.to_json(F.struct("event_id", "user_id")))
    ev.select(line.alias("value")).repartition(4).write.mode("overwrite").text(raw_dir)

    stream = (
        spark.readStream.schema("event_id bigint, user_id bigint, _bad string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .option("maxFilesPerTrigger", 1)
        .json(raw_dir)
    )

    def split(batch_df, batch_id):
        batch_df.filter(F.col("_bad").isNull()).select("event_id", "user_id").write.mode(
            "append"
        ).parquet(good_dir)
        batch_df.filter(F.col("_bad").isNotNull()).select(
            F.col("_bad").alias("raw")
        ).write.mode("append").parquet(dlq_dir)

    ckpt = scratch_mkdtemp("dlq_ckpt_")
    q = (
        stream.writeStream.foreachBatch(split)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    good = spark.read.parquet(good_dir)
    n_dlq = spark.read.parquet(dlq_dir).count()
    return good.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_good"),
        F.lit(n_dlq).cast("bigint").alias("n_dlq"),
        F.sum("user_id").cast("bigint").alias("user_sum"),
    )


@register(
    "S-QUAL-01",
    # rule thresholds chosen so violations are REAL on the fixture:
    # 'error' is not an accepted type; values above 400 exist (max ~490);
    # user_id NOT NULL passes — both gate outcomes exercised
    sql="SELECT 'events.event_type accepted' AS rule, "
    " CAST(COUNT(*) AS BIGINT) AS n_checked, "
    " CAST(COUNT(*) FILTER (WHERE event_type IS NULL OR event_type NOT IN "
    " ('click','view','purchase','signup')) AS BIGINT) AS n_failed "
    "FROM events "
    "UNION ALL "
    "SELECT 'events.user_id NOT NULL', CAST(COUNT(*) AS BIGINT), "
    " CAST(COUNT(*) FILTER (WHERE user_id IS NULL) AS BIGINT) FROM events "
    "UNION ALL "
    "SELECT 'events.value IN [0,400]', CAST(COUNT(*) AS BIGINT), "
    " CAST(COUNT(*) FILTER (WHERE value IS NULL OR value < 0 OR value > 400) AS BIGINT) "
    "FROM events ORDER BY rule",
    mode="stream",
)
def s_qual_01(spark, sf):
    """Continuous expectation gate — Q-QUAL-03's streaming twin: every
    micro-batch evaluates the declarative rule set (accepted values,
    NOT NULL, numeric range) and APPENDS its per-batch
    (batch_id, rule, n_checked, n_failed) metrics to a metrics table;
    the report over the metrics table must equal the batch oracle over
    the whole input, because counts are associative across batches.
    This is how data-quality monitoring actually deploys: violations
    surface within one trigger interval (alert on the metrics stream),
    not at the next nightly batch audit.

    Scale shape: rule evaluation is one conditional-aggregate pass over
    each micro-batch (map-side combined, 3 output rows per batch);
    metrics-table growth is O(batches · rules) — a retention sweep
    compacts it in production. Nothing driver-side in the hot loop."""
    import os

    from dask_xgboost_spark.streaming.core import events_stream, run_foreach_batch

    base = scratch_dir("stream_qual")
    metrics_dir = os.path.join(base, "metrics")

    stream = events_stream(spark, sf, n_files=4, max_files_per_trigger=1)

    cnt_if = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731

    def gate(batch_df, batch_id):
        agg = batch_df.agg(
            F.count(F.lit(1)).alias("n"),
            cnt_if(
                F.col("event_type").isNull()
                | ~F.col("event_type").isin("click", "view", "purchase", "signup")
            ).alias("type_bad"),
            cnt_if(F.col("user_id").isNull()).alias("uid_null"),
            cnt_if(
                F.col("value").isNull() | (F.col("value") < 0) | (F.col("value") > 400)
            ).alias("val_oob"),
        )
        (
            agg.select(
                F.lit(batch_id).alias("batch_id"),
                F.explode(
                    F.array(
                        F.struct(
                            F.lit("events.event_type accepted").alias("rule"),
                            F.col("n").cast("bigint").alias("n_checked"),
                            F.col("type_bad").cast("bigint").alias("n_failed"),
                        ),
                        F.struct(
                            F.lit("events.user_id NOT NULL").alias("rule"),
                            F.col("n").cast("bigint").alias("n_checked"),
                            F.col("uid_null").cast("bigint").alias("n_failed"),
                        ),
                        F.struct(
                            F.lit("events.value IN [0,400]").alias("rule"),
                            F.col("n").cast("bigint").alias("n_checked"),
                            F.col("val_oob").cast("bigint").alias("n_failed"),
                        ),
                    )
                ).alias("m"),
            )
            .select("batch_id", "m.*")
            .write.mode("append")
            .parquet(metrics_dir)
        )

    run_foreach_batch(stream, gate, output_mode="append")

    # materialize before returning: the frame re-reads the per-tag
    # scratch dir lazily, and a second invocation of this operator
    # wipes that dir before a caller collects the first result
    return (
        spark.read.parquet(metrics_dir)
        .groupBy("rule")
        .agg(
            F.sum("n_checked").cast("bigint").alias("n_checked"),
            F.sum("n_failed").cast("bigint").alias("n_failed"),
        )
        .orderBy("rule")
        .localCheckpoint()
    )


@register(
    "S-WIN-05",
    sql="WITH b AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS h, event_type, "
    f" COUNT(*) AS n FROM {EVENTS_US} e GROUP BY h, event_type), "
    "r AS (SELECT h, event_type, n, "
    " ROW_NUMBER() OVER (PARTITION BY h ORDER BY n DESC, event_type) AS rnk FROM b) "
    "SELECT h, event_type, CAST(n AS BIGINT) AS n, CAST(rnk AS BIGINT) AS rnk "
    "FROM r WHERE rnk <= 2 ORDER BY h, event_type",
    mode="stream",
)
def s_win_05(spark, sf):
    """Streaming trending top-k: per hourly window, the two most
    frequent event types — the live "what's trending" board. The
    STREAM maintains only the additive (window, type, count) state
    (mergeable, watermark-evictable); the RANKING runs as a serving
    query over that continuously-maintained state table, because
    ranking is not an associative aggregate and does not belong in
    stream state — the same state/serving split S-SINK-02's upsert
    sink institutionalizes. Final board ≡ the batch oracle's
    bucket + row_number.

    Scale shape: stream state is O(windows × types); the serving rank
    partitions by window over that bounded table. Tie-break on type
    name keeps the board deterministic cross-engine."""
    from pyspark.sql import Window

    ev = events_stream(spark, sf)
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    out = run_to_memory(agg, "complete")
    w = Window.partitionBy("h").orderBy(F.col("n").desc(), "event_type")
    return (
        out.select(F.col("window.start").alias("h"), "event_type", F.col("n").cast("bigint"))
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 2)
        .orderBy("h", "event_type")
    )


@register(
    "S-SINK-05",
    sql="SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
    " CAST(SUM(user_id) AS BIGINT) AS user_sum, "
    " CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct "
    f"FROM {EVENTS_US} e",
    mode="stream",
)
def s_sink_05(spark, sf):
    """Exactly-once sink via idempotent batch commits — THE pattern that
    turns Spark's at-least-once foreachBatch contract into end-to-end
    exactly-once: every micro-batch writes its data FIRST and then a
    per-batch-id commit marker; a writer invoked with an already-
    committed batch_id is a no-op. The check does the thing reliability
    docs only describe: after the stream completes, the LAST batch's
    write is re-invoked with the same batch_id (a simulated Spark
    retry) — and the sink must be byte-identical, proven by the
    row-count / checksum / distinct-count report matching the batch
    oracle (a duplicated batch would inflate n_rows above n_distinct).

    Scale shape: the marker is one empty file per batch (the same
    idea as Spark's own _spark_metadata commit log); data lands as
    ordinary appends, so the sink scales like any parquet write. The
    data-then-marker order means a crash between the two replays the
    batch — which the idempotence check absorbs, never duplicates."""
    import os

    from dask_xgboost_spark.streaming.core import events_stream, run_foreach_batch

    base = scratch_dir("stream_xonce")
    data_dir = os.path.join(base, "data")
    ledger_dir = os.path.join(base, "ledger")
    replay_dir = os.path.join(base, "last_batch")
    os.makedirs(ledger_dir, exist_ok=True)

    last = {"batch_id": None}

    def committed(batch_id) -> str:
        return os.path.join(ledger_dir, f"batch-{batch_id}.committed")

    def upsert(batch_df, batch_id):
        if os.path.exists(committed(batch_id)):
            return  # retry of an already-committed batch: no-op
        rows = batch_df.select("event_id", "user_id")
        rows.write.mode("append").parquet(data_dir)
        # stash THIS batch's rows (overwrite per batch) so the simulated
        # retry below re-delivers the actual final batch, not the whole
        # table — if the marker guard ever regressed, the sink would
        # inflate by exactly one batch and the count check still fires
        # (r5 advisor finding)
        rows.write.mode("overwrite").parquet(replay_dir)
        with open(committed(batch_id), "w"):
            pass  # marker LAST: crash before this line replays the batch
        last["batch_id"] = batch_id

    stream = events_stream(spark, sf, n_files=4, max_files_per_trigger=1)
    run_foreach_batch(stream, upsert, output_mode="append")

    # simulated retry: re-deliver the final batch under its committed id
    # (at-least-once semantics) — the idempotence guard must no-op
    assert last["batch_id"] is not None, "stream produced no micro-batches"
    replay = spark.read.parquet(replay_dir).select("event_id", "user_id")
    upsert(replay, last["batch_id"])

    sink = spark.read.parquet(data_dir)
    # materialized: the report must survive the scratch tag being wiped
    # by a later invocation before the caller collects
    return sink.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("user_id").cast("bigint").alias("user_sum"),
        F.count_distinct("event_id").cast("bigint").alias("n_distinct"),
    ).localCheckpoint()


@register(
    "S-SINK-06",
    sql="SELECT event_id, CAST(ts AS DATE) AS day, event_type "
    f"FROM {EVENTS_US} e ORDER BY event_id",
    mode="stream",
)
def s_sink_06(spark, sf):
    """PARTITIONED streaming file sink: writeStream.partitionBy(day) —
    the layout decision that makes a continuously-ingested table
    servable: each micro-batch appends only into the day directories
    it touches, and downstream readers prune by partition exactly as
    on a batch-written table (Q-SCAN-05's discipline, maintained
    continuously). The sink holds the full projection; the partition
    column round-trips through the directory encoding (day=... paths)
    and comes back typed DATE.

    Scale shape: partition dirs bound both the ingest blast radius
    (a batch writes |touched days| directories) and the serving scan
    (date filters prune at the listing level). Watch small-files: one
    file per (batch × day) — G-COMPACT-01 is the companion job."""
    import os

    from dask_xgboost_spark.streaming.core import events_stream

    ev = events_stream(spark, sf, n_files=4, max_files_per_trigger=2).select(
        "event_id", F.to_date("ts").alias("day"), "event_type"
    )
    out_dir = scratch_mkdtemp("dxs_psink_")
    ckpt = scratch_mkdtemp("dxs_ckpt_")
    q = (
        ev.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .partitionBy("day")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert any(d.startswith("day=") for d in os.listdir(out_dir)), (
        "expected hive-partitioned day= directories"
    )
    return (
        spark.read.parquet(out_dir)
        .select("event_id", "day", "event_type")
        .orderBy("event_id")
        .localCheckpoint()
    )


@register(
    "S-JOIN-05",
    sql="SELECT c.event_id AS click_id "
    f"FROM {EVENTS_US} c WHERE c.event_type = 'click' AND EXISTS ("
    f"SELECT 1 FROM {EVENTS_US} p WHERE p.event_type = 'purchase' "
    "AND p.user_id = c.user_id AND p.ts > c.ts "
    "AND p.ts <= c.ts + INTERVAL 30 MINUTE) "
    "ORDER BY click_id",
    mode="stream",
)
def s_join_05(spark, sf):
    """LEFT SEMI stream-stream join — completing the streaming join
    matrix (inner S-JOIN-01, left outer S-JOIN-03, full outer
    S-JOIN-04): emit each click AT MOST ONCE as soon as one in-window
    purchase arrives, never duplicated by additional matches — the
    streaming EXISTS. Unmatched clicks simply age out of state at the
    watermark; like the outer joins, the replay's far-future sentinels
    push the final watermark past every real row so availableNow
    terminates with no undecided state.

    Scale shape: state is the same two-sided watermark-bounded buffer
    as the inner join, but the left row can be dropped from state the
    moment it matches (no need to remember it for further matches) —
    semi is the cheapest stateful join mode per matched row."""
    clicks = (
        events_stream(spark, sf, future_sentinels=["click", "purchase"])
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        events_stream(spark, sf, future_sentinels=["click", "purchase"])
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTE")),
        "left_semi",
    )
    out = run_to_memory(joined.select("click_id"), "append")
    return out.filter(F.col("click_id") >= 0).orderBy("click_id")


@register(
    "S-STATE-05",
    sql="WITH l AS (SELECT user_id, ts, CASE WHEN LAG(ts) OVER w IS NULL "
    "OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000 "
    "THEN 1 ELSE 0 END AS brk "
    f"FROM {EVENTS_US} e WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
    "s AS (SELECT user_id, ts, SUM(brk) OVER ("
    "PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM l) "
    "SELECT user_id, MIN(ts) AS s_start, MAX(ts) AS s_end, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM s "
    "GROUP BY user_id, sid ORDER BY user_id, s_start",
    mode="stream",
)
def s_state_05(spark, sf):
    """Timeout-driven session emission — the canonical custom stateful
    operator, exercising the one applyInPandasWithState path nothing
    else in §2D touches: EVENT-TIME TIMEOUTS. Each user's open session
    lives in state; arriving batches extend it or close it on a 30-min
    gap (emitting the closed record), and a session with NO successor
    event is closed by the STATE STORE itself when the watermark passes
    its last-event + gap — ``state.hasTimedOut``, the mechanism that
    turns "the user left" (an absence of data) into an emitted fact.
    Far-future sentinel rows (ids < 0, filtered from output) push the
    final watermark so availableNow terminates with every timeout
    fired; output ≡ the batch gaps-and-islands oracle with session
    start/end/count per record.

    Scale shape: state is ONE open session per active user (the
    minimum possible for sessionization), evicted by its own timeout —
    state size tracks concurrent activity, not history. The native
    session_window (S-WIN-03) is preferable when a plain aggregate per
    session suffices; this operator is the template for session
    payloads the aggregate form can't build (ordered event lists,
    per-session models)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    GAP_US = 1800 * 1_000_000

    ev = (
        events_stream(
            spark, sf, n_files=4, max_files_per_trigger=1,
            future_sentinels=["click"],
        )
        .withWatermark("ts", "1 second")
        .select("user_id", "ts")
    )

    out_schema = "user_id bigint, s_start_us bigint, s_end_us bigint, n bigint"
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("end_us", LongType()),
            StructField("n", LongType()),
        ]
    )

    def sessionize(key, pdfs, state: GroupState):
        import pandas as pd

        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "s_start_us": [start],
                 "s_end_us": [end], "n": [n]}
            )
            return
        ts_us = []
        for pdf in pdfs:
            # exact epoch-µs, the Q-WIN-08 discipline
            ts_us.extend(int(t.value) // 1000 for t in pdf["ts"])
        ts_us.sort()
        cur = state.get if state.exists else None
        closed = []
        for t in ts_us:
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] > GAP_US:
                closed.append(cur)
                cur = (t, t, 1)
            else:
                cur = (cur[0], t, cur[2] + 1)
        state.update(cur)
        # the store closes this session if no event lands before end+gap
        state.setTimeoutTimestamp(cur[1] // 1000 + 1800 * 1000 + 1)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "s_start_us": [c[0] for c in closed],
                    "s_end_us": [c[1] for c in closed],
                    "n": [c[2] for c in closed],
                }
            )

    sessions = ev.groupBy("user_id").applyInPandasWithState(
        sessionize, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    out = run_to_memory(sessions, "append")
    return (
        out.filter(F.col("user_id") >= 0)
        .select(
            "user_id",
            F.timestamp_micros(F.col("s_start_us")).alias("s_start"),
            F.timestamp_micros(F.col("s_end_us")).alias("s_end"),
            "n",
        )
        .orderBy("user_id", "s_start")
    )


@register(
    "S-SINK-07",
    sql="SELECT sink, CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types, "
    "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) "
    "  AS sum_value_c FROM ("
    "SELECT CASE WHEN value < 2 OR event_type = 'error' "
    "            THEN 'dlq' ELSE 'good' END AS sink, event_type, value "
    f"FROM {EVENTS_US}) GROUP BY sink ORDER BY sink",
    mode="stream",
)
def s_sink_07(spark, sf):
    """Dead-letter-queue routing — the reliability pattern between
    S-QUAL-01's gate (which only REPORTS violations) and a production
    ingest: every micro-batch SPLITS on the validation rule (here:
    value < 2 or event_type = 'error' → DLQ), good rows append to the
    serving sink, bad rows append — with full payload — to the DLQ for
    replay after the producer is fixed. Nothing is dropped: the oracle
    checks good + dlq counts AND per-sink value checksums against the
    batch-computed split of the same table, so a row lost between the
    two writes would surface as a hash mismatch, not a silent gap.

    Scale shape: the split is two map-only filters of the SAME batch
    frame (one scan each, no shuffle); per-batch files append into two
    independent directories, so DLQ bursts never block the good path.
    At 100 TB/day the DLQ dir is small by construction — if it isn't,
    the pipeline is the bug and the DLQ is the evidence."""
    import os

    good_dir = scratch_mkdtemp("dxs_dlq_good_")
    dlq_dir = scratch_mkdtemp("dxs_dlq_bad_")
    ev = events_stream(spark, sf, n_files=4, max_files_per_trigger=2)
    bad = F.col("value") < 2
    bad = bad | (F.col("event_type") == "error")

    def route(batch_df, batch_id):
        batch_df.filter(~bad).write.mode("append").parquet(good_dir)
        batch_df.filter(bad).write.mode("append").parquet(dlq_dir)

    run_foreach_batch(ev, route, output_mode="append")
    assert os.listdir(dlq_dir), "expected dead-lettered rows in the fixture"
    g = spark.read.parquet(good_dir).withColumn("sink", F.lit("good"))
    d = spark.read.parquet(dlq_dir).withColumn("sink", F.lit("dlq"))
    return (
        g.unionByName(d)
        .groupBy("sink")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.count_distinct("event_type").cast("bigint").alias("n_types"),
            F.sum(_cents("value")).cast("bigint").alias("sum_value_c"),
        )
        .orderBy("sink")
        .localCheckpoint()
    )


@register(
    "S-STATE-06",
    sql="SELECT event_id FROM ("
    "  SELECT event_id, ROW_NUMBER() OVER ("
    "    PARTITION BY user_id, date_trunc('hour', ts) "
    "    ORDER BY ts, event_id) AS rn "
    f"  FROM {EVENTS_US}) "
    "WHERE rn <= 3 ORDER BY event_id",
    mode="stream",
)
def s_state_06(spark, sf):
    """Stateful per-key QUOTA gate (rate limiting at ingest): each
    (user, hour) may pass at most K=3 events; the rest are shed — the
    abuse-control / fair-use primitive every ingest edge runs, and a
    stateful FILTER rather than an aggregate (state is one counter per
    active key, the output is the surviving rows themselves). The
    batch oracle is exact because admission is defined in EVENT-time
    order (first K by (ts, event_id) per user-hour), which the
    time-ordered file replay + per-batch sort reproduce: the streaming
    gate admits exactly the rows a batch row_number() ≤ K would.

    Scale shape: state per ACTIVE (user, hour) is a single int64;
    production deployments add an event-time timeout to evict past
    hours (S-STATE-05's mechanism — omitted here so the availableNow
    replay stays minimal, and noted because unbounded key retention is
    the quota gate's one real operational risk)."""
    from pyspark.sql.types import LongType, StructField, StructType

    K = 3

    ev = (
        events_stream(spark, sf, n_files=4, max_files_per_trigger=1)
        .withWatermark("ts", "1 second")
        .select(
            "user_id",
            F.date_trunc("hour", "ts").alias("h"),
            "ts",
            "event_id",
        )
    )

    state_schema = StructType([StructField("n", LongType())])

    def gate(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - NoTimeout mode
            state.remove()
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        n = state.get[0] if state.exists else 0
        take = max(0, K - n)
        admitted = rows.head(take)
        state.update((n + len(rows),))
        if len(admitted):
            yield pd.DataFrame({"event_id": admitted["event_id"].values})

    out = ev.groupBy("user_id", "h").applyInPandasWithState(
        gate,
        outputStructType="event_id bigint",
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    result = run_to_memory(out, "append")
    return result.orderBy("event_id").localCheckpoint()


@register(
    "S-JOIN-06",
    sql="SELECT e.event_id, e.event_type "
    f"FROM {EVENTS_US} e WHERE NOT EXISTS ("
    "  SELECT 1 FROM events b "
    "  WHERE b.event_type = 'error' AND b.user_id = e.user_id) "
    "ORDER BY e.event_id",
    mode="stream",
)
def s_join_06(spark, sf):
    """Stream-static LEFT ANTI join — blocklist / ledger filtering AT
    INGEST: every micro-batch drops rows whose user appears on a
    static suppression list (here: users who ever produced an error
    event — an abuse list, GDPR suppression list, or L-DEDUP-12-style
    already-processed ledger all have this shape). The anti join is
    the streaming twin of the batch decontamination/ledger ops: data
    never reaches the sink if its key is listed, rather than being
    cleaned afterwards.

    Scale shape: the static side is key-cardinality and broadcast per
    micro-batch (re-planned each batch, so a REFRESHED blocklist file
    takes effect on the next trigger without restarting the query);
    the stream side stays map-only — no stateful join state at all,
    the cheapest possible streaming join mode."""
    from dask_xgboost_spark.sources import load

    blocklist = (
        load(spark, sf, "events")
        .filter(F.col("event_type") == "error")
        .select("user_id")
        .distinct()
    )
    ev = events_stream(spark, sf, n_files=4, max_files_per_trigger=2).select(
        "event_id", "event_type", "user_id"
    )
    kept = ev.join(F.broadcast(blocklist), "user_id", "left_anti").select(
        "event_id", "event_type"
    )
    result = run_to_memory(kept, "append")
    return result.orderBy("event_id").localCheckpoint()
