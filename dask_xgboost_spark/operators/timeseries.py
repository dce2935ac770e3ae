"""Time-series gap filling and interpolation (SURVEY.md §2C Q-TS-*).

The hypertable operations a time-series warehouse layers over plain
group-by rollups (TimescaleDB's ``time_bucket_gapfill`` + ``locf`` +
``interpolate``): materialize a dense per-key hourly spine, then fill
the holes — carry the last observation forward, or interpolate linearly
between the flanking observations.

Scale shape (100 TB): the spine is |keys| × |buckets| rows GENERATED
per-key (``sequence`` + ``explode`` — no shuffle to build it); the only
shuffle is the (key, bucket) left join of observations onto the spine,
and the fill itself is a per-key window — one partitioning reused by
both steps. Nothing driver-side.

Cross-engine exactness: observed values are carried as fixed-point
cents (BIGINT); interpolation uses the integer identity
``(pv·(nh−h) + nv·(h−ph)) // (nh−ph)`` over epoch-hour integers, which
both engines evaluate exactly.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_xgboost_spark.functions import EVENTS_US
from dask_xgboost_spark.registry import register
from dask_xgboost_spark.sources import load

# Shared observed-rollup: per (event_type, hour) fixed-point sum of value,
# deliberately sparsified by keeping only hours whose hour-of-day is NOT
# ≡ 2 (mod 5) so the fill paths have real holes to fill at every SF.
_OBSERVED_SQL = f"""
SELECT event_type,
       date_trunc('hour', ts) AS h,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sv_cents
FROM {EVENTS_US} e
GROUP BY event_type, h
HAVING (CAST(EXTRACT(hour FROM h) AS BIGINT) % 5) <> 2
"""

_SPINE_SQL = f"""
SELECT k.event_type, s.h
FROM (SELECT DISTINCT event_type FROM events) k
CROSS JOIN (
    SELECT UNNEST(generate_series(
        (SELECT MIN(date_trunc('hour', ts)) FROM {EVENTS_US} e),
        (SELECT MAX(date_trunc('hour', ts)) FROM {EVENTS_US} e),
        INTERVAL 1 HOUR)) AS h
) s
"""

_TS01_SQL = f"""
WITH obs AS ({_OBSERVED_SQL}),
spine AS ({_SPINE_SQL}),
joined AS (
    SELECT spine.event_type, spine.h, obs.sv_cents,
           CAST(obs.sv_cents IS NOT NULL AS INT) AS observed
    FROM spine LEFT JOIN obs
      ON spine.event_type = obs.event_type AND spine.h = obs.h
)
SELECT event_type, h,
       LAST_VALUE(sv_cents IGNORE NULLS) OVER (
           PARTITION BY event_type ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sv_locf,
       observed
FROM joined
ORDER BY event_type, h
"""


def _observed(spark, sf):
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("h")
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)))
            .cast("bigint")
            .alias("sv_cents")
        )
        .filter((F.hour("h").cast("bigint") % 5) != 2)
    )


def _spine(spark, sf):
    ev = load(spark, sf, "events")
    bounds = ev.agg(
        F.min(F.date_trunc("hour", "ts")).alias("lo"),
        F.max(F.date_trunc("hour", "ts")).alias("hi"),
    )
    keys = ev.select("event_type").distinct()
    # |keys| × |hours| spine, generated executor-side: sequence() builds
    # the hour array inside the row, explode fans it out — no shuffle
    return (
        keys.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )


@register("Q-TS-01", sql=_TS01_SQL)
def q_ts_01(spark, sf):
    """Hourly gap-fill + LOCF (last observation carried forward) per
    event_type — ``time_bucket_gapfill(...) + locf()``. The spine join
    and the fill window share the (event_type, h) partitioning; holes
    before the first observation stay NULL (standard locf contract).
    ``observed`` flags which rows are real vs filled."""
    obs = _observed(spark, sf)
    spine = _spine(spark, sf)
    joined = spine.join(obs, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        "sv_cents",
        F.col("sv_cents").isNotNull().cast("int").alias("observed"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        joined.withColumn("sv_locf", F.last("sv_cents", ignorenulls=True).over(w))
        .select("event_type", "h", "sv_locf", "observed")
        .orderBy("event_type", "h")
    )


_TS02_SQL = f"""
WITH obs AS ({_OBSERVED_SQL}),
spine AS ({_SPINE_SQL}),
joined AS (
    SELECT spine.event_type, spine.h, obs.sv_cents
    FROM spine LEFT JOIN obs
      ON spine.event_type = obs.event_type AND spine.h = obs.h
),
flank AS (
    SELECT event_type, h, sv_cents,
           CAST(epoch(h) AS BIGINT) // 3600 AS hn,
           LAST_VALUE(sv_cents IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
           LAST_VALUE(CASE WHEN sv_cents IS NOT NULL
                           THEN CAST(epoch(h) AS BIGINT) // 3600 END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ph,
           FIRST_VALUE(sv_cents IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
           FIRST_VALUE(CASE WHEN sv_cents IS NOT NULL
                            THEN CAST(epoch(h) AS BIGINT) // 3600 END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nh
    FROM joined
)
SELECT event_type, h,
       CASE WHEN sv_cents IS NOT NULL THEN sv_cents
            WHEN pv IS NOT NULL AND nv IS NOT NULL
            THEN CAST((pv * (nh - hn) + nv * (hn - ph)) // (nh - ph) AS BIGINT)
            ELSE NULL END AS sv_interp,
       CAST(sv_cents IS NOT NULL AS INT) AS observed
FROM flank
ORDER BY event_type, h
"""


@register("Q-TS-02", sql=_TS02_SQL)
def q_ts_02(spark, sf):
    """Hourly gap-fill + LINEAR interpolation per event_type —
    ``time_bucket_gapfill(...) + interpolate()``. Each hole takes
    ``(pv·(nh−h) + nv·(h−ph)) // (nh−ph)`` from its flanking
    observations (integer-exact in both engines); holes before the
    first / after the last observation stay NULL. Same single
    (event_type, h) partitioning as Q-TS-01 — the two flanking windows
    reuse it."""
    obs = _observed(spark, sf)
    spine = _spine(spark, sf)
    joined = spine.join(obs, ["event_type", "h"], "left")
    hn = (F.unix_timestamp("h").cast("bigint") / F.lit(3600)).cast("bigint")
    joined = joined.withColumn("hn", hn)
    wp = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    hn_obs = F.when(F.col("sv_cents").isNotNull(), F.col("hn"))
    flank = (
        joined.withColumn("pv", F.last("sv_cents", ignorenulls=True).over(wp))
        .withColumn("ph", F.last(hn_obs, ignorenulls=True).over(wp))
        .withColumn("nv", F.first("sv_cents", ignorenulls=True).over(wn))
        .withColumn("nh", F.first(hn_obs, ignorenulls=True).over(wn))
    )
    interp = (
        F.col("pv") * (F.col("nh") - F.col("hn"))
        + F.col("nv") * (F.col("hn") - F.col("ph"))
    )
    span = F.col("nh") - F.col("ph")
    filled = F.when(F.col("sv_cents").isNotNull(), F.col("sv_cents")).otherwise(
        F.when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.floor(interp / span).cast("bigint"),
        )
    )
    return (
        flank.select(
            "event_type",
            "h",
            filled.alias("sv_interp"),
            F.col("sv_cents").isNotNull().cast("int").alias("observed"),
        )
        .orderBy("event_type", "h")
    )
