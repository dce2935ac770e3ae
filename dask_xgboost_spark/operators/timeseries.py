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

from dask_xgboost_spark.functions import EVENTS_US, cents, sql_cents
from dask_xgboost_spark.plans.scale import bounded_sort
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


def gapfill(
    obs,
    key_cols: list[str],
    time_col: str,
    value_col: str,
    step: str = "INTERVAL 1 HOUR",
    step_seconds: int = 3600,
    how: str = "locf",
):
    """Public gap-fill API over any (keys, bucket-timestamp, value) frame:
    densify each key's series onto the global [min, max] bucket spine and
    fill the holes.

    ``how='locf'``   → ``<value_col>_locf``: last observation carried
                       forward; leading holes stay NULL.
    ``how='interp'`` → ``<value_col>_interp``: integer-exact linear
                       interpolation ``(pv·(nh−h) + nv·(h−ph)) div
                       (nh−ph)`` between the flanking observations
                       (value must be an integer carrier, e.g. cents);
                       leading/trailing holes stay NULL.

    Adds ``observed`` (1 = real row, 0 = filled). One shuffle for the
    spine join; the fill windows reuse the same (keys, time)
    partitioning. The spine is generated executor-side (sequence +
    explode), never shuffled."""
    bounds = obs.agg(
        F.min(time_col).alias("_lo"), F.max(time_col).alias("_hi")
    )
    keys = obs.select(*key_cols).distinct()
    spine = keys.crossJoin(F.broadcast(bounds)).select(
        *key_cols,
        F.explode(F.sequence("_lo", "_hi", F.expr(step))).alias(time_col),
    )
    joined = spine.join(obs, [*key_cols, time_col], "left")
    observed = F.col(value_col).isNotNull().cast("int").alias("observed")
    if how == "locf":
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(time_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return joined.select(
            *key_cols,
            time_col,
            F.last(value_col, ignorenulls=True).over(w).alias(f"{value_col}_locf"),
            observed,
        )
    if how != "interp":
        raise ValueError(f"how must be 'locf' or 'interp', got {how!r}")
    tn = (
        F.unix_timestamp(F.col(time_col)).cast("bigint") / F.lit(step_seconds)
    ).cast("bigint")
    joined = joined.withColumn("_tn", tn)
    wp = (
        Window.partitionBy(*key_cols)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wn = (
        Window.partitionBy(*key_cols)
        .orderBy(time_col)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    tn_obs = F.when(F.col(value_col).isNotNull(), F.col("_tn"))
    flank = (
        joined.withColumn("_pv", F.last(value_col, ignorenulls=True).over(wp))
        .withColumn("_ph", F.last(tn_obs, ignorenulls=True).over(wp))
        .withColumn("_nv", F.first(value_col, ignorenulls=True).over(wn))
        .withColumn("_nh", F.first(tn_obs, ignorenulls=True).over(wn))
    )
    interp = F.col("_pv") * (F.col("_nh") - F.col("_tn")) + F.col("_nv") * (
        F.col("_tn") - F.col("_ph")
    )
    span = F.col("_nh") - F.col("_ph")
    filled = F.when(F.col(value_col).isNotNull(), F.col(value_col)).otherwise(
        F.when(
            F.col("_pv").isNotNull() & F.col("_nv").isNotNull(),
            F.floor(interp / span).cast("bigint"),
        )
    )
    return flank.select(
        *key_cols,
        time_col,
        filled.alias(f"{value_col}_interp"),
        observed,
    )


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


@register("Q-TS-01", sql=_TS01_SQL)
def q_ts_01(spark, sf):
    """Hourly gap-fill + LOCF (last observation carried forward) per
    event_type — ``time_bucket_gapfill(...) + locf()``. The spine join
    and the fill window share the (event_type, h) partitioning; holes
    before the first observation stay NULL (standard locf contract).
    ``observed`` flags which rows are real vs filled."""
    return (
        gapfill(_observed(spark, sf), ["event_type"], "h", "sv_cents", how="locf")
        .select("event_type", "h", F.col("sv_cents_locf").alias("sv_locf"), "observed")
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
    return (
        gapfill(_observed(spark, sf), ["event_type"], "h", "sv_cents", how="interp")
        .select(
            "event_type", "h", F.col("sv_cents_interp").alias("sv_interp"), "observed"
        )
        .orderBy("event_type", "h")
    )


_TS03_SQL = f"""
WITH pts AS (
    SELECT user_id, date_trunc('microseconds', ts) AS ts,
           CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_c
    FROM {EVENTS_US} e WHERE user_id < 200
),
seg AS (
    SELECT user_id, v_c,
           CAST(epoch_us(ts) AS BIGINT) AS t_us,
           LEAD(CAST(epoch_us(ts) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, v_c) AS nxt_us
    FROM pts
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       CAST(SUM(v_c * (nxt_us - t_us)) AS BIGINT) AS area_us_c,
       CAST(MAX(nxt_us) - MIN(t_us) AS BIGINT) AS span_us,
       CAST(SUM(v_c * (nxt_us - t_us)) // (MAX(nxt_us) - MIN(t_us)) AS BIGINT)
           AS twa_c
FROM seg WHERE nxt_us IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


@register("Q-TS-03", sql=_TS03_SQL)
def q_ts_03(spark, sf):
    """Time-weighted average (TimescaleDB ``time_weight('locf', ...)``):
    each observation holds until the next one, so the average is
    Σ vᵢ·Δtᵢ / Σ Δtᵢ — the honest mean of an irregularly-sampled signal
    (a plain AVG over-weights chatty periods). One LEAD window gives the
    segment lengths; everything stays integer (cents × µs), division is
    integer-exact in both engines.

    Scale shape: one shuffle on the key for the LEAD window, one
    aggregate reusing that partitioning. At 100 TB with per-day
    partitions, carry each partition's first point into the previous
    day's close (the standard boundary hand-off) — same algebra."""
    pts = (
        load(spark, sf, "events")
        .filter(F.col("user_id") < 200)
        .select(
            "user_id",
            "ts",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v_c"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "v_c")
    seg = pts.select(
        "user_id",
        "v_c",
        F.unix_micros("ts").alias("t_us"),
        F.lead(F.unix_micros("ts")).over(w).alias("nxt_us"),
    ).filter(F.col("nxt_us").isNotNull())
    area = F.sum(F.col("v_c") * (F.col("nxt_us") - F.col("t_us")))
    span = F.max("nxt_us") - F.min("t_us")
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            area.cast("long").alias("area_us_c"),
            span.cast("long").alias("span_us"),
            F.floor(area / span).cast("long").alias("twa_c"),
        )
        .orderBy("user_id")
    )


TS04_OHLC_SQL = (
    "WITH e AS (SELECT date_trunc('hour', ts) AS bucket, ts, event_id, value "
    f"FROM {EVENTS_US} ev), "
    "r AS (SELECT bucket, value, "
    " ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY ts, event_id) AS rn_a, "
    " ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY ts DESC, event_id DESC) AS rn_d "
    "FROM e) "
    "SELECT bucket, "
    f" {sql_cents('MAX(CASE WHEN rn_a = 1 THEN value END)')} AS open_c, "
    f" {sql_cents('MAX(value)')} AS high_c, "
    f" {sql_cents('MIN(value)')} AS low_c, "
    f" {sql_cents('MAX(CASE WHEN rn_d = 1 THEN value END)')} AS close_c, "
    " COUNT(*) AS n_ticks "
    "FROM r GROUP BY bucket ORDER BY bucket"
)


@register("Q-TS-04", sql=TS04_OHLC_SQL)
def q_ts_04(spark, sf):
    """OHLC downsampling (candlestick bars): per hourly bucket, the
    first (open), max (high), min (low), and last (close) tick value —
    the hypertable rollup TimescaleDB spells first()/last() and every
    market-data pipeline runs continuously.

    Open/close are ONE aggregate each — min/max over a
    (ts, event_id, value) struct whose lexicographic order makes the
    earliest/latest tick win (event_id breaks ts ties, so the result is
    deterministic under any partitioning) — not a window + rn=1 filter,
    which would shuffle-sort every tick; the whole query is a single
    map-side-combinable groupBy. Values are exact int64 cents;
    cents(max(x)) == max(cents(x)) since the mapping is monotone. The
    oracle states the row_number formulation — matching output proves
    the struct-aggregate trick. At 100 TB: one shuffle keyed by bucket;
    partial aggregation bounds map output at O(buckets) per task."""
    ev = load(spark, sf, "events")
    tick = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))
    return (
        ev.select(F.date_trunc("hour", "ts").alias("bucket"), "ts", "event_id", "value")
        .groupBy("bucket")
        .agg(
            cents(F.min(tick)["value"]).alias("open_c"),
            cents(F.max("value")).alias("high_c"),
            cents(F.min("value")).alias("low_c"),
            cents(F.max(tick)["value"]).alias("close_c"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
        # calendar grain (hourly buckets): narrow presentation sort, no range
        # Exchange (plans/scale.bounded_sort, r15 rescreen)
        .transform(bounded_sort, "bucket")
    )


_PROFILE_TOP = 10


@register(
    "Q-TS-05",
    # 24-dim hour-of-day activity profile in exact cents; squared
    # Euclidean distance to user 0's profile stays int64 (≤ ~6e10 at
    # fixture magnitudes; the DECIMAL carrier is the documented upgrade
    # path if per-cell sums approach 2^31.5 cents)
    sql="WITH hours AS (SELECT unnest(range(0, 24)) AS h), "
    f"prof AS (SELECT user_id, EXTRACT(hour FROM ts) AS h, "
    f" SUM({sql_cents('value')}) AS v FROM {EVENTS_US} e GROUP BY user_id, h), "
    "users AS (SELECT DISTINCT user_id FROM events), "
    "dense AS (SELECT u.user_id, hours.h, COALESCE(p.v, 0) AS v "
    " FROM users u CROSS JOIN hours "
    " LEFT JOIN prof p ON p.user_id = u.user_id AND p.h = hours.h), "
    "q AS (SELECT h, v AS qv FROM dense WHERE user_id = 0), "
    "d AS (SELECT dense.user_id, SUM((v - qv) * (v - qv)) AS dist2 "
    " FROM dense JOIN q USING (h) WHERE user_id <> 0 GROUP BY dense.user_id), "
    "r AS (SELECT user_id, dist2, "
    " ROW_NUMBER() OVER (ORDER BY dist2, user_id) AS rnk FROM d) "
    "SELECT user_id, CAST(dist2 AS BIGINT) AS dist2, CAST(rnk AS BIGINT) AS rnk "
    f"FROM r WHERE rnk <= {_PROFILE_TOP} ORDER BY rnk",
)
def q_ts_05(spark, sf):
    """Time-series similarity search over behavioral profiles: each
    entity's event series collapses to a 24-dim hour-of-day activity
    vector (exact cents per hour, missing hours = 0), and the query
    ranks entities by squared Euclidean distance to the query entity's
    profile — the series-to-vector featurization that makes
    distributed time-series search tractable (the same reduction the
    data-series search literature applies before any exact
    re-scoring; L-SIM-01..07 then serve the vector stage at scale).

    Scale shape: the profile build is one map-combined aggregate to a
    (entities × 24)-row feature matrix — the standard feature-matrix
    size, linear in entities; the query profile is a broadcast-sized
    24-row set, so distance is a map-side join + per-entity aggregate.
    No pairwise work: bulk all-vs-all search swaps the broadcast for
    an LSH/IVF stage over the same vectors."""
    from pyspark.sql import functions as F  # noqa: F811

    ev = load(spark, sf, "events")
    prof = ev.groupBy(
        "user_id", F.hour("ts").alias("h")
    ).agg(F.sum(cents("value")).alias("v"))
    users = ev.select("user_id").distinct()
    hours = load(spark, sf, "events").sparkSession.range(24).select(
        F.col("id").cast("int").alias("h")
    )
    dense = (
        users.crossJoin(F.broadcast(hours))
        .join(prof, ["user_id", "h"], "left")
        .select("user_id", "h", F.coalesce("v", F.lit(0)).alias("v"))
    )
    q = dense.filter(F.col("user_id") == 0).select("h", F.col("v").alias("qv"))
    d = (
        dense.filter(F.col("user_id") != 0)
        .join(F.broadcast(q), "h")
        .groupBy("user_id")
        .agg(F.sum((F.col("v") - F.col("qv")) * (F.col("v") - F.col("qv"))).alias("dist2"))
    )
    from pyspark.sql import Window

    w = Window.orderBy("dist2", "user_id")
    return (
        d.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _PROFILE_TOP)
        .select("user_id", F.col("dist2").cast("bigint").alias("dist2"), "rnk")
        .orderBy("rnk")
    )


_TS06_LAGS = 8  # truncation horizon; weights 2^7 .. 2^0

_TS06_NUM = " + ".join(
    f"COALESCE(lag(x, {i}) OVER w, 0) * {2 ** (_TS06_LAGS - 1 - i)}"
    for i in range(_TS06_LAGS)
)
_TS06_DEN = " + ".join(
    f"CASE WHEN lag(x, {i}) OVER w IS NOT NULL THEN {2 ** (_TS06_LAGS - 1 - i)} ELSE 0 END"
    for i in range(_TS06_LAGS)
)

_TS06_SQL = (
    "WITH hourly AS ("
    "  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h, "
    "  CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x "
    f"  FROM {EVENTS_US} e GROUP BY event_type, h) "
    "SELECT event_type, h, x, "
    f"CAST({_TS06_NUM} AS BIGINT) AS ewma_num, "
    f"CAST({_TS06_DEN} AS BIGINT) AS ewma_den, "
    f"CAST({_TS06_NUM} AS DOUBLE) / ({_TS06_DEN}) AS ewma "
    "FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY h) "
    "ORDER BY event_type, h"
)


@register("Q-TS-06", sql=_TS06_SQL)
def q_ts_06(spark, sf):
    """Exponentially-weighted moving average in EXACT integer
    arithmetic: α = 1/2 truncated at 8 lags, so the weights are the
    powers 2^7..2^0 and the smoothed value is an int64 numerator over
    an int64 denominator (adjusted for series starts) — bit-identical
    across engines and aggregation orders, which float EWMA recursion
    (r_t = αx + (1-α)r_{t-1}) never is. Truncation error is bounded by
    2^-8 of the signal, below any monitoring threshold; the derived
    double is the same division on both engines.

    Scale shape: one shuffle to the (event_type, hour) rollup, then a
    single per-key window sort that all 8 LAG reads share (one Window
    operator, one frame). The recursive float form would serialize the
    whole series through state; the truncated form is a fixed-width
    frame read — the difference between a streamable plan and a scan
    dependency chain."""
    hourly = (
        load(spark, sf, "events")
        .groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("h")
        )
        .agg(
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)))
            .cast("bigint")
            .alias("x")
        )
    )
    w = Window.partitionBy("event_type").orderBy("h")
    num = sum(
        F.coalesce(F.lag("x", i).over(w), F.lit(0))
        * F.lit(2 ** (_TS06_LAGS - 1 - i))
        for i in range(_TS06_LAGS)
    )
    den = sum(
        F.when(F.lag("x", i).over(w).isNotNull(), 2 ** (_TS06_LAGS - 1 - i))
        .otherwise(0)
        for i in range(_TS06_LAGS)
    )
    return (
        hourly.select(
            "event_type",
            "h",
            "x",
            num.cast("bigint").alias("ewma_num"),
            den.cast("bigint").alias("ewma_den"),
            (num.cast("double") / den).alias("ewma"),
        )
        .orderBy("event_type", "h")
    )


def merge_intervals(df, keys, start, end, tie_col):
    """Coalesce overlapping-or-touching [start, end) intervals into
    disjoint islands per key group — the public composable form of the
    Q-TS-07 operator (contract coverage stitching, SLA uptime, vacancy
    windows). Returns one row per island: ``keys..., island, ms, me``.

    ``tie_col`` must make (start, end, tie_col) a total order within
    each key group — island ids are then deterministic under any
    partitioning (the determinism contract every window op here obeys).
    Works on dates, timestamps, or plain integers (any ordered type
    where ``>=`` means "touches or overlaps").

    Plan shape: one shuffle on ``keys``, two window passes sharing that
    partitioning (running MAX(end) over preceding rows marks island
    starts — a start-gap test alone is WRONG when an earlier interval
    outlasts a later one), one rollup."""
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(start, end, tie_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = df.select(
        *keys,
        start,
        end,
        F.when(F.max(end).over(w_prev) >= F.col(start), 0)
        .otherwise(1)
        .alias("new_island"),
        tie_col,
    )
    w_run = (
        Window.partitionBy(*keys)
        .orderBy(start, end, tie_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = marked.select(
        *keys,
        F.sum("new_island").over(w_run).alias("island"),
        start,
        end,
    )
    return isl.groupBy(*keys, "island").agg(
        F.min(start).alias("ms"), F.max(end).alias("me")
    )


_TS7_SQL = """
WITH iv AS (
  SELECT o_custkey, o_orderkey,
         CAST(o_orderdate AS DATE) AS s,
         CAST(o_orderdate AS DATE) + 30 AS e
  FROM orders),
marked AS (
  SELECT o_custkey, o_orderkey, s, e,
         CASE WHEN MAX(e) OVER (PARTITION BY o_custkey
                                ORDER BY s, e, o_orderkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) >= s
              THEN 0 ELSE 1 END AS new_island
  FROM iv),
isl AS (
  SELECT o_custkey,
         SUM(new_island) OVER (PARTITION BY o_custkey
                               ORDER BY s, e, o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS island,
         s, e
  FROM marked),
merged AS (
  SELECT o_custkey, island, MIN(s) AS ms, MAX(e) AS me
  FROM isl GROUP BY o_custkey, island)
SELECT o_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(datediff('day', ms, me)) AS BIGINT) AS covered_days,
       CAST(MAX(datediff('day', ms, me)) AS BIGINT) AS max_island_days
FROM merged GROUP BY o_custkey ORDER BY o_custkey
"""


@register("Q-TS-07", sql=_TS7_SQL)
def q_ts_07(spark, sf):
    """Overlapping-interval merge (gaps-and-islands over RANGES): each
    order opens a 30-day validity window; per customer, overlapping or
    touching windows coalesce into islands and the rollup reports how
    many disjoint coverage stretches remain, total covered days, and
    the longest stretch. This is the range twin of Q-WIN-08's
    point-gap sessionization — contract/subscription coverage, SLA
    uptime stitching, and entitlement-window dedup are all this shape,
    and it is NOT expressible as a gap test on starts alone: an
    earlier interval can outlast a later one, hence the running
    MAX(end) over all preceding intervals.

    Determinism: island boundaries depend only on the running max and
    a total (s, e, orderkey) order, so ties in start dates cannot
    reorder results. Touching intervals (prev_max_end == next start)
    merge — coverage semantics, dates are [s, e).

    Scale shape: one shuffle on the island key's partition column
    (customer), one window pass in that same partitioning, then two
    bounded aggregates. Per-customer interval counts are order
    cardinality / customer cardinality — no blowup; 100 TB of orders
    is still one window pass per customer shard."""
    iv = load(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("s"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("e"),
    )
    merged = merge_intervals(iv, ["o_custkey"], "s", "e", "o_orderkey")
    return (
        merged.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.sum(F.datediff("me", "ms")).cast("bigint").alias("covered_days"),
            F.max(F.datediff("me", "ms")).cast("bigint").alias("max_island_days"),
        )
        .orderBy("o_custkey")
    )
