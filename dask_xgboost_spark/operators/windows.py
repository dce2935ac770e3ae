"""Window functions (SURVEY.md §2C Q-WIN-01..06).

All windows are partitioned (per-customer / per-user) so state is bounded
per key and the physical plan is a single shuffle on the partition key +
sorted window evaluation — the scalable shape at 100 TB. Ordering always
ends in a unique key so frames are total-ordered (determinism contract).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_xgboost_spark.functions import EVENTS_US, cents, sql_cents
from dask_xgboost_spark.plans.scale import bounded_sort
from dask_xgboost_spark.registry import register
from dask_xgboost_spark.sources import load


@register(
    "Q-WIN-01",
    sql="SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, drk FROM ("
    "SELECT o_custkey, o_orderkey, o_totalprice, "
    "ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk "
    "FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)"
    ") t WHERE rn <= 3 ORDER BY o_custkey, rn",
)
def q_win_01(spark, sf):
    """Top-3 orders per customer (bench headliner): row_number/rank/dense_rank."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@register(
    "Q-WIN-02",
    sql="SELECT event_id, user_id, "
    "value - LAG(value) OVER w AS delta_prev, "
    "LEAD(value) OVER w - value AS delta_next "
    f"FROM {EVENTS_US} e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) "
    "ORDER BY event_id",
)
def q_win_02(spark, sf):
    """LAG/LEAD per-user deltas (identical double subtraction both engines)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.col("value")
    return (
        load(spark, sf, "events")
        .select(
            "event_id",
            "user_id",
            (v - F.lag(v).over(w)).alias("delta_prev"),
            (F.lead(v).over(w) - v).alias("delta_next"),
        )
        .orderBy("event_id")
    )


@register(
    "Q-WIN-03",
    sql="SELECT event_id, user_id, "
    f"CAST(SUM({sql_cents('value')}) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) / 1e2 AS mov_sum "
    f"FROM {EVENTS_US} e ORDER BY event_id",
)
def q_win_03(spark, sf):
    """3-row moving sum (ROWS frame) in exact int64 cents, emitted as the
    derived double (no DECIMAL output columns in hash-mode queries)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        load(spark, sf, "events")
        .select(
            "event_id",
            "user_id",
            (F.sum(cents("value")).over(w) / 1e2).alias("mov_sum"),
        )
        .orderBy("event_id")
    )


@register(
    "Q-WIN-04",
    sql="SELECT o_orderkey, o_custkey, "
    f"CAST(SUM({sql_cents('o_totalprice')}) OVER ("
    "PARTITION BY o_custkey ORDER BY o_orderdate "
    "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 1e2 AS run_rev "
    "FROM orders ORDER BY o_orderkey",
)
def q_win_04(spark, sf):
    """Running revenue per customer with a RANGE frame — orderdate peers
    share the frame total, so the result is deterministic despite the
    non-unique ordering. int64-cents carrier + derived-double output."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        load(spark, sf, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            (F.sum(cents("o_totalprice")).over(w) / 1e2).alias("run_rev"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "Q-WIN-05",
    sql="SELECT c_custkey, NTILE(4) OVER w AS quartile, PERCENT_RANK() OVER w AS pr "
    "FROM customer WINDOW w AS (ORDER BY c_acctbal, c_custkey) ORDER BY c_custkey",
)
def q_win_05(spark, sf):
    """NTILE(4) + percent_rank over a global total order. (Global window =
    single partition; declared-semantics query. The scale path for global
    quantiles is approxQuantile / percentile_approx.)"""
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        load(spark, sf, "customer")
        .select(
            "c_custkey",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pr"),
        )
        .orderBy("c_custkey")
    )


@register(
    "Q-WIN-07",
    sql="SELECT c_custkey, CUME_DIST() OVER (ORDER BY c_acctbal, c_custkey) AS cd "
    "FROM customer ORDER BY c_custkey",
)
def q_win_07(spark, sf):
    """cume_dist over a total order (rank/count division of exact ints →
    identical doubles)."""
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        load(spark, sf, "customer")
        .select("c_custkey", F.cume_dist().over(w).alias("cd"))
        .orderBy("c_custkey")
    )


@register(
    "Q-WIN-06",
    sql="SELECT event_id, user_id, FIRST_VALUE(event_type) OVER w AS first_type, "
    "LAST_VALUE(event_type) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type "
    f"FROM {EVENTS_US} e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) "
    "ORDER BY event_id",
)
def q_win_06(spark, sf):
    """FIRST/LAST value per user (LAST over the full frame)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        load(spark, sf, "events")
        .select(
            "event_id",
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(wfull).alias("last_type"),
        )
        .orderBy("event_id")
    )


@register(
    "Q-WIN-08",
    # gap test rides integer epoch-microseconds on BOTH engines (the
    # Q-WIN-10 discipline): fixture timestamps carry sub-second µs, so a
    # seconds-truncated comparison would disagree with an exact one for
    # any gap in [1800.0s, 1801.0s). CAST(...SUM OVER... AS BIGINT)
    # because DuckDB types a windowed BIGINT sum as HUGEINT, which the
    # driver's pandas fetch path renders as float64 → hash mismatch.
    sql="WITH l AS (SELECT user_id, ts, event_id, CASE WHEN LAG(ts) OVER w IS NULL "
    "OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk "
    f"FROM {EVENTS_US} e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
    "s AS (SELECT user_id, ts, CAST(SUM(brk) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid FROM l) "
    "SELECT user_id, sid, MIN(ts) AS s_start, MAX(ts) AS s_end, COUNT(*) AS n "
    "FROM s GROUP BY user_id, sid ORDER BY user_id, s_start",
)
def q_win_08(spark, sf):
    """Batch sessionization (gaps-and-islands): lag → break flag →
    running sum = session id → per-session rollup. One shuffle on
    user_id; both window passes and the aggregate share that
    partitioning. The streaming twin is S-WIN-03 (session_window);
    identical session boundaries, proven against the same oracle."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
            > 1_800_000_000
        ),
        1,
    ).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        load(spark, sf, "events")
        .select("user_id", "ts", "event_id", brk.alias("brk"))
        .withColumn("sid", F.sum("brk").over(wrun))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("s_start"),
            F.max("ts").alias("s_end"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("user_id", "s_start")
    )


@register(
    "Q-WIN-09",
    # nullability synthesized in-query (value < 10 → NULL) so the
    # forward-fill branch is load-bearing
    sql="SELECT event_id, user_id, v, "
    "LAST_VALUE(v IGNORE NULLS) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill "
    "FROM (SELECT event_id, user_id, ts, "
    "CASE WHEN value < 10 THEN NULL ELSE value END AS v "
    f"FROM {EVENTS_US} e) t ORDER BY event_id",
)
def q_win_09(spark, sf):
    """Forward-fill / LOCF (last observation carried forward): per-user
    gap imputation via last(ignorenulls) over a running frame — the
    standard time-series repair for sensor dropouts. One shuffle on the
    partition key, same as every other per-key window."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.when(F.col("value") < 10, None).otherwise(F.col("value"))
    return (
        load(spark, sf, "events")
        .select("event_id", "user_id", "ts", v.alias("v"))
        .select(
            "event_id",
            "user_id",
            "v",
            F.last("v", ignorenulls=True).over(w).alias("v_ffill"),
        )
        .orderBy("event_id")
    )


@register(
    "Q-WIN-10",
    # the frame rides integer epoch-microseconds on BOTH engines: the
    # fixture timestamps have sub-second components, and a seconds-granular
    # boundary would disagree with a microsecond-granular one
    sql="SELECT event_id, user_id, CAST(COUNT(*) OVER ("
    "PARTITION BY user_id ORDER BY epoch_us(ts) "
    "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_1h "
    f"FROM {EVENTS_US} e ORDER BY event_id",
)
def q_win_10(spark, sf):
    """Value-based (RANGE) window frame: per-user rolling count of events
    in the trailing hour — the time-decayed activity feature every
    behavioral model wants. RANGE frames bound by the ORDER BY *value*
    (here epoch microseconds), so tied timestamps share a frame and the
    result is partitioning-independent. One shuffle on user_id; the
    in-partition sliding count is O(n) two-pointer work in both engines."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return (
        load(spark, sf, "events")
        .select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).cast("long").alias("n_1h"),
        )
        .orderBy("event_id")
    )


@register(
    "Q-WIN-11",
    # tie-break on c_custkey makes NTILE deterministic: equal balances
    # would otherwise land in engine-dependent tiles
    sql="WITH t AS (SELECT c_custkey, "
    f"{sql_cents('c_acctbal')} AS bal_c, "
    f"NTILE(4) OVER (ORDER BY {sql_cents('c_acctbal')}, c_custkey) AS tile "
    "FROM customer) "
    "SELECT tile, CAST(COUNT(*) AS BIGINT) AS n_cust, "
    "CAST(MIN(bal_c) AS BIGINT) AS min_bal_c, "
    "CAST(MAX(bal_c) AS BIGINT) AS max_bal_c, "
    "CAST(SUM(bal_c) AS BIGINT) AS sum_bal_c "
    "FROM t GROUP BY tile ORDER BY tile",
)
def q_win_11(spark, sf):
    """NTILE quartile assignment over account balance (cents) with a
    unique-key tie-break, rolled up to per-tile count/min/max/sum — the
    equal-depth binning step behind quantile features and score-band
    reporting. NTILE over an un-partitioned ORDER BY is a single global
    sort: fine for dimension-sized inputs like customer; for fact-scale
    equal-depth binning use approx quantile cutpoints (Q-AGG-12 shape)
    and a map-only bucket join instead."""
    cust = load(spark, sf, "customer").select(
        "c_custkey", cents("c_acctbal").alias("bal_c")
    )
    w = Window.orderBy("bal_c", "c_custkey")
    return (
        cust.withColumn("tile", F.ntile(4).over(w))
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cust"),
            F.min("bal_c").cast("long").alias("min_bal_c"),
            F.max("bal_c").cast("long").alias("max_bal_c"),
            F.sum("bal_c").cast("long").alias("sum_bal_c"),
        )
        .orderBy("tile")
    )


@register(
    "Q-WIN-12",
    sql="SELECT event_id, "
    "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING"
    ") AS BIGINT) AS purchases_so_far, "
    "CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING"
    ") AS BIGINT) AS errors_so_far "
    f"FROM {EVENTS_US} e ORDER BY event_id",
)
def q_win_12(spark, sf):
    """Conditional running aggregates (count-if over a frame): per user,
    the cumulative number of purchases and errors as of each event — the
    standard behavioral-feature shape (\"purchases before this event\")
    for training-data generation without label leakage: the frame ends at
    the CURRENT row, so no future information enters the feature.

    Scale shape: one shuffle on user_id; both running sums share the same
    window sort (ts, event_id — unique tie-break, see ADVICE r2 on
    Q-WIN-08), so Catalyst evaluates them in a single Window operator."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev = load(spark, sf, "events")
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
            F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_e"),
        )
        .select(
            "event_id",
            F.sum("is_p").over(w).cast("long").alias("purchases_so_far"),
            F.sum("is_e").over(w).cast("long").alias("errors_so_far"),
        )
        .orderBy("event_id")
    )


@register(
    "Q-WIN-13",
    sql="SELECT o_orderkey, o_custkey, "
    "FIRST_VALUE(o_orderkey) OVER w AS first_key, "
    "LAST_VALUE(o_orderkey) OVER w AS last_key, "
    "NTH_VALUE(o_orderkey, 2) OVER w AS second_key "
    "FROM orders "
    "WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
    "ORDER BY o_orderkey",
)
def q_win_13(spark, sf):
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE over an explicit full-frame
    window — per customer: their first, last, and second order key.

    The trap this entry pins down: with the DEFAULT frame (unbounded
    preceding → CURRENT ROW), LAST_VALUE returns the current row and
    NTH_VALUE goes NULL until n rows have passed — in every engine, per
    the SQL standard, and silently. The explicit
    ``rowsBetween(unboundedPreceding, unboundedFollowing)`` frame is the
    only portable way to mean "the partition's last value". Ordering key
    is unique (o_orderkey) so all three are deterministic.

    Scale shape: one shuffle on o_custkey + sorted evaluation; the
    full-frame functions need the whole partition resident, which is
    exactly the bounded-per-key state the partitioned window contract
    guarantees."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load(spark, sf, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_key"),
            F.last("o_orderkey").over(w).alias("last_key"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "Q-WIN-14",
    sql="SELECT o_custkey, o_orderkey, price_c, rk FROM ("
    f" SELECT o_custkey, o_orderkey, {sql_cents('o_totalprice')} AS price_c, "
    "  ROW_NUMBER() OVER (PARTITION BY o_custkey "
    f"   ORDER BY {sql_cents('o_totalprice')} DESC, o_orderkey) AS rk "
    " FROM orders) t WHERE rk <= 3 ORDER BY o_custkey, rk",
)
def q_win_14(spark, sf):
    """Skew-safe top-k per group — declared as the PLAIN row_number
    window, on measurement (r13 A/B, BASELINE.md §5): Spark ≥ 3.5
    plants ``WindowGroupLimit(Partial)`` BELOW the exchange for a
    rank-function filter, i.e. every map task keeps only its local
    top-k per key before shuffling, so (a) a hot key's reduce input is
    bounded by k × map_tasks rows — the plan is skew-safe natively —
    and (b) the exchange carries ~groups × k × map_tasks rows instead
    of the full fact. The hand-salted two-stage plan this entry
    declared through r12 (:func:`salted_top_k`, kept as the fallback
    for engines without rank-limit pushdown) duplicates that
    protection and pays for it: measured fresh-session on shared 100×
    replicas (15M orders), plain = 1.53 s / 1.48M shuffled rows
    (uniform) and 1.63 s (30%-hot-key skew) vs salted = 2.31 s / 7.6M
    rows and 2.66 s — the salted form loses ~1.5× on BOTH
    distributions because its stage-1 exchange hashes on (key, salt),
    multiplying the per-task group count the partial limit must keep.
    Identical output proven at 1× and 100×, both distributions;
    tests/test_plans.py pins the WindowGroupLimit shape."""
    price_c = cents("o_totalprice").cast("bigint")
    o = load(spark, sf, "orders").select(
        "o_custkey", "o_orderkey", price_c.alias("price_c")
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("price_c").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "price_c", "rk")
        .orderBy("o_custkey", "rk")
    )


def salted_top_k(df, part_cols, order_cols, k: int, salt_expr, salts: int = 8):
    """Two-stage salted top-k per group: stage 1 ranks within
    (part_cols, salt) and keeps each salt's local top-k; stage 2
    re-ranks the ≤ k·salts survivors per group. Correct because the
    global top-k is a subset of the union of per-salt top-k's (every
    kept row beats all dropped rows of its own salt). ``order_cols``
    must be a deterministic total order (include a unique tie-break).

    FALLBACK path, not the default: the r13 A/B (BASELINE.md §5)
    measured Spark 4.1's ``WindowGroupLimit`` partial pushdown making
    the plain window both cheaper (5.1× less shuffle at 100×) and
    skew-safe, so :func:`q_win_14` declares the plain form. Use this
    only on engines without rank-limit pushdown (Spark < 3.5), where a
    single window PARTITION BY would funnel a hot key's full row count
    through one task.

    Reserved output/work column names: ``rk`` (the emitted rank) and
    the internals ``__salt``/``__lrk`` — refused up front rather than
    silently clobbered."""
    clash = {"rk", "__salt", "__lrk"} & set(df.columns)
    if clash:
        raise ValueError(
            f"salted_top_k reserves column names {sorted(clash)}; "
            "rename them on the input first"
        )
    salted = df.withColumn("__salt", salt_expr % salts)
    w1 = Window.partitionBy(*part_cols, "__salt").orderBy(*order_cols)
    stage1 = (
        salted.withColumn("__lrk", F.row_number().over(w1))
        .filter(F.col("__lrk") <= k)
        .drop("__salt", "__lrk")
    )
    w2 = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return stage1.withColumn("rk", F.row_number().over(w2)).filter(
        F.col("rk") <= k
    )


@register(
    "Q-WIN-15",
    sql="WITH s AS (SELECT user_id, event_type, "
    " LEAD(event_type, 1) OVER w AS nxt1, LEAD(event_type, 2) OVER w AS nxt2 "
    f"FROM {EVENTS_US} e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
    "SELECT user_id, CAST(COUNT(*) FILTER (WHERE event_type = 'view' "
    " AND (nxt1 = 'purchase' OR nxt2 = 'purchase')) AS BIGINT) AS n_hits "
    "FROM s GROUP BY user_id HAVING n_hits > 0 ORDER BY user_id",
)
def q_win_15(spark, sf):
    """Event-sequence pattern detection (the MATCH_RECOGNIZE-lite
    shape): per user, count positions where a 'view' is followed by a
    'purchase' within the next two events — adjacency-bounded patterns
    ("A then B within n steps") compile to LEAD columns + a predicate,
    no regex engine needed. Complements Q-FUNNEL-01, which orders steps
    by TIME WINDOW; this matches on SEQUENCE POSITION, the
    browse-to-buy micro-conversion shape.

    Scale shape: one shuffle on user_id; both LEAD columns share the
    same Window operator (single sort, two frame reads), and the rollup
    reuses that partitioning — Catalyst collapses it into the same
    exchange. Bounded lookahead keeps state O(n) per key; an unbounded
    'eventually followed by' is a running flag (Q-WIN-12's conditional
    running aggregate shape) instead."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = load(spark, sf, "events").select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("nxt1"),
        F.lead("event_type", 2).over(w).alias("nxt2"),
    )
    hit = (F.col("event_type") == "view") & (
        (F.col("nxt1") == "purchase") | (F.col("nxt2") == "purchase")
    )
    return (
        s.groupBy("user_id")
        .agg(F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias("n_hits"))
        .filter(F.col("n_hits") > 0)
        .orderBy("user_id")
    )


@register(
    "Q-WIN-16",
    sql="WITH daily AS ("
    "  SELECT CAST(ts AS DATE) AS day, COUNT(DISTINCT user_id) AS daily_users "
    "  FROM events GROUP BY day), "
    "news AS ("
    "  SELECT d0 AS day, COUNT(*) AS new_users FROM ("
    "    SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id"
    "  ) f GROUP BY d0) "
    "SELECT daily.day AS day, CAST(daily_users AS BIGINT) AS daily_users, "
    "CAST(COALESCE(new_users, 0) AS BIGINT) AS new_users, "
    "CAST(SUM(COALESCE(new_users, 0)) OVER (ORDER BY daily.day) AS BIGINT) "
    "  AS cum_users "
    "FROM daily LEFT JOIN news ON daily.day = news.day ORDER BY day",
)
def q_win_16(spark, sf):
    """Running DISTINCT count (cumulative uniques): per day, the active
    users, the first-time users, and the distinct users seen TO DATE —
    the growth-dashboard staple. The trick that makes it scale: a naive
    COUNT(DISTINCT) over an expanding window re-deduplicates the whole
    history per day (O(days × users)); instead each user contributes
    once at their MIN(day) and the cumulative distinct count is a plain
    running SUM of those first-appearance counts — one groupBy on the
    high-cardinality key, then day-level arithmetic.

    Scale shape: one shuffle on user_id (pre-aggregated map-side), one
    on day; the running sum's unpartitioned window runs over day-level
    rows (≤ calendar size, dimension-scale by construction)."""
    ev = load(spark, sf, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(
        F.count_distinct("user_id").cast("bigint").alias("daily_users")
    )
    news = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_users"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.join(news, "day", "left")
        .select(
            "day",
            "daily_users",
            F.coalesce("new_users", F.lit(0)).cast("bigint").alias("new_users"),
        )
        .withColumn("cum_users", F.sum("new_users").over(w).cast("bigint"))
        .orderBy("day")
    )


@register(
    "Q-WIN-17",
    sql="WITH ud AS ("
    "  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), "
    "days AS (SELECT DISTINCT day FROM ud), "
    "win AS ("
    "  SELECT d.day AS report_day, ud.user_id FROM days d "
    "  JOIN ud ON ud.day BETWEEN d.day - 6 AND d.day) "
    "SELECT report_day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_7d "
    "FROM win GROUP BY report_day ORDER BY report_day",
)
def q_win_17(spark, sf):
    """Rolling 7-day distinct users (the WAU board) — EXACT sliding
    distinct, which no window frame computes directly: each distinct
    (user, active-day) pair is exploded into the ≤7 report days it can
    influence, deduplicated per (user, report day), and counted. Work
    is 7 × |user-day pairs| — bounded fan-out, shuffle keys are
    (user, day) — where the naive per-day range scan re-deduplicates a
    full week per report day and the oracle's range join (fine at
    oracle scale) is a per-day rescan. Complements Q-WIN-16
    (cumulative distinct: expanding window); this is the bounded
    sliding form.

    Scale shape: one dedup shuffle to user-day pairs (map-side
    combined), one map-only 7× explode, one count-distinct rollup per
    report day. For windows of W days the fan-out is W — for large W
    switch to the sketch path (Q-AGG-17's mergeable HLL per day,
    union over the window)."""
    ud = (
        load(spark, sf, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    days = ud.select("day").distinct()
    expanded = ud.select(
        "user_id",
        F.explode(
            F.expr("sequence(day, date_add(day, 6), interval 1 day)")
        ).alias("report_day"),
    )
    return (
        expanded.join(
            F.broadcast(days),
            expanded.report_day == days.day,
            "left_semi",
        )
        .groupBy("report_day")
        .agg(F.count_distinct("user_id").cast("bigint").alias("active_7d"))
        # calendar grain (report days): narrow presentation sort, no range
        # Exchange (plans/scale.bounded_sort, r15 rescreen)
        .transform(bounded_sort, "report_day")
    )


_WIN18_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_c
  FROM orders GROUP BY day)
SELECT day, rev_c,
       CAST(2 * median(rev_c) OVER (ORDER BY day
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS med7_x2_c,
       CAST(count(*) OVER (ORDER BY day
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS np
FROM daily ORDER BY day
"""


@register("Q-WIN-18", sql=_WIN18_SQL)
def q_win_18(spark, sf):
    """Rolling 7-day EXACT median of daily revenue — the robust twin of
    the rolling mean: a single fat-finger day drags a mean for a week
    but leaves the median untouched, which is why monitoring baselines
    and robust-smoothing features prefer it. Exactness across engines:
    both Spark (percentile 0.5) and DuckDB (median = continuous 0.5
    quantile) interpolate even-count frames as (a+b)/2, so DOUBLING the
    median restores an exact int64 (a+b, or 2a for odd frames) — the
    shipped column is med7_x2_c, no float ever compared. Frame width
    travels alongside (np) so partial leading frames are explicit.

    Scale shape: the facts collapse to the calendar-bounded daily
    rollup first (the only fact-sized shuffle); the unpartitioned
    ORDER BY day window then sorts ≤ a-few-thousand rows at ANY corpus
    scale — same documented trade as Q-WIN-11/Q-TREND-02. A per-key
    rolling median (unbounded key cardinality) would instead partition
    by key exactly like Q-QUAL-04's frame. Exact medians over a
    sliding frame re-sort each frame; at very large frames switch to
    percentile_approx and declare the tolerance."""
    daily = (
        load(spark, sf, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)))
            .cast("bigint")
            .alias("rev_c")
        )
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return (
        daily.select(
            "day",
            "rev_c",
            (F.lit(2) * F.expr("percentile(rev_c, 0.5)").over(w))
            .cast("bigint")
            .alias("med7_x2_c"),
            F.count(F.lit(1)).over(w).cast("bigint").alias("np"),
        )
        .orderBy("day")
    )


_WIN19_SQL = """
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, day),
t AS (
  SELECT event_type, day, n,
         SUM(n) OVER (PARTITION BY event_type) AS tot,
         COUNT(*) OVER (PARTITION BY event_type) AS nd
  FROM d),
q AS (
  SELECT event_type, day FROM t WHERE n * nd > tot),
anch AS (
  SELECT event_type, day,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY day) AS INTEGER) AS anchor
  FROM q),
streaks AS (
  SELECT event_type, anchor, CAST(COUNT(*) AS BIGINT) AS len
  FROM anch GROUP BY event_type, anchor)
SELECT event_type,
       CAST(MAX(len) AS BIGINT) AS longest,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(SUM(len) AS BIGINT) AS n_hot_days
FROM streaks GROUP BY event_type ORDER BY event_type
"""


@register("Q-WIN-19", sql=_WIN19_SQL)
def q_win_19(spark, sf):
    """Condition-based streak detection (the third islands variant:
    Q-WIN-08 breaks on TIME GAPS, Q-TS-07 merges RANGES, this one
    groups consecutive days satisfying a PREDICATE): per event type,
    find runs of consecutive above-average-volume days and report the
    longest run, run count, and total hot days — activity streaks,
    alert-storm runs, heat waves. The row_number-difference trick
    (day − rank is constant exactly within a consecutive run) turns
    streak detection into a plain GROUP BY; the qualifying predicate
    is data-derived (day beats the type's mean) and cross-multiplied
    to exact integers (n·n_days > total) so it means the same thing at
    every scale factor.

    Scale shape: facts collapse to the (type, day) rollup first — the
    only fact-sized shuffle; everything after runs on calendar-bounded
    rows in one per-type partitioning shared by the mean window, the
    rank, and the streak rollup."""
    d = (
        load(spark, sf, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wt = Window.partitionBy("event_type")
    t = d.select(
        "event_type",
        "day",
        "n",
        F.sum("n").over(wt).alias("tot"),
        F.count(F.lit(1)).over(wt).alias("nd"),
    )
    q = t.filter(F.col("n") * F.col("nd") > F.col("tot"))
    wr = Window.partitionBy("event_type").orderBy("day")
    anch = q.select(
        "event_type",
        "day",
        F.date_sub("day", F.row_number().over(wr).cast("int")).alias("anchor"),
    )
    streaks = anch.groupBy("event_type", "anchor").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    return (
        streaks.groupBy("event_type")
        .agg(
            F.max("len").cast("bigint").alias("longest"),
            F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
            F.sum("len").cast("bigint").alias("n_hot_days"),
        )
        .orderBy("event_type")
    )
