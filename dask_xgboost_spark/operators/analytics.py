"""Warehouse / product-analytics composite shapes (SURVEY.md §2C extras):
SCD Type-2 dimension versioning, ordered funnel analysis, cohort
retention. These are the end-to-end patterns a data team runs on top of
the relational operators — each one hash-checked against DuckDB, each
designed so its physical plan is the scalable one (broadcast dims,
single shuffle per aggregation key, no pairwise blowups).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_xgboost_spark.functions import EVENTS_US, sql_cents
from dask_xgboost_spark.registry import register
from dask_xgboost_spark.sources import load


@register(
    "Q-SCD-01",
    # updates are synthesized in-query (custkey % 5 == 0 gets a new
    # balance, effective 2000-01-01) so the versioning branch is
    # load-bearing at every SF
    sql="WITH upd AS (SELECT c_custkey, c_mktsegment, "
    f"CAST({sql_cents('c_acctbal')} + 10000 AS BIGINT) AS bal_c "
    "FROM customer WHERE c_custkey % 5 = 0) "
    "SELECT c_custkey, c_mktsegment, bal_c, valid_from, valid_to FROM ("
    # unchanged keys: one open version
    f"SELECT c_custkey, c_mktsegment, {sql_cents('c_acctbal')} AS bal_c, "
    "TIMESTAMP '1995-01-01 00:00:00' AS valid_from, "
    "CAST(NULL AS TIMESTAMP) AS valid_to "
    "FROM customer WHERE c_custkey % 5 != 0 "
    # updated keys: the closed old version ...
    "UNION ALL "
    f"SELECT c_custkey, c_mktsegment, {sql_cents('c_acctbal')}, "
    "TIMESTAMP '1995-01-01 00:00:00', TIMESTAMP '2000-01-01 00:00:00' "
    "FROM customer WHERE c_custkey % 5 = 0 "
    # ... and the new open version
    "UNION ALL "
    "SELECT c_custkey, c_mktsegment, bal_c, "
    "TIMESTAMP '2000-01-01 00:00:00', CAST(NULL AS TIMESTAMP) FROM upd"
    ") v ORDER BY c_custkey, valid_from",
)
def q_scd_01(spark, sf):
    """Slowly-changing-dimension Type 2: an incoming update set closes the
    current version (valid_to = effective date) and opens a new one —
    history is never overwritten, point-in-time joins stay answerable.
    Implementation is a full-outer-merge shape on the dimension key:
    unchanged rows pass through, updated keys emit close + open rows.
    One shuffle on the (dimension-sized, not fact-sized) key; at 100 TB
    the dim side is orders of magnitude under the fact tables, and the
    output stays partitionable by valid_from for pruned time-travel."""
    eff = F.lit("2000-01-01 00:00:00").cast("timestamp")
    t0 = F.lit("1995-01-01 00:00:00").cast("timestamp")
    bal_c = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
    cust = load(spark, sf, "customer").select(
        "c_custkey", "c_mktsegment", bal_c.alias("bal_c")
    )
    is_upd = F.col("c_custkey") % 5 == 0
    unchanged = cust.filter(~is_upd).select(
        "c_custkey", "c_mktsegment", "bal_c",
        t0.alias("valid_from"), F.lit(None).cast("timestamp").alias("valid_to"),
    )
    closed = cust.filter(is_upd).select(
        "c_custkey", "c_mktsegment", "bal_c",
        t0.alias("valid_from"), eff.alias("valid_to"),
    )
    opened = cust.filter(is_upd).select(
        "c_custkey", "c_mktsegment",
        (F.col("bal_c") + 10000).alias("bal_c"),
        eff.alias("valid_from"), F.lit(None).cast("timestamp").alias("valid_to"),
    )
    return (
        unchanged.unionByName(closed).unionByName(opened)
        .orderBy("c_custkey", "valid_from")
    )


@register(
    "Q-FUNNEL-01",
    sql="WITH f AS (SELECT user_id, "
    "MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup, "
    "MIN(CASE WHEN event_type = 'click' THEN ts END) AS first_click, "
    "MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase "
    f"FROM {EVENTS_US} e GROUP BY user_id), "
    "agg AS (SELECT "
    "CAST(SUM(CASE WHEN first_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS u1, "
    "CAST(SUM(CASE WHEN first_click > first_signup THEN 1 ELSE 0 END) AS BIGINT) AS u2, "
    "CAST(SUM(CASE WHEN first_click > first_signup AND first_purchase > first_click "
    "THEN 1 ELSE 0 END) AS BIGINT) AS u3 FROM f) "
    "SELECT 'c1_signup' AS stage, u1 AS users FROM agg "
    "UNION ALL SELECT 'c2_click', u2 FROM agg "
    "UNION ALL SELECT 'c3_purchase', u3 FROM agg ORDER BY stage",
)
def q_funnel_01(spark, sf):
    """Ordered funnel (signup → click → purchase): users counted at EVERY
    stage whose steps occurred in strict order — the standard
    monotone-decreasing funnel (reached signup ≥ clicked after signup ≥
    purchased after that click). ONE conditional-min aggregate per user
    (single shuffle on user_id), never an event-to-event self-join: the
    self-join formulation is quadratic per hot user at 100 TB, the
    conditional-min formulation is linear and partial-aggregates
    map-side. NULL first-occurrence timestamps fail the > comparison in
    both engines, so missing steps drop out identically."""
    ev = load(spark, sf, "events")
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    per_user = ev.groupBy("user_id").agg(
        first("signup").alias("first_signup"),
        first("click").alias("first_click"),
        first("purchase").alias("first_purchase"),
    )
    c2 = F.col("first_click") > F.col("first_signup")
    c3 = c2 & (F.col("first_purchase") > F.col("first_click"))
    agg = per_user.agg(
        F.sum(F.when(F.col("first_signup").isNotNull(), 1).otherwise(0))
        .cast("long").alias("u1"),
        F.sum(F.when(c2, 1).otherwise(0)).cast("long").alias("u2"),
        F.sum(F.when(c3, 1).otherwise(0)).cast("long").alias("u3"),
    )
    return agg.select(
        F.expr(
            "stack(3, 'c1_signup', u1, 'c2_click', u2, 'c3_purchase', u3) "
            "AS (stage, users)"
        )
    ).orderBy("stage")


@register(
    "Q-COHORT-01",
    # date_trunc('week') starts Monday in BOTH engines; week offsets are
    # exact integer day arithmetic
    sql="WITH first_seen AS (SELECT user_id, MIN(ts) AS first_ts "
    f"FROM {EVENTS_US} e GROUP BY user_id) "
    "SELECT CAST(date_trunc('week', f.first_ts) AS DATE) AS cohort_week, "
    "CAST(datediff('day', date_trunc('week', f.first_ts), "
    "date_trunc('week', e.ts)) / 7 AS BIGINT) AS week_offset, "
    "CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users "
    f"FROM {EVENTS_US} e JOIN first_seen f ON e.user_id = f.user_id "
    "GROUP BY cohort_week, week_offset ORDER BY cohort_week, week_offset",
)
def q_cohort_01(spark, sf):
    """Cohort retention: users bucketed by first-activity week, activity
    counted per (cohort, week-offset) cell — the standard retention
    triangle. Two shuffles (first-seen aggregate, cohort-cell distinct
    count), both on bounded keys; the first-seen side is user-cardinality
    so it broadcasts when dims allow. Week truncation and day arithmetic
    are exact in both engines (no epoch division drift)."""
    ev = load(spark, sf, "events")
    first_seen = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    joined = ev.join(first_seen, "user_id")
    cohort = F.date_trunc("week", F.col("first_ts"))
    week = F.date_trunc("week", F.col("ts"))
    return (
        joined.select(
            cohort.cast("date").alias("cohort_week"),
            F.floor(F.datediff(week, cohort) / 7).cast("long").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("long").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "Q-BASKET-01",
    sql="WITH pairs AS ("
    "SELECT a.l_partkey AS p1, b.l_partkey AS p2 "
    "FROM lineitem a JOIN lineitem b "
    "ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey) "
    "SELECT p1, p2, COUNT(*) AS support "
    "FROM pairs GROUP BY p1, p2 "
    "ORDER BY support DESC, p1, p2 LIMIT 50",
)
def q_basket_01(spark, sf):
    """Market-basket co-occurrence: part pairs ordered together, by
    support (the counting core of association-rule mining). The self-join
    is on the ORDER key, so fan-out is items-per-order² (~25-50), never
    corpus² — cost stays linear in order count at 100 TB; one shuffle for
    the join (or zero if lineitem is bucketed by l_orderkey —
    plans/scale.py::write_bucketed), one map-side-combined count, and the
    top-k is TakeOrderedAndProject (no global sort)."""
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("p1"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("p2"))
    pairs = a.join(b, "l_orderkey").filter(F.col("p1") < F.col("p2"))
    return (
        pairs.groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.desc("support"), "p1", "p2")
        .limit(50)
    )
