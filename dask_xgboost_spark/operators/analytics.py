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

from dask_xgboost_spark.caching import persist_rollup
from dask_xgboost_spark.functions import EVENTS_US, cents, md5_poly, sql_cents
from dask_xgboost_spark.plans.scale import bounded_sort
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
        # calendar grain (cohort weeks x offsets): narrow presentation sort, no range
        # Exchange (plans/scale.bounded_sort, r15 rescreen)
        .transform(bounded_sort, "cohort_week", "week_offset")
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


@register(
    "Q-PROF-01",
    # each column's min/max is rendered as VARCHAR (dates render
    # identically; o_totalprice goes through int64 cents first — raw
    # DECIMAL→VARCHAR trailing-zero rendering differs across engines)
    sql="SELECT 'o_orderkey' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows, "
    "CAST(COUNT(o_orderkey) AS BIGINT) AS n_nonnull, "
    "CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct, "
    "CAST(MIN(o_orderkey) AS VARCHAR) AS min_s, CAST(MAX(o_orderkey) AS VARCHAR) AS max_s "
    "FROM orders "
    "UNION ALL SELECT 'o_custkey', COUNT(*), COUNT(o_custkey), "
    "COUNT(DISTINCT o_custkey), CAST(MIN(o_custkey) AS VARCHAR), "
    "CAST(MAX(o_custkey) AS VARCHAR) FROM orders "
    "UNION ALL SELECT 'o_totalprice_c', COUNT(*), COUNT(o_totalprice), "
    "COUNT(DISTINCT o_totalprice), "
    f"CAST(MIN({sql_cents('o_totalprice')}) AS VARCHAR), "
    f"CAST(MAX({sql_cents('o_totalprice')}) AS VARCHAR) FROM orders "
    "UNION ALL SELECT 'o_orderdate', COUNT(*), COUNT(o_orderdate), "
    "COUNT(DISTINCT o_orderdate), strftime(MIN(o_orderdate), '%Y-%m-%d'), "
    "strftime(MAX(o_orderdate), '%Y-%m-%d') FROM orders "
    "UNION ALL SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus), "
    "COUNT(DISTINCT o_orderstatus), MIN(o_orderstatus), MAX(o_orderstatus) "
    "FROM orders ORDER BY col",
)
def q_prof_01(spark, sf):
    """Column profiling (the `describe`/Deequ-analyzer shape): per-column
    row count, non-null count, exact distinct count, and min/max rendered
    as strings — the schema-on-read health report a data team runs before
    trusting a new drop.

    Scale shape: ONE scan computes every column's aggregates in a single
    HashAggregate pass (count/min/max are cheap; the exact distincts are
    the expensive part — Spark expands multiple COUNT(DISTINCT x) into an
    expand+aggregate, still one scan). The wide 1-row result is unpivoted
    to rows with stack(), driver-side-free. For 100 TB profiling swap
    exact distincts for approx_count_distinct (Q-AGG-08 shape) — same
    plan minus the expand."""
    from dask_xgboost_spark.functions import cents

    o = load(spark, sf, "orders")
    date_s = F.date_format("o_orderdate", "yyyy-MM-dd")
    wide = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_orderkey").alias("nn_ok"),
        F.count_distinct("o_orderkey").alias("nd_ok"),
        F.min("o_orderkey").cast("string").alias("mn_ok"),
        F.max("o_orderkey").cast("string").alias("mx_ok"),
        F.count("o_custkey").alias("nn_ck"),
        F.count_distinct("o_custkey").alias("nd_ck"),
        F.min("o_custkey").cast("string").alias("mn_ck"),
        F.max("o_custkey").cast("string").alias("mx_ck"),
        F.count("o_totalprice").alias("nn_tp"),
        F.count_distinct("o_totalprice").alias("nd_tp"),
        F.min(cents("o_totalprice")).cast("string").alias("mn_tp"),
        F.max(cents("o_totalprice")).cast("string").alias("mx_tp"),
        F.count("o_orderdate").alias("nn_od"),
        F.count_distinct("o_orderdate").alias("nd_od"),
        F.min(date_s).alias("mn_od"),
        F.max(date_s).alias("mx_od"),
        F.count("o_orderstatus").alias("nn_os"),
        F.count_distinct("o_orderstatus").alias("nd_os"),
        F.min("o_orderstatus").alias("mn_os"),
        F.max("o_orderstatus").alias("mx_os"),
    )
    return wide.select(
        F.expr(
            "stack(5, "
            "'o_orderkey', n, nn_ok, nd_ok, mn_ok, mx_ok, "
            "'o_custkey', n, nn_ck, nd_ck, mn_ck, mx_ck, "
            "'o_totalprice_c', n, nn_tp, nd_tp, mn_tp, mx_tp, "
            "'o_orderdate', n, nn_od, nd_od, mn_od, mx_od, "
            "'o_orderstatus', n, nn_os, nd_os, mn_os, mx_os) "
            "AS (col, n_rows, n_nonnull, n_distinct, min_s, max_s)"
        )
    ).orderBy("col")


@register(
    "Q-QUAL-01",
    # the FK check is made load-bearing by treating custkey % 3 = 0
    # customers as deleted — every orders row pointing at one is a
    # violation (nonzero at every SF)
    sql="SELECT 'pk_unique_orderkey' AS chk, "
    "CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_violations "
    "FROM orders "
    "UNION ALL SELECT 'fk_custkey_resolves', CAST(COUNT(*) AS BIGINT) "
    "FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c "
    "WHERE c.c_custkey = o.o_custkey AND c.c_custkey % 3 != 0) "
    "UNION ALL SELECT 'range_totalprice_pos', CAST(COUNT(*) AS BIGINT) "
    "FROM orders WHERE o_totalprice <= 0 "
    "UNION ALL SELECT 'domain_orderstatus', CAST(COUNT(*) AS BIGINT) "
    "FROM orders WHERE o_orderstatus NOT IN ('O', 'F', 'P') "
    "UNION ALL SELECT 'freshness_has_1997', "
    "CAST(CASE WHEN SUM(CASE WHEN o_orderdate >= DATE '1997-01-01' "
    "THEN 1 ELSE 0 END) > 0 THEN 0 ELSE 1 END AS BIGINT) FROM orders "
    "ORDER BY chk",
)
def q_qual_01(spark, sf):
    """Data-quality constraint suite (the Deequ/dbt-test shape): primary-key
    uniqueness, foreign-key integrity against a reduced dimension (keys
    divisible by 3 are treated as deleted, so the check is load-bearing),
    value-range and domain checks, and a freshness assertion — each
    reported as a named violation count.

    Scale shape: the four single-table checks fold into scans with
    conditional aggregation (no shuffle beyond the final 1-row combines);
    the FK check is a left-anti join against the (dimension-sized,
    broadcastable) valid-key set. Nothing here is quadratic; the suite
    runs as a handful of independent map-side-combined passes, and at
    100 TB each check prunes to the columns it reads."""
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer").filter(F.col("c_custkey") % 3 != 0)

    pk = o.agg(
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey"))
        .cast("long")
        .alias("n_violations")
    ).select(F.lit("pk_unique_orderkey").alias("chk"), "n_violations")
    fk = (
        o.join(
            F.broadcast(c.select(F.col("c_custkey").alias("o_custkey"))),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        .select(F.lit("fk_custkey_resolves").alias("chk"), "n_violations")
    )
    rng = o.agg(
        F.sum((F.col("o_totalprice") <= 0).cast("long")).cast("long").alias("n_violations")
    ).select(F.lit("range_totalprice_pos").alias("chk"), "n_violations")
    dom = o.agg(
        F.sum((~F.col("o_orderstatus").isin("O", "F", "P")).cast("long"))
        .cast("long")
        .alias("n_violations")
    ).select(F.lit("domain_orderstatus").alias("chk"), "n_violations")
    fresh = o.agg(
        F.when(
            F.sum((F.col("o_orderdate") >= F.lit("1997-01-01").cast("date")).cast("long"))
            > 0,
            F.lit(0),
        )
        .otherwise(F.lit(1))
        .cast("long")
        .alias("n_violations")
    ).select(F.lit("freshness_has_1997").alias("chk"), "n_violations")
    return pk.unionAll(fk).unionAll(rng).unionAll(dom).unionAll(fresh).orderBy("chk")


def observed_balance_gate(spark, sf):
    """Build the G-OBS-01 plan plus its Observation handle.

    ``df.observe`` computes pipeline-health metrics (row count, gate
    rejections, balance-cents sum) DURING the same scan that feeds the
    query — at 100 TB the alternative is a second full pass per metric.
    Returns (result_df, observation); the observation's values become
    available after the caller's first action on the result."""
    from pyspark.sql import Observation

    obs = Observation("g_obs_01")
    c = (
        load(spark, sf, "customer")
        .observe(
            obs,
            F.count(F.lit(1)).alias("rows_seen"),
            F.sum((F.col("c_acctbal") <= 0).cast("long")).alias("rows_gated"),
            F.sum(F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")).alias(
                "bal_cents"
            ),
        )
        .filter(F.col("c_acctbal") > 0)
    )
    out = (
        c.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_pass"))
        # enum grain (market segments): narrow presentation sort, no
        # range Exchange (plans/scale.bounded_sort, r15 rescreen)
        .transform(bounded_sort, "c_mktsegment")
    )
    return out, obs


@register(
    "G-OBS-01",
    sql="SELECT c_mktsegment, COUNT(*) AS n_pass FROM customer "
    "WHERE c_acctbal > 0 GROUP BY c_mktsegment ORDER BY c_mktsegment",
)
def g_obs_01(spark, sf):
    """In-flight observability (``df.observe``): the quality gate's
    metrics — rows seen, rows rejected, exact cents sum — ride the same
    scan as the query itself; no second pass, no extra shuffle (metrics
    fold as accumulator-style partial aggregates). The returned result
    is the gated per-segment count (hash-checked); the observation
    values are asserted against batch recomputation in
    tests/test_golden.py."""
    out, _obs = observed_balance_gate(spark, sf)
    return out


@register(
    "Q-TREND-01",
    sql="WITH m AS (SELECT YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS mo, "
    "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c "
    "FROM orders GROUP BY y, mo) "
    "SELECT CAST(y AS INT) AS y, CAST(mo AS INT) AS mo, rev_c, "
    "rev_c - LAG(rev_c) OVER w AS mom_delta_c, "
    "rev_c - LAG(rev_c, 12) OVER w AS yoy_delta_c "
    "FROM m WINDOW w AS (ORDER BY y, mo) ORDER BY y, mo",
)
def q_trend_01(spark, sf):
    """Trend analysis: monthly revenue with month-over-month and
    year-over-year deltas — windows LAYERED OVER an aggregate, the
    standard finance-dashboard shape. Deltas stay in exact int64 cents;
    the ratio is a downstream division.

    Scale shape: the aggregate reduces 100 TB of orders to ~100 monthly
    rows BEFORE the window, so the unpartitioned (global) window sort is
    over a constant-size frame — global windows are fine exactly when
    they follow a cardinality-crushing aggregate, and wrong otherwise
    (contrast Q-WIN-01's per-key windows over raw rows)."""
    m = (
        load(spark, sf, "orders")
        .groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("mo")
        )
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)))
            .cast("long")
            .alias("rev_c")
        )
    )
    w = Window.orderBy("y", "mo")
    return m.select(
        "y",
        "mo",
        "rev_c",
        (F.col("rev_c") - F.lag("rev_c", 1).over(w)).alias("mom_delta_c"),
        (F.col("rev_c") - F.lag("rev_c", 12).over(w)).alias("yoy_delta_c"),
    ).orderBy("y", "mo")


_PR_SQL = """
WITH cnt AS (SELECT COUNT(*) AS n FROM customer),
nd AS (SELECT c_custkey AS k FROM customer),
e AS (
  SELECT k AS src, (k * 7 + 1) % (SELECT n FROM cnt) AS dst FROM nd
  UNION ALL
  SELECT k, (k * 13 + 2) % (SELECT n FROM cnt) FROM nd
),
r0 AS (SELECT k, CAST(1000000 AS BIGINT) AS r FROM nd),
r1 AS (SELECT e.dst AS k, 150000 + SUM(r0.r // 2) AS r
       FROM e JOIN r0 ON e.src = r0.k GROUP BY e.dst),
r2 AS (SELECT e.dst AS k, 150000 + SUM(r1.r // 2) AS r
       FROM e JOIN r1 ON e.src = r1.k GROUP BY e.dst),
r3 AS (SELECT e.dst AS k, 150000 + SUM(r2.r // 2) AS r
       FROM e JOIN r2 ON e.src = r2.k GROUP BY e.dst)
SELECT k, CAST(r AS BIGINT) AS rank_u FROM r3 ORDER BY k
"""


@register("Q-GRAPH-01", sql=_PR_SQL)
def q_graph_01(spark, sf):
    """PageRank, 3 synchronous iterations, in EXACT integer arithmetic:
    ranks are micro-units (start 1e6), each step distributes
    ``rank DIV outdeg`` (outdeg = 2 by construction) plus a teleport
    constant — floor division keeps every intermediate an int64, so the
    result is bit-identical across engines and aggregation orders, which
    float PageRank never is. The graph is synthesized from customer keys
    (k → (7k+1) mod N and (13k+2) mod N; both maps are bijections for
    gcd(7,N)=gcd(13,N)=1, so in-degree = out-degree = 2 — no dangling
    mass). The oracle unrolls the same 3 iterations as CTEs.

    Scale shape: per iteration, one join shuffle of ranks against the
    (static, re-usable) edge partitioning + one groupBy on dst — the
    standard distributed PageRank plan. For open-ended iteration counts,
    add localCheckpoint per round (see Q-CTE-02 / connected_components);
    3 unrolled rounds keep the plan shallow enough without it. N (the
    node count) is dim-cardinality metadata — the one driver-side value,
    same as the oracle's scalar subquery."""
    cust = load(spark, sf, "customer").select(F.col("c_custkey").alias("k"))
    n_total = cust.count()
    e1 = cust.select(
        F.col("k").alias("src"), ((F.col("k") * 7 + 1) % n_total).alias("dst")
    )
    e2 = cust.select(
        F.col("k").alias("src"), ((F.col("k") * 13 + 2) % n_total).alias("dst")
    )
    # the edge list is consumed by every iteration's join — materialize
    # it once instead of re-deriving union+projection per round.
    # localCheckpoint, not persist: same single-session reuse without
    # leaving a never-unpersisted cache entry behind (a long-lived
    # driver sweep would accumulate them)
    edges = e1.union(e2).localCheckpoint()
    ranks = cust.select("k", F.lit(1000000).cast("long").alias("r"))
    for _ in range(3):
        ranks = (
            edges.join(ranks, edges.src == ranks.k)
            .groupBy(F.col("dst").alias("k2"))
            .agg((F.lit(150000) + F.sum(F.expr("r DIV 2"))).alias("r2"))
            .select(F.col("k2").alias("k"), F.col("r2").alias("r"))
        )
    return ranks.select("k", F.col("r").cast("long").alias("rank_u")).orderBy("k")


_TRI_SQL = """
WITH pairs AS (
    SELECT a.l_partkey AS u, b.l_partkey AS v
    FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
    WHERE a.l_partkey < b.l_partkey
    GROUP BY u, v
    HAVING COUNT(*) >= 2
),
deg AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS d
    FROM (SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs)
    GROUP BY node
),
o AS (
    SELECT CASE WHEN du.d * 1000000000 + u <= dv.d * 1000000000 + v
                THEN u ELSE v END AS s,
           CASE WHEN du.d * 1000000000 + u <= dv.d * 1000000000 + v
                THEN v ELSE u END AS t
    FROM pairs JOIN deg du ON du.node = u JOIN deg dv ON dv.node = v
),
tri AS (
    SELECT e1.s AS x, e1.t AS y, e2.t AS z
    FROM o e1 JOIN o e2 ON e1.t = e2.s
    JOIN o e3 ON e3.s = e1.s AND e3.t = e2.t
)
SELECT CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles
"""


@register("Q-GRAPH-02", sql=_TRI_SQL)
def q_graph_02(spark, sf):
    """Degree-oriented triangle counting over the co-order part graph
    (edges = part pairs ordered together ≥ 2 times, from Q-BASKET-01's
    derivation; the second graph primitive alongside Q-GRAPH-01's
    PageRank).

    Every edge is oriented from its lower-(degree, id) endpoint to the
    higher one, so each triangle is generated by exactly ONE wedge at
    its lowest-degree corner — the MapReduce-era bound that caps wedge
    fan-out at Σ d_out² with d_out ≤ O(√|E|) regardless of how skewed
    the raw degree distribution is (a hub of degree 10⁶ generates no
    wedges unless both neighbors out-rank it). Plain id-orientation has
    no such bound; this is the difference between a plan that survives a
    power-law graph at 100 TB and one that doesn't. Three shuffles:
    pair-dedup, wedge join, closing-edge semi-join."""
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
    pairs = persist_rollup(
        a.join(b, "l_orderkey")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") >= 2)
        .select("u", "v")
        # the edge set feeds degree counting (twice), the orientation
        # join, and the edge-count leg — materialize the fact self-join
        # ONCE instead of re-running it per reference (multi-reference
        # idiom, see Q-TPCH-15)
    )
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    with_deg = (
        pairs.join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dv"), "v")
    )
    ku = F.col("du") * F.lit(1000000000) + F.col("u")
    kv = F.col("dv") * F.lit(1000000000) + F.col("v")
    # oriented edges feed both wedge legs and the closing join
    o = persist_rollup(
        with_deg.select(
            F.when(ku <= kv, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(ku <= kv, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    e1 = o.select(F.col("s").alias("x"), F.col("t").alias("y"))
    e2 = o.select(F.col("s").alias("y"), F.col("t").alias("z"))
    wedges = e1.join(e2, "y")
    closing = o.select(F.col("s").alias("x"), F.col("t").alias("z"))
    tri = wedges.join(closing, ["x", "z"])
    # both counts in ONE plan (1-row × 1-row cross join), no driver action
    edge_cnt = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    tri_cnt = tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    return edge_cnt.crossJoin(tri_cnt)


@register(
    "Q-SCD-02",
    # version rows come from purchase events (each purchase re-tiers the
    # user, effective from its timestamp); every event is then joined to
    # the tier in force AT its own timestamp. The oracle runs the
    # textbook SCD2 interval form (LEAD builds [eff_from, eff_to) and a
    # range predicate picks the covering version); the engine runs the
    # single-shuffle as-of form. Identical output = the PIT-lookup
    # equivalence claim. Tie-break: versions ordered (ts, tier), so a
    # same-instant double-purchase resolves to the higher tier in both.
    sql="WITH v AS (SELECT user_id, tier, ts AS eff_from, "
    " LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, tier) AS eff_to "
    " FROM (SELECT user_id, ts, CAST(FLOOR(value / 50) AS BIGINT) % 5 AS tier "
    f"       FROM {EVENTS_US} pe WHERE event_type = 'purchase') src) "
    f"SELECT tier, COUNT(*) AS n_events FROM {EVENTS_US} f "
    "LEFT JOIN v ON f.user_id = v.user_id AND f.ts >= v.eff_from "
    " AND (v.eff_to IS NULL OR f.ts < v.eff_to) "
    "GROUP BY tier ORDER BY tier NULLS FIRST",
)
def q_scd_02(spark, sf):
    """Point-in-time (PIT) lookup against an SCD2 dimension: each fact
    row reads the dimension version in force at the fact's own event
    time — the temporal-join staple for feature backfills (no
    label/feature leakage from future versions).

    Executed as a backward as-of join (operators/asof.py): version-START
    rows replace materialized [from, to) intervals, so the lookup is ONE
    shuffle on the entity key with no interval explosion — at 100 TB the
    interval range-join form degenerates to a per-key cross product,
    while this form is linear per key and AQE-splittable. The DuckDB
    oracle runs the interval form; matching output proves the
    equivalence."""
    ev = load(spark, sf, "events")
    versions = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("vts"),
        (F.floor(F.col("value") / 50).cast("bigint") % 5).alias("tier"),
    )
    fact = ev.select(F.col("user_id").alias("k"), "ts")
    from dask_xgboost_spark.operators.asof import asof_join_backward

    pit = asof_join_backward(
        fact, versions, on="k", left_ts="ts", right_ts="vts",
        carry={"tier": "tier"},
    )
    return (
        pit.groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n_events"))
        # bounded grain (5 tiers + NULL): plans/scale.bounded_sort
        .transform(bounded_sort, F.col("tier").asc_nulls_first())
    )


@register(
    "Q-QUAL-02",
    # snapshots are stood in by a deterministic event_id parity split
    # (fixtures carry no second snapshot); with real data the two sides
    # are yesterday's and today's partition of the same table
    sql="WITH s AS (SELECT event_id % 2 AS side, "
    f" {sql_cents('value')} AS v_c, user_id FROM events), "
    "w AS (SELECT "
    " COUNT(*) FILTER (WHERE side = 0) AS a_rows, "
    " COUNT(*) FILTER (WHERE side = 1) AS b_rows, "
    " SUM(v_c) FILTER (WHERE side = 0) AS a_sum, "
    " SUM(v_c) FILTER (WHERE side = 1) AS b_sum, "
    " COUNT(DISTINCT CASE WHEN side = 0 THEN user_id END) AS a_users, "
    " COUNT(DISTINCT CASE WHEN side = 1 THEN user_id END) AS b_users "
    "FROM s) "
    "SELECT metric, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, "
    " CAST(b - a AS BIGINT) AS delta FROM ("
    " SELECT 'n_rows' AS metric, a_rows AS a, b_rows AS b FROM w "
    " UNION ALL SELECT 'sum_cents', a_sum, b_sum FROM w "
    " UNION ALL SELECT 'n_users', a_users, b_users FROM w) t "
    "ORDER BY metric",
)
def q_qual_02(spark, sf):
    """Snapshot drift report — the data-quality monitor that runs after
    every pipeline load: row count, exact value mass (cents), and
    entity cardinality of the new snapshot vs the previous one, with
    deltas. Complements Q-PROF-01 (one snapshot's profile) and
    Q-DIFF-01 (row-level reconciliation): drift triage reads THIS 3-row
    report first and only escalates to the row-level diff on anomaly.

    Scale shape: ONE pass over the union of both snapshots — every
    metric is a FILTER-clause aggregate, so the fact table is scanned
    once and reduces map-side to a single row; the metric unpivot
    (stack) touches 1 row. No joins, no per-snapshot second scan."""
    s = load(spark, sf, "events").select(
        (F.col("event_id") % 2).alias("side"),
        cents("value").alias("v_c"),
        "user_id",
    )
    side = lambda k: F.col("side") == k  # noqa: E731
    w = s.agg(
        F.count(F.when(side(0), 1)).alias("a_rows"),
        F.count(F.when(side(1), 1)).alias("b_rows"),
        F.sum(F.when(side(0), F.col("v_c"))).alias("a_sum"),
        F.sum(F.when(side(1), F.col("v_c"))).alias("b_sum"),
        F.count_distinct(F.when(side(0), F.col("user_id"))).alias("a_users"),
        F.count_distinct(F.when(side(1), F.col("user_id"))).alias("b_users"),
    )
    return (
        w.selectExpr(
            "stack(3, 'n_rows', a_rows, b_rows, "
            "'sum_cents', a_sum, b_sum, "
            "'n_users', a_users, b_users) AS (metric, a, b)"
        )
        .selectExpr(
            "metric", "CAST(a AS BIGINT) AS a", "CAST(b AS BIGINT) AS b",
            "CAST(b - a AS BIGINT) AS delta",
        )
        .orderBy("metric")
    )


@register(
    "Q-QUAL-03",
    # thresholds deliberately plant violations (status 'P' exists but is
    # not accepted; prices exceed 400k; quantities exceed 45) while the
    # structural rules (not-null, unique, referential) pass — both
    # directions of the gate are load-bearing
    sql="""
    SELECT 'orders.o_orderkey NOT NULL' AS rule,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS n_failed,
           COUNT(*) FILTER (WHERE o_orderkey IS NULL) = 0 AS pass
    FROM orders
    UNION ALL
    SELECT 'orders.o_orderkey UNIQUE',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
           COUNT(*) = COUNT(DISTINCT o_orderkey)
    FROM orders
    UNION ALL
    SELECT 'orders.o_orderstatus IN (O,F)',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE o_orderstatus IS NULL
                OR o_orderstatus NOT IN ('O','F')) AS BIGINT),
           COUNT(*) FILTER (WHERE o_orderstatus IS NULL
                OR o_orderstatus NOT IN ('O','F')) = 0
    FROM orders
    UNION ALL
    SELECT 'orders.o_totalprice IN [1000,400000]',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE o_totalprice IS NULL
                OR o_totalprice < 1000 OR o_totalprice > 400000) AS BIGINT),
           COUNT(*) FILTER (WHERE o_totalprice IS NULL
                OR o_totalprice < 1000 OR o_totalprice > 400000) = 0
    FROM orders
    UNION ALL
    SELECT 'lineitem.l_quantity IN [1,45]',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE l_quantity IS NULL
                OR l_quantity < 1 OR l_quantity > 45) AS BIGINT),
           COUNT(*) FILTER (WHERE l_quantity IS NULL
                OR l_quantity < 1 OR l_quantity > 45) = 0
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.l_orderkey REFERENCES orders',
           CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE NOT EXISTS
                (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
           COUNT(*) FILTER (WHERE NOT EXISTS
                (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) = 0
    FROM lineitem l
    ORDER BY rule
    """,
)
def q_qual_03(spark, sf):
    """Expectation-suite validation (the dbt-test / Great-Expectations
    gate): a declarative rule set — NOT NULL, UNIQUE, accepted values,
    numeric range, referential integrity — evaluated into one
    (rule, n_checked, n_failed, pass) report that CI gates a dataset
    release on. Thresholds here plant real violations (status 'P',
    prices > 400k, quantities > 45) while the structural rules pass, so
    both outcomes are exercised.

    Scale shape: all four orders rules fold into ONE conditional-
    aggregate pass over orders (no per-rule rescans), the quantity rule
    is one pass over lineitem, and referential integrity is a LEFT ANTI
    count against the distinct key set — the only shuffle, co-located
    when both tables are bucketed by the key. Report size is O(rules).
    The same rule table drives Q-SCAN-10's quarantine path when the
    action is 'route rows' rather than 'gate the release'."""
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")

    cnt_if = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731

    def rule_row(name, n_col, fail_col):
        return F.struct(
            F.lit(name).alias("rule"),
            n_col.cast("bigint").alias("n_checked"),
            fail_col.cast("bigint").alias("n_failed"),
            (fail_col == 0).alias("pass"),
        )

    oagg = o.agg(
        F.count(F.lit(1)).alias("n"),
        cnt_if(F.col("o_orderkey").isNull()).alias("keynull"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("keydup"),
        cnt_if(
            F.col("o_orderstatus").isNull()
            | ~F.col("o_orderstatus").isin("O", "F")
        ).alias("status_bad"),
        cnt_if(
            F.col("o_totalprice").isNull()
            | (F.col("o_totalprice") < 1000)
            | (F.col("o_totalprice") > 400000)
        ).alias("price_oob"),
    ).select(
        F.explode(
            F.array(
                rule_row("orders.o_orderkey NOT NULL", F.col("n"), F.col("keynull")),
                rule_row("orders.o_orderkey UNIQUE", F.col("n"), F.col("keydup")),
                rule_row("orders.o_orderstatus IN (O,F)", F.col("n"), F.col("status_bad")),
                rule_row(
                    "orders.o_totalprice IN [1000,400000]", F.col("n"), F.col("price_oob")
                ),
            )
        ).alias("r")
    ).select("r.*")

    liagg = li.agg(
        F.count(F.lit(1)).alias("n"),
        cnt_if(
            F.col("l_quantity").isNull()
            | (F.col("l_quantity") < 1)
            | (F.col("l_quantity") > 45)
        ).alias("qty_oob"),
    ).select(
        F.explode(
            F.array(rule_row("lineitem.l_quantity IN [1,45]", F.col("n"), F.col("qty_oob")))
        ).alias("r")
    ).select("r.*")

    orphans = (
        li.join(o.select("o_orderkey").distinct(),
                li.l_orderkey == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphan"))
    )
    ref = (
        li.agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(orphans))
        .select(
            F.lit("lineitem.l_orderkey REFERENCES orders").alias("rule"),
            F.col("n").cast("bigint").alias("n_checked"),
            F.col("n_orphan").cast("bigint").alias("n_failed"),
            (F.col("n_orphan") == 0).alias("pass"),
        )
    )
    return oagg.unionByName(liagg).unionByName(ref).orderBy("rule")


_BFS_SQL = """
WITH RECURSIVE
nn AS (SELECT COUNT(*) AS n FROM customer),
edges AS (
    SELECT c_custkey AS src, (c_custkey * 7 + 1) % n AS dst FROM customer, nn
    UNION ALL
    SELECT c_custkey AS src, (c_custkey * 13 + 2) % n AS dst FROM customer, nn
),
bfs(k, d) AS (
    SELECT c_custkey, 0 FROM customer WHERE c_custkey < 5
    UNION ALL
    SELECT e.dst, b.d + 1 FROM bfs b JOIN edges e ON e.src = b.k WHERE b.d < 3
)
SELECT d AS dist, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(k) AS BIGINT) AS sum_nodes
FROM (SELECT k, MIN(d) AS d FROM bfs GROUP BY k) m
GROUP BY dist ORDER BY dist
"""


@register("Q-GRAPH-03", sql=_BFS_SQL)
def q_graph_03(spark, sf):
    """k-hop BFS reachability (3 hops from a 5-node seed set) — the
    third graph primitive beside Q-GRAPH-01's PageRank and Q-GRAPH-02's
    triangles, and the shape of every "blast radius" / n-degree-of-
    separation query. Same synthetic bijective graph as PageRank
    (k → (7k+1) mod N and (13k+2) mod N). Distances are exact ints;
    per-distance node counts and id-sums are the hash carrier. The
    oracle is a bounded recursive CTE.

    Scale shape: frontier expansion — per hop, one join of the CURRENT
    frontier (not the whole visited set) against the static edge list,
    then a min-distance groupBy to drop re-reached nodes. Work per hop
    is O(frontier × degree); the visited set only ever participates in
    the cheap min-aggregate. This is the BFS plan that survives
    power-law graphs, where re-walking the visited set each round
    (the naive recursive-CTE translation) does not. 3 unrolled hops
    keep the lineage shallow (no checkpoint needed); open-ended
    traversals use connected_components' localCheckpoint-per-round
    discipline (dedup.py)."""
    cust = load(spark, sf, "customer").select(F.col("c_custkey").alias("k"))
    n_total = cust.count()
    e1 = cust.select(
        F.col("k").alias("src"), ((F.col("k") * 7 + 1) % n_total).alias("dst")
    )
    e2 = cust.select(
        F.col("k").alias("src"), ((F.col("k") * 13 + 2) % n_total).alias("dst")
    )
    # localCheckpoint, not persist: materialized once for the three hop
    # joins WITHOUT pinning a cache entry for the rest of the session
    # (an unpersisted .persist() accumulates storage pressure across a
    # long-lived driver sweep)
    edges = e1.union(e2).localCheckpoint()
    dist = cust.filter(F.col("k") < 5).select(
        "k", F.lit(0).cast("long").alias("d")
    )
    frontier = dist
    for hop in (1, 2, 3):
        reached = (
            edges.join(frontier, edges.src == frontier.k)
            .select(F.col("dst").alias("k"), F.lit(hop).cast("long").alias("d"))
            .distinct()
        )
        dist = dist.union(reached).groupBy("k").agg(F.min("d").alias("d"))
        frontier = dist.filter(F.col("d") == hop)
    return (
        dist.groupBy(F.col("d").alias("dist"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("k").cast("bigint").alias("sum_nodes"),
        )
        # bounded grain (unrolled hop count + 1): narrow presentation sort, no range
        # Exchange (plans/scale.bounded_sort, r15 rescreen)
        .transform(bounded_sort, "dist")
    )


_QUAL4_SQL = """
WITH hourly AS (
    SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h,
           CAST(COUNT(*) AS BIGINT) AS x
    FROM (SELECT event_type, date_trunc('microseconds', ts) AS ts FROM events) e
    GROUP BY event_type, h
),
st AS (
    SELECT event_type, h, x,
           COUNT(*)  OVER w AS np,
           SUM(x)    OVER w AS s,
           SUM(x * x) OVER w AS q
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY h
                 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
),
scored AS (
    SELECT event_type, h, x, np, s, q,
           (np * x - s) * (np * x - s) AS dev2,
           9 * (np * q - s * s) AS lim2
    FROM st WHERE np = 24
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_scored,
       CAST(SUM(CASE WHEN dev2 > lim2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_flagged,
       CAST(MIN(CASE WHEN dev2 > lim2 THEN epoch_us(h) END) AS BIGINT)
           AS first_flag_us
FROM scored GROUP BY event_type ORDER BY event_type
"""


@register("Q-QUAL-04", sql=_QUAL4_SQL)
def q_qual_04(spark, sf):
    """Rolling volume-anomaly gate — the metric-monitoring shape that
    pages someone when an ingest pipeline breaks: per series, each
    hour's event count is scored against the TRAILING 24 fully-observed
    hours (current excluded), flagged when it deviates more than 3σ.
    The σ test runs in EXACT integer arithmetic by cross-multiplying
    the z² inequality — (n·x − S)² > 9·(n·Q − S²) with S, Q the frame's
    sum and sum-of-squares — so there is no float epsilon to disagree
    across engines, the same discipline as Q-AGG-16's exact-moment
    correlation. Partial frames (first 24 hours of a series) are not
    scored: an alert off 3 observations is noise, and the np = 24
    predicate states that policy explicitly.

    Scale shape: one rollup shuffle to O(series × hours) rows, then a
    fixed 24-row window frame (three shared frame aggregates on one
    sort) and a per-series summary. The hourly table is what a metrics
    store keeps anyway; the gate adds one window pass over it."""
    hourly = (
        load(spark, sf, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    st = hourly.select(
        "event_type",
        "h",
        "x",
        F.count(F.lit(1)).over(w).alias("np"),
        F.sum("x").over(w).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("q"),
    ).filter(F.col("np") == 24)
    dev2 = (F.col("np") * F.col("x") - F.col("s")) * (
        F.col("np") * F.col("x") - F.col("s")
    )
    lim2 = F.lit(9) * (F.col("np") * F.col("q") - F.col("s") * F.col("s"))
    scored = st.withColumn("flag", dev2 > lim2)
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_scored"),
            F.sum(F.when(F.col("flag"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_flagged"),
            # h is hour-truncated (sub-second = 0) and the session is
            # UTC, so epoch µs is exactly unix_timestamp · 1e6
            F.min(F.when(F.col("flag"), F.unix_timestamp("h") * 1000000))
            .cast("bigint")
            .alias("first_flag_us"),
        )
        .orderBy("event_type")
    )


@register(
    "Q-TREND-02",
    sql="WITH daily AS ("
    "  SELECT CAST(o_orderdate AS DATE) AS day, "
    "  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
    "    AS rev_c "
    "  FROM orders GROUP BY day) "
    "SELECT day, rev_c, "
    "CAST(SUM(rev_c) OVER (PARTITION BY date_trunc('month', day) "
    "  ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS mtd_c, "
    "CAST(SUM(rev_c) OVER (PARTITION BY date_trunc('year', day) "
    "  ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ytd_c "
    "FROM daily ORDER BY day",
)
def q_trend_02(spark, sf):
    """Month-to-date / year-to-date running revenue — the BI staple
    where the running total RESETS on a calendar boundary: the reset is
    just the window's partition key (month / year truncation), no
    conditional logic — which is why it stays one window pass where a
    hand-rolled reset would need a sessionization-style break scan.
    Complements Q-TREND-01 (month-over-month deltas); exact int64
    cents.

    Scale shape: facts collapse to the daily rollup first (the only
    fact-sized shuffle), then both running sums share one day-ordered
    sort — Catalyst plans one Window operator for the two frames when
    the partition key differs only in truncation granularity? No: two
    Window operators, but both over the SAME day-level table (calendar-
    bounded rows), so the second pass costs nothing at any scale."""
    daily = (
        load(spark, sf, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)))
            .cast("bigint")
            .alias("rev_c")
        )
    )
    w_m = (
        Window.partitionBy(F.date_trunc("month", "day"))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_y = (
        Window.partitionBy(F.date_trunc("year", "day"))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        daily.select(
            "day",
            "rev_c",
            F.sum("rev_c").over(w_m).cast("bigint").alias("mtd_c"),
            F.sum("rev_c").over(w_y).cast("bigint").alias("ytd_c"),
        )
        .orderBy("day")
    )


_PATH1_SQL = """
WITH nx AS (
  SELECT event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS dst
  FROM events),
t AS (
  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
  FROM nx WHERE dst IS NOT NULL GROUP BY src, dst)
SELECT src, dst, n,
       CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS n_src
FROM t ORDER BY src, dst
"""


@register("Q-PATH-01", sql=_PATH1_SQL)
def q_path_01(spark, sf):
    """Clickstream transition matrix (first-order Markov chain): for
    every user's event stream in (ts, event_id) order, count src→dst
    event-type transitions and attach each source's outgoing total —
    the path-analysis primitive behind journey Sankeys, next-action
    prediction features, and drop-off diagnosis. The transition
    probability is the exact rational n / n_src; both terms ship as
    int64 so no float leaves the engine.

    Scale shape: ONE window pass partitioned by user (the same
    per-user ordering every sessionization query already pays), then a
    groupBy on the bounded (src, dst) key space — the output is
    |event_types|² rows regardless of input scale, and the per-source
    totals come from a window over that tiny aggregate, not the facts.
    No self-join: lead() makes the bigram without shuffling events
    against themselves."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nx = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    t = (
        nx.filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    ws = Window.partitionBy("src")
    return (
        t.select(
            "src",
            "dst",
            "n",
            F.sum("n").over(ws).cast("bigint").alias("n_src"),
        )
        .orderBy("src", "dst")
    )


_ATTR1_SQL = """
WITH conv AS (
  SELECT user_id, MIN(ts) AS conv_ts
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
t AS (
  SELECT e.user_id, e.event_type AS channel, e.ts, e.event_id
  FROM events e JOIN conv c ON e.user_id = c.user_id
  WHERE e.ts < c.conv_ts
    AND e.event_type IN ('click', 'view', 'signup')),
s AS (
  SELECT channel,
         COUNT(*) OVER (PARTITION BY user_id) AS n_t,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS ra,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM t)
SELECT channel,
       CAST(SUM(CASE WHEN ra = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS first_touch,
       CAST(SUM(CASE WHEN rd = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS last_touch,
       CAST(SUM(1000000 // n_t) AS BIGINT) AS linear_micro,
       CAST(COUNT(*) AS BIGINT) AS n_touches
FROM s GROUP BY channel ORDER BY channel
"""


@register("Q-ATTR-01", sql=_ATTR1_SQL)
def q_attr_01(spark, sf):
    """Multi-touch marketing attribution over the event stream: each
    converting user's FIRST purchase is the conversion; every
    click/view/signup strictly before it is a touch. Three standard
    models ship side by side per channel — first-touch, last-touch,
    and linear (equal split across the user's touches). Linear credit
    is quantized to integer micro-credits, 1_000_000 div n_touches per
    touch, so the cross-engine comparison is exact (both engines floor
    the positive integer division; the ≤(n−1) µcredit per-user
    remainder is documented quantization, not float drift).

    Scale shape: conversions are a user-keyed aggregate (user
    cardinality, broadcastable); the touch scan joins facts to that
    small side and the per-user window rides the SAME user_id
    partitioning the join just produced. Output is |channels| rows.
    At 100 TB: one fact-sized shuffle on user_id — the minimum any
    per-user attribution model can pay."""
    ev = load(spark, sf, "events")
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    touches = (
        ev.filter(F.col("event_type").isin("click", "view", "signup"))
        .join(F.broadcast(conv), "user_id")
        .filter(F.col("ts") < F.col("conv_ts"))
        .select("user_id", F.col("event_type").alias("channel"), "ts", "event_id")
    )
    wt = Window.partitionBy("user_id")
    wa = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wd = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    s = touches.select(
        "channel",
        F.count(F.lit(1)).over(wt).alias("n_t"),
        F.row_number().over(wa).alias("ra"),
        F.row_number().over(wd).alias("rd"),
    )
    return (
        s.groupBy("channel")
        .agg(
            F.sum(F.when(F.col("ra") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("first_touch"),
            F.sum(F.when(F.col("rd") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("last_touch"),
            F.sum(F.expr("1000000 div n_t")).cast("bigint").alias("linear_micro"),
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        )
        # enum grain (channels ⊂ event types): narrow presentation sort,
        # no range Exchange (plans/scale.bounded_sort, r15 rescreen)
        .transform(bounded_sort, "channel")
    )


_RFM1_SQL = f"""
WITH cust AS (
  SELECT o_custkey,
         datediff('day',
                  CAST(MAX(o_orderdate) AS DATE),
                  (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders))
           AS rec_days,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM({sql_cents('o_totalprice')}) AS BIGINT) AS mon_c
  FROM orders GROUP BY o_custkey),
scored AS (
  SELECT o_custkey, mon_c,
         NTILE(5) OVER (ORDER BY rec_days DESC, o_custkey) AS r,
         NTILE(5) OVER (ORDER BY freq ASC, o_custkey) AS f,
         NTILE(5) OVER (ORDER BY mon_c ASC, o_custkey) AS m
  FROM cust),
seg AS (
  SELECT mon_c,
         CASE WHEN r >= 4 AND f >= 4 AND m >= 4 THEN 'champion'
              WHEN r >= 4 AND f >= 4 THEN 'loyal'
              WHEN m = 5 THEN 'big_spender'
              WHEN r <= 2 AND f >= 4 THEN 'at_risk'
              WHEN r <= 2 THEN 'hibernating'
              ELSE 'regular' END AS segment
  FROM scored)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(mon_c) AS BIGINT) AS sum_mon_c
FROM seg GROUP BY segment ORDER BY segment
"""


def _dist_ntile(df, order_exprs, alias, n_buckets=5, n_parts=32):
    """Exact NTILE(n) over a TOTAL order (the caller's tie-break must
    make the sort key unique) without a single-task global Window:

    1. range-partition on the sort key and pin the assignment with a
       localCheckpoint — range boundaries come from a sampling pass, so
       the two consumers below MUST read one materialization, not
       re-execute the exchange;
    2. rank locally per range (partitionBy(spark_partition_id), fully
       parallel) and add the cumulative row count of earlier ranges —
       ≤ n_parts numbers, computed driver-side from one tiny aggregate
       and shipped back as a literal map;
    3. map global rank → bucket with NTILE's big-buckets-first rule
       (the first n mod k buckets get ⌈n/k⌉ rows), so the result is
       bit-identical to the window form both engines implement.

    Cost: one range shuffle + one pinned materialization of the input
    per scored dimension; every sort runs on 1/n_parts of the rows.
    This replaces the r6 shape (three unpartitioned NTILE windows =
    three single-task sorts of the whole customer dimension — the one
    super-linear point in the r6 10× probe, VERDICT r6 wrong #1)."""
    pid = f"_pid_{alias}"
    d = (
        df.repartitionByRange(n_parts, *order_exprs)
        .withColumn(pid, F.spark_partition_id())
        .localCheckpoint()
    )
    counts = dict(
        d.groupBy(pid).agg(F.count(F.lit(1)).alias("c")).collect()
    )  # bounded: ≤ n_parts rows
    n = sum(counts.values())
    run, offsets = 0, {}
    for p in sorted(counts):
        offsets[p] = run
        run += counts[p]
    off_map = F.create_map(
        *[F.lit(x) for p in offsets for x in (p, offsets[p])]
    )
    q, rem = divmod(n, n_buckets)
    cut = rem * (q + 1)
    r = F.element_at(off_map, F.col(pid)) + F.row_number().over(
        Window.partitionBy(pid).orderBy(*order_exprs)
    )
    # guard q == 0 (n < n_buckets): every rank lands in the first
    # branch (cut == n); Spark yields NULL, not an error, for x/0 in
    # the dead branch
    tile = F.when(
        r <= cut, F.floor((r - 1) / F.lit(q + 1)) + 1
    ).otherwise(F.lit(rem) + F.floor((r - cut - 1) / F.lit(max(q, 1))) + 1)
    return d.withColumn(alias, tile.cast("int")).drop(pid)


@register("Q-RFM-01", sql=_RFM1_SQL)
def q_rfm_01(spark, sf):
    """RFM customer segmentation — the CRM staple: per customer
    Recency (days from their last order to the corpus's last order),
    Frequency (order count), Monetary (lifetime cents); each dimension
    quintiled under a custkey tie-break (higher score = better on
    every axis), then a fixed CASE ladder names the segments and the
    output rolls up to per-segment headcount + revenue. The oracle
    states the quintiles as NTILE(5) windows; the Spark side computes
    the SAME assignment via _dist_ntile (range-partitioned local ranks
    + driver-side offsets + NTILE bucket arithmetic) so no dimension-
    sized sort ever funnels through one task.

    Scale shape: orders collapse to one row per customer first (the
    only fact-sized shuffle); each quintile then costs one range
    shuffle of the customer rollup with per-range parallel sorts —
    at a 10⁹-customer dimension that is 32 bounded sorts per axis
    instead of the r6 shape's three single-task global sorts
    (VERDICT r6 wrong #1). The anchor date is a 1-row broadcast."""
    orders = load(spark, sf, "orders")
    anchor = orders.agg(
        F.max(F.to_date("o_orderdate")).alias("anchor_day")
    )
    cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_day"),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum(cents("o_totalprice")).cast("bigint").alias("mon_c"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("anchor_day", "last_day").alias("rec_days"),
            "freq",
            "mon_c",
        )
    )
    scored = _dist_ntile(
        cust, [F.col("rec_days").desc(), F.asc("o_custkey")], "r"
    )
    scored = _dist_ntile(
        scored, [F.asc("freq"), F.asc("o_custkey")], "f"
    )
    scored = _dist_ntile(
        scored, [F.asc("mon_c"), F.asc("o_custkey")], "m"
    )
    seg = scored.select(
        "mon_c",
        F.when((F.col("r") >= 4) & (F.col("f") >= 4) & (F.col("m") >= 4), "champion")
        .when((F.col("r") >= 4) & (F.col("f") >= 4), "loyal")
        .when(F.col("m") == 5, "big_spender")
        .when((F.col("r") <= 2) & (F.col("f") >= 4), "at_risk")
        .when(F.col("r") <= 2, "hibernating")
        .otherwise("regular")
        .alias("segment"),
    )
    return (
        seg.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("mon_c").cast("bigint").alias("sum_mon_c"),
        )
        # enum grain (6 fixed segment labels): narrow presentation sort, no range
        # Exchange (plans/scale.bounded_sort, r15 rescreen)
        .transform(bounded_sort, "segment")
    )


_FUNNEL2_SQL = """
WITH s AS (
  SELECT user_id, MIN(ts) AS s_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id),
a AS (
  SELECT s.user_id, s.s_ts,
         MIN(CASE WHEN e.event_type = 'purchase' AND e.ts > s.s_ts
                  THEN e.ts END) AS p_ts,
         MIN(CASE WHEN e.event_type = 'error' AND e.ts > s.s_ts
                  THEN e.ts END) AS e_ts
  FROM s JOIN events e ON e.user_id = s.user_id
  GROUP BY s.user_id, s.s_ts)
SELECT CAST(date_trunc('week', s_ts) AS DATE) AS cohort_week,
       CAST(COUNT(*) AS BIGINT) AS n_signups,
       CAST(SUM(CASE WHEN p_ts IS NOT NULL
                      AND p_ts <= s_ts + INTERVAL 7 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_conv_7d,
       CAST(SUM(CASE WHEN p_ts IS NOT NULL
                      AND p_ts <= s_ts + INTERVAL 7 DAY
                      AND (e_ts IS NULL OR e_ts >= p_ts)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_conv_clean
FROM a GROUP BY cohort_week ORDER BY cohort_week
"""


@register("Q-FUNNEL-02", sql=_FUNNEL2_SQL)
def q_funnel_02(spark, sf):
    """Funnel with a deadline AND a temporal NEGATION: per signup-week
    cohort, how many users purchased within 7 days of their first
    signup — and how many of those converted CLEANLY, i.e. hit no
    error event strictly between the signup and that first purchase.
    Q-FUNNEL-01 counts ordered progress; real product analytics also
    asks the "without X in between" question (friction analysis,
    clean-path conversion), which is NOT a monotone-min funnel — it
    needs the negated event's position relative to BOTH endpoints.

    The trick that keeps it one aggregate: "no error in (s_ts, p_ts)"
    ⟺ "the FIRST error after s_ts is ≥ p_ts (or absent)" — so one
    conditional MIN per event class (purchase-after, error-after)
    computed in the same per-user pass decides the predicate, and no
    per-pair interval join ever forms.

    Scale shape: signup firsts are a user-keyed aggregate
    (broadcastable); facts shuffle ONCE on user_id for the conditional
    mins; the cohort rollup is calendar-bounded. Same minimal shape as
    Q-ATTR-01."""
    ev = load(spark, sf, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    a = (
        ev.join(F.broadcast(s), "user_id")
        .groupBy("user_id", "s_ts")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("s_ts")),
                    F.col("ts"),
                )
            ).alias("p_ts"),
            F.min(
                F.when(
                    (F.col("event_type") == "error")
                    & (F.col("ts") > F.col("s_ts")),
                    F.col("ts"),
                )
            ).alias("e_ts"),
        )
    )
    deadline = F.expr("s_ts + INTERVAL 7 DAY")
    conv = F.col("p_ts").isNotNull() & (F.col("p_ts") <= deadline)
    clean = conv & (F.col("e_ts").isNull() | (F.col("e_ts") >= F.col("p_ts")))
    return (
        a.groupBy(F.date_trunc("week", "s_ts").cast("date").alias("cohort_week"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_signups"),
            F.sum(F.when(conv, 1).otherwise(0)).cast("bigint").alias("n_conv_7d"),
            F.sum(F.when(clean, 1).otherwise(0))
            .cast("bigint")
            .alias("n_conv_clean"),
        )
        # calendar grain (cohort weeks): narrow presentation sort, no range
        # Exchange (plans/scale.bounded_sort, r15 rescreen)
        .transform(bounded_sort, "cohort_week")
    )


_COHORT2_SQL = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
  FROM events),
marked AS (
  SELECT user_id, wk,
         MIN(wk) OVER (PARTITION BY user_id) AS first_wk,
         lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
         lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
  FROM act),
cls AS (
  SELECT wk,
         CAST(SUM(CASE WHEN wk = first_wk THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
         CAST(SUM(CASE WHEN wk != first_wk AND prev_wk = wk - 7
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
         CAST(SUM(CASE WHEN wk != first_wk
                        AND (prev_wk IS NULL OR prev_wk < wk - 7)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
  FROM marked GROUP BY wk),
churn AS (
  SELECT wk + 7 AS wk, CAST(COUNT(*) AS BIGINT) AS n_churned
  FROM marked
  WHERE next_wk IS NULL OR next_wk > wk + 7
  GROUP BY wk + 7),
maxwk AS (SELECT MAX(wk) AS mw FROM cls)
SELECT c.wk, c.n_new, c.n_retained, c.n_resurrected,
       COALESCE(h.n_churned, 0) AS n_churned
FROM cls c LEFT JOIN churn h ON h.wk = c.wk, maxwk
WHERE c.wk <= maxwk.mw
ORDER BY c.wk
"""


@register("Q-COHORT-02", sql=_COHORT2_SQL)
def q_cohort_02(spark, sf):
    """Growth accounting (the Social-Capital quick-ratio decomposition):
    every weekly active user is exactly one of NEW (first week ever),
    RETAINED (also active the prior week) or RESURRECTED (returning
    after a gap), and each week also counts CHURNED (active the prior
    week, absent now — attributed via each activity row's lead(): a
    user churns at wk+7 when their next activity is absent or later).
    Q-COHORT-01's retention triangle tracks one cohort's decay; this
    is the week-over-week P&L of the user base that product teams
    actually report (new + resurrected vs churned).

    The identity activity(w) = new + retained + resurrected and
    churned(w) = active(w−7) − retained(w) both follow from the
    classification, making the output self-auditing
    (examples/product_analytics.py asserts both). Reporting grain is
    "weeks with any activity": a hypothetical week where every user
    churned and none were active carries no row (its churn shows up in
    the preceding active week's successor when activity resumes) —
    join onto a calendar spine (Q-DATE-06) if dead weeks must render.

    Scale shape: facts collapse to DISTINCT (user, week) first; the
    first/prev/next markers are one per-user window pass over that
    rollup; weekly counts + the churn self-attribution are
    calendar-bounded. One user-keyed shuffle total."""
    act = (
        load(spark, sf, "events")
        .select(
            "user_id",
            F.date_trunc("week", "ts").cast("date").alias("wk"),
        )
        .distinct()
    )
    wu = Window.partitionBy("user_id")
    wo = Window.partitionBy("user_id").orderBy("wk")
    marked = act.select(
        "user_id",
        "wk",
        F.min("wk").over(wu).alias("first_wk"),
        F.lag("wk").over(wo).alias("prev_wk"),
        F.lead("wk").over(wo).alias("next_wk"),
    )
    cls = marked.groupBy("wk").agg(
        F.sum(F.when(F.col("wk") == F.col("first_wk"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(
            F.when(
                (F.col("wk") != F.col("first_wk"))
                & (F.col("prev_wk") == F.date_sub("wk", 7)),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_retained"),
        F.sum(
            F.when(
                (F.col("wk") != F.col("first_wk"))
                & (
                    F.col("prev_wk").isNull()
                    | (F.col("prev_wk") < F.date_sub("wk", 7))
                ),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_resurrected"),
    )
    churn = (
        marked.filter(
            F.col("next_wk").isNull()
            | (F.col("next_wk") > F.date_add("wk", 7))
        )
        .groupBy(F.date_add("wk", 7).alias("wk"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned"))
    )
    maxwk = cls.agg(F.max("wk").alias("mw"))
    return (
        cls.join(churn, "wk", "left")
        .crossJoin(F.broadcast(maxwk))
        .filter(F.col("wk") <= F.col("mw"))
        .select(
            "wk",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0)).cast("bigint").alias("n_churned"),
        )
        .orderBy("wk")
    )


_QUAL5_SQL = """
SELECT * FROM (
  SELECT 'orders->customer' AS rel,
         CAST(COUNT(*) AS BIGINT) AS n_child,
         CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_orphans,
         CAST(COALESCE(SUM(CASE WHEN c.c_custkey IS NULL
                            THEN o.o_orderkey END), 0) AS BIGINT)
           AS orphan_key_sum
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  UNION ALL
  SELECT 'lineitem->orders',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT),
         CAST(COALESCE(SUM(CASE WHEN o.o_orderkey IS NULL
                            THEN l.l_orderkey END), 0) AS BIGINT)
  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  UNION ALL
  SELECT 'lineitem->part',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT),
         CAST(COALESCE(SUM(CASE WHEN p.p_partkey IS NULL
                            THEN l.l_partkey END), 0) AS BIGINT)
  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
  UNION ALL
  SELECT 'events->customer(sampled)',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT),
         CAST(COALESCE(SUM(CASE WHEN c.c_custkey IS NULL
                            THEN e.event_id END), 0) AS BIGINT)
  FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey)
ORDER BY rel
"""


@register("Q-QUAL-05", sql=_QUAL5_SQL)
def q_qual_05(spark, sf):
    """Cross-table referential-integrity audit — the warehouse health
    check the row/value gates (Q-QUAL-01..04) don't cover: every
    foreign-key relationship is scanned for ORPHANS (child rows whose
    parent key is missing), reporting child cardinality, orphan count,
    and an orphan-key checksum so a regression pinpoints WHICH rows
    broke, not just how many. The events→customer edge is the
    interesting one on this fixture: event user_ids exceed the
    customer key space, so the audit must actually count real orphans
    — a zeros-only integrity check proves nothing.

    Scale shape: each relationship is one LEFT join with the PARENT
    side broadcast (keys + nothing else — a parent key list broadcasts
    at dimension scale even when the dim itself would not), then a
    map-side-combined rollup; relationships run independently and
    union four 1-row results."""
    def audit(child, ckey, parent, pkey, rel, idcol):
        pk = F.broadcast(parent.select(pkey).distinct())
        j = child.join(pk, child[ckey] == pk[pkey], "left")
        return j.agg(
            F.lit(rel).alias("rel"),
            F.count(F.lit(1)).cast("bigint").alias("n_child"),
            F.sum(F.when(F.col(pkey).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_orphans"),
            F.coalesce(
                F.sum(F.when(F.col(pkey).isNull(), child[idcol])), F.lit(0)
            )
            .cast("bigint")
            .alias("orphan_key_sum"),
        )

    orders = load(spark, sf, "orders")
    customer = load(spark, sf, "customer")
    lineitem = load(spark, sf, "lineitem")
    part = load(spark, sf, "part")
    events = load(spark, sf, "events")
    parts_ = [
        audit(orders, "o_custkey", customer, "c_custkey",
              "orders->customer", "o_orderkey"),
        audit(lineitem, "l_orderkey", orders, "o_orderkey",
              "lineitem->orders", "l_orderkey"),
        audit(lineitem, "l_partkey", part, "p_partkey",
              "lineitem->part", "l_partkey"),
        audit(events, "user_id", customer, "c_custkey",
              "events->customer(sampled)", "event_id"),
    ]
    out = parts_[0]
    for p_ in parts_[1:]:
        out = out.unionByName(p_)
    return out.orderBy("rel")


_PROF2_SQL = f"""
WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM events GROUP BY user_id),
t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM c),
b AS (SELECT {md5_poly("CAST(user_id AS VARCHAR)", 2, descending=True)} % 32
         AS bucket,
             SUM(cnt) AS n
      FROM c GROUP BY bucket),
bm AS (SELECT CAST(MAX(n) AS BIGINT) AS bucket_max FROM b),
k AS (SELECT user_id, cnt FROM c ORDER BY cnt DESC, user_id LIMIT 10),
r AS (SELECT a.user_id, a.cnt,
             CAST(COUNT(*) AS BIGINT) AS rk,
             CAST(SUM(b2.cnt) AS BIGINT) AS cum
      FROM k a JOIN k b2
        ON b2.cnt > a.cnt OR (b2.cnt = a.cnt AND b2.user_id <= a.user_id)
      GROUP BY a.user_id, a.cnt)
SELECT rk, user_id, cnt,
       CAST(cnt * 1000 // total AS BIGINT) AS share_pm,
       CAST(cum * 1000 // total AS BIGINT) AS cum_pm,
       bucket_max AS bucket_max_rows,
       CAST(bucket_max * 32000 // total AS BIGINT) AS bucket_skew_pm
FROM r, t, bm ORDER BY rk
"""


def profile_key_skew(df, key_col: str, top_k: int = 10, num_buckets: int = 32):
    """Public API behind Q-PROF-02: profile the distribution of a join
    key before shuffling on it. Returns one row per top-``top_k`` key
    (heaviest first, key-ascending tie-break) with exact count,
    floor-per-mille share of total rows, cumulative concentration, and
    two constant diagnostic columns: the row count of the fullest of
    ``num_buckets`` simulated hash partitions (md5-derived bucket, so
    the histogram is engine/partitioner-neutral) and its skew ratio in
    per-mille (1000 = perfectly even; ``num_buckets``·1000 = everything
    on one bucket).

    Scale shape: one map-combined key-grain aggregate; top-k via
    TakeOrderedAndProject; rank/cumulative via a k x k broadcast
    triangle join (never a SinglePartition window); bucket histogram is
    a ``num_buckets``-group rollup of the key grain."""
    # key_col reaches name-PARSING sites (groupBy/F.col/F.asc/select
    # strings and the md5_poly SQL fragment), all of which split on
    # dots and reject spaces/hyphens — backtick-quote it once and use
    # the quoted form at every such site, so any literal column name
    # works (embedded backticks escape by doubling, Spark SQL's rule);
    # output columns keep the ORIGINAL unquoted name
    quoted = "`" + key_col.replace("`", "``") + "`"
    c = df.groupBy(quoted).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    total = c.agg(F.sum("cnt").cast("bigint").alias("total"))
    # the SAME md5-polynomial fragment the SQL twin embeds (one audited
    # definition, functions.md5_poly)
    bucket = (
        F.expr(md5_poly(f"CAST({quoted} AS STRING)", 2, descending=True))
        % num_buckets
    )
    bm = (
        c.groupBy(bucket.alias("bucket"))
        .agg(F.sum("cnt").alias("n"))
        .agg(F.max("n").cast("bigint").alias("bucket_max"))
    )
    k = c.orderBy(F.desc("cnt"), F.asc(quoted)).limit(top_k)
    a, b2 = k.alias("a"), k.alias("b")
    le = (F.col("b.cnt") > F.col("a.cnt")) | (
        (F.col("b.cnt") == F.col("a.cnt"))
        & (F.col(f"b.{quoted}") <= F.col(f"a.{quoted}"))
    )
    r = (
        a.join(F.broadcast(b2), le)
        .groupBy(
            F.col(f"a.{quoted}").alias(key_col),
            F.col("a.cnt").alias("cnt"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("rk"),
            F.sum("b.cnt").cast("bigint").alias("cum"),
        )
    )
    skew_factor = num_buckets * 1000
    return (
        r.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(bm))
        .select(
            "rk",
            quoted,
            "cnt",
            F.expr("cnt * 1000 div total").cast("bigint").alias("share_pm"),
            F.expr("cum * 1000 div total").cast("bigint").alias("cum_pm"),
            F.col("bucket_max").alias("bucket_max_rows"),
            F.expr(f"bucket_max * {skew_factor} div total")
            .cast("bigint")
            .alias("bucket_skew_pm"),
        )
        .orderBy("rk")
    )


@register("Q-PROF-02", sql=_PROF2_SQL)
def q_prof_02(spark, sf):
    """Join-key skew profiler — the DIAGNOSIS step that decides whether a
    key needs Q-JOIN-15's salting or AQE skew splitting before a big
    join: top-10 heaviest keys with exact counts, per-mille share of
    total, cumulative concentration, plus a simulated 32-bucket hash-
    partition histogram (md5-derived bucket, engine-neutral) whose
    max-bucket skew ratio (1000 = perfectly even) says how lopsided the
    shuffle would actually be. Profile first, salt only what this
    flags: a 10^9-key uniform column and a power-law column look the
    same in a row count and completely different here.

    Scale shape: see profile_key_skew (the public API this delegates
    to) — nothing bigger than the key grain ever shuffles, and the
    profiler is property-tested against an independent pure-pandas
    reference in tests/test_eval_profile_property.py."""
    return profile_key_skew(load(spark, sf, "events"), "user_id")
