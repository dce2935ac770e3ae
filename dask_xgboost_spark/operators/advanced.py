"""Advanced query shapes (SURVEY.md §2C: SUBQ/CTE/PIVOT/SAMPLE).

Subqueries/CTEs run through spark.sql so Catalyst's decorrelation
(RewriteCorrelatedScalarSubquery) does the rewriting — no hand-authored
join forms. The plan assert tests check the decorrelated shape.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dask_xgboost_spark.functions import cents, sql_cents, sql_dec
from dask_xgboost_spark.plans.scale import bounded_sort
from dask_xgboost_spark.registry import register
from dask_xgboost_spark.sources import load

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@register(
    "Q-SUBQ-01",
    sql="SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > "
    f"(SELECT CAST(SUM({sql_dec('o_totalprice')}) AS DOUBLE) / COUNT(*) FROM orders) "
    "ORDER BY o_orderkey",
)
def q_subq_01(spark, sf):
    """Scalar subquery: orders above the global average price (exact-decimal
    average → identical double threshold in both engines)."""
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > "
        f"(SELECT CAST(SUM({sql_dec('o_totalprice')}) AS DOUBLE) / COUNT(*) FROM orders) "
        "ORDER BY o_orderkey"
    )


@register(
    "Q-SUBQ-02",
    sql="SELECT c_custkey FROM customer WHERE EXISTS ("
    "SELECT 1 FROM events WHERE user_id = c_custkey AND event_type = 'purchase') "
    "ORDER BY c_custkey",
)
def q_subq_02(spark, sf):
    """Correlated EXISTS subquery (Catalyst decorrelates to a semi join)."""
    load(spark, sf, "customer").createOrReplaceTempView("customer")
    load(spark, sf, "events").createOrReplaceTempView("events")
    return spark.sql(
        "SELECT c_custkey FROM customer WHERE EXISTS ("
        "SELECT 1 FROM events WHERE user_id = c_custkey AND event_type = 'purchase') "
        "ORDER BY c_custkey"
    )


_SUBQ3_SQL = (
    "SELECT l.l_partkey, l.l_suppkey, l.l_extendedprice FROM lineitem l "
    "WHERE l.l_extendedprice = (SELECT MIN(l2.l_extendedprice) FROM lineitem l2 "
    "WHERE l2.l_partkey = l.l_partkey) "
    "ORDER BY l.l_partkey, l.l_suppkey, l.l_extendedprice"
)


@register("Q-SUBQ-03", sql=_SUBQ3_SQL)
def q_subq_03(spark, sf):
    """Correlated *scalar* subquery (TPC-H Q2's min-cost-supplier shape):
    cheapest lineitem per part. Catalyst decorrelates to an aggregate +
    self-join — no per-row subquery execution."""
    load(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_SUBQ3_SQL)


_CTE_SQL = (
    "WITH rev AS ("
    "  SELECT o_custkey, CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)"
    "  AS r_cents FROM orders GROUP BY o_custkey"
    "), big AS ("
    "  SELECT o_custkey, r_cents FROM rev WHERE r_cents > 150000000"
    ") SELECT c_custkey, c_mktsegment, r_cents, r_cents / 1e2 AS r "
    "FROM big JOIN customer ON o_custkey = c_custkey "
    "ORDER BY c_custkey"
)


@register("Q-CTE-01", sql=_CTE_SQL)
def q_cte_01(spark, sf):
    """Chained CTEs: per-customer revenue → threshold → join back to dims.
    Revenue is carried as exact int64 cents (shared SQL text runs
    identically in Spark SQL and DuckDB; no DECIMAL output columns)."""
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    load(spark, sf, "customer").createOrReplaceTempView("customer")
    return spark.sql(_CTE_SQL)


@register(
    "Q-SQL-01",
    sql="SELECT l_returnflag, COUNT(*) AS n, "
    "CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c "
    "FROM lineitem WHERE l_quantity > 25 GROUP BY l_returnflag "
    "ORDER BY l_returnflag",
)
def q_sql_01(spark, sf):
    """SQL pipe syntax (Spark 4 / the GoogleSQL-style linear dialect):
    the same logical plan as chained DataFrame calls, written as
    ``FROM … |> WHERE … |> AGGREATE … GROUP BY … |> ORDER BY`` — each
    ``|>`` stage reads top-to-bottom in execution order instead of
    inside-out SQL nesting. Catalyst compiles it to the identical
    optimized plan (pushed filter, partial+final aggregate), so the
    dialect is free; the oracle states the classic-SQL equivalent."""
    load(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        "FROM lineitem "
        "|> WHERE l_quantity > 25 "
        "|> AGGREGATE COUNT(*) AS n, "
        "   SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev_c "
        "   GROUP BY l_returnflag "
        "|> SELECT l_returnflag, n, rev_c"
        # enum grain (return flags): narrow presentation sort instead of
        # the |> ORDER BY stage's range Exchange (plans/scale.bounded_sort,
        # r15 rescreen); oracle SQL unchanged
    ).transform(bounded_sort, "l_returnflag")


@register(
    "Q-PIVOT-01",
    sql="SELECT user_id, "
    + ", ".join(
        f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}" for t in EVENT_TYPES
    )
    + " FROM events GROUP BY user_id ORDER BY user_id",
)
def q_pivot_01(spark, sf):
    """Pivot event counts by event_type (explicit value list → single-pass
    hash aggregate, no extra distinct job at scale)."""
    p = (
        load(spark, sf, "events")
        .groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .count()
    )
    return p.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES],
    ).orderBy("user_id")


@register(
    "Q-SAMPLE-01",
    # r12 golden→hash upgrade (VERDICT r11 item 5, the L-MIX-01/Q-SAMPLE-02
    # md5-threshold discipline): membership = first hex byte of
    # md5("okey|lnum") < 0x1a (26/256 ≈ 10.2%) — identical UTF-8 input and
    # lowercase-hex compare in both engines, so the SAMPLE ITSELF is
    # oracle-pinned, not just its size. The xxhash64 variant it replaces
    # was deterministic but Spark-only (DuckDB has no xxhash64), hence
    # permanently golden; Bernoulli .sample(seed) API coverage moved to
    # tests/test_golden.py (partitioning-dependent by nature, never
    # oracle-checkable).
    sql="SELECT CAST(COUNT(*) AS BIGINT) AS sample_rows, "
    f"CAST(SUM({sql_cents('l_quantity')}) AS BIGINT) AS sample_qty_c, "
    "CAST(MIN(l_orderkey) AS BIGINT) AS min_okey, "
    "CAST(MAX(l_orderkey) AS BIGINT) AS max_okey, "
    "CAST(SUM(l_orderkey) AS BIGINT) AS okey_sum "
    "FROM lineitem WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || '|' "
    "|| CAST(l_linenumber AS VARCHAR)), 1, 2) < '1a'",
)
def q_sample_01(spark, sf):
    """Deterministic ~10% sample of lineitem via content-hash threshold —
    stable under any partitioning, retry, or incremental re-run (the
    production-grade deterministic sample at 100 TB, unlike seeded
    Bernoulli sampling, which is partitioning-dependent). Map-only
    filter + one no-group aggregate to witness the sampled set exactly
    (count, exact-cents quantity mass, key extrema/sum)."""
    li = load(spark, sf, "lineitem")
    member = (
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            1,
            2,
        )
        < "1a"
    )

    return li.filter(member).agg(
        F.count(F.lit(1)).alias("sample_rows"),
        F.sum(cents("l_quantity")).alias("sample_qty_c"),
        F.min("l_orderkey").alias("min_okey"),
        F.max("l_orderkey").alias("max_okey"),
        F.sum("l_orderkey").alias("okey_sum"),
    )


@register(
    "Q-SAMPLE-02",
    # md5 hex is identical in both engines for the same UTF-8 string, and
    # lexicographic compare of lowercase hex is portable → a hash-mode
    # checkable deterministic sample (unlike PRNG .sample(seed))
    sql="SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_sampled, "
    "CAST(MIN(c_custkey) AS BIGINT) AS min_key, "
    "CAST(SUM(c_custkey) AS BIGINT) AS key_sum "
    "FROM customer WHERE substring(md5(CAST(c_custkey AS VARCHAR)), 1, 2) < '33' "
    "GROUP BY c_mktsegment ORDER BY c_mktsegment",
)
def q_sample_02(spark, sf):
    """Stratified deterministic sampling: ~20% of each market segment
    (P(md5 first byte < 0x33) = 51/256), keyed on a stable column hash —
    the sampling shape that survives retries, repartitioning, and
    incremental re-runs at 100 TB, where seeded Bernoulli sampling does
    not (it is partitioning-dependent). Map-only filter + one grouped
    rollup to witness per-stratum counts; hash-checked cross-engine via
    the md5-hex trick."""
    return (
        load(spark, sf, "customer")
        .filter(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 2) < "33")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            F.min("c_custkey").cast("long").alias("min_key"),
            F.sum("c_custkey").cast("long").alias("key_sum"),
        )
        # enum grain (market segments): narrow presentation sort, no range
        # Exchange (plans/scale.bounded_sort, r15 rescreen)
        .transform(bounded_sort, "c_mktsegment")
    )


@register(
    "Q-SUBQ-04",
    # the oracle exercises DuckDB's correlated LATERAL; the Spark side
    # computes the same top-2-per-key via a ranked window — the plan
    # Catalyst would want anyway (lateral-with-limit decorrelates poorly)
    sql="SELECT c.c_custkey, t.o_orderkey, t.price_c, t.rn "
    "FROM customer c, LATERAL ("
    "SELECT o_orderkey, "
    "CAST(round(o_totalprice * 100) AS BIGINT) AS price_c, "
    "ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn "
    "FROM orders WHERE o_custkey = c.c_custkey "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t "
    "ORDER BY c.c_custkey, t.rn",
)
def q_subq_04(spark, sf):
    """Correlated LATERAL top-k: each customer's two largest orders (rank
    included) — the per-entity top-N join every feature store and
    leaderboard needs. The declarative lateral form re-executes the inner
    query per outer row; the scalable physical plan is rank-then-filter:
    one window over orders partitioned by the correlation key, filter
    rn <= k, then join the (already tiny) winners to the dimension. One
    shuffle on o_custkey for the window, broadcast-join back to customer
    — no per-row re-execution, no nested loops, survives 100 TB where a
    naive lateral nested-loop would not."""
    from pyspark.sql import Window


    o = load(spark, sf, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice", cents("o_totalprice").alias("price_c")
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    top2 = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "price_c", "rn")
    )
    c = load(spark, sf, "customer").select("c_custkey")
    return (
        c.join(top2, c.c_custkey == top2.o_custkey)
        .select("c_custkey", "o_orderkey", "price_c", "rn")
        .orderBy("c_custkey", "rn")
    )


@register(
    "Q-CTE-02",
    sql="WITH RECURSIVE h AS ("
    "SELECT c_custkey AS node, 0 AS depth FROM customer WHERE c_custkey = 0 "
    "UNION ALL "
    "SELECT c.c_custkey, h.depth + 1 FROM customer c "
    "JOIN h ON c.c_custkey // 2 = h.node AND c.c_custkey > h.node) "
    "SELECT CAST(node AS BIGINT) AS node, CAST(depth AS BIGINT) AS depth "
    "FROM h ORDER BY node",
)
def q_cte_02(spark, sf):
    """Recursive CTE (hierarchy walk) as the explicit distributed
    equivalent: level-synchronous frontier BFS. (Spark 4 grew native
    WITH RECURSIVE — Q-CTE-03 runs that form on this build; this entry
    keeps the iterative translation, which is what you write on engines
    or Spark versions without it, and what the native operator executes
    underneath anyway.) The hierarchy is synthesized in-query from customer keys
    (parent(k) = k // 2, a binary tree rooted at key 0, contiguous TPC-H
    keys guarantee every parent exists); the oracle is DuckDB's native
    WITH RECURSIVE over the same tree.

    Scale shape: each level is ONE hash-join shuffle of the (shrinking)
    frontier against the child index, truncated with localCheckpoint so
    the logical plan stays flat (see connected_components: cache() alone
    nests plans exponentially). Rounds = tree depth = O(log n) for this
    tree; the frontier-count convergence check is distributed (count()),
    never a collect of rows. On a real cluster, pre-partition the edge
    table by parent key so every round reuses the same partitioning."""
    cust = load(spark, sf, "customer").select(
        F.col("c_custkey").cast("long").alias("node")
    )
    edges = (
        cust.filter(F.col("node") > 0)
        .select(
            F.floor(F.col("node") / 2).cast("long").alias("parent"),
            F.col("node").alias("child"),
        )
        .localCheckpoint()
    )
    frontier = (
        cust.filter(F.col("node") == 0)
        .withColumn("depth", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    result = frontier
    for _ in range(64):  # bound = bit-length of any realistic key space
        frontier = (
            edges.join(frontier, edges.parent == frontier.node)
            .select(
                F.col("child").alias("node"),
                (F.col("depth") + F.lit(1)).alias("depth"),
            )
            .localCheckpoint()
        )
        if frontier.count() == 0:
            break
        result = result.union(frontier)
    else:  # pragma: no cover - depth beyond bound means a malformed tree
        raise RuntimeError("hierarchy deeper than 64 levels (cycle?)")
    return result.orderBy("node")


@register(
    "Q-SUBQ-05",
    # the subquery synthesizes a NULL row (custkey 0 → NULL): plain
    # NOT IN must then return EMPTY (3-valued logic) — so the operator
    # uses the NULL-filtered form, which is what users almost always mean
    sql="SELECT c_custkey FROM customer WHERE c_custkey NOT IN ("
    "SELECT CASE WHEN o_custkey = 0 THEN NULL ELSE o_custkey END "
    "FROM orders WHERE "
    "CASE WHEN o_custkey = 0 THEN NULL ELSE o_custkey END IS NOT NULL) "
    "ORDER BY c_custkey",
)
def q_subq_05(spark, sf):
    """NOT IN with a nullable subquery — the classic 3-valued-logic trap:
    one NULL in the subquery makes plain NOT IN return ZERO rows (x <>
    NULL is unknown), identically in Spark and DuckDB. The registered
    form filters the NULLs (the intent users have ~always); Spark plans
    the unfiltered form as a NullAwareAntiJoin (asserted in
    tests/test_plans.py), which at scale degrades to a broadcast of the
    whole subquery — another reason to write NOT EXISTS / filter NULLs.

    Scale shape (filtered form): LeftAnti hash join — shuffles once on
    the key, no null-aware broadcast."""
    load(spark, sf, "customer").createOrReplaceTempView("customer")
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        "SELECT c_custkey FROM customer WHERE c_custkey NOT IN ("
        "SELECT CASE WHEN o_custkey = 0 THEN NULL ELSE o_custkey END "
        "FROM orders WHERE "
        "CASE WHEN o_custkey = 0 THEN NULL ELSE o_custkey END IS NOT NULL) "
        "ORDER BY c_custkey"
    )


@register(
    "Q-PIVOT-03",
    # oracle = the portable UNION ALL melt; measures are exact int64
    # cents/counts so the long-form `val` column is one BIGINT type
    sql="WITH w AS (SELECT l_returnflag, "
    f" CAST(SUM({sql_cents('l_quantity')}) AS BIGINT) AS qty_c, "
    f" CAST(SUM({sql_cents('l_extendedprice')}) AS BIGINT) AS price_c, "
    " COUNT(*) AS n_rows FROM lineitem GROUP BY l_returnflag) "
    "SELECT l_returnflag, 'qty_c' AS measure, qty_c AS val FROM w "
    "UNION ALL SELECT l_returnflag, 'price_c', price_c FROM w "
    "UNION ALL SELECT l_returnflag, 'n_rows', n_rows FROM w "
    "ORDER BY l_returnflag, measure",
)
def q_pivot_03(spark, sf):
    """Unpivot / melt via the native ``DataFrame.unpivot`` API (Catalyst
    Expand node: one pass, rows × measures output, no join, no Python) —
    the declarative twin of Q-PIVOT-02's ``stack`` expression form, here
    over aggregated exact-cents measures; the oracle states the portable
    UNION ALL formulation.
    Measures are pre-cast to one exact int64 type — unpivot requires a
    common value type, and doing it with exact cents keeps the check
    hash-strict.

    Scale shape: Expand multiplies rows by the measure count map-side —
    output-bound, shuffle-free; the upstream aggregate is the only
    shuffle."""

    li = load(spark, sf, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(cents("l_quantity")).cast("bigint").alias("qty_c"),
        F.sum(cents("l_extendedprice")).cast("bigint").alias("price_c"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return (
        wide.unpivot(
            ["l_returnflag"], ["qty_c", "price_c", "n_rows"], "measure", "val"
        )
        .orderBy("l_returnflag", "measure")
    )


_LATERAL_SQL = (
    "SELECT n.n_name, t.c_custkey, t.bal_c FROM nation n, "
    "LATERAL (SELECT c_custkey, "
    f" {sql_cents('c_acctbal')} AS bal_c "
    " FROM customer WHERE c_nationkey = n.n_nationkey "
    " ORDER BY bal_c DESC, c_custkey LIMIT 2) t "
    "ORDER BY n.n_name, t.bal_c DESC, t.c_custkey"
)


@register("Q-SUBQ-06", sql=_LATERAL_SQL)
def q_subq_06(spark, sf):
    """True ``LATERAL`` correlated table subquery — the SQL-standard
    per-row derived table (top-2 customers for EACH nation), written
    with the actual LATERAL keyword in both engines (Q-SUBQ-04 covers
    the semantically-equivalent ranked-window rewrite; this entry pins
    the SYNTAX surface). Catalyst decorrelates the LATERAL LIMIT
    subquery into a ranked-window join — same physical plan family as
    the rewrite, which is exactly the claim: users can write the
    standard form and still get the distributed plan, not a per-row
    subquery execution. Deterministic (bal_c, custkey) tie-break."""
    for t in ("nation", "customer"):
        load(spark, sf, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


_SUBQ7_SQL = (
    # u < 3 keys + one NULL planted into the subquery's output: NOT IN
    # must return ZERO rows (any NULL in the list makes x NOT IN (...)
    # never-true), while NOT EXISTS ignores the NULL row entirely
    "WITH sub AS (SELECT CASE WHEN user_id < 3 THEN user_id END AS k "
    f" FROM events), "
    "t AS (SELECT DISTINCT o_custkey AS c FROM orders WHERE o_custkey < 20) "
    "SELECT "
    " CAST((SELECT COUNT(*) FROM t WHERE c NOT IN (SELECT k FROM sub)) AS BIGINT) "
    "   AS not_in_n, "
    " CAST((SELECT COUNT(*) FROM t WHERE NOT EXISTS "
    "   (SELECT 1 FROM sub WHERE sub.k = t.c)) AS BIGINT) AS not_exists_n, "
    " CAST((SELECT COUNT(*) FROM t WHERE c NOT IN "
    "   (SELECT k FROM sub WHERE k IS NOT NULL)) AS BIGINT) AS not_in_filtered_n"
)


@register("Q-SUBQ-07", sql=_SUBQ7_SQL)
def q_subq_07(spark, sf):
    """NOT IN vs NOT EXISTS null semantics — the classic SQL trap,
    pinned as an executable contract: with one NULL in the subquery's
    output, ``NOT IN`` returns ZERO rows (three-valued logic: x NOT IN
    a list containing NULL is never true), ``NOT EXISTS`` ignores the
    NULL row, and ``NOT IN`` over the null-filtered subquery equals
    NOT EXISTS. All three counts are emitted side by side so a
    migration between the forms can never silently change results.

    Scale shape: Catalyst compiles NOT IN with a nullable subquery to
    a null-aware anti join (a broadcast-only plan — the null check
    needs the whole right side on every task) and NOT EXISTS to an
    ordinary shuffled/broadcast LEFT ANTI. At fact scale, prefer NOT
    EXISTS / IS NOT NULL-filtered NOT IN: the null-aware form cannot
    shuffle-partition, which is exactly why this pin matters in code
    review."""
    load(spark, sf, "events").createOrReplaceTempView("events")
    load(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SUBQ7_SQL)


_CTE3_SQL = (
    "WITH RECURSIVE tree(k, depth) AS ("
    "  SELECT CAST(0 AS BIGINT) AS k, CAST(0 AS BIGINT) AS depth "
    "  UNION ALL "
    "  SELECT c.c_custkey, t.depth + 1 FROM tree t JOIN customer c "
    "  ON c.c_custkey IN (t.k * 3, t.k * 3 + 1, t.k * 3 + 2) "
    "  AND c.c_custkey <> 0"
    ") "
    "SELECT depth, CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM(k) AS BIGINT) AS sum_k "
    "FROM tree GROUP BY depth ORDER BY depth"
)


@register("Q-CTE-03", sql=_CTE3_SQL)
def q_cte_03(spark, sf):
    """NATIVE ``WITH RECURSIVE`` (landed in Spark 4): the ternary-tree
    hierarchy walk (children of k are 3k, 3k+1, 3k+2 within the
    customer key space) executed by Catalyst's own recursion operator
    — the SAME SQL text runs on both engines, the strongest possible
    oracle form. Complements Q-CTE-02, which keeps the pre-4.x
    iterative-DataFrame translation of the same pattern for engines
    (and Spark versions) without native recursion.

    Scale shape: Catalyst executes recursive CTEs as an iterated
    union — per level, one join of the previous level against the
    base table, exactly the loop Q-CTE-02 hand-writes. Depth is
    log₃(N) here (~9 levels at sf0.01); for unbounded-depth graphs
    prefer the frontier discipline of Q-GRAPH-03 (and add an explicit
    depth bound — recursion without one is a correctness review item,
    not a style choice)."""
    load(spark, sf, "customer").createOrReplaceTempView("customer")
    # bounded grain (depth ≤ log₃(keyspace), ~dozens at any SF): the
    # Spark side runs the body without the trailing ORDER BY and sorts
    # narrow (plans/scale.bounded_sort, r15 rescreen); oracle SQL
    # unchanged
    body = _CTE3_SQL.rsplit(" ORDER BY depth", 1)[0]
    return bounded_sort(spark.sql(body), "depth")


_SUBQ8_SQL = """
SELECT n_name, c_name, bal_c
FROM nation n, LATERAL (
  SELECT c_name, CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
  FROM customer c WHERE c.c_nationkey = n.n_nationkey
  ORDER BY bal_c DESC, c_custkey LIMIT 3) t
ORDER BY n_name, bal_c DESC, c_name
"""


@register("Q-SUBQ-08", sql=_SUBQ8_SQL)
def q_subq_08(spark, sf):
    """Correlated LATERAL subquery with ORDER BY + LIMIT — "for each
    nation, its 3 richest customers" written the way SQL users write
    it (a per-row dependent subquery in FROM), not the way engines
    execute it. The SAME SQL text runs on both engines (Q-CTE-03's
    strongest-parity discipline). Catalyst DECORRELATES the lateral
    into a ranked join — the .explain shows a window/rank over the
    customer side and a join, not a per-nation re-execution — which is
    exactly the rewrite you'd hand-write with row_number (Q-WIN-03
    family); this entry pins that the declarative form gets the same
    scalable plan. Tie-break on c_custkey keeps the top-3 total-
    ordered.

    Scale shape: decorrelation means ONE shuffle of customers by
    nationkey + a per-key rank truncation (top-k pushdown), never
    |nations| separate scans. Fixed-point cents carrier for the
    ordering key."""
    load(spark, sf, "nation").createOrReplaceTempView("nation")
    load(spark, sf, "customer").createOrReplaceTempView("customer")
    return spark.sql(_SUBQ8_SQL)


_DATE9_SQL = """
WITH bounds AS (
  SELECT CAST(MIN(o_orderdate) AS DATE) AS lo,
         CAST(MAX(o_orderdate) AS DATE) + 45 AS hi
  FROM orders),
spine AS (
  SELECT CAST(d AS DATE) AS day FROM bounds,
         UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS t(d)),
cal AS (
  SELECT day,
         CASE WHEN isodow(day) <= 5
               AND NOT (month(day) = 1  AND day(day) = 1)
               AND NOT (month(day) = 7  AND day(day) = 4)
               AND NOT (month(day) = 12 AND day(day) = 25)
              THEN 1 ELSE 0 END AS is_bd
  FROM spine),
idx AS (
  SELECT day, is_bd,
         SUM(is_bd) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
           AS bd_cum
  FROM cal),
o AS (
  SELECT CAST(o_orderdate AS DATE) AS od FROM orders),
deadline AS (
  SELECT o.od, b2.day AS dl
  FROM o
  JOIN idx b1 ON b1.day = o.od
  JOIN idx b2 ON b2.bd_cum = b1.bd_cum + 5 AND b2.is_bd = 1)
SELECT CAST(date_trunc('month', od) AS DATE) AS m,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(datediff('day', od, dl)) AS BIGINT) AS cal_days_sum,
       CAST(MAX(datediff('day', od, dl)) AS BIGINT) AS max_span
FROM deadline GROUP BY m ORDER BY m
"""


def _default_holidays(day):
    """Fixed-date holiday rule (Jan 1, Jul 4, Dec 25), every year."""
    return (
        ((F.month(day) == 1) & (F.dayofmonth(day) == 1))
        | ((F.month(day) == 7) & (F.dayofmonth(day) == 4))
        | ((F.month(day) == 12) & (F.dayofmonth(day) == 25))
    )


def business_day_spine(spark_or_df_bounds, holidays=_default_holidays):
    """Build the business-day index spine from a 1-row (lo, hi) DATE
    bounds frame: one generated row per calendar day with ``is_bd``
    (weekday and not a holiday) and ``bd_cum``, the running count of
    business days ≤ day. ``bd_cum`` turns "+n business days" into index
    arithmetic (see add_business_days); ``holidays`` is a Column
    predicate factory so real holiday calendars can be plugged in.

    The spine is O(days) GENERATED rows (sequence + explode — no
    shuffle, no driver loop) and broadcasts into any fact join."""
    b = spark_or_df_bounds
    spine = b.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    is_bd = ((F.weekday("day") <= 4) & ~holidays("day")).cast("int")
    cal = spine.select("day", is_bd.alias("is_bd"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return cal.select("day", "is_bd", F.sum("is_bd").over(w).alias("bd_cum"))


def add_business_days(df, date_col, n, spine):
    """Attach ``bd_date``: the day ``n`` business days after
    ``date_col`` (T+n settlement convention: non-business start dates
    snap to the previous index, so +n lands n business days after the
    preceding business day). Two broadcast joins against the spine —
    the fact side never shuffles."""
    b1 = F.broadcast(
        spine.select(F.col("day").alias(date_col), F.col("bd_cum").alias("_c1"))
    )
    b2 = F.broadcast(
        spine.filter(F.col("is_bd") == 1).select(
            F.col("day").alias("bd_date"), F.col("bd_cum").alias("_c2")
        )
    )
    return (
        df.join(b1, date_col)
        .join(b2, F.col("_c2") == F.col("_c1") + n)
        .drop("_c1", "_c2")
    )


@register("Q-DATE-09", sql=_DATE9_SQL)
def q_date_09(spark, sf):
    """Business-day arithmetic via a calendar-spine join: every order
    gets a deadline 5 BUSINESS days out — weekends and a fixed holiday
    rule (Jan 1, Jul 4, Dec 25) excluded — the SLA/settlement-date
    computation (T+5) that no date_add can express once holidays
    exist. The spine carries a running business-day index (bd_cum);
    "+5 business days" is then index arithmetic: join the order's date
    to its index, join index+5 back to the first business day holding
    it. Weekend/holiday order dates naturally snap forward (their
    bd_cum equals the previous business day's, so +5 lands 5 business
    days after that — the standard T+n convention). Monthly rollup of
    calendar-day spans proves the whole calendar: spans stretch over
    every weekend/holiday crossing.

    Scale shape: the spine is O(days) GENERATED rows (sequence +
    explode, no shuffle to build), broadcast into both index joins —
    facts never shuffle for the calendar; the only fact shuffle is the
    monthly rollup. A 100 TB fact table pays two broadcast-hash
    lookups per row, the same as any dimension attach."""
    orders = load(spark, sf, "orders").select(
        F.to_date("o_orderdate").alias("od")
    )
    b = orders.agg(
        F.min("od").alias("lo"), F.date_add(F.max("od"), 45).alias("hi")
    )
    idx = business_day_spine(b)
    dl = add_business_days(orders, "od", 5, idx).select(
        "od", F.col("bd_date").alias("dl")
    )
    return (
        dl.groupBy(F.date_trunc("month", "od").cast("date").alias("m"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.datediff("dl", "od")).cast("bigint").alias("cal_days_sum"),
            F.max(F.datediff("dl", "od")).cast("bigint").alias("max_span"),
        )
        # calendar grain (months): narrow presentation sort, no range
        # Exchange (plans/scale.bounded_sort, r15 rescreen)
        .transform(bounded_sort, "m")
    )


@register(
    "Q-SQL-02",
    sql="SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n, "
    "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) "
    "  AS rev_c "
    "FROM orders "
    "WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' "
    "  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00' "
    "GROUP BY o_orderpriority ORDER BY o_orderpriority",
)
def q_sql_02(spark, sf):
    """PARAMETERIZED SQL — the injection-safe templating surface
    (Spark 3.4+ named parameter markers): the query text carries
    ``:lo`` / ``:hi`` markers and the values travel OUT-OF-BAND via
    ``spark.sql(..., args=...)``, so a user-supplied date can never
    splice syntax into the statement — the difference between an API
    and an f-string. The DataFrame rides in the same way (``{orders}``
    template binding), so no temp-view registration leaks session
    state. Parameters bind as typed literals BEFORE Catalyst sees the
    plan: pushdown/pruning behave exactly as with inline constants
    (the oracle is the equivalent inlined query).

    Scale shape: identical to the inlined form — parameter binding is
    a parse-time substitution, zero runtime cost."""
    orders = load(spark, sf, "orders")
    return spark.sql(
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)"
        "  AS rev_c "
        "FROM {orders} "
        "WHERE o_orderdate >= :lo AND o_orderdate < :hi "
        "GROUP BY o_orderpriority",
        args={"lo": "1995-01-01 00:00:00", "hi": "1996-01-01 00:00:00"},
        orders=orders,
        # enum grain (order priorities): narrow presentation sort, no
        # range Exchange (plans/scale.bounded_sort, r15 rescreen);
        # oracle SQL unchanged
    ).transform(bounded_sort, "o_orderpriority")
