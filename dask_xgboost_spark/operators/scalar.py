"""Scalar function families (SURVEY.md §2C: STR/DATE/MATH/COND/CAST/ARR/MAP/JSON).

All expressions are built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; no Python in the row path. Cross-engine notes:

- LENGTH/YEAR/etc return INT in Spark, BIGINT in DuckDB → the oracle SQL
  casts to the Spark type.
- ROUND on doubles differs between engines (Spark round-trips through the
  shortest decimal string, DuckDB rounds the binary value) → rounding is
  always done on exact DECIMAL carriers.
- FLOOR/CEIL on doubles return BIGINT in Spark → oracle casts.
- float→decimal casts are forbidden (float shortest-repr granularity is
  coarser than the decimal grid → double-rounding divergence); always
  widen float→double first (exact in both engines).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_xgboost_spark.functions import EVENTS_US, cents, dec, sql_cents
from dask_xgboost_spark.plans.scale import bounded_sort
from dask_xgboost_spark.registry import register
from dask_xgboost_spark.scratch import scratch_dir
from dask_xgboost_spark.sources import load

# --------------------------------------------------------------------------
# STR
# --------------------------------------------------------------------------


@register(
    "Q-STR-01",
    sql="SELECT p_partkey, UPPER(p_name) AS u, LOWER(p_brand) AS lo, "
    "CAST(LENGTH(p_name) AS INT) AS len, TRIM(p_name) AS t "
    "FROM part ORDER BY p_partkey",
)
def q_str_01(spark, sf):
    """upper/lower/length/trim."""
    return (
        load(spark, sf, "part")
        .select(
            "p_partkey",
            F.upper("p_name").alias("u"),
            F.lower("p_brand").alias("lo"),
            F.length("p_name").alias("len"),
            F.trim("p_name").alias("t"),
        )
        .orderBy("p_partkey")
    )


@register(
    "Q-STR-02",
    sql="SELECT p_partkey, SUBSTR(p_name, 1, 5) AS s, "
    "CONCAT_WS('-', p_brand, p_type) AS cw, "
    "LPAD(CAST(p_partkey AS VARCHAR), 8, '0') AS pad "
    "FROM part ORDER BY p_partkey",
)
def q_str_02(spark, sf):
    """substring/concat_ws/lpad."""
    return (
        load(spark, sf, "part")
        .select(
            "p_partkey",
            F.substring("p_name", 1, 5).alias("s"),
            F.concat_ws("-", "p_brand", "p_type").alias("cw"),
            F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("pad"),
        )
        .orderBy("p_partkey")
    )


@register(
    "Q-STR-03",
    sql="SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tok, "
    "string_split(text, ' ')[1] AS first_tok, "
    "list_contains(string_split(text, ' '), 'data') AS has_data "
    "FROM documents ORDER BY doc_id",
)
def q_str_03(spark, sf):
    """split + array size/element/contains over documents.text."""
    toks = F.split(F.col("text"), " ")
    return (
        load(spark, sf, "documents")
        .select(
            "doc_id",
            F.size(toks).alias("n_tok"),
            F.element_at(toks, 1).alias("first_tok"),
            F.array_contains(toks, "data").alias("has_data"),
        )
        .orderBy("doc_id")
    )


@register(
    "Q-STR-04",
    sql="SELECT o_orderkey, regexp_extract(o_orderpriority, '([0-9]+)', 1) AS prio_num, "
    "regexp_replace(o_orderpriority, '[0-9]+-', '') AS prio_name "
    "FROM orders ORDER BY o_orderkey",
)
def q_str_04(spark, sf):
    """regexp_extract/replace (patterns in the Java∩RE2 common subset)."""
    return (
        load(spark, sf, "orders")
        .select(
            "o_orderkey",
            F.regexp_extract("o_orderpriority", "([0-9]+)", 1).alias("prio_num"),
            F.regexp_replace("o_orderpriority", "[0-9]+-", "").alias("prio_name"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# DATE
# --------------------------------------------------------------------------


@register(
    "Q-DATE-01",
    sql="SELECT CAST(YEAR(o_orderdate) AS INT) AS y, CAST(MONTH(o_orderdate) AS INT) AS m, "
    "COUNT(*) AS n FROM orders GROUP BY y, m ORDER BY y, m",
)
def q_date_01(spark, sf):
    """year/month extraction + rollup."""
    return (
        load(spark, sf, "orders")
        .groupBy(F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m"))
        .agg(F.count(F.lit(1)).alias("n"))
        # bounded grain (calendar year × month of the data span):
        # plans/scale.bounded_sort
        .transform(bounded_sort, "y", "m")
    )


@register(
    "Q-DATE-02",
    sql="SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n, "
    "CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 1e2 AS sv "
    f"FROM {EVENTS_US} e GROUP BY h ORDER BY h",
)
def q_date_02(spark, sf):
    """Hourly events rollup (bench headliner; batch twin of S-WIN-01).
    Fixed-point value sum (functions/ fixed-point notes)."""
    return (
        load(spark, sf, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.floor(F.col("value") * 100 + F.lit(0.5))) / 1e2).alias("sv"),
        )
        # bounded grain (hours in the data's time span, not its volume):
        # narrow single-partition presentation sort instead of a range
        # Exchange + sampling pass (plans/scale.bounded_sort)
        .transform(bounded_sort, "h")
    )


@register(
    "Q-DATE-03",
    sql="SELECT l_orderkey, l_linenumber, "
    "CAST(date_diff('day', o_orderdate, l_shipdate) AS INT) AS ship_days, "
    "o_orderdate + INTERVAL 30 DAY AS due_ts "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "ORDER BY l_orderkey, l_linenumber",
)
def q_date_03(spark, sf):
    """Date arithmetic: datediff + interval add (timestamps)."""
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.datediff("l_shipdate", "o_orderdate").alias("ship_days"),
            F.expr("o_orderdate + INTERVAL 30 DAY").alias("due_ts"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "Q-DATE-04",
    sql="SELECT event_id, CAST(EXTRACT(hour FROM ts) AS INT) AS h, "
    "CAST(EXTRACT(minute FROM ts) AS INT) AS mi, "
    "CAST(EXTRACT(dow FROM ts) AS INT) + 1 AS dow, "
    "CAST(EXTRACT(quarter FROM ts) AS INT) AS q, "
    "CAST(EXTRACT(doy FROM ts) AS INT) AS doy "
    f"FROM {EVENTS_US} e ORDER BY event_id",
)
def q_date_04(spark, sf):
    """EXTRACT field family: hour/minute/day-of-week/quarter/day-of-year.
    (Spark dayofweek is 1=Sunday; DuckDB dow is 0=Sunday → +1.)"""
    return (
        load(spark, sf, "events")
        .select(
            "event_id",
            F.hour("ts").alias("h"),
            F.minute("ts").alias("mi"),
            F.dayofweek("ts").alias("dow"),
            F.quarter("ts").alias("q"),
            F.dayofyear("ts").alias("doy"),
        )
        .orderBy("event_id")
    )


@register(
    "Q-DATE-05",
    # FLOOR before the BIGINT cast (DuckDB CAST rounds, Spark's
    # unix_timestamp truncates) and strip the tz from to_timestamp
    # (DuckDB returns TIMESTAMPTZ, Spark is ntz)
    sql="SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M') AS fmt, "
    "strftime(ts, '%Y-%m') AS ym, "
    "CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_s, "
    "CAST(to_timestamp(CAST(FLOOR(epoch(ts)) AS BIGINT)) AS TIMESTAMP) AS ts_roundtrip "
    f"FROM {EVENTS_US} e ORDER BY event_id",
)
def q_date_05(spark, sf):
    """Timestamp formatting + epoch round-trip: date_format (locale-free
    numeric patterns only), unix_timestamp, and timestamp_seconds —
    everyday partition-naming/bucketing ops."""
    return (
        load(spark, sf, "events")
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm").alias("fmt"),
            F.date_format("ts", "yyyy-MM").alias("ym"),
            F.unix_timestamp("ts").alias("epoch_s"),
            F.timestamp_seconds(F.unix_timestamp("ts")).alias("ts_roundtrip"),
        )
        .orderBy("event_id")
    )


@register(
    "Q-STR-05",
    sql="SELECT p_partkey, translate(p_brand, '#', '-') AS tr, "
    "reverse(p_type) AS rev, repeat(p_brand, 2) AS rep, "
    "CAST(strpos(p_name, 'a') AS INT) AS pos_a "
    "FROM part ORDER BY p_partkey",
)
def q_str_05(spark, sf):
    """translate / reverse / repeat / position (locale-free string ops)."""
    return (
        load(spark, sf, "part")
        .select(
            "p_partkey",
            F.translate("p_brand", "#", "-").alias("tr"),
            F.reverse("p_type").alias("rev"),
            F.repeat("p_brand", 2).alias("rep"),
            F.instr("p_name", "a").alias("pos_a"),
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# MATH
# --------------------------------------------------------------------------


@register(
    "Q-MATH-01",
    sql="SELECT event_id, ABS(value - 20.0) AS abs_v, "
    "CAST(ROUND(CAST(value AS DECIMAL(18,4)), 1) AS DOUBLE) AS round_v, "
    "CAST(FLOOR(value) AS BIGINT) AS floor_v, CAST(CEIL(value) AS BIGINT) AS ceil_v, "
    "CAST(FLOOR(value * 100) AS BIGINT) % 7 AS mod_v, "
    "POWER(2.0, CAST(event_id % 10 AS DOUBLE)) AS pow_v, "
    "SQRT(value) AS sqrt_v, "
    "CAST(FLOOR(LN(value + 1.0) * 1e6) AS BIGINT) AS ln_v6 "
    "FROM events ORDER BY event_id",
)
def q_math_01(spark, sf):
    """abs/round/floor/ceil/mod/power/sqrt/ln. round on a decimal carrier
    (double ROUND semantics differ across engines) emitted as double
    (small-unscaled decimal→double is correctly rounded in both); power
    and sqrt are bitwise-identical across engines (verified on fixture
    data); ln differs by 1 ulp in ~4% of rows → anchored to an int64 of
    1e-6 units, never emitted as a raw double or DECIMAL."""
    v = F.col("value")
    return (
        load(spark, sf, "events")
        .select(
            "event_id",
            F.abs(v - 20.0).alias("abs_v"),
            F.round(dec("value"), 1).cast("double").alias("round_v"),
            F.floor(v).alias("floor_v"),
            F.ceil(v).alias("ceil_v"),
            (F.floor(v * 100) % 7).alias("mod_v"),
            F.pow(F.lit(2.0), (F.col("event_id") % 10).cast("double")).alias("pow_v"),
            F.sqrt(v).alias("sqrt_v"),
            F.floor(F.log(v + 1.0) * 1e6).alias("ln_v6"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# COND
# --------------------------------------------------------------------------


@register(
    "Q-COND-01",
    sql="SELECT o_orderkey, "
    "CASE WHEN o_totalprice < 50000 THEN 'low' WHEN o_totalprice < 150000 THEN 'mid' "
    "ELSE 'high' END AS band, "
    "NULLIF(o_orderstatus, 'O') AS st, "
    "COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS st2 "
    "FROM orders ORDER BY o_orderkey",
)
def q_cond_01(spark, sf):
    """CASE WHEN / NULLIF / COALESCE."""
    p = F.col("o_totalprice")
    st = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        load(spark, sf, "orders")
        .select(
            "o_orderkey",
            F.when(p < 50000, "low").when(p < 150000, "mid").otherwise("high").alias("band"),
            st.alias("st"),
            F.coalesce(st, F.lit("open")).alias("st2"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# CAST
# --------------------------------------------------------------------------


@register(
    "Q-CAST-01",
    sql="SELECT l_orderkey, l_linenumber, "
    "CAST(l_quantity AS INT) AS q_int, "
    "CAST(l_orderkey AS VARCHAR) AS k_str, "
    "CAST(CAST(l_orderkey AS VARCHAR) AS DOUBLE) AS k_dbl, "
    "CAST(CAST(l_discount AS DECIMAL(5,2)) AS VARCHAR) AS disc_dec, "
    "CAST(l_shipdate AS DATE) AS ship_date, "
    "CAST(l_shipdate AS VARCHAR) AS ship_str "
    "FROM lineitem ORDER BY l_orderkey, l_linenumber",
)
def q_cast_01(spark, sf):
    """Cast matrix: double↔int, int↔string, string→double, double→decimal
    (lossless: 2-decimal data), timestamp→date/string (zero-fraction
    timestamps render identically in both engines)."""
    return (
        load(spark, sf, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("int").alias("q_int"),
            F.col("l_orderkey").cast("string").alias("k_str"),
            F.col("l_orderkey").cast("string").cast("double").alias("k_dbl"),
            # the decimal cast is the op under test; rendered at full scale
            # as a string so no DECIMAL-typed cell reaches the hash compare
            F.col("l_discount").cast("decimal(5,2)").cast("string").alias("disc_dec"),
            F.col("l_shipdate").cast("date").alias("ship_date"),
            F.col("l_shipdate").cast("string").alias("ship_str"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# ARR (over embeddings: array<float> columns)
# --------------------------------------------------------------------------


@register(
    "Q-ARR-01",
    sql="SELECT vec_id, CAST(len(embedding) AS INT) AS dim, "
    "CAST(embedding[1] AS DOUBLE) AS first_e, "
    "CAST(embedding[len(embedding)] AS DOUBLE) AS last_e, "
    "array_to_string(list_transform(embedding[1:4], "
    "x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 1e7) AS BIGINT) AS VARCHAR)), ',') AS head4 "
    "FROM embeddings ORDER BY vec_id",
)
def q_arr_01(spark, sf):
    """Array size / element_at / slice over the embedding column. Float
    elements are widened to double (exact in both engines); the sliced
    array is canonicalized to a comma-joined string of 1e-7-anchored
    int64s so no float/array cell reaches the hash compare."""
    e = F.col("embedding")
    return (
        load(spark, sf, "embeddings")
        .select(
            "vec_id",
            F.size(e).alias("dim"),
            F.element_at(e, 1).cast("double").alias("first_e"),
            F.element_at(e, F.size(e)).cast("double").alias("last_e"),
            F.array_join(
                F.transform(
                    F.slice(e, 1, 4),
                    lambda x: F.floor(x.cast("double") * 1e7).cast("string"),
                ),
                ",",
            ).alias("head4"),
        )
        .orderBy("vec_id")
    )


@register(
    "Q-ARR-02",
    sql="SELECT vec_id, CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1e8) AS BIGINT)) AS BIGINT) AS s8 "
    "FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) t "
    "GROUP BY vec_id ORDER BY vec_id",
)
def q_arr_02(spark, sf):
    """explode/unnest + re-aggregate. Float sums are made order-independent
    by fixed-point anchoring: FLOOR(x*1e8) of identical doubles is an
    identical integer in any engine (decimal casts of arbitrary doubles
    are NOT cross-engine safe — DuckDB's cast is not correctly rounded at
    high scale)."""
    return (
        load(spark, sf, "embeddings")
        .select("vec_id", F.explode("embedding").alias("v"))
        .groupBy("vec_id")
        .agg(F.sum(F.floor(F.col("v").cast("double") * 1e8)).alias("s8"))
        .orderBy("vec_id")
    )


@register(
    "Q-ARR-03",
    sql="SELECT vec_id, SQRT(list_sum(list_transform(embedding, "
    "x -> FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12))) / 1e12) AS l2 "
    "FROM embeddings ORDER BY vec_id",
)
def q_arr_03(spark, sf):
    """L2 norm via higher-order functions (no explode, no shuffle).
    Fixed-point trick: each squared term is floored at 1e-12 so the sum is
    a sum of integer-valued doubles — exact in any order — then one float
    division + sqrt on identical doubles."""
    expr = (
        "SQRT(aggregate(transform(embedding, "
        "x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1e12) AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, v) -> acc + v) / 1e12)"
    )
    return (
        load(spark, sf, "embeddings")
        .select("vec_id", F.expr(expr).alias("l2"))
        .orderBy("vec_id")
    )


@register(
    "Q-ARR-04",
    sql="SELECT vec_id, CAST(list_position(embedding, list_max(embedding)) - 1 AS INT) "
    "AS argmax FROM embeddings ORDER BY vec_id",
)
def q_arr_04(spark, sf):
    """Argmax along the array axis (reference B8: da.argmax(probs, axis=1),
    core.py:621) — first max position, 0-based."""
    return (
        load(spark, sf, "embeddings")
        .select(
            "vec_id",
            (F.array_position(F.col("embedding"), F.array_max("embedding")) - 1)
            .cast("int")
            .alias("argmax"),
        )
        .orderBy("vec_id")
    )


_ARR5_A7 = "list_transform({l}, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1e7) AS BIGINT))"
_ARR5_JOIN = "array_to_string(list_transform({l}, v -> CAST(v AS VARCHAR)), ',')"


@register(
    "Q-ARR-05",
    sql="SELECT vec_id, "
    + _ARR5_JOIN.format(l="list_sort(a7)")
    + " AS sorted_a, "
    + _ARR5_JOIN.format(l="list_sort(list_distinct(list_concat(a7, b7)))")
    + " AS union_ab, "
    + _ARR5_JOIN.format(l="list_sort(list_filter(list_distinct(a7), x -> list_contains(b7, x)))")
    + " AS inter_ab, "
    "CAST(len(a7) AS INT) AS zip_len "
    "FROM (SELECT vec_id, "
    + _ARR5_A7.format(l="embedding[1:4]")
    + " AS a7, "
    + _ARR5_A7.format(l="embedding[3:6]")
    + " AS b7 FROM embeddings) t "
    "ORDER BY vec_id",
)
def q_arr_05(spark, sf):
    """array_sort / array_union / array_intersect (+ arrays_zip length).
    Elements are 1e-7-anchored to int64 first (float→double widening is
    exact, FLOOR of identical doubles is an identical integer in both
    engines), so the set ops run on exact integers and the sorted outputs
    are emitted as comma-joined strings — no float/array cells in the
    hash compare."""
    a7 = F.transform(F.slice("embedding", 1, 4), lambda x: F.floor(x.cast("double") * 1e7))
    b7 = F.transform(F.slice("embedding", 3, 4), lambda x: F.floor(x.cast("double") * 1e7))

    def joined(arr):
        return F.array_join(F.transform(arr, lambda v: v.cast("string")), ",")

    return (
        load(spark, sf, "embeddings")
        .select(
            "vec_id",
            joined(F.array_sort(a7)).alias("sorted_a"),
            joined(F.array_sort(F.array_union(a7, b7))).alias("union_ab"),
            joined(F.array_sort(F.array_intersect(a7, b7))).alias("inter_ab"),
            F.size(F.arrays_zip(a7, b7)).alias("zip_len"),
        )
        .orderBy("vec_id")
    )


@register(
    "Q-PIVOT-02",
    sql="SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS v FROM orders "
    "UNION ALL SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders "
    "ORDER BY o_orderkey, metric",
)
def q_pivot_02(spark, sf):
    """Unpivot (wide → long) via stack — the inverse of Q-PIVOT-01."""
    return (
        load(spark, sf, "orders")
        .select(
            "o_orderkey",
            F.expr(
                "stack(2, 'totalprice', o_totalprice, "
                "'custkey', CAST(o_custkey AS DOUBLE)) AS (metric, v)"
            ),
        )
        .orderBy("o_orderkey", "metric")
    )


@register(
    "Q-MAP-02",
    sql="SELECT p_partkey, p_size + 1 AS brand_bumped, CAST(1 AS INT) AS n_kept "
    "FROM part ORDER BY p_partkey",
)
def q_map_02(spark, sf):
    """Map transforms: transform_values + map_filter + element access.
    As with Q-MAP-01 the oracle states the expected *result* (the map
    round-trips); the Spark side exercises the map-function family."""
    m = F.create_map(
        F.lit("brand"), F.col("p_size"), F.lit("neg"), F.lit(-1)
    )
    bumped = F.transform_values(m, lambda k, v: v + 1)
    kept = F.map_filter(bumped, lambda k, v: v > 0)
    return (
        load(spark, sf, "part")
        .select(
            "p_partkey",
            F.element_at(bumped, F.lit("brand")).alias("brand_bumped"),
            F.size(kept).alias("n_kept"),
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# MAP
# --------------------------------------------------------------------------


@register(
    "Q-MAP-01",
    sql="SELECT p_partkey, 'brand,type' AS ks, p_brand AS brand_from_map "
    "FROM part ORDER BY p_partkey",
)
def q_map_01(spark, sf):
    """Build a map column, list its keys, read an element back. The oracle
    states the expected *result* (map build+extract is identity); the
    Spark side actually exercises create_map/map_keys/element_at. The key
    list is emitted comma-joined (scalar string cells only)."""
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return (
        load(spark, sf, "part")
        .select(
            "p_partkey",
            F.array_join(F.map_keys(m), ",").alias("ks"),
            F.element_at(m, F.lit("brand")).alias("brand_from_map"),
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# JSON
# --------------------------------------------------------------------------


@register(
    "Q-JSON-01",
    sql="SELECT event_type, CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) "
    "AS sum_k, COUNT(*) AS n FROM events GROUP BY event_type ORDER BY event_type",
)
def q_json_01(spark, sf):
    """JSON path extraction on events.props + aggregate."""
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        load(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.sum(k).alias("sum_k"), F.count(F.lit(1)).alias("n"))
        # enum grain (event types): narrow presentation sort, no range
        # Exchange (plans/scale.bounded_sort, r15 rescreen)
        .transform(bounded_sort, "event_type")
    )


@register(
    "Q-ARR-06",
    sql="SELECT doc_id, pos, tok FROM ("
    "  SELECT doc_id, lf AS toks FROM ("
    "    SELECT doc_id, list_filter(string_split(text, ' '), w -> w = 'data') AS lf "
    "    FROM documents) a"
    ") b LEFT JOIN LATERAL ("
    "  SELECT unnest(toks) AS tok, generate_subscripts(toks, 1) - 1 AS pos"
    ") u ON TRUE "
    "ORDER BY doc_id, pos NULLS FIRST",
)
def q_arr_06(spark, sf):
    """posexplode_outer: rows whose array is EMPTY survive with NULL
    pos/tok (plain explode drops them — the silent row-loss trap in
    token pipelines). The kept-token filter makes empty arrays common,
    so the null branch is load-bearing."""
    toks = F.filter(F.split("text", " "), lambda w: w == "data")
    return (
        load(spark, sf, "documents")
        .select("doc_id", toks.alias("toks"))
        .select("doc_id", F.posexplode_outer("toks").alias("pos", "tok"))
        .orderBy("doc_id", F.col("pos").asc_nulls_first())
    )


@register(
    "Q-DATE-06",
    sql="WITH bounds AS (SELECT date_trunc('hour', MIN(ts)) AS lo, "
    f"date_trunc('hour', MAX(ts)) AS hi FROM {EVENTS_US} e), "
    "spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds), "
    "actual AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n "
    f"FROM {EVENTS_US} e GROUP BY h) "
    "SELECT spine.h AS h, COALESCE(n, 0) AS n FROM spine "
    "LEFT JOIN actual ON spine.h = actual.h ORDER BY h",
)
def q_date_06(spark, sf):
    """Dense time-spine densification: generate the full hourly calendar
    between min and max event time (sequence + explode), left-join the
    hourly counts, zero-fill gaps — the standard fix for charts/models
    that must see empty buckets. The spine is generated, never scanned."""
    ev = load(spark, sf, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    actual = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        spine.join(actual, "h", "left")
        .select("h", F.coalesce("n", F.lit(0)).alias("n"))
        .orderBy("h")
    )


@register(
    "Q-JSON-02",
    sql="SELECT event_id, "
    "CAST(json_extract(props, '$.k') AS INT) AS k_typed, "
    "json_extract(props, '$.missing') IS NULL AS no_such_field, "
    "json_valid(props) AS is_valid "
    "FROM events ORDER BY event_id",
)
def q_json_02(spark, sf):
    """Typed JSON parsing (from_json → struct field access) vs JSON-01's
    string path extraction: schema-projected parse, absent-field NULL
    semantics, and validity probing — the shape for JSON event payloads
    where downstream wants typed columns, not strings."""
    parsed = F.from_json("props", "k int, missing int")
    return (
        load(spark, sf, "events")
        .select(
            "event_id",
            parsed.getField("k").alias("k_typed"),
            parsed.getField("missing").isNull().alias("no_such_field"),
            # from_json yields NULL struct for invalid JSON → validity probe
            F.from_json("props", "k int").isNotNull().alias("is_valid"),
        )
        .orderBy("event_id")
    )


@register(
    "Q-JSON-03",
    sql="SELECT event_id, "
    "CAST(json_extract(props, '$.k') AS INT) AS k_var, "
    "json_extract_string(props, '$.k') AS k_str, "
    "CAST(json_extract(props, '$.missing') AS INT) AS absent "
    "FROM events ORDER BY event_id",
)
def q_json_03(spark, sf):
    """VARIANT semi-structured type (Spark 4): ``parse_json`` decodes the
    payload ONCE into the binary variant encoding; each ``variant_get``
    then walks the pre-parsed tree — versus Q-JSON-01's
    ``get_json_object``, which re-tokenizes the text per extraction.
    With many extractions per document (the telemetry/event-log shape),
    parse-once is the scale path; absent paths surface as NULL via
    ``try_variant_get`` instead of erroring."""
    v = F.parse_json("props")
    return (
        load(spark, sf, "events")
        .select(
            "event_id",
            F.variant_get(v, "$.k", "int").alias("k_var"),
            F.variant_get(v, "$.k", "string").alias("k_str"),
            F.try_variant_get(v, "$.missing", "int").alias("absent"),
        )
        .orderBy("event_id")
    )


@register(
    "Q-STR-08",
    sql="WITH v AS (SELECT p_partkey, CASE WHEN p_partkey % 2 = 0 "
    "THEN upper(p_brand) ELSE lower(p_brand) END AS b FROM part) "
    "SELECT lower(b) AS brand, COUNT(*) AS n, "
    "CAST(SUM(p_partkey) AS BIGINT) AS key_sum "
    "FROM v GROUP BY lower(b) ORDER BY brand",
)
def q_str_08(spark, sf):
    """String collations (Spark 4): grouping under ``UTF8_LCASE`` merges
    case variants at the COMPARISON level — no lower() rewrite of the
    data, and every comparison operator (=, GROUP BY, joins, DISTINCT)
    inherits the semantics from the column's collation instead of each
    call site remembering to normalize. Mixed case is synthesized
    deterministically (even keys upper, odd lower) so the merge is
    load-bearing; the emitted group key is canonicalized with lower()
    because the collated representative is whichever variant the
    aggregate saw first. Oracle states the classic lower()-rewrite
    equivalent.

    Scale note: collation participates in hashing, so collated group-by
    and join keys shuffle-partition correctly (case variants land in
    one partition) — the failure mode the lower()-rewrite pattern
    guards by hand."""
    v = load(spark, sf, "part").select(
        "p_partkey",
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_brand"))
        .otherwise(F.lower("p_brand"))
        .alias("b"),
    )
    return (
        v.groupBy(F.collate("b", "UTF8_LCASE").alias("bk"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("p_partkey").cast("long").alias("key_sum"),
        )
        .select(F.lower("bk").alias("brand"), "n", "key_sum")
        # enum grain (brand vocabulary): narrow presentation sort, no range
        # Exchange (plans/scale.bounded_sort, r15 rescreen)
        .transform(bounded_sort, "brand")
    )


@register(
    "Q-STR-06",
    sql="SELECT p_partkey, "
    "CAST(levenshtein(p_brand, 'Brand#33') AS INT) AS d_brand, "
    "CAST(levenshtein(substring(p_name, 1, 8), 'burnishe') AS INT) AS d_name "
    "FROM part ORDER BY p_partkey",
)
def q_str_06(spark, sf):
    """Edit-distance fuzzy matching (levenshtein) against probe strings —
    the record-linkage / typo-tolerant lookup primitive. Integer output,
    so it hash-checks exactly cross-engine. Map-only JVM expression; for
    fuzzy *joins* at scale, block first (length band or first-char
    bucket) so the distance runs on candidate pairs, never the cross
    product."""
    return (
        load(spark, sf, "part")
        .select(
            "p_partkey",
            F.levenshtein("p_brand", F.lit("Brand#33")).alias("d_brand"),
            F.levenshtein(F.substring("p_name", 1, 8), F.lit("burnishe")).alias(
                "d_name"
            ),
        )
        .orderBy("p_partkey")
    )


@register(
    "Q-STR-07",
    # the pattern stays inside the regex subset Java (Spark) and RE2
    # (DuckDB) evaluate identically: literal class + bounded repetition
    sql="SELECT doc_id, "
    # DuckDB renders the no-match empty list as NULL; Spark as ''
    "COALESCE(array_to_string(regexp_extract_all(text, '[a-z]{6,}'), ' '), '') AS long_words, "
    "CAST(len(regexp_extract_all(text, '[a-z]{6,}')) AS BIGINT) AS n_long "
    "FROM documents ORDER BY doc_id",
)
def q_str_07(spark, sf):
    """regexp_extract_all: every ≥6-letter word per document, in document
    order, plus the match count. The array is carried as a joined string
    (the repo-wide rule: no array/float hash carriers), and the regex is
    restricted to the Java∩RE2 common subset so both engines tokenize
    identically.

    Scale shape: map-only (narrow) — regex evaluation is JVM-side
    codegen'd, no UDF, no shuffle beyond the final presentation sort."""
    docs = load(spark, sf, "documents")
    matches = F.regexp_extract_all("text", F.lit("[a-z]{6,}"), 0)
    return docs.select(
        "doc_id",
        F.array_join(matches, " ").alias("long_words"),
        F.size(matches).cast("long").alias("n_long"),
    ).orderBy("doc_id")


@register(
    "Q-DATE-07",
    # last_day → DATE in both engines; month-add clamps to month end in
    # both (Jan 31 + 1 month = Feb 28/29); datediff is day-granular
    sql="SELECT o_orderkey, "
    "CAST(last_day(o_orderdate) AS DATE) AS month_end, "
    "CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS due_3m, "
    "CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INT) "
    "AS days_to_close, "
    "CAST(date_diff('day', CAST(date_trunc('quarter', o_orderdate) AS DATE), "
    "CAST(o_orderdate AS DATE)) AS INT) AS day_in_quarter "
    "FROM orders ORDER BY o_orderkey",
)
def q_date_07(spark, sf):
    """Calendar-edge date arithmetic: last_day, add_months (end-of-month
    CLAMPING — Jan 31 + 1 month is Feb 28, identical convention in Spark
    and DuckDB/Postgres), day diffs against a fixed close date, and
    position within the quarter. These are the SCD/retention building
    blocks where naive `+ 30 days` arithmetic silently drifts.

    Scale shape: map-only, whole-stage codegen'd; no shuffle beyond the
    presentation sort."""
    o = load(spark, sf, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.last_day(d).alias("month_end"),
        F.add_months(d, 3).alias("due_3m"),
        F.datediff(F.lit("1998-12-31").cast("date"), d).cast("int").alias(
            "days_to_close"
        ),
        F.datediff(d, F.to_date(F.date_trunc("quarter", "o_orderdate"))).cast(
            "int"
        ).alias("day_in_quarter"),
    ).orderBy("o_orderkey")


@register(
    "Q-ARR-07",
    # list_distinct order is engine-internal → always sort after distinct;
    # carriers are joined strings (repo rule: no raw array hash columns)
    sql="WITH w AS (SELECT doc_id, string_split(text, ' ')[1:12] AS a "
    "FROM documents) "
    "SELECT doc_id, "
    "array_to_string(list_sort(a), ' ') AS sorted_toks, "
    "array_to_string(list_sort(list_distinct(a)), ' ') AS uniq_toks, "
    "CAST(len(list_distinct(a)) AS INT) AS n_uniq "
    "FROM w ORDER BY doc_id",
)
def q_arr_07(spark, sf):
    """sort_array + array_distinct over the first-12-token prefix.
    array_distinct's output ORDER is engine-internal (Spark keeps first
    occurrence, DuckDB's list_distinct reorders) — portable code must
    re-sort after distinct, which is the discipline this entry pins.

    Scale shape: map-only array HOFs, whole-stage codegen, no shuffle."""
    a = F.slice(F.split("text", " "), 1, 12)
    return (
        load(spark, sf, "documents")
        .select(
            "doc_id",
            F.array_join(F.sort_array(a), " ").alias("sorted_toks"),
            F.array_join(F.sort_array(F.array_distinct(a)), " ").alias("uniq_toks"),
            F.size(F.array_distinct(a)).alias("n_uniq"),
        )
        .orderBy("doc_id")
    )


@register(
    "Q-MATH-02",
    # the divisor is 0 whenever event_id % 5 == 0 → try_divide yields
    # NULL there; the oracle CASE-guards (DuckDB integer/decimal division
    # by zero raises, like Spark ANSI without try_)
    sql="SELECT event_id, "
    "CASE WHEN event_id % 5 = 0 THEN NULL "
    "ELSE CAST(FLOOR(value * 100 + 0.5) AS BIGINT) / (event_id % 5) END AS ratio, "
    "CASE WHEN event_id % 5 = 0 THEN NULL "
    "ELSE CAST(FLOOR(value * 100 + 0.5) AS BIGINT) // (event_id % 5) END AS ratio_i, "
    "try_cast(CASE WHEN event_id % 7 = 0 THEN 'nan' "
    "ELSE CAST(event_id AS VARCHAR) END AS BIGINT) AS parsed "
    f"FROM {EVENTS_US} e ORDER BY event_id",
)
def q_math_02(spark, sf):
    """ANSI-safe arithmetic: Spark 4 runs with spark.sql.ansi.enabled=true
    (the default since 4.0), where x/0 and bad casts THROW mid-job — the
    correct production posture is try_divide / try_cast, which yield NULL
    exactly where the oracle's CASE guards do. A 100 TB job that dies at
    hour 5 on one zero denominator is an ANSI-discipline bug, not a data
    bug; the NULLs stay countable (quarantine pattern, see Q-SCAN-10).

    Scale shape: map-only, codegen'd; integer floor-division is anchored
    (DuckDB // floors, Spark DIV truncates — non-negative here so equal;
    documented divergence for negatives)."""
    cents_v = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    d = F.col("event_id") % 5
    return (
        load(spark, sf, "events")
        .select(
            "event_id",
            F.try_divide(cents_v, d).alias("ratio"),
            F.try_divide(cents_v, d).cast("long").alias("ratio_i"),
            F.when(F.col("event_id") % 7 == 0, F.lit("nan"))
            .otherwise(F.col("event_id").cast("string"))
            .try_cast("bigint")
            .alias("parsed"),
        )
        .orderBy("event_id")
    )


@register(
    "Q-JSON-04",
    # the oracle never touches JSON: shredding must recover the exact
    # relational input, so ground truth IS the join itself
    sql="SELECT l_orderkey, l_linenumber, "
    f" {sql_cents('l_quantity')} AS qty_c "
    "FROM lineitem WHERE l_orderkey % 91 = 0 "
    "ORDER BY l_orderkey, l_linenumber",
)
def q_json_04(spark, sf):
    """Document assembly + shredding round-trip — the doc-store ETL in
    both directions: (1) DENORMALIZE an order and its line items into
    one nested JSON document (``collect_list`` of item structs inside
    ``to_json`` — the export shape for document APIs / event buses);
    (2) SHRED it back (``from_json`` with an explicit schema →
    ``inline`` explode of the items array) into relational child rows.
    The oracle is the plain relational join — matching output proves the
    round-trip is lossless, including item order (``sort_array`` on the
    (linenumber,...) struct makes assembly deterministic under any
    partitioning).

    Scale shape: assembly is one groupBy on the order key with map-side
    combine; shredding is map-only (parse + Generate). At 100 TB the
    anti-pattern is re-parsing documents per field — parse ONCE per doc
    (or land VARIANT, Q-JSON-03) and explode from the parsed struct."""
    li = load(spark, sf, "lineitem").filter(F.col("l_orderkey") % 91 == 0)
    item = F.struct(
        F.col("l_linenumber").alias("ln"),
        cents("l_quantity").cast("bigint").alias("qty_c"),
    )
    docs = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list(item)).alias("items"))
        .select(
            F.to_json(
                F.struct(F.col("l_orderkey").alias("oid"), F.col("items"))
            ).alias("doc")
        )
    )
    schema = "oid BIGINT, items ARRAY<STRUCT<ln: BIGINT, qty_c: BIGINT>>"
    parsed = docs.select(F.from_json("doc", schema).alias("d"))
    return (
        parsed.select(
            F.col("d.oid").alias("l_orderkey"),
            F.explode("d.items").alias("item"),
        )
        .select(
            "l_orderkey",
            F.col("item.ln").alias("l_linenumber"),
            F.col("item.qty_c").alias("qty_c"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "Q-DATE-08",
    # day-of-week derived from EPOCH DAYS, not the engines' dayofweek()
    # (DuckDB numbers Sunday=0, Spark Sunday=1 — a classic cross-engine
    # trap): 1970-01-01 was a Thursday, so (epoch_day + 4) % 7 gives
    # 0=Sunday..6=Saturday identically everywhere integers work
    sql="WITH d AS (SELECT o_orderkey, o_orderdate, "
    " (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS ed "
    " FROM orders), "
    "w AS (SELECT o_orderkey, o_orderdate, ed, (ed + 4) % 7 AS dow FROM d) "
    "SELECT o_orderkey, CAST(dow AS BIGINT) AS dow, "
    " dow IN (0, 6) AS is_weekend, "
    " CAST(o_orderdate AS DATE) + CAST(CASE WHEN dow = 6 THEN 2 "
    "   WHEN dow = 0 THEN 1 ELSE 0 END AS INTEGER) AS next_bday "
    "FROM w ORDER BY o_orderkey",
)
def q_date_08(spark, sf):
    """Business-day calendar arithmetic: weekend flag and
    next-business-day shift per order — the SLA/settlement-date shape
    every warehouse needs. Day-of-week is derived from EPOCH DAYS
    ((days-since-1970 + 4) mod 7, anchored on 1970-01-01 = Thursday)
    instead of the engines' dayofweek() functions, whose numbering
    conventions disagree (DuckDB Sunday=0, Spark Sunday=1) — integer
    arithmetic on epoch days is the only cross-engine-stable calendar
    primitive, and the oracle states the same formula.

    Scale shape: map-only expressions on a date column, no shuffle; a
    holiday calendar joins in as a broadcast dimension when the rule
    set grows beyond weekends."""
    d = load(spark, sf, "orders").select(
        "o_orderkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
        .alias("ed"),
    )
    dow = F.pmod(F.col("ed") + 4, F.lit(7))
    shift = (
        F.when(dow == 6, 2).when(dow == 0, 1).otherwise(0)
    )
    return (
        d.withColumn("dow", dow.cast("bigint"))
        .select(
            "o_orderkey",
            "dow",
            F.col("dow").isin(0, 6).alias("is_weekend"),
            F.date_add(F.col("o_orderdate").cast("date"), shift).alias("next_bday"),
        )
        .orderBy("o_orderkey")
    )


_ARR8_SQL = """
WITH base AS (
    SELECT doc_id,
           list_transform(string_split(text, ' '), x -> CAST(length(x) AS BIGINT))
               AS lens
    FROM documents
),
paired AS (
    SELECT doc_id, lens, list_reverse(lens) AS rev, len(lens) AS m FROM base
)
SELECT doc_id,
       CAST(list_sum(list_transform(range(1, m + 1), i -> lens[i] * rev[i]))
            AS BIGINT) AS dot_rev,
       CAST(len(list_filter(lens, x -> x > 4)) AS BIGINT) AS n_long,
       CAST(CASE WHEN list_max(lens) >= 8 THEN 1 ELSE 0 END AS BIGINT) AS any8,
       CAST(CASE WHEN len(list_filter(lens, x -> x <= 0)) = 0
                 THEN 1 ELSE 0 END AS BIGINT) AS all_pos
FROM paired ORDER BY doc_id
"""


@register("Q-ARR-08", sql=_ARR8_SQL)
def q_arr_08(spark, sf):
    """Higher-order-function suite over arrays — ``zip_with`` +
    ``aggregate`` (the fold), ``filter``, ``exists``, ``forall`` — the
    expressions that keep per-row vector math INSIDE whole-stage
    codegen instead of exploding to rows or dropping to Python (the
    same zip_with/aggregate pair the similarity family uses for dot
    products, exercised here on exact integer token-length vectors so
    every engine pair hash-matches). dot_rev is a fold over
    zip_with(lens, reverse(lens), *): a self-convolution that needs
    BOTH lanes of the zip.

    Scale shape: map-only — no explode, no shuffle, no UDF; array
    length bounds per-row cost. The explode-then-rejoin alternative
    (Q-ARR-02's shape) shuffles |tokens| rows to compute the same
    numbers."""
    lens = F.expr(
        "transform(split(text, ' '), x -> CAST(length(x) AS BIGINT))"
    )
    base = load(spark, sf, "documents").select("doc_id", lens.alias("lens"))
    return (
        base.select(
            "doc_id",
            F.expr(
                "aggregate(zip_with(lens, reverse(lens), (a, b) -> a * b), "
                "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ).alias("dot_rev"),
            F.expr("CAST(size(filter(lens, x -> x > 4)) AS BIGINT)").alias("n_long"),
            F.expr(
                "CAST(CASE WHEN exists(lens, x -> x >= 8) THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("any8"),
            F.expr(
                "CAST(CASE WHEN forall(lens, x -> x > 0) THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("all_pos"),
        )
        .orderBy("doc_id")
    )


_JSON5_SQL = f"""
SELECT CAST(SUM(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_corrupt,
       CAST(SUM(CASE WHEN event_id % 7 != 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_good,
       CAST(SUM(CASE WHEN event_id % 7 != 0 THEN event_id END) AS BIGINT)
         AS good_id_sum,
       CAST(COUNT(DISTINCT CASE WHEN event_id % 7 != 0 THEN event_type END)
            AS BIGINT) AS n_types
FROM {EVENTS_US}
"""


@register("Q-JSON-05", sql=_JSON5_SQL)
def q_json_05(spark, sf):
    """Malformed-record RESCUE on JSON ingestion: the landing file has
    a broken line every 7th record (unterminated string — synthesized
    deterministically from event_id so the oracle knows exactly which
    rows die); the PERMISSIVE reader parses what it can and routes
    each unparseable line's RAW TEXT into ``_corrupt_record`` instead
    of failing the job — the schema-on-read contract that keeps one
    bad producer from taking down a 100 TB nightly load. The rollup
    hash-checks the corrupt count, the surviving count, the surviving
    id checksum (no good row lost, no corrupt row half-parsed), and
    the surviving type cardinality.

    Scale shape: PERMISSIVE parsing is per-line, map-only, no shuffle;
    the corrupt branch costs nothing until a row is actually bad. Pair
    with S-SINK-07's DLQ to persist the rescued raw lines for replay."""
    out = scratch_dir("json5_rescue")
    ev = load(spark, sf, "events").select("event_id", "event_type")
    good_json = F.concat(
        F.lit('{"event_id": '),
        F.col("event_id").cast("string"),
        F.lit(', "event_type": "'),
        F.col("event_type"),
        F.lit('"}'),
    )
    bad_json = F.concat(
        F.lit('{"event_id": '),
        F.col("event_id").cast("string"),
        F.lit(', "event_type": "'),
        F.col("event_type"),
    )
    ev.select(
        F.when(F.col("event_id") % 7 == 0, bad_json)
        .otherwise(good_json)
        .alias("value")
    ).write.mode("overwrite").text(out)
    back = spark.read.schema(
        "event_id bigint, event_type string, _corrupt_record string"
    ).option("mode", "PERMISSIVE").json(out)
    return back.agg(
        F.sum(F.when(F.col("_corrupt_record").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt_record").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_good"),
        F.sum(
            F.when(F.col("_corrupt_record").isNull(), F.col("event_id"))
        )
        .cast("bigint")
        .alias("good_id_sum"),
        F.count_distinct(
            F.when(F.col("_corrupt_record").isNull(), F.col("event_type"))
        )
        .cast("bigint")
        .alias("n_types"),
    ).localCheckpoint()


_JSON6_SQL = """
WITH j AS (
  SELECT o_orderkey AS k,
         '{"k":' || CAST(o_orderkey AS VARCHAR) ||
         ',"p":"' || o_orderpriority || '"' ||
         ',"items":[' || CAST(o_custkey AS VARCHAR) || ',' ||
         CAST(o_orderkey % 7 AS VARCHAR) || ']}' AS js
  FROM orders WHERE o_orderkey % 50 = 0)
SELECT k,
       CAST(json_extract(js, '$.k') AS BIGINT) AS jk,
       json_extract_string(js, '$.p') AS jp,
       CAST(json_extract(js, '$.items[1]') AS BIGINT) AS item1,
       CAST(json_extract(js, '$.missing') AS BIGINT) AS miss
FROM j ORDER BY k
"""


@register("Q-JSON-06", sql=_JSON6_SQL)
def q_json_06(spark, sf):
    """VARIANT semi-structured ingestion (Spark 4): ``parse_json``
    turns JSON text into the binary VARIANT type once, and
    ``variant_get`` extracts typed values by path — the open-schema
    layer below Q-JSON-01's fixed-schema from_json (which must declare
    every field up front) and above raw string get_json_object (which
    re-parses per extraction). The JSON is synthesized in-query by
    identical string concatenation in both engines, so the oracle pins
    byte-identical input; extractions cover a top-level int, a string,
    an array index, and a MISSING path (NULL in both engines, never an
    error).

    Scale shape: parse once → binary VARIANT; every variant_get is a
    cheap binary traversal (no re-tokenization), and the parse
    vectorizes inside whole-stage codegen. For hot fixed fields,
    promote to typed columns at ingest (Q-JSON-01); VARIANT is for the
    long tail that would otherwise force schema churn."""
    j = (
        load(spark, sf, "orders")
        .filter(F.col("o_orderkey") % 50 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            F.concat(
                F.lit('{"k":'),
                F.col("o_orderkey").cast("string"),
                F.lit(',"p":"'),
                F.col("o_orderpriority"),
                F.lit('","items":['),
                F.col("o_custkey").cast("string"),
                F.lit(","),
                (F.col("o_orderkey") % 7).cast("string"),
                F.lit("]}"),
            ).alias("js"),
        )
    )
    v = j.select("k", F.expr("parse_json(js)").alias("v"))
    return v.select(
        "k",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("jk"),
        F.expr("variant_get(v, '$.p', 'string')").alias("jp"),
        F.expr("variant_get(v, '$.items[1]', 'bigint')").alias("item1"),
        F.expr("variant_get(v, '$.missing', 'bigint')").alias("miss"),
    ).orderBy("k")
