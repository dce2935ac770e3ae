"""Geospatial operators (Q-GEO family) — grid-blocked proximity joins.

Spark has no native spatial join; the scale-correct pattern is the same
blocking discipline used by the dedup family (dedup.py) and the binned
range join (plans/scale.py::binned_range_join): map each point to a grid
cell sized to the query radius, replicate ONE side into its 3x3 cell
neighborhood, equi-join on the cell key, then apply the exact distance
predicate post-join. Work scales with true point-pair density per cell —
never the all-pairs cross product — and the cell key shuffles/AQE-splits
like any other join key, so the plan survives a 1000-executor scale-up.
Production systems (Sedona, BigQuery GIS) use exactly this cell-blocked
shape; here it is expressed in pure DataFrame algebra.

Coordinates are synthesized deterministically from integer fixture
columns and kept in INTEGER grid units end-to-end, so the distance
predicate ((dx^2 + dy^2) <= R^2) is exact int64 arithmetic — identical
in Spark and the DuckDB oracle, with no float-ulp knife edges.

Reference parity note: dask-xgboost has no spatial surface
(/root/reference/dask_xgboost/core.py is ML orchestration only); this
family belongs to the engine's broader analytics contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dask_xgboost_spark.plans.scale import bounded_sort
from dask_xgboost_spark.registry import register
from dask_xgboost_spark.sources import load

# Integer grid-unit geometry: radius and its square (cell size == radius
# so any pair within R spans at most one cell boundary per axis).
_R = 1500
_R2 = _R * _R

# Deterministic synthetic point cloud over the events table: positions
# are integer linear-congruential mixes of (user_id, event_id) modulo a
# 100k x 100k grid. Pure int64 arithmetic — bit-identical in DuckDB.
# The SQL and DataFrame forms below are the SAME formula; change both.
_X_EXPR = "(user_id * 131 + event_id * 17) % 100000"
_Y_EXPR = "(user_id * 313 + event_id * 29) % 100000"


def _pts_sql(every: int | None) -> str:
    where = f" WHERE event_id % {every} = 0" if every else ""
    return (
        f"(SELECT event_id AS id, {_X_EXPR} AS x, {_Y_EXPR} AS y"
        f" FROM events{where})"
    )


def _points(spark: SparkSession, sf: str, every: int | None = 37) -> DataFrame:
    ev = load(spark, sf, "events")
    if every:
        ev = ev.filter(F.col("event_id") % every == 0)
    return ev.select(
        F.col("event_id").alias("id"),
        F.expr(_X_EXPR).alias("x"),
        F.expr(_Y_EXPR).alias("y"),
    )


def radius_pairs(points: DataFrame, radius: int) -> DataFrame:
    """All unordered point pairs within ``radius`` (Euclidean, integer
    units): grid-cell blocked self-join.

    Left side keeps its own cell; right side replicates into the 3x3
    neighborhood, so each qualifying pair is produced exactly once (the
    9 replica cells are distinct, and only one can equal the left cell).
    Shuffle key is the cell id — bounded replication (9x) instead of the
    quadratic per-key explosion a raw theta-join would produce.
    """
    r2 = radius * radius
    a = points.select(
        F.col("id").alias("a_id"), F.col("x").alias("ax"), F.col("y").alias("ay"),
        F.expr(f"x div {radius}").alias("cx"),
        F.expr(f"y div {radius}").alias("cy"),
    )
    neighbor = F.expr("explode(array(-1, 0, 1))")
    b = (
        points.select(
            F.col("id").alias("b_id"), F.col("x").alias("bx"), F.col("y").alias("by"),
            F.expr(f"x div {radius}").alias("bcx"),
            F.expr(f"y div {radius}").alias("bcy"),
        )
        .withColumn("dx", neighbor)
        .withColumn("dy", neighbor)
        .select(
            "b_id", "bx", "by",
            (F.col("bcx") + F.col("dx")).alias("cx"),
            (F.col("bcy") + F.col("dy")).alias("cy"),
        )
    )
    dist2 = (a.ax - F.col("bx")) * (a.ax - F.col("bx")) + (
        a.ay - F.col("by")
    ) * (a.ay - F.col("by"))
    return (
        a.join(b, ["cx", "cy"])
        .filter((F.col("a_id") < F.col("b_id")) & (dist2 <= F.lit(r2)))
        .select("a_id", "b_id", "ax", "ay", "bx", "by")
    )


@register(
    "Q-GEO-01",
    sql=f"WITH p AS (SELECT * FROM {_pts_sql(37)} q) "
    "SELECT a.x // 20000 AS band, COUNT(*) AS pairs "
    "FROM p a JOIN p b ON a.id < b.id "
    f" AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {_R2} "
    "GROUP BY band ORDER BY band",
)
def q_geo_01(spark, sf):
    """Radius self-join (proximity pairs): points within R of each other,
    counted per x-band. Spark side runs the grid-cell blocked join
    (``radius_pairs``); the DuckDB oracle runs the naive all-pairs
    theta-join — different physical strategies, identical output, which
    is precisely the blocking-correctness claim."""
    pairs = radius_pairs(_points(spark, sf), _R)
    return (
        pairs.groupBy(F.expr("ax div 20000").alias("band"))
        .agg(F.count(F.lit(1)).alias("pairs"))
        # bounded grain (fixed-width bands of a bounded coordinate
        # domain): plans/scale.bounded_sort
        .transform(bounded_sort, "band")
    )


_ZONES = [
    ("core", 20000, 40000, 20000, 40000),
    ("north", 0, 100000, 80000, 100000),
    ("east", 80000, 100000, 0, 80000),
    ("downtown", 30000, 35000, 30000, 35000),
    ("strip", 0, 100000, 49000, 51000),
    ("empty_corner", 99990, 99999, 99990, 99999),
]

_ZONES_SQL = ", ".join(f"('{n}', {x0}, {x1}, {y0}, {y1})" for n, x0, x1, y0, y1 in _ZONES)


@register(
    "Q-GEO-02",
    sql=f"WITH p AS (SELECT id, x, y FROM {_pts_sql(None)} q), "
    f"z AS (SELECT * FROM (VALUES {_ZONES_SQL}) v(zone, x0, x1, y0, y1)) "
    "SELECT zone, COUNT(p.id) AS n_points "
    "FROM z LEFT JOIN p ON p.x >= z.x0 AND p.x < z.x1 AND p.y >= z.y0 AND p.y < z.y1 "
    "GROUP BY zone ORDER BY zone",
)
def q_geo_02(spark, sf):
    """Point-in-rectangle containment join: every event-derived point
    against a small zone table (overlapping zones allowed; empty zones
    kept via LEFT join). The zone side is broadcast — a containment join
    against a small geometry set is a broadcast nested-loop by design,
    and the fact side streams through without a shuffle. For large zone
    sets the scale path is the same cell-blocking as ``radius_pairs``
    (index zones by the grid cells they overlap, equi-join on cell)."""
    pts = _points(spark, sf, every=None)
    zones = F.broadcast(
        spark.createDataFrame(_ZONES, "zone string, x0 bigint, x1 bigint, y0 bigint, y1 bigint")
    )
    return (
        zones.join(
            pts,
            (pts.x >= zones.x0) & (pts.x < zones.x1)
            & (pts.y >= zones.y0) & (pts.y < zones.y1),
            "left",
        )
        .groupBy("zone")
        .agg(F.count(F.col("id")).alias("n_points"))
        # bounded grain (fixed zone enum): plans/scale.bounded_sort
        .transform(bounded_sort, "zone")
    )


@register(
    "Q-GEO-03",
    sql="WITH p AS (SELECT user_id, ts, event_id, x, y FROM "
    "(SELECT user_id, ts, event_id, "
    f" {_X_EXPR} AS x, {_Y_EXPR} AS y "
    f" FROM (SELECT user_id, date_trunc('microseconds', ts) AS ts, event_id "
    "        FROM events) e) q), "
    "s AS (SELECT user_id, "
    " ABS(x - LAG(x) OVER w) + ABS(y - LAG(y) OVER w) AS step "
    " FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
    "SELECT user_id, CAST(SUM(step) AS BIGINT) AS total_dist, "
    " CAST(COUNT(step) AS BIGINT) AS n_steps "
    "FROM s GROUP BY user_id ORDER BY user_id",
)
def q_geo_03(spark, sf):
    """Trajectory length: per-entity total movement over time-ordered
    positions (Manhattan metric, exact int64 — no float sqrt) — the
    movement-analytics staple (fleet distance, user mobility). LAG over
    a (user, time) window computes successive steps; (ts, event_id)
    ordering makes same-instant fixes deterministic.

    Scale shape: ONE shuffle on the entity key, then a linear
    sequential pass per key (the same discipline as the as-of join) —
    never a self-join on consecutive rows, which would double-scan and
    explode on hot entities. Aggregation is map-combinable after the
    window."""
    from pyspark.sql import Window

    p = load(spark, sf, "events").select(
        "user_id", "ts", "event_id",
        F.expr(_X_EXPR).alias("x"),
        F.expr(_Y_EXPR).alias("y"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = p.select(
        "user_id",
        (F.abs(F.col("x") - F.lag("x").over(w)) + F.abs(F.col("y") - F.lag("y").over(w))).alias("step"),
    )
    return (
        steps.groupBy("user_id")
        .agg(
            F.sum("step").cast("bigint").alias("total_dist"),
            F.count("step").cast("bigint").alias("n_steps"),
        )
        .orderBy("user_id")
    )


@register(
    "Q-GEO-04",
    # cell size 10000 → 10x10 grid; density = own count + 8 neighbors
    # (boundary cells simply have fewer contributing neighbors)
    sql="WITH p AS (SELECT x // 10000 AS cx, y // 10000 AS cy FROM "
    f"(SELECT {_X_EXPR} AS x, {_Y_EXPR} AS y FROM events) q), "
    "c AS (SELECT cx, cy, COUNT(*) AS n FROM p GROUP BY cx, cy) "
    "SELECT a.cx, a.cy, CAST(a.n AS BIGINT) AS n_own, "
    " CAST(SUM(b.n) AS BIGINT) AS n_smoothed "
    "FROM c a JOIN c b ON b.cx BETWEEN a.cx - 1 AND a.cx + 1 "
    " AND b.cy BETWEEN a.cy - 1 AND a.cy + 1 "
    "GROUP BY a.cx, a.cy, a.n ORDER BY a.cx, a.cy",
)
def q_geo_04(spark, sf):
    """Grid-density heatmap with 3×3 neighborhood smoothing — the
    stencil / box-blur convolution in relational form (hotspot maps,
    kernel-density approximations). Points aggregate to cell counts
    first, then the stencil runs on the CELL table: each cell's
    contribution replicates to its 9 neighbors via a bounded explode and
    re-aggregates — never a point-level neighbor join.

    Scale shape: the point→cell rollup is the only fact-sized shuffle
    (map-side combined); the stencil operates on O(cells) rows —
    resolution-bounded, independent of point count — with a fixed 9×
    replication. The oracle runs the range-predicate neighbor join on
    the cell table; the engine runs the explode+equi-join form (exactly
    the Q-GEO-01 blocking discipline, applied as convolution)."""
    cells = (
        _points(spark, sf, every=None)
        .select(
            F.expr("x div 10000").alias("cx"),
            F.expr("y div 10000").alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    contrib = (
        cells.withColumn("dx", F.expr("explode(array(-1, 0, 1))"))
        .withColumn("dy", F.expr("explode(array(-1, 0, 1))"))
        .select(
            (F.col("cx") + F.col("dx")).alias("tcx"),
            (F.col("cy") + F.col("dy")).alias("tcy"),
            "n",
        )
    )
    smoothed = contrib.groupBy("tcx", "tcy").agg(F.sum("n").alias("n_smoothed"))
    return (
        cells.join(
            smoothed,
            (cells.cx == smoothed.tcx) & (cells.cy == smoothed.tcy),
        )
        .select(
            "cx", "cy",
            F.col("n").cast("bigint").alias("n_own"),
            F.col("n_smoothed").cast("bigint"),
        )
        .orderBy("cx", "cy")
    )


_KNN_K = 3


@register(
    "Q-GEO-05",
    # oracle: naive theta-join kNN-within-radius; the engine's 3x3 cell
    # blocking is EXACT for dist <= R (cell size == R pigeonhole), so
    # the outputs must match row-for-row
    sql=f"WITH p AS (SELECT * FROM {_pts_sql(37)} c), "
    f"q AS (SELECT * FROM {_pts_sql(101)} d), "
    "s AS (SELECT q.id AS qid, p.id AS nid, "
    " (q.x-p.x)*(q.x-p.x) + (q.y-p.y)*(q.y-p.y) AS dist2 "
    " FROM q JOIN p ON q.id <> p.id "
    f" WHERE (q.x-p.x)*(q.x-p.x) + (q.y-p.y)*(q.y-p.y) <= {_R2}), "
    "r AS (SELECT qid, nid, dist2, "
    " ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist2, nid) AS rnk FROM s) "
    f"SELECT qid, nid, CAST(dist2 AS BIGINT) AS dist2, CAST(rnk AS BIGINT) AS rnk "
    f"FROM r WHERE rnk <= {_KNN_K} ORDER BY qid, rnk",
)
def q_geo_05(spark, sf):
    """Grid-blocked k-nearest-neighbor join (kNN within a max radius —
    the bounded form every spatial engine serves): for each query point,
    the k=3 nearest candidate points with dist ≤ R, exact integer
    distances, deterministic (dist², id) tie-break. Queries with no
    candidate in range produce no rows, matching the oracle's inner
    semantics.

    Scale shape: the same 3×3 cell-neighborhood equi-join as Q-GEO-01
    (cell size = R makes the blocking EXACT — no candidate within R can
    sit outside the neighborhood), then a per-query top-k window whose
    partition key is the query id: cardinality = candidate pairs per
    query neighborhood, never the corpus. An unbounded kNN (no radius)
    needs iterative ring expansion for sparse queries — out of scope by
    contract, stated rather than hidden."""
    cand = _points(spark, sf, every=37)
    q = _points(spark, sf, every=101)
    a = q.select(
        F.col("id").alias("qid"), F.col("x").alias("qx"), F.col("y").alias("qy"),
        F.expr(f"x div {_R}").alias("cx"),
        F.expr(f"y div {_R}").alias("cy"),
    )
    neighbor = F.expr("explode(array(-1, 0, 1))")
    b = (
        cand.select(
            F.col("id").alias("nid"), F.col("x").alias("nx"), F.col("y").alias("ny"),
            F.expr(f"x div {_R}").alias("bcx"),
            F.expr(f"y div {_R}").alias("bcy"),
        )
        .withColumn("ddx", neighbor)
        .withColumn("ddy", neighbor)
        .select(
            "nid", "nx", "ny",
            (F.col("bcx") + F.col("ddx")).alias("cx"),
            (F.col("bcy") + F.col("ddy")).alias("cy"),
        )
    )
    dist2 = (F.col("qx") - F.col("nx")) * (F.col("qx") - F.col("nx")) + (
        F.col("qy") - F.col("ny")
    ) * (F.col("qy") - F.col("ny"))
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy("dist2", "nid")
    return (
        a.join(b, ["cx", "cy"])
        .filter(F.col("qid") != F.col("nid"))
        .withColumn("dist2", dist2.cast("bigint"))
        .filter(F.col("dist2") <= F.lit(_R2))
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _KNN_K)
        .select("qid", "nid", "dist2", "rnk")
        .orderBy("qid", "rnk")
    )


_TRAJ_CELL = 10000   # coarse signature grid (10x10 over the 100k plane)
_TRAJ_TOP = 10


@register(
    "Q-GEO-06",
    # query trajectory = user 0; candidates = every other user sharing
    # >= 1 signature cell. Jaccard carried as exact ints (inter, uni)
    # plus the one-division double.
    sql=f"WITH pts AS (SELECT user_id, ({_X_EXPR}) // {_TRAJ_CELL} AS cx, "
    f" ({_Y_EXPR}) // {_TRAJ_CELL} AS cy FROM events), "
    "cells AS (SELECT DISTINCT user_id, cx, cy FROM pts), "
    "q AS (SELECT cx, cy FROM cells WHERE user_id = 0), "
    "qn AS (SELECT COUNT(*) AS nq FROM q), "
    "sizes AS (SELECT user_id, COUNT(*) AS nc FROM cells GROUP BY user_id), "
    "inter AS (SELECT c.user_id, COUNT(*) AS ni FROM cells c JOIN q "
    " ON c.cx = q.cx AND c.cy = q.cy WHERE c.user_id <> 0 GROUP BY c.user_id), "
    "scored AS (SELECT i.user_id, i.ni AS inter_cells, "
    " s.nc + qn.nq - i.ni AS union_cells, "
    " CAST(i.ni AS DOUBLE) / (s.nc + qn.nq - i.ni) AS jac "
    " FROM inter i JOIN sizes s ON s.user_id = i.user_id CROSS JOIN qn), "
    "r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY jac DESC, user_id) AS rnk "
    " FROM scored) "
    "SELECT user_id, CAST(inter_cells AS BIGINT) AS inter_cells, "
    " CAST(union_cells AS BIGINT) AS union_cells, jac, CAST(rnk AS BIGINT) AS rnk "
    f"FROM r WHERE rnk <= {_TRAJ_TOP} ORDER BY rnk",
)
def q_geo_06(spark, sf):
    """Trajectory similarity search via grid-cell signatures (the
    cell-set Jaccard family of REPOSE/DITA-style distributed trajectory
    search): each entity's trajectory collapses to the SET of coarse
    grid cells it visits, similarity = Jaccard of cell sets, and the
    query ranks every entity sharing ≥ 1 cell with the query entity's
    signature. Cell signatures are the standard pre-filter for
    expensive curve distances (Fréchet/DTW re-score the survivors in
    production; here the signature IS the ranking, integer-exact and
    hash-checkable).

    Scale shape: signatures are bounded (≤ grid² cells per entity,
    here ≤ 100) so the cells table is entity-cardinality; the query's
    signature is a broadcast-sized set and candidates come from a
    POSTING-LIST join on shared cells — work tracks entities that
    overlap the query's cells, never all entities, and never all
    pairs. The same shape answers entity-to-entity bulk search by
    replacing the query set with a second posting join (L-DEDUP-03's
    discipline)."""
    from pyspark.sql import Window

    pts = load(spark, sf, "events").select(
        "user_id",
        (F.expr(_X_EXPR) / _TRAJ_CELL).cast("long").alias("cx"),
        (F.expr(_Y_EXPR) / _TRAJ_CELL).cast("long").alias("cy"),
    )
    cells = pts.distinct()
    q = cells.filter(F.col("user_id") == 0).select("cx", "cy")
    qn = q.agg(F.count(F.lit(1)).alias("nq"))
    sizes = cells.groupBy("user_id").agg(F.count(F.lit(1)).alias("nc"))
    inter = (
        cells.filter(F.col("user_id") != 0)
        .join(F.broadcast(q), ["cx", "cy"])
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("inter_cells"))
    )
    scored = (
        inter.join(sizes, "user_id")
        .crossJoin(F.broadcast(qn))
        .select(
            "user_id",
            F.col("inter_cells").cast("bigint").alias("inter_cells"),
            (F.col("nc") + F.col("nq") - F.col("inter_cells"))
            .cast("bigint")
            .alias("union_cells"),
            (
                F.col("inter_cells").cast("double")
                / (F.col("nc") + F.col("nq") - F.col("inter_cells"))
            ).alias("jac"),
        )
    )
    w = Window.orderBy(F.col("jac").desc(), "user_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _TRAJ_TOP)
        .orderBy("rnk")
    )
