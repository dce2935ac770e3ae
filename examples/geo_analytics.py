#!/usr/bin/env python
"""Geospatial-analytics tour: the GEO family end to end on one synthetic
point cloud — containment zoning, grid-blocked proximity pairs, stencil
heatmap, and per-entity trajectory length. Every step is the registered,
oracle-checked operator; this script narrates how they compose.

Run: python examples/geo_analytics.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from dask_xgboost_spark import get_spark
from dask_xgboost_spark.registry import load_all


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="geo-analytics")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    # 1. zoning: which declared regions hold how many points (broadcast
    # containment join — Q-GEO-02)
    zones = specs["Q-GEO-02"].fn(spark, sf_dir).collect()
    print("zone occupancy:", {r.zone: r.n_points for r in zones})

    # 2. proximity: pairs within the radius, per x-band (grid-cell
    # blocked self-join — Q-GEO-01; work ∝ pair density, never n²)
    pairs = specs["Q-GEO-01"].fn(spark, sf_dir).collect()
    print("radius pairs by band:", {r.band: r.pairs for r in pairs})

    # 3. hotspots: 3×3-smoothed cell density, top 5 (stencil on the cell
    # table — Q-GEO-04)
    hot = (
        specs["Q-GEO-04"].fn(spark, sf_dir)
        .orderBy(F.desc("n_smoothed"))
        .limit(5)
        .collect()
    )
    print("top smoothed cells:", [(r.cx, r.cy, r.n_smoothed) for r in hot])

    # 4. movement: longest per-user trajectories (LAG-window Manhattan
    # sum — Q-GEO-03)
    far = (
        specs["Q-GEO-03"].fn(spark, sf_dir)
        .orderBy(F.desc("total_dist"))
        .limit(3)
        .collect()
    )
    print("most-travelled users:", [(r.user_id, r.total_dist, r.n_steps) for r in far])

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
