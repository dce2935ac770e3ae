"""Property-based check of the grid-blocked radius join: on random small
point sets, ``radius_pairs`` must produce exactly the pairs an O(n²)
brute-force reference finds — including points on cell boundaries, at
exactly the radius, and co-located duplicates. This is the blocking-
correctness claim (no pair missed across cell borders, no pair emitted
twice by the 3×3 replication) checked adversarially rather than only on
the fixture's point cloud."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_xgboost_spark.operators.geo import radius_pairs

_R = 10
_coord = st.integers(min_value=0, max_value=45)  # ~4x4 cells at R=10


def _brute_force(pts, radius):
    # ids are the enumeration index, so ia < ib already holds
    return {
        (ia, ib)
        for i, (ia, xa, ya) in enumerate(pts)
        for ib, xb, yb in pts[i + 1 :]
        if (xa - xb) ** 2 + (ya - yb) ** 2 <= radius * radius
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(coords=st.lists(st.tuples(_coord, _coord), min_size=2, max_size=20))
def test_radius_pairs_matches_brute_force(spark, coords):
    pts = [(i, x, y) for i, (x, y) in enumerate(coords)]
    df = spark.createDataFrame(pts, "id bigint, x bigint, y bigint")
    got = {
        (r.a_id, r.b_id)
        for r in radius_pairs(df, _R).select("a_id", "b_id").collect()
    }
    assert got == _brute_force(pts, _R)
