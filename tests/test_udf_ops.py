"""Execution-shape tests for the UDF-surface operators.

U-GAPPLY-04's canonical query cogroups on a COARSE segment key so the
per-group pandas boundary amortizes (VERDICT r6 wrong #2: the same
alignment keyed per-user paid the Arrow/pandas boundary once per user —
~10^5 tiny groups, 15.4 s at sf0.1, vs 0.5 s for the join/window form of
the same semantics). The per-user keying is kept HERE as the documented
anti-pattern: semantically identical (asserted below), physically wrong
at scale because per-group invocation overhead dominates when groups
are tiny. Production rule: cogroup when per-key work is substantial;
micro-group alignment belongs in join/window form (Q-ATTR-01's shape)
or under a coarse key as the shipped operator does.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dask_xgboost_spark.operators.udf import (  # noqa: E402
    _GAPPLY4_SCHEMA,
    _gapply4_kernel,
)
from dask_xgboost_spark.registry import load_all  # noqa: E402
from dask_xgboost_spark.sources import load  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


def _per_user_variant(spark, sf):
    """The anti-pattern keying: same kernel, cogrouped per user_id —
    one pandas invocation per user instead of per segment."""
    ev = load(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .distinct()
    )
    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(_gapply4_kernel, _GAPPLY4_SCHEMA)
        .orderBy("user_id")
    )


def test_gapply4_segment_and_per_user_keyings_agree(spark):
    """The coarse-segment canonical query and the per-user anti-pattern
    state the SAME semantics — only the physical grouping differs."""
    shipped = load_all()["U-GAPPLY-04"].fn(spark, SF_SMALL).toPandas()
    per_user = _per_user_variant(spark, SF_SMALL).toPandas()
    assert shipped.values.tolist() == per_user.values.tolist()
    assert len(shipped) > 0


def test_gapply4_count_matches_full_read(spark):
    """Regression pin for a Spark 4.1 behavior the r7 shuffle audit
    caught: a plan that references NO cogroup-output column (a bare
    df.count()) prunes the cogroup CHILDREN to the grouping key, so
    the kernel receives column-less frames — here a KeyError, and for
    a column-tolerant kernel a silently wrong cardinality. The shipped
    operator gives the right cogroup side INDEPENDENT LINEAGE via a
    second physical parquet scan (udf.py:645), so the pruner cannot
    collapse both children through one shared cached scan; this
    asserts count() and the full read agree."""
    df = load_all()["U-GAPPLY-04"].fn(spark, SF_SMALL)
    assert df.count() == len(df.toPandas()) > 0


def test_gapply4_kernel_handles_empty_sides():
    """Degenerate segments: users with clicks but no purchases (and the
    reverse) must still emit rows with zeroed counters, int64 all the
    way (no float round-trip of µs gap sums)."""
    import pandas as pd

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:05", "2024-01-01 00:00:09"]
    )
    clicks = pd.DataFrame({"user_id": [1, 1, 2], "ts": ts})
    no_purch = pd.DataFrame(
        {"user_id": pd.Series(dtype="int64"), "ts": pd.Series(dtype="datetime64[ns]")}
    )
    out = _gapply4_kernel(None, clicks, no_purch)
    assert out["n_purch"].tolist() == [0, 0]
    assert out["sum_gap_us"].dtype == "int64"

    purch = pd.DataFrame({"user_id": [1, 3], "ts": ts[[2, 0]]})
    out2 = _gapply4_kernel(None, clicks, purch)
    row_u1 = out2[out2.user_id == 1].iloc[0]
    # user 1: purchase at +9s, latest prior click at +5s → 4s gap
    assert int(row_u1.n_matched) == 1 and int(row_u1.sum_gap_us) == 4_000_000
    row_u3 = out2[out2.user_id == 3].iloc[0]
    # user 3 purchased but never clicked → unmatched, zero clicks
    assert (
        int(row_u3.n_clicks),
        int(row_u3.n_purch),
        int(row_u3.n_matched),
    ) == (0, 1, 0)
