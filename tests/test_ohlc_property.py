"""Property-based check of the OHLC struct-aggregate trick (Q-TS-04 /
S-WIN-04): min/max over a (ts, id, value) struct must pick the same
open/close as an independent pandas sort-then-first/last reference, on
random tick sets including same-bucket bursts and duplicate timestamps
(ties broken by id in both implementations)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_BUCKET = 100  # integer "seconds" per bucket


def _pandas_ohlc(rows):
    pdf = pd.DataFrame(rows, columns=["ts", "tid", "v"])
    pdf["bucket"] = pdf["ts"] // _BUCKET
    pdf = pdf.sort_values(["ts", "tid"])
    g = pdf.groupby("bucket")["v"]
    out = pd.DataFrame(
        {"open": g.first(), "high": g.max(), "low": g.min(), "close": g.last()}
    ).reset_index()
    return sorted(map(tuple, out.itertuples(index=False)))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ticks=st.lists(
        st.tuples(st.integers(0, 500), st.integers(-1000, 1000)),
        min_size=1,
        max_size=40,
    )
)
def test_struct_ohlc_matches_pandas(spark, ticks):
    rows = [(ts, i, v) for i, (ts, v) in enumerate(ticks)]  # tid unique
    df = spark.createDataFrame(rows, "ts bigint, tid bigint, v bigint")
    tick = F.struct("ts", "tid", "v")
    got = (
        df.groupBy((F.col("ts") / _BUCKET).cast("bigint").alias("bucket"))
        .agg(
            F.min(tick)["v"].alias("open"),
            F.max("v").alias("high"),
            F.min("v").alias("low"),
            F.max(tick)["v"].alias("close"),
        )
        .collect()
    )
    got_rows = sorted((r.bucket, r.open, r.high, r.low, r.close) for r in got)
    assert got_rows == _pandas_ohlc(rows)
