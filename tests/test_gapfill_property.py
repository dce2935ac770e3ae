"""Property-based check of the gapfill operator: on random sparse keyed
series, gapfill(how='locf') must agree with pandas reindex+ffill and
gapfill(how='interp') with an integer-lerp reference — independent
implementations of the same contract."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_xgboost_spark.operators.timeseries import gapfill

_EPOCH = dt.datetime(2026, 1, 1)

_hour = st.integers(min_value=0, max_value=30)
_val = st.integers(min_value=-1000, max_value=1000)
_key = st.sampled_from(["a", "b"])


def _frame(obs):
    # dedupe (key, hour) — gapfill consumes a rolled-up series
    seen = {}
    for k, h, v in obs:
        seen[(k, h)] = v
    return pd.DataFrame(
        [
            {"k": k, "h": _EPOCH + dt.timedelta(hours=h), "v": v}
            for (k, h), v in sorted(seen.items())
        ]
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(obs=st.lists(st.tuples(_key, _hour, _val), min_size=1, max_size=20))
def test_gapfill_locf_matches_pandas_ffill(spark, obs):
    pdf = _frame(obs)
    sdf = spark.createDataFrame(pdf, "k string, h timestamp, v bigint")
    got = (
        gapfill(sdf, ["k"], "h", "v", how="locf")
        .toPandas()
        .sort_values(["k", "h"])
        .reset_index(drop=True)
    )

    lo, hi = pdf["h"].min(), pdf["h"].max()
    spine = pd.date_range(lo, hi, freq="1h")
    frames = []
    for k in sorted(pdf["k"].unique()):
        series = (
            pdf[pdf["k"] == k]
            .set_index("h")["v"]
            .reindex(spine)  # global spine, per-key reindex
        )
        frames.append(
            pd.DataFrame(
                {
                    "k": k,
                    "h": spine,
                    "v_locf": series.ffill().astype("object"),
                    "observed": series.notna().astype(int),
                }
            )
        )
    want = pd.concat(frames).sort_values(["k", "h"]).reset_index(drop=True)

    assert len(got) == len(want)
    assert (got["k"] == want["k"]).all()
    assert (got["observed"].to_numpy() == want["observed"].to_numpy()).all()
    gv = got["v_locf"].astype("Float64")
    wv = want["v_locf"].astype("Float64")
    assert ((gv == wv) | (gv.isna() & wv.isna())).all()


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(obs=st.lists(st.tuples(_key, _hour, _val), min_size=1, max_size=20))
def test_gapfill_interp_matches_integer_lerp(spark, obs):
    pdf = _frame(obs)
    sdf = spark.createDataFrame(pdf, "k string, h timestamp, v bigint")
    got = gapfill(sdf, ["k"], "h", "v", how="interp").toPandas()

    by_key = {
        k: dict(
            zip(
                (g["h"] - _EPOCH).dt.total_seconds() // 3600,
                g["v"],
            )
        )
        for k, g in pdf.groupby("k")
    }
    for _, row in got.iterrows():
        k = row["k"]
        hn = (row["h"] - _EPOCH).total_seconds() // 3600
        pts = by_key[k]
        if hn in pts:
            assert row["observed"] == 1 and row["v_interp"] == pts[hn]
            continue
        assert row["observed"] == 0
        prev = [h for h in pts if h < hn]
        nxt = [h for h in pts if h > hn]
        if not prev or not nxt:
            assert pd.isna(row["v_interp"])
            continue
        ph, nh = max(prev), min(nxt)
        pv, nv = pts[ph], pts[nh]
        # exact floor-lerp, matching the operator's integer identity
        import math

        want = math.floor((pv * (nh - hn) + nv * (hn - ph)) / (nh - ph))
        assert row["v_interp"] == want, (k, hn, row["v_interp"], want)
