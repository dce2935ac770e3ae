"""Property-based check of the as-of join operator: on random small
frames, asof_join_backward must agree with pandas.merge_asof (backward,
inclusive) — an independent reference implementation."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_xgboost_spark.operators.asof import asof_join_backward

_ts = st.integers(min_value=0, max_value=50)
_key = st.integers(min_value=0, max_value=3)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=15),
    right=st.lists(st.tuples(_key, _ts), min_size=1, max_size=15),
)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    lpdf = pd.DataFrame(left, columns=["k", "lts"]).reset_index(names="lid")
    rpdf = pd.DataFrame(right, columns=["k", "rts"])

    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(rpdf)
    got = (
        asof_join_backward(ldf, rdf, on="k", left_ts="lts", right_ts="rts",
                           carry={"matched_ts": "rts"})
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )

    want = (
        pd.merge_asof(
            lpdf.sort_values("lts", kind="stable"),
            rpdf.sort_values("rts", kind="stable"),
            left_on="lts",
            right_on="rts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        .sort_values("lid")
        .reset_index(drop=True)
    )
    got_m = got["matched_ts"].astype("float64")
    want_m = want["rts"].astype("float64")
    assert got_m.equals(want_m), (
        f"\nleft:\n{lpdf}\nright:\n{rpdf}\ngot:\n{got}\nwant:\n{want}"
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(st.tuples(_key, _ts), min_size=1, max_size=15),
    right=st.dictionaries(st.tuples(_key, _ts), st.integers(-1000, 1000),
                          min_size=1, max_size=15),
)
def test_asof_carries_nonmonotone_value(spark, left, right):
    """The carried column is the matched row's VALUE, not a running max:
    with unique (k, rts) right rows (no tie-break ambiguity) the carry
    must equal pandas.merge_asof's value column exactly."""
    lpdf = pd.DataFrame(left, columns=["k", "lts"]).reset_index(names="lid")
    rpdf = pd.DataFrame(
        [(k, ts, v) for (k, ts), v in right.items()], columns=["k", "rts", "val"]
    )

    got = (
        asof_join_backward(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rpdf),
            on="k",
            left_ts="lts",
            right_ts="rts",
            carry={"matched_ts": "rts", "matched_val": "val"},
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )

    want = (
        pd.merge_asof(
            lpdf.sort_values("lts", kind="stable"),
            rpdf.sort_values("rts", kind="stable"),
            left_on="lts",
            right_on="rts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        .sort_values("lid")
        .reset_index(drop=True)
    )
    for got_col, want_col in [("matched_ts", "rts"), ("matched_val", "val")]:
        g = got[got_col].astype("float64")
        w = want[want_col].astype("float64")
        assert g.equals(w), (
            f"{got_col}:\nleft:\n{lpdf}\nright:\n{rpdf}\ngot:\n{got}\nwant:\n{want}"
        )
