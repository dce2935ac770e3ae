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


# --- jaccard dedup property check (same independent-reference pattern) ---

_tok = st.sampled_from(["apple", "banana", "cherry", "date", "elder", "fig", "grape"])
_doc = st.lists(_tok, min_size=1, max_size=10)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_doc, min_size=2, max_size=10))
def test_jaccard_pairs_matches_python_reference(spark, docs):
    """jaccard_pairs must agree with a direct Python set-Jaccard on random
    corpora — exact pair set, intersection sizes, and jaccard values."""
    from dask_xgboost_spark.operators.dedup import jaccard_pairs

    threshold = 0.6
    pdf = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    sdf = spark.createDataFrame(pdf, "doc_id long, text string")

    got = {
        (r["d1"], r["d2"]): (r["inter"], round(r["jaccard"], 9))
        for r in jaccard_pairs(sdf, threshold=threshold).collect()
    }

    sets = {i: set(toks) for i, toks in enumerate(docs)}
    want = {}
    for i in sets:
        for j in sets:
            if i < j:
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                jac = inter / union
                if jac >= threshold:
                    want[(i, j)] = (inter, round(jac, 9))
    assert got == want, f"docs={docs}\ngot={got}\nwant={want}"


# --- connected components property check (vs Python union-find) ---

_node = st.integers(min_value=0, max_value=20)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=st.lists(st.tuples(_node, _node), min_size=1, max_size=25))
def test_connected_components_matches_union_find(spark, edges):
    """HashMin label propagation must agree with a sequential union-find
    on random graphs (self-loops and duplicate edges included)."""
    from dask_xgboost_spark.operators.dedup import connected_components

    sdf = spark.createDataFrame(edges, "a long, b long")
    got = {
        (r["node"], r["component"])
        for r in connected_components(sdf).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for a, b in edges:
        union(a, b)
    # re-canonicalize: component id = min member
    members: dict[int, set[int]] = {}
    for n in parent:
        members.setdefault(find(n), set()).add(n)
    want = {(n, min(ms)) for root, ms in members.items() for n in ms}
    assert got == want, f"edges={edges}\ngot={got}\nwant={want}"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lefts=st.lists(st.integers(min_value=0, max_value=120), min_size=1, max_size=12),
    rights=st.lists(st.integers(min_value=0, max_value=120), min_size=0, max_size=12),
    tol_s=st.integers(min_value=1, max_value=60),
)
def test_asof_nearest_matches_pandas(spark, lefts, rights, tol_s):
    """asof_join_nearest ≡ pandas.merge_asof(direction='nearest',
    tolerance=...) on random per-key series — including the equidistant
    tie (pandas resolves backward; verified, and so do we) and the
    no-match-within-tolerance NULL."""
    import datetime as dt

    import pandas as pd

    from dask_xgboost_spark.operators.asof import asof_join_nearest

    epoch = dt.datetime(2026, 1, 1)
    lpdf = pd.DataFrame(
        {
            "k": ["a"] * len(lefts),
            "lid": range(len(lefts)),
            "lts": [epoch + dt.timedelta(seconds=s) for s in lefts],
        }
    )
    rs = sorted(set(rights))
    rpdf = pd.DataFrame(
        {
            "k": ["a"] * len(rs),
            "rts": [epoch + dt.timedelta(seconds=s) for s in rs],
        }
    )
    ldf = spark.createDataFrame(lpdf, "k string, lid long, lts timestamp")
    rdf = (
        spark.createDataFrame(rpdf, "k string, rts timestamp")
        if len(rpdf)
        else spark.createDataFrame([], "k string, rts timestamp")
    )
    got = {
        r.lid: r.asof_match_ts
        for r in asof_join_nearest(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts",
            tolerance_us=tol_s * 1_000_000,
        ).collect()
    }
    if not len(rpdf):
        assert got == {i: None for i in range(len(lefts))}
        return
    want_df = pd.merge_asof(
        lpdf.sort_values("lts"),
        rpdf.sort_values("rts"),
        by="k",
        left_on="lts",
        right_on="rts",
        direction="nearest",
        tolerance=pd.Timedelta(seconds=tol_s),
    )
    want = {
        int(row.lid): (None if pd.isna(row.rts) else row.rts.to_pydatetime())
        for row in want_df.itertuples()
    }
    assert got == want
