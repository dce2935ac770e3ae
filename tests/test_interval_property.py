"""Property-based checks of the round-6 calendar/interval helpers
against independent pure-Python references:

- merge_intervals vs a sort-and-sweep merge (the textbook algorithm)
- add_business_days vs a day-by-day calendar walk with the same
  weekend+holiday rule

Both helpers back hash-mode registry entries (Q-TS-07, Q-DATE-09); the
oracle pins one fixture, these pin the CONTRACT on adversarial inputs
(duplicate intervals, containment, touching endpoints, weekend/holiday
start dates)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dask_xgboost_spark.operators.advanced import (
    add_business_days,
    business_day_spine,
)
from dask_xgboost_spark.operators.timeseries import merge_intervals

_iv = st.tuples(
    st.sampled_from(["a", "b"]),
    st.integers(min_value=0, max_value=40),
    st.integers(min_value=1, max_value=15),
)


def _ref_merge(ivs):
    """Sort-and-sweep interval merge, [s, e) touching-merges."""
    out = {}
    for k in {k for k, _, _ in ivs}:
        spans = sorted((s, s + ln) for kk, s, ln in ivs if kk == k)
        merged = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        out[k] = [tuple(m) for m in merged]
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ivs=st.lists(_iv, min_size=1, max_size=15))
def test_merge_intervals_matches_sweep(spark, ivs):
    rows = [(k, s, s + ln, i) for i, (k, s, ln) in enumerate(ivs)]
    df = spark.createDataFrame(rows, "k string, s int, e int, tid int")
    got = {}
    for r in merge_intervals(df, ["k"], "s", "e", "tid").collect():
        got.setdefault(r.k, []).append((r.ms, r.me))
    for k in got:
        got[k].sort()
    assert got == _ref_merge(ivs)


_HOLIDAYS = {(1, 1), (7, 4), (12, 25)}


def _is_bd(d: dt.date) -> bool:
    return d.weekday() <= 4 and (d.month, d.day) not in _HOLIDAYS


def _ref_add_bd(d: dt.date, n: int) -> dt.date:
    # T+n convention: count n business days strictly after the start's
    # index position (non-business starts share the previous index)
    cur, left = d, n
    while left > 0:
        cur += dt.timedelta(days=1)
        if _is_bd(cur):
            left -= 1
    return cur


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    offs=st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=8),
    n=st.integers(min_value=1, max_value=10),
)
def test_add_business_days_matches_walk(spark, offs, n):
    base = dt.date(2025, 12, 20)  # spans Christmas + New Year + weekends
    dates = sorted({base + dt.timedelta(days=o) for o in offs})
    df = spark.createDataFrame([(d,) for d in dates], "od date")
    bounds = df.agg(
        F.min("od").alias("lo"), F.date_add(F.max("od"), 30 + 2 * n).alias("hi")
    )
    spine = business_day_spine(bounds)
    got = {
        r.od: r.bd_date
        for r in add_business_days(df, "od", n, spine).collect()
    }
    assert got == {d: _ref_add_bd(d, n) for d in dates}


def _ref_mmr(rel: dict, sim: dict, k: int):
    """Pure-Python MMR greedy reference: first pick = max relevance,
    then argmax of 7·rel − 3·max-sim-to-selected, ties to smaller id."""
    remaining = set(rel)
    sel = [min(remaining, key=lambda c: (-rel[c], c))]
    remaining.discard(sel[0])
    while len(sel) < k and remaining:
        best = min(
            remaining,
            key=lambda c: (-(7 * rel[c] - 3 * max(sim[(c, s)] for s in sel)), c),
        )
        sel.append(best)
        remaining.discard(best)
    return sel


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rels=st.lists(
        st.integers(min_value=-10**12, max_value=10**12), min_size=5, max_size=9
    ),
    seed=st.integers(min_value=0, max_value=10**6),
)
def test_mmr_greedy_matches_reference(spark, rels, seed):
    """The applyInPandas MMR kernel (the exact code L-SIM-12 ships)
    must reproduce the reference greedy on arbitrary int64 score
    matrices — including ties and negative similarities, which the
    fixture's real dot products rarely produce."""
    import pandas as pd

    ids = list(range(len(rels)))
    rel = dict(zip(ids, rels))
    # deterministic symmetric "similarities" from the seed
    sim = {}
    for a in ids:
        for b in ids:
            if a != b:
                v = ((a * 31 + b * 17 + seed) % (2 * 10**12)) - 10**12
                sim[(a, b)] = sim.get((b, a), v)
    pairs = pd.DataFrame(
        [
            {"qid": 0, "a": a, "b": b, "rel_a": rel[a], "sim": s}
            for (a, b), s in sim.items()
        ]
    )
    sdf = spark.createDataFrame(
        pairs, "qid long, a long, b long, rel_a long, sim long"
    )
    # run the shipped kernel through the same applyInPandas path the
    # operator uses: reuse its grouping contract on our synthetic pairs
    from dask_xgboost_spark.operators import similarity as _sim

    out = (
        sdf.groupBy("qid")
        .applyInPandas(
            _sim._mmr_greedy_kernel, "qid long, rank int, cid long, rel long"
        )
        .orderBy("rank")
        .collect()
    )
    want = _ref_mmr(rel, sim, 4)
    assert [r.cid for r in out] == want
