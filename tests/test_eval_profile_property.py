"""Property-based checks of the round-7 public APIs against independent
pure-Python references: profile_key_skew (Q-PROF-02) must reproduce a
hand-rolled counter/top-k/bucket computation on random key multisets,
and confusion_matrix (M-EVAL-10) must reproduce per-class counts and
floor-per-mille scores computed with collections.Counter on random
(actual, predicted) label pairs."""

from __future__ import annotations

import hashlib
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_xgboost_spark.ml.queries import confusion_matrix
from dask_xgboost_spark.operators.analytics import profile_key_skew

_key = st.integers(min_value=0, max_value=12)
_cls = st.sampled_from(["a", "b", "c"])


def _ref_skew(keys: list[int], top_k: int, num_buckets: int):
    cnt = Counter(keys)
    total = len(keys)
    buckets = Counter()
    for k, n in cnt.items():
        h = hashlib.md5(str(k).encode()).hexdigest()
        buckets[(ord(h[0]) * 31 + ord(h[1])) % num_buckets] += n
    bucket_max = max(buckets.values())
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    rows, cum = [], 0
    for rk, (k, n) in enumerate(ordered, start=1):
        cum += n
        rows.append(
            (
                rk,
                k,
                n,
                n * 1000 // total,
                cum * 1000 // total,
                bucket_max,
                bucket_max * num_buckets * 1000 // total,
            )
        )
    return rows


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(keys=st.lists(_key, min_size=1, max_size=40))
def test_profile_key_skew_matches_reference(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = [
        tuple(r)
        for r in profile_key_skew(df, "k", top_k=5, num_buckets=8)
        .orderBy("rk")
        .collect()
    ]
    assert got == _ref_skew(keys, top_k=5, num_buckets=8)


def test_profile_key_skew_quotes_nonidentifier_names(spark):
    # every name-parsing site (groupBy/F.col/F.asc/select strings and
    # the md5_poly SQL fragment) must take the backtick-quoted form, so
    # names with spaces AND dots — which string resolution would split
    # as struct/alias separators — keep working (ADVICE r9)
    keys = [1, 1, 2, 3, 3, 3]
    for name in ("my key", "user.id"):
        df = spark.createDataFrame([(k,) for k in keys], [name])
        got = [
            tuple(r)
            for r in profile_key_skew(df, name, top_k=5, num_buckets=8)
            .orderBy("rk")
            .collect()
        ]
        assert got == _ref_skew(keys, top_k=5, num_buckets=8), name


def _ref_confusion(pairs: list[tuple[str, str]]):
    sup = Counter(a for a, _ in pairs)
    pred = Counter(p for _, p in pairs)
    tp = Counter(a for a, p in pairs if a == p)
    rows = []
    for cls in sorted(sup):
        t, s, pn = tp[cls], sup[cls], pred[cls]
        rows.append(
            (
                cls,
                t,
                pn - t,
                s - t,
                s,
                1000 * t // pn if pn else None,
                1000 * t // s,
                2000 * t // (s + pn),  # s >= 1 so never zero
            )
        )
    return rows


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pairs=st.lists(st.tuples(_cls, _cls), min_size=1, max_size=40))
def test_confusion_matrix_matches_reference(spark, pairs):
    df = spark.createDataFrame(pairs, ["actual", "predicted"])
    got = [tuple(r) for r in confusion_matrix(df).orderBy("cls").collect()]
    assert got == _ref_confusion(pairs)
    # single-label identity: total fp == total fn (every miss is both) —
    # holds exactly when every predicted class also has a row, i.e. no
    # class is predicted-only (such a class's fp mass has no row to
    # appear in, by documented design)
    if {p for _, p in pairs} <= {a for a, _ in pairs}:
        assert sum(r[2] for r in got) == sum(r[3] for r in got)
