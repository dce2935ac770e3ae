"""Property-based check of the hash-mode IVF mechanism (L-SIM-14): on
random small integer-vector sets, the Spark pipeline must agree exactly
with a pure-Python reference of every stage — nearest-centroid
assignment (ties to smallest centroid id), P-probe selection, candidate
generation restricted to probed cells, and exact top-k re-ranking (ties
to smallest neighbor id). A third independent implementation alongside
Spark and the DuckDB oracle."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_DIM = 4
_P = 2
_K = 3

_vec = st.lists(
    st.integers(min_value=-8, max_value=8), min_size=_DIM, max_size=_DIM
)


def _d2(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _py_ivf(corpus, cents, queries):
    assign = {
        vid: min(cents, key=lambda c: (_d2(v, cents[c]), c))
        for vid, v in corpus.items()
    }
    out = set()
    for qid, qv in queries.items():
        probes = sorted(cents, key=lambda c: (_d2(qv, cents[c]), c))[:_P]
        cand = [
            (vid, _d2(qv, v))
            for vid, v in corpus.items()
            if assign[vid] in probes
        ]
        for rnk, (vid, d) in enumerate(
            sorted(cand, key=lambda t: (t[1], t[0]))[:_K], start=1
        ):
            out.add((qid, rnk, vid, d))
    return out


def _spark_ivf(spark, corpus, cents, queries):
    from dask_xgboost_spark.operators.similarity import ivf_search

    cdf = spark.createDataFrame(
        [(i, v) for i, v in corpus.items()], "vec_id bigint, qv array<bigint>"
    )
    cent = spark.createDataFrame(
        [(i, v) for i, v in cents.items()], "cid bigint, cqv array<bigint>"
    )
    qdf = spark.createDataFrame(
        [(i, v) for i, v in queries.items()], "qid bigint, qv array<bigint>"
    )
    return ivf_search(cdf, cent, qdf, probes=_P, k=_K)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(_vec, min_size=3, max_size=10),
    n_cent=st.integers(min_value=1, max_value=3),
    n_q=st.integers(min_value=1, max_value=2),
)
def test_ivf_matches_python_reference(spark, vecs, n_cent, n_q):
    cents = {100 + i: v for i, v in enumerate(vecs[:n_cent])}
    queries = {200 + i: v for i, v in enumerate(vecs[n_cent : n_cent + n_q])}
    corpus = {i: v for i, v in enumerate(vecs)}
    want = _py_ivf(corpus, cents, queries)
    got = {
        (r["query_id"], r["rnk"], r["neighbor_id"], r["dist2"])
        for r in _spark_ivf(spark, corpus, cents, queries).collect()
    }
    assert got == want
