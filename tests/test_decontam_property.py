"""Property-based check of embedding decontamination (L-SIM-13's public
API): on random small quantized-vector sets, ``decontaminate`` must
agree exactly with a pure-Python reference that replicates the sign
bucketing, the one-flip multi-probe candidate rule, and the
cross-multiplied integer cosine test — including the pigeonhole
guarantee that any pair within Hamming 1 of the leading sign pattern is
a candidate."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_xgboost_spark.operators.similarity import decontaminate

_DIM = 8
_SIGN_BITS = 4

_vec = st.lists(
    st.integers(min_value=-4, max_value=4), min_size=_DIM, max_size=_DIM
)


def _bucket(qv: list[int]) -> int:
    return sum(1 << i for i, x in enumerate(qv[:_SIGN_BITS]) if x >= 0)


def _py_pairs(corpus: dict[int, list[int]], evals: dict[int, list[int]]):
    out = set()
    for eid, ev in evals.items():
        probes = {_bucket(ev)} | {
            _bucket(ev) ^ (1 << j) for j in range(_SIGN_BITS)
        }
        en2 = sum(x * x for x in ev)
        for cid, cv in corpus.items():
            if _bucket(cv) not in probes:
                continue
            dot = sum(x * y for x, y in zip(cv, ev))
            cn2 = sum(x * x for x in cv)
            if dot > 0 and 100 * dot * dot >= 81 * cn2 * en2:
                out.add((cid, eid, dot))
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(_vec, min_size=1, max_size=6),
    evals=st.lists(_vec, min_size=1, max_size=3),
    near_idx=st.integers(min_value=0, max_value=5),
)
def test_decontaminate_matches_python_reference(spark, corpus, evals, near_idx):
    # plant a contamination: one corpus vector is an eval vector nudged
    # by one quantization unit on dim 0 (Hamming <= 1 on the sign bits,
    # so the multi-probe guarantee must surface it if cosine passes)
    src = evals[near_idx % len(evals)]
    corpus = corpus + [[src[0] + 1] + src[1:]]

    cd = {i: v for i, v in enumerate(corpus)}
    ed = {i + 1000: v for i, v in enumerate(evals)}
    want = _py_pairs(cd, ed)

    cdf = spark.createDataFrame(
        [(i, v) for i, v in cd.items()], "id bigint, qv array<bigint>"
    )
    edf = spark.createDataFrame(
        [(i, v) for i, v in ed.items()], "id bigint, qv array<bigint>"
    )
    got = {
        (r["corpus_id"], r["eval_id"], r["dot"])
        for r in decontaminate(cdf, edf, sign_bits=_SIGN_BITS).collect()
    }
    assert got == want
