"""Property-based check of exact-Jaccard dedup: on random small corpora,
``jaccard_pairs`` (both the single-pass posting join and the rare-token
blocking production path) must agree with a pure-Python set-Jaccard
reference — including corpora with planted near-duplicate perturbations."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_xgboost_spark.operators.dedup import jaccard_pairs

_VOCAB = [f"w{i}" for i in range(12)]

_doc = st.lists(
    st.sampled_from(_VOCAB), min_size=3, max_size=10
).map(lambda ws: " ".join(ws))


def _py_pairs(texts: dict[int, str], threshold: float):
    """Independent reference: exact set Jaccard over all pairs."""
    sets = {i: set(t.split(" ")) for i, t in texts.items()}
    out = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        j = inter / union if union else 0.0
        if j >= threshold:
            out[(a, b)] = (inter, j)
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(_doc, min_size=2, max_size=8),
    perturb_idx=st.integers(min_value=0, max_value=7),
)
def test_jaccard_pairs_match_python_reference(spark, docs, perturb_idx):
    # plant a near-duplicate: copy one doc with a single appended token
    src = docs[perturb_idx % len(docs)]
    texts = dict(enumerate(docs))
    texts[len(docs)] = src + " w0"

    sdf = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )
    threshold = 0.6
    want = _py_pairs(texts, threshold)

    for max_df in (None, 3):
        got_rows = jaccard_pairs(sdf, threshold=threshold, max_token_df=max_df).collect()
        got = {(r["d1"], r["d2"]): (r["inter"], r["jaccard"]) for r in got_rows}
        if max_df is None:
            assert set(got) == set(want), (got, want)
            for k in want:
                assert got[k][0] == want[k][0]
                assert abs(got[k][1] - want[k][1]) < 1e-12
        else:
            # blocking may only miss pairs whose every shared token is hot;
            # reported values for surviving pairs must still be exact
            assert set(got) <= set(want), (got, want)
            for k in got:
                assert got[k][0] == want[k][0]
                assert abs(got[k][1] - want[k][1]) < 1e-12


# > 64 distinct tokens so the r12 bitmap gate REFUSES and the posting
# join runs — without this, every generated corpus above fits 64 bits
# and the open-vocabulary branch (what production corpora hit) would
# only be covered by one fixed-input golden test
_VOCAB_WIDE = [f"v{i}" for i in range(80)]

_doc_wide = st.lists(
    st.sampled_from(_VOCAB_WIDE), min_size=3, max_size=30
).map(lambda ws: " ".join(ws))


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_doc_wide, min_size=2, max_size=8))
def test_jaccard_posting_join_path_wide_vocab(spark, docs):
    # force every vocab word into the corpus so the distinct-token
    # universe provably exceeds 64 and the bitmap gate cannot fire
    texts = dict(enumerate(docs))
    texts[len(docs)] = " ".join(_VOCAB_WIDE)
    texts[len(docs) + 1] = " ".join(_VOCAB_WIDE)  # one certain pair (j=1)

    sdf = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )
    threshold = 0.5
    want = _py_pairs(texts, threshold)
    got_rows = jaccard_pairs(sdf, threshold=threshold).collect()
    got = {(r["d1"], r["d2"]): (r["inter"], r["jaccard"]) for r in got_rows}
    assert set(got) == set(want), (got, want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-12


def test_jaccard_bitmap_gate_edge_cases(spark):
    # empty corpus: the gate must not build an empty map (r12 review
    # finding — it crashed analysis); the function returns zero pairs
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert jaccard_pairs(empty, threshold=0.5).count() == 0
    # threshold <= 0: the bitmap form would emit zero-overlap pairs the
    # posting join cannot produce, so the gate must refuse — disjoint
    # docs stay unpaired at threshold 0 exactly as the posting join says
    disjoint = spark.createDataFrame(
        [(0, "a b"), (1, "c d")], ["doc_id", "text"]
    )
    assert jaccard_pairs(disjoint, threshold=0.0).count() == 0
