"""Property-based check of first-occurrence segment dedup (L-DEDUP-15's
public API): on random small corpora with planted clones,
``segment_dedup`` must agree exactly with a pure-Python reference of
the keep-first rule and the document reconstruction — counts AND the
md5 of every rebuilt text."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_xgboost_spark.operators.dedup import segment_dedup

_VOCAB = [f"w{i}" for i in range(6)]
_SEG = 3

_doc = st.lists(
    st.sampled_from(_VOCAB), min_size=1, max_size=11
).map(lambda ws: " ".join(ws))


def _py_rebuild(texts: dict[int, str]):
    segs = {}  # doc_id -> [(idx, seg)]
    for d in sorted(texts):
        w = texts[d].split(" ")
        segs[d] = [
            (i, " ".join(w[i * _SEG : i * _SEG + _SEG]))
            for i in range((len(w) + _SEG - 1) // _SEG)
        ]
    seen = set()
    out = {}
    for d in sorted(texts):  # global order = (doc_id, seg_idx)
        kept = []
        for i, s in segs[d]:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        rebuilt = " ".join(kept)
        out[d] = (
            len(segs[d]),
            len(kept),
            hashlib.md5(rebuilt.encode()).hexdigest() if kept else None,
        )
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(_doc, min_size=1, max_size=6),
    clone_idx=st.integers(min_value=0, max_value=5),
)
def test_segment_dedup_matches_python_reference(spark, docs, clone_idx):
    texts = dict(enumerate(docs))
    # plant a clone with a novel tail — it must keep only segments the
    # original (lower doc_id) did not already claim
    texts[len(docs)] = docs[clone_idx % len(docs)] + " zz zz zz"

    sdf = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_segs"], r["n_kept"], r["rebuilt_md5"])
        for r in segment_dedup(sdf, seg_words=_SEG).collect()
    }
    assert got == _py_rebuild(texts)
