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
    # threshold > 1.0: jaccard <= 1.0 always, so the posting join emits
    # nothing — the bitmap intra-branch used to emit every identical-mask
    # pair unconditionally (advisor, r12); the gate must refuse
    dups = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "a b")], ["doc_id", "text"]
    )
    assert jaccard_pairs(dups, threshold=1.5).count() == 0
    # ... while threshold exactly 1.0 still takes the bitmap path and
    # emits the exact-duplicate pairs (boundary: jaccard == threshold)
    assert jaccard_pairs(dups, threshold=1.0).count() == 3


def test_jaccard_bitmap_mask_count_gate(spark, monkeypatch):
    """ADVICE r12: the bitmap pair join force-broadcasts the full
    distinct-mask table, and distinct masks are bounded by 2^|vocab|,
    not by the 64-token vocabulary — the gate must count them and fall
    back to the posting join above the bound, with identical output."""
    import dask_xgboost_spark.operators.dedup as dd

    texts = {0: "a b", 1: "a b c", 2: "a b c", 3: "c d", 4: "a d"}
    sdf = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )
    want = _py_pairs(texts, 0.5)

    def _run():
        df = jaccard_pairs(sdf, threshold=0.5)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        rows = {
            (r["d1"], r["d2"]): (r["inter"], r["jaccard"])
            for r in df.collect()
        }
        return plan, rows

    # 4 distinct masks > limit 3 → posting join (no popcount in the plan)
    monkeypatch.setattr(dd, "_BITMAP_MASK_LIMIT", 3)
    dd._JACCARD_PLAN_CACHE.clear()
    plan_post, got_post = _run()
    assert "bit_count" not in plan_post
    # 4 distinct masks <= limit 4 → bitmap path fires
    monkeypatch.setattr(dd, "_BITMAP_MASK_LIMIT", 4)
    dd._JACCARD_PLAN_CACHE.clear()
    plan_bit, got_bit = _run()
    assert "bit_count" in plan_bit
    # both branches match the reference exactly
    for got in (got_post, got_bit):
        assert set(got) == set(want), (got, want)
        for k in want:
            assert got[k][0] == want[k][0]
            assert abs(got[k][1] - want[k][1]) < 1e-12
    dd._JACCARD_PLAN_CACHE.clear()


def test_jaccard_runtime_mask_guard_fails_loudly_on_stale_cache(
    spark, monkeypatch
):
    """r13 review: a cached "bitmap" decision can outlive the data it
    was probed on (same path overwritten in place), and the strict
    token lookup only catches NEW tokens — the evaluation plan itself
    re-asserts the mask bound and must fail loudly instead of
    force-broadcasting an unbounded mask table."""
    import pytest

    import dask_xgboost_spark.operators.dedup as dd

    # 5 distinct masks: {a,b} {a,c} {b,c} {a} {c}
    texts = {0: "a b", 1: "a c", 2: "b c", 3: "a", 4: "c"}
    sdf = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )
    monkeypatch.setattr(dd, "_BITMAP_MASK_LIMIT", 3)
    # seed a stale "bitmap" decision, as if probed on a smaller corpus
    dd._JACCARD_PLAN_CACHE.clear()
    dd._JACCARD_PLAN_CACHE[(sdf.semanticHash(), 0.5)] = (
        "bitmap",
        ["a", "b", "c"],
    )
    df = jaccard_pairs(sdf, threshold=0.5)  # cached: no probe runs
    with pytest.raises(Exception, match="distinct-mask count"):
        df.collect()
    dd._JACCARD_PLAN_CACHE.clear()


def test_jaccard_probe_cache_hits_per_path(spark, tmp_path, monkeypatch):
    """ADVICE r12: the plan probe runs bounded eager jobs at DataFrame
    construction; for file-backed input (stable semanticHash) the
    decision must be cached so repeated construction doesn't re-scan."""
    import dask_xgboost_spark.operators.dedup as dd

    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "c d")], ["doc_id", "text"]
    ).write.parquet(p)

    dd._JACCARD_PLAN_CACHE.clear()
    first = jaccard_pairs(spark.read.parquet(p), threshold=0.9)
    assert len(dd._JACCARD_PLAN_CACHE) == 1
    (cached_plan,) = dd._JACCARD_PLAN_CACHE.values()
    assert cached_plan[0] == "bitmap"

    # second construction over the same path must NOT re-probe
    def _boom(tok, threshold):  # pragma: no cover - must not run
        raise AssertionError("probe re-ran despite cache")

    monkeypatch.setattr(dd, "_probe_jaccard_plan", _boom)
    second = jaccard_pairs(spark.read.parquet(p), threshold=0.9)
    assert sorted(map(tuple, second.collect())) == sorted(
        map(tuple, first.collect())
    )
    dd._JACCARD_PLAN_CACHE.clear()


def test_jaccard_probe_cache_lru_eviction(spark, tmp_path, monkeypatch):
    """VERDICT r13 note: at capacity the cache must evict ONLY the
    least-recently-used entry (the old policy wiped the whole dict,
    discarding every hot decision). Driven through jaccard_pairs itself:
    one parquet path, distinct thresholds = distinct cache keys."""
    import dask_xgboost_spark.operators.dedup as dd

    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(0, "a b"), (1, "c d")], ["doc_id", "text"]
    ).write.parquet(p)
    docs = spark.read.parquet(p)

    probes = []

    def _count_probe(tok, threshold):
        probes.append(threshold)
        return ("posting", None)

    monkeypatch.setattr(dd, "_probe_jaccard_plan", _count_probe)
    monkeypatch.setattr(dd, "_JACCARD_PLAN_CACHE_CAP", 3)
    dd._JACCARD_PLAN_CACHE.clear()
    for t in (0.1, 0.2, 0.3):  # fill to capacity
        jaccard_pairs(docs, threshold=t)
    jaccard_pairs(docs, threshold=0.1)  # hit refreshes 0.1 → LRU is 0.2
    jaccard_pairs(docs, threshold=0.4)  # at cap: evicts 0.2 only
    assert probes == [0.1, 0.2, 0.3, 0.4]
    assert [t for _, t in dd._JACCARD_PLAN_CACHE] == [0.3, 0.1, 0.4]
    jaccard_pairs(docs, threshold=0.3)  # survivor still cached: no probe
    assert probes == [0.1, 0.2, 0.3, 0.4]
    jaccard_pairs(docs, threshold=0.2)  # the evictee re-probes
    assert probes == [0.1, 0.2, 0.3, 0.4, 0.2]
    dd._JACCARD_PLAN_CACHE.clear()
