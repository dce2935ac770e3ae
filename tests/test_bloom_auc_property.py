"""Property checks for the round-5 algorithmic operators.

Q-JOIN-13's exactness rests on the Bloom pre-filter having ZERO false
negatives (false positives are scrubbed by the exact join; a false
negative would silently drop a matching fact row). M-EVAL-03's
exactness rests on the bucket rank-sum identity equalling the O(n²)
pairwise definition of AUC. Both are proven here against brute-force
references on randomized inputs; no Spark session needed — the
properties are about the arithmetic, which the Spark/DuckDB twins
both implement over the same integer expressions.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(
    keys=st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200),
    probes=st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200),
)
def test_bloom_never_false_negative(keys, probes):
    """Pure-python twin of Q-JOIN-13's bit algebra: any probe value that
    IS in the key set must pass the k-position test — for every
    possible position assignment (we model the hash as arbitrary but
    consistent, which is the only property the filter uses)."""
    m = 1 << 16
    seeds = (7, 131, 977)

    # consistent stand-in hash (the engine's xxhash64 is also a pure
    # function of (value, seed); consistency is all that no-FN needs)
    def pos(v, s):
        return hash((v, s)) % m

    words = [0] * (m // 64)
    for k in keys:
        for s in seeds:
            p = pos(k, s)
            words[p // 64] |= 1 << (p % 64)

    def might_contain(v):
        return all(
            (words[pos(v, s) // 64] >> (pos(v, s) % 64)) & 1 for s in seeds
        )

    for k in keys:
        assert might_contain(k), "false negative: filter dropped a true key"
    # and the filter is not degenerate-true unless it plausibly should be
    fp = sum(1 for v in probes - keys if might_contain(v))
    assert fp <= len(probes)  # trivially true; documents that FPs are allowed


@settings(max_examples=50, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # bucketed score
            st.booleans(),                            # label
        ),
        min_size=2,
        max_size=300,
    )
)
def test_auc_bucket_identity_matches_pairwise(data):
    """M-EVAL-03's identity: Σ_s np_s·(2·ng_below_s + ng_s) = 2·P·N·AUC,
    where the pairwise AUC counts concordant pairs once, ties half."""
    pos = [s for s, y in data if y]
    neg = [s for s, y in data if not y]
    if not pos or not neg:
        return

    # brute-force: 2 * (concordant + 0.5*ties) as an exact integer
    brute2 = sum(2 for p in pos for n in neg if p > n) + sum(
        1 for p in pos for n in neg if p == n
    )

    # bucket identity
    from collections import Counter

    np_s = Counter(p for p in pos)
    ng_s = Counter(n for n in neg)
    scores = sorted(set(np_s) | set(ng_s))
    num2 = 0
    ng_below = 0
    for s in scores:
        num2 += np_s.get(s, 0) * (2 * ng_below + ng_s.get(s, 0))
        ng_below += ng_s.get(s, 0)

    assert num2 == brute2
