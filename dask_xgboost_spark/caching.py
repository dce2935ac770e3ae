"""Session-scoped lifecycle for operator-internal persisted rollups.

Several operators materialize a small multi-referenced intermediate
(a part-grain rollup, a featurized self-join side, an oriented edge
set) with ``.persist()`` because Catalyst's exchange reuse does not
fire across differently-pruned references (the Q-TPCH-15 discipline,
BASELINE.md §5). A DataFrame cannot unpersist itself after its consumer
materializes — the operator returns a LAZY plan that still reads the
cache — so the entries outlive the call and, in a long-lived session,
accumulate (VERDICT r8: "any other consumer leaks the cached rollup for
the session").

This module makes that lifecycle explicit instead of contractual-only:
operators route through :func:`persist_rollup`, which tracks every
cache entry the package creates, and any consumer — metered benches,
sweeps, or a user's long-lived session — calls :func:`release_rollups`
after collecting results to drop exactly the package-created entries
without nuking its own cached data (``spark.catalog.clearCache()``
remains the blunt superset and is what bench.py / tools use between
metered queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Insertion-ordered registry of (DataFrame, semanticHash) pairs this
# package persisted. Re-persisting an identical logical plan is a no-op
# in Spark's CacheManager (one cache entry); the ledger stays bounded
# because every insert (a) prunes entries whose cache is gone (a
# consumer's clearCache would otherwise leave dead driver-side
# references forever) and (b) skips the append when a still-cached
# entry with the same semantic hash is already tracked (a loop calling
# the same operator would otherwise grow the list by one reference per
# call). A semantic-hash collision at worst skips tracking one distinct
# frame — its cache then lives until release/clearCache, which is the
# pre-tracking status quo, never a correctness issue.
_ROLLUPS: list[tuple[DataFrame, int | None]] = []


def _alive(df: DataFrame) -> bool:
    try:
        lvl = df.storageLevel
        return bool(lvl.useMemory or lvl.useDisk)
    except Exception:  # noqa: BLE001 — a stopped session counts as dead
        return False


def persist_rollup(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for later :func:`release_rollups`.

    Use for operator-internal multi-referenced intermediates whose
    lifetime must extend past the operator's return (the consumer's
    collect still reads the cache) but should not silently span the
    whole session."""
    out = df.persist()
    try:
        h = out.semanticHash()
    except Exception:  # noqa: BLE001 — hash is an optimization only
        h = None
    _ROLLUPS[:] = [(d, dh) for d, dh in _ROLLUPS if _alive(d)]
    if h is None or all(dh != h for _, dh in _ROLLUPS):
        _ROLLUPS.append((out, h))
    return out


def release_rollups() -> int:
    """Unpersist every rollup the package persisted; returns the count.

    Safe to call at any time — entries whose cache was already dropped
    (e.g. by ``clearCache``) unpersist as a no-op. Blocking=False: Spark
    frees the blocks asynchronously."""
    n = 0
    while _ROLLUPS:
        df, _ = _ROLLUPS.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — a stopped session is fine
            pass
    return n
