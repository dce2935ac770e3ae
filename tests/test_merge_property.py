"""Property-based check of the MERGE primitive: on random target/update
frames, ``merge_into`` must agree with an independent pandas model
(updates win on key collision, unmatched rows pass through, new keys
insert) — and must be key-exact regardless of duplicates ABSENT from
either side (both sides keyed)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_xgboost_spark.operators.merge import merge_into

_key = st.integers(min_value=0, max_value=30)
_val = st.integers(min_value=-1000, max_value=1000)


def _keyed_frame(pairs):
    # last write wins per key — MERGE consumes keyed (deduped) inputs
    seen = {}
    for k, v in pairs:
        seen[k] = v
    return pd.DataFrame(
        {"k": list(seen), "v": [seen[k] for k in seen]}, dtype="int64"
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.tuples(_key, _val), min_size=1, max_size=25),
    st.lists(st.tuples(_key, _val), min_size=0, max_size=25),
)
def test_merge_into_matches_pandas_model(spark, target_pairs, update_pairs):
    tgt = _keyed_frame(target_pairs)
    upd = _keyed_frame(update_pairs)

    got = (
        merge_into(
            spark.createDataFrame(tgt, "k bigint, v bigint"),
            spark.createDataFrame(upd, "k bigint, v bigint")
            if len(upd)
            else spark.createDataFrame([], "k bigint, v bigint"),
            ["k"],
        )
        .orderBy("k")
        .toPandas()
    )

    # independent model: updates overwrite, unmatched pass, new insert
    model = {int(r.k): int(r.v) for r in tgt.itertuples()}
    model.update({int(r.k): int(r.v) for r in upd.itertuples()})
    want = sorted(model.items())

    assert [(int(r.k), int(r.v)) for r in got.itertuples()] == want


def test_prune_files_by_stats_never_drops_a_hit(tmp_path):
    """Property: for random per-file [min,max] ranges and random sorted
    key lists, prune_files_by_stats must classify a file as HIT
    whenever any key falls inside its range (no false negatives — a
    missed file would leave deleted subjects on disk), and as KEEP only
    when no key can be inside."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dask_xgboost_spark.plans.scale import prune_files_by_stats

    rng = random.Random(7)
    for trial in range(20):
        files, truths = [], []
        keys = sorted(rng.sample(range(0, 1000), rng.randint(1, 30)))
        for i in range(rng.randint(1, 12)):
            lo = rng.randint(0, 950)
            hi = lo + rng.randint(0, 50)
            vals = sorted(rng.randint(lo, hi) for _ in range(5)) or [lo]
            # ensure stats really are [lo', hi'] of the written values
            path = str(tmp_path / f"t{trial}_{i}.parquet")
            pq.write_table(pa.table({"user_id": pa.array(vals, pa.int64())}), path)
            mn, mx = min(vals), max(vals)
            truths.append(any(mn <= k <= mx for k in keys))
            files.append(path)
        hit, keep = prune_files_by_stats(files, "user_id", keys)
        for f, truth in zip(files, truths):
            if truth:
                assert f in hit, "false negative: file with a key kept"
            else:
                assert f in keep
