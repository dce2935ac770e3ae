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
