"""transformWithState — Spark 4's arbitrary-stateful-processing API.

``transformWithStateInPandas`` (SPARK-49564) supersedes
``applyInPandasWithState``: a ``StatefulProcessor`` object gets typed
state handles (ValueState / ListState / MapState), per-key timers, and
initial-state bootstrapping, instead of one opaque tuple per key. At
100 TB this is the API to build custom streaming operators on — state
lives in the per-partition RocksDB store, scales with keys not stream
length, and schema evolution of state is first-class.

Capability note: the TWS Python protocol is protobuf-framed
(``pyspark/sql/streaming/proto/StateMessage_pb2.py`` imports
``google.protobuf``). This container has no protobuf package and
installs are off-limits, so ``HAS_TWS`` is False here and
``per_key_min_max_count`` runs the semantics-identical
``applyInPandasWithState`` fallback; on a real cluster (protobuf ships
with every Spark distro's Python env) the same call takes the TWS path.
The processor class itself is always defined and unit-importable — only
the runtime worker needs protobuf.

Reference parity: the reference has no streaming surface (SURVEY.md §2D
is extension surface); state semantics follow the Structured Streaming
programming guide.
"""

from __future__ import annotations

import importlib.util

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import LongType, StructField, StructType

def _has_protobuf() -> bool:
    # find_spec("google.protobuf") raises if the parent namespace package
    # is absent entirely, so probe the parent first.
    if importlib.util.find_spec("google") is None:
        return False
    return importlib.util.find_spec("google.protobuf") is not None


#: True when the transformWithStateInPandas worker protocol can run
#: (its driver/executor workers import google.protobuf at startup).
HAS_TWS = _has_protobuf()

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mn", LongType()),
        StructField("mx", LongType()),
    ]
)

_OUT_SCHEMA = "user_id bigint, n_events bigint, mn_c bigint, mx_c bigint"


def _fold_batch(pdf: pd.DataFrame, n: int, mn, mx):
    """Fold one pandas micro-batch chunk into (count, min¢, max¢) state.

    value → int64 cents via FLOOR(x*100+0.5) — the same carrier the batch
    oracle uses, so stream and batch agree bit-for-bit (no float min/max
    drift: comparisons happen on the ints).
    """
    cents = np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64")
    n += len(pdf)
    if len(cents):
        bmn, bmx = int(cents.min()), int(cents.max())
        mn = bmn if mn is None else min(mn, bmn)
        mx = bmx if mx is None else max(mx, bmx)
    return n, mn, mx


class MinMaxCountProcessor(StatefulProcessor):
    """Per-key running (count, min¢, max¢) in a single ValueState.

    Emits the post-update state each time the key appears in a
    micro-batch (Update mode) — the latest emission per key is the final
    state, and all three fields are monotone so a max/min reduce over
    emissions is equivalent.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("mmc", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        n, mn, mx = self._state.get() if self._state.exists() else (0, None, None)
        for pdf in rows:
            n, mn, mx = _fold_batch(pdf, n, mn, mx)
        self._state.update((n, mn, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "mn_c": [mn], "mx_c": [mx]}
        )

    def close(self) -> None:
        pass


def _apply_in_pandas_with_state(grouped) -> DataFrame:
    """applyInPandasWithState twin of :class:`MinMaxCountProcessor` —
    identical fold, tuple state instead of a ValueState handle."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        n, mn, mx = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            n, mn, mx = _fold_batch(pdf, n, mn, mx)
        state.update((n, mn, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "mn_c": [mn], "mx_c": [mx]}
        )

    return grouped.applyInPandasWithState(
        fold, _OUT_SCHEMA, _STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


def per_key_min_max_count(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (count, min¢, max¢).

    Takes the streaming events frame (``user_id``, ``value``), returns
    the Update-mode emission stream. Routes through
    ``transformWithStateInPandas`` when the runtime supports it
    (``HAS_TWS``), else the ``applyInPandasWithState`` twin — both share
    :func:`_fold_batch`, so semantics are identical by construction.
    """
    grouped = events.select("user_id", "value").groupBy("user_id")
    if HAS_TWS:
        return grouped.transformWithStateInPandas(
            MinMaxCountProcessor(),
            outputStructType=_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    return _apply_in_pandas_with_state(grouped)


def finalize_emissions(out: DataFrame) -> DataFrame:
    """Reduce the Update-mode emission log to the final per-key state.

    All three state fields are monotone (count and max non-decreasing,
    min non-increasing), so max/max/min over emissions = last emission.
    """
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.min("mn_c").alias("mn_c"),
            F.max("mx_c").alias("mx_c"),
        )
        .select(
            "user_id",
            "n_events",
            "mn_c",
            "mx_c",
            (F.col("mn_c") / 1e2).alias("mn_value"),
            (F.col("mx_c") / 1e2).alias("mx_value"),
        )
        .orderBy("user_id")
    )
