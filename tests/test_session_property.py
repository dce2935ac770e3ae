"""Property-based check of gaps-and-islands sessionization: on random
event sets, the Q-WIN-08 window shape (lag → break flag → running sum)
must agree with a direct single-pass Python reference."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

GAP = 100  # seconds

_ev = st.tuples(
    st.integers(min_value=0, max_value=3),      # user
    st.integers(min_value=0, max_value=2000),   # ts (seconds)
)


def _py_sessions(rows):
    """Reference: per user, sort by (ts, idx), split when gap > GAP."""
    by_user: dict[int, list[tuple[int, int]]] = {}
    for idx, (u, ts) in enumerate(rows):
        by_user.setdefault(u, []).append((ts, idx))
    out = {}
    for u, evs in by_user.items():
        evs.sort()
        sid = 0
        prev = None
        for ts, idx in evs:
            if prev is not None and ts - prev > GAP:
                sid += 1
            out[idx] = (u, sid)
            prev = ts
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(_ev, min_size=1, max_size=40))
def test_sessionization_matches_python_reference(spark, rows):
    pdf = [(i, u, ts) for i, (u, ts) in enumerate(rows)]
    df = spark.createDataFrame(pdf, ["idx", "u", "ts"])
    w = Window.partitionBy("u").orderBy("ts", "idx")
    brk = F.when(
        F.lag("ts").over(w).isNull() | (F.col("ts") - F.lag("ts").over(w) > GAP), 1
    ).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    got_rows = (
        df.select("idx", "u", "ts", brk.alias("brk"))
        .withColumn("sid", F.sum("brk").over(wrun) - 1)
        .collect()
    )
    got = {r["idx"]: (r["u"], r["sid"]) for r in got_rows}
    want = _py_sessions(rows)
    # tied (ts) rows: both sides tie-break on the event index, so the
    # assignment must agree exactly
    assert got == want


def test_normalize_events_ts_handles_all_encodings(spark):
    """The r3-incident class: events.ts has shipped as TIMESTAMP(NANOS)
    (int64 under nanosAsLong) and timestamp[us] (TIMESTAMP_NTZ) across
    fixture regenerations. normalize_events_ts must canonicalize int64
    NANOS, int64 MICROS (magnitude-dispatched), TIMESTAMP_NTZ, and
    already-LTZ TIMESTAMP to the same instant."""
    import datetime as dt

    from pyspark.sql import functions as F

    from dask_xgboost_spark.sources.tables import normalize_events_ts

    instant = dt.datetime(2024, 1, 2, 3, 4, 5, 678000)
    us = int(instant.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)

    frames = {
        "int64_nanos": spark.createDataFrame([(us * 1000,)], "ts long"),
        "int64_micros": spark.createDataFrame([(us,)], "ts long"),
        "ntz": spark.createDataFrame([(instant,)], "ts timestamp_ntz"),
        "ltz": spark.createDataFrame([(instant,)], "ts timestamp"),
    }
    for label, df in frames.items():
        out = normalize_events_ts(df)
        assert out.schema["ts"].dataType.typeName() == "timestamp", label
        got = out.select(F.unix_micros("ts").alias("u")).first().u
        assert got == us, (label, got, us)

    # the 9999-12-31 far-future µs sentinel must stay on the µs branch
    sentinel_us = int(
        dt.datetime(9999, 12, 31, tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )
    out = normalize_events_ts(
        spark.createDataFrame([(sentinel_us,)], "ts long")
    )
    got = out.select(F.unix_micros("ts").alias("u")).first().u
    assert got == sentinel_us, ("sentinel", got, sentinel_us)


def test_subsecond_gap_straddle_agrees_with_oracle(spark, duck):
    """VERDICT r4 item 3: a gap of exactly 1800.5 s (straddling the
    whole-second 1800 s session boundary) must split/not-split
    identically in the Spark engine and the DuckDB oracle. The old
    engine compared ``ts.cast("long")`` (seconds-truncated: 1800 s → no
    break) while the oracle compared exact microseconds (1800.5 s →
    break); both now ride epoch-µs. Planted cases: 1799.5 s (no break
    either way), 1800.5 s (break — the divergence case), 3601.0 s
    (break both ways)."""
    import pandas as pd

    base = pd.Timestamp("2024-01-01 00:00:00.250000")
    rows = [
        # user 1: gaps 1799.5s then 1800.5s → sessions {e1,e2} {e3}
        (1, 1, base),
        (2, 1, base + pd.Timedelta(seconds=1799, microseconds=500_000)),
        (3, 1, base + pd.Timedelta(seconds=3600)),
        # user 2: gap 3601s → two singleton sessions
        (4, 2, base),
        (5, 2, base + pd.Timedelta(seconds=3601)),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pdf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(
        F.lag("ts").over(w).isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)) > 1_800_000_000),
        1,
    ).otherwise(0)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    got = {
        r["event_id"]: (r["user_id"], r["sid"])
        for r in df.select("event_id", "user_id", "ts", brk.alias("brk"))
        .withColumn("sid", F.sum("brk").over(wrun))
        .collect()
    }
    assert got == {1: (1, 1), 2: (1, 1), 3: (1, 2), 4: (2, 1), 5: (2, 2)}

    # same shape through the oracle dialect used by Q-WIN-08's sql
    duck.execute("CREATE OR REPLACE TABLE _sess_probe AS SELECT * FROM pdf")
    oracle = duck.execute(
        "WITH l AS (SELECT event_id, user_id, CASE WHEN LAG(ts) OVER w IS NULL "
        "OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk "
        "FROM _sess_probe WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) "
        "SELECT event_id, user_id, CAST(SUM(brk) OVER ("
        "PARTITION BY user_id ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid "
        "FROM l"
    ).fetchall()
    duck.execute("DROP TABLE _sess_probe")
    assert {e: (u, s) for e, u, s in oracle} == got
