"""As-of join (Q-JOIN-10) — an operator Spark lacks natively.

Semantics: for each left row, attach values from the *latest* right row
with the same key and ``right.ts <= left.ts`` (backward as-of; ties
include the right row).

Implementation is the scale-safe union+running-window form rather than the
naive ``join ON key AND r.ts <= l.ts`` + ``ROW_NUMBER()=1``: the naive
form materializes every (left, earlier-right) pair — quadratic per key,
fatal at 100 TB with hot keys — whereas the union form is ONE shuffle on
(key) with a linear sequential scan per key, and AQE can split skewed
keys. Reference precedent: dask-xgboost aligns per-key collections by
co-partitioning triads (core.py:209); here alignment is a window over a
single unioned table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    carry: dict[str, str],
) -> DataFrame:
    """Backward as-of join.

    Parameters
    ----------
    on : key column name present in both frames.
    left_ts / right_ts : event-time column in each frame.
    carry : {output_name: right_column} values carried from the matched
        right row — the right row with the greatest ``right_ts <=
        left_ts`` for the key. Arbitrary (non-monotone) right columns are
        carried correctly: the running value is ``max(struct(right_ts,
        carries...))`` over the per-key window (max-by in one expression,
        still a single shuffle), and the matched row's fields are
        projected out of the struct. When several right rows share the
        matched timestamp, the one with the lexicographically greatest
        carried values wins (a deterministic tie-break; distributed input
        order is not meaningful, unlike ``pandas.merge_asof``'s
        last-input-row rule).

    Returns the left frame plus the carried columns (NULL when no prior
    right row exists for the key).
    """
    lcols = left.columns
    carry_types = {out: dict(right.dtypes)[src] for out, src in carry.items()}

    l2 = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        *[F.lit(None).cast(t).alias(f"_c_{out}") for out, t in carry_types.items()],
    )
    r2 = right.select(
        # the join key must survive on the right side (every other left
        # column rides along as NULL)
        *[
            (F.col(on) if c == on else F.lit(None).cast(t)).alias(c)
            for c, t in left.dtypes
        ],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        *[F.col(src).alias(f"_c_{out}") for out, src in carry.items()],
    )
    u = l2.unionByName(r2)
    # Right rows sort before left rows at equal ts → ties are inclusive.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_asof_ts"), F.col("_asof_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # max-by over the window: the struct leads with the right timestamp, so
    # the running max is the struct of the latest right row. The struct is
    # NULL (ignored by max) for left rows — otherwise a left row, which
    # sorts to the top of its own frame, would shadow the match with its
    # NULL carry fields.
    right_struct = F.when(
        F.col("_asof_side") == 0,
        F.struct(
            F.col("_asof_ts").alias("_match_ts"),
            *[F.col(f"_c_{out}").alias(out) for out in carry],
        ),
    )
    matched = F.max(right_struct).over(w)
    carried: list[Column] = [matched.getField(out).alias(out) for out in carry]
    return (
        u.select(*lcols, F.col("_asof_side"), *carried)
        .filter(F.col("_asof_side") == 1)
        .drop("_asof_side")
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Nearest as-of join (``pandas.merge_asof(direction='nearest')``):
    attach to each left row the CLOSEST right timestamp for the key in
    either direction, optionally bounded by ``tolerance_us``. Returns
    the left frame plus ``asof_match_ts`` (NULL when nothing matches
    within tolerance), ``asof_gap_us`` (absolute distance, exact epoch
    µs) and ``asof_side`` ('b'ackward / 'f'orward). Equidistant
    candidates resolve BACKWARD (pandas' rule).

    Same scale contract as :func:`asof_join_backward` — ONE shuffle on
    the key, no per-row subquery, no (left × earlier-right) pair
    blowup: the union carries both sides through two window passes
    over the same partitioning (a running max of prior right
    timestamps, a running min of later ones; the second sort is
    in-partition, not a new exchange)."""
    lcols = left.columns
    l2 = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
    )
    r2 = right.select(
        *[
            (F.col(on) if c == on else F.lit(None).cast(t)).alias(c)
            for c, t in left.dtypes
        ],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
    )
    u = l2.unionByName(r2)
    rts = F.when(F.col("_asof_side") == 0, F.col("_asof_ts"))
    # backward: right rows sort BEFORE left at equal ts → ties inclusive
    w_b = (
        Window.partitionBy(on)
        .orderBy(F.col("_asof_ts"), F.col("_asof_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: left rows sort BEFORE right at equal ts → ties inclusive
    w_f = (
        Window.partitionBy(on)
        .orderBy(F.col("_asof_ts"), F.col("_asof_side").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    scored = u.select(
        *lcols,
        "_asof_side",
        F.col("_asof_ts").alias("_lts"),
        F.max(rts).over(w_b).alias("_bts"),
        F.min(rts).over(w_f).alias("_fts"),
    ).filter(F.col("_asof_side") == 1)
    lus = F.unix_micros("_lts")
    bgap = lus - F.unix_micros("_bts")  # ≥ 0, NULL when no prior right
    fgap = F.unix_micros("_fts") - lus  # ≥ 0, NULL when no later right
    tol = F.lit(tolerance_us) if tolerance_us is not None else None
    b_ok = F.col("_bts").isNotNull() & ((bgap <= tol) if tol is not None else F.lit(True))
    f_ok = F.col("_fts").isNotNull() & ((fgap <= tol) if tol is not None else F.lit(True))
    # equidistant → backward (pandas' nearest rule)
    pick_b = b_ok & (~f_ok | (bgap <= fgap))
    pick_f = f_ok & ~pick_b
    return scored.select(
        *lcols,
        F.when(pick_b, F.col("_bts"))
        .when(pick_f, F.col("_fts"))
        .alias("asof_match_ts"),
        F.when(pick_b, bgap).when(pick_f, fgap).cast("bigint").alias("asof_gap_us"),
        F.when(pick_b, F.lit("b")).when(pick_f, F.lit("f")).alias("asof_side"),
    )
