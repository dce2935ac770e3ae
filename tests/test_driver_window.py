"""Structural checks on the driver contract (__spark_entry__).

The correctness harness checks a prefix window of ``queries()`` in
order; these tests pin the invariants that make that window land:
every priority name resolves, hash-mode entries carry oracles, the
50-window touches every operator family, and the whole registry is
reachable. Execution-level parity for every hash entry is the separate
sweep in test_oracle_parity.py — this file is the cheap wiring gate
that runs even when someone edits only the window list.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from dask_xgboost_spark.registry import load_all  # noqa: E402


def _family(name: str) -> str:
    # "Q-AGG-01" → "Q-AGG"; "L-TEXT-11" → "L-TEXT"; "S-WIN-02" → "S"
    parts = name.split("-")
    if name.startswith(("S-", "M-", "U-", "G-")):
        return parts[0]
    return "-".join(parts[:2])


def test_priority_names_resolve_and_are_unique():
    specs = load_all()
    pri = entrymod._DRIVER_PRIORITY
    assert len(pri) == len(set(pri)), "duplicate names in _DRIVER_PRIORITY"
    missing = [n for n in pri if n not in specs]
    assert not missing, missing


def test_queries_and_oracles_consistent():
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    specs = load_all()
    assert set(qs) == set(specs), "queries() must expose the full registry"
    assert set(osql) <= set(qs)
    # every hash/stream-mode spec must surface its oracle
    for n, s in specs.items():
        if s.sql is not None:
            assert n in osql, f"{n} has oracle SQL but oracle_sql() omits it"


def test_window_prefix_covers_every_family():
    """The first 50 entries (the driver's check window) must witness
    every top-level operator family so no family goes a round without a
    driver-checked row. Q-TPCH is required again as of round 8 (the r7
    exemption existed only because that window was dedicated to the
    never-witnessed backlog; the backlog is now drained and the r7
    Q-TPCH-11/17 keyset-prune rewrites need a driver re-proof)."""
    window = list(entrymod.queries())[:50]
    fams = {_family(n) for n in window}
    for required in ("Q-SCAN", "Q-AGG", "Q-WIN", "Q-TS", "Q-TPCH",
                     "L-DEDUP", "L-MIX", "L-TEXT", "L-SIM", "L-PIPE",
                     "S", "M", "G", "U"):
        assert required in fams, f"family {required} missing from window"


def test_window_prefix_mostly_hash_mode():
    """Hash-checked rows are the strong evidence; the window should not
    silently drift toward rows-only entries."""
    specs = load_all()
    window = list(entrymod.queries())[:50]
    with_oracle = sum(1 for n in window if specs[n].sql is not None)
    assert with_oracle >= 40, f"only {with_oracle}/50 window entries hash-mode"


def test_oracle_output_types_survive_pandas_fetch(duck):
    """Type-parity gate (VERDICT r4 item 2): DESCRIBE every oracle and
    reject 128-bit output columns. DuckDB types SUM(BIGINT) as HUGEINT;
    the driver's pandas fetch path renders HUGEINT as float64 ("1.0" vs
    Spark's "1") so such an oracle hash-fails at the driver even when
    every value matches — which is exactly how Q-WIN-08 shipped red in
    round 4 while the Arrow-path local sweep stayed green. DESCRIBE only
    plans the query, so this sweeps all ~250 oracles in seconds."""
    from dask_xgboost_spark.plans.lint import lint_oracle_types
    from dask_xgboost_spark.registry import load_all

    offenders = {}
    for name, spec in load_all().items():
        if spec.sql is None:
            continue
        findings = lint_oracle_types(duck, spec.sql)
        if findings:
            offenders[name] = [f.message for f in findings]
    assert not offenders, f"HUGEINT-emitting oracles: {offenders}"


def test_oracle_type_lint_catches_nested_output(duck):
    """The r7 Q-AGG-26 failure mode, made mechanical (VERDICT r7 #1):
    the driver's canonicalizer does a plain pandas sort_values, which
    throws `unhashable type: numpy.ndarray` on list/map cells. Any
    window-eligible (hash-mode) entry with a nested output column would
    ship red, so lint_oracle_types must flag it — and because hash mode
    requires schema parity, gating the oracle gates the Spark side too."""
    from dask_xgboost_spark.plans.lint import lint_oracle_types

    bad = "SELECT c_mktsegment, list(c_name) AS names FROM customer GROUP BY 1"
    findings = lint_oracle_types(duck, bad)
    assert any(f.code == "ORACLE_NESTED" for f in findings)
    bad_map = "SELECT MAP {'a': 1} AS m"
    assert any(
        f.code == "ORACLE_NESTED" for f in lint_oracle_types(duck, bad_map)
    )
    # DuckDB FIXED-SIZE arrays type as INTEGER[3] (no bare "[]") but
    # fetch as ndarray cells all the same — the gate must catch them
    bad_fixed = "SELECT array_value(1, 2, 3) AS a"
    assert any(
        f.code == "ORACLE_NESTED" for f in lint_oracle_types(duck, bad_fixed)
    )
    good = (
        "SELECT c_mktsegment, string_agg(c_name, '|' ORDER BY c_name) "
        "AS names FROM customer GROUP BY 1"
    )
    assert lint_oracle_types(duck, good) == []


def test_oracle_type_lint_catches_uncast_sum(duck):
    """The lint itself must fail on the round-4 trap pattern."""
    from dask_xgboost_spark.plans.lint import lint_oracle_types

    bad = "SELECT o_orderstatus, SUM(o_orderkey) AS s FROM orders GROUP BY o_orderstatus"
    findings = lint_oracle_types(duck, bad)
    assert findings and findings[0].code == "ORACLE_HUGEINT"
    good = (
        "SELECT o_orderstatus, CAST(SUM(o_orderkey) AS BIGINT) AS s "
        "FROM orders GROUP BY o_orderstatus"
    )
    assert lint_oracle_types(duck, good) == []
